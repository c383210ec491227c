"""Unit tests for the round-4 additions: doc_trajectory (per-doc cell
path), pip_media_outside_host (spatial anti-join), host_topk_urls (top-k
per group), inverted_index (token → postings).

Each test checks against an independent brute-force implementation; the
driver-style DuckDB parity runs in test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from har2tree_ray import geo
from har2tree_ray.pipelines import spatial, stats, tiling
from har2tree_ray.stages import text
from har2tree_ray.stages.normalize import explode_spans
from har2tree_ray.sources.interleaved import read_interleaved, read_table

SF = "/root/testdata/sf0.001"


def _interleaved_table(docs: dict[str, list[dict]]) -> pa.Table:
    span_type = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ])
    return pa.table({
        "doc_id": pa.array(list(docs), pa.string()),
        "spans": pa.array(list(docs.values()), pa.list_(span_type)),
    })


def _span(offset: int, lat: float, lng: float, kind: str = "img") -> dict:
    return {"kind": kind, "text": f"@geo={lat:.4f},{lng:.4f}",
            "media_ref": "https://h.example/x", "offset": offset}


def test_trajectory_collapse_seq_and_wrap():
    res = 8
    n = 1 << res
    cell_w = 360.0 / n
    # doc A: three spans in the same cell then one far east; doc B crosses
    # the antimeridian so the step distance must wrap.
    t = _interleaved_table({
        "A": [_span(0, 10.0, 10.0), _span(1, 10.0, 10.0 + cell_w / 4),
              _span(2, 10.0, 10.0), _span(3, 10.0, 50.0)],
        "B": [_span(0, 0.0, 179.9), _span(1, 0.0, -179.9)],
    })
    out = tiling.doc_trajectory(rd.from_arrow(t), res=res).to_pandas()
    out = out.sort_values(["doc_id", "seq"]).reset_index(drop=True)
    a = out[out.doc_id == "A"]
    # spans 0-2 share a cell -> collapsed to one step; span 3 is a new step
    assert list(a["seq"]) == [0, 1]
    assert list(a["offset"]) == [0, 3]
    assert a["step_dist"].iloc[0] == 0
    ix0, _ = geo.cell_xy(np.array([10.0]), np.array([10.0]), res)
    ix1, _ = geo.cell_xy(np.array([10.0]), np.array([50.0]), res)
    assert a["step_dist"].iloc[1] == abs(int(ix1[0]) - int(ix0[0]))
    b = out[out.doc_id == "B"]
    assert list(b["seq"]) == [0, 1]
    # 179.9E -> 179.9W is 1 cell apart with wraparound, not ~n
    assert b["step_dist"].iloc[1] <= 2
    xw = int(geo.cell_xy(np.array([0.0]), np.array([-179.9]), res)[0][0])
    xe = int(geo.cell_xy(np.array([0.0]), np.array([179.9]), res)[0][0])
    abs_dx = abs(xw - xe)
    assert b["step_dist"].iloc[1] == min(abs_dx, n - abs_dx)


def test_trajectory_matches_bruteforce_sf0001():
    out = tiling.doc_trajectory(read_interleaved(SF)).to_pandas()
    flat = explode_spans(read_interleaved(SF),
                         ["doc_id", "offset", "lat", "lng"]).to_pandas()
    res = tiling.DEFAULT_RES
    n = 1 << res
    rows = []
    for did, g in flat.groupby("doc_id"):
        g = g.sort_values("offset")
        ix, iy = geo.cell_xy(g["lat"].to_numpy(), g["lng"].to_numpy(), res)
        cid = geo.cell_id(ix, iy, res)
        px = py = None
        seq = 0
        prev_cell = None
        for off, c, x, y in zip(g["offset"], cid, ix, iy):
            if prev_cell is not None and c == prev_cell:
                continue
            if px is None:
                step = 0
            else:
                dx = abs(int(x) - px)
                step = max(min(dx, n - dx), abs(int(y) - py))
            rows.append((did, seq, int(off), int(c), step))
            seq += 1
            px, py, prev_cell = int(x), int(y), c
    want = pd.DataFrame(rows, columns=["doc_id", "seq", "offset",
                                       "cell_id", "step_dist"])
    got = out.sort_values(["doc_id", "seq"]).reset_index(drop=True)
    want = want.sort_values(["doc_id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pip_anti_join_matches_bruteforce():
    cols = ["doc_id", "offset", "kind", "hostname", "lat", "lng"]
    flat = explode_spans(read_interleaved(SF), cols)
    got = spatial.pip_media_outside_host(flat).to_pandas()
    df = explode_spans(read_interleaved(SF), cols).to_pandas()
    boxes = (df[(df.kind == "document") & (df.hostname != "")]
             .groupby("hostname")
             .agg(a=("lat", "min"), b=("lat", "max"),
                  c=("lng", "min"), d=("lng", "max")))
    media = df[df.kind.isin(spatial.QUERY_KINDS)]
    inside = np.zeros(len(media), dtype=bool)
    for _, r in boxes.iterrows():
        inside |= ((media["lat"].to_numpy() >= r.a) & (media["lat"].to_numpy() <= r.b)
                   & (media["lng"].to_numpy() >= r.c) & (media["lng"].to_numpy() <= r.d))
    want = media[~inside][["doc_id", "offset"]]
    got_s = got.sort_values(["doc_id", "offset"]).reset_index(drop=True)
    want_s = want.sort_values(["doc_id", "offset"]).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    pd.testing.assert_frame_equal(got_s, want_s.astype(got_s.dtypes),
                                  check_dtype=False)
    # the anti side plus the (eps=0) join side must partition the media set
    assert len(got_s) > 0


def test_host_topk_urls_matches_bruteforce():
    got = stats.host_topk_urls(read_interleaved(SF)).to_pandas()
    flat = explode_spans(read_interleaved(SF),
                         ["hostname", "media_ref"]).to_pandas()
    flat = flat[flat.hostname != ""]
    c = (flat.groupby(["hostname", "media_ref"], as_index=False)
         .size().rename(columns={"size": "n"}))
    c = c.sort_values(["hostname", "n", "media_ref"],
                      ascending=[True, False, True], kind="mergesort")
    c["rank"] = c.groupby("hostname").cumcount() + 1
    want = c[c["rank"] <= 3][["hostname", "rank", "media_ref", "n"]]
    got_s = got.sort_values(["hostname", "rank"]).reset_index(drop=True)
    want_s = want.sort_values(["hostname", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)
    assert (got_s.groupby("hostname")["rank"].max() <= 3).all()


def test_inverted_index_matches_bruteforce_and_caps():
    docs = read_table(SF, "documents", columns=["doc_id", "text"]).to_pandas()
    got = text.inverted_index(
        read_table(SF, "documents", columns=["doc_id", "text"])).to_pandas()
    postings: dict[str, list[int]] = {}
    for did, t in zip(docs["doc_id"], docs["text"]):
        for w in set(text._WS_TOKEN.findall(t)):
            postings.setdefault(w, []).append(int(did))
    want = pd.DataFrame(
        [(w, len(ids), ",".join(str(x) for x in sorted(ids)[:text.INVINDEX_CAP]))
         for w, ids in postings.items()],
        columns=["token", "df", "postings"])
    got_s = got.sort_values("token").reset_index(drop=True)
    want_s = want.sort_values("token").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)
    # truncation must actually engage somewhere (df > cap) so the combiner
    # path (per-batch cap + range-merge re-cap) is exercised
    assert (got_s["df"] > text.INVINDEX_CAP).any()
    over = got_s[got_s["df"] > text.INVINDEX_CAP]
    assert (over["postings"].str.count(",") + 1 == text.INVINDEX_CAP).all()


def test_zonal_stats_matches_bruteforce():
    cols = ["kind", "hostname", "lat", "lng"]
    got = tiling.tile_zonal_stats(
        explode_spans(read_interleaved(SF), cols)).to_pandas()
    df = explode_spans(read_interleaved(SF), cols).to_pandas()
    res = tiling.DEFAULT_RES
    eps = spatial.PIP_EPS
    boxes = (df[(df.kind == "document") & (df.hostname != "")]
             .groupby("hostname")
             .agg(a=("lat", "min"), b=("lat", "max"),
                  c=("lng", "min"), d=("lng", "max")).reset_index())
    z = np.zeros(len(boxes))
    x0, _ = geo.cell_xy(z, boxes["c"].to_numpy() - eps, res)
    x1, _ = geo.cell_xy(z, boxes["d"].to_numpy() + eps, res)
    _, y0 = geo.cell_xy(boxes["b"].to_numpy() + eps, z, res)
    _, y1 = geo.cell_xy(boxes["a"].to_numpy() - eps, z, res)
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    rows = []
    for h, bx0, bx1, by0, by1 in zip(boxes["hostname"], x0, x1, y0, y1):
        m = (ix >= bx0) & (ix <= bx1) & (iy >= by0) & (iy <= by1)
        cells = (iy[m].astype(np.int64) << res) + ix[m]
        _, counts = np.unique(cells, return_counts=True)
        rows.append((h, int((bx1 - bx0 + 1) * (by1 - by0 + 1)),
                     int(m.sum()), len(counts),
                     int(counts.max()) if len(counts) else 0))
    want = pd.DataFrame(rows, columns=["hostname", "n_cells_covered",
                                       "n_spans_in_zone", "n_cells_occupied",
                                       "max_cell_count"])
    got_s = got.sort_values("hostname").reset_index(drop=True)
    want_s = want.sort_values("hostname").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)
    assert (got_s["n_spans_in_zone"] > 0).any()


def test_doc_chunk_covers_and_overlaps():
    got = text.doc_chunk(
        read_table(SF, "documents", columns=["doc_id", "text"])).to_pandas()
    docs = read_table(SF, "documents", columns=["doc_id", "text"]).to_pandas()
    W, S = text.CHUNK_TOKENS, text.CHUNK_STRIDE
    for did, t in zip(docs["doc_id"].head(20), docs["text"].head(20)):
        toks = text._WS_TOKEN.findall(t)
        g = got[got.doc_id == did].sort_values("chunk_id")
        if not toks:
            assert len(g) == 0
            continue
        assert len(g) == (len(toks) + S - 1) // S
        # chunk 0 starts at 0; consecutive starts differ by the stride
        assert list(g["start_tok"]) == list(range(0, len(toks), S))
        # reassembling the non-overlapping prefixes reproduces the doc
        rebuilt = []
        for _, r in g.iterrows():
            piece = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert piece == toks[r["start_tok"]:r["start_tok"] + W]
            rebuilt.extend(piece[:S])
        assert rebuilt[:len(toks)] == toks


def test_host_triangles_known_graph_and_hub_skew():
    from har2tree_ray.pipelines import webmeta

    # K4 on {a,b,c,d} (4 triangles; each vertex in 3) + a hub 'h' fanned to
    # 5 leaves with no leaf-leaf edges (0 triangles); edge a-b also appears
    # in BOTH directions to exercise the canonical dedup.
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
             ("b", "c"), ("b", "d"), ("c", "d")]
    edges += [("h", f"x{i}") for i in range(5)]
    rows = [{"text": f"@referer=http://{s}/", "hostname": d}
            for s, d in edges]
    got = webmeta.host_triangles(rd.from_items(rows)).to_pandas()
    got = dict(zip(got["hostname"], got["n_triangles"]))
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_hll_registers_merge_and_bound():
    # register-wise MAX mergeability: registers(A ∪ B) == elementwise max
    # of registers(A) and registers(B); and rho is within [1, 31]
    cols = ["hostname", "lat", "lng"]
    full = tiling.tile_host_hll(
        explode_spans(read_interleaved(SF), cols)).to_pandas()
    assert full["rho"].between(1, 31).all()
    assert full["reg"].str.fullmatch("[0-9a-f]{2}").all()
    import hashlib
    df = explode_spans(read_interleaved(SF), cols).to_pandas()
    df = df[df.hostname != ""]
    res = tiling.DEFAULT_RES
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    df = pd.DataFrame({"cell_id": (iy.astype(np.int64) << res) + ix,
                       "hostname": df["hostname"].to_numpy()}).drop_duplicates()
    h = df["hostname"].map(
        lambda s: hashlib.md5(s.encode()).hexdigest())
    brute = pd.DataFrame({
        "cell_id": df["cell_id"].to_numpy(),
        "reg": h.str[:2].to_numpy(),
        "rho": (31 - h.str[2:32].str.lstrip("0").str.len()).to_numpy()})
    # split-in-half merge equals whole-corpus registers
    half = len(brute) // 2
    parts = [brute.iloc[:half], brute.iloc[half:]]
    merged = (pd.concat([p.groupby(["cell_id", "reg"], as_index=False)["rho"].max()
                         for p in parts])
              .groupby(["cell_id", "reg"], as_index=False)["rho"].max())
    whole = brute.groupby(["cell_id", "reg"], as_index=False)["rho"].max()
    pd.testing.assert_frame_equal(
        merged.sort_values(["cell_id", "reg"]).reset_index(drop=True),
        whole.sort_values(["cell_id", "reg"]).reset_index(drop=True))
    got_s = full.sort_values(["cell_id", "reg"]).reset_index(drop=True)
    want_s = whole.sort_values(["cell_id", "reg"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_trajectory_all_empty_span_batch():
    # regression: a batch whose docs all have empty span lists must yield
    # zero rows, not IndexError (code-review finding)
    t = _interleaved_table({"A": [], "B": []})
    out = tiling.doc_trajectory(rd.from_arrow(t)).to_pandas()
    assert len(out) == 0


def test_zonal_stats_low_res_no_negative_shift():
    # regression: res below COVER_RES must not raise on a negative shift
    cols = ["kind", "hostname", "lat", "lng"]
    out = tiling.tile_zonal_stats(
        explode_spans(read_interleaved(SF), cols), res=3).to_pandas()
    assert len(out) > 0
    n = 1 << 3
    assert (out["n_cells_covered"] <= n * n).all()


def test_host_clustering_known_graph():
    from har2tree_ray.pipelines import webmeta

    # K4 {a,b,c,d}: deg 3 each, wedges C(3,2)=3, triangles 3 -> coeff 1;
    # hub h with 5 leaves: deg 5, wedges 10, triangles 0; leaves deg 1
    # are excluded (no wedge)
    edges = [("a", "b"), ("a", "c"), ("a", "d"),
             ("b", "c"), ("b", "d"), ("c", "d")]
    edges += [("h", f"x{i}") for i in range(5)]
    rows = [{"text": f"@referer=http://{s}/", "hostname": d}
            for s, d in edges]
    got = webmeta.host_clustering(rd.from_items(rows)).to_pandas()
    got = got.set_index("hostname")
    for v in "abcd":
        assert got.loc[v, "n_wedges"] == 3 and got.loc[v, "n_triangles"] == 3
    assert got.loc["h", "n_wedges"] == 10 and got.loc["h", "n_triangles"] == 0
    assert "x0" not in got.index
