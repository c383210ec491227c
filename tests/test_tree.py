"""Tree-builder parity: engine (distributed cascade) vs the independent
recursive oracle, plus hand-built scenario fixtures mirroring the reference
capture_samples (FIXTURES.md §3)."""

import numpy as np
import pandas as pd
import pytest

from har2tree_ray import synth
from har2tree_ray.pipelines.tree import build_doc_tree

from .tree_oracle import build_tree_oracle


def _mk(kind, url, offset, text=""):
    return {"kind": kind, "media_ref": url, "offset": offset,
            "text": f"@geo=1.000000,2.000000 {text}"}


def _engine_rows(spans):
    """Raw span dicts → engine build_doc_tree input (parsed rows)."""
    from har2tree_ray.functions import parse, urls

    rows = []
    for s in spans:
        f = parse.parse_span_features(s["text"])
        _, host, _ = urls.split_url(s["media_ref"])
        rows.append({
            "offset": s["offset"], "kind": s["kind"], "media_ref": s["media_ref"],
            "hostname": host, "status": parse.parse_status(s["text"]),
            "redirect_url": f["redirect_url"], "meta_refresh": f["meta_refresh"],
            "referer": f["referer"], "initiator_url": f["initiator_url"],
            "frame_urls": f["frame_urls"], "ext_src": f["ext_src"],
            "ext_href": f["ext_href"], "ext_cssurl": f["ext_cssurl"],
            "ext_srcset": f["ext_srcset"], "ext_attr": f["ext_attr"],
            "ext_cssimport": f["ext_cssimport"],
            "ext_fulltext": f["ext_fulltext"],
            "jsloc_urls": f["jsloc_urls"],
        })
    return rows


def _edges(spans):
    edges, dropped = build_doc_tree(_engine_rows(spans))
    return [(e["child_offset"], e["parent_offset"], e["attach_rule"], e["depth"])
            for e in edges], dropped


def test_redirect_chain_scenario():
    spans = [
        _mk("document", "https://a.com/1", 0, "@redirect=https://b.com/2 @status=301"),
        _mk("document", "https://b.com/2", 1, "@redirect=https://c.com/3 @status=302"),
        _mk("document", "https://c.com/3", 2, 'src="https://c.com/x.png"'),
        _mk("img", "https://c.com/x.png", 3),
    ]
    edges, dropped = _edges(spans)
    assert dropped == 0
    assert edges == [
        (0, -1, "root", 0),
        (1, 0, "redirect", 1),
        (2, 1, "redirect", 2),
        (3, 2, "external_src", 3),
    ]


def test_status0_retry_dedup():
    spans = [
        _mk("document", "https://a.com/1", 0, 'src="https://a.com/x.js"'),
        _mk("script", "https://a.com/x.js", 1, "@status=0"),
        _mk("script", "https://a.com/x.js", 2),
    ]
    edges, _ = _edges(spans)
    # dead attempt dropped; retry attaches
    assert (2, 0, "external_src", 1) in edges
    assert not any(c == 1 for c, *_ in edges)


def test_status0_kept_without_retry():
    spans = [
        _mk("document", "https://a.com/1", 0, 'src="https://a.com/x.js"'),
        _mk("script", "https://a.com/x.js", 1, "@status=0"),
    ]
    edges, _ = _edges(spans)
    assert (1, 0, "external_src", 1) in edges


def test_referer_precedence_over_external():
    # child has a resolvable referer → external anti-join skips it (J5 skip),
    # referer rule attaches it instead
    spans = [
        _mk("document", "https://a.com/1", 0, 'src="https://a.com/x.png"'),
        _mk("document", "https://a.com/2", 1, "@referer=https://a.com/1"),
        _mk("img", "https://a.com/x.png", 2, "@referer=https://a.com/2"),
    ]
    edges, _ = _edges(spans)
    assert (1, 0, "referer", 1) in edges
    assert (2, 1, "referer", 2) in edges


def test_fallback_hostname_deepest():
    spans = [
        _mk("document", "https://a.com/1", 0, "@redirect=https://b.com/2"),
        _mk("document", "https://b.com/2", 1, "@initiator_chain=x"),
        _mk("document", "https://b.com/3", 2, "@initiator=https://b.com/2"),
        # orphan with partial referer to b.com → deepest b.com container (off 2)
        _mk("img", "https://c.com/i.png", 3, "@referer=https://b.com/unknown.html"),
    ]
    edges, _ = _edges(spans)
    assert (3, 2, "fallback_hostname", 3) in edges


def test_frame_and_meta_refresh():
    spans = [
        _mk("document", "https://a.com/1", 0,
            "@frame=https://f.com/frame.html @meta_refresh=https://m.com/next"),
        _mk("iframe", "https://f.com/frame.html", 1),
        _mk("document", "https://m.com/next", 2),
    ]
    edges, _ = _edges(spans)
    # @redirect absent → meta_refresh becomes the effective redirect (M23/M24)
    assert (2, 0, "redirect", 1) in edges
    assert (1, 0, "frame", 1) in edges


def test_relative_redirect_rebuild():
    """M21: path-absolute / scheme-relative targets rebuild against the
    redirecting span's origin before matching (rebuild_url strict mode)."""
    spans = [
        _mk("document", "https://a.com/p/1.html", 0, "@redirect=/p/2.html @status=301"),
        _mk("document", "https://a.com/p/2.html", 1, "@meta_refresh=//a.com/p/3.html"),
        _mk("document", "https://a.com/p/3.html", 2, "@meta_refresh=/other/4.html"),
        # /other/4.html resolves to https://a.com/other/4.html — unknown → orphan
        _mk("document", "https://b.com/other/4.html", 3),
    ]
    edges, dropped = _edges(spans)
    assert (1, 0, "redirect", 1) in edges
    assert (2, 1, "redirect", 2) in edges
    assert (3, 0, "fallback_root", 1) in edges
    assert dropped == 0
    assert edges == build_tree_oracle(spans)


def test_relative_jsloc_rebuild():
    spans = [
        _mk("document", "https://a.com/p/1.html", 0, "location.href='/p/next.html'"),
        _mk("document", "https://a.com/p/next.html", 1),
    ]
    edges, _ = _edges(spans)
    assert (1, 0, "redirect", 1) in edges
    assert edges == build_tree_oracle(spans)


def test_tree_stats_surfaces_dropped_orphans():
    """A5: the orphan-cap drop count must reach the stats output."""
    import pyarrow as pa
    import ray.data as rd

    from har2tree_ray.pipelines.tree import tree_stats_interleaved
    from har2tree_ray.schema import INTERLEAVED_SCHEMA

    spans = [_mk("document", "https://a.com/1", 0)]
    spans += [_mk("img", f"https://z{i}.com/i.png", i + 1) for i in range(1100)]
    t = pa.Table.from_pylist([{"doc_id": "d0", "spans": spans}],
                             schema=INTERLEAVED_SCHEMA)
    out = tree_stats_interleaved(rd.from_arrow(t)).to_pandas()
    assert out["n_dropped_orphans"].tolist() == [100]
    assert out["n_nodes"].tolist() == [1001]


def test_tree_stats_interleaved_matches_edge_rollup():
    """Shared columns of the zero-shuffle stats equal the edge-table rollup."""
    from har2tree_ray.pipelines import tree
    from har2tree_ray.sources.interleaved import read_interleaved
    from tests.oracle_utils import canon, to_pandas

    sf = "/root/testdata/sf0.001"
    fast = to_pandas(tree.tree_stats_interleaved(read_interleaved(sf)))
    slow = to_pandas(tree.tree_stats(
        tree.build_edges_interleaved(read_interleaved(sf))))
    fast = canon(fast.drop(columns=["n_dropped_orphans"]))
    pd.testing.assert_frame_equal(fast, canon(slow), check_dtype=False)


def test_orphan_cap():
    spans = [_mk("document", "https://a.com/1", 0)]
    spans += [_mk("img", f"https://z{i}.com/i.png", i + 1) for i in range(1100)]
    edges, dropped = _edges(spans)
    assert len(edges) == 1 + 1000
    assert dropped == 100


@pytest.mark.parametrize("cap", range(0, 60, 7))
def test_oracle_parity_local(cap):
    """Engine cascade == independent recursive oracle, per capture."""
    for row in synth.generate_capture(cap):
        got, _ = _edges(row["spans"])
        want = build_tree_oracle(row["spans"])
        assert got == want, f"doc {row['doc_id']}"


def test_engine_ray_pipeline_matches_oracle():
    """Full distributed path (normalize → parser pool → groupby → map_groups)
    equals the oracle on the sf0.001 tier."""
    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    got = m.queries()["edges"](sf).to_pandas()
    rows = synth.capture_batch_table(np.arange(synth.SF_CAPTURES["sf0.001"])).to_pylist()
    want = []
    for r in rows:
        for (c, p, rule, d) in build_tree_oracle(r["spans"]):
            want.append((r["doc_id"], c, p, rule, d))
    want_df = pd.DataFrame(
        want, columns=["doc_id", "child_offset", "parent_offset", "attach_rule", "depth"]
    )
    got_slim = got[["doc_id", "child_offset", "parent_offset", "attach_rule", "depth"]]
    key = ["doc_id", "child_offset"]
    got_slim = got_slim.sort_values(key).reset_index(drop=True)
    want_df = want_df.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_slim.astype({"child_offset": "int64", "parent_offset": "int64", "depth": "int64"}),
        want_df.astype({"child_offset": "int64", "parent_offset": "int64", "depth": "int64"}),
    )


def test_interleaved_fast_path_matches_shuffle_path():
    """The zero-shuffle interleaved cascade must emit exactly the edges the
    general flat+groupby path emits."""
    from har2tree_ray.pipelines import tree
    from har2tree_ray.queries import _parsed
    from har2tree_ray.sources.interleaved import read_interleaved
    from tests.oracle_utils import canon, to_pandas

    sf = "/root/testdata/sf0.001"
    fast = canon(to_pandas(tree.build_edges_interleaved(read_interleaved(sf))))
    slow = canon(to_pandas(tree.build_edges(_parsed(sf))))
    import pandas as pd

    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_host_edges_equals_pandas_rollup():
    """The hash-range host_edges plan equals a driver-side pandas rollup of
    the same URL-edge table (independent aggregation path)."""
    import pandas as pd

    from har2tree_ray.pipelines import hosttree
    from har2tree_ray.queries import _edges

    sf = "/root/testdata/sf0.001"
    edges = _edges(sf).to_pandas()
    exp = (edges.assign(host_level=edges["depth"].astype("int32"),
                        parent_level=(edges["depth"] - 1).astype("int32"),
                        hostname=edges["child_hostname"])
           .groupby(["doc_id", "host_level", "hostname", "parent_level",
                     "parent_hostname"], as_index=False)
           .size().rename(columns={"size": "n_urls"}))
    got = hosttree.host_edges(_edges(sf)).to_pandas()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True),
        exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True),
        check_dtype=False)

    # the zero-shuffle interleaved fast path (all keys contain doc_id, so
    # the aggregate finalizes batch-locally) must match the same rollup
    from har2tree_ray.sources.interleaved import read_interleaved

    fast = hosttree.host_edges_interleaved(read_interleaved(sf)).to_pandas()
    pd.testing.assert_frame_equal(
        fast[cols].sort_values(cols, kind="mergesort").reset_index(drop=True),
        exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True),
        check_dtype=False)


def test_attach_evidence_golden():
    """§2.10 debug column: flagged runs carry the matched evidence per edge
    (engine counterpart of the reference's trace_make_subtree hooks,
    har2tree.py:46-87); the default path has no such column."""
    spans = [
        _mk("document", "https://a.com/1", 0,
            "@redirect=/hop @status=301"),                  # M21-repaired
        _mk("document", "https://a.com/hop", 1,
            '@frame=https://a.com/fr#x src="https://a.com/x.png"'),
        _mk("iframe", "https://a.com/fr", 2),               # nofrag frame hit
        _mk("img", "https://a.com/x.png", 3),               # external src
        _mk("script", "https://a.com/i.js", 4,
            "@initiator=https://a.com/hop"),                # initiator
        _mk("css", "https://a.com/s.css", 5,
            "@referer=https://a.com/hop"),                  # referer
        _mk("img", "https://b.com/orphan.png", 6,
            "@referer=https://a.com/gone"),                 # fallback_hostname
        _mk("img", "https://c.com/lost.png", 7),            # fallback_root
    ]
    edges, dropped = build_doc_tree(_engine_rows(spans), evidence=True)
    assert dropped == 0
    ev = {e["child_offset"]: (e["attach_rule"], e["attach_evidence"])
          for e in edges}
    assert ev[0] == ("root", "")
    assert ev[1] == ("redirect", "redirect_url=/hop=>https://a.com/hop")
    assert ev[2] == ("frame", "frame_url=https://a.com/fr")
    assert ev[3] == ("external_src", "ext_src=https://a.com/x.png")
    assert ev[4] == ("initiator", "initiator_url=https://a.com/hop")
    assert ev[5] == ("referer", "referer=https://a.com/hop")
    # deepest a.com container is the iframe (depth 2), not the landing doc
    assert ev[6] == ("fallback_hostname",
                     "referer_host=a.com;container_depth=2")
    assert ev[7] == ("fallback_root", "")
    # off by default: the column is absent and topology is unchanged
    plain, _ = build_doc_tree(_engine_rows(spans))
    assert all("attach_evidence" not in e for e in plain)
    strip = lambda es: [(e["child_offset"], e["parent_offset"],
                         e["attach_rule"]) for e in es]
    assert strip(plain) == strip(edges)
