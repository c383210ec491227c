"""Golden-file test for the reference-format d3js render (S3 parity mode)
— the engine's analog of the reference's hostnode_to_json golden diff
(/root/reference/tests/simple_test.py:243-257): compare PARSED dicts (the
reference's golden is UUID-scrubbed and dict-compared, not byte-compared;
the engine omits uuid entirely, so no scrub step is needed)."""

import json
import pathlib

from har2tree_ray.pipelines.render import _d3_dict_for_doc
from har2tree_ray.synth import generate_capture

GOLDEN = pathlib.Path(__file__).parent / "fixtures" / "d3_golden.json"


def _build():
    rows = []
    for c in range(6):
        rows.extend(generate_capture(c, seed=42))
    return [_d3_dict_for_doc(r["doc_id"], r["spans"], r.get("rendered_html"),
                             r.get("downloaded_filename")) for r in rows]


def test_d3_render_matches_golden():
    got = _build()
    expected = json.loads(GOLDEN.read_text())
    assert got == expected


def test_d3_render_shape_features():
    """The reference to_dict contract: every node carries the HostNode
    feature set (nodes.py:725-733 + __init__ features)."""
    required = {"name", "children", "urls_count", "request_cookie",
                "response_cookie", "third_party_cookies_received",
                "mixed_content", "http_content", "https_content",
                "contains_rendered_urlnode"}

    def walk(n):
        yield n
        for c in n["children"]:
            yield from walk(c)

    docs = _build()
    nodes = [n for d in docs for n in walk(d["tree"]) if d["tree"]]
    assert nodes
    for n in nodes:
        assert required <= set(n), n["name"]
        assert n["mixed_content"] == (n["http_content"] and n["https_content"])


def test_d3_render_dataset_roundtrip():
    """End-to-end through Ray: one JSON row per doc, each matching the
    scalar builder (and hence the golden)."""
    import pyarrow as pa
    import ray.data as rd

    from har2tree_ray.pipelines.render import host_tree_json_d3

    rows = []
    for c in range(6):
        rows.extend(generate_capture(c, seed=42))
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "spans": pa.array([r["spans"] for r in rows]),
        "rendered_html": pa.array([r.get("rendered_html") for r in rows],
                                  pa.string()),
        "downloaded_filename": pa.array(
            [r.get("downloaded_filename") for r in rows], pa.string()),
    })
    out = host_tree_json_d3(rd.from_arrow(t)).to_pandas()
    expected = {d["doc_id"]: d for d in _build()}
    assert len(out) == len(rows)
    for _, row in out.iterrows():
        assert json.loads(row["json"]) == expected[row["doc_id"]]
