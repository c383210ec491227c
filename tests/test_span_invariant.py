"""The north-rule per-row invariant (BASELINE.json input_hint / FIXTURES §1):
after any engine round-trip or transform, the ordered span sequence
(kind, text, media_ref) per doc_id is identical — ``offset`` is the order
key, physical layout is irrelevant."""

from __future__ import annotations

import pyarrow.parquet as pq

from har2tree_ray.sources.interleaved import read_interleaved
from har2tree_ray.stages.normalize import flat_spans
from har2tree_ray.synth import ensure_interleaved

SF = "/root/testdata/sf0.001"


def _expected_sequences() -> dict:
    import glob

    seqs = {}
    for f in sorted(glob.glob(f"{ensure_interleaved(SF)}/*.parquet")):
        t = pq.read_table(f)
        for did, spans in zip(t["doc_id"].to_pylist(), t["spans"].to_pylist()):
            ordered = sorted(spans, key=lambda s: s["offset"])
            seqs[did] = [(s["kind"], s["text"], s["media_ref"]) for s in ordered]
    return seqs


def test_flatten_writeback_preserves_span_sequences(tmp_path):
    """interleaved → flatten → write_parquet → read → per-doc offset sort
    must reproduce every (kind, text, media_ref) sequence exactly."""
    out = str(tmp_path / "flat")
    flat_spans(read_interleaved(SF)).write_parquet(out)

    got: dict = {}
    import glob

    for f in sorted(glob.glob(f"{out}/*.parquet")):
        t = pq.read_table(f, columns=["doc_id", "offset", "kind", "text", "media_ref"])
        for did, off, kind, text, ref in zip(
                t["doc_id"].to_pylist(), t["offset"].to_pylist(),
                t["kind"].to_pylist(), t["text"].to_pylist(),
                t["media_ref"].to_pylist()):
            got.setdefault(did, []).append((off, kind, text, ref))

    want = _expected_sequences()
    assert set(got) == set(want)
    for did, rows in got.items():
        rows.sort(key=lambda r: r[0])
        assert [(k, t, r) for _, k, t, r in rows] == want[did], did


def test_shuffled_physical_order_is_restored():
    """The synthesizer stores spans physically shuffled; the invariant holds
    because offset is the order key — verify the physical order is indeed
    NOT the logical order (the test above would pass trivially otherwise)."""
    import glob

    some_shuffled = False
    for f in sorted(glob.glob(f"{ensure_interleaved(SF)}/*.parquet"))[:1]:
        t = pq.read_table(f)
        for spans in t["spans"].to_pylist()[:200]:
            offs = [s["offset"] for s in spans]
            if offs != sorted(offs):
                some_shuffled = True
                break
    assert some_shuffled
