"""Multimodal plumbing: payload synthesis, actor-pool decode, frame sampling
— oracle parity for the feature/frame queries plus binary round-trip checks."""

from __future__ import annotations

import hashlib

import pytest

from har2tree_ray.stages import media
from tests.oracle_utils import assert_matches_oracle, to_pandas

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", ["media_features", "media_frames"])
def test_oracle_parity(name):
    assert_matches_oracle(name, SF)


def test_payload_roundtrip():
    ref = "https://h1.example1.com/p1/r2.png"
    p = media.synth_payload(ref)
    m = media.fake_media_meta(ref)
    assert len(p) == m["n_bytes"]
    assert p.startswith(media.MAGIC)
    w, h, nf = media.MediaDecoder()._decode_stub(p)
    assert (w, h, nf) == (m["width"], m["height"], m["n_frames"])
    # deterministic: same ref → same bytes
    assert p == media.synth_payload(ref)


def test_media_payloads_binary_schema():
    from har2tree_ray import queries as q

    df = to_pandas(q.q_media_payloads(SF).limit(50))
    assert len(df) == 50
    assert all(isinstance(b, bytes) for b in df["payload"])
    for b, sha in zip(df["payload"], df["payload_sha256"]):
        assert hashlib.sha256(b).hexdigest() == sha


def test_frame_sample_counts():
    from har2tree_ray import queries as q

    frames = to_pandas(q.q_media_frames(SF))
    # every sampled index is a multiple of the stride and within range
    assert (frames["frame_idx"] % media.FRAME_SAMPLE_EVERY == 0).all()
    assert (frames["frame_idx"] < frames["n_frames"]).all()
    per_span = frames.groupby(["doc_id", "offset"]).agg(
        n=("frame_idx", "size"), nf=("n_frames", "first"))
    expect = (per_span["nf"] + media.FRAME_SAMPLE_EVERY - 1) // media.FRAME_SAMPLE_EVERY
    assert (per_span["n"] == expect).all()


def test_media_resize_matches_oracle():
    """Resize dims (integer floor aspect fit) + truncated byte count are
    hash-exact against the md5-derived oracle."""
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle("media_resize", "/root/testdata/sf0.001")


def test_media_resize_stub_geometry():
    """The stub obeys the resize contract: fits the box, preserves header
    shape, never upscales, truncates body to the raster bound."""
    from har2tree_ray.stages.media import (MAGIC, MediaResizer, synth_payload)

    r = MediaResizer(max_side=64)
    for ref in ("https://a.example/big.png", "https://b.example/tiny.gif",
                "https://c.example/wide.jpg"):
        p = synth_payload(ref)
        w = int.from_bytes(p[10:12], "big")
        h = int.from_bytes(p[12:14], "big")
        nw, nh, out = r._resize_stub(p)
        assert out.startswith(MAGIC)
        assert max(nw, nh) <= max(64, max(w, h))
        if max(w, h) > 64:
            assert max(nw, nh) == 64
            # aspect preserved under floor division
            if w >= h:
                assert nw == 64 and nh == max(1, h * 64 // w)
            else:
                assert nh == 64 and nw == max(1, w * 64 // h)
        else:
            assert (nw, nh) == (w, h)
        assert int.from_bytes(out[10:12], "big") == nw
        assert int.from_bytes(out[12:14], "big") == nh
        assert len(out) <= 16 + nw * nh * 3


def test_media_dedup_matches_ref_groups():
    """Synth contract: payload bytes are a deterministic function of
    media_ref, so CONTENT groups (sha of bytes) must coincide exactly with
    media_ref groups — same group count, same sizes, same doc spreads."""
    import pandas as pd

    from har2tree_ray.sources.interleaved import read_interleaved
    from har2tree_ray.stages import media
    from har2tree_ray.stages.normalize import explode_spans
    from tests.oracle_utils import to_pandas

    sf = "/root/testdata/sf0.001"
    flat = explode_spans(read_interleaved(sf),
                         ["doc_id", "offset", "media_ref", "kind"])
    got = to_pandas(media.media_dedup(flat)).sort_values(
        "payload_sha256").reset_index(drop=True)
    # independent reference: group the same media spans by media_ref
    spans = to_pandas(media.media_spans(explode_spans(
        read_interleaved(sf), ["doc_id", "offset", "media_ref", "kind"])))
    ref = (spans.groupby("media_ref")
           .agg(n_spans=("doc_id", "size"), n_docs=("doc_id", "nunique"))
           .reset_index())
    ref = ref[ref["n_spans"] >= 2]
    assert len(got) == len(ref)
    # distributions must match exactly (keys differ: sha vs url)
    assert sorted(got["n_spans"]) == sorted(ref["n_spans"])
    assert sorted(got["n_docs"]) == sorted(ref["n_docs"])
    assert (got["n_urls"] == 1).all()  # one URL per content group (synth)
