"""Multimodal (image / audio / video) column plumbing.

The reference holds response bodies and downloaded blobs as BytesIO
(/root/reference/har2tree/nodes.py:549-553, har2tree.py:158-170); here media
payloads are opaque ``large_binary`` columns with typed metadata, and
decode / feature-extract / frame-sample are ``map_batches`` stages — the
decode itself is an actor-pool stage so a real codec (PIL / ffmpeg) loads
once per worker.

THIS CONTAINER HAS NO IMAGE/AUDIO LIBS: the decode step is a clearly-marked
deterministic stub — payload bytes are synthesized from the media_ref
(blake2b keystream behind a parseable fake header) and "decoding" parses
that header back.  The Ray-side plumbing — binary schema, small batch sizes
for wide rows, actor signature, output layout — is real and tested; swap
``_decode_stub`` for a PIL/av call on a real cluster (see ``MediaDecoder``).

Feature values are derived from ascii codes of the payload's md5-derived
header fields so a DuckDB oracle can recompute them exactly.

Scale notes: payload columns make blocks wide — ``attach_payloads`` and the
decoder run with small ``batch_size`` (256) so batch × concurrency stays in
worker heap; frame sampling multiplies rows, never bytes (frames reference
byte ranges, they don't copy them).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_KINDS = ("img", "media")
FRAME_SAMPLE_EVERY = 30
MAGIC = b"FAKEMEDIA1"
PAYLOAD_BATCH = 256


def _hex_ascii(h: str, i: int) -> int:
    """ascii code of the i-th (1-based) char of a hex digest — mirrors
    DuckDB ``ascii(substr(md5(x), i, 1))``."""
    return ord(h[i - 1])


def fake_media_meta(media_ref: str) -> dict:
    """Deterministic metadata a real decoder would produce, derived from
    md5(media_ref) so the SQL oracle reproduces it bit-for-bit."""
    h = hashlib.md5(media_ref.encode("utf-8")).hexdigest()
    return {
        "n_bytes": 256 + (_hex_ascii(h, 1) * 256 + _hex_ascii(h, 2)) % 3840,
        "width": 16 + (_hex_ascii(h, 3) * 256 + _hex_ascii(h, 4)) % 1008,
        "height": 16 + (_hex_ascii(h, 5) * 256 + _hex_ascii(h, 6)) % 1008,
        "n_frames": 1 + _hex_ascii(h, 7) % 240,
    }


def synth_payload(media_ref: str) -> bytes:
    """Opaque binary payload: parseable header + seeded pseudo-random body
    (seed from the ref's md5 — deterministic, one C call per payload)."""
    m = fake_media_meta(media_ref)
    header = (MAGIC
              + m["width"].to_bytes(2, "big") + m["height"].to_bytes(2, "big")
              + m["n_frames"].to_bytes(2, "big"))
    body_len = m["n_bytes"] - len(header)
    body = hashlib.shake_256(media_ref.encode("utf-8")).digest(body_len)
    return header + body


def media_features_sql(flat_path: str) -> str:
    """Oracle: recompute the decoder's outputs straight from md5(media_ref)
    over the same interleaved parquet."""
    def f(i: int) -> str:
        return f"ascii(substr(md5(s.media_ref), {i}, 1))"

    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
)
SELECT doc_id,
       CAST(s."offset" AS INTEGER) AS "offset",
       s.media_ref AS media_ref,
       s.kind AS kind,
       CAST(256 + ({f(1)} * 256 + {f(2)}) % 3840 AS BIGINT) AS n_bytes,
       CAST(16 + ({f(3)} * 256 + {f(4)}) % 1008 AS BIGINT) AS width,
       CAST(16 + ({f(5)} * 256 + {f(6)}) % 1008 AS BIGINT) AS height,
       CAST(1 + {f(7)} % 240 AS BIGINT) AS n_frames
FROM ex WHERE s.kind IN ('img', 'media')
"""


def media_frames_sql(flat_path: str, every: int = FRAME_SAMPLE_EVERY) -> str:
    def f(i: int) -> str:
        return f"ascii(substr(md5(s.media_ref), {i}, 1))"

    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), m AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
           s.media_ref AS media_ref,
           1 + {f(7)} % 240 AS n_frames
    FROM ex WHERE s.kind = 'media'
)
SELECT doc_id, "offset", media_ref,
       CAST(fi AS BIGINT) AS frame_idx,
       CAST(n_frames AS BIGINT) AS n_frames
FROM m, UNNEST(range(0, n_frames, {every})) AS t(fi)
"""


# ----------------------------------------------------------- payload attach


def attach_payloads(batch: pa.Table) -> pa.Table:
    """media spans → + ``payload: large_binary`` (+ sha).  In production the
    payload column comes off storage with the row; here it is synthesized."""
    refs = batch["media_ref"].to_pylist()
    payloads = [synth_payload(r) for r in refs]
    return batch.append_column(
        "payload", pa.array(payloads, pa.large_binary())
    ).append_column(
        "payload_sha256",
        pa.array([hashlib.sha256(p).hexdigest() for p in payloads], pa.string()),
    )


def media_spans(flat_ds):
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["kind"], pa.array(MEDIA_KINDS)))

    return flat_ds.select_columns(
        ["doc_id", "offset", "media_ref", "kind"]
    ).map_batches(keep, batch_format="pyarrow")


def media_payloads(flat_ds):
    """Binary-column plumbing end-to-end (rows-only check: sha/bytes are not
    SQL-reproducible)."""
    return media_spans(flat_ds).map_batches(
        attach_payloads, batch_format="pyarrow", batch_size=PAYLOAD_BATCH)


# ------------------------------------------------------------ binary dedup


def media_dedup(flat_ds, min_count: int = 2):
    """Exact CONTENT dedup over the binary modality — the dedup family's
    multimodal member: group media spans by the sha256 of their payload
    bytes (not by URL), reusing the text family's coarse hash-range plan
    (``dedup.span_hash_groups``: hashes are uniform, ONE balanced shuffle).

    Rows-only by nature (the sha of synthesized bytes is not
    SQL-expressible); correctness is pytest-checked against the synth
    contract's equivalence — payload bytes are a deterministic function of
    ``media_ref``, so content groups must coincide exactly with media_ref
    groups (test_media.py::test_media_dedup_matches_ref_groups).  On real
    data the hash-of-bytes grouping is the point: identical images served
    from different URLs collapse, which the URL grouping cannot do.
    """
    from . import dedup

    # payload bytes are hashed and DROPPED inside this stage, so the
    # wide-row batch cap (PAYLOAD_BATCH=256, sized for stages that RETURN
    # payload columns) doesn't apply — 2048 measured 5.4 -> 3.1 s at sf0.1
    spans = media_spans(flat_ds).map_batches(
        attach_payloads, batch_format="pyarrow", batch_size=2048)

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({"body_hash": t["payload_sha256"],
                         "doc_id": t["doc_id"],
                         "media_ref": t["media_ref"]})

    groups = dedup.span_hash_groups(
        spans.map_batches(slim, batch_format="pyarrow"), min_count=min_count)
    return groups.map_batches(
        lambda t: t.rename_columns(
            ["payload_sha256"] + t.column_names[1:]),
        batch_format="pyarrow")


# ------------------------------------------------------------------ decoder


class MediaDecoder:
    """Actor-pool decode stage: ``large_binary`` payload → typed features.

    __init__ is where a real codec loads once per actor; __call__ decodes a
    batch.  The real path is gated on import so the same class works in a
    container that has PIL — everything else about the stage (schema, batch
    size, actor pool) is production-shaped."""

    def __init__(self) -> None:
        try:  # real decoder, once per actor — absent in this container
            import PIL.Image  # noqa: F401
            self._real = True
        except ImportError:
            self._real = False

    def _decode_stub(self, payload: bytes) -> tuple[int, int, int]:
        if not payload.startswith(MAGIC):
            raise ValueError("bad magic")
        w = int.from_bytes(payload[10:12], "big")
        h = int.from_bytes(payload[12:14], "big")
        nf = int.from_bytes(payload[14:16], "big")
        return w, h, nf

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._real:
            # same policy as MediaResizer: the synthetic payloads are not
            # real image bytes, so warn and use the deterministic stub
            # instead of hard-failing wherever Pillow is installed
            import logging

            logging.getLogger("har2tree_ray.media").warning(
                "PIL importable but payloads are synthetic; using the "
                "deterministic stub decoder")
            self._real = False
        payloads = batch["payload"].to_pylist()
        dims = [self._decode_stub(p) for p in payloads]
        out = batch.drop_columns(["payload", "payload_sha256"])
        return out.append_column(
            "n_bytes", pa.array([len(p) for p in payloads], pa.int64())
        ).append_column(
            "width", pa.array([d[0] for d in dims], pa.int64())
        ).append_column(
            "height", pa.array([d[1] for d in dims], pa.int64())
        ).append_column(
            "n_frames", pa.array([d[2] for d in dims], pa.int64())
        )


def _codec_available() -> bool:
    try:  # the actor-pool gate: a REAL codec is heavy per-process state
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def media_features(flat_ds, concurrency=None):
    """payload attach → decode → feature columns (oracled).

    Deployment is routed on setup weight, the same policy as
    ``util.worker_cached_stage``: with a real codec importable the decoder
    is an ACTOR POOL (codec loads once per actor — the case the pool
    exists for); the stub decoder's setup is microseconds, so it runs as
    plain tasks with a per-worker memo — the pool's cpus//2 fresh
    processes per Dataset execution cost ~1-2 s per QUERY for nothing."""
    from .parser import default_pool_size
    from ..util import task_concurrency, worker_cached_stage

    if _codec_available():
        return media_payloads(flat_ds).map_batches(
            MediaDecoder,
            batch_format="pyarrow",
            batch_size=PAYLOAD_BATCH,
            concurrency=concurrency or default_pool_size(),
        )
    return media_payloads(flat_ds).map_batches(
        worker_cached_stage(MediaDecoder),
        batch_format="pyarrow",
        batch_size=PAYLOAD_BATCH,
        **task_concurrency(concurrency),
    )


# ------------------------------------------------------------ frame sample


def frame_sample(flat_ds, every: int = FRAME_SAMPLE_EVERY):
    """kind='media' spans → one row per sampled frame index (row expansion
    via repeated take — no payload bytes are duplicated)."""
    feats = media_features(flat_ds)

    def expand(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch["kind"], "media"))
        nf = t["n_frames"].to_numpy(zero_copy_only=False)
        counts = (nf + every - 1) // every  # frames 0, every, 2*every, ...
        idx = np.repeat(np.arange(t.num_rows), counts)
        frame_idx = np.concatenate(
            [np.arange(0, n, every) for n in nf]) if len(nf) else np.array([], np.int64)
        out = t.select(["doc_id", "offset", "media_ref", "n_frames"]).take(pa.array(idx))
        return out.append_column("frame_idx", pa.array(frame_idx, pa.int64()))

    return feats.map_batches(expand, batch_format="pyarrow")


# ---------------------------------------------------------------- resize


RESIZE_MAX_SIDE = 64


class MediaResizer:
    """Actor-pool resize stage: payload → payload with dimensions fit into
    a ``max_side`` box, aspect ratio preserved with integer floor math so
    the DuckDB oracle recomputes the dims exactly.

    Same real-codec gating as ``MediaDecoder``: ``__init__`` is where PIL
    would load once per actor; this container has no codecs, so the stub
    rewrites the fake header and truncates the body to the resized raster
    bound (bytes are never duplicated row-to-row).  A genuinely heavy
    per-actor codec is exactly the case that KEEPS the actor pool (vs the
    worker-cached task stages used for microsecond-setup state)."""

    def __init__(self, max_side: int = RESIZE_MAX_SIDE) -> None:
        self.max_side = max_side
        try:  # real resampler, once per actor — absent in this container
            import PIL.Image  # noqa: F401
            self._real = True
        except ImportError:
            self._real = False

    def _resize_stub(self, payload: bytes) -> tuple[int, int, bytes]:
        w = int.from_bytes(payload[10:12], "big")
        h = int.from_bytes(payload[12:14], "big")
        nf = payload[14:16]
        s = self.max_side
        if max(w, h) <= s:
            nw, nh = w, h
        elif w >= h:
            nw, nh = s, max(1, h * s // w)
        else:
            nw, nh = max(1, w * s // h), s
        body = payload[16:][: nw * nh * 3]
        return nw, nh, MAGIC + nw.to_bytes(2, "big") + nh.to_bytes(2, "big") + nf + body

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._real:
            # a real PIL resample path is not implemented yet; warn once
            # per actor and keep the deterministic stub so the registered
            # query works wherever Pillow happens to be installed
            import logging

            logging.getLogger("har2tree_ray.media").warning(
                "PIL importable but the real resize path is not "
                "implemented; using the deterministic stub resampler")
            self._real = False
        payloads = batch["payload"].to_pylist()
        resized = [self._resize_stub(p) for p in payloads]
        out = batch.drop_columns(["payload", "payload_sha256"])
        return out.append_column(
            "width", pa.array([int.from_bytes(p[10:12], "big") for p in payloads], pa.int64())
        ).append_column(
            "height", pa.array([int.from_bytes(p[12:14], "big") for p in payloads], pa.int64())
        ).append_column(
            "new_width", pa.array([r[0] for r in resized], pa.int64())
        ).append_column(
            "new_height", pa.array([r[1] for r in resized], pa.int64())
        ).append_column(
            "n_bytes_out", pa.array([len(r[2]) for r in resized], pa.int64())
        ).append_column(
            "payload_out", pa.array([r[2] for r in resized], pa.large_binary())
        )


def media_resize(flat_ds, max_side: int = RESIZE_MAX_SIDE, concurrency=None):
    """payload attach → actor-pool resize; the oracle-facing projection
    drops the binary column (DuckDB cannot recompute the keystream bytes —
    their LENGTH is the oracled contract)."""
    from .parser import default_pool_size
    from ..util import task_concurrency, worker_cached_stage

    if _codec_available():
        resized = media_payloads(flat_ds).map_batches(
            MediaResizer,
            fn_constructor_kwargs={"max_side": max_side},
            batch_format="pyarrow",
            batch_size=PAYLOAD_BATCH,
            concurrency=concurrency or default_pool_size(),
        )
    else:  # stub resampler: microsecond setup — plain tasks, per-worker memo
        resized = media_payloads(flat_ds).map_batches(
            worker_cached_stage(MediaResizer, max_side=max_side),
            batch_format="pyarrow",
            batch_size=PAYLOAD_BATCH,
            **task_concurrency(concurrency),
        )
    return resized.drop_columns(["payload_out"])


def media_resize_sql(flat_path: str, max_side: int = RESIZE_MAX_SIDE) -> str:
    """Oracle: header dims from md5(media_ref) (as media_features_sql), the
    same integer floor-scaling, byte count = header + min(body, 3·raster)."""
    def f(i: int) -> str:
        return f"ascii(substr(md5(s.media_ref), {i}, 1))"

    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), m AS (
    SELECT doc_id,
           CAST(s."offset" AS INTEGER) AS "offset",
           s.media_ref AS media_ref,
           s.kind AS kind,
           256 + ({f(1)} * 256 + {f(2)}) % 3840 AS n_bytes,
           16 + ({f(3)} * 256 + {f(4)}) % 1008 AS width,
           16 + ({f(5)} * 256 + {f(6)}) % 1008 AS height
    FROM ex WHERE s.kind IN ('img', 'media')
), r AS (
    SELECT *,
        CASE WHEN greatest(width, height) <= {max_side} THEN width
             WHEN width >= height THEN {max_side}
             ELSE greatest(1, (width * {max_side}) // height) END AS new_width,
        CASE WHEN greatest(width, height) <= {max_side} THEN height
             WHEN width >= height THEN greatest(1, (height * {max_side}) // width)
             ELSE {max_side} END AS new_height
    FROM m
)
SELECT doc_id, "offset", media_ref, kind,
       CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
       CAST(new_width AS BIGINT) AS new_width,
       CAST(new_height AS BIGINT) AS new_height,
       CAST(16 + least(n_bytes - 16, new_width * new_height * 3) AS BIGINT)
           AS n_bytes_out
FROM r
"""
