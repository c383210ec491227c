"""Query registry: every implemented operator/pipeline exposed as a callable
``(sf_dir) -> Dataset`` plus, where SQL can express the same semantics, an
ANSI-SQL oracle string for DuckDB (driver contract — __ray_entry__.py).

The interleaved-document queries run on the deterministic synthetic table
(har2tree_ray.synth) derived from the sf tier; their oracles read the *same*
raw parquet via ``read_parquet`` and recompute independently with
unnest + regexp + arithmetic.  Column names and types match the engine
outputs exactly (the driver hash-compares by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable

from .sources.interleaved import read_interleaved, read_table
from .stages import dedup
from .stages.normalize import flat_spans
from .pipelines import stats, tiling
from .synth import ensure_interleaved, interleaved_path

RES = tiling.DEFAULT_RES

# ------------------------------------------------------------- SQL fragments

_FLAT_CTE = """
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s
    FROM read_parquet('{path}/*.parquet')
),
flat AS (
    SELECT doc_id,
           s.kind AS kind,
           s.text AS text,
           s.media_ref AS media_ref,
           s."offset" AS "offset",
           COALESCE(TRY_CAST(regexp_extract(s.text, '@status=(-?\\d+)', 1) AS INTEGER), 200) AS status,
           COALESCE(TRY_CAST(regexp_extract(s.text, '@geo=(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 1) AS DOUBLE), 0.0) AS lat,
           COALESCE(TRY_CAST(regexp_extract(s.text, '@geo=(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 2) AS DOUBLE), 0.0) AS lng,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS hostname,
           regexp_extract(s.media_ref, '^([a-z]+):', 1) AS scheme
    FROM ex
)
"""

_CELL_CTE = """
cells AS (
    SELECT *,
        LEAST(GREATEST(CAST(FLOOR((lng + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS cell_x,
        LEAST(GREATEST(CAST(FLOOR((90.0 - lat) / 180.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS cell_y
    FROM flat
)
"""


def _flat_cte(sf_dir: str) -> str:
    return _FLAT_CTE.format(path=interleaved_path(_sf_name(sf_dir)))


def _sf_name(sf_dir: str) -> str:
    import os

    return os.path.basename(os.path.normpath(sf_dir))


# ---------------------------------------------------------- engine callables


def q_flatten_spans(sf_dir: str):
    ds = flat_spans(read_interleaved(sf_dir))
    return ds.select_columns(
        ["doc_id", "offset", "kind", "media_ref", "scheme", "hostname",
         "status", "lat", "lng", "text_len", "body_hash"]
    )


def q_doc_stats(sf_dir: str):
    return stats.doc_stats(read_interleaved(sf_dir))


def q_kind_rollup(sf_dir: str):
    return stats.kind_rollup(read_interleaved(sf_dir))


def q_span_dedup(sf_dir: str):
    return dedup.span_hash_groups(flat_spans(read_interleaved(sf_dir)))


def q_tile_assign(sf_dir: str):
    return tiling.tile_assign(flat_spans(read_interleaved(sf_dir), drop_text=True), RES)


def q_tile_rollup(sf_dir: str):
    return tiling.tile_rollup(flat_spans(read_interleaved(sf_dir), drop_text=True), RES)


def q_tile_vectorize(sf_dir: str):
    return tiling.tile_vectorize(flat_spans(read_interleaved(sf_dir), drop_text=True), RES)


# -------------------------------------------------------------- oracle SQL


def _oracle_flatten(path: str) -> str:
    return _FLAT_CTE.format(path=path) + """
SELECT doc_id, "offset", kind, media_ref, scheme, hostname, status, lat, lng,
       CAST(length(text) AS BIGINT) AS text_len,
       sha256(text) AS body_hash
FROM flat
"""


def _oracle_doc_stats(path: str) -> str:
    return _FLAT_CTE.format(path=path) + """
SELECT doc_id,
       COUNT(*) AS n_spans,
       COUNT(DISTINCT media_ref) AS n_unique_urls,
       COUNT(DISTINCT CASE WHEN hostname <> '' THEN hostname END) AS n_unique_hostnames,
       CAST(SUM(CASE WHEN text LIKE '%@redirect=%' THEN 1 ELSE 0 END) AS BIGINT) AS n_redirects,
       CAST(SUM(CASE WHEN status <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_status0,
       CAST(SUM(length(text)) AS BIGINT) AS total_text_chars,
       CAST(MAX("offset") AS BIGINT) AS max_offset
FROM flat
GROUP BY doc_id
"""


def _oracle_kind_rollup(path: str) -> str:
    return _FLAT_CTE.format(path=path) + """
SELECT kind,
       COUNT(*) AS n_spans,
       CAST(SUM(length(text)) AS BIGINT) AS total_text_chars
FROM flat
GROUP BY kind
"""


def _oracle_span_dedup(path: str) -> str:
    return _FLAT_CTE.format(path=path) + """
SELECT sha256(text) AS body_hash,
       COUNT(*) AS n_spans,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(DISTINCT media_ref) AS n_urls
FROM flat
GROUP BY 1
HAVING COUNT(*) >= 2
"""


def _oracle_tile_assign(path: str, res: int = RES) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
SELECT doc_id, "offset",
       CAST({res} AS INTEGER) AS res,
       cell_x, cell_y,
       cell_y * {n} + cell_x AS cell_id,
       (cell_y // 2) * {n // 2} + (cell_x // 2) AS parent_cell_id
FROM cells
""")


def _oracle_tile_rollup(path: str, res: int = RES) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
SELECT cell_y * {n} + cell_x AS cell_id,
       COUNT(*) AS n_spans,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(DISTINCT hostname) AS n_hosts
FROM cells
GROUP BY 1
""")


def _oracle_tile_vectorize(path: str, res: int = RES) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
SELECT cell_y * {n} + cell_x AS cell_id,
       COUNT(*) AS n_spans,
       CAST(cell_x AS DOUBLE) / {n}.0 * 360.0 - 180.0 AS min_lng,
       90.0 - (CAST(cell_y AS DOUBLE) + 1.0) / {n}.0 * 180.0 AS min_lat,
       (CAST(cell_x AS DOUBLE) + 1.0) / {n}.0 * 360.0 - 180.0 AS max_lng,
       90.0 - CAST(cell_y AS DOUBLE) / {n}.0 * 180.0 AS max_lat
FROM cells
GROUP BY cell_x, cell_y
""")


# ----------------------------------------------------------------- registry

_INTERLEAVED_ORACLES = {
    "flatten_spans": _oracle_flatten,
    "doc_stats": _oracle_doc_stats,
    "kind_rollup": _oracle_kind_rollup,
    "span_dedup": _oracle_span_dedup,
    "tile_assign": _oracle_tile_assign,
    "tile_rollup": _oracle_tile_rollup,
    "tile_vectorize": _oracle_tile_vectorize,
}


def queries() -> dict[str, Callable]:
    return {
        "flatten_spans": q_flatten_spans,
        "doc_stats": q_doc_stats,
        "kind_rollup": q_kind_rollup,
        "span_dedup": q_span_dedup,
        "tile_assign": q_tile_assign,
        "tile_rollup": q_tile_rollup,
        "tile_vectorize": q_tile_vectorize,
    }


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Oracle SQL strings for the driver (sf0.01).  Synthesizes the
    interleaved input if missing so the paths inside the SQL resolve
    regardless of evaluation order."""
    path = ensure_interleaved(sf_dir)
    return {name: make(path) for name, make in _INTERLEAVED_ORACLES.items()}
