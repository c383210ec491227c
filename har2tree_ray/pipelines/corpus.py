"""End-to-end training-corpus curation — the flagship COMPOSITION of the
training-data operators: quality filter → exact dedup → near-dup cluster
resolution, producing one keep/drop verdict row per document.

Scale shape (the whole point): every small side is small *by construction* —
the exact-dup map holds only contents seen ≥2 times, the near-dup root map
holds only docs that appear in a candidate pair.  Both broadcast once via
``ray.put``; the corpus itself is touched by exactly ONE distributed
``map_batches`` pass that computes the filter verdict and both lookups
inline.  Nothing corpus-sized ever gathers on the driver.

Documented limit: on a corpus whose duplicate FRACTION is itself huge (say
30% of 10^12 docs duplicated), the dup map stops being broadcast-small; the
verdict then becomes a hash-partitioned join instead — shuffle (content_hash
→ keeper) and the docs on content_hash with the same coarse-range pattern as
``dedup.span_hash_groups`` — at the price of moving the corpus once.  The
broadcast plan is correct for the common regime and the join plan is a
mechanical swap, not a redesign.

Verdict precedence (deterministic): filtered > exact_dup_of > near_dup_of.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray


def corpus_small_sides(docs_ds, id_col: str = "doc_id",
                       text_col: str = "text") -> tuple[dict, dict]:
    """The two broadcast maps of the curation verdict: duplicated contents
    (hash → keeper) and near-dup components (doc → min doc in component).
    Both small by construction — duplicates and candidate-pair members are
    rare fractions of the corpus."""
    import pyarrow.compute as pc

    from ..stages import dedup, text

    dups = dedup.exact_dedup(docs_ds, id_col, text_col).map_batches(
        lambda t: t.filter(pc.greater(t["n_dups"], 1)),
        batch_format="pyarrow").to_pandas()
    dup_map = (dict(zip(dups["content_hash"], dups["keep_id"]))
               if len(dups) else {})
    pairs = text.ngram_jaccard_pairs(docs_ds).select_columns(
        ["doc_a", "doc_b"]).to_pandas()
    root_min = dedup.union_roots(pairs, "doc_a", "doc_b")
    return dup_map, root_min


def corpus_keep(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                small_sides: tuple[dict, dict] | None = None):
    """(doc_id, keep, reason) for every document.

    reason: '' when kept; 'filtered:<r1,r2>' | 'exact_dup_of:<id>' |
    'near_dup_of:<id>' otherwise.  A doc survives iff it passes the quality
    filter AND is its content's first doc AND is its near-dup cluster's
    representative (min doc id).

    ``small_sides`` lets a checkpointed job compute the GLOBAL maps once
    and label any partition of the corpus independently (jobs/run_corpus)."""
    from ..stages import text

    dup_map, root_min = (small_sides if small_sides is not None
                         else corpus_small_sides(docs_ds, id_col, text_col))
    ref = ray.put((dup_map, root_min))

    def per_batch(batch: pa.Table) -> pa.Table:
        dmap, rmap = ray.get(ref)
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        keeps, reasons = [], []
        for d, t in zip(ids, texts):
            rs = text.filter_reasons(t)
            if rs:
                keeps.append(False)
                reasons.append("filtered:" + ",".join(rs))
                continue
            h = hashlib.sha256(t.encode("utf-8")).hexdigest()
            keeper = dmap.get(h, d)
            if keeper != d:
                keeps.append(False)
                reasons.append(f"exact_dup_of:{keeper}")
                continue
            rep = rmap.get(d, d)
            if rep != d:
                keeps.append(False)
                reasons.append(f"near_dup_of:{rep}")
                continue
            keeps.append(True)
            reasons.append("")
        return pa.table({
            "doc_id": batch[id_col],
            "keep": pa.array(keeps, pa.bool_()),
            "reason": pa.array(reasons, pa.string()),
        })

    return docs_ds.map_batches(per_batch, batch_format="pyarrow")


def corpus_keep_sql(rel: str = "documents") -> str:
    """Oracle: the same three-stage verdict in one recursive-CTE statement —
    filter reasons, MIN(doc_id) per text, transitive closure over the
    Jaccard pair graph."""
    from ..stages.text import (FILTER_MAX_WORDS, FILTER_MIN_WORDS,
                               FILTER_PUNCT_PCT, FILTER_STOP_PCT,
                               JACCARD_DF_CAP, JACCARD_TAU, STOPWORDS,
                               _jaccard_ctes, _sql_list)

    return ("WITH RECURSIVE " + _jaccard_ctes(rel, JACCARD_TAU, JACCARD_DF_CAP)
            + f""",
eg AS (
    SELECT doc_a AS u, doc_b AS v FROM jpairs
    UNION ALL SELECT doc_b, doc_a FROM jpairs
), reach(a, b) AS (
    SELECT u, v FROM eg
    UNION
    SELECT r.a, eg.v FROM reach r JOIN eg ON r.b = eg.u
), clu AS (
    SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_id
    FROM {rel} d LEFT JOIN reach r ON r.a = d.doc_id
    GROUP BY d.doc_id
), fl AS (
    SELECT doc_id,
           list_sort(list_filter([
               CASE WHEN nw < {FILTER_MIN_WORDS} THEN 'too_short' ELSE '' END,
               CASE WHEN nw > {FILTER_MAX_WORDS} THEN 'too_long' ELSE '' END,
               CASE WHEN ns * 100 < nw * {FILTER_STOP_PCT} THEN 'low_stopword' ELSE '' END,
               CASE WHEN np * 100 > length(text) * {FILTER_PUNCT_PCT} THEN 'high_punct' ELSE '' END
           ], x -> x <> '')) AS rs
    FROM (
        SELECT doc_id, text, len(regexp_extract_all(text, '\\S+')) AS nw,
               len(list_filter(regexp_extract_all(text, '\\S+'),
                               x -> x IN ({_sql_list(STOPWORDS)}))) AS ns,
               len(regexp_extract_all(text, '[^\\w\\s]')) AS np
        FROM {rel}
    )
), ex AS (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS keep_id FROM {rel}
)
SELECT d.doc_id,
       CASE WHEN len(fl.rs) > 0 THEN false
            WHEN ex.keep_id <> d.doc_id THEN false
            WHEN clu.cluster_id <> d.doc_id THEN false
            ELSE true END AS keep,
       CASE WHEN len(fl.rs) > 0
                 THEN 'filtered:' || array_to_string(fl.rs, ',')
            WHEN ex.keep_id <> d.doc_id
                 THEN 'exact_dup_of:' || CAST(ex.keep_id AS VARCHAR)
            WHEN clu.cluster_id <> d.doc_id
                 THEN 'near_dup_of:' || CAST(clu.cluster_id AS VARCHAR)
            ELSE '' END AS reason
FROM {rel} d
JOIN fl ON fl.doc_id = d.doc_id
JOIN ex ON ex.doc_id = d.doc_id
JOIN clu ON clu.doc_id = d.doc_id
""")
