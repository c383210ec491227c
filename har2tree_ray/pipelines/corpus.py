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


def _exact_dup_map(docs_ds, id_col: str, text_col: str) -> dict:
    """content_hash → keeper doc for every content seen ≥2 times — small by
    construction (only duplicated contents survive the filter)."""
    import pyarrow.compute as pc

    from ..stages import dedup

    dups = dedup.exact_dedup(docs_ds, id_col, text_col).map_batches(
        lambda t: t.filter(pc.greater(t["n_dups"], 1)),
        batch_format="pyarrow").to_pandas()
    return (dict(zip(dups["content_hash"], dups["keep_id"]))
            if len(dups) else {})


def corpus_small_sides(docs_ds, id_col: str = "doc_id",
                       text_col: str = "text") -> tuple[dict, dict]:
    """The two broadcast maps of the curation verdict: duplicated contents
    (hash → keeper) and near-dup components (doc → min doc in component).
    Both small by construction — duplicates and candidate-pair members are
    rare fractions of the corpus."""
    from ..stages import dedup, text

    dup_map = _exact_dup_map(docs_ds, id_col, text_col)
    pairs = text.ngram_jaccard_pairs(docs_ds).select_columns(
        ["doc_a", "doc_b"]).to_pandas()
    root_min = dedup.union_roots(pairs, "doc_a", "doc_b")
    return dup_map, root_min


def corpus_small_sides_lsh(docs_ds, id_col: str = "doc_id",
                           text_col: str = "text", verify: bool = True,
                           **lsh_kw) -> tuple[dict, dict]:
    """Scale-path small sides: near-dup candidates from MinHash-LSH banding
    instead of an exact all-grams self-join over the full corpus.

    The exact path's gram explode is O(total grams) rows through two
    shuffles — fine per-capture, hostile at 10^12 docs where the gram table
    dwarfs the corpus.  Here the corpus flows ONCE through the MinHash
    signing stage (64 perms, 16 bands — see ``dedup.MinHasher``), the shuffle
    moves only (doc, band) fingerprint rows, and the exact Jaccard is then
    recomputed ONLY over the candidate-doc subset (``verify=True``), which
    is near-dup-fraction-sized, not corpus-sized.

    Approximation contract (why the registry entry is rows-only):
    * recall < 1: a true pair the banding curve misses stays missed
      (P(detect) = 1-(1-s^r)^b ≈ 0.9997 at s=τ=0.5 with r=4,b=16);
    * the verify pass runs the exact Jaccard with document frequencies
      computed over the SUBSET, so the df_cap stop-gram cut prunes less
      than a full-corpus run would — pairs among candidates can only be
      a SUPERSET of the full-run pairs restricted to that subset (the
      τ filter itself is exact; with ``verify=False`` you get raw banding
      candidates: higher recall, known false positives).
    """
    from ..stages import dedup, text

    dup_map = _exact_dup_map(docs_ds, id_col, text_col)
    cand = dedup.minhash_candidate_pairs(
        docs_ds, id_col=id_col, text_col=text_col, **lsh_kw).to_pandas()
    if not len(cand):
        return dup_map, {}
    if verify:
        cand_ids = sorted(set(cand["id_a"]) | set(cand["id_b"]))
        ref = ray.put(pa.array(cand_ids))

        def keep_candidates(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.is_in(t[id_col], value_set=ray.get(ref)))

        sub = docs_ds.map_batches(keep_candidates, batch_format="pyarrow")
        pairs = text.ngram_jaccard_pairs(sub).select_columns(
            ["doc_a", "doc_b"]).to_pandas()
    else:
        pairs = cand.rename(columns={"id_a": "doc_a", "id_b": "doc_b"})
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


def corpus_keep_lsh(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                    verify: bool = True, **lsh_kw):
    """``corpus_keep`` with the near-dup side sourced from MinHash-LSH
    banding (``corpus_small_sides_lsh``) — the default above the size knob
    in ``corpus_keep_auto``.  Approximate (rows-only): recall bounded by
    the banding curve, precision exact when ``verify=True``."""
    return corpus_keep(
        docs_ds, id_col, text_col,
        small_sides=corpus_small_sides_lsh(docs_ds, id_col, text_col,
                                           verify=verify, **lsh_kw))


#: above this many documents the exact gram self-join is the wrong plan —
#: its gram-exploded row count (~100 distinct grams/doc) outgrows the
#: corpus through two all-to-all shuffles, while the LSH path moves only
#: 16 fingerprint rows per doc.  Small-corpus runs keep the exact verdict.
LSH_ABOVE_DOCS = 1_000_000


def corpus_keep_auto(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                     lsh_above: int = LSH_ABOVE_DOCS):
    """Route the curation verdict by corpus size: exact n-gram Jaccard below
    ``lsh_above`` documents, MinHash-LSH (verified candidates) above.
    ``count()`` on a parquet-backed dataset is metadata-only — no scan."""
    n = docs_ds.count()
    if n > lsh_above:
        return corpus_keep_lsh(docs_ds, id_col, text_col)
    return corpus_keep(docs_ds, id_col, text_col)


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
