"""Text-analysis operators over the ``documents`` table — the training-data
pipeline additions (no har2tree counterpart; the reference's nearest analog is
the per-body hashing/feature extraction in har2tree/nodes.py:541-567).

Every operator is a vectorized ``map_batches(fn, batch_format="pyarrow")``
stage with module-level compiled patterns (no per-batch recompiles) and a
DuckDB-expressible definition so the driver's oracle can hash-compare:

* ``token_stats``   — whitespace + BPE-ish regex token counting
* ``quality_stats`` — length / punctuation / stopword-ratio quality scoring
* ``langid``        — deterministic stopword+CJK n-gram language heuristic
* ``fingerprints``  — winnowing document fingerprint (min rolling-window md5)
* ``ngram_jaccard_pairs`` — exact n-gram Jaccard near-dup join

Scale notes: all single-pass per row except the Jaccard join, whose only
shuffles are keyed on (gram) then (doc pair); hot grams (stop-grams) are cut
by document frequency (DF_CAP) *before* the pair expansion, which is what
bounds the per-group fan-out at corpus scale — the per-doc distinct-gram
count is attached to every gram row at explode time (denormalized) so no
extra join against a counts table is needed.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

# --- shared vocab/patterns (compiled once per process) ----------------------

_WS_TOKEN = re.compile(r"\S+")
# BPE-ish pre-tokenizer: letter runs | digit runs | single other-glyph
_BPE_TOKEN = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_BPE_SQL = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
_PUNCT = re.compile(r"[^\w\s]")
_CJK = re.compile("[一-鿿]")
_CJK_SQL = "[\\x{4E00}-\\x{9FFF}]"

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "for",
             "on", "with", "as", "at", "by")

# Per-language function-word sets for the lang-ID heuristic; checked in
# alphabetical order of language code for a deterministic arg-max tie-break.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von"),
    "en": ("the", "a", "and", "of", "to", "is", "in", "it", "for"),
    "es": ("el", "la", "que", "de", "y", "los", "las", "un", "una", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "dans"),
}
FINGERPRINT_WINDOW = 8  # words per rolling window
JACCARD_GRAM = 4        # words per shingle
JACCARD_DF_CAP = 50     # drop grams present in more docs (stop-gram cut)
JACCARD_TAU = 0.5


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ------------------------------------------------------------- token stats


def _token_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    n_ws = [len(_WS_TOKEN.findall(t)) for t in texts]
    bpe = [_BPE_TOKEN.findall(t) for t in texts]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_ws_tokens": pa.array(n_ws, pa.int64()),
        "n_bpe_tokens": pa.array([len(b) for b in bpe], pa.int64()),
        "n_unique_bpe": pa.array([len(set(b)) for b in bpe], pa.int64()),
        "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
    })


def token_stats(ds):
    return ds.map_batches(_token_batch, batch_format="pyarrow")


def token_stats_sql(rel: str = "documents") -> str:
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_SQL}'))) AS BIGINT) AS n_unique_bpe,
       CAST(length(text) AS BIGINT) AS n_chars
FROM {rel}
"""


# ----------------------------------------------------------- quality score


def _quality_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    stop = set(STOPWORDS)
    n_chars, n_words, n_stop, n_punct, mean_wl, ratio, score = [], [], [], [], [], [], []
    for t in texts:
        words = _WS_TOKEN.findall(t)
        nw = len(words)
        ns = sum(1 for w in words if w in stop)
        total_wc = sum(len(w) for w in words)
        n_chars.append(len(t))
        n_words.append(nw)
        n_stop.append(ns)
        n_punct.append(len(_PUNCT.findall(t)))
        mean_wl.append(total_wc / nw if nw else 0.0)
        r = ns / nw if nw else 0.0
        ratio.append(r)
        score.append(0.5 * r + min(nw, 100) / 200.0)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_words": pa.array(n_words, pa.int64()),
        "n_stopwords": pa.array(n_stop, pa.int64()),
        "n_punct": pa.array(n_punct, pa.int64()),
        "mean_word_len": pa.array(mean_wl, pa.float64()),
        "stopword_ratio": pa.array(ratio, pa.float64()),
        "quality_score": pa.array(score, pa.float64()),
    })


def quality_stats(ds):
    return ds.map_batches(_quality_batch, batch_format="pyarrow")


def quality_stats_sql(rel: str = "documents") -> str:
    # float expressions mirror the Python op order exactly (exact compare)
    return f"""
WITH w AS (
    SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS words,
           len(list_filter(regexp_extract_all(text, '\\S+'),
                           x -> x IN ({_sql_list(STOPWORDS)}))) AS ns
    FROM {rel}
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(ns AS BIGINT) AS n_stopwords,
       CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_punct,
       CASE WHEN len(words) = 0 THEN 0.0
            ELSE CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words)
       END AS mean_word_len,
       CASE WHEN len(words) = 0 THEN 0.0
            ELSE CAST(ns AS DOUBLE) / len(words) END AS stopword_ratio,
       0.5 * (CASE WHEN len(words) = 0 THEN 0.0
                   ELSE CAST(ns AS DOUBLE) / len(words) END)
           + LEAST(len(words), 100) / 200.0 AS quality_score
FROM w
"""


# ------------------------------------------------------------------ lang ID


def _langid_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    sets = {lang: set(ws) for lang, ws in LANG_STOPWORDS.items()}
    langs = sorted(LANG_STOPWORDS)  # alphabetical = tie-break order
    preds, scores = [], []
    for t in texts:
        words = _WS_TOKEN.findall(t)
        sc = {lang: sum(1 for w in words if w in sets[lang]) for lang in langs}
        sc["zh"] = len(_CJK.findall(t))
        best = max(sc.values())
        if best == 0:
            preds.append("und")
            scores.append(0)
        else:
            preds.append(next(lang for lang in sorted(sc) if sc[lang] == best))
            scores.append(best)
    return pa.table({
        "doc_id": batch["doc_id"],
        "lang_pred": pa.array(preds, pa.string()),
        "lang_score": pa.array(scores, pa.int64()),
    })


def langid(ds):
    return ds.map_batches(_langid_batch, batch_format="pyarrow")


def langid_sql(rel: str = "documents") -> str:
    score_cols = ",\n".join(
        f"           len(list_filter(regexp_extract_all(text, '\\S+'), "
        f"x -> x IN ({_sql_list(ws)}))) AS s_{lang}"
        for lang, ws in LANG_STOPWORDS.items()
    )
    langs = sorted(list(LANG_STOPWORDS) + ["zh"])
    cases = "\n".join(f"            WHEN s_{la} = g THEN '{la}'" for la in langs)
    return f"""
WITH s AS (
    SELECT doc_id,
{score_cols},
           len(regexp_extract_all(text, '{_CJK_SQL}')) AS s_zh
    FROM {rel}
), g AS (
    SELECT *, GREATEST({", ".join("s_" + la for la in langs)}) AS g FROM s
)
SELECT doc_id,
       CASE WHEN g = 0 THEN 'und'
{cases}
       END AS lang_pred,
       CAST(g AS BIGINT) AS lang_score
FROM g
"""


# -------------------------------------------------- winnowing fingerprint


def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    w = FINGERPRINT_WINDOW
    out = []
    for t in texts:
        words = _WS_TOKEN.findall(t)
        if len(words) <= w:
            windows = [" ".join(words)]
        else:
            windows = [" ".join(words[i:i + w]) for i in range(len(words) - w + 1)]
        out.append(min(hashlib.md5(g.encode("utf-8")).hexdigest() for g in windows))
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": pa.array(out, pa.string()),
    })


def fingerprints(ds):
    return ds.map_batches(_fingerprint_batch, batch_format="pyarrow")


def fingerprints_sql(rel: str = "documents") -> str:
    w = FINGERPRINT_WINDOW
    return f"""
WITH w AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM {rel}
), g AS (
    SELECT doc_id, md5(array_to_string(ws[i:i + {w - 1}], ' ')) AS h
    FROM w, UNNEST(range(1, GREATEST(len(ws) - {w - 1}, 1) + 1)) AS t(i)
)
SELECT doc_id, MIN(h) AS fingerprint FROM g GROUP BY doc_id
"""


# ----------------------------------------- vectorized shingle hashing (r5)
#
# The gram-explode family (dup_spans, jaccard explode, MinHash shingles) was
# the engine's largest remaining Python inner loop: per-GRAM ``" ".join`` +
# ``hashlib`` calls, O(total words) Python work per batch.  Replaced by one
# batch-level pass: tokenize once per doc (a single C-level regex call),
# siphash the UNIQUE tokens of the whole batch (pandas ``hash_array`` with
# ``categorize=True`` — C-speed, words are Zipfian so uniques << total),
# then combine each k-window with a vectorized uint64 polynomial (k numpy
# gather+fma passes over the whole batch, wraparound multiplicative mixing).
# Two independent 64-bit hashes (different sip keys AND bases) give a
# 128-bit shingle identity: the engine-side dup/intersection tests key on
# (h1, h2), so an md5-vs-polynomial disagreement with the DuckDB oracle
# needs a 128-bit collision (~1e-14 at 1e12 grams).  The oracles keep md5 —
# the hash never appears in any output column, only positions/counts do.

_SHINGLE_KEY1 = "graft-shingle-h1"  # 16-byte siphash keys (pandas contract)
_SHINGLE_KEY2 = "graft-shingle-h2"
_SH_B1 = 0x9E3779B97F4A7C15  # odd 64-bit mixing bases (splitmix64 / xxhash)
_SH_B2 = 0xC2B2AE3D27D4EB4F


def shingle_hash_batch(texts, k: int, short: str = "drop", dual: bool = True):
    """Vectorized k-word shingle hashes for a batch of documents.

    Returns ``(doc_idx, pos, h1, h2)`` numpy arrays: int64 index into
    ``texts``, 1-based word position of the shingle start, and one or two
    (``dual``) uint64 shingle hashes.  ``short`` picks the under-k-words
    edge rule: ``"drop"`` emits nothing for docs with < k words (dup_spans
    semantics), ``"whole"`` emits ONE shingle covering all the doc's words,
    the empty doc hashing the empty sequence (jaccard / minhash semantics).
    Identical word sequences hash identically across batches and modes."""
    import numpy as np
    import pandas as pd

    # str.split() emits the identical token stream to the oracles'
    # regexp_extract_all('\\S+') and is ~2x faster than re.findall
    toks = [t.split() for t in texts]
    lens = np.fromiter((len(w) for w in toks), dtype=np.int64, count=len(toks))
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    o = 0
    for w in toks:
        flat[o:o + len(w)] = w
        o += len(w)
    # categorize=False: the factorize pre-pass loses badly when uniques are
    # a large fraction of the batch (1.65 s vs 0.34 s on a 500k-vocab 2M-word
    # batch) and saves only ~0.03 s on a fully repetitive one
    wh1 = pd.util.hash_array(flat, hash_key=_SHINGLE_KEY1, categorize=False)
    wh2 = (pd.util.hash_array(flat, hash_key=_SHINGLE_KEY2, categorize=False)
           if dual else None)
    offsets = np.zeros(len(toks), dtype=np.int64)
    if len(toks) > 1:
        offsets[1:] = np.cumsum(lens)[:-1]

    n_sh = np.maximum(lens - k + 1, 0)
    tot = int(n_sh.sum())
    doc_idx = np.repeat(np.arange(len(toks), dtype=np.int64), n_sh)
    excl = np.zeros(len(toks), dtype=np.int64)
    if len(toks) > 1:
        excl[1:] = np.cumsum(n_sh)[:-1]
    seg = np.arange(tot, dtype=np.int64) - np.repeat(excl, n_sh)
    gstart = np.repeat(offsets, n_sh) + seg
    b1, b2 = np.uint64(_SH_B1), np.uint64(_SH_B2)
    # polynomial over CONTIGUOUS slices of the flat word-hash array (windows
    # that straddle a doc boundary are computed too, then discarded by the
    # single gather at the end) — k slice-fmas beat k fancy-index gathers
    nwin = max(total - k + 1, 0)
    s1 = np.zeros(nwin, dtype=np.uint64)
    s2 = np.zeros(nwin, dtype=np.uint64) if dual else None
    for i in range(k):
        s1 = s1 * b1 + wh1[i:nwin + i]
        if dual:
            s2 = s2 * b2 + wh2[i:nwin + i]
    h1 = s1[gstart]
    h2 = s2[gstart] if dual else None
    pos = seg + 1

    if short == "whole":
        short_docs = np.flatnonzero(lens < k)
        if len(short_docs):
            s1 = np.zeros(len(short_docs), dtype=np.uint64)
            s2 = np.zeros(len(short_docs), dtype=np.uint64) if dual else None
            # rare path: one Python iteration per SHORT DOC (not per gram);
            # Python-int arithmetic + mask avoids numpy SCALAR overflow
            # warnings (array ops above wrap silently by contract)
            mask = (1 << 64) - 1
            for row, d in enumerate(short_docs):
                sl = slice(offsets[d], offsets[d] + lens[d])
                v1 = 0
                for x in wh1[sl].tolist():
                    v1 = (v1 * _SH_B1 + x) & mask
                s1[row] = v1
                if dual:
                    v2 = 0
                    for x in wh2[sl].tolist():
                        v2 = (v2 * _SH_B2 + x) & mask
                    s2[row] = v2
            doc_idx = np.concatenate([doc_idx, short_docs])
            pos = np.concatenate([pos, np.ones(len(short_docs), np.int64)])
            h1 = np.concatenate([h1, s1])
            if dual:
                h2 = np.concatenate([h2, s2])
            order = np.argsort(doc_idx, kind="stable")
            doc_idx, pos, h1 = doc_idx[order], pos[order], h1[order]
            if dual:
                h2 = h2[order]
    return doc_idx, pos, h1, h2


# -------------------------------------------------- n-gram Jaccard near-dup


def _explode_grams(batch: pa.Table) -> pa.Table:
    """One row per (doc, distinct gram); n_grams (the doc's distinct-gram
    count) is denormalized onto every row so the pair stage needs no join."""
    k = JACCARD_GRAM
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_id, out_gram, out_n = [], [], []
    for i, t in zip(ids, texts):
        words = _WS_TOKEN.findall(t)
        if len(words) <= k:
            grams = {" ".join(words)}
        else:
            grams = {" ".join(words[j:j + k]) for j in range(len(words) - k + 1)}
        out_id.extend([i] * len(grams))
        out_gram.extend(sorted(grams))
        out_n.extend([len(grams)] * len(grams))
    return pa.table({
        "doc_id": pa.array(out_id),
        "gram": pa.array(out_gram, pa.string()),
        "n_grams": pa.array(out_n, pa.int64()),
    })


def _explode_gram_hashes(batch: pa.Table) -> pa.Table:
    """128-bit-hash twin of ``_explode_grams`` for the jaccard join: one row
    per (doc, DISTINCT shingle hash), the doc's distinct count denormalized
    onto every row.  Gram text never leaves the batch — only ``ngram_topk``
    (output-facing gram strings) still uses the string explode."""
    import numpy as np
    import pandas as pd

    doc_idx, _pos, h1, h2 = shingle_hash_batch(
        batch["text"].to_pylist(), JACCARD_GRAM, short="whole")
    df = pd.DataFrame({"d": doc_idx, "h1": h1, "h2": h2}).drop_duplicates()
    n = df.groupby("d")["h1"].transform("size").to_numpy(np.int64)
    ids = batch["doc_id"].take(pa.array(df["d"].to_numpy(), pa.int64()))
    return pa.table({
        "doc_id": ids,
        "h1": pa.array(df["h1"].to_numpy(), pa.uint64()),
        "h2": pa.array(df["h2"].to_numpy(), pa.uint64()),
        "n_grams": pa.array(n, pa.int64()),
    })


def ngram_jaccard_pairs(ds, tau: float = JACCARD_TAU, df_cap: int = JACCARD_DF_CAP,
                        n_parts: int | None = None):
    """Exact near-dup pairs by n-gram Jaccard ≥ tau.

    Two COARSE hash-range shuffles — never one Ray group per gram or per
    pair.  Grams and candidate pairs are mostly-unique keys, so a
    ``groupby(gram).map_groups`` plan pays per-group Python dispatch on
    millions of near-singleton groups (the same anti-pattern measured at
    15.9→2.4 s on span_dedup, see ``dedup.span_hash_groups``).  Instead:

    * shuffle 1 keys on ``crc32(gram) % n_parts`` — every row of a gram
      lands in exactly one range, so the DF cut (2 ≤ df ≤ df_cap) is exact
      and the pair fan-out is ONE vectorized pandas self-merge per range;
    * shuffle 2 keys on ``hash(doc_a, doc_b) % n_parts`` — every (gram,
      pair) row of a pair lands in one range, so intersection counts and
      the τ filter are ONE vectorized pandas groupby per range.

    Range-group size is O(rows / n_parts) with n_parts scaling with
    cluster width; per-gram fan-out stays bounded by df_cap² regardless.
    """
    import numpy as np
    import pandas as pd

    from ..util import pre_shuffle_coalesce

    if n_parts is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_parts = max(32, cpus * 2)

    def explode(batch: pa.Table) -> pa.Table:
        t = _explode_gram_hashes(batch)
        from ..util import key_partition_ids

        return t.append_column(
            "gpart", pa.array(key_partition_ids(t["h1"], n_parts)))

    grams = pre_shuffle_coalesce(ds.map_batches(explode, batch_format="pyarrow"))

    _EMPTY_PAIRS = {"doc_a": "int64", "doc_b": "int64",
                    "n_a": "int64", "n_b": "int64", "ppart": "int32"}

    def pairs_per_range(df: pd.DataFrame) -> pd.DataFrame:
        # exact DF per gram: all rows of a 128-bit gram hash are in this
        # range by key (gpart derives from h1 alone, so (h1, h2) co-locate)
        cnt = df.groupby(["h1", "h2"])["doc_id"].transform("size")
        df = df[(cnt >= 2) & (cnt <= df_cap)]
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in _EMPTY_PAIRS.items()})
        m = df[["h1", "h2", "doc_id", "n_grams"]].merge(
            df[["h1", "h2", "doc_id", "n_grams"]], on=["h1", "h2"],
            suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        a = m["doc_id_a"].to_numpy(dtype=np.int64)
        b = m["doc_id_b"].to_numpy(dtype=np.int64)
        # Knuth-style mix of the pair key → uniform second-stage ranges
        key = (a.astype(np.uint64) * np.uint64(2654435761)
               + b.astype(np.uint64) * np.uint64(40503)) % np.uint64(1 << 32)
        return pd.DataFrame({
            "doc_a": a, "doc_b": b,
            "n_a": m["n_grams_a"].to_numpy(dtype=np.int64),
            "n_b": m["n_grams_b"].to_numpy(dtype=np.int64),
            "ppart": (key % np.uint64(n_parts)).astype(np.int32),
        })

    pair_rows = grams.groupby("gpart").map_groups(
        pairs_per_range, batch_format="pandas")

    def jaccard_per_range(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            i=("n_a", "size"), n_a=("n_a", "first"), n_b=("n_b", "first"))
        j = g["i"] * 1.0 / (g["n_a"] + g["n_b"] - g["i"])
        out = g.loc[j >= tau, ["doc_a", "doc_b"]].copy()
        out["jaccard"] = j[j >= tau].astype("float64")
        return out

    return pre_shuffle_coalesce(pair_rows).groupby("ppart").map_groups(
        jaccard_per_range, batch_format="pandas")


def _jaccard_ctes(rel: str, tau: float, df_cap: int) -> str:
    """Shared CTE chain ending in ``jpairs(doc_a, doc_b, jaccard)`` — used by
    the pair query and (with RECURSIVE extensions) the cluster oracle."""
    k = JACCARD_GRAM
    return f"""w AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM {rel}
), g AS (
    SELECT DISTINCT doc_id, array_to_string(ws[i:i + {k - 1}], ' ') AS gram
    FROM w, UNNEST(range(1, GREATEST(len(ws) - {k - 1}, 1) + 1)) AS t(i)
), cnt AS (
    SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id
), keep AS (
    SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= {df_cap} AND COUNT(*) >= 2
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
    JOIN keep k ON k.gram = a.gram
    GROUP BY 1, 2
), jpairs AS (
    SELECT doc_a, doc_b, i * 1.0 / (ca.n + cb.n - i) AS jaccard
    FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
    WHERE i * 1.0 / (ca.n + cb.n - i) >= {tau}
)"""


def ngram_jaccard_sql(rel: str = "documents", tau: float = JACCARD_TAU,
                      df_cap: int = JACCARD_DF_CAP) -> str:
    return ("WITH " + _jaccard_ctes(rel, tau, df_cap)
            + "\nSELECT doc_a, doc_b, jaccard FROM jpairs\n")


def dedup_clusters_sql(rel: str = "documents", tau: float = JACCARD_TAU,
                       df_cap: int = JACCARD_DF_CAP) -> str:
    """Oracle for connected components over the Jaccard pair graph:
    transitive closure via a recursive CTE, cluster id = min reachable doc
    (including self)."""
    return ("WITH RECURSIVE " + _jaccard_ctes(rel, tau, df_cap) + f""",
e AS (
    SELECT doc_a AS u, doc_b AS v FROM jpairs
    UNION ALL SELECT doc_b, doc_a FROM jpairs
), reach(a, b) AS (
    SELECT u, v FROM e
    UNION
    SELECT r.a, e.v FROM reach r JOIN e ON r.b = e.u
)
SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_id
FROM {rel} d LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id
""")


# ------------------------------------------------- vocabulary heavy hitters

NGRAM_TOPK = 20


def ngram_topk(ds, k: int = NGRAM_TOPK, n_parts: int | None = None):
    """Top-k n-grams by DOCUMENT frequency — vocabulary heavy-hitters over
    an UNBOUNDED key domain.  Grams are mostly-unique keys, so a native
    per-gram Sum pays sort/merge bookkeeping on near-singleton groups (the
    span_dedup lesson); instead the batch-local distinct-gram counts
    shuffle ONCE on ``crc32(gram) % n_parts`` (every gram entirely inside
    one range) and each range resolves its sums and local top-k with one
    vectorized pandas pass — exact, since a global top-k is the merge of
    per-range top-ks.  The driver merges n_parts × k rows; the full gram
    table never reaches it.  Ties break by gram ascending (deterministic,
    mirrored in SQL)."""
    import numpy as np
    import pandas as pd

    from ..util import pre_shuffle_coalesce

    if n_parts is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_parts = max(8, cpus)

    def partial(batch: pa.Table) -> pa.Table:
        g = _explode_grams(batch).select(["gram"]).group_by("gram").aggregate(
            [("gram", "count")])
        g = g.rename_columns(["gram", "part_n"])
        from ..util import key_partition_ids

        return g.append_column(
            "gpart", pa.array(key_partition_ids(g["gram"], n_parts)))

    def range_topk(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby("gram", as_index=False)["part_n"].sum()
              .rename(columns={"part_n": "df"}))
        df = df.sort_values(["df", "gram"], ascending=[False, True],
                            kind="mergesort").head(k)
        df["df"] = df["df"].astype("int64")
        return pa.Table.from_pandas(df[["gram", "df"]], preserve_index=False)

    parts = (pre_shuffle_coalesce(ds.map_batches(partial, batch_format="pyarrow"))
             .groupby("gpart")
             .map_groups(range_topk, batch_format="pyarrow")
             .to_pandas())
    top = (parts.sort_values(["df", "gram"], ascending=[False, True],
                             kind="mergesort").head(k).reset_index(drop=True))
    top["rank"] = range(1, len(top) + 1)
    return pa.Table.from_pandas(top[["rank", "gram", "df"]],
                                preserve_index=False)


def ngram_topk_sql(rel: str = "documents", k: int = NGRAM_TOPK) -> str:
    kk = JACCARD_GRAM
    return f"""
WITH w AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM {rel}
), g AS (
    SELECT DISTINCT doc_id, array_to_string(ws[i:i + {kk - 1}], ' ') AS gram
    FROM w, UNNEST(range(1, GREATEST(len(ws) - {kk - 1}, 1) + 1)) AS t(i)
), c AS (
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY gram
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY df DESC, gram) AS BIGINT) AS rank,
       gram, df
FROM c ORDER BY df DESC, gram LIMIT {k}
"""


# --------------------------------------------------- length histogram sketch

HIST_BUCKET_WIDTH = 16  # whitespace tokens per bucket


def doc_len_histogram(ds, width: int = HIST_BUCKET_WIDTH):
    """Mergeable document-length histogram — the sketch pattern for corpus
    statistics at scale: per-batch bucket counts (partial combine) → native
    Sum over a BOUNDED key domain (bucket index), then a driver-side cumsum
    over the tiny bucket table.  Output: (bucket, lo_tokens, n_docs,
    cum_docs) — exact, so the SQL oracle reproduces it bit-for-bit."""
    from ray.data.aggregate import Sum

    from ..util import pre_shuffle_coalesce

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        buckets = [len(_WS_TOKEN.findall(t)) // width for t in texts]
        t = pa.table({"bucket": pa.array(buckets, pa.int64())})
        g = t.group_by("bucket").aggregate([("bucket", "count")])
        return g.rename_columns(["bucket", "part_n"])

    agg = pre_shuffle_coalesce(
        ds.map_batches(partial, batch_format="pyarrow")
    ).groupby("bucket").aggregate(Sum("part_n", alias_name="n_docs"))
    df = agg.to_pandas().sort_values("bucket").reset_index(drop=True)
    df["n_docs"] = df["n_docs"].astype("int64")
    df["lo_tokens"] = df["bucket"] * width
    df["cum_docs"] = df["n_docs"].cumsum()
    return pa.Table.from_pandas(
        df[["bucket", "lo_tokens", "n_docs", "cum_docs"]], preserve_index=False)


def doc_len_histogram_sql(rel: str = "documents",
                          width: int = HIST_BUCKET_WIDTH) -> str:
    return f"""
WITH b AS (
    SELECT len(regexp_extract_all(text, '\\S+')) // {width} AS bucket
    FROM {rel}
), h AS (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs FROM b GROUP BY bucket
)
SELECT bucket, bucket * {width} AS lo_tokens, n_docs,
       CAST(SUM(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs
FROM h
"""


# --------------------------------------------- corpus bigram LM scoring


def doc_lm_score(make_docs_ds):
    """Corpus-statistics language-model scoring — the two-pass shape of
    perplexity-style quality filtering, in exact INTEGER form: pass 1
    counts every token bigram over the whole corpus; pass 2 scores each
    document as the SUM of the corpus frequencies of its bigrams (plus its
    bigram count), so frequent/boilerplate phrasing scores high and novel
    text scores low — a real importance/quality signal with no float
    hazard (sums of int64 are reduction-order-independent, and the DuckDB
    oracle is a plain join+group).

    ``make_docs_ds`` is a zero-arg factory: the token-scale doc-bigram
    stream is REBUILT for pass 2 rather than pinned in the object store
    (the pip_media_in_host precedent — at 100 TB a ``materialize()`` of a
    token-scale intermediate is an object-store-sized pin; two cheap scans
    beat one giant spill).

    Plan: per-batch (doc_id, bigram, k) pre-aggregates (k = in-doc
    occurrences) → ONE bigram hash-range shuffle → global counts →
    co-partition counts with a fresh doc-bigram stream on the SAME bigram
    key (union + side tag — neither side broadcasts; the count table is
    bigram-cardinality) → per-range merge emits (doc_id, k, k·count)
    partials → one doc-range shuffle sums them.  Three coarse exchanges
    total, all hash-range.
    """
    import numpy as np
    import pandas as pd

    from ..util import user_range_groupby

    def doc_bigrams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id, out_bg, out_k = [], [], []
        for did, t in zip(ids, texts):
            words = _WS_TOKEN.findall(t)
            if len(words) < 2:
                continue
            counts: dict[str, int] = {}
            for a, b in zip(words, words[1:]):
                bg = a + " " + b
                counts[bg] = counts.get(bg, 0) + 1
            out_id.extend([did] * len(counts))
            out_bg.extend(counts.keys())
            out_k.extend(counts.values())
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "bigram": pa.array(out_bg, pa.string()),
                         "k": pa.array(out_k, pa.int64())})

    base = make_docs_ds().map_batches(doc_bigrams, batch_format="pyarrow")

    def count_range(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bigram", sort=False)["k"].sum().reset_index()
        return pd.DataFrame({"bigram": g["bigram"],
                             "cnt": g["k"].astype(np.int64)})

    counts = user_range_groupby(base, count_range, key="bigram")

    def tag_counts(t) -> pa.Table:
        t = pa.Table.from_pandas(t, preserve_index=False) \
            if not isinstance(t, pa.Table) else t
        n = t.num_rows
        import pyarrow.compute as pc

        return pa.table({"bigram": t["bigram"],
                         "doc_id": pa.array(np.full(n, -1, np.int64)),
                         "k": pa.array(np.zeros(n, np.int64)),
                         "cnt": pc.cast(t["cnt"], pa.int64()),
                         "side": pa.array(np.zeros(n, np.int8))})

    def tag_base(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"bigram": t["bigram"],
                         "doc_id": t["doc_id"],
                         "k": t["k"],
                         "cnt": pa.array(np.zeros(n, np.int64)),
                         "side": pa.array(np.ones(n, np.int8))})

    base2 = make_docs_ds().map_batches(doc_bigrams, batch_format="pyarrow")
    tagged = counts.map_batches(tag_counts, batch_format="pyarrow").union(
        base2.map_batches(tag_base, batch_format="pyarrow"))

    def merge_range(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["side"] == 0]
        d = df[df["side"] == 1]
        if c.empty or d.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64),
                                 "s": pd.Series(dtype=np.int64)})
        m = d[["doc_id", "bigram", "k"]].merge(
            c[["bigram", "cnt"]], on="bigram", how="inner")
        k = m["k"].to_numpy()
        g = (pd.DataFrame({"doc_id": m["doc_id"],
                           "n": k,
                           "s": k * m["cnt"].to_numpy()})
             .groupby("doc_id", sort=False).sum().reset_index())
        return g.astype({"doc_id": np.int64, "n": np.int64, "s": np.int64})

    partials = user_range_groupby(tagged, merge_range, key="bigram")

    def final_range(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).sum().reset_index()
        return pd.DataFrame({"doc_id": g["doc_id"].astype(np.int64),
                             "n_bigrams": g["n"].astype(np.int64),
                             "lm_score": g["s"].astype(np.int64)})

    return user_range_groupby(partials, final_range, key="doc_id")


def doc_lm_score_sql(rel: str = "documents") -> str:
    return f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM {rel}
), z AS (
    SELECT doc_id, UNNEST(t) AS a, UNNEST(t[2:]) AS b FROM toks
), bg AS (
    SELECT doc_id, a || ' ' || b AS bigram FROM z WHERE b IS NOT NULL
), cnt AS (
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY bigram
)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(c) AS BIGINT) AS lm_score
FROM bg g JOIN cnt USING (bigram)
GROUP BY g.doc_id
"""


# ------------------------------------------------- per-group exact quantiles


def doc_len_quantiles(ds):
    """Exact per-source token-count percentiles (p25/p50/p75/p95) — the
    group-quantile operator, computed WITHOUT a distributed sort: token
    counts are small ints, so per-(source, tok) partial counts form an
    exact counting-sort histogram; ONE coarse source-range shuffle moves
    only the bounded (sources × distinct lengths) count table, and each
    range resolves ordinals by cumsum + searchsorted.

    Ordinal semantics are explicit integer arithmetic — the p-th percentile
    is the value at 1-indexed row ``ceil(p·n/100) = (p·n + 99) // 100`` of
    the sorted lengths — and the oracle states the SAME formula via
    ROW_NUMBER, sidestepping ``percentile_disc``'s float ``p*n`` edge
    (0.95*n can land either side of an integer in IEEE double)."""
    import numpy as np
    import pandas as pd

    from ..util import user_range_groupby

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks = [len(_WS_TOKEN.findall(t)) for t in texts]
        t = pa.table({"source": batch["source"],
                      "tok": pa.array(toks, pa.int64())})
        g = t.group_by(["source", "tok"]).aggregate([("tok", "count")])
        return g.rename_columns(["source", "tok", "part_n"])

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src_name, g in df.groupby("source", sort=False):
            h = g.groupby("tok", sort=True)["part_n"].sum()
            cum = h.cumsum().to_numpy()
            vals = h.index.to_numpy()
            n = int(cum[-1])
            row = {"source": src_name}
            for p, name in ((25, "p25"), (50, "p50"), (75, "p75"), (95, "p95")):
                k = (p * n + 99) // 100
                row[name] = int(vals[np.searchsorted(cum, k, side="left")])
            rows.append(row)
        if not rows:
            return pd.DataFrame({"source": pd.Series(dtype=object),
                                 **{c: pd.Series(dtype="int64")
                                    for c in ("p25", "p50", "p75", "p95")}})
        return pd.DataFrame(rows, columns=["source", "p25", "p50", "p75", "p95"])

    from ..util import pre_shuffle_coalesce

    partials = pre_shuffle_coalesce(
        ds.map_batches(partial, batch_format="pyarrow"))
    return user_range_groupby(partials, per_range, key="source")


def doc_len_quantiles_sql(rel: str = "documents") -> str:
    return f"""
WITH l AS (
    SELECT source, len(regexp_extract_all(text, '\\S+')) AS tok FROM {rel}
), r AS (
    SELECT source, tok,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY tok) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM l
)
SELECT source,
       CAST(MIN(CASE WHEN rn = (25 * n + 99) // 100 THEN tok END) AS BIGINT) AS p25,
       CAST(MIN(CASE WHEN rn = (50 * n + 99) // 100 THEN tok END) AS BIGINT) AS p50,
       CAST(MIN(CASE WHEN rn = (75 * n + 99) // 100 THEN tok END) AS BIGINT) AS p75,
       CAST(MIN(CASE WHEN rn = (95 * n + 99) // 100 THEN tok END) AS BIGINT) AS p95
FROM r GROUP BY source
"""


# ------------------------------------------------------- composite filter

# doc_filter thresholds — all comparisons are INTEGER arithmetic so the
# engine and SQL agree exactly (no float-ratio boundary ambiguity)
FILTER_MIN_WORDS = 5
FILTER_MAX_WORDS = 2000
FILTER_STOP_PCT = 2      # reject when n_stopwords * 100 < n_words * 2
FILTER_PUNCT_PCT = 20    # reject when n_punct * 100 > n_chars * 20


_STOP_SET = frozenset(STOPWORDS)


def filter_reasons(text: str) -> list[str]:
    """Sorted failure reasons for one document ('' state = empty list)."""
    words = _WS_TOKEN.findall(text)
    nw = len(words)
    ns = sum(1 for w in words if w in _STOP_SET)
    npunct = len(_PUNCT.findall(text))
    rs = []
    if nw < FILTER_MIN_WORDS:
        rs.append("too_short")
    if nw > FILTER_MAX_WORDS:
        rs.append("too_long")
    if ns * 100 < nw * FILTER_STOP_PCT:
        rs.append("low_stopword")
    if npunct * 100 > len(text) * FILTER_PUNCT_PCT:
        rs.append("high_punct")
    rs.sort()
    return rs


def doc_filter(ds):
    """Composite quality filter — the keep/drop verdict stage of a training
    corpus pipeline: every document gets a boolean ``keep`` and a
    deterministic comma-joined ``reasons`` string (sorted; '' when kept).
    Single-pass map, no shuffle at any scale."""

    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        rss = [filter_reasons(t) for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "keep": pa.array([not rs for rs in rss], pa.bool_()),
            "reasons": pa.array([",".join(rs) for rs in rss], pa.string()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def doc_filter_sql(rel: str = "documents") -> str:
    return f"""
WITH w AS (
    SELECT doc_id, text, len(regexp_extract_all(text, '\\S+')) AS nw,
           len(list_filter(regexp_extract_all(text, '\\S+'),
                           x -> x IN ({_sql_list(STOPWORDS)}))) AS ns,
           len(regexp_extract_all(text, '[^\\w\\s]')) AS np
    FROM {rel}
), r AS (
    SELECT doc_id,
           list_sort(list_filter([
               CASE WHEN nw < {FILTER_MIN_WORDS} THEN 'too_short' ELSE '' END,
               CASE WHEN nw > {FILTER_MAX_WORDS} THEN 'too_long' ELSE '' END,
               CASE WHEN ns * 100 < nw * {FILTER_STOP_PCT} THEN 'low_stopword' ELSE '' END,
               CASE WHEN np * 100 > length(text) * {FILTER_PUNCT_PCT} THEN 'high_punct' ELSE '' END
           ], x -> x <> '')) AS rs
    FROM w
)
SELECT doc_id, len(rs) = 0 AS keep,
       COALESCE(array_to_string(rs, ','), '') AS reasons
FROM r
"""


# ------------------------------------------------------------------ tf-idf


TFIDF_K = 3


def doc_tfidf_top(ds, k: int = TFIDF_K, n_parts: int | None = None):
    """Top-k terms per document by tf/df ratio (a tf-idf ranking whose
    ORDER is float-division-exact, so the DuckDB oracle reproduces it
    bit-for-bit: IEEE double division is correctly rounded on both sides,
    and only INTEGER columns cross the compare boundary).

    Two coarse hash-range shuffles, zero unbounded-key aggregates:

    1. batch-local per-doc term frequencies (whitespace tokens, matching
       the ``\\S+`` SQL tokenizer) shuffle on ``crc32(word) % n_parts`` —
       every word's rows land in ONE range, so document frequency AND the
       df join both resolve inside the range with one vectorized pandas
       pass (no separate df table, no gram-keyed join shuffle);
    2. the scored rows shuffle on ``crc32(doc_id) % n_parts`` and each
       range emits its docs' top-k (score desc, word asc — deterministic).

    Output: (doc_id, word, tf, df, rank), rank 1..k.
    """
    import numpy as np
    import pandas as pd

    from ..util import pre_shuffle_coalesce

    if n_parts is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_parts = max(8, cpus)

    def doc_tf(batch: pa.Table) -> pa.Table:
        ids, words, tfs = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            counts: dict[str, int] = {}
            for w in (text or "").split():
                counts[w] = counts.get(w, 0) + 1
            ids.extend([did] * len(counts))
            words.extend(counts.keys())
            tfs.extend(counts.values())
        from ..util import key_partition_ids

        wa = pa.array(words, pa.string())
        return pa.table({
            "doc_id": pa.array(ids, type=batch["doc_id"].type),
            "word": wa,
            "tf": pa.array(tfs, pa.int64()),
            "wpart": pa.array(key_partition_ids(wa, n_parts)),
        })

    def df_in_range(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        # rows are (doc, word)-distinct by construction ⇒ df = row count
        counts = df.groupby("word", as_index=False).size().rename(
            columns={"size": "df"})
        out = df.merge(counts, on="word")
        from ..util import key_partition_ids

        out["dpart"] = key_partition_ids(
            pa.array(out["doc_id"].astype(str)), n_parts)
        return pa.Table.from_pandas(
            out[["doc_id", "word", "tf", "df", "dpart"]], preserve_index=False)

    def topk_in_range(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["score"] = df["tf"].astype("float64") / df["df"].astype("float64")
        df = df.sort_values(["doc_id", "score", "word"],
                            ascending=[True, False, True], kind="mergesort")
        df["rank"] = df.groupby("doc_id").cumcount() + 1
        df = df[df["rank"] <= k]
        out = df[["doc_id", "word", "tf", "df", "rank"]].copy()
        out["rank"] = out["rank"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    tf_rows = pre_shuffle_coalesce(ds.map_batches(doc_tf, batch_format="pyarrow"))
    scored = tf_rows.groupby("wpart").map_groups(df_in_range,
                                                 batch_format="pyarrow")
    return scored.groupby("dpart").map_groups(topk_in_range,
                                              batch_format="pyarrow")


def doc_tfidf_top_sql(rel: str = "documents", k: int = TFIDF_K) -> str:
    return f"""
WITH w AS (
    SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS word FROM {rel}
), tf AS (
    SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
    FROM w GROUP BY doc_id, word
), df AS (
    SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM w GROUP BY word
), s AS (
    SELECT tf.doc_id, tf.word, tf.tf, df.df,
           ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.word
           ) AS rank
    FROM tf JOIN df USING (word)
)
SELECT doc_id, word, tf, df, CAST(rank AS BIGINT) AS rank
FROM s WHERE rank <= {k}
"""


# ------------------------------------------------------------ normalization


def doc_normalize(ds):
    """Canonical text form for downstream dedup/tokenization: Unicode NFC →
    lowercase → whitespace runs collapsed to single spaces → strip.  The
    standard pre-pass of large-scale corpus pipelines (identical content
    with different Unicode spellings or spacing must hash equal before
    exact dedup).  Map-only; DuckDB oracle = nfc_normalize + lower +
    regexp_replace, and Python's casefold-free str.lower() matches DuckDB
    lower() on the full-case-mapping-free subset the synth vocabulary uses
    (non-trivial case mappings are pytest-covered, not oracle-covered).

    Output: (doc_id, norm_text, n_chars, n_chars_norm) — the char deltas
    let a curation pass flag heavy-normalization docs cheaply.

    WHITESPACE CONTRACT: Python's ``\\s``/``str.split()`` are
    Unicode-aware while DuckDB's RE2 ``\\s``/``trim()`` are ASCII-only, so
    oracle parity (here and in doc_tfidf_top) requires document text to
    contain only ASCII whitespace — asserted against the driver corpus by
    ``test_documents_ascii_whitespace_contract``."""
    import unicodedata

    _ws = re.compile(r"\s+")

    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        norm = [_ws.sub(" ", unicodedata.normalize("NFC", t).lower()).strip()
                for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "norm_text": pa.array(norm, pa.string()),
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            "n_chars_norm": pa.array([len(n) for n in norm], pa.int64()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def doc_normalize_sql(rel: str = "documents") -> str:
    return f"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))
           AS norm_text,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(trim(regexp_replace(lower(nfc_normalize(text)),
                                       '\\s+', ' ', 'g'))) AS BIGINT)
           AS n_chars_norm
FROM {rel}
"""


# ----------------------------------------------------------- decontamination

DECONTAM_GRAM = 8       # words per shingle (published decontam practice)
DECONTAM_BENCH_MOD = 29 # doc_id % MOD == 0 -> benchmark side (synthetic stand-in)


def _distinct_gram_hashes(text: str, k: int) -> set[str]:
    """Distinct md5-hex hashes of the doc's k-word shingles.  Docs shorter
    than k words contribute their single whole-text shingle (same edge rule
    as ``fingerprints`` / its SQL ``GREATEST(len-k+1, 1)`` window)."""
    words = _WS_TOKEN.findall(text)
    if len(words) <= k:
        grams = {" ".join(words)}
    else:
        grams = {" ".join(words[j:j + k]) for j in range(len(words) - k + 1)}
    return {hashlib.md5(g.encode("utf-8")).hexdigest() for g in grams}


def decontaminate(ds, bench_mod: int = DECONTAM_BENCH_MOD,
                  k: int = DECONTAM_GRAM):
    """Benchmark decontamination: flag corpus docs sharing any k-word
    shingle with the benchmark set (the standard eval-leakage guard in
    training-data pipelines; no har2tree counterpart).

    Benchmark side here is the deterministic subset ``doc_id % bench_mod
    == 0`` — a stand-in for real eval sets, which are small (MBs) by
    nature.  100 TB shape: the benchmark gram-hash set is collected once
    (small side BY CONTRACT — eval suites, not corpus-sized), broadcast
    via ``ray.put``, and the corpus streams through one map-only pass; no
    shuffle.  If a benchmark side ever outgrew broadcast, the escalation
    is the ``ngram_jaccard_pairs`` plan: explode both sides to gram rows
    and hash-partition on gram.

    Output per doc: (doc_id, is_bench, n_grams, n_hit, contaminated) —
    integer/bool columns only, exact-oracle-safe.
    """
    import ray

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hashes: set[str] = set()
        for t in batch.filter(pa.array(ids % bench_mod == 0))["text"].to_pylist():
            hashes |= _distinct_gram_hashes(t, k)
        return pa.table({"h": pa.array(sorted(hashes), pa.string())})

    # gram hashing runs distributed; only the (small) hash rows reach the
    # driver, which unions them into the broadcast set
    bench_hashes: set[str] = set()
    for b in (ds.map_batches(bench_grams, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")):
        bench_hashes.update(b["h"].to_pylist())
    ref = ray.put(frozenset(bench_hashes))

    def per_batch(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        n_grams, n_hit, is_bench = [], [], []
        for d, t in zip(ids, texts):
            hs = _distinct_gram_hashes(t, k)
            n_grams.append(len(hs))
            n_hit.append(sum(1 for h in hs if h in bench))
            is_bench.append(d % bench_mod == 0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "is_bench": pa.array(is_bench, pa.bool_()),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_hit": pa.array(n_hit, pa.int64()),
            "contaminated": pa.array([h > 0 for h in n_hit], pa.bool_()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def decontaminate_sql(rel: str = "documents",
                      bench_mod: int = DECONTAM_BENCH_MOD,
                      k: int = DECONTAM_GRAM) -> str:
    return f"""
WITH w AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM {rel}
), g AS (
    SELECT DISTINCT doc_id,
           md5(array_to_string(ws[i:i + {k - 1}], ' ')) AS h
    FROM w, UNNEST(range(1, GREATEST(len(ws) - {k - 1}, 1) + 1)) AS t(i)
), bench AS (
    SELECT DISTINCT h FROM g WHERE doc_id % {bench_mod} = 0
)
SELECT g.doc_id,
       (g.doc_id % {bench_mod} = 0) AS is_bench,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN b.h IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hit,
       BOOL_OR(b.h IS NOT NULL) AS contaminated
FROM g LEFT JOIN bench b USING (h)
GROUP BY g.doc_id
"""


# --------------------------------------------------- duplicate-span removal

DUPSPAN_GRAM = 8  # words per shingle (Lee et al. 2021 use 50 BPE tokens;
                  # 8 words fires on the synthetic corpus's planted near-dups)


def dup_spans(ds, k: int = DUPSPAN_GRAM):
    """Cross-document duplicate n-gram SPANS — the substring-level dedup
    primitive ("Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2021; no har2tree counterpart).  A k-word shingle position is
    *duplicated* when its gram text occurs in ≥ 2 DISTINCT documents;
    overlapping/adjacent duplicated positions merge into maximal spans.
    Output: (doc_id, span_start, span_end, n_grams) with 1-based word
    indices — integers only, exact-oracle-safe.  A removal step is a
    per-doc word-slice over these spans.

    100 TB shape (the ngram_jaccard/tfidf architecture): explode to
    (doc_id, pos, gram_hash) rows, then exactly TWO coarse hash-range
    shuffles — (1) on gram hash: every hash's rows land in one range, a
    vectorized nunique marks dup hashes and only the duplicated positions
    survive (a small fraction of the corpus by construction); (2) on
    doc_id: per-doc interval merge as one grouped-cumsum pandas pass.
    Docs shorter than k words emit no gram (a dup SPAN needs a full
    k-gram — deliberate deviation from the fingerprint whole-text edge
    rule, mirrored in the SQL)."""
    import pandas as pd

    from ..util import user_range_groupby

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized 128-bit shingle hashes (see shingle_hash_batch) — the
        # md5 stays in the SQL oracle; the hash never reaches the output
        doc_idx, pos, h1, h2 = shingle_hash_batch(
            batch["text"].to_pylist(), k, short="drop")
        ids = batch["doc_id"].take(pa.array(doc_idx, pa.int64()))
        return pa.table({"doc_id": ids,
                         "pos": pa.array(pos, pa.int64()),
                         "h1": pa.array(h1, pa.uint64()),
                         "h2": pa.array(h2, pa.uint64())})

    grams = ds.map_batches(explode, batch_format="pyarrow")

    def dup_positions(df: pd.DataFrame) -> pd.DataFrame:
        dup = df.groupby(["h1", "h2"])["doc_id"].transform("nunique") >= 2
        return df.loc[dup, ["doc_id", "pos"]]

    marked = user_range_groupby(grams, dup_positions, key="h1")

    def merge_spans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        prev = df.groupby("doc_id")["pos"].shift()
        # equal-length intervals sorted by start: merge when the gap to the
        # previous start is ≤ k (overlap or adjacency)
        new = (prev.isna() | (df["pos"] > prev + k)).astype("int64")
        isl = new.groupby(df["doc_id"].to_numpy()).cumsum()
        g = df.assign(_isl=isl.to_numpy()).groupby(["doc_id", "_isl"])
        out = g["pos"].agg(span_start="min", span_end="max",
                           n_grams="count").reset_index()
        out["span_end"] = out["span_end"] + (k - 1)
        return out[["doc_id", "span_start", "span_end",
                    "n_grams"]].astype({"span_start": "int64",
                                        "span_end": "int64",
                                        "n_grams": "int64"})

    return user_range_groupby(marked, merge_spans, key="doc_id")


def dup_spans_sql(rel: str = "documents", k: int = DUPSPAN_GRAM) -> str:
    return f"""
WITH w AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM {rel}
), g AS (
    SELECT doc_id, i AS pos,
           md5(array_to_string(ws[i:i + {k - 1}], ' ')) AS h
    FROM w, UNNEST(range(1, len(ws) - {k - 1} + 1)) AS t(i)
    WHERE len(ws) >= {k}
), dup AS (
    SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), p AS (
    SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)
), isl AS (
    SELECT doc_id, pos,
           SUM(CASE WHEN prev IS NULL OR pos > prev + {k} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM (SELECT doc_id, pos,
                 LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
          FROM p)
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {k - 1} AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, island
"""


# ------------------------------------------------------------- PII scanning

# ASCII-only patterns chosen to parse identically under Python re and
# DuckDB's RE2 (both support \b, \d, {m,n} here); the document corpus is
# ASCII by contract (see doc_normalize WHITESPACE CONTRACT note).
_PII_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
_PII_IPV4_SQL = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_PHONE = re.compile(r"\b\d{3}[-.]\d{3}[-.]\d{4}\b")
_PII_PHONE_SQL = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"


def pii_stats(ds):
    """Per-doc PII match counts (email / IPv4 / US-phone shapes) — the
    redaction-pipeline scan stage (no har2tree counterpart).  Map-only,
    module-level compiled patterns; at 100 TB this streams with zero
    shuffle.  Counts (ints) rather than redacted text keep the oracle
    compare exact; a redact step is `regexp_replace` over the same
    patterns.  The synthetic corpus is PII-free, so the non-zero branch is
    pytest-covered (fixture text), while the oracle proves scan parity."""

    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        em = [len(_PII_EMAIL.findall(t)) for t in texts]
        ip = [len(_PII_IPV4.findall(t)) for t in texts]
        ph = [len(_PII_PHONE.findall(t)) for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_emails": pa.array(em, pa.int64()),
            "n_ipv4": pa.array(ip, pa.int64()),
            "n_phones": pa.array(ph, pa.int64()),
            "has_pii": pa.array([a + b + c > 0 for a, b, c in zip(em, ip, ph)],
                                pa.bool_()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def pii_stats_sql(rel: str = "documents") -> str:
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL_SQL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_IPV4_SQL}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE_SQL}')) AS BIGINT) AS n_phones,
       (len(regexp_extract_all(text, '{_PII_EMAIL_SQL}'))
        + len(regexp_extract_all(text, '{_PII_IPV4_SQL}'))
        + len(regexp_extract_all(text, '{_PII_PHONE_SQL}'))) > 0 AS has_pii
FROM {rel}
"""


# ------------------------------------------------------ repetition signals


def repetition_stats(ds):
    """Gopher-style within-doc repetition signals: distinct-word ratio,
    most-frequent word/bigram mass, duplicate 4-gram positions.  All
    counts are integers (ratio math left to the consumer) so the oracle
    compare is exact.  Map-only, no shuffle — each doc is scored alone."""

    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        cols = {c: [] for c in ("n_words", "n_distinct_words", "top_word_count",
                                "n_bigrams", "top_bigram_count",
                                "n_4grams", "n_distinct_4grams")}
        for t in texts:
            words = _WS_TOKEN.findall(t)
            nw = len(words)
            cols["n_words"].append(nw)
            cols["n_distinct_words"].append(len(set(words)))
            wc: dict[str, int] = {}
            for w in words:
                wc[w] = wc.get(w, 0) + 1
            cols["top_word_count"].append(max(wc.values()) if wc else 0)
            bigrams = [" ".join(words[i:i + 2]) for i in range(nw - 1)]
            bc: dict[str, int] = {}
            for g in bigrams:
                bc[g] = bc.get(g, 0) + 1
            cols["n_bigrams"].append(len(bigrams))
            cols["top_bigram_count"].append(max(bc.values()) if bc else 0)
            fours = [" ".join(words[i:i + 4]) for i in range(max(nw - 3, 0))]
            cols["n_4grams"].append(len(fours))
            cols["n_distinct_4grams"].append(len(set(fours)))
        out = {"doc_id": batch["doc_id"]}
        out.update({c: pa.array(v, pa.int64()) for c, v in cols.items()})
        return pa.table(out)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def repetition_stats_sql(rel: str = "documents") -> str:
    return f"""
WITH w AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM {rel}
), base AS (
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
           CAST(GREATEST(len(ws) - 1, 0) AS BIGINT) AS n_bigrams,
           CAST(GREATEST(len(ws) - 3, 0) AS BIGINT) AS n_4grams
    FROM w
), wcnt AS (
    SELECT doc_id, MAX(c) AS top_word_count FROM (
        SELECT doc_id, COUNT(*) AS c FROM w, UNNEST(ws) AS t(word)
        GROUP BY doc_id, word
    ) GROUP BY doc_id
), bg AS (
    SELECT doc_id, array_to_string(ws[i:i + 1], ' ') AS g
    FROM w, UNNEST(range(1, GREATEST(len(ws) - 1, 0) + 1)) AS t(i)
), bcnt AS (
    SELECT doc_id, MAX(c) AS top_bigram_count FROM (
        SELECT doc_id, COUNT(*) AS c FROM bg GROUP BY doc_id, g
    ) GROUP BY doc_id
), fg AS (
    SELECT doc_id, COUNT(DISTINCT array_to_string(ws[i:i + 3], ' '))
               AS n_distinct_4grams
    FROM w, UNNEST(range(1, GREATEST(len(ws) - 3, 0) + 1)) AS t(i)
    GROUP BY doc_id
)
SELECT base.doc_id, n_words, n_distinct_words,
       CAST(COALESCE(wcnt.top_word_count, 0) AS BIGINT) AS top_word_count,
       n_bigrams,
       CAST(COALESCE(bcnt.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
       n_4grams,
       CAST(COALESCE(fg.n_distinct_4grams, 0) AS BIGINT) AS n_distinct_4grams
FROM base
LEFT JOIN wcnt USING (doc_id)
LEFT JOIN bcnt USING (doc_id)
LEFT JOIN fg USING (doc_id)
"""


# ------------------------------------------------------- weighted mixing


def _mix_threshold(source: str) -> str:
    """Per-source keep threshold (4 hex digits, compare-as-string): sources
    whose md5 leads with a low nibble keep 75% (c000/10000), the rest 25%
    (4000/10000).  Derived purely from the source string so the engine and
    the SQL oracle agree with no shared table."""
    return "c000" if hashlib.md5(source.encode()).hexdigest()[0] < "8" else "4000"


def doc_mix(ds):
    """Deterministic per-source weighted mixing — the corpus-mixing step of
    a training-data pipeline (sample each source at its own rate; cf. the
    uniform `doc_sample`).  Keep rule: first 4 hex chars of md5(doc_id
    as string) compare-less-than the source's threshold.  Content-
    addressed ⇒ stable across runs/partitionings; map-only at 100 TB with
    a per-process threshold memo (sources are few; no broadcast needed)."""

    memo: dict[str, str] = {}

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        buckets = [hashlib.md5(str(d).encode()).hexdigest()[:4] for d in ids]
        thr = []
        for s in srcs:
            t = memo.get(s)
            if t is None:
                t = memo[s] = _mix_threshold(s)
            thr.append(t)
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "bucket": pa.array(buckets, pa.string()),
            "threshold": pa.array(thr, pa.string()),
            "kept": pa.array([b < t for b, t in zip(buckets, thr)], pa.bool_()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def doc_mix_sql(rel: str = "documents") -> str:
    return f"""
SELECT doc_id, source,
       substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket,
       CASE WHEN substr(md5(source), 1, 1) < '8' THEN 'c000' ELSE '4000' END
           AS threshold,
       substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
           < CASE WHEN substr(md5(source), 1, 1) < '8'
                  THEN 'c000' ELSE '4000' END AS kept
FROM {rel}
"""


# --------------------------------------------------- stratified sampling


def stratified_sample(ds, k: int = 4):
    """Per-stratum deterministic top-k sample over (source, lang) — the
    stratified-sampling step of a curation pipeline (cf. the uniform
    ``doc_sample`` and the per-source-rate ``doc_mix``): every stratum
    contributes its k docs with the smallest md5(doc_id), so rare
    (source, lang) cells survive a corpus-wide downsample that one uniform
    rate would wipe out.  Content-addressed ⇒ stable across runs and
    partitionings; ties broken by doc_id (md5 collisions aside, unique).

    100 TB shape: the stratum domain is BOUNDED (sources × languages —
    dozens), so a per-block partial top-k inside ``map_batches`` shrinks
    the corpus to ≤ blocks × strata × k rows before ONE tiny per-stratum
    merge; the corpus itself is never shuffled (same partial-then-merge
    plan as ``top_hosts``)."""
    import numpy as np
    import pandas as pd  # noqa: F401 — batch_format="pandas"

    def partial(df):
        df = df[["doc_id", "source", "lang"]].copy()
        df["h"] = [hashlib.md5(str(d).encode()).hexdigest()
                   for d in df["doc_id"]]
        df["stratum"] = df["source"] + "|" + df["lang"]
        df = df.sort_values(["stratum", "h", "doc_id"], kind="mergesort")
        return df.groupby("stratum", sort=False).head(k)

    def merge(df):
        df = (df.sort_values(["h", "doc_id"], kind="mergesort")
                .head(k).reset_index(drop=True))
        out = df[["source", "lang", "doc_id"]].copy()
        out["stratum_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    part = ds.map_batches(partial, batch_format="pandas")
    # dozens of strata — per-key map_groups dispatch is fine here
    return part.groupby("stratum").map_groups(merge, batch_format="pandas")


def stratified_sample_sql(rel: str = "documents", k: int = 4) -> str:
    return f"""
WITH d AS (
    SELECT doc_id, source, lang,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM {rel}
), r AS (
    SELECT source, lang, doc_id,
           row_number() OVER (PARTITION BY source, lang
                              ORDER BY h, doc_id) AS stratum_rank
    FROM d
)
SELECT source, lang, doc_id, CAST(stratum_rank AS BIGINT) AS stratum_rank
FROM r WHERE stratum_rank <= {k}
"""


# ------------------------------------------------ token-budget packing


def doc_pack(ds, budget: int = 256, shard_hex: int = 1):
    """Greedy token-budget sequence packing — the context-window packing
    step of a pre-training pipeline: concatenate whole documents into
    fixed-budget windows so short docs don't waste sequence slots.  Each
    doc lands in a shard (first ``shard_hex`` hex digits of md5(doc_id));
    within a shard docs are taken in doc_id order and appended to the
    current window until the NEXT doc would overflow ``budget`` whitespace
    tokens, which starts a new window (an oversized doc still opens — and
    overflows — its own window; it is never split).

    100 TB shape: ONE shuffle on the shard key; the greedy fill is
    inherently sequential WITHIN a shard (an accumulator with reset cannot
    vectorize), so parallelism comes from the shard count — raise
    ``shard_hex`` (16^n shards) with the corpus exactly like
    ``exact_dedup``'s hex_chars knob.  Per-shard work is a single O(rows)
    integer pass over one int column."""
    import numpy as np
    import pandas as pd  # noqa: F401

    def project(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        toks = [len(_WS_TOKEN.findall(t)) for t in batch["text"].to_pylist()]
        shards = [hashlib.md5(str(d).encode()).hexdigest()[:shard_hex]
                  for d in ids]
        return pa.table({
            "doc_id": batch["doc_id"],
            "shard": pa.array(shards, pa.string()),
            "tokens": pa.array(toks, pa.int64()),
        })

    def pack(df):
        df = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        toks = df["tokens"].to_numpy()
        win = np.empty(len(toks), dtype=np.int64)
        acc = 0
        w = 0
        for i, t in enumerate(toks):
            t = int(t)
            if i == 0:
                acc = t
            elif acc + t > budget:
                w += 1
                acc = t
            else:
                acc += t
            win[i] = w
        df["window_id"] = win
        return df[["shard", "doc_id", "tokens", "window_id"]]

    part = ds.map_batches(project, batch_format="pyarrow")
    # 16^shard_hex shards — bounded key domain, per-key dispatch fine
    return part.groupby("shard").map_groups(pack, batch_format="pandas")


def doc_pack_sql(rel: str = "documents", budget: int = 256,
                 shard_hex: int = 1) -> str:
    # the greedy accumulator-with-reset is a per-row recurrence → recursive
    # CTE walking rn → rn+1 within each shard (small at oracle scale)
    return f"""
WITH RECURSIVE t AS (
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, {shard_hex}) AS shard,
           CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tokens
    FROM {rel}
), o AS (
    SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
    FROM t
), walk AS (
    SELECT shard, rn, doc_id, tokens,
           CAST(0 AS BIGINT) AS window_id, tokens AS acc
    FROM o WHERE rn = 1
    UNION ALL
    SELECT o.shard, o.rn, o.doc_id, o.tokens,
           CASE WHEN walk.acc + o.tokens > {budget}
                THEN walk.window_id + 1 ELSE walk.window_id END,
           CASE WHEN walk.acc + o.tokens > {budget}
                THEN o.tokens ELSE walk.acc + o.tokens END
    FROM walk JOIN o ON o.shard = walk.shard AND o.rn = walk.rn + 1
)
SELECT shard, doc_id, tokens, window_id FROM walk
"""


# ------------------------------------------------- train/val/test split

# 4-hex-digit md5 prefix thresholds: 0xfae1/0x10000 ≈ 98.0%,
# 0xfd71/0x10000 ≈ 99.0% — string compare, shared verbatim with the oracle
SPLIT_TRAIN_LT = "fae1"
SPLIT_VAL_LT = "fd71"


def doc_split(ds):
    """Deterministic train/val/test assignment — the holdout-split step of
    a training-data pipeline.  Content-addressed on md5(doc_id) (same
    bucket family as ``doc_mix``/``doc_sample``), so the split is stable
    across runs, partitionings and corpus growth: a doc never migrates
    between splits when new data arrives.  Map-only at 100 TB — no
    shuffle, no state, no broadcast."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        buckets = [hashlib.md5(str(d).encode()).hexdigest()[:4] for d in ids]
        split = ["train" if b < SPLIT_TRAIN_LT
                 else ("val" if b < SPLIT_VAL_LT else "test")
                 for b in buckets]
        return pa.table({
            "doc_id": batch["doc_id"],
            "bucket": pa.array(buckets, pa.string()),
            "split": pa.array(split, pa.string()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def doc_split_sql(rel: str = "documents") -> str:
    b = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)"
    return f"""
SELECT doc_id, {b} AS bucket,
       CASE WHEN {b} < '{SPLIT_TRAIN_LT}' THEN 'train'
            WHEN {b} < '{SPLIT_VAL_LT}' THEN 'val'
            ELSE 'test' END AS split
FROM {rel}
"""


# --------------------------------------------------------- inverted index

INVINDEX_CAP = 32  # posting-list truncation (lowest doc_ids kept; df exact)


def inverted_index(ds, cap: int = INVINDEX_CAP, n_parts: int | None = None):
    """Token → (exact document frequency, truncated posting list) — the
    retrieval-index build step of a training-data pipeline.

    Scale shape: tokens are an unbounded, Zipf-skewed key domain, so the
    per-batch COMBINER is the whole story — each batch emits one row per
    distinct token carrying ``part_df`` (docs in this batch; docs never
    split across rows, so batch partials are disjoint and sum exactly) and
    the batch's ``cap`` lowest doc_ids.  A stopword token therefore ships
    O(cap) ids per batch, never its full posting list, and the ONE
    crc32-range shuffle stays skew-proof.  Each range merges with one
    vectorized pandas pass (sum df, k-way-merge postings, re-truncate).
    Postings are emitted as a comma-joined string (exact, hash-comparable;
    the SQL oracle truncates with a window rank the same way)."""
    import numpy as np

    from ..util import default_n_parts, key_partition_ids, pre_shuffle_coalesce

    if n_parts is None:
        n_parts = default_n_parts()

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        tok_to_docs: dict[str, list[int]] = {}
        for i, t in zip(ids, texts):
            for w in set(_WS_TOKEN.findall(t)):
                tok_to_docs.setdefault(w, []).append(int(i))
        toks = sorted(tok_to_docs)
        dfs = np.empty(len(toks), dtype=np.int64)
        posts = []
        for j, w in enumerate(toks):
            docs = tok_to_docs[w]
            dfs[j] = len(docs)
            docs.sort()
            posts.append(docs[:cap])
        t = pa.table({
            "token": pa.array(toks, pa.string()),
            "part_df": pa.array(dfs, pa.int64()),
            "part_post": pa.array(posts, pa.list_(pa.int64())),
        })
        return t.append_column(
            "gpart", pa.array(key_partition_ids(t["token"], n_parts)))

    def per_range(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        agg = df.groupby("token", sort=True).agg(
            df_=("part_df", "sum"),
            post=("part_post", lambda s: ",".join(
                str(x) for x in sorted(
                    int(v) for lst in s for v in lst)[:cap])),
        ).reset_index()
        return pa.table({
            "token": pa.array(agg["token"], pa.string()),
            "df": pa.array(agg["df_"].astype("int64"), pa.int64()),
            "postings": pa.array(agg["post"], pa.string()),
        })

    parts = pre_shuffle_coalesce(ds.map_batches(partial, batch_format="pyarrow"))
    return parts.groupby("gpart").map_groups(per_range, batch_format="pyarrow")


def inverted_index_sql(rel: str = "documents", cap: int = INVINDEX_CAP) -> str:
    return f"""
WITH w AS (
    SELECT doc_id,
           UNNEST(list_distinct(regexp_extract_all(text, '\\S+'))) AS token
    FROM {rel}
), r AS (
    SELECT token, doc_id,
           ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
    FROM w
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= {cap} THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM r GROUP BY token
"""


# -------------------------------------------------------------- chunking

CHUNK_TOKENS = 64   # window width (whitespace tokens)
CHUNK_STRIDE = 48   # window stride (16-token overlap)


def doc_chunk(ds, window: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE):
    """Sliding-window document chunking — the context-window prep step of a
    RAG / training pipeline: each document becomes ``ceil(n_tok/stride)``
    overlapping chunks of ≤``window`` whitespace tokens (start positions
    0, stride, 2·stride, … < n_tok; empty documents yield no chunks).

    Map-only row expansion — rows multiply, bytes grow only by the overlap
    fraction (stride/window), so the stage streams at any scale with no
    shuffle and no state.  Chunk ids are per-doc ordinals (deterministic,
    resumable)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        o_id, o_cid, o_start, o_n, o_text = [], [], [], [], []
        for i, t in zip(ids, texts):
            toks = _WS_TOKEN.findall(t)
            for cid, start in enumerate(range(0, len(toks), stride)):
                piece = toks[start:start + window]
                o_id.append(i)
                o_cid.append(cid)
                o_start.append(start)
                o_n.append(len(piece))
                o_text.append(" ".join(piece))
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "chunk_id": pa.array(o_cid, pa.int64()),
            "start_tok": pa.array(o_start, pa.int64()),
            "n_tok": pa.array(o_n, pa.int64()),
            "chunk_text": pa.array(o_text, pa.string()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def doc_chunk_sql(rel: str = "documents", window: int = CHUNK_TOKENS,
                  stride: int = CHUNK_STRIDE) -> str:
    return f"""
WITH w AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM {rel}
), s AS (
    SELECT doc_id, ws, CAST(st AS BIGINT) AS start_tok
    FROM w, UNNEST(range(0, len(ws), {stride})) AS t(st)
)
SELECT doc_id, start_tok // {stride} AS chunk_id, start_tok,
       CAST(LEAST({window}, len(ws) - start_tok) AS BIGINT) AS n_tok,
       array_to_string(ws[start_tok + 1 : start_tok + {window}], ' ')
           AS chunk_text
FROM s
"""


# ------------------------------------------------------------- BM25 scoring


BM25_TERMS = ("query", "dup", "merge")   # fixed query: common + rare + mid
BM25_K1 = 1200   # k1 = 1.2, milli-scaled
BM25_B = 750     # b = 0.75, milli-scaled
_BM25_SCALE = 1000


def doc_bm25(make_docs_ds, terms: tuple[str, ...] = BM25_TERMS,
             k1: int = BM25_K1, b: int = BM25_B):
    """BM25 relevance scoring of every document against a FIXED query —
    the retrieval-scoring step of a training-data/RAG pipeline — in exact
    INTEGER arithmetic (the host_rank philosophy: milli/micro-scaled
    integer ops make every reduce order-independent and the oracle an
    exact BIGINT expression; no float or ``ln`` crosses the compare).

    Integer recast of the Robertson/Sparck-Jones formula (documented
    deviation: the log idf is replaced by the rational surrogate
    ``(N - df + 1) / (df + 1)``, micro-scaled — monotone in df like the
    true idf, exactly representable):

        avgdl_milli   = (sum_dl * 1000) // N
        rel_len_milli = (dl * 1000000) // avgdl_milli
        norm_milli    = 1000 - b + (b * rel_len_milli) // 1000
        den_milli     = tf * 1000 + (k1 * norm_milli) // 1000
        tf_part_micro = (tf * (k1 + 1000) * 1000000) // den_milli
        idf_micro     = (1000000 * (N - df + 1)) // (df + 1)
        score_micro   = (idf_micro * tf_part_micro) // 1000000

    Two-pass shape (the doc_lm_score precedent — ``make_docs_ds`` is a
    zero-arg factory; the corpus is re-scanned, not pinned):

    * pass 1 — corpus constants: per-batch partials (n docs, sum dl, df
      per query term) gathered to the driver; the partial table is
      O(batches × |terms|), a true small side.
    * pass 2 — map-only scoring: per-doc tf/dl against the broadcast
      constants; one output row per (doc, matching term).  No shuffle at
      all — BM25 against a fixed query is embarrassingly parallel once
      the corpus constants exist.

    int64 headroom: idf_micro can reach ~1e6·N/2 (df = 1) and
    tf_part_micro ~2.2e6, so ``idf_micro * tf_part_micro`` stays inside
    int64 only for N ≲ 8e6 docs per scored corpus partition; beyond that,
    rescale idf to milli (same formula shape, bound rises ~1000× to
    N ≲ 8e9) — mirror the rescale in the SQL oracle, whose BIGINT errors
    at the same point."""
    import numpy as np
    import pandas as pd

    terms = tuple(terms)
    tset = set(terms)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        sum_dl = 0
        dfs = dict.fromkeys(terms, 0)
        for t in texts:
            toks = _WS_TOKEN.findall(t)
            sum_dl += len(toks)
            for w in tset.intersection(toks):
                dfs[w] += 1
        return pa.table({
            "term": pa.array(list(terms), pa.string()),
            "part_df": pa.array([dfs[w] for w in terms], pa.int64()),
            "part_n": pa.array([n] + [0] * (len(terms) - 1), pa.int64()),
            "part_dl": pa.array([sum_dl] + [0] * (len(terms) - 1), pa.int64()),
        })

    parts = make_docs_ds().map_batches(
        partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["part_n"].sum())
    sum_dl = int(parts["part_dl"].sum())
    df_by_term = parts.groupby("term")["part_df"].sum().to_dict()
    avgdl_milli = (sum_dl * _BM25_SCALE) // n_docs
    idf_micro = {w: (1_000_000 * (n_docs - int(df_by_term[w]) + 1))
                 // (int(df_by_term[w]) + 1) for w in terms}

    def score(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        o_id, o_term, o_tf, o_dl, o_score = [], [], [], [], []
        for i, t in zip(ids, texts):
            toks = _WS_TOKEN.findall(t)
            dl = len(toks)
            if not dl:
                continue
            rel_len_milli = (dl * 1_000_000) // avgdl_milli
            norm_milli = _BM25_SCALE - b + (b * rel_len_milli) // _BM25_SCALE
            for w in terms:
                tf = toks.count(w)
                if not tf:
                    continue
                den_milli = tf * _BM25_SCALE + (k1 * norm_milli) // _BM25_SCALE
                tf_part_micro = (tf * (k1 + _BM25_SCALE) * 1_000_000) // den_milli
                o_id.append(int(i))
                o_term.append(w)
                o_tf.append(tf)
                o_dl.append(dl)
                o_score.append((idf_micro[w] * tf_part_micro) // 1_000_000)
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "term": pa.array(o_term, pa.string()),
            "tf": pa.array(o_tf, pa.int64()),
            "dl": pa.array(o_dl, pa.int64()),
            "score_micro": pa.array(o_score, pa.int64()),
        })

    return make_docs_ds().map_batches(score, batch_format="pyarrow")


def doc_bm25_sql(rel: str = "documents", terms: tuple[str, ...] = BM25_TERMS,
                 k1: int = BM25_K1, b: int = BM25_B) -> str:
    tlist = ", ".join(f"'{w}'" for w in terms)
    return f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM {rel}
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(ws)) AS BIGINT) AS sum_dl
    FROM toks
), w AS (
    SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, UNNEST(ws) AS token
    FROM toks
), tf AS (
    SELECT doc_id, ANY_VALUE(dl) AS dl, token,
           CAST(COUNT(*) AS BIGINT) AS tf
    FROM w WHERE token IN ({tlist}) GROUP BY doc_id, token
), df AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
), c AS (
    SELECT n_docs, (sum_dl * 1000) // n_docs AS avgdl_milli FROM stats
), s AS (
    SELECT tf.doc_id, tf.token, tf.tf, tf.dl,
           (1000000 * (c.n_docs - df.df + 1)) // (df.df + 1) AS idf_micro,
           1000 - {b} + ({b} * ((tf.dl * 1000000) // c.avgdl_milli)) // 1000
               AS norm_milli
    FROM tf JOIN df ON df.token = tf.token CROSS JOIN c
)
SELECT doc_id, token AS term, tf, dl,
       (idf_micro * ((tf * ({k1} + 1000) * 1000000)
                     // (tf * 1000 + ({k1} * norm_milli) // 1000)))
           // 1000000 AS score_micro
FROM s
"""


# --------------------------------------------------------- term co-occurrence


COOCCUR_TERMS = ("query", "dup", "merge", "scan", "sort", "join", "hash",
                 "stream")


def doc_term_cooccur(ds, terms: tuple[str, ...] = COOCCUR_TERMS):
    """Document-level term CO-OCCURRENCE matrix over a FIXED vocabulary —
    the PMI/collocation-components aggregate: for every term pair (a < b),
    the number of documents containing BOTH, denormalized with each
    term's own document count and the corpus size so PMI assembles
    downstream in exact integers.

    Scale shape: the fixed |terms| bounds the pair domain to |terms|²
    regardless of corpus size, so per-batch dict partials (pair counts,
    term counts, doc count) are constant-sized and a single-block merge
    finishes the job — zero shuffles.  The unbounded-vocabulary
    escalation is the DF-capped pair generation of doc_jaccard_pairs
    (same combiner discipline, documented there)."""
    from itertools import combinations

    terms = tuple(terms)
    tset = set(terms)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        pair_n: dict[tuple[str, str], int] = {}
        term_n = dict.fromkeys(terms, 0)
        for t in texts:
            present = sorted(tset.intersection(_WS_TOKEN.findall(t)))
            for w in present:
                term_n[w] += 1
            for a, b in combinations(present, 2):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
        rows_a = [a for a, _ in pair_n] + list(terms) + [""]
        rows_b = [b for _, b in pair_n] + [""] * len(terms) + [""]
        rows_n = ([pair_n[k] for k in pair_n] + [term_n[w] for w in terms]
                  + [len(texts)])
        return pa.table({
            "a": pa.array(rows_a, pa.string()),
            "b": pa.array(rows_b, pa.string()),
            "part_n": pa.array(rows_n, pa.int64()),
        })

    def merge(df):
        import pandas as pd

        g = df.groupby(["a", "b"], sort=False)["part_n"].sum()
        n_docs = int(g.get(("", ""), 0))
        term_n = {w: int(g.get((w, ""), 0)) for w in terms}
        rows = []
        for (a, b), n in g.items():
            if a == "" or b == "":
                continue
            rows.append({"term_a": a, "term_b": b, "n_both": int(n),
                         "n_a": term_n[a], "n_b": term_n[b],
                         "n_docs": n_docs})
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype="int64" if c.startswith("n") else object)
                                 for c in ("term_a", "term_b", "n_both",
                                           "n_a", "n_b", "n_docs")})
        out = pd.DataFrame(rows)
        for c in ("n_both", "n_a", "n_b", "n_docs"):
            out[c] = out[c].astype("int64")
        return out

    return ds.map_batches(partial, batch_format="pyarrow").repartition(
        1).map_batches(merge, batch_format="pandas", batch_size=None)


def doc_term_cooccur_sql(rel: str = "documents",
                         terms: tuple[str, ...] = COOCCUR_TERMS) -> str:
    tlist = ", ".join(f"'{w}'" for w in terms)
    return f"""
WITH p AS (
    SELECT DISTINCT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS tok
    FROM {rel}
), f AS (
    SELECT doc_id, tok FROM p WHERE tok IN ({tlist})
), tc AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY tok
), n AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {rel}
)
SELECT x.tok AS term_a, y.tok AS term_b,
       CAST(COUNT(*) AS BIGINT) AS n_both,
       ANY_VALUE(ta.n) AS n_a, ANY_VALUE(tb.n) AS n_b,
       ANY_VALUE(n.n_docs) AS n_docs
FROM f x
JOIN f y ON y.doc_id = x.doc_id AND x.tok < y.tok
JOIN tc ta ON ta.tok = x.tok
JOIN tc tb ON tb.tok = y.tok
CROSS JOIN n
GROUP BY 1, 2
"""


# ---------------------------------------------------- compression signal


def compress_ratio(ds):
    """Compression-ratio quality signal (the Gopher / FineWeb-family
    compressibility heuristic): templated or highly repetitive text
    compresses far below natural prose, so
    ``ratio_permille = len(zlib(text)) * 1000 // len(utf8(text))`` is a
    cheap per-document repetition/boilerplate score complementing the
    explicit duplicate-line/ngram signals of ``repetition_stats``.
    zlib level pinned at 6 for determinism.  Map-only, zero shuffle;
    rows-only (SQL has no zlib) — brute-force + discrimination pytest in
    test_training_ops.py."""
    import zlib

    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        raw = [len(t.encode("utf-8")) for t in texts]
        comp = [len(zlib.compress(t.encode("utf-8"), 6)) for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "raw_bytes": pa.array(raw, pa.int64()),
            "compressed_bytes": pa.array(comp, pa.int64()),
            "ratio_permille": pa.array(
                [c * 1000 // r if r else 1000 for c, r in zip(comp, raw)],
                pa.int64()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")
