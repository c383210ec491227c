"""Training-data pipeline operators: text analysis, dedup family, embedding
similarity — oracle parity at sf0.001 plus semantic checks the SQL compare
can't express (LSH recall, simhash Hamming locality)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import assert_matches_oracle, to_pandas

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", [
    "doc_tokens", "doc_quality", "doc_langid", "doc_fingerprint",
    "doc_jaccard_pairs", "doc_exact_dedup", "embed_neardup", "ann_topk",
    "doc_filter", "dedup_clusters", "doc_len_histogram", "corpus_keep",
    "ngram_topk", "doc_decontam", "doc_pii", "doc_repetition", "doc_mix",
    "doc_dup_spans", "doc_sample_stratified", "doc_pack", "doc_split",
    "doc_len_quantiles", "doc_lm_score",
])
def test_oracle_parity(name):
    assert_matches_oracle(name, SF)


def test_minhash_recall_of_jaccard_pairs():
    """LSH candidates must cover every true Jaccard near-dup pair (at the
    0.5 threshold the banding curve puts detection probability ≈ 1)."""
    from har2tree_ray import queries as q

    true = to_pandas(q.q_doc_jaccard_pairs(SF))
    cand = to_pandas(q.q_doc_minhash_pairs(SF))
    true_pairs = set(zip(true["doc_a"], true["doc_b"]))
    cand_pairs = set(zip(cand["id_a"], cand["id_b"]))
    assert true_pairs, "fixture should contain planted near-dups"
    missed = true_pairs - cand_pairs
    assert not missed, f"minhash missed true pairs: {missed}"


def test_lsh_neardup_recall():
    from har2tree_ray import queries as q

    exact = to_pandas(q.q_embed_neardup(SF))
    approx = to_pandas(q.q_embed_neardup_lsh(SF))
    es = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    ls = set(zip(approx["vec_id_a"], approx["vec_id_b"]))
    # in-bucket exact verification ⇒ no false positives, ever
    assert ls <= es
    if es:
        assert len(es & ls) / len(es) >= 0.9


def test_corpus_keep_lsh_recall_sf01():
    """Scale-path verdict vs the exact verdict at sf0.1 (5k docs): the LSH
    path must reproduce ≥90% of the exact path's drop verdicts, and every
    disagreement must be a recall miss (LSH keeping a doc the exact path
    dropped as near_dup) — never a false drop of a kept doc, because the
    candidate subset is exact-verified."""
    from har2tree_ray import queries as q

    sf = "/root/testdata/sf0.1"
    exact = to_pandas(q.q_corpus_keep(sf)).set_index("doc_id")
    lsh = to_pandas(q.q_corpus_keep_lsh(sf)).set_index("doc_id")
    assert len(exact) == len(lsh)
    joined = exact.join(lsh, lsuffix="_e", rsuffix="_l")
    # filter + exact-dup verdicts share code paths — must agree everywhere
    non_near = joined[~joined["reason_e"].str.startswith("near_dup_of:")
                      & ~joined["reason_l"].str.startswith("near_dup_of:")]
    pd.testing.assert_series_equal(non_near["keep_e"], non_near["keep_l"],
                                   check_names=False)
    dropped_exact = set(joined.index[joined["reason_e"]
                                     .str.startswith("near_dup_of:")])
    dropped_lsh = set(joined.index[joined["reason_l"]
                                   .str.startswith("near_dup_of:")])
    assert dropped_exact, "sf0.1 should contain planted near-dups"
    recall = len(dropped_exact & dropped_lsh) / len(dropped_exact)
    assert recall >= 0.9, (recall, len(dropped_exact), len(dropped_lsh))


def test_corpus_keep_auto_routes_by_size():
    """Below the knob the auto verdict IS the exact verdict; forcing the
    knob to 0 routes through the LSH path and still yields one verdict row
    per doc with the same schema."""
    import ray.data as rd

    from har2tree_ray.pipelines import corpus

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    exact = to_pandas(corpus.corpus_keep_auto(docs)).sort_values(
        "doc_id").reset_index(drop=True)
    want = to_pandas(corpus.corpus_keep(docs)).sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, want)
    lsh = to_pandas(corpus.corpus_keep_auto(docs, lsh_above=0))
    assert len(lsh) == len(want)
    assert list(lsh.columns) == list(want.columns)


def test_simhash_near_dup_locality():
    """Near-identical texts (the planted Jaccard pairs) must land within a
    small Hamming distance; the all-pairs median must be far larger."""
    from har2tree_ray import queries as q

    sh = to_pandas(q.q_doc_simhash(SF)).set_index("id")
    hashes = ((sh["simhash_hi"].astype(np.uint64) << np.uint64(32))
              | sh["simhash_lo"].astype(np.uint64))
    pairs = to_pandas(q.q_doc_jaccard_pairs(SF))
    assert len(pairs) > 0

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    near = [ham(hashes[a], hashes[b]) for a, b in zip(pairs["doc_a"], pairs["doc_b"])]
    assert max(near) <= 16
    rng = np.random.RandomState(0)
    ids = hashes.index.to_numpy()
    rand = [ham(hashes[rng.choice(ids)], hashes[rng.choice(ids)]) for _ in range(200)]
    assert np.median(rand) > max(near)


def test_exact_dedup_keeps_first_id():
    import ray.data as rd

    from har2tree_ray.stages.dedup import exact_dedup

    ds = rd.from_items([
        {"doc_id": 3, "text": "aa"}, {"doc_id": 1, "text": "aa"},
        {"doc_id": 2, "text": "bb"},
    ])
    out = to_pandas(exact_dedup(ds, "doc_id", "text")).sort_values("keep_id")
    assert out["keep_id"].tolist() == [1, 2]
    assert out["n_dups"].tolist() == [2, 1]


def test_ann_topk_is_true_topk():
    """Brute-force the ground truth in numpy and compare the id sets."""
    import duckdb

    from har2tree_ray import queries as q
    from har2tree_ray.stages.embed import ANN_K, ANN_NUM_QUERIES

    got = to_pandas(q.q_ann_topk(SF))
    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    ids = df["vec_id"].to_numpy()
    m = np.array(df["embedding"].tolist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m[:ANN_NUM_QUERIES] @ m.T
    for qi in range(ANN_NUM_QUERIES):
        s = sims[qi].copy()
        s[ids == ids[qi]] = -np.inf
        order = np.lexsort((ids, -s))[:ANN_K]
        want = ids[order].tolist()
        have = got[got["query_id"] == ids[qi]].sort_values("rank")["vec_id"].tolist()
        assert have == want, f"query {ids[qi]}: {have} != {want}"


def test_ann_ivf_recall():
    """IVF approximate top-k must recover most of the exact top-k."""
    from har2tree_ray import queries as q
    from har2tree_ray.stages.embed import ann_topk_ivf
    from har2tree_ray.sources.interleaved import read_table

    exact = to_pandas(q.q_ann_topk(SF))
    approx = to_pandas(ann_topk_ivf(read_table(SF, "embeddings",
                                               columns=["vec_id", "embedding"])))
    recalls = []
    for qid, g in exact.groupby("query_id"):
        want = set(g["vec_id"])
        have = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(want & have) / len(want))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_dedup_clusters_transitivity():
    """a~b and b~c must land a, b, c in one cluster labeled min(a,b,c)."""
    import ray.data as rd

    from har2tree_ray.stages.dedup import dedup_clusters

    docs = rd.from_items([{"doc_id": d} for d in ["a", "b", "c", "d", "e"]])
    pairs = rd.from_items([{"doc_a": "b", "doc_b": "c"},
                           {"doc_a": "a", "doc_b": "b"},
                           {"doc_a": "d", "doc_b": "e"}])
    out = to_pandas(dedup_clusters(docs, pairs)).set_index("doc_id")["cluster_id"]
    assert out.to_dict() == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_minhash_bucket_cap_drops_oversized_buckets():
    """Degenerate boilerplate buckets beyond max_bucket are dropped (with a
    logged count), not fanned out into O(B^2) pairs."""
    import ray.data as rd

    from har2tree_ray.stages.dedup import minhash_candidate_pairs

    docs = rd.from_items([{"doc_id": f"d{i}", "text": "same text " * 20}
                          for i in range(6)])
    full = to_pandas(minhash_candidate_pairs(docs))
    assert len(full) == 15  # C(6,2) identical docs
    capped = to_pandas(minhash_candidate_pairs(docs, max_bucket=3))
    assert len(capped) == 0


def test_knn_graph_exact():
    """The distributed kNN graph equals a single-process numpy ground truth
    (identical arithmetic, independent plumbing)."""
    import duckdb

    from har2tree_ray import queries as q
    from har2tree_ray.stages.embed import KNN_GRAPH_K

    got = to_pandas(q.q_knn_graph(SF))
    df = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    ids = df["vec_id"].to_numpy()
    m = np.array(df["embedding"].tolist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    by_q = got.sort_values(["vec_id", "rank"]).groupby("vec_id")["nbr_id"].apply(list)
    assert len(by_q) == len(ids)
    rng = np.random.RandomState(3)
    for i in rng.choice(len(ids), size=60, replace=False):
        order = np.lexsort((ids, -sims[i]))[:KNN_GRAPH_K]
        assert by_q[ids[i]] == ids[order].tolist(), ids[i]


def test_semdedup_keep_matches_oracle():
    """SemDeDup verdict (cluster + lower-id cosine prune) is hash-exact
    against the DuckDB oracle that trains the SAME centroids."""
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle("semdedup_keep", "/root/testdata/sf0.001")


def test_semdedup_prune_rule_bit_exact():
    """The vectorized lower-triangle prune equals the brute-force greedy
    lower-id rule on a fixed random cluster."""
    import numpy as np

    from har2tree_ray.stages.embed import _normalize

    rs = np.random.RandomState(7)
    m = _normalize(rs.randn(40, 8))
    tau = 0.5
    sims = m @ m.T
    fast = ~(np.tril(sims >= tau, k=-1).any(axis=1))
    slow = np.array([not any(sims[i, j] >= tau for j in range(i))
                     for i in range(len(m))])
    assert (fast == slow).all()


def test_doc_tfidf_top_matches_oracle():
    """tf/df ranking with integer-only output columns is hash-exact against
    the window-function oracle (float division ordering is IEEE-identical)."""
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle("doc_tfidf_top", "/root/testdata/sf0.001")


def test_doc_normalize_matches_oracle():
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle("doc_normalize", "/root/testdata/sf0.001")


def test_doc_normalize_unicode_semantics():
    """NFC + lowercase + whitespace collapse on inputs the ASCII synth
    vocabulary never exercises (the oracle covers the synth subset; these
    pin the full Python semantics)."""
    import pyarrow as pa

    from har2tree_ray.stages.text import doc_normalize

    import ray.data as rd

    rows = [
        {"doc_id": 1, "text": "Café  LATTE"},     # NFC combines e+◌́ → é
        {"doc_id": 2, "text": " A\tB\n\nC "},
        {"doc_id": 3, "text": "ΣΟΦΟΣ"},                 # greek lowercase
    ]
    out = {r["doc_id"]: r for r in
           doc_normalize(rd.from_items(rows)).take_all()}
    assert out[1]["norm_text"] == "café latte"
    assert out[1]["n_chars"] == 12 and out[1]["n_chars_norm"] == 10
    assert out[2]["norm_text"] == "a b c"
    # Python str.lower applies the SpecialCasing final-sigma rule
    # (DuckDB lower maps Σ→σ uniformly — Greek is outside the
    # oracle-covered synth vocabulary, documented contract)
    assert out[3]["norm_text"] == "σοφος"


def test_knn_graph_ivf_recall():
    """The IVF-bucketed kNN graph (no broadcast corpus — the 100 TB path)
    must recover most of the exact graph's neighbor sets, cover every
    vector, and never pair a vector with itself."""
    from har2tree_ray import queries as q

    exact = to_pandas(q.q_knn_graph(SF))
    approx = to_pandas(q.q_knn_graph_ivf(SF))
    assert (approx["vec_id"] != approx["nbr_id"]).all()
    assert set(approx["vec_id"]) == set(exact["vec_id"])
    e = exact.groupby("vec_id")["nbr_id"].apply(set)
    a = approx.groupby("vec_id")["nbr_id"].apply(set)
    recalls = [len(e[v] & a.get(v, set())) / len(e[v]) for v in e.index]
    assert sum(recalls) / len(recalls) >= 0.5, sum(recalls) / len(recalls)


def test_semdedup_group_budget_on_skew():
    """A pathologically skewed corpus (every vector near-identical → one
    k-means cluster) must still never form a prune group larger than the
    budget: the cluster is hash-split into sub-buckets, and the greedy
    lower-id rule runs per sub-bucket (one keeper each)."""
    import ray.data as rd

    from har2tree_ray.stages import embed

    rs = np.random.RandomState(7)
    base = rs.randn(8)
    vecs = base[None, :] + rs.randn(500, 8) * 1e-3
    ds = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                        for i in range(500)])
    budget = 64
    out = to_pandas(embed.semdedup_keep(ds, k=4, budget=budget))
    assert len(out) == 500

    # recompute the engine's (cluster, sub) key from its own output and
    # assert the hard bound
    sizes = out.groupby("cluster").size()
    nsub = {c: embed._semdedup_nsub(int(s), budget) for c, s in sizes.items()}
    sub = embed._semdedup_sub(
        out["vec_id"].to_numpy(),
        np.array([nsub[c] for c in out["cluster"]], dtype=np.int64))
    gsz = pd.DataFrame({"c": out["cluster"], "s": sub}).groupby(
        ["c", "s"]).size()
    assert gsz.max() <= budget, gsz.max()
    assert len(gsz) > 1  # the skewed cluster really did split

    # near-identical vectors: every sub-group keeps exactly its min vec_id
    assert int(out["keep"].sum()) == len(gsz)


def test_label_propagation_matches_union_find():
    """The distributed min-label-propagation escalation must produce
    clusters identical to the driver union-find base case on a generated
    graph with chains, stars, singletons and multi-component merges."""
    import ray.data as rd

    from har2tree_ray.stages.dedup import (dedup_clusters,
                                           label_propagation_clusters)

    rs = np.random.RandomState(11)
    n = 60
    docs = [f"d{i:03d}" for i in range(n)]
    pairs = []
    # chain (diameter stress), a star, random extra edges
    for i in range(0, 9):
        pairs.append((docs[i], docs[i + 1]))
    for i in range(30, 37):
        pairs.append((docs[30], docs[i]))
    for _ in range(12):
        a, b = rs.randint(0, n, size=2)
        if a != b:
            pairs.append((docs[a], docs[b]))
    docs_ds = rd.from_items([{"doc_id": d} for d in docs])
    pairs_ds = rd.from_items([{"doc_a": a, "doc_b": b} for a, b in pairs])

    base = to_pandas(dedup_clusters(docs_ds, pairs_ds)).sort_values(
        "doc_id").reset_index(drop=True)
    lp = to_pandas(label_propagation_clusters(
        docs_ds, pairs_ds)).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, lp)

    # the escalation threshold routes through label propagation
    esc = to_pandas(dedup_clusters(docs_ds, pairs_ds, max_driver_pairs=1)
                    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, esc)


def test_label_propagation_int_ids():
    """Production documents.parquet carries int64 doc ids; the escalation
    path must stay dtype-exact (the typed-null union layout it replaced
    raised ArrowTypeError on int ids and would have NaN-upcast int64 labels
    to float64)."""
    import ray.data as rd

    from har2tree_ray.stages.dedup import (dedup_clusters,
                                           label_propagation_clusters)

    n = 40
    pairs = [(i, i + 1) for i in range(0, 9)]          # chain
    pairs += [(20, j) for j in range(21, 26)]          # star
    pairs += [(30, 35), (35, 31), (8, 20)]             # merges
    docs_ds = rd.from_items([{"doc_id": i} for i in range(n)])
    pairs_ds = rd.from_items([{"doc_a": a, "doc_b": b} for a, b in pairs])

    base = to_pandas(dedup_clusters(docs_ds, pairs_ds)).sort_values(
        "doc_id").reset_index(drop=True)
    lp = to_pandas(label_propagation_clusters(
        docs_ds, pairs_ds)).sort_values("doc_id").reset_index(drop=True)
    assert str(lp["cluster_id"].dtype) == "int64"
    pd.testing.assert_frame_equal(base, lp, check_dtype=False)


def test_documents_ascii_whitespace_contract():
    """doc_normalize / doc_tfidf_top parity relies on Python's
    Unicode-aware whitespace handling agreeing with DuckDB's ASCII-only
    RE2 \\s and trim(); that holds only while document text carries no
    non-ASCII whitespace (NBSP, U+2028, ...).  Assert the contract on the
    driver corpus the oracle gate actually runs against."""
    import re

    import pyarrow.parquet as pq

    bad = re.compile(r"[^\S \t\n\r\f\v]")  # whitespace outside the ASCII set
    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["text"])
    for chunk in t["text"].chunks:
        for s in chunk.to_pylist():
            assert s is None or not bad.search(s)


def test_pii_patterns_on_real_shapes():
    """The synthetic corpus is PII-free (the oracle proves scan parity on
    it); the positive branches are covered here with genuine shapes."""
    import pyarrow as pa
    import ray.data as rd
    from har2tree_ray.stages import text

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "contact alice.smith+spam@example.co.uk or bob@x.io today",
            "server at 10.0.255.3 and 192.168.1.1 responded",
            "call 555-867-5309 or 555.123.4567 now",
            "no pii here at all",
        ]),
    })
    out = to_pandas(text.pii_stats(rd.from_arrow(docs))).set_index("doc_id")
    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "has_pii"]
    assert out.loc[1, "n_ipv4"] == 2
    assert out.loc[2, "n_phones"] == 2
    assert out.loc[3, ["n_emails", "n_ipv4", "n_phones"]].sum() == 0
    assert not out.loc[3, "has_pii"]


def test_decontam_flags_shared_shingles():
    """A doc sharing an 8-word window with a benchmark doc is contaminated;
    one sharing none is clean; the benchmark doc itself is marked."""
    import pyarrow as pa
    import ray.data as rd
    from har2tree_ray.stages import text

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    leaked = "prefix words then alpha beta gamma delta epsilon zeta eta theta trailer"
    clean = "completely different vocabulary with no overlap whatsoever in windows"
    docs = pa.table({
        # bench_mod=29 -> doc_id 0 is benchmark, 1 and 2 are corpus
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([bench_text, leaked, clean]),
    })
    out = to_pandas(text.decontaminate(rd.from_arrow(docs))).set_index("doc_id")
    assert out.loc[0, "is_bench"] and out.loc[0, "contaminated"]
    assert out.loc[1, "contaminated"] and out.loc[1, "n_hit"] >= 1
    assert not out.loc[1, "is_bench"]
    assert not out.loc[2, "contaminated"] and out.loc[2, "n_hit"] == 0


def test_dup_spans_planted_duplicates():
    """Two docs sharing a 10-word passage produce one merged span each
    covering exactly that passage (three overlapping 8-gram positions merge
    into one island); a doc with no shared gram and a short doc emit no
    rows."""
    import pyarrow as pa
    import ray.data as rd
    from har2tree_ray.stages import text

    shared = "one two three four five six seven eight nine ten"  # 10 words
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            f"{shared} tail0 extra0 filler0",
            f"lead1 pad1 {shared} tail1",
            "entirely different words with zero gram overlap across corpus docs",
            "short doc",   # < 8 words: no gram
        ]),
    })
    out = to_pandas(text.dup_spans(rd.from_arrow(docs)))
    by_doc = {int(r["doc_id"]): r for _, r in out.iterrows()}
    assert set(by_doc) == {0, 1}
    # doc 0: shared passage at words 1-10 -> positions 1,2,3 merge
    assert (by_doc[0]["span_start"], by_doc[0]["span_end"],
            by_doc[0]["n_grams"]) == (1, 10, 3)
    # doc 1: shared passage starts at word 3 -> words 3-12
    assert (by_doc[1]["span_start"], by_doc[1]["span_end"],
            by_doc[1]["n_grams"]) == (3, 12, 3)


def test_repetition_signals():
    import pyarrow as pa
    import ray.data as rd
    from har2tree_ray.stages import text

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "spam spam spam spam",          # one word repeated
            "a b c d a b c d",              # repeated 4-gram "a b c d"
            "",                              # empty edge case
        ]),
    })
    out = to_pandas(text.repetition_stats(rd.from_arrow(docs))).set_index("doc_id")
    assert out.loc[0, "n_words"] == 4 and out.loc[0, "n_distinct_words"] == 1
    assert out.loc[0, "top_word_count"] == 4
    assert out.loc[0, "top_bigram_count"] == 3  # "spam spam" x3
    r1 = out.loc[1]
    assert r1["n_4grams"] == 5 and r1["n_distinct_4grams"] == 4  # "a b c d" dup
    r2 = out.loc[2]
    assert (r2[["n_words", "n_distinct_words", "top_word_count", "n_bigrams",
                "top_bigram_count", "n_4grams", "n_distinct_4grams"]] == 0).all()


def test_doc_mix_rates_track_thresholds():
    """Kept fraction per source approximates its threshold (c000 -> 75%,
    4000 -> 25%) and the keep rule is the documented md5 compare."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd
    from har2tree_ray.stages import text

    n = 2000
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(["srcA" if i % 2 else "srcB" for i in range(n)]),
    })
    out = to_pandas(text.doc_mix(rd.from_arrow(docs)))
    for src in ("srcA", "srcB"):
        sub = out[out["source"] == src]
        thr = text._mix_threshold(src)
        assert (sub["threshold"] == thr).all()
        want_rate = int(thr, 16) / 0x10000
        got_rate = sub["kept"].mean()
        assert abs(got_rate - want_rate) < 0.05, (src, thr, got_rate)
        # spot-check the rule itself
        row = sub.iloc[0]
        assert row["kept"] == (
            hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:4] < thr)


def test_doc_pack_window_invariants():
    """Windows respect the budget (only a window's FIRST doc may overflow,
    since docs are never split) and window ids are contiguous per shard."""
    from har2tree_ray import queries as q

    df = to_pandas(q.q_doc_pack(SF)).sort_values(["shard", "doc_id"])
    assert len(df) > 0
    for shard, g in df.groupby("shard"):
        wins = g.groupby("window_id")["tokens"].agg(["sum", "count", "first"])
        # contiguous 0..n window ids in doc_id order
        assert list(wins.index) == list(range(len(wins)))
        over = wins[wins["sum"] > 256]
        # any overflowing window holds exactly one (oversized) doc
        assert (over["count"] == 1).all(), (shard, over)
        # greedy: a window closes only because the next doc would overflow
        g2 = g.reset_index(drop=True)
        for i in range(1, len(g2)):
            if g2.loc[i, "window_id"] != g2.loc[i - 1, "window_id"]:
                prev_win = g2.loc[i - 1, "window_id"]
                prev_sum = g2[g2["window_id"] == prev_win]["tokens"].sum()
                assert prev_sum + g2.loc[i, "tokens"] > 256


def test_stratified_sample_covers_every_stratum():
    """Each (source, lang) stratum keeps exactly min(k, stratum size) docs,
    ranked 1..n with no gaps."""
    import duckdb

    from har2tree_ray import queries as q

    out = to_pandas(q.q_doc_sample_stratified(SF))
    sizes = duckdb.sql(
        f"SELECT source, lang, count(*) AS n FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY 1, 2").df()
    kept = out.groupby(["source", "lang"]).agg(
        n=("doc_id", "size"), rmax=("stratum_rank", "max"),
        rmin=("stratum_rank", "min"))
    merged = sizes.merge(kept, on=["source", "lang"], how="left")
    assert merged["n_y"].notna().all()  # every stratum represented
    expect = merged["n_x"].clip(upper=4)
    assert (merged["n_y"] == expect).all()
    assert (merged["rmax"] == expect).all()
    assert (merged["rmin"] == 1).all()


def test_doc_split_rates_and_stability():
    """Split rates land near 98/1/1 and the assignment is a pure function
    of doc_id (row order / partitioning cannot move a doc between splits)."""
    from har2tree_ray import queries as q

    df = to_pandas(q.q_doc_split("/root/testdata/sf0.1"))
    rates = df["split"].value_counts(normalize=True)
    assert 0.96 <= rates.get("train", 0) <= 0.995
    assert 0.002 <= rates.get("val", 0) <= 0.02
    assert 0.002 <= rates.get("test", 0) <= 0.02
    small = to_pandas(q.q_doc_split(SF)).set_index("doc_id")["split"]
    big = df.set_index("doc_id")["split"]
    shared = small.index.intersection(big.index)
    assert len(shared) > 0
    assert (small.loc[shared] == big.loc[shared]).all()


def test_doc_bm25_matches_bruteforce():
    """Integer BM25 vs an independent per-doc Python recomputation, and
    rank sanity: the rare term out-scores the common term at equal tf/dl."""
    import pandas as pd

    from har2tree_ray.sources.interleaved import read_table
    from har2tree_ray.stages import text as T

    got = T.doc_bm25(
        lambda: read_table(SF, "documents", columns=["doc_id", "text"])
    ).to_pandas()

    docs = read_table(SF, "documents", columns=["doc_id", "text"]).to_pandas()
    toks = [t.split() for t in docs["text"]]   # ASCII whitespace contract
    n_docs = len(docs)
    sum_dl = sum(len(t) for t in toks)
    avgdl_milli = (sum_dl * 1000) // n_docs
    df = {w: sum(1 for t in toks if w in t) for w in T.BM25_TERMS}
    rows = []
    for i, t in zip(docs["doc_id"], toks):
        dl = len(t)
        if not dl:
            continue
        norm_milli = 1000 - T.BM25_B + (T.BM25_B * ((dl * 1_000_000) // avgdl_milli)) // 1000
        for w in T.BM25_TERMS:
            tf = t.count(w)
            if not tf:
                continue
            idf_micro = (1_000_000 * (n_docs - df[w] + 1)) // (df[w] + 1)
            tfp = (tf * (T.BM25_K1 + 1000) * 1_000_000) // (
                tf * 1000 + (T.BM25_K1 * norm_milli) // 1000)
            rows.append({"doc_id": int(i), "term": w, "tf": tf, "dl": dl,
                         "score_micro": (idf_micro * tfp) // 1_000_000})
    want = pd.DataFrame(rows)
    key = ["doc_id", "term"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(got_s[want_s.columns.tolist()], want_s,
                                  check_dtype=False)
    # idf monotonicity: for equal (tf, dl), a rarer term scores higher
    m = got_s.pivot_table(index=["tf", "dl"], columns="term",
                          values="score_micro", aggfunc="first").dropna()
    rare = min(df, key=df.get)
    common = max(df, key=df.get)
    if rare in m.columns and common in m.columns and len(m):
        assert (m[rare] >= m[common]).all()


def test_doc_term_cooccur_bruteforce():
    from itertools import combinations

    import pandas as pd

    from har2tree_ray.sources.interleaved import read_table
    from har2tree_ray.stages import text as T

    got = T.doc_term_cooccur(
        read_table(SF, "documents", columns=["doc_id", "text"])).to_pandas()
    docs = read_table(SF, "documents", columns=["doc_id", "text"]).to_pandas()
    tset = set(T.COOCCUR_TERMS)
    pair_n, term_n = {}, dict.fromkeys(T.COOCCUR_TERMS, 0)
    for t in docs["text"]:
        present = sorted(tset.intersection(t.split()))
        for w in present:
            term_n[w] += 1
        for a, b in combinations(present, 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    want = pd.DataFrame([
        {"term_a": a, "term_b": b, "n_both": n,
         "n_a": term_n[a], "n_b": term_n[b], "n_docs": len(docs)}
        for (a, b), n in pair_n.items()])
    key = ["term_a", "term_b"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(got_s[want_s.columns.tolist()], want_s,
                                  check_dtype=False)


def test_doc_compress_ratio_bruteforce_and_discrimination():
    """Matches direct zlib on the same parquet; and the signal actually
    discriminates: pure repetition compresses far below prose."""
    import zlib

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from har2tree_ray.queries import queries

    sf = "/root/testdata/sf0.001"
    got = queries()["doc_compress_ratio"](sf)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    raw = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    want = pd.DataFrame({
        "doc_id": raw["doc_id"],
        "raw_bytes": [len(t.encode()) for t in raw["text"]],
        "compressed_bytes": [len(zlib.compress(t.encode(), 6))
                             for t in raw["text"]],
    })
    want["ratio_permille"] = [
        c * 1000 // r if r else 1000
        for c, r in zip(want["compressed_bytes"], want["raw_bytes"])]
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(g[w.columns], w, check_dtype=False)

    from har2tree_ray.stages.text import compress_ratio
    two = compress_ratio(rd.from_items(
        [{"doc_id": "rep", "text": "spam ham " * 500},
         {"doc_id": "nat", "text": " ".join(f"w{i}x{i*7%13}" for i in range(1000))}]
    )).to_pandas().set_index("doc_id")
    assert two.loc["rep", "ratio_permille"] < two.loc["nat", "ratio_permille"] / 3
