"""Deduplication operators.

* ``span_hash_groups`` — exact content dedup over span bodies, the recast of
  ``build_all_hashes`` (A2/D3, /root/reference/har2tree/har2tree.py:550-569):
  hash-partitioned groupby → per-group collect.
* ``exact_dedup`` — exact dedup over any (id, text) table: keep the first id
  per content hash.
* MinHash-LSH / SimHash near-dup live in this module too (engine additions
  for training-data pipelines; no reference counterpart).

Scale notes: the only shuffle key is the content hash (uniformly
distributed — no skew by construction); shingling/minhashing is vectorized
per batch and only the tiny (band, bucket) partials shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def add_text_hash(batch: pa.Table, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    texts = batch[text_col].to_pylist()
    h = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out_col, pa.array(h, pa.string()))


_HEX_PAIRS = pa.array([f"{i:02x}" for i in range(256)], pa.string())


def span_hash_groups(flat_ds, min_count: int = 2, hex_chars: int = 2):
    """body_hash → (n_spans, n_docs, n_urls) for hashes seen ≥ min_count.

    Plan: ONE shuffle keyed on a coarse hash-range of body_hash (first
    ``hex_chars`` hex chars → 256^(hex_chars/2)... 16^hex_chars ranges),
    then an exact batch-local ``group_by(body_hash)`` + distinct counts
    inside each range group.  Content hashes are uniform by construction,
    so ranges are perfectly balanced and every hash's rows land in exactly
    one group.

    Why not count-first-then-collect (the previous plan): with mostly-unique
    content a per-batch count pre-aggregate does NOT shrink — it emits one
    partial row per span — so the count phase moves the same row count
    through its own shuffle and doubles the fixed overhead (measured 3-4x
    slower at sf0.1).  Group size here is O(corpus / 16^hex_chars); raise
    ``hex_chars`` with corpus size (3 → 4096 ranges, 4 → 65536) to keep a
    range's rows inside one worker's heap."""
    from ..util import pre_shuffle_coalesce

    slim = flat_ds.select_columns(["body_hash", "doc_id", "media_ref"])

    def add_part(t: pa.Table) -> pa.Table:
        # vectorized range key: index of the leading hex pair (0..255),
        # extended by extra nibbles via a second slice when hex_chars > 2
        part = pc.cast(pc.index_in(
            pc.utf8_slice_codeunits(t["body_hash"], 0, 2),
            value_set=_HEX_PAIRS), pa.int32())
        if hex_chars > 2:
            hi = pc.cast(pc.index_in(
                pc.utf8_slice_codeunits(t["body_hash"], 2, 2 + (hex_chars - 2)),
                value_set=pa.array(
                    [f"{i:0{hex_chars - 2}x}" for i in range(16 ** (hex_chars - 2))],
                    pa.string())), pa.int32())
            part = pc.add(pc.multiply(part, 16 ** (hex_chars - 2)), hi)
        return t.append_column("hpart", part)

    def per_range(t: pa.Table) -> pa.Table:
        g = t.group_by("body_hash").aggregate(
            [("doc_id", "count"), ("doc_id", "count_distinct"),
             ("media_ref", "count_distinct")]
        )
        g = g.rename_columns(["body_hash", "n_spans", "n_docs", "n_urls"])
        g = g.filter(pc.greater_equal(g["n_spans"], min_count))
        return pa.table(
            {
                "body_hash": g["body_hash"],
                "n_spans": pc.cast(g["n_spans"], pa.int64()),
                "n_docs": pc.cast(g["n_docs"], pa.int64()),
                "n_urls": pc.cast(g["n_urls"], pa.int64()),
            }
        )

    parts = pre_shuffle_coalesce(
        slim.map_batches(add_part, batch_format="pyarrow"))
    return parts.groupby("hpart").map_groups(per_range, batch_format="pyarrow")


def exact_dedup(ds, id_col: str, text_col: str, hex_chars: int = 2):
    """Keep the lexicographically/numerically first id per identical text.

    Returns (content_hash, keep_id, n_dups) — one row per distinct content.
    Same plan as ``span_hash_groups`` and for the same reason: content
    hashes are mostly UNIQUE, so a native per-key aggregate sorts/merges one
    partial row per document — all exchange bookkeeping, no shrinkage
    (measured 4.1 s → 1.3 s at sf0.1 switching to this plan).  Instead the
    batch-local pre-agg rows shuffle ONCE on a coarse hash-range of
    content_hash (16^hex_chars uniform ranges; raise with corpus size) and
    each range resolves its keys exactly with one Arrow group_by.
    """
    from ..util import pre_shuffle_coalesce

    def pre(b: pa.Table) -> pa.Table:
        h = add_text_hash(b, text_col).select([id_col, "content_hash"])
        g = h.group_by("content_hash").aggregate([(id_col, "min"), (id_col, "count")])
        g = g.rename_columns(["content_hash", "part_min", "part_n"])
        part = pc.cast(pc.index_in(
            pc.utf8_slice_codeunits(g["content_hash"], 0, 2),
            value_set=_HEX_PAIRS), pa.int32())
        if hex_chars > 2:  # extra nibbles — same extension as span_hash_groups
            hi = pc.cast(pc.index_in(
                pc.utf8_slice_codeunits(g["content_hash"], 2, hex_chars),
                value_set=pa.array(
                    [f"{i:0{hex_chars - 2}x}" for i in range(16 ** (hex_chars - 2))],
                    pa.string())), pa.int32())
            part = pc.add(pc.multiply(part, 16 ** (hex_chars - 2)), hi)
        return g.append_column("hpart", part)

    def per_range(t: pa.Table) -> pa.Table:
        g = t.group_by("content_hash").aggregate(
            [("part_min", "min"), ("part_n", "sum")])
        return pa.table({
            "content_hash": g["content_hash"],
            "keep_id": g["part_min_min"],
            "n_dups": pc.cast(g["part_n_sum"], pa.int64()),
        })

    parts = pre_shuffle_coalesce(ds.map_batches(pre, batch_format="pyarrow"))
    return parts.groupby("hpart").map_groups(per_range, batch_format="pyarrow")


# --------------------------------------------------------------- MinHash-LSH

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Stateful signer: text → MinHash signature + LSH band keys.

    Permutation parameters live in ``__init__`` state; batches are signed
    in ``__call__``.  Deployed as plain tasks with a per-worker instance
    memo (``_worker_cached_minhasher``) — see the note there for why this
    beats an actor pool for microsecond-setup state.
    Emits one row per (doc, band): ``(id, band, band_hash, bh_part)`` where
    ``bh_part`` is a hash-range partition of ``band_hash`` — the LSH
    candidate shuffle keys on (band, bh_part), so no reducer ever sees a
    whole band (group size is O(corpus / n_parts), not O(corpus)).

    Shingling is the batch-vectorized ``text.shingle_hash_batch`` pass
    (tokenize once per doc, siphash unique tokens, k-window uint64
    polynomial) — the per-GRAM blake2b + join loop this replaces was the
    hot call of every LSH run; band keys are likewise a vectorized uint64
    polynomial over each band's signature rows, not a per-(doc, band)
    blake2b."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, bands: int = 16, k: int = 3,
                 n_parts: int = 32):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.n_parts = n_parts
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import _SH_B1, shingle_hash_batch

        texts = batch[self.text_col].to_pylist()
        ndocs = len(texts)
        doc_idx, _pos, sh_all, _ = shingle_hash_batch(
            texts, self.k, short="whole", dual=False)
        bounds = np.zeros(ndocs + 1, dtype=np.int64)
        np.cumsum(np.bincount(doc_idx, minlength=ndocs), out=bounds[1:])
        # per-doc affine+min: the (shingles × perms) intermediate stays
        # L2-resident per document — a single flat batch matmul measured
        # ~10x SLOWER (numpy uint64 modulo over a 50 MB intermediate)
        sig = np.empty((ndocs, self.num_perm), dtype=np.uint64)
        for d in range(ndocs):
            sh = sh_all[bounds[d]:bounds[d + 1]]
            vals = (self.a[None, :] * sh[:, None] + self.b[None, :]) % _MERSENNE
            sig[d] = vals.min(axis=0)
        r, b1 = self.rows_per_band, np.uint64(_SH_B1)
        s3 = sig.reshape(ndocs, self.bands, r)
        bh = np.zeros((ndocs, self.bands), dtype=np.uint64)
        for j in range(r):
            bh = bh * b1 + s3[:, :, j]
        flat_bh = bh.ravel()
        ids = batch[self.id_col].take(
            pa.array(np.repeat(np.arange(ndocs, dtype=np.int64), self.bands)))
        return pa.table(
            {
                "id": ids,
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                         ndocs), pa.int32()),
                "band_hash": pa.array(flat_bh, pa.uint64()),
                "bh_part": pa.array(
                    (flat_bh % np.uint64(self.n_parts)).astype(np.int32),
                    pa.int32()),
            }
        )


def minhash_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                            num_perm: int = 64, bands: int = 16, k: int = 3,
                            n_parts: int = 32, max_bucket: int = 10_000,
                            concurrency: int | tuple[int, int] | None = None):
    """LSH candidate duplicate pairs (id_a < id_b), deduped across bands.

    The candidate shuffle keys on ``(band, bh_part)`` — a hash-range of
    ``band_hash`` — so reducer group size is O(corpus / n_parts), never the
    whole band (a ``groupby("band")`` would funnel every doc's row for one
    band into a single group: bounded group *count*, unbounded group
    *size*).  All rows of one bucket share ``bh_part`` by construction, so
    no cross-bucket pair is ever lost.  Buckets larger than ``max_bucket``
    distinct ids (degenerate boilerplate content — O(B²) pair fan-out) are
    dropped with a logged count, never silently.
    """
    import logging

    from ..util import task_concurrency, worker_cached_stage

    # plain tasks + per-worker memo: MinHasher setup is microseconds, the
    # gram memo accumulates per worker exactly as it did per actor, and the
    # actor pool's spin-up (3-6 s per execution) disappears — see
    # util.worker_cached_stage for the contract
    sigs = ds.map_batches(
        worker_cached_stage(MinHasher, id_col=id_col, text_col=text_col,
                            num_perm=num_perm, bands=bands, k=k,
                            n_parts=n_parts),
        batch_format="pyarrow",
        **task_concurrency(concurrency),
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        # one (band, bh_part) hash-range per group — the per-bucket fan-out
        # is ONE vectorized pandas self-merge inside the group, never a Ray
        # group per (band, bucket) hash (that would be ~n_docs tiny groups)
        id_type = t.schema.field("id").type
        df = t.select(["band_hash", "id"]).to_pandas().drop_duplicates()
        sz = df.groupby("band_hash")["id"].transform("size")
        for bh, n in df.loc[sz > max_bucket].groupby("band_hash").size().items():
            logging.getLogger("har2tree_ray.dedup").warning(
                "minhash bucket %s dropped: %d ids > max_bucket=%d",
                bh, int(n), max_bucket)
        df = df[(sz >= 2) & (sz <= max_bucket)]
        m = df.merge(df, on="band_hash", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        return pa.table({"id_a": pa.array(m["id_a"].tolist(), id_type),
                         "id_b": pa.array(m["id_b"].tolist(), id_type)})

    pairs = sigs.groupby(["band", "bh_part"]).map_groups(
        bucket_pairs, batch_format="pyarrow")

    def dedupe(t: pa.Table) -> pa.Table:
        g = t.group_by(["id_a", "id_b"]).aggregate([("id_a", "count")])
        return g.select(["id_a", "id_b"])

    # a pair found in several bands collapses to one row (local combine →
    # one exact pass; pair cardinality is tiny after banding)
    pre = pairs.map_batches(dedupe, batch_format="pyarrow")
    from ray.data.aggregate import Count

    agg = pre.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="_n"))
    return agg.map_batches(lambda t: t.select(["id_a", "id_b"]),
                           batch_format="pyarrow")


# ------------------------------------------------- duplicate-cluster resolve


def union_roots(pairs, col_a: str, col_b: str) -> dict:
    """Union-find over a pandas pair frame → {node: min doc in component}
    for every node that appears in a pair."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs[col_a], pairs[col_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict = {}
    for n in set(pairs[col_a]) | set(pairs[col_b]):
        members.setdefault(find(n), []).append(n)
    root_min = {}
    for ms in members.values():
        m = min(ms)
        for n in ms:
            root_min[n] = m
    return root_min


def dedup_clusters(docs_ds, pairs_ds, id_col: str = "doc_id",
                   pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
                   max_driver_pairs: int = 2_000_000):
    """Connected components over a near-dup pair graph →
    (doc_id, cluster_id) for EVERY document; cluster_id = min doc in the
    component (docs in no pair are their own cluster).

    Scale shape: the pair graph is the OUTPUT of candidate filtering
    (Jaccard/MinHash/embedding), orders of magnitude smaller than the corpus
    by construction — so it is normally the broadcast small side:
    union-find runs once on the driver, the root map is ``ray.put`` once,
    and the full-corpus labeling stays a distributed ``map_batches``.
    When the pair graph exceeds ``max_driver_pairs`` (boilerplate-heavy
    corpora at 100 TB) the same contract is computed fully distributed by
    ``label_propagation_clusters`` — identical clusters, proven by pytest."""
    import ray

    # Materialize the (narrow) pair projection ONCE: the streaming executor
    # does not cache results across consumptions, so count() followed by
    # to_pandas() / label-propagation on the lazy dataset would re-execute
    # the expensive candidate-filtering shuffles from scratch.
    pairs_ds = pairs_ds.select_columns(list(pair_cols)).materialize()
    if pairs_ds.count() > max_driver_pairs:
        return label_propagation_clusters(docs_ds, pairs_ds, id_col,
                                          pair_cols)
    pairs = pairs_ds.to_pandas()
    root_min = union_roots(pairs, *pair_cols)
    ref = ray.put(root_min)

    def per_batch(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = t[id_col].to_pylist()
        return pa.table({
            "doc_id": t[id_col],
            "cluster_id": pa.array([m.get(d, d) for d in ids]),
        })

    return docs_ds.select_columns([id_col]).map_batches(
        per_batch, batch_format="pyarrow")


def label_propagation_clusters(docs_ds, pairs_ds, id_col: str = "doc_id",
                               pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
                               max_rounds: int = 64):
    """Distributed min-label propagation — the escalation path of
    ``dedup_clusters`` for pair graphs too large to gather to the driver.

    Each round: (1) co-locate edges with current labels on a hash range of
    the source node and emit ``(dst, label[src])`` messages; (2) co-locate
    messages with labels on the destination node and take the min label,
    counting changes.  Converges in ≤ graph-diameter rounds (≤ max_rounds
    cap); every exchange is a coarse hash-range shuffle resolved with one
    vectorized pandas pass (never per-node dispatch), and only the label
    table — O(nodes-in-pairs), not O(corpus) — is rewritten per round.
    Final labeling of the full corpus is one more range co-location (the
    label table never gathers to the driver)."""
    import pandas as pd

    from ..util import user_range_groupby

    a_col, b_col = pair_cols

    # No typed-null padding columns anywhere below: unioned sides always
    # carry real values in every column (flag columns route the semantics),
    # so the algorithm is dtype-exact for BOTH string and int64 doc ids —
    # hardcoded `dtype="string"` nulls used to crash the int64 path with
    # ArrowTypeError at the shuffle reduce, and NaN round-trips would
    # silently upcast int64 labels to float64.

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": pd.concat([df[a_col], df[b_col]], ignore_index=True),
            "dst": pd.concat([df[b_col], df[a_col]], ignore_index=True)})

    edges = pairs_ds.map_batches(sym, batch_format="pandas").materialize()
    if edges.count() == 0:  # no pairs: every doc is its own cluster
        def self_cluster(t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": t[id_col], "cluster_id": t[id_col]})

        return docs_ds.select_columns([id_col]).map_batches(
            self_cluster, batch_format="pyarrow")

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(df["node"])
        return pd.DataFrame({"node": nodes, "label": nodes})

    labels = edges.map_batches(init_labels, batch_format="pandas")

    # Round layout: (node, val, is_edge) — label rows carry val=label,
    # edge rows carry val=dst.
    def tag_label(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "val": df["label"],
                             "is_edge": np.zeros(len(df), dtype=np.int8)})

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "val": df["dst"],
                             "is_edge": np.ones(len(df), dtype=np.int8)})

    def emit_msgs(df: pd.DataFrame) -> pd.DataFrame:
        lmap = (df.loc[df["is_edge"] == 0, ["node", "val"]]
                .groupby("node", as_index=False)["val"].min())
        e = (df.loc[df["is_edge"] == 1, ["node", "val"]]
             .rename(columns={"val": "dst"}))
        # inner merge: misses dropped with dtypes preserved (no NaN upcast)
        m = e.merge(lmap, on="node", how="inner")
        return pd.DataFrame({"node": m["dst"].to_numpy(),
                             "label": m["val"].to_numpy()})

    def min_merge(df: pd.DataFrame) -> pd.DataFrame:
        # every message target is an edge endpoint and the label table
        # covers all endpoints, so new's node set == old's node set
        new = df.groupby("node", as_index=False)["label"].min()
        old = (df.loc[df["is_old"] == 1]
               .groupby("node", as_index=False)["label"].min()
               .rename(columns={"label": "old"}))
        m = new.merge(old, on="node", how="inner")
        return pd.DataFrame({
            "node": m["node"].to_numpy(), "label": m["label"].to_numpy(),
            "changed": (m["label"] != m["old"]).to_numpy().astype("int64")})

    for _ in range(max_rounds):
        both = (labels.map_batches(tag_label, batch_format="pandas")
                .union(edges.map_batches(tag_edge, batch_format="pandas")))
        msgs = user_range_groupby(both, emit_msgs, key="node")

        def tag_old(df: pd.DataFrame, old: int) -> pd.DataFrame:
            out = df[["node", "label"]].copy()
            out["is_old"] = np.full(len(df), old, dtype=np.int8)
            return out

        both2 = (labels.map_batches(lambda d: tag_old(d, 1),
                                    batch_format="pandas")
                 .union(msgs.map_batches(lambda d: tag_old(d, 0),
                                         batch_format="pandas")))
        merged = user_range_groupby(both2, min_merge,
                                    key="node").materialize()
        labels = merged.drop_columns(["changed"])
        if merged.sum("changed") == 0:
            break

    # Final corpus labeling: one more range co-location.  Doc rows carry a
    # SELF label (label = node); since every propagated label is the
    # component min (≤ node), min(self, propagated) per node is the
    # propagated label when one exists, else the node itself — nulls never
    # enter the exchange.
    def tag_doc(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[id_col], "label": df[id_col],
                             "is_doc": np.ones(len(df), dtype=np.int8)})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        new = df.groupby("node", as_index=False)["label"].min()
        doc_nodes = df.loc[df["is_doc"] == 1, ["node"]].drop_duplicates()
        m = doc_nodes.merge(new, on="node", how="inner")
        return pd.DataFrame({"doc_id": m["node"].to_numpy(),
                             "cluster_id": m["label"].to_numpy()})

    def with_flag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["node", "label"]].copy()
        out["is_doc"] = np.zeros(len(df), dtype=np.int8)
        return out

    final = (docs_ds.select_columns([id_col])
             .map_batches(tag_doc, batch_format="pandas")
             .union(labels.map_batches(with_flag, batch_format="pandas")))
    return user_range_groupby(final, resolve, key="node")


# ------------------------------------------------------------------ SimHash


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit SimHash over token hashes (Charikar 2002)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_table(ds, id_col: str = "doc_id", text_col: str = "text"):
    """id → simhash (as two int64 halves for SQL-friendly output).

    Batch-vectorized: every distinct token in the batch is blake2-hashed
    ONCE and expanded to a ±1 bit matrix; each document's signature is one
    row-gather + column sum over that matrix (the per-row ``simhash64``
    loop re-hashed every token occurrence — measured ~3x slower)."""

    def per_batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        toks_per_doc = [t.split() for t in texts]
        vocab: dict[str, int] = {}
        for toks in toks_per_doc:
            for tk in toks:
                if tk not in vocab:
                    vocab[tk] = len(vocab)
        if vocab:
            hs = np.array(
                [int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8).digest(),
                                "little") for u in vocab],
                dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int32)
            pm = bits * 2 - 1  # ±1 per bit, one row per distinct token
        his, los = [], []
        for toks in toks_per_doc:
            if not toks:
                his.append(0)
                los.append(0)
                continue
            rows = np.fromiter((vocab[tk] for tk in toks), dtype=np.int64,
                               count=len(toks))
            acc = pm[rows].sum(axis=0)
            h = int(np.packbits((acc > 0)[::-1]).view(">u8")[0])
            his.append(h >> 32)
            los.append(h & 0xFFFFFFFF)
        return pa.table(
            {
                "id": pa.array(ids),
                "simhash_hi": pa.array(his, pa.int64()),
                "simhash_lo": pa.array(los, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")
