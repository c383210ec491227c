"""Embedding-column operators over the ``embeddings`` table
(vec_id:int64, embedding:list<float>, label:int32) — similarity search and
embedding-cosine near-dup for training-data pipelines.

Broadcast pattern (ray_guide): the small side — the query matrix, or at
baseline scale the whole normalized corpus matrix — is ``ray.put`` ONCE and
every ``map_batches`` task reads it from the object store zero-copy; it is
never re-shipped per batch.  The scale path replaces the all-pairs matmul
with random-hyperplane LSH buckets (shuffle keyed on bucket) and verifies
candidates in-bucket only.

All floating-point comparisons against the DuckDB oracle are *membership*
(pair sets, ranks) — no float columns cross the compare boundary except where
gaps in the data (≥1e-6) dwarf ulp noise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

NEARDUP_TAU = 0.4
ANN_K = 5
ANN_NUM_QUERIES = 8
# multi-table hyperplane LSH: P(candidate) = 1-(1-(1-θ/π)^BITS)^TABLES;
# at cosine 0.4 (θ≈66°) this is ≈0.99 with 16 tables × 3 bits
LSH_BITS = 3
LSH_TABLES = 16
LSH_SEED = 1234


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → float64 (n, d) matrix, zero-copy-ish via the
    flattened values buffer (no per-row Python lists)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def load_corpus(ds) -> tuple[np.ndarray, np.ndarray]:
    """Materialize (ids, normalized matrix) — the broadcast small side.

    At 100 TB this is replaced by the LSH path below; for the exact baseline
    the corpus matrix is the documented 'small side held in the object
    store' (one ray.put, read by every task)."""
    ids_parts, mat_parts = [], []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        ids_parts.append(b["vec_id"].to_numpy(zero_copy_only=False))
        mat_parts.append(_to_matrix(b["embedding"]))
    ids = np.concatenate(ids_parts)
    mat = _normalize(np.concatenate(mat_parts))
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


# ------------------------------------------------------- exact near-dup


def embed_neardup(ds, tau: float = NEARDUP_TAU):
    """All pairs (a < b) with cosine ≥ tau — exact baseline.

    Corpus matrix broadcast once via ray.put; each batch does one float64
    matmul against it (vectorized, no per-row loop)."""
    ids, mat = load_corpus(ds)
    ref = ray.put((ids, mat))

    def per_batch(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        q_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        q = _normalize(_to_matrix(batch["embedding"]))
        sims = q @ all_mat.T  # (batch, corpus)
        rows, cols = np.nonzero(sims >= tau)
        a = q_ids[rows]
        b = all_ids[cols]
        keep = a < b  # each unordered pair emitted exactly once
        return pa.table({
            "vec_id_a": pa.array(a[keep], pa.int64()),
            "vec_id_b": pa.array(b[keep], pa.int64()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow", batch_size=1024)


def embed_neardup_sql(rel: str = "embeddings", tau: float = NEARDUP_TAU) -> str:
    return f"""
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM {rel} a JOIN {rel} b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {tau}
"""


# ---------------------------------------------------------- ANN top-k


def query_rows(ds, n: int) -> tuple[np.ndarray, np.ndarray]:
    """The ``n`` smallest vec_ids + their normalized vectors WITHOUT
    materializing the corpus: each batch keeps its local n smallest rows
    (tiny partials), the driver merges num_blocks × n rows."""

    def local_min(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        if len(vid) > n:
            idx = np.argpartition(vid, n - 1)[:n]
            t = t.take(pa.array(np.sort(idx)))
        return t.select(["vec_id", "embedding"])

    part = ds.map_batches(local_min, batch_format="pyarrow").to_pandas()
    part = part.sort_values("vec_id", kind="mergesort").head(n)
    ids = part["vec_id"].to_numpy()
    mat = _normalize(np.array(part["embedding"].tolist(), dtype=np.float64))
    return ids, mat


def ann_topk(ds, k: int = ANN_K, num_queries: int = ANN_NUM_QUERIES):
    """Brute-force cosine top-k for the first ``num_queries`` vec_ids.

    Query matrix (tiny, picked by a streaming partial-min — the corpus is
    never materialized) broadcast via ray.put; each batch emits its local
    top-k candidates per query (small partials), the final merge is a
    groupby(query_id) over ≤ num_blocks × k rows — no global sort."""
    q_ids, q_mat = query_rows(ds, num_queries)
    ref = ray.put((q_ids, q_mat))

    def per_batch(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        c_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        c = _normalize(_to_matrix(batch["embedding"]))
        sims = qm @ c.T  # (queries, batch)
        out_q, out_v, out_s = [], [], []
        for row in range(len(qi)):
            s = sims[row].copy()
            s[c_ids == qi[row]] = -np.inf  # exclude self
            top = min(k, len(s))
            idx = np.argpartition(-s, top - 1)[:top]
            out_q.extend([qi[row]] * top)
            out_v.extend(c_ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = ds.map_batches(per_batch, batch_format="pyarrow", batch_size=2048)

    def merge(t: pa.Table) -> pa.Table:
        sims = t["sim"].to_numpy(zero_copy_only=False)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vids, -sims))[:k]  # sim desc, vec_id asc
        return pa.table({
            "query_id": pa.array([t["query_id"][0].as_py()] * len(order), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "vec_id": pa.array(vids[order], pa.int64()),
        })

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def ann_topk_sql(rel: str = "embeddings", k: int = ANN_K,
                 num_queries: int = ANN_NUM_QUERIES) -> str:
    return f"""
WITH q AS (
    SELECT vec_id, embedding FROM {rel} ORDER BY vec_id LIMIT {num_queries}
), ranked AS (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
    FROM q JOIN {rel} c ON c.vec_id <> q.vec_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------------------- kNN graph


KNN_GRAPH_K = 3

# IVF coarse-quantizer knobs (shared by ann_topk_ivf / knn_graph_ivf):
# nlist scales with the corpus so inverted lists stay bounded.
IVF_NLIST = 16
IVF_NPROBE = 4
IVF_SAMPLE = 1024
IVF_ITERS = 10


def knn_graph(ds, k: int = KNN_GRAPH_K):
    """Exact k-NN graph: the top-k cosine neighbors of EVERY vector — the
    SemDeDup-style primitive (cluster the graph, keep one doc per clique).

    Broadcast-corpus baseline: the normalized corpus matrix is ``ray.put``
    once; each batch's rows are COMPLETE queries, so one matmul per batch
    yields exact per-row top-k directly — no partials, no merge stage.  At
    100 TB swap the broadcast corpus for the IVF-bucketed probe
    (``ann_topk_ivf``) exactly as documented there.  Rows-only vs SQL: with
    every vector as a query, near-tie ranks would hinge on float op order
    between numpy and DuckDB; parity is a bit-exact numpy ground-truth
    pytest instead."""
    ids, mat = load_corpus(ds)
    ref = ray.put((ids, mat))

    def per_batch(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        q_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        q = _normalize(_to_matrix(batch["embedding"]))
        sims = q @ all_mat.T
        sims[all_ids[None, :] == q_ids[:, None]] = -np.inf  # exclude self
        top = min(k, sims.shape[1] - 1)
        part = np.argpartition(-sims, top - 1, axis=1)[:, :top]
        out_q, out_r, out_v = [], [], []
        for row in range(len(q_ids)):
            cand = part[row]
            order = np.lexsort((all_ids[cand], -sims[row, cand]))
            for r, j in enumerate(cand[order], start=1):
                out_q.append(int(q_ids[row]))
                out_r.append(r)
                out_v.append(int(all_ids[j]))
        return pa.table({
            "vec_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "nbr_id": pa.array(out_v, pa.int64()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow", batch_size=1024)


def knn_graph_ivf(ds, k: int = KNN_GRAPH_K, nlist: int = IVF_NLIST,
                  nprobe: int = IVF_NPROBE, n_parts: int | None = None):
    """IVF-bucketed approximate k-NN graph — the 100 TB path for
    ``knn_graph``: the corpus is NEVER broadcast or materialized.

    Plan (mirrors ``ann_topk_ivf``'s quantizer, but with every vector as a
    query, so the probe is a SHUFFLE instead of a broadcast query set):

    1. a small sample trains the coarse quantizer (broadcast, tiny);
    2. each vector emits ``nprobe`` rows keyed by probed bucket —
       ``is_member`` marks the one bucket it is inverted-listed in (its
       argmax centroid, always the first probe);
    3. ``groupby(bucket)`` scores queries × members per bucket (one
       matmul, group size ≈ corpus/nlist × nprobe — bounded by the nlist
       knob, which scales with the corpus);
    4. per-(query,bucket) partial top-k merge on a hash range of vec_id
       (vectorized pandas — no per-key dispatch).

    Recall < 1 by construction; verified ≥ threshold against the exact
    broadcast baseline in tests."""
    import pandas as pd

    from ..util import pre_shuffle_coalesce

    if n_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_parts = max(8, cpus)
    sample_rows = ds.limit(IVF_SAMPLE).to_pandas()
    sample = _normalize(np.array(sample_rows["embedding"].tolist(),
                                 dtype=np.float64))
    cent = _train_centroids(sample, nlist)
    ref = ray.put(cent)

    def fanout(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(batch["embedding"]))
        probes = np.argsort(-(m @ c.T), axis=1)[:, :nprobe]  # col 0 = argmax
        n, p = len(vids), probes.shape[1]
        emb = batch["embedding"]
        rep = np.repeat(np.arange(n), p)
        return pa.table({
            "bucket": pa.array(probes.reshape(-1).astype(np.int32)),
            "vec_id": pa.array(vids[rep], pa.int64()),
            "is_member": pa.array(np.tile(
                np.arange(p) == 0, n)),  # member of argmax bucket only
            "embedding": emb.take(pa.array(rep)),
        })

    fanned = pre_shuffle_coalesce(
        ds.map_batches(fanout, batch_format="pyarrow", batch_size=2048))

    def bucket_topk(t: pa.Table) -> pa.Table:
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        member = t["is_member"].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(t["embedding"]))
        mem_ids, mem_m = vids[member], m[member]
        if len(mem_ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "nbr_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sims = m @ mem_m.T
        sims[vids[:, None] == mem_ids[None, :]] = -np.inf  # exclude self
        top = min(k, sims.shape[1])
        part = np.argpartition(-sims, top - 1, axis=1)[:, :top]
        rows = np.repeat(np.arange(len(vids)), top)
        cols = part.reshape(-1)
        s = sims[rows, cols]
        keep = s > -np.inf
        return pa.table({
            "vec_id": pa.array(vids[rows][keep], pa.int64()),
            "nbr_id": pa.array(mem_ids[cols][keep], pa.int64()),
            "sim": pa.array(s[keep], pa.float64()),
        })

    partials = fanned.groupby("bucket").map_groups(
        bucket_topk, batch_format="pyarrow")

    def add_part(t: pa.Table) -> pa.Table:
        from ..util import key_partition_ids
        return t.append_column(
            "_part", pa.array(key_partition_ids(t["vec_id"], n_parts)))

    def merge_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["vec_id", "sim", "nbr_id"],
                            ascending=[True, False, True])
        df["rank"] = df.groupby("vec_id").cumcount() + 1
        out = df[df["rank"] <= k][["vec_id", "rank", "nbr_id"]]
        return out.astype({"vec_id": "int64", "rank": "int64",
                           "nbr_id": "int64"})

    ranged = pre_shuffle_coalesce(
        partials.map_batches(add_part, batch_format="pyarrow"))
    return ranged.groupby("_part").map_groups(
        lambda df: merge_range(df.drop(columns=["_part"])),
        batch_format="pandas")


# ------------------------------------------------- LSH near-dup (scale path)


class HyperplaneHasher:
    """Actor-pool stage: embedding → multi-table random-hyperplane LSH keys.

    All TABLES×BITS hyperplanes drawn once per actor in ``__init__`` from a
    fixed seed (every actor agrees); ``__call__`` is one matmul + sign-pack
    per batch, emitting one row per (vector, table)."""

    def __init__(self, bits: int = LSH_BITS, tables: int = LSH_TABLES,
                 dim: int = 64, seed: int = LSH_SEED):
        self.bits, self.tables, self.seed = bits, tables, seed
        # planes memoized PER DIM: a worker-cached instance is shared by
        # every dataset with the same (bits, tables), and mutating a single
        # planes matrix would regenerate it on every batch when datasets of
        # different dims interleave on one worker
        self._planes: dict[int, np.ndarray] = {}
        self._planes[dim] = np.random.RandomState(seed).standard_normal(
            (dim, tables * bits))

    def _planes_for(self, dim: int) -> np.ndarray:
        p = self._planes.get(dim)
        if p is None:
            p = self._planes[dim] = np.random.RandomState(
                self.seed).standard_normal((dim, self.tables * self.bits))
        return p

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        signs = (m @ self._planes_for(m.shape[1])) > 0  # (n, tables*bits)
        n = signs.shape[0]
        signs = signs.reshape(n, self.tables, self.bits)
        weights = 1 << np.arange(self.bits, dtype=np.int64)
        buckets = signs @ weights  # (n, tables)
        table_ids = np.broadcast_to(np.arange(self.tables, dtype=np.int64), (n, self.tables))
        idx = np.repeat(np.arange(n), self.tables)
        return pa.table({
            "vec_id": batch["vec_id"].take(pa.array(idx)),
            "table_id": pa.array(table_ids.ravel(), pa.int64()),
            "bucket": pa.array(buckets.ravel(), pa.int64()),
            "embedding": batch["embedding"].take(pa.array(idx)),
        })


def embed_neardup_lsh(ds, tau: float = NEARDUP_TAU, bits: int = LSH_BITS,
                      tables: int = LSH_TABLES):
    """Approximate near-dup: candidates share any of TABLES LSH buckets,
    verified with exact cosine in-bucket, deduped across tables.  Shuffles
    are keyed on (table_id, bucket) then (pair); groups stay bounded — this
    is the 100 TB path, recall-benchmarked against the exact baseline."""
    from ..util import worker_cached_stage

    # plain tasks + per-worker memo (setup = one randn matrix); the fixed
    # seed keeps every worker's planes identical, so instances are
    # interchangeable — see util.worker_cached_stage
    hashed = ds.map_batches(
        worker_cached_stage(HyperplaneHasher, bits=bits, tables=tables),
        batch_format="pyarrow")

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return pa.table({"vec_id_a": pa.array([], pa.int64()),
                             "vec_id_b": pa.array([], pa.int64())})
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(t["embedding"]))
        sims = m @ m.T
        rows, cols = np.nonzero(sims >= tau)
        keep = ids[rows] < ids[cols]
        return pa.table({
            "vec_id_a": pa.array(ids[rows][keep], pa.int64()),
            "vec_id_b": pa.array(ids[cols][keep], pa.int64()),
        })

    pairs = hashed.groupby(["table_id", "bucket"]).map_groups(
        verify, batch_format="pyarrow")

    # the same pair verified in several tables collapses to one row:
    # batch-local exact dedup → native Count shuffle (a map_groups here
    # would dispatch one Ray group PER PAIR — per-group Python overhead
    # scaling with the candidate count)
    def local_dedupe(t: pa.Table) -> pa.Table:
        g = t.group_by(["vec_id_a", "vec_id_b"]).aggregate([("vec_id_a", "count")])
        return g.select(["vec_id_a", "vec_id_b"])

    from ray.data.aggregate import Count

    pre = pairs.map_batches(local_dedupe, batch_format="pyarrow")
    agg = pre.groupby(["vec_id_a", "vec_id_b"]).aggregate(Count(alias_name="_n"))
    return agg.map_batches(lambda t: t.select(["vec_id_a", "vec_id_b"]),
                           batch_format="pyarrow")


# ----------------------------------------------------- IVF ANN (scale path)


def _train_centroids(sample: np.ndarray, nlist: int = IVF_NLIST,
                     iters: int = IVF_ITERS, seed: int = 99) -> np.ndarray:
    """Deterministic Lloyd k-means on a normalized sample (driver-side —
    the IVF coarse quantizer is tiny and trained once)."""
    rs = np.random.RandomState(seed)
    cent = sample[rs.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ann_topk_ivf(ds, k: int = ANN_K, num_queries: int = ANN_NUM_QUERIES,
                 nlist: int = IVF_NLIST, nprobe: int = IVF_NPROBE):
    """IVF-style approximate top-k — the 100 TB path: the corpus is NEVER
    materialized; a small sample trains the coarse quantizer, (centroids +
    queries) broadcast once, and each batch scores only vectors whose
    inverted list is probed by some query.  Recall < 1 by construction;
    benchmarked against the exact baseline in tests."""
    sample_rows = ds.limit(IVF_SAMPLE).to_pandas()
    sample_ids = sample_rows["vec_id"].to_numpy()
    sample = _normalize(np.array(sample_rows["embedding"].tolist(), dtype=np.float64))
    order = np.argsort(sample_ids, kind="stable")
    sample_ids, sample = sample_ids[order], sample[order]
    cent = _train_centroids(sample, nlist)
    q_ids = sample_ids[:num_queries]
    q_mat = sample[:num_queries]
    # probed lists per query: nprobe nearest centroids
    q_cent = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((q_ids, q_mat, cent, q_cent))

    def per_batch(batch: pa.Table) -> pa.Table:
        qi, qm, c, qc = ray.get(ref)
        c_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(batch["embedding"]))
        assign = np.argmax(m @ c.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for row in range(len(qi)):
            probe = np.isin(assign, qc[row])
            probe &= c_ids != qi[row]
            if not probe.any():
                continue
            sims = qm[row] @ m[probe].T
            cand_ids = c_ids[probe]
            top = min(k, len(sims))
            idx = np.argpartition(-sims, top - 1)[:top]
            out_q.extend([qi[row]] * top)
            out_v.extend(cand_ids[idx].tolist())
            out_s.extend(sims[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = ds.map_batches(per_batch, batch_format="pyarrow", batch_size=2048)

    def merge(t: pa.Table) -> pa.Table:
        sims = t["sim"].to_numpy(zero_copy_only=False)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vids, -sims))[:k]
        return pa.table({
            "query_id": pa.array([t["query_id"][0].as_py()] * len(order), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "vec_id": pa.array(vids[order], pa.int64()),
        })

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------------- SemDeDup


SEMDEDUP_K = 16
SEMDEDUP_TAU = NEARDUP_TAU
SEMDEDUP_SAMPLE = 1024
# Hard per-group row budget for the within-cluster prune: a cluster whose
# row count exceeds this is hash-split into ceil(size/(budget/2)) sub-buckets
# (expected sub-group = budget/2, so the budget holds with huge margin), and
# k itself scales as corpus/CLUSTER_TARGET — no O((N/k)^2) group ever forms.
SEMDEDUP_GROUP_BUDGET = 4096
SEMDEDUP_CLUSTER_TARGET = 2048


def semdedup_k(n_rows: int, base: int = SEMDEDUP_K,
               target: int = SEMDEDUP_CLUSTER_TARGET) -> int:
    """Derive the cluster count from the corpus size so the EXPECTED
    cluster is ``target`` rows (the docstring promise 'scale k with the
    corpus', now enforced in code; shared by engine and oracle builder)."""
    return max(base, -(-n_rows // target))


def _semdedup_nsub(size: int, budget: int = SEMDEDUP_GROUP_BUDGET) -> int:
    """Sub-buckets for one cluster: 1 (no split — exact semantics) while the
    cluster fits the budget, else ceil(size / (budget/2))."""
    return 1 if size <= budget else -(-size // (budget // 2))


def _semdedup_sub(vec_ids: np.ndarray, nsub: np.ndarray) -> np.ndarray:
    """Deterministic sub-bucket of each vec_id: multiplicative hash mod the
    cluster's nsub — exactly ``((vec_id * 2654435761) % 2^32) % nsub``,
    reproduced verbatim in the oracle SQL via HUGEINT arithmetic."""
    h = (vec_ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    return (h % nsub.astype(np.uint64)).astype(np.int32)


def semdedup_sample_matrix(ids: np.ndarray, mat: np.ndarray,
                           n: int = SEMDEDUP_SAMPLE) -> np.ndarray:
    """The deterministic trainer sample: the ``n`` smallest vec_ids'
    normalized vectors in id order.  Shared verbatim by the engine
    (via ``query_rows``' streaming partial-min) and the oracle-SQL builder
    (via a direct parquet read) so both sides train BIT-IDENTICAL centroids
    with ``_train_centroids``."""
    order = np.argsort(ids, kind="stable")[:n]
    return mat[order]


def semdedup_keep(ds, k: int | None = None, tau: float = SEMDEDUP_TAU,
                  budget: int = SEMDEDUP_GROUP_BUDGET):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) over the embedding
    column: cluster with a sample-trained spherical k-means, then within
    each cluster drop every vector that has a LOWER-id cluster-mate with
    cosine ≥ tau.  Output: (vec_id, cluster, keep).

    Scale shape: the corpus streams through centroid assignment
    (broadcast centroids, one matmul per batch — never materialized).
    Group size is BOUNDED two ways: ``k`` scales with the corpus
    (``semdedup_k``), and any cluster still exceeding ``budget`` rows
    (skew) is hash-split into sub-buckets sized ``budget/2`` in
    expectation — the prune then runs within (cluster, sub), trading a
    sliver of recall on split clusters for a hard memory bound.  Cluster
    sizes come from one cheap pre-pass (a projected int32 groupby-count —
    the embeddings never enter that shuffle).  The greedy lower-id rule
    is order-free, so the sub-partition composes; the oracle expresses
    the identical split with window COUNT + HUGEINT hash."""
    n_rows = ds.count()
    if k is None:
        k = semdedup_k(n_rows)
    samp_ids, samp_mat = query_rows(ds, SEMDEDUP_SAMPLE)
    cent = _train_centroids(semdedup_sample_matrix(samp_ids, samp_mat), k)
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_to_matrix(batch["embedding"]))
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(np.argmax(m @ c.T, axis=1).astype(np.int32)),
            "embedding": batch["embedding"],
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow", batch_size=2048)

    # pre-pass: per-cluster row counts (≤ k rows; int32-only shuffle)
    counts = (assigned.select_columns(["cluster"])
              .groupby("cluster").count().take_all())
    nsub_map = np.ones(k, dtype=np.int64)
    for r in counts:
        nsub_map[int(r["cluster"])] = _semdedup_nsub(int(r["count()"]), budget)
    nsub_ref = ray.put(nsub_map)

    def add_sub(t: pa.Table) -> pa.Table:
        nm = ray.get(nsub_ref)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        sub = _semdedup_sub(vids, nm[cl])
        # single int64 group key so the shuffle stays one-column; 32-bit
        # shift so a degenerate cluster with nsub > 2^20 sub-splits can
        # never alias into the next cluster's key space (cluster is int32
        # < 2^31, nsub = ceil(size/budget) < 2^32 at any realistic scale)
        return t.append_column(
            "gkey", pa.array(cl.astype(np.int64) * (1 << 32) + sub))

    keyed = assigned.map_batches(add_sub, batch_format="pyarrow")

    def prune(t: pa.Table) -> pa.Table:
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(vids, kind="stable")
        vids = vids[order]
        m = _normalize(_to_matrix(t["embedding"]))[order]
        sims = m @ m.T
        dup = (np.tril(sims >= tau, k=-1)).any(axis=1)
        return pa.table({
            "vec_id": pa.array(vids, pa.int64()),
            "cluster": pa.array([t["cluster"][0].as_py()] * len(vids), pa.int32()),
            "keep": pa.array(~dup, pa.bool_()),
        })

    return keyed.groupby("gkey").map_groups(prune, batch_format="pyarrow")


_ORACLE_CENTROID_MEMO: dict = {}


def _semdedup_oracle_centroids(parquet_path: str, k: int) -> "np.ndarray":
    """Centroids for the SQL oracle, memoized per (path, k): reads only the
    vec_id column to pick the sample, then only the sample's embedding rows
    get normalized — the driver never pays an O(N·d) normalize (or a full
    re-train) for every unrelated oracle_sql() call."""
    key = (parquet_path, k)
    if key in _ORACLE_CENTROID_MEMO:
        return _ORACLE_CENTROID_MEMO[key]
    import pyarrow.parquet as pq

    ids = pq.read_table(parquet_path, columns=["vec_id"])["vec_id"] \
        .to_numpy(zero_copy_only=False)
    pos = np.sort(np.argsort(ids, kind="stable")[:SEMDEDUP_SAMPLE])
    emb = pq.read_table(parquet_path, columns=["embedding"])["embedding"]
    sub = _normalize(_to_matrix(emb.take(pa.array(pos))))
    # engine sample order is ascending vec_id — reorder the position-ordered
    # rows to match regardless of the table's physical order
    cent = _train_centroids(sub[np.argsort(ids[pos], kind="stable")], k)
    _ORACLE_CENTROID_MEMO[key] = cent
    return cent


def semdedup_keep_sql(parquet_path: str, k: int | None = None,
                      tau: float = SEMDEDUP_TAU,
                      budget: int = SEMDEDUP_GROUP_BUDGET) -> str:
    """Exact oracle: trains the SAME centroids (same sample, same numpy
    code, same corpus-derived k) and inlines them as DOUBLE[] literals;
    assignment is arg-max cosine (ties broken by lowest cluster id,
    matching np.argmax); the prune rule is the NOT EXISTS form of the
    lower-id greedy rule scoped to the SAME (cluster, sub) hash split the
    engine uses (window COUNT → nsub → HUGEINT multiplicative hash).
    Float contract as for embed_neardup: only memberships cross the
    compare boundary, and the synth similarity gaps dwarf the engine-vs-
    DuckDB op-order noise."""
    import pyarrow.parquet as pq

    if k is None:
        k = semdedup_k(pq.ParquetFile(parquet_path).metadata.num_rows)
    cent = _semdedup_oracle_centroids(parquet_path, k)
    rows = ",\n        ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(cent))
    half = budget // 2
    return f"""
WITH cent(cid, v) AS (
    VALUES {rows}
), a0 AS (
    SELECT e.vec_id, e.embedding,
           (SELECT cid FROM cent
            ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], cent.v) DESC,
                     cid ASC
            LIMIT 1) AS cluster
    FROM embeddings e
), a1 AS (
    SELECT *, COUNT(*) OVER (PARTITION BY cluster) AS csize FROM a0
), a AS (
    SELECT vec_id, embedding, cluster,
           CASE WHEN csize <= {budget} THEN 0
                ELSE ((CAST(vec_id AS HUGEINT) * 2654435761) % 4294967296)
                     % CAST(ceil(csize / {half}.0) AS BIGINT)
           END AS sub
    FROM a1
)
SELECT a.vec_id, CAST(a.cluster AS INTEGER) AS cluster,
       NOT EXISTS (
           SELECT 1 FROM a o
           WHERE o.cluster = a.cluster AND o.sub = a.sub
             AND o.vec_id < a.vec_id
             AND list_cosine_similarity(o.embedding::DOUBLE[],
                                        a.embedding::DOUBLE[]) >= {tau}
       ) AS keep
FROM a
"""
