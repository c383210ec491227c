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
from .stages import dedup, embed, media, text
from .stages.normalize import explode_spans, flat_spans
from .stages.parser import parse_spans
from .pipelines import (cookies, corpus, events, graft, hosttree, relational,
                        render, spatial, stats, tiling, tree, webmeta)
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
         "status", "lat", "lng", "text_len", "body_hash", "duration_ms",
         "empty_response"]
    )


def q_doc_stats(sf_dir: str):
    return stats.doc_stats(read_interleaved(sf_dir))


def q_doc_durations(sf_dir: str):
    return stats.doc_durations(read_interleaved(sf_dir))


def q_kind_rollup(sf_dir: str):
    return stats.kind_rollup(read_interleaved(sf_dir))


def q_span_dedup(sf_dir: str):
    return dedup.span_hash_groups(explode_spans(
        read_interleaved(sf_dir), ["body_hash", "doc_id", "media_ref"]))


def q_tile_assign(sf_dir: str):
    return tiling.tile_assign(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "offset", "lat", "lng"]), RES)


def q_tile_rollup(sf_dir: str):
    return tiling.tile_rollup(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "hostname", "lat", "lng"]), RES)


def q_tile_host_kmv(sf_dir: str):
    return tiling.tile_host_kmv(explode_spans(
        read_interleaved(sf_dir), ["hostname", "lat", "lng"]), RES)


def q_tile_host_hll(sf_dir: str):
    """HLL register sketch per tile (hex-base rho, register-wise MAX merge)
    — the fixed-size mergeable companion to tile_host_kmv."""
    return tiling.tile_host_hll(explode_spans(
        read_interleaved(sf_dir), ["hostname", "lat", "lng"]), RES)


def q_tile_vectorize(sf_dir: str):
    return tiling.tile_vectorize(explode_spans(
        read_interleaved(sf_dir), ["lat", "lng"]), RES)


def q_tile_pyramid(sf_dir: str):
    return tiling.tile_pyramid(explode_spans(
        read_interleaved(sf_dir), ["lat", "lng"]), RES)


def q_tile_neighbor_density(sf_dir: str):
    return tiling.tile_neighbor_density(explode_spans(
        read_interleaved(sf_dir), ["lat", "lng"]), RES)


def q_tile_compact(sf_dir: str):
    """Minimal mixed-resolution covering of the occupied res-RES cells
    (H3 ``compact`` / S2 covering normalization)."""
    return tiling.tile_compact(explode_spans(
        read_interleaved(sf_dir), ["lat", "lng"]), RES)


def q_tile_outline(sf_dir: str):
    """Raster→vector boundary edge set of the covered region (marching-
    squares / polygonize primitive)."""
    return tiling.tile_outline(explode_spans(
        read_interleaved(sf_dir), ["lat", "lng"]), RES)


def q_tile_zorder(sf_dir: str):
    """Morton locality key per span — the co-location partitioning key."""
    return tiling.tile_zorder(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "offset", "lat", "lng"]), RES)


def q_tile_polygonize(sf_dir: str):
    """Boundary edges chained into closed vector rings (rows-only: ring
    chaining is not SQL-expressible; invariants pytest-checked — edge
    partition, closure, |Σ signed areas| == covered-cell count)."""
    return tiling.tile_polygonize(explode_spans(
        read_interleaved(sf_dir), ["lat", "lng"]), RES)


def _parsed(sf_dir: str):
    return parse_spans(flat_spans(read_interleaved(sf_dir)))


def _parsed_light(sf_dir: str):
    from .stages.parser import parse_redirects

    return parse_redirects(flat_spans(read_interleaved(sf_dir)))


def q_redirect_chain(sf_dir: str):
    # zero-shuffle interleaved walk (the flat groupby path survives in
    # graft.redirect_chain for flat inputs; parity-tested in test_tree.py)
    return graft.redirect_chain_interleaved(read_interleaved(sf_dir))


def q_landing(sf_dir: str):
    return graft.landing_interleaved(read_interleaved(sf_dir))


def q_landing_validated(sf_dir: str):
    return graft.landing_validated(read_interleaved(
        sf_dir, columns=["doc_id", "spans", "last_redirect"]))


def q_host_rollup(sf_dir: str):
    return hosttree.host_rollup_interleaved(read_interleaved(sf_dir))


def q_cookie_events(sf_dir: str):
    return cookies.cookie_events(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "offset", "text", "hostname"]))


def q_cookie_asof(sf_dir: str):
    return cookies.cookie_asof_interleaved(read_interleaved(sf_dir))


def q_knn_referrer(sf_dir: str):
    return spatial.knn_referrer_interleaved(read_interleaved(sf_dir))


def q_pip_media_in_host(sf_dir: str):
    return spatial.pip_media_in_host(explode_spans(
        read_interleaved(sf_dir),
        ["doc_id", "offset", "kind", "hostname", "lat", "lng"]))


def q_host_triangles(sf_dir: str):
    """Per-host triangle counts over the undirected host referral graph —
    degree-ordered wedge generation (out-degree O(√m)), pair-key closure
    co-partition."""
    return webmeta.host_triangles(explode_spans(
        read_interleaved(sf_dir), ["text", "hostname"]))


def q_host_reciprocity(sf_dir: str):
    """Per-host reciprocity over the directed referral graph: distinct
    out-degree + reciprocated out-edges (canonical pair-key co-partition,
    exact integers)."""
    return webmeta.host_reciprocity(explode_spans(
        read_interleaved(sf_dir), ["text", "hostname"]))


def q_host_kcore(sf_dir: str):
    """Core decomposition (k-core peel) of the undirected host referral
    graph (rows-only: iterative peeling has no SQL form)."""
    return webmeta.host_kcore(explode_spans(
        read_interleaved(sf_dir), ["text", "hostname"]))


def q_host_bridges(sf_dir: str):
    """Bridge (cut) edges of the undirected host referral graph
    (rows-only: Tarjan low-link has no SQL form)."""
    return webmeta.host_bridges(explode_spans(
        read_interleaved(sf_dir), ["text", "hostname"]))


def q_host_clustering(sf_dir: str):
    """Local clustering coefficient per host in exact integers
    (deg, n_wedges, n_triangles) — reuses the triangle plan's bounded
    degree small side."""
    return webmeta.host_clustering(explode_spans(
        read_interleaved(sf_dir), ["text", "hostname"]))


def q_tile_zonal_stats(sf_dir: str):
    """Zonal statistics: per host zone (rasterized boundary box), covered /
    occupied cell counts, spans in zone, hottest-cell count.  Broadcast
    boxes + one host-range shuffle of (host, cell) partials."""
    return tiling.tile_zonal_stats(explode_spans(
        read_interleaved(sf_dir), ["kind", "hostname", "lat", "lng"]), RES)


def q_doc_chunk(sf_dir: str):
    """Sliding-window chunking (64-token windows, stride 48) — map-only
    row expansion, the RAG/context-window prep step."""
    return text.doc_chunk(_docs(sf_dir))


def q_pip_media_outside_host(sf_dir: str):
    """Spatial anti-join: media spans contained in NO host boundary box
    (the complement of pip_media_in_host; same broadcast covering index)."""
    return spatial.pip_media_outside_host(explode_spans(
        read_interleaved(sf_dir),
        ["doc_id", "offset", "kind", "hostname", "lat", "lng"]))


def q_doc_trajectory(sf_dir: str):
    """Per-document cell trajectory: offset-ordered spans encoded to grid
    cells, consecutive same-cell runs collapsed, wrapped-Chebyshev step
    distances.  Map-only over doc-grouped interleaved rows."""
    return tiling.doc_trajectory(read_interleaved(sf_dir))


def q_tile_morans(sf_dir: str):
    """Global spatial-autocorrelation (Moran's I) components in exact
    integers over the occupied-cell raster (scatter + co-partition)."""
    return tiling.tile_morans(explode_spans(
        read_interleaved(sf_dir), ["lat", "lng"]), RES)


def q_doc_term_cooccur(sf_dir: str):
    """Fixed-vocabulary term co-occurrence matrix with PMI components in
    exact integers (constant-size partials, zero shuffles)."""
    return text.doc_term_cooccur(_docs(sf_dir))


def q_event_session_histogram(sf_dir: str):
    """Session-length distribution: sessionize composed with a bounded
    histogram reduce."""
    return events.session_histogram(
        _events(sf_dir, ["user_id", "ts", "event_id", "value"]))


def q_event_rfm(sf_dir: str):
    """Per-user recency/frequency/monetary profile (exact cents; one
    user-range shuffle of mergeable partials)."""
    return events.rfm(_events(sf_dir, ["user_id", "ts", "value"]))


def q_host_assortativity(sf_dir: str):
    """Degree-assortativity moments of the undirected host graph in exact
    integers (broadcast degree table + 1-row batch partials)."""
    return webmeta.host_assortativity(explode_spans(
        read_interleaved(sf_dir), ["text", "hostname"]))


def q_tile_hhi(sf_dir: str):
    """Per-tile host concentration (HHI components in exact integers:
    n_total, n_hosts, sum of squared per-host counts)."""
    return tiling.tile_hhi(explode_spans(
        read_interleaved(sf_dir), ["hostname", "lat", "lng"]), RES)


def q_event_topk_users(sf_dir: str):
    """Top-5 users by total spend per event type (exact cents; user-range
    combiner + bounded finalist merge)."""
    return events.topk_users(
        _events(sf_dir, ["event_type", "user_id", "value"]))


def q_trajectory_od(sf_dir: str):
    """Origin→destination flow matrix: one trip per document from its
    first span's cell to its last span's cell (map-only extraction + one
    int-keyed range shuffle)."""
    return tiling.trajectory_od(read_interleaved(sf_dir))


def q_host_topk_urls(sf_dir: str):
    """Distributed top-k per group: the 3 most-referenced URLs of every
    hostname (one host-range shuffle, partial-count combiner)."""
    return stats.host_topk_urls(read_interleaved(sf_dir))


def q_inverted_index(sf_dir: str):
    """Token → (exact df, truncated posting list) retrieval-index build
    over the documents table (one token-range shuffle, capped combiner)."""
    return text.inverted_index(_docs(sf_dir))


def q_host_boxes(sf_dir: str):
    """The ST5 boundary small side itself: per-hostname ε-expanded bbox of
    document spans (the broadcast input of pip_media_in_host)."""
    return spatial.host_boxes(explode_spans(
        read_interleaved(sf_dir), ["kind", "hostname", "lat", "lng"]))


def q_tile_topk_hosts(sf_dir: str):
    """Top-3 hostnames per grid cell (rank by span count, hostname ties
    ascending) — distributed top-k-per-tile via a cell-range shuffle."""
    return tiling.tile_topk_hosts(explode_spans(
        read_interleaved(sf_dir), ["hostname", "lat", "lng"]), RES)


def q_host_octagon(sf_dir: str):
    """Per-host bounding OCTAGON (8-DOP): axis + diagonal extremes of the
    host's document spans — the finer hull approximation between the bbox
    and a convex hull; same partial-min/max + one bounded-key groupby shape
    as host_boxes."""
    return spatial.host_octagon(explode_spans(
        read_interleaved(sf_dir), ["kind", "hostname", "lat", "lng"]))


def q_nn_media_host(sf_dir: str):
    """Spatial nearest-neighbor join: for every media span, the closest
    host boundary box (squared point-to-box distance, hostname tie-break).
    Broadcast boxes small side; map-only media stream."""
    return spatial.nn_media_host(explode_spans(
        read_interleaved(sf_dir),
        ["doc_id", "offset", "kind", "hostname", "lat", "lng"]))


def q_boundary_overlap(sf_dir: str):
    """Distributed box-overlap self-join: host boundary pairs that strictly
    intersect, with exact intersection/box areas — one cell-key shuffle,
    report-once anchor-corner dedup (no broadcast, no second shuffle)."""
    return spatial.boundary_overlap(explode_spans(
        read_interleaved(sf_dir), ["kind", "hostname", "lat", "lng"]))


def q_grid_dbscan(sf_dir: str):
    """Density-based spatial clustering on the tile grid: core cells
    (>= minpts spans) merged by 8-connectivity (lng wraps) into clusters
    labeled by min cell_id."""
    return tiling.grid_dbscan(explode_spans(
        read_interleaved(sf_dir), ["lat", "lng"]), RES)


def q_tile_share(sf_dir: str):
    """Pyramid parent-share join: per-cell count + parent-cell count in one
    parent-keyed shuffle (children co-live with their parent)."""
    return tiling.tile_share(explode_spans(
        read_interleaved(sf_dir), ["lat", "lng"]), RES)


def q_tile_rasterize(sf_dir: str):
    """Vector→raster: per-host boundary boxes rasterized to per-cell
    coverage counts (the inverse of tile_vectorize; fully streaming)."""
    return tiling.tile_rasterize(explode_spans(
        read_interleaved(sf_dir), ["kind", "hostname", "lat", "lng"]), RES)


def q_range_join(sf_dir: str):
    """Big×big spatial range join (no broadcast side): media spans ×
    document spans within RJ_RADIUS degrees, aggregated to
    (count, min squared distance) per media span."""
    return spatial.range_join_media_doc(explode_spans(
        read_interleaved(sf_dir),
        ["doc_id", "offset", "kind", "lat", "lng"]))


def _edges(sf_dir: str):
    # shuffle-free fast path: interleaved rows are already doc-grouped
    return tree.build_edges_interleaved(read_interleaved(sf_dir))


def q_edges(sf_dir: str):
    return _edges(sf_dir)


def q_edges_evidence(sf_dir: str):
    """Flagged variant of ``edges`` carrying the ``attach_evidence`` debug
    column (§2.10 parity with the reference's trace_make_subtree hooks,
    har2tree.py:46-87).  Rows-only: evidence strings embed raw channel
    values no SQL re-parse reproduces; the golden pytest pins the format
    (tests/test_tree.py) and the un-flagged ``edges`` oracle covers the
    topology."""
    return tree.build_edges_interleaved(read_interleaved(sf_dir),
                                        evidence=True)


def q_tree_stats(sf_dir: str):
    # zero-shuffle interleaved stats, incl. the A5 n_dropped_orphans column
    # (the edges→groupby path survives as tree.tree_stats for flat inputs)
    return tree.tree_stats_interleaved(read_interleaved(sf_dir))


def q_host_edges(sf_dir: str):
    # every HOST_EDGE key contains doc_id and interleaved rows hold whole
    # docs, so the aggregate finalizes batch-locally — zero shuffle
    # (hosttree.host_edges stays the general path for flat edge tables)
    return hosttree.host_edges_interleaved(read_interleaved(sf_dir))


def q_graft_edges(sf_dir: str):
    return graft.graft_edges_interleaved(read_interleaved(sf_dir))


def q_har_edges(_sf_dir: str):
    """Tree cascade over REAL ingested HAR captures (S1 source path) —
    the reference's own test corpus when present (tests/test.py:15-26),
    else any directory of .har files via $GRAFT_HAR_DIR.  Rows-only: no SQL
    oracle can parse HAR, but the cascade itself is parity-tested against
    tree_oracle on these same files (tests/test_har.py)."""
    import os

    from .sources.har import read_har_dir

    d = os.environ.get("GRAFT_HAR_DIR", "/root/reference/tests/data/lalibre")
    return tree.build_edges_interleaved(read_har_dir(d))


# ------------------------------------------- documents / embeddings tables
# (training-data pipeline operators — text analysis, dedup family, ANN)


def _docs(sf_dir: str, min_blocks: int = 1):
    """``min_blocks`` is the small-input compute hint (see read_table): the
    MinHash family's 128-permutation hashing and the shingle-explode family
    (jaccard pairs, dup_spans) are heavy per BYTE, so those callers floor
    the split at the CPU count — measured at the sf0.5 scaling tier, the
    3 MB documents file otherwise collapses to ONE read block and the
    whole shingle stage runs serially at every cluster size
    (BENCH/scaling_r5_run3: per-query eff 0.15-0.26).  Map-only text stats
    leave the size-based default."""
    return read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      min_blocks=min_blocks)


def _docs_wide(sf_dir: str):
    from .sources.interleaved import _cluster_cpus

    return _docs(sf_dir, min_blocks=_cluster_cpus())


def q_doc_tokens(sf_dir: str):
    return text.token_stats(_docs(sf_dir))


def q_doc_quality(sf_dir: str):
    return text.quality_stats(_docs(sf_dir))


def q_doc_langid(sf_dir: str):
    return text.langid(_docs(sf_dir))


def q_doc_fingerprint(sf_dir: str):
    return text.fingerprints(_docs(sf_dir))


def q_doc_tfidf_top(sf_dir: str):
    return text.doc_tfidf_top(_docs(sf_dir))


def q_doc_normalize(sf_dir: str):
    return text.doc_normalize(_docs(sf_dir))


def q_doc_decontam(sf_dir: str):
    return text.decontaminate(_docs(sf_dir))


def q_doc_pii(sf_dir: str):
    return text.pii_stats(_docs(sf_dir))


def q_doc_dup_spans(sf_dir: str):
    return text.dup_spans(_docs_wide(sf_dir))


def q_doc_repetition(sf_dir: str):
    return text.repetition_stats(_docs(sf_dir))


def q_doc_compress_ratio(sf_dir: str):
    """Compression-ratio quality signal (rows-only: SQL has no zlib)."""
    return text.compress_ratio(_docs(sf_dir))


def q_doc_mix(sf_dir: str):
    return text.doc_mix(
        read_table(sf_dir, "documents", columns=["doc_id", "source"]))


def q_doc_split(sf_dir: str):
    return text.doc_split(read_table(sf_dir, "documents", columns=["doc_id"]))


def q_doc_sample_stratified(sf_dir: str):
    return text.stratified_sample(
        read_table(sf_dir, "documents", columns=["doc_id", "source", "lang"]))


def q_doc_pack(sf_dir: str):
    return text.doc_pack(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def q_doc_jaccard_pairs(sf_dir: str):
    return text.ngram_jaccard_pairs(_docs_wide(sf_dir))


def q_doc_exact_dedup(sf_dir: str):
    return dedup.exact_dedup(_docs(sf_dir), "doc_id", "text")


def q_doc_minhash_pairs(sf_dir: str):
    return dedup.minhash_candidate_pairs(_docs_wide(sf_dir))


def q_doc_simhash(sf_dir: str):
    return dedup.simhash_table(_docs_wide(sf_dir))


def q_ngram_topk(sf_dir: str):
    return text.ngram_topk(_docs(sf_dir))


def q_doc_len_histogram(sf_dir: str):
    return text.doc_len_histogram(_docs(sf_dir))


def q_doc_bm25(sf_dir: str):
    """Integer BM25 scoring of every document against the fixed query
    (rational idf surrogate, milli/micro-scaled exact arithmetic; two-pass:
    corpus constants then map-only scoring)."""
    return text.doc_bm25(lambda: _docs(sf_dir))


def q_doc_lm_score(sf_dir: str):
    """Two-pass corpus bigram LM scoring (integer-exact): global bigram
    counts, then per-doc frequency-sum scores via a bigram-key
    co-partition join (token-scale stream rebuilt, not pinned)."""
    return text.doc_lm_score(lambda: _docs(sf_dir))


def q_doc_len_quantiles(sf_dir: str):
    """Exact per-source token-count percentiles via counting-sort
    histograms (no distributed sort)."""
    return text.doc_len_quantiles(
        read_table(sf_dir, "documents", columns=["source", "text"]))


def q_doc_filter(sf_dir: str):
    return text.doc_filter(_docs(sf_dir))


def q_corpus_keep(sf_dir: str):
    return corpus.corpus_keep(_docs_wide(sf_dir))


def q_corpus_keep_lsh(sf_dir: str):
    """Scale-path verdict: near-dup side from MinHash-LSH banding with
    exact verification over the candidate subset (corpus_keep_lsh).
    Approximate by the banding curve — rows-only, with a recall-vs-exact
    pytest (tests/test_training_ops.py)."""
    return corpus.corpus_keep_lsh(_docs_wide(sf_dir))


def q_dedup_clusters(sf_dir: str):
    return dedup.dedup_clusters(_docs(sf_dir),
                                text.ngram_jaccard_pairs(_docs_wide(sf_dir)))


def q_host_tree_json(sf_dir: str):
    return render.host_tree_json(read_interleaved(sf_dir))


def q_host_tree_d3(sf_dir: str):
    return render.host_tree_json_d3(read_interleaved(
        sf_dir, columns=["doc_id", "spans", "rendered_html",
                         "downloaded_filename"]))


def q_span_hhhash(sf_dir: str):
    return webmeta.span_hhhash(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "offset", "text"]))


def q_doc_domhash(sf_dir: str):
    return webmeta.doc_domhash(read_interleaved(sf_dir))


def q_host_rank(sf_dir: str):
    """Iterative integer-mass link propagation (PageRank-style, 3 unrolled
    iterations) over the host_link_graph edges."""
    return webmeta.host_rank(explode_spans(
        read_interleaved(sf_dir), ["text", "hostname"]))


def q_host_components(sf_dir: str):
    """Connected components of the undirected host graph via min-label
    propagation (recursive-CTE closure oracle)."""
    return webmeta.host_components(explode_spans(
        read_interleaved(sf_dir), ["text", "hostname"]))


def q_host_link_graph(sf_dir: str):
    return webmeta.host_link_graph(explode_spans(
        read_interleaved(sf_dir), ["text", "hostname"]))


def q_host_cooccur(sf_dir: str):
    return webmeta.host_cooccur(read_interleaved(sf_dir))


def q_host_tld(sf_dir: str):
    return webmeta.host_tld(explode_spans(read_interleaved(sf_dir), ["hostname"]))


def q_span_identifiers(sf_dir: str):
    return webmeta.span_identifiers(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "offset", "text"]))


def q_cookies_never_sent(sf_dir: str):
    return webmeta.cookies_never_sent_interleaved(read_interleaved(sf_dir))


def q_cookies_locally_created(sf_dir: str):
    return webmeta.cookies_locally_created(read_interleaved(
        sf_dir, columns=["doc_id", "spans", "cookies_json"]))


def q_posted_data(sf_dir: str):
    return webmeta.posted_data(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "offset", "text"]))


def q_span_security(sf_dir: str):
    return webmeta.span_security(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "offset", "text"]))


def q_doc_user_agent(sf_dir: str):
    return webmeta.doc_user_agent(read_interleaved(sf_dir))


def q_doc_sidecars(sf_dir: str):
    return webmeta.doc_sidecars(read_interleaved(
        sf_dir, columns=["doc_id", "downloaded_filename", "downloaded_b64",
                         "rendered_html"]))


def q_span_resource_hashes(sf_dir: str):
    return webmeta.span_resource_hashes(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "offset", "text"]))


def q_rendered_urls(sf_dir: str):
    return webmeta.rendered_urls(read_interleaved(
        sf_dir, columns=["doc_id", "spans", "rendered_html"]))


def q_rendered_urls_canonical(sf_dir: str):
    return webmeta.rendered_urls_canonical(read_interleaved(
        sf_dir, columns=["doc_id", "spans", "rendered_html"]))


def q_embedded_blobs(sf_dir: str):
    return webmeta.embedded_blobs(explode_spans(
        read_interleaved(sf_dir), ["doc_id", "offset", "text"]))


def q_urls_in_doc(sf_dir: str):
    return webmeta.urls_in_doc(read_interleaved(sf_dir))


def q_capture_stats(sf_dir: str):
    return stats.capture_stats(read_interleaved(sf_dir))


def q_doc_sample(sf_dir: str):
    return stats.doc_sample(read_interleaved(sf_dir, columns=["doc_id"]))


def q_top_hosts(sf_dir: str):
    return stats.top_hosts(read_interleaved(sf_dir))


def q_orders_by_nation(sf_dir: str):
    return relational.orders_by_nation(sf_dir)


def q_revenue_by_month(sf_dir: str):
    return relational.revenue_by_month(sf_dir)


def _events(sf_dir: str, columns: list[str] | None = None,
            min_blocks: int = 1):
    # always pass columns= : the events table carries a JSON props string
    # that must never cross a shuffle for queries that don't read it.
    # min_blocks: CPU floor for callers whose PRE-shuffle map is the bulk
    # of the work (window replication + batch-local dedup) — a small-byte
    # events file otherwise serializes that stage (see _docs).
    return read_table(sf_dir, "events", columns=columns,
                      min_blocks=min_blocks)


def q_event_running_total(sf_dir: str):
    """Distributed window function: per-user running count + running value
    total (exact integer cents) ordered by (ts, event_id)."""
    return events.running_total(
        _events(sf_dir, ["user_id", "ts", "event_id", "value"]))


def q_event_sessions(sf_dir: str):
    return events.sessionize(
        _events(sf_dir, ["user_id", "ts", "event_id", "value"]))


def q_event_window_sliding(sf_dir: str):
    """Sliding 60-min windows hopping every 30 min (each event in 2
    windows; batch-local replicate + partial agg, one bounded shuffle)."""
    return events.window_sliding(
        _events(sf_dir, ["ts", "event_type", "value"]))


def q_event_window_distinct(sf_dir: str):
    """Exact distinct users per hopping 60/30-min window and event type
    (composite-key dedup shuffle; the COUNT(DISTINCT) window member)."""
    from .sources.interleaved import _cluster_cpus

    return events.window_distinct(
        _events(sf_dir, ["ts", "event_type", "user_id"],
                min_blocks=_cluster_cpus()))


def q_event_burst_windows(sf_dir: str):
    """Tumbling-window burst detection: (window, type) whose count exceeds
    2x the previous window's (two bounded int-keyed range exchanges)."""
    return events.burst_windows(_events(sf_dir, ["ts", "event_type"]))


def q_event_transitions(sf_dir: str):
    """Per-user event-type transition bigram counts (clickstream Markov
    matrix; one user-range shuffle + bounded type-pair merge)."""
    return events.transitions(
        _events(sf_dir, ["user_id", "ts", "event_id", "event_type"]))


def q_event_window_agg(sf_dir: str):
    return events.window_agg(
        _events(sf_dir, ["ts", "event_type", "value", "event_id"]))


def q_event_asof(sf_dir: str):
    return events.asof_error_click(
        _events(sf_dir, ["user_id", "ts", "event_id", "event_type"]))


def q_event_props_rollup(sf_dir: str):
    return events.props_rollup(_events(sf_dir, ["event_type", "props"]))


def q_event_funnel(sf_dir: str):
    return events.funnel(_events(sf_dir, ["user_id", "ts", "event_type"]))


def q_event_retention(sf_dir: str):
    return events.retention(_events(sf_dir, ["user_id", "ts"]))


def _media_slim(sf_dir: str):
    return explode_spans(read_interleaved(sf_dir),
                         ["doc_id", "offset", "media_ref", "kind"])


def q_media_features(sf_dir: str):
    return media.media_features(_media_slim(sf_dir))


def q_media_frames(sf_dir: str):
    return media.frame_sample(_media_slim(sf_dir))


def q_media_payloads(sf_dir: str):
    return media.media_payloads(_media_slim(sf_dir))


def q_media_dedup(sf_dir: str):
    """Exact binary-payload content dedup (multimodal dedup family member;
    rows-only — sha of bytes is not SQL-expressible)."""
    return media.media_dedup(_media_slim(sf_dir))


def q_media_resize(sf_dir: str):
    return media.media_resize(_media_slim(sf_dir))


def _embeds(sf_dir: str):
    return read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])


def q_embed_neardup(sf_dir: str):
    return embed.embed_neardup(_embeds(sf_dir))


def q_embed_neardup_lsh(sf_dir: str):
    return embed.embed_neardup_lsh(_embeds(sf_dir))


def q_ann_topk(sf_dir: str):
    return embed.ann_topk(_embeds(sf_dir))


def q_ann_topk_ivf(sf_dir: str):
    return embed.ann_topk_ivf(_embeds(sf_dir))


def q_knn_graph(sf_dir: str):
    return embed.knn_graph(_embeds(sf_dir))


def q_knn_graph_ivf(sf_dir: str):
    return embed.knn_graph_ivf(_embeds(sf_dir))


def q_semdedup_keep(sf_dir: str):
    return embed.semdedup_keep(_embeds(sf_dir))


# -------------------------------------------------------------- oracle SQL


def _oracle_flatten(path: str) -> str:
    return _FLAT_CTE.format(path=path) + """
SELECT doc_id, "offset", kind, media_ref, scheme, hostname, status, lat, lng,
       CAST(length(text) AS BIGINT) AS text_len,
       sha256(text) AS body_hash,
       COALESCE(TRY_CAST(regexp_extract(text, '@dur=(\\d+)', 1) AS BIGINT), 0) AS duration_ms,
       regexp_matches(text, '^@geo=\\S+$') AS empty_response
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


def _oracle_tile_host_kmv(path: str, res: int = RES) -> str:
    n = 1 << res
    k = tiling.KMV_K
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
, d AS (
    SELECT DISTINCT cell_y * {n} + cell_x AS cell_id, md5(hostname) AS h
    FROM cells WHERE hostname <> ''
), r AS (
    SELECT cell_id, h,
           ROW_NUMBER() OVER (PARTITION BY cell_id ORDER BY h) AS rank
    FROM d
)
SELECT cell_id, CAST(rank AS BIGINT) AS rank, h FROM r WHERE rank <= {k}
""")


def _oracle_tile_host_hll(path: str, res: int = RES) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
, d AS (
    SELECT DISTINCT cell_y * {n} + cell_x AS cell_id, md5(hostname) AS h
    FROM cells WHERE hostname <> ''
), x AS (
    SELECT cell_id, substr(h, 1, 2) AS reg,
           CAST(31 - length(ltrim(substr(h, 3, 30), '0')) AS BIGINT) AS rho
    FROM d
)
SELECT cell_id, reg, MAX(rho) AS rho FROM x GROUP BY 1, 2
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


def _oracle_tile_pyramid(path: str, res: int = RES, levels: int = 3) -> str:
    n = 1 << res
    lo = max(0, res - levels)
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS res, "
        f"(cell_y // {1 << (res - r)}) * {1 << r} + (cell_x // {1 << (res - r)}) AS cell_id "
        f"FROM cells" for r in range(res, lo - 1, -1))
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
, lv AS (
{unions}
)
SELECT res, cell_id, CAST(COUNT(*) AS BIGINT) AS n_spans
FROM lv GROUP BY res, cell_id
""")




def _oracle_tile_compact(path: str, res: int = RES) -> str:
    """Level-chained compaction: l{r} = fully-covered cells promoted to
    level r, k{r} = cells emitted AT level r (their sibling set is
    incomplete), one CTE pair per level — the exact SQL mirror of the
    engine's bottom-up promote loop."""
    n = 1 << res
    parts = [f"l{res} AS (SELECT DISTINCT cell_x AS ix, cell_y AS iy FROM cells)"]
    for r in range(res, 0, -1):
        parts.append(
            f"p{r} AS (SELECT ix // 2 AS ix, iy // 2 AS iy, COUNT(*) AS nc "
            f"FROM l{r} GROUP BY 1, 2)")
        parts.append(
            f"k{r} AS (SELECT l.ix, l.iy FROM l{r} l JOIN p{r} p "
            f"ON p.ix = l.ix // 2 AND p.iy = l.iy // 2 WHERE p.nc < 4)")
        parts.append(
            f"l{r - 1} AS (SELECT ix, iy FROM p{r} WHERE nc = 4)")
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS res, iy * {1 << r} + ix AS cell_id "
        f"FROM k{r}" for r in range(res, 0, -1))
    unions += ("\nUNION ALL\nSELECT CAST(0 AS INTEGER) AS res, "
               "iy + ix AS cell_id FROM l0")
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n)
            + ", " + ",\n".join(parts) + "\n" + unions)


def _oracle_tile_outline(path: str, res: int = RES) -> str:
    """Four NOT-EXISTS branches (one per side) over the distinct covered
    set; endpoint doubles use the exact tile_vectorize float forms."""
    n = 1 << res
    min_lng = f"CAST(ix AS DOUBLE) / {n}.0 * 360.0 - 180.0"
    max_lng = f"(CAST(ix AS DOUBLE) + 1.0) / {n}.0 * 360.0 - 180.0"
    max_lat = f"90.0 - CAST(iy AS DOUBLE) / {n}.0 * 180.0"
    min_lat = f"90.0 - (CAST(iy AS DOUBLE) + 1.0) / {n}.0 * 180.0"
    branches = [
        ("N", f"c.iy = 0 OR NOT EXISTS (SELECT 1 FROM cov o "
              f"WHERE o.ix = c.ix AND o.iy = c.iy - 1)",
         min_lng, max_lat, max_lng, max_lat),
        ("S", f"c.iy = {n} - 1 OR NOT EXISTS (SELECT 1 FROM cov o "
              f"WHERE o.ix = c.ix AND o.iy = c.iy + 1)",
         min_lng, min_lat, max_lng, min_lat),
        ("E", f"NOT EXISTS (SELECT 1 FROM cov o "
              f"WHERE o.ix = (c.ix + 1) % {n} AND o.iy = c.iy)",
         max_lng, min_lat, max_lng, max_lat),
        ("W", f"NOT EXISTS (SELECT 1 FROM cov o "
              f"WHERE o.ix = (c.ix - 1 + {n}) % {n} AND o.iy = c.iy)",
         min_lng, min_lat, min_lng, max_lat),
    ]
    unions = "\nUNION ALL\n".join(
        f"SELECT iy * {n} + ix AS cell_id, '{s}' AS side,\n"
        f"       {x0} AS x0, {y0} AS y0, {x1} AS x1, {y1} AS y1\n"
        f"FROM cov c WHERE {cond}"
        for s, cond, x0, y0, x1, y1 in branches)
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
, cov AS (
    SELECT DISTINCT cell_x AS ix, cell_y AS iy FROM cells
)
{unions}
""")


def _oracle_tile_zorder(path: str, res: int = RES) -> str:
    n = 1 << res
    terms = " + ".join(
        f"((cell_x // {1 << b}) % 2) * {1 << (2 * b)}"
        f" + ((cell_y // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        for b in range(res))
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
SELECT doc_id, "offset",
       cell_y * {n} + cell_x AS cell_id,
       CAST({terms} AS BIGINT) AS zkey
FROM cells
""")


def _oracle_tile_neighbors(path: str, res: int = RES) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
, counts AS (
    SELECT cell_x, cell_y, CAST(COUNT(*) AS BIGINT) AS n_spans
    FROM cells GROUP BY cell_x, cell_y
), off AS (
    SELECT a.dx, b.dy FROM (VALUES (-1), (0), (1)) a(dx),
                           (VALUES (-1), (0), (1)) b(dy)
), scat AS (
    SELECT ((cell_x + dx) % {n} + {n}) % {n} AS x2, cell_y + dy AS y2,
           CASE WHEN dx = 0 AND dy = 0 THEN n_spans ELSE 0 END AS self_n,
           n_spans AS nb_n
    FROM counts, off
    WHERE cell_y + dy BETWEEN 0 AND {n} - 1
)
SELECT y2 * {n} + x2 AS cell_id,
       CAST(SUM(self_n) AS BIGINT) AS n_spans,
       CAST(SUM(nb_n) AS BIGINT) AS neighbor_spans
FROM scat GROUP BY y2, x2
""")


_CHAIN_CTE = """
, redir0 AS (
    SELECT doc_id, "offset", media_ref,
           regexp_extract(text, '@redirect=(\\S+)', 1) AS rt
    FROM flat
),
redir AS (
    -- path-absolute targets (M21) resolve against the current hop's origin
    SELECT doc_id, "offset", media_ref,
           CASE WHEN rt LIKE '/%' AND rt NOT LIKE '//%'
                THEN regexp_extract(media_ref, '^(https?://[^/?#]+)', 1) || rt
                ELSE rt END AS target
    FROM redir0
),
firsts AS (
    SELECT doc_id, media_ref, MIN("offset") AS first_off
    FROM flat GROUP BY doc_id, media_ref
),
roots AS (SELECT doc_id, MIN("offset") AS root_off FROM flat GROUP BY doc_id),
chain AS (
    SELECT r.doc_id, 0 AS hop, r."offset" AS off, r.media_ref AS url, r.target
    FROM redir r JOIN roots ro ON r.doc_id = ro.doc_id AND r."offset" = ro.root_off
    UNION ALL
    SELECT c.doc_id, c.hop + 1, n."offset", n.media_ref, n.target
    FROM chain c
    JOIN firsts fi ON fi.doc_id = c.doc_id AND fi.media_ref = c.target
    JOIN redir n ON n.doc_id = c.doc_id AND n.media_ref = c.target
                AND n."offset" = fi.first_off
    WHERE c.target <> '' AND fi.first_off > c.off AND c.hop < 16
)
"""


def _oracle_redirect_chain(path: str) -> str:
    return ("WITH RECURSIVE " + _FLAT_CTE.format(path=path).split("WITH", 1)[1]
            + _CHAIN_CTE + """
SELECT doc_id, CAST(hop AS BIGINT) AS hop, url FROM chain
""")


def _oracle_landing(path: str) -> str:
    return ("WITH RECURSIVE " + _FLAT_CTE.format(path=path).split("WITH", 1)[1]
            + _CHAIN_CTE + """
SELECT doc_id,
       MAX(CASE WHEN hop = 0 THEN url END) AS root_url,
       ARG_MAX(url, hop) AS landing_url,
       CAST(MAX(hop) AS BIGINT) AS n_hops
FROM chain GROUP BY doc_id
""")


def _oracle_landing_validated(path: str) -> str:
    """J10 sidecar validation: the reference's progressive search
    (har2tree.py:198-222) — per candidate (raw, fragment-stripped,
    query-stripped) in priority order, the first span (offset order)
    matching exactly or as a ``c || '?'`` prefix wins."""
    return f"""
WITH iv AS (
    SELECT doc_id, last_redirect, spans
    FROM read_parquet('{path}/*.parquet')
    WHERE last_redirect IS NOT NULL AND len(spans) > 0
), d2 AS (
    SELECT *, CASE WHEN lr1 IS NOT NULL AND contains(lr1, '?')
                   THEN split_part(lr1, '?', 1) END AS lr2
    FROM (
        SELECT doc_id, last_redirect AS lr0,
               CASE WHEN contains(last_redirect, '#')
                    THEN split_part(last_redirect, '#', 1)
                    WHEN contains(last_redirect, '?')
                    THEN split_part(last_redirect, '?', 1)
               END AS lr1
        FROM iv)
), cand AS (
    SELECT doc_id, 0 AS pr, lr0 AS c FROM d2
    UNION ALL SELECT doc_id, 1, lr1 FROM d2 WHERE lr1 IS NOT NULL
    UNION ALL SELECT doc_id, 2, lr2 FROM d2 WHERE lr2 IS NOT NULL
), ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM iv
), su AS (
    SELECT doc_id, s.media_ref AS url, s."offset" AS off
    FROM ex WHERE s.media_ref <> ''
), m AS (
    SELECT cand.doc_id, su.url,
           row_number() OVER (PARTITION BY cand.doc_id
                              ORDER BY cand.pr, su.off) AS rn
    FROM cand JOIN su ON su.doc_id = cand.doc_id
     AND (su.url = cand.c OR starts_with(su.url, cand.c || '?'))
)
SELECT d2.doc_id, d2.lr0 AS last_redirect,
       COALESCE(m.url, COALESCE(d2.lr2, d2.lr1, d2.lr0)) AS final_url,
       m.url IS NOT NULL AS resolved
FROM d2 LEFT JOIN (SELECT doc_id, url FROM m WHERE rn = 1) m USING (doc_id)
"""


def _oracle_graft_edges(path: str) -> str:
    """J9 forest graft: per capture, a child attaches to the MIN doc whose
    landing or root URL equals the child's root referer."""
    return ("WITH RECURSIVE " + _FLAT_CTE.format(path=path).split("WITH", 1)[1]
            + _CHAIN_CTE + """
, summ AS (
    SELECT doc_id,
           MAX(CASE WHEN hop = 0 THEN url END) AS root_url,
           ARG_MAX(url, hop) AS landing_url
    FROM chain GROUP BY doc_id
), rt AS (
    SELECT doc_id,
           ARG_MIN(regexp_extract(text, '@referer=(\\S+)', 1), "offset") AS root_referer
    FROM flat GROUP BY doc_id
), d AS (
    SELECT s.doc_id, regexp_replace(s.doc_id, '\\.\\d+$', '') AS capture_id,
           s.root_url, s.landing_url, rt.root_referer
    FROM summ s JOIN rt USING (doc_id)
), matched AS (
    SELECT c.doc_id AS child_doc, MIN(p.doc_id) AS parent_doc
    FROM d c JOIN d p ON p.capture_id = c.capture_id AND p.doc_id <> c.doc_id
    WHERE c.root_referer <> '' AND c.root_referer IN (p.landing_url, p.root_url)
    GROUP BY c.doc_id
)
SELECT d.capture_id, d.doc_id AS child_doc,
       COALESCE(m.parent_doc, '') AS parent_doc,
       CASE WHEN m.parent_doc IS NOT NULL THEN d.root_referer ELSE '' END AS attach_url
FROM d LEFT JOIN matched m ON m.child_doc = d.doc_id
""")


def _oracle_host_rollup(path: str) -> str:
    return _FLAT_CTE.format(path=path) + """
SELECT doc_id, hostname,
       COUNT(*) AS n_spans,
       COUNT(DISTINCT media_ref) AS n_unique_urls,
       CAST(SUM(CASE WHEN status <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_status0,
       BOOL_OR(kind = 'document') AS has_document,
       CAST(MIN("offset") AS BIGINT) AS min_offset
FROM flat
WHERE hostname <> ''
GROUP BY doc_id, hostname
"""


_COOKIE_EVENTS_SQL = """
, events AS (
    SELECT doc_id, "offset", 'set' AS side,
           regexp_extract(m, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 1) AS name,
           regexp_extract(m, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 2) AS value,
           regexp_extract(m, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 3) AS domain,
           hostname,
           NOT (regexp_replace(hostname, ':[0-9]+$', '') LIKE '%' ||
                regexp_extract(m, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 3)) AS third_party
    FROM (SELECT doc_id, "offset", hostname,
                 UNNEST(regexp_extract_all(text, '@setcookie=[^=\\s]+=\\S+@\\S+')) AS m
          FROM flat WHERE contains(text, '@setcookie='))
    UNION ALL
    SELECT doc_id, "offset", 'sent' AS side,
           regexp_extract(m, '@cookie=([^=\\s]+)=(\\S+)', 1) AS name,
           regexp_extract(m, '@cookie=([^=\\s]+)=(\\S+)', 2) AS value,
           '' AS domain, hostname, FALSE AS third_party
    FROM (SELECT doc_id, "offset", hostname,
                 UNNEST(regexp_extract_all(text, '@cookie=[^=\\s]+=\\S+')) AS m
          FROM flat WHERE contains(text, '@cookie='))
)
"""


def _oracle_cookie_events(path: str) -> str:
    return _FLAT_CTE.format(path=path) + _COOKIE_EVENTS_SQL + """
SELECT doc_id, "offset", side, name, value, domain, hostname, third_party
FROM events
"""


def _oracle_cookie_asof(path: str) -> str:
    return _FLAT_CTE.format(path=path) + _COOKIE_EVENTS_SQL + """
, matches AS (
    SELECT snd.doc_id, snd."offset" AS "offset", snd.name,
           st."offset" AS setter_offset,
           ROW_NUMBER() OVER (
               PARTITION BY snd.doc_id, snd."offset", snd.name
               ORDER BY st."offset" DESC) AS rn
    FROM events snd
    JOIN events st ON st.doc_id = snd.doc_id
        AND snd.side = 'sent' AND st.side = 'set'
        AND st.name = snd.name AND st."offset" < snd."offset"
        AND regexp_replace(snd.hostname, ':[0-9]+$', '') LIKE '%' || st.domain
)
SELECT doc_id, CAST("offset" AS BIGINT) AS "offset", name,
       CAST(setter_offset AS BIGINT) AS setter_offset
FROM matches WHERE rn = 1
"""


def _oracle_knn_referrer(path: str, res: int = spatial.KNN_RES, ring: int = spatial.KNN_RING) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
SELECT doc_id, CAST("offset" AS BIGINT) AS "offset",
       CAST(parent_offset AS BIGINT) AS parent_offset,
       cell_dist
FROM (
    SELECT q.doc_id, q."offset", c."offset" AS parent_offset,
           GREATEST(LEAST(ABS(q.cell_x - c.cell_x), {n} - ABS(q.cell_x - c.cell_x)),
                    ABS(q.cell_y - c.cell_y)) AS cell_dist,
           ROW_NUMBER() OVER (
               PARTITION BY q.doc_id, q."offset"
               ORDER BY (q.lat - c.lat) * (q.lat - c.lat)
                      + (q.lng - c.lng) * (q.lng - c.lng),
                        c."offset") AS rn
    FROM cells q JOIN cells c
      ON q.doc_id = c.doc_id AND c.kind = 'document'
     AND GREATEST(LEAST(ABS(q.cell_x - c.cell_x), {n} - ABS(q.cell_x - c.cell_x)),
                  ABS(q.cell_y - c.cell_y)) <= {ring}
    WHERE q.kind IN ('img', 'media')
) WHERE rn = 1
""")


def _oracle_host_boxes(path: str, eps: float = spatial.PIP_EPS) -> str:
    return _FLAT_CTE.format(path=path) + f"""
SELECT hostname,
       MIN(lat) - {eps} AS min_lat, MAX(lat) + {eps} AS max_lat,
       MIN(lng) - {eps} AS min_lng, MAX(lng) + {eps} AS max_lng
FROM flat WHERE kind = 'document' AND hostname <> ''
GROUP BY hostname
"""


def _oracle_trajectory_od(path: str, res: int = RES) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
, o AS (
    SELECT doc_id, cell_y * {n} + cell_x AS cell,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") AS ra,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset" DESC) AS rd
    FROM cells
)
SELECT a.cell AS o_cell, d.cell AS d_cell,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM (SELECT doc_id, cell FROM o WHERE ra = 1) a
JOIN (SELECT doc_id, cell FROM o WHERE rd = 1) d USING (doc_id)
GROUP BY 1, 2
""")


def _oracle_tile_topk_hosts(path: str, res: int = RES, k: int = 3) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
, c AS (
    SELECT cell_y * {n} + cell_x AS cell_id, hostname,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM cells WHERE hostname <> '' GROUP BY 1, 2
), r AS (
    SELECT cell_id, hostname, n,
           ROW_NUMBER() OVER (PARTITION BY cell_id
                              ORDER BY n DESC, hostname) AS rank
    FROM c
)
SELECT cell_id, CAST(rank AS BIGINT) AS rank, hostname, n
FROM r WHERE rank <= {k}
""")


def _oracle_host_octagon(path: str) -> str:
    return _FLAT_CTE.format(path=path) + """
SELECT hostname,
       MIN(lat) AS min_lat, MAX(lat) AS max_lat,
       MIN(lng) AS min_lng, MAX(lng) AS max_lng,
       MIN(lat + lng) AS min_sum, MAX(lat + lng) AS max_sum,
       MIN(lat - lng) AS min_diff, MAX(lat - lng) AS max_diff
FROM flat WHERE kind = 'document' AND hostname <> ''
GROUP BY hostname
"""


_BOXES_CTE = """
, boxes AS (
    SELECT hostname,
           MIN(lat) - {eps} AS min_lat, MAX(lat) + {eps} AS max_lat,
           MIN(lng) - {eps} AS min_lng, MAX(lng) + {eps} AS max_lng
    FROM flat WHERE kind = 'document' AND hostname <> ''
    GROUP BY hostname
)
"""


def _oracle_nn_media_host(path: str, eps: float = spatial.PIP_EPS) -> str:
    kinds = ", ".join(f"'{k}'" for k in spatial.QUERY_KINDS)
    return _FLAT_CTE.format(path=path) + _BOXES_CTE.format(eps=eps) + f"""
, q AS (
    SELECT doc_id, "offset", lat, lng FROM flat WHERE kind IN ({kinds})
), d AS (
    SELECT q.doc_id, q."offset", b.hostname,
           GREATEST(b.min_lat - q.lat, q.lat - b.max_lat, 0.0)
             * GREATEST(b.min_lat - q.lat, q.lat - b.max_lat, 0.0)
           + GREATEST(b.min_lng - q.lng, q.lng - b.max_lng, 0.0)
             * GREATEST(b.min_lng - q.lng, q.lng - b.max_lng, 0.0) AS d2
    FROM q CROSS JOIN boxes b
)
SELECT doc_id, "offset", hostname AS nn_host, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, "offset"
                                 ORDER BY d2, hostname) AS rn
    FROM d) WHERE rn = 1
"""


def _oracle_boundary_overlap(path: str, eps: float = spatial.OV_EPS) -> str:
    return _FLAT_CTE.format(path=path) + _BOXES_CTE.format(eps=eps) + """
SELECT a.hostname AS host_a, b.hostname AS host_b,
       (LEAST(a.max_lng, b.max_lng) - GREATEST(a.min_lng, b.min_lng))
       * (LEAST(a.max_lat, b.max_lat) - GREATEST(a.min_lat, b.min_lat))
           AS inter_area,
       (a.max_lng - a.min_lng) * (a.max_lat - a.min_lat) AS area_a,
       (b.max_lng - b.min_lng) * (b.max_lat - b.min_lat) AS area_b
FROM boxes a JOIN boxes b ON a.hostname < b.hostname
WHERE LEAST(a.max_lng, b.max_lng) - GREATEST(a.min_lng, b.min_lng) > 0
  AND LEAST(a.max_lat, b.max_lat) - GREATEST(a.min_lat, b.min_lat) > 0
"""


def _oracle_grid_dbscan(path: str, res: int = RES,
                        minpts: int | None = None) -> str:
    if minpts is None:
        minpts = tiling.DBSCAN_MINPTS
    n = 1 << res
    # the recursive reach CTE needs the RECURSIVE keyword on the shared WITH
    head = _FLAT_CTE.format(path=path).replace("WITH ex", "WITH RECURSIVE ex", 1)
    return (head + "," + _CELL_CTE.format(n=n) + f"""
, cnt AS (
    SELECT cell_y * {n} + cell_x AS cell_id, cell_x, cell_y,
           CAST(COUNT(*) AS BIGINT) AS n_spans
    FROM cells GROUP BY 1, 2, 3
), core AS (
    SELECT * FROM cnt WHERE n_spans >= {minpts}
), adj AS (
    SELECT a.cell_id AS s, b.cell_id AS t
    FROM core a JOIN core b ON a.cell_id <> b.cell_id
     AND GREATEST(LEAST(ABS(a.cell_x - b.cell_x), {n} - ABS(a.cell_x - b.cell_x)),
                  ABS(a.cell_y - b.cell_y)) <= 1
), reach AS (
    SELECT cell_id AS h, cell_id AS r FROM core
    UNION
    SELECT reach.h, adj.t FROM reach JOIN adj ON adj.s = reach.r
)
SELECT c.cell_id, m.cluster_id, c.n_spans
FROM core c
JOIN (SELECT h, MIN(r) AS cluster_id FROM reach GROUP BY h) m
  ON m.h = c.cell_id
""")


def _oracle_tile_rasterize(path: str, res: int = RES,
                           eps: float = spatial.PIP_EPS) -> str:
    n = 1 << res
    return _FLAT_CTE.format(path=path) + f"""
, boxes AS (
    SELECT hostname,
           MIN(lat) - {eps} AS min_lat, MAX(lat) + {eps} AS max_lat,
           MIN(lng) - {eps} AS min_lng, MAX(lng) + {eps} AS max_lng
    FROM flat WHERE kind = 'document' AND hostname <> ''
    GROUP BY hostname
), bx AS (
    SELECT hostname,
      LEAST(GREATEST(CAST(FLOOR((min_lng + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS x0,
      LEAST(GREATEST(CAST(FLOOR((max_lng + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS x1,
      LEAST(GREATEST(CAST(FLOOR((90.0 - max_lat) / 180.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS y0,
      LEAST(GREATEST(CAST(FLOOR((90.0 - min_lat) / 180.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS y1
    FROM boxes
), gs AS (
    SELECT CAST(g AS BIGINT) AS i FROM generate_series(0, {n} - 1) AS t(g)
), cov AS (
    SELECT gy.i * {n} + gx.i AS cell_id
    FROM bx
    JOIN gs gx ON gx.i BETWEEN bx.x0 AND bx.x1
    JOIN gs gy ON gy.i BETWEEN bx.y0 AND bx.y1
)
SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_boxes
FROM cov GROUP BY 1
"""


def _oracle_range_join(path: str, radius: float = spatial.RJ_RADIUS) -> str:
    r2 = radius * radius
    kinds = ", ".join(f"'{k}'" for k in spatial.QUERY_KINDS)
    return _FLAT_CTE.format(path=path) + f"""
, q AS (
    SELECT doc_id, "offset", lat, lng FROM flat WHERE kind IN ({kinds})
), c AS (
    SELECT lat AS clat, lng AS clng FROM flat WHERE kind = 'document'
)
SELECT q.doc_id, q."offset",
       CAST(COUNT(*) AS BIGINT) AS n_in_range,
       MIN((q.lat - clat) * (q.lat - clat)
           + (q.lng - clng) * (q.lng - clng)) AS d2_min
FROM q JOIN c
  ON (q.lat - clat) * (q.lat - clat)
     + (q.lng - clng) * (q.lng - clng) <= {r2}
GROUP BY 1, 2
"""


def _oracle_trajectory(path: str, res: int = RES) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
, o AS (
    SELECT doc_id, "offset", cell_y * {n} + cell_x AS cell_id, cell_x, cell_y
    FROM cells
), l AS (
    SELECT *, LAG(cell_id) OVER (PARTITION BY doc_id ORDER BY "offset") AS prev
    FROM o
), k AS (
    SELECT doc_id, "offset", cell_id, cell_x, cell_y
    FROM l WHERE prev IS NULL OR cell_id <> prev
), s AS (
    SELECT doc_id, "offset", cell_id, cell_x, cell_y,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1 AS seq,
           LAG(cell_x) OVER (PARTITION BY doc_id ORDER BY "offset") AS px,
           LAG(cell_y) OVER (PARTITION BY doc_id ORDER BY "offset") AS py
    FROM k
)
SELECT doc_id, CAST(seq AS BIGINT) AS seq, CAST("offset" AS BIGINT) AS "offset",
       cell_id,
       CAST(CASE WHEN px IS NULL THEN 0
            ELSE GREATEST(LEAST(ABS(cell_x - px), {n} - ABS(cell_x - px)),
                          ABS(cell_y - py)) END AS BIGINT) AS step_dist
FROM s
""")


def _oracle_zonal(path: str, res: int = RES,
                  eps: float = spatial.PIP_EPS) -> str:
    n = 1 << res
    return (_FLAT_CTE.format(path=path) + "," + _CELL_CTE.format(n=n) + f"""
, boxes AS (
    SELECT hostname,
           MIN(lat) - {eps} AS min_lat, MAX(lat) + {eps} AS max_lat,
           MIN(lng) - {eps} AS min_lng, MAX(lng) + {eps} AS max_lng
    FROM flat WHERE kind = 'document' AND hostname <> ''
    GROUP BY hostname
), bx AS (
    SELECT hostname,
      LEAST(GREATEST(CAST(FLOOR((min_lng + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS x0,
      LEAST(GREATEST(CAST(FLOOR((max_lng + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS x1,
      LEAST(GREATEST(CAST(FLOOR((90.0 - max_lat) / 180.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS y0,
      LEAST(GREATEST(CAST(FLOOR((90.0 - min_lat) / 180.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS y1
    FROM boxes
), hits AS (
    SELECT b.hostname, c.cell_y * {n} + c.cell_x AS cell_id
    FROM cells c JOIN bx b
      ON c.cell_x BETWEEN b.x0 AND b.x1 AND c.cell_y BETWEEN b.y0 AND b.y1
), percell AS (
    SELECT hostname, cell_id, COUNT(*) AS cn FROM hits GROUP BY 1, 2
), zz AS (
    SELECT hostname, SUM(cn) AS s, COUNT(*) AS c, MAX(cn) AS m
    FROM percell GROUP BY 1
)
SELECT b.hostname,
       CAST((b.x1 - b.x0 + 1) * (b.y1 - b.y0 + 1) AS BIGINT) AS n_cells_covered,
       CAST(COALESCE(zz.s, 0) AS BIGINT) AS n_spans_in_zone,
       CAST(COALESCE(zz.c, 0) AS BIGINT) AS n_cells_occupied,
       CAST(COALESCE(zz.m, 0) AS BIGINT) AS max_cell_count
FROM bx b LEFT JOIN zz USING (hostname)
""")


def _oracle_pip_anti(path: str, eps: float = 0.0) -> str:
    # raw (un-expanded) boxes: the anti side asks what is strictly
    # uncovered; with the join's PIP_EPS the complement is empty
    kinds = ", ".join(f"'{k}'" for k in spatial.QUERY_KINDS)
    return _FLAT_CTE.format(path=path) + f"""
, boxes AS (
    SELECT hostname,
           MIN(lat) - {eps} AS min_lat, MAX(lat) + {eps} AS max_lat,
           MIN(lng) - {eps} AS min_lng, MAX(lng) + {eps} AS max_lng
    FROM flat WHERE kind = 'document' AND hostname <> ''
    GROUP BY hostname
)
SELECT f.doc_id, f."offset"
FROM flat f
WHERE f.kind IN ({kinds})
  AND NOT EXISTS (
    SELECT 1 FROM boxes b
    WHERE f.lat >= b.min_lat AND f.lat <= b.max_lat
      AND f.lng >= b.min_lng AND f.lng <= b.max_lng)
"""


def _oracle_pip(path: str, eps: float = spatial.PIP_EPS) -> str:
    return _FLAT_CTE.format(path=path) + f"""
, boxes AS (
    SELECT hostname,
           MIN(lat) - {eps} AS min_lat, MAX(lat) + {eps} AS max_lat,
           MIN(lng) - {eps} AS min_lng, MAX(lng) + {eps} AS max_lng
    FROM flat WHERE kind = 'document' AND hostname <> ''
    GROUP BY hostname
)
SELECT f.doc_id, f."offset", b.hostname AS box_hostname
FROM flat f JOIN boxes b
  ON f.lat >= b.min_lat AND f.lat <= b.max_lat
 AND f.lng >= b.min_lng AND f.lng <= b.max_lng
WHERE f.kind IN ('img', 'media')
"""


# ----------------------------------------------------------------- registry

def _oracle_doc_exact_dedup(_path: str) -> str:
    return """
SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text
"""


# oracles over the driver-registered views (documents / embeddings) —
# independent of the synthesized interleaved path
_TABLE_ORACLES = {
    "doc_tokens": lambda _p: text.token_stats_sql(),
    "doc_quality": lambda _p: text.quality_stats_sql(),
    "doc_langid": lambda _p: text.langid_sql(),
    "doc_fingerprint": lambda _p: text.fingerprints_sql(),
    "doc_tfidf_top": lambda _p: text.doc_tfidf_top_sql(),
    "doc_normalize": lambda _p: text.doc_normalize_sql(),
    "doc_jaccard_pairs": lambda _p: text.ngram_jaccard_sql(),
    "doc_decontam": lambda _p: text.decontaminate_sql(),
    "doc_pii": lambda _p: text.pii_stats_sql(),
    "doc_dup_spans": lambda _p: text.dup_spans_sql(),
    "doc_repetition": lambda _p: text.repetition_stats_sql(),
    "doc_mix": lambda _p: text.doc_mix_sql(),
    "doc_sample_stratified": lambda _p: text.stratified_sample_sql(),
    "doc_split": lambda _p: text.doc_split_sql(),
    "doc_pack": lambda _p: text.doc_pack_sql(),
    "doc_exact_dedup": _oracle_doc_exact_dedup,
    "doc_filter": lambda _p: text.doc_filter_sql(),
    "doc_len_histogram": lambda _p: text.doc_len_histogram_sql(),
    "doc_len_quantiles": lambda _p: text.doc_len_quantiles_sql(),
    "doc_lm_score": lambda _p: text.doc_lm_score_sql(),
    "doc_bm25": lambda _p: text.doc_bm25_sql(),
    "ngram_topk": lambda _p: text.ngram_topk_sql(),
    "inverted_index": lambda _p: text.inverted_index_sql(),
    "doc_chunk": lambda _p: text.doc_chunk_sql(),
    "dedup_clusters": lambda _p: text.dedup_clusters_sql(),
    "corpus_keep": lambda _p: corpus.corpus_keep_sql(),
    "embed_neardup": lambda _p: embed.embed_neardup_sql(),
    "ann_topk": lambda _p: embed.ann_topk_sql(),
    "event_sessions": lambda _p: events.sessionize_sql(),
    "event_transitions": lambda _p: events.transitions_sql(),
    "event_running_total": lambda _p: events.running_total_sql(),
    "event_window_sliding": lambda _p: events.window_sliding_sql(),
    "event_window_distinct": lambda _p: events.window_distinct_sql(),
    "event_burst_windows": lambda _p: events.burst_windows_sql(),
    "event_topk_users": lambda _p: events.topk_users_sql(),
    "event_rfm": lambda _p: events.rfm_sql(),
    "event_session_histogram": lambda _p: events.session_histogram_sql(),
    "doc_term_cooccur": lambda _p: text.doc_term_cooccur_sql(),
    "event_window_agg": lambda _p: events.window_agg_sql(),
    "event_asof": lambda _p: events.asof_error_click_sql(),
    "event_props_rollup": lambda _p: events.props_rollup_sql(),
    "event_funnel": lambda _p: events.funnel_sql(),
    "event_retention": lambda _p: events.retention_sql(),
    "orders_by_nation": lambda _p: relational.orders_by_nation_sql(),
    "revenue_by_month": lambda _p: relational.revenue_by_month_sql(),
}


_INTERLEAVED_ORACLES = {
    "flatten_spans": _oracle_flatten,
    "doc_stats": _oracle_doc_stats,
    "kind_rollup": _oracle_kind_rollup,
    "span_dedup": _oracle_span_dedup,
    "tile_assign": _oracle_tile_assign,
    "tile_rollup": _oracle_tile_rollup,
    "tile_host_kmv": _oracle_tile_host_kmv,
    "tile_host_hll": _oracle_tile_host_hll,
    "tile_vectorize": _oracle_tile_vectorize,
    "tile_pyramid": _oracle_tile_pyramid,
    "tile_neighbor_density": _oracle_tile_neighbors,
    "tile_compact": _oracle_tile_compact,
    "tile_outline": _oracle_tile_outline,
    "tile_zorder": _oracle_tile_zorder,
    "tile_rasterize": _oracle_tile_rasterize,
    "tile_share": lambda p: tiling.tile_share_sql(p),
    "range_join": _oracle_range_join,
    "redirect_chain": _oracle_redirect_chain,
    "landing": _oracle_landing,
    "landing_validated": _oracle_landing_validated,
    "host_rollup": _oracle_host_rollup,
    "cookie_events": _oracle_cookie_events,
    "cookie_asof": _oracle_cookie_asof,
    "knn_referrer": _oracle_knn_referrer,
    "graft_edges": _oracle_graft_edges,
    "pip_media_in_host": _oracle_pip,
    "pip_media_outside_host": _oracle_pip_anti,
    "tile_zonal_stats": _oracle_zonal,
    "doc_trajectory": _oracle_trajectory,
    "host_topk_urls": stats.host_topk_urls_sql,
    "host_boxes": _oracle_host_boxes,
    "tile_topk_hosts": _oracle_tile_topk_hosts,
    "trajectory_od": _oracle_trajectory_od,
    "tile_hhi": lambda p: tiling.tile_hhi_sql(p),
    "tile_morans": lambda p: tiling.tile_morans_sql(p),
    "host_assortativity": webmeta.host_assortativity_sql,
    "host_octagon": _oracle_host_octagon,
    "nn_media_host": _oracle_nn_media_host,
    "boundary_overlap": _oracle_boundary_overlap,
    "grid_dbscan": _oracle_grid_dbscan,
    "media_features": media.media_features_sql,
    "media_resize": media.media_resize_sql,
    "media_frames": media.media_frames_sql,
    "span_hhhash": webmeta.span_hhhash_sql,
    "doc_domhash": webmeta.doc_domhash_sql,
    "host_tld": webmeta.host_tld_sql,
    "host_link_graph": webmeta.host_link_graph_sql,
    "host_rank": webmeta.host_rank_sql,
    "host_components": webmeta.host_components_sql,
    "host_cooccur": webmeta.host_cooccur_sql,
    "host_triangles": webmeta.host_triangles_sql,
    "host_clustering": webmeta.host_clustering_sql,
    "host_reciprocity": webmeta.host_reciprocity_sql,
    "span_identifiers": webmeta.span_identifiers_sql,
    "cookies_never_sent": webmeta.cookies_never_sent_sql,
    "cookies_locally_created": webmeta.cookies_locally_created_sql,
    "posted_data": webmeta.posted_data_sql,
    "span_security": webmeta.span_security_sql,
    "doc_user_agent": webmeta.doc_user_agent_sql,
    "doc_sidecars": webmeta.doc_sidecars_sql,
    "span_resource_hashes": webmeta.span_resource_hashes_sql,
    "rendered_urls": webmeta.rendered_urls_sql,
    "rendered_urls_canonical": webmeta.rendered_urls_canonical_sql,
    "embedded_blobs": webmeta.embedded_blobs_sql,
    "urls_in_doc": webmeta.urls_in_doc_sql,
    "capture_stats": stats.capture_stats_sql,
    "doc_durations": stats.doc_durations_sql,
    "doc_sample": stats.doc_sample_sql,
    "top_hosts": stats.top_hosts_sql,
}


def queries() -> dict[str, Callable]:
    """Registry of every implemented pipeline.

    Ordered oracled-first: the driver's correctness snapshot covers the
    first 50 entries, so queries with a DuckDB oracle (exact rows+schema+
    hash compare) are listed before rows-only ones.  The partition is
    computed from the oracle tables so it can never drift as queries are
    added."""
    reg = _queries_registry()
    oracled = set(_INTERLEAVED_ORACLES) | set(_TABLE_ORACLES) | {"semdedup_keep"}
    out = {k: v for k, v in reg.items() if k in oracled}
    out.update({k: v for k, v in reg.items() if k not in oracled})
    return out


def _queries_registry() -> dict[str, Callable]:
    return {
        "flatten_spans": q_flatten_spans,
        "doc_stats": q_doc_stats,
        "kind_rollup": q_kind_rollup,
        "span_dedup": q_span_dedup,
        "tile_assign": q_tile_assign,
        "tile_rollup": q_tile_rollup,
        "tile_host_kmv": q_tile_host_kmv,          # KMV distinct sketch (exact oracle)
        "tile_host_hll": q_tile_host_hll,          # HLL register sketch (exact oracle)
        "tile_vectorize": q_tile_vectorize,
        "tile_pyramid": q_tile_pyramid,
        "tile_neighbor_density": q_tile_neighbor_density,
        "tile_compact": q_tile_compact,         # H3-compact covering (exact oracle)
        "tile_outline": q_tile_outline,         # raster→vector boundary (exact oracle)
        "tile_zorder": q_tile_zorder,           # Morton locality key (exact oracle)
        "tile_polygonize": q_tile_polygonize,   # boundary→closed rings (rows-only)
        "tile_rasterize": q_tile_rasterize,     # vector→raster (exact oracle)
        "tile_share": q_tile_share,             # pyramid parent-share join
        "range_join": q_range_join,             # big×big spatial range join
        "doc_trajectory": q_doc_trajectory,     # per-doc cell path (map-only)
        "pip_media_outside_host": q_pip_media_outside_host,  # spatial anti-join
        "tile_zonal_stats": q_tile_zonal_stats,  # zonal statistics
        "host_topk_urls": q_host_topk_urls,     # top-k per group window
        "inverted_index": q_inverted_index,     # token→postings index build
        "doc_chunk": q_doc_chunk,               # sliding-window chunking
        "redirect_chain": q_redirect_chain,
        "landing": q_landing,
        "landing_validated": q_landing_validated,
        "host_rollup": q_host_rollup,
        "cookie_events": q_cookie_events,
        "cookie_asof": q_cookie_asof,
        "knn_referrer": q_knn_referrer,
        "pip_media_in_host": q_pip_media_in_host,
        "host_boxes": q_host_boxes,
        "tile_topk_hosts": q_tile_topk_hosts,    # top-k hosts per tile
        "trajectory_od": q_trajectory_od,        # OD flow matrix
        "tile_hhi": q_tile_hhi,                  # host concentration per tile
        "tile_morans": q_tile_morans,            # spatial autocorrelation
        "host_assortativity": q_host_assortativity,  # degree correlation
        "host_octagon": q_host_octagon,          # 8-DOP boundary
        "nn_media_host": q_nn_media_host,        # nearest-boundary join
        "boundary_overlap": q_boundary_overlap,  # box-overlap self-join
        "grid_dbscan": q_grid_dbscan,            # density clustering
        # non-SQL-expressible (ordered consume-once cascade; pytest-verified
        # against an independent in-process implementation):
        "edges": q_edges,
        "edges_evidence": q_edges_evidence,  # §2.10 debug column — rows-only
        "tree_stats": q_tree_stats,
        "host_edges": q_host_edges,
        "graft_edges": q_graft_edges,  # full SQL oracle (recursive chain CTE)
        "host_tree_json": q_host_tree_json,  # S3 render sink — rows-only
        "host_tree_d3": q_host_tree_d3,  # S3 reference-format d3js — golden pytest
        "har_edges": q_har_edges,            # S1 real-HAR source — rows-only
        # training-data pipeline operators (documents / embeddings tables)
        "doc_tokens": q_doc_tokens,
        "doc_quality": q_doc_quality,
        "doc_langid": q_doc_langid,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_tfidf_top": q_doc_tfidf_top,          # tf/df ranking (exact oracle)
        "doc_normalize": q_doc_normalize,          # NFC/case/ws canonical form
        "doc_decontam": q_doc_decontam,          # eval-leakage n-gram guard
        "doc_pii": q_doc_pii,                    # PII scan counts
        "doc_dup_spans": q_doc_dup_spans,        # duplicate n-gram spans (Lee et al.)
        "doc_repetition": q_doc_repetition,      # Gopher repetition signals
        "doc_compress_ratio": q_doc_compress_ratio,  # zlib signal — rows-only
        "doc_mix": q_doc_mix,                    # weighted per-source mixing
        "doc_sample_stratified": q_doc_sample_stratified,  # per-(source,lang) top-k
        "doc_split": q_doc_split,                # train/val/test holdout split
        "doc_pack": q_doc_pack,                  # token-budget window packing
        "doc_jaccard_pairs": q_doc_jaccard_pairs,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_minhash_pairs": q_doc_minhash_pairs,  # approximate — rows-only
        "doc_simhash": q_doc_simhash,              # blake2-based — rows-only
        "doc_filter": q_doc_filter,
        "doc_len_histogram": q_doc_len_histogram,
        "doc_len_quantiles": q_doc_len_quantiles,
        "doc_lm_score": q_doc_lm_score,
        "doc_bm25": q_doc_bm25,                 # integer BM25 vs fixed query
        "ngram_topk": q_ngram_topk,
        "dedup_clusters": q_dedup_clusters,
        "corpus_keep": q_corpus_keep,
        "corpus_keep_lsh": q_corpus_keep_lsh,      # approximate — rows-only
        "embed_neardup": q_embed_neardup,
        "embed_neardup_lsh": q_embed_neardup_lsh,  # approximate — rows-only
        "ann_topk": q_ann_topk,
        "ann_topk_ivf": q_ann_topk_ivf,            # approximate — rows-only
        "knn_graph": q_knn_graph,                  # float-rank ties — rows-only
        "knn_graph_ivf": q_knn_graph_ivf,          # IVF scale path — rows-only
        "semdedup_keep": q_semdedup_keep,          # SemDeDup verdict (exact oracle)
        # web-artifact metadata (M13/M28/M29/M30/D4 parity ops)
        "span_hhhash": q_span_hhhash,
        "doc_domhash": q_doc_domhash,
        "host_tld": q_host_tld,
        "host_link_graph": q_host_link_graph,
        "host_rank": q_host_rank,             # iterative link-mass (3 iters)
        "host_components": q_host_components,  # min-label CC (fixpoint)
        "host_cooccur": q_host_cooccur,       # domain co-citation graph
        "host_triangles": q_host_triangles,   # degree-ordered triangle count
        "host_clustering": q_host_clustering,  # clustering coeff (exact ints)
        "host_reciprocity": q_host_reciprocity,  # mutual-link counts
        "host_kcore": q_host_kcore,           # core decomposition — rows-only
        "host_bridges": q_host_bridges,       # cut edges (Tarjan) — rows-only
        "span_identifiers": q_span_identifiers,
        "cookies_never_sent": q_cookies_never_sent,
        "cookies_locally_created": q_cookies_locally_created,  # D4 jar sidecar
        # M12 POST decode, M26 security details, M11 user agent, S2/M18 sidecars
        "posted_data": q_posted_data,
        "span_security": q_span_security,
        "doc_user_agent": q_doc_user_agent,
        "doc_sidecars": q_doc_sidecars,
        "span_resource_hashes": q_span_resource_hashes,  # A4 per-node hashes
        "rendered_urls": q_rendered_urls,                # M33 rendered merge
        "rendered_urls_canonical": q_rendered_urls_canonical,  # M31 sanitize chain
        "embedded_blobs": q_embedded_blobs,
        "urls_in_doc": q_urls_in_doc,
        "capture_stats": q_capture_stats,
        "doc_durations": q_doc_durations,
        "doc_sample": q_doc_sample,
        "top_hosts": q_top_hosts,
        # broadcast hash join (small-side join pattern, no shuffle)
        "orders_by_nation": q_orders_by_nation,
        "revenue_by_month": q_revenue_by_month,  # shuffle hash join (big x big)
        # event-stream operators (windowed / sessionize / as-of / JSON decode)
        "event_sessions": q_event_sessions,
        "event_transitions": q_event_transitions,
        "event_running_total": q_event_running_total,  # ordered prefix window
        "event_window_sliding": q_event_window_sliding,
        "event_window_distinct": q_event_window_distinct,  # exact distinct users
        "event_burst_windows": q_event_burst_windows,      # burst detection
        "event_topk_users": q_event_topk_users,            # spend leaderboard
        "event_rfm": q_event_rfm,                          # RFM segmentation
        "event_session_histogram": q_event_session_histogram,  # composition
        "doc_term_cooccur": q_doc_term_cooccur,            # PMI components
        "event_window_agg": q_event_window_agg,
        "event_asof": q_event_asof,
        "event_props_rollup": q_event_props_rollup,
        "event_funnel": q_event_funnel,
        "event_retention": q_event_retention,
        # multimodal plumbing (decode stage stubbed — see stages/media.py)
        "media_features": q_media_features,
        "media_frames": q_media_frames,
        "media_payloads": q_media_payloads,        # binary columns — rows-only
        "media_dedup": q_media_dedup,              # payload content dedup — rows-only
        "media_resize": q_media_resize,            # resize dims/bytes (exact oracle)
    }


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Oracle SQL strings for the driver (sf0.01).  Synthesizes the
    interleaved input if missing so the paths inside the SQL resolve
    regardless of evaluation order."""
    path = ensure_interleaved(sf_dir)
    out = {name: make(path) for name, make in _INTERLEAVED_ORACLES.items()}
    out.update({name: make(path) for name, make in _TABLE_ORACLES.items()})
    # semdedup's oracle trains the same centroids the engine does, from the
    # driver table itself (pure numpy — no Ray), and inlines them as SQL
    import os as _os

    out["semdedup_keep"] = embed.semdedup_keep_sql(
        _os.path.join(sf_dir, "embeddings.parquet"))
    return out
