#!/usr/bin/env python
"""Benchmark harness for the har2tree_ray engine.

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": "...", "num_cpus": N, "docs_per_sec": ...}

``--scaling`` mode: runs the headline pipeline twice in fresh subprocesses
(num_cpus=8 then num_cpus=32) on the same input and reports both throughputs
plus scaling efficiency (north-rule two-cluster-size criterion, evidenced
in-sandbox — BASELINE.json ``north_rule``).

Ray session ownership: THIS script (and only this script / tests / CLIs)
calls ray.init; the library never does.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Headline = the flagship tiling pipeline (SURVEY §7); the rest cover each
# subsystem: flatten/normalize, shuffle-aggregates, the parser actor pool +
# tree-builder groupby, spatial joins, and the training-data ops.
HEADLINE = "tile_rollup"
BENCH_QUERIES = [
    "flatten_spans",
    "doc_stats",
    "span_dedup",
    "tile_rollup",
    "tile_vectorize",
    "host_rollup",
    "cookie_asof",
    "knn_referrer",
    "pip_media_in_host",
    "edges",
    "tree_stats",
    "graft_edges",
    "doc_tokens",
    "doc_quality",
    "doc_langid",
    "doc_exact_dedup",
    "doc_minhash_pairs",
    "doc_simhash",
    "embed_neardup",
    "ann_topk",
    "event_sessions",
    "event_asof",
    "media_features",
    "span_hhhash",
    "host_tld",
    "host_tree_json",
    "orders_by_nation",
]


def _consume(result) -> int:
    """Stream-consume a Dataset (or accept an in-memory table/frame); return
    row count.  iter_batches keeps execution streaming — no driver
    materialization of the full result."""
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        n = 0
        for b in result.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += b.num_rows
        return n
    return len(result)


def count_docs(sf_dir: str) -> int:
    import ray.data as rd
    from har2tree_ray.synth import ensure_interleaved

    return rd.read_parquet(ensure_interleaved(sf_dir), columns=["doc_id"]).count()


def run_bench(sf_dir: str, num_cpus: int, names: list[str]) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        from har2tree_ray import queries as q
        from har2tree_ray.synth import ensure_interleaved

        ensure_interleaved(sf_dir)  # synthesis cost excluded from timings
        registry = q.queries()
        # warmup: spin up the worker pool + read the input once so timings
        # measure steady-state pipeline throughput, not Ray cold-start
        _consume(registry[HEADLINE](sf_dir))
        timings: dict[str, float] = {}
        rows: dict[str, int] = {}
        for name in names:
            if name not in registry:
                continue
            t0 = time.perf_counter()
            rows[name] = _consume(registry[name](sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        n_docs = count_docs(sf_dir)
        total = round(sum(timings.values()), 3)
        headline_t = timings.get(HEADLINE, total)
        return {
            "metric": "har2tree_ray bench suite wall time",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "rows": rows,
            "sf": os.path.basename(os.path.normpath(sf_dir)),
            "num_cpus": num_cpus,
            "n_docs": n_docs,
            "docs_per_sec": round(n_docs / headline_t, 1) if headline_t else None,
            "headline": HEADLINE,
        }
    finally:
        ray.shutdown()


def _spawn_headline(sf_dir: str, num_cpus: int) -> dict:
    """Run the headline pipeline in a FRESH process at the given parallelism
    (two-cluster-size evidence: each run is its own Ray 'cluster')."""
    env = dict(os.environ, GRAFT_SF_DIR=sf_dir, RAY_GRAFT_CPUS=str(num_cpus))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--headline-only"],
        env=env, capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    r_lo = _spawn_headline(sf_dir, lo)
    r_hi = _spawn_headline(sf_dir, hi)
    thr_lo = r_lo["docs_per_sec"]
    thr_hi = r_hi["docs_per_sec"]
    factor = hi / lo
    eff = round((thr_hi / thr_lo) / factor, 3) if thr_lo else None
    return {
        "metric": "tiling throughput scaling efficiency (N -> 4N CPUs, fresh ray.init each)",
        "value": eff,
        "unit": "efficiency",
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "headline": HEADLINE,
        "runs": {
            f"cpus={lo}": {"sec": r_lo["queries"][HEADLINE], "docs_per_sec": thr_lo},
            f"cpus={hi}": {"sec": r_hi["queries"][HEADLINE], "docs_per_sec": thr_hi},
        },
        "scaling_factor": factor,
        "efficiency": eff,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run headline at 8 then 32 CPUs in fresh processes")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset to run")
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(run_scaling(SF_DIR)))
        return
    names = ([HEADLINE] if args.headline_only
             else args.queries.split(",") if args.queries else BENCH_QUERIES)
    print(json.dumps(run_bench(SF_DIR, NUM_CPUS, names)))


if __name__ == "__main__":
    main()
