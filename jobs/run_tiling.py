#!/usr/bin/env python
"""Production driver for the flagship tiling pipeline — the shape you'd run
via ``ray job submit -- python jobs/run_tiling.py --input <dir> --out <dir>``
on a multi-node cluster (north rule).  In this sandbox it runs against the
synthesized interleaved table in local mode.

Resumable: input parquet fragments are planned into partitions; each
partition streams read → flatten/normalize → tile assign → write, and
commits a per-partition manifest with lineage (exact input files) + metrics
(rows, wall, rows/sec).  Re-running after an interruption skips completed
partitions (har2tree_ray.state.checkpoint).  The cross-partition tile
ROLLUP (a global aggregate) runs after all partitions are green, reading
the checkpointed output — so the expensive per-span work is never redone.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/graft_tiling_out")
    ap.add_argument("--files-per-part", type=int, default=2)
    ap.add_argument("--code-version", default="tiling-v2")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        import ray.data as rd

        from har2tree_ray.pipelines.tiling import (DEFAULT_RES, tile_assign,
                                                   tile_rollup_from_assign)
        from har2tree_ray.stages.normalize import flat_spans
        from har2tree_ray.state import checkpoint as ck
        from har2tree_ray.synth import ensure_interleaved

        in_dir = ensure_interleaved(args.input)
        files = [os.path.join(in_dir, f) for f in sorted(os.listdir(in_dir))
                 if f.endswith(".parquet")]
        parts = ck.plan_partitions(files, files_per_part=args.files_per_part)

        def make(inputs: list[str]):
            # hostname rides along so the rollup can run off this output
            return tile_assign(
                flat_spans(rd.read_parquet(inputs), drop_text=True),
                DEFAULT_RES, keep=("hostname",))

        t0 = time.perf_counter()
        result = ck.run_checkpointed(args.out, parts, make,
                                     code_version=args.code_version)
        # global rollup over the CHECKPOINTED per-partition output — on a
        # resumed run the expensive flatten/encode work is never redone
        part_dirs = [os.path.join(args.out, d) for d in sorted(os.listdir(args.out))
                     if d.startswith("partition=")]
        tiles = tile_rollup_from_assign(rd.read_parquet(part_dirs))
        n_tiles = tiles.count()
        wall = time.perf_counter() - t0
        print(json.dumps({
            "partitions_run": len(result["done"]),
            "partitions_skipped": len(result["skipped"]),
            "rows_written": result["rows"],
            "n_tiles": n_tiles,
            "wall_s": round(wall, 2),
            "out": args.out,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
