#!/usr/bin/env python
"""Production driver for the corpus-curation pipeline — the shape you'd run
via ``ray job submit -- python jobs/run_corpus.py --input <dir> --out <dir>``
on a multi-node cluster.

Two phases, both resumable:

1. **Global small sides** (exact-dup map + near-dup roots) computed ONCE
   over the whole corpus and committed atomically to ``<out>/_maps.json``
   with the code version — a rerun reuses them (the verdict maps must be
   global; per-partition dedup would miss cross-partition duplicates).
2. **Verdict labeling** over hash-range partitions of the corpus
   (``crc32(doc_id) % n_parts``), one checkpointed parquet partition each
   (har2tree_ray.state.checkpoint manifests: lineage + metrics).  An
   interrupted run redoes only unfinished ranges; the maps broadcast into
   every partition's tasks via ``ray.put``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/graft_corpus_out")
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--code-version", default="corpus-v1")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        import pyarrow as pa

        import ray.data as rd

        from har2tree_ray.pipelines import corpus
        from har2tree_ray.state import checkpoint as ck

        docs_path = os.path.join(args.input, "documents.parquet")
        os.makedirs(args.out, exist_ok=True)
        t0 = time.perf_counter()

        # ---- phase 1: global small sides (cached, atomic commit) ----
        maps_path = os.path.join(args.out, "_maps.json")
        maps = None
        if os.path.exists(maps_path):
            try:
                loaded = json.load(open(maps_path))
                if loaded.get("code_version") == args.code_version:
                    maps = (dict(loaded["dup_pairs"]),
                            dict(loaded["root_pairs"]))
            except (json.JSONDecodeError, KeyError, TypeError):
                maps = None
        maps_reused = maps is not None
        if maps is None:
            docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
            dup_map, root_min = corpus.corpus_small_sides(docs)
            tmp = maps_path + ".tmp"
            json.dump({"code_version": args.code_version,
                       "dup_pairs": [[k, v] for k, v in dup_map.items()],
                       "root_pairs": [[k, v] for k, v in root_min.items()]},
                      open(tmp, "w"))
            os.replace(tmp, maps_path)  # commit point
            maps = (dup_map, root_min)

        # ---- phase 2: checkpointed per-range labeling ----
        n = args.parts
        parts = [ck.Partition(part_id=f"{i:05d}",
                              inputs=[f"hash_range:{i}/{n}", docs_path])
                 for i in range(n)]

        def make(inputs: list[str]):
            i, nn = map(int, inputs[0].split(":")[1].split("/"))
            ds = rd.read_parquet(inputs[1], columns=["doc_id", "text"])

            def keep_range(t: pa.Table) -> pa.Table:
                mask = [zlib.crc32(str(d).encode()) % nn == i
                        for d in t["doc_id"].to_pylist()]
                return t.filter(pa.array(mask))

            part = ds.map_batches(keep_range, batch_format="pyarrow")
            return corpus.corpus_keep(part, small_sides=maps)

        result = ck.run_checkpointed(args.out, parts, make,
                                     code_version=args.code_version)
        wall = time.perf_counter() - t0
        print(json.dumps({
            "partitions_run": len(result["done"]),
            "partitions_skipped": len(result["skipped"]),
            "rows_written": result["rows"],
            "maps_reused": maps_reused,
            "n_dup_contents": len(maps[0]),
            "n_near_dup_docs": len(maps[1]),
            "wall_s": round(wall, 2),
            "out": args.out,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
