"""Per-partition checkpointed output with lineage + metrics (north rule;
SURVEY.md §4 "Checkpoint/resume" row and §7 step 8).

The reference has no persistence at all (everything lives in one process);
at 100 TB a run MUST be resumable, so output is laid out as::

    out_dir/
      partition=<id>/part-*.parquet      one directory per input shard
      _ckpt/partition-<id>.json          manifest: lineage + metrics

A manifest is written atomically (tmp + rename) only after its partition's
parquet is fully written, so a manifest's existence IS the completion marker.
``run_checkpointed`` skips partitions whose manifest matches the current
``code_version`` and input list — an interrupted run redoes only unfinished
shards; changing the code or the inputs invalidates exactly the affected
partitions.

This is driver-side orchestration *around* Ray Data jobs: each partition is
its own streaming ``Dataset.write_parquet`` (blocks never gather on the
driver), and partitions themselves could be farmed to concurrent drivers —
the manifest protocol is what keeps that safe (last-writer-wins rename).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Partition:
    """One resumable unit of work: an input shard (files or a key range)."""

    part_id: str
    inputs: list[str] = field(default_factory=list)


def plan_partitions(input_files: list[str], files_per_part: int = 8) -> list[Partition]:
    """Deterministic partitioning of an input file list (sorted, chunked)."""
    files = sorted(input_files)
    return [
        Partition(part_id=f"{i // files_per_part:05d}",
                  inputs=files[i:i + files_per_part])
        for i in range(0, len(files), files_per_part)
    ]


def _manifest_path(out_dir: str, part_id: str) -> str:
    return os.path.join(out_dir, "_ckpt", f"partition-{part_id}.json")


def _partition_dir(out_dir: str, part_id: str) -> str:
    return os.path.join(out_dir, f"partition={part_id}")


def load_manifest(out_dir: str, part_id: str) -> dict | None:
    try:
        with open(_manifest_path(out_dir, part_id)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def completed_partitions(out_dir: str, partitions: list[Partition],
                         code_version: str) -> set[str]:
    """Partition ids whose manifest is complete AND matches code + inputs."""
    done = set()
    for p in partitions:
        m = load_manifest(out_dir, p.part_id)
        if m and m.get("code_version") == code_version and m.get("inputs") == p.inputs:
            done.add(p.part_id)
    return done


def run_checkpointed(
    out_dir: str,
    partitions: list[Partition],
    make_dataset: Callable[[list[str]], "object"],
    code_version: str = "v1",
) -> dict:
    """Run ``make_dataset(inputs).write_parquet`` per partition, skipping
    completed ones.  Returns {"done": [...], "skipped": [...], "rows": n}.

    Each partition's directory is cleaned before a (re)run so a crash mid-
    write never leaves mixed output; the manifest rename is the commit point.
    """
    os.makedirs(os.path.join(out_dir, "_ckpt"), exist_ok=True)
    done_before = completed_partitions(out_dir, partitions, code_version)
    ran, skipped, total_rows = [], [], 0
    for p in partitions:
        if p.part_id in done_before:
            skipped.append(p.part_id)
            continue
        pdir = _partition_dir(out_dir, p.part_id)
        if os.path.exists(pdir):  # stale partial output from a dead run
            shutil.rmtree(pdir)
        t0 = time.perf_counter()
        make_dataset(p.inputs).write_parquet(pdir)
        # row count from the written footers (metadata only — the pipeline
        # must not re-execute for accounting)
        import pyarrow.parquet as pq

        n_rows = sum(
            pq.ParquetFile(os.path.join(pdir, f)).metadata.num_rows
            for f in os.listdir(pdir) if f.endswith(".parquet")
        )
        wall = time.perf_counter() - t0
        manifest = {
            "partition_id": p.part_id,
            "inputs": p.inputs,                # lineage: exact input fragments
            "output": pdir,
            "n_rows": n_rows,
            "wall_s": round(wall, 3),
            "rows_per_sec": round(n_rows / wall, 1) if wall else None,
            "code_version": code_version,
            "finished_at": time.time(),
        }
        tmp = _manifest_path(out_dir, p.part_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, _manifest_path(out_dir, p.part_id))  # commit point
        ran.append(p.part_id)
        total_rows += n_rows
    return {"done": ran, "skipped": skipped, "rows": total_rows}
