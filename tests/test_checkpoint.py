"""Checkpoint/resume: interrupted runs redo only unfinished partitions;
manifests carry lineage + metrics; code changes invalidate cleanly."""

from __future__ import annotations

import json
import os

import pytest

from har2tree_ray.state import checkpoint as ck
from har2tree_ray.synth import ensure_interleaved

SF = "/root/testdata/sf0.001"


def _input_files():
    d = ensure_interleaved(SF)
    return [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]


def _make(files):
    import ray.data as rd

    from har2tree_ray.stages.normalize import flat_spans

    return flat_spans(rd.read_parquet(files), drop_text=True)


def test_resume_skips_completed(tmp_path):
    out = str(tmp_path / "out")
    parts = ck.plan_partitions(_input_files(), files_per_part=1)
    assert len(parts) >= 1

    # first run: fail after the first partition (simulated crash)
    calls = {"n": 0}

    def flaky(files):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("crash")
        return _make(files)

    if len(parts) > 1:
        with pytest.raises(RuntimeError):
            ck.run_checkpointed(out, parts, flaky, code_version="v1")
    else:
        ck.run_checkpointed(out, parts, flaky, code_version="v1")
    done = ck.completed_partitions(out, parts, "v1")
    assert parts[0].part_id in done

    # resume: completed partition skipped, rest runs
    r = ck.run_checkpointed(out, parts, _make, code_version="v1")
    assert parts[0].part_id in r["skipped"]
    assert set(r["done"]) | set(r["skipped"]) == {p.part_id for p in parts}

    # manifests carry lineage + metrics
    m = ck.load_manifest(out, parts[0].part_id)
    assert m["inputs"] == parts[0].inputs
    assert m["n_rows"] > 0 and m["wall_s"] >= 0

    # a fully-resumed run is a no-op
    r2 = ck.run_checkpointed(out, parts, _make, code_version="v1")
    assert not r2["done"]

    # version bump invalidates everything
    r3 = ck.run_checkpointed(out, parts, _make, code_version="v2")
    assert not r3["skipped"]

    # output row count equals a direct run
    import ray.data as rd

    written = rd.read_parquet([ck._partition_dir(out, p.part_id) for p in parts]).count()
    direct = _make(_input_files()).count()
    assert written == direct


def test_manifest_commit_is_atomic(tmp_path):
    out = str(tmp_path / "out")
    parts = ck.plan_partitions(_input_files(), files_per_part=100)[:1]
    ck.run_checkpointed(out, parts, _make, code_version="v1")
    # corrupt manifest → treated as incomplete, partition re-runs
    path = ck._manifest_path(out, parts[0].part_id)
    with open(path, "w") as f:
        f.write("{not json")
    assert ck.load_manifest(out, parts[0].part_id) is None
    r = ck.run_checkpointed(out, parts, _make, code_version="v1")
    assert r["done"] == [parts[0].part_id]
    assert json.load(open(path))["n_rows"] > 0


def test_rollup_from_assign_matches_source_rollup():
    """The resume-path rollup (over checkpointed assign output with hostname
    riding along) equals the from-source rollup."""
    import pandas as pd

    from har2tree_ray.pipelines.tiling import (tile_assign, tile_rollup,
                                               tile_rollup_from_assign)
    from har2tree_ray.sources.interleaved import read_interleaved
    from har2tree_ray.stages.normalize import explode_spans

    sf = "/root/testdata/sf0.001"
    cols = ["doc_id", "offset", "lat", "lng", "hostname"]
    assign = tile_assign(explode_spans(read_interleaved(sf), cols),
                         keep=("hostname",))
    got = tile_rollup_from_assign(assign).to_pandas()
    want = tile_rollup(
        explode_spans(read_interleaved(sf), ["doc_id", "hostname", "lat", "lng"])
    ).to_pandas()
    key = "cell_id"
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[want.columns],
        want.sort_values(key).reset_index(drop=True))


def test_corpus_job_resumes_and_matches_query(tmp_path):
    """run_corpus on a FRAGMENTED corpus (the 100 TB layout): fresh run
    writes one partition per fragment, rerun skips them and reuses the
    global maps; pointing --input at a different corpus invalidates the
    maps; the partitioned output equals corpus_keep."""
    import json
    import subprocess
    import sys

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from har2tree_ray import queries as q
    from tests.oracle_utils import to_pandas

    # re-shard the driver's documents table into 4 fragments under a
    # directory named documents.parquet (multi-fragment corpus layout)
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    frag_dir = tmp_path / "frag_input" / "documents.parquet"
    frag_dir.mkdir(parents=True)
    n = src.num_rows
    for i in range(4):
        pq.write_table(src.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4),
                       str(frag_dir / f"frag-{i:02d}.parquet"))

    out = str(tmp_path / "corpus_out")
    cmd = [sys.executable, "jobs/run_corpus.py", "--input",
           str(tmp_path / "frag_input"), "--out", out]
    r1 = json.loads(subprocess.run(cmd, capture_output=True, text=True,
                                   check=True).stdout.strip().splitlines()[-1])
    assert r1["partitions_run"] == 4 and not r1["maps_reused"]
    r2 = json.loads(subprocess.run(cmd, capture_output=True, text=True,
                                   check=True).stdout.strip().splitlines()[-1])
    assert r2["partitions_skipped"] == 4 and r2["maps_reused"]

    # manifests carry fragment lineage
    m = json.load(open(os.path.join(out, "_ckpt", "partition-00000.json")))
    assert m["inputs"] == [str(frag_dir / "frag-00.parquet")]

    got = duckdb.connect().execute(
        f"SELECT doc_id, keep, reason FROM read_parquet('{out}/partition=*/*.parquet')"
    ).df().sort_values("doc_id").reset_index(drop=True)
    want = to_pandas(q.queries()["corpus_keep"]("/root/testdata/sf0.001"))
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # different input corpus with the same --out: stale maps must NOT be
    # reused (keyed on the input fingerprint, not just code_version)
    cmd3 = [sys.executable, "jobs/run_corpus.py", "--input",
            "/root/testdata/sf0.001", "--out", out]
    r3 = json.loads(subprocess.run(cmd3, capture_output=True, text=True,
                                   check=True).stdout.strip().splitlines()[-1])
    assert not r3["maps_reused"] and r3["partitions_run"] == 1
