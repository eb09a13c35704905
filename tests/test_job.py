"""End-to-end test of the resumable shell-count job entrypoint."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq

from spatialjoincountovershells_ray.config import RadiusLadder
from spatialjoincountovershells_ray.functions.mt19937 import MT19937, uniform_coords
from spatialjoincountovershells_ray.oracle import shell_count_oracle
from spatialjoincountovershells_ray.sources.documents import (
    halo_documents,
    particle_documents,
    write_documents,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(args, env_cpus="4"):
    env = dict(os.environ, RAY_ADDRESS="local", RAY_GRAFT_CPUS=env_cpus)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "shell_count_job.py"), *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]


def test_job_runs_and_resumes(tmp_path):
    hxyz = uniform_coords(MT19937(1659533), 60).astype(np.float64)
    rng = MT19937(113)
    s1 = uniform_coords(rng, 400).astype(np.float64)
    s2 = uniform_coords(rng, 400).astype(np.float64)
    hdoc = str(tmp_path / "halos.parquet")
    p1 = str(tmp_path / "p1.parquet")
    p2 = str(tmp_path / "p2.parquet")
    write_documents(halo_documents(np.arange(60), hxyz), hdoc)
    write_documents(particle_documents(np.arange(400), s1), p1)
    write_documents(particle_documents(np.arange(400, 800), s2), p2)
    out_dir = str(tmp_path / "run")

    args = [
        "--halo-docs", hdoc, "--particle-shards", p1, p2,
        "--out", out_dir, "--radius", "1:100:8", "--text-render",
    ]
    lines = _run_job(args)
    shards = [l for l in lines if "shard" in l]
    assert len(shards) == 2 and not any(s["skipped"] for s in shards)
    assert lines[-1]["done"] and lines[-1]["halos"] == 60

    # result matches the brute-force oracle over both shards
    res_files = [
        os.path.join(out_dir, "result", f)
        for f in os.listdir(os.path.join(out_dir, "result"))
        if f.endswith(".parquet")
    ]
    import pyarrow as pa

    tbl = pa.concat_tables([pq.read_table(f) for f in res_files]).sort_by("halo_id")
    lad = RadiusLadder.log2_spaced(1, 100, 8)
    oracle = shell_count_oracle(hxyz, np.concatenate([s1, s2]), lad.r2)
    got = np.stack([tbl.column(f"s{i}").to_numpy() for i in range(8)], axis=1)
    np.testing.assert_array_equal(got, oracle.astype(np.int64))

    # text rendering exists and is reference-shaped
    txt = open(os.path.join(out_dir, "result.txt")).read()
    assert txt.startswith("id 0\n") and "Total" in txt

    # resume: second invocation skips both completed shards
    lines2 = _run_job(args)
    shards2 = [l for l in lines2 if "shard" in l]
    assert all(s["skipped"] for s in shards2)
    assert lines2[-1]["halos"] == 60
