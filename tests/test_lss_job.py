"""End-to-end test of the resumable LSS statistics suite job."""

import json
import os

import pandas as pd


def test_lss_suite_runs_and_resumes(tmp_path):
    from jobs.lss_stats_job import LSS_STATS, run_suite
    from spatialjoincountovershells_ray import queries

    out = str(tmp_path / "lss")
    s1 = run_suite("/root/testdata/sf0.001", out)
    assert set(s1["stats"]) == set(LSS_STATS)
    assert all(not v["skipped"] for v in s1["stats"].values())
    assert all(v["rows"] > 0 for v in s1["stats"].values())
    assert os.path.exists(os.path.join(out, "summary.json"))

    # resume: every unit skips, rows identical
    s2 = run_suite("/root/testdata/sf0.001", out)
    assert all(v["skipped"] for v in s2["stats"].values())
    assert {k: v["rows"] for k, v in s2["stats"].items()} == {
        k: v["rows"] for k, v in s1["stats"].items()
    }

    # one spot-check: the written pair_correlation parquet equals the
    # direct pipeline result
    import pyarrow.parquet as pq

    d = os.path.join(out, "stats", "shard=pair_correlation")
    files = [os.path.join(d, f) for f in os.listdir(d)]
    written = (
        pq.read_table(files).to_pandas().sort_values("shell").reset_index(drop=True)
    )
    direct = (
        queries.REGISTRY["pair_correlation"]
        .fn("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("shell")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(written[direct.columns], direct)
