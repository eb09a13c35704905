"""Resumable large-scale-structure statistics suite.

One checkpoint unit per statistic over one catalog snapshot: the per-halo
shell histograms plus every whole-catalog estimator the engine computes —
pair correlation (DD/DR/w), halo autocorrelation, jackknife w(r) samples,
marked pair counts, cylindrical (rp, pi) counts, counts-in-cells P(N) and
the FoF multiplicity function. Each unit streams its pipeline into a
partitioned parquet directory under ``<out>/stats/shard=<name>`` with an
atomic rename + manifest record (state.checkpoint.CheckpointedRun), so a
crashed or re-run job skips every finished statistic — the post-processing
suite a simulation snapshot runs once per output time.

The unit fingerprint pins (sf_dir, ladder radii, FoF linking length):
resuming against a different snapshot or ladder is refused by fingerprint
mismatch rather than silently mixing outputs.

Usage:
    python jobs/lss_stats_job.py --sf-dir /root/testdata/sf0.001 --out /tmp/lss
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# every statistic of the suite, in the order a consumer wants them
LSS_STATS = (
    "shell_count",
    "pair_correlation",
    "halo_autocorr",
    "pair_corr_jackknife",
    "weighted_pairs",
    "cylindrical_pairs",
    "counts_in_cells",
    "fof_multiplicity",
)


def run_suite(sf_dir: str, out: str, stats: tuple = LSS_STATS) -> dict:
    from spatialjoincountovershells_ray import queries
    from spatialjoincountovershells_ray.state.checkpoint import CheckpointedRun

    run = CheckpointedRun(os.path.join(out, "stats"))
    fp_base = f"{sf_dir}|ladder={queries.LADDER.radii.tolist()}|fof={queries.FOF_B}"
    results = {}
    for name in stats:
        qdef = queries.REGISTRY[name]
        res = run.run_shard(
            name,
            lambda qdef=qdef: qdef.fn(sf_dir),
            fingerprint=f"{fp_base}|{name}",
        )
        results[name] = {"rows": res.rows, "seconds": round(res.seconds, 3), "skipped": res.skipped}
    summary = {"sf_dir": sf_dir, "out": out, "stats": results}
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    t0 = time.time()
    summary = run_suite(args.sf_dir, args.out)
    summary["total_seconds"] = round(time.time() - t0, 3)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
