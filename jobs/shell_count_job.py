"""Resumable shell-count job — the `ray job submit` entrypoint.

Processes particle document shards one checkpoint unit at a time against
a halo document table: per shard, extract -> grid join -> partial
histograms written to ``<out>/partials/shard=<i>/`` with a manifest line
(lineage: shard path fingerprint, rows, wall time). A re-run skips
finished shards (state.checkpoint), then the final merge folds every
partial into ``<out>/result/`` — the reference's sequential multi-file
accumulation (A2, reference src/astr_rcount/main.c:135-146) made
restartable. Per-shard throughput metrics print as JSON lines.

Usage (local test):
    python jobs/shell_count_job.py --halo-docs H.parquet \
        --particle-shards p0.parquet p1.parquet --out /tmp/run1 \
        --radius 5:160:8

On a cluster:
    ray job submit --working-dir . -- python jobs/shell_count_job.py ...
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
    ap.add_argument("--halo-docs", required=True)
    ap.add_argument("--particle-shards", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--radius", default="5:160:8", help="rmin:rmax:nrads")
    ap.add_argument("--mode", default="broadcast", choices=["broadcast"])
    ap.add_argument("--text-render", action="store_true", help="also write the reference-format text output")
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"), ignore_reinit_error=True)

    from spatialjoincountovershells_ray.config import RadiusLadder
    from spatialjoincountovershells_ray.pipelines import shell_count as sc
    from spatialjoincountovershells_ray.stages import extract
    from spatialjoincountovershells_ray.state.checkpoint import CheckpointedRun

    ladder = RadiusLadder.parse(args.radius)
    halos = (
        ray.data.read_parquet(args.halo_docs)
        .map_batches(
            lambda b: extract.extract_halos(b, dtype=ladder.dtype),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .select_columns(["halo_id", "x", "y", "z"])
    )
    halos_tbl = sc.dataset_to_table(halos)
    # build the query index ONCE for the whole job (reference A2 template)
    from spatialjoincountovershells_ray.config import GridSpec
    from spatialjoincountovershells_ray.stages.join_kernels import HaloIndex

    grid = GridSpec.for_radius(ladder.rmax, target_cells_per_r=3.0)
    hidx = HaloIndex.build(
        halos_tbl.column("halo_id").to_numpy(),
        np.stack([halos_tbl.column(c).to_numpy() for c in "xyz"], axis=1).astype(ladder.dtype),
        ladder.rmax,
        grid,
    )

    run = CheckpointedRun(os.path.join(args.out, "partials"))
    t_job = time.time()
    for i, shard in enumerate(args.particle_shards):
        sid = f"{i:05d}"

        def make(shard=shard):
            parts = ray.data.read_parquet(shard).map_batches(
                lambda b: extract.extract_particles(b, dtype=ladder.dtype),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).select_columns(["particle_id", "x", "y", "z"])
            # per-shard PARTIAL histograms (no zero rows; merged at the end)
            return sc.shell_count(
                None, parts, ladder, halo_index=hidx, sort=False, include_zero_halos=False
            )

        res = run.run_shard(sid, make, fingerprint=shard)
        print(
            json.dumps(
                {
                    "shard": sid,
                    "path": shard,
                    "rows": res.rows,
                    "sec": round(res.seconds, 3),
                    "skipped": res.skipped,
                }
            ),
            flush=True,
        )

    # final merge over all partials (associative sum + dense zeros)
    partials = run.read_all()
    zeros_cols = {"halo_id": halos_tbl.column("halo_id")}
    z = pa.array(np.zeros(halos_tbl.num_rows, dtype=np.int64))
    for i in range(ladder.nrads):
        zeros_cols[f"s{i}"] = z
    final = sc._merge_partials_tree(partials, pa.table(zeros_cols), ladder.nrads, sort=True)
    result_dir = os.path.join(args.out, "result")
    final.write_parquet(result_dir)
    tbl = sc.dataset_to_table(final)
    if args.text_render:
        from spatialjoincountovershells_ray.sources.writers import write_result_text

        counts = np.stack([tbl.column(f"s{i}").to_numpy() for i in range(ladder.nrads)], axis=1)
        write_result_text(
            os.path.join(args.out, "result.txt"), tbl.column("halo_id").to_numpy(), counts, ladder
        )
    print(
        json.dumps(
            {
                "done": True,
                "halos": tbl.num_rows,
                "total_sec": round(time.time() - t_job, 3),
                "result": result_dir,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
