"""kNN under the torus metric: k nearest particles per halo.

No reference counterpart (SURVEY.md §2.6) — a new capability of the
generic engine. Plan: an actor pool scans particle batches against the
broadcast halo table emitting per-batch partial top-k candidate rows
(halo_id, particle_id, d2); a groupby('halo_id') reduction selects the
global top k ordered by (d2, particle_id). The partial top-k bounds the
shuffle to H x k rows per input batch regardless of particle count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE
from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table
from spatialjoincountovershells_ray.stages.join_kernels import BroadcastKnnCandidates


def knn(
    halos: "ray.data.Dataset | pa.Table",
    particles: "ray.data.Dataset",
    k: int,
    *,
    box: float = BOX_SIZE,
    dtype=np.float64,
    batch_size: int = 8192,
    concurrency=None,
    include_d2: bool = False,
    sort: bool = True,
) -> "ray.data.Dataset":
    """-> halo_id:int64, particle_id:int64, rnk:int64 (1-based), [d2]."""
    if concurrency is None:
        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4))))
    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    payload = {
        "halo_ids": halos_tbl.column("halo_id").to_numpy(),
        "xyz": np.stack(
            [halos_tbl.column(c).to_numpy().astype(dtype, copy=False) for c in "xyz"],
            axis=1,
        ),
    }
    ref = ray.put(payload)
    cands = particles.map_batches(
        BroadcastKnnCandidates,
        fn_constructor_kwargs={"halos_ref": [ref], "k": k, "box": box, "dtype": dtype},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def select_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["d2", "particle_id"], kind="mergesort").head(k)
        g = g.assign(rnk=np.arange(1, len(g) + 1, dtype=np.int64))
        cols = ["halo_id", "particle_id", "rnk"] + (["d2"] if include_d2 else [])
        return g[cols]

    out = cands.groupby("halo_id").map_groups(select_topk, batch_format="pandas")
    return out.sort(["halo_id", "rnk"]) if sort else out
