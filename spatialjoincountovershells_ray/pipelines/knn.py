"""kNN under the torus metric: k nearest particles per halo.

No reference counterpart (SURVEY.md §2.6) — a new capability of the
generic engine. Plan: a task/actor stage scans particle batches against
the broadcast halo table emitting per-batch top-k candidate rows
(halo_id, particle_id, d2); a log-depth tree of merge tasks selects the
global top k ordered by (d2, particle_id). Per-batch partial top-k
bounds every exchange to H x k rows per input batch; the tree merge is
associative, so the result is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE
from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table
from spatialjoincountovershells_ray.stages.join_kernels import (
    BroadcastKnnCandidates,
    select_topk_rows,
)

_KNN_CACHE: dict[tuple, BroadcastKnnCandidates] = {}


def _run_knn_kernel(batch: pa.Table, ref_list, k, box, dtype_str) -> pa.Table:
    """Task-mode wrapper with per-worker kernel cache (see
    join_kernels.run_broadcast_kernel for why tasks, not actors)."""
    key = (ref_list[0].hex(), k, box, dtype_str)
    kern = _KNN_CACHE.get(key)
    if kern is None:
        _KNN_CACHE.clear()
        kern = BroadcastKnnCandidates(ref_list, k, box, np.dtype(dtype_str))
        _KNN_CACHE[key] = kern
    return kern(batch)


@ray.remote
def _merge_knn_blocks(k: int, include_d2: bool, final: bool, *tables: pa.Table) -> pa.Table:
    t = pa.concat_tables([x for x in tables if x.num_rows], promote_options="none")
    h, p, d, r = select_topk_rows(
        t.column("halo_id").to_numpy(),
        t.column("particle_id").to_numpy(),
        t.column("d2").to_numpy(),
        k,
    )
    cols = {"halo_id": h, "particle_id": p}
    if final:
        cols["rnk"] = r
        if include_d2:
            cols["d2"] = d
    else:
        cols["d2"] = d
    return pa.table(cols)


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
        _run_knn_kernel,
        fn_kwargs={
            "ref_list": [ref],
            "k": k,
            "box": box,
            "dtype_str": np.dtype(dtype).str,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    refs = list(cands.materialize().to_arrow_refs())
    fanin = 8
    while len(refs) > 1:
        last = len(refs) <= fanin
        refs = [
            _merge_knn_blocks.remote(k, include_d2, last, *refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
    final = ray.get(refs[0]) if refs else pa.table(
        {"halo_id": pa.array([], pa.int64()), "particle_id": pa.array([], pa.int64()), "rnk": pa.array([], pa.int64())}
    )
    if refs and "rnk" not in final.schema.names:
        final = ray.get(_merge_knn_blocks.remote(k, include_d2, True, final))
    if sort:
        final = final.sort_by([("halo_id", "ascending"), ("rnk", "ascending")])
    return ray.data.from_arrow(final)
