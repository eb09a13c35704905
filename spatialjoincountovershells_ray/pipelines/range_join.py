"""Range join: emit (halo_id, particle_id) pairs with d2 < r^2.

The id-returning distance join surface of the reference
(``RangeSearch`` + ResultBuffer, reference
src/objects/ArraySTR/RangeSearch.c:11-52, include/scheme.h:15-18),
expressed as the same broadcast/shuffle plans as the shell count but
emitting join rows instead of histograms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE, GridSpec, RadiusLadder, default_pool
from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table
from spatialjoincountovershells_ray.stages.join_kernels import (
    BroadcastRangeJoin,
    run_broadcast_kernel,
)


def range_join(
    halos: "ray.data.Dataset | pa.Table",
    particles: "ray.data.Dataset",
    radius: float,
    *,
    mode: str = "broadcast",
    grid: GridSpec | None = None,
    box: float = BOX_SIZE,
    dtype=np.float64,
    batch_size: int = 8192,
    concurrency=None,
    sort: bool = True,
    auto_broadcast_bytes: float = 2 * 1024**3,
) -> "ray.data.Dataset":
    ladder = RadiusLadder(radii=np.array([radius]), dtype=np.dtype(dtype))
    grid = grid or GridSpec.for_radius(radius, box=box)

    if mode == "auto":
        # same cost model as shell_count(mode='auto'): broadcast iff the
        # replicated halo index fits the per-worker budget
        n = len(halos) if isinstance(halos, pa.Table) else halos.count()
        cover = 0.6 * (2.0 * radius / grid.L + 1.0) ** 3
        bytes_per_replica = 3 * np.dtype(dtype).itemsize + 16
        mode = "broadcast" if n * cover * bytes_per_replica <= auto_broadcast_bytes else "shuffle"

    if mode == "shuffle":
        # no broadcastable-query-side assumption: both sides are tagged
        # with cell keys (halos ball-cover replicated) and co-partitioned
        # by the explicit hash-bucket exchange; each bucket emits its id
        # pairs directly (stages/exchange.py:_reduce_bucket_pairs)
        from spatialjoincountovershells_ray.stages.exchange import (
            bucketed_pair_join,
            tag_for_cell_exchange,
        )

        if isinstance(halos, pa.Table):
            halos = ray.data.from_arrow(halos)
        both = tag_for_cell_exchange(halos, particles, radius, grid, np.dtype(dtype))
        pairs = bucketed_pair_join(both, radius, np.dtype(dtype), box)
        return pairs.sort(["halo_id", "particle_id"]) if sort else pairs
    if mode != "broadcast":
        raise ValueError(f"unknown mode {mode!r}")
    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    hids = halos_tbl.column("halo_id").to_numpy()
    hxyz = np.stack(
        [halos_tbl.column(c).to_numpy().astype(dtype, copy=False) for c in "xyz"], axis=1
    )
    # remote build: probe tasks block on the ref, overlapping the build
    # with the particle read/extract (same rationale as shell_count)
    from spatialjoincountovershells_ray.pipelines.shell_count import _build_index

    index_ref = _build_index.remote(hids, hxyz, radius, grid, box)
    if concurrency is None:
        # task mode + per-worker kernel cache (see run_broadcast_kernel)
        pairs = particles.map_batches(
            run_broadcast_kernel,
            fn_kwargs={"cls": BroadcastRangeJoin, "ref_list": [index_ref], "ladder": ladder},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    else:
        pairs = particles.map_batches(
            BroadcastRangeJoin,
            fn_constructor_kwargs={"index_ref": [index_ref], "ladder": ladder},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return pairs.sort(["halo_id", "particle_id"]) if sort else pairs
