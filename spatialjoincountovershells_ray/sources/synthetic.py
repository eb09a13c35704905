"""Deterministic halo/particle tables derived from the TPC-H-ish testdata.

The engine's native input is the interleaved-document table (see
``sources.documents``); for the driver's DuckDB correctness gate we also
derive the geometry DIRECTLY from key columns of the shared parquet
views, using only int64 multiply-add-modulo + float64 division — the
exact arithmetic `oracle_sql()` re-states in SQL, so both sides see
bit-identical float64 coordinates (functions.hashing.derive_coord).

halos      <- customer.c_custkey        (halo_id = c_custkey)
particles  <- lineitem (l_orderkey, l_linenumber)
              (particle_id = l_orderkey * 8 + l_linenumber)

Column pruning happens at the parquet read (only the key columns leave
storage).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE
from spatialjoincountovershells_ray.functions.hashing import derive_coord, derive_coord_sql


def _derive_cols(key: np.ndarray, box: float) -> dict[str, np.ndarray]:
    return {
        "x": derive_coord(key, 0, box),
        "y": derive_coord(key, 1, box),
        "z": derive_coord(key, 2, box),
    }


def halos_dataset(sf_dir: str, box: float = BOX_SIZE) -> "ray.data.Dataset":
    """halo_id:int64, x/y/z:float64 derived from customer keys."""

    def derive(batch: pa.Table) -> pa.Table:
        key = batch.column("c_custkey").to_numpy()
        cols = _derive_cols(key, box)
        return pa.table({"halo_id": key, **cols})

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def particles_dataset(
    sf_dir: str, box: float = BOX_SIZE, sharded: bool = True, nshards: int = 32
) -> "ray.data.Dataset":
    """particle_id:int64, x/y/z:float64 derived from lineitem keys.

    ``sharded`` (the round-4 default) reads a pre-split multi-file copy
    of the key columns (built once under /tmp): a single parquet file is
    one serial read task in Ray — and map fusion pulls the derive+kernel
    stages INTO that one task, Amdahl-capping every downstream stage
    (measured: the sf0.1 headline drops 4.25 s -> ~2.0 s on the sharded
    copy). The 100 TB deployment reads thousands of files, so every
    query should too; ``sharded=False`` keeps the monolithic testdata
    read for diagnostics.
    """

    def derive(batch: pa.Table) -> pa.Table:
        pid = (
            batch.column("l_orderkey").to_numpy() * np.int64(8)
            + batch.column("l_linenumber").to_numpy().astype(np.int64)
        )
        cols = _derive_cols(pid, box)
        return pa.table({"particle_id": pid, **cols})

    if sharded:
        path = _sharded_lineitem_keys(sf_dir, nshards)
        # pin one block per shard: Ray's size-based read planning may
        # otherwise bundle/split small files, and downstream per-block
        # task counts (wave packing across CPU levels) depend on it
        ds = ray.data.read_parquet(path, override_num_blocks=nshards)
    else:
        ds = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
        )
    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def _sharded_lineitem_keys(sf_dir: str, nshards: int) -> str:
    """nshards-file copy of lineitem's key columns through the
    manifest-gated verify-and-skip contract (sinks.sharded_columns)."""
    from spatialjoincountovershells_ray.sources.sinks import sharded_columns

    return sharded_columns(
        f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_linenumber"], nshards
    )


# --- SQL twins (DuckDB oracle CTEs) ---------------------------------------

HALOS_CTE = (
    "halos AS (SELECT c_custkey AS halo_id, "
    f"{derive_coord_sql('c_custkey', 0)} AS x, "
    f"{derive_coord_sql('c_custkey', 1)} AS y, "
    f"{derive_coord_sql('c_custkey', 2)} AS z FROM customer)"
)

PARTICLES_CTE = (
    "particles AS (SELECT l_orderkey * 8 + l_linenumber AS particle_id, "
    f"{derive_coord_sql('(l_orderkey * 8 + l_linenumber)', 0)} AS x, "
    f"{derive_coord_sql('(l_orderkey * 8 + l_linenumber)', 1)} AS y, "
    f"{derive_coord_sql('(l_orderkey * 8 + l_linenumber)', 2)} AS z FROM lineitem)"
)

# the min-image squared distance between (h.x,h.y,h.z) and (p.x,p.y,p.z) —
# term-for-term the same float64 expression as functions.distance.torus_d2
D2_SQL = (
    "((h.x - p.x) - 1000.0 * floor((h.x - p.x) / 1000.0 + 0.5)) * "
    "((h.x - p.x) - 1000.0 * floor((h.x - p.x) / 1000.0 + 0.5)) + "
    "((h.y - p.y) - 1000.0 * floor((h.y - p.y) / 1000.0 + 0.5)) * "
    "((h.y - p.y) - 1000.0 * floor((h.y - p.y) / 1000.0 + 0.5)) + "
    "((h.z - p.z) - 1000.0 * floor((h.z - p.z) / 1000.0 + 0.5)) * "
    "((h.z - p.z) - 1000.0 * floor((h.z - p.z) / 1000.0 + 0.5))"
)
