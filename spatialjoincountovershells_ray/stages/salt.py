"""Hot-cell salting: defeat halo/particle density skew in the shuffle plan.

A cell-keyed groupby sends every row of a hot cell to one reducer; under
clumped data (Fixture C) one group can dwarf the average. Salting splits
a hot cell's PARTICLES across ``R`` sub-keys (deterministic hash of the
particle id) and replicates the cell's HALO replicas to all ``R``
sub-keys — every halo still meets every particle of the cell exactly
once, so the shell-count aggregate is unchanged (it is associative; the
partial+final merge never cared how pairs were grouped). SURVEY.md §7.4.

The salt plan is a per-cell factor R >= 1, computed from a cheap
pre-pass over per-cell particle counts (the counts table is tiny — at
most ncells^3 entries — so it combines driver-side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import GridSpec
from spatialjoincountovershells_ray.functions.cells import cell_index, flatten_cell
from spatialjoincountovershells_ray.functions.hashing import mix64


def cell_histogram(particles: "ray.data.Dataset", grid: GridSpec, dtype=np.float64) -> dict[int, int]:
    """Per-cell particle counts via partial bincount per batch + driver
    combine (no shuffle; the combined map is <= ncells^3 entries)."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = tuple(
            batch.column(c).to_numpy(zero_copy_only=False).astype(dtype, copy=False)
            for c in ("x", "y", "z")
        )
        cell = flatten_cell(
            cell_index(cols[0], grid), cell_index(cols[1], grid), cell_index(cols[2], grid), grid
        )
        u, c = np.unique(cell, return_counts=True)
        return pa.table({"cell": u, "n": c})

    combined: dict[int, int] = {}
    for b in (
        particles.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    ):
        for cell, n in zip(b.column("cell").to_numpy(), b.column("n").to_numpy()):
            combined[int(cell)] = combined.get(int(cell), 0) + int(n)
    return combined


def salt_plan(cell_counts: dict[int, int], target_rows_per_group: int, max_r: int = 64) -> dict[int, int]:
    """R per hot cell (cells at/below target get R=1 and are omitted)."""
    plan = {}
    for cell, n in cell_counts.items():
        r = min(max_r, -(-n // target_rows_per_group))
        if r > 1:
            plan[cell] = r
    return plan


class SaltMap:
    """Vectorized salted-key computation broadcast to tag stages."""

    def __init__(self, plan: dict[int, int], max_r: int | None = None):
        self.cells = np.array(sorted(plan), dtype=np.int64)
        self.r = np.array([plan[c] for c in sorted(plan)], dtype=np.int64)
        self.max_r = int(max_r or (self.r.max() if len(self.r) else 1))

    def r_of(self, cell: np.ndarray) -> np.ndarray:
        if len(self.cells) == 0:
            return np.ones(len(cell), dtype=np.int64)
        pos = np.searchsorted(self.cells, cell)
        pos_c = np.minimum(pos, len(self.cells) - 1)
        hit = self.cells[pos_c] == cell
        return np.where(hit, self.r[pos_c], 1)

    def particle_keys(self, cell: np.ndarray, pid: np.ndarray) -> np.ndarray:
        """One salted key per particle: cell*max_r + hash(pid) % R_cell."""
        r = self.r_of(cell)
        salt = (mix64(pid.astype(np.uint64)) % r.astype(np.uint64)).astype(np.int64)
        return cell * np.int64(self.max_r) + salt

    def halo_replica_keys(self, cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Expand halo replicas across all salts of their cell: returns
        (row_index, salted_key) with rows repeated R_cell times."""
        r = self.r_of(cell)
        total = int(r.sum())
        rows = np.repeat(np.arange(len(cell), dtype=np.int64), r)
        offsets = np.concatenate(([0], np.cumsum(r)[:-1]))
        salt = np.arange(total, dtype=np.int64) - np.repeat(offsets, r)
        key = cell[rows] * np.int64(self.max_r) + salt
        return rows, key
