"""Distance-join kernels: broadcast actors and per-cell group kernels.

Replaces the reference's per-halo tree probe
(``multiRangeCountWithPriodicBoundArraySTR``, reference
src/objects/ArraySTR/MultiRangeCount.c:13-115) with two Ray-Data-native
physical plans for the same logical join:

- **broadcast**: the (small) halo side is indexed once into a
  cell -> halo-replica CSR, ``ray.put`` once, and read zero-copy by every
  actor of a ``map_batches`` pool (setup in ``__init__``, per-batch work
  in ``__call__``). Particles stream through; candidate halo-particle
  pairs are generated fully vectorized via CSR gather (no Python loop
  over rows or cells). This is the classic broadcast join — correct at
  any particle scale while halos fit in the object store.

- **shuffle**: both sides get cell keys (halos replicated over their
  ball cover), are co-partitioned by ``groupby('cell')``, and a
  vectorized kernel runs per cell group. Scales to both sides huge; see
  pipelines.shell_count.

Periodic boundary handling is the cell wrap + minimum-image metric
(SURVEY.md §7.1), equivalent to the reference's mirror probes for
rmax < box/2.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE, GridSpec, RadiusLadder
from spatialjoincountovershells_ray.functions.cells import ball_cover_cells, point_cells
from spatialjoincountovershells_ray.functions.distance import shell_of, torus_d2


@dataclass
class HaloIndex:
    """Cell -> halo-replica CSR over the broadcast (query) side."""

    halo_ids: np.ndarray  # int64 [H]
    xyz: np.ndarray  # [H, 3] float32/float64
    ucells: np.ndarray  # sorted unique covered cells [C]
    starts: np.ndarray  # [C] start into rep_rows
    counts: np.ndarray  # [C]
    rep_rows: np.ndarray  # [R] halo row index per replica, grouped by cell
    grid: GridSpec
    box: float

    @classmethod
    def build(
        cls, halo_ids: np.ndarray, xyz: np.ndarray, rmax: float, grid: GridSpec, box: float = BOX_SIZE
    ) -> "HaloIndex":
        row, cell = ball_cover_cells(xyz, rmax, grid)
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        row = row[order]
        ucells, starts, counts = np.unique(cell, return_index=True, return_counts=True)
        return cls(
            halo_ids=np.ascontiguousarray(halo_ids),
            xyz=np.ascontiguousarray(xyz),
            ucells=ucells,
            starts=starts.astype(np.int64),
            counts=counts.astype(np.int64),
            rep_rows=row,
            grid=grid,
            box=box,
        )

    def candidates(self, pxyz: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized candidate generation for a particle batch.

        Returns (pair_particle_row, pair_halo_row): for every particle,
        all halos whose ball cover includes the particle's cell.
        """
        pcell = point_cells(pxyz, self.grid)
        pos = np.searchsorted(self.ucells, pcell)
        pos_c = np.minimum(pos, len(self.ucells) - 1) if len(self.ucells) else pos
        valid = np.zeros(len(pcell), dtype=bool)
        if len(self.ucells):
            valid = self.ucells[pos_c] == pcell
        cnt = np.where(valid, self.counts[pos_c], 0)
        total = int(cnt.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        pair_p = np.repeat(np.arange(len(pcell), dtype=np.int64), cnt)
        offsets = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(offsets, cnt)
        pair_rep = np.repeat(self.starts[pos_c] * valid, cnt) + local
        pair_h = self.rep_rows[pair_rep]
        return pair_p, pair_h


def _batch_xyz(batch: pa.Table, dtype) -> np.ndarray:
    return np.stack(
        [batch.column(c).to_numpy(zero_copy_only=False).astype(dtype, copy=False) for c in ("x", "y", "z")],
        axis=1,
    )


class _BroadcastKernel:
    """Shared actor-pool setup: fetch the HaloIndex once per actor."""

    def __init__(self, index_ref, ladder: RadiusLadder):
        # index_ref is wrapped in a list so Ray Data does not resolve it per
        # task; ray.get here is once per actor and zero-copy for the arrays.
        self.index: HaloIndex = ray.get(index_ref[0]) if isinstance(index_ref, list) else index_ref
        self.ladder = ladder
        self.dtype = ladder.dtype
        self.r2 = ladder.r2


class BroadcastShellCount(_BroadcastKernel):
    """Particle batches -> partial per-halo shell histograms.

    Output: halo_id:int64, s0..s{n-1}:int64 — only halos touched by the
    batch (dense zeros are supplied by the pipeline's final merge).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        nrads = self.ladder.nrads
        pxyz = _batch_xyz(batch, self.dtype)
        pair_p, pair_h = idx.candidates(pxyz)
        names = ["halo_id"] + [f"s{i}" for i in range(nrads)]
        if len(pair_p) == 0:
            return pa.table(
                {n: pa.array([], pa.int64()) for n in names}
            )
        d2 = torus_d2(idx.xyz[pair_h], pxyz[pair_p], idx.box)
        shell = shell_of(d2, self.r2)
        keep = shell < nrads
        pair_h = pair_h[keep]
        shell = shell[keep]
        if len(pair_h) == 0:
            return pa.table({n: pa.array([], pa.int64()) for n in names})
        touched, inv = np.unique(pair_h, return_inverse=True)
        hist = np.zeros(len(touched) * nrads, dtype=np.int64)
        np.add.at(hist, inv * nrads + shell, 1)
        hist = hist.reshape(len(touched), nrads)
        cols = {"halo_id": idx.halo_ids[touched]}
        for i in range(nrads):
            cols[f"s{i}"] = hist[:, i]
        return pa.table(cols)


class BroadcastRangeJoin(_BroadcastKernel):
    """Particle batches -> (halo_id, particle_id) pairs with d2 < r2_max.

    The id-returning distance join of the reference
    (``RangeSearch``, reference src/objects/ArraySTR/RangeSearch.c:11-52).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        pxyz = _batch_xyz(batch, self.dtype)
        pids = batch.column("particle_id").to_numpy()
        pair_p, pair_h = idx.candidates(pxyz)
        if len(pair_p) == 0:
            return pa.table(
                {"halo_id": pa.array([], pa.int64()), "particle_id": pa.array([], pa.int64())}
            )
        d2 = torus_d2(idx.xyz[pair_h], pxyz[pair_p], idx.box)
        keep = d2 < self.r2[-1]
        return pa.table(
            {
                "halo_id": idx.halo_ids[pair_h[keep]],
                "particle_id": pids[pair_p[keep]],
            }
        )


class BroadcastKnnCandidates:
    """Particle batches -> per-batch top-k (halo_id, particle_id, d2) rows.

    Partial top-k per (halo, batch); the pipeline's groupby(halo_id)
    reduction selects the global k by (d2, particle_id). Unlike the
    shell/range kernels this scans ALL halos per batch (no radius bound
    exists for kNN), so it is meant for a broadcastable query side; the
    grid-ring variant is the scale path (pipelines.knn).
    """

    def __init__(self, halos_ref, k: int, box: float = BOX_SIZE, dtype=np.float64):
        h = ray.get(halos_ref[0]) if isinstance(halos_ref, list) else halos_ref
        self.halo_ids: np.ndarray = h["halo_ids"]
        self.xyz: np.ndarray = h["xyz"].astype(dtype, copy=False)
        self.k = k
        self.box = box
        self.dtype = dtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        pxyz = _batch_xyz(batch, self.dtype)
        pids = batch.column("particle_id").to_numpy()
        H = len(self.halo_ids)
        P = len(pids)
        if P == 0 or H == 0:
            return pa.table(
                {
                    "halo_id": pa.array([], pa.int64()),
                    "particle_id": pa.array([], pa.int64()),
                    "d2": pa.array([], pa.float64()),
                }
            )
        d2 = torus_d2(self.xyz[:, None, :], pxyz[None, :, :], self.box)  # [H, P]
        k = min(self.k, P)
        # partial selection per halo row; ties resolved at the final merge
        part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        rows = np.repeat(np.arange(H, dtype=np.int64), k)
        cols = part.reshape(-1)
        return pa.table(
            {
                "halo_id": self.halo_ids[rows],
                "particle_id": pids[cols],
                "d2": d2[rows, cols].astype(np.float64, copy=False),
            }
        )


# ---------------------------------------------------------------------------
# shuffle-mode kernels (both sides large)
# ---------------------------------------------------------------------------


def add_particle_cell(batch: pa.Table, grid: GridSpec, dtype=np.float64) -> pa.Table:
    """Append the particle's single (wrapped) cell key."""
    xyz = _batch_xyz(batch, dtype)
    cell = point_cells(xyz, grid)
    return batch.append_column("cell", pa.array(cell, pa.int64()))


def replicate_halos(
    batch: pa.Table, rmax: float, grid: GridSpec, dtype=np.float64
) -> pa.Table:
    """Replicate each halo row to every cell overlapping its ball
    (vectorized flat-map; SURVEY.md §7.1 step 3)."""
    xyz = _batch_xyz(batch, dtype)
    row, cell = ball_cover_cells(xyz, rmax, grid)
    taken = batch.take(pa.array(row, pa.int64()))
    return taken.append_column("cell", pa.array(cell, pa.int64()))


def cell_group_shell_count(
    group: pa.Table, ladder: RadiusLadder, box: float = BOX_SIZE, tile_pairs: int = 8_000_000
) -> pa.Table:
    """Per-cell kernel for the shuffle plan: one group = one cell's halo
    replicas ('h' rows) + particles ('p' rows); emits partial histograms.

    Tiled over the halo axis so the H x P distance temp stays under
    ~tile_pairs floats regardless of cell skew.
    """
    nrads = ladder.nrads
    role = group.column("role").to_numpy(zero_copy_only=False)
    xyz = _batch_xyz(group, ladder.dtype)
    ids = group.column("id").to_numpy(zero_copy_only=False)
    hmask = role == 0
    hxyz, pxyz = xyz[hmask], xyz[~hmask]
    hids = ids[hmask]
    names = ["halo_id"] + [f"s{i}" for i in range(nrads)]
    if len(hxyz) == 0 or len(pxyz) == 0:
        return pa.table({n: pa.array([], pa.int64()) for n in names})
    hist = np.zeros((len(hxyz), nrads), dtype=np.int64)
    chunk = max(1, tile_pairs // len(pxyz))
    for s in range(0, len(hxyz), chunk):
        d2 = torus_d2(hxyz[s : s + chunk, None, :], pxyz[None, :, :], box)
        shell = shell_of(d2, ladder.r2)
        for i in range(nrads):
            hist[s : s + chunk, i] += (shell == i).sum(axis=1)
    cols = {"halo_id": hids}
    for i in range(nrads):
        cols[f"s{i}"] = hist[:, i]
    return pa.table(cols)
