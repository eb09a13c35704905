"""Grid cell keys and ball-cover replication on the periodic box.

This is the engine's replacement for the reference's spatial index + MBR
pruning (reference src/objects/ArraySTR/Build.c, src/objects/RTree/Mbr.c:
167-313): instead of probing a tree per halo, particles are hashed to one
grid cell each and each halo (query ball of radius rmax) is replicated to
every cell its ball overlaps — with modular wrap, which IS the periodic
boundary handling (reference src/objects/ArraySTR/MultiRangeCount.c:13-73
runs up to 7 mirror probes; here a halo near a face simply lands in the
wrapped neighbour cells and the distance kernel uses minimum-image).

All functions are vectorized over NumPy arrays.
"""

from __future__ import annotations

import numpy as np

from spatialjoincountovershells_ray.config import GridSpec


def cell_index(coord: np.ndarray, grid: GridSpec) -> np.ndarray:
    """Per-axis cell index of a coordinate array, wrapped into [0, ncells)."""
    ix = np.floor(coord / grid.L).astype(np.int64)
    return np.mod(ix, grid.ncells)


def flatten_cell(ix: np.ndarray, iy: np.ndarray, iz: np.ndarray, grid: GridSpec) -> np.ndarray:
    """(ix, iy, iz) -> one int64 key."""
    n = np.int64(grid.ncells)
    return (ix.astype(np.int64) * n + iy.astype(np.int64)) * n + iz.astype(np.int64)


def point_cells(xyz: np.ndarray, grid: GridSpec) -> np.ndarray:
    """Flattened cell key of each point in an (N, 3) array."""
    ix = cell_index(xyz[:, 0], grid)
    iy = cell_index(xyz[:, 1], grid)
    iz = cell_index(xyz[:, 2], grid)
    return flatten_cell(ix, iy, iz, grid)


def ball_cover_cells(xyz: np.ndarray, rmax: float, grid: GridSpec, tighten: bool = True):
    """Replicate each point to every cell overlapping its ball of radius rmax.

    Returns ``(row, cell)`` int64 arrays: ``row[k]`` is the input row index
    of replica k, ``cell[k]`` its flattened (wrapped) cell key. Cell ranges
    use modular arithmetic, never clamping; when a ball covers >= ncells
    cells along an axis the wrapped duplicates are deduplicated so each
    (row, cell) appears once — the particle-side single-cell assignment
    then guarantees each halo-particle pair is evaluated exactly once
    (SURVEY.md §7.5).

    ``tighten``: drop cube-corner cells whose closest point lies beyond
    rmax (sphere cover instead of cube cover, ~pi/6 of the cells for fine
    grids). Skipped for points whose cover wraps a full axis, where
    unwrapped distances are no longer valid.
    """
    n = xyz.shape[0]
    nc = grid.ncells
    lo = np.floor((xyz - rmax) / grid.L).astype(np.int64)  # (N,3) signed
    hi = np.floor((xyz + rmax) / grid.L).astype(np.int64)
    span = hi - lo + 1  # cells covered per axis, >= 1
    # Cap the span at ncells: beyond one full wrap every extra cell is a
    # duplicate of an already-covered wrapped cell.
    span = np.minimum(span, nc)
    counts = span[:, 0] * span[:, 1] * span[:, 2]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    # local replica ordinal within each row's block: 0..counts[row]-1
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)
    sy = span[row, 1]
    sz = span[row, 2]
    # decompose local ordinal into (dx, dy, dz) offsets
    dz = local % sz
    rem = local // sz
    dy = rem % sy
    dx = rem // sy
    ux = lo[row, 0] + dx
    uy = lo[row, 1] + dy
    uz = lo[row, 2] + dz
    if tighten:
        capped = (span >= nc).any(axis=1)
        dmin2 = np.zeros(total)
        for u, ax in ((ux, 0), (uy, 1), (uz, 2)):
            c = xyz[row, ax]
            low = u * grid.L
            upp = low + grid.L
            d = np.maximum(low - c, c - upp)
            np.maximum(d, 0.0, out=d)
            dmin2 += d * d
        # tiny relative margin: float error in dmin2 must never drop a cell
        # holding a particle at distance < rmax
        keep = (dmin2 <= rmax * rmax * (1.0 + 1e-9)) | capped[row]
        row, ux, uy, uz = row[keep], ux[keep], uy[keep], uz[keep]
    ix = np.mod(ux, nc)
    iy = np.mod(uy, nc)
    iz = np.mod(uz, nc)
    cell = flatten_cell(ix, iy, iz, grid)
    return row, cell


def cyl_cover_cells(
    xyz: np.ndarray, rp_max: float, pi_max: float, grid: GridSpec, tighten: bool = True
):
    """Replicate each point to every cell overlapping its periodic
    CYLINDER: transverse radius ``rp_max`` in the x-y plane, half-length
    ``pi_max`` along z (round-5, verdict item 4a).

    The cylindrical pair kernel previously used
    :func:`ball_cover_cells` with the circumscribed radius
    ``hypot(rp_max, pi_max)`` — complete but a documented ~2.8×
    candidate over-fetch. This cover keeps a cell iff its closest point
    lies within the transverse DISC (dx²+dy² ≤ rp_max²) AND the z SLAB
    (|dz| ≤ pi_max), which is exactly the support of the (rp, π)
    binning, so completeness is unchanged while corner/cap cells drop.
    Same contracts as ball_cover_cells: modular cell ranges, span
    capped at ncells (wrap dedup), tighten skipped for points whose
    cover wraps a full axis.
    """
    n = xyz.shape[0]
    nc = grid.ncells
    rad = np.array([rp_max, rp_max, pi_max])
    lo = np.floor((xyz - rad) / grid.L).astype(np.int64)
    hi = np.floor((xyz + rad) / grid.L).astype(np.int64)
    span = np.minimum(hi - lo + 1, nc)
    counts = span[:, 0] * span[:, 1] * span[:, 2]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)
    sy = span[row, 1]
    sz = span[row, 2]
    dz = local % sz
    rem = local // sz
    dy = rem % sy
    dx = rem // sy
    ux = lo[row, 0] + dx
    uy = lo[row, 1] + dy
    uz = lo[row, 2] + dz
    if tighten:
        capped = (span >= nc).any(axis=1)
        dmin2_t = np.zeros(total)
        for u, ax in ((ux, 0), (uy, 1)):
            c = xyz[row, ax]
            low = u * grid.L
            upp = low + grid.L
            d = np.maximum(low - c, c - upp)
            np.maximum(d, 0.0, out=d)
            dmin2_t += d * d
        cz = xyz[row, 2]
        lowz = uz * grid.L
        dzmin = np.maximum(np.maximum(lowz - cz, cz - (lowz + grid.L)), 0.0)
        # same tiny relative margin as ball_cover_cells: float error must
        # never drop a cell holding a countable pair
        keep = (
            (dmin2_t <= rp_max * rp_max * (1.0 + 1e-9))
            & (dzmin <= pi_max * (1.0 + 1e-9))
        ) | capped[row]
        row, ux, uy, uz = row[keep], ux[keep], uy[keep], uz[keep]
    ix = np.mod(ux, nc)
    iy = np.mod(uy, nc)
    iz = np.mod(uz, nc)
    cell = flatten_cell(ix, iy, iz, grid)
    return row, cell


def tile_id_2d(x: np.ndarray, y: np.ndarray, L: float, ntiles: int) -> np.ndarray:
    """2-D tile key (raster<->vector assignment): floor(c/L) per axis,
    flattened row-major. No wrap — tiles are a partition of the box."""
    ix = np.floor(x / L).astype(np.int64)
    iy = np.floor(y / L).astype(np.int64)
    return ix * np.int64(ntiles) + iy
