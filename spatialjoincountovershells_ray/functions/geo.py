"""Lon-lat hierarchical cell codec (S2/H3-style, dependency-free).

The engine's cell-key abstraction is pluggable (SURVEY.md §2.10): the
periodic box uses the uniform wrapped grid (functions.cells); geographic
data uses this codec — a quadtree Morton id over the equirectangular
grid with longitude wrap-around. Not the true S2 space-filling curve
(no external lib available), but the same contract: hierarchical int64
ids, parent/child navigation, and a cover of a spherical cap for ball
queries, with the correct lon wrap and polar-cap widening.

All functions vectorized over NumPy arrays. Latitude in [-90, 90],
longitude in [-180, 180); ids encode (level, morton(lat_idx, lon_idx)).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0088
MAX_LEVEL = 28  # 2*28 + 5 bits fits int64


def _interleave_bits(a: np.ndarray, b: np.ndarray, nbits: int) -> np.ndarray:
    """Morton interleave of two nbits-wide int arrays (vectorized)."""
    out = np.zeros(len(a), dtype=np.uint64)
    a = a.astype(np.uint64)
    b = b.astype(np.uint64)
    for i in range(nbits):
        bit = np.uint64(1) << np.uint64(i)
        out |= ((a & bit) >> np.uint64(i)) << np.uint64(2 * i)
        out |= ((b & bit) >> np.uint64(i)) << np.uint64(2 * i + 1)
    return out


def latlon_cell(lat: np.ndarray, lon: np.ndarray, level: int) -> np.ndarray:
    """int64 cell id at ``level`` (2^level x 2^(level+1) lat x lon grid)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level out of range")
    nlat = 1 << level
    nlon = 1 << (level + 1)
    la = np.clip(((np.asarray(lat) + 90.0) / 180.0 * nlat).astype(np.int64), 0, nlat - 1)
    lo = np.mod(((np.asarray(lon) + 180.0) / 360.0 * nlon).astype(np.int64), nlon)
    # store the extra lon bit beside the morton code
    lon_hi = lo >> level
    lo_low = lo & (nlat - 1)
    morton = _interleave_bits(la, lo_low, level)
    return (
        (np.int64(level) << np.int64(58))
        | (lon_hi.astype(np.int64) << np.int64(56))
        | morton.astype(np.int64)
    )


def cell_level(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> np.int64(58)) & np.int64(0x1F)


def cell_parent(cell: np.ndarray, parent_level: int) -> np.ndarray:
    """Ancestor id at a coarser level (hierarchical containment)."""
    cell = np.asarray(cell, dtype=np.int64)
    level = cell_level(cell)
    if (parent_level > level).any():
        raise ValueError("parent_level must be <= cell level")
    drop = 2 * (level - parent_level)
    morton = (cell & np.int64((1 << 56) - 1)) >> drop
    # recompute lon_hi at the parent grid: top lon bit is level-invariant
    lon_hi = (cell >> np.int64(56)) & np.int64(1)
    return (
        (np.int64(parent_level) << np.int64(58)) | (lon_hi << np.int64(56)) | morton
    )


def _decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    cell = np.asarray(cell, dtype=np.int64)
    level = int(cell_level(cell)[0]) if cell.ndim else int(cell_level(cell))
    morton = (cell & np.int64((1 << 56) - 1)).astype(np.uint64)
    la = np.zeros(len(cell), dtype=np.int64)
    lo = np.zeros(len(cell), dtype=np.int64)
    for i in range(level):
        la |= ((morton >> np.uint64(2 * i)) & np.uint64(1)).astype(np.int64) << i
        lo |= ((morton >> np.uint64(2 * i + 1)) & np.uint64(1)).astype(np.int64) << i
    lon_hi = ((cell >> np.int64(56)) & np.int64(1)).astype(np.int64)
    lo |= lon_hi << level
    return la, lo, level


def cap_cover(lat: float, lon: float, radius_km: float, level: int) -> np.ndarray:
    """Cell ids at ``level`` covering the spherical cap (vectorized ranges,
    lon wrap, polar widening, collapsing to the full ring past a pole).

    Completeness is provable, not heuristic: the cap's maximum longitude
    half-width over ALL latitudes is asin(sin(r)/cos(lat0)) (attained at
    lat = asin(sin(lat0)/cos(r))), which is >= the per-latitude width
    everywhere in the cap; every row uses that bound plus a one-cell
    quantization margin.
    """
    nlat = 1 << level
    nlon = 1 << (level + 1)
    r_ang = radius_km / EARTH_RADIUS_KM
    dlat = np.degrees(r_ang)
    lat_lo, lat_hi = lat - dlat, lat + dlat
    la0 = int(np.floor((max(lat_lo, -90.0) + 90.0) / 180.0 * nlat))
    la1 = int(np.floor((min(lat_hi, 90.0 - 1e-12) + 90.0) / 180.0 * nlat))
    rows = np.arange(max(0, la0), min(nlat - 1, la1) + 1)
    pole_crossed = lat_lo < -90.0 or lat_hi > 90.0
    sin_ratio = np.sin(min(r_ang, np.pi)) / max(np.cos(np.radians(lat)), 1e-15)
    if pole_crossed or sin_ratio >= 1.0:
        dlon = 360.0
    else:
        dlon = min(360.0, 2.0 * np.degrees(np.arcsin(sin_ratio)) + 360.0 / nlon)
    out = []
    for r in rows:
        if dlon >= 360.0:
            cols = np.arange(nlon)
        else:
            c0 = int(np.floor((lon - dlon / 2 + 180.0) / 360.0 * nlon))
            c1 = int(np.floor((lon + dlon / 2 + 180.0) / 360.0 * nlon))
            cols = np.mod(np.arange(c0, c1 + 1), nlon)
        lats = np.full(len(cols), (r / nlat) * 180.0 - 90.0 + 90.0 / nlat)
        lons = (cols / nlon) * 360.0 - 180.0 + 180.0 / nlon
        out.append(latlon_cell(lats, lons, level))
    return np.unique(np.concatenate(out)) if out else np.empty(0, np.int64)


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Great-circle distance (vectorized, broadcastable)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0, 1)))
