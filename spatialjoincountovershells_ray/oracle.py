"""Brute-force NumPy oracles (golden outputs for pytest).

O(H x P) torus-distance computations mirroring the semantics in
FIXTURES.md §8; used to verify every distributed plan bit-for-bit.
Float32 mode reproduces the reference's arithmetic (strict `<` on
squared float32 values, reference
src/objects/ArraySTR/MultiRangeCount.c:103-114).
"""

from __future__ import annotations

import numpy as np

from spatialjoincountovershells_ray.config import BOX_SIZE
from spatialjoincountovershells_ray.functions.distance import shell_of, torus_d2


def _pair_d2(halos_xyz: np.ndarray, parts_xyz: np.ndarray, box: float) -> np.ndarray:
    return torus_d2(halos_xyz[:, None, :], parts_xyz[None, :, :], box)


def shell_count_oracle(
    halos_xyz: np.ndarray, parts_xyz: np.ndarray, r2: np.ndarray, box: float = BOX_SIZE
) -> np.ndarray:
    """uint64[nhalos, nrads] shell histograms (all pairs, min-image)."""
    nrads = len(r2)
    out = np.zeros((len(halos_xyz), nrads), dtype=np.uint64)
    # chunk the halo axis to bound the H x P temp
    chunk = max(1, int(4e7) // max(1, len(parts_xyz)))
    for s in range(0, len(halos_xyz), chunk):
        d2 = _pair_d2(halos_xyz[s : s + chunk], parts_xyz, box)
        shell = shell_of(d2, r2)
        for i in range(nrads):
            out[s : s + chunk, i] = (shell == i).sum(axis=1)
    return out


def range_join_oracle(
    halo_ids: np.ndarray,
    halos_xyz: np.ndarray,
    part_ids: np.ndarray,
    parts_xyz: np.ndarray,
    r: float,
    box: float = BOX_SIZE,
) -> set[tuple[int, int]]:
    """{(halo_id, particle_id)} with d2 < r*r (strict), any dtype."""
    r2 = np.asarray(r, dtype=halos_xyz.dtype) * np.asarray(r, dtype=halos_xyz.dtype)
    pairs = set()
    chunk = max(1, int(4e7) // max(1, len(parts_xyz)))
    for s in range(0, len(halos_xyz), chunk):
        d2 = _pair_d2(halos_xyz[s : s + chunk], parts_xyz, box)
        hi, pi = np.nonzero(d2 < r2)
        for h, p in zip(hi, pi):
            pairs.add((int(halo_ids[s + h]), int(part_ids[p])))
    return pairs


def knn_oracle(
    halo_ids: np.ndarray,
    halos_xyz: np.ndarray,
    part_ids: np.ndarray,
    parts_xyz: np.ndarray,
    k: int,
    box: float = BOX_SIZE,
) -> dict[int, list[int]]:
    """Per halo: k nearest particle ids, ties broken by (d2, particle_id)."""
    out = {}
    for i in range(len(halos_xyz)):
        d2 = torus_d2(halos_xyz[i][None, :], parts_xyz, box)
        order = np.lexsort((part_ids, d2))
        out[int(halo_ids[i])] = [int(part_ids[j]) for j in order[:k]]
    return out
