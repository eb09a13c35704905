"""Deterministic derivations and hash families.

Two distinct uses, do not mix:

1. SQL-reproducible coordinate derivation (``derive_coord``): turns an
   int64 key column into a coordinate in [0, box) using only int64
   multiply-add-modulo — the exact same expression an ANSI-SQL oracle can
   evaluate (``CAST((k*A + B) % M AS DOUBLE)/S``). Products stay well
   inside int64 (keys < 2^41 with A < 2^32). Used to synthesize the
   deterministic halo/particle tables from the TPC-H key columns.

2. Fast vectorized uint64 mixing (``mix64``, ``minhash_permutations``)
   for dedup sketches — NumPy wraparound arithmetic, NOT SQL-parity.
"""

from __future__ import annotations

import numpy as np

from spatialjoincountovershells_ray.config import BOX_SIZE

# odd 32-bit multipliers (Knuth / xxhash primes); per-axis (A, B).
# Axes 0-2 are the data catalogs (halos/particles); axes 3-5 derive the
# RANDOM catalog of the pair-correlation estimator from the same keys —
# an independent pseudo-uniform draw with the same SQL-parity form.
_AXIS_PARAMS = (
    (2654435761, 0),
    (2246822519, 1),
    (3266489917, 2),
    (668265263, 3),
    (374761393, 4),
    (3042594569, 5),
)
_COORD_MOD = 1_000_000  # 3 fractional digits at box=1000
_COORD_SCALE = 1000.0
# k*A + B must stay inside int64 for every axis or numpy wraps silently
# while the SQL twin does not — parity would break, not crash
_MAX_KEY = min(((1 << 63) - 1 - b) // a for a, b in _AXIS_PARAMS)


def derive_coord(key: np.ndarray, axis: int, box: float = BOX_SIZE) -> np.ndarray:
    """Deterministic pseudo-uniform coordinate in [0, box) from an int64 key.

    float64 result == the DuckDB expression produced by
    :func:`derive_coord_sql` evaluated on the same key, bit for bit.
    """
    a, b = _AXIS_PARAMS[axis]
    k = np.asarray(key, dtype=np.int64)
    if k.size and int(k.max(initial=0)) > _MAX_KEY:
        raise ValueError(
            f"key exceeds {_MAX_KEY} — k*A+B would wrap int64 and silently "
            "diverge from the SQL twin"
        )
    v = (k * np.int64(a) + np.int64(b)) % np.int64(_COORD_MOD)
    return (v.astype(np.float64) / _COORD_SCALE) * (box / BOX_SIZE)


def derive_coord_sql(key_expr: str, axis: int) -> str:
    """The DuckDB-evaluable twin of :func:`derive_coord` (box=1000)."""
    a, b = _AXIS_PARAMS[axis]
    return f"CAST(({key_expr} * {a} + {b}) % {_COORD_MOD} AS DOUBLE) / {_COORD_SCALE}"


def derive_xyz(key: np.ndarray, box: float = BOX_SIZE) -> np.ndarray:
    """(N, 3) float64 coordinates from an int64 key column."""
    return np.stack([derive_coord(key, ax, box) for ax in range(3)], axis=1)


# ---------------------------------------------------------------------------
# uint64 mixers for sketches (not SQL-parity)
# ---------------------------------------------------------------------------

_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche of a uint64 array (vectorized)."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=np.uint64).copy()
        x ^= x >> np.uint64(33)
        x *= _M1
        x ^= x >> np.uint64(33)
        x *= _M2
        x ^= x >> np.uint64(33)
    return x


def hash_bytes_rows(strings: "list[bytes] | np.ndarray") -> np.ndarray:
    """64-bit FNV-1a per row over a list of byte strings (Python loop is
    acceptable: used on short shingle keys already reduced per batch)."""
    out = np.empty(len(strings), dtype=np.uint64)
    fnv_offset = 0xCBF29CE484222325
    fnv_prime = 0x100000001B3
    mask = (1 << 64) - 1
    for i, s in enumerate(strings):
        h = fnv_offset
        for byte in s:
            h = ((h ^ byte) * fnv_prime) & mask
        out[i] = h
    return out


def minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) uint64 parameter vectors for num_perm universal-hash
    permutations h_i(x) = a_i*x + b_i (mod 2^64), derived from mix64 of a
    seeded counter — deterministic across processes."""
    base = mix64(np.arange(2 * num_perm, dtype=np.uint64) + np.uint64(seed * 0x9E3779B9))
    a = base[:num_perm] | np.uint64(1)  # odd
    b = base[num_perm:]
    return a, b


# Bloom-filter hash family: the CMS salts' sibling — j-th position is
# mix64((key + BLOOM_SALTS[j]) mod 2^64) % nbits. Fixed constants so the
# build and probe sides (different processes) always agree.
BLOOM_SALTS = (
    0x2545F4914F6CDD1D,
    0x9E3779B97F4A7C15,
    0xD6E8FEB86659FD93,
    0xA24BAED4963EE407,
    0x8CB92BA72F3D8DD7,
    0xCA9B0C7EBA1DD2F1,
)


def bloom_positions(keys: "np.ndarray", nbits: int, nhashes: int) -> "np.ndarray":
    """(n, nhashes) int64 bit positions for int64/uint64 ``keys``."""
    if nhashes > len(BLOOM_SALTS):
        raise ValueError(f"nhashes <= {len(BLOOM_SALTS)}")
    salts = np.array(BLOOM_SALTS[:nhashes], np.uint64)
    k = np.asarray(keys).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = mix64((k[:, None] + salts[None, :]).ravel())
    return (h % np.uint64(nbits)).astype(np.int64).reshape(k.size, nhashes)


def popcount64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = np.asarray(x, np.uint64)
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
