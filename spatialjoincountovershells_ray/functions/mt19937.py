"""Reference-exact MT19937 stream (pure NumPy, vectorized per 624-word block).

Reproduces the stock Nishimura/Matsumoto generator the reference's data
generators use (reference src/mt19937ar/mt19937ar.c): ``init_genrand``
seeding, ``genrand_int32`` tempered outputs, and
``genrand_real1() = genrand_int32() / 4294967295.0`` (inclusive [0,1]).
One stream continues across output files, matching the reference
generators (reference src/uniform_decoded_particle_generator/main.c:42-68,
src/uniform_halo_generator/main.c:39-79).

The MT19937 algorithm and constants are public (Matsumoto & Nishimura,
ACM TOMACS 1998); this is an independent implementation, not a copy.
"""

from __future__ import annotations

import numpy as np

_N = 624
_M = 397
_MATRIX_A = np.uint32(0x9908B0DF)
_UPPER = np.uint32(0x80000000)
_LOWER = np.uint32(0x7FFFFFFF)


class MT19937:
    def __init__(self, seed: int):
        mt = np.empty(_N, dtype=np.uint32)
        mt[0] = np.uint32(seed)
        for i in range(1, _N):
            prev = int(mt[i - 1])
            mt[i] = np.uint32((1812433253 * (prev ^ (prev >> 30)) + i) & 0xFFFFFFFF)
        self._mt = mt
        self._buf = np.empty(0, dtype=np.uint32)

    def _twist_block(self) -> np.ndarray:
        """Advance the state one full period of 624 words; return tempered
        outputs (vectorized)."""
        with np.errstate(over="ignore"):
            mt = self._mt
            nxt = np.roll(mt, -1)
            y = (mt & _UPPER) | (nxt & _LOWER)
            mag = np.where(y & np.uint32(1), _MATRIX_A, np.uint32(0))
            shifted = np.roll(mt, -_M)
            # the twist is sequential in principle, but rows 0.._N-_M-1 read
            # mt[i+_M] (old state) and rows _N-_M.._N-1 read mt[i+_M-_N]
            # (NEW state). Resolve in two passes.
            new = np.empty_like(mt)
            new[: _N - _M] = shifted[: _N - _M] ^ (y[: _N - _M] >> np.uint32(1)) ^ mag[: _N - _M]
            # second pass rows i in [_N-_M, _N): depend on new[i + _M - _N]
            # which was produced in pass 1 except the very last row, which
            # depends on new[_M - 1] (also pass 1 since _M - 1 < _N - _M).
            # rows i depend on new[i - (_N - _M)], so process in chunks of
            # _N - _M rows: each chunk's dependencies lie in earlier chunks.
            start = _N - _M
            while start < _N - 1:
                end = min(start + (_N - _M), _N - 1)
                idx = np.arange(start, end)
                new[idx] = new[idx + _M - _N] ^ (y[idx] >> np.uint32(1)) ^ mag[idx]
                start = end
            # final row: in the sequential algorithm mt[0] is already the NEW
            # value when row _N-1 forms its y from mt[(i+1) % _N] = mt[0].
            y_last = (mt[_N - 1] & _UPPER) | (new[0] & _LOWER)
            mag_last = _MATRIX_A if (int(y_last) & 1) else np.uint32(0)
            new[_N - 1] = new[_M - 1] ^ (y_last >> np.uint32(1)) ^ mag_last
            self._mt = new
            # temper
            out = new.copy()
            out ^= out >> np.uint32(11)
            out ^= (out << np.uint32(7)) & np.uint32(0x9D2C5680)
            out ^= (out << np.uint32(15)) & np.uint32(0xEFC60000)
            out ^= out >> np.uint32(18)
        return out

    def genrand_int32(self, n: int) -> np.ndarray:
        """Next ``n`` raw 32-bit outputs (uint32)."""
        chunks = [self._buf]
        have = len(self._buf)
        while have < n:
            block = self._twist_block()
            chunks.append(block)
            have += _N
        all_out = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
        self._buf = all_out[n:]
        return all_out[:n]

    def genrand_real1(self, n: int) -> np.ndarray:
        """n doubles in [0, 1] = genrand_int32()/4294967295 (float64)."""
        return self.genrand_int32(n).astype(np.float64) / 4294967295.0


def uniform_coords(rng: MT19937, n: int, box: float = 1000.0) -> np.ndarray:
    """(n, 3) float32 coordinates, drawn in the reference generators' order
    (x, y, z per row from one continuing stream) and cast to float32 at
    storage like the reference's float writes."""
    vals = rng.genrand_real1(3 * n) * box
    return vals.reshape(n, 3).astype(np.float32)
