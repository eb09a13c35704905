"""Reference-exact data generators (S8/S9 in SURVEY.md §2.1).

Reproduce the reference's uniform generators bit-for-bit from their
MT19937 streams (seeds 113 / 1659533; one stream continues across the
file list):

- particle files (reference src/uniform_decoded_particle_generator/
  main.c:42-68): per particle three draws ``real1()*1000`` assigned to
  float32, written as raw float32[3] triples.
- halo files (reference src/uniform_halo_generator/main.c:39-79): 16
  ``# dummy header N`` lines, then per halo FOUR draws — mass first
  (``real1()*1000^4``, float32, printed %g) then x, y, z (float32,
  printed %f) — ids sequential from a counter shared across files.

These make our engine's inputs byte-comparable with files produced by a
compiled reference, so shell histograms can be cross-checked 1:1.
"""

from __future__ import annotations

import os

import numpy as np

from spatialjoincountovershells_ray.config import BOX_SIZE
from spatialjoincountovershells_ray.functions.mt19937 import MT19937

HEADER_LINES = 16


def generate_particle_files(
    paths: list[str], n_per_file: int, seed: int = 113, box: float = BOX_SIZE
) -> list[str]:
    rng = MT19937(seed)
    for p in paths:
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        vals = rng.genrand_real1(3 * n_per_file) * box
        vals.astype(np.float32).tofile(p)
    return paths


def halo_stream(rng: MT19937, n: int, box: float = BOX_SIZE):
    """(mass_f32, xyz_f32[n,3]) drawn in the reference's per-halo order
    (mass, x, y, z)."""
    draws = rng.genrand_real1(4 * n).reshape(n, 4)
    mass = (draws[:, 0] * (box * box) * (box * box)).astype(np.float32)
    xyz = (draws[:, 1:4] * box).astype(np.float32)
    return mass, xyz


def halo_line(halo_id: int, mass: np.float32, pos: np.ndarray) -> str:
    """One reference 40-column halo line (main.c:63-68 format string)."""
    return (
        f"{halo_id} 0 {'%g' % float(mass)} 0 0 0 0 0 "
        f"{'%f' % float(pos[0])} {'%f' % float(pos[1])} {'%f' % float(pos[2])} 0 0 0 0 0 "
        "0 0 0 0 0 0 0 0 "
        "0 0 0 0 0 0 0 0 "
        "0 0 0 0 0 0 0 0"
    )


def generate_halo_files(
    paths: list[str],
    n_per_file: int,
    seed: int = 1659533,
    box: float = BOX_SIZE,
    id_start: int = 0,
) -> list[str]:
    rng = MT19937(seed)
    next_id = id_start  # the reference's `static` counter, shared across files
    for p in paths:
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        mass, xyz = halo_stream(rng, n_per_file, box)
        with open(p, "w") as f:
            for i in range(HEADER_LINES):
                f.write(f"# dummy header {i}\n")
            for m, pos in zip(mass, xyz):
                f.write(halo_line(next_id, m, pos) + "\n")
                next_id += 1
    return paths
