"""Engine configuration objects.

The data space is the periodic box [0, BOX_SIZE]^3 (torus), matching the
reference's compile-time bounds (reference include/objects/RTree/Mbr.h:7-10,
include/Gadget/Bound.h:1-6).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

BOX_SIZE = 1000.0
NDIMS = 3


def default_pool(reserve: int = 4) -> tuple[int, int]:
    """Default actor-pool concurrency: autoscale up to cluster CPUs minus a
    reserve for upstream reads / downstream aggregation. A pool sized to
    ALL CPUs starves the other pipeline stages (the read task never gets a
    CPU and the whole stream stalls — observed, not hypothetical)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, cpus - reserve))


def logspace_ladder(base: float, a: float, b: float, n: int) -> np.ndarray:
    """Log-spaced ladder of ``n`` values base**a .. base**b, last pinned.

    Same semantics as the reference's ``Logspace`` (reference
    include/support_functions.h:18-34): val_i = base**(a + i*step) with
    step = (b-a)/(n-1), and the final entry pinned exactly to base**b.
    Computed in float64.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return np.array([base**b], dtype=np.float64)
    step = (b - a) / (n - 1)
    vals = base ** (a + step * np.arange(n, dtype=np.float64))
    vals[-1] = base**b
    return vals


@dataclass(frozen=True)
class RadiusLadder:
    """The concentric shell radii of a shell-count query.

    Shells are [0, r_0), [r_0, r_1), ..., [r_{n-2}, r_{n-1}); a point at
    squared distance d2 lands in the FIRST shell i with d2 < r2[i]
    (strict <; ties at a boundary go to the next shell out), and
    d2 >= r2[-1] is not counted — reference
    src/objects/ArraySTR/MultiRangeCount.c:103-114.

    ``dtype`` selects the comparison precision: float32 for bit-for-bit
    reference parity (radii squared once up front in float32, reference
    src/astr_rcount/main.c:645-649), float64 for the SQL-checkable path.
    """

    radii: np.ndarray  # ascending, > 0, dtype float32/float64
    dtype: np.dtype = np.dtype(np.float64)

    def __post_init__(self):
        r = np.asarray(self.radii, dtype=self.dtype)
        if r.ndim != 1 or len(r) < 1:
            raise ValueError("radii must be a 1-D non-empty array")
        # validation per reference src/objects/RTree/MultiRangeCountContext.c:38-58
        if not (r > 0).all():
            raise ValueError("all radii must be > 0")
        if not (np.diff(r) > 0).all():
            raise ValueError("radii must be strictly ascending")
        object.__setattr__(self, "radii", r)

    @classmethod
    def log2_spaced(
        cls, rmin: float, rmax: float, nrads: int, dtype=np.float64
    ) -> "RadiusLadder":
        """The reference's ``--radius rmin:rmax:n`` ladder:
        Logspace(2, log2(rmin), log2(rmax), n) — reference
        src/astr_rcount/main.c:645-649."""
        vals = logspace_ladder(2.0, math.log2(rmin), math.log2(rmax), nrads)
        return cls(radii=vals.astype(dtype), dtype=np.dtype(dtype))

    @classmethod
    def parse(cls, spec: str, dtype=np.float64) -> "RadiusLadder":
        """Parse the reference CLI form ``min:max:n`` (or a comma list)."""
        if ":" in spec:
            rmin, rmax, n = spec.split(":")
            return cls.log2_spaced(float(rmin), float(rmax), int(n), dtype=dtype)
        vals = np.array([float(x) for x in spec.split(",")])
        return cls(radii=vals.astype(dtype), dtype=np.dtype(dtype))

    @property
    def nrads(self) -> int:
        return len(self.radii)

    @property
    def r2(self) -> np.ndarray:
        """Squared radii, in ladder dtype (squaring done once up front as in
        reference src/astr_rcount/main.c:648-649)."""
        return self.radii * self.radii

    @property
    def rmax(self) -> float:
        return float(self.radii[-1])


@dataclass(frozen=True)
class GridSpec:
    """Uniform cubic grid over the periodic box.

    ``ncells`` cells per axis, edge ``L = box / ncells``. Cell keys are
    flattened int64 ``(ix * ncells + iy) * ncells + iz`` with each index
    taken modulo ncells (torus wrap). The grid replaces the reference's
    per-file STR/R-tree (SURVEY.md §7.1): particles get their own cell,
    query balls are replicated to every overlapping cell.
    """

    ncells: int
    box: float = BOX_SIZE

    def __post_init__(self):
        if self.ncells < 1:
            raise ValueError("ncells must be >= 1")

    @property
    def L(self) -> float:
        return self.box / self.ncells

    @classmethod
    def for_radius(cls, rmax: float, box: float = BOX_SIZE, target_cells_per_r: float = 1.0) -> "GridSpec":
        """Pick a grid so a ball of radius rmax spans about
        ``2*target_cells_per_r + 1`` cells per axis. target_cells_per_r=1
        gives the classic L >= rmax cell-list; larger values trade halo
        replication for candidate pruning."""
        if rmax <= 0 or rmax >= box / 2:
            raise ValueError("rmax must be in (0, box/2) for the minimum-image metric")
        ncells = max(1, int(box * target_cells_per_r / rmax))
        return cls(ncells=ncells, box=box)
