"""shellcount-ray: a Ray-Data-native spatial-join + shell-count engine.

From-scratch reimplementation of the query capabilities of the SJCS
reference workload (ryumt/SpatialJoinCountOverShells) as grid-bucketed
distance joins over ``ray.data.Dataset`` pipelines, plus the generic
spatial surface (range join, kNN, point-in-polygon, tile assignment)
and large-scale training-data operators (dedup, ANN, text analysis).

See SURVEY.md for the structural analysis of the reference; citations in
docstrings (``reference src/...:line``) point into /root/reference.
"""

def _tune_malloc() -> None:
    """Keep freed large buffers in the heap instead of munmap'ing them.

    In this sandbox (and many container runtimes) first-touch page faults
    on fresh mmap'd memory run orders of magnitude slower than normal, so
    glibc's default behaviour — mmap every >128 KiB allocation and unmap
    it on free — makes each batch's numpy temporaries re-fault the same
    pages over and over (measured ~15x slowdown on the join kernel).
    Raising M_MMAP_THRESHOLD / M_TRIM_THRESHOLD makes the heap reuse hot
    pages. Runs once per process at package import, so every Ray worker
    that loads a kernel gets it; no-op on non-glibc platforms.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
    except Exception:
        pass


_tune_malloc()

from spatialjoincountovershells_ray.config import BOX_SIZE, RadiusLadder, GridSpec

__all__ = ["BOX_SIZE", "RadiusLadder", "GridSpec"]
__version__ = "0.1.0"
