"""Property-based tests (hypothesis) for the invariants every spatial
plan rests on:

1. torus metric: symmetry, shift-invariance under whole-box translations,
   and the min-image upper bound (box*sqrt(3)/2)^2.
2. cover completeness: if torus_d2(h, p) < rmax^2 then p's cell is in
   h's ball cover — the guarantee that the cell-bucketed join never
   misses a pair, for any grid resolution and any wrap position.
3. packed_counts conservation: the combiner neither drops nor invents
   counts under arbitrary batch splits.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spatialjoincountovershells_ray.config import GridSpec
from spatialjoincountovershells_ray.functions.cells import ball_cover_cells, point_cells
from spatialjoincountovershells_ray.functions.distance import torus_d2

BOX = 1000.0

coords = st.floats(min_value=0.0, max_value=np.nextafter(BOX, 0), allow_nan=False)
point = st.tuples(coords, coords, coords)


@settings(max_examples=200, deadline=None)
@given(a=point, b=point, shift=st.tuples(*[st.integers(-3, 3)] * 3))
def test_torus_d2_symmetry_shift_invariance_and_bound(a, b, shift):
    av = np.array([a])
    bv = np.array([b])
    d_ab = torus_d2(av, bv, BOX)[0]
    d_ba = torus_d2(bv, av, BOX)[0]
    assert d_ab == d_ba
    # translating either point by whole boxes never changes the metric
    # (up to IEEE rounding of the pre-fold delta — a+k*box - b rounds
    # differently than a-b, so bit-equality is not a valid expectation)
    sh = np.array([shift], dtype=np.float64) * BOX
    assert np.isclose(torus_d2(av + sh, bv, BOX)[0], d_ab, rtol=1e-9, atol=1e-6)
    # min-image bound: no two points are farther than half a box diagonal
    assert d_ab <= 3.0 * (BOX / 2.0) ** 2 * (1 + 1e-12)


@settings(max_examples=150, deadline=None)
@given(
    h=point,
    p=point,
    ncells=st.integers(1, 13),
    rfrac=st.floats(min_value=0.001, max_value=0.9),
)
def test_ball_cover_contains_every_in_range_pair(h, p, ncells, rfrac):
    grid = GridSpec(ncells=ncells, box=BOX)
    hv = np.array([h])
    pv = np.array([p])
    d2 = torus_d2(hv, pv, BOX)[0]
    rmax = rfrac * BOX
    if d2 >= rmax * rmax:
        return  # only in-range pairs carry the guarantee
    _, cover = ball_cover_cells(hv, rmax, grid)
    pcell = point_cells(pv, grid)[0]
    assert pcell in set(cover.tolist())


@settings(max_examples=60, deadline=None)
@given(
    keys=st.lists(st.integers(0, 50), min_size=1, max_size=300),
    nsplits=st.integers(1, 5),
)
def test_packed_counts_conserves_totals(keys, nsplits):
    import pyarrow as pa
    import ray

    from spatialjoincountovershells_ray.functions.combine import packed_counts

    arr = np.array(keys, dtype=np.int64)
    parts = [p for p in np.array_split(arr, nsplits) if len(p)]
    ds = ray.data.from_arrow([pa.table({"k": p}) for p in parts])
    out = packed_counts(
        ds,
        lambda batch: batch.column("k").to_numpy(),
        lambda k, c: pa.table({"key": k, "cnt": c}),
    ).to_pandas()
    assert out.cnt.sum() == len(arr)
    want = {int(k): int(c) for k, c in zip(*np.unique(arr, return_counts=True))}
    got = dict(zip(out.key.astype(int), out.cnt.astype(int)))
    assert got == want


def test_packed_counts_rejects_negative_keys():
    import pyarrow as pa
    import pytest
    import ray

    from spatialjoincountovershells_ray.functions.combine import packed_counts

    ds = ray.data.from_arrow(pa.table({"k": np.array([3, -1, 2], dtype=np.int64)}))
    with pytest.raises(Exception, match="non-negative"):
        packed_counts(
            ds,
            lambda batch: batch.column("k").to_numpy(),
            lambda k, c: pa.table({"key": k, "cnt": c}),
        ).materialize()


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    cell=st.sampled_from([60.0, 150.0, 333.0]),
    na=st.integers(1, 40),
    nb=st.integers(1, 120),
)
def test_rect_join_exactly_once_any_cell_size(seed, cell, na, nb):
    """rect_join emits every strictly-overlapping pair exactly once for
    ANY cell size (responsibility rule), including off-box rects."""
    import pyarrow as pa
    import ray

    from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table
    from spatialjoincountovershells_ray.pipelines.tiles import rect_join

    rng = np.random.default_rng(seed)

    def rects(n, wmax, off):
        c = rng.uniform(-100, 1100, size=(n, 2))
        w = rng.uniform(0.5, wmax, size=n)
        return pa.table(
            {
                "id": np.arange(off, off + n, dtype=np.int64),
                "lox": c[:, 0] - w,
                "loy": c[:, 1] - w,
                "hix": c[:, 0] + w,
                "hiy": c[:, 1] + w,
            }
        )

    A, B = rects(na, 200, 0), rects(nb, 40, 10_000)
    got = dataset_to_table(
        rect_join(ray.data.from_arrow(A), ray.data.from_arrow(B), cell=cell)
    ).to_pandas()
    assert not got.duplicated().any()
    a, b = A.to_pandas(), B.to_pandas()
    want = set()
    for _, ra in a.iterrows():
        hit = (
            (np.maximum(ra.lox, b.lox) < np.minimum(ra.hix, b.hix))
            & (np.maximum(ra.loy, b.loy) < np.minimum(ra.hiy, b.hiy))
        )
        want.update((int(ra.id), int(x)) for x in b.id[hit])
    assert set(zip(got.id_a, got.id_b)) == want
