"""Unit tests for the pure-math core: radii, distance, cells, RNG, hashing."""

import math

import numpy as np
import pytest

from spatialjoincountovershells_ray.config import GridSpec, RadiusLadder, logspace_ladder
from spatialjoincountovershells_ray.functions.cells import (
    ball_cover_cells,
    point_cells,
)
from spatialjoincountovershells_ray.functions.distance import (
    bin_counts,
    min_image,
    shell_of,
    torus_d2,
)
from spatialjoincountovershells_ray.functions.hashing import derive_coord, derive_xyz
from spatialjoincountovershells_ray.functions.mt19937 import MT19937, uniform_coords


class TestRadiusLadder:
    def test_log2_spacing_matches_reference_logspace(self):
        # Logspace(2, log2(0.001), log2(5), 40) — reference main.c:645-649
        lad = RadiusLadder.log2_spaced(0.001, 5.0, 40)
        assert lad.nrads == 40
        assert lad.radii[0] == pytest.approx(0.001)
        # last entry pinned exactly to base**b
        assert lad.radii[-1] == 2.0 ** math.log2(5.0)
        ratios = lad.radii[1:] / lad.radii[:-1]
        assert np.allclose(ratios, ratios[0])

    def test_parse_cli_form(self):
        lad = RadiusLadder.parse("0.5:2:3")
        assert np.allclose(lad.radii, [0.5, 1.0, 2.0])
        lad2 = RadiusLadder.parse("1,2,5")
        assert np.allclose(lad2.radii, [1, 2, 5])

    def test_validation(self):
        with pytest.raises(ValueError):
            RadiusLadder(radii=np.array([1.0, 1.0]))
        with pytest.raises(ValueError):
            RadiusLadder(radii=np.array([-1.0, 2.0]))
        with pytest.raises(ValueError):
            logspace_ladder(2, 0, 1, 0)

    def test_single_radius(self):
        assert RadiusLadder(radii=np.array([5.0])).nrads == 1


class TestDistance:
    def test_min_image_wrap(self):
        d = np.array([999.0, -999.0, 400.0, -400.0, 0.0])
        np.testing.assert_allclose(min_image(d), [-1.0, 1.0, 400.0, -400.0, 0.0])

    def test_torus_corner_distances(self):
        # FIXTURES.md §4: corners of {0,999}^3 vs halo at origin
        h = np.array([[0.0, 0.0, 0.0]])
        corners = np.array(
            [
                [0, 0, 0],
                [999, 0, 0],
                [999, 999, 0],
                [999, 999, 999],
                [999, 0, 999],
                [0, 999, 0],
                [0, 999, 999],
                [0, 0, 999],
            ],
            dtype=np.float64,
        )
        d2 = torus_d2(h, corners)
        assert sorted(d2.tolist()) == [0.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 3.0]

    def test_shell_strict_less_tie_rule(self):
        # d2 == r2[i] belongs to shell i+1 (reference MultiRangeCount.c:109)
        r2 = np.array([1.0, 4.0, 16.0])
        assert shell_of(np.array([1.0]), r2)[0] == 1
        assert shell_of(np.array([0.999999]), r2)[0] == 0
        assert shell_of(np.array([16.0]), r2)[0] == 3  # not counted
        assert shell_of(np.array([0.0]), r2)[0] == 0

    def test_float32_mode_stays_float32(self):
        a = np.array([[0.1, 0.2, 0.3]], dtype=np.float32)
        b = np.array([[999.9, 0.2, 0.3]], dtype=np.float32)
        d2 = torus_d2(a, b)
        assert d2.dtype == np.float32

    def test_bin_counts(self):
        r2 = np.array([1.0, 4.0])
        hist = bin_counts(
            np.array([0, 0, 1, 1]), np.array([0.5, 3.0, 0.5, 9.0]), r2, 2
        )
        np.testing.assert_array_equal(hist, [[1, 1], [1, 0]])


class TestCells:
    def test_point_cells_wrap(self):
        grid = GridSpec(ncells=10)
        xyz = np.array([[0.0, 0.0, 0.0], [999.9, 999.9, 999.9], [1000.0, 0.0, 0.0]])
        cells = point_cells(xyz, grid)
        assert cells[0] == 0
        assert cells[1] == 999
        assert cells[2] == 0  # exact box edge wraps to 0

    def test_ball_cover_includes_wrapped_neighbours(self):
        grid = GridSpec(ncells=10)
        row, cell = ball_cover_cells(np.array([[0.5, 0.5, 0.5]]), 5.0, grid)
        # covers 2 cells per axis (indices -1 and 0, wrapped)
        assert len(cell) == 8
        assert 999 in cell  # the (-1,-1,-1) wrapped corner cell

    def test_ball_cover_caps_at_full_box(self):
        grid = GridSpec(ncells=2)
        row, cell = ball_cover_cells(np.array([[500.0, 500.0, 500.0]]), 499.0, grid)
        # ball wider than the box/2: every cell exactly once
        assert sorted(cell.tolist()) == list(range(8))

    def test_particle_single_cell_invariant(self):
        rng = np.random.default_rng(0)
        grid = GridSpec(ncells=7)
        xyz = rng.uniform(0, 1000, size=(500, 3))
        cells = point_cells(xyz, grid)
        assert cells.min() >= 0 and cells.max() < 7**3

    def test_cyl_cover_complete_and_subset_of_ball(self):
        # round-5: the cylinder cover must contain the cell of EVERY
        # point inside the periodic cylinder (completeness) while never
        # exceeding the circumscribed ball cover (the pruning claim)
        from spatialjoincountovershells_ray.functions.cells import cyl_cover_cells

        rng = np.random.default_rng(3)
        grid = GridSpec(ncells=9)
        rp, pi = 120.0, 180.0
        centers = rng.uniform(0, 1000, size=(40, 3))
        row_c, cell_c = cyl_cover_cells(centers, rp, pi, grid)
        row_b, cell_b = ball_cover_cells(centers, float(np.hypot(rp, pi)), grid)
        cov = [set(cell_c[row_c == i]) for i in range(len(centers))]
        ball = [set(cell_b[row_b == i]) for i in range(len(centers))]
        assert all(c <= b for c, b in zip(cov, ball))
        assert sum(len(c) for c in cov) < sum(len(b) for b in ball)
        # completeness: sample points inside each cylinder (min-image)
        for i, c in enumerate(centers):
            ang = rng.uniform(0, 2 * np.pi, 50)
            rr = np.sqrt(rng.uniform(0, 1, 50)) * rp
            dz = rng.uniform(-pi, pi, 50)
            pts = np.stack(
                [c[0] + rr * np.cos(ang), c[1] + rr * np.sin(ang), c[2] + dz], axis=1
            )
            pts = np.mod(pts, 1000.0)
            pc = point_cells(pts, grid)
            assert set(pc.tolist()) <= cov[i]


class TestMT19937:
    def test_reference_vectors(self):
        assert MT19937(5489).genrand_int32(2).tolist() == [3499211612, 581869302]
        assert MT19937(1).genrand_int32(1)[0] == 1791095845

    def test_stream_continuity(self):
        g = MT19937(113)
        a = np.concatenate([g.genrand_int32(13) for _ in range(300)])
        b = MT19937(113).genrand_int32(13 * 300)
        assert np.array_equal(a, b)

    def test_real1_range_and_coords(self):
        g = MT19937(113)
        v = g.genrand_real1(1000)
        assert v.min() >= 0.0 and v.max() <= 1.0
        pts = uniform_coords(MT19937(113), 10)
        assert pts.shape == (10, 3) and pts.dtype == np.float32
        # first coordinate = first raw word / (2^32-1) * 1000
        first = MT19937(113).genrand_int32(1)[0] / 4294967295.0 * 1000.0
        assert pts[0, 0] == np.float32(first)


class TestHashing:
    def test_derive_coord_range_and_determinism(self):
        keys = np.arange(10_000, dtype=np.int64)
        x = derive_coord(keys, 0)
        assert x.min() >= 0 and x.max() < 1000
        assert np.array_equal(x, derive_coord(keys, 0))
        xyz = derive_xyz(keys)
        assert xyz.shape == (10_000, 3)

    def test_derive_matches_duckdb(self):
        import duckdb

        from spatialjoincountovershells_ray.functions.hashing import derive_coord_sql

        keys = np.array([0, 1, 7, 12345, 999_999], dtype=np.int64)
        got = derive_coord(keys, 1)
        sql = f"SELECT {derive_coord_sql('k', 1)} AS v FROM (SELECT unnest([0,1,7,12345,999999]) AS k)"
        want = duckdb.sql(sql).fetchnumpy()["v"]
        assert np.array_equal(got, want)
