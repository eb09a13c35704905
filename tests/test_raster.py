"""rasterize_points / raster_to_vector vs a pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.pipelines.raster import (
    raster_to_vector,
    rasterize_points,
)

L = 25.0


def _points(n=20_000, seed=11):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "x": rng.uniform(0, 500, n),
            "y": rng.uniform(0, 500, n),
        }
    )
    return df


def _raster_oracle(df):
    g = (
        df.assign(
            cell_row=np.floor(df.x / L).astype(np.int64),
            cell_col=np.floor(df.y / L).astype(np.int64),
        )
        .groupby(["cell_row", "cell_col"])
        .size()
        .rename("cnt")
        .reset_index()
    )
    return g.sort_values(["cell_row", "cell_col"]).reset_index(drop=True)


def _runs_oracle(raster):
    ncells, total = len(raster), raster.cnt.sum()
    keep = raster[raster.cnt * ncells >= total]
    out = []
    for row, grp in keep.groupby("cell_row"):
        cols = grp.cell_col.to_numpy()
        cnts = grp.cnt.to_numpy()
        order = np.argsort(cols)
        cols, cnts = cols[order], cnts[order]
        start = 0
        for i in range(1, len(cols) + 1):
            if i == len(cols) or cols[i] != cols[i - 1] + 1:
                out.append(
                    (row, cols[start], cols[i - 1], i - start, cnts[start:i].sum())
                )
                start = i
    return pd.DataFrame(
        out, columns=["cell_row", "col_start", "col_end", "ncells", "total_cnt"]
    ).astype(np.int64)


class TestRaster:
    def test_rasterize_matches_pandas(self):
        df = _points()
        ds = ray.data.from_pandas([d for d in np.array_split(df, 7)])
        got = (
            rasterize_points(ds, L)
            .to_pandas()
            .sort_values(["cell_row", "cell_col"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, _raster_oracle(df), check_dtype=False)

    def test_raster_to_vector_mean_threshold(self):
        df = _points(seed=5)
        ds = ray.data.from_pandas([d for d in np.array_split(df, 5)])
        rast = rasterize_points(ds, L)
        got = (
            raster_to_vector(rast, threshold="mean")
            .to_pandas()
            .sort_values(["cell_row", "col_start"])
            .reset_index(drop=True)
        )
        exp = (
            _runs_oracle(_raster_oracle(df))
            .sort_values(["cell_row", "col_start"])
            .reset_index(drop=True)
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_fixed_threshold_and_run_merging(self):
        # hand-built raster: row 3 has runs [1..3] and [7..8]; row 5 has [2]
        raster = ray.data.from_arrow(
            pa.table(
                {
                    "cell_row": pa.array([3, 3, 3, 3, 3, 5, 5], pa.int64()),
                    "cell_col": pa.array([1, 2, 3, 7, 8, 2, 9], pa.int64()),
                    "cnt": pa.array([5, 6, 7, 9, 1, 4, 0], pa.int64()),
                }
            )
        )
        got = (
            raster_to_vector(raster, threshold=4)
            .to_pandas()
            .sort_values(["cell_row", "col_start"])
            .reset_index(drop=True)
        )
        exp = pd.DataFrame(
            {
                "cell_row": [3, 3, 5],
                "col_start": [1, 7, 2],
                "col_end": [3, 7, 2],
                "ncells": [3, 1, 1],
                "total_cnt": [18, 9, 4],
            }
        ).astype(np.int64)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestPyramid:
    def test_pyramid_matches_pandas_and_rolls_up(self):
        from spatialjoincountovershells_ray.pipelines.raster import pyramid_counts

        rng = np.random.default_rng(23)
        npts = 30_000
        df = pd.DataFrame(
            {
                "lon": rng.uniform(-180, 179.99, npts),
                "lat": rng.uniform(-90, 89.99, npts),
            }
        )
        ds = ray.data.from_pandas([d for d in np.array_split(df, 6)])
        got = (
            pyramid_counts(ds, 5, 3)
            .to_pandas()
            .sort_values(["level", "ix", "iy"])
            .reset_index(drop=True)
        )
        # every level's counts sum to the point total
        assert (got.groupby("level").cnt.sum() == npts).all()
        # pandas oracle: finest from floor, coarse from integer halving
        n = float(1 << 5)
        fx = np.floor((df.lon.to_numpy() + 180.0) / 360.0 * n).astype(np.int64)
        fy = np.floor((df.lat.to_numpy() + 90.0) / 180.0 * n).astype(np.int64)
        for d, lv in enumerate([5, 4, 3]):
            exp = (
                pd.DataFrame({"ix": fx >> d, "iy": fy >> d})
                .groupby(["ix", "iy"])
                .size()
                .rename("cnt")
                .reset_index()
                .sort_values(["ix", "iy"])
                .reset_index(drop=True)
            )
            g = got[got.level == lv][["ix", "iy", "cnt"]].reset_index(drop=True)
            pd.testing.assert_frame_equal(g, exp, check_dtype=False)


class TestPowerSpectrum:
    def test_matches_direct_dft(self):
        """Independent oracle: explicit direct DFT of the gridded
        overdensity on a tiny grid, same NGP/shell-binning convention."""
        import numpy as np
        import pyarrow as pa
        import ray

        from spatialjoincountovershells_ray.functions.mt19937 import MT19937, uniform_coords
        from spatialjoincountovershells_ray.pipelines.raster import power_spectrum
        from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

        ngrid, box, nkbins = 8, 1000.0, 4
        pxyz = uniform_coords(MT19937(17), 4000)
        parts = pa.table(
            {
                "particle_id": np.arange(4000, dtype=np.int64),
                "x": pxyz[:, 0],
                "y": pxyz[:, 1],
                "z": pxyz[:, 2],
            }
        )
        got = dataset_to_table(
            power_spectrum(
                ray.data.from_arrow(parts).repartition(5), ngrid, box, nkbins
            )
        ).to_pandas().sort_values("kbin").reset_index(drop=True)

        # oracle: NGP grid -> direct full-cube DFT -> same integer shells
        L = box / ngrid
        idx = (
            np.floor(pxyz[:, 0] / L).astype(int) * ngrid
            + np.floor(pxyz[:, 1] / L).astype(int)
        ) * ngrid + np.floor(pxyz[:, 2] / L).astype(int)
        dense = np.bincount(idx, minlength=ngrid**3).astype(float).reshape(ngrid, ngrid, ngrid)
        delta = dense / dense.mean() - 1.0
        n = np.fft.fftfreq(ngrid, d=1.0 / ngrid)
        # explicit DFT (matmul per axis) — independent of rfftn
        w = np.exp(-2j * np.pi * np.outer(n, np.arange(ngrid)) / ngrid)
        fk = np.einsum("ax,by,cz,xyz->abc", w, w, w, delta) / ngrid**3
        p3 = (box**3) * np.abs(fk) ** 2
        nn = np.sqrt(n[:, None, None] ** 2 + n[None, :, None] ** 2 + n[None, None, :] ** 2)
        kidx = np.rint(nn).astype(int)
        want = {}
        for kb in range(1, nkbins + 1):
            m = kidx == kb
            if m.sum():
                want[kb] = (int(m.sum()), p3[m].mean())
        assert got["kbin"].tolist() == sorted(want)
        for _, row in got.iterrows():
            nm, pk = want[int(row.kbin)]
            assert int(row.nmodes) == nm
            np.testing.assert_allclose(row.pk, pk, rtol=1e-10)
        assert len(got) == nkbins


class TestDensityPeaks:
    def test_matches_brute_force_periodic(self):
        import numpy as np
        import pyarrow as pa
        import ray

        from spatialjoincountovershells_ray.functions.mt19937 import MT19937, uniform_coords
        from spatialjoincountovershells_ray.pipelines.raster import density_peaks
        from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

        ngrid, box = 6, 1000.0
        pxyz = uniform_coords(MT19937(23), 2500).astype(np.float64)
        parts = pa.table(
            {
                "particle_id": np.arange(2500, dtype=np.int64),
                "x": pxyz[:, 0],
                "y": pxyz[:, 1],
                "z": pxyz[:, 2],
            }
        )
        got = dataset_to_table(
            density_peaks(ray.data.from_arrow(parts).repartition(4), ngrid, box)
        ).to_pandas().sort_values(["ix", "iy", "iz"]).reset_index(drop=True)

        L = box / ngrid
        idx = (
            np.floor(pxyz[:, 0] / L).astype(int) * ngrid
            + np.floor(pxyz[:, 1] / L).astype(int)
        ) * ngrid + np.floor(pxyz[:, 2] / L).astype(int)
        g = np.bincount(idx, minlength=ngrid**3).reshape(ngrid, ngrid, ngrid)
        want = []
        for i in range(ngrid):
            for j in range(ngrid):
                for k in range(ngrid):
                    nb = [
                        g[(i + a) % ngrid, (j + b) % ngrid, (k + c) % ngrid]
                        for a in (-1, 0, 1)
                        for b in (-1, 0, 1)
                        for c in (-1, 0, 1)
                        if not (a == b == c == 0)
                    ]
                    if g[i, j, k] > max(nb):
                        want.append((i, j, k, int(g[i, j, k])))
        assert list(zip(got.ix, got.iy, got.iz, got.cnt)) == want
        assert len(want) > 0


class TestVoidFraction:
    def test_matches_brute_force_ladder(self):
        import numpy as np
        import pyarrow as pa
        import ray

        from spatialjoincountovershells_ray.functions.mt19937 import MT19937, uniform_coords
        from spatialjoincountovershells_ray.pipelines.raster import void_fraction
        from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

        ngrid, box = 8, 1000.0
        pxyz = uniform_coords(MT19937(41), 300).astype(np.float64)
        parts = pa.table(
            {
                "particle_id": np.arange(300, dtype=np.int64),
                "x": pxyz[:, 0],
                "y": pxyz[:, 1],
                "z": pxyz[:, 2],
            }
        )
        got = dataset_to_table(
            void_fraction(ray.data.from_arrow(parts).repartition(3), ngrid, box, nlevels=3)
        ).to_pandas().sort_values("level").reset_index(drop=True)

        L = box / ngrid
        ig = np.floor(pxyz / L).astype(int)
        for lv in range(3):
            n = ngrid >> lv
            cells = set(map(tuple, ig >> lv))
            assert int(got.loc[lv, "ncells"]) == n**3
            assert int(got.loc[lv, "n_empty"]) == n**3 - len(cells)
        assert got.loc[0, "n_empty"] > 0  # sparse fixture: voids exist
