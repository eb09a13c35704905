"""Lon-lat hierarchical cell codec tests (cap cover completeness)."""

import numpy as np

from spatialjoincountovershells_ray.functions import geo


class TestLatLonCells:
    def test_cell_determinism_and_level(self):
        lat = np.array([0.0, 45.0, -89.9, 89.9])
        lon = np.array([0.0, -179.9, 179.9, 10.0])
        c = geo.latlon_cell(lat, lon, 10)
        assert np.array_equal(c, geo.latlon_cell(lat, lon, 10))
        assert (geo.cell_level(c) == 10).all()
        # different points in distinct cells at fine level
        assert len(np.unique(geo.latlon_cell(lat, lon, 16))) == 4

    def test_lon_wrap(self):
        c1 = geo.latlon_cell(np.array([10.0]), np.array([-180.0]), 8)
        c2 = geo.latlon_cell(np.array([10.0]), np.array([180.0]), 8)  # wraps
        assert c1[0] == c2[0]

    def test_parent_containment(self):
        rng = np.random.default_rng(5)
        lat = rng.uniform(-89, 89, 200)
        lon = rng.uniform(-180, 180, 200)
        fine = geo.latlon_cell(lat, lon, 12)
        coarse = geo.latlon_cell(lat, lon, 7)
        assert np.array_equal(geo.cell_parent(fine, 7), coarse)

    def test_cap_cover_complete(self):
        """Every point within radius_km of the center must land in a
        covered cell (the correctness invariant of ball-cover covers)."""
        rng = np.random.default_rng(9)
        for center_lat, center_lon, r_km in [
            (0.0, 0.0, 200.0),
            (60.0, 170.0, 500.0),   # lon wrap at high latitude
            (88.0, 0.0, 400.0),     # polar cap
        ]:
            level = 7
            cover = set(geo.cap_cover(center_lat, center_lon, r_km, level).tolist())
            lat = rng.uniform(-90, 90, 4000)
            lon = rng.uniform(-180, 180, 4000)
            d = geo.haversine_km(center_lat, center_lon, lat, lon)
            inside = d <= r_km
            cells = geo.latlon_cell(lat[inside], lon[inside], level)
            missing = [c for c in cells.tolist() if c not in cover]
            assert not missing

    def test_geo_range_join_matches_brute_force(self):
        import pyarrow as pa
        import ray

        from spatialjoincountovershells_ray.pipelines.geo_join import (
            _a_term,
            a_threshold,
            geo_range_join,
        )
        from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

        rng = np.random.default_rng(11)
        n_pts, n_pl = 3000, 25
        plat = rng.uniform(-88, 88, n_pl)
        plon = rng.uniform(-180, 180, n_pl)
        qlat = rng.uniform(-90, 90, n_pts)
        qlon = rng.uniform(-180, 180, n_pts)
        R = 700.0
        places = pa.table(
            {"place_id": np.arange(n_pl, dtype=np.int64), "lat": plat, "lon": plon}
        )
        points = ray.data.from_arrow(
            pa.table(
                {"point_id": np.arange(n_pts, dtype=np.int64), "lat": qlat, "lon": qlon}
            )
        )
        res = dataset_to_table(geo_range_join(places, points, R)).to_pandas()
        got = set(zip(res.point_id, res.place_id))
        a = _a_term(qlat[:, None], qlon[:, None], plat[None, :], plon[None, :])
        qi, pi = np.nonzero(a <= a_threshold(R))
        assert got == set(zip(qi.tolist(), pi.tolist()))
        assert len(got) > 0

    def test_geo_range_join_shuffle_matches_brute_force(self):
        import pyarrow as pa
        import ray

        from spatialjoincountovershells_ray.pipelines.geo_join import (
            _a_term,
            a_threshold,
            geo_range_join_shuffle,
        )
        from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

        rng = np.random.default_rng(23)
        n_pts, n_pl = 3000, 25
        plat = rng.uniform(-88, 88, n_pl)
        plon = rng.uniform(-180, 180, n_pl)
        qlat = rng.uniform(-90, 90, n_pts)
        qlon = rng.uniform(-180, 180, n_pts)
        R = 700.0
        places = pa.table(
            {"place_id": np.arange(n_pl, dtype=np.int64), "lat": plat, "lon": plon}
        )
        points = ray.data.from_arrow(
            pa.table(
                {"point_id": np.arange(n_pts, dtype=np.int64), "lat": qlat, "lon": qlon}
            )
        )
        res = dataset_to_table(
            geo_range_join_shuffle(places, points, R, nbuckets=8)
        ).to_pandas()
        got = set(zip(res.point_id, res.place_id))
        a = _a_term(qlat[:, None], qlon[:, None], plat[None, :], plon[None, :])
        qi, pi = np.nonzero(a <= a_threshold(R))
        assert got == set(zip(qi.tolist(), pi.tolist()))
        assert len(got) > 0

    def test_haversine_sanity(self):
        # quarter circumference pole-to-equator
        d = geo.haversine_km(np.array([0.0]), np.array([0.0]), np.array([90.0]), np.array([0.0]))
        assert abs(d[0] - np.pi / 2 * geo.EARTH_RADIUS_KM) < 1.0


class TestGeoNearest:
    def test_nearest_matches_brute(self):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray

        from spatialjoincountovershells_ray.pipelines.geo_join import (
            _a_term,
            geo_nearest_place,
        )

        rng = np.random.default_rng(7)
        npl, npt = 40, 3000
        places = pa.table(
            {
                # shuffled ids: exercises the sort-by-id tie-break contract
                "place_id": pa.array(rng.permutation(npl).astype(np.int64)),
                "lat": rng.uniform(-85, 85, npl),
                "lon": rng.uniform(-180, 180, npl),
            }
        )
        pts = pd.DataFrame(
            {
                "point_id": np.arange(npt, dtype=np.int64),
                "lat": rng.uniform(-90, 90, npt),
                "lon": rng.uniform(-180, 180, npt),
            }
        )
        got = (
            geo_nearest_place(
                places, ray.data.from_pandas([d for d in np.array_split(pts, 5)])
            )
            .to_pandas()
            .sort_values("point_id")
            .reset_index(drop=True)
        )
        pid = places.column("place_id").to_numpy()
        order = np.argsort(pid)
        plat = places.column("lat").to_numpy()[order]
        plon = places.column("lon").to_numpy()[order]
        a = _a_term(
            pts.lat.to_numpy()[:, None],
            pts.lon.to_numpy()[:, None],
            plat[None, :],
            plon[None, :],
        )
        exp = pid[order][np.argmin(a, axis=1)]
        assert (got["place_id"].to_numpy() == exp).all()


class TestRectJoin:
    def test_matches_brute_force_and_exactly_once(self):
        import numpy as np
        import pyarrow as pa
        import ray

        from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table
        from spatialjoincountovershells_ray.pipelines.tiles import rect_join

        rng = np.random.default_rng(11)

        def rects(n, wmax, seed_off):
            c = rng.uniform(-50, 1050, size=(n, 2))  # off-box rects included
            w = rng.uniform(1, wmax, size=(n, 1))
            return pa.table(
                {
                    "id": np.arange(seed_off, seed_off + n, dtype=np.int64),
                    "lox": c[:, 0] - w[:, 0],
                    "loy": c[:, 1] - w[:, 0],
                    "hix": c[:, 0] + w[:, 0],
                    "hiy": c[:, 1] + w[:, 0],
                }
            )

        A = rects(80, 180, 0)
        B = rects(400, 25, 1000)
        got = dataset_to_table(
            rect_join(
                ray.data.from_arrow(A).repartition(5),
                ray.data.from_arrow(B).repartition(7),
                cell=150.0,
            )
        ).to_pandas()
        # exactly-once: no duplicate pairs even though rects span many cells
        assert not got.duplicated().any()

        a = A.to_pandas()
        b = B.to_pandas()
        want = set()
        for _, ra in a.iterrows():
            ox = np.maximum(ra.lox, b.lox)
            cx = np.minimum(ra.hix, b.hix)
            oy = np.maximum(ra.loy, b.loy)
            cy = np.minimum(ra.hiy, b.hiy)
            hit = (ox < cx) & (oy < cy)
            for bid in b.id[hit]:
                want.add((int(ra.id), int(bid)))
        assert set(zip(got.id_a, got.id_b)) == want
        assert len(want) > 0


class TestGeoAngularHist:
    def test_matches_bruteforce(self):
        import pyarrow as pa
        import ray

        from spatialjoincountovershells_ray.pipelines.geo_join import (
            _a_term,
            a_threshold,
            geo_angular_hist,
        )

        rng = np.random.default_rng(17)
        # places include near-pole and antimeridian caps (cover edge cases)
        plat = np.concatenate([rng.uniform(-80, 80, 18), [87.0, -5.0]])
        plon = np.concatenate([rng.uniform(-180, 180, 18), [10.0, 179.8]])
        places = pa.table(
            {
                "place_id": np.arange(20, dtype=np.int64),
                "lat": plat,
                "lon": plon,
            }
        )
        qlat = rng.uniform(-89.9, 89.9, 3000)
        qlon = rng.uniform(-180, 180, 3000)
        points = ray.data.from_arrow(
            pa.table(
                {
                    "point_id": np.arange(3000, dtype=np.int64),
                    "lat": qlat,
                    "lon": qlon,
                }
            )
        ).repartition(6)
        radii = (150.0, 500.0, 1200.0, 2500.0)
        got = geo_angular_hist(places, points, radii).to_pandas()
        thrs = np.array([a_threshold(r) for r in radii])
        a = _a_term(qlat[:, None], qlon[:, None], plat[None, :], plon[None, :])
        b = np.searchsorted(thrs, a.ravel(), side="left")
        want = np.bincount(b[b < 4], minlength=4)
        assert got["bin"].tolist() == [0, 1, 2, 3]
        assert got["npairs"].tolist() == want.tolist()
        assert want.sum() > 0
