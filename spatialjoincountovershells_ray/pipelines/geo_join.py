"""Geographic (lon-lat) range join over the hierarchical cell codec.

The cell-key abstraction of the periodic-box engine (SURVEY.md §2.10)
instantiated for spherical geometry: the small "places" side is
cap-covered into cells at an auto-picked level (functions.geo), the
cover is broadcast once as a CSR keyed by cell id, and the big "points"
side streams through map_batches — each batch computes its points'
cells, looks up candidate places via searchsorted, and verifies the
haversine predicate exactly. Same physical plan as the broadcast shell
count (reference A2 semantics, src/astr_rcount/main.c:135-146), with
the spherical codec swapped in for the wrapped uniform grid.

The distance predicate is evaluated in its algebraic "a-term" form,
``sin^2(dlat/2) + cos(lat1)cos(lat2)sin^2(dlon/2) <= sin^2(R/(2E))`` —
monotone-equivalent to haversine <= R — with every float64 operation
mirrored term for term by the DuckDB oracle SQL, so id results match
exactly (no distances are emitted).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.functions import geo
from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

RAD = math.pi / 180.0  # literal shared with the SQL twin


def auto_level(radius_km: float) -> int:
    """Finest level whose cell lat-height still exceeds the cap radius
    (cells ~ radius: small candidate sets, bounded cover size)."""
    dlat_deg = math.degrees(radius_km / geo.EARTH_RADIUS_KM)
    level = int(math.floor(math.log2(180.0 / max(dlat_deg, 1e-9))))
    return max(0, min(geo.MAX_LEVEL, level))


def _a_term(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Haversine a-term, operation-for-operation the SQL twin's shape."""
    p1 = lat1 * RAD
    p2 = lat2 * RAD
    sdlat = np.sin((p2 - p1) * 0.5)
    sdlon = np.sin((lon2 * RAD - lon1 * RAD) * 0.5)
    return sdlat * sdlat + np.cos(p1) * np.cos(p2) * (sdlon * sdlon)


def a_threshold(radius_km: float) -> float:
    """sin^2(R / (2*EARTH_RADIUS)) — embed repr() of this in the SQL."""
    s = math.sin(radius_km / (2.0 * geo.EARTH_RADIUS_KM))
    return s * s


def _cover_lookup_verify(
    ids: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    point_cell: np.ndarray,
    cover_cells: np.ndarray,  # SORTED cover cell ids
    place_of: np.ndarray,  # aligned place row index per cover cell
    plat: np.ndarray,
    plon: np.ndarray,
    pids: np.ndarray,
    thr: float,
) -> pa.Table:
    """Candidate lookup (searchsorted over the sorted cover) + exact
    a-term verify — the per-batch core shared by the broadcast kernel and
    the shuffle plan's bucket reducer."""
    lo = np.searchsorted(cover_cells, point_cell, side="left")
    hi = np.searchsorted(cover_cells, point_cell, side="right")
    cnt = hi - lo
    total = int(cnt.sum())
    if total == 0:
        return pa.table(
            {"point_id": pa.array([], pa.int64()), "place_id": pa.array([], pa.int64())}
        )
    rows = np.repeat(np.arange(len(ids), dtype=np.int64), cnt)
    bounds = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(cnt, out=bounds[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1], cnt)
    cand = place_of[lo[rows] + within]
    a = _a_term(lat[rows], lon[rows], plat[cand], plon[cand])
    keep = a <= thr
    return pa.table(
        {
            "point_id": pa.array(ids[rows[keep]], pa.int64()),
            "place_id": pa.array(pids[cand[keep]], pa.int64()),
        }
    )


class _GeoJoinKernel:
    """Broadcast cover CSR + per-batch candidate lookup and verify."""

    def __init__(self, cover_ref):
        c = ray.get(cover_ref[0]) if isinstance(cover_ref, list) else cover_ref
        self.cells: np.ndarray = c["cells"]  # sorted cover cell ids
        self.place_of: np.ndarray = c["place_of"]  # aligned place row index
        self.pids: np.ndarray = c["pids"]
        self.plat: np.ndarray = c["plat"]
        self.plon: np.ndarray = c["plon"]
        self.level: int = c["level"]
        self.thr: float = c["thr"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("point_id").to_numpy()
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        cell = geo.latlon_cell(lat, lon, self.level)
        return _cover_lookup_verify(
            ids, lat, lon, cell, self.cells, self.place_of,
            self.plat, self.plon, self.pids, self.thr,
        )


class _GeoNearestKernel:
    """Broadcast places; per-batch dense a-term top-k (nearest places)."""

    k: int = 1

    def __init__(self, ref):
        p = ray.get(ref[0]) if isinstance(ref, list) else ref
        self.pids: np.ndarray = p["pids"]  # ascending place_id order
        self.plat: np.ndarray = p["plat"]
        self.plon: np.ndarray = p["plon"]
        self.k = int(p.get("k", 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("point_id").to_numpy()
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        a = _a_term(
            lat[:, None], lon[:, None], self.plat[None, :], self.plon[None, :]
        )
        k = min(self.k, a.shape[1])
        if k == 1:
            # argmin returns the FIRST minimum; places are sorted by
            # place_id, so ties break to the smallest id — the SQL twin's
            # ORDER BY a, place_id exactly
            best = np.argmin(a, axis=1)
            return pa.table(
                {
                    "point_id": pa.array(ids, pa.int64()),
                    "place_id": pa.array(self.pids[best], pa.int64()),
                }
            )
        # stable sort along places: ties resolve to the smaller column
        # index = the smaller place_id, matching ORDER BY a, place_id
        order = np.argsort(a, axis=1, kind="stable")[:, :k]
        return pa.table(
            {
                "point_id": pa.array(np.repeat(ids, k), pa.int64()),
                "place_id": pa.array(self.pids[order].ravel(), pa.int64()),
                "rnk": pa.array(np.tile(np.arange(1, k + 1, dtype=np.int64), len(ids))),
            }
        )


def geo_nearest_place(
    places: "ray.data.Dataset | pa.Table",
    points: "ray.data.Dataset",
    *,
    k: int = 1,
    batch_size: int | None = None,
    sort: bool = False,
) -> "ray.data.Dataset":
    """-> point_id:int64, place_id:int64 [, rnk:int64 when k > 1] — each
    point's k nearest places on the sphere (haversine, evaluated as the
    monotone-equivalent a-term; ties to the smallest place_id).

    Broadcast geo-kNN: the places side rides the object store once and
    every point batch computes a dense vectorized a-term argmin/top-k —
    the spherical analogue of the broadcast shell-count plan. The same
    small-side contract applies; a huge places side would go through the
    cap-cover + expanding-ring machinery instead.
    """
    from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

    tbl = places if isinstance(places, pa.Table) else dataset_to_table(places)
    pids = tbl.column("place_id").to_numpy()
    order = np.argsort(pids, kind="stable")  # tie-break contract
    ref = ray.put(
        {
            "pids": pids[order],
            "plat": tbl.column("lat").to_numpy().astype(np.float64, copy=False)[order],
            "plon": tbl.column("lon").to_numpy().astype(np.float64, copy=False)[order],
            "k": int(k),
        }
    )
    # task mode + per-worker kernel cache: scales to every CPU without an
    # actor-pool cap (stages/join_kernels.run_cached_bcast)
    out = points.map_batches(
        run_cached_bcast,
        fn_kwargs={"cls": _GeoNearestKernel, "ref_list": [ref]},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    return out.sort("point_id") if sort else out


@ray.remote
def _geo_bucket_join(thr: float, npt: int, *parts: pa.Table) -> pa.Table:
    """Per-bucket reducer of the shuffle plan: points and place-cover
    replicas co-located by cell hash; sort the covers, lookup + verify."""
    pts = [p for p in parts[:npt] if p.num_rows]
    pls = [p for p in parts[npt:] if p.num_rows]
    if not pts or not pls:
        return pa.table(
            {"point_id": pa.array([], pa.int64()), "place_id": pa.array([], pa.int64())}
        )
    pt = pa.concat_tables(pts, promote_options="none")
    pl = pa.concat_tables(pls, promote_options="none")
    cells = pl.column("cell").to_numpy()
    order = np.argsort(cells, kind="stable")
    return _cover_lookup_verify(
        pt.column("point_id").to_numpy(),
        pt.column("lat").to_numpy(),
        pt.column("lon").to_numpy(),
        pt.column("cell").to_numpy(),
        cells[order],
        np.arange(len(order), dtype=np.int64),  # each cover row is its own replica
        pl.column("lat").to_numpy()[order],
        pl.column("lon").to_numpy()[order],
        pl.column("place_id").to_numpy()[order],
        thr,
    )


def geo_range_join_shuffle(
    places: "ray.data.Dataset | pa.Table",
    points: "ray.data.Dataset",
    radius_km: float,
    *,
    level: int | None = None,
    nbuckets: int | None = None,
    sort: bool = False,
) -> "ray.data.Dataset":
    """Shuffle-plan geo range join: NO broadcastable-places assumption.

    Both sides stream through cell tagging (places flat-mapped to their
    cap-cover cells, points keyed by their own cell), are hash-bucketed
    by cell with the shared explicit exchange, and each bucket task
    verifies its candidates exactly — the spherical twin of the 3D
    bucket-exchange range join (stages/exchange.bucketed_pair_join).
    The per-place cap-cover loop runs inside map_batches over the places
    stream, so no single process ever holds the full cover."""
    from spatialjoincountovershells_ray.stages.exchange import split_by_key

    level = auto_level(radius_km) if level is None else level
    thr = a_threshold(radius_km)
    if isinstance(places, pa.Table):
        places = ray.data.from_arrow(places)

    def tag_places(batch: pa.Table) -> pa.Table:
        pids = batch.column("place_id").to_numpy()
        plat = batch.column("lat").to_numpy().astype(np.float64, copy=False)
        plon = batch.column("lon").to_numpy().astype(np.float64, copy=False)
        cover_cells, cover_rows = [], []
        for i in range(len(pids)):  # bounded per batch; covers are ragged
            cells = geo.cap_cover(float(plat[i]), float(plon[i]), radius_km, level)
            cover_cells.append(cells)
            cover_rows.append(np.full(len(cells), i, dtype=np.int64))
        cells = np.concatenate(cover_cells) if cover_cells else np.empty(0, np.int64)
        rows = np.concatenate(cover_rows) if cover_rows else np.empty(0, np.int64)
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "place_id": pa.array(pids[rows], pa.int64()),
                "lat": pa.array(plat[rows], pa.float64()),
                "lon": pa.array(plon[rows], pa.float64()),
            }
        )

    def tag_points(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy().astype(np.float64, copy=False)
        lon = batch.column("lon").to_numpy().astype(np.float64, copy=False)
        return pa.table(
            {
                "cell": pa.array(geo.latlon_cell(lat, lon, level), pa.int64()),
                "point_id": batch.column("point_id"),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    nbuckets = nbuckets or max(8, int(ray.cluster_resources().get("CPU", 8)))
    pts = points.map_batches(tag_points, batch_format="pyarrow", zero_copy_batch=True)
    pls = places.map_batches(tag_places, batch_format="pyarrow", zero_copy_batch=True)
    psplits = [
        split_by_key.options(num_returns=nbuckets).remote(b, "cell", nbuckets)
        for b in pts.materialize().to_arrow_refs()
    ]
    csplits = [
        split_by_key.options(num_returns=nbuckets).remote(b, "cell", nbuckets)
        for b in pls.materialize().to_arrow_refs()
    ]
    refs = [
        _geo_bucket_join.remote(
            thr,
            len(psplits),
            *[s[b] for s in psplits],
            *[s[b] for s in csplits],
        )
        for b in range(nbuckets)
    ]
    out = ray.data.from_arrow_refs(refs)
    return out.sort(["point_id", "place_id"]) if sort else out


def geo_range_join(
    places: "ray.data.Dataset | pa.Table",
    points: "ray.data.Dataset",
    radius_km: float,
    *,
    level: int | None = None,
    batch_size: int = 8192,
    sort: bool = False,
) -> "ray.data.Dataset":
    """-> point_id:int64, place_id:int64 — all pairs within radius_km.

    Broadcast plan: precondition is that the places side (plus its cap
    covers) fits the object store — the same small-query-side contract
    as the broadcast shell count; :func:`geo_range_join_shuffle` is the
    bucket-exchange plan when it does not.
    """
    from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

    tbl = places if isinstance(places, pa.Table) else dataset_to_table(places)
    pids = tbl.column("place_id").to_numpy()
    plat = tbl.column("lat").to_numpy().astype(np.float64, copy=False)
    plon = tbl.column("lon").to_numpy().astype(np.float64, copy=False)
    level = auto_level(radius_km) if level is None else level
    # per-place cap covers (small side by contract; each cover is a few
    # dozen cells at the auto level)
    cover_cells = []
    cover_place = []
    for i in range(len(pids)):
        cells = geo.cap_cover(float(plat[i]), float(plon[i]), radius_km, level)
        cover_cells.append(cells)
        cover_place.append(np.full(len(cells), i, dtype=np.int64))
    cells = np.concatenate(cover_cells) if cover_cells else np.empty(0, np.int64)
    place_of = np.concatenate(cover_place) if cover_place else np.empty(0, np.int64)
    order = np.argsort(cells, kind="stable")
    cover_ref = ray.put(
        {
            "cells": cells[order],
            "place_of": place_of[order],
            "pids": pids,
            "plat": plat,
            "plon": plon,
            "level": level,
            "thr": a_threshold(radius_km),
        }
    )
    out = points.map_batches(
        run_cached_bcast,
        fn_kwargs={"cls": _GeoJoinKernel, "ref_list": [cover_ref]},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    return out.sort(["point_id", "place_id"]) if sort else out


class _GeoAngularKernel:
    """Broadcast cover CSR; per-batch (point, place) angular-shell
    bincount partials — the DD(theta) term of the angular two-point
    correlation, the spherical sibling of the reference's radial
    MultiRangeCount (src/objects/RTree/MultiRangeCount.c): same
    cover-lookup candidate generation as the range join, but pairs fold
    to an O(nbins) histogram inside the batch, so the exchange carries
    nbins rows per block instead of the pair set."""

    def __init__(self, ref):
        c = ray.get(ref[0]) if isinstance(ref, list) else ref
        self.cells: np.ndarray = c["cells"]
        self.place_of: np.ndarray = c["place_of"]
        self.plat: np.ndarray = c["plat"]
        self.plon: np.ndarray = c["plon"]
        self.level: int = c["level"]
        self.thrs: np.ndarray = c["thrs"]  # ascending a-term shell edges

    def __call__(self, batch: pa.Table) -> pa.Table:
        nb = len(self.thrs)
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        cell = geo.latlon_cell(lat, lon, self.level)
        lo = np.searchsorted(self.cells, cell, side="left")
        hi = np.searchsorted(self.cells, cell, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {"bin": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        rows = np.repeat(np.arange(len(lat), dtype=np.int64), cnt)
        bounds = np.zeros(len(lat) + 1, dtype=np.int64)
        np.cumsum(cnt, out=bounds[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1], cnt)
        cand = self.place_of[lo[rows] + within]
        a = _a_term(lat[rows], lon[rows], self.plat[cand], self.plon[cand])
        # bin = #{edge < a}; bin == nb means beyond the outermost shell
        # (the cover is a superset of the outermost cap) — discarded
        b = np.searchsorted(self.thrs, a, side="left")
        b = b[b < nb]
        h = np.bincount(b, minlength=nb).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(np.arange(nb, dtype=np.int64)),
                "cnt": pa.array(h),
            }
        )


@ray.remote
def _fold_angular(nb: int, *parts: pa.Table) -> pa.Table:
    tot = np.zeros(nb, dtype=np.int64)
    for t in parts:
        if t.num_rows:
            np.add.at(tot, t.column("bin").to_numpy(), t.column("cnt").to_numpy())
    return pa.table(
        {
            "bin": pa.array(np.arange(nb, dtype=np.int64)),
            "npairs": pa.array(tot),
        }
    )


def geo_angular_hist(
    places: "ray.data.Dataset | pa.Table",
    points: "ray.data.Dataset",
    radii_km: tuple,
    *,
    level: int | None = None,
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """-> bin:int64, npairs:int64 (one row per shell, zeros kept) — the
    angular pair histogram DD(theta): for each (point, place) pair the
    shell index is the count of ladder edges strictly below its
    haversine a-term, pairs beyond radii_km[-1] discarded. One cap-cover
    broadcast (at the outermost radius) + one streaming point pass; the
    result is O(nbins), folded by a single remote task."""
    from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

    radii = sorted(float(r) for r in radii_km)
    tbl = places if isinstance(places, pa.Table) else dataset_to_table(places)
    plat = tbl.column("lat").to_numpy().astype(np.float64, copy=False)
    plon = tbl.column("lon").to_numpy().astype(np.float64, copy=False)
    rmax = radii[-1]
    level = auto_level(rmax) if level is None else level
    cover_cells, cover_place = [], []
    for i in range(len(plat)):
        cells = geo.cap_cover(float(plat[i]), float(plon[i]), rmax, level)
        cover_cells.append(cells)
        cover_place.append(np.full(len(cells), i, dtype=np.int64))
    cells = np.concatenate(cover_cells) if cover_cells else np.empty(0, np.int64)
    place_of = np.concatenate(cover_place) if cover_place else np.empty(0, np.int64)
    order = np.argsort(cells, kind="stable")
    thrs = np.array([a_threshold(r) for r in radii], dtype=np.float64)
    cover_ref = ray.put(
        {
            "cells": cells[order],
            "place_of": place_of[order],
            "plat": plat,
            "plon": plon,
            "level": level,
            "thrs": thrs,
        }
    )
    partials = points.map_batches(
        run_cached_bcast,
        fn_kwargs={"cls": _GeoAngularKernel, "ref_list": [cover_ref]},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    refs = list(partials.materialize().to_arrow_refs())
    if not refs:
        refs = [
            ray.put(
                pa.table({"bin": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
            )
        ]
    return ray.data.from_arrow_refs([_fold_angular.remote(len(radii), *refs)])
