"""Raster <-> vector conversion operators.

The engine's tile codec (pipelines/tiles.py) assigns vector points to
raster tiles; these two operators complete the round trip the north
rule names ("raster<->vector"):

- :func:`rasterize_points` — vector -> raster: a point stream becomes a
  2-D grid of per-cell counts. Each ``map_batches`` task pre-aggregates
  its batch to at most one row per touched cell (np.unique combiner), so
  the exchange carries O(cells) partials, never raw points — the same
  partial-then-groupby shape as the shell-count histogram merge
  (reference accumulates counts the same way across files,
  src/astr_rcount/main.c:351-368).
- :func:`raster_to_vector` — raster -> vector: cells at or above a
  threshold are merged into maximal horizontal runs (one rectangle per
  row-contiguous island), the classic run-length vectorization. The
  default adaptive threshold ("mean") keeps cells whose count is >= the
  raster's mean, evaluated in exact integer arithmetic
  (cnt * ncells >= total) so the DuckDB twin matches bit-for-bit with
  no float tolerance.

Scale notes: the raster itself is bounded by the grid size (cells), not
the input size, so the driver-side scalar aggregate in the adaptive
threshold and the per-row ``map_groups`` both operate on grid-bounded
data. Rasterizing 100 TB of points is the map-side combiner's job; what
shuffles is one partial row per (task, cell).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def rasterize_points(
    points: "ray.data.Dataset",
    L: float,
    xcol: str = "x",
    ycol: str = "y",
) -> "ray.data.Dataset":
    """-> (cell_row:int64, cell_col:int64, cnt:int64), one row per
    non-empty cell of the L-sized grid over (xcol, ycol)."""
    from spatialjoincountovershells_ray.functions.combine import packed_counts

    # single int64 groupby key: rows/cols are grid indices (small,
    # non-negative for in-box data); 2^21 columns of headroom keeps the
    # pack collision-free for any realistic grid while staying in int64
    K = np.int64(1) << 21

    def pack(batch: pa.Table) -> np.ndarray:
        r = np.floor(batch.column(xcol).to_numpy() / L).astype(np.int64)
        c = np.floor(batch.column(ycol).to_numpy() / L).astype(np.int64)
        return r * K + c

    def unpack(cell: np.ndarray, cnt) -> pa.Table:
        return pa.table({"cell_row": cell // K, "cell_col": cell % K, "cnt": cnt})

    return packed_counts(points, pack, unpack)


def pyramid_counts(
    points: "ray.data.Dataset",
    finest_level: int,
    nlevels: int,
    xcol: str = "lon",
    ycol: str = "lat",
) -> "ray.data.Dataset":
    """Multi-resolution cell-count pyramid over lon/lat points.

    -> (level:int64, ix:int64, iy:int64, cnt:int64) for levels
    ``finest_level .. finest_level-nlevels+1``. The input is scanned
    ONCE: per-batch combiners count finest-level cells, one groupby
    merges them, and every coarser level is an integer-halving rollup of
    the previous level's (grid-bounded) raster — the tile-pyramid
    aggregation a map-tile service runs, with no re-scan per zoom level.
    Coarse indices derive from the finest by ``// 2`` (exact int64), so
    the SQL twin can reproduce them bit-for-bit from the same finest
    expression."""
    from spatialjoincountovershells_ray.functions.combine import packed_counts

    n = np.float64(1 << finest_level)

    def pack(batch: pa.Table) -> np.ndarray:
        ix = np.floor((batch.column(xcol).to_numpy() + 180.0) / 360.0 * n).astype(np.int64)
        iy = np.floor((batch.column(ycol).to_numpy() + 90.0) / 180.0 * n).astype(np.int64)
        return ix * np.int64(1 << 32) + iy

    # materialized per level: every level's raster is grid-bounded (tiny)
    # and is consumed by BOTH the output union and the next rollup — the
    # barrier guarantees the points are scanned exactly once
    level_ds = packed_counts(
        points, pack, lambda k, c: pa.table({"cell": k, "cnt": c})
    ).materialize()

    def unpack(batch: pa.Table, level: int) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        cname = "sum(cnt)" if "sum(cnt)" in batch.schema.names else "cnt"
        return pa.table(
            {
                "level": np.full(len(cell), level, dtype=np.int64),
                "ix": cell >> 32,
                "iy": cell & np.int64(0xFFFFFFFF),
                "cnt": batch.column(cname),
            }
        )

    def halve(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        cname = "sum(cnt)" if "sum(cnt)" in batch.schema.names else "cnt"
        coarse = ((cell >> 32) // 2) * np.int64(1 << 32) + (cell & np.int64(0xFFFFFFFF)) // 2
        return pa.table({"cell": coarse, "cnt": batch.column(cname)})

    outs = [
        level_ds.map_batches(
            unpack, fn_kwargs={"level": finest_level},
            batch_format="pyarrow", zero_copy_batch=True,
        )
    ]
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def merge_cells(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "cell" not in tbl.schema.names:
            return pa.table({"cell": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        c = tbl.column("cell").to_numpy()
        n = tbl.column("cnt").to_numpy()
        order = np.argsort(c, kind="stable")
        cs, ns = c[order], n[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        return pa.table(
            {"cell": cs[starts], "cnt": np.add.reduceat(ns, starts).astype(np.int64)}
        )

    for lv in range(finest_level - 1, finest_level - nlevels, -1):
        halved = level_ds.map_batches(halve, batch_format="pyarrow", zero_copy_batch=True)
        # per-level merge through the bucket exchange (not a Dataset
        # groupby): each level's raster is grid-bounded, the exchange
        # carries one (cell, cnt) row per distinct cell per block
        level_ds = keyed_partition_apply(halved, "cell", merge_cells).materialize()
        outs.append(
            level_ds.map_batches(
                unpack, fn_kwargs={"level": lv},
                batch_format="pyarrow", zero_copy_batch=True,
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def _runs_in_row(batch: pa.Table) -> pa.Table:
    """Vectorized gaps-and-islands over one cell_row group."""
    rows = batch.column("cell_row").to_numpy()
    cols = batch.column("cell_col").to_numpy()
    cnts = batch.column("cnt").to_numpy()
    order = np.argsort(cols)
    cols, cnts = cols[order], cnts[order]
    # a new run starts wherever the column index jumps by more than 1
    starts = np.flatnonzero(np.concatenate(([True], np.diff(cols) > 1)))
    ends = np.concatenate((starts[1:], [len(cols)]))
    return pa.table(
        {
            "cell_row": np.full(len(starts), rows[0], dtype=np.int64),
            "col_start": cols[starts],
            "col_end": cols[ends - 1],
            "ncells": (ends - starts).astype(np.int64),
            "total_cnt": np.add.reduceat(cnts, starts).astype(np.int64),
        }
    )


def raster_to_vector(
    raster: "ray.data.Dataset",
    threshold: "int | str" = "mean",
) -> "ray.data.Dataset":
    """Merge cells with cnt >= threshold into per-row rectangles.

    -> (cell_row, col_start, col_end, ncells:int64, total_cnt:int64).

    ``threshold='mean'`` keeps cells at or above the raster's mean count,
    decided as ``cnt * ncells >= total`` in int64 (exact, scale-free:
    roughly half the cells survive at any data volume). The two scalars
    come from one tiny aggregate over the grid-bounded raster.
    """
    if threshold == "mean":
        # grid-bounded, so materializing is cheap — and without it the
        # aggregate below and the filter stage would each re-execute the
        # entire upstream rasterize pipeline (double input scan)
        raster = raster.materialize()
        agg = raster.aggregate(
            ray.data.aggregate.Count(), ray.data.aggregate.Sum("cnt")
        )
        # empty raster: aggregate yields no/None fields; pass-through (the
        # downstream map_groups over zero rows emits zero rows either way)
        ncells = np.int64(agg.get("count()") or 0) if agg else np.int64(0)
        total = np.int64(agg.get("sum(cnt)") or 0) if agg else np.int64(0)

        def keep(batch: pa.Table) -> pa.Table:
            c = batch.column("cnt").to_numpy()
            return batch.filter(pa.array(c * ncells >= total))

    else:
        thr = np.int64(threshold)

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.greater_equal(batch.column("cnt"), thr))

    kept = raster.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return kept.groupby("cell_row").map_groups(_runs_in_row, batch_format="pyarrow")


@ray.remote
def _count_of_counts(total_cells: int, *parts: pa.Table) -> pa.Table:
    """Occupancy table -> P(N) rows, with the empty-cell row derived from
    the known grid size (occupied cells never ship a zero row)."""
    live = [t for t in parts if t.num_rows]
    occupied = 0
    ns = []
    for t in live:
        occupied += t.num_rows
        ns.append(t.column("n").to_numpy())
    if ns:
        uniq, cnt = np.unique(np.concatenate(ns), return_counts=True)
    else:
        uniq, cnt = np.empty(0, np.int64), np.empty(0, np.int64)
    n_out = np.concatenate(([0], uniq.astype(np.int64)))
    c_out = np.concatenate(([total_cells - occupied], cnt.astype(np.int64)))
    return pa.table(
        {"n_particles": pa.array(n_out, pa.int64()), "ncells_with": pa.array(c_out, pa.int64())}
    )


def counts_in_cells(
    points: "ray.data.Dataset",
    ncells: int,
    box: float,
    cols: tuple[str, str, str] = ("x", "y", "z"),
) -> "ray.data.Dataset":
    """Counts-in-cells distribution P(N): n_particles:int64,
    ncells_with:int64 — for every occupancy N (including N = 0), how many
    of the ncells^3 grid cells hold exactly N points.

    The one-point statistic of large-scale-structure analysis (the
    moments of P(N) estimate clustering amplitude), computed with the
    packed-key combiner: the exchange carries one (cell, count) row per
    distinct cell per task, and the count-of-counts + empty-cell row fold
    in one remote task over the grid-bounded occupancy table.
    """
    from spatialjoincountovershells_ray.functions.combine import packed_counts

    L = box / ncells
    K = np.int64(ncells)

    def pack(batch: pa.Table) -> np.ndarray:
        ix = np.floor(batch.column(cols[0]).to_numpy() / L).astype(np.int64)
        iy = np.floor(batch.column(cols[1]).to_numpy() / L).astype(np.int64)
        iz = np.floor(batch.column(cols[2]).to_numpy() / L).astype(np.int64)
        return (ix * K + iy) * K + iz

    occ = packed_counts(points, pack, lambda k, c: pa.table({"cell": k, "n": c}))
    refs = list(occ.materialize().to_arrow_refs())
    if not refs:
        refs = [ray.put(pa.table({"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}))]
    return ray.data.from_arrow_refs([_count_of_counts.remote(ncells**3, *refs)])


@ray.remote
def _fft_power(ngrid: int, box: float, nkbins: int, *parts: pa.Table) -> pa.Table:
    """Gridded counts -> binned power spectrum, one grid-bounded task."""
    dense = np.zeros(ngrid * ngrid * ngrid, dtype=np.float64)
    total = 0
    for t in parts:
        if t.num_rows:
            c = t.column("cell").to_numpy()
            n = t.column("n").to_numpy()
            dense[c] += n
            total += int(n.sum())
    if total == 0:
        return pa.table(
            {
                "kbin": pa.array([], pa.int64()),
                "nmodes": pa.array([], pa.int64()),
                "pk": pa.array([], pa.float64()),
            }
        )
    dense = dense.reshape(ngrid, ngrid, ngrid)
    nbar = total / ngrid**3
    delta = dense / nbar - 1.0
    # P(k) = V * |delta_k|^2 with delta_k = FFT(delta)/ngrid^3 (the
    # standard NGP estimator, no shot-noise or window deconvolution —
    # documented raw-estimator convention)
    fk = np.fft.rfftn(delta) / ngrid**3
    p3 = (box**3) * (fk.real**2 + fk.imag**2)
    # integer |n| shells in units of the fundamental mode 2*pi/box
    nx = np.fft.fftfreq(ngrid, d=1.0 / ngrid)
    nz = np.arange(p3.shape[2], dtype=np.float64)
    nn = np.sqrt(
        nx[:, None, None] ** 2 + nx[None, :, None] ** 2 + nz[None, None, :] ** 2
    )
    kidx = np.rint(nn).astype(np.int64)
    # rfft half-plane: weight interior kz planes twice so shell averages
    # cover the full sphere of modes (kz=0 and the Nyquist plane are
    # self-conjugate and counted once)
    w = np.full(p3.shape, 2.0)
    w[:, :, 0] = 1.0
    if ngrid % 2 == 0:
        w[:, :, -1] = 1.0
    keep = (kidx >= 1) & (kidx <= nkbins)
    flat_idx = kidx[keep]
    psum = np.bincount(flat_idx, weights=(p3 * w)[keep], minlength=nkbins + 1)
    msum = np.bincount(flat_idx, weights=w[keep], minlength=nkbins + 1)
    kb = np.arange(1, nkbins + 1, dtype=np.int64)
    nmodes = msum[1:]
    with np.errstate(invalid="ignore"):
        pk = psum[1:] / nmodes
    m = nmodes > 0
    return pa.table(
        {
            "kbin": pa.array(kb[m]),
            "nmodes": pa.array(nmodes[m].astype(np.int64)),
            "pk": pa.array(pk[m], pa.float64()),
        }
    )


def power_spectrum(
    points: "ray.data.Dataset",
    ngrid: int,
    box: float,
    nkbins: int = 8,
    cols: tuple[str, str, str] = ("x", "y", "z"),
) -> "ray.data.Dataset":
    """Matter power spectrum estimate P(k): kbin:int64 (|k| in units of
    the fundamental mode 2*pi/box), nmodes:int64, pk:float64.

    The Fourier-space sibling of the pair-correlation estimators:
    nearest-grid-point mass assignment runs distributed through the
    packed-key combiner (the exchange carries one (cell, count) row per
    distinct cell per task), and ONE remote task holds the grid-bounded
    density field, FFTs the overdensity and bin-averages |delta_k|^2
    over integer |k| shells (raw NGP estimator: no shot-noise
    subtraction, no window deconvolution — the documented convention the
    pytest oracle replays with an independent direct DFT).

    Scale contract: the grid (ngrid^3 float64) must fit one task —
    ngrid=256 is 128 MB; the input point count is unbounded.
    """
    from spatialjoincountovershells_ray.functions.combine import packed_counts

    L = box / ngrid
    K = np.int64(ngrid)

    def pack(batch: pa.Table) -> np.ndarray:
        ix = np.floor(batch.column(cols[0]).to_numpy() / L).astype(np.int64)
        iy = np.floor(batch.column(cols[1]).to_numpy() / L).astype(np.int64)
        iz = np.floor(batch.column(cols[2]).to_numpy() / L).astype(np.int64)
        return (ix * K + iy) * K + iz

    occ = packed_counts(points, pack, lambda k, c: pa.table({"cell": k, "n": c}))
    refs = list(occ.materialize().to_arrow_refs())
    if not refs:
        refs = [ray.put(pa.table({"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}))]
    return ray.data.from_arrow_refs([_fft_power.remote(ngrid, box, nkbins, *refs)])


@ray.remote
def _find_peaks(ngrid: int, min_count: int, *parts: pa.Table) -> pa.Table:
    """Occupancy partials -> strict periodic 26-neighborhood local maxima."""
    dense = np.zeros(ngrid * ngrid * ngrid, dtype=np.int64)
    for t in parts:
        if t.num_rows:
            dense[t.column("cell").to_numpy()] += t.column("n").to_numpy()
    g = dense.reshape(ngrid, ngrid, ngrid)
    peak = g >= min_count
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if dx == dy == dz == 0:
                    continue
                peak &= g > np.roll(np.roll(np.roll(g, dx, 0), dy, 1), dz, 2)
    ix, iy, iz = np.nonzero(peak)
    return pa.table(
        {
            "ix": pa.array(ix.astype(np.int64)),
            "iy": pa.array(iy.astype(np.int64)),
            "iz": pa.array(iz.astype(np.int64)),
            "cnt": pa.array(g[ix, iy, iz]),
        }
    )


def density_peaks(
    points: "ray.data.Dataset",
    ngrid: int,
    box: float,
    min_count: int = 1,
    cols: tuple[str, str, str] = ("x", "y", "z"),
) -> "ray.data.Dataset":
    """Density peaks: ix, iy, iz, cnt:int64 — grid cells that are STRICT
    local maxima of the occupancy field over their periodic
    26-neighborhood, with cnt >= min_count. The grid-based cluster/peak
    finder (the overdensity-seed step of halo finding): mass assignment
    runs distributed through the packed-key combiner; the grid-bounded
    peak scan is one remote task (np.roll wraps = the periodic
    boundary). Strict > against every neighbor makes peaks unique per
    plateau-free field and the SQL twin exact."""
    from spatialjoincountovershells_ray.functions.combine import packed_counts

    L = box / ngrid
    K = np.int64(ngrid)

    def pack(batch: pa.Table) -> np.ndarray:
        ix = np.floor(batch.column(cols[0]).to_numpy() / L).astype(np.int64)
        iy = np.floor(batch.column(cols[1]).to_numpy() / L).astype(np.int64)
        iz = np.floor(batch.column(cols[2]).to_numpy() / L).astype(np.int64)
        return (ix * K + iy) * K + iz

    occ = packed_counts(points, pack, lambda k, c: pa.table({"cell": k, "n": c}))
    refs = list(occ.materialize().to_arrow_refs())
    if not refs:
        refs = [ray.put(pa.table({"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}))]
    return ray.data.from_arrow_refs([_find_peaks.remote(ngrid, min_count, *refs)])


@ray.remote
def _void_levels(ngrid: int, nlevels: int, *parts: pa.Table) -> pa.Table:
    """Occupancy partials -> per-coarsening-level empty-cell counts."""
    dense = np.zeros(ngrid * ngrid * ngrid, dtype=np.int64)
    for t in parts:
        if t.num_rows:
            dense[t.column("cell").to_numpy()] += t.column("n").to_numpy()
    g = dense.reshape(ngrid, ngrid, ngrid)
    levels, ncells, nempty = [], [], []
    for lv in range(nlevels):
        n = g.shape[0]
        levels.append(lv)
        ncells.append(n**3)
        nempty.append(int((g == 0).sum()))
        if n % 2 or n < 2:
            break
        g = (
            g.reshape(n // 2, 2, n // 2, 2, n // 2, 2)
            .sum(axis=(1, 3, 5))
        )
    return pa.table(
        {
            "level": pa.array(np.array(levels, np.int64)),
            "ncells": pa.array(np.array(ncells, np.int64)),
            "n_empty": pa.array(np.array(nempty, np.int64)),
        }
    )


def void_fraction(
    points: "ray.data.Dataset",
    ngrid: int,
    box: float,
    nlevels: int = 4,
    cols: tuple[str, str, str] = ("x", "y", "z"),
) -> "ray.data.Dataset":
    """Void probability statistics: level:int64 (0 = finest, each next
    level halves the grid), ncells:int64, n_empty:int64 — how many cells
    of side box/(ngrid>>level) hold zero points. n_empty/ncells is the
    counts-in-cells estimate of the void probability function P0(R), the
    standard emptiness statistic of large-scale structure. One
    distributed mass-assignment pass (packed-key combiner); the
    grid-bounded coarsening ladder folds in one remote task (integer
    2x2x2 sums — exact)."""
    from spatialjoincountovershells_ray.functions.combine import packed_counts

    L = box / ngrid
    K = np.int64(ngrid)

    def pack(batch: pa.Table) -> np.ndarray:
        ix = np.floor(batch.column(cols[0]).to_numpy() / L).astype(np.int64)
        iy = np.floor(batch.column(cols[1]).to_numpy() / L).astype(np.int64)
        iz = np.floor(batch.column(cols[2]).to_numpy() / L).astype(np.int64)
        return (ix * K + iy) * K + iz

    occ = packed_counts(points, pack, lambda k, c: pa.table({"cell": k, "n": c}))
    refs = list(occ.materialize().to_arrow_refs())
    if not refs:
        refs = [ray.put(pa.table({"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}))]
    return ray.data.from_arrow_refs([_void_levels.remote(ngrid, nlevels, *refs)])
