"""Tile assignment and point-in-polygon joins.

- ``tile_assign``: raster<->vector assignment — every point gets the id
  of the grid tile containing it (the engine's cell-key codec applied as
  a user-facing operator; tile ids are the flattened floor(c/L) keys).
- ``point_in_rects``: point-in-polygon against a broadcast set of
  axis-aligned boxes (half-open [lo, hi) per axis) — vectorized interval
  tests, no shuffle of the point side.
- ``point_in_polygons``: general 2-D polygons via a vectorized
  even-odd ray-casting kernel (no external geometry lib); polygons are
  broadcast, points stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import default_pool


def tile_assign(
    points: "ray.data.Dataset",
    L: float,
    ntiles_per_axis: int,
    id_col: str = "particle_id",
) -> "ray.data.Dataset":
    """-> (id_col, tile_id:int64); tile = (ix*n + iy)*n + iz."""

    def assign(batch: pa.Table) -> pa.Table:
        n = np.int64(ntiles_per_axis)
        ids = batch.column(id_col).to_numpy()
        ix = np.floor(batch.column("x").to_numpy() / L).astype(np.int64)
        iy = np.floor(batch.column("y").to_numpy() / L).astype(np.int64)
        iz = np.floor(batch.column("z").to_numpy() / L).astype(np.int64)
        tile = (ix * n + iy) * n + iz
        return pa.table({id_col: ids, "tile_id": tile})

    return points.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


class _RectJoin:
    """Broadcast-rectangle containment kernel with a 2D bin index.

    A dense N x R mask is O(N*R) comparisons regardless of selectivity
    (measured ~5-7 s for 600 k x 100 at sf0.1); binning the rectangles
    into a GxG grid once per worker and probing each point's bin cuts the
    candidate count to the rects actually near the point — the same
    sorted-cover searchsorted/repeat shape as the spatial and geo
    kernels. Out-of-box coordinates clip to edge bins on BOTH sides, so
    overlap relationships survive clipping."""

    G = 32
    SPAN = 1000.0  # [0, 1000]^2 box shared with the rect fixtures

    def __init__(self, rects_ref, id_col: str):
        r = ray.get(rects_ref[0]) if isinstance(rects_ref, list) else rects_ref
        self.poly_ids: np.ndarray = r["poly_ids"]
        self.lo: np.ndarray = r["lo"]  # [R, 2]
        self.hi: np.ndarray = r["hi"]
        self.id_col = id_col
        G = self.G
        self.binw = self.SPAN / G
        bx0 = np.clip(np.floor(self.lo[:, 0] / self.binw).astype(np.int64), 0, G - 1)
        by0 = np.clip(np.floor(self.lo[:, 1] / self.binw).astype(np.int64), 0, G - 1)
        # hi is an exclusive bound: a rect ending exactly on a bin edge
        # does not reach the next bin
        bx1 = np.clip(np.ceil(self.hi[:, 0] / self.binw).astype(np.int64) - 1, 0, G - 1)
        by1 = np.clip(np.ceil(self.hi[:, 1] / self.binw).astype(np.int64) - 1, 0, G - 1)
        bins, rects = [], []
        for i in range(len(self.poly_ids)):  # R is small by contract
            xs = np.arange(bx0[i], bx1[i] + 1, dtype=np.int64)
            ys = np.arange(by0[i], by1[i] + 1, dtype=np.int64)
            bid = (xs[:, None] * G + ys[None, :]).ravel()
            bins.append(bid)
            rects.append(np.full(len(bid), i, dtype=np.int64))
        allb = np.concatenate(bins) if bins else np.empty(0, np.int64)
        allr = np.concatenate(rects) if rects else np.empty(0, np.int64)
        order = np.argsort(allb, kind="stable")
        self.rect_of = allr[order]
        self.offsets = np.searchsorted(allb[order], np.arange(G * G + 1, dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        G = self.G
        bx = np.clip(np.floor(x / self.binw).astype(np.int64), 0, G - 1)
        by = np.clip(np.floor(y / self.binw).astype(np.int64), 0, G - 1)
        bid = bx * G + by
        lo_i = self.offsets[bid]
        cnt = self.offsets[bid + 1] - lo_i
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {self.id_col: pa.array([], pa.int64()), "poly_id": pa.array([], pa.int64())}
            )
        rows = np.repeat(np.arange(len(ids), dtype=np.int64), cnt)
        bounds = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(cnt, out=bounds[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1], cnt)
        cand = self.rect_of[lo_i[rows] + within]
        px, py = x[rows], y[rows]
        keep = (
            (px >= self.lo[cand, 0])
            & (px < self.hi[cand, 0])
            & (py >= self.lo[cand, 1])
            & (py < self.hi[cand, 1])
        )
        return pa.table(
            {self.id_col: ids[rows[keep]], "poly_id": self.poly_ids[cand[keep]]}
        )


_TILE_CACHE: dict[tuple, object] = {}


def _run_cached(batch, cls, ref_list, id_col):
    """Task-mode wrapper with per-worker kernel cache (tasks reuse warm
    worker processes; actor pools pay a fresh spawn per dataset — see
    join_kernels.run_broadcast_kernel)."""
    key = (cls.__name__, ref_list[0].hex(), id_col)
    k = _TILE_CACHE.get(key)
    if k is None:
        _TILE_CACHE.clear()
        k = cls(ref_list, id_col)
        _TILE_CACHE[key] = k
    return k(batch)


def point_in_rects(
    points: "ray.data.Dataset",
    poly_ids: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    id_col: str = "particle_id",
    concurrency=None,
    sort: bool = False,
) -> "ray.data.Dataset":
    # sort=False default: a Dataset-wide sort is an all-to-all exchange and
    # the containment join's consumers are order-insensitive
    ref = ray.put({"poly_ids": poly_ids, "lo": lo, "hi": hi})
    out = points.map_batches(
        _run_cached,
        fn_kwargs={"cls": _RectJoin, "ref_list": [ref], "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        # one batch per block: the dense N x R mask is vectorized, so
        # fewer/larger invocations beat the default 1024-row batches
        batch_size=None,
    )
    return out.sort([id_col, "poly_id"]) if sort else out


def _ray_cast(px: np.ndarray, py: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Even-odd rule for one polygon over a point batch (vectorized over
    points and edges). verts: [V, 2], closed implicitly."""
    x1 = verts[:, 0]
    y1 = verts[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    # edge straddles the horizontal line through py (half-open to handle
    # vertices hit exactly once)
    straddle = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py[:, None] - y1[None, :]) / (y2 - y1)[None, :] * (x2 - x1)[None, :]
    crossings = (straddle & (px[:, None] < xint)).sum(axis=1)
    return (crossings % 2).astype(bool)


class _PolyJoin:
    def __init__(self, polys_ref, id_col: str):
        p = ray.get(polys_ref[0]) if isinstance(polys_ref, list) else polys_ref
        self.polys: list[tuple[int, np.ndarray]] = p  # [(poly_id, verts)]
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        out_ids, out_polys = [], []
        for poly_id, verts in self.polys:
            # cheap bbox prune before the edge test
            bb = (
                (x >= verts[:, 0].min())
                & (x <= verts[:, 0].max())
                & (y >= verts[:, 1].min())
                & (y <= verts[:, 1].max())
            )
            if not bb.any():
                continue
            sel = np.nonzero(bb)[0]
            inside = _ray_cast(x[sel], y[sel], verts)
            hit = sel[inside]
            out_ids.append(ids[hit])
            out_polys.append(np.full(len(hit), poly_id, dtype=np.int64))
        if not out_ids:
            return pa.table(
                {self.id_col: pa.array([], pa.int64()), "poly_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                self.id_col: np.concatenate(out_ids),
                "poly_id": np.concatenate(out_polys),
            }
        )


def point_in_polygons(
    points: "ray.data.Dataset",
    polygons: list[tuple[int, np.ndarray]],
    id_col: str = "particle_id",
    concurrency=None,
    sort: bool = False,
) -> "ray.data.Dataset":
    """Even-odd-rule containment join of a point stream against a
    broadcast polygon list [(poly_id, verts[V,2])]."""
    ref = ray.put(polygons)
    if concurrency is not None:
        out = points.map_batches(
            _PolyJoin,
            fn_constructor_args=([ref],),
            fn_constructor_kwargs={"id_col": id_col},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
            concurrency=concurrency,
        )
    else:
        from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

        out = points.map_batches(
            run_cached_bcast,
            fn_kwargs={"cls": _PolyJoin, "ref_list": [ref], "ctor_kwargs": {"id_col": id_col}},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
    return out.sort([id_col, "poly_id"]) if sort else out


def _morton3(ix: np.ndarray, iy: np.ndarray, iz: np.ndarray, level: int) -> np.ndarray:
    """Bit-interleave three level-bit cell indices into one Morton key
    (x highest): the space-filling order both the shard audit and the
    pruned box query partition by."""
    m = np.zeros(len(ix), np.int64)
    for i in range(level):
        m |= (
            (((ix >> i) & 1) << (3 * i + 2))
            | (((iy >> i) & 1) << (3 * i + 1))
            | (((iz >> i) & 1) << (3 * i))
        )
    return m


def zorder_shard_stats(
    points: "ray.data.Dataset",
    box: float,
    level: int = 4,
    shard_bits: int = 6,
) -> "ray.data.Dataset":
    """Z-order (Morton) space-filling-curve partitioner audit:
    -> {shard, n, morton_min, morton_max} sorted by shard.

    Each point's 3-D grid cell on the 2^level-per-axis grid is bit-
    interleaved into a Morton key; a shard is the key's top
    ``shard_bits`` bits, i.e. a CONTIGUOUS Morton range = a spatially
    compact octree node. This is the locality-preserving alternative to
    the row-hash partitioner for spatial data: neighboring cells land in
    the same shard, so a downstream range/kNN stage probes O(1) shards
    instead of all of them (the min/max columns prove the ranges are
    disjoint and contiguous). Map-side partial (shard, n, min, max)
    per batch — the exchange carries <= 2^shard_bits rows per task,
    never points; the final fold is O(shards).

    No reference counterpart (the reference's radix sort orders cells
    row-major, src/objects/ArraySTR/Build.c); the SQL twin interleaves
    bits with a generate_series cross join."""
    if level * 3 >= 63 or shard_bits > 3 * level:
        raise ValueError("zorder_shard_stats: level/shard_bits out of range")
    cell = box / float(1 << level)
    drop = 3 * level - shard_bits

    def partial(batch: pa.Table) -> pa.Table:
        ix = np.floor(batch.column("x").to_numpy() / cell).astype(np.int64)
        iy = np.floor(batch.column("y").to_numpy() / cell).astype(np.int64)
        iz = np.floor(batch.column("z").to_numpy() / cell).astype(np.int64)
        hi = np.int64((1 << level) - 1)
        if len(ix) and (
            min(ix.min(), iy.min(), iz.min()) < 0
            or max(ix.max(), iy.max(), iz.max()) > hi
        ):
            raise ValueError("zorder_shard_stats: point outside [0, box)")
        m = _morton3(ix, iy, iz, level)
        shard = m >> drop
        order = np.argsort(m, kind="stable")
        ms = m[order]
        ss = shard[order]
        starts = np.flatnonzero(np.r_[True, ss[1:] != ss[:-1]]) if len(ss) else np.array([], np.int64)
        ends = np.r_[starts[1:], len(ss)] if len(ss) else np.array([], np.int64)
        return pa.table(
            {
                "shard": pa.array(ss[starts], pa.int64()),
                "n": pa.array(ends - starts, pa.int64()),
                "morton_min": pa.array(ms[starts], pa.int64()),
                "morton_max": pa.array(ms[ends - 1] if len(ss) else ms[:0], pa.int64()),
            }
        )

    def fold(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        s = tbl.column("shard").to_numpy()
        order = np.argsort(s, kind="stable")
        s = s[order]
        n = tbl.column("n").to_numpy()[order]
        lo = tbl.column("morton_min").to_numpy()[order]
        hi = tbl.column("morton_max").to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        return pa.table(
            {
                "shard": pa.array(s[starts], pa.int64()),
                "n": pa.array(np.add.reduceat(n, starts), pa.int64()),
                "morton_min": pa.array(np.minimum.reduceat(lo, starts), pa.int64()),
                "morton_max": pa.array(np.maximum.reduceat(hi, starts), pa.int64()),
            }
        )

    return (
        points.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # <= 2^shard_bits rows per input block by then
        .map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .sort("shard")
    )


def zorder_partitioned_copy(
    points: "ray.data.Dataset",
    out_dir: str,
    box: float,
    level: int = 4,
    shard_bits: int = 6,
    overwrite: bool = False,
) -> dict:
    """Materialize ``points`` as a Morton-sharded parquet layout
    (``out_dir/bucket=S/``, S = top ``shard_bits`` bits of the level-grid
    Morton key): the write-side half of range-prunable spatial storage.
    Same manifest/tmp-rename resume contract as the hash sink
    (sources.sinks.write_partitioned); returns the manifest."""
    from spatialjoincountovershells_ray.sources.sinks import write_partitioned

    cell = box / float(1 << level)
    drop = 3 * level - shard_bits
    hi = np.int64((1 << level) - 1)

    def shard_fn(batch: pa.Table) -> np.ndarray:
        ix = np.clip(np.floor(batch.column("x").to_numpy() / cell).astype(np.int64), 0, hi)
        iy = np.clip(np.floor(batch.column("y").to_numpy() / cell).astype(np.int64), 0, hi)
        iz = np.clip(np.floor(batch.column("z").to_numpy() / cell).astype(np.int64), 0, hi)
        return _morton3(ix, iy, iz, level) >> drop

    return write_partitioned(
        points,
        out_dir,
        key=f"zorder:level={level}:bits={shard_bits}:box={box!r}",
        nbuckets=1 << shard_bits,
        overwrite=overwrite,
        bucket_fn=shard_fn,
    )


def zorder_overlap_shards(
    lo: np.ndarray, hi: np.ndarray, box: float, level: int = 4, shard_bits: int = 6
) -> np.ndarray:
    """The EXACT (cell-granular) shard set a half-open query box
    [lo, hi) x3 can touch: enumerate the overlapped level-grid cells
    (<= 2^(3*level), vectorized meshgrid), interleave, dedup the top
    bits. Any point inside the box lies in an overlapped cell, so
    reading only these shards loses nothing."""
    cell = box / float(1 << level)
    top = (1 << level) - 1
    rng = []
    for a, b in zip(lo, hi):
        c0 = max(0, min(top, int(np.floor(a / cell))))
        c1 = max(0, min(top, int(np.ceil(b / cell)) - 1))
        rng.append(np.arange(c0, c1 + 1, dtype=np.int64))
    ix, iy, iz = np.meshgrid(*rng, indexing="ij")
    m = _morton3(ix.ravel(), iy.ravel(), iz.ravel(), level)
    return np.unique(m >> (3 * level - shard_bits))


def zorder_box_query(
    part_dir: str,
    lo,
    hi,
    box: float,
    level: int = 4,
    shard_bits: int = 6,
    stats: dict | None = None,
) -> "ray.data.Dataset":
    """-> particle_id, x, y, z (sorted by particle_id) — all points in
    the half-open box [lo, hi) x3, answered by a PRUNED scan of a
    Morton-sharded layout: only the bucket directories whose shard
    intersects the box are opened (the partitioner used as an index —
    a full-scan filter gives the same rows and touches every file).
    ``stats`` (optional dict) receives shards_read / shards_total /
    files_read so callers can assert the pruning actually happened."""
    import os

    import pyarrow.compute as pc

    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    shards = zorder_overlap_shards(lo, hi, box, level, shard_bits)
    present = {
        int(e.split("=", 1)[1])
        for e in os.listdir(part_dir)
        if e.startswith("bucket=")
    }
    dirs = [os.path.join(part_dir, f"bucket={s}") for s in shards if int(s) in present]
    # expand to the parquet files (read_parquet takes a list of FILES;
    # a list of directories is rejected by the arrow filesystem layer)
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if stats is not None:
        stats["shards_read"] = len(dirs)
        stats["shards_total"] = len(present)
        stats["files_read"] = len(files)
    if not files:
        return ray.data.from_arrow(
            pa.table(
                {
                    "particle_id": pa.array([], pa.int64()),
                    "x": pa.array([], pa.float64()),
                    "y": pa.array([], pa.float64()),
                    "z": pa.array([], pa.float64()),
                }
            )
        )
    ds = ray.data.read_parquet(files, columns=["particle_id", "x", "y", "z"])

    def infilter(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        z = batch.column("z").to_numpy()
        keep = (
            (x >= lo[0]) & (x < hi[0])
            & (y >= lo[1]) & (y < hi[1])
            & (z >= lo[2]) & (z < hi[2])
        )
        return batch.select(["particle_id", "x", "y", "z"]).filter(pa.array(keep))

    return ds.map_batches(infilter, batch_format="pyarrow", zero_copy_batch=True).sort(
        "particle_id"
    )


def _rect_cells(lo: np.ndarray, hi: np.ndarray, cell: float, pad: float) -> tuple:
    """Explode rects to the grid cells their boxes cover (vectorized):
    returns (row_index, flat_cell_key). Coordinates are shifted by +pad
    so cell indices stay non-negative for off-box rects."""
    ix0 = np.floor((lo[:, 0] + pad) / cell).astype(np.int64)
    ix1 = np.floor((hi[:, 0] + pad) / cell).astype(np.int64)
    iy0 = np.floor((lo[:, 1] + pad) / cell).astype(np.int64)
    iy1 = np.floor((hi[:, 1] + pad) / cell).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    reps = nx * ny
    row = np.repeat(np.arange(len(lo), dtype=np.int64), reps)
    # per-replica local ordinal within its rect's nx*ny block
    starts = np.zeros(len(lo), dtype=np.int64)
    np.cumsum(reps[:-1], out=starts[1:])
    local = np.arange(int(reps.sum()), dtype=np.int64) - starts[row]
    cx = ix0[row] + local // ny[row]
    cy = iy0[row] + local % ny[row]
    KEY = np.int64(1) << 21
    return row, cx * KEY + cy


def rect_join(
    rects_a: "ray.data.Dataset",
    rects_b: "ray.data.Dataset",
    *,
    cell: float = 200.0,
    pad: float = 1024.0,
) -> "ray.data.Dataset":
    """Distributed rectangle-overlap join: id_a, id_b (int64) — every
    (a, b) pair whose axis-aligned boxes STRICTLY overlap on both axes
    (max(lo) < min(hi); touching edges do not join).

    Both inputs need columns (id, lox, loy, hix, hiy). The canonical GIS
    spatial-join plan: each rect replicates to the grid cells its box
    covers (replication bounded by (extent/cell + 1)^2 — pick ``cell``
    near the larger side's max extent), one bucket exchange co-locates
    cell-mates, and a vectorized per-cell kernel tests candidate pairs.
    Exactly-once emission via the responsibility rule: a pair is emitted
    only by the cell containing its intersection's min corner.
    """
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def prep(role: int):
        def fn(batch: pa.Table) -> pa.Table:
            lo = np.stack([batch.column("lox").to_numpy(), batch.column("loy").to_numpy()], axis=1)
            hi = np.stack([batch.column("hix").to_numpy(), batch.column("hiy").to_numpy()], axis=1)
            row, key = _rect_cells(lo, hi, cell, pad)
            return pa.table(
                {
                    "k": pa.array(key, pa.int64()),
                    "id": batch.column("id").to_numpy()[row],
                    "lox": lo[row, 0],
                    "loy": lo[row, 1],
                    "hix": hi[row, 0],
                    "hiy": hi[row, 1],
                    "role": pa.array(np.full(len(row), role, np.int8)),
                }
            )

        return fn

    both = rects_a.map_batches(prep(0), batch_format="pyarrow", zero_copy_batch=True).union(
        rects_b.map_batches(prep(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    KEY = np.int64(1) << 21

    def kernel(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        if tbl.num_rows == 0 or "k" not in tbl.schema.names:
            return empty
        k = tbl.column("k").to_numpy()
        order = np.argsort(k, kind="stable")
        k = k[order]
        ids = tbl.column("id").to_numpy()[order]
        lox = tbl.column("lox").to_numpy()[order]
        loy = tbl.column("loy").to_numpy()[order]
        hix = tbl.column("hix").to_numpy()[order]
        hiy = tbl.column("hiy").to_numpy()[order]
        role = tbl.column("role").to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            ra = np.flatnonzero(role[s:e] == 0) + s
            rb = np.flatnonzero(role[s:e] == 1) + s
            if not len(ra) or not len(rb):
                continue
            # candidate cross product within the cell (cells are bounded
            # by the replication grid; the matrices stay small)
            ox = np.maximum(lox[ra][:, None], lox[rb][None, :])
            cxm = np.minimum(hix[ra][:, None], hix[rb][None, :])
            oy = np.maximum(loy[ra][:, None], loy[rb][None, :])
            cym = np.minimum(hiy[ra][:, None], hiy[rb][None, :])
            hit = (ox < cxm) & (oy < cym)
            # responsibility: intersection min corner must lie in THIS cell
            cellx = k[s] // KEY
            celly = k[s] % KEY
            respx = np.floor((ox + pad) / cell).astype(np.int64) == cellx
            respy = np.floor((oy + pad) / cell).astype(np.int64) == celly
            hit &= respx & respy
            ai, bi = np.nonzero(hit)
            out_a.append(ids[ra][ai])
            out_b.append(ids[rb][bi])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    return keyed_partition_apply(both, "k", kernel)
