"""Manual hash-bucket exchange: an explicit two-stage shuffle on raw Ray
tasks.

Ray Data's groupby is a general sort-based all-to-all with ~20 s of fixed
overhead on this setup; for the cell-copartitioned join we only need
*co-location by cell hash*, not global order. Classic map/reduce shuffle:

  stage 1 (map):    each input block is split into B bucket sub-tables
                    (cell % B), returned as B separate objects;
  stage 2 (reduce): per bucket, concatenate its sub-tables from every
                    block and run the join kernel.

O(nblocks x B) small objects through the object store; no sort anywhere.
The reduce kernel handles multi-cell buckets by segmenting on the cell
key (a halo replica must meet exactly the particles of ITS cell — pairing
across cells inside a bucket would double-count, SURVEY.md §7.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE, RadiusLadder
from spatialjoincountovershells_ray.functions.distance import shell_of


def _streamed_block_refs(ds: "ray.data.Dataset"):
    """Block refs of the tagged union for the map-side split.

    MEASURED: launching splits as blocks stream out of
    ``iter_internal_ref_bundles()`` (overlapping tag and split) is 3x
    SLOWER here than the materialize() barrier (30s vs 10s cold at
    sf0.1/32cpus) — the split tasks' scheduling contends with the
    still-running streaming executor. The barrier stays; it is also the
    spill-safe shape (tagged blocks are object-store residents either
    way)."""
    yield from ds.materialize().to_arrow_refs()


@ray.remote
def _split_block(block: pa.Table, nbuckets: int) -> list[pa.Table]:
    if block.num_rows == 0:
        # Ray Data passes empty blocks through map_batches without calling
        # the fn, so an empty block may carry a pre-tag (or even empty)
        # schema; every reducer skips zero-row parts before concat
        return [block.slice(0, 0)] * nbuckets
    cell = block.column("cell").to_numpy()
    bucket = cell % nbuckets
    order = np.argsort(bucket, kind="stable")
    sorted_tbl = block.take(pa.array(order, pa.int64()))
    sb = bucket[order]
    bounds = np.searchsorted(sb, np.arange(nbuckets + 1))
    return [sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nbuckets)]


@ray.remote
def _reduce_bucket(ladder_bytes: bytes, dtype_str: str, box: float, *parts: pa.Table) -> pa.Table:
    """Per-bucket join: segment by cell, vectorized kernel per cell."""
    from spatialjoincountovershells_ray.stages.join_kernels import _cached_d2k

    ladder = RadiusLadder(
        radii=np.frombuffer(ladder_bytes, dtype=dtype_str), dtype=np.dtype(dtype_str)
    )
    nrads = ladder.nrads
    names = ["halo_id"] + [f"s{i}" for i in range(nrads)]
    tbls = [t for t in parts if t.num_rows]
    if not tbls:
        return pa.table({n: pa.array([], pa.int64()) for n in names})
    t = pa.concat_tables(tbls, promote_options="none")
    cell = t.column("cell").to_numpy()
    order = np.argsort(cell, kind="stable")
    cell = cell[order]
    role = t.column("role").to_numpy(zero_copy_only=False)[order]
    ids = t.column("id").to_numpy()[order]
    cols = tuple(
        t.column(c).to_numpy(zero_copy_only=False).astype(ladder.dtype, copy=False)[order]
        for c in ("x", "y", "z")
    )
    d2k = _cached_d2k(ladder.dtype)
    out_h: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    starts = np.flatnonzero(np.concatenate(([True], cell[1:] != cell[:-1])))
    ends = np.concatenate((starts[1:], [len(cell)]))
    for s, e in zip(starts, ends):
        r = role[s:e]
        hsel = np.flatnonzero(r == 0) + s
        psel = np.flatnonzero(r == 1) + s
        H, P = len(hsel), len(psel)
        if H == 0 or P == 0:
            continue
        h_cols = tuple(np.ascontiguousarray(c[hsel]) for c in cols)
        p_cols = tuple(np.ascontiguousarray(c[psel]) for c in cols)
        hist = np.zeros(H * nrads, dtype=np.int64)
        chunk = max(1, (1 << 20) // P)
        p_ar = np.arange(P, dtype=np.int64)
        for hs in range(0, H, chunk):
            he = min(hs + chunk, H)
            pair_h = np.repeat(np.arange(hs, he, dtype=np.int64), P)
            pair_p = np.tile(p_ar, he - hs)
            d2 = d2k(h_cols, p_cols, pair_h, pair_p, box)
            keep = d2 < ladder.r2[-1]
            ph = pair_h[keep]
            if len(ph):
                shell = shell_of(d2[keep], ladder.r2)
                hist += np.bincount(ph * nrads + shell, minlength=H * nrads)
        hist2 = hist.reshape(H, nrads)
        touched = np.flatnonzero(hist2.any(axis=1))
        out_h.append(ids[hsel[touched]])
        out_s.append(hist2[touched])
    if not out_h:
        return pa.table({n: pa.array([], pa.int64()) for n in names})
    hcat = np.concatenate(out_h)
    scat = np.concatenate(out_s, axis=0)
    result = {"halo_id": hcat}
    for i in range(nrads):
        result[f"s{i}"] = scat[:, i]
    return pa.table(result)


@ray.remote
def _reduce_bucket_pairs(r2: float, dtype_str: str, box: float, *parts: pa.Table) -> pa.Table:
    """Per-bucket id-pair join: segment by cell, emit (halo_id,
    particle_id) for every pair with d2 < r2. The pair-emitting twin of
    ``_reduce_bucket`` — the reference's J4 RangeSearch surface
    (src/objects/ArraySTR/RangeSearch.c:11-52) without the
    broadcastable-query-side assumption. Each (halo, particle) pair
    appears exactly once: the particle is in one cell, and the halo
    replica for that cell meets it there only.
    """
    from spatialjoincountovershells_ray.stages.join_kernels import _cached_d2k

    dtype = np.dtype(dtype_str)
    names = ("halo_id", "particle_id")
    tbls = [t for t in parts if t.num_rows]
    if not tbls:
        return pa.table({n: pa.array([], pa.int64()) for n in names})
    t = pa.concat_tables(tbls, promote_options="none")
    cell = t.column("cell").to_numpy()
    order = np.argsort(cell, kind="stable")
    cell = cell[order]
    role = t.column("role").to_numpy(zero_copy_only=False)[order]
    ids = t.column("id").to_numpy()[order]
    cols = tuple(
        t.column(c).to_numpy(zero_copy_only=False).astype(dtype, copy=False)[order]
        for c in ("x", "y", "z")
    )
    d2k = _cached_d2k(dtype)
    out_h: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    starts = np.flatnonzero(np.concatenate(([True], cell[1:] != cell[:-1])))
    ends = np.concatenate((starts[1:], [len(cell)]))
    for s, e in zip(starts, ends):
        r = role[s:e]
        hsel = np.flatnonzero(r == 0) + s
        psel = np.flatnonzero(r == 1) + s
        H, P = len(hsel), len(psel)
        if H == 0 or P == 0:
            continue
        h_cols = tuple(np.ascontiguousarray(c[hsel]) for c in cols)
        p_cols = tuple(np.ascontiguousarray(c[psel]) for c in cols)
        chunk = max(1, (1 << 20) // P)
        p_ar = np.arange(P, dtype=np.int64)
        for hs in range(0, H, chunk):
            he = min(hs + chunk, H)
            pair_h = np.repeat(np.arange(hs, he, dtype=np.int64), P)
            pair_p = np.tile(p_ar, he - hs)
            d2 = d2k(h_cols, p_cols, pair_h, pair_p, box)
            keep = d2 < r2
            if keep.any():
                out_h.append(ids[hsel[pair_h[keep]]])
                out_p.append(ids[psel[pair_p[keep]]])
    if not out_h:
        return pa.table({n: pa.array([], pa.int64()) for n in names})
    return pa.table(
        {
            "halo_id": pa.array(np.concatenate(out_h), pa.int64()),
            "particle_id": pa.array(np.concatenate(out_p), pa.int64()),
        }
    )


_KNN_BUCKET_COLS = ("halo_id", "particle_id", "d2", "cnt", "x", "y", "z")


def _empty_knn_bucket() -> pa.Table:
    return pa.table(
        {
            "halo_id": pa.array([], pa.int64()),
            "particle_id": pa.array([], pa.int64()),
            "d2": pa.array([], pa.float64()),
            "cnt": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64()),
            "z": pa.array([], pa.float64()),
        }
    )


@ray.remote
def _reduce_bucket_knn(
    k: int, r2: float, dtype_str: str, box: float, *parts: pa.Table
) -> pa.Table:
    """Per-bucket kNN candidates within radius sqrt(r2).

    Emits two row kinds, distinguished by ``particle_id``:

    - candidate rows (``particle_id >= 0``): the bucket-local top-k
      (by d2, then particle_id) pairs per halo with d2 < r2; ``cnt`` 0.
    - presence rows (``particle_id == -1``): one per distinct halo in the
      bucket, carrying the halo's coordinates and ``cnt`` = the UNCAPPED
      number of particles within r2 met in this bucket — the per-halo
      completeness evidence (sum over buckets >= k proves the true kNN
      are among the emitted candidates, same argument as the ring plan).

    Each (halo, particle) pair within r meets in exactly one cell (the
    particle's own), so candidate rows and counts are exact, not
    over-counted, across buckets.
    """
    from spatialjoincountovershells_ray.stages.join_kernels import (
        _cached_d2k,
        select_topk_rows,
    )

    dtype = np.dtype(dtype_str)
    tbls = [t for t in parts if t.num_rows]
    if not tbls:
        return _empty_knn_bucket()
    t = pa.concat_tables(tbls, promote_options="none")
    cell = t.column("cell").to_numpy()
    order = np.argsort(cell, kind="stable")
    cell = cell[order]
    role = t.column("role").to_numpy(zero_copy_only=False)[order]
    ids = t.column("id").to_numpy()[order]
    cols = tuple(
        t.column(c).to_numpy(zero_copy_only=False).astype(dtype, copy=False)[order]
        for c in ("x", "y", "z")
    )
    # distinct halos in this bucket (replicas share id + coords)
    hall = np.flatnonzero(role == 0)
    if len(hall) == 0:
        return _empty_knn_bucket()
    uids, first = np.unique(ids[hall], return_index=True)
    ux, uy, uz = (c[hall[first]].astype(np.float64, copy=False) for c in cols)
    cnt = np.zeros(len(uids), dtype=np.int64)

    d2k = _cached_d2k(dtype)
    out_h: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    starts = np.flatnonzero(np.concatenate(([True], cell[1:] != cell[:-1])))
    ends = np.concatenate((starts[1:], [len(cell)]))
    for s, e in zip(starts, ends):
        r = role[s:e]
        hsel = np.flatnonzero(r == 0) + s
        psel = np.flatnonzero(r == 1) + s
        H, P = len(hsel), len(psel)
        if H == 0 or P == 0:
            continue
        h_cols = tuple(np.ascontiguousarray(c[hsel]) for c in cols)
        p_cols = tuple(np.ascontiguousarray(c[psel]) for c in cols)
        chunk = max(1, (1 << 20) // P)
        p_ar = np.arange(P, dtype=np.int64)
        for hs in range(0, H, chunk):
            he = min(hs + chunk, H)
            pair_h = np.repeat(np.arange(hs, he, dtype=np.int64), P)
            pair_p = np.tile(p_ar, he - hs)
            d2 = d2k(h_cols, p_cols, pair_h, pair_p, box)
            keep = d2 < r2
            if keep.any():
                hid = ids[hsel[pair_h[keep]]]
                out_h.append(hid)
                out_p.append(ids[psel[pair_p[keep]]])
                out_d.append(d2[keep].astype(np.float64, copy=False))
                np.add.at(cnt, np.searchsorted(uids, hid), 1)
    if out_h:
        ch, cp, cd, _ = select_topk_rows(
            np.concatenate(out_h), np.concatenate(out_p), np.concatenate(out_d), k
        )
    else:
        ch = cp = np.empty(0, np.int64)
        cd = np.empty(0, np.float64)
    nc = len(ch)
    return pa.table(
        {
            "halo_id": pa.array(np.concatenate([ch, uids]), pa.int64()),
            "particle_id": pa.array(
                np.concatenate([cp, np.full(len(uids), -1, np.int64)]), pa.int64()
            ),
            "d2": pa.array(np.concatenate([cd, np.full(len(uids), np.inf)]), pa.float64()),
            "cnt": pa.array(np.concatenate([np.zeros(nc, np.int64), cnt]), pa.int64()),
            "x": pa.array(np.concatenate([np.zeros(nc), ux]), pa.float64()),
            "y": pa.array(np.concatenate([np.zeros(nc), uy]), pa.float64()),
            "z": pa.array(np.concatenate([np.zeros(nc), uz]), pa.float64()),
        }
    )


def bucketed_knn_candidates(
    tagged: "ray.data.Dataset",
    radius: float,
    k: int,
    dtype: np.dtype,
    box: float = BOX_SIZE,
    nbuckets: int | None = None,
) -> "ray.data.Dataset":
    """tagged (cell, role, id, x, y, z) -> per-bucket kNN candidate +
    presence rows (see _reduce_bucket_knn)."""
    if nbuckets is None:
        nbuckets = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    split_refs = [
        _split_block.options(num_returns=nbuckets).remote(b, nbuckets)
        for b in _streamed_block_refs(tagged)
    ]
    r2 = float(radius) * float(radius)
    results = [
        _reduce_bucket_knn.remote(
            k, r2, np.dtype(dtype).str, box, *[sr[bi] for sr in split_refs]
        )
        for bi in range(nbuckets)
    ]
    return ray.data.from_arrow_refs(results)


@ray.remote
def _knn_merge_bucket(k: int, full_sweep: bool, *parts: pa.Table) -> pa.Table:
    """Per-halo-hash-bucket merge of kNN candidate/presence rows.

    Output rows: resolved halos contribute their global top-k
    (halo_id, particle_id, rnk, d2, resolved=True); unresolved halos one
    row each (particle_id=-1, resolved=False) carrying coordinates for
    the next, larger-radius round.
    """
    from spatialjoincountovershells_ray.stages.join_kernels import select_topk_rows

    out_schema = pa.schema(
        [
            ("halo_id", pa.int64()),
            ("particle_id", pa.int64()),
            ("rnk", pa.int64()),
            ("d2", pa.float64()),
            ("resolved", pa.bool_()),
            ("x", pa.float64()),
            ("y", pa.float64()),
            ("z", pa.float64()),
        ]
    )
    tbls = [t for t in parts if t.num_rows]
    if not tbls:
        return out_schema.empty_table()
    t = pa.concat_tables(tbls, promote_options="none")
    pid = t.column("particle_id").to_numpy()
    hid = t.column("halo_id").to_numpy()
    is_pres = pid == -1
    puids, pfirst = np.unique(hid[is_pres], return_index=True)
    pres_rows = np.flatnonzero(is_pres)
    total = np.zeros(len(puids), dtype=np.int64)
    np.add.at(total, np.searchsorted(puids, hid[is_pres]), t.column("cnt").to_numpy()[is_pres])
    resolved = total >= k
    if full_sweep:
        resolved[:] = True
    # candidates of resolved halos -> global top-k + rank
    cmask = ~is_pres
    if cmask.any():
        ch = hid[cmask]
        keep = resolved[np.searchsorted(puids, ch)]
        cp = pid[cmask][keep]
        cd = t.column("d2").to_numpy()[cmask][keep]
        rh, rp, rd, rnk = select_topk_rows(ch[keep], cp, cd, k)
    else:
        rh = rp = rnk = np.empty(0, np.int64)
        rd = np.empty(0, np.float64)
    un = np.flatnonzero(~resolved)
    un_rows = pres_rows[pfirst[un]]
    nu = len(un)
    return pa.table(
        {
            "halo_id": pa.array(np.concatenate([rh, puids[un]]), pa.int64()),
            "particle_id": pa.array(
                np.concatenate([rp, np.full(nu, -1, np.int64)]), pa.int64()
            ),
            "rnk": pa.array(np.concatenate([rnk, np.zeros(nu, np.int64)]), pa.int64()),
            "d2": pa.array(np.concatenate([rd, np.full(nu, np.inf)]), pa.float64()),
            "resolved": pa.array(
                np.concatenate([np.ones(len(rh), bool), np.zeros(nu, bool)])
            ),
            "x": pa.array(
                np.concatenate([np.zeros(len(rh)), t.column("x").to_numpy()[un_rows]]),
                pa.float64(),
            ),
            "y": pa.array(
                np.concatenate([np.zeros(len(rh)), t.column("y").to_numpy()[un_rows]]),
                pa.float64(),
            ),
            "z": pa.array(
                np.concatenate([np.zeros(len(rh)), t.column("z").to_numpy()[un_rows]]),
                pa.float64(),
            ),
        }
    )


def bucketed_knn_merge(
    cands: "ray.data.Dataset", k: int, full_sweep: bool, nbuckets: int | None = None
) -> "ray.data.Dataset":
    """Hash-bucket (by halo_id) merge of kNN bucket outputs — bounded
    per-task state even for query sides that fit no single task."""
    if nbuckets is None:
        nbuckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    blocks = list(cands.materialize().to_arrow_refs())
    split_refs = [
        split_by_key.options(num_returns=nbuckets).remote(b, "halo_id", nbuckets)
        for b in blocks
    ]
    results = [
        _knn_merge_bucket.remote(k, full_sweep, *[sr[bi] for sr in split_refs])
        for bi in range(nbuckets)
    ]
    return ray.data.from_arrow_refs(results)


def bucketed_pair_join(
    tagged: "ray.data.Dataset",
    radius: float,
    dtype: np.dtype,
    box: float = BOX_SIZE,
    nbuckets: int | None = None,
) -> "ray.data.Dataset":
    """tagged (cell, role, id, x, y, z) -> (halo_id, particle_id) pairs
    per bucket — the shuffle-plan range join for query sides too large to
    broadcast."""
    if nbuckets is None:
        nbuckets = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    split_refs = [
        _split_block.options(num_returns=nbuckets).remote(b, nbuckets)
        for b in _streamed_block_refs(tagged)
    ]
    r2 = float(radius) * float(radius)
    results = [
        _reduce_bucket_pairs.remote(r2, np.dtype(dtype).str, box, *[sr[bi] for sr in split_refs])
        for bi in range(nbuckets)
    ]
    return ray.data.from_arrow_refs(results)


@ray.remote
def split_by_key(block: pa.Table, col: str, nbuckets: int) -> list[pa.Table]:
    """Generic map-side shuffle split: partition a block into nbuckets
    sub-tables by ``col % nbuckets`` (numpy modulo is non-negative for a
    positive divisor, so negative hash keys are fine)."""
    if block.num_rows == 0:
        return [block.slice(0, 0)] * nbuckets
    k = block.column(col).to_numpy()
    bucket = k % nbuckets
    order = np.argsort(bucket, kind="stable")
    sorted_tbl = block.take(pa.array(order, pa.int64()))
    sb = bucket[order]
    bounds = np.searchsorted(sb, np.arange(nbuckets + 1))
    return [sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nbuckets)]


def tag_for_cell_exchange(
    halos: "ray.data.Dataset",
    particles: "ray.data.Dataset",
    rmax: float,
    grid,
    dtype: np.dtype,
    salt=None,
) -> "ray.data.Dataset":
    """Union of both sides tagged (cell, role, id, x, y, z): halos
    ball-cover replicated to every cell within rmax, particles keyed by
    their own cell. The common map side of every cell-copartitioned
    shuffle plan (shell count histograms and range-join pairs)."""
    from spatialjoincountovershells_ray.stages.join_kernels import (
        add_particle_cell,
        replicate_halos,
    )

    dt = pa.float32() if np.dtype(dtype) == np.dtype(np.float32) else pa.float64()

    def tag_particles(batch: pa.Table) -> pa.Table:
        b = add_particle_cell(batch, grid, dtype)
        cell = b.column("cell").to_numpy()
        if salt is not None:
            cell = salt.particle_keys(cell, b.column("particle_id").to_numpy())
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "role": pa.array(np.ones(b.num_rows, dtype=np.int8)),
                "id": b.column("particle_id"),
                "x": pa.compute.cast(b.column("x"), dt),
                "y": pa.compute.cast(b.column("y"), dt),
                "z": pa.compute.cast(b.column("z"), dt),
            }
        )

    def tag_halos(batch: pa.Table) -> pa.Table:
        b = replicate_halos(batch, rmax, grid, dtype)
        cell = b.column("cell").to_numpy()
        if salt is not None:
            rows, keys = salt.halo_replica_keys(cell)
            b = b.take(pa.array(rows, pa.int64()))
            cell = keys
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
                "id": b.column("halo_id"),
                "x": pa.compute.cast(b.column("x"), dt),
                "y": pa.compute.cast(b.column("y"), dt),
                "z": pa.compute.cast(b.column("z"), dt),
            }
        )

    return halos.map_batches(
        tag_halos, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        particles.map_batches(tag_particles, batch_format="pyarrow", zero_copy_batch=True)
    )


@ray.remote
def _split_by_halo(block: pa.Table, nbuckets: int) -> list[pa.Table]:
    if block.num_rows == 0:
        return [block.slice(0, 0)] * nbuckets
    h = block.column("halo_id").to_numpy()
    bucket = h % nbuckets
    order = np.argsort(bucket, kind="stable")
    sorted_tbl = block.take(pa.array(order, pa.int64()))
    sb = bucket[order]
    bounds = np.searchsorted(sb, np.arange(nbuckets + 1))
    return [sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nbuckets)]


@ray.remote
def _sum_hist_bucket(nrads: int, *parts: pa.Table) -> pa.Table:
    scols = [f"s{i}" for i in range(nrads)]
    tbls = [t for t in parts if t.num_rows]
    if not tbls:
        return pa.table({n: pa.array([], pa.int64()) for n in ["halo_id"] + scols})
    t = pa.concat_tables(tbls, promote_options="none")
    g = t.group_by("halo_id").aggregate([(c, "sum") for c in scols])
    # select by name — pyarrow's aggregate column order is version-dependent
    return pa.table({"halo_id": g.column("halo_id"), **{c: g.column(f"{c}_sum") for c in scols}})


def bucketed_hist_merge(
    partials: "ray.data.Dataset", zeros: "pa.Table | None", nrads: int, nbuckets: int | None = None
) -> "ray.data.Dataset":
    """Hash-bucket merge of per-halo partial histograms: each bucket's sum
    is bounded by its share of the halo key space, so the merge scales to
    query sides that do NOT fit a single task (the unbounded-halo story
    of the shuffle plan)."""
    if nbuckets is None:
        nbuckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    blocks = list(partials.materialize().to_arrow_refs())
    if zeros is not None:
        blocks.append(ray.put(zeros))
    split_refs = [
        _split_by_halo.options(num_returns=nbuckets).remote(b, nbuckets) for b in blocks
    ]
    results = [
        _sum_hist_bucket.remote(nrads, *[sr[bi] for sr in split_refs])
        for bi in range(nbuckets)
    ]
    return ray.data.from_arrow_refs(results)


def bucketed_cell_join(
    tagged: "ray.data.Dataset",
    ladder: RadiusLadder,
    box: float = BOX_SIZE,
    nbuckets: int | None = None,
) -> "ray.data.Dataset":
    """tagged (cell, role, id, x, y, z) -> partial histograms per bucket."""
    if nbuckets is None:
        nbuckets = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    split_refs = [
        _split_block.options(num_returns=nbuckets).remote(b, nbuckets)
        for b in _streamed_block_refs(tagged)
    ]
    lb = ladder.radii.tobytes()
    ds = ladder.dtype.str
    bucket_results = []
    for bi in range(nbuckets):
        shards = [sr[bi] for sr in split_refs]
        bucket_results.append(_reduce_bucket.remote(lb, ds, box, *shards))
    # keep results in the object store; downstream merge reads the refs
    return ray.data.from_arrow_refs(bucket_results)
