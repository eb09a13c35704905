"""kNN under the torus metric: k nearest particles per halo.

No reference counterpart (SURVEY.md §2.6) — a new capability of the
generic engine. Plan: a task/actor stage scans particle batches against
the broadcast halo table emitting per-batch top-k candidate rows
(halo_id, particle_id, d2); a log-depth tree of merge tasks selects the
global top k ordered by (d2, particle_id). Per-batch partial top-k
bounds every exchange to H x k rows per input batch; the tree merge is
associative, so the result is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE
from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table
from spatialjoincountovershells_ray.stages.join_kernels import (
    BroadcastKnnCandidates,
    select_topk_rows,
)

_KNN_CACHE: dict[tuple, BroadcastKnnCandidates] = {}
_RING_CACHE: dict[tuple, "BroadcastRangeTopK"] = {}


def _run_ring_kernel(batch: pa.Table, ref_list, ladder, k) -> pa.Table:
    from spatialjoincountovershells_ray.stages.join_kernels import BroadcastRangeTopK

    key = (ref_list[0].hex(), ladder.radii.tobytes(), ladder.dtype.str, k)
    kern = _RING_CACHE.get(key)
    if kern is None:
        _RING_CACHE.clear()
        kern = BroadcastRangeTopK(ref_list, ladder)
        kern.k = k
        _RING_CACHE[key] = kern
    return kern(batch)


def _topk_tree(cands: "ray.data.Dataset", k: int) -> pa.Table:
    """Tree-merge candidate blocks to exact per-halo top-k (keeps d2)."""
    refs = list(cands.materialize().to_arrow_refs())
    fanin = 8
    while len(refs) > 1:
        refs = [
            _merge_knn_blocks.remote(k, True, False, *refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
    if not refs:
        return pa.table(
            {"halo_id": pa.array([], pa.int64()), "particle_id": pa.array([], pa.int64()), "d2": pa.array([], pa.float64())}
        )
    return ray.get(refs[0])


def _knn_ring(
    halos, particles, k, *, box, dtype, batch_size, include_d2, sort, r0
):
    import math

    from spatialjoincountovershells_ray.config import GridSpec, RadiusLadder
    from spatialjoincountovershells_ray.stages.join_kernels import HaloIndex

    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    hids = halos_tbl.column("halo_id").to_numpy()
    hxyz = np.stack(
        [halos_tbl.column(c).to_numpy().astype(dtype, copy=False) for c in "xyz"],
        axis=1,
    )
    # cache the (small) particle side? No — particles stream every round;
    # rounds are few because r doubles and completion is checked per halo.
    nparts = particles.count()
    density = max(nparts, 1) / box**3
    # first-ring radius: 2.4x the expected-k radius resolves ~all points in
    # round 1 (expected candidates/point = k * 2.4^3 ~ 14k, still tiny and
    # top-k-capped) — each avoided round saves a full exchange/probe pass
    # (measured 6.4 s -> 3.5 s at sf0.1/32 CPUs on the shuffle plan vs the
    # old 1.3x factor, which paid 2 extra rounds)
    r = r0 or min(
        box / 4, max(1e-3 * box, 2.4 * ((3.0 * k) / (4.0 * math.pi * density)) ** (1.0 / 3.0))
    )
    pending = np.arange(len(hids), dtype=np.int64)
    done_tables: list[pa.Table] = []
    rounds = 0
    while len(pending):
        rounds += 1
        full_sweep = r >= box / 2
        rmax = box * math.sqrt(3.0) if full_sweep else r  # full torus diameter bound
        ladder = RadiusLadder(radii=np.array([rmax]), dtype=np.dtype(dtype))
        ncells = max(1, min(int(box * 2.0 / rmax), 64))
        grid = GridSpec(ncells=ncells, box=box)
        index = HaloIndex.build(hids[pending], hxyz[pending], rmax, grid, box)
        ref = ray.put(index)
        cands = particles.map_batches(
            _run_ring_kernel,
            fn_kwargs={"ref_list": [ref], "ladder": ladder, "k": k},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
        merged = _topk_tree(cands, k)
        got = merged.column("halo_id").to_numpy()
        counts = np.zeros(len(hids), dtype=np.int64)
        # map halo_id back to row: hids may be arbitrary — use searchsorted on
        # a sorted copy
        order = np.argsort(hids, kind="stable")
        pos = order[np.searchsorted(hids[order], got)]
        np.add.at(counts, pos, 1)
        complete_rows = np.flatnonzero(counts >= k)
        if full_sweep:
            complete_rows = np.unique(np.concatenate([complete_rows, pending]))
        complete_set = set(complete_rows.tolist()) & set(pending.tolist())
        if complete_set:
            keep_mask = np.isin(pos, np.array(sorted(complete_set), dtype=np.int64))
            done_tables.append(merged.filter(pa.array(keep_mask)))
        pending = np.array(sorted(set(pending.tolist()) - complete_set), dtype=np.int64)
        if full_sweep:
            break
        r *= 2.0
    allt = (
        pa.concat_tables(done_tables, promote_options="none")
        if done_tables
        else pa.table(
            {"halo_id": pa.array([], pa.int64()), "particle_id": pa.array([], pa.int64()), "d2": pa.array([], pa.float64())}
        )
    )
    h, p, d, rnk = select_topk_rows(
        allt.column("halo_id").to_numpy(),
        allt.column("particle_id").to_numpy(),
        allt.column("d2").to_numpy(),
        k,
    )
    cols = {"halo_id": h, "particle_id": p, "rnk": rnk}
    if include_d2:
        cols["d2"] = d
    final = pa.table(cols)
    if sort:
        final = final.sort_by([("halo_id", "ascending"), ("rnk", "ascending")])
    return ray.data.from_arrow(final)


def _run_knn_kernel(batch: pa.Table, ref_list, k, box, dtype_str) -> pa.Table:
    """Task-mode wrapper with per-worker kernel cache (see
    join_kernels.run_broadcast_kernel for why tasks, not actors)."""
    key = (ref_list[0].hex(), k, box, dtype_str)
    kern = _KNN_CACHE.get(key)
    if kern is None:
        _KNN_CACHE.clear()
        kern = BroadcastKnnCandidates(ref_list, k, box, np.dtype(dtype_str))
        _KNN_CACHE[key] = kern
    return kern(batch)


@ray.remote
def _merge_knn_blocks(k: int, include_d2: bool, final: bool, *tables: pa.Table) -> pa.Table:
    t = pa.concat_tables([x for x in tables if x.num_rows], promote_options="none")
    h, p, d, r = select_topk_rows(
        t.column("halo_id").to_numpy(),
        t.column("particle_id").to_numpy(),
        t.column("d2").to_numpy(),
        k,
    )
    cols = {"halo_id": h, "particle_id": p}
    if final:
        cols["rnk"] = r
        if include_d2:
            cols["d2"] = d
    else:
        cols["d2"] = d
    return pa.table(cols)


def _knn_shuffle(halos, particles, k, *, box, dtype, include_d2, sort, r0):
    """Expanding-ring kNN with NO broadcastable-query-side assumption.

    Same completeness argument as the ring plan (a halo with >= k
    particles within r has its true kNN among the within-r candidates),
    but each round is the cell-copartitioned bucket exchange
    (stages/exchange.py): halos are ball-cover replicated and met with
    particles per cell, per-halo candidates and within-r counts merge in
    halo-hash buckets, and the unresolved halo set stays a Dataset —
    nothing query-side ever materializes on the driver. This is the
    scale path for the reference's J4/kNN surface when the query side
    exceeds object-store broadcast (the documented gap in VERDICT r1)."""
    import math

    import pyarrow.compute as pc

    from spatialjoincountovershells_ray.config import GridSpec
    from spatialjoincountovershells_ray.stages.exchange import (
        bucketed_knn_candidates,
        bucketed_knn_merge,
        tag_for_cell_exchange,
    )

    if isinstance(halos, pa.Table):
        halos = ray.data.from_arrow(halos)
    nparts = particles.count()
    density = max(nparts, 1) / box**3
    # first-ring radius: 2.4x the expected-k radius resolves ~all points in
    # round 1 (expected candidates/point = k * 2.4^3 ~ 14k, still tiny and
    # top-k-capped) — each avoided round saves a full exchange/probe pass
    # (measured 6.4 s -> 3.5 s at sf0.1/32 CPUs on the shuffle plan vs the
    # old 1.3x factor, which paid 2 extra rounds)
    r = r0 or min(
        box / 4, max(1e-3 * box, 2.4 * ((3.0 * k) / (4.0 * math.pi * density)) ** (1.0 / 3.0))
    )
    pending = halos.select_columns(["halo_id", "x", "y", "z"])
    resolved_parts: list = []
    while True:
        full_sweep = r >= box / 2
        rmax = box * math.sqrt(3.0) if full_sweep else r
        ncells = max(1, min(int(box * 2.0 / rmax), 64))
        grid = GridSpec(ncells=ncells, box=box)
        tagged = tag_for_cell_exchange(pending, particles, rmax, grid, np.dtype(dtype))
        cands = bucketed_knn_candidates(tagged, rmax, k, np.dtype(dtype), box)
        merged = bucketed_knn_merge(cands, k, full_sweep)

        def split_resolved(batch: pa.Table, want: bool) -> pa.Table:
            m = batch.filter(pc.equal(batch.column("resolved"), want))
            if want:
                cols = ["halo_id", "particle_id", "rnk"] + (["d2"] if include_d2 else [])
            else:
                cols = ["halo_id", "x", "y", "z"]
            return m.select(cols)

        resolved_parts.append(
            merged.map_batches(
                split_resolved, fn_kwargs={"want": True},
                batch_format="pyarrow", zero_copy_batch=True,
            )
        )
        if full_sweep:
            break
        pending = merged.map_batches(
            split_resolved, fn_kwargs={"want": False},
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        if pending.count() == 0:
            break
        r *= 2.0
    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.union(p)
    if sort:
        out = out.sort(["halo_id", "rnk"])
    return out


def knn(
    halos: "ray.data.Dataset | pa.Table",
    particles: "ray.data.Dataset",
    k: int,
    *,
    box: float = BOX_SIZE,
    dtype=np.float64,
    batch_size: int = 8192,
    concurrency=None,
    include_d2: bool = False,
    sort: bool = True,
    method: str = "ring",
    r0: float | None = None,
) -> "ray.data.Dataset":
    """-> halo_id:int64, particle_id:int64, rnk:int64 (1-based), [d2].

    ``method='ring'`` (default): exact expanding-radius search — run the
    grid-pruned range kernel at radius r, keep halos that found >= k
    neighbours within r (their true kNN are provably among those
    candidates), double r for the stragglers, repeat. Reuses the fast
    cell-bucketed candidate path, so cost tracks the k-NN density radius
    instead of all H x P pairs. ``method='brute'`` scans every pair
    (the oracle-ish fallback; no radius assumption).
    """
    if method == "auto":
        # same small-query-side cost model as shell_count/range_join
        # 'auto': the ring plan broadcasts a pruned halo index per round,
        # so its footprint bound is the plain index estimate at the
        # density radius; beyond the budget, exchange both sides
        n = len(halos) if isinstance(halos, pa.Table) else halos.count()
        method = "ring" if n * 32 <= 2 * 1024**3 else "shuffle"
    if method == "ring":
        return _knn_ring(
            halos, particles, k, box=box, dtype=dtype, batch_size=batch_size,
            include_d2=include_d2, sort=sort, r0=r0,
        )
    if method == "shuffle":
        return _knn_shuffle(
            halos, particles, k, box=box, dtype=dtype,
            include_d2=include_d2, sort=sort, r0=r0,
        )
    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    payload = {
        "halo_ids": halos_tbl.column("halo_id").to_numpy(),
        "xyz": np.stack(
            [halos_tbl.column(c).to_numpy().astype(dtype, copy=False) for c in "xyz"],
            axis=1,
        ),
    }
    ref = ray.put(payload)
    cands = particles.map_batches(
        _run_knn_kernel,
        fn_kwargs={
            "ref_list": [ref],
            "k": k,
            "box": box,
            "dtype_str": np.dtype(dtype).str,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    refs = list(cands.materialize().to_arrow_refs())
    fanin = 8
    while len(refs) > 1:
        last = len(refs) <= fanin
        refs = [
            _merge_knn_blocks.remote(k, include_d2, last, *refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
    final = ray.get(refs[0]) if refs else pa.table(
        {"halo_id": pa.array([], pa.int64()), "particle_id": pa.array([], pa.int64()), "rnk": pa.array([], pa.int64())}
    )
    if refs and "rnk" not in final.schema.names:
        final = ray.get(_merge_knn_blocks.remote(k, include_d2, True, final))
    if sort:
        final = final.sort_by([("halo_id", "ascending"), ("rnk", "ascending")])
    return ray.data.from_arrow(final)


def halo_nn(
    halos: "ray.data.Dataset",
    r2_ladder: np.ndarray,
    *,
    box: float = BOX_SIZE,
    method: str = "ring",
) -> "ray.data.Dataset":
    """-> halo_id, nn_id, shell:int64 — each halo's nearest OTHER halo
    (periodic min-image) and the radius-ladder shell its NN distance
    lands in (shell = #{r2 <= d2}; past the ladder -> nrads). The
    nearest-neighbour function G(r) input — the void/cluster diagnostic
    complementary to counts-in-cells — as a self-kNN: reuse the exact
    expanding-ring kNN with k=2 against the halo table itself (rank 1 is
    self at d2 = 0), so cost tracks the NN density radius, never the
    H x H cross product."""
    import pyarrow.compute as pc

    r2l = np.asarray(r2_ladder, dtype=np.float64)

    def as_particles(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "particle_id": batch.column("halo_id"),
                "x": batch.column("x"),
                "y": batch.column("y"),
                "z": batch.column("z"),
            }
        )

    base = halos.map_batches(as_particles, batch_format="pyarrow", zero_copy_batch=True)
    nn2 = knn(halos, base, 2, box=box, include_d2=True, sort=False, method=method)

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("particle_id"), batch.column("halo_id")))
        # after dropping self, the surviving lower rank IS the true NN;
        # within a batch each halo carries exactly rows rnk 1..2
        hid = t.column("halo_id").to_numpy()
        rnk = t.column("rnk").to_numpy()
        order = np.lexsort((rnk, hid))
        hid_s = hid[order]
        first = np.flatnonzero(np.r_[True, hid_s[1:] != hid_s[:-1]])
        take = pa.array(order[first], pa.int64())
        d2 = t.column("d2").to_numpy()[order[first]]
        shell = np.searchsorted(r2l, d2, side="right").astype(np.int64)
        return pa.table(
            {
                "halo_id": pa.array(hid_s[first], pa.int64()),
                "nn_id": t.column("particle_id").take(take),
                "shell": pa.array(shell, pa.int64()),
            }
        )

    # kNN emits each halo's rows contiguously inside one merged block, so
    # the self-drop + rank-min is a per-batch kernel, not another shuffle
    return nn2.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True).sort(
        "halo_id"
    )


def nn_shell_hist(nn: "ray.data.Dataset", nrads: int) -> "ray.data.Dataset":
    """-> shell:int64, n:int64 — histogram of NN shells (every shell row
    0..nrads emitted, zeros included). One bincount per batch + a single
    remote fold: the exchange carries (nrads+1)-long partials only."""

    def partial(batch: pa.Table) -> pa.Table:
        c = np.bincount(batch.column("shell").to_numpy(), minlength=nrads + 1)
        return pa.table(
            {
                "shell": pa.array(np.arange(nrads + 1, dtype=np.int64), pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    parts = nn.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    refs = list(parts.materialize().to_arrow_refs())

    @ray.remote
    def fold(*tbls: pa.Table) -> pa.Table:
        tot = np.zeros(nrads + 1, dtype=np.int64)
        for t in tbls:
            if t.num_rows:
                np.add.at(tot, t.column("shell").to_numpy(), t.column("n").to_numpy())
        return pa.table(
            {
                "shell": pa.array(np.arange(nrads + 1, dtype=np.int64), pa.int64()),
                "n": pa.array(tot, pa.int64()),
            }
        )

    return ray.data.from_arrow_refs([fold.remote(*refs)])
