"""The flagship pipeline: shell-count spatial join (SJCS semantics).

Logical query (reference README.md:18-31): for every halo, count
particles per concentric radial shell under the periodic-box metric.
Physical plans (SURVEY.md §7.1):

- ``mode='broadcast'``: halo side indexed once (cell->replica CSR),
  ``ray.put`` once, particles stream through an actor pool. No shuffle
  of the big side at all; the only exchange is the tiny partial-histogram
  groupby. Correct while the halo table fits the object store (~24 B/row
  + replicas — 10 M halos is fine).

- ``mode='shuffle'``: both sides get cell keys (halos ball-cover
  replicated), co-partitioned by groupby('cell'); per-cell vectorized
  kernel; partial histograms merged by groupby('halo_id').sum. Scales to
  both sides huge; one all-to-all exchange keyed by cell.

Both plans end in the same partial+final aggregate, the distributed
replacement of the reference's shared counts matrix (reference
src/astr_rcount/main.c:651, 815-823 / A1-A2 in SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE, GridSpec, RadiusLadder, default_pool
from spatialjoincountovershells_ray.stages import extract
from spatialjoincountovershells_ray.stages.join_kernels import (
    BroadcastShellCount,
    HaloIndex,
    cell_group_shell_count,
    run_broadcast_kernel,
)


def dataset_to_table(ds: "ray.data.Dataset") -> pa.Table:
    """Materialize a SMALL dataset driver-side as one Arrow table."""
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    if not tables:
        return ray.get(refs[0]) if refs else pa.table({})
    return pa.concat_tables(tables)


def _zeros_for(halos_tbl: pa.Table, nrads: int) -> pa.Table:
    cols = {"halo_id": halos_tbl.column("halo_id")}
    z = pa.array(np.zeros(halos_tbl.num_rows, dtype=np.int64))
    for i in range(nrads):
        cols[f"s{i}"] = z
    return pa.table(cols)


@ray.remote
def _build_index(hids, hxyz, rmax, grid, box) -> "HaloIndex":
    return HaloIndex.build(hids, hxyz, rmax, grid, box)


@ray.remote
def _merge_hist_blocks(nrads: int, *tables: pa.Table) -> pa.Table:
    scols = [f"s{i}" for i in range(nrads)]
    t = pa.concat_tables([t for t in tables if t.num_rows], promote_options="none")
    g = t.group_by("halo_id").aggregate([(c, "sum") for c in scols])
    # select by name: pyarrow versions differ on whether group keys come
    # first or last in the aggregate output — positional rename would
    # silently relabel halo_id as a count column
    return pa.table({"halo_id": g.column("halo_id"), **{c: g.column(f"{c}_sum") for c in scols}})


def _merge_partials_tree(
    partials: "ray.data.Dataset", zeros: pa.Table | None, nrads: int, sort: bool, fanin: int = 8
) -> "ray.data.Dataset":
    """Tree-aggregate the partial histograms with raw Ray tasks.

    The Dataset groupby is a general sort-based shuffle; for this merge
    (small bounded key space — the broadcastable halo table — and an
    associative element-wise sum) a log-depth tree of Arrow group_by
    tasks is ~50x faster (measured 0.4s vs 23s on 1.9M partial rows).
    This is the documented drop-to-raw-Ray case of SURVEY.md §2.10: the
    partitioning assumption is that the final (nhalos x nrads) histogram
    fits one task, which is exactly the broadcast-mode precondition.
    """
    # materialize once, then take block refs — calling to_arrow_refs on the
    # lazy dataset re-executes the whole join a second time for its schema
    # probe (observed as a duplicate plan with limit=1)
    refs = [r for r in partials.materialize().to_arrow_refs()]
    if zeros is not None:
        refs.append(ray.put(zeros))
    if not refs:
        return ray.data.from_arrow(zeros if zeros is not None else pa.table({}))
    merged = False
    while len(refs) > 1:
        refs = [
            _merge_hist_blocks.remote(nrads, *refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
        merged = True
    if not merged:
        # a single block may still bundle several map_batches outputs with
        # duplicate halo_id partial rows — always aggregate at least once
        refs = [_merge_hist_blocks.remote(nrads, refs[0])]
    final: pa.Table = ray.get(refs[0])
    if isinstance(final, list):
        final = final[0]
    if sort:
        final = final.sort_by("halo_id")
    return ray.data.from_arrow(final)


def _merge_partials(
    partials: "ray.data.Dataset", zeros: pa.Table | None, nrads: int, sort: bool
) -> "ray.data.Dataset":
    """groupby(halo_id).sum over partial histograms (+ dense zero rows).

    The Dataset-API merge, used by the shuffle plan where the halo key
    space is unbounded (no single-task histogram assumption)."""
    if zeros is not None:
        partials = partials.union(ray.data.from_arrow(zeros))
    scols = [f"s{i}" for i in range(nrads)]
    agg = partials.groupby("halo_id").sum(scols)

    def rename(batch: pa.Table) -> pa.Table:
        mapping = {f"sum({c})": c for c in scols}
        return batch.rename_columns(
            [mapping.get(n, n) for n in batch.schema.names]
        )

    out = agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort("halo_id") if sort else out


def shell_count(
    halos: "ray.data.Dataset | pa.Table",
    particles: "ray.data.Dataset",
    ladder: RadiusLadder,
    *,
    mode: str = "broadcast",
    grid: GridSpec | None = None,
    box: float = BOX_SIZE,
    # larger batches amortize the per-batch replica->halo histogram fold
    # (span*nrads add.at elements per batch regardless of batch size);
    # 16k keeps ~37 concurrent tasks even on a single-file sf0.1 read
    batch_size: int = 16384,
    concurrency: tuple[int, int] | int | None = None,
    sort: bool = True,
    include_zero_halos: bool = True,
    salt=None,
    auto_salt: bool = False,
    salt_target: int = 200_000,
    halo_index: "HaloIndex | None" = None,
    exchange: str = "bucket",
    auto_broadcast_bytes: float = 2 * 1024**3,
    remote_index_build: bool = False,
) -> "ray.data.Dataset":
    """Per-halo shell histograms: halo_id:int64, s0..s{nrads-1}:int64.

    ``mode='auto'`` picks broadcast vs shuffle from the estimated
    replicated-index footprint vs ``auto_broadcast_bytes``."""
    # default grid: ~3 cells per rmax per axis (sweep-tuned: candidate
    # pruning wins over replica-index growth up to L ~ rmax/3 with the
    # sphere-tightened cover). Tune per workload via `grid`.
    grid = grid or GridSpec.for_radius(ladder.rmax, box=box, target_cells_per_r=3.0)
    nrads = ladder.nrads

    if mode == "auto":
        # cost-based plan choice: broadcast iff the replicated halo index
        # fits a per-worker budget; otherwise exchange both sides. The
        # index footprint is nhalos x cover-cells-per-ball x bytes-per-
        # replica (3 coords + id + CSR slot); 0.6 ~= sphere/cube volume
        # ratio of the tightened cover. Counting a Dataset halo side may
        # execute its pipeline — pass a pa.Table or halo_index when that
        # matters.
        if halo_index is not None:
            mode = "broadcast"
        else:
            n = len(halos) if isinstance(halos, pa.Table) else halos.count()
            cover = 0.6 * (2.0 * ladder.rmax / grid.L + 1.0) ** 3
            bytes_per_replica = 3 * np.dtype(ladder.dtype).itemsize + 16
            est = n * cover * bytes_per_replica
            mode = "broadcast" if est <= auto_broadcast_bytes else "shuffle"

    if mode == "broadcast":
        if halo_index is not None:
            # prebuilt/cached index (a production job builds it once and
            # probes many particle shards — reference A2 semantics)
            index = halo_index
            hids = index.halo_ids
            index_ref = getattr(index, "_ref", None) or ray.put(index)
            index._ref = index_ref
        else:
            halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
            hids = halos_tbl.column("halo_id").to_numpy()
            hxyz = np.stack(
                [halos_tbl.column(c).to_numpy().astype(ladder.dtype, copy=False) for c in "xyz"],
                axis=1,
            )
            if remote_index_build:
                # build on a worker: the probe tasks block on this ref, so
                # the build overlaps the particle read/extract stages (the
                # reference overlaps build with probing the same way via
                # its backlog queue, src/astr_rcount/main.c:266-350). The
                # right default on a real cluster — but on THIS sandbox a
                # cold worker's lazily-faulted heap makes the first big
                # build 5-20x slower (BASELINE.md), so the warm driver is
                # the reliable default here.
                index_ref = _build_index.remote(hids, hxyz, ladder.rmax, grid, box)
            else:
                index = HaloIndex.build(hids, hxyz, ladder.rmax, grid, box)
                index_ref = ray.put(index)
        if concurrency is None:
            # task mode: long-lived task workers + per-worker kernel cache
            # amortize index fetch and scratch like an actor pool would,
            # without paying a fresh process spawn per pool (see
            # run_broadcast_kernel). Pass concurrency for a real actor pool.
            partials = particles.map_batches(
                run_broadcast_kernel,
                fn_kwargs={
                    "cls": BroadcastShellCount,
                    "ref_list": [index_ref],
                    "ladder": ladder,
                },
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
            )
        else:
            partials = particles.map_batches(
                BroadcastShellCount,
                fn_constructor_kwargs={"index_ref": [index_ref], "ladder": ladder},
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
                concurrency=concurrency,
            )
        zeros = None
        if include_zero_halos:
            zcols = {"halo_id": pa.array(hids, pa.int64())}
            z = pa.array(np.zeros(len(hids), dtype=np.int64))
            for i in range(nrads):
                zcols[f"s{i}"] = z
            zeros = pa.table(zcols)
        return _merge_partials_tree(partials, zeros, nrads, sort)

    if mode == "rtree":
        # SURVEY §2.3 T2: the reference's second physical plan — an
        # insertion-built Guttman R-tree instead of the grid CSR; same
        # exact distance/binning kernels, bit-identical histograms
        from spatialjoincountovershells_ray.stages.rtree import (
            RTreeIndex,
            RTreeShellCount,
        )

        if halo_index is not None:
            index = halo_index
        else:
            halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
            index = RTreeIndex.build(
                halos_tbl.column("halo_id").to_numpy(),
                np.stack(
                    [halos_tbl.column(c).to_numpy() for c in "xyz"], axis=1
                ),
                box,
            )
        hids = index.halo_ids
        index_ref = getattr(index, "_ref", None) or ray.put(index)
        index._ref = index_ref
        partials = particles.map_batches(
            run_broadcast_kernel,
            fn_kwargs={
                "cls": RTreeShellCount,
                "ref_list": [index_ref],
                "ladder": ladder,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
        zeros = None
        if include_zero_halos:
            zcols = {"halo_id": pa.array(hids, pa.int64())}
            z = pa.array(np.zeros(len(hids), dtype=np.int64))
            for i in range(nrads):
                zcols[f"s{i}"] = z
            zeros = pa.table(zcols)
        return _merge_partials_tree(partials, zeros, nrads, sort)

    if mode == "shuffle":
        if isinstance(halos, pa.Table):
            halos = ray.data.from_arrow(halos)

        if auto_salt and salt is None:
            from spatialjoincountovershells_ray.stages.salt import (
                SaltMap,
                cell_histogram,
                salt_plan,
            )

            hist = cell_histogram(particles, grid, ladder.dtype)
            salt = SaltMap(salt_plan(hist, salt_target))

        from spatialjoincountovershells_ray.stages.exchange import tag_for_cell_exchange

        both = tag_for_cell_exchange(
            halos, particles, ladder.rmax, grid, ladder.dtype, salt
        )
        zeros = None
        if include_zero_halos:
            htbl = dataset_to_table(halos.select_columns(["halo_id"]))
            zeros = _zeros_for(htbl, nrads)
        if exchange == "bucket":
            # explicit two-stage hash shuffle on raw Ray tasks: co-locate by
            # cell hash, then merge by halo-id hash — neither stage assumes
            # the result fits one task (see stages/exchange.py)
            from spatialjoincountovershells_ray.stages.exchange import (
                bucketed_cell_join,
                bucketed_hist_merge,
            )

            partials = bucketed_cell_join(both, ladder, box)
            out = bucketed_hist_merge(partials, zeros, nrads)
            return out.sort("halo_id") if sort else out
        partials = both.groupby("cell").map_groups(
            lambda g: cell_group_shell_count(g, ladder, box), batch_format="pyarrow"
        )
        return _merge_partials(partials, zeros, nrads, sort)

    raise ValueError(f"unknown mode {mode!r}")


def shell_count_from_documents(
    halo_docs: "ray.data.Dataset",
    particle_docs: "ray.data.Dataset",
    ladder: RadiusLadder,
    **kwargs,
) -> "ray.data.Dataset":
    """Documents in, histograms out: the reference's end-to-end run
    (read halos -> read particles -> join -> counts, reference
    src/astr_rcount/main.c:445-672) over the interleaved-span table."""
    halos = halo_docs.map_batches(
        lambda b: extract.extract_halos(b, dtype=ladder.dtype),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["halo_id", "x", "y", "z"])
    particles = particle_docs.map_batches(
        lambda b: extract.extract_particles(b, dtype=ladder.dtype),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["particle_id", "x", "y", "z"])
    return shell_count(halos, particles, ladder, **kwargs)


@ray.remote
def _fold_corr_partials(nrads: int, *parts: pa.Table) -> pa.Table:
    """Sum the fixed-size (shell, dd, dr) partials and attach the
    Davis-Peebles estimate w = dd/dr - 1 (NULL where dr == 0). NR == ND
    here (the random catalog re-derives one point per particle), so the
    (NR/ND) factor is exactly 1."""
    dd = np.zeros(nrads, dtype=np.int64)
    dr = np.zeros(nrads, dtype=np.int64)
    for t in parts:
        if t.num_rows:
            # a block may hold MANY concatenated nrads-row partials, so
            # shell indices repeat: duplicate-safe scatter-add required
            sh = t.column("shell").to_numpy()
            np.add.at(dd, sh, t.column("dd").to_numpy())
            np.add.at(dr, sh, t.column("dr").to_numpy())
    with np.errstate(divide="ignore", invalid="ignore"):
        w = dd.astype(np.float64) / dr.astype(np.float64) - 1.0
    return pa.table(
        {
            "shell": pa.array(np.arange(nrads, dtype=np.int64)),
            "dd": pa.array(dd),
            "dr": pa.array(dr),
            "w": pa.array(
                [None if dr[i] == 0 else float(w[i]) for i in range(nrads)],
                pa.float64(),
            ),
        }
    )


def pair_correlation(
    halos: "ray.data.Dataset | pa.Table",
    particles: "ray.data.Dataset",
    ladder: RadiusLadder,
    *,
    grid: GridSpec | None = None,
    box: float = BOX_SIZE,
    batch_size: int = 16384,
) -> "ray.data.Dataset":
    """Two-point cross-correlation estimate per shell: shell:int64,
    dd:int64, dr:int64, w:float64 — the Davis-Peebles w(r) = DD/DR - 1
    over the halo x particle catalogs, with the random catalog derived
    deterministically from the particle ids (hashing.derive_coord axes
    3-5; never read, shuffled, or stored).

    The domain estimator the reference's pair counts feed (its
    MultiRangeCount histograms ARE the DD term, reference
    src/objects/RTree/MultiRangeCount.c); this op adds the matching DR
    term and the estimate in one particle pass. Both probes share one
    broadcast halo index; partials are nrads fixed rows per batch, folded
    by one remote task — no Dataset groupby/sort anywhere.
    """
    from spatialjoincountovershells_ray.stages.join_kernels import PairCorrTotals

    grid = grid or GridSpec.for_radius(ladder.rmax, box=box, target_cells_per_r=3.0)
    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    hids = halos_tbl.column("halo_id").to_numpy()
    hxyz = np.stack(
        [halos_tbl.column(c).to_numpy().astype(ladder.dtype, copy=False) for c in "xyz"],
        axis=1,
    )
    index_ref = ray.put(HaloIndex.build(hids, hxyz, ladder.rmax, grid, box))
    partials = particles.map_batches(
        run_broadcast_kernel,
        fn_kwargs={
            "cls": PairCorrTotals,
            "ref_list": [index_ref],
            "ladder": ladder,
        },
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    refs = list(partials.materialize().to_arrow_refs())
    if not refs:
        refs = [ray.put(pa.table({"shell": pa.array([], pa.int64()),
                                  "dd": pa.array([], pa.int64()),
                                  "dr": pa.array([], pa.int64())}))]
    return ray.data.from_arrow_refs([_fold_corr_partials.remote(ladder.nrads, *refs)])


@ray.remote
def _fold_autocorr(nrads: int, nhalos: int, *parts: pa.Table) -> pa.Table:
    """Ordered-pair totals -> unordered i<j counts: every (i, j) pair was
    counted in both orders and each halo paired with itself exactly once
    at d2 == 0 (shell 0, since r2[0] > 0), so npairs = (tot - self)/2 —
    exact integers (tot - self is even by symmetry of the wrapped d2)."""
    tot = np.zeros(nrads, dtype=np.int64)
    for t in parts:
        if t.num_rows:
            np.add.at(tot, t.column("shell").to_numpy(), t.column("cnt").to_numpy())
    tot[0] -= nhalos
    assert (tot % 2 == 0).all(), "ordered pair totals must be even after self-pair removal"
    return pa.table(
        {
            "shell": pa.array(np.arange(nrads, dtype=np.int64)),
            "npairs": pa.array(tot // 2),
        }
    )


def halo_autocorr(
    halos: "ray.data.Dataset | pa.Table",
    ladder: RadiusLadder,
    *,
    grid: GridSpec | None = None,
    box: float = BOX_SIZE,
    batch_size: int = 16384,
) -> "ray.data.Dataset":
    """Halo-halo autocorrelation pair counts: shell:int64, npairs:int64 —
    the number of UNORDERED halo pairs (i < j) per radial shell under the
    periodic metric. The DD term of the two-point autocorrelation
    function (the statistic SJCS's pair counting exists to feed).

    One catalog plays both sides: the broadcast cell index is built over
    the halos and probed BY the halos; the ordered totals are corrected
    exactly for self-pairs and double counting in the final fold. Scales
    like the flagship broadcast plan (index once, stream the probe side).
    """
    from spatialjoincountovershells_ray.stages.join_kernels import ShellTotals

    grid = grid or GridSpec.for_radius(ladder.rmax, box=box, target_cells_per_r=3.0)
    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    hids = halos_tbl.column("halo_id").to_numpy()
    hxyz = np.stack(
        [halos_tbl.column(c).to_numpy().astype(ladder.dtype, copy=False) for c in "xyz"],
        axis=1,
    )
    index_ref = ray.put(HaloIndex.build(hids, hxyz, ladder.rmax, grid, box))
    probe = ray.data.from_arrow(halos_tbl)
    partials = probe.map_batches(
        run_broadcast_kernel,
        fn_kwargs={"cls": ShellTotals, "ref_list": [index_ref], "ladder": ladder},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    refs = list(partials.materialize().to_arrow_refs())
    if not refs:
        refs = [ray.put(pa.table({"shell": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}))]
    return ray.data.from_arrow_refs(
        [_fold_autocorr.remote(ladder.nrads, len(hids), *refs)]
    )


@ray.remote
def _fold_weighted(nrads: int, *parts: pa.Table) -> pa.Table:
    cnt = np.zeros(nrads, dtype=np.int64)
    wsum = np.zeros(nrads, dtype=np.int64)
    for t in parts:
        if t.num_rows:
            sh = t.column("shell").to_numpy()
            np.add.at(cnt, sh, t.column("npairs").to_numpy())
            np.add.at(wsum, sh, t.column("wsum").to_numpy())
    return pa.table(
        {
            "shell": pa.array(np.arange(nrads, dtype=np.int64)),
            "npairs": pa.array(cnt),
            "wsum": pa.array(wsum),
        }
    )


def weighted_pair_counts(
    halos: "ray.data.Dataset | pa.Table",
    particles: "ray.data.Dataset",
    ladder: RadiusLadder,
    *,
    grid: GridSpec | None = None,
    box: float = BOX_SIZE,
    batch_size: int = 16384,
) -> "ray.data.Dataset":
    """Marked (weighted) pair counts per shell: shell:int64, npairs:int64,
    wsum:int64 — the numerator of the marked correlation function
    M(r) = <w_h * w_p>_r / <w>^2, with integer marks derived from the ids
    (exact BIGINT arithmetic on both sides of the gate). Same physical
    plan as pair_correlation: one broadcast index, totals-only kernel,
    fixed-size partials folded by one remote task."""
    from spatialjoincountovershells_ray.stages.join_kernels import WeightedPairTotals

    grid = grid or GridSpec.for_radius(ladder.rmax, box=box, target_cells_per_r=3.0)
    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    hids = halos_tbl.column("halo_id").to_numpy()
    hxyz = np.stack(
        [halos_tbl.column(c).to_numpy().astype(ladder.dtype, copy=False) for c in "xyz"],
        axis=1,
    )
    index_ref = ray.put(HaloIndex.build(hids, hxyz, ladder.rmax, grid, box))
    partials = particles.map_batches(
        run_broadcast_kernel,
        fn_kwargs={"cls": WeightedPairTotals, "ref_list": [index_ref], "ladder": ladder},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    refs = list(partials.materialize().to_arrow_refs())
    if not refs:
        refs = [ray.put(pa.table({"shell": pa.array([], pa.int64()),
                                  "npairs": pa.array([], pa.int64()),
                                  "wsum": pa.array([], pa.int64())}))]
    return ray.data.from_arrow_refs([_fold_weighted.remote(ladder.nrads, *refs)])


@ray.remote
def _fold_jackknife(nrads: int, npatch: int, *parts: pa.Table) -> pa.Table:
    """Per-(patch, shell) totals -> leave-one-out jackknife samples:
    dd_loo = DD_total - DD_patch (likewise dr), w_loo = dd_loo/dr_loo - 1
    (single IEEE division; NULL where dr_loo == 0). All counts exact
    integers — the variance is the consumer's one-liner downstream."""
    dd = np.zeros((npatch, nrads), dtype=np.int64)
    dr = np.zeros((npatch, nrads), dtype=np.int64)
    for t in parts:
        if t.num_rows:
            p = t.column("patch").to_numpy()
            s = t.column("shell").to_numpy()
            np.add.at(dd, (p, s), t.column("dd").to_numpy())
            np.add.at(dr, (p, s), t.column("dr").to_numpy())
    dd_loo = dd.sum(axis=0, keepdims=True) - dd
    dr_loo = dr.sum(axis=0, keepdims=True) - dr
    with np.errstate(divide="ignore", invalid="ignore"):
        w = dd_loo.astype(np.float64) / dr_loo.astype(np.float64) - 1.0
    patch = np.repeat(np.arange(npatch, dtype=np.int64), nrads)
    shell = np.tile(np.arange(nrads, dtype=np.int64), npatch)
    flat_dr = dr_loo.ravel()
    return pa.table(
        {
            "patch": pa.array(patch),
            "shell": pa.array(shell),
            "dd_loo": pa.array(dd_loo.ravel()),
            "dr_loo": pa.array(flat_dr),
            "w_loo": pa.array(
                [None if flat_dr[i] == 0 else float(w.ravel()[i]) for i in range(len(flat_dr))],
                pa.float64(),
            ),
        }
    )


def pair_corr_jackknife(
    halos: "ray.data.Dataset | pa.Table",
    particles: "ray.data.Dataset",
    ladder: RadiusLadder,
    *,
    grid: GridSpec | None = None,
    box: float = BOX_SIZE,
    batch_size: int = 16384,
) -> "ray.data.Dataset":
    """Jackknife samples of the pair-correlation estimate: patch, shell,
    dd_loo, dr_loo (int64) and w_loo:float64 — the leave-one-patch-out
    Davis-Peebles estimates whose spread is the standard jackknife error
    bar on w(r). Patches are halo_id % NPATCH (deterministic and
    SQL-reproducible); one particle pass computes every patch's DD and DR
    simultaneously (NPATCH x nrads integer accumulators per batch)."""
    from spatialjoincountovershells_ray.stages.join_kernels import PatchCorrTotals

    grid = grid or GridSpec.for_radius(ladder.rmax, box=box, target_cells_per_r=3.0)
    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    hids = halos_tbl.column("halo_id").to_numpy()
    hxyz = np.stack(
        [halos_tbl.column(c).to_numpy().astype(ladder.dtype, copy=False) for c in "xyz"],
        axis=1,
    )
    index_ref = ray.put(HaloIndex.build(hids, hxyz, ladder.rmax, grid, box))
    partials = particles.map_batches(
        run_broadcast_kernel,
        fn_kwargs={"cls": PatchCorrTotals, "ref_list": [index_ref], "ladder": ladder},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    refs = list(partials.materialize().to_arrow_refs())
    if not refs:
        refs = [ray.put(pa.table({"patch": pa.array([], pa.int64()),
                                  "shell": pa.array([], pa.int64()),
                                  "dd": pa.array([], pa.int64()),
                                  "dr": pa.array([], pa.int64())}))]
    return ray.data.from_arrow_refs(
        [_fold_jackknife.remote(ladder.nrads, PatchCorrTotals.NPATCH, *refs)]
    )


def fof_groups(
    halos: "ray.data.Dataset | pa.Table",
    linking_length: float,
    *,
    box: float = BOX_SIZE,
) -> "ray.data.Dataset":
    """Friends-of-friends group finder: halo_id:int64, group_id:int64 —
    every halo labeled with the MIN halo_id of its FoF group (connected
    component of the pairs-within-linking-length graph under the periodic
    metric; singletons label themselves).

    THE halo/group finder of simulation post-processing (Davis et al.
    1985): the link pairs come from the broadcast-index range join, the
    components from the shared union-find assignment. Scale contract
    (assign_dup_clusters): the pair list is id pairs only and stays O(N)
    while the linking length is below the percolation threshold (the
    standard b ~ 0.2x mean separation regime); past it, move to the
    iterative min-label propagation of graph.cc_labels.
    """
    from spatialjoincountovershells_ray.pipelines.dedup import assign_dup_clusters
    from spatialjoincountovershells_ray.pipelines.range_join import range_join

    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    hids = halos_tbl.column("halo_id")
    probe = ray.data.from_arrow(
        pa.table(
            {
                "particle_id": hids,
                "x": halos_tbl.column("x"),
                "y": halos_tbl.column("y"),
                "z": halos_tbl.column("z"),
            }
        )
    )
    pairs = range_join(halos_tbl, probe, linking_length, box=box, sort=False)

    def to_edges(t: pa.Table) -> pa.Table:
        a = t.column("halo_id").to_numpy()
        b = t.column("particle_id").to_numpy()
        m = a < b  # one direction, self-pairs dropped
        return pa.table({"id_a": pa.array(a[m], pa.int64()), "id_b": pa.array(b[m], pa.int64())})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    labeled = assign_dup_clusters(
        ray.data.from_arrow(pa.table({"doc_id": hids})), edges
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"halo_id": t.column("doc_id"), "group_id": t.column("cluster_id")}
        )

    return labeled.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def fof_multiplicity(
    halos: "ray.data.Dataset | pa.Table",
    linking_length: float,
    *,
    box: float = BOX_SIZE,
) -> "ray.data.Dataset":
    """FoF multiplicity function: group_size:int64, n_groups:int64 — how
    many FoF groups have exactly N members (the group mass function's
    count-space form). Derived from :func:`fof_groups` with two tiny
    folds (labels are O(halos) — the broadcast-side contract)."""
    labeled = fof_groups(halos, linking_length, box=box)
    refs = list(labeled.materialize().to_arrow_refs())

    @ray.remote
    def fold(*parts: pa.Table) -> pa.Table:
        live = [t for t in parts if t.num_rows]
        if not live:
            return pa.table(
                {"group_size": pa.array([], pa.int64()), "n_groups": pa.array([], pa.int64())}
            )
        g = np.concatenate([t.column("group_id").to_numpy() for t in live])
        _, sizes = np.unique(g, return_counts=True)
        size, ngroups = np.unique(sizes, return_counts=True)
        return pa.table(
            {
                "group_size": pa.array(size.astype(np.int64)),
                "n_groups": pa.array(ngroups.astype(np.int64)),
            }
        )

    return ray.data.from_arrow_refs([fold.remote(*refs)])


@ray.remote
def _fold_cyl(nperp: int, npi: int, *parts: pa.Table) -> pa.Table:
    cnt = np.zeros((nperp, npi), dtype=np.int64)
    for t in parts:
        if t.num_rows:
            rp = t.column("rp_shell").to_numpy()
            pb = t.column("pi_bin").to_numpy()
            np.add.at(cnt, (rp, pb), t.column("npairs").to_numpy())
    return pa.table(
        {
            "rp_shell": pa.array(np.repeat(np.arange(nperp, dtype=np.int64), npi)),
            "pi_bin": pa.array(np.tile(np.arange(npi, dtype=np.int64), nperp)),
            "npairs": pa.array(cnt.ravel()),
        }
    )


def build_cyl_index(
    halos: "ray.data.Dataset | pa.Table",
    rp_ladder: RadiusLadder,
    *,
    box: float = BOX_SIZE,
):
    """Cylinder-covered HaloIndex for :func:`cylindrical_pairs` (cells
    sized to the smaller cylinder dimension, not the hypot: the
    shape-exact cover makes finer cells a pure pruning win — measured
    at sf0.1/32cpus: 1.08 s kernel at hypot-sized 13 cells vs 0.89 s at
    18). Build once and pass via ``halo_index=`` for the reference's A2
    many-probes-per-index template."""
    import math

    from spatialjoincountovershells_ray.functions.cells import cyl_cover_cells
    from spatialjoincountovershells_ray.stages.join_kernels import CYL_PI_EDGES

    pi_max = float(CYL_PI_EDGES[-1])
    r_cover = math.hypot(rp_ladder.rmax, pi_max)
    grid = GridSpec.for_radius(
        min(rp_ladder.rmax, pi_max), box=box, target_cells_per_r=3.0
    )
    halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
    hids = halos_tbl.column("halo_id").to_numpy()
    hxyz = np.stack(
        [halos_tbl.column(c).to_numpy().astype(rp_ladder.dtype, copy=False) for c in "xyz"],
        axis=1,
    )
    cover = cyl_cover_cells(hxyz, rp_ladder.rmax, pi_max, grid)
    return HaloIndex.build(hids, hxyz, r_cover, grid, box, cover=cover)


def cylindrical_pairs(
    halos: "ray.data.Dataset | pa.Table",
    particles: "ray.data.Dataset",
    rp_ladder: RadiusLadder,
    *,
    box: float = BOX_SIZE,
    batch_size: int = 16384,
    halo_index: "HaloIndex | None" = None,
) -> "ray.data.Dataset":
    """Cylindrical pair counts: rp_shell, pi_bin, npairs (int64) — pairs
    binned by transverse (x, y) separation shell and line-of-sight |z|
    bin under the periodic metric: the count table the projected
    correlation function wp(rp) integrates. The index cover is the
    CYLINDER itself (functions.cells.cyl_cover_cells — transverse disc
    × z slab, round-5): complete for every counted bin with none of the
    circumscribed ball's ~2.8× corner/cap candidate over-fetch."""
    from spatialjoincountovershells_ray.stages.join_kernels import (
        CYL_PI_EDGES,
        CylPairTotals,
    )

    if halo_index is None:
        halo_index = build_cyl_index(halos, rp_ladder, box=box)
    index_ref = ray.put(halo_index)
    partials = particles.map_batches(
        run_broadcast_kernel,
        fn_kwargs={"cls": CylPairTotals, "ref_list": [index_ref], "ladder": rp_ladder},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    refs = list(partials.materialize().to_arrow_refs())
    if not refs:
        refs = [ray.put(pa.table({"rp_shell": pa.array([], pa.int64()),
                                  "pi_bin": pa.array([], pa.int64()),
                                  "npairs": pa.array([], pa.int64())}))]
    return ray.data.from_arrow_refs(
        [_fold_cyl.remote(rp_ladder.nrads, len(CYL_PI_EDGES), *refs)]
    )


@ray.remote
def _merge_profile_blocks(cols: list, *tables: pa.Table) -> pa.Table:
    live = [t for t in tables if t.num_rows]
    if not live:
        return pa.table({n: pa.array([], pa.int64()) for n in ["halo_id"] + cols})
    t = pa.concat_tables(live, promote_options="none")
    g = t.group_by("halo_id").aggregate([(c, "sum") for c in cols])
    return pa.table(
        {"halo_id": g.column("halo_id"), **{c: g.column(f"{c}_sum") for c in cols}}
    )


def shell_d2_profile(
    halos: "ray.data.Dataset | pa.Table",
    particles: "ray.data.Dataset",
    ladder: RadiusLadder,
    *,
    grid: GridSpec | None = None,
    box: float = BOX_SIZE,
    # 32k (vs the kernels' usual 16k): the profile kernel folds TWO
    # nhalos x (nrads+1) accumulators per batch, so halving the batch
    # count is measurable (2.26 s -> 2.08 s at sf0.1/32cpus)
    batch_size: int = 32768,
    fanin: int = 8,
    halo_index: "HaloIndex | None" = None,
) -> "ray.data.Dataset":
    """Per-halo radial profile moments: halo_id, c0..c{n-1} (pair counts
    per shell) and m0..m{n-1} (per-shell sums of floor(d2*100) — exact
    int64 quantized squared-distance moments, so mean-d2-per-shell
    profiles derive exactly). The aggregate-pushdown demonstration of
    the kernel surface: one particle pass computes both statistics;
    dense zero rows for untouched halos; tree-merged like shell_count."""
    from spatialjoincountovershells_ray.stages.join_kernels import ShellProfileKernel

    grid = grid or GridSpec.for_radius(ladder.rmax, box=box, target_cells_per_r=3.0)
    nrads = ladder.nrads
    if halo_index is None:
        halos_tbl = halos if isinstance(halos, pa.Table) else dataset_to_table(halos)
        hids = halos_tbl.column("halo_id").to_numpy()
        hxyz = np.stack(
            [halos_tbl.column(c).to_numpy().astype(ladder.dtype, copy=False) for c in "xyz"],
            axis=1,
        )
        halo_index = HaloIndex.build(hids, hxyz, ladder.rmax, grid, box)
    hids = halo_index.halo_ids
    index_ref = ray.put(halo_index)
    partials = particles.map_batches(
        run_broadcast_kernel,
        fn_kwargs={"cls": ShellProfileKernel, "ref_list": [index_ref], "ladder": ladder},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cols = [f"c{i}" for i in range(nrads)] + [f"m{i}" for i in range(nrads)]
    zeros = pa.table(
        {
            "halo_id": pa.array(hids, pa.int64()),
            **{c: pa.array(np.zeros(len(hids), np.int64)) for c in cols},
        }
    )
    refs = [r for r in partials.materialize().to_arrow_refs()]
    refs.append(ray.put(zeros))
    merged = False
    while len(refs) > 1:
        refs = [
            _merge_profile_blocks.remote(cols, *refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
        merged = True
    if not merged:
        refs = [_merge_profile_blocks.remote(cols, refs[0])]
    return ray.data.from_arrow_refs(refs)
