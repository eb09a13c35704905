"""Distance-join kernels: broadcast actors and per-cell group kernels.

Replaces the reference's per-halo tree probe
(``multiRangeCountWithPriodicBoundArraySTR``, reference
src/objects/ArraySTR/MultiRangeCount.c:13-115) with two Ray-Data-native
physical plans for the same logical join:

- **broadcast**: the (small) halo side is indexed once into a
  cell -> halo-replica CSR, ``ray.put`` once, and read zero-copy by every
  actor of a ``map_batches`` pool (setup in ``__init__``, per-batch work
  in ``__call__``). Particles stream through; candidate halo-particle
  pairs are generated fully vectorized via CSR gather (no Python loop
  over rows or cells). This is the classic broadcast join — correct at
  any particle scale while halos fit in the object store.

- **shuffle**: both sides get cell keys (halos replicated over their
  ball cover), are co-partitioned by ``groupby('cell')``, and a
  vectorized kernel runs per cell group. Scales to both sides huge; see
  pipelines.shell_count.

Periodic boundary handling is the cell wrap + minimum-image metric
(SURVEY.md §7.1), equivalent to the reference's mirror probes for
rmax < box/2.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE, GridSpec, RadiusLadder
from spatialjoincountovershells_ray.functions.cells import (
    ball_cover_cells,
    cell_index,
    flatten_cell,
    point_cells,
)
from spatialjoincountovershells_ray.functions.distance import (
    PairD2Kernel,
    shell_of,
    torus_d2,
)


@dataclass
class HaloIndex:
    """Cell -> halo-replica CSR over the broadcast (query) side."""

    halo_ids: np.ndarray  # int64 [H]
    xyz: np.ndarray  # [H, 3] float32/float64
    ucells: np.ndarray  # sorted unique covered cells [C]
    starts: np.ndarray  # [C] start into rep_rows
    counts: np.ndarray  # [C]
    rep_rows: np.ndarray  # [R] halo row index per replica, grouped by cell
    grid: GridSpec
    box: float

    # replica-expanded coordinate columns (cell-grouped, so the pair loop
    # reads them in near-sequential ranges): set by build()
    rep_cols: "tuple[np.ndarray, np.ndarray, np.ndarray] | None" = None
    # float32 copies of rep_cols for the two-phase kernel (phase 1 runs in
    # float32 — half the gather bandwidth; borderline pairs are re-checked
    # against rep_cols in float64). Shipped in the broadcast object so all
    # workers read them zero-copy instead of each converting privately.
    rep_cols32: "tuple[np.ndarray, np.ndarray, np.ndarray] | None" = None

    @classmethod
    def build(
        cls,
        halo_ids: np.ndarray,
        xyz: np.ndarray,
        rmax: float,
        grid: GridSpec,
        box: float = BOX_SIZE,
        cover: "tuple[np.ndarray, np.ndarray] | None" = None,
    ) -> "HaloIndex":
        """``cover`` overrides the default ball cover with a precomputed
        ``(row, cell)`` replica set (e.g. functions.cells.cyl_cover_cells
        for the cylindrical kernel's shape-exact cover)."""
        row, cell = cover if cover is not None else ball_cover_cells(xyz, rmax, grid)
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        row = row[order]
        ucells, starts, counts = np.unique(cell, return_index=True, return_counts=True)
        idx = cls(
            halo_ids=np.ascontiguousarray(halo_ids),
            xyz=np.ascontiguousarray(xyz),
            ucells=ucells,
            starts=starts.astype(np.int64),
            counts=counts.astype(np.int64),
            rep_rows=row,
            grid=grid,
            box=box,
        )
        # materialize per-replica coordinates: turns the halo-side pair
        # gather from random row access into contiguous range reads
        idx.rep_cols = tuple(np.ascontiguousarray(xyz[row, ax]) for ax in range(3))
        if idx.rep_cols[0].dtype == np.float64:
            idx.rep_cols32 = tuple(c.astype(np.float32) for c in idx.rep_cols)
        return idx

    @property
    def cols(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-axis contiguous halo coordinate columns (for PairD2Kernel)."""
        c = getattr(self, "_cols", None)
        if c is None:
            c = tuple(np.ascontiguousarray(self.xyz[:, ax]) for ax in range(3))
            self._cols = c
        return c

    def candidates(self, p_cols) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized candidate generation for a particle batch.

        ``p_cols``: per-axis 1-D particle coordinate arrays. Returns
        (pair_particle_row, pair_halo_row): for every particle, all halos
        whose ball cover includes the particle's cell.
        """
        pcell = flatten_cell(
            cell_index(p_cols[0], self.grid),
            cell_index(p_cols[1], self.grid),
            cell_index(p_cols[2], self.grid),
            self.grid,
        )
        pos = np.searchsorted(self.ucells, pcell)
        pos_c = np.minimum(pos, len(self.ucells) - 1) if len(self.ucells) else pos
        valid = np.zeros(len(pcell), dtype=bool)
        if len(self.ucells):
            valid = self.ucells[pos_c] == pcell
        cnt = np.where(valid, self.counts[pos_c], 0)
        total = int(cnt.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        pair_p = np.repeat(np.arange(len(pcell), dtype=np.int64), cnt)
        offsets = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(offsets, cnt)
        pair_rep = np.repeat(self.starts[pos_c] * valid, cnt) + local
        pair_h = self.rep_rows[pair_rep]
        return pair_p, pair_h


def _batch_xyz(batch: pa.Table, dtype) -> np.ndarray:
    return np.stack(
        [batch.column(c).to_numpy(zero_copy_only=False).astype(dtype, copy=False) for c in ("x", "y", "z")],
        axis=1,
    )


def _batch_cols(batch: pa.Table, dtype) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-axis coordinate columns, zero-copy from Arrow when dtype matches."""
    return tuple(
        batch.column(c).to_numpy(zero_copy_only=False).astype(dtype, copy=False)
        for c in ("x", "y", "z")
    )


class _PairScratch:
    """Persistent candidate-expansion buffers (allocation/page-fault churn
    on fresh multi-MB arrays costs more than the arithmetic on this class
    of hardware — allocate once per actor, reuse every sub-chunk)."""

    def __init__(self, dtype, idx_dtype=np.int32):
        # int32 pair indices whenever the replica space allows it: the
        # sub-chunk working set must stay inside the PRIVATE L2 (2 MB
        # here) — at int64 it spilled into the shared L3 and 32 workers
        # contended like a DRAM-bound stream (measured: 0.61 scaling
        # efficiency vs the machine's 0.86 pure-compute ceiling)
        self.cap = 0
        self.dtype = dtype
        self.idx_dtype = np.dtype(idx_dtype)

    def ensure(self, n: int) -> None:
        if n <= self.cap:
            return
        cap = int(n * 1.25) + 1024
        it = self.idx_dtype
        self.pp = np.empty(cap, it)
        self.local = np.empty(cap, it)
        self.rep = np.empty(cap, it)
        self.ph = np.empty(cap, np.int64)
        self.ar = np.arange(cap, dtype=it)
        self.d2 = np.empty(cap, self.dtype)
        self.d2f = np.empty(cap, np.float32)  # phase-1 distances
        self.cap = cap


class _BroadcastKernel:
    """Shared actor-pool setup: fetch the HaloIndex once per actor."""

    # target pairs per expansion sub-chunk: bounds the persistent buffer
    # working set (~6 x 8B x SUBCHUNK) while keeping it cache/page hot
    SUBCHUNK_PAIRS = 1 << 16  # L2/L3-resident working set: scales across many workers

    def __init__(self, index_ref, ladder: RadiusLadder):
        # index_ref is wrapped in a list so Ray Data does not resolve it per
        # task; ray.get here is once per actor and zero-copy for the arrays.
        self.index: HaloIndex = ray.get(index_ref[0]) if isinstance(index_ref, list) else index_ref
        self.ladder = ladder
        self.dtype = ladder.dtype
        self.r2 = ladder.r2
        self.d2k = PairD2Kernel(dtype=ladder.dtype)
        idx_dtype = (
            np.int32 if len(self.index.rep_rows) < 2**31 - 1 else np.int64
        )
        self.scratch = _PairScratch(ladder.dtype, idx_dtype=idx_dtype)
        # two-phase distance: available when the index carries float32
        # replica columns and the query precision is float64 (phase 1 in
        # float32 = half the gather/compute bandwidth; any pair within a
        # conservative error band of a shell boundary is re-evaluated in
        # float64, so shell decisions are bit-identical to the pure-f64
        # path — see _band for the bound). Phase 1 also uses the fast
        # compare-based torus wrap (no divide/floor); its divergence from
        # the floor form is rounding-level and inside the same band.
        self.rep32 = getattr(self.index, "rep_cols32", None)
        self.two_phase = self.rep32 is not None and self.dtype == np.dtype(np.float64)
        self.d2k32 = PairD2Kernel(dtype=np.float32, fast_wrap=True) if self.two_phase else None

        # Privatize the per-sub-chunk hot arrays once per worker: a plasma
        # object is a read-only 4 KB-page shared mmap, and the gather /
        # binary-search loops over it pay measurably more TLB+DRAM cost
        # than over private (THP-backed) anonymous memory — with N workers
        # all hammering the same shared pages the loss compounds and shows
        # up directly as lost scaling efficiency at high parallelism.
        # _private copies ONLY arrays that are actually plasma-backed
        # (read-only); locally-built indexes pass through untouched.
        # Cost: ~20 B/replica + CSR per worker. The float64 replica
        # columns stay shared in the two-phase path (touched only for the
        # rare boundary-band patch-ups).
        def _private(a: np.ndarray) -> np.ndarray:
            return a.copy() if (a is not None and not a.flags.writeable) else a

        if self.two_phase:
            self.rep32 = tuple(_private(c) for c in self.rep32)
        self._rep_rows_fold = _private(self.index.rep_rows)
        self._csr_ucells = _private(self.index.ucells)
        self._csr_starts = _private(self.index.starts)
        self._csr_counts = _private(self.index.counts)

    def _shell_ctx(self, r2: np.ndarray):
        """Precomputed constants for _shells over the boundary array r2.

        Banded-edge trick: searchsorted over the interleaved edges
        [r2_0-b, r2_0+b, r2_1-b, r2_1+b, ...] gives BOTH the shell
        ((e+1)>>1) and the suspicion flag (e odd <=> inside a band) in a
        single binary-search pass. Requires the edges to be strictly
        increasing (bands narrower than boundary gaps); falls back to the
        two-pass form otherwise.
        """
        if not self.two_phase:
            return (r2, None, None, None, None, None)
        r2_32 = r2.astype(np.float32)
        band = np.float32(self._band(r2, self.index.box))
        edges = np.empty(2 * len(r2), dtype=np.float32)
        edges[0::2] = r2_32 - band
        edges[1::2] = r2_32 + band
        if not (np.diff(edges) > 0).all():
            edges = None  # pathological ladder: adjacent bands overlap
        lo_pad = np.concatenate(([-np.inf], r2_32)).astype(np.float32)
        hi_pad = np.concatenate((r2_32, [np.inf])).astype(np.float32)
        return (r2, r2_32, band, lo_pad, hi_pad, edges)

    def _shells(self, rep, pp, sorted_cols, sorted32, ctx) -> np.ndarray:
        """Exact shell index per pair: searchsorted(r2, d2_f64, 'right'),
        computed via phase-1 float32 + float64 patch-up of every pair
        within the error band of a boundary (bit-identical to pure f64)."""
        idx = self.index
        n = len(pp)
        r2, r2_32, band, lo_pad, hi_pad, edges = ctx
        if not self.two_phase:
            d2 = self.d2k(idx.rep_cols, sorted_cols, rep, pp, idx.box, out=self.scratch.d2[:n])
            return np.searchsorted(r2, d2, side="right")
        d2f = self.d2k32(self.rep32, sorted32, rep, pp, idx.box, out=self.scratch.d2f[:n])
        if edges is not None:
            e = np.searchsorted(edges, d2f, side="right")
            si = np.flatnonzero(e & 1)
            np.add(e, 1, out=e)
            shell = np.right_shift(e, 1, out=e)
        else:
            shell = np.searchsorted(r2_32, d2f, side="right")
            near = (d2f - lo_pad[shell] <= band) | (hi_pad[shell] - d2f <= band)
            si = np.flatnonzero(near)
        if len(si):
            d2x = self.d2k(idx.rep_cols, sorted_cols, rep[si], pp[si], idx.box)
            shell[si] = np.searchsorted(r2, d2x, side="right")
        return shell

    @staticmethod
    def _band(r2: np.ndarray, box: float) -> float:
        """Conservative |d2_f32 - d2_f64| bound for coordinates in
        [0, box]. Per-axis min-image error is <= ~6*box*2^-24 (two input
        conversions + 4 rounded ops; an image flip near |delta| = box/2
        changes m^2 by <= 2*box*err). d2 error <= 2*sqrt(3*d2)*E_m
        + 3*d2*2^-23 <= 2*sqrt(3)*rmax*E_m + 3*r2max*2^-23 for the
        relevant d2 <= r2max. The constants below carry a >10x safety
        margin plus the f32 rounding of the boundaries themselves."""
        r2max = float(r2[-1])
        rmax = float(np.sqrt(r2max))
        return float(128.0 * 2.0**-24 * box * rmax + 2.0**-16 * r2max + 1e-6)

    def _sort_batch(self, p_cols):
        """Cell-sort the particle batch; returns (psort, sorted_cols).

        Particles processed in cell order + the cell-grouped replica
        columns make both coordinate streams near-sequential — the kernel
        is cache-bound instead of DRAM-gather-bound (this is what lets 32
        concurrent workers scale instead of fighting over bandwidth)."""
        idx = self.index
        pcell = flatten_cell(
            cell_index(p_cols[0], idx.grid),
            cell_index(p_cols[1], idx.grid),
            cell_index(p_cols[2], idx.grid),
            idx.grid,
        )
        psort = np.argsort(pcell, kind="stable").astype(self.scratch.idx_dtype, copy=False)
        return psort, tuple(np.ascontiguousarray(c[psort]) for c in p_cols)

    def _batch_cell_counts(self, p_cols):
        """Per-particle candidate-halo counts for a batch (tiny arrays)."""
        idx = self.index
        pcell = flatten_cell(
            cell_index(p_cols[0], idx.grid),
            cell_index(p_cols[1], idx.grid),
            cell_index(p_cols[2], idx.grid),
            idx.grid,
        )
        ucells, starts, counts = self._csr_ucells, self._csr_starts, self._csr_counts
        if len(ucells) == 0:
            return np.zeros(len(pcell), np.int64), np.zeros(len(pcell), np.int64)
        pos = np.searchsorted(ucells, pcell)
        pos_c = np.minimum(pos, len(ucells) - 1)
        valid = ucells[pos_c] == pcell
        cnt = np.where(valid, counts[pos_c], 0)
        rep_start = starts[pos_c] * valid
        return cnt, rep_start

    def _iter_expanded(self, sorted_cols):
        """Candidate expansion over sub-chunks: yields (pp, rep) scratch
        slices with pp the cell-sorted particle row and rep the halo
        replica index, <= SUBCHUNK_PAIRS pairs per yield."""
        cnt, rep_start = self._batch_cell_counts(sorted_cols)
        ends = np.cumsum(cnt)
        total = int(ends[-1]) if len(ends) else 0
        if total == 0:
            return
        s = self.scratch
        # split the particle range into segments of <= SUBCHUNK_PAIRS pairs
        bounds = [0]
        while bounds[-1] < len(cnt):
            lo = bounds[-1]
            base = ends[lo - 1] if lo else 0
            hi = int(np.searchsorted(ends, base + self.SUBCHUNK_PAIRS, side="right"))
            hi = max(hi, lo + 1)  # force progress even if one particle exceeds the target
            bounds.append(min(hi, len(cnt)))
        it = s.idx_dtype
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            base = int(ends[lo - 1]) if lo else 0
            n = int(ends[hi - 1]) - base
            if n == 0:
                continue
            s.ensure(n)
            pp = s.pp[:n]
            pp.fill(0)
            # block starts within this segment: particle lo+1..hi-1 begins at
            # ends[lo..hi-2]-base; add 1 there (coincident for cnt==0 rows)
            seg_ends = ends[lo : hi - 1] - base
            np.add.at(pp, seg_ends[seg_ends < n], 1)
            np.cumsum(pp, out=pp)  # 0-based particle ordinal within segment
            block_start = (ends[lo:hi] - cnt[lo:hi] - base).astype(it)
            local = s.local[:n]
            np.take(block_start, pp, out=local)
            np.subtract(s.ar[:n], local, out=local)
            rep = s.rep[:n]
            np.take(rep_start[lo:hi].astype(it, copy=False), pp, out=rep)
            np.add(rep, local, out=rep)
            np.add(pp, it.type(lo), out=pp)  # absolute particle row (cell-sorted space)
            yield pp, rep

    def _iter_pair_chunks(self, p_cols):
        """Yield (pair_p, pair_h, d2) over sub-chunks of the batch, d2 in
        full ladder precision. pair_p indexes into the original batch."""
        idx = self.index
        s = self.scratch
        psort, sorted_cols = self._sort_batch(p_cols)
        for pp, rep in self._iter_expanded(sorted_cols):
            n = len(pp)
            # distance via the cell-grouped replica columns: rep indices are
            # contiguous runs per particle, particles are cell-sorted
            d2 = self.d2k(idx.rep_cols, sorted_cols, rep, pp, idx.box, out=s.d2[:n])
            ph = s.ph[:n]
            np.take(self._rep_rows_fold, rep, out=ph)
            np.take(psort, pp, out=pp)  # back to original batch rows
            yield pp, ph, d2

    def _iter_shell_chunks(self, p_cols, r2: np.ndarray):
        """Yield (pair_p, pair_h, shell) with shell = searchsorted(r2, d2,
        'right') computed EXACTLY as the pure float64 path would (two-phase
        float32 + float64 patch-up when available)."""
        idx = self.index
        s = self.scratch
        psort, sorted_cols = self._sort_batch(p_cols)
        sorted32 = tuple(c.astype(np.float32) for c in sorted_cols) if self.two_phase else None
        ctx = self._shell_ctx(r2)
        for pp, rep in self._iter_expanded(sorted_cols):
            n = len(pp)
            shell = self._shells(rep, pp, sorted_cols, sorted32, ctx)
            ph = s.ph[:n]
            np.take(self._rep_rows_fold, rep, out=ph)
            np.take(psort, pp, out=pp)  # back to original batch rows
            yield pp, ph, shell


class BroadcastShellCount(_BroadcastKernel):
    """Particle batches -> partial per-halo shell histograms.

    Output: halo_id:int64, s0..s{n-1}:int64 — only halos touched by the
    batch (dense zeros are supplied by the pipeline's final merge).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        nrads = self.ladder.nrads
        p_cols = _batch_cols(batch, self.dtype)
        names = ["halo_id"] + [f"s{i}" for i in range(nrads)]
        nhalos = len(idx.halo_ids)
        any_pairs = False
        psort, sorted_cols = self._sort_batch(p_cols)
        sorted32 = tuple(c.astype(np.float32) for c in sorted_cols) if self.two_phase else None
        ctx = self._shell_ctx(self.r2)
        # nrads+1 columns: shell == nrads (beyond rmax) bins into the
        # overflow column instead of being masked out — no keep-mask /
        # boolean-compress passes in the hot loop at all
        nr1 = nrads + 1
        hist2d = np.zeros((nhalos, nr1), dtype=np.int64)
        for pp, rep in self._iter_expanded(sorted_cols):
            any_pairs = True
            shell = self._shells(rep, pp, sorted_cols, sorted32, ctx)
            # bin by REPLICA index, not halo row: rep values within a
            # sub-chunk span a contiguous run of the cell-grouped replica
            # space, so the bincount accumulator is the touched span only
            # (halo rows are scattered — binning on them touched the whole
            # nhalos*nrads accumulator every sub-chunk, as much DRAM
            # traffic as the pair data). One duplicate-safe scatter-add
            # per sub-chunk folds the span histogram into halo rows.
            # The histogram path never needs the per-pair halo-row or
            # original-batch-row gathers at all.
            # cell-grouped expansion: the first pair holds the minimum
            # replica index and the last pair the maximum
            lo = int(rep[0])
            hi = int(rep[-1])
            span = hi - lo + 1
            # build the bincount key fully in place (rep and shell are
            # both dead after this): key = (rep - lo) * nr1 + shell
            np.subtract(rep, self.scratch.idx_dtype.type(lo), out=rep)
            np.multiply(rep, self.scratch.idx_dtype.type(nr1), out=rep)
            np.add(shell, rep, out=shell)
            bc = np.bincount(shell, minlength=span * nr1).reshape(span, nr1)
            np.add.at(hist2d, self._rep_rows_fold[lo : hi + 1], bc)
        if not any_pairs:
            return pa.table({n: pa.array([], pa.int64()) for n in names})
        hist = hist2d[:, :nrads]
        touched = np.nonzero(hist.any(axis=1))[0]
        hist = hist[touched]
        cols = {"halo_id": idx.halo_ids[touched]}
        for i in range(nrads):
            cols[f"s{i}"] = hist[:, i]
        return pa.table(cols)


class PairCorrTotals(_BroadcastKernel):
    """Particle batches -> per-shell TOTAL pair counts for the real
    catalog (dd) and a derived random catalog (dr) in one pass.

    The estimator kernel of the two-point cross-correlation function
    (Davis & Peebles 1983): the same halo index and exact two-phase shell
    binning as :class:`BroadcastShellCount`, but folded over ALL halos —
    no per-halo histogram, so the accumulator is nrads+1 counters. The
    random catalog is re-derived per batch from the particle ids via
    ``derive_coord`` axes 3-5 (SQL-parity multiply-add-modulo), so it is
    never read, shuffled, or stored anywhere.

    Output per batch: shell:int64 (0..nrads-1), dd:int64, dr:int64 —
    always exactly nrads rows (a fixed-size partial for the tree fold).
    """

    def _totals(self, p_cols) -> np.ndarray:
        nrads = self.ladder.nrads
        nr1 = nrads + 1
        tot = np.zeros(nr1, dtype=np.int64)
        psort, sorted_cols = self._sort_batch(p_cols)
        sorted32 = (
            tuple(c.astype(np.float32) for c in sorted_cols) if self.two_phase else None
        )
        ctx = self._shell_ctx(self.r2)
        for pp, rep in self._iter_expanded(sorted_cols):
            shell = self._shells(rep, pp, sorted_cols, sorted32, ctx)
            tot += np.bincount(shell, minlength=nr1)
        return tot[:nrads]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from spatialjoincountovershells_ray.functions.hashing import derive_coord

        nrads = self.ladder.nrads
        p_cols = _batch_cols(batch, self.dtype)
        dd = self._totals(p_cols)
        pid = batch.column("particle_id").to_numpy()
        box = self.index.box
        r_cols = tuple(
            derive_coord(pid, ax + 3, box).astype(self.dtype, copy=False) for ax in range(3)
        )
        dr = self._totals(r_cols)
        return pa.table(
            {
                "shell": np.arange(nrads, dtype=np.int64),
                "dd": dd,
                "dr": dr,
            }
        )


class WeightedPairTotals(PairCorrTotals):
    """Marked-correlation numerator: per-shell SUM of pair weight
    products w_h * w_p plus plain pair counts, in one pass.

    Weights are synthetic integer marks derived from the ids
    (halo_id % 97 + 1, particle_id % 89 + 1) so the SQL twin reproduces
    them with pure BIGINT arithmetic. Products are <= 97*89 and a
    sub-chunk holds <= 2^16 pairs, so the float64 bincount accumulator
    stays integral (< 2^53) before folding into int64 totals — exact.

    Output per batch: shell:int64, npairs:int64, wsum:int64 (nrads rows).
    """

    def __init__(self, index_ref, ladder):
        super().__init__(index_ref, ladder)
        self.wh = (self.index.halo_ids % 97 + 1).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        nrads = self.ladder.nrads
        nr1 = nrads + 1
        p_cols = _batch_cols(batch, self.dtype)
        wp = (batch.column("particle_id").to_numpy() % 89 + 1).astype(np.float64)
        cnt_tot = np.zeros(nr1, dtype=np.int64)
        w_tot = np.zeros(nr1, dtype=np.int64)
        psort, sorted_cols = self._sort_batch(p_cols)
        wp_sorted = wp[psort]
        sorted32 = (
            tuple(c.astype(np.float32) for c in sorted_cols) if self.two_phase else None
        )
        ctx = self._shell_ctx(self.r2)
        for pp, rep in self._iter_expanded(sorted_cols):
            shell = self._shells(rep, pp, sorted_cols, sorted32, ctx)
            w = self.wh[self._rep_rows_fold[rep]] * wp_sorted[pp]
            cnt_tot += np.bincount(shell, minlength=nr1)
            w_tot += np.bincount(shell, weights=w, minlength=nr1).astype(np.int64)
        return pa.table(
            {
                "shell": np.arange(nrads, dtype=np.int64),
                "npairs": cnt_tot[:nrads],
                "wsum": w_tot[:nrads],
            }
        )


class PatchCorrTotals(PairCorrTotals):
    """Jackknife-resolution pair-correlation kernel: per-(patch, shell)
    DD and DR totals, patch = halo_id % NPATCH (a deterministic,
    SQL-reproducible resampling partition). Accumulators are
    NPATCH x (nrads+1) histograms — still O(1) per batch.

    Output per batch: patch, shell, dd, dr (NPATCH * nrads rows)."""

    NPATCH = 8

    def __init__(self, index_ref, ladder):
        super().__init__(index_ref, ladder)
        self.patch = (self.index.halo_ids % self.NPATCH).astype(np.int64)

    def _patch_totals(self, p_cols) -> np.ndarray:
        nrads = self.ladder.nrads
        nr1 = nrads + 1
        hist = np.zeros(self.NPATCH * nr1, dtype=np.int64)
        psort, sorted_cols = self._sort_batch(p_cols)
        sorted32 = (
            tuple(c.astype(np.float32) for c in sorted_cols) if self.two_phase else None
        )
        ctx = self._shell_ctx(self.r2)
        for pp, rep in self._iter_expanded(sorted_cols):
            shell = self._shells(rep, pp, sorted_cols, sorted32, ctx)
            pr = self.patch[self._rep_rows_fold[rep]]
            hist += np.bincount(pr * nr1 + shell, minlength=self.NPATCH * nr1)
        return hist.reshape(self.NPATCH, nr1)[:, :nrads]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from spatialjoincountovershells_ray.functions.hashing import derive_coord

        nrads = self.ladder.nrads
        dd = self._patch_totals(_batch_cols(batch, self.dtype))
        pid = batch.column("particle_id").to_numpy()
        box = self.index.box
        r_cols = tuple(
            derive_coord(pid, ax + 3, box).astype(self.dtype, copy=False) for ax in range(3)
        )
        dr = self._patch_totals(r_cols)
        patch = np.repeat(np.arange(self.NPATCH, dtype=np.int64), nrads)
        shell = np.tile(np.arange(nrads, dtype=np.int64), self.NPATCH)
        return pa.table(
            {"patch": patch, "shell": shell, "dd": dd.ravel(), "dr": dr.ravel()}
        )


class ShellProfileKernel(_BroadcastKernel):
    """Aggregate pushdown into the spatial kernel: per-halo per-shell
    pair counts AND quantized squared-distance sums in one pass — the
    radial density-profile moments (mean d2 per shell = profile shape).

    The d2 moment is exact end to end: floor(d2 * 100) of the bit-exact
    float64 pair distance is an integer both engines compute identically,
    and integer sums are order-free. Uses the pure-f64 pair path: the
    moment needs the full-precision d2 for every IN-ladder pair, and a
    round-5 experiment with the flagship's phase-1 f32 screen measured
    SLOWER (2.67 s vs 2.22 s kernel time at sf0.1/32cpus) — with ~half
    the tightened-cover candidates landing in-ladder, the f32 pass +
    subset-gather + f64 recompute exceeds one straight f64 pass.

    Output per batch: halo_id, c0..c{n-1} (counts), m0..m{n-1} (sums) —
    touched halos only.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        nrads = self.ladder.nrads
        nr1 = nrads + 1
        nhalos = len(idx.halo_ids)
        p_cols = _batch_cols(batch, self.dtype)
        cnt = np.zeros((nhalos, nr1), dtype=np.int64)
        qs = np.zeros((nhalos, nr1), dtype=np.int64)
        any_pairs = False
        s = self.scratch
        psort, sorted_cols = self._sort_batch(p_cols)
        for pp, rep in self._iter_expanded(sorted_cols):
            any_pairs = True
            n = len(pp)
            d2 = self.d2k(idx.rep_cols, sorted_cols, rep, pp, idx.box, out=s.d2[:n])
            shell = np.searchsorted(self.r2, d2, side="right")
            # quantized moment: floor(d2*100) is an integer both engines
            # compute identically; per-(replica, shell) partial sums stay
            # < 2^53 under the subchunk pair bound, so the weighted
            # bincount is exact before the int64 fold
            np.multiply(d2, 100.0, out=d2)
            np.floor(d2, out=d2)
            # replica-span bincount (the BroadcastShellCount trick): bin
            # in contiguous replica space, then one dup-safe scatter-add
            # of the span histograms into halo rows per sub-chunk
            lo = int(rep[0])
            hi = int(rep[-1])
            span = hi - lo + 1
            key = rep.astype(np.int64) * nr1
            np.add(key, shell, out=key)
            key -= lo * nr1
            bc = np.bincount(key, minlength=span * nr1).reshape(span, nr1)
            bw = np.bincount(key, weights=d2, minlength=span * nr1).reshape(span, nr1)
            rows = self._rep_rows_fold[lo : hi + 1]
            np.add.at(cnt, rows, bc)
            np.add.at(qs, rows, bw.astype(np.int64))
        names = (
            ["halo_id"]
            + [f"c{i}" for i in range(nrads)]
            + [f"m{i}" for i in range(nrads)]
        )
        if not any_pairs:
            return pa.table({n: pa.array([], pa.int64()) for n in names})
        touched = np.nonzero(cnt[:, :nrads].any(axis=1))[0]
        cols = {"halo_id": idx.halo_ids[touched]}
        for i in range(nrads):
            cols[f"c{i}"] = cnt[touched, i]
        for i in range(nrads):
            cols[f"m{i}"] = qs[touched, i]
        return pa.table(cols)


# transverse/line-of-sight bin edges of the cylindrical pair counts (the
# wp(rp) decomposition); plain upper bounds, strict-< binning like shells
CYL_PI_EDGES = np.array([40.0, 80.0, 120.0, 160.0])


class CylPairTotals(_BroadcastKernel):
    """Cylindrical pair decomposition: per-(rp_shell, pi_bin) pair counts
    where rp is the transverse (x, y) separation and pi the line-of-sight
    |z| separation, both under the periodic wrap — the binning of the
    projected correlation function wp(rp).

    The ladder carries the SQUARED transverse boundaries; CYL_PI_EDGES
    the plain line-of-sight bounds. The wrap/square expressions mirror
    the SQL twin term for term in float64 (no two-phase screen — both
    components are needed anyway, so phase-1 pruning buys nothing).
    NOTE: the index cover must contain every cell whose closest point
    satisfies BOTH the transverse-disc and z-slab bounds — build it
    with functions.cells.cyl_cover_cells (shape-exact, round-5) or any
    superset such as the circumscribed hypot(rp_max, pi_max) ball.

    Output per batch: rp_shell, pi_bin, npairs (fixed-size partial).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        r2 = self.r2
        pe = CYL_PI_EDGES
        nperp, npi = len(r2), len(pe)
        K = (nperp + 1) * (npi + 1)
        hist = np.zeros(K, dtype=np.int64)
        p_cols = _batch_cols(batch, self.dtype)
        psort, sorted_cols = self._sort_batch(p_cols)
        box = idx.box
        rc = idx.rep_cols
        for pp, rep in self._iter_expanded(sorted_cols):
            wx = rc[0][rep] - sorted_cols[0][pp]
            wx -= box * np.floor(wx / box + 0.5)
            wy = rc[1][rep] - sorted_cols[1][pp]
            wy -= box * np.floor(wy / box + 0.5)
            d2p = wx * wx + wy * wy
            wz = rc[2][rep] - sorted_cols[2][pp]
            wz -= box * np.floor(wz / box + 0.5)
            dpar = np.abs(wz)
            perp = np.searchsorted(r2, d2p, side="right")
            pib = np.searchsorted(pe, dpar, side="right")
            hist += np.bincount(perp * (npi + 1) + pib, minlength=K)
        h2 = hist.reshape(nperp + 1, npi + 1)[:nperp, :npi]
        return pa.table(
            {
                "rp_shell": np.repeat(np.arange(nperp, dtype=np.int64), npi),
                "pi_bin": np.tile(np.arange(npi, dtype=np.int64), nperp),
                "npairs": h2.ravel(),
            }
        )


class ShellTotals(PairCorrTotals):
    """Per-shell TOTAL pair counts of the batch against the broadcast
    index (no random side) — the probe kernel of the halo
    autocorrelation. Output per batch: shell:int64, cnt:int64 (always
    exactly nrads rows)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        nrads = self.ladder.nrads
        tot = self._totals(_batch_cols(batch, self.dtype))
        return pa.table(
            {"shell": np.arange(nrads, dtype=np.int64), "cnt": tot}
        )


class BroadcastRangeJoin(_BroadcastKernel):
    """Particle batches -> (halo_id, particle_id) pairs with d2 < r2_max.

    The id-returning distance join of the reference
    (``RangeSearch``, reference src/objects/ArraySTR/RangeSearch.c:11-52).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        p_cols = _batch_cols(batch, self.dtype)
        pids = batch.column("particle_id").to_numpy()
        out_h, out_p = [], []
        # single-boundary ladder: shell 0 = inside rmax (exact two-phase)
        for pp, ph, shell in self._iter_shell_chunks(p_cols, self.r2[-1:]):
            keep = shell == 0
            out_h.append(idx.halo_ids[ph[keep]])
            out_p.append(pids[pp[keep]])
        if not out_h:
            return pa.table(
                {"halo_id": pa.array([], pa.int64()), "particle_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "halo_id": np.concatenate(out_h),
                "particle_id": np.concatenate(out_p),
            }
        )


class XMatchKernel(_BroadcastKernel):
    """Catalog cross-match probe: one particle pass emits BOTH nearest
    tables — the exact nearest indexed point (halo) per probe row (final:
    a probe row lives in one batch) and the per-halo best-candidate
    partial (merged downstream). Nearness is lexicographic (d2, id), so
    ties are deterministic and SQL-reproducible.

    Output per batch: role:int8 (0 = final per-probe row, 1 = per-halo
    partial), id_a:int64 (halo), id_b:int64 (probe), d2:float64.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        rmax2 = float(self.r2[-1])
        p_cols = _batch_cols(batch, self.dtype)
        pids = batch.column("particle_id").to_numpy()
        ha, pb, dd = [], [], []
        for pp, ph, d2 in self._iter_pair_chunks(p_cols):
            keep = d2 < rmax2
            ha.append(idx.halo_ids[ph[keep]])
            pb.append(pids[pp[keep]])
            dd.append(d2[keep].copy())
        empty = pa.table(
            {
                "role": pa.array([], pa.int8()),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "d2": pa.array([], pa.float64()),
            }
        )
        if not ha:
            return empty
        a = np.concatenate(ha)
        b = np.concatenate(pb)
        d = np.concatenate(dd)
        if not len(a):
            return empty
        # nearest halo per probe row (exact: the probe row's candidate set
        # is complete within rmax and lives wholly in this batch)
        ob = np.lexsort((a, d, b))
        bs, ds_, as_ = b[ob], d[ob], a[ob]
        first_b = np.r_[True, bs[1:] != bs[:-1]]
        # per-halo best candidate in this batch (a partial)
        oa = np.lexsort((b, d, a))
        aa, da, ba = a[oa], d[oa], b[oa]
        first_a = np.r_[True, aa[1:] != aa[:-1]]
        return pa.table(
            {
                "role": pa.array(
                    np.concatenate(
                        [np.zeros(int(first_b.sum()), np.int8), np.ones(int(first_a.sum()), np.int8)]
                    )
                ),
                "id_a": pa.array(np.concatenate([as_[first_b], aa[first_a]]), pa.int64()),
                "id_b": pa.array(np.concatenate([bs[first_b], ba[first_a]]), pa.int64()),
                "d2": pa.array(np.concatenate([ds_[first_b], da[first_a]]), pa.float64()),
            }
        )


class BroadcastRangeTopK(_BroadcastKernel):
    """Range join emitting per-batch per-halo top-k (halo_id, particle_id,
    d2) rows with d2 < rmax^2 — the per-round kernel of the expanding-ring
    kNN (pipelines.knn). ``k`` is set post-construction by the cache
    wrapper."""

    k: int = 5

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        p_cols = _batch_cols(batch, self.dtype)
        pids = batch.column("particle_id").to_numpy()
        hs, ps, ds = [], [], []
        for pp, ph, d2 in self._iter_pair_chunks(p_cols):
            keep = d2 < self.r2[-1]
            hs.append(ph[keep])
            ps.append(pids[pp[keep]])
            ds.append(d2[keep].copy())
        empty = {
            "halo_id": pa.array([], pa.int64()),
            "particle_id": pa.array([], pa.int64()),
            "d2": pa.array([], pa.float64()),
        }
        if not hs:
            return pa.table(empty)
        h = np.concatenate(hs)
        if len(h) == 0:
            return pa.table(empty)
        p = np.concatenate(ps)
        d = np.concatenate(ds)
        hsel, psel, dsel, _ = select_topk_rows(h, p, d, self.k)
        return pa.table(
            {
                "halo_id": idx.halo_ids[hsel],
                "particle_id": psel,
                "d2": dsel.astype(np.float64, copy=False),
            }
        )


def select_topk_rows(
    halo: np.ndarray, pid: np.ndarray, d2: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact vectorized per-halo top-k by (d2, particle_id).

    Returns (halo, pid, d2, rank) of the kept rows, ordered by
    (halo, d2, pid); rank is 1-based. No Python loop over halos.
    """
    order = np.lexsort((pid, d2, halo))
    h = halo[order]
    # rank within each halo run: position - start-of-run
    starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
    run_id = np.cumsum(np.concatenate(([0], (h[1:] != h[:-1]).astype(np.int64))))
    rank = np.arange(len(h), dtype=np.int64) - starts[run_id]
    keep = rank < k
    sel = order[keep]
    return halo[sel], pid[sel], d2[sel], rank[keep] + 1


class BroadcastKnnCandidates:
    """Particle batches -> per-batch top-k (halo_id, particle_id, d2) rows.

    Scans ALL halos per batch (no radius bound exists for kNN), chunking
    the particle axis internally so the H x C distance block stays
    bounded, with one exact top-k selection over the collected per-chunk
    winners at batch end. Output is H x k rows per batch regardless of
    batch size; the pipeline tree-merges batches to the global k. Meant
    for a broadcastable query side (the grid-ring variant is the future
    scale path for huge query sides).
    """

    CHUNK = 512  # particles per distance block: H x 512 doubles

    def __init__(self, halos_ref, k: int, box: float = BOX_SIZE, dtype=np.float64):
        h = ray.get(halos_ref[0]) if isinstance(halos_ref, list) else halos_ref
        self.halo_ids: np.ndarray = h["halo_ids"]
        self.xyz: np.ndarray = np.ascontiguousarray(h["xyz"].astype(dtype, copy=False))
        self.k = k
        self.box = box
        self.dtype = dtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        pxyz = _batch_xyz(batch, self.dtype)
        pids = batch.column("particle_id").to_numpy()
        H = len(self.halo_ids)
        P = len(pids)
        empty = {
            "halo_id": pa.array([], pa.int64()),
            "particle_id": pa.array([], pa.int64()),
            "d2": pa.array([], pa.float64()),
        }
        if P == 0 or H == 0:
            return pa.table(empty)
        cand_p: list[np.ndarray] = []
        cand_d: list[np.ndarray] = []
        h_arange = np.arange(H, dtype=np.int64)
        for s in range(0, P, self.CHUNK):
            e = min(s + self.CHUNK, P)
            d2 = torus_d2(self.xyz[:, None, :], pxyz[None, s:e, :], self.box)  # [H, C]
            kk = min(self.k, e - s)
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk] if kk < (e - s) else np.tile(
                np.arange(e - s), (H, 1)
            )
            rows = np.repeat(h_arange, part.shape[1])
            cols = part.reshape(-1)
            cand_p.append(pids[s + cols])
            cand_d.append(d2[rows, cols])
        # halo row index per candidate: chunk layout is H-major within chunk
        halos_all = np.concatenate(
            [np.repeat(h_arange, c.shape[0] // H) for c in cand_p]
        )
        pid_all = np.concatenate(cand_p)
        d2_all = np.concatenate(cand_d)
        hsel, psel, dsel, _ = select_topk_rows(halos_all, pid_all, d2_all, self.k)
        return pa.table(
            {
                "halo_id": self.halo_ids[hsel],
                "particle_id": psel,
                "d2": dsel.astype(np.float64, copy=False),
            }
        )


# ---------------------------------------------------------------------------
# shuffle-mode kernels (both sides large)
# ---------------------------------------------------------------------------


def add_particle_cell(batch: pa.Table, grid: GridSpec, dtype=np.float64) -> pa.Table:
    """Append the particle's single (wrapped) cell key."""
    xyz = _batch_xyz(batch, dtype)
    cell = point_cells(xyz, grid)
    return batch.append_column("cell", pa.array(cell, pa.int64()))


def replicate_halos(
    batch: pa.Table, rmax: float, grid: GridSpec, dtype=np.float64
) -> pa.Table:
    """Replicate each halo row to every cell overlapping its ball
    (vectorized flat-map; SURVEY.md §7.1 step 3)."""
    xyz = _batch_xyz(batch, dtype)
    row, cell = ball_cover_cells(xyz, rmax, grid)
    taken = batch.take(pa.array(row, pa.int64()))
    return taken.append_column("cell", pa.array(cell, pa.int64()))


_KERNEL_CACHE: dict[tuple, object] = {}


def run_broadcast_kernel(batch: pa.Table, cls, ref_list, ladder: RadiusLadder) -> pa.Table:
    """Task-mode driver for the broadcast kernels with a per-worker cache.

    Ray task workers are long-lived and reused across batches, datasets
    and queries, so caching the constructed kernel (index ray.get + scratch
    buffers) in a module global gives actor-style amortized setup WITHOUT
    paying a fresh process spawn per pool — on this sandbox, spawning an
    actor pool costs ~10 CPU-seconds per worker (imports + first-touch
    page faults, globally serialized), which dwarfed the join itself.
    The cache key pins the exact broadcast object and ladder; it is
    bounded to the few most recent indexes.
    """
    tag = (ref_list[0].hex(), ladder.dtype.str, ladder.radii.tobytes())
    entry = _KERNEL_CACHE.get(cls.__name__)
    if entry is None or entry[0] != tag:
        k = cls(ref_list, ladder)
        if entry is not None:
            # evict the stale kernel but keep its warm scratch buffers (the
            # expensive part on this hardware) when dtypes match
            old = entry[1]
            if getattr(old, "scratch", None) is not None and old.scratch.dtype == k.scratch.dtype:
                k.scratch = old.scratch
            if getattr(old, "d2k", None) is not None and old.d2k.dtype == k.d2k.dtype:
                k.d2k = old.d2k
        _KERNEL_CACHE[cls.__name__] = (tag, k)
        entry = _KERNEL_CACHE[cls.__name__]
    return entry[1](batch)


_BCAST_CACHE: dict[str, tuple[tuple, object]] = {}


def run_cached_bcast(
    batch: pa.Table, cls, ref_list, ctor_kwargs: dict | None = None
) -> pa.Table:
    """Task-mode driver for ANY broadcast kernel class (the
    :func:`run_broadcast_kernel` rationale, generalized): construct
    ``cls(ref_list, **ctor_kwargs)`` once per (worker process, broadcast
    object) and reuse it across batches. A plain ``map_batches`` task
    then scales to every CPU with actor-style amortized setup, no
    actor-pool spawn cost, and no concurrency cap — the fix for the
    measured ``(1, 8)`` broadcast-join bottleneck (broadcast plan 3x
    slower than its own shuffle at 32 CPUs)."""
    kw = ctor_kwargs or {}
    key = f"{cls.__module__}.{cls.__qualname__}"
    tag = (ref_list[0].hex(), tuple(sorted(kw.items())))
    ent = _BCAST_CACHE.get(key)
    if ent is None or ent[0] != tag:
        ent = (tag, cls(ref_list, **kw))
        _BCAST_CACHE[key] = ent
    return ent[1](batch)


_D2K_CACHE: dict[str, PairD2Kernel] = {}


def _cached_d2k(dtype) -> PairD2Kernel:
    """Per-worker-process kernel cache (map_groups tasks reuse workers, so
    the scratch buffers amortize across groups)."""
    key = str(np.dtype(dtype))
    k = _D2K_CACHE.get(key)
    if k is None:
        k = _D2K_CACHE[key] = PairD2Kernel(dtype=dtype)
    return k


def cell_group_shell_count(
    group: pa.Table, ladder: RadiusLadder, box: float = BOX_SIZE, tile_pairs: int = 4_000_000
) -> pa.Table:
    """Per-cell kernel for the shuffle plan: one group = one cell's halo
    replicas ('h' rows) + particles ('p' rows); emits partial histograms.

    Tiled over the halo axis so pair temporaries stay under ~tile_pairs
    regardless of cell skew.
    """
    nrads = ladder.nrads
    role = group.column("role").to_numpy(zero_copy_only=False)
    ids = group.column("id").to_numpy(zero_copy_only=False)
    cols = _batch_cols(group, ladder.dtype)
    hmask = role == 0
    h_cols = tuple(c[hmask] for c in cols)
    p_cols = tuple(c[~hmask] for c in cols)
    hids = ids[hmask]
    H, P = len(h_cols[0]), len(p_cols[0])
    names = ["halo_id"] + [f"s{i}" for i in range(nrads)]
    if H == 0 or P == 0:
        return pa.table({n: pa.array([], pa.int64()) for n in names})
    d2k = _cached_d2k(ladder.dtype)
    hist = np.zeros(H * nrads, dtype=np.int64)
    chunk = max(1, tile_pairs // P)
    p_arange = np.arange(P, dtype=np.int64)
    for s in range(0, H, chunk):
        e = min(s + chunk, H)
        m = e - s
        pair_h = np.repeat(np.arange(s, e, dtype=np.int64), P)
        pair_p = np.tile(p_arange, m)
        d2 = d2k(h_cols, p_cols, pair_h, pair_p, box)
        keep = d2 < ladder.r2[-1]
        ph = pair_h[keep]
        if len(ph):
            shell = shell_of(d2[keep], ladder.r2)
            hist += np.bincount(ph * nrads + shell, minlength=H * nrads)
    hist = hist.reshape(H, nrads)
    out = {"halo_id": hids}
    for i in range(nrads):
        out[f"s{i}"] = hist[:, i]
    return pa.table(out)
