"""Guttman R-tree physical plan — SURVEY §2.3 T2.

The reference ships TWO spatial indexes for the same logical shell-count
join: the STR-packed ArraySTR (our grid-CSR HaloIndex replaces it) and a
classic insertion-built Guttman R-tree (reference
src/objects/RTree/Build.c:243-269 InsertRTree, ChooseSubTree :271-320,
SplitNode :147-189, PickSeeds :42-74, PickNext :105-144, AdjustTree
:191-223, SplitRoot :225-241; MAX_ENT=10/MIN_ENT=4 from
include/objects/RTree/Node.h:7-8). This module is that second physical
plan, Ray-Data-native: the tree is built ONCE driver-side over the halo
(query) side, broadcast via ``ray.put``, and probed per particle batch
with a fully vectorized level-by-level frontier expansion — no Python
loop over particles or nodes in the hot path.

Semantics parity, not structure parity: any correct R-tree yields the
same candidate superset, and the distance/binning stage reuses the exact
``torus_d2`` + strict-< ``shell_of`` kernels, so per-halo histograms are
bit-identical to the grid plan (pinned by tests). Periodic boundaries
follow the REFERENCE's approach for this index (mirror probes: the query
box's out-of-bound dims enumerate up to 7 shifted re-probes, reference
src/objects/RTree/MultiRangeCount.c:13-74) rather than the grid plan's
wrapped cells — the probe boxes are pairwise disjoint inside the box for
rmax < box/2, so no candidate is generated twice.

The deliberately-NOT-reproduced leaf quirk (a zero-distance particle
aborts the whole leaf scan, reference
src/objects/RTree/MultiRangeCount.c:104-105 — SURVEY §2.4 J3) stays
divergent here too: coincident points count in shell 0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import BOX_SIZE, RadiusLadder
from spatialjoincountovershells_ray.functions.distance import (
    PairD2Kernel,
    shell_of,
    torus_d2,
)

MAX_ENT = 10  # reference include/objects/RTree/Node.h:7
MIN_ENT = 4  # reference include/objects/RTree/Node.h:8


class _RNode:
    __slots__ = ("leaf", "low", "upp", "child", "parent")

    def __init__(self, leaf: bool):
        self.leaf = leaf
        self.low: list = []  # per-child (3,) float64
        self.upp: list = []
        self.child: list = []  # _RNode (internal) or int halo row (leaf)
        self.parent: "_RNode | None" = None


def _area(low, upp) -> float:
    return float((upp[0] - low[0]) * (upp[1] - low[1]) * (upp[2] - low[2]))


def _mbr_of(node: _RNode):
    lo = np.min(np.asarray(node.low), axis=0)
    up = np.max(np.asarray(node.upp), axis=0)
    return lo, up


def _choose_leaf(root: _RNode, p: np.ndarray) -> _RNode:
    """Least area enlargement, ties by least area (reference ChooseSubTree
    CS2/CS3, Build.c:271-320)."""
    node = root
    while not node.leaf:
        best = -1
        best_enl = best_area = np.inf
        for i in range(len(node.child)):
            lo, up = node.low[i], node.upp[i]
            a0 = _area(lo, up)
            nl = np.minimum(lo, p)
            nu = np.maximum(up, p)
            enl = _area(nl, nu) - a0
            if enl < best_enl or (enl == best_enl and a0 < best_area):
                best, best_enl, best_area = i, enl, a0
        node = node.child[best]
    return node


def _quad_split(node: _RNode) -> _RNode:
    """Guttman quadratic split of an overflowing node (MAX_ENT+1
    entries): PickSeeds by max dead space, PickNext by max enlargement
    difference, force-finish when a group hits MAX_ENT-MIN_ENT+1
    (reference SplitNode QS1-QS3, Build.c:147-189)."""
    entries = list(zip(node.low, node.upp, node.child))
    n = len(entries)
    # PickSeeds (PS1/PS2): the pair wasting the most area together
    best = (-np.inf, 0, 1)
    for i in range(n):
        for j in range(i + 1, n):
            li, ui, _ = entries[i]
            lj, uj, _ = entries[j]
            comp = _area(np.minimum(li, lj), np.maximum(ui, uj))
            diff = comp - _area(li, ui) - _area(lj, uj)
            if diff > best[0]:
                best = (diff, i, j)
    _, si, sj = best
    g1 = [entries[si]]
    g2 = [entries[sj]]
    rest = [e for k, e in enumerate(entries) if k not in (si, sj)]
    cap = MAX_ENT - MIN_ENT + 1
    while rest:
        if len(g1) == cap:
            g2.extend(rest)
            break
        if len(g2) == cap:
            g1.extend(rest)
            break
        m1l = np.min(np.asarray([e[0] for e in g1]), axis=0)
        m1u = np.max(np.asarray([e[1] for e in g1]), axis=0)
        m2l = np.min(np.asarray([e[0] for e in g2]), axis=0)
        m2u = np.max(np.asarray([e[1] for e in g2]), axis=0)
        a1, a2 = _area(m1l, m1u), _area(m2l, m2u)
        # PickNext (PN1/PN2): max |d1 - d2|; ties by group size like DE2
        bi, bd, to1 = 0, -np.inf, True
        for k, (lo, up, _) in enumerate(rest):
            d1 = _area(np.minimum(m1l, lo), np.maximum(m1u, up)) - a1
            d2 = _area(np.minimum(m2l, lo), np.maximum(m2u, up)) - a2
            diff = abs(d1 - d2)
            if diff > bd:
                bd, bi = diff, k
                to1 = d1 < d2 or (d1 == d2 and len(g1) < len(g2))
        (g1 if to1 else g2).append(rest.pop(bi))
    node.low = [e[0] for e in g1]
    node.upp = [e[1] for e in g1]
    node.child = [e[2] for e in g1]
    split = _RNode(node.leaf)
    split.low = [e[0] for e in g2]
    split.upp = [e[1] for e in g2]
    split.child = [e[2] for e in g2]
    if not split.leaf:
        for c in split.child:
            c.parent = split
    return split


@dataclass
class RTreeIndex:
    """Flattened (array-backed) Guttman R-tree over the halo side.

    ``child_*`` arrays hold every node's child entries contiguously;
    ``child_ref`` is a node id for internal children and a halo row for
    leaf children. The probe never touches Python objects."""

    halo_ids: np.ndarray  # (H,) int64
    xyz: np.ndarray  # (H, 3) ladder dtype
    child_low: np.ndarray  # (C, 3)
    child_upp: np.ndarray  # (C, 3)
    child_ref: np.ndarray  # (C,) int64
    node_start: np.ndarray  # (N,) int64
    node_count: np.ndarray  # (N,) int64
    node_isleaf: np.ndarray  # (N,) bool
    root: int
    box: float
    depth: int

    @classmethod
    def build(
        cls,
        halo_ids: np.ndarray,
        xyz: np.ndarray,
        box: float = BOX_SIZE,
    ) -> "RTreeIndex":
        """One-at-a-time Guttman insertion of every halo point (point
        MBRs: low == upp, reference Mbr semantics), then a BFS flatten
        into probe-friendly arrays."""
        pts = np.asarray(xyz, dtype=np.float64)
        root = _RNode(leaf=True)
        for row in range(len(pts)):
            p = pts[row]
            leaf = _choose_leaf(root, p)
            leaf.low.append(p)
            leaf.upp.append(p)
            leaf.child.append(row)
            split = _quad_split(leaf) if len(leaf.child) > MAX_ENT else None
            # AdjustTree (AT2-AT4): refresh ancestor MBRs, push splits up
            node = leaf
            while node.parent is not None:
                parent = node.parent
                idx = next(
                    i for i, c in enumerate(parent.child) if c is node
                )
                lo, up = _mbr_of(node)
                parent.low[idx] = lo
                parent.upp[idx] = up
                if split is not None:
                    lo2, up2 = _mbr_of(split)
                    if len(parent.child) < MAX_ENT:
                        parent.low.append(lo2)
                        parent.upp.append(up2)
                        parent.child.append(split)
                        split.parent = parent
                        split = None
                    else:
                        parent.low.append(lo2)
                        parent.upp.append(up2)
                        parent.child.append(split)
                        split.parent = parent
                        split = _quad_split(parent)
                node = parent
            if split is not None:  # SplitRoot (Build.c:225-241)
                new_root = _RNode(leaf=False)
                for sub in (node, split):
                    lo, up = _mbr_of(sub)
                    new_root.low.append(lo)
                    new_root.upp.append(up)
                    new_root.child.append(sub)
                    sub.parent = new_root
                root = new_root
        return cls._flatten(root, np.ascontiguousarray(halo_ids), pts, box)

    @classmethod
    def _flatten(cls, root: _RNode, halo_ids, pts, box) -> "RTreeIndex":
        nodes = [root]
        order = {id(root): 0}
        i = 0
        while i < len(nodes):
            nd = nodes[i]
            i += 1
            if not nd.leaf:
                for c in nd.child:
                    order[id(c)] = len(nodes)
                    nodes.append(c)
        starts, counts, leafs = [], [], []
        cl, cu, cref = [], [], []
        pos = 0
        for nd in nodes:
            k = len(nd.child)
            starts.append(pos)
            counts.append(k)
            leafs.append(nd.leaf)
            pos += k
            cl.extend(nd.low)
            cu.extend(nd.upp)
            if nd.leaf:
                cref.extend(int(c) for c in nd.child)
            else:
                cref.extend(order[id(c)] for c in nd.child)
        depth = 1
        nd = root
        while not nd.leaf:
            depth += 1
            nd = nd.child[0]
        return cls(
            halo_ids=halo_ids,
            xyz=np.ascontiguousarray(pts),
            child_low=np.asarray(cl, dtype=np.float64).reshape(-1, 3),
            child_upp=np.asarray(cu, dtype=np.float64).reshape(-1, 3),
            child_ref=np.asarray(cref, dtype=np.int64),
            node_start=np.asarray(starts, dtype=np.int64),
            node_count=np.asarray(counts, dtype=np.int64),
            node_isleaf=np.asarray(leafs, dtype=bool),
            root=0,
            box=float(box),
            depth=depth,
        )

    def _soa(self):
        """Per-axis contiguous child-bound columns (cached): 1-D gathers
        beat 2-D fancy indexing in the hot probe loop."""
        c = getattr(self, "_soa_cols", None)
        if c is None:
            c = (
                tuple(np.ascontiguousarray(self.child_low[:, d]) for d in range(3)),
                tuple(np.ascontiguousarray(self.child_upp[:, d]) for d in range(3)),
            )
            self._soa_cols = c
        return c

    def probe(self, centers: np.ndarray, r: float) -> tuple[np.ndarray, np.ndarray]:
        """Candidate (probe_idx, halo_row) pairs for a radius-r query —
        the MultiRangeCount descent (reference
        src/objects/RTree/MultiRangeCount.c:86-114), vectorized
        level-by-level over a (probe, node) frontier with per-axis
        progressive compression. Contract: the result CONTAINS every
        halo within Euclidean distance r of its probe center (internal
        levels use the sphere-tightened MBR distance test) and is
        CONTAINED in the cube |Δ|∞ ≤ r membership set (the leaf point
        test — the mirror-probe exactly-once guarantee); candidates in
        between land in the kernel's overflow shell and cost nothing."""
        P = len(centers)
        out_p: list = []
        out_h: list = []
        if P == 0 or len(self.node_count) == 0:
            e = np.empty(0, np.int64)
            return e, e
        cl, cu = self._soa()
        cq = tuple(np.ascontiguousarray(centers[:, d]) for d in range(3))
        lo_q = tuple(np.ascontiguousarray(centers[:, d] - r) for d in range(3))
        hi_q = tuple(np.ascontiguousarray(centers[:, d] + r) for d in range(3))
        r2 = r * r
        fp = np.arange(P, dtype=np.int64)
        fn = np.full(P, self.root, dtype=np.int64)
        while len(fn):
            cnt = self.node_count[fn]
            tot = int(cnt.sum())
            if tot == 0:
                break
            rep = np.repeat(np.arange(len(fn), dtype=np.int64), cnt)
            ecum = np.zeros(len(fn) + 1, np.int64)
            np.cumsum(cnt, out=ecum[1:])
            ci = (
                np.repeat(self.node_start[fn], cnt)
                + np.arange(tot, dtype=np.int64)
                - np.repeat(ecum[:-1], cnt)
            )
            pq = fp[rep]
            all_leaf = bool(self.node_isleaf[fn[0]]) and bool(self.node_isleaf[fn].all())
            if all_leaf:
                # leaf entries are POINTS (low == upp): one gather per
                # axis, one combined compare. The CUBE test stays here —
                # it is the mirror-probe disjointness contract (a sphere
                # test would also be fine for completeness, but the cube
                # is what guarantees each pair is emitted exactly once)
                for d in range(3):
                    x = cl[d][ci]
                    keep = (x <= hi_q[d][pq]) & (x >= lo_q[d][pq])
                    ci, pq = ci[keep], pq[keep]
                out_p.append(pq)
                out_h.append(self.child_ref[ci])
                break
            # internal levels: SPHERE-tightened MBR test (the grid
            # cover's pi/6 trick) — keep a child iff the squared
            # distance from the probe center to its MBR is <= r^2;
            # progressive per-axis compression since the accumulator
            # only grows. Complete: any point within r of the center
            # lies in a chain of MBRs each within distance r.
            leaf = np.repeat(self.node_isleaf[fn], cnt)
            acc = None
            for d in range(3):
                gap = np.maximum(cl[d][ci] - cq[d][pq], cq[d][pq] - cu[d][ci])
                np.maximum(gap, 0.0, out=gap)
                acc = gap * gap if acc is None else acc + gap * gap
                keep = acc <= r2
                ci, pq, leaf, acc = ci[keep], pq[keep], leaf[keep], acc[keep]
            out_p.append(pq[leaf])
            out_h.append(self.child_ref[ci[leaf]])
            np.logical_not(leaf, out=leaf)
            fp = pq[leaf]
            fn = self.child_ref[ci[leaf]]
        if not out_p:
            e = np.empty(0, np.int64)
            return e, e
        return np.concatenate(out_p), np.concatenate(out_h)


def mirror_probes(
    c: np.ndarray, r: float, box: float
) -> tuple[np.ndarray, np.ndarray]:
    """(probe_centers, source_row) — the reference's periodic-boundary
    re-probe enumeration (src/objects/RTree/MultiRangeCount.c:13-74):
    probe 0 is the unshifted center; every non-empty subset of
    out-of-bound dims adds one ±box-shifted probe. Disjoint boxes for
    r < box/2, so each (particle, halo) candidate appears once."""
    n = len(c)
    low_oob = (c - r) < 0.0
    upp_oob = (c + r) > box
    oob = low_oob | upp_oob
    shift = np.where(low_oob, box, -box)
    centers = [c]
    rows = [np.arange(n, dtype=np.int64)]
    for mask in range(1, 8):
        dims = [d for d in range(3) if (mask >> d) & 1]
        sel = oob[:, dims].all(axis=1)
        idx = np.flatnonzero(sel)
        if len(idx) == 0:
            continue
        cc = c[idx].copy()
        for d in dims:
            cc[:, d] += shift[idx, d]
        centers.append(cc)
        rows.append(idx)
    return np.concatenate(centers), np.concatenate(rows)


class RTreeShellCount:
    """Actor/worker kernel: particle batches -> partial per-halo shell
    histograms through the R-tree probe. Output schema identical to
    BroadcastShellCount (halo_id + s0..s{n-1}, touched halos only) so the
    whole merge pipeline is shared; distances ride the same exact
    ``torus_d2`` + strict-< ``shell_of``, so results are bit-identical
    to the grid plan."""

    def __init__(self, index_ref, ladder: RadiusLadder):
        self.index: RTreeIndex = (
            ray.get(index_ref[0]) if isinstance(index_ref, list) else index_ref
        )
        self.ladder = ladder
        self.r2 = ladder.r2
        # conservative box pad: MBR pruning must never drop a pair the
        # exact distance check would count (float rounding of c ± r)
        self.rpad = float(ladder.rmax) * (1.0 + 1e-12) + 1e-9
        # the chunked scratch-reusing d2 evaluator (bit-identical to
        # torus_d2 at the LADDER's precision — f32 for reference parity,
        # f64 for the SQL path) + per-axis halo columns, once per worker
        self.d2k = PairD2Kernel(dtype=ladder.dtype)
        self.hcols = tuple(
            np.ascontiguousarray(self.index.xyz[:, ax].astype(ladder.dtype, copy=False))
            for ax in range(3)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        nrads = self.ladder.nrads
        names = ["halo_id"] + [f"s{i}" for i in range(nrads)]
        p_cols = tuple(
            batch.column(k)
            .to_numpy(zero_copy_only=False)
            .astype(self.ladder.dtype, copy=False)
            for k in ("x", "y", "z")
        )
        # probe geometry in f64 (a conservative candidate superset — the
        # exact ladder-precision distance decides); f32 coords are exact
        # in f64, so no candidate can be lost to the cast
        c = np.stack(p_cols, axis=1).astype(np.float64, copy=False)
        centers, src = mirror_probes(c, self.rpad, idx.box)
        pp, hh = idx.probe(centers, self.rpad)
        if len(pp) == 0:
            return pa.table({n: pa.array([], pa.int64()) for n in names})
        prow = src[pp]
        d2 = self.d2k(self.hcols, p_cols, hh, prow, idx.box)
        shell = shell_of(d2, self.r2)
        nr1 = nrads + 1
        key = hh * nr1 + shell
        hist = np.bincount(key, minlength=len(idx.halo_ids) * nr1).reshape(
            len(idx.halo_ids), nr1
        )[:, :nrads]
        touched = np.nonzero(hist.any(axis=1))[0]
        if len(touched) == 0:
            return pa.table({n: pa.array([], pa.int64()) for n in names})
        cols = {"halo_id": pa.array(idx.halo_ids[touched], pa.int64())}
        for i in range(nrads):
            cols[f"s{i}"] = pa.array(hist[touched, i], pa.int64())
        return pa.table(cols)
