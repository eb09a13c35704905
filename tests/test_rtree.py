"""Guttman R-tree physical plan (SURVEY §2.3 T2) — structure invariants
and probe exactness. Bit-parity of the full shell-count pipeline runs in
tests/test_spatial.py (mode='rtree' in the corner fixture and the
uniform-oracle parametrizations)."""

import numpy as np
import pytest

from spatialjoincountovershells_ray.stages.rtree import (
    MAX_ENT,
    MIN_ENT,
    RTreeIndex,
    mirror_probes,
)


def _build(n=800, seed=5):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 1000, size=(n, 3))
    ids = np.arange(n, dtype=np.int64)
    return RTreeIndex.build(ids, pts), pts


class TestBuildInvariants:
    def test_every_point_in_exactly_one_leaf(self):
        idx, pts = _build()
        leaf_children = []
        for ni in range(len(idx.node_count)):
            if idx.node_isleaf[ni]:
                s, c = idx.node_start[ni], idx.node_count[ni]
                leaf_children.append(idx.child_ref[s : s + c])
        rows = np.sort(np.concatenate(leaf_children))
        np.testing.assert_array_equal(rows, np.arange(len(pts)))

    def test_occupancy_bounds(self):
        # Guttman quadratic split (reference SplitNode QS2 force-finish,
        # Build.c:171-178) guarantees MIN_ENT..MAX_ENT for every
        # non-root node; the root may hold fewer
        idx, _ = _build()
        cnt = idx.node_count
        assert cnt[idx.root] >= 1 and (cnt <= MAX_ENT).all()
        non_root = np.ones(len(cnt), bool)
        non_root[idx.root] = False
        assert (cnt[non_root] >= MIN_ENT).all()

    def test_child_mbrs_contained_in_parent_entry(self):
        idx, _ = _build()
        for ni in range(len(idx.node_count)):
            if idx.node_isleaf[ni]:
                continue
            s, c = idx.node_start[ni], idx.node_count[ni]
            for k in range(s, s + c):
                child = idx.child_ref[k]
                cs, cc = idx.node_start[child], idx.node_count[child]
                assert (
                    idx.child_low[cs : cs + cc] >= idx.child_low[k] - 1e-12
                ).all()
                assert (
                    idx.child_upp[cs : cs + cc] <= idx.child_upp[k] + 1e-12
                ).all()


class TestProbe:
    def test_probe_contains_sphere_within_cube(self):
        # the probe contract: sphere members ⊆ result ⊆ cube members
        # (internal levels sphere-tighten, the leaf point test is the
        # cube — see RTreeIndex.probe docstring), with no duplicates
        idx, pts = _build(600, seed=9)
        rng = np.random.default_rng(1)
        centers = rng.uniform(0, 1000, size=(50, 3))
        r = 120.0
        pp, hh = idx.probe(centers, r)
        got = {(int(p), int(h)) for p, h in zip(pp, hh)}
        assert len(got) == len(pp)  # exactly-once emission
        cube = set()
        sphere = set()
        for pi, c in enumerate(centers):
            d = pts - c
            in_cube = (np.abs(d) <= r).all(axis=1)
            in_sphere = (d * d).sum(axis=1) <= r * r
            for h in np.flatnonzero(in_cube):
                cube.add((pi, int(h)))
            for h in np.flatnonzero(in_sphere):
                sphere.add((pi, int(h)))
        assert sphere <= got <= cube

    def test_mirror_probes_cover_wrap_and_stay_disjoint(self):
        # every point within min-image radius r of c must fall inside
        # exactly ONE probe's box (the no-double-count contract)
        rng = np.random.default_rng(3)
        c = np.array([[5.0, 995.0, 500.0], [999.0, 1.0, 0.5], [500.0, 500.0, 500.0]])
        r = 60.0
        centers, src = mirror_probes(c, r, 1000.0)
        pts = rng.uniform(0, 1000, size=(4000, 3))
        d = np.abs(pts[None, :, :] - c[:, None, :])
        d = np.minimum(d, 1000.0 - d)
        within = (d <= r).all(axis=2)  # (3, 4000) min-image cube membership
        for row in range(len(c)):
            probes = np.flatnonzero(src == row)
            hits = np.zeros(len(pts), dtype=np.int64)
            for p in probes:
                inside = (pts >= centers[p] - r).all(axis=1) & (
                    pts <= centers[p] + r
                ).all(axis=1)
                hits += inside
            assert (hits[within[row]] == 1).all()
            assert (hits[~within[row]] == 0).all()


def test_shell_count_rtree_query_matches_grid(tmp_path):
    # end-to-end registry-shape parity at sf0.001 (both plans, same SQL)
    import ray

    from spatialjoincountovershells_ray.queries import REGISTRY

    a = REGISTRY["shell_count"].fn("/root/testdata/sf0.001").to_pandas()
    b = REGISTRY["shell_count_rtree"].fn("/root/testdata/sf0.001").to_pandas()
    a = a.sort_values("halo_id").reset_index(drop=True)
    b = b.sort_values("halo_id").reset_index(drop=True)
    assert a.equals(b)
