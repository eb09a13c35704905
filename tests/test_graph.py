"""Deterministic fixed-point PageRank (pipelines/graph.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from spatialjoincountovershells_ray.pipelines import graph


def _lineitem(rng, norders=60, nparts=15, maxlines=5):
    rows = []
    for o in range(norders):
        parts = rng.choice(nparts, size=rng.integers(1, maxlines + 1), replace=False)
        for p in parts:
            rows.append((o, int(p)))
            if rng.random() < 0.2:  # duplicate lineitem rows (same order+part)
                rows.append((o, int(p)))
    return pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])


def _oracle(df, iters):
    """Single-process replay of the identical integer recurrence."""
    ep = df.drop_duplicates()
    edges = set()
    for _, g in ep.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"].unique())
        for a in ps:
            for b in ps:
                if a != b:
                    edges.add((a, b))
    edges = sorted(edges)
    nodes = sorted({a for a, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes), np.int64)
    for a, _ in edges:
        deg[idx[a]] += 1
    pr = np.full(len(nodes), graph.PR_SCALE, np.int64)
    d0 = (15 * graph.PR_SCALE) // 100
    for _ in range(iters):
        acc = np.zeros(len(nodes), np.int64)
        for a, b in edges:
            acc[idx[b]] += pr[idx[a]] // deg[idx[a]]
        pr = d0 + (85 * acc) // 100
    return nodes, pr


class TestPartPagerank:
    def test_matches_single_process_replay(self):
        rng = np.random.default_rng(3)
        df = _lineitem(rng)
        ds = ray.data.from_pandas([d for d in np.array_split(df, 7)])
        out = graph.pagerank_scores(graph.coorder_edges(ds), iters=4).to_pandas()
        nodes, pr = self._replay = _oracle(df, 4)
        assert out["part_key"].tolist() == nodes
        assert out["pr"].tolist() == pr.tolist()

    def test_blocking_independent(self):
        rng = np.random.default_rng(8)
        df = _lineitem(rng, norders=40)
        a = graph.pagerank_scores(
            graph.coorder_edges(ray.data.from_pandas([df])), iters=3
        ).to_pandas()
        b = graph.pagerank_scores(
            graph.coorder_edges(
                ray.data.from_pandas([d for d in np.array_split(df, 11)])
            ),
            iters=3,
        ).to_pandas()
        assert a.equals(b)

    def test_hub_gets_max_score(self):
        # star-ish fixture: part 0 co-orders with everything
        rows = []
        for o in range(20):
            rows.append((o, 0))
            rows.append((o, 1 + o % 7))
        df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
        out = graph.pagerank_scores(
            graph.coorder_edges(ray.data.from_pandas([df])), iters=5
        ).to_pandas()
        assert out.loc[out["pr"].idxmax(), "part_key"] == 0

    def test_empty_edges(self):
        df = pd.DataFrame({"l_orderkey": [1, 2], "l_partkey": [7, 9]})  # singleton orders
        out = graph.pagerank_scores(graph.coorder_edges(ray.data.from_pandas([df]))).to_pandas()
        assert len(out) == 0

    def test_shuffle_mode_bit_equal_to_dense(self):
        """Round-4 scale-out plan: the per-iteration score/edge exchange
        (mode='shuffle', no driver score vector) must produce bit-identical
        int64 scores to the dense plan — integer adds are associative."""
        rng = np.random.default_rng(21)
        df = _lineitem(rng, norders=80, nparts=23)
        ds = ray.data.from_pandas([d for d in np.array_split(df, 9)])
        edges = graph.coorder_edges(ds).materialize()
        dense = graph.pagerank_scores(edges, iters=4, mode="dense").to_pandas()
        shuf = graph.pagerank_scores(edges, iters=4, mode="shuffle").to_pandas()
        assert dense["part_key"].tolist() == shuf["part_key"].tolist()
        assert dense["pr"].tolist() == shuf["pr"].tolist()

    def test_shuffle_mode_matches_replay(self):
        rng = np.random.default_rng(5)
        df = _lineitem(rng, norders=50)
        ds = ray.data.from_pandas([d for d in np.array_split(df, 5)])
        out = graph.pagerank_scores(
            graph.coorder_edges(ds), iters=3, mode="shuffle"
        ).to_pandas()
        nodes, pr = _oracle(df, 3)
        assert out["part_key"].tolist() == nodes
        assert out["pr"].tolist() == pr.tolist()
