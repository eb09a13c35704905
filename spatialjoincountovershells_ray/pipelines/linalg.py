"""Distributed linear algebra over the embedding table.

Engine extensions (the reference joins geometry, not matrices; no
counterpart) covering the two matrix primitives a training-data
pipeline leans on at scale:

- ``gram_matrix``: the exact D x D Gram matrix A^T A of the embedding
  column in FIXED-POINT int64 — each batch folds to one D x D integer
  matmul partial, partials tree-merge (integer adds are associative, so
  any blocking/worker count is bit-identical), and the SQL twin unrolls
  the identical floor(v*S + 0.5) quantization per element. The
  covariance/PCA/whitening input computed without the embeddings ever
  leaving their blocks: the exchange carries D^2 ints per block.
- ``fd_sketch``: Frequent Directions (Liberty, KDD'13; Ghashami et al.,
  SIAM J. Comput. 2016) — the deterministic mergeable row-space sketch:
  per block an l-row sketch via SVD shrinkage, then a fixed-order
  pairwise merge tree (sketch-of-concatenation per merge). Guarantee:
  0 <= x^T (A^T A - B^T B) x <= ||A||_F^2 / l for unit x — the
  streaming low-rank primitive when even D x D is too big or a rank-k
  summary is the goal. Exchange: l x D floats per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

GRAM_FP_SCALE = float(1 << 20)  # fixed-point quantum (floor(v*S + 0.5))


def _embed_mat(batch: pa.Table) -> np.ndarray:
    return np.stack(
        batch.column("embedding").to_numpy(zero_copy_only=False)
    ).astype(np.float64)


@ray.remote
def _gram_block(tbl: pa.Table) -> np.ndarray:
    if tbl.num_rows == 0:
        return np.zeros((0, 0), np.int64)
    m = _embed_mat(tbl)
    fp = np.floor(m * GRAM_FP_SCALE + 0.5).astype(np.int64)
    return fp.T @ fp  # [D, D] exact int64 partial


@ray.remote
def _gram_fold(*parts: np.ndarray) -> np.ndarray:
    ne = [p for p in parts if p.size]
    if not ne:
        return np.zeros((0, 0), np.int64)
    acc = ne[0].copy()
    for p in ne[1:]:
        acc += p
    return acc


def gram_matrix(embeddings: "ray.data.Dataset") -> pa.Table:
    """-> i:int64, j:int64, dot_fp:int64 — the upper triangle (i <= j,
    0-based) of A^T A over floor(v * 2^20 + 0.5) fixed-point embeddings.

    Overflow contract: N * (max|fp|)^2 must fit int64 — unit-norm-ish
    embeddings give |fp| ~ 2^21, so ~2^20 rows of headroom; larger
    corpora split the fold into disjoint row ranges first."""
    refs = list(
        embeddings.select_columns(["embedding"]).materialize().to_arrow_refs()
    )
    if not refs:
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "dot_fp": pa.array([], pa.int64()),
            }
        )
    parts = [_gram_block.remote(r) for r in refs]
    fanin = 8
    while len(parts) > 1:
        parts = [
            _gram_fold.remote(*parts[i : i + fanin])
            for i in range(0, len(parts), fanin)
        ]
    g = ray.get(parts[0])
    d = g.shape[0]
    iu, ju = np.triu_indices(d)
    return pa.table(
        {
            "i": pa.array(iu.astype(np.int64), pa.int64()),
            "j": pa.array(ju.astype(np.int64), pa.int64()),
            "dot_fp": pa.array(g[iu, ju], pa.int64()),
        }
    )


def _fd_shrink(rows: np.ndarray, ell: int) -> np.ndarray:
    """One FD shrinkage step: SVD of the stacked rows, subtract the
    ell-th squared singular value, keep the top ell-1 directions (the
    canonical algorithm; deterministic for a fixed input)."""
    if len(rows) <= ell:
        out = np.zeros((ell, rows.shape[1]))
        out[: len(rows)] = rows
        return out
    _, s, vt = np.linalg.svd(rows, full_matrices=False)
    s2 = np.maximum(s * s - s[ell - 1] ** 2, 0.0)
    out = np.zeros((ell, rows.shape[1]))
    k = min(ell, len(s))
    out[:k] = np.sqrt(s2[:k])[:, None] * vt[:k]
    return out


@ray.remote
def _fd_block(tbl: pa.Table, ell: int) -> np.ndarray:
    if tbl.num_rows == 0:
        return np.zeros((0, 0))
    m = _embed_mat(tbl)
    sk = np.zeros((0, m.shape[1]))
    for s in range(0, len(m), 2 * ell):
        sk = _fd_shrink(np.vstack([sk, m[s : s + 2 * ell]]), ell)
    return sk


@ray.remote
def _fd_merge(ell: int, *parts: np.ndarray) -> np.ndarray:
    ne = [p for p in parts if p.size]
    if not ne:
        return np.zeros((0, 0))
    return _fd_shrink(np.vstack(ne), ell)


def fd_sketch(embeddings: "ray.data.Dataset", ell: int = 16) -> pa.Table:
    """-> row:int64, b:list<double> — the ell-row Frequent Directions
    sketch B of the embedding matrix, rows ordered by decreasing norm.

    Mergeability (Ghashami et al. Thm 1.1: sketch-of-sketches keeps the
    same ||A||_F^2/ell bound) makes the fold order a quality detail, not
    a correctness one; the fold is a fixed-fanin tree over block order
    for determinism of THIS run's output. pytest pins the spectral
    bound against the exact covariance."""
    refs = list(
        embeddings.select_columns(["embedding"]).materialize().to_arrow_refs()
    )
    if not refs:
        return pa.table(
            {"row": pa.array([], pa.int64()), "b": pa.array([], pa.list_(pa.float64()))}
        )
    parts = [_fd_block.remote(r, ell) for r in refs]
    fanin = 8
    while len(parts) > 1:
        parts = [
            _fd_merge.remote(ell, *parts[i : i + fanin])
            for i in range(0, len(parts), fanin)
        ]
    b = ray.get(parts[0])
    if b.size == 0:
        return pa.table(
            {"row": pa.array([], pa.int64()), "b": pa.array([], pa.list_(pa.float64()))}
        )
    order = np.argsort(-np.linalg.norm(b, axis=1), kind="stable")
    b = b[order]
    return pa.table(
        {
            "row": pa.array(np.arange(len(b), dtype=np.int64), pa.int64()),
            "b": pa.array(list(b), pa.list_(pa.float64())),
        }
    )
