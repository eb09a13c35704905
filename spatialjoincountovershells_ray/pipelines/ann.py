"""Approximate / exact nearest-neighbour search over embedding columns.

- ``cosine_topk``: brute-force exact top-k by cosine similarity — the
  data matrix streams through an actor pool, each batch emits partial
  top-k candidates against the broadcast query matrix (numpy matmul);
  a groupby(query) reduction selects the global k. Exact baseline.
- ``lsh_topk``: random-hyperplane LSH variant — vectors are bucketed by
  sign-bit prefix (groupby on bucket), queries probe only their bucket
  (plus Hamming-1 neighbours), trading recall for a bounded candidate
  set. The scale path when brute force is too wide.
- ``ivf_topk``: inverted-file (IVF) variant — k-means centroids are
  trained on a bounded sample, every vector is assigned to its nearest
  centroid inside ``map_batches``, and each query probes only its
  ``nprobe`` nearest lists. Same one-pass streaming shape as LSH but
  with data-adaptive buckets (better recall on clustered embeddings).
- ``pq_encode`` / ``pq_topk``: product quantization (Jegou et al.,
  TPAMI 2011) — per-subspace codebooks trained on a bounded sample,
  vectors compressed to m uint8 codes (32x at m=8 on 64-dim float32),
  queries scored by asymmetric-distance lookup tables (ADC). The
  compressed-domain half of the billion-scale IVF-PQ plan; compose
  with ``ivf_topk``'s list probing for the full layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import default_pool

from spatialjoincountovershells_ray.functions.hashing import mix64


def _bcast_map(
    ds: "ray.data.Dataset",
    cls,
    ref,
    ctor_kwargs: dict,
    *,
    concurrency=None,
    batch_size=None,
):
    """Run a broadcast kernel class over ``ds``: task mode with the
    per-worker kernel cache by default (no actor-pool spawn latency, no
    concurrency cap — stages/join_kernels.run_cached_bcast), or a real
    actor pool when the caller pins ``concurrency``."""
    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    if batch_size is not None:
        kw["batch_size"] = batch_size
    if concurrency is not None:
        return ds.map_batches(
            cls,
            fn_constructor_args=([ref],),
            fn_constructor_kwargs=ctor_kwargs,
            concurrency=concurrency,
            **kw,
        )
    from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

    return ds.map_batches(
        run_cached_bcast,
        fn_kwargs={"cls": cls, "ref_list": [ref], "ctor_kwargs": ctor_kwargs},
        **kw,
    )


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _TopkKernel:
    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref[0]) if isinstance(queries_ref, list) else queries_ref
        self.qids: np.ndarray = q["ids"]
        self.qmat: np.ndarray = q["mat"]  # normalized [Q, D]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        mat = _norm_rows(
            np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        sims = self.qmat @ mat.T  # [Q, B]
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = np.repeat(np.arange(len(self.qids), dtype=np.int64), k)
        cols = part.reshape(-1)
        return pa.table(
            {
                "qid": self.qids[rows],
                "vec_id": ids[cols],
                "sim": sims[rows, cols],
            }
        )


def _topk_finish(
    cands: "ray.data.Dataset", k: int, *, exclude_self: bool = True, include_sim: bool = False
) -> "ray.data.Dataset":
    """Shared ANN finish stage: per-qid global top-k over the candidate
    union (sim desc, vec_id asc; rnk 1-based).

    Round-4 plan (verdict item 3): a hash-bucket exchange on qid
    (window.keyed_partition_apply) + ONE vectorized lexsort/run-length
    pass per bucket — the relagg.topk_per_group shape — replacing the
    per-qid pandas ``map_groups`` callback, whose per-group Python cost
    dominated at large query counts. Candidate volume is bounded
    (queries x per-stage k x probe fan-out), so buckets stay small."""
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def kernel(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            cols = {
                "qid": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
            if include_sim:
                cols["sim"] = pa.array([], pa.float64())
            return pa.table(cols)
        q = tbl.column("qid").to_numpy()
        v = tbl.column("vec_id").to_numpy()
        s = tbl.column("sim").to_numpy()
        if exclude_self:
            m = v != q
            q, v, s = q[m], v[m], s[m]
        # NaN sims (zero-norm embeddings) rank LAST deterministically,
        # matching the pandas sort_values(ascending=False) this replaced
        # (lexsort on -NaN has unspecified placement otherwise); the
        # emitted sim column keeps the original values
        skey = np.nan_to_num(s, nan=-np.inf)
        order = np.lexsort((v, -skey, q))
        q, v, s = q[order], v[order], s[order]
        n = len(q)
        starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]]) if n else np.array([], np.int64)
        runlen = np.diff(np.r_[starts, n]) if n else np.array([], np.int64)
        rnk = np.arange(n, dtype=np.int64) - np.repeat(starts, runlen) + 1
        keep = rnk <= k
        cols = {
            "qid": pa.array(q[keep], pa.int64()),
            "vec_id": pa.array(v[keep], pa.int64()),
            "rnk": pa.array(rnk[keep], pa.int64()),
        }
        if include_sim:
            cols["sim"] = pa.array(s[keep], pa.float64())
        return pa.table(cols)

    return keyed_partition_apply(cands, "qid", kernel).sort(["qid", "rnk"])


def cosine_topk(
    embeddings: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    batch_size: int = 4096,
    concurrency=None,
    include_sim: bool = False,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """-> qid:int64, vec_id:int64, rnk:int64 (1-based by sim desc, vec_id asc)."""
    ref = ray.put({"ids": np.asarray(query_ids), "mat": _norm_rows(np.asarray(query_mat, dtype=np.float64))})
    cands = _bcast_map(
        embeddings,
        _TopkKernel,
        ref,
        {"k": k + (1 if exclude_self else 0)},
        concurrency=concurrency,
        batch_size=batch_size,
    )
    return _topk_finish(cands, k, exclude_self=exclude_self, include_sim=include_sim)


def hyperplane_codes(mat: np.ndarray, nbits: int, dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic random-hyperplane sign codes (uint64)."""
    raw = mix64(np.arange(nbits * dim, dtype=np.uint64) + np.uint64(seed))
    planes = (raw.astype(np.float64) / 2**64 - 0.5).reshape(nbits, dim)
    bits = (mat @ planes.T) > 0  # [N, nbits]
    weights = np.uint64(1) << np.arange(nbits, dtype=np.uint64)
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)


def lsh_topk(
    embeddings: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    nbits: int = 8,
    concurrency=None,
) -> "ray.data.Dataset":
    """Bucketed ANN: probe only the query's hyperplane bucket and its
    Hamming-1 neighbours. Approximate (recall < 1); same output schema as
    cosine_topk."""
    qmat = _norm_rows(np.asarray(query_mat, dtype=np.float64))
    dim = qmat.shape[1]
    qcodes = hyperplane_codes(qmat, nbits, dim)
    # probe set per query: own bucket + Hamming-1
    probes = {}
    for qi, c in enumerate(qcodes):
        s = {int(c)}
        for b in range(nbits):
            s.add(int(c) ^ (1 << b))
        probes[qi] = s
    bucket_to_q: dict[int, list[int]] = {}
    for qi, s in probes.items():
        for b in s:
            bucket_to_q.setdefault(b, []).append(qi)
    ref = ray.put({"ids": np.asarray(query_ids), "mat": qmat, "bucket_to_q": bucket_to_q, "nbits": nbits, "dim": dim})

    class Kernel:
        def __init__(self, ref, k):
            p = ray.get(ref[0])
            self.qids, self.qmat = p["ids"], p["mat"]
            self.bucket_to_q = p["bucket_to_q"]
            self.nbits, self.dim = p["nbits"], p["dim"]
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            mat = _norm_rows(
                np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
            )
            codes = hyperplane_codes(mat, self.nbits, self.dim)
            out_q, out_v, out_s = [], [], []
            for b in np.unique(codes):
                qlist = self.bucket_to_q.get(int(b))
                if not qlist:
                    continue
                rows = np.nonzero(codes == b)[0]
                sims = self.qmat[qlist] @ mat[rows].T
                kk = min(self.k, len(rows))
                part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                for j, qi in enumerate(qlist):
                    sel = rows[part[j]]
                    out_q.append(np.full(len(sel), self.qids[qi], dtype=np.int64))
                    out_v.append(ids[sel])
                    out_s.append(sims[j, part[j]])
            if not out_q:
                return pa.table(
                    {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
                )
            return pa.table(
                {"qid": np.concatenate(out_q), "vec_id": np.concatenate(out_v), "sim": np.concatenate(out_s)}
            )

    cands = _bcast_map(embeddings, Kernel, ref, {"k": k + 1}, concurrency=concurrency)

    return _topk_finish(cands, k)


def train_sample(embeddings: "ray.data.Dataset", train_rows: int) -> np.ndarray:
    """Deterministic bounded training sample: the ``train_rows`` vectors
    with the smallest mix64(vec_id), as a normalized [n, D] float64
    matrix in hash order.

    A ``limit(train_rows)`` sample is NOT deterministic under Ray Data's
    default ``preserve_order=False`` — which blocks arrive first decides
    which rows train the codebooks, so two runs of the same query could
    build different indexes (observed as a flaky blocking-invariance
    test). mix64 is a bijective mixer, so the min-k set is a fixed
    pseudo-random sample of the corpus, invariant to blocking, arrival
    order and cluster size. Per-batch partial min-k bounds the exchange
    to O(blocks x train_rows) rows; the final sort+limit runs on that
    bounded candidate set, never the corpus."""

    def part(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        h = mix64(ids.astype(np.uint64))
        # sign-flip: int64 compare == uint64 compare after XOR 2^63
        hkey = (h ^ np.uint64(1 << 63)).view(np.int64)
        k = min(train_rows, len(ids))
        sel = (
            np.argpartition(hkey, k - 1)[:k]
            if len(ids) > k
            else np.arange(len(ids), dtype=np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hkey[sel], pa.int64()),
                "embedding": batch.column("embedding").take(pa.array(sel)),
            }
        )

    rows = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("h")
        .limit(train_rows)
        .take_all()
    )
    rows.sort(key=lambda r: r["h"])  # take_all after sort+limit: re-assert order
    return _norm_rows(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    )


def kmeans_centroids(
    sample: np.ndarray, nlist: int, *, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Deterministic spherical k-means on a (already normalized) sample.

    k-means++ seeding with a fixed RNG, then ``iters`` Lloyd rounds with
    cosine assignment; empty clusters are re-seeded from the farthest
    points. Returns normalized centroids [nlist, D]."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    nlist = min(nlist, n)
    # k-means++ seeding
    first = int(rng.integers(n))
    cents = [sample[first]]
    d2 = 2.0 - 2.0 * (sample @ cents[0])  # squared euclid on unit sphere
    for _ in range(nlist - 1):
        p = np.maximum(d2, 0)
        tot = p.sum()
        idx = int(rng.choice(n, p=p / tot)) if tot > 0 else int(rng.integers(n))
        cents.append(sample[idx])
        d2 = np.minimum(d2, 2.0 - 2.0 * (sample @ cents[-1]))
    c = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(sample @ c.T, axis=1)
        for j in range(nlist):
            rows = assign == j
            if rows.any():
                c[j] = sample[rows].mean(axis=0)
            else:  # re-seed dead cluster from the worst-fit point
                c[j] = sample[int(np.argmin((sample @ c.T).max(axis=1)))]
        c = _norm_rows(c)
    return c


def ivf_topk(
    embeddings: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    nlist: int = 32,
    nprobe: int = 4,
    train_rows: int = 4096,
    concurrency=None,
    sample: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """IVF ANN: train centroids on a bounded deterministic sample
    (:func:`train_sample` — the only driver-side materialization,
    O(train_rows × D) regardless of corpus size), broadcast them, assign
    vectors to lists inside ``map_batches``, probe each query's
    ``nprobe`` nearest lists. Approximate (recall < 1); same output
    schema as cosine_topk."""
    if sample is None:
        sample = train_sample(embeddings, train_rows)
    cents = kmeans_centroids(sample, nlist)
    qmat = _norm_rows(np.asarray(query_mat, dtype=np.float64))
    # per-query probe lists -> bucket -> queries inverted map
    order = np.argsort(-(qmat @ cents.T), axis=1, kind="stable")[:, : min(nprobe, len(cents))]
    bucket_to_q: dict[int, list[int]] = {}
    for qi in range(len(qmat)):
        for b in order[qi]:
            bucket_to_q.setdefault(int(b), []).append(qi)
    ref = ray.put(
        {"ids": np.asarray(query_ids), "mat": qmat, "bucket_to_q": bucket_to_q, "cents": cents}
    )

    class Kernel:
        def __init__(self, ref, k):
            p = ray.get(ref[0])
            self.qids, self.qmat = p["ids"], p["mat"]
            self.bucket_to_q = p["bucket_to_q"]
            self.cents = p["cents"]
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            mat = _norm_rows(
                np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
            )
            codes = np.argmax(mat @ self.cents.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for b in np.unique(codes):
                qlist = self.bucket_to_q.get(int(b))
                if not qlist:
                    continue
                rows = np.nonzero(codes == b)[0]
                sims = self.qmat[qlist] @ mat[rows].T
                kk = min(self.k, len(rows))
                part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                for j, qi in enumerate(qlist):
                    sel = rows[part[j]]
                    out_q.append(np.full(len(sel), self.qids[qi], dtype=np.int64))
                    out_v.append(ids[sel])
                    out_s.append(sims[j, part[j]])
            if not out_q:
                return pa.table(
                    {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
                )
            return pa.table(
                {"qid": np.concatenate(out_q), "vec_id": np.concatenate(out_v), "sim": np.concatenate(out_s)}
            )

    cands = _bcast_map(embeddings, Kernel, ref, {"k": k + 1}, concurrency=concurrency)

    return _topk_finish(cands, k)


def subspace_kmeans(
    sample: np.ndarray, ksub: int, *, iters: int = 12, seed: int = 11
) -> np.ndarray:
    """Deterministic Euclidean Lloyd's k-means for one PQ subspace.

    Plain (non-spherical) k-means — subvectors are not unit-norm.
    k-means++ seeding from a fixed RNG; dead clusters re-seed from the
    worst-fit point. Returns [ksub, dsub] float64 centroids."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    ksub = min(ksub, n)
    first = int(rng.integers(n))
    cents = [sample[first]]
    d2 = ((sample - cents[0]) ** 2).sum(1)
    for _ in range(ksub - 1):
        p = np.maximum(d2, 0)
        tot = p.sum()
        idx = int(rng.choice(n, p=p / tot)) if tot > 0 else int(rng.integers(n))
        cents.append(sample[idx])
        d2 = np.minimum(d2, ((sample - cents[-1]) ** 2).sum(1))
    c = np.stack(cents)
    for _ in range(iters):
        d = ((sample[:, None, :] - c[None, :, :]) ** 2).sum(2)
        assign = np.argmin(d, axis=1)
        for j in range(ksub):
            rows = assign == j
            if rows.any():
                c[j] = sample[rows].mean(axis=0)
            else:
                c[j] = sample[int(np.argmax(d.min(axis=1)))]
    return c


def pq_train(sample: np.ndarray, m: int, ksub: int) -> np.ndarray:
    """Product-quantizer codebooks [m, ksub, dsub] from a normalized
    sample: the D dims split into m contiguous subspaces, one independent
    Euclidean k-means per subspace (Jegou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011)."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack(
        [
            subspace_kmeans(sample[:, j * dsub : (j + 1) * dsub], ksub, seed=11 + j)
            for j in range(m)
        ]
    )


def _pq_encode_mat(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """[N, m] uint8 codes: each subvector to its nearest sub-centroid."""
    n, d = mat.shape
    m, ksub, dsub = books.shape
    codes = np.empty((n, m), np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        # ||x - c||^2 argmin == argmax(2 x.c - ||c||^2); one gemm per subspace
        dots = sub @ books[j].T
        codes[:, j] = np.argmax(2.0 * dots - (books[j] ** 2).sum(1)[None, :], axis=1)
    return codes


def pq_encode(
    embeddings: "ray.data.Dataset",
    *,
    m: int = 8,
    ksub: int = 16,
    train_rows: int = 4096,
    sample: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """-> vec_id:int64, code:binary(m bytes) — the PQ-compressed vector
    table (64-dim float32 -> m bytes, a 32x compression at m=8): the
    artifact a 100 TB ANN deployment stores and serves instead of raw
    floats. Codebooks train on a bounded sample (the IVF contract: the
    only driver materialization, O(train_rows x D)); encoding is one
    stateless vectorized scan."""
    if sample is None:
        sample = train_sample(embeddings, train_rows)
    books = pq_train(sample, m, ksub)
    ref = ray.put(books)

    def encode(batch: pa.Table, ref) -> pa.Table:
        b = ray.get(ref[0]) if isinstance(ref, list) else ref
        ids = batch.column("vec_id").to_numpy()
        mat = _norm_rows(
            np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        codes = _pq_encode_mat(mat, b)
        mm = b.shape[0]
        # row-major [N, m] uint8 IS the fixed-size-binary data buffer
        code_col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(mm), len(ids), [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())]
        )
        return pa.table({"vec_id": pa.array(ids, pa.int64()), "code": code_col})

    return embeddings.map_batches(
        encode, fn_kwargs={"ref": [ref]}, batch_format="pyarrow", zero_copy_batch=True
    )


def pq_topk(
    embeddings: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    m: int = 8,
    ksub: int = 16,
    train_rows: int = 4096,
    concurrency=None,
    sample: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """PQ ANN: asymmetric-distance (ADC) top-k over product-quantized
    vectors — each query precomputes an [m, ksub] table of subspace
    distances to every sub-centroid; a database vector's approximate
    distance is m table lookups summed over its codes, never a float dot
    product (Jegou et al. 2011, the compressed-domain half of IVF-PQ —
    compose with ivf_topk's list probing for the full billion-scale
    plan). Codebooks train on a bounded sample and broadcast; the base
    table streams once; per-batch partial top-k bounds the exchange to
    O(batches x Q x k). Approximate (recall < 1); same output schema as
    cosine_topk."""
    if sample is None:
        sample = train_sample(embeddings, train_rows)
    books = pq_train(sample, m, ksub)
    qmat = _norm_rows(np.asarray(query_mat, dtype=np.float64))
    dsub = qmat.shape[1] // m
    # ADC lookup tables: luts[q, j, c] = ||q_j - books[j, c]||^2
    luts = np.stack(
        [
            ((qmat[:, j * dsub : (j + 1) * dsub][:, None, :] - books[j][None, :, :]) ** 2).sum(2)
            for j in range(m)
        ],
        axis=1,
    )  # [Q, m, ksub]
    ref = ray.put({"ids": np.asarray(query_ids), "books": books, "luts": luts})

    class Kernel:
        def __init__(self, ref, k):
            p = ray.get(ref[0])
            self.qids, self.books, self.luts = p["ids"], p["books"], p["luts"]
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            mat = _norm_rows(
                np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
            )
            codes = _pq_encode_mat(mat, self.books)  # [B, m]
            # d2[q, b] = sum_j luts[q, j, codes[b, j]] — pure table lookups
            mm = self.luts.shape[1]
            d2 = self.luts[:, 0, codes[:, 0]]
            for j in range(1, mm):
                d2 = d2 + self.luts[:, j, codes[:, j]]
            kk = min(self.k, d2.shape[1])
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(self.qids), dtype=np.int64), kk)
            cols = part.reshape(-1)
            return pa.table(
                {
                    "qid": self.qids[rows],
                    "vec_id": ids[cols],
                    # unit sphere: cos = 1 - d2/2; report sim for the shared select
                    "sim": 1.0 - d2[rows, cols] / 2.0,
                }
            )

    cands = _bcast_map(embeddings, Kernel, ref, {"k": k + 1}, concurrency=concurrency)

    return _topk_finish(cands, k)


def ivfpq_topk(
    embeddings: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    nlist: int = 32,
    nprobe: int = 8,
    m: int = 8,
    ksub: int = 16,
    train_rows: int = 4096,
    concurrency=None,
    sample: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """The composed billion-scale ANN plan: IVF list probing (ivf_topk)
    to bound WHICH vectors each query scores, PQ asymmetric-distance
    lookups (pq_topk) to bound HOW each candidate is scored — per
    candidate the cost is m byte-indexed table reads, never a D-wide
    float dot product. One bounded sample trains both the coarse
    centroids and the subspace codebooks; one broadcast carries coarse
    centroids + codebooks + per-query probe sets + ADC tables; the base
    table streams once. Approximate (recall < 1); same output schema as
    cosine_topk.
    """
    if sample is None:
        sample = train_sample(embeddings, train_rows)
    cents = kmeans_centroids(sample, nlist)
    books = pq_train(sample, m, ksub)
    qmat = _norm_rows(np.asarray(query_mat, dtype=np.float64))
    dsub = qmat.shape[1] // m
    order = np.argsort(-(qmat @ cents.T), axis=1, kind="stable")[:, : min(nprobe, len(cents))]
    bucket_to_q: dict[int, list[int]] = {}
    for qi in range(len(qmat)):
        for b in order[qi]:
            bucket_to_q.setdefault(int(b), []).append(qi)
    luts = np.stack(
        [
            ((qmat[:, j * dsub : (j + 1) * dsub][:, None, :] - books[j][None, :, :]) ** 2).sum(2)
            for j in range(m)
        ],
        axis=1,
    )  # [Q, m, ksub]
    ref = ray.put(
        {
            "ids": np.asarray(query_ids),
            "cents": cents,
            "books": books,
            "bucket_to_q": bucket_to_q,
            "luts": luts,
        }
    )

    class Kernel:
        def __init__(self, ref, k):
            p = ray.get(ref[0])
            self.qids, self.cents, self.books = p["ids"], p["cents"], p["books"]
            self.bucket_to_q, self.luts = p["bucket_to_q"], p["luts"]
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            mat = _norm_rows(
                np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
            )
            lists = np.argmax(mat @ self.cents.T, axis=1)
            codes = _pq_encode_mat(mat, self.books)
            mm = self.luts.shape[1]
            out_q, out_v, out_s = [], [], []
            for b in np.unique(lists):
                qlist = self.bucket_to_q.get(int(b))
                if not qlist:
                    continue
                rows = np.nonzero(lists == b)[0]
                c = codes[rows]
                d2 = self.luts[qlist, 0][:, c[:, 0]]
                for j in range(1, mm):
                    d2 = d2 + self.luts[qlist, j][:, c[:, j]]
                kk = min(self.k, len(rows))
                part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                for jq, qi in enumerate(qlist):
                    sel = rows[part[jq]]
                    out_q.append(np.full(len(sel), self.qids[qi], dtype=np.int64))
                    out_v.append(ids[sel])
                    out_s.append(1.0 - d2[jq, part[jq]] / 2.0)
            if not out_q:
                return pa.table(
                    {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
                )
            return pa.table(
                {"qid": np.concatenate(out_q), "vec_id": np.concatenate(out_v), "sim": np.concatenate(out_s)}
            )

    cands = _bcast_map(embeddings, Kernel, ref, {"k": k + 1}, concurrency=concurrency)

    return _topk_finish(cands, k)


KMEANS_FP_SCALE = 1 << 20  # fixed-point quantum for exact centroid sums


def _embed_fp(batch: pa.Table) -> "tuple[np.ndarray, np.ndarray]":
    """(vec_ids, int64 fixed-point matrix) for one batch."""
    ids = batch.column("vec_id").to_numpy()
    mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
    return ids, np.rint(mat * KMEANS_FP_SCALE).astype(np.int64)


def _kmeans_d2(qf: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared distances via per-cluster row-local sums (length-dim
    pairwise reductions): unlike a BLAS gemm, the reduction order cannot
    depend on the batch's row count, so distances are
    blocking-independent."""
    qq = (qf * qf).sum(1)
    out = np.empty((len(qf), len(c)), np.float64)
    for j in range(len(c)):
        out[:, j] = qq - 2.0 * (qf * c[j]).sum(1) + (c[j] * c[j]).sum()
    return out


@ray.remote
def _kmeans_partial(tbl: pa.Table, c: np.ndarray, k: int) -> "tuple[np.ndarray, np.ndarray]":
    """One block -> (counts[k], int64 moment sums[k, dim])."""
    _, q = _embed_fp(tbl)
    a = np.argmin(_kmeans_d2(q.astype(np.float64), c), axis=1)
    counts = np.bincount(a, minlength=k).astype(np.int64)
    sums = np.zeros((k, q.shape[1]), np.int64)
    order = np.argsort(a, kind="stable")
    qs, asrt = q[order], a[order]
    if len(asrt):
        starts = np.flatnonzero(np.r_[True, asrt[1:] != asrt[:-1]])
        sums[asrt[starts]] = np.add.reduceat(qs, starts, axis=0)
    return counts, sums


def kmeans_assign(
    ds: "ray.data.Dataset", k: int = 8, iters: int = 5
) -> "ray.data.Dataset":
    """-> vec_id:int64, cluster:int64 — DETERMINISTIC distributed Lloyd's
    k-means over the embedding column: the iterative broadcast-refine
    pattern, run on raw Ray tasks over object-store-resident blocks (the
    documented drop-to-raw-Ray case — a per-iteration Dataset groupby
    pays the full exchange machinery for what is a k x (dim+2) fold; one
    task per cached block + a driver numpy fold is ~10x cheaper per
    iteration, and the driver state stays O(k*dim) ints).

    Determinism is engineered, not hoped for: embeddings are quantized
    once to int64 fixed point (KMEANS_FP_SCALE), so the per-cluster
    moment sums are EXACT integers — centroid updates cannot depend on
    batch boundaries or float summation order, and every run (any
    blocking, any worker count) produces bit-identical assignments. The
    pytest oracle replays the identical algorithm single-process and
    matches exactly. Init = the k lowest vec_ids (deterministic); empty
    clusters keep their previous centroid. Per iteration the exchange is
    O(blocks * k * (dim+2)) int64 — the data matrix never moves: it is
    read once (materialize — the legitimate case: iterative reuse) and
    every iteration probes the same cached blocks."""
    ds = ds.select_columns(["vec_id", "embedding"]).materialize()

    def _seed_filter(batch: pa.Table) -> pa.Table:
        # vectorized Arrow filter (a row-lambda filter would iterate the
        # whole corpus in Python just to find k seed rows)
        import pyarrow.compute as _pc

        return batch.filter(_pc.less(batch.column("vec_id"), k))

    seeds = ds.map_batches(
        _seed_filter, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    seeds.sort(key=lambda r: r["vec_id"])
    cent = np.stack([np.asarray(r["embedding"], np.float64) for r in seeds])
    cent = np.rint(cent * KMEANS_FP_SCALE)  # float64 copies of exact ints

    refs = ds.to_arrow_refs()
    for _ in range(iters):
        parts = ray.get([_kmeans_partial.remote(r, cent, k) for r in refs])
        counts = np.sum([p[0] for p in parts], axis=0)  # exact int64
        sums = np.sum([p[1] for p in parts], axis=0)
        nz = counts > 0
        cent[nz] = sums[nz].astype(np.float64) / counts[nz, None].astype(np.float64)

    def assign(batch: pa.Table, c: np.ndarray) -> pa.Table:
        ids, q = _embed_fp(batch)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(
                    np.argmin(_kmeans_d2(q.astype(np.float64), c), axis=1).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(
        assign, fn_kwargs={"c": cent}, batch_format="pyarrow", zero_copy_batch=True
    ).sort("vec_id")


PCA_FP_SCALE = 1 << 16  # coarser than centroids: the moment fold squares it


@ray.remote
def _sum_moment_tables(*tbls: pa.Table) -> pa.Table:
    """Elementwise-sum positionally-aligned (kind, idx, v) moment tables.

    Each input block holds >= 0 stacked partials of one fixed period
    (1 + d + d*d rows); the period is recovered from the kind column
    (rows with kind == 0 start a partial) and every segment folds into
    one, so blocks that concatenated several map partials are handled."""
    base = None
    acc = None
    for t in tbls:
        if t.num_rows == 0:
            continue
        kind = t.column("kind").to_numpy()
        v = t.column("v").to_numpy()
        m = int(np.flatnonzero(kind == 0)[1]) if (kind == 0).sum() > 1 else len(kind)
        seg = v.reshape(-1, m).sum(0)
        if acc is None:
            acc = seg.copy()
            base = t.slice(0, m)
        else:
            acc += seg
    if acc is None:
        return pa.table(
            {
                "kind": pa.array([], pa.int64()),
                "idx": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {"kind": base.column("kind"), "idx": base.column("idx"), "v": pa.array(acc)}
    )


def _tree_fold_moments(ds: "ray.data.Dataset", fanin: int = 8) -> pa.Table:
    """Tree-reduce a Dataset of moment partials to ONE table without the
    all-to-all groupby machinery (the partials are O(d^2) int64 rows per
    block — a fixed-layout vector sum, not a real exchange; measured
    ~2.5 s of Dataset-groupby fixed cost saved at any scale)."""
    refs = list(ds.materialize().to_arrow_refs())
    while len(refs) > 1:
        refs = [
            _sum_moment_tables.remote(*refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
    return ray.get(_sum_moment_tables.remote(*refs))


def pca_project(
    ds: "ray.data.Dataset", ncomp: int = 8
) -> "tuple[ray.data.Dataset, np.ndarray, np.ndarray]":
    """Distributed PCA over the embedding column. Returns
    ``(projected, components, eigvals)`` where projected is
    -> vec_id, c0..c{ncomp-1}:double (each vector's coordinates in the
    top principal directions), components is [ncomp, D] and eigvals the
    matching variances.

    Plan: one streaming pass folds EXACT integer moments — per batch the
    count, the D-vector sum and the DxD second-moment matrix of the
    fixed-point-quantized vectors (np.rint(x * 2^16)), so the exchange
    carries O(batches) blocks of D^2+D+1 int64s and the driver fold is
    deterministic regardless of blocking or summation order (a float
    covariance fold would drift with block boundaries). The covariance
    eigendecomposition runs once on the driver (D x D — 64x64 here);
    signs canonicalize to max-|component| positive so re-runs emit
    identical projections. A second stateless pass projects map-side.

    Overflow contract: |x| <= 4 per coordinate (asserted) keeps each
    product under 2^36, so ~1e8 rows fit int64 per partial; beyond that
    shard the fold (tree-merge partials) before widening is needed."""
    S = PCA_FP_SCALE

    def moments(batch: pa.Table) -> pa.Table:
        mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        if mat.size and np.abs(mat).max() > 4.0:
            raise ValueError("pca_project: |coordinate| > 4 breaks the int64 moment bound")
        q = np.rint(mat * S).astype(np.int64)
        d = q.shape[1]
        sxx = q.T @ q  # exact: int64 matmul
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[
                        np.zeros(1, np.int64),
                        np.ones(d, np.int64),
                        np.full(d * d, 2, np.int64),
                    ],
                    pa.int64(),
                ),
                "idx": pa.array(
                    np.r_[
                        np.zeros(1, np.int64),
                        np.arange(d, dtype=np.int64),
                        np.arange(d * d, dtype=np.int64),
                    ],
                    pa.int64(),
                ),
                "v": pa.array(
                    np.r_[np.array([len(q)], np.int64), q.sum(0), sxx.reshape(-1)],
                    pa.int64(),
                ),
            }
        )

    folded = _tree_fold_moments(
        ds.select_columns(["embedding"]).map_batches(
            moments, batch_format="pyarrow", zero_copy_batch=True
        )
    )  # D^2 + D + 1 rows — never the data
    kind = folded.column("kind").to_numpy()
    v = folded.column("v").to_numpy()
    n = int(v[0])
    d = int((kind == 1).sum())
    sum_x = v[1 : 1 + d].astype(np.float64)
    sum_xx = v[1 + d :].astype(np.float64).reshape(d, d)
    mean = sum_x / (n * S)
    cov = sum_xx / (n * S * S) - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(-eigvals)[:ncomp]
    comps = eigvecs[:, order].T  # [ncomp, D]
    eigvals = eigvals[order]
    # deterministic sign: the largest-|entry| coordinate is positive
    for j in range(len(comps)):
        i = int(np.argmax(np.abs(comps[j])))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    ref = ray.put({"mean": mean, "comps": comps})

    def project(batch: pa.Table, ref) -> pa.Table:
        p = ray.get(ref[0]) if isinstance(ref, list) else ref
        ids = batch.column("vec_id").to_numpy()
        mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        # project the same quantized values the moments saw, so the
        # output is a pure function of the exact integer state
        q = np.rint(mat * S) / S
        proj = (q - p["mean"]) @ p["comps"].T
        cols = {"vec_id": pa.array(ids, pa.int64())}
        for j in range(proj.shape[1]):
            cols[f"c{j}"] = pa.array(proj[:, j], pa.float64())
        return pa.table(cols)

    out = ds.select_columns(["vec_id", "embedding"]).map_batches(
        project, fn_kwargs={"ref": [ref]}, batch_format="pyarrow", zero_copy_batch=True
    )
    return out.sort("vec_id"), comps, eigvals


# ---------------------------------------------------------------------------
# per-label centroids (class prototypes) — exact fixed-point moments

CENTROID_FP_SCALE = 1 << 20


def label_centroids(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> label:int64, dim:int64, sum_fp:int64, n:int64, mean:double —
    the per-class mean embedding (class prototype / nearest-centroid
    classifier table), dimension-wise, sorted by (label, dim).

    Exactness contract: embeddings quantize to int64 fixed point with
    ``floor(v * S + 0.5)`` — every step (float32->float64 widening, the
    multiply, the add, floor) is a single correctly-rounded IEEE op, so
    the SQL twin's identical expression produces bit-equal integers
    (np.rint's half-even rule would diverge at exact .5 and is NOT
    used). Each batch folds to <= labels x dim integer moment rows
    (np.add.at over a dense label-index grid), one packed-key combiner
    merges them, and the mean is ONE double division of exact integers.
    """
    S = CENTROID_FP_SCALE

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy().astype(np.int64)
        mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        q = np.floor(mat * S + 0.5).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        nl, d = len(ulab), q.shape[1]
        if nl and (int(ulab[0]) < 0 or d > 0xFFFF):
            raise ValueError("label_centroids packs (label, dim) as 48+16 bits; out of range")
        sums = np.zeros((nl, d), np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=nl).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(
                    (np.repeat(ulab, d) << 16) | np.tile(np.arange(d, dtype=np.int64), nl),
                    pa.int64(),
                ),
                "s": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(cnt, d), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(ray.data.aggregate.Sum("s"), ray.data.aggregate.Sum("n"))
    )

    def final(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy()
        s = batch.column("sum(s)").to_numpy().astype(np.int64)
        n = batch.column("sum(n)").to_numpy().astype(np.int64)
        return pa.table(
            {
                "label": pa.array(k >> 16, pa.int64()),
                "dim": pa.array(k & 0xFFFF, pa.int64()),
                "sum_fp": pa.array(s, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "mean": pa.array(s.astype(np.float64) / (n.astype(np.float64) * S)),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["label", "dim"]
    )


@ray.remote
def _collect_centroid_grid(*parts: pa.Table) -> np.ndarray:
    """(labels_sorted, D) int64 rounded-centroid matrix from the
    label_centroids blocks (rows already carry label/dim/sum_fp/n)."""
    ne = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(ne, promote_options="none")
    lab = tbl.column("label").to_numpy()
    dim = tbl.column("dim").to_numpy()
    s = tbl.column("sum_fp").to_numpy().astype(np.float64)
    n = tbl.column("n").to_numpy().astype(np.float64)
    labs = np.unique(lab)
    d = int(dim.max()) + 1
    grid = np.zeros((len(labs), d), np.int64)
    li = np.searchsorted(labs, lab)
    # floor(s/n + 0.5): every step one correctly-rounded IEEE op (s, n
    # exact in double), replayed verbatim by the SQL twin
    grid[li, dim] = np.floor(s / n + 0.5).astype(np.int64)
    return np.concatenate([labs[:, None], grid], axis=1)


def nearest_centroid(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> vec_id, label_pred:int64, d2:int64 — each embedding classified
    to its nearest ROUNDED label centroid (the nearest-centroid /
    Rocchio classifier), with the exact integer squared distance.

    Exactness: vectors quantize with floor(v*S+0.5) (label_centroids'
    contract) and centroids round to the same grid via floor(s/n + 0.5)
    — both expressions replayed verbatim in SQL — so d2 = sum_dim
    (v_d - c_d)^2 is an EXACT int64 (<= dims * (2*S*|v|_max)^2, far
    inside headroom) and the argmin (ties -> smallest label) cannot be
    perturbed by float error. Centroids come from one label_centroids
    pass (O(labels x dims) rows), are concatenated by a remote task and
    broadcast; classification is one stateless vectorized scan."""
    cent = label_centroids(ds)
    refs = list(cent.materialize().to_arrow_refs())
    grid_ref = _collect_centroid_grid.remote(*refs)
    S = CENTROID_FP_SCALE

    def classify(batch: pa.Table, grid: np.ndarray) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        q = np.floor(mat * S + 0.5).astype(np.int64)
        labs, c = grid[:, 0], grid[:, 1:]
        # exact int64 pairwise d2: (n, L) via per-label reductions
        d2 = np.empty((len(q), len(labs)), np.int64)
        for j in range(len(labs)):
            diff = q - c[j]
            d2[:, j] = (diff * diff).sum(axis=1)
        best = np.argmin(d2, axis=1)  # first (= smallest label) wins ties
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "label_pred": pa.array(labs[best], pa.int64()),
                "d2": pa.array(d2[np.arange(len(q)), best], pa.int64()),
            }
        )

    grid = ray.get(grid_ref)
    return ds.map_batches(
        classify,
        fn_kwargs={"grid": grid},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("vec_id")


def label_cov(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> label:int64, di:int64, dj:int64, n:int64, spp:int64 — the exact
    per-class second-moment matrix of the embedding table (upper
    triangle, di <= dj): spp = sum over the class of fp_i * fp_j with
    the :func:`label_centroids` quantization (floor(v * S + 0.5), every
    step one correctly-rounded IEEE op, so the SQL twin's identical
    expression produces bit-equal integers). Together with
    label_centroids' first moments this is everything LDA / whitening /
    a Gaussian class model needs — covariance is one driver-side
    division away, and staying integer keeps the gate value-exact.

    Physical plan: per batch one int64 gram matrix per present label
    (q_g.T @ q_g — exact, no float accumulation), flattened to
    (packed key, value) rows; a remote tree-fold merges the partials
    (O(labels x d^2/2) rows, never the data). Overflow contract:
    class_rows * (4S)^2 must fit int64 (~2^19 rows at S = 2^20)."""
    S = CENTROID_FP_SCALE

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy().astype(np.int64)
        mat = np.stack(
            batch.column("embedding").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        q = np.floor(mat * S + 0.5).astype(np.int64)
        d = q.shape[1]
        if d > 0xFF:
            raise ValueError("label_cov packs dims as 8 bits; dim > 255")
        ulab, inv = np.unique(lab, return_inverse=True)
        if len(ulab) and int(ulab[0]) < 0:
            raise ValueError("label_cov needs non-negative labels")
        iu, ju = np.triu_indices(d)
        keys, vals = [], []
        for li, lv in enumerate(ulab):
            qg = q[inv == li]
            g = qg.T @ qg  # exact int64 gram
            keys.append((int(lv) << 16) | (iu << 8) | ju)
            vals.append(g[iu, ju])
            # count rides along under the (255, 255) tag (dims are 8-bit
            # and d <= 255, so the tag cannot collide with a real pair)
            keys.append(np.array([(int(lv) << 16) | 0xFFFF], np.int64))
            vals.append(np.array([len(qg)], np.int64))
        return pa.table(
            {
                "c": pa.array(np.concatenate(keys).astype(np.int64), pa.int64()),
                "n": pa.array(np.concatenate(vals).astype(np.int64), pa.int64()),
            }
        )

    from spatialjoincountovershells_ray.pipelines.relagg import _merge_hists

    refs = list(
        ds.select_columns(["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
        .to_arrow_refs()
    )
    while len(refs) > 1:
        refs = [_merge_hists.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    merged = ray.get(_merge_hists.remote(*refs)) if refs else None
    if merged is None or merged.num_rows == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "di": pa.array([], pa.int64()),
                    "dj": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "spp": pa.array([], pa.int64()),
                }
            )
        )
    c = merged.column("c").to_numpy()
    v = merged.column("n").to_numpy()
    is_cnt = (c & 0xFFFF) == 0xFFFF
    cnt_of = dict(zip((c[is_cnt] >> 16).tolist(), v[is_cnt].tolist()))
    cp, vp = c[~is_cnt], v[~is_cnt]
    lab = cp >> 16
    n = np.array([cnt_of[int(x)] for x in lab], np.int64)
    out = pa.table(
        {
            "label": pa.array(lab, pa.int64()),
            "di": pa.array((cp >> 8) & 0xFF, pa.int64()),
            "dj": pa.array(cp & 0xFF, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "spp": pa.array(vp, pa.int64()),
        }
    )
    return ray.data.from_arrow(out).sort(["label", "di", "dj"])


class _HardNegKernel:
    """Broadcast kernel: exact int64 squared distances from each base
    batch to the sampled query matrix on the CENTROID_FP_SCALE grid,
    same-label candidates masked out, per-query per-batch partial top-k
    (the exchange carries queries x k rows per block, never the batch)."""

    def __init__(self, ref_list, k: int):
        q = ray.get(ref_list[0])
        self.qids = q["ids"]
        self.qlabs = q["labels"]
        self.qfp = q["mat"]  # (Q, D) int64
        self.qsq = (self.qfp * self.qfp).sum(axis=1)  # (Q,)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        labs = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        fp = np.floor(mat * CENTROID_FP_SCALE + 0.5).astype(np.int64)  # (N, D)
        nsq = (fp * fp).sum(axis=1)
        # exact: all values bounded by D * (2 S |v|max)^2 << 2^63
        d2 = nsq[:, None] + self.qsq[None, :] - 2 * (fp @ self.qfp.T)  # (N, Q)
        same = labs[:, None] == self.qlabs[None, :]
        d2 = np.where(same, np.iinfo(np.int64).max, d2)
        k = min(self.k, d2.shape[0])
        part = np.argpartition(d2, k - 1, axis=0)[:k]  # (k, Q) row indices
        qidx = np.broadcast_to(np.arange(d2.shape[1]), (k, d2.shape[1]))
        dd = d2[part, qidx]
        keep = dd != np.iinfo(np.int64).max
        return pa.table(
            {
                "qid": pa.array(np.broadcast_to(self.qids, (k, len(self.qids)))[keep], pa.int64()),
                "neg_id": pa.array(ids[part][keep], pa.int64()),
                "d2": pa.array(dd[keep], pa.int64()),
            }
        )


def hard_negatives(
    embeddings: "ray.data.Dataset",
    k: int = 5,
    sample_mod: int = 5,
    *,
    concurrency=None,
) -> "ray.data.Dataset":
    """-> qid, neg_id, rnk (1-based), d2 — hard-negative mining: for each
    sampled anchor vector, its k nearest neighbours with a DIFFERENT
    label by exact integer squared distance on the shared fixed-point
    grid (the contrastive-training data op: anchors broadcast bounded by
    ``sample_mod``, base streamed once, ties broken by neg_id so the
    result is value-hash deterministic). The ANN family (lsh/ivf/pq) is
    the scale path when the anchor set stops fitting a broadcast."""
    import pyarrow.compute as pc

    # anchor collection: one filtered scan, folded by a single remote task
    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        return batch.filter(pa.array(ids % sample_mod == 0))

    a_refs = list(
        embeddings.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
        .to_arrow_refs()
    )

    @ray.remote
    def collect(*parts: pa.Table) -> dict:
        t = pa.concat_tables([p for p in parts if p.num_rows], promote_options="none")
        mat = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        return {
            "ids": t.column("vec_id").to_numpy(),
            "labels": t.column("label").to_numpy(zero_copy_only=False).astype(np.int64),
            "mat": np.floor(mat * CENTROID_FP_SCALE + 0.5).astype(np.int64),
        }

    ref = collect.remote(*a_refs)
    cands = _bcast_map(embeddings, _HardNegKernel, ref, {"k": k}, concurrency=concurrency)

    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def finish(tbl: pa.Table) -> pa.Table:
        # _topk_finish's lexsort/run-length plan, keyed (d2 asc, neg_id asc)
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "neg_id": pa.array([], pa.int64()),
                    "rnk": pa.array([], pa.int64()),
                    "d2": pa.array([], pa.float64()),
                }
            )
        q = tbl.column("qid").to_numpy()
        v = tbl.column("neg_id").to_numpy()
        d = tbl.column("d2").to_numpy()
        order = np.lexsort((v, d, q))
        q, v, d = q[order], v[order], d[order]
        n = len(q)
        starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]]) if n else np.array([], np.int64)
        runlen = np.diff(np.r_[starts, n]) if n else np.array([], np.int64)
        rnk = np.arange(n, dtype=np.int64) - np.repeat(starts, runlen) + 1
        keep = rnk <= k
        return pa.table(
            {
                "qid": pa.array(q[keep], pa.int64()),
                "neg_id": pa.array(v[keep], pa.int64()),
                "rnk": pa.array(rnk[keep], pa.int64()),
                "d2": pa.array(d[keep], pa.float64()),
            }
        )

    return keyed_partition_apply(cands, "qid", finish).sort(["qid", "rnk"])


def ann_recall(
    embeddings: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    nbits: int = 8,
) -> "ray.data.Dataset":
    """-> qid, n_exact, n_approx, hits:int64, recall:double — per-query
    recall@k of the LSH index against the exact brute-force top-k (the
    evaluation loop every ANN deployment runs before trusting an index).

    Both result sets are bounded (Q x k rows); the compare still runs
    distributed — results tagged by side, ONE qid-hash bucket exchange,
    and per bucket a single packed-key searchsorted membership pass
    counts the overlap for every query at once (no per-query Python,
    no driver-side sets)."""
    import pyarrow.compute as pc  # noqa: F401  (parity with module style)

    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    exact = cosine_topk(embeddings, query_ids, query_mat, k)
    approx = lsh_topk(embeddings, query_ids, query_mat, k, nbits=nbits)

    def tag(src: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "qid": batch.column("qid"),
                    "vec_id": batch.column("vec_id"),
                    "src": pa.array(np.full(batch.num_rows, src, np.int8)),
                }
            )

        return fn

    both = exact.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        approx.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "qid": pa.array([], pa.int64()),
                "n_exact": pa.array([], pa.int64()),
                "n_approx": pa.array([], pa.int64()),
                "hits": pa.array([], pa.int64()),
                "recall": pa.array([], pa.float64()),
            }
        )
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return empty
        q = tbl.column("qid").to_numpy()
        v = tbl.column("vec_id").to_numpy()
        src = tbl.column("src").to_numpy(zero_copy_only=False)
        qs = np.unique(q)
        qi = np.searchsorted(qs, q)
        if len(v) and (int(v.min()) < 0 or int(v.max()) >= 1 << 40):
            raise ValueError("ann_recall packs vec_id as 40-bit non-negative")
        key = qi.astype(np.int64) * (np.int64(1) << 40) + v
        ke = np.sort(key[src == 0])
        ka = key[src == 1]
        pos = np.searchsorted(ke, ka)
        posc = np.minimum(pos, max(len(ke) - 1, 0))
        hit = (
            ((pos < len(ke)) & (ke[posc] == ka))
            if len(ke)
            else np.zeros(len(ka), bool)
        )
        n_exact = np.bincount(qi[src == 0], minlength=len(qs)).astype(np.int64)
        n_approx = np.bincount(qi[src == 1], minlength=len(qs)).astype(np.int64)
        hits = np.bincount(qi[src == 1][hit], minlength=len(qs)).astype(np.int64)
        recall = hits / np.maximum(n_exact, 1)
        return pa.table(
            {
                "qid": pa.array(qs, pa.int64()),
                "n_exact": pa.array(n_exact, pa.int64()),
                "n_approx": pa.array(n_approx, pa.int64()),
                "hits": pa.array(hits, pa.int64()),
                "recall": pa.array(recall, pa.float64()),
            }
        )

    return keyed_partition_apply(both, "qid", kernel).sort("qid")
