"""Resumable ANN index-build job: train IVF-PQ artifacts once, encode
embedding shards into a compressed on-disk index, serve top-k queries
from the index without touching raw vectors.

The vector-search counterpart of jobs/corpus_curation_job.py (engine
extension; the reference has no ANN surface): a 100 TB embedding corpus
is indexed shard by shard — each shard's vectors are assigned to their
IVF list and product-quantized to m bytes (32x smaller than the float32
they came from at m=8), written as partitioned parquet a crashed run
resumes by skipping. Queries then read ONLY the code columns of the
probed lists (a parquet predicate pushdown on list_id), never the
embedding table.

Phases (state.checkpoint.CheckpointedRun units):
  1. "train": one bounded deterministic sample (ann.train_sample, min-k
     by mix64 — blocking-invariant) trains the coarse IVF centroids and
     the PQ subspace codebooks; both are persisted as ONE flattened
     parquet artifact shard so a resumed run reuses the exact same
     quantizers (an index whose shards were encoded under different
     codebooks is corrupt — the fingerprint pins the training params).
  2. one unit per embedding shard: read -> normalize -> IVF-assign ->
     PQ-encode -> write (vec_id, list_id, code[m]) to
     ``<out>/index/shard=<i>/``.
  3. ``query_index``: load the (tiny) artifacts driver-side, pick each
     query's nprobe nearest lists, stream the index with a list_id
     filter and score by ADC table lookups (pipelines.ann.pq_topk's
     arithmetic, against STORED codes — queries never see a vector).

Usage:
    python jobs/ann_index_job.py --shards e0.parquet e1.parquet \
        --out /tmp/annidx --nlist 32 --m 8 --ksub 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _artifact_table(cents, books):
    import numpy as np
    import pyarrow as pa

    nlist, d = cents.shape
    m, ksub, dsub = books.shape
    kind = np.r_[
        np.zeros(4, np.int64),
        np.ones(nlist * d, np.int64),
        np.full(m * ksub * dsub, 2, np.int64),
    ]
    idx = np.r_[
        np.arange(4, dtype=np.int64),
        np.arange(nlist * d, dtype=np.int64),
        np.arange(m * ksub * dsub, dtype=np.int64),
    ]
    v = np.r_[
        np.array([nlist, d, m, ksub], np.float64),
        cents.reshape(-1),
        books.reshape(-1),
    ]
    return pa.table(
        {
            "kind": pa.array(kind),
            "idx": pa.array(idx),
            "v": pa.array(v, pa.float64()),
        }
    )


def load_artifacts(out_dir: str):
    """-> (centroids [nlist, D], codebooks [m, ksub, dsub]) from the
    persisted train shard."""
    import numpy as np
    import pyarrow.parquet as pq

    d = os.path.join(out_dir, "index", "shard=train")
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    t = pq.read_table(files)
    kind = t.column("kind").to_numpy()
    idx = t.column("idx").to_numpy()
    v = t.column("v").to_numpy()

    def part(k):
        sel = kind == k
        return v[sel][np.argsort(idx[sel])]

    nlist, dim, m, ksub = (int(x) for x in part(0))
    cents = part(1).reshape(nlist, dim)
    books = part(2).reshape(m, ksub, dim // m)
    return cents, books


def build_index(
    shard_paths: list[str],
    out_dir: str,
    *,
    nlist: int = 32,
    m: int = 8,
    ksub: int = 16,
    train_rows: int = 4096,
):
    """Train (once) + encode every shard (resumable). Returns the list of
    state.checkpoint.ShardResult records."""
    import numpy as np
    import pyarrow as pa
    import ray

    from spatialjoincountovershells_ray.pipelines import ann
    from spatialjoincountovershells_ray.state.checkpoint import CheckpointedRun

    run = CheckpointedRun(os.path.join(out_dir, "index"))
    fp = f"nlist={nlist},m={m},ksub={ksub},train_rows={train_rows}"
    results = []

    def make_train():
        all_ds = ray.data.read_parquet(list(shard_paths), columns=["vec_id", "embedding"])
        sample = ann.train_sample(all_ds, train_rows)
        cents = ann.kmeans_centroids(sample, nlist)
        books = ann.pq_train(sample, m, ksub)
        return ray.data.from_arrow(_artifact_table(cents, books))

    results.append(run.run_shard("train", make_train, fingerprint=fp))
    cents, books = load_artifacts(out_dir)
    ref = ray.put({"cents": cents, "books": books})

    class EncodeKernel:
        def __init__(self, ref_list):
            p = ray.get(ref_list[0]) if isinstance(ref_list, list) else ref_list
            self.cents, self.books = p["cents"], p["books"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            mat = ann._norm_rows(
                np.stack(
                    batch.column("embedding").to_numpy(zero_copy_only=False)
                ).astype(np.float64)
            )
            lists = np.argmax(mat @ self.cents.T, axis=1).astype(np.int64)
            codes = ann._pq_encode_mat(mat, self.books)
            mm = self.books.shape[0]
            code_col = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(mm),
                len(ids),
                [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())],
            )
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "list_id": pa.array(lists, pa.int64()),
                    "code": code_col,
                }
            )

    from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

    for i, path in enumerate(shard_paths):
        def make_shard(path=path):
            return ray.data.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
                run_cached_bcast,
                fn_kwargs={"cls": EncodeKernel, "ref_list": [ref]},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )

        results.append(run.run_shard(f"{i:05d}", make_shard, fingerprint=fp))
    return results


def query_index(
    out_dir: str,
    query_ids,
    query_mat,
    k: int,
    *,
    nprobe: int = 8,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """-> qid:int64, vec_id:int64, rnk:int64 — ADC top-k from the stored
    index: per query an [m, ksub] distance table, per candidate m byte
    lookups; only the probed lists' rows are read (parquet predicate on
    list_id — row groups that contain none of the probed lists never
    leave storage)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pandas as pd
    import ray

    from spatialjoincountovershells_ray.pipelines import ann

    cents, books = load_artifacts(out_dir)
    m, ksub, dsub = books.shape
    qmat = ann._norm_rows(np.asarray(query_mat, dtype=np.float64))
    probe = np.argsort(-(qmat @ cents.T), axis=1, kind="stable")[
        :, : min(nprobe, len(cents))
    ]
    member = np.zeros((len(qmat), len(cents)), bool)
    member[np.repeat(np.arange(len(qmat)), probe.shape[1]), probe.reshape(-1)] = True
    luts = np.stack(
        [
            ((qmat[:, j * dsub : (j + 1) * dsub][:, None, :] - books[j][None, :, :]) ** 2).sum(2)
            for j in range(m)
        ],
        axis=1,
    )  # [Q, m, ksub]
    ref = ray.put(
        {"ids": np.asarray(query_ids), "member": member, "luts": luts, "m": m}
    )

    idx_dir = os.path.join(out_dir, "index")
    files = []
    for s in sorted(os.listdir(idx_dir)):
        if not s.startswith("shard=") or s == "shard=train" or s.endswith(".tmp"):
            continue
        d = os.path.join(idx_dir, s)
        files.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        )
    probed = sorted({int(b) for row in probe for b in row})
    index = ray.data.read_parquet(
        files,
        columns=["vec_id", "list_id", "code"],
        filter=pc.field("list_id").isin(probed),
    )

    class ScoreKernel:
        def __init__(self, ref_list, k: int):
            p = ray.get(ref_list[0]) if isinstance(ref_list, list) else ref_list
            self.qids, self.member = p["ids"], p["member"]
            self.luts, self.m = p["luts"], p["m"]
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
            if batch.num_rows == 0:
                return empty
            ids = batch.column("vec_id").to_numpy()
            lists = batch.column("list_id").to_numpy()
            code_arr = batch.column("code")
            if isinstance(code_arr, pa.ChunkedArray):
                code_arr = code_arr.combine_chunks()
            buf = np.frombuffer(code_arr.buffers()[1], np.uint8)
            codes = buf[
                code_arr.offset * self.m : (code_arr.offset + len(code_arr)) * self.m
            ].reshape(-1, self.m)
            d2 = self.luts[:, 0, codes[:, 0]]
            for j in range(1, self.m):
                d2 = d2 + self.luts[:, j, codes[:, j]]
            # a query only scores rows of its own probed lists
            d2 = np.where(self.member[:, lists], d2, np.inf)
            kk = min(self.k, d2.shape[1])
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(self.qids), dtype=np.int64), kk)
            cols = part.reshape(-1)
            sim = 1.0 - d2[rows, cols] / 2.0
            fin = np.isfinite(sim)
            return pa.table(
                {
                    "qid": pa.array(self.qids[rows][fin], pa.int64()),
                    "vec_id": pa.array(ids[cols][fin], pa.int64()),
                    "sim": pa.array(sim[fin], pa.float64()),
                }
            )

    from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

    cands = index.map_batches(
        run_cached_bcast,
        fn_kwargs={
            "cls": ScoreKernel,
            "ref_list": [ref],
            "ctor_kwargs": {"k": k + (1 if exclude_self else 0)},
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def select(group: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            group = group[group["vec_id"] != group["qid"]]
        g = group.sort_values(
            ["sim", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.assign(rnk=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["qid", "vec_id", "rnk"]]

    return cands.groupby("qid").map_groups(select, batch_format="pandas").sort(
        ["qid", "rnk"]
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shards", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--nlist", type=int, default=32)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--ksub", type=int, default=16)
    ap.add_argument("--train-rows", type=int, default=4096)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    t0 = time.time()
    results = build_index(
        args.shards,
        args.out,
        nlist=args.nlist,
        m=args.m,
        ksub=args.ksub,
        train_rows=args.train_rows,
    )
    print(
        json.dumps(
            {
                "shards": len(results),
                "skipped": sum(r.skipped for r in results),
                "rows": sum(r.rows for r in results),
                "seconds": round(time.time() - t0, 2),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
