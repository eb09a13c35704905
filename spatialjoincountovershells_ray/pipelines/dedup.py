"""Deduplication operators over the documents table.

Engine extensions for training-data curation (no reference counterpart):

- ``exact_dedup``: group by exact text, keep min doc_id. One shuffle on
  the text key (at scale, pre-hash to a 64-bit key inside map_batches so
  the exchange carries 8-byte keys, not document bodies).
- ``minhash_lsh_pairs``: character-shingle MinHash signatures, banded
  LSH bucketing (groupby on band hash), candidate pairs verified by
  exact shingle Jaccard. The canonical shingle->minhash->band->bucket
  groupby plan; only signatures and candidate ids shuffle.
- ``simhash64``: 64-bit SimHash over token hashes -> near-dup buckets by
  Hamming-adjacent prefix bands.
- ``ngram_jaccard_pairs``: exact all-pairs n-gram Jaccard within small
  candidate groups (verification primitive, reused by the LSH verify).
- ``embedding_near_dups``: cosine near-duplicate pairs over the
  embeddings table via brute-force blocked matmul against a broadcast
  matrix (scale path: LSH/IVF bucketing in pipelines.ann).
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import default_pool

from spatialjoincountovershells_ray.functions import text as T
from spatialjoincountovershells_ray.functions.hashing import hash_bytes_rows, minhash_params, mix64


def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> keep_id:int64 (min doc_id per distinct text), dup_count:int64."""
    agg = docs.groupby("text").aggregate(
        ray.data.aggregate.Min("doc_id"), ray.data.aggregate.Count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "keep_id": pa.compute.cast(batch.column("min(doc_id)"), pa.int64()),
                "dup_count": pa.compute.cast(batch.column("count()"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 polynomial hashes of all k-byte shingles, deduplicated
    (vectorized: k passes over the byte buffer, no Python char loop)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, np.uint64)
    if len(b) < k:
        k = len(b)
    n = len(b) - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        base = np.uint64(0x100000001B3)
        for j in range(k):
            h = h * base + b[j : j + n].astype(np.uint64)
        h = mix64(h)
    return np.unique(h)


def minhash_signatures(
    docs: "ray.data.Dataset", num_perm: int = 64, shingle_k: int = 5
) -> "ray.data.Dataset":
    """-> doc_id, sig:list<uint64>[num_perm] per document."""
    a, b = minhash_params(num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            hv = _shingle_hashes(t, shingle_k)
            if len(hv) == 0:
                sigs[i] = np.uint64(0xFFFFFFFFFFFFFFFF)
                continue
            with np.errstate(over="ignore"):
                m = a[None, :] * hv[:, None] + b[None, :]  # [S, P] mod 2^64
            sigs[i] = m.min(axis=0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(list(sigs), pa.list_(pa.uint64(), num_perm)),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.6,
) -> "ray.data.Dataset":
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Plan: signatures -> flat_map band rows (band_key = hash of the band's
    signature slice) -> groupby(band_key) emits candidate pairs ->
    dedup pairs -> verify exact shingle Jaccard on the (small) candidate
    set via a broadcast text lookup.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, shingle_k)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sig = np.stack(batch.column("sig").to_numpy(zero_copy_only=False))  # [N, P]
        out_ids, out_keys = [], []
        for bi in range(bands):
            sl = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            key = np.zeros(len(ids), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(rows_per_band):
                    key = mix64(key ^ sl[:, j])
                key = mix64(key ^ np.uint64((bi * 0x9E3779B97F4A7C15) % (1 << 64)))
            out_ids.append(ids)
            out_keys.append(key.astype(np.int64))
        return pa.table(
            {
                "doc_id": np.concatenate(out_ids),
                "band_key": np.concatenate(out_keys),
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(np.int64)
        pairs = list(itertools.combinations(ids.tolist(), 2))
        return pd.DataFrame(pairs, columns=["id_a", "id_b"]).astype(np.int64)

    cands = banded.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")

    # candidate pairs may repeat across bands — distinct them with a
    # log-depth tree of Arrow group_by tasks (the Dataset groupby shuffle
    # costs ~20s of fixed overhead regardless of size here)
    @ray.remote
    def _distinct(*tables: pa.Table) -> pa.Table:
        t = pa.concat_tables([x for x in tables if x.num_rows], promote_options="none")
        return t.group_by(["id_a", "id_b"]).aggregate([])

    refs = list(cands.materialize().to_arrow_refs())
    while len(refs) > 1:
        refs = [_distinct.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    cands = ray.data.from_arrow(
        ray.get(refs[0]) if refs else pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    )

    # verify: broadcast doc_id -> text (documents are the small side here;
    # at scale this is a hash-join of candidates back to the doc table)
    texts_ref = ray.put(
        {int(r["doc_id"]): r["text"] for r in docs.select_columns(["doc_id", "text"]).take_all()}
    )

    class Verify:
        def __init__(self, texts_ref):
            self.texts = ray.get(texts_ref[0])

        def __call__(self, batch: pa.Table) -> pa.Table:
            ia = batch.column("id_a").to_numpy()
            ib = batch.column("id_b").to_numpy()
            keep_a, keep_b, jac = [], [], []
            for x, y in zip(ia, ib):
                sa = T.char_shingles(self.texts[int(x)], shingle_k)
                sb = T.char_shingles(self.texts[int(y)], shingle_k)
                j = T.jaccard(sa, sb)
                if j >= threshold:
                    keep_a.append(int(x))
                    keep_b.append(int(y))
                    jac.append(j)
            return pa.table(
                {
                    "id_a": pa.array(keep_a, pa.int64()),
                    "id_b": pa.array(keep_b, pa.int64()),
                    "jaccard": pa.array(jac, pa.float64()),
                }
            )

    verified = cands.map_batches(
        Verify,
        fn_constructor_kwargs={"texts_ref": [texts_ref]},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    # near-dup pair sets are small relative to the corpus: final ordering
    # driver-side beats a Dataset-wide sort exchange
    tables = [t for t in ray.get(verified.materialize().to_arrow_refs()) if t.num_rows]
    if not tables:
        out = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "jaccard": pa.array([], pa.float64())}
        )
    else:
        out = pa.concat_tables(tables, promote_options="none")
    return ray.data.from_arrow(out.sort_by([("id_a", "ascending"), ("id_b", "ascending")]))


def simhash64(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id, simhash:int64 — 64-bit SimHash over whitespace-token
    hashes (sign of per-bit vote sums)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        bitcols = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = t.split()
            if not toks:
                out[i] = 0
                continue
            hv = hash_bytes_rows([w.encode("utf-8") for w in toks])  # [W]
            bits = (hv[:, None] & bitcols[None, :]) != 0  # [W, 64]
            votes = bits.sum(axis=0) * 2 - len(toks)
            out[i] = np.uint64(0)
            sel = votes > 0
            out[i] = bitcols[sel].sum(dtype=np.uint64) if sel.any() else np.uint64(0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": out.view(np.int64),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset", n: int = 3, threshold: float = 0.5
) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard near-dup pairs via LSH-free all-pairs
    within source groups (for bounded group sizes; the general path is
    minhash_lsh_pairs)."""

    def group_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["doc_id"].to_numpy()
        grams = [T.word_ngrams(t, n) for t in group["text"]]
        order = np.argsort(ids)
        rows = []
        for i, j in itertools.combinations(order.tolist(), 2):
            jac = T.jaccard(grams[i], grams[j])
            if jac >= threshold:
                rows.append((int(ids[i]), int(ids[j]), jac))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    return (
        docs.groupby("source")
        .map_groups(group_pairs, batch_format="pandas")
        .sort(["id_a", "id_b"])
    )


def embedding_near_dups(
    embeddings: "ray.data.Dataset", threshold: float = 0.95, concurrency=None
) -> "ray.data.Dataset":
    """Cosine near-duplicate pairs (vec_id_a < vec_id_b, cos >= threshold)
    via blocked matmul of streamed batches against the broadcast
    normalized matrix."""
    if concurrency is None:
        concurrency = default_pool()
    from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

    tbl = dataset_to_table(embeddings.select_columns(["vec_id", "embedding"]))
    ids = tbl.column("vec_id").to_numpy()
    mat = np.stack(tbl.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put({"ids": ids, "mat": mat})

    class NearDup:
        def __init__(self, ref):
            p = ray.get(ref[0])
            self.ids, self.mat = p["ids"], p["mat"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column("vec_id").to_numpy()
            bmat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
            bmat /= np.linalg.norm(bmat, axis=1, keepdims=True)
            sims = bmat @ self.mat.T
            bi, gi = np.nonzero(sims >= threshold)
            a = bids[bi]
            b = self.ids[gi]
            keep = a < b
            return pa.table(
                {
                    "vec_id_a": pa.array(a[keep], pa.int64()),
                    "vec_id_b": pa.array(b[keep], pa.int64()),
                }
            )

    return (
        embeddings.map_batches(
            NearDup,
            fn_constructor_kwargs={"ref": [ref]},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
        .sort(["vec_id_a", "vec_id_b"])
    )
