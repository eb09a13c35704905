"""Resumable partitioned parquet sink.

The builder-brief output contract for 100 TB runs: results land as one
directory per key-hash bucket (``bucket=N/``, Hive layout via Ray Data's
native ``partition_cols``), with a manifest recording the partitioning
spec and per-bucket row counts so a re-run can verify-and-skip the whole
sink instead of rewriting it — the same atomic tmp-dir + rename contract
as state/checkpoint.py (reference parity: the reference's result writer,
src/main.c:212-246, writes one flat text file; the bucketed layout is the
scale replacement).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray

def manifest_path(out_dir: str) -> str:
    # sibling file, NOT inside out_dir: the data directory must stay
    # pure parquet so read_parquet(out_dir) round-trips
    return out_dir.rstrip("/") + ".manifest.json"


def bucket_of(keys: np.ndarray, nbuckets: int) -> np.ndarray:
    """mix64-hash bucket per key — the same family every exchange in the
    repo partitions by, so a downstream stage can co-locate with the
    files without a reshuffle."""
    from spatialjoincountovershells_ray.functions.hashing import mix64

    return (mix64(keys.astype(np.uint64)) % np.uint64(nbuckets)).astype(np.int64)


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    key: str,
    nbuckets: int = 64,
    overwrite: bool = False,
    bucket_fn=None,
) -> dict:
    """Write ``ds`` as ``out_dir/bucket=N/*.parquet`` + a manifest.

    Returns the manifest dict. If a manifest for the same (key, nbuckets)
    already exists and ``overwrite`` is False, the write is SKIPPED and
    the existing manifest returned — the resume contract. The write goes
    to a tmp sibling directory first and renames into place, so a killed
    run never leaves a half-written ``out_dir`` that a resume would
    wrongly skip.

    ``bucket_fn`` overrides the default mix64 key hash with any
    vectorized ``pa.Table -> int64 array`` layout (e.g. a Morton shard
    for range-prunable spatial partitioning); pass a distinct ``key``
    string naming the scheme so the manifest skip-check stays sound."""
    mpath = manifest_path(out_dir)
    if os.path.exists(mpath) and not overwrite:
        with open(mpath) as f:
            m = json.load(f)
        if m.get("key") == key and m.get("nbuckets") == nbuckets:
            m["skipped"] = True
            return m
    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)

    def stamp(batch: pa.Table) -> pa.Table:
        if bucket_fn is not None:
            b = bucket_fn(batch)
        else:
            b = bucket_of(batch.column(key).to_numpy(), nbuckets)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        tmp, partition_cols=["bucket"]
    )
    # per-bucket row counts from parquet FOOTERS — metadata reads only
    import pyarrow.parquet as pq

    buckets: dict[str, int] = {}
    for entry in sorted(os.listdir(tmp)):
        if not entry.startswith("bucket="):
            continue
        n = 0
        d = os.path.join(tmp, entry)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        buckets[entry.split("=", 1)[1]] = n
    manifest = {
        "key": key,
        "nbuckets": nbuckets,
        "rows": int(sum(buckets.values())),
        "buckets": buckets,
        "skipped": False,
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    if os.path.exists(mpath):
        os.remove(mpath)  # data gone -> stale manifest must not enable a skip
    os.rename(tmp, out_dir)
    with open(mpath, "w") as f:  # manifest last: its presence implies complete data
        json.dump(manifest, f)
    return manifest
