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


def write_sharded_copy(
    build_fn,
    out_dir: str,
    spec_key: str,
    nshards: int,
    row_group_size: int = 50_000,
    overwrite: bool = False,
) -> dict:
    """Manifest-gated contiguous row-slice copy (round-5, verdict item 3):
    materialize ``build_fn()`` (a ``() -> pa.Table`` thunk — NOT called
    when the manifest verifies) as ``out_dir/part-NNNNN.parquet`` ×
    ``nshards`` plus the sibling manifest.

    This is the first-class home of the single-file-fusion fix: a
    monolithic one-row-group parquet file is ONE Ray read task, and map
    fusion serializes read→derive→kernel chains into that task — the
    pre-split copy restores read parallelism. The copy lives in per-node
    scratch; the manifest contract (tmp dir + atomic rename, manifest
    written LAST, verify-and-skip on matching ``(spec_key, nshards)``)
    means any node can rebuild or verify its own copy independently and
    a killed build never leaves a skippable half-copy — no shared-/tmp
    assumption, unlike the ad-hoc round-4 cache dirs this replaces.
    """
    import pyarrow.parquet as pq

    mpath = manifest_path(out_dir)
    if os.path.exists(mpath) and not overwrite:
        with open(mpath) as f:
            m = json.load(f)
        if m.get("key") == spec_key and m.get("nbuckets") == nshards:
            m["skipped"] = True
            return m
    t = build_fn()
    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    n = t.num_rows
    bounds = [(i * n) // nshards for i in range(nshards + 1)]
    buckets: dict[str, int] = {}
    for i in range(nshards):
        sl = t.slice(bounds[i], bounds[i + 1] - bounds[i])
        pq.write_table(
            sl, f"{tmp}/part-{i:05d}.parquet", row_group_size=row_group_size
        )
        buckets[str(i)] = sl.num_rows
    manifest = {
        "key": spec_key,
        "nbuckets": nshards,
        "rows": int(n),
        "buckets": buckets,
        "skipped": False,
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    if os.path.exists(mpath):
        os.remove(mpath)
    os.rename(tmp, out_dir)
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return manifest


def sharded_columns(
    src_parquet: str, columns: "list[str] | None", nshards: int, cache_root: str | None = None
) -> str:
    """Pre-split copy of selected columns of a single parquet file,
    through the :func:`write_sharded_copy` manifest contract. Returns
    the shard DIRECTORY (read it with ``ray.data.read_parquet(dir,
    override_num_blocks=nshards)`` to pin one block per shard). The
    cache key hashes (source path, columns, nshards) so different
    projections of the same table coexist."""
    import hashlib
    import tempfile

    cols = list(columns) if columns else None
    spec = f"rowslice:{src_parquet}:{','.join(cols) if cols else '*'}:{nshards}"
    tag = hashlib.sha1(spec.encode()).hexdigest()[:12]
    root = cache_root or os.path.join(tempfile.gettempdir(), "sjcs_shards")
    os.makedirs(root, exist_ok=True)
    out_dir = os.path.join(root, f"{os.path.basename(src_parquet)}-{tag}")

    def build() -> pa.Table:
        import pyarrow.parquet as pq

        return pq.read_table(src_parquet, columns=cols)

    write_sharded_copy(build, out_dir, spec, nshards)
    return out_dir
