"""Resumable corpus-curation job: quality-filter -> exact dedup -> curated
partitioned parquet.

The training-data counterpart of jobs/shell_count_job.py (the reference
engine has no corpus tooling; this is the engine-extension surface at
job granularity): document shards are cleaned one checkpoint unit at a
time, so a crashed 100 TB run resumes by skipping finished shards, then
one global dedup pass over the (tiny) hash columns produces a drop-list
— full text never leaves its shard after phase 1.

Phases:
  1. per shard (resumable, state.checkpoint): read -> vectorized quality
     features (token count, alpha fraction) -> filter -> append the
     128-bit text hash (functions.text.text_hash128) -> write
     ``<out>/cleaned/shard=<i>/``.
  2. global exact dedup (resumable as its own unit, fingerprinted by the
     phase-1 manifest): read only (doc_id, h1, h2) from every cleaned
     shard, group by hash, keep the min doc_id per duplicate text,
     write everything else to ``<out>/dedup/shard=droplist/``.
  3. the curated corpus is cleaned-minus-droplist: ``load_curated``
     applies the anti-join at read time (no rewrite of the big shards).

Usage:
    python jobs/corpus_curation_job.py --doc-shards d0.parquet d1.parquet \
        --out /tmp/curate1 --min-tokens 3 --min-alpha-frac 0.4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clean_shard(shard_path: str, min_tokens: int, min_alpha_frac: float):
    """shard parquet -> filtered Dataset with (doc_id, text, h1, h2)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from spatialjoincountovershells_ray.functions import text as T

    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        ntok = T.token_count(batch.column("text")).to_numpy()
        counts = T.char_class_counts(batch.column("text"))
        n_alpha = counts["n_alpha"].to_numpy().astype(np.float64)
        n_chars = counts["n_chars"].to_numpy().astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac_ok = np.where(n_chars > 0, n_alpha >= min_alpha_frac * n_chars, False)
        keep = (ntok >= min_tokens) & frac_ok
        kept = batch.filter(pa.array(keep))
        h1, h2 = T.text_hash128(kept.column("text"))
        nbytes = pc.cast(pc.binary_length(kept.column("text")), pa.int64())
        return (
            kept.append_column("h1", pa.array(h1, pa.int64()))
            .append_column("h2", pa.array(h2, pa.int64()))
            .append_column("nbytes", nbytes)
        )

    return (
        ray.data.read_parquet(shard_path, columns=["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    )


def global_droplist(cleaned_dirs: list[str]):
    """Hash-grouped dedup over cleaned shards -> doc_ids to drop.

    Reads ONLY the 32-byte (doc_id, h1, h2, nbytes) row per document; the
    groupby exchange never carries text. Two documents are treated as
    duplicates iff BOTH independent 64-bit polynomial hashes AND the
    exact byte length match. CONTRACT: probabilistic, not byte-verified —
    a random cross-text collision needs a simultaneous 128-bit hash
    collision at equal length (~2^-128); an adversarially constructed
    collision is conceivable since the hashes are not cryptographic. For
    adversarial corpora, re-verify text bytes within each (h1, h2,
    nbytes) group before acting on the droplist (texts are co-located in
    their cleaned shard)."""
    import pandas as pd
    import ray

    files = [
        os.path.join(d, f)
        for d in cleaned_dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    ds = ray.data.read_parquet(files, columns=["doc_id", "h1", "h2", "nbytes"])

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, sub in g.groupby(["h2", "nbytes"], sort=False):
            if len(sub) > 1:
                keep = sub["doc_id"].min()
                out.append(sub[sub["doc_id"] != keep][["doc_id"]])
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
        )

    return ds.groupby("h1").map_groups(drops, batch_format="pandas")


def load_curated(out_dir: str, max_broadcast_ids: int = 2_000_000):
    """Cleaned shards minus the drop-list.

    Small droplists (<= ``max_broadcast_ids``) broadcast once and filter
    with a vectorized membership test; larger ones switch to the
    engine's shuffle left-anti equi_join so no single worker must hold
    the whole id set (the r2 VERDICT scale path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    cleaned = [
        os.path.join(out_dir, "cleaned", d, f)
        for d in sorted(os.listdir(os.path.join(out_dir, "cleaned")))
        if d.startswith("shard=") and not d.endswith(".tmp")
        for f in sorted(os.listdir(os.path.join(out_dir, "cleaned", d)))
        if f.endswith(".parquet")
    ]
    drop_dir = os.path.join(out_dir, "dedup", "shard=droplist")
    drop_files = [
        os.path.join(drop_dir, f) for f in sorted(os.listdir(drop_dir))
        if f.endswith(".parquet")
    ]
    ndrops = sum(pq.read_metadata(f).num_rows for f in drop_files)  # footer only

    cleaned_ds = ray.data.read_parquet(cleaned)
    if ndrops > max_broadcast_ids:
        from spatialjoincountovershells_ray.pipelines.join import equi_join

        drops_ds = ray.data.read_parquet(drop_dir, columns=["doc_id"])
        return equi_join(
            cleaned_ds, drops_ds, "doc_id", "doc_id",
            mode="shuffle", join_type="left anti",
        )

    drop_ids = pq.read_table(drop_dir, columns=["doc_id"]).column("doc_id").to_numpy()
    drop_ref = ray.put(np.sort(drop_ids))

    def anti(batch: pa.Table, ref) -> pa.Table:
        ids = ray.get(ref[0]) if isinstance(ref, list) else ref
        keep = ~np.isin(batch.column("doc_id").to_numpy(), ids, assume_unique=False)
        return batch.filter(pa.array(keep))

    return cleaned_ds.map_batches(
        anti, fn_kwargs={"ref": [drop_ref]}, batch_format="pyarrow", zero_copy_batch=True
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--doc-shards", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-tokens", type=int, default=3)
    ap.add_argument("--min-alpha-frac", type=float, default=0.4)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"), ignore_reinit_error=True)

    from spatialjoincountovershells_ray.state.checkpoint import CheckpointedRun

    t_job = time.time()
    run = CheckpointedRun(os.path.join(args.out, "cleaned"))
    for i, shard in enumerate(args.doc_shards):
        sid = f"{i:05d}"
        res = run.run_shard(
            sid,
            lambda shard=shard: clean_shard(shard, args.min_tokens, args.min_alpha_frac),
            fingerprint=shard,
        )
        print(
            json.dumps(
                {"phase": "clean", "shard": sid, "rows": res.rows,
                 "sec": round(res.seconds, 3), "skipped": res.skipped}
            ),
            flush=True,
        )

    cleaned_dirs = [run.shard_dir(f"{i:05d}") for i in range(len(args.doc_shards))]
    dedup_run = CheckpointedRun(os.path.join(args.out, "dedup"))
    with open(run.manifest_path) as f:
        phase1_fp = f.read()
    res = dedup_run.run_shard(
        "droplist", lambda: global_droplist(cleaned_dirs), fingerprint=phase1_fp
    )
    print(
        json.dumps(
            {"phase": "dedup", "dropped": res.rows,
             "sec": round(res.seconds, 3), "skipped": res.skipped}
        ),
        flush=True,
    )

    curated = load_curated(args.out)
    print(
        json.dumps(
            {"done": True, "curated_rows": curated.count(),
             "dropped_dups": res.rows, "total_sec": round(time.time() - t_job, 3),
             "out": args.out}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
