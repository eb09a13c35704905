"""End-to-end LM pre-training data job: quality filter -> test-set
decontamination -> exact dedup -> domain mixture weighting -> sequence
packing -> resumable partitioned sink.

The full composition of the engine's curation surface at job
granularity (jobs/corpus_curation_job.py covers phases 1-3; this job
carries the corpus the rest of the way to a training-serving layout):

  1. clean  — per input shard (resumable, state.checkpoint): quality
     filter (min token count) + the 128-bit text hash; keeps source.
  2. decontam — one checkpoint unit: flag every training doc sharing a
     word n-gram with the benchmark parquet (curation.decontaminate —
     benchmark grams broadcast, training side streams).
  3. dedup — one checkpoint unit: global exact-hash droplist over the
     cleaned shards (corpus_curation_job.global_droplist; the exchange
     carries 32-byte rows, never text).
  4. mixture — curated = cleaned minus both droplists (broadcast
     anti-filter; swap for the shuffle left-anti equi_join when the
     droplists outgrow a broadcast), then curation.mixture_sample
     up-/down-weights each domain; every emitted copy gets a distinct
     seq_id = doc_id * copy_stride + copy so downstream packing keys
     stay unique.
  5. pack — curation.pack_sequences lays the mixture head-to-tail in
     seq_id order and cuts fixed token-budget packs.
  6. sink — sources/sinks.write_partitioned lands the pack table as
     bucket= directories with a verify-and-skip manifest.

Every phase is a checkpoint unit: a rerun of a finished run prints the
same summary with every phase marked skipped and writes nothing.

Usage:
    python jobs/pretrain_data_job.py --doc-shards d0.parquet d1.parquet \
        --bench bench.parquet --out /tmp/pretrain1 \
        --rates src0=0.5 src1=2.0 --pack-budget 512
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPY_STRIDE = 16  # seq_id = doc_id * 16 + copy; rates must stay < 16


def clean_shard(shard_path: str, min_tokens: int):
    """shard parquet -> (doc_id, text, source, h1, h2, nbytes) Dataset."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from spatialjoincountovershells_ray.functions import text as T

    def fn(batch: pa.Table) -> pa.Table:
        ntok = T.token_count(batch.column("text")).to_numpy()
        kept = batch.filter(pa.array(ntok >= min_tokens))
        h1, h2 = T.text_hash128(kept.column("text"))
        return (
            kept.append_column("h1", pa.array(h1, pa.int64()))
            .append_column("h2", pa.array(h2, pa.int64()))
            .append_column(
                "nbytes", pc.cast(pc.binary_length(kept.column("text")), pa.int64())
            )
        )

    return ray.data.read_parquet(
        shard_path, columns=["doc_id", "text", "source"]
    ).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _cleaned_files(out_dir: str) -> list[str]:
    root = os.path.join(out_dir, "cleaned")
    return [
        os.path.join(root, d, f)
        for d in sorted(os.listdir(root))
        if d.startswith("shard=") and not d.endswith(".tmp")
        for f in sorted(os.listdir(os.path.join(root, d)))
        if f.endswith(".parquet")
    ]


def decontam_droplist(out_dir: str, bench_path: str, ngram: int):
    import ray

    from spatialjoincountovershells_ray.pipelines import curation

    train = ray.data.read_parquet(_cleaned_files(out_dir), columns=["doc_id", "text"])
    bench = ray.data.read_parquet(bench_path, columns=["doc_id", "text"])
    return curation.decontaminate(train, bench, n=ngram).select_columns(["doc_id"])


def mixture_stage(out_dir: str, rates: dict[str, float]):
    """curated = cleaned - (dedup ∪ decontam droplists) -> mixture copies
    with unique seq ids."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from spatialjoincountovershells_ray.pipelines import curation

    if any(r >= COPY_STRIDE for r in rates.values()):
        raise ValueError(f"mixture rate >= {COPY_STRIDE} breaks seq_id uniqueness")
    drop_ids = []
    for unit in ("dedup", "decontam"):
        d = os.path.join(out_dir, unit, "shard=droplist")
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                drop_ids.append(pq.read_table(os.path.join(d, f)).column("doc_id").to_numpy())
    drops = np.sort(np.unique(np.concatenate(drop_ids))) if drop_ids else np.empty(0, np.int64)
    drop_ref = ray.put(drops)

    def anti(batch: pa.Table, ref) -> pa.Table:
        ids = ray.get(ref[0]) if isinstance(ref, list) else ref
        keep = ~np.isin(batch.column("doc_id").to_numpy(), ids)
        return batch.filter(pa.array(keep))

    curated = ray.data.read_parquet(
        _cleaned_files(out_dir), columns=["doc_id", "text", "source"]
    ).map_batches(anti, fn_kwargs={"ref": [drop_ref]}, batch_format="pyarrow", zero_copy_batch=True)

    mixed = curation.mixture_sample(
        curated, rates, keep_cols=["doc_id", "source", "text"], default_rate=1.0
    )

    def seq_ids(batch: pa.Table) -> pa.Table:
        sid = batch.column("doc_id").to_numpy() * COPY_STRIDE + batch.column("copy").to_numpy()
        return pa.table(
            {
                "seq_id": pa.array(sid, pa.int64()),
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "text": batch.column("text"),
            }
        )

    return mixed.map_batches(seq_ids, batch_format="pyarrow", zero_copy_batch=True)


def pack_stage(out_dir: str, budget: int):
    import pyarrow as pa
    import ray

    from spatialjoincountovershells_ray.pipelines import curation

    def as_docs(batch: pa.Table) -> pa.Table:
        # pack_sequences keys on doc_id; the mixture's seq_id IS the
        # packing key (each up-sampled copy packs independently)
        return pa.table({"doc_id": batch.column("seq_id"), "text": batch.column("text")})

    mixed = ray.data.read_parquet(
        os.path.join(out_dir, "mixture", "shard=mixed"), columns=["seq_id", "text"]
    ).map_batches(as_docs, batch_format="pyarrow", zero_copy_batch=True)
    return curation.pack_sequences(mixed, budget)


def run_job(
    doc_shards: list[str],
    bench_path: str,
    out: str,
    *,
    min_tokens: int = 3,
    ngram: int = 3,
    rates: dict[str, float] | None = None,
    pack_budget: int = 512,
    nbuckets: int = 8,
) -> dict:
    """Run (or resume) the full pipeline; returns the summary dict."""
    from spatialjoincountovershells_ray.sources import sinks
    from spatialjoincountovershells_ray.state.checkpoint import CheckpointedRun

    rates = rates or {}
    t0 = time.time()
    summary: dict = {"phases": {}}

    clean = CheckpointedRun(os.path.join(out, "cleaned"))
    for i, shard in enumerate(doc_shards):
        res = clean.run_shard(
            f"{i:05d}", lambda shard=shard: clean_shard(shard, min_tokens), fingerprint=shard
        )
        summary["phases"].setdefault("clean", []).append(
            {"shard": res.shard_id, "rows": res.rows, "skipped": res.skipped}
        )

    with open(clean.manifest_path) as f:
        clean_fp = f.read()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "corpus_curation_job",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "corpus_curation_job.py"),
    )
    ccj = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ccj)
    cleaned_dirs = [clean.shard_dir(f"{i:05d}") for i in range(len(doc_shards))]
    for unit, make in (
        ("decontam", lambda: decontam_droplist(out, bench_path, ngram)),
        ("dedup", lambda: ccj.global_droplist(cleaned_dirs)),
    ):
        run = CheckpointedRun(os.path.join(out, unit))
        res = run.run_shard("droplist", make, fingerprint=clean_fp)
        summary["phases"][unit] = {"dropped": res.rows, "skipped": res.skipped}

    mix_run = CheckpointedRun(os.path.join(out, "mixture"))
    res = mix_run.run_shard(
        "mixed", lambda: mixture_stage(out, rates), fingerprint=clean_fp + json.dumps(rates, sort_keys=True)
    )
    summary["phases"]["mixture"] = {"rows": res.rows, "skipped": res.skipped}

    pack_run = CheckpointedRun(os.path.join(out, "packs"))
    res = pack_run.run_shard(
        "packed", lambda: pack_stage(out, pack_budget), fingerprint=f"{res.rows}:{pack_budget}"
    )
    summary["phases"]["pack"] = {"rows": res.rows, "skipped": res.skipped}

    import ray

    packed = ray.data.read_parquet(os.path.join(out, "packs", "shard=packed"))
    manifest = sinks.write_partitioned(
        packed, os.path.join(out, "serving"), "pack_id", nbuckets=nbuckets
    )
    summary["phases"]["sink"] = {
        "rows": manifest["rows"],
        "buckets": len(manifest["buckets"]),
        "skipped": manifest["skipped"],
    }
    summary["total_sec"] = round(time.time() - t0, 3)
    summary["out"] = out
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--doc-shards", nargs="+", required=True)
    ap.add_argument("--bench", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-tokens", type=int, default=3)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--rates", nargs="*", default=[], help="source=rate pairs")
    ap.add_argument("--pack-budget", type=int, default=512)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"), ignore_reinit_error=True)

    rates = {}
    for kv in args.rates:
        k, v = kv.split("=", 1)
        rates[k] = float(v)
    summary = run_job(
        args.doc_shards,
        args.bench,
        args.out,
        min_tokens=args.min_tokens,
        ngram=args.ngram,
        rates=rates,
        pack_budget=args.pack_budget,
    )
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
