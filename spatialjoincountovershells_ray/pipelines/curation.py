"""Corpus-curation operators: decontamination, scrubbing, splits, packing.

Training-data pipeline stages with no reference counterpart (engine
extensions alongside pipelines/dedup.py and textops.py):

- :func:`decontaminate` — test-set decontamination: flag training
  documents sharing any word n-gram with a (small) benchmark set.
  The benchmark gram table is built distributed, concatenated by a
  remote task from its block refs (never routed through the driver —
  the broadcast-join small-side pattern, pipelines/join.py:210-217)
  and broadcast once; the training side streams. Hash hits are
  re-verified against the exact gram strings (false positives are
  impossible); the benchmark gram table itself dedups on a 128-bit
  two-hash key — exact_dedup's contract class.
- :func:`scrub_blocklist` — C4-style blocklist term scrubbing (the
  same machinery as regex PII redaction: swap the pattern for an
  email/phone RE2 to redact PII; the synthetic corpus is lowercase
  words, so tests exercise a word blocklist to keep the check
  non-vacuous). RE2 on both sides of the gate.
- :func:`hash_split` — deterministic train/val split on a key hash
  (multiply-mod arithmetic shared with relagg.hash_sample): map-only,
  stable under re-runs, retries and incremental loads.
- :func:`pack_sequences` — concat-and-chunk sequence packing: docs in
  doc_id order are laid head-to-tail and cut into fixed token-budget
  packs (the standard "pack then chunk" LM pre-training layout).
  Distributed sort + O(blocks) driver prefix sums + one stamp task
  per block — the global_event_rank plan (pipelines/window.py:138).
- :func:`mixture_sample` — per-domain mixture weighting (the data-mixing
  stage of an LM pre-training recipe): every document is emitted
  floor(r) + Bernoulli(frac(r)) times for its source's rate r, with the
  Bernoulli decided by the same deterministic multiply-mod key hash as
  hash_split — so r < 1 subsamples a domain, r > 1 epoch-upsamples it,
  and re-runs/retries reproduce the exact same mixture. Map-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from spatialjoincountovershells_ray.config import default_pool
from spatialjoincountovershells_ray.functions import text as T
from spatialjoincountovershells_ray.pipelines.relagg import (
    _SAMPLE_A,
    _SAMPLE_B,
    _SAMPLE_M,
    _SAMPLE_MAX_KEY,
)

# ---------------------------------------------------------------------------
# decontamination


def _gram_table(batch: pa.Table, n: int) -> pa.Table:
    """Per-batch distinct (gram hash, gram string) pairs of ``text``.

    Gram strings are the single-space join of the n tokens — exactly
    DuckDB's array_to_string(tokens[i:i+n-1], ' ') — rebuilt from token
    byte spans only for the per-batch distinct set (bounded by the
    batch's vocabulary, not its length). Batch-local dedup keys on TWO
    independent 64-bit gram hashes, so losing a distinct benchmark gram
    string requires a simultaneous 128-bit collision inside one batch —
    the same contract class as exact_dedup's (h1, h2) key; training-side
    hits are string-verified regardless, so false positives cannot occur.
    """
    data, off = T.string_bytes(batch.column("text"))
    tok_start, tlen, row_of, _ = T.token_boundaries(data, off)
    th = T.hash_byte_spans(data, tok_start, tlen)
    gh, gfirst = T.gram_hashes(th, row_of, n)
    if len(gh) == 0:
        return pa.table({"gh": pa.array([], pa.uint64()), "g": pa.array([], pa.string())})
    gh2, _ = T.gram_hashes(th, row_of, n, step=T._GRAM_STEP2)
    pair = np.empty(len(gh), dtype=[("a", "u8"), ("b", "u8")])
    pair["a"], pair["b"] = gh, gh2
    _, uidx = np.unique(pair, return_index=True)
    first = gfirst[uidx]
    strings = [
        b" ".join(
            data[tok_start[i + j] : tok_start[i + j] + tlen[i + j]].tobytes()
            for j in range(n)
        ).decode("utf-8")
        for i in first
    ]
    return pa.table({"gh": pa.array(gh[uidx]), "g": pa.array(strings)})


@ray.remote
def _collect_bench_grams(*parts: pa.Table):
    """Concat + global-distinct the benchmark gram blocks; returns the
    broadcast pack (sorted hash vector + hash → {gram strings} dict)."""
    tbl = pa.concat_tables([p for p in parts if p.num_rows], promote_options="none") \
        if any(p.num_rows for p in parts) else parts[0]
    gh = tbl.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
    gs = tbl.column("g").to_pylist()
    by_hash: dict[int, set] = {}
    for h, s in zip(gh.tolist(), gs):
        by_hash.setdefault(h, set()).add(s)
    return {"hashes": np.unique(gh), "strings": by_hash}


class _ContaminationKernel:
    """Actor-pool stage: per batch, count each doc's distinct benchmark
    grams. The benchmark pack is fetched once per actor (``__init__``)."""

    def __init__(self, ref_list, n: int):
        pack = ray.get(ref_list[0]) if isinstance(ref_list, list) else ref_list
        self.hashes = pack["hashes"]  # sorted uint64
        self.strings = pack["strings"]  # hash -> set of exact gram strings
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        data, off = T.string_bytes(batch.column("text"))
        tok_start, tlen, row_of, _ = T.token_boundaries(data, off)
        th = T.hash_byte_spans(data, tok_start, tlen)
        gh, gfirst = T.gram_hashes(th, row_of, n)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
        )
        if len(gh) == 0 or len(self.hashes) == 0:
            return empty
        pos = np.searchsorted(self.hashes, gh)
        pos[pos == len(self.hashes)] = 0
        cand = np.flatnonzero(self.hashes[pos] == gh)
        if len(cand) == 0:
            return empty
        # exact-string verification of the (rare) hash hits — per-doc
        # distinct by gram STRING, mirroring the SQL count(DISTINCT g)
        doc_ids = batch.column("doc_id").to_numpy()
        hits: dict[int, set] = {}
        for ci in cand.tolist():
            i = int(gfirst[ci])
            g = b" ".join(
                data[tok_start[i + j] : tok_start[i + j] + tlen[i + j]].tobytes()
                for j in range(n)
            ).decode("utf-8")
            if g in self.strings.get(int(gh[ci]), ()):
                hits.setdefault(int(row_of[i]), set()).add(g)
        if not hits:
            return empty
        rows = sorted(hits)
        return pa.table(
            {
                "doc_id": pa.array([int(doc_ids[r]) for r in rows], pa.int64()),
                "n_hits": pa.array([len(hits[r]) for r in rows], pa.int64()),
            }
        )


def decontaminate(
    train: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    n: int = 3,
    *,
    concurrency=None,
) -> "ray.data.Dataset":
    """-> doc_id, n_hits:int64 — training docs sharing ≥1 word n-gram
    with the benchmark set (n_hits = count of DISTINCT shared grams).

    Scale contract: the BENCHMARK side is the small side (an eval suite,
    not a corpus) — its distinct gram table is the broadcast object; the
    training side streams through a stateless actor pool and never
    leaves its shard. Matching is hash-screened (np.searchsorted on one
    sorted uint64 vector) then string-verified, so output equals the
    SQL string-equality twin exactly even under hash collisions.
    """
    gram_blocks = bench.map_batches(
        lambda b: _gram_table(b, n), batch_format="pyarrow", zero_copy_batch=True
    )
    refs = gram_blocks.materialize().to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())})
        )
    pack_ref = _collect_bench_grams.remote(*refs)
    if concurrency is not None:
        # explicit actor pool requested (e.g. to pin resources)
        return train.map_batches(
            _ContaminationKernel,
            fn_constructor_kwargs={"ref_list": [pack_ref], "n": n},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    # task mode + per-worker kernel cache: actor-style amortized setup
    # with no pool-spawn latency and no concurrency cap (see
    # stages/join_kernels.run_cached_bcast)
    from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

    return train.map_batches(
        run_cached_bcast,
        fn_kwargs={
            "cls": _ContaminationKernel,
            "ref_list": [pack_ref],
            "ctor_kwargs": {"n": n},
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# blocklist scrubbing (PII-redaction machinery)


def blocklist_pattern(terms: list[str]) -> str:
    """Word-bounded alternation RE2 — identical semantics in pyarrow and
    DuckDB (both RE2)."""
    return r"\b(" + "|".join(terms) + r")\b"


def scrub_blocklist(
    docs: "ray.data.Dataset", terms: list[str], replacement: str = "<SCRUBBED>"
) -> "ray.data.Dataset":
    """-> doc_id, clean_text, n_scrubbed:int64 — every blocklisted term
    replaced, plus the match count. Map-only; swap the pattern for an
    email/phone RE2 and this is PII redaction."""
    pat = blocklist_pattern(terms)

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": pc.replace_substring_regex(txt, pat, replacement),
                "n_scrubbed": pc.cast(pc.count_substring_regex(txt, pat), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# deterministic stratified split


def hash_split(
    ds: "ray.data.Dataset",
    key: str,
    val_rate: float,
    keep_cols: list[str],
) -> "ray.data.Dataset":
    """-> keep_cols + split:string ('val'/'train') — deterministic hash
    split on an int64 key (multiply-mod arithmetic shared with
    relagg.hash_sample, so the same key always lands on the same side
    across re-runs, retries and incremental loads). Map-only."""
    thresh = np.int64(int(val_rate * _SAMPLE_M))

    def fn(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy()
        if k.size and int(k.max(initial=0)) > _SAMPLE_MAX_KEY:
            raise ValueError(
                f"{key} exceeds {_SAMPLE_MAX_KEY} — k*A+B would wrap int64 "
                "and silently diverge from the SQL twin"
            )
        v = (k.astype(np.int64) * np.int64(_SAMPLE_A) + np.int64(_SAMPLE_B)) % np.int64(
            _SAMPLE_M
        )
        split = np.where(v < thresh, "val", "train")
        cols = {c: batch.column(c) for c in keep_cols}
        cols["split"] = pa.array(split)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def mixture_rate_nums(rates: dict[str, float]) -> dict[str, int]:
    """Rates quantized to integer numerators over ``_SAMPLE_M`` — the
    single quantization both the Ray kernel and the SQL twin consume, so
    the two sides can never disagree on float rounding."""
    return {s: int(round(r * _SAMPLE_M)) for s, r in rates.items()}


def mixture_sample(
    ds: "ray.data.Dataset",
    rates: dict[str, float],
    key: str = "doc_id",
    source_col: str = "source",
    keep_cols: list[str] | None = None,
    default_rate: float = 1.0,
) -> "ray.data.Dataset":
    """-> keep_cols + copy:int64 — deterministic per-domain mixture
    sampling/up-sampling. A row whose source has rate r is emitted
    ``floor(r) + [hash(key) < frac(r)]`` times with copy = 0..n-1; the
    hash is the shared multiply-mod sampler (relagg.hash_sample), so the
    mixture is reproducible under re-runs, retries and incremental
    loads, and E[copies] = r exactly per domain.

    Map-only: the rate table is a handful of (source, rate) entries
    captured in the task closure (bytes, not a broadcast problem); rows
    are expanded with repeat/arange — no shuffle at any scale.
    """
    keep = keep_cols if keep_cols is not None else [key, source_col]
    nums = mixture_rate_nums(rates)
    default_num = int(round(default_rate * _SAMPLE_M))

    def fn(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy()
        if k.size and int(k.max(initial=0)) > _SAMPLE_MAX_KEY:
            raise ValueError(
                f"{key} exceeds {_SAMPLE_MAX_KEY} — k*A+B would wrap int64 "
                "and silently diverge from the SQL twin"
            )
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        uniq = enc.dictionary.to_pylist()
        num_of = np.array([nums.get(s, default_num) for s in uniq], dtype=np.int64)
        num = num_of[enc.indices.to_numpy()] if len(uniq) else np.empty(0, np.int64)
        h = (k.astype(np.int64) * np.int64(_SAMPLE_A) + np.int64(_SAMPLE_B)) % np.int64(
            _SAMPLE_M
        )
        copies = num // _SAMPLE_M + (h < num % _SAMPLE_M)
        total = int(copies.sum())
        rows = np.repeat(np.arange(len(k), dtype=np.int64), copies)
        bounds = np.zeros(len(k) + 1, dtype=np.int64)
        np.cumsum(copies, out=bounds[1:])
        copy = np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1], copies)
        idx = pa.array(rows, pa.int64())
        cols = {c: batch.column(c).take(idx) for c in keep}
        cols["copy"] = pa.array(copy, pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# concat-and-chunk sequence packing


_PACK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("pack_id", pa.int64()),
        ("pack_offset", pa.int64()),
    ]
)


@ray.remote
def _block_token_sum(tbl: pa.Table) -> int:
    # a sort over many-fragment inputs can emit zero-row blocks with an
    # EMPTY schema — treat them as contributing nothing
    if tbl.num_rows == 0:
        return 0
    return int(pc.sum(tbl.column("n_tokens")).as_py() or 0)


@ray.remote
def _stamp_pack(tbl: pa.Table, offset: int, budget: int) -> pa.Table:
    if tbl.num_rows == 0:
        return _PACK_SCHEMA.empty_table()
    nt = tbl.column("n_tokens").to_numpy()
    cum_before = offset + np.cumsum(nt, dtype=np.int64) - nt
    return pa.table(
        {
            "doc_id": tbl.column("doc_id"),
            "n_tokens": tbl.column("n_tokens"),
            "pack_id": pa.array(cum_before // budget, pa.int64()),
            "pack_offset": pa.array(cum_before % budget, pa.int64()),
        }
    )


def pack_sequences(docs: "ray.data.Dataset", budget: int) -> "ray.data.Dataset":
    """-> doc_id, n_tokens, pack_id, pack_offset — concat-and-chunk
    packing: documents in doc_id order laid head-to-tail, cut every
    ``budget`` tokens (pack_id = tokens-before // budget).

    Physical plan: token counts map-side (docs never shipped), one
    distributed range-partitioned sort on doc_id (Ray keeps blocks
    globally ordered), per-block token sums prefix-summed on the driver
    (O(blocks) ints — never rows), one stamp task per block. Same shape
    as window.global_event_rank, so it holds at any scale the sort
    holds."""

    def counts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": T.token_count(batch.column("text")),
            }
        )

    sorted_ds = (
        docs.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds
    sums = ray.get([_block_token_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums[:-1], dtype=np.int64)])
    out = [_stamp_pack.remote(r, int(off), int(budget)) for r, off in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)


@ray.remote
def _shard_nrows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _stamp_shard(tbl: pa.Table, offset: int, nshards: int) -> pa.Table:
    pos = np.arange(offset, offset + tbl.num_rows, dtype=np.int64)
    return pa.table(
        {
            "doc_id": tbl.column("doc_id"),
            "shard": pa.array(pos % np.int64(nshards), pa.int64()),
            "pos": pa.array(pos, pa.int64()),
        }
    )


def shuffle_shards(docs: "ray.data.Dataset", nshards: int = 8) -> "ray.data.Dataset":
    """-> doc_id, shard:int64, pos:int64 — deterministic global shuffle +
    round-robin sharding for training-data serving: documents take the
    total order of mix64(doc_id) (a bijection, so no ties and re-runs /
    retries / incremental loads land every doc at the same position),
    ``pos`` is the global rank in that order, ``shard = pos % nshards``
    (shard sizes equal to within one row, and each shard is itself a
    hash-shuffled subsequence).

    Physical plan is the global_event_rank one: a distributed
    range-partitioned sort on the hash, per-block counts prefix-summed on
    the driver (O(blocks) ints — never rows), one stamp task per block.
    The downstream writer can emit one partition per shard for resumable
    output."""
    from spatialjoincountovershells_ray.functions.hashing import mix64

    def add_hash(batch: pa.Table) -> pa.Table:
        h = mix64(batch.column("doc_id").to_numpy().astype(np.uint64))
        return pa.table(
            {"doc_id": batch.column("doc_id"), "h": pa.array(h, pa.uint64())}
        )

    sorted_ds = (
        docs.select_columns(["doc_id"])
        .map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .sort("h")
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds
    counts = ray.get([_shard_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts[:-1], dtype=np.int64)])
    out = [_stamp_shard.remote(r, int(off), nshards) for r, off in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)
