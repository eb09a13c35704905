"""Decomposable relational aggregates: top-k per group, discrete
quantiles per group, distinct count per group, deterministic hash
sampling.

Engine extensions (no reference counterpart — the reference's only
aggregates are the grouped shell counts, src/astr_rcount/main.c); these
cover the reduce-side surface a training-data pipeline needs. Every op
pre-reduces inside ``map_batches`` (a combiner) so the shuffle carries
partial state bounded by groups x k (top-k), groups x distinct values
(quantile histograms) or groups x distinct members (distinct count) —
never the raw rows. The hash sample is stateless map-only with an
SQL-parity multiply-mod predicate (same contract as
functions.hashing.derive_coord: int64 arithmetic that an ANSI-SQL
oracle evaluates bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

# SQL-parity sampling hash: keep iff (key*A + B) % M < M*rate.
# A odd 32-bit (Knuth), products bounded like derive_coord so numpy's
# silent int64 wraparound can never diverge from the SQL twin.
_SAMPLE_A = 2654435761
_SAMPLE_B = 7
_SAMPLE_M = 1_000_000
_SAMPLE_MAX_KEY = ((1 << 63) - 1 - _SAMPLE_B) // _SAMPLE_A


def sample_hash_sql(key_expr: str, rate: float) -> str:
    """DuckDB-evaluable twin of the :func:`hash_sample` predicate."""
    thresh = int(rate * _SAMPLE_M)
    return f"({key_expr} * {_SAMPLE_A} + {_SAMPLE_B}) % {_SAMPLE_M} < {thresh}"


def hash_sample(
    ds: "ray.data.Dataset", key: str, rate: float, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Deterministic ~``rate`` sample keyed on an int64 column.

    Map-only (no shuffle, no RNG state): the same key always lands on the
    same side of the cut, so re-runs, retries and incremental loads
    sample consistently — the property a 100 TB pipeline needs from its
    sampling stage."""
    thresh = np.int64(int(rate * _SAMPLE_M))

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
        return batch.filter(pa.array(v < thresh))

    if columns is not None:
        ds = ds.select_columns(columns)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _topk_frame(df: pd.DataFrame, group: str, order: str, ident: str, k: int) -> pd.DataFrame:
    """Top-k rows per group by (order DESC, ident ASC) — deterministic."""
    df = df.sort_values([group, order, ident], ascending=[True, False, True], kind="mergesort")
    return df.groupby(group, sort=False).head(k)


def topk_per_group(
    ds: "ray.data.Dataset", group: str, order: str, ident: str, k: int
) -> "ray.data.Dataset":
    """-> group, ident, order, rnk:int64 (1-based) — the k rows with the
    largest ``order`` per group, ties broken by ascending ``ident``.

    Two-stage: each batch keeps only its own top-k per group (the global
    top-k is a subset of the per-batch top-k's — max is decomposable),
    then one groupby over <= k rows per group per batch finishes. The
    exchange moves O(groups x k x batches) rows, not the table."""

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner: sort then keep the first k rows of each
        # group run (no per-batch pandas round-trip on the map side)
        t = batch.select([group, ident, order]).sort_by(
            [(group, "ascending"), (order, "descending"), (ident, "ascending")]
        )
        g = t.column(group).to_numpy(zero_copy_only=False)
        n = len(g)
        if n == 0:
            return t
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        sizes = np.diff(np.concatenate((starts, [n])))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        return t.filter(pa.array(rank < k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = _topk_frame(g, group, order, ident, k)
        g = g.assign(rnk=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[[group, ident, order, "rnk"]]

    return (
        ds.select_columns([group, ident, order])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group)
        .map_groups(final, batch_format="pandas")
    )


def grouped_quantiles_disc(
    ds: "ray.data.Dataset", group: str, value: str, qs: dict[str, float]
) -> "ray.data.Dataset":
    """-> group, <name>:int64 per entry of ``qs`` — exact discrete
    quantiles (DuckDB ``quantile_disc`` semantics: sorted[ceil(q*n)-1]).

    Decomposable histogram plan: batches emit (group, value, n) partial
    counts, the groupby merges histograms and reads the quantile off the
    cumulative counts. Exchange volume is groups x distinct values —
    exact quantiles without shuffling a single raw row. (For unbounded
    float domains you'd bucket values first and accept bucket-width
    error; integer-ish feature columns — lengths, token counts — are the
    common case and stay exact.)"""

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native histogram combiner (rename count_all by NAME —
        # pyarrow has moved key-column position across versions)
        t = (
            batch.select([group, value])
            .group_by([group, value])
            .aggregate([([], "count_all")])
        )
        t = t.rename_columns(["n" if c == "count_all" else c for c in t.column_names])
        return t.select([group, value, "n"])

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value, kind="mergesort")
        vals = g[value].to_numpy()
        cum = g["n"].to_numpy().cumsum()
        total = int(cum[-1])
        out = {group: [g[group].iloc[0]]}
        for name, q in qs.items():
            idx = max(0, int(np.ceil(q * total)) - 1)
            out[name] = [np.int64(vals[np.searchsorted(cum, idx + 1)])]
        return pd.DataFrame(out)

    return (
        ds.select_columns([group, value])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group)
        .map_groups(final, batch_format="pandas")
    )


def grouped_quantiles_cont(
    ds: "ray.data.Dataset", group: str, value: str, qs: dict[str, float]
) -> "ray.data.Dataset":
    """-> group, <name>:float64 per entry of ``qs`` — continuous
    (linearly interpolated) quantiles with DuckDB ``quantile_cont``
    semantics: h = q*(n-1), v[floor(h)] + frac(h)*(v[floor(h)+1]-v[floor(h)]).

    Same decomposable histogram plan as :func:`grouped_quantiles_disc`
    (exchange carries groups x distinct values, never raw rows); only the
    final read-off differs — two cumulative-count probes + one float64
    interpolation, which is bit-identical to DuckDB's because both sides
    run the same IEEE ops in the same order on exact integer inputs."""

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([group, value])
            .group_by([group, value])
            .aggregate([([], "count_all")])
        )
        t = t.rename_columns(["n" if c == "count_all" else c for c in t.column_names])
        return t.select([group, value, "n"])

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value, kind="mergesort")
        vals = g[value].to_numpy()
        cum = g["n"].to_numpy().cumsum()
        total = int(cum[-1])
        out = {group: [g[group].iloc[0]]}
        for name, q in qs.items():
            h = np.float64(q) * np.float64(total - 1)
            lo = int(np.floor(h))
            hi = min(lo + 1, total - 1)
            vlo = np.float64(vals[np.searchsorted(cum, lo + 1)])
            vhi = np.float64(vals[np.searchsorted(cum, hi + 1)])
            # DuckDB's exact op order: lo*(1-d) + hi*d (NOT lo+d*(hi-lo) —
            # the two differ by 1 ulp on ~5% of inputs and the driver
            # hashes raw float bits). Keep q literals short in the SQL
            # twin: DuckDB casts DECIMAL q to double as mantissa/10^scale,
            # which diverges from the parsed double past 2^53.
            frac = h - np.float64(lo)
            out[name] = [vlo * (np.float64(1.0) - frac) + vhi * frac]
        return pd.DataFrame(out)

    return (
        ds.select_columns([group, value])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group)
        .map_groups(final, batch_format="pandas")
    )


def filter_above_group_quantile(
    ds: "ray.data.Dataset",
    group: str,
    value: str,
    q: float,
    keep_cols: list[str],
) -> "ray.data.Dataset":
    """Keep rows whose ``value`` exceeds their group's q-th discrete
    quantile — the two-pass percentile curation filter (e.g. "only docs
    longer than their source's p90").

    Pass 1 computes per-group thresholds with the decomposable histogram
    plan (O(groups) rows out); pass 2 broadcast-joins the tiny threshold
    table onto the streaming rows and filters map-side. Composes two
    existing operators; no new exchange machinery."""
    import pyarrow.compute as pc

    from spatialjoincountovershells_ray.pipelines.join import equi_join

    th = grouped_quantiles_disc(ds.select_columns([group, value]), group, value, {"__th": q})
    joined = equi_join(ds, th, group, group, mode="broadcast")

    def filt(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column(value), batch.column("__th"))
        return batch.filter(keep).select(keep_cols)

    return joined.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def distinct_count_per_group(
    ds: "ray.data.Dataset", group: str, member: str, keyed: bool = False
) -> "ray.data.Dataset":
    """-> group, n_distinct:int64 — exact COUNT(DISTINCT member) per group.

    Batches pre-dedup their own (group, member) pairs, so the exchange
    carries at most one row per pair per batch; the groupby counts
    uniques across batches. Pass ``keyed=True`` when ``group`` is an
    UNBOUNDED int64 key: the finish becomes a hash-bucket exchange + one
    vectorized pass per bucket instead of a per-group callback. For
    member cardinalities too large for one reducer, hash-partition on
    (group, member) first and sum partial distinct counts — same
    two-level shape, one more exchange."""

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select([group, member]).group_by([group, member]).aggregate([])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    if keyed:
        # unbounded int64 group key (e.g. user_id): hash-bucket exchange +
        # ONE dictionary-encode/lexsort/run-length pass per bucket instead
        # of a per-group pandas callback (the round-4 vectorized-finish
        # contract; groups are whole inside a bucket)
        from spatialjoincountovershells_ray.pipelines.window import (
            keyed_partition_apply,
        )

        def kernel(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0 or tbl.num_columns == 0:
                return pa.table(
                    {
                        group: pa.array([], pa.int64()),
                        "n_distinct": pa.array([], pa.int64()),
                    }
                )
            g = tbl.column(group).to_numpy()
            mcol = tbl.column(member)
            if isinstance(mcol, pa.ChunkedArray):
                mcol = mcol.combine_chunks()
            codes = pc.dictionary_encode(mcol).indices.to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            order = np.lexsort((codes, g))
            gs, cs = g[order], codes[order]
            uniq = np.r_[True, (gs[1:] != gs[:-1]) | (cs[1:] != cs[:-1])]
            gs = gs[uniq]
            starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
            runlen = np.diff(np.r_[starts, len(gs)])
            return pa.table(
                {
                    group: pa.array(gs[starts], pa.int64()),
                    "n_distinct": pa.array(runlen.astype(np.int64), pa.int64()),
                }
            )

        return keyed_partition_apply(parts, group, kernel)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {group: [g[group].iloc[0]], "n_distinct": [np.int64(g[member].nunique())]}
        )

    return parts.groupby(group).map_groups(final, batch_format="pandas")


def daily_active_users(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> day:string (YYYY-MM-DD), n_users:int64 — exact DAU."""

    def to_day(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
                "user_id": batch.column("user_id"),
            }
        )

    days = events.select_columns(["ts", "user_id"]).map_batches(
        to_day, batch_format="pyarrow", zero_copy_batch=True
    )
    out = distinct_count_per_group(days, "day", "user_id")
    # driver-canonical column name
    return out.map_batches(
        lambda b: b.rename_columns(["day", "n_users"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def mode_per_group(
    ds: "ray.data.Dataset",
    group: str,
    value: str,
    out_col: str = "top_value",
    keyed: bool = False,
) -> "ray.data.Dataset":
    """-> group, out_col, n:int64 — the most frequent ``value`` per group
    (ties to the smallest value), with its count.

    Decomposable argmax aggregation: each batch pre-counts its own
    (group, value) pairs (Arrow group_by combiner), so the exchange
    carries O(groups x distinct values) partial triples, never raw rows;
    the per-group reducer sums partials and takes the (count DESC,
    value ASC) winner — the exact tie-break the SQL twin's row_number
    ORDER BY uses."""

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([group, value])
            .group_by([group, value])
            .aggregate([([], "count_all")])
        )
        # rename by NAME (pyarrow has moved key-column position across
        # versions; a positional rename would silently relabel)
        return t.rename_columns(
            ["cnt" if n == "count_all" else n for n in t.column_names]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    if keyed:
        # unbounded int64 group key: one bucket kernel — value strings
        # fold to LEXICOGRAPHICALLY-ORDERED codes (sort the per-bucket
        # dictionary, remap), partial counts merge with one lexsort +
        # reduceat, and the (count DESC, value ASC) winner per group is
        # the first row after a second lexsort. No per-group callbacks.
        from spatialjoincountovershells_ray.pipelines.window import (
            keyed_partition_apply,
        )

        def kernel(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0 or tbl.num_columns == 0:
                return pa.table(
                    {
                        group: pa.array([], pa.int64()),
                        out_col: pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            g = tbl.column(group).to_numpy()
            cnt = tbl.column("cnt").to_numpy()
            vcol = tbl.column(value)
            if isinstance(vcol, pa.ChunkedArray):
                vcol = vcol.combine_chunks()
            enc = pc.dictionary_encode(vcol)
            raw = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dic = enc.dictionary
            sidx = pc.sort_indices(dic).to_numpy(zero_copy_only=False).astype(np.int64)
            rank_of = np.empty(len(dic), np.int64)
            rank_of[sidx] = np.arange(len(dic), dtype=np.int64)
            sorted_dic = dic.take(pa.array(sidx, pa.int64()))  # rank -> string
            code = rank_of[raw]
            # merge partial counts per (group, code)
            o = np.lexsort((code, g))
            gs, cs, ns = g[o], code[o], cnt[o]
            starts = np.flatnonzero(np.r_[True, (gs[1:] != gs[:-1]) | (cs[1:] != cs[:-1])])
            gs, cs = gs[starts], cs[starts]
            ns = np.add.reduceat(ns, starts)
            # winner per group: count DESC then code ASC (== value ASC)
            o2 = np.lexsort((cs, -ns, gs))
            gw, cw, nw = gs[o2], cs[o2], ns[o2]
            first = np.flatnonzero(np.r_[True, gw[1:] != gw[:-1]])
            return pa.table(
                {
                    group: pa.array(gw[first], pa.int64()),
                    out_col: sorted_dic.take(pa.array(cw[first], pa.int64())),
                    "n": pa.array(nw[first], pa.int64()),
                }
            )

        return keyed_partition_apply(parts, group, kernel)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(value, sort=False)["cnt"].sum()
        s = s.sort_index(kind="mergesort")  # value ASC for the tie-break
        best = s.idxmax()  # first max after the stable sort
        return pd.DataFrame(
            {
                group: [g[group].iloc[0]],
                out_col: [best],
                "n": [np.int64(s.loc[best])],
            }
        )

    return parts.groupby(group).map_groups(final, batch_format="pandas")


def _hll_bucket_rho(k: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per key: bucket = low p bits of mix64(key), rho =
    leading-zero rank of the remaining 64-p bits, via an exact vectorized
    bit_length (no float round-trip: 2^53+ values would round across a
    power of two and mis-rank)."""
    from spatialjoincountovershells_ray.functions.hashing import mix64

    m = 1 << p
    h = mix64(k.astype(np.uint64))
    bucket = (h & np.uint64(m - 1)).astype(np.int64)
    r = h >> np.uint64(p)
    blen = np.zeros(len(r), np.uint64)
    v = r.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        blen[big] += np.uint64(s)
        v[big] >>= np.uint64(s)
    blen += (v > 0).astype(np.uint64)
    rho = np.int64(64 - p + 1) - blen.astype(np.int64)
    return bucket, rho


def hll_registers(ds: "ray.data.Dataset", key: str, p: int = 8) -> "ray.data.Dataset":
    """-> bucket:int64, rho_max:int64 — the HyperLogLog register table
    over ``key`` (bucket = low p bits of mix64(key), rho = leading-zero
    rank of the remaining 64-p bits; only hit buckets emitted).

    This is THE scale path for distinct counts: the exchange carries at
    most 2^p rows per batch and the result is 2^p rows total, vs the
    per-key shuffle an exact COUNT(DISTINCT) needs. The register table —
    not the float estimate — is the query output, so the correctness
    gate stays bit-exact (mix64 has a HUGEINT SQL twin and DuckDB's
    bin() gives exact bit lengths); the estimator lives in the caller
    (see tests/test_curation.py for the alpha_m / linear-counting
    variant) where float summation order is under its control.
    """
    from spatialjoincountovershells_ray.functions.hashing import mix64

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        bucket, rho = _hll_bucket_rho(batch.column(key).to_numpy(), p)
        regs = np.zeros(m, np.int64)
        np.maximum.at(regs, bucket, rho)
        hit = np.flatnonzero(regs)
        return pa.table(
            {"bucket": pa.array(hit, pa.int64()), "rho": pa.array(regs[hit], pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .max("rho")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "rho_max": batch.column("max(rho)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def hll_estimate(registers: "pd.DataFrame", p: int = 8) -> float:
    """Standard HLL estimate from a (bucket, rho_max) register table:
    alpha_m * m^2 / sum(2^-M_j) with the small-range linear-counting
    correction. Registers summed in bucket order — deterministic."""
    m = 1 << p
    regs = np.zeros(m, np.float64)
    regs[registers["bucket"].to_numpy()] = registers["rho_max"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# Count-Min sketch: depth independent hash rows derived from one mix64
# avalanche of (key + salt_j) mod 2^64. Salts are arbitrary fixed odd
# constants; they only need to be distinct (and reproducible in the
# HUGEINT SQL twin, which mirrors the addition and the mix chain).
CMS_SALTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5)


def cms_counters(
    ds: "ray.data.Dataset", key: str, depth: int = 4, width: int = 512
) -> "ray.data.Dataset":
    """-> depth:int64, bucket:int64, cnt:int64 — the Count-Min sketch
    counter table over ``key`` (bucket_j = mix64(key + salt_j) % width).

    The frequency sibling of :func:`hll_registers`: point-frequency
    estimates (heavy hitters, skew detection for salting decisions) in
    O(depth * width) state instead of a per-key exact-count shuffle. The
    combiner pre-reduces each batch into the dense depth x width grid,
    so the exchange carries at most depth*width partial rows per task
    regardless of row count, and the merged output is <= depth*width
    rows total. As with HLL, the gated query output is the counter
    TABLE (bit-exact vs a HUGEINT splitmix64 SQL twin); the min-over-
    depths estimator lives in :func:`cms_estimate` where callers control
    it (overestimate-only property tested in tests/test_relagg.py)."""
    from spatialjoincountovershells_ray.functions.combine import packed_counts
    from spatialjoincountovershells_ray.functions.hashing import mix64

    if depth > len(CMS_SALTS):
        raise ValueError(f"depth <= {len(CMS_SALTS)} (one salt per hash row)")
    salts = np.array(CMS_SALTS[:depth], np.uint64)
    w = np.uint64(width)

    def pack(batch: pa.Table) -> np.ndarray:
        k = batch.column(key).to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            # (n, depth) buckets; pack as depth*width + bucket (>= 0)
            h = mix64((k[:, None] + salts[None, :]).ravel())
        bucket = h % w
        j = np.tile(np.arange(depth, dtype=np.int64), k.size)
        return j * np.int64(width) + bucket.astype(np.int64)

    def unpack(keys: np.ndarray, counts: "pa.ChunkedArray") -> pa.Table:
        return pa.table(
            {
                "depth": pa.array(keys // np.int64(width), pa.int64()),
                "bucket": pa.array(keys % np.int64(width), pa.int64()),
                "cnt": counts.cast(pa.int64()),
            }
        )

    return packed_counts(ds, pack, unpack)


def cms_estimate(counters: "pd.DataFrame", keys: np.ndarray, depth: int = 4, width: int = 512) -> np.ndarray:
    """Point-frequency estimates (min over depth rows) for int64 ``keys``
    from a :func:`cms_counters` table. Never underestimates."""
    from spatialjoincountovershells_ray.functions.hashing import mix64

    grid = np.zeros((depth, width), np.int64)
    grid[counters["depth"].to_numpy(), counters["bucket"].to_numpy()] = counters[
        "cnt"
    ].to_numpy()
    salts = np.array(CMS_SALTS[:depth], np.uint64)
    k = np.asarray(keys, np.uint64)
    with np.errstate(over="ignore"):
        h = mix64((k[:, None] + salts[None, :]).ravel()).reshape(k.size, depth)
    bucket = (h % np.uint64(width)).astype(np.int64)
    ests = grid[np.arange(depth)[None, :], bucket]
    return ests.min(axis=1)


def stratified_sample(
    ds: "ray.data.Dataset", group: str, ident: str, k: int, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Deterministic fixed-size sample: the ``k`` rows per ``group`` with
    the smallest mix64(``ident``) — every group is represented by exactly
    min(k, |group|) rows regardless of group skew (the property a
    train/eval split curator needs that :func:`hash_sample`'s fixed RATE
    cannot give). Same decomposable two-stage shape as
    :func:`topk_per_group`: min-by-hash is a combiner, so each batch
    forwards at most k rows per group and the exchange never carries the
    table. Deterministic across re-runs, retries and incremental loads;
    hash order (uint64 ascending) is mirrored bit-exact by the HUGEINT
    splitmix64 SQL twin."""
    from spatialjoincountovershells_ray.functions.hashing import mix64

    if columns is not None:
        ds = ds.select_columns(columns)
    h = "__h"

    def partial(batch: pa.Table) -> pa.Table:
        hv = mix64(batch.column(ident).to_numpy().astype(np.uint64))
        t = batch.append_column(h, pa.array(hv, pa.uint64())).sort_by(
            [(group, "ascending"), (h, "ascending")]
        )
        g = t.column(group).to_numpy(zero_copy_only=False)
        n = len(g)
        if n == 0:
            return t
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        sizes = np.diff(np.concatenate((starts, [n])))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        return t.filter(pa.array(rank < k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(h, kind="mergesort").head(k)
        g = g.assign(rnk=np.arange(1, len(g) + 1, dtype=np.int64))
        return g.drop(columns=[h])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group)
        .map_groups(final, batch_format="pandas")
    )


def weighted_sample(
    ds: "ray.data.Dataset",
    ident: str,
    weight: str,
    k: int,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """-> columns + rnk:int64 — deterministic weighted sample WITHOUT
    replacement of k rows (Efraimidis–Spirakis A-ES): each row draws
    u = (mix64(ident)+1) / 2^64 from its identity hash and is ranked by
    key = u^(1/w); the k largest keys win, so inclusion probability is
    proportional to weight in the exact A-ES sense while staying
    reproducible under re-runs, retries and incremental loads (the same
    contract as hash_sample / stratified_sample, extended to weights).

    Decomposable: key ranking is a max-combiner, so each batch forwards
    only its own top k rows and the final exact selection sorts
    O(batches x k) rows in one task. Rows with weight <= 0 are excluded
    (their A-ES key is 0). Float keys are deterministic — every replica
    computes the same IEEE expression from the same integers — and the
    pytest oracle replays them bit-for-bit."""
    from spatialjoincountovershells_ray.functions.hashing import mix64

    if columns is not None:
        ds = ds.select_columns(sorted({*columns, ident, weight}))
    kcol = "__aes"

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(ident).to_numpy()
        w = batch.column(weight).to_numpy().astype(np.float64)
        u = (mix64(ids.astype(np.uint64)).astype(np.float64) + 1.0) / 2.0**64
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)), 0.0)
        t = batch.append_column(kcol, pa.array(key, pa.float64()))
        if t.num_rows <= k:
            return t.filter(pa.array(key > 0))
        cut = np.partition(key, len(key) - k)[len(key) - k]
        keep = key >= cut  # ties kept; exact top-k resolved in the final
        return t.filter(pa.array(keep & (key > 0)))

    def final(batch: pa.Table) -> pa.Table:
        key = batch.column(kcol).to_numpy()
        ids = batch.column(ident).to_numpy()
        order = np.lexsort((ids, -key))[:k]  # key desc, ident asc tiebreak
        out = batch.take(pa.array(order)).drop_columns([kcol])
        return out.append_column(
            "rnk", pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64())
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    )


def rollup_counts(
    ds: "ray.data.Dataset", cols: list[str], sentinel: str = "(all)"
) -> "ray.data.Dataset":
    """GROUP BY ROLLUP(``cols``) row counts over string columns: one row
    per finest group plus every prefix level, rolled columns replaced by
    ``sentinel`` (the COALESCE'd shape of SQL's ROLLUP — exact as long as
    the data itself never contains the sentinel).

    Plan: the finest level is an ordinary decomposable count (per-batch
    Arrow group_by, composite \\x1f-packed key, one groupby-sum exchange
    of O(distinct keys) partials); the coarser levels are then derived
    from that ALREADY-AGGREGATED table, which is O(product of
    cardinalities) rows — tiny by the time a rollup is meaningful — so a
    single repartition(1) expansion task is the right plan even at
    100 TB of input rows (the input never re-flows; only the aggregate
    does)."""
    sep = "\x1f"

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
        key = pc.binary_join_element_wise(*[t.column(c).cast(pa.string()) for c in cols], sep)
        return pa.table({"k": key, "n": t.column("count_all").cast(pa.int64())})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .sum("n")
    )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ncol = "sum(n)" if "sum(n)" in df.columns else "n"
        parts = df["k"].str.split(sep, expand=True)
        parts.columns = cols
        base = parts.assign(n=df[ncol].to_numpy(np.int64))
        levels = [base]
        for lvl in range(len(cols) - 1, -1, -1):
            keep = cols[:lvl]
            g = (
                base.groupby(keep, sort=False, as_index=False)["n"].sum()
                if keep
                else pd.DataFrame({"n": [int(base["n"].sum())]})
            )
            for c in cols[lvl:]:
                g[c] = sentinel
            levels.append(g[cols + ["n"]])
        return pd.concat(levels, ignore_index=True)

    return merged.repartition(1).map_batches(
        expand, batch_format="pandas", batch_size=None, zero_copy_batch=True
    )


def hll_registers_grouped(
    ds: "ray.data.Dataset", key: str, group: str, p: int = 8
) -> "ray.data.Dataset":
    """-> group, bucket:int64, rho_max:int64 — one HLL register table PER
    GROUP (the sketched COUNT(DISTINCT key) GROUP BY group: at 100 TB the
    exact per-(group,key) shuffle that daily_active_users does is the
    bottleneck; this exchange carries at most groups x 2^p register rows
    per batch instead). Same bit-exact contract as :func:`hll_registers`:
    the register table is the gated output; feed each group's rows to
    :func:`hll_estimate` for the float estimate."""

    def partial(batch: pa.Table) -> pa.Table:
        bucket, rho = _hll_bucket_rho(batch.column(key).to_numpy(), p)
        t = pa.table(
            {
                group: batch.column(group),
                "bucket": pa.array(bucket, pa.int64()),
                "rho": pa.array(rho, pa.int64()),
            }
        )
        part = t.group_by([group, "bucket"]).aggregate([("rho", "max")])
        return part.rename_columns([group, "bucket", "rho"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group, "bucket"])
        .max("rho")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                group: batch.column(group),
                "bucket": batch.column("bucket").cast(pa.int64()),
                "rho_max": batch.column("max(rho)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def pearson_corr_scaled(
    ds: "ray.data.Dataset", x: str, y: str, x_scale: int, y_scale: int
) -> "ray.data.Dataset":
    """-> n:int64, sx:int64, sy:int64, sxy:int64, sxx:int64, syy:int64,
    corr:float64 — exact distributed Pearson correlation of two
    FIXED-POINT columns (x*x_scale and y*y_scale must be integral, e.g.
    prices in cents, discounts in percent).

    The five moments are decomposable INTEGER sums: each batch reduces to
    one 6-int row, a log-free single groupby-free tree (Dataset.sum)
    merges them, and the final float expression
    (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))
    runs once on exact integers — so the result is bit-identical to any
    oracle that evaluates the same expression on the same integer totals,
    with no float-summation-order dependence anywhere. The caller owns
    the no-overflow contract: |x*scale| * |y*scale| * rows must fit
    int64 (asserted per batch)."""

    def partial(batch: pa.Table) -> pa.Table:
        xv = np.rint(batch.column(x).to_numpy() * x_scale).astype(np.int64)
        yv = np.rint(batch.column(y).to_numpy() * y_scale).astype(np.int64)
        mx, my = int(np.abs(xv).max(initial=0)), int(np.abs(yv).max(initial=0))
        # per-batch headroom guard (the merged totals are the caller's
        # documented contract; this catches the egregious case loudly)
        if mx and my and mx * my > (1 << 62) // max(1, len(xv)):
            raise ValueError("x*y products too large for exact int64 moments")
        return pa.table(
            {
                "n": pa.array([len(xv)], pa.int64()),
                "sx": pa.array([int(xv.sum())], pa.int64()),
                "sy": pa.array([int(yv.sum())], pa.int64()),
                "sxy": pa.array([int((xv * yv).sum())], pa.int64()),
                "sxx": pa.array([int((xv * xv).sum())], pa.int64()),
                "syy": pa.array([int((yv * yv).sum())], pa.int64()),
            }
        )

    parts = ds.select_columns([x, y]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # six scalars per batch: the driver-side fold is O(batches) ints
    tot = parts.to_pandas().sum()
    n, sx, sy = int(tot["n"]), int(tot["sx"]), int(tot["sy"])
    sxy, sxx, syy = int(tot["sxy"]), int(tot["sxx"]), int(tot["syy"])
    corr = (float(n) * float(sxy) - float(sx) * float(sy)) / (
        np.sqrt(float(n) * float(sxx) - float(sx) * float(sx))
        * np.sqrt(float(n) * float(syy) - float(sy) * float(sy))
    )
    import pandas as pd

    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "n": [np.int64(n)],
                "sx": [np.int64(sx)],
                "sy": [np.int64(sy)],
                "sxy": [np.int64(sxy)],
                "sxx": [np.int64(sxx)],
                "syy": [np.int64(syy)],
                "corr": [np.float64(corr)],
            }
        )
    )


def _int_moments(ds: "ray.data.Dataset", col: str, scale: int) -> "tuple[int, int, int]":
    """(n, sum, sum-of-squares) of round(col*scale) as EXACT int64 — one
    streaming pass, one 3-int row per batch, driver folds O(batches)
    scalars. Shared by the z-score filter (and any two-pass moment op)."""

    def partial(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column(col).to_numpy() * scale).astype(np.int64)
        if len(c) and int(np.abs(c).max()) ** 2 > (1 << 62) // max(1, len(c)):
            raise ValueError("col*scale too large for exact int64 moments")
        return pa.table(
            {
                "n": pa.array([len(c)], pa.int64()),
                "s": pa.array([int(c.sum())], pa.int64()),
                "ss": pa.array([int((c * c).sum())], pa.int64()),
            }
        )

    tot = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sum()
    )
    return int(tot["n"]), int(tot["s"]), int(tot["ss"])


def zscore_outliers(
    ds: "ray.data.Dataset", key: str, col: str, scale: int, z: float = 3.0
) -> "ray.data.Dataset":
    """-> key, col — the rows whose fixed-point value deviates from the
    global mean by more than z standard deviations (population sd).

    Two streaming passes: pass 1 reduces to three exact int64 moments
    (no float-summation-order dependence — see _int_moments); the
    mean/threshold doubles derive from those exact integers with the
    same elementary IEEE expressions the SQL twin spells out
    ((c-mu)^2 > z^2*(ss/n - mu^2)), so the filter decisions are
    bit-identical. Pass 2 is an ordinary vectorized filter — nothing is
    broadcast but three scalars in the closure."""
    n, s, ss = _int_moments(ds, col, scale)
    mu = float(s) / float(n)
    thr = (z * z) * (float(ss) / float(n) - mu * mu)

    def flt(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy()
        c = np.rint(v * scale)  # float64, same rounding the moment pass used
        d = c - mu
        keep = d * d > thr
        return pa.table(
            {key: batch.column(key).filter(pa.array(keep)), col: pa.array(v[keep], pa.float64())}
        )

    return (
        ds.select_columns([key, col])
        .map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key)
    )


def histogram_fixed(ds: "ray.data.Dataset", col: str, width: float) -> "ray.data.Dataset":
    """-> bin:int64, lo:double, n:int64 — fixed-width histogram of col
    (bin = floor(col/width); lo = bin*width, both the same IEEE double
    ops the SQL twin runs). Per-batch combiner first: the exchange
    carries O(occupied bins) per batch, never rows."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy()
        b = np.floor(v / width).astype(np.int64)
        bins, counts = np.unique(b, return_counts=True)
        return pa.table(
            {"bin": pa.array(bins, pa.int64()), "n": pa.array(counts, pa.int64())}
        )

    agg = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .sum("n")
    )

    def final(batch: pa.Table) -> pa.Table:
        b = batch.column("bin").to_numpy()
        return pa.table(
            {
                "bin": pa.array(b, pa.int64()),
                "lo": pa.array(b.astype(np.float64) * width, pa.float64()),
                "n": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True).sort("bin")


def running_total_cents(
    ds: "ray.data.Dataset", key: str, order_cols: "list[str]", val: str
) -> "ray.data.Dataset":
    """-> key, order_cols[-1], total_cents:int64 — per-key running total
    of round(val*100) in order_cols order (the classic cumulative-spend
    window). Fixed-point int64 cumsum: exact and independent of how the
    oracle's window aggregator trees its additions — a double running
    sum would only match an oracle that adds strictly left-to-right.

    A keyed bucket exchange co-locates each key's rows (the same
    keyed_partition_apply plan the window ops use — work scales with
    buckets, never group count), then ONE vectorized lexsort + segmented
    cumsum per bucket handles every group in it: cumsum over the sorted
    bucket minus each group's starting offset. Output carries the key
    and the (unique) last order column so rows are globally
    identifiable."""
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    last = order_cols[-1]

    def kernel(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy()
        oc = [tbl.column(c).to_numpy() for c in order_cols]
        c = np.rint(tbl.column(val).to_numpy() * 100).astype(np.int64)
        order = np.lexsort((*reversed(oc), k))
        ks, cs = k[order], np.cumsum(c[order])
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]]) if len(ks) else np.array([], np.int64)
        runlen = np.diff(np.r_[starts, len(ks)]) if len(ks) else np.array([], np.int64)
        base = np.where(starts > 0, cs[starts - 1], 0) if len(ks) else cs
        return pa.table(
            {
                key: pa.array(ks, pa.int64()),
                last: pa.array(oc[-1][order] if order_cols else ks),
                "total_cents": pa.array(cs - np.repeat(base, runlen), pa.int64()),
            }
        )

    return keyed_partition_apply(
        ds.select_columns(list(dict.fromkeys([key, *order_cols, val]))), key, kernel
    ).sort([key, last])


def pivot_counts(
    ds: "ray.data.Dataset", key: str, col: str, values: "list[str]"
) -> "ray.data.Dataset":
    """-> key, n_<v1>, ..., n_<vk>, n_total (all int64) — the PIVOT /
    conditional-aggregation table: per key, one count column per
    enumerated value of col (values outside the list land only in
    n_total). Each batch folds to one row per (batch, key) with the
    pivot already applied, so the exchange is O(keys x batches) narrow
    int rows and the value strings never leave their batch."""
    names = [f"n_{v.lower()}" for v in values]

    def partial(batch: pa.Table) -> pa.Table:
        kv = batch.column(key)
        cv = batch.column(col)
        cols = {key: kv}
        for v, name in zip(values, names):
            cols[name] = pc.equal(cv, v).cast(pa.int64())
        cols["n_total"] = pa.array(np.ones(batch.num_rows, np.int64))
        t = pa.table(cols)
        g = t.group_by(key).aggregate([(n, "sum") for n in [*names, "n_total"]])
        return g.rename_columns([key, *names, "n_total"])

    agg = (
        ds.select_columns([key, col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .sum([*names, "n_total"])
    )

    def final(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key)}
        for n in [*names, "n_total"]:
            cols[n] = batch.column(f"sum({n})").cast(pa.int64())
        return pa.table(cols)

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True).sort(key)


def grouped_slope_fixed(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    val_col: str,
    x0_s: int,
    val_scale: int = 100,
) -> "ray.data.Dataset":
    """-> key, n:int64, slope:float64 — per-group least-squares slope of
    the fixed-point value over time (the "is this user trending up"
    regression), from EXACT per-group integer moments.

    x = epoch seconds rebased to the documented x0_s origin (keeps x*x
    and x*y inside int64 — the caller owns the span/scale contract the
    same way pearson_corr_scaled does); y = round(val*val_scale). Each
    batch folds to one 6-int row per (batch, group) via one sort +
    reduceat pass; the merged exact integers feed ONE float expression
    (n*sxy - sx*sy)/(n*sxx - sx^2) mirrored verbatim in the SQL twin —
    no float-summation-order dependence anywhere."""

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy()
        x = (
            batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            // 1_000_000
            - x0_s
        )
        y = np.rint(batch.column(val_col).to_numpy() * val_scale).astype(np.int64)
        order = np.argsort(k, kind="stable")
        ks, xs, ys = k[order], x[order], y[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]]) if len(ks) else np.array([], np.int64)
        ends = np.r_[starts, len(ks)]
        return pa.table(
            {
                key: pa.array(ks[starts], pa.int64()),
                "n": pa.array(np.diff(ends), pa.int64()),
                "sx": pa.array(np.add.reduceat(xs, starts) if len(starts) else [], pa.int64()),
                "sy": pa.array(np.add.reduceat(ys, starts) if len(starts) else [], pa.int64()),
                "sxy": pa.array(np.add.reduceat(xs * ys, starts) if len(starts) else [], pa.int64()),
                "sxx": pa.array(np.add.reduceat(xs * xs, starts) if len(starts) else [], pa.int64()),
            }
        )

    agg = (
        ds.select_columns([key, ts_col, val_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .sum(["n", "sx", "sy", "sxy", "sxx"])
    )

    def final(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n)").to_numpy().astype(np.float64)
        sx = batch.column("sum(sx)").to_numpy().astype(np.float64)
        sy = batch.column("sum(sy)").to_numpy().astype(np.float64)
        sxy = batch.column("sum(sxy)").to_numpy().astype(np.float64)
        sxx = batch.column("sum(sxx)").to_numpy().astype(np.float64)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return pa.table(
            {
                key: batch.column(key),
                "n": batch.column("sum(n)").cast(pa.int64()),
                "slope": pa.array(slope, pa.float64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True).sort(key)


def table_checksum(
    ds: "ray.data.Dataset", key: str, val: str, val_scale: int = 100
) -> "ray.data.Dataset":
    """-> n:int64, checksum:int64 — an order-independent content
    fingerprint of (key, round(val*val_scale)) rows: per row
    h = mix64(mix64(key) XOR cents), summed mod 2^64. The
    migration-validation primitive: two copies of a table match iff
    (n, checksum) match, regardless of row order, partitioning or
    blocking (the sum is commutative and exact in uint64 wraparound).

    Each batch folds to one (n, partial-checksum) row; the driver sums
    O(batches) Python ints mod 2^64. The SQL twin replays the identical
    splitmix64 rounds in HUGEINT 32-bit limbs, so the fingerprint is
    value-hash checkable, not just self-consistent."""
    from spatialjoincountovershells_ray.functions.hashing import mix64

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy().astype(np.uint64)
        c = np.rint(batch.column(val).to_numpy() * val_scale).astype(np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = mix64(mix64(k) ^ c)
            chk = int(h.sum(dtype=np.uint64))
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "chk": pa.array([np.uint64(chk).astype(np.int64)], pa.int64()),
            }
        )

    parts = (
        ds.select_columns([key, val])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    n = int(parts["n"].sum())
    total = sum(int(x) & 0xFFFFFFFFFFFFFFFF for x in parts["chk"]) % (1 << 64)
    signed = total - (1 << 64) if total >= (1 << 63) else total
    return ray.data.from_arrow(
        pa.table({"n": pa.array([n], pa.int64()), "checksum": pa.array([signed], pa.int64())})
    )


# ---------------------------------------------------------------------------
# robust (median/MAD) outliers — all-integer, no float anywhere


@ray.remote
def _merge_hists(*tbls: pa.Table) -> pa.Table:
    """Merge (c, n) count-histogram partials: concat, sort, reduceat."""
    live = [t for t in tbls if t.num_rows and t.num_columns]
    if not live:
        return pa.table({"c": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    t = pa.concat_tables(live, promote_options="none")
    c = t.column("c").to_numpy()
    n = t.column("n").to_numpy()
    o = np.argsort(c, kind="stable")
    c, n = c[o], n[o]
    s = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    return pa.table(
        {
            "c": pa.array(c[s], pa.int64()),
            "n": pa.array(np.add.reduceat(n, s), pa.int64()),
        }
    )


def _median2_from_hist(vals: np.ndarray, cnts: np.ndarray) -> int:
    """2x the quantile_cont(0.5) median of a sorted value histogram —
    always an exact integer (odd n: 2*v[m]; even n: v[m-1]+v[m], which
    equals 2*((a+b)/2) bit-for-bit in IEEE because /2 and *2 are exact)."""
    cum = cnts.cumsum()
    total = int(cum[-1])
    if total % 2:
        return 2 * int(vals[np.searchsorted(cum, total // 2 + 1)])
    a = int(vals[np.searchsorted(cum, total // 2)])
    b = int(vals[np.searchsorted(cum, total // 2 + 1)])
    return a + b


def mad_outliers(
    ds: "ray.data.Dataset", key: str, col: str, scale: int = 100, c: int = 3
) -> "ray.data.Dataset":
    """-> key, cents:int64, robust_outlier:int64 (every row) — flags rows
    whose deviation from the global median exceeds ``c`` times the MAD
    (median absolute deviation): the robust sibling of zscore_outliers,
    immune to the outliers it hunts.

    EVERY quantity is an integer: med2 = 2*median(cents),
    d2 = |2*cents - med2|, md2 = 2*median(d2), and the flag is
    ``2*d2 > c*md2`` (equivalent to |x-med| > c*MAD after clearing the
    /2 and /4 denominators) — so there is no float to diverge from the
    SQL twin under any summation order. One histogram pass (per-batch
    (cents, count) combiners, O(distinct values) exchange) yields the
    cents histogram; the d2 histogram is a pure driver TRANSFORM of it
    (|2v - med2| with counts re-merged, O(distinct) — no second scan);
    pass 2 is a stateless flag map with two broadcast scalars."""

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(col).to_numpy() * scale).astype(np.int64)
        u, n = np.unique(cents, return_counts=True)
        return pa.table({"c": pa.array(u, pa.int64()), "n": pa.array(n.astype(np.int64))})

    hist_ds = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # the partials are O(distinct cents) histogram rows per block — a
    # remote tree-fold merges them without the Dataset groupby's
    # all-to-all machinery (same rationale as ann._tree_fold_moments)
    refs = list(hist_ds.materialize().to_arrow_refs())
    while len(refs) > 1:
        refs = [
            _merge_hists.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)
        ]
    merged = ray.get(_merge_hists.remote(*refs)) if refs else None
    parts = [merged] if merged is not None and merged.num_rows else []
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    key: pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "robust_outlier": pa.array([], pa.int64()),
                }
            )
        )
    tbl = parts[0]
    vals = tbl.column("c").to_numpy()  # sorted distinct (tree-fold output)
    cnts = tbl.column("n").to_numpy().astype(np.int64)
    med2 = _median2_from_hist(vals, cnts)
    d2v = np.abs(2 * vals - med2)
    dorder = np.argsort(d2v, kind="stable")
    dv, dc = d2v[dorder], cnts[dorder]
    starts = np.flatnonzero(np.r_[True, dv[1:] != dv[:-1]])
    md2 = _median2_from_hist(dv[starts], np.add.reduceat(dc, starts))

    def flag(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(col).to_numpy() * scale).astype(np.int64)
        out = (2 * np.abs(2 * cents - med2) > c * md2).astype(np.int64)
        return pa.table(
            {
                key: batch.column(key),
                "cents": pa.array(cents, pa.int64()),
                "robust_outlier": pa.array(out, pa.int64()),
            }
        )

    return (
        ds.select_columns([key, col])
        .map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key)
    )


def winsorize_at_group_quantile(
    ds: "ray.data.Dataset",
    group: str,
    key: str,
    value: str,
    q: float = 0.9,
    scale: int = 100,
) -> "ray.data.Dataset":
    """-> key, group, cents:int64, capped_cents:int64 — every row with
    its fixed-point value CAPPED at its group's q-th discrete quantile
    (winsorization, the keep-the-row sibling of
    filter_above_group_quantile; heavy-tail taming before aggregation).

    Same two-pass composition: decomposable histogram quantiles
    (O(groups) out), tiny threshold table broadcast-joined back, cap
    applied map-side as an integer min — every output is an int64, so
    the gate hashes exactly."""
    import pyarrow.compute as pc

    from spatialjoincountovershells_ray.pipelines.join import equi_join

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(value).to_numpy() * scale).astype(np.int64)
        return pa.table(
            {
                key: batch.column(key),
                group: batch.column(group),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    rows = ds.select_columns([key, group, value]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    th = grouped_quantiles_disc(rows.select_columns([group, "cents"]), group, "cents", {"__th": q})
    joined = equi_join(rows, th, group, group, mode="broadcast")

    def cap(batch: pa.Table) -> pa.Table:
        capped = pc.min_element_wise(batch.column("cents"), batch.column("__th"))
        return pa.table(
            {
                key: batch.column(key),
                group: batch.column(group),
                "cents": batch.column("cents"),
                "capped_cents": pc.cast(capped, pa.int64()),
            }
        )

    return joined.map_batches(cap, batch_format="pyarrow", zero_copy_batch=True).sort(key)


def key_skew_report(ds: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    """-> n_keys, n_rows, max_n, p50_n, p90_n (one row, all int64) —
    the distribution of per-key row counts: the skew diagnostic you run
    before choosing a partitioning / salting strategy (the salt
    machinery's cheap pre-pass, promoted to a first-class op).

    Two bounded exchanges: per-batch key-count combiners merge into the
    per-key count table (O(keys)); a second combiner pass folds that
    into a count-of-counts histogram (O(distinct counts) — for skew
    analysis this is tiny: most keys share few distinct frequencies),
    from which one driver read-off yields max and exact discrete
    quantiles. Raw rows never cross either exchange."""

    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def partial(batch: pa.Table) -> pa.Table:
        u, n = np.unique(batch.column(key).to_numpy(), return_counts=True)
        return pa.table({"k": pa.array(u, pa.int64()), "n": pa.array(n.astype(np.int64))})

    def bucket_hist(tbl: pa.Table) -> pa.Table:
        # keys are whole inside a bucket: per-key totals (sort+reduceat),
        # folded straight to this bucket's count-of-counts partial — both
        # former Dataset groupbys collapse into the one bucket exchange
        # (their all-to-all barrier cost dominated this diagnostic)
        if tbl.num_rows == 0:
            return pa.table({"c": pa.array([], pa.int64()), "m": pa.array([], pa.int64())})
        k = tbl.column("k").to_numpy()
        n = tbl.column("n").to_numpy()
        order = np.argsort(k, kind="stable")
        ks, ns = k[order], n[order]
        totals = np.add.reduceat(ns, np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]]))
        u, m = np.unique(totals, return_counts=True)
        return pa.table({"c": pa.array(u, pa.int64()), "m": pa.array(m.astype(np.int64))})

    hist = keyed_partition_apply(
        ds.select_columns([key]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "k",
        bucket_hist,
    )
    parts = [p for p in ray.get(hist.to_arrow_refs()) if p.num_rows and p.num_columns]
    if not parts:
        z = pa.array([], pa.int64())
        return ray.data.from_arrow(
            pa.table({"n_keys": z, "n_rows": z, "max_n": z, "p50_n": z, "p90_n": z})
        )
    tbl = pa.concat_tables(parts, promote_options="none")
    c = tbl.column("c").to_numpy()
    m = tbl.column("m").to_numpy().astype(np.int64)
    order = np.argsort(c, kind="stable")
    c, m = c[order], m[order]
    # buckets emit independent partials: merge repeated counts by value
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    c = c[starts]
    m = np.add.reduceat(m, starts)
    cum = m.cumsum()
    nkeys = int(cum[-1])

    def qdisc(q: float) -> int:
        # quantile_disc: the value at 1-based rank ceil(q * n)
        r = int(np.ceil(q * nkeys))
        return int(c[np.searchsorted(cum, r)])

    return ray.data.from_arrow(
        pa.table(
            {
                "n_keys": pa.array([nkeys], pa.int64()),
                "n_rows": pa.array([int((c * m).sum())], pa.int64()),
                "max_n": pa.array([int(c[-1])], pa.int64()),
                "p50_n": pa.array([qdisc(0.5)], pa.int64()),
                "p90_n": pa.array([qdisc(0.9)], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# mergeable approximate quantile summary (the quantile sibling of CMS/HLL/MG)


def quantile_sketch(
    ds: "ray.data.Dataset", col: str, qs: dict[str, float], eps: float = 0.01, scale: int = 100
) -> "ray.data.Dataset":
    """-> one row: <name>:int64 per entry of ``qs`` — approximate
    quantiles of the fixed-point column with a PROVABLE rank error
    bound, computed from bounded per-batch summaries (the quantile
    member of the sketch family next to CMS, HLL and Misra-Gries).

    Each batch compresses its sorted cents to m = ceil(4/eps) weighted
    order statistics (sample j covers the ranks between samples, so the
    within-batch rank error is <= n_b * eps/4); the final task merges
    ALL partials by value and reads ranks off the cumulative weights —
    total rank error <= sum_b n_b*eps/4 + merge read-off <= eps*N/2.
    The exchange carries O(batches/eps) rows, never values. The summary
    CONTENTS depend on the blocking (any merge-based quantile sketch
    does), so the op is gated rows-only; the pytest contract instead
    PROVES the rank bound under multiple blockings. A tree merge with
    recompression is the deeper-scale path when batches/eps outgrows
    one task; at that point the error budget doubles per level (the
    standard mergeable-summaries trade)."""
    m = int(np.ceil(4.0 / eps))

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.sort(np.rint(batch.column(col).to_numpy() * scale).astype(np.int64))
        n = len(cents)
        if n == 0:
            return pa.table({"v": pa.array([], pa.int64()), "w": pa.array([], pa.int64())})
        if n <= m:
            idx = np.arange(n)
        else:
            idx = np.unique(np.linspace(0, n - 1, m).round().astype(np.int64))
        # weight of sample j = ranks it stands for (gap to previous sample)
        w = np.diff(np.r_[-1, idx])
        w[-1] += (n - 1) - idx[-1]  # tail ranks fold into the last sample
        return pa.table({"v": pa.array(cents[idx], pa.int64()), "w": pa.array(w, pa.int64())})

    parts = [
        p
        for p in ray.get(
            ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        )
        if p.num_rows and p.num_columns
    ]
    if not parts:
        return ray.data.from_arrow(
            pa.table({name: pa.array([], pa.int64()) for name in qs})
        )
    tbl = pa.concat_tables(parts, promote_options="none")
    v = tbl.column("v").to_numpy()
    w = tbl.column("w").to_numpy().astype(np.int64)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = w.cumsum()
    total = int(cum[-1])
    out = {}
    for name, q in qs.items():
        t = int(np.floor(q * (total - 1)))
        out[name] = pa.array([int(v[np.searchsorted(cum, t + 1)])], pa.int64())
    return ray.data.from_arrow(pa.table(out))


def _sky2d_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of the maximize-maximize Pareto frontier of (x, y).

    Sort x desc then y desc; per distinct x only the max-y row is a
    candidate, and a candidate survives iff its y strictly exceeds the
    cummax over larger-x candidates. O(n log n), one pass, exact under
    ties (equal points keep exactly one representative).
    """
    n = len(x)
    mask = np.zeros(n, dtype=bool)
    if n == 0:
        return mask
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    first = np.r_[True, xs[1:] != xs[:-1]]
    cand = order[first]
    run = np.maximum.accumulate(ys[first])
    keep = np.r_[True, run[1:] > run[:-1]]
    mask[cand[keep]] = True
    return mask


def skyline2d(ds: "ray.data.Dataset", xcol: str, ycol: str) -> "ray.data.Dataset":
    """-> the DISTINCT maximize-maximize skyline (Pareto frontier) rows
    of (xcol, ycol), sorted by xcol.

    Skylines are decomposable: a globally non-dominated point is
    non-dominated in its own batch, so each batch folds to its local
    frontier (a combiner whose output is tiny on real-valued data — the
    expected frontier of n random points is O(log n)) and one final
    pass over the concatenated local frontiers finishes. The exchange
    carries frontier points only, never the table; values pass through
    untouched so the SQL twin hashes bit-equal.
    """

    def local(batch: pa.Table) -> pa.Table:
        x = batch.column(xcol).to_numpy()
        y = batch.column(ycol).to_numpy()
        m = _sky2d_mask(x, y)
        return pa.table({xcol: pa.array(x[m]), ycol: pa.array(y[m])})

    def final(batch: pa.Table) -> pa.Table:
        x = batch.column(xcol).to_numpy()
        y = batch.column(ycol).to_numpy()
        m = _sky2d_mask(x, y)
        return pa.table({xcol: pa.array(x[m]), ycol: pa.array(y[m])})

    return (
        ds.select_columns([xcol, ycol])
        .map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # O(sum of local frontiers) rows — tiny by then
        .map_batches(final, batch_format="pyarrow", zero_copy_batch=True)
        .sort(xcol)
    )


def cube_counts(
    ds: "ray.data.Dataset", cols: list[str], sentinel: str = "(all)"
) -> "ray.data.Dataset":
    """GROUP BY CUBE(``cols``) row counts over string columns: one row
    per value combination for EVERY subset of ``cols``, masked columns
    replaced by ``sentinel`` (the COALESCE'd shape of SQL's CUBE).

    Same physical plan as :func:`rollup_counts` — the input flows
    through one decomposable finest-level count, and all 2^k coarser
    grids are derived from that already-aggregated O(product of
    cardinalities) table in a single expansion task; only the aggregate
    ever re-flows, never the input."""
    import itertools

    sep = "\x1f"

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
        key = pc.binary_join_element_wise(*[t.column(c).cast(pa.string()) for c in cols], sep)
        return pa.table({"k": key, "n": t.column("count_all").cast(pa.int64())})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .sum("n")
    )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ncol = "sum(n)" if "sum(n)" in df.columns else "n"
        parts = df["k"].str.split(sep, expand=True)
        parts.columns = cols
        base = parts.assign(n=df[ncol].to_numpy(np.int64))
        levels = []
        for r in range(len(cols), -1, -1):
            for keep in itertools.combinations(cols, r):
                g = (
                    base.groupby(list(keep), sort=False, as_index=False)["n"].sum()
                    if keep
                    else pd.DataFrame({"n": [int(base["n"].sum())]})
                )
                for c in cols:
                    if c not in keep:
                        g[c] = sentinel
                levels.append(g[cols + ["n"]])
        return pd.concat(levels, ignore_index=True)

    return (
        merged.repartition(1)
        .map_batches(expand, batch_format="pandas", batch_size=None, zero_copy_batch=True)
        .sort(cols)
    )


def table_profile(ds: "ray.data.Dataset", cols: list[str]) -> "ray.data.Dataset":
    """Data-quality profile: -> {column, n_rows, n_nulls, n_distinct}
    (exact, one row per profiled column, sorted by column name).

    One pass over the input: each batch emits its per-column DISTINCT
    values (cast to string — injective per distinct value, so equality
    is preserved across types) plus one tiny count partial, all routed
    by hash(column, value) so a value's duplicates from every batch meet
    in exactly one bucket. The exchange therefore carries per-batch
    distinct values, never rows; the final fold is O(buckets x columns).
    The scale contract matches the exact-distinct ops: a column whose
    distinct set is itself ~input-sized flows once through the hash
    exchange (the unavoidable cost of an exact COUNT(DISTINCT); the HLL
    sketch ops are the cheap alternative)."""
    from spatialjoincountovershells_ray.functions import text as T
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def _hash_strings(arr: pa.Array) -> np.ndarray:
        data, off = T.string_bytes(arr)
        h = T.hash_byte_spans(data, off[:-1], np.diff(off).astype(np.int64))
        return (h.astype(np.int64) & 0x7FFFFFFFFFFFFFFF).astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ks, cs, vs, ns, nulls, isc = [], [], [], [], [], []
        for c in cols:
            arr = batch.column(c)
            vals = pc.unique(arr.drop_null()).cast(pa.string())
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            tagged = pc.binary_join_element_wise(
                pa.array([c] * len(vals), pa.string()), vals, "\x1f"
            )
            ks.append(_hash_strings(tagged))
            cs.append(np.full(len(vals), c, dtype=object))
            vs.append(vals.to_numpy(zero_copy_only=False).astype(object))
            ns.append(np.zeros(len(vals), np.int64))
            nulls.append(np.zeros(len(vals), np.int64))
            isc.append(np.zeros(len(vals), np.int8))
            # one count partial per column per batch
            ks.append(_hash_strings(pa.array([c], pa.string())))
            cs.append(np.array([c], dtype=object))
            vs.append(np.array([""], dtype=object))
            ns.append(np.array([batch.num_rows], np.int64))
            nulls.append(np.array([arr.null_count], np.int64))
            isc.append(np.ones(1, np.int8))
        return pa.table(
            {
                "k": pa.array(np.concatenate(ks), pa.int64()),
                "col": pa.array(np.concatenate(cs), pa.string()),
                "val": pa.array(np.concatenate(vs), pa.string()),
                "n": pa.array(np.concatenate(ns), pa.int64()),
                "nulls": pa.array(np.concatenate(nulls), pa.int64()),
                "is_count": pa.array(np.concatenate(isc), pa.int8()),
            }
        )

    def bucket_fold(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "col": pa.array([], pa.string()),
                "nd": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "nulls": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return empty
        isc = tbl.column("is_count").to_numpy().astype(bool)
        vals = tbl.filter(~isc)
        nd = (
            vals.select(["col", "val"]).group_by(["col", "val"]).aggregate([])
            .group_by("col").aggregate([([], "count_all")])
        )
        counts = (
            tbl.filter(isc)
            .group_by("col")
            .aggregate([("n", "sum"), ("nulls", "sum")])
        )
        out_cols: dict[str, dict[str, int]] = {}
        for i in range(nd.num_rows):
            out_cols.setdefault(str(nd.column("col")[i]), {})["nd"] = int(
                nd.column("count_all")[i].as_py()
            )
        for i in range(counts.num_rows):
            d = out_cols.setdefault(str(counts.column("col")[i]), {})
            d["n"] = int(counts.column("n_sum")[i].as_py())
            d["nulls"] = int(counts.column("nulls_sum")[i].as_py())
        names = sorted(out_cols)
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "nd": pa.array([out_cols[c].get("nd", 0) for c in names], pa.int64()),
                "n": pa.array([out_cols[c].get("n", 0) for c in names], pa.int64()),
                "nulls": pa.array([out_cols[c].get("nulls", 0) for c in names], pa.int64()),
            }
        )

    parts = keyed_partition_apply(
        ds.select_columns(cols).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "k",
        bucket_fold,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("col", as_index=False).sum()
        g = g.sort_values("col", kind="mergesort")
        return pd.DataFrame(
            {
                "column": g["col"].to_numpy(),
                "n_rows": g["n"].to_numpy(np.int64),
                "n_nulls": g["nulls"].to_numpy(np.int64),
                "n_distinct": g["nd"].to_numpy(np.int64),
            }
        )

    return parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None, zero_copy_batch=True
    )


def spend_gini(joined: "ray.data.Dataset", seg_col: str, cents_col: str) -> "ray.data.Dataset":
    """-> seg:string, n:int64, sum_cents:int64, gini_num:int64 — the
    exact-integer Gini concentration numerator per group:
    ``sum((2*rank - n - 1) * x)`` over each group's values sorted
    ascending (rank 1-based; ties contribute an order-invariant total,
    so the result is deterministic without a tie-break). Gini itself is
    gini_num / (n * sum_cents) — left to the consumer so every emitted
    column stays integer-exact for the value-hash gate.

    Plan: one slim (seg, cents) projection per batch, groups co-located
    by a hash-keyed bucket exchange (the string segment rides along; the
    int64 hash is ONLY for routing, the kernel groups by the real
    string), one vectorized sort + reduceat per bucket. Overflow bound:
    |gini_num| < n * max_cents * n — fits int64 up to ~10^9 rows of
    10^9-cent values per group."""
    from spatialjoincountovershells_ray.functions.text import text_hash128
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def slim(batch: pa.Table) -> pa.Table:
        h1, _ = text_hash128(batch.column(seg_col))
        return pa.table(
            {
                "seg": batch.column(seg_col),
                "cents": pc.cast(batch.column(cents_col), pa.int64()),
                "_gk": pa.array(h1, pa.int64()),
            }
        )

    tagged = joined.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "seg": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_cents": pa.array([], pa.int64()),
                "gini_num": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0 or "seg" not in tbl.schema.names:
            return empty
        srt = tbl.select(["seg", "cents"]).sort_by(
            [("seg", "ascending"), ("cents", "ascending")]
        )
        seg = srt.column("seg")
        cents = srt.column("cents").to_numpy()
        # group runs over the sorted segment strings
        neq = pc.not_equal(seg.slice(1), seg.slice(0, len(seg) - 1))
        starts = np.r_[0, np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1]
        runlen = np.diff(np.r_[starts, len(cents)])
        rn = np.arange(len(cents), dtype=np.int64) - np.repeat(starts, runlen) + 1
        nrep = np.repeat(runlen.astype(np.int64), runlen)
        contrib = (2 * rn - nrep - 1) * cents
        return pa.table(
            {
                "seg": seg.take(pa.array(starts, pa.int64())),
                "n": pa.array(runlen.astype(np.int64), pa.int64()),
                "sum_cents": pa.array(np.add.reduceat(cents, starts), pa.int64()),
                "gini_num": pa.array(np.add.reduceat(contrib, starts), pa.int64()),
            }
        )

    return keyed_partition_apply(tagged, "_gk", kernel).sort("seg")


def grouped_ols_moments(
    ds: "ray.data.Dataset", group: str, x: str, y: str
) -> "ray.data.Dataset":
    """-> group, n:int64, sx, sy, sxx, sxy:int64 — the exact integer
    moment set of a per-group simple linear regression of ``y`` on ``x``
    (both int64): everything slope/intercept/R² need, kept as exact
    int64 so the SQL twin hashes bit-equal (the float fit itself is one
    driver-side division away — the value_lag1 contract applied to the
    cross-sectional regression shape).

    Decomposable: each batch folds to one 6-int row per group it
    contains (Arrow group_by combiner), the exchange carries
    O(groups x batches) partials, and a remote fold finishes (groups are
    bounded here; for unbounded keys route the partials through
    keyed_partition_apply instead). Overflow contract:
    n * max|x|*max|y| and n * max(x)^2 must fit int64."""

    def partial(batch: pa.Table) -> pa.Table:
        xs = batch.column(x).to_numpy()
        t = pa.table(
            {
                group: batch.column(group),
                "x": batch.column(x),
                "y": batch.column(y),
                "xx": pa.array(xs * xs, pa.int64()),
                "xy": pa.array(xs * batch.column(y).to_numpy(), pa.int64()),
            }
        )
        g = t.group_by(group).aggregate(
            [([], "count_all"), ("x", "sum"), ("y", "sum"), ("xx", "sum"), ("xy", "sum")]
        )
        # select by NAME — pyarrow's key-column position varies by version
        return pa.table(
            {
                group: g.column(group),
                "n": pc.cast(g.column("count_all"), pa.int64()),
                "sx": g.column("x_sum"),
                "sy": g.column("y_sum"),
                "sxx": g.column("xx_sum"),
                "sxy": g.column("xy_sum"),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def fold(*tbls: pa.Table) -> pa.Table:
        ne = [t for t in tbls if t.num_rows]
        if not ne:
            return tbls[0]
        t = pa.concat_tables(ne, promote_options="none")
        g = t.group_by(group).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxx", "sum"), ("sxy", "sum")]
        )
        g = pa.table(
            {
                group: g.column(group),
                "n": g.column("n_sum"),
                "sx": g.column("sx_sum"),
                "sy": g.column("sy_sum"),
                "sxx": g.column("sxx_sum"),
                "sxy": g.column("sxy_sum"),
            }
        )
        return g.sort_by(group)

    refs = parts.materialize().to_arrow_refs()
    if not refs:  # zero-block input: fold(*[]) would IndexError
        return parts
    return ray.data.from_arrow_refs([fold.remote(*refs)])
