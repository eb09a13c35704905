"""Keyed window operators: partition-by-key rank and time-interval
attribution join.

Engine extensions (the reference's only ordered surface is the O3 output
sort, SURVEY.md §2). Both ops need every row of a key co-located, so they
ride the same explicit hash-bucket exchange the relational/spatial
shuffle plans use (stages/exchange.split_by_key): one split per input
block, one task per bucket, each task running ONE vectorized numpy pass
over its whole bucket — work scales with buckets (≈ cluster CPUs), never
with the number of groups, and no row ever visits the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.stages.exchange import split_by_key


@ray.remote
def _apply_bucket(kernel, *parts: pa.Table) -> pa.Table:
    ne = [p for p in parts if p.num_rows > 0]
    tbl = pa.concat_tables(ne, promote_options="none") if ne else parts[0]
    return kernel(tbl)


def keyed_partition_apply(
    ds: "ray.data.Dataset", key: str, kernel, nbuckets: int | None = None
) -> "ray.data.Dataset":
    """Hash-partition ``ds`` on int64 column ``key`` and run ``kernel``
    (pa.Table -> pa.Table, vectorized, must handle 0 rows) once per
    bucket. The general physical plan for window functions: every group
    is wholly inside one bucket, so kernels see complete groups."""
    nbuckets = nbuckets or max(8, int(ray.cluster_resources().get("CPU", 8)))
    refs = ds.materialize().to_arrow_refs()
    if not refs:
        return ds
    splits = [
        split_by_key.options(num_returns=nbuckets).remote(b, key, nbuckets) for b in refs
    ]
    out = [_apply_bucket.remote(kernel, *[s[bi] for s in splits]) for bi in range(nbuckets)]
    return ray.data.from_arrow_refs(out)


def _rank_kernel(tbl: pa.Table) -> pa.Table:
    """row_number() over (partition by o_custkey order by o_totalprice
    DESC, o_orderkey) — one lexsort + run-length arithmetic."""
    cust = tbl.column("o_custkey").to_numpy()
    price = tbl.column("o_totalprice").to_numpy()
    okey = tbl.column("o_orderkey").to_numpy()
    order = np.lexsort((okey, -price, cust))
    c = cust[order]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]]) if len(c) else np.array([], np.int64)
    runlen = np.diff(np.r_[starts, len(c)]) if len(c) else np.array([], np.int64)
    rnk = np.arange(len(c), dtype=np.int64) - np.repeat(starts, runlen) + 1
    return pa.table(
        {
            "o_custkey": pa.array(c, pa.int64()),
            "o_orderkey": pa.array(okey[order], pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
        }
    )


def rank_orders_per_customer(orders: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> o_custkey, o_orderkey, rnk:int64 — every order ranked within its
    customer by totalprice (desc, orderkey tie-break). The general window
    shape that top-k per group (relagg) cannot express: ALL rows come
    back, each carrying its in-group position."""
    return keyed_partition_apply(orders, "o_custkey", _rank_kernel)


ATTR_WINDOW_US = 6 * 3600 * 1_000_000  # 6-hour attribution lookback


def _attribution_kernel(tbl: pa.Table) -> pa.Table:
    """Per purchase: count same-user clicks with ts in [p.ts - W, p.ts).

    Fully vectorized interval join inside the bucket: clicks are lexsorted
    by (user, ts) and both sides are mapped onto one composite int64 axis
    (rank-compressed user index × time span + offset-shifted ts), on which
    each purchase's window is two np.searchsorted probes. The span padding
    (+W+2) guarantees a window can never bleed into a neighboring user's
    segment; if users × span would overflow int64 the kernel falls back to
    a per-user loop (vectorized inside each user)."""
    isp = tbl.column("is_purchase").to_numpy(zero_copy_only=False).astype(bool)
    uid = tbl.column("user_id").to_numpy()
    ts = tbl.column("ts_us").to_numpy()
    eid = tbl.column("event_id").to_numpy()
    pu, pt, pe = uid[isp], ts[isp], eid[isp]
    isc = ~isp  # prep kept only the two joined types
    cu, ct = uid[isc], ts[isc]
    n = np.zeros(len(pe), dtype=np.int64)
    if len(cu) and len(pe):
        co = np.lexsort((ct, cu))
        cu, ct = cu[co], ct[co]
        t0 = min(int(ct.min()), int(pt.min()))
        span = max(int(ct.max()), int(pt.max())) - t0 + ATTR_WINDOW_US + 2
        uu = np.unique(cu)
        has = np.isin(pu, uu)
        if len(uu) * span < (1 << 62):
            uidx_c = np.searchsorted(uu, cu)
            key_c = uidx_c * span + (ct - t0)
            uidx_p = np.searchsorted(uu, pu[has])
            key_p = uidx_p * span + (pt[has] - t0)
            lo = np.searchsorted(key_c, key_p - ATTR_WINDOW_US, "left")
            hi = np.searchsorted(key_c, key_p, "left")
            n[has] = hi - lo
        else:  # composite axis would overflow: per-user vectorized fallback
            ustart = np.searchsorted(cu, uu, "left")
            uend = np.searchsorted(cu, uu, "right")
            for i, u in enumerate(uu):
                m = pu == u
                if not m.any():
                    continue
                seg = ct[ustart[i] : uend[i]]
                n[m] = np.searchsorted(seg, pt[m], "left") - np.searchsorted(
                    seg, pt[m] - ATTR_WINDOW_US, "left"
                )
    return pa.table(
        {"event_id": pa.array(pe, pa.int64()), "n_clicks": pa.array(n, pa.int64())}
    )


@ray.remote
def _block_nrows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _stamp_rank(tbl: pa.Table, offset: int, id_col: str) -> pa.Table:
    rn = np.arange(offset + 1, offset + tbl.num_rows + 1, dtype=np.int64)
    return pa.table({id_col: tbl.column(id_col), "rn": pa.array(rn, pa.int64())})


def global_event_rank(sf_dir_or_ds) -> "ray.data.Dataset":
    """-> event_id, rn:int64 — the global row_number() over
    (ORDER BY ts, event_id) across the whole events table.

    Physical plan: one distributed range-partitioned sort (Ray Data's
    all-to-all sort keeps blocks globally ordered), then per-block row
    counts prefix-summed on the driver (O(blocks) ints — never rows) and
    one stamp task per block adding its offset. The only driver state is
    the offsets vector, so the plan holds at any scale the sort holds."""
    ds = (
        ray.data.read_parquet(f"{sf_dir_or_ds}/events.parquet", columns=["event_id", "ts"])
        if isinstance(sf_dir_or_ds, str)
        else sf_dir_or_ds
    )

    def norm(batch: pa.Table) -> pa.Table:
        # epoch-us int64 sort key: deterministic total order (ts, event_id)
        us = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"event_id": batch.column("event_id"), "ts_us": us})

    sorted_ds = (
        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["ts_us", "event_id"])
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts[:-1], dtype=np.int64)])
    out = [
        _stamp_rank.remote(r, int(off), "event_id") for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out)


def attribution_counts(sf_dir_or_ds) -> "ray.data.Dataset":
    """-> event_id (purchase), n_clicks:int64 — same-user clicks in the
    6 h before each purchase (left-join semantics: purchases with no
    clicks report 0). The time-interval join shape (as-of's many-match
    sibling); non-relevant event types are dropped map-side before the
    exchange, so the shuffle carries only the two joined slices."""
    ds = (
        ray.data.read_parquet(
            f"{sf_dir_or_ds}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        if isinstance(sf_dir_or_ds, str)
        else sf_dir_or_ds
    )

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(batch.column("event_type"), value_set=pa.array(["purchase", "click"]))
        b = batch.filter(keep)
        # normalize resolution before the int64 cast (ns-origin blocks
        # would silently land in nanosecond windows) — same guard as the
        # other epoch-us event ops. The type column collapses to one bool
        # map-side so the exchange never carries strings.
        us = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "is_purchase": pc.equal(b.column("event_type"), "purchase"),
                "ts_us": us,
            }
        )

    tagged = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return keyed_partition_apply(tagged, "user_id", _attribution_kernel)


@ray.remote
def _bucket_partial(
    tbl: pa.Table, offset: int, total: int, k: int, val_col: str
) -> pa.Table:
    """One sorted block -> its (bucket, n, cents) partial rows. The exact
    SQL ntile(k) split: with rem = total % k and q = total // k, the
    first rem buckets hold q+1 rows. The rank column itself never
    materializes — each block folds straight to <= k partial rows."""
    r = np.arange(offset, offset + tbl.num_rows, dtype=np.int64)
    q, rem = divmod(total, k)
    boundary = rem * (q + 1)
    lo = r // (q + 1)
    bucket = np.where(r < boundary, lo, rem + (r - boundary) // max(q, 1)) + 1
    cents = np.rint(tbl.column(val_col).to_numpy() * 100).astype(np.int64)
    t = pa.table(
        {"bucket": pa.array(bucket, pa.int64()), "one": pa.array(np.ones(len(r), np.int64)), "cents": pa.array(cents, pa.int64())}
    )
    g = t.group_by("bucket").aggregate([("one", "sum"), ("cents", "sum")])
    return g.rename_columns(["bucket", "n", "cents"])


def value_ntile_stats(
    ds: "ray.data.Dataset", val_col: str, id_col: str, k: int = 10
) -> "ray.data.Dataset":
    """-> bucket:int64, n:int64, cents:int64 — rows split into k
    SQL-ntile buckets by (val, id) order, with per-bucket row counts and
    exact fixed-point value sums (the decile table an analyst asks for).

    Same physical plan as global_event_rank — one distributed
    range-partitioned sort, O(blocks) driver prefix sums — but each
    block then folds DIRECTLY to <= k (bucket, n, cents) partials, so no
    rank column and no per-row output ever exist; the final exchange is
    O(blocks * k)."""
    sorted_ds = ds.select_columns([val_col, id_col]).sort([val_col, id_col]).materialize()
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    total = int(np.sum(counts))
    offsets = np.concatenate([[0], np.cumsum(counts[:-1], dtype=np.int64)])
    parts = [
        _bucket_partial.remote(r, int(off), total, k, val_col)
        for r, off in zip(refs, offsets)
    ]
    agg = ray.data.from_arrow_refs(parts).groupby("bucket").sum(["n", "cents"])

    def final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "n": batch.column("sum(n)").cast(pa.int64()),
                "cents": batch.column("sum(cents)").cast(pa.int64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True).sort("bucket")


# ---------------------------------------------------------------------------
# distribution window functions (percent_rank / cume_dist)


def _dist_kernel(tbl: pa.Table) -> pa.Table:
    """percent_rank() and cume_dist() over (partition by o_custkey order
    by o_totalprice) — tie-aware (RANK semantics): one lexsort, value-run
    boundaries give rank (run start) and cume numerator (run end).

    Both outputs are single correctly-rounded double divisions of exact
    integers ((rank-1)/(n-1), le_count/n), so they hash-match the SQL
    window twin bit-for-bit — no transcendental, no accumulation order.
    """
    cust = tbl.column("o_custkey").to_numpy()
    price = tbl.column("o_totalprice").to_numpy()
    okey = tbl.column("o_orderkey").to_numpy()
    m = len(cust)
    if m == 0:
        return pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "pct_rank": pa.array([], pa.float64()),
                "cume_dist": pa.array([], pa.float64()),
            }
        )
    order = np.lexsort((okey, price, cust))
    c, p = cust[order], price[order]
    gstart = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    glen = np.diff(np.r_[gstart, m])
    n = np.repeat(glen, glen).astype(np.float64)
    pos0 = np.repeat(gstart, glen)  # group start index per row
    # value-run starts: new group OR price change
    vstart = np.flatnonzero(np.r_[True, (c[1:] != c[:-1]) | (p[1:] != p[:-1])])
    vlen = np.diff(np.r_[vstart, m])
    run_start = np.repeat(vstart, vlen)
    run_end = np.repeat(vstart + vlen, vlen)
    rank = (run_start - pos0 + 1).astype(np.float64)
    le = (run_end - pos0).astype(np.float64)
    denom = n - 1.0
    pct = np.where(denom > 0, (rank - 1.0) / np.where(denom > 0, denom, 1.0), 0.0)
    return pa.table(
        {
            "o_custkey": pa.array(c, pa.int64()),
            "o_orderkey": pa.array(okey[order], pa.int64()),
            "pct_rank": pa.array(pct, pa.float64()),
            "cume_dist": pa.array(le / n, pa.float64()),
        }
    )


def order_dist_stats(orders: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> o_custkey, o_orderkey, pct_rank, cume_dist — the SQL
    distribution window functions over (partition by customer, order by
    totalprice), via the keyed bucket exchange (complete groups per
    bucket, one vectorized pass per bucket)."""
    return keyed_partition_apply(orders, "o_custkey", _dist_kernel)


# ---------------------------------------------------------------------------
# ratio-to-report (share of group total)


def _share_kernel(tbl: pa.Table) -> pa.Table:
    """cents / SUM(cents) OVER (PARTITION BY o_custkey) — group sums are
    exact int64 (sort + reduceat), the share is ONE double division of
    exact integers, so it hashes bit-equal to the SQL window twin."""
    cust = tbl.column("o_custkey").to_numpy()
    okey = tbl.column("o_orderkey").to_numpy()
    cents = np.rint(tbl.column("o_totalprice").to_numpy() * 100).astype(np.int64)
    if len(cust) == 0:
        return pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "share": pa.array([], pa.float64()),
            }
        )
    order = np.argsort(cust, kind="stable")
    c, ok, cs = cust[order], okey[order], cents[order]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    runlen = np.diff(np.r_[starts, len(c)])
    totals = np.repeat(np.add.reduceat(cs, starts), runlen)
    return pa.table(
        {
            "o_custkey": pa.array(c, pa.int64()),
            "o_orderkey": pa.array(ok, pa.int64()),
            "cents": pa.array(cs, pa.int64()),
            "share": pa.array(cs.astype(np.float64) / totals.astype(np.float64)),
        }
    )


OVERLAP_DAY_US = 86_400_000_000


def _overlap_kernel(tbl: pa.Table) -> pa.Table:
    """Per-customer overlapping-interval pairs, one vectorized sweep.

    Intervals are sorted by (customer, start, orderkey); because interval
    a precedes b in that order, the pair overlaps iff b.start <= a.end
    (closed intervals). Each row's partners are then one contiguous run
    of its successors, found with a single np.searchsorted over the same
    composite (customer-rank x span) int64 axis the attribution kernel
    uses — ends are clamped to the customer's segment so a probe can
    never bleed into a neighboring customer. Output size equals the true
    pair count; work is O(n log n + pairs) per bucket with no Python
    loop."""
    cust = tbl.column("o_custkey").to_numpy()
    okey = tbl.column("o_orderkey").to_numpy()
    s = tbl.column("s_us").to_numpy()
    e = tbl.column("e_us").to_numpy()
    empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "a_orderkey": pa.array([], pa.int64()),
            "b_orderkey": pa.array([], pa.int64()),
        }
    )
    n = len(cust)
    if n == 0:
        return empty
    order = np.lexsort((okey, s, cust))
    c, k, s, e = cust[order], okey[order], s[order], e[order]
    t0 = int(s.min())
    span = max(int(s.max()), int(e.max())) - t0 + 2
    uu, uidx = np.unique(c, return_inverse=True)
    if len(uu) * span >= (1 << 62):  # composite axis would overflow int64
        raise ValueError("overlap kernel: customers x time span exceeds int64")
    key_s = uidx * span + (s - t0)
    # clamp each end into its own customer segment: a probe at the clamp
    # still covers every in-segment start (starts sit at offsets < span-1)
    key_e = np.minimum(uidx * span + np.minimum(e - t0, span - 2), uidx * span + span - 2)
    hi = np.searchsorted(key_s, key_e, "right")
    base = np.arange(n, dtype=np.int64)
    cnt = hi - base - 1
    cnt = np.maximum(cnt, 0)
    total = int(cnt.sum())
    if total == 0:
        return empty
    ai = np.repeat(base, cnt)
    offs = np.concatenate([[0], np.cumsum(cnt[:-1])])
    bi = ai + 1 + (np.arange(total, dtype=np.int64) - np.repeat(offs, cnt))
    return pa.table(
        {
            "o_custkey": pa.array(c[ai], pa.int64()),
            "a_orderkey": pa.array(k[ai], pa.int64()),
            "b_orderkey": pa.array(k[bi], pa.int64()),
        }
    )


def order_overlap_pairs(orders: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> o_custkey, a_orderkey, b_orderkey — every pair of the same
    customer's orders whose processing windows overlap, where an order's
    window is [orderdate, orderdate + (1 + orderkey % 7) days] (a
    deterministic per-row duration). The interval SELF-join shape — the
    op the SQL twin spells as an O(g^2) self-join per customer — run as
    one sorted sweep per key bucket, emitting each unordered pair once
    with a the earlier interval ((start, orderkey) order)."""

    def prep(batch: pa.Table) -> pa.Table:
        us = batch.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        okey = batch.column("o_orderkey").to_numpy()
        dur = (1 + okey % 7) * OVERLAP_DAY_US
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "o_orderkey": batch.column("o_orderkey"),
                "s_us": pa.array(us, pa.int64()),
                "e_us": pa.array(us + dur, pa.int64()),
            }
        )

    prepped = orders.select_columns(
        ["o_custkey", "o_orderkey", "o_orderdate"]
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return keyed_partition_apply(prepped, "o_custkey", _overlap_kernel)


def order_share(orders: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> o_custkey, o_orderkey, cents, share — each order's share of its
    customer's total spend (the SQL ratio-to-report window), via the
    keyed bucket exchange."""
    return keyed_partition_apply(orders, "o_custkey", _share_kernel)


def _pct_rank_kernel(tbl: pa.Table) -> pa.Table:
    """percent_rank() / cume_dist() over (partition by o_custkey order by
    o_totalprice) — one lexsort + peer-run arithmetic. The divisions are
    single IEEE ops on exactly-representable small integers, so the
    float64 outputs are bit-identical to any engine computing the same
    (rank-1)/(n-1) and peers_end/n definitions (DuckDB's)."""
    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "pct_rank": pa.array([], pa.float64()),
            "cume": pa.array([], pa.float64()),
        }
    )
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        return empty
    cust = tbl.column("o_custkey").to_numpy()
    price = tbl.column("o_totalprice").to_numpy()
    okey = tbl.column("o_orderkey").to_numpy()
    order = np.lexsort((price, cust))
    c, v, k = cust[order], price[order], okey[order]
    n = len(c)
    gstarts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    glen = np.diff(np.r_[gstarts, n])
    gstart_of = np.repeat(gstarts, glen)
    n_of = np.repeat(glen, glen)
    new_peer = np.r_[True, (v[1:] != v[:-1]) | (c[1:] != c[:-1])]
    rstarts = np.flatnonzero(new_peer)
    rlen = np.diff(np.r_[rstarts, n])
    rank0 = np.repeat(rstarts, rlen) - gstart_of  # 0-based min rank
    peers_end = np.repeat(rstarts + rlen, rlen) - gstart_of
    pr = np.where(n_of > 1, rank0 / np.maximum(n_of - 1, 1), 0.0)
    cd = peers_end / n_of
    return pa.table(
        {
            "o_orderkey": pa.array(k),
            "pct_rank": pa.array(pr, pa.float64()),
            "cume": pa.array(cd, pa.float64()),
        }
    )


def order_percent_rank(orders: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> o_orderkey, pct_rank, cume — percent_rank and cume_dist of each
    order's totalprice within its customer (engine extension; the
    relative-standing windows that complement rank_orders_per_customer's
    row_number)."""
    return keyed_partition_apply(
        orders.select_columns(["o_custkey", "o_orderkey", "o_totalprice"]),
        "o_custkey",
        _pct_rank_kernel,
    )


@ray.remote
def _shard_partial(tbl: pa.Table, offset: int, k: int, size_name: str) -> pa.Table:
    """Rows offset..offset+n-1 of the global size order live in this
    block: fold their round-robin shard assignment straight to K
    partial (shard, n_docs, total) rows — the rank column never
    materializes."""
    n = tbl.num_rows
    shard = (offset + np.arange(n, dtype=np.int64)) % k
    sizes = tbl.column(size_name).to_numpy().astype(np.int64)
    cnt = np.bincount(shard, minlength=k).astype(np.int64)
    tot = np.bincount(shard, weights=sizes, minlength=k).astype(np.int64)
    return pa.table(
        {
            "shard": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
            "n_docs": pa.array(cnt, pa.int64()),
            "total_chars": pa.array(tot, pa.int64()),
        }
    )


def balance_shards(
    ds: "ray.data.Dataset", size_col: str, id_col: str, k: int
) -> "ray.data.Dataset":
    """-> shard, n_docs, total_chars (K rows) — deterministic
    size-balanced shard assignment: global order by (size DESC, id),
    round-robin rank % K (the sorted-greedy balancer: each shard gets
    every K-th document of the size order, so totals differ by at most
    one document per size stratum). The audit table a training-data
    sink uses to size output files evenly; the assignment itself is
    (rank - 1) % K, reproducible anywhere from the same inputs.

    Plan: one range-partitioned sort, O(blocks) row counts prefix-summed
    driver-side, then each block folds its own round-robin slice to K
    partial rows — the exchange after the sort is K x blocks tiny rows,
    and no rank column is ever materialized."""
    import pyarrow.compute as pc

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                size_col: batch.column(size_col),
                "_negsize": pc.negate_checked(
                    pc.cast(batch.column(size_col), pa.int64())
                ),
            }
        )

    sorted_ds = (
        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["_negsize", id_col])
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts[:-1], dtype=np.int64)])
    parts = [
        _shard_partial.remote(r, int(off), k, size_col)
        for r, off in zip(refs, offsets)
    ]

    @ray.remote
    def fold(*tbls: pa.Table) -> pa.Table:
        cnt = np.zeros(k, np.int64)
        tot = np.zeros(k, np.int64)
        for t in tbls:
            cnt += t.column("n_docs").to_numpy()
            tot += t.column("total_chars").to_numpy()
        return pa.table(
            {
                "shard": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
                "n_docs": pa.array(cnt, pa.int64()),
                "total_chars": pa.array(tot, pa.int64()),
            }
        )

    return ray.data.from_arrow_refs([fold.remote(*parts)])
