"""General relational operators expressed Ray-Data-first.

Not part of the reference's surface (it has no relational ops beyond the
semi-join filter) but part of a complete data-processing engine; these
exercise groupby-aggregate with partial pre-aggregation, broadcast hash
join, filter + sort + limit. All outputs are integer-exact so the DuckDB
oracle hashes match regardless of accumulation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def lineitem_agg(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-style: count + integral sums per (returnflag, linestatus).

    Partial aggregation inside map_batches, then a tiny groupby — the
    combiner pattern that keeps the shuffle O(groups), not O(rows).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        keys = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pc.cast(batch.column("l_quantity"), pa.int64()),
            }
        )
        g = keys.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("qty", "count")]
        )
        return g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty", "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).sum(["sum_qty", "cnt"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": batch.column("sum(sum_qty)"),
                "cnt": batch.column("sum(cnt)"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["l_returnflag", "l_linestatus"]
    )


class _SegJoinCount:
    """Per-worker cached lookup-join combiner (run via run_cached_bcast)."""

    def __init__(self, ref):
        p = ray.get(ref[0])
        order = np.argsort(p["keys"])
        self.keys = p["keys"][order]
        self.seg = p["seg"][order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy()
        pos = np.searchsorted(self.keys, ck)
        pos = np.minimum(pos, len(self.keys) - 1)
        ok = self.keys[pos] == ck
        segs = self.seg[pos[ok]]
        uniq, cnt = np.unique(segs, return_counts=True)
        return pa.table(
            {
                "c_mktsegment": pa.array(uniq.tolist(), pa.string()),
                "n_orders": pa.array(cnt, pa.int64()),
            }
        )


def orders_per_segment(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast hash join orders->customer + groupby count per segment."""
    from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

    ctbl = dataset_to_table(cust)
    lookup_ref = ray.put(
        {
            "keys": ctbl.column("c_custkey").to_numpy(),
            "seg": np.asarray(ctbl.column("c_mktsegment").to_pylist(), dtype=object),
        }
    )

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    partials = orders.map_batches(
        run_cached_bcast,
        fn_kwargs={"cls": _SegJoinCount, "ref_list": [lookup_ref]},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = partials.groupby("c_mktsegment").sum("n_orders")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "n_orders": batch.column("sum(n_orders)"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True).sort(
        "c_mktsegment"
    )


def event_type_counts(sf_dir: str) -> "ray.data.Dataset":
    """Filter + partial-count + groupby over the events stream table."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"event_type": batch.column("event_type")})
            .group_by("event_type")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("event_type").sum("n")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch.column("event_type"), "n": batch.column("sum(n)")}
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True).sort(
        "event_type"
    )


def revenue_by_nation(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q5-style star join: revenue per customer nation, over the
    lineitem -> orders -> customer -> nation chain.

    -> n_name:string, revenue_e4:int64 (revenue in 1e-4 currency units:
    round(extprice*100) * (100 - round(discount*100)) — integral, so the
    grand sum is accumulation-order-free and hash-exact vs SQL).

    The physical plan picks a join strategy per edge by table size:
    nation (25 rows) broadcasts onto the customer scan; customer->orders
    and orders->lineitem are hash-shuffle equi-joins; and lineitem — the
    fact table and only 100-TB-scale input — is pre-aggregated per batch
    to (orderkey, revenue) partials BEFORE its join, so the wide
    exchange carries at most one row per (batch, orderkey), never raw
    line items. The final groupby is O(nations)."""
    from spatialjoincountovershells_ray.pipelines.join import equi_join

    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).map_batches(
        lambda b: pa.table(
            {"n_nationkey": b.column("n_nationkey").cast(pa.int64()), "n_name": b.column("n_name")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"c_custkey": b.column("c_custkey"), "c_nationkey": b.column("c_nationkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust_nat = equi_join(
        customer, nation, "c_nationkey", "n_nationkey", mode="broadcast"
    ).select_columns(["c_custkey", "n_name"])

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    ord_nat = equi_join(orders, cust_nat, "o_custkey", "c_custkey", mode="shuffle").select_columns(
        ["o_orderkey", "n_name"]
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        ep = np.rint(batch.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        dc = np.rint(batch.column("l_discount").to_numpy() * 100).astype(np.int64)
        t = pa.table(
            {"l_orderkey": batch.column("l_orderkey"), "rev": pa.array(ep * (100 - dc), pa.int64())}
        )
        g = t.group_by("l_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    rev = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True)

    joined = equi_join(rev, ord_nat, "l_orderkey", "o_orderkey", mode="shuffle")

    # O(nations) final: pre-sum per batch (<= 25 rows each), merge + sort
    # in one remote task — no Dataset groupby/sort for a 25-row result
    def nat_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["n_name", "rev"]).group_by("n_name").aggregate([("rev", "sum")])
        return g.rename_columns(["n_name", "rev"])

    refs = list(
        joined.map_batches(nat_partial, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
        .to_arrow_refs()
    )

    @ray.remote
    def finish(*parts: pa.Table) -> pa.Table:
        live = [t for t in parts if t.num_rows]
        if not live:
            return pa.table(
                {"n_name": pa.array([], pa.string()), "revenue_e4": pa.array([], pa.int64())}
            )
        t = pa.concat_tables(live, promote_options="none")
        g = t.group_by("n_name").aggregate([("rev", "sum")])
        return pa.table(
            {"n_name": g.column("n_name"), "revenue_e4": g.column("rev_sum").cast(pa.int64())}
        ).sort_by("n_name")

    return ray.data.from_arrow_refs([finish.remote(*refs)])


# ---------------------------------------------------------------------------
# set operators (UNION / INTERSECT / EXCEPT DISTINCT)


def set_op_distinct(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    cols: list[str],
    op: str,
) -> "ray.data.Dataset":
    """Distributed ``UNION`` / ``INTERSECT`` / ``EXCEPT`` DISTINCT over
    ``cols`` -> the distinct key rows satisfying the op, sorted by cols.

    One bounded exchange: each side pre-dedups per batch inside
    map_batches (pyarrow C++ group_by) and ships only distinct key rows
    plus two presence flags, so the exchange carries
    O(distinct-per-batch) rows, never the input. A single
    groupby(cols).max(flags) merges both sides; each set op is then a
    flag predicate (union: any; intersect: both; except: left and not
    right). No reference counterpart (SURVEY 2.7 — the reference has no
    set operators); this is the engine-surface extension.
    """
    if op not in ("union", "intersect", "except"):
        raise ValueError(f"unknown set op {op!r}")

    def tag(inl: int, inr: int):
        def fn(batch: pa.Table) -> pa.Table:
            d = batch.select(cols).group_by(cols).aggregate([])
            n = d.num_rows
            return d.append_column(
                "inl", pa.array(np.full(n, inl, np.int64))
            ).append_column("inr", pa.array(np.full(n, inr, np.int64)))

        return fn

    tagged = left.map_batches(
        tag(1, 0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(tag(0, 1), batch_format="pyarrow", zero_copy_batch=True))
    agg = tagged.groupby(cols).aggregate(
        ray.data.aggregate.Max("inl"), ray.data.aggregate.Max("inr")
    )

    def keep(batch: pa.Table) -> pa.Table:
        inl = batch.column("max(inl)")
        inr = batch.column("max(inr)")
        if op == "union":
            m = pa.array(np.ones(batch.num_rows, bool))
        elif op == "intersect":
            m = pc.and_(pc.equal(inl, 1), pc.equal(inr, 1))
        else:
            m = pc.and_(pc.equal(inl, 1), pc.equal(inr, 0))
        return batch.filter(m).select(cols)

    out = agg.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(cols)


_DAY_US = 86_400_000_000


def user_days_set_op(sf_dir: str, type_a: str, type_b: str, op: str) -> "ray.data.Dataset":
    """(user, day) pairs with a ``type_a`` event <op> pairs with a
    ``type_b`` event — e.g. except: days a user clicked but never
    purchased.

    Specialized plan over the generic :func:`set_op_distinct`: ONE scan
    of events (both type filters pushed as a single ``isin`` predicate)
    instead of two, and the exchange key is the int64 epoch-day, not the
    '%Y-%m-%d' string — per-batch group_by pre-dedups (user, day) and
    ORs the two membership flags, so the shuffle carries three int64
    columns per distinct (user, day) and the date is stringified only
    after aggregation (output rows, not input rows). Epoch-day floor
    equals strftime's calendar date for the naive-UTC timestamps both
    engines use."""
    if op not in ("union", "intersect", "except"):
        raise ValueError(f"unknown set op {op!r}")

    def tag(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        et = batch.column("event_type")
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "day_i": pa.array(us // _DAY_US, pa.int64()),
                "inl": pc.equal(et, type_a).cast(pa.int64()),
                "inr": pc.equal(et, type_b).cast(pa.int64()),
            }
        )
        d = t.group_by(["user_id", "day_i"]).aggregate([("inl", "max"), ("inr", "max")])
        return d.rename_columns(["user_id", "day_i", "inl", "inr"])

    tagged = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
        filter=pc.field("event_type").isin([type_a, type_b]),
    ).map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    agg = tagged.groupby(["user_id", "day_i"]).aggregate(
        ray.data.aggregate.Max("inl"), ray.data.aggregate.Max("inr")
    )

    def keep(batch: pa.Table) -> pa.Table:
        inl = batch.column("max(inl)")
        inr = batch.column("max(inr)")
        if op == "union":
            m = pa.array(np.ones(batch.num_rows, bool))
        elif op == "intersect":
            m = pc.and_(pc.equal(inl, 1), pc.equal(inr, 1))
        else:
            m = pc.and_(pc.equal(inl, 1), pc.equal(inr, 0))
        kept = batch.filter(m)
        day = pc.strftime(
            pc.multiply(kept.column("day_i"), _DAY_US).cast(pa.timestamp("us")),
            format="%Y-%m-%d",
        )
        return pa.table({"user_id": kept.column("user_id"), "day": day})

    out = agg.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["user_id", "day"])


def snapshot_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key: str,
    compare_cols: list[str],
) -> "ray.data.Dataset":
    """Change-data-capture diff of two snapshot versions of a keyed
    table: -> {key, change} with change in ('added', 'removed',
    'changed'), sorted by key. Unchanged rows are dropped map-side.

    Physical plan: tag each side with a presence flag, union, one
    key-hash bucket exchange so every key's two versions meet in one
    bucket, then a per-bucket pyarrow full-outer join classifies.
    The exchange carries key + compared columns only (project before
    calling for wide tables); output is bounded by the churn, never
    the snapshot size. Keys must be unique per snapshot (enforced:
    the per-bucket join would otherwise fan out, so each bucket
    asserts key uniqueness and fails loudly)."""
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    cols = [key] + list(compare_cols)

    def tag(val: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(cols)
            return t.append_column(
                "_in_old", pa.array(np.full(t.num_rows, val, np.int8))
            )

        return fn

    tagged = old.map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True
    ).union(new.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True))

    def classify(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {key: pa.array([], pa.int64()), "change": pa.array([], pa.string())}
        )
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return empty
        in_old = tbl.column("_in_old").to_numpy().astype(bool)
        o = tbl.filter(in_old).select(cols)
        n = tbl.filter(~in_old).select(cols)
        for side in (o, n):
            if side.num_rows and side.column(key).null_count == 0:
                k = side.column(key).to_numpy()
                if len(np.unique(k)) != len(k):
                    raise ValueError(f"snapshot_diff requires unique {key!r} per snapshot")
        o = o.append_column("_po", pa.array(np.ones(o.num_rows, np.int8)))
        n = n.append_column("_pn", pa.array(np.ones(n.num_rows, np.int8)))
        j = o.join(n, keys=[key], join_type="full outer", right_suffix="_n")
        po = pc.fill_null(j.column("_po"), 0).to_numpy().astype(bool)
        pn = pc.fill_null(j.column("_pn"), 0).to_numpy().astype(bool)
        same = np.ones(j.num_rows, dtype=bool)
        for c in compare_cols:
            eq = pc.equal(j.column(c), j.column(f"{c}_n"))
            same &= pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
        kv = j.column(key).to_numpy()
        out_k, out_c = [], []
        for mask, label in (
            (~po & pn, "added"),
            (po & ~pn, "removed"),
            (po & pn & ~same, "changed"),
        ):
            if mask.any():
                out_k.append(kv[mask])
                out_c.append(np.full(int(mask.sum()), label, dtype=object))
        if not out_k:
            return empty
        return pa.table(
            {
                key: pa.array(np.concatenate(out_k), pa.int64()),
                "change": pa.array(np.concatenate(out_c), pa.string()),
            }
        )

    return keyed_partition_apply(tagged, key, classify).sort(key)


def band_self_join(
    ds: "ray.data.Dataset",
    key: str,
    val: str,
    delta: float,
    bucket_width: float = 500.0,
) -> "ray.data.Dataset":
    """1-D band self-join: -> {key_lo, key_hi, diff} for every row pair
    with |val_a - val_b| <= ``delta`` (distinct keys), sorted. The
    inequality-join (IEJoin-class) primitive: near-equal prices,
    near-simultaneous timestamps, sensor-value collisions.

    Physical plan — overlapping range partitioner: each row lands in
    value bucket floor(v / W) and is REPLICATED into the bucket below
    when it sits within delta of that boundary (W >> delta, so <= 1
    extra copy per row). Any qualifying pair then coexists in the
    bucket of its smaller value, which uniquely OWNS the pair (pairs
    whose lower row is a replica are emitted by that row's native
    bucket instead) — every pair exactly once with no cross-bucket
    talk. Per bucket one sort + one vectorized searchsorted window
    builds candidates; the exact |a-b| <= delta filter runs elementwise
    so float boundary semantics match the SQL twin bit-for-bit (the
    window bound uses a small slack and never decides inclusion).
    The exchange carries (bucket, key, val) triples; work per bucket is
    O(n log n + pairs)."""
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    if delta <= 0 or bucket_width <= 4 * delta:
        raise ValueError("band_self_join needs 0 < delta << bucket_width")

    def assign(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy()
        v = batch.column(val).to_numpy()
        b = np.floor(v / bucket_width).astype(np.int64)
        near_low = (v - b * bucket_width) <= delta * 1.01
        kk = np.concatenate([k, k[near_low]])
        vv = np.concatenate([v, v[near_low]])
        bb = np.concatenate([b, b[near_low] - 1])
        return pa.table(
            {
                "vb": pa.array(bb, pa.int64()),
                key: pa.array(kk, pa.int64()),
                val: pa.array(vv, pa.float64()),
            }
        )

    def kernel(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key_lo": pa.array([], pa.int64()),
                "key_hi": pa.array([], pa.int64()),
                "diff": pa.array([], pa.float64()),
            }
        )
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return empty
        vb = tbl.column("vb").to_numpy()
        k = tbl.column(key).to_numpy()
        v = tbl.column(val).to_numpy()
        order = np.lexsort((k, v, vb))
        vb, k, v = vb[order], k[order], v[order]
        native = np.floor(v / bucket_width).astype(np.int64) == vb
        # candidate window per row i: rows j > i in the same vb-run with
        # v[j] <= v[i] + delta (slack-widened; exact filter below)
        starts = np.flatnonzero(np.r_[True, vb[1:] != vb[:-1]])
        ends = np.r_[starts[1:], len(vb)]
        hi = np.empty(len(v), np.int64)
        for s, e in zip(starts, ends):  # one iteration per value bucket
            hi[s:e] = s + np.searchsorted(v[s:e], v[s:e] + delta * 1.001, side="right")
        lo = np.arange(len(v)) + 1
        cnt = np.maximum(hi - lo, 0)
        # pairs owned here only when the LOWER row is native to this bucket
        cnt = np.where(native, cnt, 0)
        if int(cnt.sum()) == 0:
            return empty
        ii = np.repeat(np.arange(len(v)), cnt)
        jj = np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt) + ii + 1
        exact = np.abs(v[jj] - v[ii]) <= delta
        a, b = k[ii[exact]], k[jj[exact]]
        d = np.abs(v[jj[exact]] - v[ii[exact]])
        keep = a != b
        a, b, d = a[keep], b[keep], d[keep]
        return pa.table(
            {
                "key_lo": pa.array(np.minimum(a, b), pa.int64()),
                "key_hi": pa.array(np.maximum(a, b), pa.int64()),
                "diff": pa.array(d, pa.float64()),
            }
        )

    assigned = ds.select_columns([key, val]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
    return keyed_partition_apply(assigned, "vb", kernel).sort(["key_lo", "key_hi"])


# ---------------------------------------------------------------------------
# data-quality audit


def dq_checks(
    ds: "ray.data.Dataset",
    *,
    not_null: list[str] = (),
    positive: list[str] = (),
    unique: list[str] = (),
    in_set: dict[str, "object"] | None = None,
) -> "ray.data.Dataset":
    """-> rule:string, n_bad:int64 (sorted by rule) — the validation
    audit a production ingest runs before promoting a table: NULL
    checks, positivity/range checks, primary-key uniqueness (n_bad =
    rows minus distinct keys) and referential-integrity checks against
    broadcast key sets (`in_set[col]` is a sorted int64 np.ndarray of
    valid keys — ship the anti-join through equi_join instead when the
    reference side stops fitting a broadcast).

    Map-side: every rule except `unique` folds to one (rule, count) row
    per batch. `unique` pre-counts keys per batch, finishes the count in
    one key groupby, then folds sum(cnt-1) — the exchange carries key
    partials for the unique columns only. Always emits every rule row
    (n_bad = 0 included), so a green run is distinguishable from a rule
    that never executed."""
    in_set = in_set or {}
    if not (list(not_null) or list(positive) or list(unique) or in_set):
        raise ValueError("dq_checks: no rules given")
    refs = {c: ray.put(np.asarray(v, dtype=np.int64)) for c, v in in_set.items()}
    rule_names = (
        [f"not_null:{c}" for c in not_null]
        + [f"positive:{c}" for c in positive]
        + [f"in_set:{c}" for c in in_set]
    )

    def partial(batch: pa.Table) -> pa.Table:
        rules, counts = [], []
        for c in not_null:
            rules.append(f"not_null:{c}")
            counts.append(batch.column(c).null_count)
        for c in positive:
            v = batch.column(c)
            bad = pc.sum(
                pc.cast(pc.or_kleene(pc.less_equal(v, 0), pc.is_null(v)), pa.int64())
            ).as_py()
            rules.append(f"positive:{c}")
            counts.append(int(bad or 0))
        for c, r in refs.items():
            valid = ray.get(r)
            vals = batch.column(c).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(valid, vals)
            pos = np.minimum(pos, max(len(valid) - 1, 0))
            ok = valid[pos] == vals if len(valid) else np.zeros(len(vals), bool)
            rules.append(f"in_set:{c}")
            counts.append(int((~ok).sum()))
        return pa.table(
            {
                "rule": pa.array(rules, pa.string()),
                "n_bad": pa.array(np.asarray(counts, np.int64), pa.int64()),
            }
        )

    # ONE Dataset groupby merges every rule's partials at the end; the
    # branches feed it raw (rule, n_bad) partial rows. (The previous plan
    # aggregated each branch separately — 4 Dataset all-to-alls whose
    # fixed barrier cost dominated a milliseconds-of-compute audit.)
    parts = [
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    ] if rule_names else []

    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    for c in unique:
        def key_partial(batch: pa.Table, col=c) -> pa.Table:
            g = (
                batch.select([col])
                .group_by(col)
                .aggregate([([], "count_all")])
                .rename_columns(["k", "n"])
            )
            return g

        def bucket_dups(tbl: pa.Table, col=c) -> pa.Table:
            # keys are whole inside a bucket: per-key totals via one
            # sort+reduceat, fold straight to the bucket's n_bad partial
            if tbl.num_rows == 0:
                return pa.table(
                    {"rule": pa.array([], pa.string()), "n_bad": pa.array([], pa.int64())}
                )
            k = tbl.column("k").to_numpy()
            n = tbl.column("n").to_numpy()
            order = np.argsort(k, kind="stable")
            totals = np.add.reduceat(n[order], np.flatnonzero(np.r_[True, k[order][1:] != k[order][:-1]]))
            return pa.table(
                {
                    "rule": pa.array([f"unique:{col}"], pa.string()),
                    "n_bad": pa.array([int((totals - 1).sum())], pa.int64()),
                }
            )

        keyed = ds.map_batches(key_partial, batch_format="pyarrow", zero_copy_batch=True)
        parts.append(keyed_partition_apply(keyed, "k", bucket_dups))

    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)

    # O(rules) final: the audit result is a handful of (rule, n_bad)
    # rows, so merge + sort in ONE remote task instead of paying a
    # Dataset groupby + sort barrier pair (same plan as revenue_by_nation)
    refs = list(merged.materialize().to_arrow_refs())

    @ray.remote
    def finish(*tabs: pa.Table) -> pa.Table:
        live = [t for t in tabs if t.num_rows]
        if not live:
            return pa.table(
                {"rule": pa.array([], pa.string()), "n_bad": pa.array([], pa.int64())}
            )
        t = pa.concat_tables(live, promote_options="none")
        g = t.group_by("rule").aggregate([("n_bad", "sum")])
        return pa.table(
            {"rule": g.column("rule"), "n_bad": g.column("n_bad_sum").cast(pa.int64())}
        ).sort_by("rule")

    return ray.data.from_arrow_refs([finish.remote(*refs)])


# ---------------------------------------------------------------------------
# unpivot (melt): wide measures -> long (name, value) rows


UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def lineitem_unpivot(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> l_orderkey, l_linenumber, measure:string, val:double — the
    UNPIVOT/melt relational op: the four lineitem measure columns turned
    into one (name, value) row each (4x fan-out). Pure map: each batch
    emits its four slices locally (values pass through untouched, so
    bit-exactness is free); no exchange, no state — the shape that lets
    a wide fact table feed a generic (key, measure, value) consumer."""

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parts = []
        for m in UNPIVOT_MEASURES:
            parts.append(
                pa.table(
                    {
                        "l_orderkey": batch.column("l_orderkey"),
                        "l_linenumber": batch.column("l_linenumber").cast(pa.int64()),
                        "measure": pa.repeat(pa.scalar(m, pa.string()), n),
                        "val": batch.column(m).cast(pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts, promote_options="none")

    return ds.select_columns(
        ["l_orderkey", "l_linenumber", *UNPIVOT_MEASURES]
    ).map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# CDC apply (MERGE/upsert): snapshot_diff's inverse


def apply_changes(
    base: "ray.data.Dataset",
    changes: "ray.data.Dataset",
    key: str,
    payload_cols: list[str],
) -> "ray.data.Dataset":
    """MERGE a CDC change table into a keyed snapshot: -> the new
    snapshot (key + payload_cols, sorted by key). ``changes`` carries
    {key, op, payload_cols} with op in ('upsert', 'delete'): upsert
    replaces the keyed row or inserts it, delete removes it —
    :func:`snapshot_diff`'s inverse, the lakehouse MERGE INTO shape.

    Physical plan: tag each side, union, one key-hash bucket exchange
    (each key's base row and its change meet in exactly one bucket),
    then a vectorized per-bucket resolve: base rows whose key appears in
    the change set drop, upsert rows emit as-is. The exchange carries
    key + payload columns only; no side is broadcast, so the change
    table may be arbitrarily large (a full-snapshot restatement is just
    a big change table). Keys must be unique per side (asserted per
    bucket — a fan-out MERGE is a bug, not a join)."""
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    cols = [key] + list(payload_cols)

    def tag_base(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        return t.append_column("_op", pa.repeat(pa.scalar("base", pa.string()), t.num_rows))

    def tag_change(batch: pa.Table) -> pa.Table:
        return batch.select(cols + ["_op"]) if "_op" in batch.column_names else batch.select(cols + ["op"]).rename_columns(cols + ["_op"])

    tagged = base.map_batches(
        tag_base, batch_format="pyarrow", zero_copy_batch=True
    ).union(changes.map_batches(tag_change, batch_format="pyarrow", zero_copy_batch=True))

    def resolve(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return pa.table(
                {c: pa.array([], pa.int64() if c == key else pa.string()) for c in cols}
            )
        op = tbl.column("_op").to_numpy(zero_copy_only=False)
        is_base = op == "base"
        b = tbl.filter(pa.array(is_base)).select(cols)
        ch = tbl.filter(pa.array(~is_base))
        bk = b.column(key).to_numpy()
        ck = ch.column(key).to_numpy()
        for side_k, side in ((bk, "base"), (ck, "changes")):
            if len(side_k) and len(np.unique(side_k)) != len(side_k):
                raise ValueError(f"apply_changes: duplicate keys in {side}")
        keep = ~np.isin(bk, ck)
        ups = ch.filter(pa.compute.equal(ch.column("_op"), "upsert")).select(cols)
        return pa.concat_tables([b.filter(pa.array(keep)), ups], promote_options="none")

    return keyed_partition_apply(tagged, key, resolve).sort(key)


def maintain_group_agg(
    base: "ray.data.Dataset",
    changes: "ray.data.Dataset",
    key: str,
    group_col: str,
    val_col: str,
) -> "ray.data.Dataset":
    """-> group_col, n:int64, s:int64 — incremental maintenance of a
    grouped (count, sum) aggregate under a compacted CDC change table
    (at most one change per key — latest_events is the compactor):
    agg(apply_changes(base, changes)) computed WITHOUT re-aggregating
    unchanged rows through the group exchange twice. The lakehouse
    materialized-view maintenance shape: at scale the base aggregate is
    the stored MV (O(groups)), and the only per-change work is the
    keyed lookup of old rows — a broadcast semi-filter (sorted change
    keys via ray.put, one searchsorted membership per batch) drops
    unchanged base rows BEFORE the key exchange, so the delta exchange
    carries O(changes) base rows, not the snapshot. Precondition: the
    distinct change-key set fits one task (the same broadcast-side
    contract as the curation droplist; past that size, switch to its
    shuffle anti-join pattern).

    changes schema: {key, op in ('upsert','delete'), group_col, val_col}
    — an upsert of an existing key retracts the old row's contribution
    (possibly from a DIFFERENT group: group moves are handled) and adds
    the new one; an insert adds; a delete of a missing key is a no-op.
    Groups whose count reaches zero drop from the output, matching the
    full-recompute GROUP BY."""
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def base_partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([group_col, val_col])
            .group_by(group_col)
            .aggregate([([], "count_all"), (val_col, "sum")])
        )
        return pa.table(
            {
                group_col: g.column(group_col),
                "dn": pc.cast(g.column("count_all"), pa.int64()),
                "ds": pc.cast(g.column(f"{val_col}_sum"), pa.int64()),
            }
        )

    agg_parts = base.map_batches(base_partial, batch_format="pyarrow", zero_copy_batch=True)

    # distinct change keys, folded per block then once on the driver
    # (O(changes) ints — the broadcast-side contract), shipped via ray.put
    @ray.remote
    def _block_keys(tbl: pa.Table) -> np.ndarray:
        if tbl.num_rows == 0 or key not in tbl.schema.names:
            return np.empty(0, np.int64)
        return np.unique(tbl.column(key).to_numpy())

    ck_parts = ray.get(
        [
            _block_keys.remote(r)
            for r in changes.select_columns([key]).materialize().to_arrow_refs()
        ]
    )
    ckeys = (
        np.unique(np.concatenate(ck_parts)) if ck_parts else np.empty(0, np.int64)
    )
    ck_ref = ray.put(ckeys)

    # delta side: co-locate each changed key with its base row; the
    # semi-filter keeps only base rows whose key is in the change set
    def tag_base(batch: pa.Table) -> pa.Table:
        ck = ray.get(ck_ref)
        k = batch.column(key).to_numpy()
        if len(ck):
            pos = np.searchsorted(ck, k)
            hit = (pos < len(ck)) & (ck[np.minimum(pos, len(ck) - 1)] == k)
        else:
            hit = np.zeros(len(k), bool)
        idx = pa.array(np.flatnonzero(hit), pa.int64())
        return pa.table(
            {
                key: batch.column(key).take(idx),
                group_col: batch.column(group_col).take(idx),
                val_col: pc.cast(batch.column(val_col).take(idx), pa.int64()),
                "_op": pa.array(np.zeros(len(idx), np.int64), pa.int64()),
            }
        )

    def tag_change(batch: pa.Table) -> pa.Table:
        op = pc.if_else(
            pc.equal(batch.column("op"), "delete"),
            pa.scalar(2, pa.int64()),
            pa.scalar(1, pa.int64()),
        )
        return pa.table(
            {
                key: batch.column(key),
                group_col: batch.column(group_col),
                val_col: pc.cast(batch.column(val_col), pa.int64()),
                "_op": op,
            }
        )

    tagged = base.map_batches(
        tag_base, batch_format="pyarrow", zero_copy_batch=True
    ).union(changes.map_batches(tag_change, batch_format="pyarrow", zero_copy_batch=True))

    def delta_kernel(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: pa.array([], pa.int64()),
                "dn": pa.array([], pa.int64()),
                "ds": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0 or "_op" not in tbl.schema.names:
            return empty
        op = tbl.column("_op").to_numpy()
        k = tbl.column(key).to_numpy()
        g = tbl.column(group_col).to_numpy()
        v = tbl.column(val_col).to_numpy()
        bmask = op == 0
        bk, bg, bv = k[bmask], g[bmask], v[bmask]
        order = np.argsort(bk, kind="stable")
        bk, bg, bv = bk[order], bg[order], bv[order]
        gs, dns, dss = [], [], []
        for m, sign_new in ((1, 1), (2, 0)):  # upsert adds new row, delete doesn't
            cm = op == m
            if not cm.any():
                continue
            ck, cg, cv = k[cm], g[cm], v[cm]
            pos = np.searchsorted(bk, ck)
            pos_c = np.minimum(pos, max(len(bk) - 1, 0))
            hit = (bk[pos_c] == ck) if len(bk) else np.zeros(len(ck), bool)
            # retract old contributions of matched keys
            gs.append(bg[pos_c[hit]])
            dns.append(np.full(hit.sum(), -1, np.int64))
            dss.append(-bv[pos_c[hit]])
            if sign_new:  # upserts (matched -> replace; unmatched -> insert)
                gs.append(cg)
                dns.append(np.ones(len(ck), np.int64))
                dss.append(cv)
        if not gs:
            return empty
        return pa.table(
            {
                group_col: pa.array(np.concatenate(gs), pa.int64()),
                "dn": pa.array(np.concatenate(dns), pa.int64()),
                "ds": pa.array(np.concatenate(dss), pa.int64()),
            }
        )

    deltas = keyed_partition_apply(tagged, key, delta_kernel)

    def merge_kernel(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or group_col not in tbl.schema.names:
            return pa.table(
                {
                    group_col: pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        g = (
            tbl.select([group_col, "dn", "ds"])
            .group_by(group_col)
            .aggregate([("dn", "sum"), ("ds", "sum")])
        )
        out = pa.table(
            {
                group_col: g.column(group_col),
                "n": pc.cast(g.column("dn_sum"), pa.int64()),
                "s": pc.cast(g.column("ds_sum"), pa.int64()),
            }
        )
        return out.filter(pc.greater(out.column("n"), 0))

    merged = keyed_partition_apply(agg_parts.union(deltas), group_col, merge_kernel)
    return merged.sort(group_col)
