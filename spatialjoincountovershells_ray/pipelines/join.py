"""General equi-join with broadcast and shuffle physical plans.

Engine extension (the reference's only join surfaces are the spatial
range joins and the halo id-filter semi-join, SURVEY.md §2); a complete
engine needs a row-emitting relational join. Two plans, same logical
result:

- ``mode='broadcast'``: the small side is put in the object store ONCE
  and every map task joins its batch against it with pyarrow's C++ hash
  join — the big side streams, nothing shuffles. Precondition: the small
  side fits a worker's heap (same contract as the shell-count broadcast
  plan).
- ``mode='shuffle'``: both sides are hash-partitioned on the key with
  the same explicit bucket exchange the spatial shuffle plans use
  (stages/exchange.split_by_key), then one task per bucket joins its
  co-partitioned parts. Neither side is ever driver-materialized; bucket
  count tracks cluster CPUs.

Integer keys bucket directly (``% nbuckets``); string keys are
pre-hashed per batch with the vectorized ``text_hash128`` into a hidden
``__jk`` column used ONLY for co-location — the per-bucket join still
matches on the real key, so hash collisions cannot produce wrong rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from spatialjoincountovershells_ray.stages.exchange import split_by_key
from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

_JK = "__jk"

# Broadcast joins each left batch independently against the full right
# table, so join types that preserve unmatched RIGHT rows (right/full
# outer, right semi/anti) would emit them once per left batch — refuse
# rather than silently duplicate (same contract as the salt>1 guard).
_BCAST_SAFE_TYPES = frozenset({"inner", "left outer", "left semi", "left anti"})


class _BcastJoiner:
    """Per-worker cached broadcast-join kernel (driven by run_cached_bcast)."""

    def __init__(self, ref, left_key: str, right_key: str, join_type: str):
        self.rtbl: pa.Table = ray.get(ref[0])
        self.left_key, self.right_key, self.join_type = left_key, right_key, join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        if pa.types.is_null(self.rtbl.column(self.right_key).type):
            # zero-row pandas-origin broadcast side arrives null-typed
            self.rtbl = _fix_null_key(
                self.rtbl, self.right_key, batch.column(self.left_key).type
            )
        return batch.join(
            self.rtbl,
            keys=[self.left_key],
            right_keys=[self.right_key],
            join_type=self.join_type,
        )


def _arrow_schema(ds: "ray.data.Dataset") -> pa.Schema | None:
    """The dataset's schema as a pyarrow schema (None when unknown).
    Pandas-block datasets report a PandasBlockSchema of numpy dtypes —
    map those to Arrow types (object dtype -> string)."""
    try:
        sch = getattr(ds.schema(fetch_if_missing=False), "base_schema", None)
    except Exception:  # noqa: BLE001 — empty datasets may refuse schema()
        return None
    if isinstance(sch, pa.Schema):
        return sch
    names = getattr(sch, "names", None)
    types = getattr(sch, "types", None)
    if not names or types is None:
        return None
    fields = []
    for n, t in zip(names, types):
        if isinstance(t, pa.DataType):
            fields.append((n, t))
        else:
            try:
                fields.append((n, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, TypeError, ValueError):
                fields.append((n, pa.string()))
    return pa.schema(fields)


def _typed_empty(ds: "ray.data.Dataset", key: str, key_type: pa.DataType) -> pa.Table:
    """A zero-row Arrow table with the dataset's schema (for zero-block
    sides: pa.concat_tables([]) raises, so shuffle buckets need at least
    one typed empty part per side). A schema-less empty dataset (e.g.
    ``ray.data.from_arrow([])``) falls back to just the key column, typed
    like the other side's key, so the per-bucket join still resolves."""
    sch = _arrow_schema(ds)
    if sch is not None and sch.names:
        return pa.table({f.name: pa.array([], f.type) for f in sch})
    return pa.table({key: pa.array([], key_type)})


def _with_string_key_hash(ds: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    def add(batch: pa.Table) -> pa.Table:
        from spatialjoincountovershells_ray.functions.text import text_hash128

        h1, _ = text_hash128(batch.column(key))
        return batch.append_column(_JK, pa.array(h1, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


@ray.remote
def _split_salted(
    block: pa.Table, col: str, nbuckets: int, salt: int, replicate: bool
) -> "list[pa.Table]":
    """Skew-aware shuffle split into nbuckets*salt sub-buckets.

    The probe side (``replicate=False``) spreads the rows of each key
    bucket round-robin across its ``salt`` sub-buckets, so one hot key's
    rows land on ``salt`` different join tasks instead of one. The build
    side (``replicate=True``) is copied into every sub-bucket of its key
    bucket, so each probe row still meets ALL rows of its key — inner,
    semi and anti results are unchanged, only the hot key's work is
    split. (The spatial plans salt hot cells the same way,
    stages/salt.py.)"""
    import numpy as np

    ntot = nbuckets * salt
    if block.num_rows == 0:
        return [block.slice(0, 0)] * ntot
    k = block.column(col).to_numpy()
    if replicate:
        reps = []
        base = (k % nbuckets) * salt
        for s in range(salt):
            reps.append((block, base + s))
        tbl = pa.concat_tables([b for b, _ in reps], promote_options="none")
        bucket = np.concatenate([b for _, b in reps])
    else:
        tbl = block
        bucket = (k % nbuckets) * salt + (np.arange(len(k), dtype=np.int64) % salt)
    order = np.argsort(bucket, kind="stable")
    sorted_tbl = tbl.take(pa.array(order, pa.int64()))
    sb = bucket[order]
    bounds = np.searchsorted(sb, np.arange(ntot + 1))
    return [sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(ntot)]


def _fix_null_key(tbl: pa.Table, key: str, want: pa.DataType) -> pa.Table:
    """Re-type a null-typed key column on an EMPTY table (Ray converts a
    zero-row pandas block to Arrow with null-typed columns, which
    pyarrow's hash join refuses as a key)."""
    idx = tbl.schema.get_field_index(key)
    if idx >= 0 and tbl.num_rows == 0 and pa.types.is_null(tbl.column(idx).type):
        return tbl.set_column(idx, key, pa.array([], want))
    return tbl


@ray.remote
def _join_bucket(
    left_key: str, right_key: str, join_type: str, nleft: int, *parts: pa.Table
) -> pa.Table:
    """Join the co-partitioned left parts against the right parts."""
    left = pa.concat_tables(parts[:nleft], promote_options="none")
    right = pa.concat_tables(parts[nleft:], promote_options="none")
    lt, rt = left.column(left_key).type, right.column(right_key).type
    if pa.types.is_null(lt):
        left = _fix_null_key(left, left_key, rt if not pa.types.is_null(rt) else pa.int64())
    if pa.types.is_null(rt):
        right = _fix_null_key(right, right_key, lt if not pa.types.is_null(lt) else pa.int64())
    lkeys, rkeys = [left_key], [right_key]
    if _JK in left.column_names and _JK in right.column_names:
        # the hash rides as a second join key: equivalent predicate (it is
        # a function of the key) and pyarrow drops right-side keys for us
        lkeys.append(_JK)
        rkeys.append(_JK)
    out = left.join(right, keys=lkeys, right_keys=rkeys, join_type=join_type)
    return out.drop_columns([_JK]) if _JK in out.column_names else out


def equi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    *,
    mode: str = "broadcast",
    join_type: str = "inner",
    nbuckets: int | None = None,
    salt: int = 1,
    auto_broadcast_bytes: float = 2 * 1024**3,
) -> "ray.data.Dataset":
    """Row-emitting equi-join of two Datasets on int64 key columns.

    Output columns: all left columns then the right columns except its
    key (pyarrow join semantics). Row order is plan-dependent —
    consumers needing an order sort explicitly.

    ``salt > 1`` (shuffle mode only) splits each key bucket into salt
    sub-buckets: left rows round-robin across them, right rows replicated
    into all of them — a hot left key's rows are joined by ``salt``
    tasks instead of one. Result-identical for inner/semi/anti.

    ``mode='auto'`` broadcasts iff the right side's (metadata-estimated)
    bytes fit the per-worker budget — the same cost model as the spatial
    plans' auto mode.
    """
    if mode == "auto":
        try:
            sz = right.size_bytes()
        except Exception:  # noqa: BLE001 — schema-only estimate unavailable
            sz = None
        if sz is None:
            sz = right.count() * 64
        mode = (
            "broadcast"
            if sz <= auto_broadcast_bytes and join_type in _BCAST_SAFE_TYPES
            else "shuffle"
        )

    if mode == "broadcast":
        if join_type not in _BCAST_SAFE_TYPES:
            raise ValueError(
                f"broadcast mode would duplicate unmatched right rows for "
                f"join_type {join_type!r}; use mode='shuffle' "
                f"(broadcast supports {sorted(_BCAST_SAFE_TYPES)})"
            )
        # concat the small side worker-side: the blocks never round-trip
        # through the driver, and the join tasks block on this ref so the
        # collect overlaps the left side's read
        @ray.remote
        def _concat(*parts: pa.Table) -> pa.Table:
            ne = [p for p in parts if p.num_rows > 0]
            return pa.concat_tables(ne, promote_options="none") if ne else parts[0]

        rrefs = right.materialize().to_arrow_refs()
        if rrefs:
            rtbl_ref = _concat.remote(*rrefs)
        else:  # zero-block right side: join against an empty typed table
            lsch = _arrow_schema(left)
            kt = (
                lsch.field(left_key).type
                if lsch is not None and left_key in lsch.names
                else pa.int64()
            )
            rtbl_ref = ray.put(_typed_empty(right, right_key, kt))

        # task mode + per-worker kernel cache: scales to every CPU (an
        # actor pool capped at 8 workers lost ~3x to the shuffle plan at
        # 32 CPUs — see stages/join_kernels.run_cached_bcast)
        return left.map_batches(
            run_cached_bcast,
            fn_kwargs={
                "cls": _BcastJoiner,
                "ref_list": [rtbl_ref],
                "ctor_kwargs": {
                    "left_key": left_key,
                    "right_key": right_key,
                    "join_type": join_type,
                },
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    if mode != "shuffle":
        raise ValueError(f"unknown join mode {mode!r}")

    if salt > 1 and join_type not in ("inner", "left semi", "left anti"):
        # build-side replication double-emits unmatched right rows under
        # right/full outer joins — refuse rather than silently corrupt
        raise ValueError(f"salt > 1 is only result-identical for inner/semi/anti, not {join_type!r}")

    nbuckets = nbuckets or max(8, int(ray.cluster_resources().get("CPU", 8)))
    lsplit_key, rsplit_key = left_key, right_key
    sch = left.schema()
    # a zero-block left side has no schema: fall back to the right side's
    # (key types match by contract), defaulting to a non-string key
    if sch is None:
        sch = right.schema()
    ktype = (
        dict(zip(sch.names, sch.types)).get(right_key if left.schema() is None else left_key)
        if sch is not None
        else None
    )
    if isinstance(ktype, pa.DataType):
        is_string_key = pa.types.is_string(ktype) or pa.types.is_large_string(ktype)
    else:  # pandas-block schema: a numpy dtype or a bare Python type
        is_string_key = ktype in (object, str) or getattr(ktype, "kind", "") in ("O", "U")
    if is_string_key:
        left = _with_string_key_hash(left, left_key)
        right = _with_string_key_hash(right, right_key)
        lsplit_key = rsplit_key = _JK
    salt = max(1, int(salt))
    ntot = nbuckets * salt
    lmat, rmat = left.materialize(), right.materialize()
    # zero-block sides get one typed empty block: every bucket task then
    # sees a schema-bearing part on both sides (concat_tables([]) raises)
    lrefs, rrefs = lmat.to_arrow_refs(), rmat.to_arrow_refs()
    if not lrefs or not rrefs:

        def _key_type(mat, k):
            sch = _arrow_schema(mat)
            if sch is not None and k in sch.names:
                return sch.field(k).type
            return None

        kt = _key_type(lmat, left_key) or _key_type(rmat, right_key) or pa.int64()
        if not lrefs:
            lrefs = [ray.put(_typed_empty(lmat, left_key, kt))]
        if not rrefs:
            rrefs = [ray.put(_typed_empty(rmat, right_key, kt))]
    if salt == 1:
        lsplits = [
            split_by_key.options(num_returns=nbuckets).remote(b, lsplit_key, nbuckets)
            for b in lrefs
        ]
        rsplits = [
            split_by_key.options(num_returns=nbuckets).remote(b, rsplit_key, nbuckets)
            for b in rrefs
        ]
    else:
        lsplits = [
            _split_salted.options(num_returns=ntot).remote(b, lsplit_key, nbuckets, salt, False)
            for b in lrefs
        ]
        rsplits = [
            _split_salted.options(num_returns=ntot).remote(b, rsplit_key, nbuckets, salt, True)
            for b in rrefs
        ]
    out = [
        _join_bucket.remote(
            left_key,
            right_key,
            join_type,
            len(lsplits),
            *[s[bi] for s in lsplits],
            *[s[bi] for s in rsplits],
        )
        for bi in range(ntot)
    ]
    return ray.data.from_arrow_refs(out)


@ray.remote
def _bloom_partial(block: pa.Table, key: str, nbits: int, nhashes: int):
    """Packed bitmap (uint8[nbits/8]) of one build-side block's keys."""
    import numpy as np

    from spatialjoincountovershells_ray.functions.hashing import bloom_positions

    bits = np.zeros(nbits // 8, np.uint8)
    if block.num_rows:
        pos = bloom_positions(block.column(key).to_numpy(), nbits, nhashes).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


@ray.remote
def _or_bitmaps(*parts):
    import numpy as np

    out = parts[0].copy()
    for p in parts[1:]:
        np.bitwise_or(out, p, out=out)
    return out


class _BloomProbe:
    """Per-worker cached bloom probe (driven by run_cached_bcast): keeps
    a left row iff ALL nhashes bits of its key are set."""

    def __init__(self, ref, key: str, nbits: int, nhashes: int):
        self.bits = ray.get(ref[0])
        self.key, self.nbits, self.nhashes = key, nbits, nhashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from spatialjoincountovershells_ray.functions.hashing import bloom_positions

        if batch.num_rows == 0:
            return batch
        pos = bloom_positions(batch.column(self.key).to_numpy(), self.nbits, self.nhashes)
        hit = (self.bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return batch.filter(pa.array(hit.all(axis=1)))


def bloom_semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    *,
    nbits: int = 1 << 23,
    nhashes: int = 4,
    verify: bool = True,
    nbuckets: int | None = None,
) -> "ray.data.Dataset":
    """Bloom-prefiltered semi join on int64 keys: result-identical to
    ``equi_join(..., join_type='left semi')`` (the SQL EXISTS), planned
    for the case where LEFT is enormous and mostly non-matching.

    Physical plan: (1) each build-side block folds its keys into a packed
    bitmap (one remote task per block, O(nbits/8) output — 1 MiB at the
    2^23 default), tree-ORed 16 refs at a time; (2) the bitmap is
    broadcast once and every left batch drops rows whose key misses any
    of the ``nhashes`` bits — Bloom filters have NO false negatives, so
    no matching row is lost; (3) the bounded survivor set goes through
    the exact shuffle semi join, which removes the false positives.

    At 100 TB the exchange therefore carries ``|matches| + eps*|left|``
    rows instead of ``|left|`` (eps ~ (1-e^{-kn/m})^k; ~0.2% at the
    defaults for 1e6 build keys) — the bitmap is the only broadcast
    state and its size is independent of either side's row count.
    ``verify=False`` skips step 3 for callers that tolerate the
    documented false-positive rate (e.g. a pre-screen feeding an exact
    downstream join anyway).
    """
    from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

    rmat = right.materialize()
    rrefs = rmat.to_arrow_refs()
    partials = [_bloom_partial.remote(b, right_key, nbits, nhashes) for b in rrefs]
    while len(partials) > 1:  # 16-ary OR-reduce tree
        partials = [
            _or_bitmaps.remote(*partials[i : i + 16]) for i in range(0, len(partials), 16)
        ]
    if not partials:  # zero-block build side: nothing can match
        import numpy as np

        partials = [ray.put(np.zeros(nbits // 8, np.uint8))]
    bits_ref = partials[0]

    survivors = left.map_batches(
        run_cached_bcast,
        fn_kwargs={
            "cls": _BloomProbe,
            "ref_list": [bits_ref],
            "ctor_kwargs": {"key": left_key, "nbits": nbits, "nhashes": nhashes},
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if not verify:
        return survivors
    return equi_join(
        survivors,
        rmat.select_columns([right_key]),
        left_key,
        right_key,
        mode="shuffle",
        join_type="left semi",
        nbuckets=nbuckets,
    )


# ---------------------------------------------------------------------------
# Sort-merge physical plan: sampled range partitioning + per-bucket
# vectorized merge join. Third plan for the same logical equi-join —
# what it buys over the hash-bucket shuffle is ORDER: buckets are key
# RANGES in ascending order and each bucket emits rows sorted by the
# left key, so the result is globally key-ordered with no Dataset.sort
# barrier afterwards (the plan a sorted sink or a downstream merge
# consumer wants). Same sample-based boundary selection Ray Data's own
# sort uses; the driver sees only O(blocks * sample_cap) int64 samples.

_SMJ_TYPES = frozenset({"inner", "left outer", "left semi", "left anti"})


@ray.remote
def _key_quantile_sample(block: pa.Table, key: str, cap: int) -> "object":
    import numpy as np

    col = block.column(key)
    if col.null_count:
        # a null key would surface as float64 NaN from to_numpy and blow
        # up as an opaque ValueError deep in the remote task — fail with
        # the contract instead (range-join keys are non-null int64)
        raise ValueError(
            f"range-join key column {key!r} contains {col.null_count} nulls; "
            "the sort-merge plan requires non-null int64 keys"
        )
    k = col.to_numpy()
    if len(k) == 0:
        return np.empty(0, np.int64)
    k = np.sort(np.asarray(k, np.int64))
    if len(k) > cap:
        idx = (np.arange(cap, dtype=np.int64) * len(k)) // cap
        k = k[idx]  # per-block quantile sketch (deterministic stride)
    return k


@ray.remote
def _split_by_range(block: pa.Table, col: str, bounds: "object") -> list:
    """Range split: bucket i holds keys in (bounds[i-1], bounds[i]]."""
    import numpy as np

    nb = len(bounds) + 1
    if block.num_rows == 0:
        return [block.slice(0, 0)] * nb
    k = np.asarray(block.column(col).to_numpy(), np.int64)
    bucket = np.searchsorted(bounds, k, side="left")
    order = np.argsort(bucket, kind="stable")
    sorted_tbl = block.take(pa.array(order, pa.int64()))
    sb = bucket[order]
    cuts = np.searchsorted(sb, np.arange(nb + 1))
    return [sorted_tbl.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(nb)]


@ray.remote
def _merge_join_bucket(
    left_key: str, right_key: str, join_type: str, nleft: int, *parts: pa.Table
) -> pa.Table:
    import numpy as np

    left = pa.concat_tables(parts[:nleft], promote_options="none")
    right = pa.concat_tables(parts[nleft:], promote_options="none")
    lt, rt = left.column(left_key).type, right.column(right_key).type
    if pa.types.is_null(lt):
        left = _fix_null_key(left, left_key, rt if not pa.types.is_null(rt) else pa.int64())
    if pa.types.is_null(rt):
        right = _fix_null_key(right, right_key, lt if not pa.types.is_null(lt) else pa.int64())
    lk = np.asarray(left.column(left_key).to_numpy(), np.int64)
    rk = np.asarray(right.column(right_key).to_numpy(), np.int64)
    lorder = np.argsort(lk, kind="stable")
    rorder = np.argsort(rk, kind="stable")
    ls, rs = lk[lorder], rk[rorder]
    lo = np.searchsorted(rs, ls, side="left")
    hi = np.searchsorted(rs, ls, side="right")
    cnt = hi - lo

    right_cols = [c for c in right.column_names if c != right_key]
    if join_type == "left semi":
        return left.take(pa.array(lorder[cnt > 0], pa.int64()))
    if join_type == "left anti":
        return left.take(pa.array(lorder[cnt == 0], pa.int64()))

    emit = cnt if join_type == "inner" else np.maximum(cnt, 1)
    total = int(emit.sum())
    lpos = np.repeat(np.arange(len(ls), dtype=np.int64), emit)
    bounds = np.zeros(len(ls) + 1, dtype=np.int64)
    np.cumsum(emit, out=bounds[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1], emit)
    ridx = np.repeat(lo, emit) + within
    out = {c: pc.take(left.column(c), pa.array(lorder[lpos], pa.int64())) for c in left.column_names}
    if join_type == "inner":
        rtake = pa.array(rorder[ridx], pa.int64())
    else:  # left outer: unmatched left rows take a null right index
        matched = np.repeat(cnt > 0, emit)
        safe = np.where(matched, ridx, 0)
        phys = rorder[safe] if len(rorder) else np.zeros(total, np.int64)
        rtake = pa.array(np.asarray(phys, np.int64), pa.int64(), mask=~matched)
    for c in right_cols:
        out[c] = pc.take(right.column(c), rtake)
    return pa.table(out)


def equi_join_sortmerge(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    *,
    join_type: str = "inner",
    nbuckets: int | None = None,
    sample_cap: int = 1024,
) -> "ray.data.Dataset":
    """Sort-merge equi-join on int64 keys; output globally ordered by
    the left key (ties keep left input order, then right key order).

    Plan: per-block key quantile sketches -> global range boundaries ->
    one range exchange per side -> per-bucket sort + vectorized merge.
    Skew tolerance comes from the boundaries being key QUANTILES of the
    actual data rather than hash buckets; a single repeated hot key
    still lands in one bucket (use the hash plan + salt for that)."""
    import numpy as np

    if join_type not in _SMJ_TYPES:
        raise ValueError(
            f"sortmerge supports {sorted(_SMJ_TYPES)}, not {join_type!r}"
        )
    nbuckets = nbuckets or max(8, int(ray.cluster_resources().get("CPU", 8)))
    lmat, rmat = left.materialize(), right.materialize()
    lrefs, rrefs = lmat.to_arrow_refs(), rmat.to_arrow_refs()
    if not lrefs or not rrefs:
        kt = pa.int64()
        if not lrefs:
            lrefs = [ray.put(_typed_empty(lmat, left_key, kt))]
        if not rrefs:
            rrefs = [ray.put(_typed_empty(rmat, right_key, kt))]
    samples = ray.get(
        [_key_quantile_sample.remote(b, left_key, sample_cap) for b in lrefs]
        + [_key_quantile_sample.remote(b, right_key, sample_cap) for b in rrefs]
    )
    live = [s for s in samples if len(s)]
    allk = np.sort(np.concatenate(live)) if live else np.empty(0, np.int64)
    if len(allk):
        qidx = (np.arange(1, nbuckets, dtype=np.int64) * len(allk)) // nbuckets
        bounds = np.unique(allk[qidx])
    else:
        bounds = np.empty(0, np.int64)
    nb = len(bounds) + 1
    if nb == 1:
        return ray.data.from_arrow_refs(
            [
                _merge_join_bucket.remote(
                    left_key, right_key, join_type, len(lrefs), *lrefs, *rrefs
                )
            ]
        )
    lsplits = [
        _split_by_range.options(num_returns=nb).remote(b, left_key, bounds)
        for b in lrefs
    ]
    rsplits = [
        _split_by_range.options(num_returns=nb).remote(b, right_key, bounds)
        for b in rrefs
    ]
    out = [
        _merge_join_bucket.remote(
            left_key,
            right_key,
            join_type,
            len(lsplits),
            *[s[bi] for s in lsplits],
            *[s[bi] for s in rsplits],
        )
        for bi in range(nb)
    ]
    return ray.data.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# Validity-interval (SCD Type 2) dimension lookup: each fact row joins
# the dimension VERSION whose [begin, end) window contains its
# timestamp. The kernel is one searchsorted over an exact int64
# composite (key * shift + (begin - base)): with non-overlapping
# windows per key, the candidate is the rightmost dim row whose
# composite <= the fact's composite, then one vectorized verify
# (same key, ts < end). Dimension broadcast once; facts stream.


class _ValidityKernel:
    def __init__(self, ref, key: str, ts: str, id_col: str, payloads: tuple):
        import numpy as np

        d = ray.get(ref[0]) if isinstance(ref, list) else ref
        self.c_dim: "object" = d["c_dim"]  # ascending composite keys
        self.dkey: "object" = d["key"]
        self.dend: "object" = d["end"]
        self.pay = {p: d["pay"][p] for p in payloads}
        self.base: int = d["base"]
        self.shift: int = d["shift"]
        self.key, self.ts, self.id_col, self.payloads = key, ts, id_col, payloads

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        if len(self.c_dim) == 0:  # empty dimension: every fact misses
            cols = {self.id_col: batch.column(self.id_col)}
            for p in self.payloads:
                cols[p] = pa.array(np.full(batch.num_rows, np.nan), pa.float64())
            return pa.table(cols)
        u = np.asarray(batch.column(self.key).to_numpy(), np.int64)
        t = np.asarray(batch.column(self.ts).to_numpy(), np.int64)
        off = t - self.base
        in_range = (off >= 0) & (off < self.shift)
        c = u * self.shift + np.clip(off, 0, self.shift - 1)
        pos = np.searchsorted(self.c_dim, c, side="right") - 1
        posc = np.maximum(pos, 0)
        ok = (
            in_range
            & (pos >= 0)
            & (self.dkey[posc] == u)
            & (t < self.dend[posc])
        )
        cols = {self.id_col: batch.column(self.id_col)}
        for p in self.payloads:
            v = self.pay[p][posc].astype(np.float64)
            v[~ok] = np.nan
            cols[p] = pa.array(v, pa.float64())
        return pa.table(cols)


def validity_lookup(
    facts: "ray.data.Dataset",
    dim: pa.Table,
    *,
    key: str,
    ts: str,
    id_col: str,
    begin: str = "begin_us",
    end: str = "end_us",
    payloads: tuple = ("version",),
    base_us: int,
    shift: int = 1 << 44,
) -> "ray.data.Dataset":
    """-> id_col, *payloads (float64, NaN when no version is valid at
    the fact's timestamp — the driver-canonical null). Precondition
    (asserted): per key the dim windows are non-overlapping and every
    begin offset fits [0, shift); facts outside [base, base+shift) miss."""
    import numpy as np

    dk = np.asarray(dim.column(key).to_numpy(), np.int64)
    db = np.asarray(dim.column(begin).to_numpy(), np.int64)
    de = np.asarray(dim.column(end).to_numpy(), np.int64)
    offs = db - base_us
    if len(offs) and not ((offs >= 0) & (offs < shift)).all():
        raise ValueError("validity_lookup: begin offsets must fit [0, shift)")
    order = np.lexsort((db, dk))
    dk, db, de = dk[order], db[order], de[order]
    # non-overlap check per key: each window must close before the next opens
    same = dk[1:] == dk[:-1]
    if same.any() and not (de[:-1][same] <= db[1:][same]).all():
        raise ValueError("validity_lookup: overlapping windows for a key")
    pay = {
        p: np.asarray(dim.column(p).to_numpy(), np.float64)[order] for p in payloads
    }
    ref = ray.put(
        {
            "c_dim": dk * shift + (db - base_us),
            "key": dk,
            "end": de,
            "pay": pay,
            "base": int(base_us),
            "shift": int(shift),
        }
    )
    return facts.map_batches(
        run_cached_bcast,
        fn_kwargs={
            "cls": _ValidityKernel,
            "ref_list": [ref],
            "ctor_kwargs": {
                "key": key,
                "ts": ts,
                "id_col": id_col,
                "payloads": tuple(payloads),
            },
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
