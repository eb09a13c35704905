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
import ray

from spatialjoincountovershells_ray.stages.exchange import split_by_key

_JK = "__jk"


def _with_string_key_hash(ds: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    def add(batch: pa.Table) -> pa.Table:
        from spatialjoincountovershells_ray.functions.text import text_hash128

        h1, _ = text_hash128(batch.column(key))
        return batch.append_column(_JK, pa.array(h1, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


@ray.remote
def _join_bucket(
    left_key: str, right_key: str, join_type: str, nleft: int, *parts: pa.Table
) -> pa.Table:
    """Join the co-partitioned left parts against the right parts."""
    left = pa.concat_tables(parts[:nleft], promote_options="none")
    right = pa.concat_tables(parts[nleft:], promote_options="none")
    lkeys, rkeys = [left_key], [right_key]
    if _JK in left.column_names:
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
) -> "ray.data.Dataset":
    """Row-emitting equi-join of two Datasets on int64 key columns.

    Output columns: all left columns then the right columns except its
    key (pyarrow join semantics). Row order is plan-dependent —
    consumers needing an order sort explicitly.
    """
    if mode == "broadcast":
        from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table

        rtbl_ref = ray.put(dataset_to_table(right))

        class Joiner:
            def __init__(self, ref):
                self.rtbl = ray.get(ref[0])

            def __call__(self, batch: pa.Table) -> pa.Table:
                return batch.join(
                    self.rtbl, keys=[left_key], right_keys=[right_key], join_type=join_type
                )

        return left.map_batches(
            Joiner,
            fn_constructor_kwargs={"ref": [rtbl_ref]},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )

    if mode != "shuffle":
        raise ValueError(f"unknown join mode {mode!r}")

    nbuckets = nbuckets or max(8, int(ray.cluster_resources().get("CPU", 8)))
    lsplit_key, rsplit_key = left_key, right_key
    sch = left.schema()
    ktype = dict(zip(sch.names, sch.types)).get(left_key)
    if isinstance(ktype, pa.DataType):
        is_string_key = pa.types.is_string(ktype) or pa.types.is_large_string(ktype)
    else:  # pandas-block schema: a numpy dtype or a bare Python type
        is_string_key = ktype in (object, str) or getattr(ktype, "kind", "") in ("O", "U")
    if is_string_key:
        left = _with_string_key_hash(left, left_key)
        right = _with_string_key_hash(right, right_key)
        lsplit_key = rsplit_key = _JK
    lsplits = [
        split_by_key.options(num_returns=nbuckets).remote(b, lsplit_key, nbuckets)
        for b in left.materialize().to_arrow_refs()
    ]
    rsplits = [
        split_by_key.options(num_returns=nbuckets).remote(b, rsplit_key, nbuckets)
        for b in right.materialize().to_arrow_refs()
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
        for bi in range(nbuckets)
    ]
    return ray.data.from_arrow_refs(out)
