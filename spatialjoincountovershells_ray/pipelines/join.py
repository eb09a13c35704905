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

Keys must be int64 (the bucket split hashes with ``% nbuckets``); string
keys can be pre-hashed to int64 with functions.hashing.mix64 plus a
collision-safe carry of the original column.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from spatialjoincountovershells_ray.stages.exchange import split_by_key


@ray.remote
def _join_bucket(
    left_key: str, right_key: str, join_type: str, nleft: int, *parts: pa.Table
) -> pa.Table:
    """Join the co-partitioned left parts against the right parts."""
    left = pa.concat_tables(parts[:nleft], promote_options="none")
    right = pa.concat_tables(parts[nleft:], promote_options="none")
    return left.join(right, keys=[left_key], right_keys=[right_key], join_type=join_type)


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
    lsplits = [
        split_by_key.options(num_returns=nbuckets).remote(b, left_key, nbuckets)
        for b in left.materialize().to_arrow_refs()
    ]
    rsplits = [
        split_by_key.options(num_returns=nbuckets).remote(b, right_key, nbuckets)
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
