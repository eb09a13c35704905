"""Shared map-side count combiner over packed int64 keys.

The raster, tile-pyramid, sliding-window and zonal-count ops all reduce
to the same physical shape: pack a composite key into one non-negative
int64, pre-count it per batch with ``np.unique`` (so the exchange
carries one partial row per distinct key per task, never raw rows),
merge with a single ``groupby().sum()``, then unpack the key back into
its named columns. This module carries that shape — and its invariant
(the packed key MUST be non-negative, or ``//``/``%`` unpacking
misattributes rows) — exactly once.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray  # noqa: F401 — Dataset type in annotations


def packed_counts(
    ds: "ray.data.Dataset",
    pack: Callable[[pa.Table], np.ndarray],
    unpack: Callable[[np.ndarray, "pa.ChunkedArray"], pa.Table],
) -> "ray.data.Dataset":
    """Count rows per packed key: ``pack(batch) -> int64 key array`` (one
    per row, possibly with fan-out — longer arrays count each entry),
    ``unpack(keys, counts) -> output table``. Keys must be >= 0."""

    def partial(batch: pa.Table) -> pa.Table:
        key = pack(batch)
        kk, cnt = np.unique(key, return_counts=True)
        if kk.size and int(kk[0]) < 0:
            # enforce the documented invariant instead of letting //,%
            # unpacking silently misattribute counts to a wrong cell
            # (e.g. a single out-of-box negative coordinate landing in a
            # (row-1, K-1)-style bucket)
            raise ValueError(
                f"packed_counts keys must be non-negative (got min {int(kk[0])})"
            )
        return pa.table({"k": kk, "n": cnt.astype(np.int64)})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .sum("n")
    )

    def final(batch: pa.Table) -> pa.Table:
        cname = "sum(n)" if "sum(n)" in batch.schema.names else "n"
        return unpack(batch.column("k").to_numpy(), batch.column(cname))

    return merged.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)
