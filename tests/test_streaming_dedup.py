"""Streaming (shared-mutable-state) ingest dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.state.streaming_dedup import (
    StreamingDeduper,
    streaming_exact_dedup,
)


def test_distributed_count_matches_distinct_and_no_dup_keys():
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 500, 3000).astype(np.int64)
    df = pd.DataFrame({"k": keys, "payload": np.arange(3000, dtype=np.int64)})
    ds = ray.data.from_pandas([d for d in np.array_split(df, 13)])
    out = streaming_exact_dedup(ds, "k", nshards=4).to_pandas()
    assert len(out) == df["k"].nunique()
    assert out["k"].is_unique
    assert set(out["k"]) == set(df["k"])
    # survivors are real input rows
    merged = out.merge(df, on=["k", "payload"], how="left", indicator=True)
    assert (merged["_merge"] == "both").all()


def test_driver_router_first_wins_order():
    dd = StreamingDeduper(nshards=3)
    b1 = pa.table({"k": pa.array([1, 2, 2, 3], pa.int64()), "v": pa.array([10, 20, 21, 30], pa.int64())})
    b2 = pa.table({"k": pa.array([2, 3, 4], pa.int64()), "v": pa.array([22, 31, 40], pa.int64())})
    o1 = dd.filter_batch(b1, "k")
    o2 = dd.filter_batch(b2, "k")
    # first instance within the batch wins; later batches see prior state
    assert o1.column("v").to_pylist() == [10, 20, 30]
    assert o2.column("v").to_pylist() == [40]
    assert dd.n_seen() == 4


def test_consolidation_keeps_exactness():
    dd = StreamingDeduper(nshards=2)
    rng = np.random.default_rng(9)
    seen = set()
    for _ in range(6):
        k = rng.integers(0, 200_000, 40_000).astype(np.int64)
        b = pa.table({"k": pa.array(k, pa.int64())})
        out = dd.filter_batch(b, "k")
        kept = out.column("k").to_pylist()
        assert len(kept) == len(set(kept))
        assert not (set(kept) & seen)
        seen |= set(kept)
    assert dd.n_seen() == len(seen)
