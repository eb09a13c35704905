"""Event-stream operators over the events table.

The reference is strictly batch (SURVEY.md §2.9); these are engine
extensions covering the ordered-per-key surface a log/stream pipeline
needs: per-user previous-event join (lag/as-of) and gap-based
sessionization. Both are key-partitioned sorts: groupby(user_id) brings
a user's events to one task, a vectorized sort orders them by
(ts, event_id), and the window logic is numpy diff/shift — no global
sort, no Python row loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

GAP_US = 1_800 * 1_000_000  # 30 min session gap, microseconds


def event_lag(sf_dir_or_ds) -> "ray.data.Dataset":
    """-> event_id:int64, prev_event_id:int64|null — previous event of the
    same user in (ts, event_id) order."""
    ds = (
        ray.data.read_parquet(f"{sf_dir_or_ds}/events.parquet", columns=["event_id", "ts", "user_id"])
        if isinstance(sf_dir_or_ds, str)
        else sf_dir_or_ds
    )

    def lag(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="mergesort")
        # float64-with-NaN (shift's native output) is the canonical null
        # representation the driver hashes the DuckDB oracle side into;
        # a nullable Int64 column hashes `7` differently from `7.0`.
        prev = g["event_id"].shift(1).astype("float64")
        return pd.DataFrame({"event_id": g["event_id"], "prev_event_id": prev})

    return ds.groupby("user_id").map_groups(lag, batch_format="pandas")


def user_sessions(sf_dir_or_ds) -> "ray.data.Dataset":
    """-> user_id:int64, n_sessions:int64 — sessions split at >30 min gaps
    in (ts, event_id) order."""
    ds = (
        ray.data.read_parquet(f"{sf_dir_or_ds}/events.parquet", columns=["ts", "user_id", "event_id"])
        if isinstance(sf_dir_or_ds, str)
        else sf_dir_or_ds
    )

    def sess(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].astype("int64").to_numpy()  # microseconds since epoch
        gaps = int((np.diff(us) > GAP_US).sum()) if len(us) > 1 else 0
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [np.int64(1 + gaps)]}
        )

    return ds.groupby("user_id").map_groups(sess, batch_format="pandas")
