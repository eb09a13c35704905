"""Event-window operator tests (lag, sessionization)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.pipelines import events
from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table


def _events_table():
    # user 1: three events, one >30min gap; user 2: single event
    ts = pd.to_datetime(
        [
            "2026-01-01 10:00:00",
            "2026-01-01 10:10:00",
            "2026-01-01 11:00:01",
            "2026-01-01 09:00:00",
        ]
    )
    return pa.table(
        {
            "event_id": np.array([1, 2, 3, 4], dtype=np.int64),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
        }
    )


def test_event_lag():
    ds = ray.data.from_arrow(_events_table())
    res = (
        dataset_to_table(events.event_lag(ds))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert res.event_id.tolist() == [1, 2, 3, 4]
    assert pd.isna(res.prev_event_id[0])
    assert res.prev_event_id[1] == 1
    assert res.prev_event_id[2] == 2
    assert pd.isna(res.prev_event_id[3])


def test_user_sessions_gap_rule():
    ds = ray.data.from_arrow(_events_table())
    res = (
        dataset_to_table(events.user_sessions(ds))
        .to_pandas()
        .set_index("user_id")
    )
    # 10:10 -> 11:00:01 is 50:01 > 30 min: two sessions for user 1
    assert res.loc[1, "n_sessions"] == 2
    assert res.loc[2, "n_sessions"] == 1
