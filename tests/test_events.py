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


def test_event_asof_join_tie_and_order():
    # user 1: click(1) @10:00, purchase(2) @10:00 (tie ts, click id < purchase
    # id -> eligible), click(3) @10:05, purchase(4) @10:10 -> matches 3;
    # user 2: purchase(5) with no prior click -> NaN; click(6) after it.
    ts = pd.to_datetime(
        [
            "2026-01-01 10:00:00",
            "2026-01-01 10:00:00",
            "2026-01-01 10:05:00",
            "2026-01-01 10:10:00",
            "2026-01-01 10:00:00",
            "2026-01-01 10:30:00",
        ]
    )
    tbl = pa.table(
        {
            "event_id": np.array([1, 2, 3, 4, 5, 6], dtype=np.int64),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
            "event_type": ["click", "purchase", "click", "purchase", "purchase", "click"],
        }
    )
    res = (
        dataset_to_table(events.event_asof_join(ray.data.from_arrow(tbl)))
        .to_pandas()
        .sort_values("event_id")
        .set_index("event_id")
    )
    assert res.index.tolist() == [2, 4, 5]
    assert res.loc[2, "prev_click_id"] == 1.0
    assert res.loc[4, "prev_click_id"] == 3.0
    assert pd.isna(res.loc[5, "prev_click_id"])


def test_event_window_agg_small():
    ds = ray.data.from_arrow(
        _events_table().append_column(
            "value", pa.array([1.5, 2.5, 3.5, 9.0], pa.float64())
        )
    )
    res = dataset_to_table(events.event_window_agg(ds)).to_pandas()
    u1 = res[res.user_id == 1]
    # 10:00 and 10:10 share an hour bucket; 11:00:01 is the next
    assert len(u1) == 2 and u1.n_events.tolist() == [2, 1]
    assert u1.min_value.tolist() == [1.5, 3.5]
    assert u1.max_value.tolist() == [2.5, 3.5]


def test_event_rolling_max_small():
    ds = ray.data.from_arrow(
        _events_table().append_column(
            "value", pa.array([5.0, 2.0, 3.0, 9.0], pa.float64())
        )
    )
    res = (
        dataset_to_table(events.event_rolling_max(ds))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert res.roll_max.tolist() == [5.0, 5.0, 5.0, 9.0]


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


def test_sliding_counts_rejects_pre_epoch_timestamps():
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from spatialjoincountovershells_ray.pipelines.events import event_sliding_counts

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(["1970-01-01 00:10:00"]),  # w == 0
            "user_id": np.array([1], dtype=np.int64),
        }
    )
    with pytest.raises(Exception, match="window step past the epoch"):
        event_sliding_counts(ray.data.from_pandas(df)).take_all()


def test_sliding_counts_width_generalizes():
    import numpy as np
    import pandas as pd
    import ray

    from spatialjoincountovershells_ray.pipelines.events import (
        SLIDE_STEP_US,
        event_sliding_counts,
    )

    rng = np.random.default_rng(17)
    n = 5000
    base = pd.Timestamp("2024-03-01").value // 1000  # epoch us
    us = base + rng.integers(0, 50 * SLIDE_STEP_US, n)
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(us, unit="us"),
            "user_id": rng.integers(0, 20, n).astype(np.int64),
        }
    )
    for width in (2, 3):
        got = (
            event_sliding_counts(ray.data.from_pandas(df), width_steps=width)
            .to_pandas()
            .sort_values(["user_id", "win"])
            .reset_index(drop=True)
        )
        w = us // SLIDE_STEP_US
        rows = []
        for s in range(width):
            rows.append(pd.DataFrame({"user_id": df.user_id, "win": w - s}))
        exp = (
            pd.concat(rows)
            .groupby(["user_id", "win"])
            .size()
            .rename("n_events")
            .reset_index()
            .sort_values(["user_id", "win"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_ns_resolution_blocks_match_us():
    """pandas-origin blocks carry datetime64[ns]; every epoch-us op must
    normalize resolution rather than treat ns as us (ADVICE r2)."""
    tbl = _events_table()
    df = tbl.to_pandas()
    df["ts"] = df["ts"].astype("datetime64[ns]")
    df["value"] = np.array([5.0, 1.0, 9.0, 2.0])
    ds_ns = ray.data.from_pandas(df)

    sess = dataset_to_table(events.user_sessions(ds_ns)).to_pandas().set_index("user_id")
    assert sess.loc[1, "n_sessions"] == 2  # ns-as-us would see every gap > 30 min
    assert sess.loc[2, "n_sessions"] == 1

    sz = (
        dataset_to_table(events.sessionize(ds_ns))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert sz.session_id.tolist() == [1, 1, 2, 1]

    win = (
        dataset_to_table(events.event_window_agg(ds_ns))
        .to_pandas()
        .sort_values(["user_id", "win"])
        .reset_index(drop=True)
    )
    # hour buckets: user 1 has events in two distinct hours, user 2 in one
    assert win.groupby("user_id")["win"].count().tolist() == [2, 1]
    hours = pd.to_datetime(df["ts"]).dt.floor("h").astype("datetime64[us]").astype("int64")
    assert set(win["win"]) == set(hours // (3600 * 1_000_000))


def test_event_funnel_window_and_order():
    import pandas as pd
    import numpy as np
    import ray
    from spatialjoincountovershells_ray.pipelines import events as E

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = []
    # user 0: completes all three inside the window
    rows += [(0, t0, "signup"), (0, t0 + h, "view"), (0, t0 + 2 * h, "purchase")]
    # user 1: view arrives BEFORE signup -> stops at step 1
    rows += [(1, t0, "view"), (1, t0 + h, "signup"), (1, t0 + 2 * h, "purchase")]
    # user 2: purchase outside the 48h window after the view -> stops at 2
    rows += [(2, t0, "signup"), (2, t0 + h, "view"), (2, t0 + h + pd.Timedelta(hours=49), "purchase")]
    # user 3: no signup at all -> depth 0
    rows += [(3, t0, "view"), (3, t0 + h, "purchase")]
    # user 4: signup then view at the EXACT window bound (inclusive)
    rows += [(4, t0, "signup"), (4, t0 + pd.Timedelta(hours=48), "view")]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["user_id"] = df["user_id"].astype(np.int64)
    out = E.event_funnel(ray.data.from_pandas(df)).to_pandas()
    assert out["step"].tolist() == [1, 2, 3]
    assert out["step_name"].tolist() == ["signup", "view", "purchase"]
    # signup: users 0,1,2,4; view-after-signup in window: 0,2,4; purchase: 0
    # user 1's purchase is after its (late) signup but there is no view
    # after the signup, so it stops at depth 1
    assert out["users"].tolist() == [4, 3, 1]


def test_props_key_agg_matches_pandas():
    import json

    import numpy as np
    import pandas as pd
    import ray
    from spatialjoincountovershells_ray.pipelines import events as E

    rng = np.random.default_rng(23)
    n = 1000
    types = rng.choice(["a", "b", "c"], n)
    k = rng.integers(-50, 200, n)
    props = [json.dumps({"k": int(v)}) for v in k]
    props[5] = "not json"  # unmatched rows must be dropped, not crash
    df = pd.DataFrame({"event_type": types, "props": props})
    out = E.props_key_agg(ray.data.from_pandas([d for d in np.array_split(df, 6)])).to_pandas()
    df2 = df.drop(index=5).copy()
    df2["v"] = [json.loads(p)["k"] for p in df2["props"]]
    want = (
        df2.groupby("event_type")["v"]
        .agg(n="count", sum_k="sum", min_k="min", max_k="max")
        .reset_index()
        .sort_values("event_type")
    )
    assert out["event_type"].tolist() == want["event_type"].tolist()
    for c in ["n", "sum_k", "min_k", "max_k"]:
        assert out[c].tolist() == want[c].tolist()


def test_dau_retention_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray
    from spatialjoincountovershells_ray.pipelines import events as E

    rng = np.random.default_rng(29)
    n = 2000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s"),
        }
    )
    out = E.dau_retention(ray.data.from_pandas([d for d in np.array_split(df, 7)])).to_pandas()
    ud = df.copy()
    ud["day"] = (ud["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000)
    ud = ud[["user_id", "day"]].drop_duplicates()
    nxt = set(zip(ud["user_id"], ud["day"] - 1))
    ud["ret"] = [int((u, d) in nxt) for u, d in zip(ud["user_id"], ud["day"])]
    want = (
        ud.groupby("day")
        .agg(n_active=("user_id", "size"), n_retained=("ret", "sum"))
        .reset_index()
        .sort_values("day")
    )
    assert out["day"].tolist() == want["day"].tolist()
    assert out["n_active"].tolist() == want["n_active"].tolist()
    assert out["n_retained"].tolist() == want["n_retained"].tolist()


def test_weekly_active_users_matches_brute_force():
    import numpy as np
    import pandas as pd
    import ray
    from spatialjoincountovershells_ray.pipelines import events as E

    rng = np.random.default_rng(61)
    n = 3000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 45 * 86400, n), unit="s"),
        }
    )
    out = E.weekly_active_users(
        ray.data.from_pandas([d for d in np.array_split(df, 7)])
    ).to_pandas()
    ud = df.copy()
    ud["day"] = ud["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    ud = ud[["user_id", "day"]].drop_duplicates()
    days = np.sort(ud["day"].unique())
    want = [
        ud.loc[(ud["day"] >= d - 6) & (ud["day"] <= d), "user_id"].nunique() for d in days
    ]
    assert out["day"].tolist() == days.tolist()
    assert out["wau"].tolist() == want
    # sparse regime: one user, two bursts far apart -> interval merge split
    df2 = pd.DataFrame(
        {
            "user_id": np.zeros(4, np.int64),
            "ts": pd.to_datetime(["2024-01-01", "2024-01-03", "2024-02-01", "2024-02-02"]),
        }
    )
    out2 = E.weekly_active_users(ray.data.from_pandas(df2)).to_pandas()
    assert out2["wau"].tolist() == [1, 1, 1, 1]


def test_user_event_paths_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray
    from spatialjoincountovershells_ray.pipelines.events import user_event_paths

    rng = np.random.default_rng(21)
    n = 600
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n),
            "ts": pd.to_datetime("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 10 * 86400, n), unit="s"),
            "event_type": rng.choice(["a", "b", "c"], n),
        }
    )
    out = (
        user_event_paths(ray.data.from_pandas([d for d in np.array_split(df, 5)]))
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    w = df.assign(day=df["ts"].dt.strftime("%Y-%m-%d")).sort_values(
        ["user_id", "day", "ts", "event_id"], kind="mergesort"
    )
    want = (
        w.groupby(["user_id", "day"], sort=True)["event_type"]
        .agg(">".join)
        .reset_index(name="path")
    )
    pd.testing.assert_frame_equal(out[["user_id", "day", "path"]], want, check_dtype=False)


def test_late_events_prefix_max_matches_brute_force():
    import numpy as np
    import pandas as pd
    import ray
    from spatialjoincountovershells_ray.pipelines.events import late_events

    rng = np.random.default_rng(4)
    n = 500
    # arrival order deliberately uncorrelated with event time
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.permutation(n) * 3600, unit="s"
    )
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "ts": ts})
    delay = 24 * 3600 * 1_000_000
    out = (
        late_events(
            ray.data.from_pandas([d for d in np.array_split(df, 9)]), delay_us=delay
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    wm = np.maximum.accumulate(us)
    late = (us < wm - delay).astype(np.int64)
    assert out["wm_us"].tolist() == wm.tolist()
    assert out["late"].tolist() == late.tolist()
    assert 0 < late.sum() < n  # both classes present in the fixture


class TestSessionConcurrency:
    def test_sweep_semantics(self):
        import pandas as pd
        from spatialjoincountovershells_ray.pipelines.events import (
            session_concurrency_daily,
        )

        day = 86_400_000_000
        mk = lambda us: pd.Timestamp(us, unit="us")
        # u1: one session crossing midnight (23:50 -> 00:10 next day);
        # u2: session overlapping u1's on day0; u3: separate day2
        # session; u2+u3 share an exact start instant on day2 (tie).
        rows = [
            (1, mk(int(day * 0.993)), 1),
            (1, mk(int(day * 1.007)), 2),
            (2, mk(int(day * 0.995)), 3),
            (2, mk(int(day * 0.996)), 4),
            (3, mk(int(day * 2.5)), 5),
            (2, mk(int(day * 2.5)), 6),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
        ds = ray.data.from_pandas([b for b in np.array_split(df, 3)])
        got = session_concurrency_daily(ds).to_pandas()
        want = pd.DataFrame(
            {
                "day": ["1970-01-01", "1970-01-02", "1970-01-03"],
                # day 2 reports 0: its only boundary instant is u1's
                # session END (+1us), at which the session has closed —
                # the documented boundary-instant contract (the 00:00 ->
                # 00:10 open plateau has no instant of its own)
                "max_conc": np.array([2, 0, 2], np.int64),
            }
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_event_rolling_median_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(31)
    n = 3000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 25, n).astype(np.int64),
            "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="s"),
            "value": rng.integers(0, 10**6, n).astype(np.float64) / 100.0,
        }
    )
    ds = ray.data.from_pandas([d for d in np.array_split(df, 7)])
    out = (
        events.event_rolling_median(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(
        "SELECT event_id, median(CAST(round(value * 100) AS BIGINT)) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_med "
        "FROM events ORDER BY event_id"
    ).df()
    # bit-exact: int64 cents in, one correctly-rounded division out
    assert np.array_equal(out["roll_med"].to_numpy(), exp["roll_med"].to_numpy())


def test_event_lead_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(32)
    n = 2000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 30, n).astype(np.int64),
            "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="s"),
        }
    )
    ds = ray.data.from_pandas([d for d in np.array_split(df, 5)])
    out = (
        events.event_lead(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(
        "SELECT event_id, CAST(lead(event_id) OVER w AS DOUBLE) AS next_event_id, "
        "CAST(date_diff('microsecond', ts, lead(ts) OVER w) AS DOUBLE) AS gap_us "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
        "ORDER BY event_id"
    ).df()
    for c in ("next_event_id", "gap_us"):
        a, b = out[c].to_numpy(), exp[c].to_numpy()
        assert np.array_equal(np.isnan(a), np.isnan(b))
        assert np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)])


def test_latest_events_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(33)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 50, n).astype(np.int64),
            # coarse ts so ties force the event_id tie-break
            "ts": pd.to_datetime(rng.integers(0, 100, n), unit="s"),
            "value": rng.random(n) * 10,
        }
    )
    ds = ray.data.from_pandas([d for d in np.array_split(df, 9)])
    out = events.latest_events(ds).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(
        "SELECT user_id, event_id AS last_event_id, value AS last_value FROM events "
        "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1 "
        "ORDER BY user_id"
    ).df()
    exp[["user_id", "last_event_id"]] = exp[["user_id", "last_event_id"]].astype("int64")
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_no_per_group_python_callbacks_in_ordered_ops():
    """Round-4 scale contract: the ordered per-user ops run ONE vectorized
    pass per hash bucket (keyed_partition_apply), never a Python callback
    per group — groupby(user_id).map_groups(pandas) must not come back."""
    import inspect

    for fn in (
        events.event_lag,
        events.user_sessions,
        events.event_asof_join,
        events.event_rolling_max,
        events.event_rolling_median,
        events.event_lead,
        events.sessionize,
        events.event_funnel,
    ):
        src = inspect.getsource(fn)
        assert "map_groups" not in src, fn.__name__
        assert "keyed_partition_apply" in src, fn.__name__


def test_migrated_ops_match_duckdb_windows():
    """End-to-end parity of every round-4-migrated kernel vs DuckDB window
    functions on one adversarial frame (ties, singleton users, gaps)."""
    import duckdb

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 30, n).astype(np.int64),
            "ts": pd.to_datetime(rng.integers(0, 7200, n), unit="s"),
            "value": np.round(rng.random(n) * 100, 2),
            "event_type": rng.choice(["click", "purchase", "view"], n),
        }
    )
    ds = ray.data.from_pandas([d for d in np.array_split(df, 7)])
    con = duckdb.connect()
    con.register("events", df)

    out = (
        events.sessionize(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = con.execute(
        "SELECT event_id, user_id, 1 + SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id "
        "FROM (SELECT *, epoch_us(ts) - lag(epoch_us(ts)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM events) ORDER BY event_id"
    ).df()
    assert out.session_id.astype("int64").tolist() == exp.session_id.astype("int64").tolist()

    out = (
        events.event_rolling_max(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = con.execute(
        "SELECT event_id, max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_max FROM events ORDER BY event_id"
    ).df()
    np.testing.assert_allclose(out.roll_max.to_numpy(), exp.roll_max.to_numpy(), rtol=0)
