"""Property tests (hypothesis) for the round-4 vectorized kernels:
ordered per-user window ops and the shared ANN top-k finish, pinned
against independent pandas/python oracles on adversarial random frames
(duplicate timestamps, singleton users, empty groups)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from spatialjoincountovershells_ray.pipelines import events
from spatialjoincountovershells_ray.pipelines.ann import _topk_finish


def _frame(data):
    n = len(data["user"])
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.asarray(data["user"], np.int64),
            "ts": pd.to_datetime(np.asarray(data["ts"], np.int64), unit="s"),
            "value": np.round(np.asarray(data["val"], np.float64), 2),
        }
    )


frames = st.integers(min_value=1, max_value=60).flatmap(
    lambda n: st.fixed_dictionaries(
        {
            "user": st.lists(
                st.integers(min_value=0, max_value=6), min_size=n, max_size=n
            ),
            "ts": st.lists(
                st.integers(min_value=0, max_value=50), min_size=n, max_size=n
            ),
            "val": st.lists(
                st.floats(min_value=0, max_value=100, allow_nan=False),
                min_size=n,
                max_size=n,
            ),
        }
    )
)


@settings(max_examples=15, deadline=None)
@given(frames)
def test_lag_lead_sessionize_match_pandas(data):
    df = _frame(data)
    nparts = min(3, len(df))
    ds = ray.data.from_pandas([d for d in np.array_split(df, nparts)])
    g = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")

    out = events.event_lag(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    exp_prev = (
        g.groupby("user_id")["event_id"].shift(1).astype("float64").sort_index()
    )
    pd.testing.assert_series_equal(
        out["prev_event_id"], exp_prev.reset_index(drop=True), check_names=False
    )

    out = events.event_lead(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    exp_next = (
        g.groupby("user_id")["event_id"].shift(-1).astype("float64").sort_index()
    )
    pd.testing.assert_series_equal(
        out["next_event_id"], exp_next.reset_index(drop=True), check_names=False
    )

    out = (
        events.sessionize(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    gap = g.groupby("user_id")["ts"].diff().dt.total_seconds() * 1e6
    brk = (gap > events.GAP_US).astype("int64")
    exp_sess = (1 + brk.groupby(g["user_id"]).cumsum()).sort_index()
    assert out["session_id"].tolist() == exp_sess.reset_index(drop=True).tolist()


@settings(max_examples=15, deadline=None)
@given(frames)
def test_rolling_max_matches_pandas(data):
    df = _frame(data)
    ds = ray.data.from_pandas([d for d in np.array_split(df, min(3, len(df)))])
    out = (
        events.event_rolling_max(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    g = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    exp = (
        g.groupby("user_id")["value"].rolling(3, min_periods=1).max().reset_index(0, drop=True)
    ).sort_index()
    np.testing.assert_array_equal(out["roll_max"].to_numpy(), exp.to_numpy())


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # qid
            st.integers(min_value=0, max_value=30),  # vec_id
            st.integers(min_value=-50, max_value=50),  # sim (int grid: exact)
        ),
        min_size=1,
        max_size=80,
    ),
    st.integers(min_value=1, max_value=6),  # k
)
def test_topk_finish_matches_pandas(cands, k):
    df = pd.DataFrame(cands, columns=["qid", "vec_id", "sim"]).astype(
        {"qid": "int64", "vec_id": "int64", "sim": "float64"}
    )
    ds = ray.data.from_pandas([d for d in np.array_split(df, min(3, len(df)))])
    out = _topk_finish(ds, k).to_pandas()

    sel = df[df.vec_id != df.qid].sort_values(
        ["qid", "sim", "vec_id"], ascending=[True, False, True], kind="mergesort"
    )
    # within a qid, dedupe nothing (duplicates allowed), rank and cut
    exp_rows = []
    for qid, grp in sel.groupby("qid", sort=True):
        for rnk, (_, r) in enumerate(grp.head(k).iterrows(), start=1):
            exp_rows.append((qid, int(r.vec_id), rnk))
    exp = pd.DataFrame(exp_rows, columns=["qid", "vec_id", "rnk"])
    if not len(exp):
        # a fully self-excluded candidate set: empty result (Ray's sort
        # of an all-empty dataset drops the column labels in to_pandas)
        assert len(out) == 0
        return
    got = out[["qid", "vec_id", "rnk"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype("int64"))
