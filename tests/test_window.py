"""Keyed window ops (pipelines.window) and the repetition/BPE text ops
vs exact pandas/DuckDB oracles on multi-block synthetic inputs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.pipelines import textops, window


def _blocks(df, nblocks=5):
    return ray.data.from_pandas([d for d in np.array_split(df, nblocks)])


class TestRank:
    def test_matches_window_sql(self):
        rng = np.random.default_rng(11)
        n = 3000
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_custkey": rng.integers(0, 40, n).astype(np.int64),
                # coarse prices force real ties -> the orderkey tie-break matters
                "o_totalprice": rng.integers(1, 15, n).astype(np.float64) * 10.0,
            }
        )
        out = (
            window.rank_orders_per_customer(_blocks(df))
            .to_pandas()
            .sort_values(["o_custkey", "rnk"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("orders", df)
        exp = con.execute(
            "SELECT o_custkey, o_orderkey, CAST(row_number() OVER (PARTITION BY "
            "o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk "
            "FROM orders ORDER BY o_custkey, rnk"
        ).df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)

    def test_empty_input(self):
        df = pd.DataFrame(
            {
                "o_orderkey": np.array([], np.int64),
                "o_custkey": np.array([], np.int64),
                "o_totalprice": np.array([], np.float64),
            }
        )
        out = window.rank_orders_per_customer(ray.data.from_pandas([df])).to_pandas()
        assert len(out) == 0


def _events_frame(n=4000, users=25, seed=7):
    rng = np.random.default_rng(seed)
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 30 * 24 * 3600, n), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": rng.choice(["purchase", "click", "view"], n, p=[0.2, 0.6, 0.2]),
        }
    )


def _attr_oracle(df):
    con = duckdb.connect()
    con.register("events", df)
    return con.execute(
        "SELECT p.event_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks "
        "FROM (SELECT * FROM events WHERE event_type='purchase') p "
        "LEFT JOIN (SELECT * FROM events WHERE event_type='click') c "
        "ON c.user_id = p.user_id AND c.ts >= p.ts - INTERVAL 6 HOUR AND c.ts < p.ts "
        "GROUP BY p.event_id ORDER BY p.event_id"
    ).df()


class TestAttribution:
    def test_matches_interval_join_sql(self):
        df = _events_frame()
        out = (
            window.attribution_counts(_blocks(df))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        exp = _attr_oracle(df)
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)

    def test_no_clicks_yields_zeroes(self):
        df = _events_frame(n=200)
        df = df[df.event_type != "click"].reset_index(drop=True)
        out = window.attribution_counts(_blocks(df, 3)).to_pandas()
        assert (out["n_clicks"] == 0).all()
        assert len(out) == (df.event_type == "purchase").sum()

    def test_fallback_loop_matches_fast_path(self):
        # force the composite-axis overflow fallback by patching the guard
        df = _events_frame(n=1500, users=6, seed=13)
        df = df[df.event_type.isin(["purchase", "click"])].reset_index(drop=True)
        tbl = pa.table(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "is_purchase": (df["event_type"] == "purchase").to_numpy(),
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            }
        )
        fast = window._attribution_kernel(tbl).to_pandas()
        # replicate the kernel's per-user overflow fallback path verbatim
        # and require it to agree with the composite-axis fast path
        isp = tbl.column("is_purchase").to_numpy(zero_copy_only=False).astype(bool)
        uid = tbl.column("user_id").to_numpy()
        ts = tbl.column("ts_us").to_numpy()
        eid = tbl.column("event_id").to_numpy()
        pu, pt, pe = uid[isp], ts[isp], eid[isp]
        isc = ~isp
        cu, ct = uid[isc], ts[isc]
        co = np.lexsort((ct, cu))
        cu, ct = cu[co], ct[co]
        uu = np.unique(cu)
        ustart = np.searchsorted(cu, uu, "left")
        uend = np.searchsorted(cu, uu, "right")
        n = np.zeros(len(pe), dtype=np.int64)
        for i, u in enumerate(uu):
            m = pu == u
            if not m.any():
                continue
            seg = ct[ustart[i] : uend[i]]
            n[m] = np.searchsorted(seg, pt[m], "left") - np.searchsorted(
                seg, pt[m] - window.ATTR_WINDOW_US, "left"
            )
        slow = pd.DataFrame({"event_id": pe, "n_clicks": n})
        pd.testing.assert_frame_equal(
            fast.sort_values("event_id").reset_index(drop=True),
            slow.sort_values("event_id").reset_index(drop=True),
        )


class TestGlobalRank:
    def test_matches_global_row_number(self):
        df = _events_frame(n=2500, users=20, seed=21)
        out = (
            window.global_event_rank(_blocks(df[["event_id", "ts"]], 6))
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute(
            "SELECT event_id, CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) "
            "AS rn FROM events ORDER BY rn"
        ).df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)
        assert out["rn"].iloc[0] == 1 and out["rn"].iloc[-1] == len(df)


class TestQuantileFilter:
    def test_matches_sql_twin(self):
        from spatialjoincountovershells_ray.pipelines import relagg

        rng = np.random.default_rng(9)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(900, dtype=np.int64),
                "source": rng.choice(["a", "b", "c"], 900),
                "n_chars": rng.integers(1, 800, 900).astype(np.int64),
            }
        )
        out = (
            relagg.filter_above_group_quantile(
                _blocks(df, 4), "source", "n_chars", 0.9, ["doc_id", "source", "n_chars"]
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(
            "WITH th AS (SELECT source, CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p "
            "FROM documents GROUP BY source) SELECT d.doc_id, d.source, d.n_chars "
            "FROM documents d JOIN th USING (source) WHERE d.n_chars > th.p ORDER BY doc_id"
        ).df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


class TestTextRepetition:
    def test_doc_repetition_counts(self):
        df = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": [
                    "a a a b",  # 4 tokens, 2 distinct, a x3 -> dup_chars 3
                    "xy xy zz",  # xy repeated -> dup_chars 4
                    "unique tokens only here",
                    "  spaced   out  ",  # empty splits dropped
                ],
            }
        )
        out = (
            textops.doc_repetition(ray.data.from_pandas([df]))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_tokens"].tolist() == [4, 3, 4, 2]
        assert out["n_distinct"].tolist() == [2, 2, 4, 2]
        assert out["max_reps"].tolist() == [3, 2, 1, 1]
        assert out["dup_chars"].tolist() == [3, 4, 0, 0]

    def test_tfidf_top_term(self):
        df = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": [
                    "apple apple banana",  # apple tf=2, rare -> wins
                    "banana common common",
                    "common cherry cherry cherry",
                    "common banana",
                ],
            }
        )
        out = (
            textops.tfidf_top_term(ray.data.from_pandas([df]))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(
            "WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, ' ')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks "
            "WHERE term <> '' GROUP BY doc_id, term), "
            "df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term), "
            "nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), "
            "scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, (tf.tf * nd.n) / df.df "
            "AS score FROM tf JOIN df USING (term) CROSS JOIN nd) "
            "SELECT doc_id, term, tf, df, score FROM (SELECT *, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY score DESC, term) AS rn FROM scored) "
            "WHERE rn = 1 ORDER BY doc_id"
        ).df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp, check_exact=True)
        assert out.loc[0, "term"] == "apple"

    def test_bpe_pretokenizer_vs_python_re(self):
        import re

        df = pd.DataFrame(
            {
                "doc_id": np.arange(3, dtype=np.int64),
                "text": [
                    "it's a test-case, 123 numbers!",
                    "don't stop... (me) now",
                    "plain words",
                ],
            }
        )
        out = (
            textops.bpe_token_counts(ray.data.from_pandas([df]))
            .to_pandas()
            .sort_values("doc_id")
        )
        pat = re.compile(textops.BPE_PRETOKEN_RE)
        exp = [len(pat.findall(t)) for t in df["text"]]
        assert out["n_bpe_tokens"].tolist() == exp


class TestTransitions:
    def test_matches_lead_sql(self):
        from spatialjoincountovershells_ray.pipelines import events as ev

        rng = np.random.default_rng(17)
        n = 5000
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.integers(0, 80, n).astype(np.int64),
                "ts": pd.to_datetime(
                    rng.integers(0, 10**6, n), unit="s"
                ).astype("datetime64[us]"),
                "event_type": rng.choice(["a", "b", "c", "d"], n),
            }
        )
        got = (
            ev.event_transition_counts(_blocks(df, 7))
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(
                "WITH o AS (SELECT user_id, event_type, lead(event_type) OVER "
                "(PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM df) "
                "SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS n "
                "FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"
            )
            .df()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        assert got["n"].sum() == n - df.groupby("user_id").ngroups

    def test_single_event_users_emit_nothing(self):
        from spatialjoincountovershells_ray.pipelines import events as ev

        df = pd.DataFrame(
            {
                "event_id": np.arange(3, dtype=np.int64),
                "user_id": np.array([1, 2, 3], np.int64),
                "ts": pd.to_datetime([1, 2, 3], unit="s").astype("datetime64[us]"),
                "event_type": ["a", "b", "c"],
            }
        )
        out = ev.event_transition_counts(_blocks(df, 2)).to_pandas()
        assert len(out) == 0


class TestNtileStats:
    def test_matches_sql_ntile_uneven_split(self):
        import duckdb
        import numpy as np
        import pandas as pd
        import ray

        from spatialjoincountovershells_ray.pipelines import window as W

        rng = np.random.default_rng(31)
        n = 2503  # deliberately not divisible by 10
        df = pd.DataFrame(
            {
                "o_totalprice": np.round(rng.random(n) * 1000, 2),
                "o_orderkey": np.arange(n, dtype=np.int64),
            }
        )
        out = W.value_ntile_stats(
            ray.data.from_pandas([d for d in np.array_split(df, 8)]),
            val_col="o_totalprice",
            id_col="o_orderkey",
            k=10,
        ).to_pandas()
        con = duckdb.connect()
        con.register("orders", df)
        want = con.execute(
            "WITH r AS (SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket, "
            "CAST(round(o_totalprice*100) AS BIGINT) AS c FROM orders) "
            "SELECT CAST(bucket AS BIGINT) bucket, CAST(count(*) AS BIGINT) n, "
            "CAST(sum(c) AS BIGINT) cents FROM r GROUP BY 1 ORDER BY 1"
        ).df()
        assert out["bucket"].tolist() == want["bucket"].tolist()
        assert out["n"].tolist() == want["n"].tolist()
        assert out["cents"].tolist() == want["cents"].tolist()

    def test_fewer_rows_than_buckets(self):
        import numpy as np
        import pandas as pd
        import ray

        from spatialjoincountovershells_ray.pipelines import window as W

        df = pd.DataFrame({"o_totalprice": [3.0, 1.0, 2.0], "o_orderkey": [10, 11, 12]})
        out = W.value_ntile_stats(
            ray.data.from_pandas(df), val_col="o_totalprice", id_col="o_orderkey", k=10
        ).to_pandas()
        # ntile with n < k: each row its own bucket 1..n
        assert out["bucket"].tolist() == [1, 2, 3]
        assert out["n"].tolist() == [1, 1, 1]
        assert out["cents"].tolist() == [100, 200, 300]


class TestOrderDistStats:
    def test_matches_brute_force_with_ties(self):
        import numpy as np
        import pandas as pd
        import ray
        from spatialjoincountovershells_ray.pipelines.window import order_dist_stats

        rng = np.random.default_rng(9)
        n = 400
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_custkey": rng.integers(0, 25, n),
                # coarse grid -> plenty of in-group price ties
                "o_totalprice": rng.integers(1, 8, n).astype(np.float64) * 10.0,
            }
        )
        # singleton group exercises the percent_rank n==1 -> 0.0 rule
        df.loc[n - 1, "o_custkey"] = 999
        out = (
            order_dist_stats(ray.data.from_pandas([d for d in np.array_split(df, 6)]))
            .to_pandas()
            .sort_values(["o_custkey", "o_orderkey"])
            .reset_index(drop=True)
        )
        rows = []
        for ck, g in df.groupby("o_custkey"):
            vals = g["o_totalprice"].to_numpy()
            m = len(vals)
            for ok, v in zip(g["o_orderkey"], vals):
                rank = int((vals < v).sum()) + 1
                le = int((vals <= v).sum())
                pct = 0.0 if m == 1 else (rank - 1) / (m - 1)
                rows.append((ck, ok, pct, le / m))
        want = (
            pd.DataFrame(rows, columns=["o_custkey", "o_orderkey", "pct_rank", "cume_dist"])
            .sort_values(["o_custkey", "o_orderkey"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[want.columns], want, check_dtype=False)


def test_order_share_sums_to_one_and_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray
    from spatialjoincountovershells_ray.pipelines.window import order_share

    rng = np.random.default_rng(41)
    n = 300
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.integers(0, 20, n),
            "o_totalprice": rng.uniform(1, 500, n).round(2),
        }
    )
    out = (
        order_share(ray.data.from_pandas([d for d in np.array_split(df, 5)]))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    cents = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
    tot = pd.Series(cents).groupby(df["o_custkey"]).transform("sum").to_numpy()
    want = cents.astype(np.float64) / tot.astype(np.float64)
    assert out["share"].to_numpy().tolist() == want.tolist()
    sums = out.groupby("o_custkey")["share"].sum()
    assert np.allclose(sums, 1.0)


class TestOverlapPairs:
    def test_matches_self_join_sql(self):
        rng = np.random.default_rng(23)
        n = 2000
        day = 86_400_000_000
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
                "o_custkey": rng.integers(0, 60, n).astype(np.int64),
                # dates clustered into a few weeks so real overlaps occur,
                # with exact-tie starts to exercise the orderkey tie-break
                "o_orderdate": pd.to_datetime(
                    rng.integers(0, 40, n) * day + rng.integers(0, 4, n) * (day // 2),
                    unit="us",
                ),
            }
        )
        out = (
            window.order_overlap_pairs(_blocks(df))
            .to_pandas()
            .sort_values(["o_custkey", "a_orderkey", "b_orderkey"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("orders", df)
        exp = con.execute(
            "WITH w AS (SELECT o_custkey, o_orderkey AS k, "
            "CAST(epoch_us(o_orderdate) AS BIGINT) AS s, "
            "CAST(epoch_us(o_orderdate) AS BIGINT) + (1 + o_orderkey % 7) * 86400000000 AS e "
            "FROM orders) "
            "SELECT a.o_custkey, a.k AS a_orderkey, b.k AS b_orderkey "
            "FROM w a JOIN w b ON a.o_custkey = b.o_custkey "
            "AND (a.s < b.s OR (a.s = b.s AND a.k < b.k)) AND b.s <= a.e "
            "ORDER BY 1, 2, 3"
        ).df()
        exp[["o_custkey", "a_orderkey", "b_orderkey"]] = exp[
            ["o_custkey", "a_orderkey", "b_orderkey"]
        ].astype("int64")
        assert len(out) > 0
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)

    def test_empty_and_singleton_groups(self):
        df = pd.DataFrame(
            {
                "o_orderkey": np.array([1, 2], np.int64),
                "o_custkey": np.array([7, 8], np.int64),  # one order each
                "o_orderdate": pd.to_datetime([0, 0], unit="us"),
            }
        )
        out = window.order_overlap_pairs(_blocks(df, nblocks=2)).to_pandas()
        assert len(out) == 0
