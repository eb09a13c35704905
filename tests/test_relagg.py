"""Decomposable relational aggregates (pipelines.relagg) vs exact oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from spatialjoincountovershells_ray.pipelines import relagg


def _docs_frame(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["a", "b", "c", "d"], n),
            "n_chars": rng.integers(1, 500, n).astype(np.int64),
        }
    )


def _many_blocks(df, nblocks=7):
    """Force multi-batch execution so the combiner stage actually prunes."""
    return ray.data.from_pandas([d for d in np.array_split(df, nblocks)])


class TestHashSample:
    def test_matches_sql_predicate(self):
        df = _docs_frame()
        out = (
            relagg.hash_sample(_many_blocks(df), "doc_id", 0.25)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        sql = duckdb.sql(
            f"SELECT * FROM df WHERE {relagg.sample_hash_sql('doc_id', 0.25)} ORDER BY doc_id"
        ).df()
        pd.testing.assert_frame_equal(out, sql)
        # deterministic: second run identical
        out2 = (
            relagg.hash_sample(_many_blocks(df), "doc_id", 0.25)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, out2)

    def test_overflow_guard(self):
        df = pd.DataFrame({"doc_id": np.array([relagg._SAMPLE_MAX_KEY + 1], dtype=np.int64)})
        with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
            relagg.hash_sample(ray.data.from_pandas(df), "doc_id", 0.5).take_all()


class TestTopkPerGroup:
    def test_matches_window_oracle(self):
        df = _docs_frame()
        out = (
            relagg.topk_per_group(_many_blocks(df), "source", "n_chars", "doc_id", 3)
            .to_pandas()
            .sort_values(["source", "rnk"])
            .reset_index(drop=True)
        )
        sql = duckdb.sql(
            "SELECT source, doc_id, n_chars, rnk FROM ("
            "SELECT source, doc_id, n_chars, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk FROM df) "
            "WHERE rnk <= 3 ORDER BY source, rnk"
        ).df()
        pd.testing.assert_frame_equal(out, sql)

    def test_ties_break_on_ident(self):
        df = pd.DataFrame(
            {
                "source": ["a"] * 4,
                "doc_id": np.array([9, 2, 5, 7], dtype=np.int64),
                "n_chars": np.array([10, 10, 10, 1], dtype=np.int64),
            }
        )
        out = (
            relagg.topk_per_group(ray.data.from_pandas(df), "source", "n_chars", "doc_id", 2)
            .to_pandas()
            .sort_values("rnk")
        )
        assert out["doc_id"].tolist() == [2, 5]


class TestGroupedQuantiles:
    def test_matches_quantile_disc(self):
        df = _docs_frame(n=3000, seed=11)
        out = (
            relagg.grouped_quantiles_disc(
                _many_blocks(df), "source", "n_chars", {"p50": 0.5, "p90": 0.9}
            )
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        sql = duckdb.sql(
            "SELECT source, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50, "
            "CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90 FROM df "
            "GROUP BY source ORDER BY source"
        ).df()
        pd.testing.assert_frame_equal(out, sql)

    def test_single_value_group(self):
        df = pd.DataFrame({"source": ["z"], "n_chars": np.array([42], dtype=np.int64)})
        out = relagg.grouped_quantiles_disc(
            ray.data.from_pandas(df), "source", "n_chars", {"p50": 0.5}
        ).to_pandas()
        assert out["p50"].tolist() == [42]

    def test_matches_quantile_cont_bitexact(self):
        df = _docs_frame(n=3000, seed=17)
        out = (
            relagg.grouped_quantiles_cont(
                _many_blocks(df), "source", "n_chars", {"p25": 0.25, "p50": 0.5, "p90": 0.9}
            )
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        sql = duckdb.sql(
            "SELECT source, quantile_cont(n_chars, 0.25) AS p25, "
            "quantile_cont(n_chars, 0.5) AS p50, quantile_cont(n_chars, 0.9) AS p90 "
            "FROM df GROUP BY source ORDER BY source"
        ).df()
        # bit-exact float comparison on purpose: the driver hashes raw bits
        pd.testing.assert_frame_equal(out, sql, check_exact=True)

    def test_cont_single_value_group(self):
        df = pd.DataFrame({"source": ["z"], "n_chars": np.array([42], dtype=np.int64)})
        out = relagg.grouped_quantiles_cont(
            ray.data.from_pandas(df), "source", "n_chars", {"p50": 0.5}
        ).to_pandas()
        assert out["p50"].tolist() == [42.0]


class TestDistinctCount:
    def test_matches_nunique(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "g": rng.choice(["x", "y", "z"], 5000),
                "m": rng.integers(0, 200, 5000).astype(np.int64),
            }
        )
        out = (
            relagg.distinct_count_per_group(_many_blocks(df, 9), "g", "m")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        ref = (
            df.groupby("g")["m"].nunique().astype(np.int64).reset_index(name="n_distinct")
        )
        pd.testing.assert_frame_equal(out, ref)


class TestModePerGroup:
    def test_mode_matches_pandas_with_tiebreak(self):
        import numpy as np
        import pandas as pd
        import ray

        from spatialjoincountovershells_ray.pipelines.relagg import mode_per_group

        rng = np.random.default_rng(31)
        n = 8000
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 40, n).astype(np.int64),
                "v": rng.choice(list("abcde"), n),
            }
        )
        # force a known tie in one group: equal counts for 'a' and 'b'
        tie = pd.DataFrame({"g": np.int64(99), "v": ["b", "a", "a", "b"]})
        df = pd.concat([df, tie], ignore_index=True)
        got = (
            mode_per_group(
                ray.data.from_pandas([d for d in np.array_split(df, 7)]), "g", "v"
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        cnt = df.groupby(["g", "v"]).size().rename("n").reset_index()
        cnt = cnt.sort_values(["g", "n", "v"], ascending=[True, False, True], kind="mergesort")
        exp = cnt.groupby("g", sort=True).head(1).reset_index(drop=True)
        assert (got["g"].to_numpy() == exp["g"].to_numpy()).all()
        assert (got["top_value"].to_numpy() == exp["v"].to_numpy()).all()
        assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
        assert got.loc[got.g == 99, "top_value"].iloc[0] == "a"  # tie -> smallest


class TestCms:
    def test_counter_table_and_overestimate(self):
        rng = np.random.default_rng(11)
        keys = rng.integers(0, 300, 5000).astype(np.int64)
        ds = _many_blocks(pd.DataFrame({"user_id": keys}))
        counters = relagg.cms_counters(ds, "user_id", depth=4, width=1024).to_pandas()
        # total mass per depth row == row count (every key lands once per row)
        per_depth = counters.groupby("depth")["cnt"].sum()
        assert (per_depth == len(keys)).all() and len(per_depth) == 4
        # point estimates never underestimate, and mostly match exactly
        uniq, exact = np.unique(keys, return_counts=True)
        est = relagg.cms_estimate(counters, uniq, depth=4, width=1024)
        assert (est >= exact).all()
        assert (est == exact).mean() > 0.9

    def test_matches_single_process_grid(self):
        keys = np.arange(1000, dtype=np.int64) % 37
        ds = _many_blocks(pd.DataFrame({"user_id": keys}), nblocks=5)
        counters = relagg.cms_counters(ds, "user_id", depth=2, width=64).to_pandas()
        from spatialjoincountovershells_ray.functions.hashing import mix64

        grid = np.zeros((2, 64), np.int64)
        for j, salt in enumerate(relagg.CMS_SALTS[:2]):
            with np.errstate(over="ignore"):
                b = mix64(keys.astype(np.uint64) + np.uint64(salt)) % np.uint64(64)
            np.add.at(grid[j], b.astype(np.int64), 1)
        got = np.zeros_like(grid)
        got[counters["depth"], counters["bucket"]] = counters["cnt"]
        assert (got == grid).all()


class TestStratifiedSample:
    def test_fixed_k_per_group_deterministic(self):
        df = _docs_frame(n=3000)
        out = relagg.stratified_sample(
            _many_blocks(df), group="source", ident="doc_id", k=25
        ).to_pandas()
        sizes = out.groupby("source").size()
        assert (sizes == 25).all()
        assert set(out.columns) == {"doc_id", "source", "n_chars", "rnk"}
        # rnk is 1..k per group and the selection is the k smallest hashes
        from spatialjoincountovershells_ray.functions.hashing import mix64

        df2 = df.assign(h=mix64(df["doc_id"].to_numpy().astype(np.uint64)))
        want = df2.sort_values("h").groupby("source").head(25)
        assert set(out["doc_id"]) == set(want["doc_id"])
        # independent of blocking
        out2 = relagg.stratified_sample(
            _many_blocks(df, nblocks=13), group="source", ident="doc_id", k=25
        ).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values(["source", "rnk"]).reset_index(drop=True),
            out2.sort_values(["source", "rnk"]).reset_index(drop=True),
        )

    def test_small_group_returns_whole_group(self):
        df = pd.DataFrame(
            {"doc_id": np.arange(8, dtype=np.int64), "source": ["x"] * 3 + ["y"] * 5}
        )
        out = relagg.stratified_sample(
            ray.data.from_pandas(df), group="source", ident="doc_id", k=4
        ).to_pandas()
        assert out.groupby("source").size().to_dict() == {"x": 3, "y": 4}


class TestRollup:
    def test_matches_duckdb_rollup(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "a": rng.choice(["p", "q", "r"], 4000),
                "b": rng.choice(["u", "v"], 4000),
            }
        )
        out = (
            relagg.rollup_counts(_many_blocks(df), ["a", "b"])
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        sql = (
            duckdb.sql(
                "SELECT COALESCE(a, '(all)') AS a, COALESCE(b, '(all)') AS b, "
                "CAST(count(*) AS BIGINT) AS n FROM df GROUP BY ROLLUP(a, b) "
                "ORDER BY a, b"
            )
            .df()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, sql)


class TestGroupedHll:
    def test_registers_match_per_group_singleprocess(self):
        rng = np.random.default_rng(23)
        df = pd.DataFrame(
            {
                "day": rng.choice(["d1", "d2", "d3"], 6000),
                "user_id": rng.integers(0, 2000, 6000).astype(np.int64),
            }
        )
        got = relagg.hll_registers_grouped(_many_blocks(df), "user_id", "day", p=6).to_pandas()
        for day, sub in df.groupby("day"):
            bucket, rho = relagg._hll_bucket_rho(sub["user_id"].to_numpy(), 6)
            regs = np.zeros(64, np.int64)
            np.maximum.at(regs, bucket, rho)
            g = got[got["day"] == day]
            regs2 = np.zeros(64, np.int64)
            regs2[g["bucket"].to_numpy()] = g["rho_max"].to_numpy()
            assert (regs == regs2).all()
            # per-group estimate lands near the exact distinct count
            est = relagg.hll_estimate(g.rename(columns={"rho_max": "rho_max"}), p=6)
            exact = sub["user_id"].nunique()
            assert abs(est - exact) / exact < 0.35


class TestPearsonCorr:
    def test_exact_moments_and_corr(self):
        rng = np.random.default_rng(7)
        n = 5000
        x = rng.integers(1, 51, n).astype(np.float64)
        y = np.round(rng.random(n) * x / 50.0, 2)  # correlated, 2 decimals
        df = pd.DataFrame({"x": x, "y": y})
        out = relagg.pearson_corr_scaled(
            _many_blocks(df, 9), "x", "y", x_scale=1, y_scale=100
        ).to_pandas()
        assert len(out) == 1
        xi = x.astype(np.int64)
        yi = np.rint(y * 100).astype(np.int64)
        assert out["n"][0] == n
        assert out["sx"][0] == xi.sum() and out["sy"][0] == yi.sum()
        assert out["sxy"][0] == (xi * yi).sum()
        assert out["sxx"][0] == (xi * xi).sum() and out["syy"][0] == (yi * yi).sum()
        # matches numpy's corrcoef on the scaled ints to float tolerance
        want = np.corrcoef(xi, yi)[0, 1]
        assert abs(out["corr"][0] - want) < 1e-12
        # blocking-independent: integer moments are order-free
        out2 = relagg.pearson_corr_scaled(
            _many_blocks(df, 3), "x", "y", x_scale=1, y_scale=100
        ).to_pandas()
        assert out["corr"][0] == out2["corr"][0]


class TestZscoreOutliers:
    def test_matches_two_pass_numpy(self):
        rng = np.random.default_rng(11)
        n = 4000
        v = np.round(rng.normal(50, 10, n), 2)
        v[rng.choice(n, 25, replace=False)] += 120.0  # planted outliers
        df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "value": v})
        out = relagg.zscore_outliers(
            _many_blocks(df, 8), key="event_id", col="value", scale=100, z=3.0
        ).to_pandas()
        c = np.rint(v * 100).astype(np.int64)
        mu = float(c.sum()) / n
        thr = 9.0 * (float((c * c).sum()) / n - mu * mu)
        want = np.where((c - mu) ** 2 > thr)[0]
        assert out["event_id"].tolist() == sorted(want.tolist())
        assert len(out) >= 25  # the planted ones are found

    def test_overflow_guard(self):
        df = pd.DataFrame({"k": [1], "v": [4e9]})
        with pytest.raises(Exception):
            relagg.zscore_outliers(
                ray.data.from_pandas(df), key="k", col="v", scale=10**9, z=3.0
            ).to_pandas()


class TestHistogramFixed:
    def test_matches_numpy_bincount(self):
        rng = np.random.default_rng(5)
        v = np.round(rng.random(3000) * 500000, 2)
        df = pd.DataFrame({"o_totalprice": v})
        out = relagg.histogram_fixed(_many_blocks(df, 6), "o_totalprice", 50000.0).to_pandas()
        b = np.floor(v / 50000.0).astype(np.int64)
        bins, counts = np.unique(b, return_counts=True)
        assert out["bin"].tolist() == bins.tolist()
        assert out["n"].tolist() == counts.tolist()
        assert (out["lo"].to_numpy() == bins.astype(np.float64) * 50000.0).all()


class TestRunningTotal:
    def test_matches_pandas_cumsum(self):
        rng = np.random.default_rng(9)
        n = 3000
        df = pd.DataFrame(
            {
                "o_custkey": rng.integers(0, 50, n).astype(np.int64),
                "o_orderdate": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 10, n), unit="D"),
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_totalprice": np.round(rng.random(n) * 1000, 2),
            }
        )
        out = relagg.running_total_cents(
            _many_blocks(df, 7), key="o_custkey", order_cols=["o_orderdate", "o_orderkey"], val="o_totalprice"
        ).to_pandas()
        g = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort").copy()
        g["c"] = np.rint(g["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g["want"] = g.groupby("o_custkey")["c"].cumsum()
        want = g.sort_values(["o_custkey", "o_orderkey"], kind="mergesort")
        assert out["o_orderkey"].tolist() == want["o_orderkey"].tolist()
        assert out["total_cents"].tolist() == want["want"].tolist()


class TestPivotCounts:
    def test_matches_pandas_crosstab(self):
        rng = np.random.default_rng(41)
        n = 2000
        df = pd.DataFrame(
            {
                "prio": rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n),
                "status": rng.choice(["F", "P", "O", "X"], n),  # X outside the pivot list
            }
        )
        out = relagg.pivot_counts(
            _many_blocks(df, 6), key="prio", col="status", values=["F", "P", "O"]
        ).to_pandas()
        ct = pd.crosstab(df["prio"], df["status"])
        assert out["prio"].tolist() == sorted(df["prio"].unique())
        for v, c in [("F", "n_f"), ("P", "n_p"), ("O", "n_o")]:
            assert out[c].tolist() == ct[v].loc[out["prio"]].tolist()
        assert out["n_total"].tolist() == df.groupby("prio").size().loc[out["prio"]].tolist()


class TestGroupedSlope:
    def test_matches_numpy_polyfit_and_blocking_free(self):
        rng = np.random.default_rng(53)
        n = 3000
        users = rng.integers(0, 25, n).astype(np.int64)
        secs = rng.integers(0, 30 * 86400, n)
        ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(secs, unit="s")
        value = np.round(secs / 86400 * 0.5 + rng.normal(10, 2, n), 2)  # upward trend
        df = pd.DataFrame({"user_id": users, "ts": ts, "value": value})
        out = relagg.grouped_slope_fixed(
            _many_blocks(df, 8), key="user_id", ts_col="ts", val_col="value",
            x0_s=1_704_067_200, val_scale=100,
        ).to_pandas()
        for _, row in out.iterrows():
            m = users == row["user_id"]
            x = secs[m].astype(np.float64)
            y = np.rint(value[m] * 100).astype(np.float64)
            sn, sx, sy = float(m.sum()), x.sum(), y.sum()
            want = (sn * (x * y).sum() - sx * sy) / (sn * (x * x).sum() - sx * sx)
            assert abs(row["slope"] - want) < 1e-9
            assert row["slope"] > 0  # the planted trend is recovered
        out2 = relagg.grouped_slope_fixed(
            _many_blocks(df, 3), key="user_id", ts_col="ts", val_col="value",
            x0_s=1_704_067_200, val_scale=100,
        ).to_pandas()
        assert out["slope"].tolist() == out2["slope"].tolist()  # exact moments


class TestTableChecksum:
    def test_order_and_blocking_invariant_but_content_sensitive(self):
        rng = np.random.default_rng(67)
        n = 2000
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_totalprice": np.round(rng.random(n) * 1000, 2),
            }
        )
        a = relagg.table_checksum(_many_blocks(df, 9), "o_orderkey", "o_totalprice").to_pandas()
        # shuffled rows, different blocking -> identical fingerprint
        shuf = df.sample(frac=1.0, random_state=1)
        b = relagg.table_checksum(_many_blocks(shuf, 4), "o_orderkey", "o_totalprice").to_pandas()
        assert a["n"][0] == b["n"][0] == n
        assert a["checksum"][0] == b["checksum"][0]
        # one cent of difference in one row -> different fingerprint
        df2 = df.copy()
        df2.loc[7, "o_totalprice"] += 0.01
        c = relagg.table_checksum(_many_blocks(df2, 9), "o_orderkey", "o_totalprice").to_pandas()
        assert c["checksum"][0] != a["checksum"][0]


class TestMadOutliers:
    def test_matches_brute_force_and_blocking(self):
        import numpy as np
        import pandas as pd
        import ray
        from spatialjoincountovershells_ray.pipelines.relagg import mad_outliers

        rng = np.random.default_rng(31)
        n = 500
        vals = rng.normal(10.0, 2.0, n)
        vals[::50] += 40.0  # planted outliers
        df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "value": vals})
        out = mad_outliers(
            ray.data.from_pandas([d for d in np.array_split(df, 7)]),
            key="event_id",
            col="value",
        ).to_pandas()
        cents = np.rint(vals * 100).astype(np.int64)
        sv = np.sort(cents)
        med2 = int(sv[(n - 1) // 2]) + int(sv[n // 2])
        d2 = np.abs(2 * cents - med2)
        sd = np.sort(d2)
        md2 = int(sd[(n - 1) // 2]) + int(sd[n // 2])
        want = (2 * d2 > 3 * md2).astype(np.int64)
        assert out["robust_outlier"].to_numpy().tolist() == want.tolist()
        assert out["cents"].to_numpy().tolist() == cents.tolist()
        assert 0 < want.sum() < n  # planted outliers caught, not everything
        out2 = mad_outliers(
            ray.data.from_pandas([df]), key="event_id", col="value"
        ).to_pandas()
        assert out.equals(out2)

    def test_even_odd_median_rule(self):
        import numpy as np
        from spatialjoincountovershells_ray.pipelines.relagg import _median2_from_hist

        # odd count: 2*middle; even: sum of the two middles
        v = np.array([1, 5, 9], np.int64)
        assert _median2_from_hist(v, np.array([1, 1, 1], np.int64)) == 10
        assert _median2_from_hist(v, np.array([1, 1, 2], np.int64)) == 14
        assert _median2_from_hist(np.array([3], np.int64), np.array([4], np.int64)) == 6


def test_winsorize_caps_at_group_p90():
    import numpy as np
    import pandas as pd
    import ray
    from spatialjoincountovershells_ray.pipelines.relagg import winsorize_at_group_quantile

    rng = np.random.default_rng(47)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": rng.exponential(10.0, n).round(2),
        }
    )
    out = (
        winsorize_at_group_quantile(
            ray.data.from_pandas([d for d in np.array_split(df, 6)]),
            group="event_type",
            key="event_id",
            value="value",
            q=0.9,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    cents = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    th = {}
    for g, grp in pd.Series(cents).groupby(df["event_type"]):
        sv = np.sort(grp.to_numpy())
        # quantile_disc: smallest v with cum >= ceil(q*n) (index ceil(q*n)-1)
        th[g] = int(sv[int(np.ceil(0.9 * len(sv))) - 1])
    want = np.minimum(cents, df["event_type"].map(th).to_numpy())
    assert out["capped_cents"].tolist() == want.tolist()
    assert (out["capped_cents"] < out["cents"]).sum() > 0  # some rows actually capped


def test_key_skew_report_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray
    from spatialjoincountovershells_ray.pipelines.relagg import key_skew_report

    rng = np.random.default_rng(53)
    keys = np.concatenate([rng.integers(0, 100, 900), np.full(300, 7)])  # hot key
    df = pd.DataFrame({"k": keys.astype(np.int64)})
    out = key_skew_report(
        ray.data.from_pandas([d for d in np.array_split(df, 6)]), key="k"
    ).to_pandas()
    counts = df["k"].value_counts().to_numpy()
    counts.sort()
    assert out["n_keys"].iloc[0] == len(counts)
    assert out["n_rows"].iloc[0] == len(df)
    assert out["max_n"].iloc[0] == counts.max()
    assert out["p50_n"].iloc[0] == counts[int(np.ceil(0.5 * len(counts))) - 1]
    assert out["p90_n"].iloc[0] == counts[int(np.ceil(0.9 * len(counts))) - 1]


class TestQuantileSketch:
    def _check(self, vals, nblocks, eps):
        import numpy as np
        import pandas as pd
        import ray
        from spatialjoincountovershells_ray.pipelines.relagg import quantile_sketch

        df = pd.DataFrame({"value": vals})
        qs = {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p99": 0.99}
        out = quantile_sketch(
            ray.data.from_pandas([d for d in np.array_split(df, nblocks)]),
            "value",
            qs,
            eps=eps,
        ).to_pandas()
        cents = np.sort(np.rint(np.asarray(vals) * 100).astype(np.int64))
        n = len(cents)
        for name, q in qs.items():
            est = out[name].iloc[0]
            # rank error bound: the estimate's true rank within eps*n of target
            lo = np.searchsorted(cents, est, side="left")
            hi = np.searchsorted(cents, est, side="right") - 1
            target = q * (n - 1)
            err = min(abs(lo - target), abs(hi - target))
            assert err <= eps * n + 1, (name, est, err, eps * n)

    def test_rank_bound_random_and_sorted_blockings(self):
        import numpy as np

        rng = np.random.default_rng(61)
        vals = rng.lognormal(3.0, 1.0, 20000).round(2)
        for nb in (1, 7, 40):
            self._check(vals, nb, eps=0.02)
        # adversarial: globally sorted input (each block covers one range)
        self._check(np.sort(vals), 25, eps=0.02)

    def test_exact_when_batch_smaller_than_summary(self):
        import numpy as np
        import pandas as pd
        import ray
        from spatialjoincountovershells_ray.pipelines.relagg import quantile_sketch

        vals = np.arange(100, dtype=np.float64) / 100.0 * 7  # n << 4/eps
        out = quantile_sketch(
            ray.data.from_pandas([pd.DataFrame({"value": vals})]),
            "value",
            {"p50": 0.5},
            eps=0.01,
        ).to_pandas()
        cents = np.sort(np.rint(vals * 100).astype(np.int64))
        assert out["p50"].iloc[0] == cents[int(np.floor(0.5 * (len(cents) - 1)))]


class TestWeightedSample:
    def test_matches_single_process_oracle_and_blocking(self):
        from spatialjoincountovershells_ray.functions.hashing import mix64
        from spatialjoincountovershells_ray.pipelines import relagg

        rng = np.random.default_rng(13)
        n, k = 5000, 50
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_totalprice": np.round(rng.exponential(100.0, n), 2),
            }
        )
        df.loc[::97, "o_totalprice"] = 0.0  # zero weights must never win
        outs = []
        for nb in (3, 11):
            ds = ray.data.from_pandas([d for d in np.array_split(df, nb)])
            outs.append(
                relagg.weighted_sample(ds, "o_orderkey", "o_totalprice", k)
                .to_pandas()
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])
        out = outs[0]
        # exact A-ES replay
        w = df["o_totalprice"].to_numpy()
        u = (mix64(df["o_orderkey"].to_numpy().astype(np.uint64)).astype(np.float64) + 1.0) / 2.0**64
        with np.errstate(divide="ignore"):
            key = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)), 0.0)
        order = np.lexsort((df["o_orderkey"].to_numpy(), -key))[:k]
        assert out["o_orderkey"].tolist() == df["o_orderkey"].to_numpy()[order].tolist()
        assert out["rnk"].tolist() == list(range(1, k + 1))
        assert (out["o_totalprice"] > 0).all()

    def test_weight_bias(self):
        # heavy rows should be sampled far more often than light ones
        from spatialjoincountovershells_ray.pipelines import relagg

        n = 4000
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_totalprice": np.where(np.arange(n) < 200, 100.0, 1.0),
            }
        )
        out = relagg.weighted_sample(
            ray.data.from_pandas([d for d in np.array_split(df, 6)]),
            "o_orderkey",
            "o_totalprice",
            100,
        ).to_pandas()
        heavy = (out["o_orderkey"] < 200).sum()
        assert heavy >= 60  # 200 heavy rows carry ~84% of total weight


class TestDqChecks:
    def test_counts_every_violation_kind(self):
        from spatialjoincountovershells_ray.pipelines import relational

        df = pd.DataFrame(
            {
                "k": np.array([1, 2, 2, 3, 4, 4, 4, 5], dtype=np.int64),
                "ck": pd.array([10, 20, None, -5, 10, 20, 10, 30], dtype="Int64"),
                "price": [1.0, -2.0, 3.0, 0.0, 5.0, 6.0, -7.0, 8.0],
            }
        )
        valid = np.array([10, 20, 30], dtype=np.int64)
        out = (
            relational.dq_checks(
                ray.data.from_pandas([d for d in np.array_split(df, 3)]),
                not_null=["ck"],
                positive=["price"],
                unique=["k"],
                in_set={"ck": valid},
            )
            .to_pandas()
            .set_index("rule")["n_bad"]
            .to_dict()
        )
        # nulls: 1; nonpositive prices: -2, 0, -7 -> 3; dup keys: (2x2 -> 1) + (4x3 -> 2) = 3
        # in_set: -5 bad, None bad (not in the set) -> 2
        assert out == {
            "not_null:ck": 1,
            "positive:price": 3,
            "unique:k": 3,
            "in_set:ck": 2,
        }

    def test_no_rules_raises(self):
        from spatialjoincountovershells_ray.pipelines import relational

        with pytest.raises(ValueError, match="no rules"):
            relational.dq_checks(ray.data.range(3))


class TestUnpivot:
    def test_melt_roundtrip(self):
        from spatialjoincountovershells_ray.pipelines import relational

        rng = np.random.default_rng(41)
        n = 500
        df = pd.DataFrame(
            {
                "l_orderkey": rng.integers(1, 100, n).astype(np.int64),
                "l_linenumber": rng.integers(1, 8, n).astype(np.int32),
                "l_quantity": rng.integers(1, 50, n).astype(np.float64),
                "l_extendedprice": rng.random(n) * 1000,
                "l_discount": rng.random(n) * 0.1,
                "l_tax": rng.random(n) * 0.08,
            }
        )
        ds = ray.data.from_pandas([d for d in np.array_split(df, 4)])
        out = relational.lineitem_unpivot(ds).to_pandas()
        assert len(out) == 4 * n
        assert sorted(out["measure"].unique()) == sorted(relational.UNPIVOT_MEASURES)
        # values pass through bit-exact: pivot back and compare
        for m in relational.UNPIVOT_MEASURES:
            sub = out[out["measure"] == m].sort_values(["l_orderkey", "l_linenumber"])
            src = df.sort_values(["l_orderkey", "l_linenumber"])
            assert np.array_equal(
                np.sort(sub["val"].to_numpy()), np.sort(df[m].to_numpy())
            )


class TestApplyChanges:
    def test_merge_semantics(self):
        from spatialjoincountovershells_ray.pipelines import relational

        base = pd.DataFrame(
            {
                "k": np.array([1, 2, 3, 4], np.int64),
                "v": ["a", "b", "c", "d"],
            }
        )
        changes = pd.DataFrame(
            {
                "k": np.array([2, 3, 9], np.int64),
                "v": ["B", "ignored", "new"],
                "op": ["upsert", "delete", "upsert"],
            }
        )
        out = (
            relational.apply_changes(
                ray.data.from_pandas([base.iloc[:2], base.iloc[2:]]),
                ray.data.from_pandas(changes),
                "k",
                ["v"],
            )
            .to_pandas()
            .reset_index(drop=True)
        )
        assert out["k"].tolist() == [1, 2, 4, 9]
        assert out["v"].tolist() == ["a", "B", "d", "new"]

    def test_duplicate_keys_refused(self):
        import pytest

        from spatialjoincountovershells_ray.pipelines import relational

        base = pd.DataFrame({"k": np.array([1, 1], np.int64), "v": ["a", "b"]})
        ch = pd.DataFrame({"k": np.array([1], np.int64), "v": ["x"], "op": ["upsert"]})
        with pytest.raises(Exception, match="duplicate keys"):
            relational.apply_changes(
                ray.data.from_pandas(base), ray.data.from_pandas(ch), "k", ["v"]
            ).to_pandas()


class TestMaintainGroupAgg:
    def test_incremental_matches_recompute(self):
        from spatialjoincountovershells_ray.pipelines import relational

        base = pd.DataFrame(
            {
                "k": np.array([1, 2, 3, 4, 5], np.int64),
                "g": np.array([10, 10, 20, 20, 30], np.int64),
                "v": np.array([100, 200, 300, 400, 500], np.int64),
            }
        )
        # upsert k=1 MOVES it 10->20 with new value; delete k=5 empties
        # group 30; insert k=9 creates group 40; delete k=77 is a no-op
        changes = pd.DataFrame(
            {
                "k": np.array([1, 5, 9, 77], np.int64),
                "op": ["upsert", "delete", "upsert", "delete"],
                "g": np.array([20, 0, 40, 0], np.int64),
                "v": np.array([111, 0, 900, 0], np.int64),
            }
        )
        out = (
            relational.maintain_group_agg(
                ray.data.from_pandas([base.iloc[:3], base.iloc[3:]]),
                ray.data.from_pandas(changes),
                "k",
                "g",
                "v",
            )
            .to_pandas()
            .reset_index(drop=True)
        )
        # recompute oracle: applied = {2:(10,200), 3:(20,300), 4:(20,400),
        # 1:(20,111), 9:(40,900)}
        assert out["g"].tolist() == [10, 20, 40]
        assert out["n"].tolist() == [1, 3, 1]
        assert out["s"].tolist() == [200, 300 + 400 + 111, 900]


class TestSpendGini:
    def test_matches_bruteforce(self):
        from spatialjoincountovershells_ray.pipelines.relagg import spend_gini

        rng = np.random.default_rng(41)
        n = 5000
        segs = np.array(["AUTO", "BUILDING", "X"])[rng.integers(0, 3, n)]
        cents = rng.integers(1, 10_000, n).astype(np.int64)
        cents[segs == "X"] = 77  # an all-tied group; plus a singleton group
        segs[0], cents[0] = "SOLO", 123
        df = pd.DataFrame({"seg": segs, "cents": cents})
        got = (
            spend_gini(
                ray.data.from_pandas([d for d in np.array_split(df, 7)]),
                "seg",
                "cents",
            )
            .to_pandas()
            .set_index("seg")
        )
        for s, g in df.groupby("seg"):
            x = np.sort(g["cents"].to_numpy())
            m = len(x)
            want = int(((2 * np.arange(1, m + 1) - m - 1) * x).sum())
            assert got.loc[s, "n"] == m
            assert got.loc[s, "sum_cents"] == x.sum()
            assert got.loc[s, "gini_num"] == want
        # all-tied group has zero concentration; singleton too
        assert got.loc["X", "gini_num"] == 0
        assert got.loc["SOLO", "gini_num"] == 0
