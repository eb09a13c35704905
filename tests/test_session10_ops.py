"""Session-10 operators: doc_chunks, basket_pairs, order_percent_rank —
vs exact DuckDB oracles on multi-block synthetic inputs."""

import duckdb
import numpy as np
import pandas as pd
import ray

from spatialjoincountovershells_ray.pipelines import graph, textops, window


def _blocks(df, nblocks=5):
    return ray.data.from_pandas([d for d in np.array_split(df, nblocks)])


class TestDocChunks:
    def test_matches_substr_oracle(self):
        rng = np.random.default_rng(7)
        texts = [
            "".join(rng.choice(list("abcdef "), size=int(n)))
            for n in rng.integers(0, 40, 200)
        ]
        df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
        size, stride = 10, 7
        out = (
            textops.doc_chunks(_blocks(df), size=size, stride=stride)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(
            "WITH g AS (SELECT doc_id, text, "
            f"unnest(range(0, CAST(length(text) AS BIGINT), {stride})) AS s "
            "FROM documents WHERE length(text) > 0) "
            f"SELECT doc_id, CAST(s // {stride} AS BIGINT) AS chunk_id, "
            "CAST(s AS BIGINT) AS chunk_start, "
            f"substr(text, CAST(s + 1 AS INTEGER), {size}) AS chunk FROM g "
            "ORDER BY doc_id, chunk_id"
        ).df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)

    def test_tail_and_short_docs(self):
        df = pd.DataFrame(
            {"doc_id": np.array([1, 2, 3], np.int64), "text": ["abcdefgh", "x", ""]}
        )
        out = (
            textops.doc_chunks(ray.data.from_pandas(df), size=4, stride=3)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
        )
        # doc 1: offsets 0,3,6 -> 'abcd','defg','gh'; doc 2: 'x'; doc 3: nothing
        assert out["chunk"].tolist() == ["abcd", "defg", "gh", "x"]
        assert out["chunk_start"].tolist() == [0, 3, 6, 0]


class TestBasketPairs:
    def test_matches_self_join_oracle(self):
        rng = np.random.default_rng(13)
        n = 4000
        df = pd.DataFrame(
            {
                "l_orderkey": rng.integers(0, 600, n).astype(np.int64),
                "l_partkey": rng.integers(0, 80, n).astype(np.int64),
            }
        )
        out = (
            graph.basket_pairs(_blocks(df), min_support=3)
            .to_pandas()
            .sort_values(["part_a", "part_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("lineitem", df)
        exp = con.execute(
            "WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), "
            "pcnt AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY p), "
            "pr AS (SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS pair_orders "
            "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 "
            "HAVING count(*) >= 3) "
            "SELECT pr.pa AS part_a, pr.pb AS part_b, pr.pair_orders, "
            "ca.n AS a_orders, cb.n AS b_orders "
            "FROM pr JOIN pcnt ca ON ca.p = pr.pa JOIN pcnt cb ON cb.p = pr.pb "
            "ORDER BY part_a, part_b"
        ).df()
        assert len(exp) > 0
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


class TestPercentRank:
    def test_matches_window_sql(self):
        rng = np.random.default_rng(17)
        n = 3000
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_custkey": rng.integers(0, 50, n).astype(np.int64),
                # coarse prices force peer ties; some customers have 1 order
                "o_totalprice": rng.integers(1, 12, n).astype(np.float64) * 5.0,
            }
        )
        # add a few single-order customers (n-1 == 0 edge)
        df.loc[:4, "o_custkey"] = np.arange(1000, 1005, dtype=np.int64)
        out = (
            window.order_percent_rank(_blocks(df))
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("orders", df)
        exp = con.execute(
            "SELECT o_orderkey, "
            "percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS pct_rank, "
            "cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS cume "
            "FROM orders ORDER BY o_orderkey"
        ).df()
        # bit-exact: both sides are single IEEE divisions of small ints
        assert (out["pct_rank"].to_numpy() == exp["pct_rank"].to_numpy()).all()
        assert (out["cume"].to_numpy() == exp["cume"].to_numpy()).all()


class TestSnmPairs:
    def test_matches_window_join_oracle(self):
        from spatialjoincountovershells_ray.pipelines import dedup

        rng = np.random.default_rng(23)
        vocab = [f"w{i}" for i in range(12)]
        texts = [
            " ".join(rng.choice(vocab, size=int(k)))
            for k in rng.integers(3, 9, 300)
        ]
        df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
        w, num, den = 4, 1, 2
        out = (
            dedup.snm_pairs(_blocks(df, 6), window=w, tau_num=num, tau_den=den,
                            bucket_rows=64)  # force multiple rank buckets
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(
            "WITH r AS (SELECT doc_id, text, "
            "row_number() OVER (ORDER BY text, doc_id) - 1 AS rn FROM documents), "
            "tok AS (SELECT doc_id, rn, "
            "list_distinct(regexp_extract_all(text, '\\S+')) AS ws FROM r), "
            "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(length(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter, "
            "CAST(length(a.ws) + length(b.ws) - length(list_intersect(a.ws, b.ws)) AS BIGINT) AS uni "
            f"FROM tok a JOIN tok b ON b.rn > a.rn AND b.rn <= a.rn + {w - 1}) "
            f"SELECT doc_a, doc_b, inter, uni FROM p WHERE {den} * inter >= {num} * uni "
            "ORDER BY doc_a, doc_b"
        ).df()
        assert len(exp) > 0
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


class TestValueTimeIntegral:
    def test_matches_lead_oracle(self):
        from spatialjoincountovershells_ray.pipelines import events as ev

        rng = np.random.default_rng(31)
        n = 2000
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.integers(0, 40, n).astype(np.int64),
                "ts": pd.to_datetime(
                    rng.integers(0, 10**9, n) * 1000, unit="us"
                ).astype("datetime64[us]"),
                "value": rng.uniform(0, 50, n).round(2),
            }
        )
        out = (
            ev.value_time_integral(_blocks(df, 5))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute(
            "WITH e AS (SELECT user_id, event_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents, epoch_us(ts) AS us FROM events), "
            "w AS (SELECT user_id, cents, us, "
            "lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt FROM e) "
            "SELECT user_id, CAST(COALESCE(SUM(cents * (nxt - us)), 0) AS BIGINT) AS integral, "
            "CAST(max(us) - min(us) AS BIGINT) AS dur_us, "
            "CAST(count(*) AS BIGINT) AS n_events FROM w GROUP BY user_id ORDER BY user_id"
        ).df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)

    def test_single_event_user(self):
        from spatialjoincountovershells_ray.pipelines import events as ev

        df = pd.DataFrame(
            {
                "event_id": np.array([1], np.int64),
                "user_id": np.array([7], np.int64),
                "ts": pd.to_datetime([10**6], unit="us").astype("datetime64[us]"),
                "value": [3.5],
            }
        )
        out = ev.value_time_integral(ray.data.from_pandas(df)).to_pandas()
        assert out["integral"].tolist() == [0]
        assert out["dur_us"].tolist() == [0]
        assert out["n_events"].tolist() == [1]


class TestValueLag1:
    def test_matches_lead_oracle(self):
        from spatialjoincountovershells_ray.pipelines import events as ev

        rng = np.random.default_rng(37)
        n = 1500
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.integers(0, 30, n).astype(np.int64),
                "ts": pd.to_datetime(
                    rng.integers(0, 10**9, n) * 1000, unit="us"
                ).astype("datetime64[us]"),
                "value": rng.uniform(0, 50, n).round(2),
            }
        )
        out = (
            ev.value_lag1_products(_blocks(df, 4))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute(
            "WITH e AS (SELECT user_id, event_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents, epoch_us(ts) AS us FROM events), "
            "w AS (SELECT user_id, cents, "
            "lead(cents) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt FROM e) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
            "CAST(SUM(cents) AS BIGINT) AS sx, "
            "CAST(SUM(cents * cents) AS BIGINT) AS sxx, "
            "CAST(COALESCE(SUM(cents * nxt), 0) AS BIGINT) AS sxy "
            "FROM w GROUP BY user_id ORDER BY user_id"
        ).df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


class TestLabelCov:
    def test_matches_pairwise_oracle(self):
        from spatialjoincountovershells_ray.pipelines import ann
        from spatialjoincountovershells_ray.pipelines.ann import CENTROID_FP_SCALE as S

        import pyarrow as pa

        rng = np.random.default_rng(41)
        n, d = 300, 6
        m = rng.normal(size=(n, d)).astype(np.float32)
        lab = rng.integers(0, 3, n).astype(np.int32)
        tbl = pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "label": pa.array(lab, pa.int32()),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
            }
        )
        ds = ray.data.from_arrow(tbl)
        out = ann.label_cov(ds).to_pandas()
        # single-process exact replay
        q = np.floor(m.astype(np.float64) * S + 0.5).astype(np.int64)
        iu, ju = np.triu_indices(d)
        rows = []
        for lv in np.unique(lab):
            qg = q[lab == lv]
            g = qg.T @ qg
            for i, j in zip(iu, ju):
                rows.append((int(lv), int(i), int(j), len(qg), int(g[i, j])))
        exp = pd.DataFrame(rows, columns=["label", "di", "dj", "n", "spp"])
        exp = exp.sort_values(["label", "di", "dj"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out[exp.columns.tolist()].astype("int64"), exp.astype("int64")
        )
