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
