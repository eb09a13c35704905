"""Curation operators (pipelines.curation) vs exact DuckDB/pandas
oracles on multi-block synthetic inputs: decontamination (string-equal
n-gram overlap), blocklist scrubbing, hash split, sequence packing."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.functions import text as T
from spatialjoincountovershells_ray.pipelines import curation


def _blocks(df, nblocks=5):
    return ray.data.from_pandas([d for d in np.array_split(df, nblocks)])


def _word_docs(seed, n, vocab=40, lo=3, hi=30):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(lo, hi)))
        for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


class TestGramKernels:
    def test_gram_hashes_respect_row_boundaries(self):
        col = pa.array(["a b c", "c a", "x"])
        th, row_of, _ = T.segmented_token_hashes(col)
        gh, gfirst = T.gram_hashes(th, row_of, 2)
        # row 0 contributes 'a b','b c'; row 1 'c a'; row 2 nothing
        assert len(gh) == 3
        assert row_of[gfirst].tolist() == [0, 0, 1]
        # order sensitivity: 'a b' != 'b a'
        th2, row2, _ = T.segmented_token_hashes(pa.array(["b a"]))
        gh2, _ = T.gram_hashes(th2, row2, 2)
        assert gh2[0] != gh[0]

    def test_gram_hash_deterministic_across_layouts(self):
        one = pa.array(["k1 k2 k3 k4"])
        two = pa.array(["pad pad", "k1 k2 k3 k4"])
        g1, _ = T.gram_hashes(*T.segmented_token_hashes(one)[:2], 3)
        g2, _ = T.gram_hashes(*T.segmented_token_hashes(two)[:2], 3)
        assert set(g1.tolist()) <= set(g2.tolist())


class TestDecontaminate:
    def test_matches_string_equality_sql(self):
        df = _word_docs(5, 400, vocab=12, lo=3, hi=12)  # tiny vocab -> real overlap
        bench = df[df.doc_id % 7 == 0]
        train = df[df.doc_id % 7 != 0]
        out = (
            curation.decontaminate(_blocks(train), _blocks(bench, 2), n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) > 0, "fixture must produce real contamination"
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(
            "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents), "
            "grams AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g "
            "FROM (SELECT doc_id, t, unnest(range(1, len(t)-1)) AS i FROM toks WHERE len(t) >= 3)), "
            "bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0) "
            "SELECT g.doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_hits "
            "FROM grams g JOIN bench b USING (g) WHERE g.doc_id % 7 <> 0 "
            "GROUP BY g.doc_id ORDER BY g.doc_id"
        ).df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)

    def test_no_benchmark_grams(self):
        train = _word_docs(6, 50)
        bench = pd.DataFrame({"doc_id": np.array([9], np.int64), "text": ["zz"]})
        out = curation.decontaminate(_blocks(train, 2), _blocks(bench, 1), n=3).to_pandas()
        assert len(out) == 0


class TestScrub:
    def test_matches_regexp_replace(self):
        df = _word_docs(7, 300, vocab=8)
        out = (
            curation.scrub_blocklist(_blocks(df), ["w1", "w3"], "<X>")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(
            "SELECT doc_id, regexp_replace(text, '\\b(w1|w3)\\b', '<X>', 'g') AS clean_text, "
            "CAST(length(regexp_extract_all(text, '\\b(w1|w3)\\b')) AS BIGINT) AS n_scrubbed "
            "FROM documents ORDER BY doc_id"
        ).df()
        assert exp.n_scrubbed.sum() > 0
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)

    def test_word_boundary_not_substring(self):
        df = pd.DataFrame({"doc_id": np.array([0], np.int64), "text": ["w1 w11 xw1"]})
        out = curation.scrub_blocklist(_blocks(df, 1), ["w1"], "<X>").to_pandas()
        assert out.clean_text[0] == "<X> w11 xw1"
        assert out.n_scrubbed[0] == 1


class TestHashSplit:
    def test_deterministic_and_rate(self):
        df = pd.DataFrame(
            {
                "doc_id": np.arange(5000, dtype=np.int64),
                "source": np.repeat(["a", "b"], 2500),
            }
        )
        out = curation.hash_split(_blocks(df), "doc_id", 0.2, ["doc_id", "source"]).to_pandas()
        out2 = curation.hash_split(_blocks(df, 3), "doc_id", 0.2, ["doc_id", "source"]).to_pandas()
        m1 = out.sort_values("doc_id").reset_index(drop=True)
        m2 = out2.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(m1, m2)  # block layout can't change the split
        rate = (m1.split == "val").mean()
        assert 0.15 < rate < 0.25
        # stratified in expectation: both sources sampled
        assert set(m1[m1.split == "val"].source) == {"a", "b"}


class TestPackSequences:
    def test_matches_window_sql(self):
        df = _word_docs(8, 700)
        # shuffle the row order across blocks: packing must be keyed on
        # doc_id order, not arrival order
        shuf = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
        out = (
            curation.pack_sequences(_blocks(shuf), 64)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(
            "WITH t AS (SELECT doc_id, CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "c AS (SELECT doc_id, n_tokens, COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t) "
            "SELECT doc_id, n_tokens, CAST(cb // 64 AS BIGINT) AS pack_id, "
            "CAST(cb % 64 AS BIGINT) AS pack_offset FROM c ORDER BY doc_id"
        ).df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)
        # packing invariant: pack ids are a non-decreasing cover of 0..max
        pids = out.sort_values("doc_id").pack_id.to_numpy()
        assert (np.diff(pids) >= 0).all()
        assert set(range(int(pids.max()) + 1)) == set(pids.tolist())


class TestHLL:
    def test_registers_match_hugeint_sql_twin(self):
        rng = np.random.default_rng(13)
        keys = rng.integers(0, 1 << 40, 20000).astype(np.int64)
        df = pd.DataFrame({"user_id": keys})
        from spatialjoincountovershells_ray.pipelines import relagg
        from spatialjoincountovershells_ray.queries import _hll_sql

        out = (
            relagg.hll_registers(_blocks(df, 7), "user_id", p=8)
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute(_hll_sql() + " ORDER BY bucket").df()
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)

    def test_estimate_accuracy(self):
        rng = np.random.default_rng(14)
        true_n = 5000
        keys = np.unique(rng.integers(1, 1 << 50, true_n * 2).astype(np.int64))[:true_n]
        assert len(keys) == true_n  # 2^50 key space: collisions ~0
        df = pd.DataFrame({"user_id": np.repeat(keys, 3)})  # dups must not matter
        from spatialjoincountovershells_ray.pipelines import relagg

        regs = relagg.hll_registers(_blocks(df, 5), "user_id", p=8).to_pandas()
        est = relagg.hll_estimate(regs, p=8)
        assert abs(est - true_n) / true_n < 0.15  # ~6.5% sigma at m=256

    def test_block_layout_invariance(self):
        df = pd.DataFrame({"user_id": np.arange(3000, dtype=np.int64)})
        from spatialjoincountovershells_ray.pipelines import relagg

        a = relagg.hll_registers(_blocks(df, 2), "user_id").to_pandas().sort_values("bucket")
        b = relagg.hll_registers(_blocks(df, 9), "user_id").to_pandas().sort_values("bucket")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


class TestShuffleShards:
    def test_global_hash_order_and_balance(self):
        import pandas as pd

        from spatialjoincountovershells_ray.functions.hashing import mix64
        from spatialjoincountovershells_ray.pipelines import curation

        n = 4003
        df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
        ds = ray.data.from_pandas([d for d in np.array_split(df, 9)])
        out = curation.shuffle_shards(ds, nshards=8).to_pandas()
        assert len(out) == n
        # pos is the rank in mix64 order
        h = mix64(df["doc_id"].to_numpy().astype(np.uint64))
        want_order = df["doc_id"].to_numpy()[np.argsort(h)]
        got = out.sort_values("pos")
        assert (got["doc_id"].to_numpy() == want_order).all()
        assert (got["shard"].to_numpy() == got["pos"].to_numpy() % 8).all()
        # shard sizes equal to within one row
        sizes = out.groupby("shard").size()
        assert sizes.max() - sizes.min() <= 1
        # deterministic across a different blocking
        ds2 = ray.data.from_pandas([d for d in np.array_split(df, 4)])
        out2 = curation.shuffle_shards(ds2, nshards=8).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values("pos").reset_index(drop=True),
            out2.sort_values("pos").reset_index(drop=True),
        )


class TestMixtureSample:
    def test_copies_match_arithmetic_and_rates(self):
        from spatialjoincountovershells_ray.pipelines.relagg import (
            _SAMPLE_A,
            _SAMPLE_B,
            _SAMPLE_M,
        )

        n = 6000
        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "source": rng.choice(["a", "b", "c", "d"], size=n),
            }
        )
        rates = {"a": 0.3, "b": 1.0, "c": 1.5, "d": 2.25}
        out = curation.mixture_sample(_blocks(df, 7), rates).to_pandas()
        # oracle: same integer arithmetic, row by row
        nums = curation.mixture_rate_nums(rates)
        num = df["source"].map(nums).to_numpy(dtype=np.int64)
        h = (df["doc_id"].to_numpy() * _SAMPLE_A + _SAMPLE_B) % _SAMPLE_M
        want = num // _SAMPLE_M + (h < num % _SAMPLE_M)
        got = out.groupby("doc_id").size().reindex(df["doc_id"], fill_value=0).to_numpy()
        assert (got == want).all()
        # copy indices are 0..copies-1 per doc
        mx = out.groupby("doc_id")["copy"].max()
        assert (mx.to_numpy() == want[want > 0] - 1).all()
        # realized per-source rate tracks the requested rate
        for s, r in rates.items():
            ns = (df["source"] == s).sum()
            assert abs(len(out[out["source"] == s]) / ns - r) < 0.1
        # blocking-invariant (deterministic mixture)
        out2 = curation.mixture_sample(_blocks(df, 3), rates).to_pandas()
        key = ["doc_id", "copy"]
        pd.testing.assert_frame_equal(
            out.sort_values(key).reset_index(drop=True),
            out2.sort_values(key).reset_index(drop=True),
        )

    def test_key_overflow_guard(self):
        import pytest

        df = pd.DataFrame(
            {"doc_id": np.array([2**62], dtype=np.int64), "source": ["a"]}
        )
        with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
            curation.mixture_sample(_blocks(df, 1), {"a": 1.0}).to_pandas()


class TestSourceDiversity:
    def test_matches_duckdb(self):
        from spatialjoincountovershells_ray.pipelines import textops

        df = _word_docs(3, 300, vocab=25, lo=2, hi=20)
        rng = np.random.default_rng(4)
        df["source"] = rng.choice(["s1", "s2", "s3"], size=len(df))
        got = (
            textops.source_diversity(_blocks(df, 6))
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        want = con.execute(
            "WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents), "
            "c AS (SELECT source, term, count(*) AS n FROM t WHERE term <> '' GROUP BY 1, 2) "
            "SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens, "
            "CAST(COUNT(*) AS BIGINT) AS n_terms, CAST(SUM(n*n) AS BIGINT) AS sum_sq "
            "FROM c GROUP BY source ORDER BY source"
        ).df()
        pd.testing.assert_frame_equal(got, want)


class TestNearDupCurated:
    def test_keep_rule_is_min_per_cluster(self):
        from spatialjoincountovershells_ray.pipelines import dedup

        df = _word_docs(9, 120, vocab=8, lo=3, hi=8)  # tiny vocab -> dup clusters
        df["source"] = "s"
        clusters = (
            dedup.ngram_dup_clusters(_blocks(df, 5), n=3, threshold=0.2)
            .to_pandas()
        )
        curated = (
            dedup.near_dup_curated(_blocks(df, 5), n=3, threshold=0.2)
            .to_pandas()["doc_id"]
            .to_numpy()
        )
        want = np.sort(clusters["cluster_id"].unique())
        assert (np.sort(curated) == want).all()
        # every cluster survives exactly once and by its min member
        assert set(want) == set(
            clusters.groupby("cluster_id")["doc_id"].min().to_numpy()
        )
