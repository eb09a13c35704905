"""Session-12 operators vs exact DuckDB/pandas oracles on multi-block
synthetic inputs (edge cases the sf fixtures don't stress: empty docs,
single-token docs, repeated bigrams inside one doc, cross-block grams)."""

import duckdb
import numpy as np
import pandas as pd
import ray

from spatialjoincountovershells_ray.pipelines import textops


def _blocks(df, nblocks=5):
    return ray.data.from_pandas([d for d in np.array_split(df, nblocks)])


class TestLmBigramScore:
    def test_matches_duckdb_oracle(self):
        rng = np.random.default_rng(12)
        vocab = ["alpha", "beta", "gamma", "delta", "x"]
        texts = []
        for n in rng.integers(0, 12, 300):
            texts.append(" ".join(rng.choice(vocab, size=int(n))))
        # edge cases: empty, whitespace-only, single token, heavy repeat
        texts[:4] = ["", "   \t  ", "solo", "a b a b a b a b"]
        df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": texts})

        out = (
            textops.lm_bigram_score(_blocks(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(
            "WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, "
            "'[ \\t\\n\\r\\x0b\\x0c]+'), x -> x <> '') AS w FROM documents), "
            "bg AS (SELECT doc_id, unnest(CASE WHEN len(w) < 2 THEN []::VARCHAR[] "
            "ELSE list_transform(generate_series(1, len(w) - 1), "
            "i -> w[i] || chr(31) || w[i+1]) END) AS gram FROM t), "
            "c AS (SELECT gram, count(*) AS total FROM bg GROUP BY gram), "
            "s AS (SELECT bg.doc_id, count(*) AS nb, sum(total) AS sc, "
            "count(*) FILTER (total = 1) AS nh FROM bg JOIN c USING (gram) "
            "GROUP BY bg.doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams, "
            "CAST(COALESCE(sc, 0) AS BIGINT) AS sum_count, "
            "CAST(COALESCE(nh, 0) AS BIGINT) AS n_hapax "
            "FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id"
        ).df()
        pd.testing.assert_frame_equal(out, exp)

    def test_hapax_and_boilerplate_signal(self):
        # one doc repeating a corpus-common bigram, one doc of unique noise
        df = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": [
                    "the cat sat",
                    "the cat ran",
                    "the cat slept",
                    "zq xv qqq unique gibberish",
                ],
            }
        )
        out = textops.lm_bigram_score(_blocks(df, 2)).to_pandas().set_index("doc_id")
        # "the cat" occurs 3x corpus-wide -> each of docs 0-2 gets 3 for it
        assert out.loc[0, "sum_count"] == 3 + 1  # "the cat"(3) + "cat sat"(1)
        assert out.loc[0, "n_hapax"] == 1
        # gibberish doc: every bigram is a hapax
        assert out.loc[3, "n_hapax"] == out.loc[3, "n_bigrams"] == 4


class TestMediaPhash:
    def _docs(self, n=40):
        from spatialjoincountovershells_ray.sources.documents import halo_documents

        rng = np.random.default_rng(3)
        xyz = rng.uniform(0, 100, (n, 3))
        return ray.data.from_arrow(halo_documents(np.arange(n, dtype=np.int64), xyz))

    def test_variant_pairs_are_orig_thumb(self):
        from spatialjoincountovershells_ray.pipelines import multimodal as MM

        docs = self._docs()
        ph = MM.media_phash(MM.media_variants(docs)).to_pandas()
        assert len(ph) == 80  # one orig + one thumb per doc
        by_id = ph.set_index("media_id")["media_ref"].to_dict()
        pairs = MM.media_phash_dups(docs).to_pandas()
        # every emitted pair must be an (orig, thumb) of the SAME image:
        # random 64-bit hashes collide within hamming<=5 with p ~ 5e-13
        for _, r in pairs.iterrows():
            a, b = by_id[r.id_a], by_id[r.id_b]
            assert a.replace("_thumb.png", ".png") == b.replace("_thumb.png", ".png")
        assert len(pairs) >= 30  # most thumbs land within hamming 5

    def test_banding_matches_bruteforce(self):
        from spatialjoincountovershells_ray.pipelines import multimodal as MM
        from spatialjoincountovershells_ray.functions.hashing import popcount64

        docs = self._docs(25)
        ph = MM.media_phash(MM.media_variants(docs)).to_pandas()
        h = ph["phash"].to_numpy().view(np.uint64)
        ids = ph["media_id"].to_numpy()
        ia, ib = np.triu_indices(len(h), 1)
        ham = popcount64(h[ia] ^ h[ib])
        keep = ham <= 5
        lo = np.minimum(ids[ia][keep], ids[ib][keep])
        hi = np.maximum(ids[ia][keep], ids[ib][keep])
        want = sorted(zip(lo.tolist(), hi.tolist()))
        got = MM.media_phash_dups(docs).to_pandas()
        assert sorted(zip(got.id_a.tolist(), got.id_b.tolist())) == want


class TestHardNegatives:
    def test_matches_bruteforce(self):
        from spatialjoincountovershells_ray.pipelines import ann

        rng = np.random.default_rng(5)
        n, d = 120, 8
        mat = rng.normal(size=(n, d)).astype(np.float32)
        labs = rng.integers(0, 4, n).astype(np.int32)
        df = pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "label": labs,
                "embedding": list(mat),
            }
        )
        out = ann.hard_negatives(_blocks(df, 6), k=3, sample_mod=10).to_pandas()

        S = ann.CENTROID_FP_SCALE
        fp = np.floor(mat.astype(np.float64) * S + 0.5).astype(np.int64)
        for q in range(0, n, 10):
            d2 = ((fp - fp[q]) ** 2).sum(axis=1)
            d2[labs == labs[q]] = np.iinfo(np.int64).max
            order = np.lexsort((np.arange(n), d2))[:3]
            got = out[out.qid == q].sort_values("rnk")
            assert got.neg_id.tolist() == order.tolist()
            assert got.d2.tolist() == d2[order].tolist()
            # every mined negative really has a different label
            assert (labs[got.neg_id.to_numpy()] != labs[q]).all()


class TestHaloNN:
    def test_matches_bruteforce_min_image(self):
        from spatialjoincountovershells_ray.config import BOX_SIZE
        from spatialjoincountovershells_ray.pipelines import knn as K

        rng = np.random.default_rng(9)
        n = 200
        xyz = rng.uniform(0, BOX_SIZE, (n, 3))
        # plant a cross-boundary pair: min-image must see them as close
        xyz[0] = [1.0, 1.0, 1.0]
        xyz[1] = [BOX_SIZE - 1.0, BOX_SIZE - 1.0, BOX_SIZE - 1.0]
        df = pd.DataFrame(
            {"halo_id": np.arange(n, dtype=np.int64), "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]}
        )
        r2l = (np.array([2.0, 8.0, 32.0, 128.0]) ** 2).astype(np.float64)
        out = K.halo_nn(_blocks(df, 4), r2l).to_pandas()

        d = xyz[:, None, :] - xyz[None, :, :]
        d -= BOX_SIZE * np.floor(d / BOX_SIZE + 0.5)
        d2 = (d * d).sum(-1)
        np.fill_diagonal(d2, np.inf)
        want_nn = np.lexsort((np.arange(n)[None, :].repeat(n, 0), d2), axis=1)[:, 0]
        assert out.halo_id.tolist() == list(range(n))
        assert out.nn_id.tolist() == want_nn.tolist()
        want_shell = np.searchsorted(r2l, d2[np.arange(n), want_nn], side="right")
        assert out.shell.tolist() == want_shell.tolist()
        # the planted wrap-around pair found each other
        assert out.nn_id[0] == 1 and out.nn_id[1] == 0

    def test_hist_sums_to_halos(self):
        from spatialjoincountovershells_ray.config import BOX_SIZE
        from spatialjoincountovershells_ray.pipelines import knn as K

        rng = np.random.default_rng(2)
        n = 100
        df = pd.DataFrame(
            {
                "halo_id": np.arange(n, dtype=np.int64),
                "x": rng.uniform(0, BOX_SIZE, n),
                "y": rng.uniform(0, BOX_SIZE, n),
                "z": rng.uniform(0, BOX_SIZE, n),
            }
        )
        r2l = (np.array([5.0, 50.0, 500.0]) ** 2).astype(np.float64)
        hist = K.nn_shell_hist(K.halo_nn(_blocks(df, 3), r2l), 3).to_pandas()
        assert hist.shell.tolist() == [0, 1, 2, 3]
        assert hist.n.sum() == n


class TestRedactPatterns:
    def test_sequential_semantics_and_counts(self):
        df = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": [
                    "mail bob@corp.io and sue@h.org now",
                    "call 555-123 or 555-9 twice",
                    "nothing to scrub here",
                    "x@y.z then 555-42",
                ],
            }
        )
        out = (
            textops.redact_patterns(
                _blocks(df, 2),
                [
                    ("email", r"[a-z0-9]+@[a-z0-9]+\.[a-z]+", "<EMAIL>"),
                    ("phone", r"555-[0-9]+", "<PHONE>"),
                ],
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.n_email.tolist() == [2, 0, 0, 1]
        assert out.n_phone.tolist() == [0, 2, 0, 1]
        # fp equals the fingerprint of the manually redacted text
        from spatialjoincountovershells_ray.functions.text import rolling_fingerprint

        import re

        red = [
            re.sub(r"555-[0-9]+", "<PHONE>", re.sub(r"[a-z0-9]+@[a-z0-9]+\.[a-z]+", "<EMAIL>", t))
            for t in df.text
        ]
        assert out.fp.tolist() == rolling_fingerprint(red).tolist()


class TestBalanceShards:
    def test_roundrobin_over_size_order(self):
        from spatialjoincountovershells_ray.pipelines import window as W

        rng = np.random.default_rng(11)
        n, k = 500, 7
        sizes = rng.integers(1, 10_000, n).astype(np.int64)
        df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "n_chars": sizes})
        out = W.balance_shards(_blocks(df, 5), "n_chars", "doc_id", k).to_pandas()

        order = np.lexsort((np.arange(n), -sizes))
        shard = np.arange(n) % k
        want_cnt = np.bincount(shard, minlength=k)
        want_tot = np.bincount(shard, weights=sizes[order], minlength=k).astype(np.int64)
        assert out.shard.tolist() == list(range(k))
        assert out.n_docs.tolist() == want_cnt.tolist()
        assert out.total_chars.tolist() == want_tot.tolist()
        # the balancer actually balances: totals within ~ one max doc
        assert out.total_chars.max() - out.total_chars.min() <= sizes.max()
