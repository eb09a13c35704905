import numpy as np
import pyarrow as pa
import pytest
import ray

from spatialjoincountovershells_ray.pipelines import bpe


def _docs(texts: list[str]) -> pa.Table:
    return pa.table({"text": pa.array(texts, pa.string())})


def _rows(ds) -> list[tuple]:
    t = ds if isinstance(ds, pa.Table) else pa.concat_tables(ray.get(ds.to_arrow_refs()))
    return list(
        zip(
            t.column("rank").to_pylist(),
            t.column("left").to_pylist(),
            t.column("right").to_pylist(),
            t.column("token").to_pylist(),
            t.column("pair_count").to_pylist(),
        )
    )


def _word_counts(texts: list[str]) -> dict[str, int]:
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


class TestBpeTrain:
    def test_matches_reference_at_two_shardings(self):
        rng = np.random.default_rng(7)
        vocab = ["low", "lower", "lowest", "new", "newer", "widest", "wide", "er"]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
            for _ in range(80)
        ]
        expect = bpe.bpe_train_reference(_word_counts(texts), num_merges=25)
        assert len(expect) >= 10  # non-vacuous
        for blocks, actors in ((1, 1), (7, 4)):
            ds = ray.data.from_arrow(_docs(texts)).repartition(blocks)
            got = _rows(bpe.bpe_train(ds, num_merges=25, max_actors=actors))
            assert got == expect

    def test_overlapping_matches_leftmost_greedy(self):
        # "aaa" under merge (a,a) -> [aa, a]; "aaaa" -> [aa, aa]
        texts = ["aaa aaaa aa"] * 3
        expect = bpe.bpe_train_reference(_word_counts(texts), num_merges=3)
        got = _rows(bpe.bpe_train(ray.data.from_arrow(_docs(texts)), num_merges=3))
        assert got == expect
        assert got[0][1:4] == ("a", "a", "aa")
        # "aaa" contributes 2 (leftmost-greedy), "aaaa" 3, "aa" 1 -> x3
        assert got[0][4] == 3 * (2 + 3 + 1)

    def test_tie_break_smallest_pair(self):
        # "xy" and "ab" each occur 5 times; (a,b) must win: smaller packed id
        texts = ["xy ab"] * 5
        got = _rows(bpe.bpe_train(ray.data.from_arrow(_docs(texts)), num_merges=1))
        assert got[0][1:4] == ("a", "b", "ab")

    def test_min_pair_count_stops(self):
        texts = ["qq qq", "zz"]
        got = _rows(
            bpe.bpe_train(ray.data.from_arrow(_docs(texts)), num_merges=10, min_pair_count=2)
        )
        # (q,q) occurs twice -> merged; then nothing reaches count 2
        assert [r[3] for r in got] == ["qq"]

    def test_empty_and_whitespace_corpus(self):
        got = _rows(bpe.bpe_train(ray.data.from_arrow(_docs(["", "  "])), num_merges=5))
        assert got == []

    def test_non_ascii_refused(self):
        with pytest.raises((ValueError, ray.exceptions.RayError)):
            bpe.bpe_train(ray.data.from_arrow(_docs(["héllo héllo"])), num_merges=2)

    def test_sf_corpus_deterministic(self):
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        )
        a = _rows(bpe.bpe_train(ds, num_merges=12, max_actors=2))
        b = _rows(bpe.bpe_train(ds.repartition(5), num_merges=12, max_actors=5))
        assert len(a) == 12
        assert a == b
        # merged tokens are real subword units of the corpus vocabulary
        assert all(len(r[3]) >= 2 for r in a)
