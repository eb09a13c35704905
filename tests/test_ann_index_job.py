"""ANN index-build job: build -> query recall vs exact brute force,
resume skip, artifact stability."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from jobs.ann_index_job import build_index, load_artifacts, query_index


def _write_shards(tmp_path, n=600, d=16, seed=5, nshards=2):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d)).astype(np.float32)
    paths = []
    for i, ix in enumerate(np.array_split(np.arange(n), nshards)):
        t = pa.table(
            {
                "vec_id": ix.astype(np.int64),
                "embedding": pa.array(list(m[ix]), pa.list_(pa.float32())),
            }
        )
        p = os.path.join(tmp_path, f"emb{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths, m


class TestAnnIndexJob:
    def test_build_query_recall_and_resume(self, tmp_path):
        tmp = str(tmp_path)
        paths, m = _write_shards(tmp)
        out = os.path.join(tmp, "idx")
        res1 = build_index(paths, out, nlist=16, m=4, ksub=16, train_rows=256)
        assert [r.skipped for r in res1] == [False, False, False]
        cents, books = load_artifacts(out)
        assert cents.shape == (16, 16) and books.shape == (4, 16, 4)

        qids = np.arange(5, dtype=np.int64)
        got = (
            query_index(out, qids, m[:5].astype(np.float64), 10, nprobe=8)
            .to_pandas()
        )
        mm = m.astype(np.float64)
        mm /= np.linalg.norm(mm, axis=1, keepdims=True)
        recalls = []
        for q in range(5):
            sims = mm @ mm[q]
            sims[q] = -np.inf
            want = set(np.argsort(-sims, kind="stable")[:10].tolist())
            a = set(got[got.qid == q].vec_id)
            assert len(a) == 10
            recalls.append(len(want & a) / 10)
        assert np.mean(recalls) >= 0.4  # approximate by design (PQ + IVF)

        # resume: everything skips, artifacts identical (same quantizers)
        res2 = build_index(paths, out, nlist=16, m=4, ksub=16, train_rows=256)
        assert all(r.skipped for r in res2)
        cents2, books2 = load_artifacts(out)
        assert np.array_equal(cents, cents2) and np.array_equal(books, books2)

    def test_query_reads_only_probed_lists(self, tmp_path):
        tmp = str(tmp_path)
        paths, m = _write_shards(tmp, n=300, seed=9)
        out = os.path.join(tmp, "idx2")
        build_index(paths, out, nlist=8, m=4, ksub=16, train_rows=128)
        qids = np.array([0], np.int64)
        got = query_index(out, qids, m[:1].astype(np.float64), 5, nprobe=1).to_pandas()
        # with nprobe=1 every hit must share the query's own list
        cents, books = load_artifacts(out)
        mm = m.astype(np.float64)
        mm /= np.linalg.norm(mm, axis=1, keepdims=True)
        qlist = int(np.argmax(mm[0] @ cents.T))
        idx_files = []
        d = os.path.join(out, "index")
        for s in sorted(os.listdir(d)):
            if s.startswith("shard=") and s != "shard=train":
                sd = os.path.join(d, s)
                idx_files += [os.path.join(sd, f) for f in os.listdir(sd) if f.endswith(".parquet")]
        idx = pq.read_table(idx_files).to_pandas().set_index("vec_id")
        assert set(idx.loc[got.vec_id, "list_id"]) == {qlist}
