"""Checkpoint/resume and multimodal-stub tests."""

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.state.checkpoint import CheckpointedRun


def _mk(n, base):
    def make():
        return ray.data.from_arrow(
            pa.table({"k": np.arange(base, base + n, dtype=np.int64)})
        )

    return make


class TestCheckpoint:
    def test_run_skip_resume(self, tmp_path):
        out = str(tmp_path / "run1")
        run = CheckpointedRun(out)
        r1 = run.run_shard("s0", _mk(10, 0))
        r2 = run.run_shard("s1", _mk(5, 100))
        assert not r1.skipped and r1.rows == 10
        assert not r2.skipped and r2.rows == 5

        # a fresh run over the same dir skips completed shards
        run2 = CheckpointedRun(out)
        assert run2.completed_shards() == {"s0", "s1"}
        r1b = run2.run_shard("s0", _mk(10, 0))
        assert r1b.skipped
        r3 = run2.run_shard("s2", _mk(3, 200))
        assert not r3.skipped

        total = run2.read_all().count()
        assert total == 18

    def test_crash_between_write_and_manifest(self, tmp_path):
        out = str(tmp_path / "run2")
        run = CheckpointedRun(out)
        run.run_shard("s0", _mk(4, 0))
        # simulate crash: shard dir exists but manifest lost
        import os

        os.remove(run.manifest_path)
        run3 = CheckpointedRun(out)
        assert run3.completed_shards() == set()
        r = run3.run_shard("s0", _mk(4, 0))
        assert not r.skipped and r.rows == 4


class TestMultimodal:
    def test_media_features_stub(self):
        from spatialjoincountovershells_ray.pipelines.multimodal import (
            media_features,
        )
        from spatialjoincountovershells_ray.pipelines.shell_count import (
            dataset_to_table,
        )
        from spatialjoincountovershells_ray.sources.documents import halo_documents

        docs = halo_documents(np.arange(20), np.random.rand(20, 3) * 1000)
        res = dataset_to_table(media_features(ray.data.from_arrow(docs))).to_pandas()
        assert len(res) == 20  # one media span per doc
        assert all(len(f) == 16 for f in res.feature)
        # deterministic: same refs -> same features
        res2 = dataset_to_table(media_features(ray.data.from_arrow(docs))).to_pandas()
        a = np.stack(res.sort_values("doc_id").feature.to_numpy())
        b = np.stack(res2.sort_values("doc_id").feature.to_numpy())
        np.testing.assert_array_equal(a, b)

    def test_real_decode_is_stubbed(self):
        import pytest

        from spatialjoincountovershells_ray.pipelines.multimodal import (
            MediaDecodeStub,
            MediaFeatureExtractor,
        )

        with pytest.raises(NotImplementedError):
            MediaFeatureExtractor(fake=False)
        with pytest.raises(NotImplementedError):
            MediaDecodeStub(fake=False)

    def test_decode_resize_pipeline(self):
        from spatialjoincountovershells_ray.pipelines.multimodal import decode_resize
        from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table
        from spatialjoincountovershells_ray.sources.documents import halo_documents

        docs = halo_documents(np.arange(12), np.random.rand(12, 3) * 1000)
        res = dataset_to_table(decode_resize(ray.data.from_arrow(docs), 4, 4)).to_pandas()
        assert len(res) == 12
        assert (res.height == 4).all() and (res.width == 4).all()
        assert all(len(p) == 4 * 4 * 3 for p in res.pixels)
        # deterministic
        res2 = dataset_to_table(decode_resize(ray.data.from_arrow(docs), 4, 4)).to_pandas()
        a = np.stack(res.sort_values("media_ref").pixels.to_numpy())
        b = np.stack(res2.sort_values("media_ref").pixels.to_numpy())
        np.testing.assert_array_equal(a, b)

    def test_resize_nearest_neighbour_exact(self):
        import pyarrow as pa

        from spatialjoincountovershells_ray.pipelines.multimodal import ResizeMedia

        # 4x4x3 image with pixel value = 10*row + col in every channel
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        for r in range(4):
            for c in range(4):
                img[r, c] = 10 * r + c
        batch = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "media_ref": pa.array(["m"], pa.string()),
                "height": pa.array([4], pa.int32()),
                "width": pa.array([4], pa.int32()),
                "channels": pa.array([3], pa.int32()),
                "pixels": pa.array([img.tobytes()], pa.binary()),
            }
        )
        out = ResizeMedia(2, 2)(batch)
        got = np.asarray(out.column("pixels").to_pylist()[0], dtype=np.uint8).reshape(2, 2, 3)
        # centers at src rows/cols floor((i+.5)*2) = 1, 3
        want = img[[1, 3]][:, [1, 3]]
        np.testing.assert_array_equal(got, want)

    def test_sample_frames(self):
        from spatialjoincountovershells_ray.pipelines.multimodal import sample_frames
        from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table
        from spatialjoincountovershells_ray.sources.documents import halo_documents

        docs = halo_documents(np.arange(10), np.random.rand(10, 3) * 1000)
        res = dataset_to_table(sample_frames(ray.data.from_arrow(docs), stride=10)).to_pandas()
        assert res.frame_idx.min() == 0
        assert (res.frame_idx % 10 == 0).all()
        # every span contributes frame 0, and indices are unique per span
        per = res.groupby("media_ref").frame_idx
        assert (per.min() == 0).all()
        assert per.apply(lambda s: s.is_unique).all()
        # per-span count = ceil(nframes/stride) <= 12 (nframes <= 120)
        assert per.count().max() <= 12


class TestSpanAudit:
    def _doc(self, did, spans):
        from spatialjoincountovershells_ray.sources.documents import SPAN_TYPE

        return {"doc_id": did, "spans": spans}

    def test_grammar_violations_flagged(self):
        import pyarrow as pa

        from spatialjoincountovershells_ray.pipelines.multimodal import span_audit
        from spatialjoincountovershells_ray.sources.documents import DOC_SCHEMA

        def sp(kind, text="", mref="", off=0):
            return {"kind": kind, "text": text, "media_ref": mref, "offset": off}

        good = [
            sp("text", "a", "", 0),
            sp("halo_record", "1 2 3", "", 1),
            sp("media", "", "s3://x/0.png", 2),
            sp("text", "b", "", 3),
        ]
        bad_order = [good[1], good[0], good[2], good[3]]  # kinds swapped
        bad_offset = [good[0], {**good[1], "offset": 9}, good[2], good[3]]
        bad_media = [good[0], good[1], sp("media", "", "", 2), good[3]]
        bad_ref_on_text = [{**good[0], "media_ref": "s3://y"}, good[1], good[2], good[3]]
        short = good[:3]
        rows = {
            "ok": good,
            "bad_order": bad_order,
            "bad_offset": bad_offset,
            "bad_media": bad_media,
            "bad_ref_on_text": bad_ref_on_text,
            "short": short,
            "empty": [],
        }
        tbl = pa.Table.from_pydict(
            {
                "doc_id": list(rows.keys()),
                "spans": pa.array(list(rows.values()), DOC_SCHEMA.field("spans").type),
            }
        )
        out = (
            span_audit(ray.data.from_arrow(tbl))
            .to_pandas()
            .set_index("doc_id")["seq_ok"]
            .to_dict()
        )
        assert out == {
            "ok": 1,
            "bad_order": 0,
            "bad_offset": 0,
            "bad_media": 0,
            "bad_ref_on_text": 0,
            "short": 0,
            "empty": 0,
        }
        ns = (
            span_audit(ray.data.from_arrow(tbl))
            .to_pandas()
            .set_index("doc_id")["n_spans"]
            .to_dict()
        )
        assert ns["empty"] == 0 and ns["short"] == 3 and ns["ok"] == 4
