"""Tests for the reference-format sources: binary particles, Gadget
compressed decode, halo.list text, result renderer."""

import numpy as np
import pytest

from spatialjoincountovershells_ray.config import RadiusLadder
from spatialjoincountovershells_ray.functions.mt19937 import MT19937, uniform_coords
from spatialjoincountovershells_ray.pipelines.shell_count import dataset_to_table
from spatialjoincountovershells_ray.sources import gadget, halo_text, particles_bin
from spatialjoincountovershells_ray.sources.writers import render_reference_text


class TestParticlesBin:
    def test_roundtrip(self, tmp_path):
        xyz = uniform_coords(MT19937(113), 1000)
        p = particles_bin.write_particle_file(str(tmp_path / "part0.dat"), xyz)
        ds = particles_bin.read_decoded_particles(p)
        tbl = dataset_to_table(ds).to_pandas().sort_values("particle_id")
        np.testing.assert_array_equal(tbl[["x", "y", "z"]].to_numpy(), xyz)

    def test_multifile_concat(self, tmp_path):
        rng = MT19937(113)
        a = uniform_coords(rng, 100)
        b = uniform_coords(rng, 150)
        pa_ = particles_bin.write_particle_file(str(tmp_path / "a.dat"), a)
        pb_ = particles_bin.write_particle_file(str(tmp_path / "b.dat"), b)
        ds = particles_bin.read_decoded_particles([pa_, pb_])
        tbl = dataset_to_table(ds).to_pandas().sort_values("particle_id")
        # per-file id bases: globally unique ids in append (path) order
        assert tbl.particle_id.tolist() == list(range(250))
        np.testing.assert_array_equal(
            tbl[["x", "y", "z"]].to_numpy(), np.concatenate([a, b])
        )

    def test_bad_size_rejected(self, tmp_path):
        p = tmp_path / "bad.dat"
        p.write_bytes(b"\0" * 13)
        with pytest.raises(Exception):
            particles_bin.read_decoded_particles(str(p)).materialize()


def _c_id2pos(ident, ng1d, ntile):
    """Direct scalar transcription of the reference id2posGadId
    (GadId.c:38-74 with Nt1D=ntile, Ng1D=ng1d) for cross-checking the
    vectorized implementation."""
    ng2d, ng3d = ng1d * ng1d, ng1d * ng1d * ng1d
    idt = (ident - 1) // ng3d
    idg = ident - 1 - idt * ng3d
    gx = idg // ng2d
    gy = (idg - gx * ng2d) // ng1d
    gz = idg - gx * ng2d - gy * ng1d
    tx = idt // (ntile * ntile)
    ty = (idt - tx * ntile * ntile) // ntile
    tz = idt - tx * ntile * ntile - ty * ntile
    return tx * ng1d + gx, ty * ng1d + gy, tz * ng1d + gz


class TestGadget:
    def _header(self, n):
        # 16^3 grid, ids 1-based from 1 (reference ntile=1 configuration)
        return gadget.GadgetHeader.create(
            npart1=n,
            npart_total=4096,
            box_size=1000.0,
            disp_min=-0.5,
            disp_max=0.5,
            pos_bits=16,
            id_start=1,
        )

    def test_header_roundtrip(self):
        h = self._header(100)
        h.omega0, h.omega_lambda, h.hubble_param = 0.3, 0.7, 0.67
        h.hashsize, h.flag_metals = 64, 1
        h2 = gadget.unpack_header(gadget.pack_header(h))
        assert h2.npart[1] == 100
        assert h2.box_size == 1000.0
        assert h2.pos_bits == 16
        assert h2.disp_min == np.float32(-0.5) and h2.disp_max == np.float32(0.5)
        assert (h2.omega0, h2.omega_lambda, h2.hubble_param) == (0.3, 0.7, 0.67)
        assert (h2.hashsize, h2.flag_metals) == (64, 1)
        assert h2.id_start == 1 and h2.id_end == 100

    def test_header_byte_layout(self):
        """Field offsets must match the gcc x86-64 layout of the reference
        struct GadgetHeader (include/Gadget/GadgetHeader.h:4-27)."""
        h = self._header(7)
        h.npart_total6 = (0, 0x49ABCDEF, 0x1234, 0, 0, 0)
        raw = gadget.pack_header(h)
        assert len(raw) == 256
        import struct as _s

        assert _s.unpack_from("<6i", raw, 0)[1] == 7  # npart
        assert _s.unpack_from("<d", raw, 128)[0] == 1000.0  # BoxSize
        assert _s.unpack_from("<i", raw, 96 + 4)[0] == 0x49ABCDEF  # npartTotal[1]
        assert _s.unpack_from("<f", raw, 172)[0] == np.float32(-0.5)  # disp_min
        assert _s.unpack_from("<f", raw, 176)[0] == np.float32(0.5)  # disp_max
        assert _s.unpack_from("<i", raw, 180)[0] == 16  # pos_bits
        assert _s.unpack_from("<q", raw, 184)[0] == 1  # id_start
        # 64-bit total recombines from words [1] and [2] (GadgetHeader.c:12)
        assert gadget.unpack_header(raw).npart_total == 0x49ABCDEF + (0x1234 << 32)

    def test_id2pos_matches_c_and_bijective(self):
        for ng1d, ntile in ((16, 1), (8, 2), (4, 3)):
            side = ng1d * ntile
            ids = np.arange(1, side**3 + 1)
            pos = gadget.id2pos(ids, ng1d, ntile)
            flat = (pos[:, 0] * side + pos[:, 1]) * side + pos[:, 2]
            assert len(np.unique(flat)) == side**3
            for ident in (1, 2, side, side**2 + 3, side**3):
                assert tuple(pos[ident - 1]) == _c_id2pos(ident, ng1d, ntile)
            np.testing.assert_array_equal(gadget.pos2id(pos, ng1d, ntile), ids)

    def test_decode_formula(self):
        h = self._header(4)
        q = np.array([[0, 0, 0], [65535, 65535, 65535], [32768, 0, 100], [1, 2, 3]], dtype=np.uint16)
        ids = np.array([1, 2, 3, 4])
        pos = gadget.decode_quantized(q, ids, h, ntile=1)
        # scalar transcription of decodeCompressedParticle's non-AVX path:
        # float32 cell term, float64 unitsep term, float32 store
        us = (0.5 - (-0.5)) / 2.0**16
        ci = np.float32(1000.0 / 16)
        for r, ident in enumerate(ids):
            gx, gy, gz = _c_id2pos(int(ident), 16, 1)
            for d, g in enumerate((gx, gy, gz)):
                cell = np.float32(ci * np.float32(g) + np.float32(-0.5))
                want = np.float32(float(cell) + us * float(q[r, d]))
                assert pos[r, d] == want

    def test_file_roundtrip(self, tmp_path):
        h = self._header(50)
        rng = np.random.default_rng(1)
        q = rng.integers(0, 2**16, size=(50, 3), dtype=np.uint16)
        p = gadget.write_gadget_file(str(tmp_path / "snap.0"), h, q)
        ds = gadget.read_compressed_particles(p)
        tbl = dataset_to_table(ds).to_pandas().sort_values("particle_id")
        assert len(tbl) == 50
        assert tbl.particle_id.iloc[0] == 1  # 1-based decode ids
        want = gadget.decode_quantized(q, np.arange(1, 51), h)
        np.testing.assert_array_equal(tbl[["x", "y", "z"]].to_numpy(), want)


class TestHaloText:
    def test_roundtrip_and_filter(self, tmp_path):
        ids = np.array([3, 7, 11, 20], dtype=np.int64)
        mass = np.array([1e12, 2e12, 3e12, 4e12])
        xyz = uniform_coords(MT19937(1659533), 4)
        p = halo_text.write_halo_file(str(tmp_path / "halo.list"), ids, mass, xyz)
        ds = halo_text.read_halo_file(p, dtype=np.float32)
        tbl = dataset_to_table(ds).to_pandas().sort_values("halo_id")
        assert tbl.halo_id.tolist() == [3, 7, 11, 20]
        # %f-rounded coordinates parse back to the printed value
        want = np.array([[np.float32(float("%f" % v)) for v in row] for row in xyz])
        np.testing.assert_array_equal(tbl[["x", "y", "z"]].to_numpy(), want)

        # filter file semi-join
        fp = tmp_path / "filter.txt"
        fp.write_text("7\n20\n")
        fids = halo_text.read_filter_ids(str(fp))
        ds2 = halo_text.filter_halos_by_ids(halo_text.read_halo_file(p), fids)
        assert sorted(dataset_to_table(ds2).to_pandas().halo_id) == [7, 20]


class TestRenderer:
    def test_reference_text_layout_and_quirk(self):
        lad = RadiusLadder.parse("0.5:2:3")
        ids = np.array([0, 1])
        counts = np.array([[1, 0, 7], [2, 1, 0]], dtype=np.uint64)
        txt = render_reference_text(ids, counts, lad)
        lines = txt.splitlines()
        assert lines[0] == "id 0"
        assert lines[1] == "  [0.000000 ~ 0.500000]: 1"
        assert lines[4] == "id 1"
        assert "Total" in lines
        ti = lines.index("Total")
        assert lines[ti + 1].endswith(": 3")  # true total: 1+2

        quirk = render_reference_text(ids, counts, lad, quirk_compatible=True)
        qlines = quirk.splitlines()
        qi = qlines.index("Total")
        # reference aliasing doubles halo 0's row into the total (main.c:400-437)
        assert qlines[qi + 1].endswith(": 4")


class TestReadDocuments:
    def test_parquet_fallback_roundtrip(self, tmp_path):
        import numpy as np

        from spatialjoincountovershells_ray.sources.documents import (
            halo_documents,
            read_documents,
            write_documents,
        )

        tbl = halo_documents(
            np.arange(5, dtype=np.int64),
            np.arange(15, dtype=np.float64).reshape(5, 3),
        )
        p = str(tmp_path / "docs.parquet")
        write_documents(tbl, p)
        ds = read_documents(p)
        got = ds.take_all()
        assert len(got) == 5
        assert got[0]["spans"][1]["kind"] == "halo_record"

    def test_lance_requires_package(self):
        import pytest

        from spatialjoincountovershells_ray.sources.documents import read_documents

        try:
            import lance  # noqa: F401

            pytest.skip("lance installed; dispatch goes to read_lance")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError):
            read_documents("/tmp/nonexistent.lance")

    def test_jsonl_roundtrip_and_extract(self, tmp_path):
        import numpy as np

        from spatialjoincountovershells_ray.sources.documents import (
            halo_documents,
            read_documents,
            write_documents_jsonl,
        )
        from spatialjoincountovershells_ray.stages import extract

        xyz = np.arange(18, dtype=np.float64).reshape(6, 3)
        tbl = halo_documents(np.arange(6, dtype=np.int64), xyz)
        p = str(tmp_path / "docs.jsonl")
        write_documents_jsonl(tbl, p)
        ds = read_documents(p)
        # full parse path works on the JSONL-ingested table
        out = ds.map_batches(
            lambda b: extract.extract_halos(b), batch_format="pyarrow"
        ).to_pandas()
        assert len(out) == 6
        np.testing.assert_allclose(
            out.sort_values("halo_id")[["x", "y", "z"]].to_numpy(), xyz
        )


class TestPartitionedSink:
    def test_write_resume_and_roundtrip(self, tmp_path):
        import numpy as np
        import pandas as pd
        import ray

        from spatialjoincountovershells_ray.sources import sinks

        df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64), "v": np.arange(1000) * 2})
        ds = ray.data.from_pandas([d for d in np.array_split(df, 5)])
        out = str(tmp_path / "parts")
        m1 = sinks.write_partitioned(ds, out, "k", nbuckets=8)
        assert not m1["skipped"] and m1["rows"] == 1000 and len(m1["buckets"]) == 8
        # round-trip preserves every row
        back = ray.data.read_parquet(out).to_pandas()
        assert sorted(back["k"].tolist()) == df["k"].tolist()
        # bucket assignment matches the shared hash family
        got = back.groupby("bucket").size()
        want = pd.Series(sinks.bucket_of(df["k"].to_numpy(), 8)).value_counts()
        assert {int(k): int(v) for k, v in got.items()} == {
            int(k): int(v) for k, v in want.items()
        }
        # second call skips via the manifest
        m2 = sinks.write_partitioned(ds, out, "k", nbuckets=8)
        assert m2["skipped"] and m2["rows"] == 1000
        # changed spec -> rewrite, not a wrong skip
        m3 = sinks.write_partitioned(ds, out, "k", nbuckets=4)
        assert not m3["skipped"] and len(m3["buckets"]) == 4

    def test_sharded_copy_manifest_contract(self, tmp_path):
        # round-5 (verdict item 3): the single-file-fusion pre-split copy
        # rides the same verify-and-skip manifest as write_partitioned
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from spatialjoincountovershells_ray.sources import sinks

        src = str(tmp_path / "mono.parquet")
        t = pa.table(
            {"a": np.arange(1000, dtype=np.int64), "b": np.arange(1000) * 3}
        )
        pq.write_table(t, src)  # one row group — the fusion-stall shape

        calls = {"n": 0}

        def build():
            calls["n"] += 1
            return t

        out = str(tmp_path / "copy")
        m1 = sinks.write_sharded_copy(build, out, "spec-a", nshards=4)
        assert not m1["skipped"] and m1["rows"] == 1000 and calls["n"] == 1
        assert len(m1["buckets"]) == 4 and sum(m1["buckets"].values()) == 1000
        # skip does NOT call the (expensive) build thunk
        m2 = sinks.write_sharded_copy(build, out, "spec-a", nshards=4)
        assert m2["skipped"] and calls["n"] == 1
        # changed spec rebuilds
        m3 = sinks.write_sharded_copy(build, out, "spec-b", nshards=4)
        assert not m3["skipped"] and calls["n"] == 2
        # a deleted manifest (half-finished node) rebuilds instead of skipping
        import os

        os.remove(sinks.manifest_path(out))
        m4 = sinks.write_sharded_copy(build, out, "spec-b", nshards=4)
        assert not m4["skipped"] and calls["n"] == 3
        # row order of the concatenated shards == source order
        back = pq.ParquetDataset(out).read()
        assert back.column("a").to_pylist() == t.column("a").to_pylist()
        # column projection path: the dir reads as nshards blocks
        d = sinks.sharded_columns(src, ["a"], 4, cache_root=str(tmp_path / "cache"))
        ds = ray.data.read_parquet(d, override_num_blocks=4)
        assert ds.count() == 1000 and ds.schema().names == ["a"]
        d2 = sinks.sharded_columns(src, ["a"], 4, cache_root=str(tmp_path / "cache"))
        assert d2 == d
