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
        assert ds.count() == 250

    def test_bad_size_rejected(self, tmp_path):
        p = tmp_path / "bad.dat"
        p.write_bytes(b"\0" * 13)
        with pytest.raises(Exception):
            particles_bin.read_decoded_particles(str(p)).materialize()


class TestGadget:
    def _header(self, n):
        return gadget.GadgetHeader(
            npart=(0, n, 0, 0, 0, 0),
            box_size=1000.0,
            disp_min=np.array([-0.5, -0.5, -0.5], dtype=np.float32),
            disp_max=np.array([0.5, 0.5, 0.5], dtype=np.float32),
            pos_bits=16,
            id_start=0,
            id_end=n - 1,
            npart_total=4096,  # 16^3 grid
        )

    def test_header_roundtrip(self):
        h = self._header(100)
        h2 = gadget.unpack_header(gadget.pack_header(h))
        assert h2.npart[1] == 100
        assert h2.box_size == 1000.0
        assert h2.pos_bits == 16
        np.testing.assert_array_equal(h2.disp_min, h.disp_min)

    def test_id2pos_bijective(self):
        ids = np.arange(16**3)
        pos = gadget.id2pos(ids, 16, 8)
        # all grid cells hit exactly once
        flat = (pos[:, 0] * 16 + pos[:, 1]) * 16 + pos[:, 2]
        assert len(np.unique(flat)) == 16**3

    def test_decode_formula(self):
        h = self._header(4)
        q = np.array([[0, 0, 0], [65535, 65535, 65535], [32768, 0, 100], [1, 2, 3]], dtype=np.uint16)
        ids = np.array([0, 1, 2, 3])
        pos = gadget.decode_quantized(q, ids, h, idsep=8)
        grid = gadget.id2pos(ids, 16, 8).astype(np.float32)
        ci = np.float32(1000.0 / 16)
        us = (np.float32(1.0) / np.float32(2**16))
        expect = ci * grid + np.float32(-0.5) + us * q.astype(np.float32)
        np.testing.assert_array_equal(pos, expect)

    def test_file_roundtrip(self, tmp_path):
        h = self._header(50)
        rng = np.random.default_rng(1)
        q = rng.integers(0, 2**16, size=(50, 3), dtype=np.uint16)
        p = gadget.write_gadget_file(str(tmp_path / "snap.0"), h, q)
        ds = gadget.read_compressed_particles(p)
        tbl = dataset_to_table(ds).to_pandas().sort_values("particle_id")
        assert len(tbl) == 50
        want = gadget.decode_quantized(q, np.arange(50), h)
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
