"""Reference-generator parity + end-to-end over generated files."""

import numpy as np

from spatialjoincountovershells_ray.config import RadiusLadder
from spatialjoincountovershells_ray.functions.mt19937 import MT19937
from spatialjoincountovershells_ray.oracle import shell_count_oracle
from spatialjoincountovershells_ray.pipelines.shell_count import (
    dataset_to_table,
    shell_count,
)
from spatialjoincountovershells_ray.sources import generators, halo_text, particles_bin


def test_particle_files_match_raw_stream(tmp_path):
    p1 = str(tmp_path / "part0.dat")
    p2 = str(tmp_path / "part1.dat")
    generators.generate_particle_files([p1, p2], 100, seed=113)
    # one continuing stream across the file list (reference behaviour)
    rng = MT19937(113)
    want = (rng.genrand_real1(600) * 1000.0).astype(np.float32)
    got = np.concatenate(
        [np.fromfile(p1, dtype=np.float32), np.fromfile(p2, dtype=np.float32)]
    )
    np.testing.assert_array_equal(got, want)


def test_halo_file_layout_and_draw_order(tmp_path):
    p = str(tmp_path / "halo.list")
    generators.generate_halo_files([p], 5, seed=1659533)
    lines = open(p).read().splitlines()
    assert len(lines) == 16 + 5
    assert lines[0] == "# dummy header 0"
    cols = lines[16].split(" ")
    assert len(cols) == 40
    assert cols[0] == "0" and cols[1] == "0"
    # draw order: mass then x,y,z per halo
    rng = MT19937(1659533)
    d = rng.genrand_real1(4)
    assert cols[2] == "%g" % float(np.float32(d[0] * 1e12))
    assert cols[8] == "%f" % float(np.float32(d[1] * 1000))


def test_end_to_end_over_generated_reference_files(tmp_path):
    """The reference's own workflow: generate -> read -> join -> counts,
    verified against the float32 brute-force oracle."""
    hp = str(tmp_path / "halo.list")
    pp = [str(tmp_path / f"part{i}.dat") for i in range(2)]
    generators.generate_halo_files([hp], 80)
    generators.generate_particle_files(pp, 1500)

    halos = halo_text.read_halo_file(hp, dtype=np.float32)
    parts = particles_bin.read_decoded_particles(pp)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float32)
    ht = dataset_to_table(halos).to_pandas().sort_values("halo_id")
    res = (
        dataset_to_table(
            shell_count(
                dataset_to_table(halos).select(["halo_id", "x", "y", "z"]),
                parts,
                lad,
            )
        )
        .to_pandas()
        .sort_values("halo_id")
    )
    pt = dataset_to_table(parts).to_pandas()
    oracle = shell_count_oracle(
        ht[["x", "y", "z"]].to_numpy(), pt[["x", "y", "z"]].to_numpy(), lad.r2
    )
    np.testing.assert_array_equal(
        res[[f"s{i}" for i in range(8)]].to_numpy(), oracle.astype(np.int64)
    )
