"""Parity against the compiled reference engine's committed outputs.

Fixtures in tests/golden/ were produced by building `/root/reference` and
running its own generator / decoder / count tools (see tests/golden/README.md
for the exact commands). These tests re-run the same workloads through the
Ray engine and require bit-for-bit equal per-halo shell counts and decoded
positions — closing the loop that unit tests against our own writers cannot
(reference src/astr_rcount/main.c, src/Gadget/BufVector3D.c:111-201).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import pytest

from spatialjoincountovershells_ray.config import RadiusLadder
from spatialjoincountovershells_ray.sources.gadget import read_compressed_particles
from spatialjoincountovershells_ray.sources.halo_text import read_halo_file
from spatialjoincountovershells_ray.sources.particles_bin import read_decoded_particles
from spatialjoincountovershells_ray.pipelines import shell_count as sc

GOLDEN = Path(__file__).parent / "golden"
LADDER = RadiusLadder.log2_spaced(5.0, 160.0, 8, dtype=np.float32)

_SHELL_RE = re.compile(r"^\s*\[([0-9.]+) ~ ([0-9.]+)\]: (\d+)\s*$")


def parse_ref_counts(path: Path) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse the reference's output text -> (halo_ids, counts[nh, nrads], radii).

    The trailing `Total` block is skipped (it aliases halo 0's accumulator
    row in the reference — SURVEY.md §1.3)."""
    ids: list[int] = []
    rows: list[list[int]] = []
    bounds: list[float] = []
    cur: list[int] | None = None
    for line in path.read_text().splitlines():
        if line.startswith("id "):
            ids.append(int(line[3:]))
            cur = []
            rows.append(cur)
        elif line.startswith("Total"):
            cur = None
        elif (m := _SHELL_RE.match(line)) and cur is not None:
            if len(rows) == 1:
                bounds.append(float(m.group(2)))
            cur.append(int(m.group(3)))
    return (
        np.array(ids, dtype=np.int64),
        np.array(rows, dtype=np.int64),
        np.array(bounds, dtype=np.float64),
    )


def _engine_counts(particles) -> tuple[np.ndarray, np.ndarray]:
    halos = read_halo_file(str(GOLDEN / "halos.list"), dtype=np.float32)
    out = sc.shell_count(halos, particles, LADDER).to_pandas()
    scols = [f"s{i}" for i in range(LADDER.nrads)]
    return out["halo_id"].to_numpy(), out[scols].to_numpy()


@pytest.fixture(scope="module")
def ref_decoded():
    return parse_ref_counts(GOLDEN / "ref_counts.txt")


def test_golden_ladder_matches_reference(ref_decoded):
    _, _, bounds = ref_decoded
    np.testing.assert_allclose(LADDER.radii.astype(np.float64), bounds, rtol=5e-7)


def test_decoded_particle_shell_count_matches_reference_binary(ray_session, ref_decoded):
    ref_ids, ref_counts, _ = ref_decoded
    ids, counts = _engine_counts(read_decoded_particles(str(GOLDEN / "parts.dat")))
    assert ids.tolist() == ref_ids.tolist()
    mismatch = np.argwhere(counts != ref_counts)
    assert mismatch.size == 0, f"first mismatches: {mismatch[:5]}"


def test_gadget_decode_matches_reference_decoder(ray_session):
    ref_pos = np.frombuffer(
        (GOLDEN / "decoded_snap_inbox.bin").read_bytes(), dtype=np.float32
    ).reshape(-1, 3)
    tbl = read_compressed_particles(str(GOLDEN / "snap_inbox.gad")).to_pandas()
    got = tbl[["x", "y", "z"]].to_numpy().astype(np.float32)
    assert got.shape == ref_pos.shape
    # byte-exact: the reference decoder and ours must produce identical floats
    assert np.array_equal(got, ref_pos)


def test_gadget_shell_count_matches_reference_binary(ray_session):
    ref_ids, ref_counts, _ = parse_ref_counts(GOLDEN / "ref_counts_gad_inbox.txt")
    ids, counts = _engine_counts(read_compressed_particles(str(GOLDEN / "snap_inbox.gad")))
    assert ids.tolist() == ref_ids.tolist()
    mismatch = np.argwhere(counts != ref_counts)
    assert mismatch.size == 0, f"first mismatches: {mismatch[:5]}"
