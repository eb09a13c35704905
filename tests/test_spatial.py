"""End-to-end spatial pipeline tests: PBC fixture, oracle parity, modes,
span invariant, float32 reference semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from spatialjoincountovershells_ray.config import GridSpec, RadiusLadder
from spatialjoincountovershells_ray.functions.mt19937 import MT19937, uniform_coords
from spatialjoincountovershells_ray.oracle import (
    knn_oracle,
    range_join_oracle,
    shell_count_oracle,
)
from spatialjoincountovershells_ray.pipelines import knn as knn_mod
from spatialjoincountovershells_ray.pipelines import range_join as rj_mod
from spatialjoincountovershells_ray.pipelines.shell_count import (
    dataset_to_table,
    shell_count,
    shell_count_from_documents,
)
from spatialjoincountovershells_ray.sources.documents import (
    halo_documents,
    particle_documents,
)

# FIXTURES.md §4 — the reference's TestData4PB corner fixture
PB_HALOS = np.array([[0.0, 0.0, 0.0], [999.0, 999.0, 999.0]], dtype=np.float32)
PB_PARTICLES = np.array(
    [
        [0, 0, 0],
        [999, 0, 0],
        [999, 999, 0],
        [999, 999, 999],
        [999, 0, 999],
        [0, 999, 0],
        [0, 999, 999],
        [0, 0, 999],
    ],
    dtype=np.float32,
)


def _tables(hxyz, pxyz, dtype):
    halos = pa.table(
        {
            "halo_id": np.arange(len(hxyz), dtype=np.int64),
            "x": hxyz[:, 0].astype(dtype),
            "y": hxyz[:, 1].astype(dtype),
            "z": hxyz[:, 2].astype(dtype),
        }
    )
    parts = pa.table(
        {
            "particle_id": np.arange(len(pxyz), dtype=np.int64),
            "x": pxyz[:, 0].astype(dtype),
            "y": pxyz[:, 1].astype(dtype),
            "z": pxyz[:, 2].astype(dtype),
        }
    )
    return halos, ray.data.from_arrow(parts)


@pytest.mark.parametrize("mode", ["broadcast", "shuffle", "rtree"])
def test_periodic_boundary_corner_fixture(mode):
    """Both halos must see [1, 0, 7] with radii (0.5, 1, 2) — all seven
    mirror combinations of the reference's periodic search."""
    lad = RadiusLadder.parse("0.5:2:3", dtype=np.float32)
    halos, parts = _tables(PB_HALOS, PB_PARTICLES, np.float32)
    res = dataset_to_table(shell_count(halos, parts, lad, mode=mode)).to_pandas()
    assert len(res) == 2
    for _, row in res.iterrows():
        assert [row.s0, row.s1, row.s2] == [1, 0, 7]


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("mode", ["broadcast", "shuffle", "rtree"])
def test_shell_count_matches_oracle_uniform(mode, dtype):
    """t1-smoke-style: MT19937 uniform tables vs the brute-force oracle,
    bit for bit, in both precisions and both physical plans."""
    hxyz = uniform_coords(MT19937(1659533), 100)
    pxyz = uniform_coords(MT19937(113), 2000)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=dtype)
    halos, parts = _tables(hxyz, pxyz, dtype)
    res = (
        dataset_to_table(shell_count(halos, parts, lad, mode=mode))
        .to_pandas()
        .sort_values("halo_id")
    )
    oracle = shell_count_oracle(hxyz.astype(dtype), pxyz.astype(dtype), lad.r2)
    got = res[[f"s{i}" for i in range(8)]].to_numpy()
    np.testing.assert_array_equal(got, oracle.astype(np.int64))


def test_shell_count_auto_mode_matches_both_plans():
    """mode='auto' picks a plan by estimated index footprint; either way
    the result equals the explicit plans."""
    hxyz = uniform_coords(MT19937(1659533), 100)
    pxyz = uniform_coords(MT19937(113), 2000)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    want = (
        dataset_to_table(shell_count(halos, parts, lad, mode="broadcast"))
        .to_pandas()
        .sort_values("halo_id")
        .reset_index(drop=True)
    )
    # generous budget -> broadcast; zero budget -> shuffle; same numbers
    for budget in (2 * 1024**3, 0):
        got = (
            dataset_to_table(
                shell_count(halos, parts, lad, mode="auto", auto_broadcast_bytes=budget)
            )
            .to_pandas()
            .sort_values("halo_id")
            .reset_index(drop=True)
        )
        assert got.equals(want)


def test_shell_count_multifile_accumulation():
    """Counts accumulate over unioned particle shards (reference A2
    semantics: one counts matrix shared across files,
    src/astr_rcount/main.c:135-146)."""
    rng = MT19937(113)
    shard1 = uniform_coords(rng, 1000)
    shard2 = uniform_coords(rng, 1000)  # stream continues across files
    hxyz = uniform_coords(MT19937(1659533), 50)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float32)
    halos, p1 = _tables(hxyz, shard1, np.float32)
    _, p2 = _tables(hxyz, shard2, np.float32)
    res = (
        dataset_to_table(shell_count(halos, p1.union(p2), lad))
        .to_pandas()
        .sort_values("halo_id")
    )
    both = np.concatenate([shard1, shard2])
    oracle = shell_count_oracle(hxyz, both, lad.r2)
    np.testing.assert_array_equal(
        res[[f"s{i}" for i in range(8)]].to_numpy(), oracle.astype(np.int64)
    )


def test_range_join_matches_oracle():
    hxyz = uniform_coords(MT19937(1659533), 60)
    pxyz = uniform_coords(MT19937(113), 1500)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    res = dataset_to_table(
        rj_mod.range_join(halos, parts, 60.0, dtype=np.float64)
    ).to_pandas()
    got = set(zip(res.halo_id, res.particle_id))
    want = range_join_oracle(
        np.arange(60),
        hxyz.astype(np.float64),
        np.arange(1500),
        pxyz.astype(np.float64),
        60.0,
    )
    assert got == want


def test_range_join_shuffle_matches_oracle():
    hxyz = uniform_coords(MT19937(1659533), 60)
    pxyz = uniform_coords(MT19937(113), 1500)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    res = dataset_to_table(
        rj_mod.range_join(halos, parts, 60.0, mode="shuffle", dtype=np.float64, sort=False)
    ).to_pandas()
    # exactly-once pair emission (no replica double counting)
    assert not res.duplicated().any()
    got = set(zip(res.halo_id, res.particle_id))
    want = range_join_oracle(
        np.arange(60),
        hxyz.astype(np.float64),
        np.arange(1500),
        pxyz.astype(np.float64),
        60.0,
    )
    assert got == want


def test_knn_matches_oracle():
    hxyz = uniform_coords(MT19937(1659533), 30)
    pxyz = uniform_coords(MT19937(113), 800)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    res = dataset_to_table(
        knn_mod.knn(halos, parts, 5, dtype=np.float64, batch_size=128)
    ).to_pandas()
    want = knn_oracle(
        np.arange(30), hxyz.astype(np.float64), np.arange(800), pxyz.astype(np.float64), 5
    )
    for hid, grp in res.groupby("halo_id"):
        assert grp.sort_values("rnk").particle_id.tolist() == want[int(hid)]


def test_knn_shuffle_matches_oracle():
    hxyz = uniform_coords(MT19937(1659533), 30)
    pxyz = uniform_coords(MT19937(113), 800)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    res = dataset_to_table(
        knn_mod.knn(halos, parts, 5, dtype=np.float64, method="shuffle")
    ).to_pandas()
    want = knn_oracle(
        np.arange(30), hxyz.astype(np.float64), np.arange(800), pxyz.astype(np.float64), 5
    )
    for hid, grp in res.groupby("halo_id"):
        assert grp.sort_values("rnk").particle_id.tolist() == want[int(hid)]


def test_knn_shuffle_sparse_multi_round():
    # k exceeds what the first ring radius can find: forces round
    # expansion up to the full-torus sweep, including halos with fewer
    # global neighbours than particles within no radius at round 1
    hxyz = uniform_coords(MT19937(42), 8)
    pxyz = uniform_coords(MT19937(7), 12)  # sparse: k=5 of only 12 particles
    halos, parts = _tables(hxyz, pxyz, np.float64)
    res = dataset_to_table(
        knn_mod.knn(halos, parts, 5, dtype=np.float64, method="shuffle", r0=1.0)
    ).to_pandas()
    want = knn_oracle(
        np.arange(8), hxyz.astype(np.float64), np.arange(12), pxyz.astype(np.float64), 5
    )
    assert set(res.halo_id) == set(range(8))
    for hid, grp in res.groupby("halo_id"):
        assert grp.sort_values("rnk").particle_id.tolist() == want[int(hid)]


def test_zero_count_halos_present():
    lad = RadiusLadder.parse("1:2:2", dtype=np.float64)
    hxyz = np.array([[500.0, 500.0, 500.0]], dtype=np.float64)
    pxyz = np.array([[0.0, 0.0, 0.0]], dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    res = dataset_to_table(shell_count(halos, parts, lad)).to_pandas()
    assert len(res) == 1
    assert res.iloc[0].s0 == 0 and res.iloc[0].s1 == 0


def test_document_pipeline_and_span_invariant():
    """Docs -> extract -> join equals the direct path, and extracted rows
    carry spans byte-identical to the input (kind, text, media_ref, order)."""
    hxyz = uniform_coords(MT19937(1659533), 40).astype(np.float64)
    pxyz = uniform_coords(MT19937(113), 500).astype(np.float64)
    hdocs = halo_documents(np.arange(40), hxyz, precision="repr")
    pdocs = particle_documents(np.arange(500), pxyz, precision="repr")
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float64)
    res = (
        dataset_to_table(
            shell_count_from_documents(
                ray.data.from_arrow(hdocs), ray.data.from_arrow(pdocs), lad
            )
        )
        .to_pandas()
        .sort_values("halo_id")
    )
    oracle = shell_count_oracle(hxyz, pxyz, lad.r2)
    np.testing.assert_array_equal(
        res[[f"s{i}" for i in range(8)]].to_numpy(), oracle.astype(np.int64)
    )

    # span invariant through the extractor
    from spatialjoincountovershells_ray.stages.extract import extract_halos

    out = extract_halos(hdocs, dtype=np.float64, carry_spans=True)
    assert out.column("spans").combine_chunks().equals(
        hdocs.column("spans").combine_chunks()
    )
    assert out.column("doc_id").equals(hdocs.column("doc_id"))
    # parsed coordinates round-trip exactly
    np.testing.assert_array_equal(out.column("x").to_numpy(), hxyz[:, 0])


def test_f6_precision_matches_reference_parser_rounding():
    """%f-format docs parse back like the reference's atof-then-assign."""
    xyz = np.array([[418.681091, 810.143127, 415.767883]], dtype=np.float32)
    docs = halo_documents(np.array([17]), xyz.astype(np.float64), precision="f6")
    from spatialjoincountovershells_ray.stages.extract import extract_halos

    out = extract_halos(docs, dtype=np.float32)
    assert out.column("halo_id").to_numpy()[0] == 17
    got = out.column("x").to_numpy()[0]
    assert got == np.float32(float("%f" % 418.681091))


def test_skewed_data_same_result():
    """Fixture C: clumped particles — salted/unsalted and both modes agree
    with the oracle (correctness under skew)."""
    rng = np.random.default_rng(7)
    clump = (rng.normal(500, 2, size=(1600, 3)) % 1000).astype(np.float64)
    bg = rng.uniform(0, 1000, size=(400, 3))
    pxyz = np.concatenate([clump, bg])
    hxyz = np.concatenate(
        [(rng.normal(500, 2, size=(20, 3)) % 1000), rng.uniform(0, 1000, size=(30, 3))]
    )
    lad = RadiusLadder.log2_spaced(1, 50, 6, dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    for mode in ("broadcast", "shuffle"):
        res = (
            dataset_to_table(shell_count(halos, parts, lad, mode=mode))
            .to_pandas()
            .sort_values("halo_id")
        )
        oracle = shell_count_oracle(hxyz, pxyz, lad.r2)
        np.testing.assert_array_equal(
            res[[f"s{i}" for i in range(6)]].to_numpy(), oracle.astype(np.int64)
        )


def test_salted_shuffle_matches_unsalted():
    """Fixture C core assertion: hot-cell salting changes the physical
    grouping only — bit-identical histograms, smaller max group."""
    rng = np.random.default_rng(11)
    clump = (rng.normal(500, 2, size=(3000, 3)) % 1000).astype(np.float64)
    bg = rng.uniform(0, 1000, size=(500, 3))
    pxyz = np.concatenate([clump, bg])
    hxyz = np.concatenate(
        [(rng.normal(500, 2, size=(25, 3)) % 1000), rng.uniform(0, 1000, size=(25, 3))]
    )
    lad = RadiusLadder.log2_spaced(1, 50, 6, dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    plain = (
        dataset_to_table(shell_count(halos, parts, lad, mode="shuffle"))
        .to_pandas()
        .sort_values("halo_id")
        .reset_index(drop=True)
    )
    _, parts2 = _tables(hxyz, pxyz, np.float64)
    salted = (
        dataset_to_table(
            shell_count(halos, parts2, lad, mode="shuffle", auto_salt=True, salt_target=500)
        )
        .to_pandas()
        .sort_values("halo_id")
        .reset_index(drop=True)
    )
    assert plain.equals(salted)
    oracle = shell_count_oracle(hxyz, pxyz, lad.r2)
    np.testing.assert_array_equal(
        salted[[f"s{i}" for i in range(6)]].to_numpy(), oracle.astype(np.int64)
    )


def test_salt_plan_splits_hot_cells():
    from spatialjoincountovershells_ray.stages.salt import SaltMap, salt_plan

    plan = salt_plan({1: 1000, 2: 100, 3: 5000}, target_rows_per_group=500)
    assert plan == {1: 2, 3: 10}
    sm = SaltMap(plan)
    pids = np.arange(10_000, dtype=np.int64)
    cells = np.full(10_000, 3, dtype=np.int64)
    keys = sm.particle_keys(cells, pids)
    # particles of cell 3 spread over 10 salted keys, roughly evenly
    uniq, counts = np.unique(keys, return_counts=True)
    assert len(uniq) == 10
    assert counts.max() < 2 * counts.min()
    # halo replicas cover every salt exactly once
    rows, hkeys = sm.halo_replica_keys(np.array([3, 2], dtype=np.int64))
    assert len(hkeys) == 11  # 10 salts for cell 3 + 1 for cell 2
    assert set(hkeys[rows == 0]) == set(uniq)


@pytest.mark.parametrize("ncells", [1, 2, 3, 5, 13])
def test_grid_choice_does_not_change_result(ncells):
    """The physical grid is an implementation detail: any ncells gives the
    same histograms (ball-cover dedup + min-image)."""
    hxyz = uniform_coords(MT19937(1659533), 25).astype(np.float64)
    pxyz = uniform_coords(MT19937(113), 400).astype(np.float64)
    lad = RadiusLadder.log2_spaced(10, 300, 4, dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    res = (
        dataset_to_table(
            shell_count(halos, parts, lad, grid=GridSpec(ncells=ncells))
        )
        .to_pandas()
        .sort_values("halo_id")
    )
    oracle = shell_count_oracle(hxyz, pxyz, lad.r2)
    np.testing.assert_array_equal(
        res[[f"s{i}" for i in range(4)]].to_numpy(), oracle.astype(np.int64)
    )


def test_range_join_auto_picks_plan():
    hxyz = uniform_coords(MT19937(1659533), 60)
    pxyz = uniform_coords(MT19937(113), 1500)
    want = range_join_oracle(
        np.arange(60),
        hxyz.astype(np.float64),
        np.arange(1500),
        pxyz.astype(np.float64),
        60.0,
    )
    halos, parts = _tables(hxyz, pxyz, np.float64)
    # small side fits the default budget -> broadcast plan
    res = dataset_to_table(
        rj_mod.range_join(halos, parts, 60.0, mode="auto", dtype=np.float64, sort=False)
    ).to_pandas()
    assert set(zip(res.halo_id, res.particle_id)) == want
    # a 1-byte budget forces the shuffle plan; same logical result
    halos2, parts2 = _tables(hxyz, pxyz, np.float64)
    res2 = dataset_to_table(
        rj_mod.range_join(
            halos2, parts2, 60.0, mode="auto", dtype=np.float64,
            sort=False, auto_broadcast_bytes=1.0,
        )
    ).to_pandas()
    assert set(zip(res2.halo_id, res2.particle_id)) == want


def test_pair_correlation_matches_shell_count_totals():
    """DD per shell == column sums of the oracle-verified shell_count
    histograms; DR == the same against the derived random catalog; w is
    the single IEEE division dd/dr - 1 (NULL at dr == 0)."""
    from spatialjoincountovershells_ray.functions.hashing import derive_coord
    from spatialjoincountovershells_ray.pipelines.shell_count import pair_correlation

    hxyz = uniform_coords(MT19937(1659533), 80)
    pxyz = uniform_coords(MT19937(113), 1500)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)

    got = dataset_to_table(pair_correlation(halos, parts, lad)).to_pandas()
    got = got.sort_values("shell").reset_index(drop=True)

    def totals(particle_tbl):
        res = dataset_to_table(
            shell_count(halos, ray.data.from_arrow(particle_tbl), lad)
        ).to_pandas()
        return res[[f"s{i}" for i in range(8)]].to_numpy().sum(axis=0)

    pid = np.arange(len(pxyz), dtype=np.int64)
    rand_tbl = pa.table(
        {
            "particle_id": pid,
            "x": derive_coord(pid, 3),
            "y": derive_coord(pid, 4),
            "z": derive_coord(pid, 5),
        }
    )
    dd = totals(dataset_to_table(parts))
    dr = totals(rand_tbl)
    np.testing.assert_array_equal(got["dd"].to_numpy(), dd)
    np.testing.assert_array_equal(got["dr"].to_numpy(), dr)
    w = got["w"].to_numpy()
    for i in range(8):
        if dr[i] == 0:
            assert np.isnan(w[i])
        else:
            assert w[i] == dd[i] / dr[i] - 1.0


def test_halo_autocorr_matches_brute_force():
    """Unordered i<j pair counts per shell vs an O(n^2) numpy oracle
    under the periodic min-image metric."""
    from spatialjoincountovershells_ray.pipelines.shell_count import halo_autocorr

    hxyz = uniform_coords(MT19937(77), 120)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float64)
    halos, _ = _tables(hxyz, hxyz[:1], np.float64)

    got = dataset_to_table(halo_autocorr(halos, lad)).to_pandas()
    got = got.sort_values("shell").reset_index(drop=True)

    d = hxyz[:, None, :] - hxyz[None, :, :]
    d -= 1000.0 * np.floor(d / 1000.0 + 0.5)
    d2 = (d * d).sum(axis=2)
    iu = np.triu_indices(len(hxyz), k=1)
    shell = np.searchsorted(lad.r2, d2[iu], side="right")
    want = np.bincount(shell[shell < 8], minlength=8)
    np.testing.assert_array_equal(got["npairs"].to_numpy(), want)
    assert int(got["npairs"].sum()) > 0


def test_counts_in_cells_matches_brute_force():
    """P(N) including empty cells vs a numpy histogram oracle."""
    from spatialjoincountovershells_ray.pipelines.raster import counts_in_cells

    pxyz = uniform_coords(MT19937(31), 3000)
    parts = pa.table(
        {
            "particle_id": np.arange(3000, dtype=np.int64),
            "x": pxyz[:, 0].astype(np.float64),
            "y": pxyz[:, 1].astype(np.float64),
            "z": pxyz[:, 2].astype(np.float64),
        }
    )
    K, box = 8, 1000.0
    got = dataset_to_table(
        counts_in_cells(ray.data.from_arrow(parts), K, box)
    ).to_pandas().sort_values("n_particles").reset_index(drop=True)

    L = box / K
    cell = (
        np.floor(pxyz[:, 0] / L).astype(np.int64) * K
        + np.floor(pxyz[:, 1] / L).astype(np.int64)
    ) * K + np.floor(pxyz[:, 2] / L).astype(np.int64)
    occ = np.bincount(cell, minlength=K**3)
    n, c = np.unique(occ, return_counts=True)
    want = dict(zip(n.tolist(), c.tolist()))
    got_map = dict(zip(got["n_particles"].tolist(), got["ncells_with"].tolist()))
    # engine emits the N=0 row even when no cell is empty
    if 0 not in want:
        want[0] = 0
    assert got_map == want
    assert int(got["ncells_with"].sum()) == K**3


def test_weighted_pairs_matches_brute_force():
    """Per-shell weight-product sums vs an O(n*m) numpy oracle."""
    from spatialjoincountovershells_ray.pipelines.shell_count import weighted_pair_counts

    hxyz = uniform_coords(MT19937(5), 60)
    pxyz = uniform_coords(MT19937(9), 900)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)

    got = dataset_to_table(weighted_pair_counts(halos, parts, lad)).to_pandas()
    got = got.sort_values("shell").reset_index(drop=True)

    d = hxyz[:, None, :] - pxyz[None, :, :]
    d -= 1000.0 * np.floor(d / 1000.0 + 0.5)
    d2 = (d * d).sum(axis=2)
    shell = np.searchsorted(lad.r2, d2, side="right")
    wh = np.arange(60, dtype=np.int64) % 97 + 1
    wp = np.arange(900, dtype=np.int64) % 89 + 1
    w = wh[:, None] * wp[None, :]
    want_n = np.zeros(8, np.int64)
    want_w = np.zeros(8, np.int64)
    m = shell < 8
    np.add.at(want_n, shell[m], 1)
    np.add.at(want_w, shell[m], w[m])
    np.testing.assert_array_equal(got["npairs"].to_numpy(), want_n)
    np.testing.assert_array_equal(got["wsum"].to_numpy(), want_w)
    assert int(want_w.sum()) > 0


def test_pair_corr_jackknife_matches_brute_force():
    """Leave-one-out counts vs a numpy oracle over the same derived
    random catalog; the full-sample identity sum(dd_patch) = DD holds."""
    from spatialjoincountovershells_ray.functions.hashing import derive_coord
    from spatialjoincountovershells_ray.pipelines.shell_count import pair_corr_jackknife

    hxyz = uniform_coords(MT19937(21), 64)
    pxyz = uniform_coords(MT19937(43), 800)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)

    got = dataset_to_table(pair_corr_jackknife(halos, parts, lad)).to_pandas()
    got = got.sort_values(["patch", "shell"]).reset_index(drop=True)
    assert len(got) == 64

    def hist(pts):
        d = hxyz[:, None, :] - pts[None, :, :]
        d -= 1000.0 * np.floor(d / 1000.0 + 0.5)
        sh = np.searchsorted(lad.r2, (d * d).sum(axis=2), side="right")
        out = np.zeros((8, 8), np.int64)  # (patch, shell)
        patch = np.arange(64, dtype=np.int64) % 8
        m = sh < 8
        hh, ss = np.broadcast_arrays(patch[:, None], sh)
        np.add.at(out, (hh[m], ss[m]), 1)
        return out

    pid = np.arange(800, dtype=np.int64)
    rxyz = np.stack([derive_coord(pid, 3), derive_coord(pid, 4), derive_coord(pid, 5)], axis=1)
    dd, dr = hist(pxyz), hist(rxyz)
    dd_loo = dd.sum(axis=0, keepdims=True) - dd
    dr_loo = dr.sum(axis=0, keepdims=True) - dr
    np.testing.assert_array_equal(got["dd_loo"].to_numpy().reshape(8, 8), dd_loo)
    np.testing.assert_array_equal(got["dr_loo"].to_numpy().reshape(8, 8), dr_loo)


def test_fof_groups_matches_brute_force():
    """FoF labels + multiplicity vs a brute-force union-find oracle on a
    genuinely uniform catalog (rich group structure at b ~ mean sep/2)."""
    from spatialjoincountovershells_ray.pipelines.shell_count import (
        fof_groups,
        fof_multiplicity,
    )

    hxyz = uniform_coords(MT19937(101), 200)
    ids = np.arange(200, dtype=np.int64)
    halos = pa.table(
        {"halo_id": ids, "x": hxyz[:, 0], "y": hxyz[:, 1], "z": hxyz[:, 2]}
    )
    b = 90.0
    got = dataset_to_table(fof_groups(halos, b)).to_pandas()
    got = got.sort_values("halo_id").reset_index(drop=True)

    d = hxyz[:, None, :] - hxyz[None, :, :]
    d -= 1000.0 * np.floor(d / 1000.0 + 0.5)
    adj = (d * d).sum(axis=2) < b * b
    parent = ids.copy()

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(200):
        for j in range(i + 1, 200):
            if adj[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    roots = np.array([find(i) for i in range(200)])
    lbl = np.full(200, np.iinfo(np.int64).max)
    np.minimum.at(lbl, roots, ids)
    want = lbl[roots]
    np.testing.assert_array_equal(got["group_id"].to_numpy(), want)
    assert (want != ids).any()  # non-vacuous: real multi-member groups

    mult = dataset_to_table(fof_multiplicity(halos, b)).to_pandas()
    _, sizes = np.unique(want, return_counts=True)
    ws, wc = np.unique(sizes, return_counts=True)
    assert mult.sort_values("group_size")["n_groups"].tolist() == wc.tolist()


def test_cylindrical_pairs_matches_brute_force():
    """(rp, pi) binned counts vs a numpy oracle with per-axis wraps."""
    from spatialjoincountovershells_ray.pipelines.shell_count import cylindrical_pairs
    from spatialjoincountovershells_ray.stages.join_kernels import CYL_PI_EDGES

    hxyz = uniform_coords(MT19937(3), 50)
    pxyz = uniform_coords(MT19937(7), 1200)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)

    got = dataset_to_table(cylindrical_pairs(halos, parts, lad)).to_pandas()
    got = got.sort_values(["rp_shell", "pi_bin"]).reset_index(drop=True)

    d = hxyz[:, None, :] - pxyz[None, :, :]
    d -= 1000.0 * np.floor(d / 1000.0 + 0.5)
    d2p = d[:, :, 0] ** 2 + d[:, :, 1] ** 2
    dpar = np.abs(d[:, :, 2])
    rp = np.searchsorted(lad.r2, d2p.ravel(), side="right")
    pib = np.searchsorted(CYL_PI_EDGES, dpar.ravel(), side="right")
    want = np.zeros((8, len(CYL_PI_EDGES)), np.int64)
    m = (rp < 8) & (pib < len(CYL_PI_EDGES))
    np.add.at(want, (rp[m], pib[m]), 1)
    np.testing.assert_array_equal(
        got["npairs"].to_numpy().reshape(8, len(CYL_PI_EDGES)), want
    )
    assert int(want.sum()) > 0


def test_shell_profile_matches_brute_force():
    """Counts equal shell_count; m sums equal exact quantized-d2 bins."""
    from spatialjoincountovershells_ray.pipelines.shell_count import shell_d2_profile

    hxyz = uniform_coords(MT19937(57), 40)
    pxyz = uniform_coords(MT19937(91), 900)
    lad = RadiusLadder.log2_spaced(1, 100, 8, dtype=np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)

    got = dataset_to_table(shell_d2_profile(halos, parts, lad)).to_pandas()
    got = got.sort_values("halo_id").reset_index(drop=True)
    assert len(got) == 40  # dense zero rows included

    hxyz = hxyz.astype(np.float64)  # oracle must run in the query precision
    pxyz = pxyz.astype(np.float64)
    d = hxyz[:, None, :] - pxyz[None, :, :]
    d -= 1000.0 * np.floor(d / 1000.0 + 0.5)
    d2 = (d * d).sum(axis=2)
    shell = np.searchsorted(lad.r2, d2, side="right")
    q = np.floor(d2 * 100.0).astype(np.int64)
    for i in range(8):
        m = shell == i
        want_c = m.sum(axis=1)
        want_m = np.where(m, q, 0).sum(axis=1)
        np.testing.assert_array_equal(got[f"c{i}"].to_numpy(), want_c)
        np.testing.assert_array_equal(got[f"m{i}"].to_numpy(), want_m)


def test_catalog_xmatch_matches_brute_force():
    """Mutual-nearest pairs vs an O(n*m) numpy oracle with (d2, id)
    lexicographic tie-break; blocking-independence via repartition."""
    from spatialjoincountovershells_ray.pipelines.range_join import catalog_xmatch

    hxyz = uniform_coords(MT19937(71), 60).astype(np.float64)
    pxyz = uniform_coords(MT19937(29), 700).astype(np.float64)
    halos, parts = _tables(hxyz, pxyz, np.float64)
    rmax = 120.0

    got = dataset_to_table(
        catalog_xmatch(halos, parts.repartition(6), rmax)
    ).to_pandas().sort_values("halo_id").reset_index(drop=True)

    d = hxyz[:, None, :] - pxyz[None, :, :]
    d -= 1000.0 * np.floor(d / 1000.0 + 0.5)
    d2 = (d * d).sum(axis=2)
    close = d2 < rmax * rmax
    want = []
    for a in range(60):
        js = np.flatnonzero(close[a])
        if not len(js):
            continue
        jbest = js[np.lexsort((js, d2[a, js]))[0]]
        # mutual: a must be jbest's nearest halo
        hs = np.flatnonzero(close[:, jbest])
        abest = hs[np.lexsort((hs, d2[hs, jbest]))[0]]
        if abest == a:
            want.append((a, int(jbest), d2[a, jbest]))
    assert len(want) > 0
    assert list(zip(got.halo_id, got.particle_id)) == [(a, b) for a, b, _ in want]
    np.testing.assert_array_equal(got.d2.to_numpy(), np.array([w[2] for w in want]))
