"""equi_join (pipelines.join): broadcast and shuffle plans vs pandas merge."""

import numpy as np
import pandas as pd
import ray

from spatialjoincountovershells_ray.pipelines.join import equi_join


def _sides(nl=4000, nr=300, seed=2):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "lid": np.arange(nl, dtype=np.int64),
            "k": rng.integers(0, nr + 50, nl).astype(np.int64),  # some unmatched
        }
    )
    right = pd.DataFrame(
        {
            "k2": np.arange(nr, dtype=np.int64),
            "tag": [f"t{i % 7}" for i in range(nr)],
        }
    )
    return left, right


def _expected(left, right):
    m = left.merge(right, left_on="k", right_on="k2", how="inner")
    return (
        m[["lid", "k", "tag"]]
        .sort_values(["lid"])
        .reset_index(drop=True)
    )


def _blocks(df, n):
    return ray.data.from_pandas([d for d in np.array_split(df, n)])


class TestEquiJoin:
    def test_broadcast_matches_merge(self):
        left, right = _sides()
        out = (
            equi_join(_blocks(left, 5), _blocks(right, 3), "k", "k2", mode="broadcast")
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, _expected(left, right))

    def test_shuffle_matches_merge(self):
        left, right = _sides(seed=9)
        out = (
            equi_join(
                _blocks(left, 5), _blocks(right, 3), "k", "k2", mode="shuffle", nbuckets=4
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, _expected(left, right))

    def test_shuffle_string_keys(self):
        rng = np.random.default_rng(4)
        left = pd.DataFrame(
            {
                "lid": np.arange(1000, dtype=np.int64),
                "kw": rng.choice([f"key-{i}" for i in range(40)], 1000),
            }
        )
        right = pd.DataFrame(
            {"kw2": [f"key-{i}" for i in range(0, 60, 2)], "val": np.arange(30, dtype=np.int64)}
        )
        out = (
            equi_join(_blocks(left, 4), _blocks(right, 2), "kw", "kw2", mode="shuffle", nbuckets=4)
            .to_pandas()
            .sort_values(["lid"])
            .reset_index(drop=True)
        )
        exp = (
            left.merge(right, left_on="kw", right_on="kw2", how="inner")[["lid", "kw", "val"]]
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert "__jk" not in out.columns
        pd.testing.assert_frame_equal(out, exp)

    def test_shuffle_empty_bucket_and_dup_keys(self):
        # all keys land in one bucket; right has duplicate keys (1:N fan-out)
        left = pd.DataFrame({"lid": np.array([1, 2], dtype=np.int64), "k": np.array([8, 8], dtype=np.int64)})
        right = pd.DataFrame({"k2": np.array([8, 8], dtype=np.int64), "tag": ["x", "y"]})
        out = equi_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), "k", "k2",
            mode="shuffle", nbuckets=4,
        ).to_pandas()
        assert len(out) == 4  # 2 left rows x 2 right dups
        assert set(out["tag"]) == {"x", "y"}


class TestSemiAntiJoin:
    def test_broadcast_semi(self):
        left, right = _sides(seed=13)
        out = (
            equi_join(
                _blocks(left, 4), _blocks(right, 2), "k", "k2",
                mode="broadcast", join_type="left semi",
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        exp = (
            left[left.k.isin(right.k2)]
            .sort_values("lid")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, exp)

    def test_shuffle_anti(self):
        left, right = _sides(seed=21)
        out = (
            equi_join(
                _blocks(left, 4), _blocks(right, 2), "k", "k2",
                mode="shuffle", join_type="left anti", nbuckets=4,
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        exp = (
            left[~left.k.isin(right.k2)]
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert len(exp) > 0
        pd.testing.assert_frame_equal(out, exp)

    def test_semi_dedups_multi_matches(self):
        # a left row with N right matches must appear exactly once
        left = pd.DataFrame({"lid": np.array([1], dtype=np.int64), "k": np.array([8], dtype=np.int64)})
        right = pd.DataFrame({"k2": np.array([8, 8, 8], dtype=np.int64)})
        out = equi_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), "k", "k2",
            join_type="left semi",
        ).to_pandas()
        assert len(out) == 1


class TestSaltedJoin:
    def test_salted_inner_matches_merge_on_skew(self):
        # one hot key carries 90% of the left rows
        rng = np.random.default_rng(3)
        nl = 5000
        k = np.where(rng.random(nl) < 0.9, 7, rng.integers(0, 50, nl)).astype(np.int64)
        left = pd.DataFrame({"lid": np.arange(nl, dtype=np.int64), "k": k})
        right = pd.DataFrame(
            {"k2": np.arange(50, dtype=np.int64), "tag": [f"t{i%5}" for i in range(50)]}
        )
        out = (
            equi_join(
                _blocks(left, 6), _blocks(right, 2), "k", "k2",
                mode="shuffle", nbuckets=4, salt=4,
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, _expected(left, right))

    def test_salted_semi_and_anti(self):
        left = pd.DataFrame(
            {"lid": np.arange(200, dtype=np.int64),
             "k": np.repeat(np.int64(9), 200)}
        )
        right = pd.DataFrame({"k2": np.array([9, 9, 11], dtype=np.int64)})
        semi = equi_join(
            _blocks(left, 3), ray.data.from_pandas(right), "k", "k2",
            mode="shuffle", nbuckets=2, salt=3, join_type="left semi",
        ).to_pandas()
        assert len(semi) == 200  # every hot-key row exactly once
        anti = equi_join(
            _blocks(left, 3), ray.data.from_pandas(right), "k", "k2",
            mode="shuffle", nbuckets=2, salt=3, join_type="left anti",
        ).to_pandas()
        assert len(anti) == 0


def test_auto_mode_picks_plan():
    left, right = _sides(seed=41)
    exp = _expected(left, right)
    out = (
        equi_join(_blocks(left, 4), _blocks(right, 2), "k", "k2", mode="auto")
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    # 1-byte budget forces shuffle; same logical result
    out2 = (
        equi_join(
            _blocks(left, 4), _blocks(right, 2), "k", "k2",
            mode="auto", auto_broadcast_bytes=1.0, nbuckets=4,
        )
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out2, exp)


def test_salt_rejects_outer_joins():
    import pytest

    left = pd.DataFrame({"lid": np.array([1], dtype=np.int64), "k": np.array([1], dtype=np.int64)})
    right = pd.DataFrame({"k2": np.array([2], dtype=np.int64)})
    with pytest.raises(ValueError, match="salt"):
        equi_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), "k", "k2",
            mode="shuffle", salt=2, join_type="full outer",
        )


def test_broadcast_rejects_right_preserving_joins():
    """Per-left-batch broadcast would emit unmatched right rows once per
    batch — the plan must refuse, and auto must route around it."""
    import pytest

    left = pd.DataFrame({"lid": np.array([1, 2], dtype=np.int64), "k": np.array([1, 3], dtype=np.int64)})
    right = pd.DataFrame({"k2": np.array([1, 9], dtype=np.int64), "tag": ["a", "b"]})
    for jt in ("full outer", "right outer", "right semi", "right anti"):
        with pytest.raises(ValueError, match="broadcast"):
            equi_join(
                _blocks(left, 2), ray.data.from_pandas(right), "k", "k2",
                mode="broadcast", join_type=jt,
            )
    # auto must pick shuffle for these types even when the right side is tiny
    out = (
        equi_join(
            _blocks(left, 2), ray.data.from_pandas(right), "k", "k2",
            mode="auto", join_type="full outer", nbuckets=2,
        )
        .to_pandas()
    )
    # exactly one unmatched right row (k2=9), not one per left batch
    assert int(out["lid"].isna().sum()) == 1
    exp = left.merge(right, left_on="k", right_on="k2", how="outer")
    assert len(out) == len(exp)


def test_run_cached_bcast_rekeys_on_new_broadcast():
    """The per-worker kernel cache is keyed by the broadcast ref: a second
    call with a DIFFERENT right table must not reuse the stale kernel."""
    import pyarrow as pa

    from spatialjoincountovershells_ray.pipelines.join import _BcastJoiner
    from spatialjoincountovershells_ray.stages.join_kernels import run_cached_bcast

    batch = pa.table({"k": np.array([1, 2], dtype=np.int64)})
    r1 = ray.put(pa.table({"k2": np.array([1], dtype=np.int64), "tag": ["a"]}))
    r2 = ray.put(pa.table({"k2": np.array([2], dtype=np.int64), "tag": ["b"]}))
    kw = {"left_key": "k", "right_key": "k2", "join_type": "inner"}
    out1 = run_cached_bcast(batch, _BcastJoiner, [r1], kw)
    out2 = run_cached_bcast(batch, _BcastJoiner, [r2], kw)
    assert out1.column("tag").to_pylist() == ["a"]
    assert out2.column("tag").to_pylist() == ["b"]
    # same ref again: cache hit must still be correct
    out3 = run_cached_bcast(batch, _BcastJoiner, [r1], kw)
    assert out3.column("tag").to_pylist() == ["a"]


def test_shuffle_zero_block_side():
    """A zero-block side must yield a typed empty (or passthrough) result,
    not a concat_tables crash."""
    left = pd.DataFrame({"lid": np.array([1, 2], dtype=np.int64), "k": np.array([1, 3], dtype=np.int64)})
    empty = ray.data.from_arrow([])  # zero blocks
    out = equi_join(
        ray.data.from_pandas(left), empty, "k", "k2", mode="shuffle", nbuckets=2
    )
    assert out.count() == 0
    # zero-block LEFT side too
    out2 = equi_join(
        empty, ray.data.from_pandas(left), "k2", "k", mode="shuffle", nbuckets=2
    )
    assert out2.count() == 0
    # broadcast mode with a zero-block pandas-schema right side
    out3 = equi_join(
        ray.data.from_pandas(left), empty, "k", "k2", mode="broadcast"
    )
    assert out3.count() == 0


class TestBloomSemiJoin:
    def test_exact_matches_semi_join(self):
        from spatialjoincountovershells_ray.pipelines.join import bloom_semi_join

        left, right = _sides()
        got = (
            bloom_semi_join(_blocks(left, 7), _blocks(right, 3), "k", "k2")
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = (
            left[left["k"].isin(set(right["k2"]))]
            .sort_values("lid")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_prefilter_has_no_false_negatives(self):
        # tiny bitmap -> false positives certain; matches must all survive
        from spatialjoincountovershells_ray.pipelines.join import bloom_semi_join

        left, right = _sides()
        pre = bloom_semi_join(
            _blocks(left, 5), _blocks(right, 2), "k", "k2", nbits=256, nhashes=2,
            verify=False,
        ).to_pandas()
        matches = set(left[left["k"].isin(set(right["k2"]))]["lid"])
        assert matches <= set(pre["lid"])
        # and the verified plan removes the false positives even then
        exact = bloom_semi_join(
            _blocks(left, 5), _blocks(right, 2), "k", "k2", nbits=256, nhashes=2
        ).to_pandas()
        assert set(exact["lid"]) == matches

    def test_zero_block_build_side(self):
        from spatialjoincountovershells_ray.pipelines.join import bloom_semi_join

        left, _ = _sides()
        empty = ray.data.from_pandas(pd.DataFrame({"k2": np.array([], np.int64)}))
        out = bloom_semi_join(_blocks(left, 3), empty, "k", "k2").to_pandas()
        assert len(out) == 0


class TestRevenueByNation:
    def test_matches_duckdb_star_join(self):
        import duckdb

        from spatialjoincountovershells_ray.pipelines.relational import revenue_by_nation

        sf = "/root/testdata/sf0.001"
        out = revenue_by_nation(sf).to_pandas()
        con = duckdb.connect()
        for t in ["lineitem", "orders", "customer", "nation"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
        want = con.execute(
            "SELECT n_name, CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4 "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name ORDER BY n_name"
        ).df()
        assert out["n_name"].tolist() == want["n_name"].tolist()
        assert out["revenue_e4"].tolist() == want["revenue_e4"].tolist()


class TestSetOps:
    def _sides(self):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(5)
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 40, 300),
                "g": rng.choice(["a", "b", "c"], 300),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(20, 60, 300),
                "g": rng.choice(["a", "b", "d"], 300),
            }
        )
        return left, right

    def test_all_ops_match_pandas(self):
        import numpy as np
        import pandas as pd
        import ray
        from spatialjoincountovershells_ray.pipelines.relational import set_op_distinct

        left, right = self._sides()
        lds = ray.data.from_pandas([d for d in np.array_split(left, 5)])
        rds = ray.data.from_pandas([d for d in np.array_split(right, 3)])
        lset = set(map(tuple, left.drop_duplicates().values))
        rset = set(map(tuple, right.drop_duplicates().values))
        want = {
            "union": lset | rset,
            "intersect": lset & rset,
            "except": lset - rset,
        }
        for op, exp in want.items():
            out = set_op_distinct(lds, rds, ["k", "g"], op).to_pandas()
            got = sorted(map(tuple, out.values))
            assert got == sorted(exp), op
            assert len(exp) > 0, op  # fixture non-vacuous for every op

    def test_unknown_op_raises(self):
        import ray
        import pytest
        from spatialjoincountovershells_ray.pipelines.relational import set_op_distinct

        ds = ray.data.range(4)
        with pytest.raises(ValueError):
            set_op_distinct(ds, ds, ["id"], "minus")


class TestSortMergeJoin:
    def _sides(self):
        import pandas as pd

        rng = np.random.default_rng(23)
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 50, 400).astype(np.int64),
                "lv": np.arange(400, dtype=np.int64),
            }
        )
        right = pd.DataFrame(
            {
                "rk": np.concatenate(
                    [rng.integers(0, 40, 60), np.arange(45, 60)]
                ).astype(np.int64),
                "rv": np.arange(75, dtype=np.int64) * 10,
            }
        )
        return left, right

    def test_all_types_match_pandas(self):
        import pandas as pd

        from spatialjoincountovershells_ray.pipelines.join import equi_join_sortmerge

        left, right = self._sides()
        lds = ray.data.from_pandas([d for d in np.array_split(left, 5)])
        rds = ray.data.from_pandas([d for d in np.array_split(right, 3)])
        for jt, how in (
            ("inner", "inner"),
            ("left outer", "left"),
        ):
            got = equi_join_sortmerge(lds, rds, "k", "rk", join_type=jt, nbuckets=4).to_pandas()
            want = left.merge(right, left_on="k", right_on="rk", how=how).drop(columns=["rk"])
            gs = got.sort_values(["k", "lv", "rv"], na_position="last").reset_index(drop=True)
            ws = want.sort_values(["k", "lv", "rv"], na_position="last").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                gs[["k", "lv", "rv"]].astype({"rv": "float64"}),
                ws[["k", "lv", "rv"]].astype({"rv": "float64"}),
            )
        # semi / anti
        got = equi_join_sortmerge(lds, rds, "k", "rk", join_type="left semi", nbuckets=4).to_pandas()
        want = left[left.k.isin(right.rk)]
        assert sorted(got.lv) == sorted(want.lv)
        got = equi_join_sortmerge(lds, rds, "k", "rk", join_type="left anti", nbuckets=4).to_pandas()
        want = left[~left.k.isin(right.rk)]
        assert sorted(got.lv) == sorted(want.lv)

    def test_output_globally_key_ordered(self):
        from spatialjoincountovershells_ray.pipelines.join import equi_join_sortmerge

        left, right = self._sides()
        lds = ray.data.from_pandas([d for d in np.array_split(left, 5)])
        rds = ray.data.from_pandas([d for d in np.array_split(right, 3)])
        got = equi_join_sortmerge(lds, rds, "k", "rk", nbuckets=6).to_pandas()
        assert (np.diff(got["k"].to_numpy()) >= 0).all()

    def test_zero_block_right(self):
        from spatialjoincountovershells_ray.pipelines.join import equi_join_sortmerge

        left, _ = self._sides()
        lds = ray.data.from_pandas(left)
        empty = ray.data.from_pandas(
            __import__("pandas").DataFrame({"rk": np.array([], np.int64), "rv": np.array([], np.int64)})
        )
        got = equi_join_sortmerge(lds, empty, "k", "rk", join_type="left outer").to_pandas()
        assert len(got) == len(left)
        assert got["rv"].isna().all()


class TestValidityLookup:
    def test_matches_bruteforce(self):
        import pyarrow as pa

        from spatialjoincountovershells_ray.pipelines.join import validity_lookup

        rng = np.random.default_rng(31)
        base = 1_000_000
        # 6 keys x up to 3 non-overlapping windows with gaps
        dk, db, de, dv = [], [], [], []
        for k in range(6):
            t = base + int(rng.integers(0, 50))
            for v in range(int(rng.integers(1, 4))):
                b = t + int(rng.integers(0, 30))
                e = b + int(rng.integers(5, 40))
                dk.append(k); db.append(b); de.append(e); dv.append(v)
                t = e + int(rng.integers(0, 20))
        dim = pa.table(
            {
                "key": np.array(dk, np.int64),
                "begin_us": np.array(db, np.int64),
                "end_us": np.array(de, np.int64),
                "version": np.array(dv, np.int64),
            }
        )
        n = 2000
        facts = pa.table(
            {
                "fid": np.arange(n, dtype=np.int64),
                "key": rng.integers(0, 8, n).astype(np.int64),  # keys 6,7 never match
                "ts_us": (base + rng.integers(-20, 400, n)).astype(np.int64),
            }
        )
        got = (
            validity_lookup(
                ray.data.from_arrow(facts).repartition(5),
                dim,
                key="key",
                ts="ts_us",
                id_col="fid",
                payloads=("version",),
                base_us=base - 64,
                shift=1 << 20,
            )
            .to_pandas()
            .sort_values("fid")
            .reset_index(drop=True)
        )
        want = np.full(n, np.nan)
        for i in range(n):
            for j in range(len(dk)):
                if dk[j] == facts["key"][i].as_py() and db[j] <= facts["ts_us"][i].as_py() < de[j]:
                    want[i] = dv[j]
        assert len(got) == n
        np.testing.assert_array_equal(np.isnan(got["version"]), np.isnan(want))
        m = ~np.isnan(want)
        np.testing.assert_array_equal(got["version"][m], want[m])
        assert m.any() and (~m).any()

    def test_overlap_refused(self):
        import pyarrow as pa
        import pytest

        from spatialjoincountovershells_ray.pipelines.join import validity_lookup

        dim = pa.table(
            {
                "key": np.array([1, 1], np.int64),
                "begin_us": np.array([100, 150], np.int64),
                "end_us": np.array([200, 260], np.int64),
                "version": np.array([0, 1], np.int64),
            }
        )
        facts = ray.data.from_pandas(
            pd.DataFrame({"fid": [1], "key": np.array([1], np.int64), "ts_us": np.array([120], np.int64)})
        )
        with pytest.raises(ValueError, match="overlapping"):
            validity_lookup(
                facts, dim, key="key", ts="ts_us", id_col="fid",
                payloads=("version",), base_us=0, shift=1 << 20,
            )
