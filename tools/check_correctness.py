"""Local stand-in for the driver's correctness gate.

Runs every REGISTRY query at a given sf dir, compares against the DuckDB
oracle (row count + schema-insensitive sorted-value equality), prints a
PASS/FAIL table. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from spatialjoincountovershells_ray.queries import REGISTRY

    con = duckdb.connect()
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(qd.fn(sf_dir))
            if qd.sql is not None:
                mine = canon(mine)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ERROR engine: {e!r}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if qd.sql is None:
            print(f"{name:24s} rows-only  {len(mine):8d} rows   {dt:6.1f}s")
            continue
        try:
            orc = canon(con.execute(qd.sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ERROR sql: {e!r}")
            failures.append(name)
            continue
        ok_rows = len(mine) == len(orc)
        ok_cols = list(mine.columns) == list(orc.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    mine, orc, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError:
                ok_vals = False
        status = "PASS" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:24s} {status}  rows {len(mine)}/{len(orc)} cols_ok={ok_cols} vals_ok={ok_vals}  {dt:6.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_rows and ok_cols:
                neq = (mine.values != orc.values)
                print("   first diffs:", np.argwhere(neq)[:3].tolist())
                print("   mine:", mine.head(3).to_dict("records"))
                print("   orcl:", orc.head(3).to_dict("records"))
            else:
                print("   mine cols:", list(mine.columns), "orcl cols:", list(orc.columns))
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
