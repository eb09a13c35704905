"""Per-stage profile of a registry query: wall time, rows, and Ray Data's
own per-operator stats — the throughput-metrics surface for interactive
use (jobs/*.py carry the per-shard lineage+metrics for batch runs).

Usage:
    python tools/profile_query.py <query> [sf_dir]

Prints one JSON line {query, sf, wall_s, rows, stages: [...]} followed by
the raw ``Dataset.stats()`` block (stderr) for stage-level drill-down.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _parse_stats(stats: str) -> list[dict]:
    """Pull (operator, wall-range, output rows) out of Dataset.stats()."""
    out = []
    cur = None
    for line in stats.splitlines():
        m = re.match(r"Operator (\d+) (.+?): .*executed in (\d+\.?\d*)s", line)
        if m:
            cur = {"op": m.group(2), "sec": float(m.group(3))}
            out.append(cur)
            continue
        if cur is not None:
            r = re.search(r"Output rows per task: .* (\d+) max, .* (\d+) total", line)
            if r:
                cur["rows"] = int(r.group(2))
    return out


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: profile_query.py <query> [sf_dir]")
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )

    from spatialjoincountovershells_ray.queries import REGISTRY

    qd = REGISTRY.get(name)
    if qd is None:
        sys.exit(f"unknown query {name!r}; known: {', '.join(sorted(REGISTRY))}")

    t0 = time.time()
    res = qd.fn(sf_dir)
    rows = 0
    stats = ""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, (pd.DataFrame, pa.Table)):
        rows = len(res)
    else:
        for b in res.iter_batches(batch_format="pyarrow", batch_size=None):
            rows += b.num_rows
        stats = res.stats()
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "query": name,
                "sf": sf_dir,
                "wall_s": round(wall, 3),
                "rows": rows,
                "stages": _parse_stats(stats),
            }
        )
    )
    if stats:
        print(stats, file=sys.stderr)
    ray.shutdown()


if __name__ == "__main__":
    main()
