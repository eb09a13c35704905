"""Per-partition checkpointing: resumable sharded runs with lineage.

The reference has no checkpointing (a crash loses the run — SURVEY.md
§4.1); at 100 TB that is unacceptable. This module runs a pipeline
shard-by-shard: each input shard's result is written to its own parquet
directory plus a manifest entry (lineage: shard id, input fingerprint,
row count, wall time). A restarted run skips every shard whose manifest
entry is complete — idempotent because each shard's output directory is
written atomically (tmp dir + rename) and keyed by shard id.

Works with any `shard -> Dataset` function; the flagship use is
per-particle-shard shell counting (partials then a final merge), giving
the reference's A2 cross-file accumulation with restartability.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Callable

import pyarrow.parquet as pq


@dataclass
class ShardResult:
    shard_id: str
    path: str
    rows: int
    seconds: float
    skipped: bool


class CheckpointedRun:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "manifest.jsonl")
        self._done: dict[str, dict] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    rec = json.loads(line)
                    self._done[rec["shard_id"]] = rec

    def completed_shards(self) -> set[str]:
        return set(self._done)

    def _record(self, rec: dict) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._done[rec["shard_id"]] = rec

    def shard_dir(self, shard_id: str) -> str:
        return os.path.join(self.out_dir, f"shard={shard_id}")

    def run_shard(
        self,
        shard_id: str,
        make_dataset: Callable[[], "object"],
        fingerprint: str = "",
    ) -> ShardResult:
        """Execute one shard unless already complete; atomic write."""
        final = self.shard_dir(shard_id)
        prev = self._done.get(shard_id)
        if prev is not None and os.path.isdir(final):
            return ShardResult(shard_id, final, prev["rows"], 0.0, skipped=True)
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        if os.path.isdir(final):  # crashed between write and manifest
            shutil.rmtree(final)
        t0 = time.time()
        ds = make_dataset()
        ds.write_parquet(tmp)
        rows = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows for f in os.listdir(tmp))
        os.rename(tmp, final)
        dt = time.time() - t0
        self._record(
            {
                "shard_id": shard_id,
                "fingerprint": fingerprint,
                "rows": rows,
                "seconds": round(dt, 3),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
        )
        return ShardResult(shard_id, final, rows, dt, skipped=False)

    def read_all(self):
        """Dataset over every completed shard's output.

        (Ray's read_parquet rejects a LIST of directories — expand to the
        individual parquet files.)"""
        import ray

        files = []
        for s in sorted(self._done):
            d = self.shard_dir(s)
            files.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
        return ray.data.read_parquet(files)
