"""Machine-ceiling control for the scaling-efficiency criterion.

Runs the shell-count join kernel (the same BroadcastShellCount the engine's
hot stage uses, two-phase f32 path) in N *plain* concurrent processes — no
Ray, no object store, no scheduler — and reports aggregate pairs/s. Running
it at N and 4N gives the *machine's* compute-scaling ceiling: on a single
shared-DRAM box, 4x the workers never yields 4x the throughput (shared L3 /
memory-controller contention), and that loss is a property of the host, not
of the engine. A real 4N-node cluster has 4x the memory systems and does
not pay it.

Methodology notes:
- every process builds its index and warms up BEFORE a shared barrier, so
  setup of one process never overlaps another's timing window;
- each process then measures a fixed-duration window (batches cycled), so
  all N processes are measured under full N-way contention — no tail bias
  from early finishers freeing the memory system.

`bench.py --scaling` efficiency should therefore be read relative to this
ceiling: engine_layer_efficiency = end_to_end_efficiency / ceiling.

Usage: python tools/scaling_control.py N [duration_sec]   (one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Barrier, Process, Queue

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spatialjoincountovershells_ray.config import BOX_SIZE, GridSpec, RadiusLadder
from spatialjoincountovershells_ray.functions.hashing import derive_xyz
from spatialjoincountovershells_ray.stages.join_kernels import BroadcastShellCount, HaloIndex

HALOS = 15_000
PARTICLES_PER_PROC = 75_000
BATCH = 9_375


def worker(q: Queue, barrier: Barrier, seed: int, duration: float) -> None:
    hxyz = derive_xyz(np.arange(1, HALOS + 1, dtype=np.int64))
    lo = HALOS + 1 + seed * PARTICLES_PER_PROC
    pxyz = derive_xyz(np.arange(lo, lo + PARTICLES_PER_PROC, dtype=np.int64))
    ladder = RadiusLadder.log2_spaced(5.0, 300.0, 8)
    grid = GridSpec.for_radius(ladder.rmax, box=BOX_SIZE, target_cells_per_r=3.0)
    idx = HaloIndex.build(np.arange(HALOS, dtype=np.int64), hxyz, ladder.rmax, grid, BOX_SIZE)
    k = BroadcastShellCount(idx, ladder)  # bare index (not a ref list): no Ray involved
    batches = [
        pa.table({"x": pxyz[s : s + BATCH, 0], "y": pxyz[s : s + BATCH, 1], "z": pxyz[s : s + BATCH, 2]})
        for s in range(0, PARTICLES_PER_PROC, BATCH)
    ]
    k(batches[0])  # warm: first-touch scratch, code paths
    barrier.wait()
    t0 = time.perf_counter()
    deadline = t0 + duration
    pairs = 0
    i = 0
    while time.perf_counter() < deadline:
        out = k(batches[i % len(batches)])
        i += 1
        if out.num_rows:
            for j in range(ladder.nrads):
                pairs += out.column(f"s{j}").to_numpy().sum()
    q.put(pairs / (time.perf_counter() - t0))


def main() -> None:
    n = int(sys.argv[1])
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    q: Queue = Queue()
    barrier = Barrier(n)
    ps = [Process(target=worker, args=(q, barrier, i, duration)) for i in range(n)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    print(json.dumps({"nprocs": n, "total_pairs_per_sec": float(np.sum(rates))}))


if __name__ == "__main__":
    main()
