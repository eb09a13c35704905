"""pretrain_data_job: full-chain correctness vs a pandas replay oracle,
plus phase-granular resume (second run skips every phase)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATES = {"a": 0.5, "b": 2.0}
BUDGET = 32
MIN_TOKENS = 3


def _fixture(tmpdir):
    rng = np.random.default_rng(17)
    rows = []
    did = 0
    for s in range(2):
        for i in range(60):
            r = int(rng.integers(0, 10))
            src = "a" if did % 2 == 0 else "b"
            if r < 2:
                t = "tiny"  # fails min-tokens
            elif r < 4:
                t = f"benchmark overlap sentinel phrase {r}"  # decontaminated
            elif r < 6:
                t = f"duplicate corpus body variant {r} words words"  # dups
            else:
                t = f"unique training document {did} " + " ".join(
                    rng.choice([f"w{j}" for j in range(30)], size=int(rng.integers(4, 12)))
                )
            rows.append((did, t, src))
            did += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    shards = []
    for s in range(2):
        p = os.path.join(tmpdir, f"docs{s}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df.iloc[s * 60 : (s + 1) * 60], preserve_index=False), p
        )
        shards.append(p)
    bench = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [f"benchmark overlap sentinel phrase {r}" for r in range(4)],
        }
    )
    bpath = os.path.join(tmpdir, "bench.parquet")
    pq.write_table(pa.Table.from_pandas(bench, preserve_index=False), bpath)
    return df, shards, bench, bpath


def _oracle(df, bench):
    """Pandas replay of every phase up to the pack input."""
    from spatialjoincountovershells_ray.pipelines.curation import mixture_rate_nums
    from spatialjoincountovershells_ray.pipelines.relagg import (
        _SAMPLE_A,
        _SAMPLE_B,
        _SAMPLE_M,
    )

    kept = df[df["text"].str.split().str.len() >= MIN_TOKENS]
    # decontam: any shared word 3-gram with the bench texts
    def grams(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()

    bench_grams = set().union(*(grams(t) for t in bench["text"]))
    kept = kept[~kept["text"].map(lambda t: bool(grams(t) & bench_grams))]
    # exact dedup keep-min
    kept = kept.loc[kept.groupby("text")["doc_id"].transform("min") == kept["doc_id"]]
    # mixture copies
    nums = mixture_rate_nums(RATES)
    num = kept["source"].map(nums).to_numpy(dtype=np.int64)
    h = (kept["doc_id"].to_numpy() * _SAMPLE_A + _SAMPLE_B) % _SAMPLE_M
    copies = num // _SAMPLE_M + (h < num % _SAMPLE_M)
    mixed = kept.loc[kept.index.repeat(copies)].copy()
    mixed["copy"] = np.concatenate([np.arange(c) for c in copies if c > 0]) if len(mixed) else []
    mixed["seq_id"] = mixed["doc_id"] * 16 + mixed["copy"]
    return kept, mixed.sort_values("seq_id").reset_index(drop=True)


def _run(args):
    env = dict(os.environ, RAY_ADDRESS="local", RAY_NUM_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "pretrain_data_job.py"), *args],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def test_full_chain_and_resume(tmp_path):
    df, shards, bench, bpath = _fixture(str(tmp_path))
    outdir = str(tmp_path / "run")
    args = [
        "--doc-shards", *shards, "--bench", bpath, "--out", outdir,
        "--min-tokens", str(MIN_TOKENS), "--rates", "a=0.5", "b=2.0",
        "--pack-budget", str(BUDGET),
    ]
    s1 = _run(args)
    kept, mixed = _oracle(df, bench)
    assert s1["phases"]["mixture"]["rows"] == len(mixed)
    assert not s1["phases"]["mixture"]["skipped"]

    # pack table replays exactly: seq_id order, cumulative token cuts
    packed = pq.read_table(os.path.join(outdir, "packs", "shard=packed")).to_pandas()
    packed = packed.sort_values("doc_id").reset_index(drop=True)
    ntok = mixed["text"].str.split().str.len().to_numpy()
    cb = np.cumsum(ntok) - ntok
    assert packed["doc_id"].tolist() == mixed["seq_id"].tolist()
    assert packed["n_tokens"].tolist() == ntok.tolist()
    assert packed["pack_id"].tolist() == (cb // BUDGET).tolist()
    assert packed["pack_offset"].tolist() == (cb % BUDGET).tolist()

    # serving sink: row counts survive the partitioned round-trip
    serving = pq.read_table(os.path.join(outdir, "serving")).to_pandas()
    assert len(serving) == len(packed)
    assert s1["phases"]["sink"]["rows"] == len(packed)

    # second run: every phase skips, summary rows identical
    s2 = _run(args)
    assert all(p["skipped"] for p in s2["phases"]["clean"])
    for unit in ("decontam", "dedup", "mixture", "pack", "sink"):
        assert s2["phases"][unit]["skipped"], unit
    assert s2["phases"]["mixture"]["rows"] == s1["phases"]["mixture"]["rows"]
    assert s2["phases"]["sink"]["rows"] == s1["phases"]["sink"]["rows"]
