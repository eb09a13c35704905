"""corpus_curation_job: end-to-end filter+dedup correctness and resume."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_shards(tmpdir):
    """3 shards: junk docs (too short / non-alpha), and dups across shards."""
    rng = np.random.default_rng(7)
    texts, ids = [], []
    did = 0
    for s in range(3):
        for i in range(40):
            r = rng.integers(0, 10)
            if r < 2:
                t = "x"  # fails min-tokens
            elif r < 4:
                t = "1234 5678 9012 3456"  # fails alpha fraction
            elif r < 7:
                t = f"unique document body number {did} with plenty of words"
            else:
                t = f"shared duplicate body variant {int(r)}"  # dups within+across shards
            texts.append(t)
            ids.append(did)
            did += 1
    df = pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64), "text": texts})
    paths = []
    for s in range(3):
        p = os.path.join(tmpdir, f"docs{s}.parquet")
        pq.write_table(pa.Table.from_pandas(df.iloc[s * 40 : (s + 1) * 40], preserve_index=False), p)
        paths.append(p)
    return df, paths


def _expected_curated(df, min_tokens=3, min_alpha_frac=0.4):
    ntok = df["text"].str.split().str.len()
    n_alpha = df["text"].str.count(r"[A-Za-z]")
    n_chars = df["text"].str.len()
    kept = df[(ntok >= min_tokens) & (n_chars > 0) & (n_alpha >= min_alpha_frac * n_chars)]
    return kept.loc[kept.groupby("text")["doc_id"].transform("min") == kept["doc_id"]]


def _run(args):
    env = dict(os.environ, RAY_ADDRESS="local", RAY_NUM_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "corpus_curation_job.py"), *args],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]


def test_curation_end_to_end_and_resume(tmp_path):
    df, shards = _write_shards(str(tmp_path))
    outdir = str(tmp_path / "run")
    logs = _run(["--doc-shards", *shards, "--out", outdir])
    done = [l for l in logs if l.get("done")][0]

    exp = _expected_curated(df)
    assert done["curated_rows"] == len(exp)

    # curated content matches the pandas oracle exactly
    cleaned_files = [
        os.path.join(outdir, "cleaned", d, f)
        for d in sorted(os.listdir(os.path.join(outdir, "cleaned")))
        if d.startswith("shard=")
        for f in sorted(os.listdir(os.path.join(outdir, "cleaned", d)))
        if f.endswith(".parquet")
    ]
    cleaned = pq.read_table(cleaned_files).to_pandas()
    drops = pq.read_table(os.path.join(outdir, "dedup", "shard=droplist")).to_pandas()
    curated = cleaned[~cleaned["doc_id"].isin(drops["doc_id"])]
    assert sorted(curated["doc_id"]) == sorted(exp["doc_id"])

    # resume: a second run skips every unit
    logs2 = _run(["--doc-shards", *shards, "--out", outdir])
    assert all(l["skipped"] for l in logs2 if "shard" in l or l.get("phase") == "dedup")
    done2 = [l for l in logs2 if l.get("done")][0]
    assert done2["curated_rows"] == done["curated_rows"]

    # load_curated: broadcast and shuffle anti-join paths agree
    sys.path.insert(0, REPO)
    from jobs.corpus_curation_job import load_curated

    bcast = sorted(load_curated(outdir).to_pandas()["doc_id"])
    shuf = sorted(load_curated(outdir, max_broadcast_ids=0).to_pandas()["doc_id"])
    assert bcast == shuf == sorted(exp["doc_id"])
