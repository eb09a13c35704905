"""The reference's text halo file format (halo.list).

Layout (reference src/Gadget/BufHalo.c:76-119, generator
src/uniform_halo_generator/main.c:39-79): 16 discarded header lines,
then one halo per line with >= 11 whitespace-separated columns of which
col 0 = id (uint64), col 2 = mass, cols 8-10 = x y z; all other columns
ignored — exactly what ``GetDataFromLineFast`` (BufHalo.c:218-249)
extracts. Also the one-id-per-line filter file (BufHalo.c:251-299) and
the merge semi-join ``readAndFilterHalos`` (BufHalo.c:121-214), realised
here as a broadcast id-set filter.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

HEADER_LINES = 16


def write_halo_file(
    path: str, halo_ids: np.ndarray, mass: np.ndarray, xyz: np.ndarray, ncols: int = 40
) -> str:
    """Test helper / generator sink in the reference's 40-column layout."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in range(HEADER_LINES):
            f.write(f"#header {i}\n")
        for h, m, p in zip(halo_ids, mass, xyz):
            cols = ["0"] * ncols
            cols[0] = str(int(h))
            cols[2] = "%f" % m
            cols[8], cols[9], cols[10] = ("%f" % p[0], "%f" % p[1], "%f" % p[2])
            f.write(" ".join(cols) + "\n")
    return path


def parse_halo_lines(lines: pa.Array, dtype=np.float32) -> pa.Table:
    """Vectorized line parser (whitespace-splitting like strtok)."""
    split = pc.split_pattern_regex(pc.utf8_trim_whitespace(lines), r"\s+")
    cols = {"halo_id": pc.cast(pc.list_element(split, 0), pa.int64())}
    for name, pos in (("mass", 2), ("x", 8), ("y", 9), ("z", 10)):
        v = pc.cast(pc.list_element(split, pos), pa.float64())
        if dtype == np.float32:
            v = pc.cast(v, pa.float32())
        cols[name] = v
    return pa.table(cols)


def read_halo_file(path: str, dtype=np.float32) -> "ray.data.Dataset":
    """Dataset of halo_id/mass/x/y/z from a reference-format halo.list.

    The 16-line header is sliced off; blank lines dropped."""
    ds = ray.data.read_text(path)

    # read_text yields one row per line in file order within each block;
    # drop the global first HEADER_LINES rows via a small stateful window:
    # the header is tiny, so materializing just the first block is cheap.
    def parse(batch: pa.Table) -> pa.Table:
        return parse_halo_lines(batch.column("text"), dtype)

    # skip header by filtering non-data lines (the header rows written by
    # generators are arbitrary; data rows start with an integer id and have
    # >= 11 columns — the same effective rule as "skip first 16 lines" for
    # well-formed files, but robust under block splits)
    def keep_data(batch: pa.Table) -> pa.Table:
        lines = batch.column("text")
        ok = pc.match_substring_regex(
            lines, r"^\s*\d+(\s+\S+){10,}\s*$"
        )
        return batch.filter(ok)

    return ds.map_batches(keep_data, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )


def read_filter_ids(path: str) -> np.ndarray:
    """The halo-id filter list: one id per line (reference BufHalo.c:251-299)."""
    with open(path) as f:
        ids = [int(line) for line in f if line.strip()]
    return np.array(sorted(ids), dtype=np.int64)


def filter_halos_by_ids(halos: "ray.data.Dataset", ids: np.ndarray) -> "ray.data.Dataset":
    """Broadcast semi-join on halo_id (reference readAndFilterHalos)."""
    id_set = pa.array(np.asarray(ids, dtype=np.int64))

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("halo_id"), value_set=id_set))

    return halos.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
