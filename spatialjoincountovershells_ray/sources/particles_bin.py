"""Raw binary particle files (the reference's decoded format).

A decoded particle file is consecutive float32[3] triples with no header;
row count = file_size / 12 (reference src/Gadget/BufVector3D.c:285-308).
Read distributed via ``read_binary_files`` (one file per block) + a
vectorized frombuffer reshape; multi-file input is plain concatenation
(reference readAndAppendDecodedParticles, BufVector3D.c:310-335 — here
just a multi-path read / union).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

RECORD_BYTES = 12  # 3 * float32


def write_particle_file(path: str, xyz: np.ndarray) -> str:
    """Write the reference's raw float32[3] binary layout (test helper /
    generator sink, reference src/uniform_decoded_particle_generator/main.c:54-58)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.ascontiguousarray(xyz, dtype=np.float32).tofile(path)
    return path


def decode_particle_batch(batch: dict, id_bases: "dict[str, int] | None" = None) -> pa.Table:
    """map_batches kernel over read_binary_files output: bytes -> rows.

    particle_id is the within-file ordinal offset by a per-file base so
    multi-file concatenation reproduces the reference's global array
    position (readAndAppendDecodedParticles appends in path order)."""
    out_tables = []
    paths = batch.get("path", [None] * len(batch["bytes"]))
    for blob, path in zip(batch["bytes"], paths):
        if len(blob) % RECORD_BYTES:
            raise ValueError(f"file size {len(blob)} not a multiple of {RECORD_BYTES}")
        arr = np.frombuffer(blob, dtype=np.float32).reshape(-1, 3)
        n = len(arr)
        base = 0
        if id_bases is not None and path is not None:
            base = id_bases.get(os.path.abspath(path), id_bases.get(path, 0))
        out_tables.append(
            pa.table(
                {
                    "particle_id": np.arange(base, base + n, dtype=np.int64),
                    "x": arr[:, 0],
                    "y": arr[:, 1],
                    "z": arr[:, 2],
                }
            )
        )
    return pa.concat_tables(out_tables)


def _expand_paths(paths: "str | list[str]") -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(os.path.join(p, f) for f in os.listdir(p)))
        else:
            out.append(p)
    return out


def read_decoded_particles(paths: "str | list[str]") -> "ray.data.Dataset":
    """Dataset of particle_id:int64, x/y/z:float32 from raw binary files.

    Per-file id bases are cumulative record counts in path order (from a
    driver-side stat of each file — O(nfiles), no data read), so ids are
    globally unique and equal to the reference's append-order position.
    Ray may also return a file's path in canonical (absolute) form, so
    the base map is keyed by both spellings.
    """
    files = _expand_paths(paths)
    bases: dict[str, int] = {}
    off = 0
    for f in files:
        bases[f] = bases[os.path.abspath(f)] = off
        off += os.path.getsize(f) // RECORD_BYTES
    ds = ray.data.read_binary_files(files, include_paths=True)
    return ds.map_batches(
        decode_particle_batch, fn_kwargs={"id_bases": bases}, batch_format="numpy"
    )
