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


def decode_particle_batch(batch: dict, id_base: int = 0) -> pa.Table:
    """map_batches kernel over read_binary_files output: bytes -> rows.

    particle_id is the within-file ordinal offset by a per-file base (the
    reference identifies particles only by array position)."""
    out_tables = []
    for blob in batch["bytes"]:
        if len(blob) % RECORD_BYTES:
            raise ValueError(f"file size {len(blob)} not a multiple of {RECORD_BYTES}")
        arr = np.frombuffer(blob, dtype=np.float32).reshape(-1, 3)
        n = len(arr)
        out_tables.append(
            pa.table(
                {
                    "particle_id": np.arange(id_base, id_base + n, dtype=np.int64),
                    "x": arr[:, 0],
                    "y": arr[:, 1],
                    "z": arr[:, 2],
                }
            )
        )
    return pa.concat_tables(out_tables)


def read_decoded_particles(paths: "str | list[str]") -> "ray.data.Dataset":
    """Dataset of particle_id:int64, x/y/z:float32 from raw binary files."""
    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(decode_particle_batch, batch_format="numpy")
