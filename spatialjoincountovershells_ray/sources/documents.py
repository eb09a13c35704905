"""The interleaved text+media document table (the engine's native input).

Schema per BASELINE.json ``input_hint`` / FIXTURES.md §1:

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Each document's spans are ``[text, record, media, text]`` with the
geometry-bearing record span at index 1 (FIXTURES.md interleaving rule).
Two record grammars, both taken from the reference's readers:

- ``halo_record``: a reference halo-file line — 40 space-separated
  columns, col 0 = id, col 2 = mass, cols 8-10 = x y z, the exact layout
  ``GetDataFromLineFast`` parses (reference src/Gadget/BufHalo.c:218-249).
- ``particle_record``: ``"x y z"``.

``precision='repr'`` writes shortest-round-trip float64 reprs (exact
parse-back — used for the SQL-checkable pipelines); ``precision='f6'``
writes the reference's ``%f`` 6-decimal form (reference-parity fixtures,
reference src/uniform_halo_generator/main.c:63-68).

The table is written as parquet (Lance is not available in this
environment; the schema and pipeline are format-agnostic — a
``read_lance`` swap-in is a one-liner where supported).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])

N_HALO_COLS = 40  # reference halo line arity (src/uniform_halo_generator/main.c:63-68)
HALO_HEADER_LINES = 16  # discarded header lines (reference include/Gadget/BufHalo.h:8)


def _fmt(v: float, precision: str) -> str:
    return repr(float(v)) if precision == "repr" else "%f" % float(v)


def halo_record_line(halo_id: int, mass: float, x: float, y: float, z: float, precision: str = "repr") -> str:
    cols = ["0"] * N_HALO_COLS
    cols[0] = str(int(halo_id))
    cols[2] = _fmt(mass, precision)
    cols[8], cols[9], cols[10] = (_fmt(x, precision), _fmt(y, precision), _fmt(z, precision))
    return " ".join(cols)


def particle_record_line(x: float, y: float, z: float, precision: str = "repr") -> str:
    return f"{_fmt(x, precision)} {_fmt(y, precision)} {_fmt(z, precision)}"


def _doc_rows(doc_ids, record_kind, record_texts):
    """Assemble the [text, record, media, text] span layout per document."""
    spans = []
    for did, rec in zip(doc_ids, record_texts):
        spans.append(
            [
                {"kind": "text", "text": f"prose before {did}", "media_ref": "", "offset": 0},
                {"kind": record_kind, "text": rec, "media_ref": "", "offset": 1},
                {"kind": "media", "text": "", "media_ref": f"s3://fixtures/{did}/0.png", "offset": 2},
                {"kind": "text", "text": f"prose after {did}", "media_ref": "", "offset": 3},
            ]
        )
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()), pa.array(spans, pa.list_(SPAN_TYPE))],
        schema=DOC_SCHEMA,
    )


def halo_documents(
    halo_ids: np.ndarray, xyz: np.ndarray, mass: np.ndarray | None = None, precision: str = "repr"
) -> pa.Table:
    if mass is None:
        mass = np.full(len(halo_ids), 8.51985e11)
    recs = [
        halo_record_line(h, m, p[0], p[1], p[2], precision)
        for h, m, p in zip(halo_ids, mass, xyz)
    ]
    return _doc_rows([f"halo-{int(h)}" for h in halo_ids], "halo_record", recs)


def particle_documents(part_ids: np.ndarray, xyz: np.ndarray, precision: str = "repr") -> pa.Table:
    recs = [particle_record_line(p[0], p[1], p[2], precision) for p in xyz]
    return _doc_rows([f"part-{int(i)}" for i in part_ids], "particle_record", recs)


def write_documents(
    table: pa.Table,
    path: str,
    row_group_size: int = 50_000,
    shards: int | None = None,
) -> str:
    """Write a document table with BOUNDED row groups, optionally as a
    ``shards``-file directory at ``path``.

    A single one-row-group file serializes ray.data.read_parquet into ONE
    task — and Ray fuses downstream map stages into the read task, so a
    read->extract->kernel chain over a monolithic file runs on one CPU no
    matter the cluster size (measured: shell_count_docs 7.2 s fused vs
    2.8 s staged at sf0.1/32cpus). Sharded files are both the fix and the
    shape a production corpus arrives in ("never one giant file")."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if shards and shards > 1:
        os.makedirs(path, exist_ok=True)
        n = table.num_rows
        bounds = [(i * n) // shards for i in range(shards + 1)]
        for i in range(shards):
            pq.write_table(
                table.slice(bounds[i], bounds[i + 1] - bounds[i]),
                f"{path}/shard-{i:05d}.parquet",
                row_group_size=row_group_size,
            )
        return path
    pq.write_table(table, path, row_group_size=row_group_size)
    return path


def write_documents_jsonl(table: pa.Table, path: str) -> str:
    """Write the document table as JSON-lines (one doc per line, spans as
    a JSON array) — the common interchange format for text corpora."""
    import json

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for row in table.to_pylist():
            f.write(json.dumps(row, separators=(",", ":")) + "\n")
    return path


def _cast_doc_schema(batch: pa.Table) -> pa.Table:
    """Normalize an inferred (JSON) schema to the canonical DOC_SCHEMA."""
    return batch.select(["doc_id", "spans"]).cast(DOC_SCHEMA)


def read_documents(path: str, **kwargs):
    """Read an interleaved-document table as a Ray Dataset.

    The production format is Lance (``.lance`` datasets via
    ``ray.data.read_lance``, which requires the ``lance`` package); this
    environment has no Lance, so parquet twins carry the identical schema
    and every downstream stage is format-agnostic Arrow. ``.jsonl`` /
    ``.json`` corpora are read with ray.data.read_json and cast to the
    canonical span schema. Dispatch is by extension so the same pipeline
    code runs unchanged across formats."""
    import ray

    if path.endswith(".lance"):
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "Lance input requires the 'lance' package (unavailable in "
                "this environment); use the parquet twin of the table"
            ) from e
        return ray.data.read_lance(path, **kwargs)
    if path.endswith((".jsonl", ".json")):
        return ray.data.read_json(path, **kwargs).map_batches(
            _cast_doc_schema, batch_format="pyarrow", zero_copy_batch=True
        )
    return ray.data.read_parquet(path, **kwargs)
