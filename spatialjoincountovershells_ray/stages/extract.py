"""Span -> geometry extractors (fully vectorized Arrow kernels).

The document-table analogue of the reference's readers: the halo-record
grammar matches ``GetDataFromLineFast`` (reference
src/Gadget/BufHalo.c:218-249 — col 0 id, col 2 mass, cols 8-10 x y z,
everything else ignored), the particle grammar is ``"x y z"``.

Each extractor is a ``map_batches(batch_format='pyarrow')`` function:
one record span per document is located with list_flatten +
list_parent_indices (no Python row loop), its text split, and the typed
columns appended. With ``carry_spans=True`` the untouched ``spans``
column rides along so every output row preserves span-sequence equality
(the per-row invariant of BASELINE.json input_hint).

Float parsing is string->float64 (then optionally ->float32), matching
the reference's atof-then-assign double rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _record_texts(batch: pa.Table, kind: str) -> pa.Array:
    """The single record-span text per document, in document order."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans)
    mask = pc.equal(pc.struct_field(flat, "kind"), kind)
    texts = pc.filter(pc.struct_field(flat, "text"), mask)
    parents = pc.filter(parent, mask)
    if len(texts) != batch.num_rows:
        raise ValueError(
            f"expected exactly one '{kind}' span per document "
            f"({len(texts)} records for {batch.num_rows} docs)"
        )
    # place record i at its document's row (parents are sorted but be exact)
    order = pc.sort_indices(parents)
    return pc.take(texts, order)


def _cols_from_split(split: pa.Array, positions: dict[str, int], dtype) -> dict[str, pa.Array]:
    out = {}
    for name, pos in positions.items():
        s = pc.list_element(split, pos)
        v = pc.cast(s, pa.float64())
        if dtype == np.float32:
            v = pc.cast(v, pa.float32())
        out[name] = v
    return out


def extract_halos(batch: pa.Table, dtype=np.float64, carry_spans: bool = False) -> pa.Table:
    """documents -> halo_id:int64, mass, x, y, z (+ doc_id/spans)."""
    texts = _record_texts(batch, "halo_record")
    split = pc.split_pattern(texts, " ")
    halo_id = pc.cast(pc.list_element(split, 0), pa.int64())
    cols = {"halo_id": halo_id}
    cols.update(_cols_from_split(split, {"mass": 2, "x": 8, "y": 9, "z": 10}, dtype))
    if carry_spans:
        cols["doc_id"] = batch.column("doc_id")
        cols["spans"] = batch.column("spans")
    return pa.table(cols)


def extract_particles(batch: pa.Table, dtype=np.float64, carry_spans: bool = False) -> pa.Table:
    """documents -> particle_id:int64 (from doc_id suffix), x, y, z."""
    texts = _record_texts(batch, "particle_record")
    split = pc.split_pattern(texts, " ")
    pid = pc.cast(
        pc.replace_substring_regex(batch.column("doc_id"), r"^part-", ""), pa.int64()
    )
    cols = {"particle_id": pid}
    cols.update(_cols_from_split(split, {"x": 0, "y": 1, "z": 2}, dtype))
    if carry_spans:
        cols["doc_id"] = batch.column("doc_id")
        cols["spans"] = batch.column("spans")
    return pa.table(cols)
