"""Text-analysis operators over the documents table.

Training-data pipeline stages (no reference counterpart — engine
extensions): token counting, quality feature counts, heuristic language
ID, and document fingerprinting. All per-batch work is Arrow/RE2
vectorized (functions.text); fingerprinting is a per-row rolling hash
(short docs, cold path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.functions import text as T


def token_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id, n_tokens:int64 (whitespace \\S+ tokens)."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": T.token_count(batch.column("text"))}
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id + integer char-class features (exact, ratio-free)."""

    def fn(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": batch.column("doc_id")}
        cols.update(T.char_class_counts(batch.column("text")))
        return pa.table(cols)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lang_id(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id, lang_pred:string (stopword-count argmax heuristic)."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(T.lang_predict(batch.column("text"))),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fingerprints(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id, fp:int64 (rolling polynomial hash mod 2^61-1)."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": T.rolling_fingerprint_col(batch.column("text")),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id, norm_text:string — ASCII-whitespace runs collapsed to
    one space, lowercased. The standard cleaning stage ahead of dedup /
    shingling; both pyarrow and DuckDB run RE2, so the SQL twin
    (lower(regexp_replace(text, '[ \\t\\n\\r\\x0b\\x0c]+', ' ', 'g')))
    is byte-exact."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.replace_substring_regex(
            batch.column("text"), r"[ \t\n\r\x0b\x0c]+", " "
        )
        return pa.table({"doc_id": batch.column("doc_id"), "norm_text": pc.utf8_lower(t)})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
