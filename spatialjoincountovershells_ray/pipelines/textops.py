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


def top_terms_per_source(docs: "ray.data.Dataset", k: int = 5) -> "ray.data.Dataset":
    """-> source, term, n:int64, rnk:int64 — the k most frequent tokens of
    each source (ties to the lexically smallest term).

    Vocabulary-style corpus analysis done combiner-first: each batch
    tokenizes vectorized (Arrow RE2 split + list_flatten/parent_indices,
    the same byte classes as the SQL twin) and pre-counts its own
    (source, term) pairs, so the exchange carries O(sources x batch
    vocabulary) partials, never tokens; one groupby sums partials and a
    per-source reducer ranks. Terms are whitespace tokens — empty strings
    from leading/trailing separators are dropped on both sides."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        src = batch.column("source").take(pc.filter(parent, keep))
        t = pa.table({"source": src, "term": pc.filter(flat, keep)})
        g = t.group_by(["source", "term"]).aggregate([([], "count_all")])
        g = g.rename_columns(["n" if c == "count_all" else c for c in g.column_names])
        return g.select(["source", "term", "n"])

    import pandas as pd

    agg = (
        docs.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "term"])
        .sum("n")
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.rename(columns={"sum(n)": "n"})
        g = g.sort_values(["n", "term"], ascending=[False, True], kind="mergesort").head(k)
        return pd.DataFrame(
            {
                "source": g["source"].to_numpy(),
                "term": g["term"].to_numpy(),
                "n": g["n"].astype(np.int64).to_numpy(),
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return agg.groupby("source").map_groups(final, batch_format="pandas").sort(
        ["source", "rnk"]
    )


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
