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

    from spatialjoincountovershells_ray.functions.text import text_hash128
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

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
        pair = pc.binary_join_element_wise(
            g.column("source").combine_chunks() if isinstance(g.column("source"), pa.ChunkedArray) else g.column("source"),
            g.column("term").combine_chunks() if isinstance(g.column("term"), pa.ChunkedArray) else g.column("term"),
            "\x1f",
        )
        h1, _ = text_hash128(pair)
        return pa.table(
            {
                "source": g.column("source"),
                "term": g.column("term"),
                "n": g.column("n"),
                "h": h1,
            }
        )

    def _rank_topk(tbl: pa.Table, cut: int, with_rnk: bool) -> pa.Table:
        """(source, term, n) -> per-source (count DESC, term ASC) top-cut,
        fully vectorized: term/source strings fold to bucket-local
        lexicographic dictionary ranks, one lexsort + run-length rank."""
        src, term = tbl.column("source"), tbl.column("term")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        n = tbl.column("n").to_numpy()

        def lexranks(col):
            enc = pc.dictionary_encode(col)
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dic = enc.dictionary
            sidx = pc.sort_indices(dic).to_numpy(zero_copy_only=False).astype(np.int64)
            rank_of = np.empty(len(dic), np.int64)
            rank_of[sidx] = np.arange(len(dic), dtype=np.int64)
            return rank_of[codes]

        sr, tr = lexranks(src), lexranks(term)
        o = np.lexsort((tr, -n, sr))
        srs = sr[o]
        starts = np.flatnonzero(np.r_[True, srs[1:] != srs[:-1]])
        runlen = np.diff(np.r_[starts, len(srs)])
        rnk = np.arange(len(srs), dtype=np.int64) - np.repeat(starts, runlen) + 1
        keep = rnk <= cut
        idx = pa.array(o[keep], pa.int64())
        cols = {
            "source": src.take(idx),
            "term": term.take(idx),
            "n": pa.array(n[o[keep]].astype(np.int64), pa.int64()),
        }
        if with_rnk:
            cols["rnk"] = pa.array(rnk[keep], pa.int64())
        return pa.table(cols)

    def bucket_merge(tbl: pa.Table) -> pa.Table:
        """Merge a bucket's (source, term) partial counts (pairs are
        whole here — hashed to one bucket) and prune to the bucket-local
        per-source top-k: the global per-source top-k is a subset of the
        per-bucket winners, so the fold sees O(sources x k x buckets)."""
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return empty
        g = (
            tbl.select(["source", "term", "n"])
            .group_by(["source", "term"])
            .aggregate([("n", "sum")])
        )
        g = pa.table(
            {
                "source": g.column("source"),
                "term": g.column("term"),
                "n": g.column("n_sum").cast(pa.int64()),
            }
        )
        return _rank_topk(g, k, with_rnk=False)

    @ray.remote
    def fold(*tbls: pa.Table) -> pa.Table:
        ne = [t for t in tbls if t.num_rows]
        if not ne:
            return tbls[0]
        t = pa.concat_tables(ne, promote_options="none")
        out = _rank_topk(t, k, with_rnk=True)
        return out.sort_by([("source", "ascending"), ("rnk", "ascending")])

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    pruned = keyed_partition_apply(parts, "h", bucket_merge)
    refs = pruned.materialize().to_arrow_refs()
    if not refs:  # zero-block input: fold(*[]) would IndexError
        return pruned
    return ray.data.from_arrow_refs([fold.remote(*refs)])


# BPE-style pre-tokenizer (GPT-2 shape, RE2-compatible: no lookahead):
# contraction suffixes, space-prefixed letter/digit/punct runs, whitespace
# runs. pyarrow and DuckDB both run RE2, so match counts are identical.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


def bpe_token_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id, n_bpe_tokens:int64 — GPT-2-style pre-tokenizer segment
    count (the piece count a BPE tokenizer would start merging from; the
    standard budget estimate when the merge table itself isn't loaded).
    Map-only, one RE2 pass per batch."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(batch.column("text"), BPE_PRETOKEN_RE),
                    pa.int64(),
                ),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def doc_repetition(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Gopher-style repetition quality features:
    -> doc_id, n_tokens, n_distinct, max_reps, dup_chars (all int64).

    ``max_reps`` = occurrences of the most-repeated token; ``dup_chars`` =
    total characters inside tokens that occur more than once (the exact
    integer numerator of the "fraction of characters in duplicated words"
    repetition filter — ratio-free so the SQL twin hashes bit-for-bit).

    Map-only: every doc is a single row, so each batch computes its docs
    completely — tokenize vectorized (Arrow RE2 split + flatten/parent),
    one Arrow group_by per (doc, token), one per-doc reduction. No
    shuffle; at 100 TB this is embarrassingly parallel."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = pc.filter(flat, keep)
        parent = pc.filter(parent, keep)
        tc = (
            pa.table(
                {
                    "doc_id": pc.take(batch.column("doc_id"), parent),
                    "tok": flat,
                    "len": pc.cast(pc.utf8_length(flat), pa.int64()),
                }
            )
            .group_by(["doc_id", "tok"])
            .aggregate([("len", "count"), ("len", "max")])
        )
        c = tc.column("len_count").to_numpy().astype(np.int64)
        ln = tc.column("len_max").to_numpy()
        per_tok = pa.table(
            {
                "doc_id": tc.column("doc_id"),
                "c": c,
                "dc": np.where(c > 1, c * ln, 0).astype(np.int64),
            }
        )
        g = per_tok.group_by("doc_id").aggregate(
            [("c", "sum"), ("c", "count"), ("c", "max"), ("dc", "sum")]
        )
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "n_tokens": pc.cast(g.column("c_sum"), pa.int64()),
                "n_distinct": pc.cast(g.column("c_count"), pa.int64()),
                "max_reps": pc.cast(g.column("c_max"), pa.int64()),
                "dup_chars": pc.cast(g.column("dc_sum"), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_term(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id, term, tf, df:int64, score:float64 — each document's
    highest-TF-IDF term (score = tf * n_docs / df as float64; ties to the
    lexically smallest term).

    Three composed stages, each already 100-TB-shaped:
    1. map-side TF: every doc is one row, so per-batch Arrow group_by
       yields exact (doc, term, tf) — no shuffle;
    2. DF: per-batch partials -> one small groupby over the vocabulary,
       then a broadcast equi-join back onto the TF rows (the df table is
       O(vocab), the classic broadcast-side);
    3. per-doc argmax through the keyed bucket exchange (one vectorized
       sort + drop-duplicates pass per bucket).
    The score double is exact both sides: tf*n_docs is an exact int64
    that both numpy and the SQL twin divide by df in one IEEE float64 op.
    """
    import pyarrow.compute as pc

    from spatialjoincountovershells_ray.pipelines.join import equi_join
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    n_docs = docs.count()

    def tf_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        t = (
            pa.table(
                {
                    "doc_id": pc.take(batch.column("doc_id"), pc.filter(parent, keep)),
                    "term": pc.filter(flat, keep),
                }
            )
            .group_by(["doc_id", "term"])
            .aggregate([([], "count_all")])
        )
        t = t.rename_columns(["tf" if c == "count_all" else c for c in t.column_names])
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "term": t.column("term"),
                "tf": pc.cast(t.column("tf"), pa.int64()),
            }
        )

    tf = docs.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True)

    def df_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["term"]).group_by("term").aggregate([([], "count_all")])
        return t.rename_columns(["df" if c == "count_all" else c for c in t.column_names])

    df_tbl = (
        tf.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .sum("df")
        .map_batches(
            lambda b: pa.table(
                {"term": b.column("term"), "df": pc.cast(b.column("sum(df)"), pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    joined = equi_join(tf, df_tbl, "term", "term", mode="broadcast")

    def argmax_kernel(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        g = tbl.to_pandas()
        score = (g["tf"].to_numpy() * np.int64(n_docs)).astype(np.float64) / g[
            "df"
        ].to_numpy()
        g = g.assign(score=score).sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True], kind="mergesort"
        )
        g = g.drop_duplicates("doc_id", keep="first")
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": g["doc_id"].to_numpy(),
                    "term": g["term"].to_numpy(),
                    "tf": g["tf"].to_numpy().astype(np.int64),
                    "df": g["df"].to_numpy().astype(np.int64),
                    "score": g["score"].to_numpy(),
                }
            ),
            preserve_index=False,
        )

    return keyed_partition_apply(joined, "doc_id", argmax_kernel)


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


def build_postings(
    docs: "ray.data.Dataset", df_lo: int = 2, df_hi: int = 100
) -> "ray.data.Dataset":
    """-> term, doc_id:int64, df:int64 — the inverted-index posting pairs
    of every term whose document frequency lies in [df_lo, df_hi] (the
    mid-frequency band an index builder keeps: df < lo is noise, df > hi
    is a stopword whose posting list would dominate the output).

    Plan: each batch tokenizes vectorized and emits its DISTINCT
    (term, doc_id) pairs (a document lives in exactly one batch, so
    per-batch dedup IS per-document dedup) keyed by a term content hash;
    one bucket exchange brings each term's complete posting list to its
    bucket, where ONE dictionary-encode + lexsort + run-length pass
    computes every term's df and applies the band filter — the round-4
    vectorized-finish contract (the previous per-term map_groups was a
    Python callback per vocabulary entry)."""
    import pyarrow.compute as pc

    from spatialjoincountovershells_ray.functions.text import text_hash128
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        doc = batch.column("doc_id").take(pc.filter(parent, keep))
        t = pa.table({"term": pc.filter(flat, keep), "doc_id": doc})
        g = t.group_by(["term", "doc_id"]).aggregate([])
        tcol = g.column("term")
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        h1, _ = text_hash128(tcol)
        return pa.table({"term": tcol, "doc_id": g.column("doc_id"), "h": h1})

    def band_kernel(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return empty
        tcol = tbl.column("term")
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        codes = pc.dictionary_encode(tcol).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc = tbl.column("doc_id").to_numpy()
        o = np.lexsort((doc, codes))
        cs, ds_ = codes[o], doc[o]
        # cross-batch (term, doc) dedup (a doc lives in one batch, but be
        # exact anyway), then run lengths = df per term
        uniq = np.r_[True, (cs[1:] != cs[:-1]) | (ds_[1:] != ds_[:-1])]
        keep_rows = o[uniq]
        cs, ds_ = cs[uniq], ds_[uniq]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        runlen = np.diff(np.r_[starts, len(cs)])
        df_per_row = np.repeat(runlen, runlen)
        band = (df_per_row >= df_lo) & (df_per_row <= df_hi)
        idx = pa.array(keep_rows[band], pa.int64())
        return pa.table(
            {
                "term": tcol.take(idx),
                "doc_id": pa.array(ds_[band], pa.int64()),
                "df": pa.array(df_per_row[band].astype(np.int64), pa.int64()),
            }
        )

    parts = docs.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return keyed_partition_apply(parts, "h", band_kernel)


def _ws_term_table(batch: pa.Table) -> pa.Table:
    """-> term (one row per non-empty whitespace token of the batch)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    return pa.table({"term": pc.filter(flat, pc.not_equal(flat, ""))})


def _ws_bigram_table(batch: pa.Table) -> pa.Table:
    """-> term (one row per ADJACENT token pair "a b", empties filtered
    BEFORE pairing — the same adjacency list_filter-then-zip SQL sees)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = pc.filter(flat, keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = pc.filter(parent, keep)
    if isinstance(parent, pa.ChunkedArray):
        parent = parent.combine_chunks()
    n = len(flat)
    if n < 2:
        return pa.table({"term": pa.array([], pa.string())})
    a, b = flat.slice(0, n - 1), flat.slice(1, n - 1)
    same_doc = pc.equal(parent.slice(0, n - 1), parent.slice(1, n - 1))
    return pa.table(
        {
            "term": pc.binary_join_element_wise(
                pc.filter(a, same_doc), pc.filter(b, same_doc), " "
            )
        }
    )


def _concat_group(parts, keys: list, sum_col: str) -> pa.Table:
    """Concat partial tables and sum ``sum_col`` per ``keys`` (Arrow C++
    group_by; for BOUNDED summaries merged in one task)."""
    live = [t for t in parts if t.num_rows]
    if not live:
        return pa.table(
            {**{k: pa.array([], pa.string()) for k in keys}, sum_col: pa.array([], pa.int64())}
        )
    t = pa.concat_tables(live, promote_options="none")
    g = t.group_by(keys).aggregate([(sum_col, "sum")])
    return pa.table(
        {**{k: g.column(k) for k in keys}, sum_col: g.column(f"{sum_col}_sum").cast(pa.int64())}
    )


@ray.remote
def _concat_group_sum(keys: list, sum_col: str, *parts: pa.Table) -> pa.Table:
    return _concat_group(parts, keys, sum_col)


def heavy_hitter_terms(
    docs: "ray.data.Dataset", phi: float = 0.01, k: int | None = None, *, terms_of=None
) -> "ray.data.Dataset":
    """-> term, n:int64 — the EXACT set of terms whose global count is
    >= phi * (total tokens), via the two-pass Misra-Gries pattern.

    Pass 1 (candidate generation): each batch tokenizes vectorized,
    counts its own vocabulary exactly, then compresses to a Misra-Gries
    summary of at most k counters (subtract the (k+1)-th largest count
    from every counter, keep the positives). MG summaries are mergeable
    (Agarwal et al., "Mergeable Summaries", PODS'12): every decrement of
    d removes >= (k+1)*d token-counts, so across all batches the total
    undercount of any term is <= N/(k+1). With k >= ceil(2/phi) - 1 the
    undercount is <= (phi/2)*N, so every true phi-heavy term survives
    the merged-summary filter mg_n >= (phi/2)*N — and because mg_n never
    overcounts, at most 2/phi candidates survive. The exchange carries
    <= k counter rows per batch, never the corpus vocabulary.

    Pass 2 (exact verify): the bounded candidate list broadcasts in the
    task closure; one more streaming pass counts ONLY candidate terms
    (pc.is_in) with per-batch pre-aggregation, and the final filter
    n >= phi*N is exact — the result is identical to the full
    GROUP-BY-HAVING, at the cost of two bounded-exchange passes instead
    of one vocabulary-wide shuffle."""
    import pyarrow.compute as pc

    if k is None:
        k = max(1, int(np.ceil(2.0 / phi)) - 1)
    tf = terms_of or _ws_term_table

    def mg_partial(batch: pa.Table) -> pa.Table:
        t = tf(batch)
        g = t.group_by("term").aggregate([([], "count_all")])
        terms = g.column("term").to_numpy(zero_copy_only=False)
        n = g.column("count_all").to_numpy()
        total = int(n.sum())
        if len(n) > k:
            d = np.partition(n, len(n) - k - 1)[len(n) - k - 1]
            keep = n > d
            terms, n = terms[keep], n[keep] - d
        # the sentinel "" (impossible as a token: empties are filtered)
        # carries the batch's exact token total to the same exchange
        return pa.table(
            {
                "term": pa.array(np.concatenate([terms, [""]])),
                "n": pa.array(np.concatenate([n, [total]]), pa.int64()),
            }
        )

    # merge the <= batches * (k+1) counter rows in ONE remote task (the
    # summary is bounded by construction — a Dataset groupby here paid
    # ~1.5 s of all-to-all fixed overhead to merge a few thousand rows),
    # then fetch only the merged summary driver-side as before
    mg_refs = list(
        docs.select_columns(["text"])
        .map_batches(mg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
        .to_arrow_refs()
    )
    merged = ray.get(_concat_group_sum.remote(["term"], "n", *mg_refs)).to_pandas()
    total = int(merged.loc[merged["term"] == "", "n"].sum())
    cand = merged[(merged["term"] != "") & (merged["n"] >= 0.5 * phi * total)]
    cand_terms = pa.array(sorted(cand["term"].tolist()), pa.string())

    def count_candidates(batch: pa.Table) -> pa.Table:
        t = tf(batch)
        hits = t.filter(pc.is_in(t.column("term"), value_set=cand_terms))
        g = hits.group_by("term").aggregate([([], "count_all")])
        return pa.table({"term": g.column("term"), "n": g.column("count_all").cast(pa.int64())})

    exact_refs = list(
        docs.select_columns(["text"])
        .map_batches(count_candidates, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
        .to_arrow_refs()
    )

    @ray.remote
    def finish(*parts: pa.Table) -> pa.Table:
        t = _concat_group(parts, ["term"], "n")
        n = t.column("n").to_numpy()
        keep = n >= phi * total  # same double product the SQL HAVING computes
        return pa.table(
            {"term": t.column("term").filter(pa.array(keep)), "n": pa.array(n[keep], pa.int64())}
        ).sort_by("term")

    # the candidate-count partials are <= candidates * batches rows — the
    # same bounded summary the broadcast already assumes fits one task
    return ray.data.from_arrow_refs([finish.remote(*exact_refs)])


def heavy_hitter_bigrams(
    docs: "ray.data.Dataset", phi: float = 0.001, k: int | None = None
) -> "ray.data.Dataset":
    """-> term ("a b"), n:int64 — EXACT phi-frequent ADJACENT token
    pairs: the bigram language-model count table, thresholded so the
    output is bounded (<= 1/phi rows) no matter how large the pair
    vocabulary grows. Same two-pass Misra-Gries plan as
    heavy_hitter_terms — the O(vocab^2) bigram space is exactly where
    the bounded-summary pattern earns its keep, since a vocabulary-wide
    GROUP BY on pairs is quadratically worse than on terms."""
    return heavy_hitter_terms(docs, phi=phi, k=k, terms_of=_ws_bigram_table)


def source_vocab(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> source, n_terms:int64 — exact distinct-token count per source
    (vocabulary richness). Two-level distinct: each batch dedups its own
    (source, term) pairs, a bucket exchange keyed on the pair hash
    finishes the global dedup in-bucket, and each bucket emits O(sources)
    count rows merged by one remote task — the standard exact
    COUNT(DISTINCT) GROUP BY decomposition (hll_registers_grouped is the
    sketched sibling)."""
    import pyarrow.compute as pc

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        src = batch.column("source").take(pc.filter(parent, keep))
        t = pa.table({"source": src, "term": pc.filter(flat, keep)})
        return t.group_by(["source", "term"]).aggregate([])

    def pairs_keyed(batch: pa.Table) -> pa.Table:
        t = pairs(batch)
        import pyarrow.compute as _pc

        joined = _pc.binary_join_element_wise(t.column("source"), t.column("term"), "\x1f")
        return t.append_column("k", pa.array(T.rolling_fingerprint_col(joined), pa.int64()))

    # co-locate (source, term) pairs by hash of the pair string so the
    # global distinct happens inside buckets (one bucket exchange instead
    # of two string-keyed Dataset groupbys); each bucket emits O(sources)
    # rows, merged + sorted by one remote task
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "source" not in tbl.schema.names:
            return pa.table({"source": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        d = tbl.select(["source", "term"]).group_by(["source", "term"]).aggregate([])
        g = d.select(["source"]).group_by("source").aggregate([([], "count_all")])
        return g.rename_columns(["source", "n"])

    per_bucket = keyed_partition_apply(
        docs.select_columns(["source", "text"]).map_batches(
            pairs_keyed, batch_format="pyarrow", zero_copy_batch=True
        ),
        "k",
        bucket,
    )
    refs = list(per_bucket.materialize().to_arrow_refs())

    @ray.remote
    def finish(*parts: pa.Table) -> pa.Table:
        t = _concat_group(parts, ["source"], "n")
        return pa.table(
            {"source": t.column("source"), "n_terms": t.column("n")}
        ).sort_by("source")

    return ray.data.from_arrow_refs([finish.remote(*refs)])


def source_diversity(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> source, n_tokens, n_terms, sum_sq (all int64) — exact unigram
    diversity statistics per source: token total N, distinct-term count,
    and the collision mass sum(c^2) over term counts c. The three
    integers determine the collision (Renyi-2) entropy
    -ln(sum_sq / N^2) and the Gini-Simpson index exactly, with no float
    leaving the engine — the domain-diversity screen a mixture-weighting
    stage (curation.mixture_sample) reads before assigning rates.

    Plan: per-batch (source, term) partial counts (each batch's exchange
    row count is its own vocabulary, never its token count), one
    (source, term) groupby to finish the counts, then a per-batch
    combiner folds each block's share of (N, terms, sum c^2) so the final
    exchange is O(sources x blocks). c fits int64 by the corpus contract
    (a single term under 3e9 occurrences per source keeps c^2 in range;
    the combiner asserts it)."""
    import pyarrow.compute as pc

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        src = batch.column("source").take(pc.filter(parent, keep))
        t = pa.table({"source": src, "term": pc.filter(flat, keep)})
        g = t.group_by(["source", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "term", "n"])

    counts = (
        docs.select_columns(["source", "text"])
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "term"])
        .sum("n")
    )

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n)").to_numpy()
        if n.size and int(n.max(initial=0)) >= 3_000_000_000:
            raise ValueError("source_diversity: term count would overflow c^2 in int64")
        t = pa.table(
            {
                "source": batch.column("source"),
                "n_tokens": pa.array(n, pa.int64()),
                "n_terms": pa.array(np.ones(len(n), np.int64), pa.int64()),
                "sum_sq": pa.array(n * n, pa.int64()),
            }
        )
        return t.group_by("source").aggregate(
            [("n_tokens", "sum"), ("n_terms", "sum"), ("sum_sq", "sum")]
        ).rename_columns(["source", "n_tokens", "n_terms", "sum_sq"])

    agg = (
        counts.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .sum(["n_tokens", "n_terms", "sum_sq"])
    )

    def final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "n_tokens": batch.column("sum(n_tokens)").cast(pa.int64()),
                "n_terms": batch.column("sum(n_terms)").cast(pa.int64()),
                "sum_sq": batch.column("sum(sum_sq)").cast(pa.int64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True).sort("source")


def source_minhash(docs: "ray.data.Dataset", num_perm: int = 16) -> "ray.data.Dataset":
    """-> source, perm, minhash (int64) — the per-domain MinHash
    signature table: for permutation p, min over the domain's tokens of
    mix64(fnv1a(token) + p) >> 1. Two signatures' match rate estimates
    the token-set Jaccard between domains (:func:`source_similarity`) —
    the corpus-level diversity diagnostic a mixture-weighting stage
    reads, at O(sources x num_perm) rows instead of a vocabulary
    exchange.

    MIN is fully decomposable: each batch folds its tokens to one
    candidate row per (source, perm) via a sort + minimum.reduceat, so
    the exchange carries O(batches x sources x num_perm) 24-byte rows,
    never tokens. The >> 1 keeps values in non-negative int64 so the
    engine's uint64 min and the SQL twin's HUGEINT min agree."""
    import pyarrow.compute as pc

    from spatialjoincountovershells_ray.functions.hashing import mix64

    def partial(batch: pa.Table) -> pa.Table:
        hv, row_of, _ = T.segmented_token_hashes(batch.column("text"))
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        idx = enc.indices.to_numpy()[row_of] if len(hv) else np.empty(0, np.int64)
        uniq = enc.dictionary
        order = np.argsort(idx, kind="stable")
        hs, ix = hv[order], idx[order]
        starts = np.flatnonzero(np.r_[True, ix[1:] != ix[:-1]]) if len(ix) else np.array([], np.int64)
        seg_src = ix[starts]
        out_src, out_perm, out_min = [], [], []
        for p in range(num_perm):
            with np.errstate(over="ignore"):
                hp = mix64(hs + np.uint64(p)) >> np.uint64(1)
            mins = np.minimum.reduceat(hp, starts) if len(starts) else hp[:0]
            out_src.append(seg_src)
            out_perm.append(np.full(len(starts), p, dtype=np.int64))
            out_min.append(mins.view(np.int64))
        if not len(starts):
            return pa.table(
                {
                    "source": pa.array([], uniq.type),
                    "perm": pa.array([], pa.int64()),
                    "m": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "source": uniq.take(pa.array(np.concatenate(out_src))),
                "perm": pa.array(np.concatenate(out_perm), pa.int64()),
                "m": pa.array(np.concatenate(out_min), pa.int64()),
            }
        )

    agg = (
        docs.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "perm"])
        .min("m")
    )

    def final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "perm": batch.column("perm"),
                "minhash": batch.column("min(m)").cast(pa.int64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["source", "perm"]
    )


def source_similarity(docs: "ray.data.Dataset", num_perm: int = 16) -> "ray.data.Dataset":
    """-> src_a, src_b, n_match:int64 — the pairwise domain-similarity
    matrix: for each unordered source pair, how many of the num_perm
    MinHash slots agree (n_match / num_perm estimates token-set
    Jaccard). Derived from :func:`source_minhash`; the signature table
    is O(sources x num_perm) rows, so the pair fold runs in one task on
    one coalesced block — the legitimately-small final stage."""
    sig = source_minhash(docs, num_perm)

    def pairs(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_numpy(zero_copy_only=False)
        perm = batch.column("perm").to_numpy()
        mh = batch.column("minhash").to_numpy()
        order = np.lexsort((perm, src))
        src, perm, mh = src[order], perm[order], mh[order]
        uniq, starts = np.unique(src, return_index=True)
        k = len(uniq)
        # dense [k, num_perm] grid (each source has exactly num_perm rows)
        grid = mh.reshape(k, -1)
        ia, ib = np.triu_indices(k, 1)
        n_match = (grid[ia] == grid[ib]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "src_a": pa.array(uniq[ia]),
                "src_b": pa.array(uniq[ib]),
                "n_match": pa.array(n_match, pa.int64()),
            }
        )

    return sig.repartition(1).map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).sort(["src_a", "src_b"])


def bm25_topk(
    docs: "ray.data.Dataset",
    query_terms: list[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> "ray.data.Dataset":
    """-> doc_id, score:double, rnk:int64 — the k documents ranked
    highest by Okapi BM25 for a bag of query terms (the canonical
    inverted-index retrieval scorer; build_postings/tfidf_top_term are
    the index/feature siblings, this is the end-to-end search surface).

    Two streaming passes. Pass 1 folds corpus statistics map-side —
    per-batch (doc count, token count, per-query-term document
    frequency) — so the exchange is O(batches x terms) int64 rows; idf
    and avgdl derive on the driver from a handful of integers. Pass 2
    re-streams the corpus: token hashes per batch (the shared FNV
    kernel), one vectorized equality scan per query term for tf, the
    BM25 saturation formula per candidate doc, then a per-batch partial
    top-k so the final exact selection sorts O(batches x k) rows in one
    task. Ties break by doc_id ascending; only docs matching >= 1 term
    are candidates. Scores are float64 (ln in idf) — the correctness
    gate is rows-only, the pytest oracle replays the identical
    arithmetic single-process and matches exactly."""
    from spatialjoincountovershells_ray.functions.hashing import hash_bytes_rows

    qh = hash_bytes_rows(np.array([t.encode() for t in query_terms], dtype=object))

    def stats(batch: pa.Table) -> pa.Table:
        hv, row_of, tok_counts = T.segmented_token_hashes(batch.column("text"))
        n = batch.num_rows
        dfs = np.empty(len(qh), np.int64)
        for i, h in enumerate(qh):
            rows = np.unique(row_of[hv == h])
            dfs[i] = len(rows)
        return pa.table(
            {
                "term_idx": pa.array(
                    np.r_[np.arange(len(qh), dtype=np.int64), [-1], [-2]], pa.int64()
                ),
                "n": pa.array(np.r_[dfs, [n], [int(tok_counts.sum())]], pa.int64()),
            }
        )

    folded = (
        docs.select_columns(["text"])
        .map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term_idx")
        .sum("n")
        .take_all()
    )  # len(query_terms) + 2 rows — never the corpus
    agg = {int(r["term_idx"]): int(r["sum(n)"]) for r in folded}
    ndocs, ntoks = agg[-1], agg[-2]
    avgdl = ntoks / max(ndocs, 1)
    idf = np.array(
        [
            np.log((ndocs - agg.get(i, 0) + 0.5) / (agg.get(i, 0) + 0.5) + 1.0)
            for i in range(len(qh))
        ]
    )

    def score(batch: pa.Table) -> pa.Table:
        hv, row_of, tok_counts = T.segmented_token_hashes(batch.column("text"))
        ids = batch.column("doc_id").to_numpy()
        n = len(ids)
        dl = tok_counts.astype(np.float64)
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(n, np.float64)
        for i, h in enumerate(qh):
            tf = np.bincount(row_of[hv == h], minlength=n).astype(np.float64)
            s += idf[i] * tf * (k1 + 1.0) / (tf + denom_base)
        cand = np.nonzero(s > 0)[0]
        if len(cand) > k:  # partial top-k bounds the exchange
            keep = np.argpartition(-s[cand], k - 1)[:k]
            cand = cand[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids[cand], pa.int64()),
                "score": pa.array(s[cand], pa.float64()),
            }
        )

    cands = docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )

    def select(batch: pa.Table) -> pa.Table:
        sc = batch.column("score").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        order = np.lexsort((ids, -sc))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(sc[order], pa.float64()),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
            }
        )

    return cands.repartition(1).map_batches(
        select, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def term_cooccurrence(
    docs: "ray.data.Dataset", df_lo: int = 2, df_hi: int = 1_000_000
) -> "ray.data.Dataset":
    """-> term_a, term_b, n_docs:int64 — document co-occurrence counts
    (the collocation / PMI-numerator table) for every unordered pair of
    band-qualified terms, counting each document once per pair.

    Two passes. Pass 1 computes document frequencies (per-batch distinct
    (term, doc) — a doc lives in one batch, so batch-dedup IS doc-dedup —
    then one term groupby) and broadcasts the df-band vocabulary; the
    band is the scale knob exactly as in build_postings — it bounds both
    the broadcast and the quadratic per-doc pair blowup (df > hi are
    stopwords whose pair lists would dominate everything). Pass 2
    re-streams the corpus: each batch dedups its (doc, term) pairs,
    filters to the vocabulary, SELF-JOINS on doc_id inside the batch
    (pyarrow's C++ hash join — no Python pair loop), keeps term_a <
    term_b and pre-counts, so the exchange carries per-batch pair
    counts, never per-document pair lists."""
    import pyarrow.compute as pc

    def doc_terms(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        doc = batch.column("doc_id").take(pc.filter(parent, keep))
        t = pa.table({"term": pc.filter(flat, keep), "doc_id": doc})
        return t.group_by(["term", "doc_id"]).aggregate([])

    # pass-1 document frequencies through the bucket exchange keyed on
    # the term hash, with the df band applied IN the bucket kernel: only
    # band survivors (the documented scale knob) are ever collected; the
    # full corpus vocabulary never lands anywhere whole
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def doc_terms_keyed(batch: pa.Table) -> pa.Table:
        t = doc_terms(batch)
        return t.append_column(
            "k", pa.array(T.rolling_fingerprint_col(t.column("term")), pa.int64())
        )

    def df_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "term" not in tbl.schema.names:
            return pa.table({"term": pa.array([], pa.string())})
        # rows are per-batch-distinct (term, doc) pairs and a doc lives in
        # one batch, so the row count per term IS its document frequency
        g = tbl.select(["term"]).group_by("term").aggregate([([], "count_all")])
        n = g.column("count_all").to_numpy()
        keep = (n >= df_lo) & (n <= df_hi)
        return pa.table({"term": g.column("term").filter(pa.array(keep))})

    vocab_blocks = keyed_partition_apply(
        docs.select_columns(["doc_id", "text"]).map_batches(
            doc_terms_keyed, batch_format="pyarrow", zero_copy_batch=True
        ),
        "k",
        df_bucket,
    )

    @ray.remote
    def collect_vocab(*parts: pa.Table) -> pa.Array:
        live = [t.column("term") for t in parts if t.num_rows]
        if not live:
            return pa.array([], pa.string())
        return pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in live]
        ).sort()

    v_refs = list(vocab_blocks.materialize().to_arrow_refs())
    vocab_ref = (
        collect_vocab.remote(*v_refs) if v_refs else ray.put(pa.array([], pa.string()))
    )

    def pair_counts(batch: pa.Table, vocab_ref) -> pa.Table:
        # list-wrapped ref: resolved worker-side from the local object
        # store (zero-copy after the first fetch) — the band vocabulary
        # never routes through the driver
        vocab_arr = ray.get(vocab_ref[0])
        t = doc_terms(batch)
        t = t.filter(pc.is_in(t.column("term"), value_set=vocab_arr))
        j = t.join(t, keys=["doc_id"], join_type="inner", right_suffix="_b")
        j = j.filter(pc.less(j.column("term"), j.column("term_b")))
        g = j.group_by(["term", "term_b"]).aggregate([([], "count_all")])
        return g.rename_columns(["term_a", "term_b", "n_docs"])

    pair_refs = list(
        docs.select_columns(["doc_id", "text"])
        .map_batches(
            pair_counts,
            fn_kwargs={"vocab_ref": [vocab_ref]},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
        .to_arrow_refs()
    )

    @ray.remote
    def finish(*parts: pa.Table) -> pa.Table:
        # bounded by the band vocabulary squared — the same contract the
        # vocabulary broadcast already assumes
        t = _concat_group(parts, ["term_a", "term_b"], "n_docs")
        return t.sort_by([("term_a", "ascending"), ("term_b", "ascending")])

    return ray.data.from_arrow_refs([finish.remote(*pair_refs)])


def _gram_tf(batch: pa.Table) -> pa.Table:
    """One doc batch -> exact (k, gram, doc, tf) word-3-gram term
    frequencies; k is the gram's routing hash (collisions harmless — the
    pair kernel groups by the gram STRING, the hash only co-locates)."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "gram": pa.array([], pa.string()),
            "doc": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
        }
    )
    toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    f = flat.filter(keep)
    if isinstance(f, pa.ChunkedArray):
        f = f.combine_chunks()
    p = parent.filter(keep).to_numpy()
    n = len(f)
    if n < 3:
        return empty
    g = pc.binary_join_element_wise(
        f.slice(0, n - 2), f.slice(1, n - 2), f.slice(2, n - 2), " "
    )
    valid = p[: n - 2] == p[2:]
    gram = g.filter(pa.array(valid))
    doc = batch.column("doc_id").take(pa.array(p[: n - 2][valid]))
    t = pa.table({"gram": gram, "doc": doc})
    tf = t.group_by(["gram", "doc"]).aggregate([([], "count_all")])
    data, off = T.string_bytes(tf.column("gram"))
    h = T.hash_byte_spans(data, off[:-1], np.diff(off).astype(np.int64))
    return pa.table(
        {
            "k": pa.array(h.astype(np.int64) & 0x7FFFFFFFFFFFFFFF, pa.int64()),
            "gram": tf.column("gram"),
            "doc": tf.column("doc").cast(pa.int64()),
            "tf": tf.column("count_all").cast(pa.int64()),
        }
    )


def doc_pair_ngram_dot(
    docs: "ray.data.Dataset", df_cap: int = 64, min_dot: int = 2
) -> "ray.data.Dataset":
    """-> doc_a, doc_b, dot:int64 — EXACT word-3-gram term-frequency dot
    product of every document pair sharing at least one 3-gram with
    document frequency <= ``df_cap``, kept when dot >= ``min_dot``;
    sorted by (doc_a, doc_b).

    The inverted-index all-pairs similarity plan (Bayardo et al.'s
    term-at-a-time shape): tf triples are built map-side per batch (each
    doc is whole inside one row, so tf is complete without an exchange),
    routed by gram hash so every gram's postings land in ONE bucket —
    global df is then an in-bucket run length, grams over the cap are
    pruned THERE (the stop-word bound, mirrored exactly in the twin's
    df filter), and each surviving posting list of length d emits its
    triu pairs per length class in one gather. A second pair-key
    exchange folds partial dots. The exchanges carry (hash, gram, doc,
    tf) postings and 16-byte pair partials, never text; pair volume is
    the documented O(sum_{df<=cap} df^2) inverted-index bound, not
    O(docs^2). Integer tf dots keep both sides bit-exact; feed the dot
    with the per-doc norms from :func:`token_counts`-style aggregates
    for cosine."""
    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def pair_kernel(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"pair": pa.array([], pa.int64()), "dot": pa.array([], pa.int64())})
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return empty
        codes = tbl.column("gram").combine_chunks().dictionary_encode().indices.to_numpy()
        doc = tbl.column("doc").to_numpy()
        tf = tbl.column("tf").to_numpy()
        if len(doc) and (int(doc.min()) < 0 or int(doc.max()) >= 2**31):
            raise ValueError("doc_pair_ngram_dot packs doc pairs as 31-bit ids")
        order = np.lexsort((doc, codes))
        c, dc, tc = codes[order], doc[order], tf[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        lens = np.diff(np.r_[starts, len(c)])
        pairs, dots = [], []
        for d in np.unique(lens):
            if d < 2 or d > df_cap:
                continue
            rows = starts[lens == d]
            dm = dc[rows[:, None] + np.arange(int(d))]
            tm = tc[rows[:, None] + np.arange(int(d))]
            iu, ju = np.triu_indices(int(d), 1)
            pairs.append((dm[:, iu].ravel() << 32) | dm[:, ju].ravel())
            dots.append((tm[:, iu] * tm[:, ju]).ravel())
        if not pairs:
            return empty
        pk = np.concatenate(pairs)
        dv = np.concatenate(dots)
        u, inv = np.unique(pk, return_inverse=True)
        acc = np.zeros(len(u), np.int64)
        np.add.at(acc, inv, dv)
        return pa.table({"pair": pa.array(u, pa.int64()), "dot": pa.array(acc, pa.int64())})

    def fold(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return empty
        pk = tbl.column("pair").to_numpy()
        dv = tbl.column("dot").to_numpy()
        order = np.argsort(pk, kind="stable")
        pk, dv = pk[order], dv[order]
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        tot = np.add.reduceat(dv, starts)
        keep = tot >= min_dot
        u = pk[starts][keep]
        return pa.table(
            {
                "doc_a": pa.array(u >> 32, pa.int64()),
                "doc_b": pa.array(u & 0xFFFFFFFF, pa.int64()),
                "dot": pa.array(tot[keep], pa.int64()),
            }
        )

    tfds = docs.select_columns(["doc_id", "text"]).map_batches(
        _gram_tf, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = keyed_partition_apply(tfds, "k", pair_kernel)
    return keyed_partition_apply(partials, "pair", fold).sort(["doc_a", "doc_b"])


def doc_chunks(
    docs: "ray.data.Dataset", size: int = 128, stride: int = 96
) -> "ray.data.Dataset":
    """-> doc_id, chunk_id:int64, chunk_start:int64, chunk:string — fixed-
    size overlapping character chunks (the context-window chunking stage
    of an embedding/RAG ingest pipeline; engine extension, no reference
    counterpart).

    Chunk i of a document covers characters [i*stride, i*stride+size);
    chunks are emitted while i*stride < length(text), so the tail chunk
    may be shorter and zero-length documents emit nothing — exactly the
    rows of the ``unnest(range(0, length(text), stride)) + substr`` SQL
    twin.

    Physical plan: pure map — each batch loops over chunk LEVELS (a few
    iterations, bounded by ceil(max_doc_len/stride)), not rows; level i
    filters docs long enough and slices them with one vectorized
    ``utf8_slice_codeunits`` kernel. No exchange, no driver state; at
    100 TB this is a single streaming pass whose output is ~len/stride ×
    the input and flows straight to the consumer with backpressure.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("doc_chunks: size and stride must be positive")
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        doc_id = batch.column("doc_id")
        nchars = pc.utf8_length(text)
        parts = []
        i = 0
        while True:
            start = i * stride
            mask = pc.greater(nchars, start)
            if not pc.any(mask).as_py():
                break
            sub_ids = pc.filter(doc_id, mask)
            sub_txt = pc.filter(text, mask)
            chunk = pc.utf8_slice_codeunits(sub_txt, start=start, stop=start + size)
            n = len(sub_ids)
            parts.append(
                pa.table(
                    {
                        "doc_id": sub_ids,
                        "chunk_id": pa.array(np.full(n, i, np.int64)),
                        "chunk_start": pa.array(np.full(n, start, np.int64)),
                        "chunk": chunk,
                    }
                )
            )
            i += 1
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk_start": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(parts)

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def lm_bigram_score(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id, n_bigrams, sum_count, n_hapax (all int64, sorted by
    doc_id) — the CCNet-style "train an n-gram LM on the corpus, score
    every document against it" quality filter, reduced to exact integer
    statistics: for each document, the number of positional word bigrams,
    the sum over those bigram occurrences of the CORPUS-WIDE count of
    that bigram (the integer numerator of the average bigram
    probability), and how many of its bigram occurrences are corpus
    hapaxes (count == 1 — the doc is the only place the transition
    occurs; a high hapax share flags gibberish, a high sum_count share
    flags boilerplate). Train and score are ONE pass each over the
    corpus and the model is never collected anywhere whole.

    Plan: per-batch positional-bigram extraction (Arrow split +
    list_parent_indices; adjacency = consecutive flat slots with the
    same parent), pre-aggregated to (doc_id, gram, cnt) rows; ONE bucket
    exchange keyed on the gram hash co-locates every occurrence of a
    bigram, so each bucket computes its grams' corpus totals AND joins
    them back to the per-doc rows locally (train + score in the same
    kernel — the model shard never leaves its bucket); buckets emit
    O(docs-per-bucket) partial triples, finished by a doc_id-keyed
    exchange unioned with a zero row per document so docs with < 2
    tokens survive the left-join semantics."""
    import pyarrow.compute as pc

    from spatialjoincountovershells_ray.pipelines.window import keyed_partition_apply

    def doc_bigrams(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = pc.filter(flat, keep).combine_chunks() if isinstance(flat, pa.ChunkedArray) else pc.filter(flat, keep)
        par = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
        if len(par) < 2:
            t = pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        else:
            adj = par[1:] == par[:-1]
            idx = np.flatnonzero(adj)
            w1 = flat.take(pa.array(idx, pa.int64()))
            w2 = flat.take(pa.array(idx + 1, pa.int64()))
            gram = pc.binary_join_element_wise(w1, w2, "\x1f")
            doc = batch.column("doc_id").take(pa.array(par[idx], pa.int64()))
            t = (
                pa.table({"doc_id": doc, "gram": gram})
                .group_by(["doc_id", "gram"])
                .aggregate([([], "count_all")])
                .rename_columns(["doc_id", "gram", "cnt"])
            )
        return t.append_column(
            "k", pa.array(T.rolling_fingerprint_col(t.column("gram")), pa.int64())
        )

    def score_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "sum_count": pa.array([], pa.int64()),
                "n_hapax": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0 or "gram" not in tbl.schema.names:
            return empty
        # a bigram lives wholly inside this bucket: totals here ARE the
        # corpus counts; join them straight back to the per-doc rows
        totals = (
            tbl.select(["gram", "cnt"])
            .group_by("gram")
            .aggregate([("cnt", "sum")])
            .rename_columns(["gram", "total"])
        )
        j = tbl.select(["doc_id", "gram", "cnt"]).join(totals, keys=["gram"])
        cnt = j.column("cnt").to_numpy(zero_copy_only=False)
        tot = j.column("total").to_numpy(zero_copy_only=False)
        scored = pa.table(
            {
                "doc_id": j.column("doc_id"),
                "n_bigrams": pa.array(cnt, pa.int64()),
                "sum_count": pa.array(cnt * tot, pa.int64()),
                "n_hapax": pa.array(np.where(tot == 1, cnt, 0).astype(np.int64), pa.int64()),
            }
        )
        g = scored.group_by("doc_id").aggregate(
            [("n_bigrams", "sum"), ("sum_count", "sum"), ("n_hapax", "sum")]
        )
        return g.rename_columns(["doc_id", "n_bigrams", "sum_count", "n_hapax"])

    keyed = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_bigrams, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = keyed_partition_apply(keyed, "k", score_bucket)

    # zero partial per document: docs with < 2 tokens produce no bigram
    # rows anywhere, yet must appear in the output (left-join semantics)
    def zero_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_bigrams": z, "sum_count": z, "n_hapax": z}
        )

    zeros = docs.select_columns(["doc_id"]).map_batches(
        zero_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "doc_id" not in tbl.schema.names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "sum_count": pa.array([], pa.int64()),
                    "n_hapax": pa.array([], pa.int64()),
                }
            )
        g = tbl.select(["doc_id", "n_bigrams", "sum_count", "n_hapax"]).group_by(
            "doc_id"
        ).aggregate([("n_bigrams", "sum"), ("sum_count", "sum"), ("n_hapax", "sum")])
        return g.rename_columns(["doc_id", "n_bigrams", "sum_count", "n_hapax"]).sort_by(
            "doc_id"
        )

    both = partials.union(zeros)

    def tag_doc(batch: pa.Table) -> pa.Table:
        return batch.append_column("k2", batch.column("doc_id"))

    tagged = both.map_batches(tag_doc, batch_format="pyarrow", zero_copy_batch=True)
    return keyed_partition_apply(tagged, "k2", merge_bucket).sort("doc_id")


def redact_patterns(
    docs: "ray.data.Dataset", patterns: "list[tuple[str, str, str]]"
) -> "ray.data.Dataset":
    """-> doc_id, n_<name>:int64 per pattern, fp:int64 — sequential
    regex redaction (the PII-scrub stage of a curation pipeline): for
    each (name, regex, replacement) in order, count non-overlapping
    matches in the CURRENT text, then replace them, so later patterns
    see earlier redactions (the auditable semantics a compliance scrub
    needs). fp is the rolling fingerprint of the fully redacted text —
    the cheap equality witness for the scrubbed corpus. Map-only, RE2
    vectorized, one pass; the redacted text itself stays worker-side
    (emit it instead of fp when feeding a sink)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        red = batch.column("text")
        cols: dict = {"doc_id": batch.column("doc_id")}
        for name, pat, repl in patterns:
            cols[f"n_{name}"] = pc.cast(pc.count_substring_regex(red, pat), pa.int64())
            red = pc.replace_substring_regex(red, pat, repl)
        cols["fp"] = pa.array(T.rolling_fingerprint_col(red), pa.int64())
        return pa.table(cols)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def char_diversity(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> doc_id, n_chars:int64, n_distinct:int64, sumsq:int64 — the
    exact Simpson repetitiveness statistics per document: sumsq is the
    sum of squared per-character counts (collision mass; sumsq/n^2 is
    the repeated-char probability — a boilerplate/repetition quality
    signal), n_distinct the distinct-character count. Pure map: one
    flat bincount over (row * 256 + byte) per batch, no exchange.
    ASCII contract (the fixture corpus): chars == utf-8 bytes, which the
    SQL twin relies on."""
    import numpy as np

    from spatialjoincountovershells_ray.functions.text import string_bytes

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        data, off = string_bytes(col)
        nd = len(off) - 1
        lens = np.diff(off)
        row = np.repeat(np.arange(nd, dtype=np.int64), lens)
        span = data[off[0] : off[-1]].astype(np.int64)
        c = np.bincount(row * 256 + span, minlength=nd * 256).reshape(nd, 256)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(lens.astype(np.int64), pa.int64()),
                "n_distinct": pa.array((c > 0).sum(axis=1).astype(np.int64), pa.int64()),
                "sumsq": pa.array((c * c).sum(axis=1).astype(np.int64), pa.int64()),
            }
        )

    # explicit batch_size: the nd x 256 int64 bincount is ~2 KB/row of
    # transient heap, so cap the rows per task instead of inheriting
    # Ray's (much larger) default batch (geo_angular_hist's pattern)
    return docs.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=8192
    )
