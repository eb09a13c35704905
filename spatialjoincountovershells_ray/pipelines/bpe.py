"""Distributed byte-level BPE tokenizer training.

No reference counterpart (SJCS, ``/root/reference``, has no text ops);
this is the vocabulary-training stage of an LLM data pipeline
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") re-expressed for Ray:

1. **Word-frequency pass** — whitespace pre-tokenize per batch,
   per-batch ``(word, count)`` combiner, one global groupby. The
   corpus text never flows past this pass: byte-level BPE merges never
   cross the whitespace pre-token boundary, so training needs only the
   O(vocab) distinct-word table weighted by frequency (the classic
   word-type trick — a 100 TB corpus folds to its vocabulary before
   any iteration runs).
2. **Shard actors hold the word table as CSR int32 symbol arrays** —
   the documented drop-to-raw-Ray case (shared *mutable* symbol state
   advanced once per merge; Dataset blocks are immutable, so a
   map_batches plan would rewrite the whole table through the object
   store on every merge).
3. **Per merge** — each actor folds its shard to ``(packed pair,
   count)`` partials: O(distinct adjacent pairs per shard) rows, never
   the word table. The driver merges exact int64 counts, picks the
   winner under a total order (max count, then smallest packed pair
   id), and broadcasts it; actors apply a vectorized leftmost-greedy
   rewrite (overlap runs — possible only when left==right — resolved
   by even-offset selection within each run of adjacent matches).

Determinism: counts are exact integers and the tie-break is a total
order, so the learned merge list is bit-identical under any sharding
or batch layout (tests/test_bpe.py proves two shardings against a
single-process reference trainer).

ASCII contract: like ``dedup.dup_substrings``, symbols are text BYTES
and token strings are reported by decoding merged byte runs — the op
refuses non-ASCII input rather than silently splitting multi-byte
code points across ranks.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.functions.text import string_bytes

BPE_NUM_MERGES = 40
BPE_MIN_PAIR_COUNT = 2
_BYTE_VOCAB = 256


def _word_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> word:string, n:int64 — exact corpus word frequencies.

    Per-batch combiner then one global groupby: the exchange carries
    distinct words per batch, never the corpus.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), r"[ \t\n\r\x0b\x0c]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        t = pa.table({"word": pc.filter(flat, pc.not_equal(flat, ""))})
        g = t.group_by("word").aggregate([([], "count_all")])
        return pa.table(
            {"word": g.column("word"), "n": g.column("count_all").cast(pa.int64())}
        )

    agg = (
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .sum("n")
    )

    def final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"word": batch.column("word"), "n": batch.column("sum(n)").cast(pa.int64())}
        )

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


@ray.remote
class _BpeShard:
    """One shard of the word-frequency table as mutable CSR symbol state.

    ``syms`` starts as the words' raw bytes (int32 so merged ids fit);
    ``off`` is the word-boundary offset array; ``wts`` the per-word
    corpus frequency. Both hot methods are single vectorized passes.
    """

    def __init__(self, tables: list):
        # block refs arrive nested in a list, so Ray does not auto-resolve
        # them; fetch into this actor (never the driver)
        tables = [ray.get(t) if isinstance(t, ray.ObjectRef) else t for t in tables]
        datas: list[np.ndarray] = []
        offs: list[np.ndarray] = [np.zeros(1, np.int64)]
        wts: list[np.ndarray] = []
        base = 0
        for t in tables:
            if t.num_rows == 0 or t.num_columns == 0:
                continue
            data, off = string_bytes(t.column("word"))
            datas.append(data.astype(np.int32))
            offs.append(off[1:] + base)
            base += int(off[-1])
            wts.append(t.column("n").to_numpy().astype(np.int64))
        self.syms = np.concatenate(datas) if datas else np.empty(0, np.int32)
        self.off = np.concatenate(offs)
        self.wts = np.concatenate(wts) if wts else np.empty(0, np.int64)
        if len(self.syms) and int(self.syms.max()) >= 128:
            raise ValueError(
                "bpe_train is byte-level with an ASCII reporting contract; "
                "non-ASCII corpus bytes would merge across code points"
            )

    def pair_counts(self) -> tuple[np.ndarray, np.ndarray]:
        """(packed int64 pair ids, exact int64 counts) of this shard."""
        syms, off, wts = self.syms, self.off, self.wts
        if len(syms) < 2:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        lens = np.diff(off)
        # a position pairs with its successor unless it ends a word
        valid = np.ones(len(syms) - 1, dtype=bool)
        ends = off[1:][lens > 0] - 1
        valid[ends[ends < len(valid)]] = False
        wpos = np.repeat(wts, lens)[:-1]
        packed = (syms[:-1].astype(np.int64) << 32) | syms[1:].astype(np.int64)
        packed, wpos = packed[valid], wpos[valid]
        if not len(packed):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        u, inv = np.unique(packed, return_inverse=True)
        c = np.zeros(len(u), np.int64)
        np.add.at(c, inv, wpos)
        return u, c

    def apply_merge(self, left: int, right: int, new_id: int) -> None:
        """Leftmost-greedy rewrite of every (left, right) adjacency."""
        syms, off = self.syms, self.off
        if len(syms) < 2:
            return
        lens = np.diff(off)
        valid = np.ones(len(syms) - 1, dtype=bool)
        ends = off[1:][lens > 0] - 1
        valid[ends[ends < len(valid)]] = False
        m = (syms[:-1] == left) & (syms[1:] == right) & valid
        idx = np.flatnonzero(m)
        if not len(idx):
            return
        # overlapping matches (only when left == right, e.g. "aaa" under
        # (a,a)): keep even offsets within each run of adjacent matches
        # — exactly the sequential leftmost-first scan's choice
        if left == right:
            run_start = np.r_[True, np.diff(idx) != 1]
            run_first = np.repeat(idx[run_start], np.diff(np.r_[np.flatnonzero(run_start), len(idx)]))
            idx = idx[((idx - run_first) % 2) == 0]
        syms[idx] = new_id
        drop = idx + 1
        keep = np.ones(len(syms), dtype=bool)
        keep[drop] = False
        self.syms = syms[keep]
        self.off = off - np.searchsorted(drop, off, side="left")


def bpe_train(
    docs: "ray.data.Dataset",
    num_merges: int = BPE_NUM_MERGES,
    min_pair_count: int = BPE_MIN_PAIR_COUNT,
    max_actors: int = 8,
) -> "ray.data.Dataset":
    """-> rank:int32, left:string, right:string, token:string,
    pair_count:int64 — the learned merge list, in merge order.

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (weighted by word frequency).
    """
    wt = _word_counts(docs).materialize()
    refs = wt.to_arrow_refs()
    if not refs:
        actors = []
    else:
        groups: list[list] = [[] for _ in range(min(max_actors, len(refs)))]
        for i, r in enumerate(refs):
            groups[i % len(groups)].append(r)
        actors = [_BpeShard.remote(g) for g in groups]

    token_bytes: dict[int, bytes] = {i: bytes([i]) for i in range(_BYTE_VOCAB)}
    ranks, lefts, rights, tokens, counts = [], [], [], [], []
    for rank in range(num_merges):
        parts = ray.get([a.pair_counts.remote() for a in actors]) if actors else []
        pk = [p[0] for p in parts if len(p[0])]
        if not pk:
            break
        allp = np.concatenate(pk)
        allc = np.concatenate([p[1] for p in parts if len(p[0])])
        u, inv = np.unique(allp, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, allc)
        best_n = int(tot.max())
        if best_n < min_pair_count:
            break
        # total order: max count, then smallest packed pair id
        cand = u[tot == best_n]
        best = int(cand.min())
        left, right = best >> 32, best & 0xFFFFFFFF
        new_id = _BYTE_VOCAB + rank
        ray.get([a.apply_merge.remote(left, right, new_id) for a in actors])
        token_bytes[new_id] = token_bytes[left] + token_bytes[right]
        ranks.append(rank)
        lefts.append(token_bytes[left].decode("ascii"))
        rights.append(token_bytes[right].decode("ascii"))
        tokens.append(token_bytes[new_id].decode("ascii"))
        counts.append(best_n)

    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(ranks, pa.int32()),
                "left": pa.array(lefts, pa.string()),
                "right": pa.array(rights, pa.string()),
                "token": pa.array(tokens, pa.string()),
                "pair_count": pa.array(counts, pa.int64()),
            }
        )
    )


def bpe_train_reference(
    word_counts: dict[str, int],
    num_merges: int = BPE_NUM_MERGES,
    min_pair_count: int = BPE_MIN_PAIR_COUNT,
) -> list[tuple[int, str, str, str, int]]:
    """Single-process oracle: the same algorithm in plain dict/loop
    Python (leftmost-greedy rewrite, identical tie-break). Test-only.
    """
    seqs: list[list[bytes]] = []
    wts: list[int] = []
    for w, n in word_counts.items():
        b = w.encode("ascii")
        seqs.append([bytes([c]) for c in b])
        wts.append(int(n))
    out = []
    for rank in range(num_merges):
        cnt: dict[tuple[bytes, bytes], int] = {}
        for s, n in zip(seqs, wts):
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + n
        if not cnt:
            break
        best_n = max(cnt.values())
        if best_n < min_pair_count:
            break
        best = min(p for p, c in cnt.items() if c == best_n)
        merged = best[0] + best[1]
        for s in seqs:
            i, o = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    o.append(merged)
                    i += 2
                else:
                    o.append(s[i])
                    i += 1
            s[:] = o
        out.append(
            (
                rank,
                best[0].decode("ascii"),
                best[1].decode("ascii"),
                merged.decode("ascii"),
                best_n,
            )
        )
    return out


def train_doc_bpe(
    sf_dir: str,
    num_merges: int = BPE_NUM_MERGES,
    min_pair_count: int = BPE_MIN_PAIR_COUNT,
) -> "ray.data.Dataset":
    """End-to-end: documents table -> learned BPE merge list."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bpe_train(docs, num_merges=num_merges, min_pair_count=min_pair_count)
