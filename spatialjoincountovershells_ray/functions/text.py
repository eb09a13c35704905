"""Vectorized text-analysis kernels (Arrow-native where possible).

These are the per-batch building blocks of the training-data text
operators (language ID, quality counts, token counting, shingling,
fingerprinting). Regex kernels use RE2 semantics on both sides of the
correctness gate (pyarrow.compute here, DuckDB regexp_* in the oracle),
so counts match exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
# tiny stopword families for the 3-way heuristic language ID; word-bounded
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "de": r"\b(der|die|und|das|ist|nicht)\b",
    "fr": r"\b(le|la|et|les|est|des)\b",
}
LANG_ORDER = ("en", "de", "fr")  # deterministic tie-break: first wins


def token_count(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count = number of \\S+ matches (int64)."""
    return pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())


def char_class_counts(text: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Integer quality features: total/alpha/digit/punct/space counts."""
    return {
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_alpha": pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64()),
        "n_digit": pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64()),
        "n_punct": pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.int64()),
        "n_space": pc.cast(pc.count_substring_regex(text, r" "), pa.int64()),
    }


def lang_scores(text: pa.ChunkedArray | pa.Array) -> dict[str, np.ndarray]:
    """Per-language stopword hit counts (lower-cased, word-bounded)."""
    lowered = pc.utf8_lower(text)
    return {
        lang: pc.count_substring_regex(lowered, pat).to_numpy(zero_copy_only=False).astype(np.int64)
        for lang, pat in LANG_STOPWORDS.items()
    }


def lang_predict(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """argmax language with ties resolved in LANG_ORDER (>= comparison
    scanning left to right — same rule the SQL oracle's CASE encodes)."""
    scores = lang_scores(text)
    n = len(scores[LANG_ORDER[0]])
    best = np.full(n, LANG_ORDER[-1], dtype=object)
    best_score = scores[LANG_ORDER[-1]].copy()
    for lang in reversed(LANG_ORDER[:-1]):
        s = scores[lang]
        take = s >= best_score
        best[take] = lang
        best_score = np.where(take, s, best_score)
    return best.astype(str)


def char_shingles(text: str, k: int) -> set[str]:
    """k-character shingle set of one document (deduplicated)."""
    if len(text) < k:
        return {text} if text else set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def word_ngrams(text: str, n: int) -> set[str]:
    """word n-gram set (whitespace tokens)."""
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def rolling_fingerprint(texts: list[str]) -> np.ndarray:
    """Per-document polynomial rolling hash mod 2^61-1 (int64 >= 0).

    Deterministic document fingerprint; base 1315423911, Horner order over
    UTF-8 bytes.
    """
    MOD = (1 << 61) - 1
    BASE = 1315423911 % MOD
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = 0
        for byte in t.encode("utf-8"):
            h = (h * BASE + byte) % MOD
        out[i] = h
    return out
