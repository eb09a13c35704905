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


def string_bytes(col: "pa.ChunkedArray | pa.Array") -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (utf-8 data, int64 offsets[N+1]) view of a string column.

    The cast to large_binary only widens the offsets; the byte buffer is
    shared. Basis for the segmented (per-row, variable-length) vectorized
    kernels below — no Python-level row loop touches the text.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, off


_FNV_BASE = np.uint64(0x100000001B3)


def segmented_shingle_hashes(
    col: "pa.ChunkedArray | pa.Array", k: int
) -> tuple[np.ndarray, np.ndarray]:
    """All k-byte-shingle hashes of every row in one flat uint64 array.

    Returns ``(hashes, starts)`` with ``starts[i]:starts[i+1]`` the
    hash span of row i (CSR layout, empty rows allowed). Hash values are
    identical to the per-row scalar path (polynomial over utf-8 bytes +
    mix64; rows shorter than k hash their full byte string) so the two
    implementations are interchangeable. k fancy-index passes over the
    concatenated byte buffer — no per-row Python.
    """
    from spatialjoincountovershells_ray.functions.hashing import mix64

    data, off = string_bytes(col)
    lens = np.diff(off)
    n = len(lens)
    nsh = np.where(lens == 0, 0, np.maximum(lens - k + 1, 1))
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nsh, out=starts[1:])
    total = int(starts[-1])
    if total == 0:
        return np.empty(0, np.uint64), starts
    row_of = np.repeat(np.arange(n, dtype=np.int64), nsh)
    within = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], nsh)
    gstart = off[:-1][row_of] + within
    sh_len = np.minimum(lens[row_of], k)
    h = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        full = sh_len == k
        if full.all():
            for j in range(k):
                h = h * _FNV_BASE + data[gstart + j]
        else:
            for j in range(k):
                m = j < sh_len
                h[m] = h[m] * _FNV_BASE + data[gstart[m] + j]
        h = mix64(h)
    return h, starts


_H128_BASES = (np.uint64(0x100000001B3), np.uint64(0x9E3779B97F4A7C15))


def text_hash128(col: "pa.ChunkedArray | pa.Array") -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit polynomial hashes of each row's full byte
    string (combined: a 128-bit exact-dedup key — the shuffle then
    carries 16-byte keys instead of document bodies). Vectorized as
    byte-position passes per power-of-two length doubling: O(total_bytes
    * log(maxlen)) with no per-row Python.

    Implementation: Horner over byte columns, vectorized across rows.
    Rows are sorted by length descending so at byte position j the still-
    active rows are a contiguous prefix — each pass is a slice, not a
    mask. O(total_bytes) gathered elements in maxlen cheap passes.
    """
    from spatialjoincountovershells_ray.functions.hashing import mix64

    data, off = string_bytes(col)
    lens = np.diff(off)
    n = len(lens)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    order = np.argsort(-lens, kind="stable")
    slens = lens[order]
    soff = off[:-1][order]
    b1, b2 = _H128_BASES
    a1 = np.zeros(n, dtype=np.uint64)
    a2 = np.zeros(n, dtype=np.uint64)
    maxlen = int(slens[0])
    # rows with len > j form the prefix [0:cnt_j] of the desc-sorted order
    counts = np.searchsorted(-slens, -np.arange(1, maxlen + 1), side="right")
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            c = counts[j]
            byte = data[soff[:c] + j]
            a1[:c] = a1[:c] * b1 + byte
            a2[:c] = a2[:c] * b2 + byte
        h1 = np.zeros(n, dtype=np.uint64)
        h2 = np.zeros(n, dtype=np.uint64)
        h1[order] = a1
        h2[order] = a2
        h1 = mix64(h1 ^ lens.astype(np.uint64))
        h2 = mix64(h2 ^ (lens.astype(np.uint64) * np.uint64(0xDEADBEEF97F4A7C5)))
    return h1.view(np.int64), h2.view(np.int64)


def token_boundaries(
    data: np.ndarray, off: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """ASCII-whitespace token spans of every row of a byte-CSR column.

    Returns ``(tok_start, tlen, row_of, tok_counts)``: byte start and
    length per token, the owning row index per token (non-decreasing),
    and the per-row token count. Byte-level split identical to
    ``str.split()`` for ASCII-whitespace text (UTF-8 continuation bytes
    can never alias the space bytes); one boundary mask over the
    concatenated buffer, no per-row Python.
    """
    n = len(off) - 1
    if len(data) == 0:
        e = np.empty(0, np.int64)
        return e, e, e, np.zeros(n, np.int64)
    is_sp = (
        (data == 0x20) | (data == 0x09) | (data == 0x0A)
        | (data == 0x0D) | (data == 0x0B) | (data == 0x0C)
    )
    prev_sp = np.empty(len(data), dtype=bool)
    prev_sp[0] = True
    prev_sp[1:] = is_sp[:-1]
    next_sp = np.empty(len(data), dtype=bool)
    next_sp[-1] = True
    next_sp[:-1] = is_sp[1:]
    # row boundaries act like whitespace on both sides
    rs = off[:-1][off[:-1] < len(data)]
    prev_sp[rs] = True
    re_ = off[1:] - 1
    re_ = re_[(re_ >= 0) & (re_ < len(data))]
    next_sp[re_] = True
    tok_start = np.flatnonzero(~is_sp & prev_sp)
    tok_end = np.flatnonzero(~is_sp & next_sp)
    tlen = tok_end - tok_start + 1
    row_of = np.searchsorted(off, tok_start, side="right") - 1
    tok_counts = np.bincount(row_of, minlength=n).astype(np.int64)
    return tok_start, tlen, row_of, tok_counts


def hash_byte_spans(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a of each (start, len) span of ``data`` — vectorized Horner.

    Length-desc sort makes the spans still active at byte position j a
    contiguous prefix, so each of the maxlen passes is one fancy-index
    slice. Same value as ``hash_bytes_rows`` on the span's bytes.
    """
    t = len(starts)
    if t == 0:
        return np.empty(0, np.uint64)
    order = np.argsort(-lens, kind="stable")
    slens = lens[order]
    soff = starts[order]
    h = np.full(t, np.uint64(0xCBF29CE484222325))
    maxlen = int(slens[0])
    counts = np.searchsorted(-slens, -np.arange(1, maxlen + 1), side="right")
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            c = counts[j]
            h[:c] = (h[:c] ^ data[soff[:c] + j]) * _FNV_BASE
    out = np.empty(t, dtype=np.uint64)
    out[order] = h
    return out


def segmented_token_hashes(
    col: "pa.ChunkedArray | pa.Array",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FNV-1a hash of every ASCII-whitespace token of every row.

    Returns ``(hashes, row_of, tok_counts)``: one uint64 per token (same
    value as ``hash_bytes_rows`` on the token's utf-8 bytes), the owning
    row index per token (non-decreasing), and the per-row token count.
    Composition of :func:`token_boundaries` + :func:`hash_byte_spans` —
    no per-row Python anywhere.
    """
    data, off = string_bytes(col)
    tok_start, tlen, row_of, tok_counts = token_boundaries(data, off)
    return hash_byte_spans(data, tok_start, tlen), row_of, tok_counts


_GRAM_STEP = np.uint64(0x9E3779B97F4A7C15)  # odd → each Horner step is a bijection
_GRAM_STEP2 = np.uint64(0xC2B2AE3D27D4EB4F)  # independent second family


def gram_hashes(
    tok_hashes: np.ndarray, row_of: np.ndarray, n: int, step: np.uint64 = _GRAM_STEP
) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hash of every word n-gram (n consecutive same-row tokens).

    Returns ``(gh, gfirst)``: the combined hash and the index (into the
    token arrays) of the gram's first token. Combination is Horner over
    the n token hashes with an odd multiplier (wrapping uint64) — order
    sensitive, so 'a b c' and 'c b a' differ. One vectorized pass per
    gram position; grams never cross a row boundary.
    """
    t = len(tok_hashes)
    if t < n or n < 1:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    valid = row_of[: t - n + 1] == row_of[n - 1 :]
    gfirst = np.flatnonzero(valid)
    gh = tok_hashes[gfirst].copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            gh = gh * step + tok_hashes[gfirst + j]
    return gh, gfirst


_M61 = np.uint64((1 << 61) - 1)
_FP_BASE = np.uint64(1315423911 % ((1 << 61) - 1))


def _mulmod_m61(a: np.ndarray, b: np.uint64) -> np.ndarray:
    """(a * b) mod 2^61-1 for a < 2^61, b < 2^31, without overflow.

    Split a = hi*2^31 + lo; hi*b < 2^61 fits, and x*2^31 mod M is a bit
    rotation for the Mersenne modulus (2^61 ≡ 1 mod M).
    """
    lo = a & np.uint64((1 << 31) - 1)
    hi = a >> np.uint64(31)
    with np.errstate(over="ignore"):
        t = hi * b  # < 2^61
        rot = ((t << np.uint64(31)) & _M61) + (t >> np.uint64(30))
        s = rot + lo * b  # < 2^62 + 2^62: fits uint64
    s = (s & _M61) + (s >> np.uint64(61))
    s = np.where(s >= _M61, s - _M61, s)
    return s


def rolling_fingerprint_col(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Vectorized twin of :func:`rolling_fingerprint` over a string
    column — identical values (exact Horner mod 2^61-1), no per-row
    Python. Length-desc sorted rows; one slice pass per byte position."""
    data, off = string_bytes(col)
    lens = np.diff(off)
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(-lens, kind="stable")
    slens = lens[order]
    soff = off[:-1][order]
    h = np.zeros(n, dtype=np.uint64)
    maxlen = int(slens[0]) if n else 0
    counts = np.searchsorted(-slens, -np.arange(1, maxlen + 1), side="right")
    for j in range(maxlen):
        c = counts[j]
        h[:c] = _mulmod_m61(h[:c], _FP_BASE)
        with np.errstate(over="ignore"):
            s = h[:c] + data[soff[:c] + j]
        s = np.where(s >= _M61, s - _M61, s)
        h[:c] = s
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out.view(np.int64)


def full_shingle_positions(off: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Byte start of every k-byte shingle of every row of a byte-CSR
    column, plus the owning row per shingle. Every row MUST be >= k
    bytes (filter shorter rows first) so each shingle is full-length —
    the positional twin of :func:`segmented_shingle_hashes` on such
    input (shingle i of the combined stream starts at ``gstart[i]``).
    """
    lens = np.diff(off)
    nsh = lens - k + 1
    if (nsh <= 0).any():
        raise ValueError("full_shingle_positions requires every row >= k bytes")
    n = len(lens)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nsh, out=starts[1:])
    total = int(starts[-1])
    row_of = np.repeat(np.arange(n, dtype=np.int64), nsh)
    within = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], nsh)
    gstart = off[:-1][row_of] + within
    return gstart, row_of


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


def gram_set_csr(
    col: "pa.ChunkedArray | pa.Array", gram: str, k: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Distinct-gram CSR of a string column with EXACT integer gram ids.

    Returns ``(starts, codes, C)``: ``codes[starts[i]:starts[i+1]]`` is
    row i's deduplicated, sorted gram-id set and ``C`` the number of
    distinct grams in the column. Ids are exact — char grams are
    dictionary-encoded gram STRINGS, word grams are unique TOKEN-ID
    TUPLES (``np.unique`` over padded rows) — so two rows share an id
    iff :func:`char_shingles` / :func:`word_ngrams` would put the same
    element in both sets (no hash collisions anywhere). Short-row rules
    match the scalar sets: a non-empty row shorter than the gram yields
    one whole-row gram; an empty row yields the empty set.

    Vectorized throughout: the ASCII char path is one uniform-stride
    byte gather into a single StringArray (the dup_substrings gather,
    dedup.py); non-ASCII rows fall back to one ``utf8_slice_codeunits``
    pass per shingle position (still no per-row Python, exact codepoint
    semantics). The word path rides ``utf8_split_whitespace`` +
    ``dictionary_encode`` (the snm_pairs tokenizer).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    starts0 = np.zeros(n + 1, dtype=np.int64)
    if n == 0:
        return starts0, np.empty(0, np.int64), 0
    if gram == "word":
        row_all, codes_g, C = _word_gram_rows(col, k)
    else:
        row_all, codes_g, C = _char_gram_rows(col, k)
    if len(row_all) == 0:
        return starts0, np.empty(0, np.int64), int(C)
    o2 = np.lexsort((codes_g, row_all))
    r, c = row_all[o2], codes_g[o2]
    keep = np.r_[True, (r[1:] != r[:-1]) | (c[1:] != c[:-1])]
    r, c = r[keep], c[keep]
    sizes = np.bincount(r, minlength=n).astype(np.int64)
    np.cumsum(sizes, out=starts0[1:])
    return starts0, c, int(C)


def _char_gram_rows(col: pa.Array, k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(row_of, gram_code, C) for every char k-shingle occurrence."""
    n = len(col)
    clen = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    blen = pc.binary_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    pieces: list[pa.Array] = []
    rows: list[np.ndarray] = []
    if (clen == blen).all():
        # ASCII: bytes == codepoints — one gather builds every full shingle
        data, off = string_bytes(col)
        lens = blen
        nst = np.where(lens == 0, 0, np.maximum(lens - k + 1, 1))
        total = int(nst.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64), 0
        row_of = np.repeat(np.arange(n, dtype=np.int64), nst)
        st_cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(nst, out=st_cum[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(st_cum[:-1], nst)
        gstart = off[:-1][row_of] + within
        full = lens[row_of] >= k
        fsel = np.flatnonzero(full)
        if len(fsel):
            gs = gstart[fsel]
            byte_mat = data[gs[:, None] + np.arange(k, dtype=np.int64)]
            offs = np.arange(0, (len(fsel) + 1) * k, k, dtype=np.int64)
            arr = pa.Array.from_buffers(
                pa.large_utf8(),
                len(fsel),
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(byte_mat.tobytes())],
            )
            pieces.append(arr)
            rows.append(row_of[fsel])
        ssel = np.flatnonzero(~full)
        if len(ssel):
            sr = row_of[ssel]
            pieces.append(col.take(pa.array(sr, pa.int64())).cast(pa.large_utf8()))
            rows.append(sr)
    else:
        # exact codepoint semantics for non-ASCII text: one Arrow slice
        # kernel per shingle position over the still-active row prefix
        nst = np.where(clen == 0, 0, np.maximum(clen - k + 1, 1))
        if int(nst.sum()) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64), 0
        order = np.argsort(-nst, kind="stable")
        sarr = col.take(pa.array(order, pa.int64()))
        snst = nst[order]
        maxst = int(snst[0])
        counts = np.searchsorted(-snst, -np.arange(1, maxst + 1), side="right")
        for j in range(maxst):
            c = int(counts[j])
            if c == 0:
                break
            sl = pc.utf8_slice_codeunits(sarr.slice(0, c), start=j, stop=j + k)
            if isinstance(sl, pa.ChunkedArray):
                sl = sl.combine_chunks()
            pieces.append(sl.cast(pa.large_utf8()))
            rows.append(order[:c])
    grams = pa.concat_arrays(pieces)
    row_all = np.concatenate(rows)
    enc = pc.dictionary_encode(grams)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return row_all, codes, len(enc.dictionary)


def _word_gram_rows(col: pa.Array, gn: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(row_of, gram_code, C) for every word n-gram occurrence; gram
    identity = the token-id tuple (pad -1 for the short-row whole-doc
    gram, which can never collide with a full n-token gram)."""
    n = len(col)
    toks = pc.utf8_split_whitespace(col)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    tok_per_row = np.diff(toks.offsets.to_numpy().astype(np.int64))
    flat = toks.flatten()
    docidx = np.repeat(np.arange(n, dtype=np.int64), tok_per_row)
    if len(flat):
        codes_t = (
            pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        nz = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        docidx, codes_t = docidx[nz], codes_t[nz]
    else:
        codes_t = np.empty(0, np.int64)
    tcnt = np.bincount(docidx, minlength=n).astype(np.int64)
    tstart = np.zeros(n, dtype=np.int64)
    np.cumsum(tcnt[:-1], out=tstart[1:])
    gcnt = np.where(tcnt >= gn, tcnt - gn + 1, 0)
    tot = int(gcnt.sum())
    mats: list[np.ndarray] = []
    rows: list[np.ndarray] = []
    if tot:
        growof = np.repeat(np.arange(n, dtype=np.int64), gcnt)
        gc_cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(gcnt, out=gc_cum[1:])
        within = np.arange(tot, dtype=np.int64) - np.repeat(gc_cum[:-1], gcnt)
        gfirst = tstart[growof] + within
        mat = np.empty((tot, gn), dtype=np.int64)
        for j in range(gn):
            mat[:, j] = codes_t[gfirst + j]
        mats.append(mat)
        rows.append(growof)
    srows = np.flatnonzero((tcnt > 0) & (tcnt < gn))
    if len(srows):
        srank = np.full(n, -1, dtype=np.int64)
        srank[srows] = np.arange(len(srows), dtype=np.int64)
        pos_in_doc = np.arange(len(docidx), dtype=np.int64) - tstart[docidx]
        sel = srank[docidx] >= 0
        mat_s = np.full((len(srows), gn), -1, dtype=np.int64)
        mat_s[srank[docidx[sel]], pos_in_doc[sel]] = codes_t[sel]
        mats.append(mat_s)
        rows.append(srows)
    if not mats:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    mat_all = np.ascontiguousarray(np.vstack(mats))
    row_all = np.concatenate(rows)
    v = mat_all.view([("", np.int64)] * gn).ravel()
    uniq, inv = np.unique(v, return_inverse=True)
    return row_all, inv.astype(np.int64), len(uniq)


def pair_intersections(
    starts: np.ndarray,
    codes: np.ndarray,
    ua: np.ndarray,
    ub: np.ndarray,
    C: int,
    chunk: int = 1 << 24,
) -> np.ndarray:
    """|set(ua[p]) ∩ set(ub[p])| for every pair p over a gram CSR.

    One composite-key ``(row*C + code)`` searchsorted membership pass
    per chunk — each pair expands to its a-side set, so total work is
    Σ|S_a| fancy-indexed elements, chunked to bound peak memory. No
    per-pair Python (the snm_pairs searchsorted plan generalized to
    arbitrary pair lists).
    """
    sizes = np.diff(starts)
    nrow = len(sizes)
    P = len(ua)
    inter = np.zeros(P, dtype=np.int64)
    if P == 0 or len(codes) == 0:
        return inter
    if nrow * max(int(C), 1) >= (1 << 62):
        raise ValueError("pair_intersections composite key would overflow int64")
    Cw = np.int64(max(int(C), 1))
    key = np.repeat(np.arange(nrow, dtype=np.int64), sizes) * Cw + codes
    exp = sizes[ua]
    cum = np.cumsum(exp)
    lo = 0
    while lo < P:
        base = int(cum[lo - 1]) if lo else 0
        hi = int(np.searchsorted(cum, base + chunk, side="left")) + 1
        hi = min(max(hi, lo + 1), P)
        e = exp[lo:hi]
        tot = int(e.sum())
        if tot:
            rep = np.repeat(np.arange(hi - lo, dtype=np.int64), e)
            ec = np.zeros(hi - lo + 1, dtype=np.int64)
            np.cumsum(e, out=ec[1:])
            gidx = (
                np.repeat(starts[ua[lo:hi]], e)
                + np.arange(tot, dtype=np.int64)
                - np.repeat(ec[:-1], e)
            )
            target = ub[lo:hi][rep] * Cw + codes[gidx]
            pos = np.searchsorted(key, target)
            posc = np.minimum(pos, len(key) - 1)
            found = (pos < len(key)) & (key[posc] == target)
            if found.any():
                inter[lo:hi] += np.bincount(rep[found], minlength=hi - lo)
        lo = hi
    return inter


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


def levenshtein_csr(
    data: np.ndarray,
    off: np.ndarray,
    ia: np.ndarray,
    ib: np.ndarray,
    max_dist: int | None = None,
) -> np.ndarray:
    """Edit distance of row pairs (ia[p], ib[p]) of a byte-CSR column,
    vectorized ACROSS pairs: pairs are grouped by their (len_a, len_b)
    class (np.unique on a packed key) and each class runs one dense DP
    whose every cell update is a numpy op over the class's pair vector —
    O(len_a*len_b) vectorized steps per class, no per-pair Python.
    Standard unit-cost Levenshtein over BYTES — identical to DuckDB's
    character-based ``levenshtein()`` for ASCII input (the synthetic
    tables' contract; multi-byte text measures byte edits instead).

    With ``max_dist`` set, runs the Ukkonen band instead: only cells
    with |i - j| <= max_dist are computed (any <=max_dist path stays in
    the band since dist >= |i - j|), values saturate at max_dist + 1
    (a capped stand-in only ever produces cells > max_dist downstream,
    so true <=max_dist distances stay exact), and pairs whose running
    row minimum exceeds max_dist are finalized early and compacted out
    of the class (the DP row min is non-decreasing in i). Returns the
    exact distance where it is <= max_dist and max_dist + 1 otherwise.
    """
    P = len(ia)
    out = np.zeros(P, np.int64)
    if P == 0:
        return out
    lens = np.diff(off)
    la = lens[ia]
    lb = lens[ib]
    key = la * 1_000_000 + lb  # packed class key (lens < 1e6 by contract)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1], True])
    d = max_dist
    for s, e in zip(bounds[:-1], bounds[1:]):
        idx = order[s:e]
        na, nb = int(la[idx[0]]), int(lb[idx[0]])
        if na == 0 or nb == 0:
            out[idx] = max(na, nb)
            continue
        if d is not None and abs(na - nb) > d:
            out[idx] = d + 1  # the length gap alone exceeds the band
            continue
        sa = off[:-1][ia[idx]]
        sb = off[:-1][ib[idx]]
        A = data[sa[:, None] + np.arange(na, dtype=np.int64)]
        B = data[sb[:, None] + np.arange(nb, dtype=np.int64)]
        prev = np.tile(np.arange(nb + 1, dtype=np.int32), (len(idx), 1))
        cur = np.empty_like(prev)
        if d is None:
            for i in range(1, na + 1):
                cur[:, 0] = i
                cost = (A[:, i - 1][:, None] != B).astype(np.int32)
                for j in range(1, nb + 1):
                    cur[:, j] = np.minimum(
                        np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                        prev[:, j - 1] + cost[:, j - 1],
                    )
                prev, cur = cur, prev
            out[idx] = prev[:, nb]
            continue
        big = np.int32(d + 1)
        np.minimum(prev, big, out=prev)  # saturate row 0
        alive = np.arange(len(idx))
        t1 = np.empty(len(idx), np.int32)
        t2 = np.empty(len(idx), np.int32)
        for i in range(1, na + 1):
            lo, hi = max(1, i - d), min(nb, i + d)
            if i + d <= nb:
                prev[:, hi] = big  # outside row i-1's band: stale, truly > d
            if lo > 1:
                cur[:, lo - 1] = big  # |i - (lo-1)| = d + 1 > d
            else:
                cur[:, 0] = min(i, int(big))
            cost = (A[:, i - 1][:, None] != B[:, lo - 1 : hi]).view(np.int8)
            n = len(alive)
            w1, w2 = t1[:n], t2[:n]
            for j in range(lo, hi + 1):
                np.add(prev[:, j], 1, out=w1)
                np.add(cur[:, j - 1], 1, out=w2)
                np.minimum(w1, w2, out=w1)
                np.add(prev[:, j - 1], cost[:, j - lo], out=w2)
                np.minimum(w1, w2, out=cur[:, j])
            np.minimum(cur[:, lo : hi + 1], big, out=cur[:, lo : hi + 1])
            prev, cur = cur, prev
            if i < na:
                keep = prev[:, lo : hi + 1].min(axis=1) <= d
                nk = int(keep.sum())
                if nk == 0:
                    out[idx[alive]] = d + 1
                    alive = alive[:0]
                    break
                # compaction is a few cheap copies; pruning dead pairs
                # eagerly is what turns the band into ~O(death_row) work
                if nk < 0.9 * len(alive):
                    out[idx[alive[~keep]]] = d + 1
                    alive = alive[keep]
                    prev, cur = prev[keep], cur[keep]
                    A, B = A[keep], B[keep]
        if len(alive):
            out[idx[alive]] = prev[:, nb]
    return out
