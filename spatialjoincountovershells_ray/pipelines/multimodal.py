"""Multimodal (image/audio) stages over opaque binary/media columns.

Media payloads are treated as opaque references/bytes with typed
metadata; decode/resize/feature-extract are actor-pool ``map_batches``
stages. The actual codec libraries are NOT available in this container,
so the decode step is STUBBED: ``DecodeStub`` raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic fake feature vector from the media_ref hash — the
Ray-side plumbing (schema, batch size, actor signature, output layout)
is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spatialjoincountovershells_ray.config import default_pool

from spatialjoincountovershells_ray.functions.hashing import hash_bytes_rows, mix64

FEATURE_DIM = 16
THUMB_SUFFIX = "_thumb.png"


class MediaFeatureExtractor:
    """Actor stage: media_ref -> feature vector.

    Real implementation would open the blob (s3/lakehouse read), decode
    (PIL/libav), and run a model loaded once here in __init__. In this
    container both the codec and the model are stubbed.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "image/audio codecs are not available in this environment; "
                "construct with fake=True for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        h = hash_bytes_rows([r.encode() for r in refs])
        feats = np.empty((len(refs), FEATURE_DIM), dtype=np.float32)
        for j in range(FEATURE_DIM):
            h = mix64(h)
            feats[:, j] = (h.astype(np.float64) / 2**64).astype(np.float32)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "feature": pa.array(list(feats), pa.list_(pa.float32(), FEATURE_DIM)),
            }
        )


def media_spans(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Explode documents to one row per media span (doc_id, media_ref)."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans)
        mask = pc.equal(pc.struct_field(flat, "kind"), "media")
        refs = pc.filter(pc.struct_field(flat, "media_ref"), mask)
        parents = pc.filter(parent, mask)
        doc_ids = pc.take(batch.column("doc_id").combine_chunks() if isinstance(batch.column("doc_id"), pa.ChunkedArray) else batch.column("doc_id"), parents)
        return pa.table({"doc_id": doc_ids, "media_ref": refs})

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def media_features(docs: "ray.data.Dataset", concurrency=None) -> "ray.data.Dataset":
    """documents -> per-media-span stub features (actor pool)."""
    if concurrency is None:
        concurrency = default_pool()
    return media_spans(docs).map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
        concurrency=concurrency,
    )


class MediaDecodeStub:
    """Actor stage: (doc_id, media_ref) -> raw pixel payload + dims.

    A real implementation opens the blob and decodes with PIL/libav,
    loaded once here in ``__init__``. STUBBED (no codecs in this
    container): with ``fake=True`` it emits a deterministic pseudo-image
    whose dims and bytes derive from the media_ref hash, so downstream
    stages (resize, feature extract) exercise real variable-size binary
    payloads. Schema: doc_id, media_ref, height, width, channels,
    pixels:binary (H*W*C row-major uint8)."""

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "construct with fake=True for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        # a "_thumb" variant is the SAME underlying image re-encoded:
        # seed (and therefore dims + pixel stream) comes from the
        # canonical ref; the re-encode artifact is a deterministic
        # perturbation of the first pixel (the fake-codec analogue of
        # thumbnailing loss) so near-dup stages see true positives
        canon = [r.replace(THUMB_SUFFIX, ".png") for r in refs]
        thumb = np.array([r.endswith(THUMB_SUFFIX) for r in refs], dtype=bool)
        h0 = hash_bytes_rows([r.encode() for r in canon])
        hts = (8 + (h0 % np.uint64(9))).astype(np.int32)  # 8..16
        wds = (8 + (mix64(h0) % np.uint64(9))).astype(np.int32)
        chans = np.full(len(refs), 3, dtype=np.int32)
        # per-item loop is inherent to variable-size media decode; the
        # byte generation inside is vectorized
        pix = []
        for i, seed in enumerate(h0):
            n = int(hts[i]) * int(wds[i]) * 3
            words = mix64(np.uint64(seed) + np.arange((n + 7) // 8, dtype=np.uint64))
            raw = words.view(np.uint8)[:n]
            if thumb[i]:
                raw = raw.copy()
                raw[:3] = 255
            pix.append(raw.tobytes())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "height": pa.array(hts, pa.int32()),
                "width": pa.array(wds, pa.int32()),
                "channels": pa.array(chans, pa.int32()),
                "pixels": pa.array(pix, pa.binary()),
            }
        )


class ResizeMedia:
    """Actor stage: nearest-neighbour resize of raw uint8 images to a
    fixed (out_h, out_w). REAL implementation (pure numpy index-gather —
    no codec needed); per-row loop is inherent to variable input dims,
    the gather per row is vectorized. Output pixels are
    fixed_size_list<uint8> so downstream batches are rectangular."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        hts = batch.column("height").to_numpy()
        wds = batch.column("width").to_numpy()
        chans = batch.column("channels").to_numpy()
        pix = batch.column("pixels").to_pylist()
        oh, ow = self.out_h, self.out_w
        out = np.empty((len(pix), oh * ow * 3), dtype=np.uint8)
        for i, raw in enumerate(pix):
            h, w, c = int(hts[i]), int(wds[i]), int(chans[i])
            img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)
            # nearest-neighbour: src index = floor((dst + .5) * src/dst)
            ri = ((np.arange(oh) + 0.5) * h / oh).astype(np.int64)
            ci = ((np.arange(ow) + 0.5) * w / ow).astype(np.int64)
            out[i] = img[ri][:, ci].reshape(-1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "height": pa.array(np.full(len(pix), oh, dtype=np.int32)),
                "width": pa.array(np.full(len(pix), ow, dtype=np.int32)),
                "channels": batch.column("channels"),
                "pixels": pa.array(list(out), pa.list_(pa.uint8(), oh * ow * 3)),
            }
        )


def decode_resize(docs: "ray.data.Dataset", out_h: int = 8, out_w: int = 8,
                  concurrency=None) -> "ray.data.Dataset":
    """documents -> media spans -> decoded (stub) -> resized (real).

    Small batch sizes on the decode stage: raw pixel payloads are the
    large-binary case where batch_size × concurrency must fit the worker
    heap (a real 4k image is ~24 MB decoded — batch of 128 is already
    3 GB; keep it small and let the object store stream)."""
    if concurrency is None:
        concurrency = default_pool()
    return _decode_resize_spans(media_spans(docs), out_h, out_w, concurrency)


def _decode_resize_spans(spans: "ray.data.Dataset", out_h: int, out_w: int,
                         concurrency) -> "ray.data.Dataset":
    decoded = spans.map_batches(
        MediaDecodeStub,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        concurrency=concurrency,
    )
    return decoded.map_batches(
        ResizeMedia,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        concurrency=concurrency,
    )


def sample_frames(docs: "ray.data.Dataset", stride: int = 10) -> "ray.data.Dataset":
    """Frame sampling for video spans: every ``stride``-th frame index.

    -> (doc_id, media_ref, frame_idx). Frame *count* comes from span
    metadata (stubbed: derived from the ref hash, 1..120); the explode
    itself is the real vectorized repeat/arange pattern a frame sampler
    at scale needs (no per-row Python loop)."""

    def explode(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        h = hash_bytes_rows([r.encode() for r in refs])
        nframes = (1 + (h % np.uint64(120))).astype(np.int64)
        counts = (nframes + stride - 1) // stride
        parent = np.repeat(np.arange(len(refs), dtype=np.int64), counts)
        # frame index within each span: global arange minus each span's start
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        fidx = (np.arange(len(parent), dtype=np.int64) - starts) * stride
        doc = batch.column("doc_id").combine_chunks() if isinstance(
            batch.column("doc_id"), pa.ChunkedArray) else batch.column("doc_id")
        ref = batch.column("media_ref").combine_chunks() if isinstance(
            batch.column("media_ref"), pa.ChunkedArray) else batch.column("media_ref")
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": pc.take(doc, pa.array(parent)),
                "media_ref": pc.take(ref, pa.array(parent)),
                "frame_idx": pa.array(fidx, pa.int64()),
            }
        )

    return media_spans(docs).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


def span_audit(docs: "ray.data.Dataset", record_kinds=("halo_record", "particle_record")) -> "ray.data.Dataset":
    """-> doc_id, n_spans:int64, seq_ok:int64 — the per-document
    span-sequence integrity audit of the interleaved text+media table:
    the input contract (BASELINE.json ``input_hint``: span-sequence
    equality on kind/text/media_ref/order) made queryable.

    seq_ok = 1 iff the document matches the FIXTURES.md grammar exactly:
    four spans, kinds [text, <record>, media, text], offsets [0,1,2,3],
    media_ref non-empty on the media span and empty elsewhere, and the
    media span carrying no text. One vectorized pass over the flattened
    span arrays (list_flatten + parent indices, position = arange minus
    repeated starts) — no per-row Python; the audit an ingest job runs
    before trusting a shipped corpus snapshot."""
    import pyarrow.compute as pc

    def audit(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        doc_id = batch.column("doc_id")
        n = pc.list_value_length(spans).cast(pa.int64()).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(spans)
        kindcol = pc.struct_field(flat, "kind")
        is_text = pc.equal(kindcol, "text").to_numpy(zero_copy_only=False)
        is_media = pc.equal(kindcol, "media").to_numpy(zero_copy_only=False)
        is_record = pc.is_in(
            kindcol, value_set=pa.array(list(record_kinds))
        ).to_numpy(zero_copy_only=False)
        mref_len = pc.binary_length(pc.struct_field(flat, "media_ref")).to_numpy(zero_copy_only=False)
        text_len = pc.binary_length(pc.struct_field(flat, "text")).to_numpy(zero_copy_only=False)
        offset = pc.struct_field(flat, "offset").cast(pa.int64()).to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.cumsum(n[:-1])]).astype(np.int64) if len(n) else np.array([], np.int64)
        pos = np.arange(len(offset), dtype=np.int64) - np.repeat(starts, n)
        kind_ok = np.where(
            pos == 0,
            is_text,
            np.where(pos == 1, is_record, np.where(pos == 2, is_media, is_text)),
        )
        span_ok = (
            kind_ok
            & (offset == pos)
            & np.where(pos == 2, (mref_len > 0) & (text_len == 0), mref_len == 0)
        )
        # per-doc AND over span flags: count of ok spans equals n.
        # reduceat is undefined at empty segments / an out-of-range final
        # start (n == 0 docs); those docs fail the n == 4 test anyway, so
        # clip the starts and let the mask zero them.
        if len(span_ok):
            ok_counts = np.add.reduceat(
                span_ok.astype(np.int64), np.minimum(starts, len(span_ok) - 1)
            )
        else:
            ok_counts = np.zeros(len(n), np.int64)
        seq_ok = ((n == 4) & (ok_counts == n)).astype(np.int64)
        return pa.table(
            {
                "doc_id": doc_id,
                "n_spans": pa.array(n, pa.int64()),
                "seq_ok": pa.array(seq_ok, pa.int64()),
            }
        )

    return docs.map_batches(audit, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def media_variants(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Media spans plus one "_thumb" re-encode variant per span — the
    shape of a real corpus where the same image circulates at several
    encodes/sizes (the content-dup population a perceptual-hash dedup
    stage exists to catch). Vectorized: one replace over the ref column,
    concat, no per-row Python."""
    import pyarrow.compute as pc

    def add_variants(batch: pa.Table) -> pa.Table:
        thumbs = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": pc.replace_substring(
                    batch.column("media_ref"), ".png", THUMB_SUFFIX
                ),
            }
        )
        return pa.concat_tables([batch.select(["doc_id", "media_ref"]), thumbs])

    return media_spans(docs).map_batches(
        add_variants, batch_format="pyarrow", zero_copy_batch=True
    )


class AHash64:
    """Average-hash over 8x8-resized RGB pixels: per cell the integer
    channel sum g (0..765), bit t set iff 64*g_t > sum(g) (strict,
    integer — no float mean). The perceptual-hash family's simplest
    member; the whole stage is two numpy reductions per batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("pixels")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        flat = col.flatten().to_numpy(zero_copy_only=False).reshape(n, 64, 3)
        g = flat.astype(np.int32).sum(axis=2)  # (n, 64)
        total = g.sum(axis=1, dtype=np.int64)  # (n,)
        bits = (64 * g.astype(np.int64)) > total[:, None]
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        phash = (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        media_id = hash_bytes_rows(
            [r.encode() for r in batch.column("media_ref").to_pylist()]
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "media_id": pa.array(media_id.view(np.int64), pa.int64()),
                "phash": pa.array(phash.view(np.int64), pa.int64()),
            }
        )


def media_phash(spans: "ray.data.Dataset", concurrency=None) -> "ray.data.Dataset":
    """(doc_id, media_ref) spans -> (doc_id, media_ref, media_id, phash).

    decode (stub) -> 8x8 nearest-neighbour resize (real) -> average-hash
    (real); media_id is the 64-bit FNV-1a content address of the ref —
    the join key the pair stage emits, so pairs never carry strings
    through the exchange."""
    if concurrency is None:
        concurrency = default_pool()
    resized = _decode_resize_spans(spans, 8, 8, concurrency)
    return resized.map_batches(AHash64, batch_size=1024, concurrency=concurrency,
                               batch_format="pyarrow", zero_copy_batch=True)


def media_phash_dups(
    docs: "ray.data.Dataset",
    hamming_max: int = 5,
    nbands: int = 8,
    max_group: int = 4096,
) -> "ray.data.Dataset":
    """-> id_a, id_b, hamming — EXACT perceptual near-dup pairs over the
    media-variant population: every pair of media whose average-hashes
    differ in <= hamming_max of 64 bits, found by the shared lossless
    banding plan (dedup.hamming_band_pairs — pigeonhole over
    64/nbands-bit bands, xor+popcount verify inside band buckets). ids
    are the FNV-1a content addresses from media_phash. 8-bit bands +
    threshold 5 is the demo parameterization for the fixture's
    orig/thumb variants; a 100-TB corpus wants nbands=4 (16-bit bands)
    so band-group sizes stay sub-quadratic — the max_group guard refuses
    degenerate groups either way."""
    from spatialjoincountovershells_ray.pipelines.dedup import hamming_band_pairs

    hashes = media_phash(media_variants(docs))
    return hamming_band_pairs(
        hashes, "media_id", "phash", hamming_max, nbands, max_group
    )
