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
