"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns with typed metadata, exactly
the shape of the interleaved-documents media spans. The Spark-side
plumbing — schemas, partitioning, Arrow batch shape, UDF signatures — is
real and tested; the actual codec calls are STUBBED behind
``_HAS_CODECS`` (image/audio libraries are not available in this
container) with a deterministic fake so pipelines are testable
end-to-end. Swap ``_fake_decode`` for PIL/torchaudio calls in a real
deployment; nothing else changes.

Scale notes: all operators are ``mapInArrow`` over pre-partitioned media
rows — narrow, no shuffle; batch size bounded by
spark.sql.execution.arrow.maxRecordsPerBatch × payload size, so size
``maxPartitionBytes`` for the fat binary column accordingly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

try:  # real codecs are optional; the container ships none
    import PIL.Image  # noqa: F401
    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False

MEDIA_META_DDL = ("media_ref string, media_type string, width int, "
                  "height int, n_bytes long, content_digest string")

FEATURES_DDL = ("media_ref string, feature array<float>, n_frames int")


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: pretend dimensions
    derived from a stable digest. Replace with a real codec call."""
    d = hashlib.sha256(payload).digest()
    return 64 + d[0] % 1024, 64 + d[1] % 1024


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """(media_ref, payload) → typed metadata row per asset."""
    def batches(it):
        for batch in it:
            refs = batch.column("media_ref").to_pylist()
            payloads = batch.column("payload").to_pylist()
            rows = {"media_ref": [], "media_type": [], "width": [],
                    "height": [], "n_bytes": [], "content_digest": []}
            for r, p in zip(refs, payloads):
                if _HAS_CODECS:
                    raise NotImplementedError(
                        "wire a real codec here (PIL.Image.open)")
                w, h = _fake_decode(bytes(p))
                rows["media_ref"].append(r)
                rows["media_type"].append("image/unknown")
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_bytes"].append(len(p))
                rows["content_digest"].append(
                    hashlib.sha256(bytes(p)).hexdigest())
            yield pa.RecordBatch.from_pydict({
                "media_ref": pa.array(rows["media_ref"], pa.string()),
                "media_type": pa.array(rows["media_type"], pa.string()),
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
                "content_digest": pa.array(rows["content_digest"],
                                           pa.string()),
            })
    return media.mapInArrow(batches, MEDIA_META_DDL)


def extract_media_features(media: DataFrame, *, dim: int = 16) -> DataFrame:
    """(media_ref, payload) → fixed-dim float feature vector per asset
    (deterministic digest-derived fake; a real model inference UDF has
    the identical signature and batch shape)."""
    def batches(it):
        for batch in it:
            refs = batch.column("media_ref").to_pylist()
            payloads = batch.column("payload").to_pylist()
            feats = np.empty((len(refs), dim), dtype=np.float32)
            frames = np.empty(len(refs), dtype=np.int32)
            for i, p in enumerate(payloads):
                d = hashlib.sha256(bytes(p)).digest()
                feats[i] = (np.frombuffer((d * ((4 * dim) // len(d) + 1))
                                          [:4 * dim], dtype=np.uint32)
                            .astype(np.float32) / np.float32(2 ** 32))
                frames[i] = 1 + d[2] % 16
            yield pa.RecordBatch.from_arrays([
                pa.array(refs, pa.string()),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), dim).cast(
                        pa.list_(pa.float32())),
                pa.array(frames, pa.int32()),
            ], names=["media_ref", "feature", "n_frames"])
    return media.mapInArrow(batches, FEATURES_DDL)
