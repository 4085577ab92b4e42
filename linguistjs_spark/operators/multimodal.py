"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels themselves are STUBS in this environment (no
image/audio libraries in the container): ``decode_image_batch`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic fake
(derived from the bytes) stands in so the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is real and tested end-to-end. A
production deployment replaces `_decode_one` with PIL/libav calls; nothing
else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int, "
    "duration_ms long"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, feat_width int, "
    "feat_height int, frame_count int, feature array<float>"
)


def _decode_one(media: bytes, media_type: str, fake: bool) -> dict:
    if not fake:
        # real decode path requires PIL / torchaudio / pyav — not available
        # in this container (environment constraint; see module docstring)
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this env; "
            "pass fake=True for the deterministic test double"
        )
    # deterministic fake: features derived from byte content only
    n = len(media or b"")
    head = (media or b"\x00")[:16]
    feat = [float(b) / 255.0 for b in head] + [0.0] * (16 - len(head))
    return {
        "n_bytes": n,
        "feat_width": (n % 64) + 1,
        "feat_height": ((n // 64) % 64) + 1,
        "frame_count": 1 if media_type == "image" else (n % 30) + 1,
        "feature": feat,
    }


def extract_media_features(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Batch shape: the iterator yields one output row per input row; Arrow
    carries the binary column in large batches, and the per-executor kernel
    is the only Python involved."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"doc_id": r.doc_id, "media_type": r.media_type,
                 **_decode_one(r.media, r.media_type, fake)}
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "feat_width",
                         "feat_height", "frame_count", "feature"],
            )

    return media_df.select("doc_id", "media", "media_type").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic binary media fixture (no external data)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 7 + j) % 256 for j in range(32 + i % 100))
        mtype = ["image", "audio", "video"][i % 3]
        rows.append((i, payload, mtype, None, None, None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
