"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs via
mapInPandas. The decode kernels themselves are STUBBED in this container
(no PIL/ffmpeg available) behind a deterministic fake, clearly marked — the
Spark-side plumbing (schema, batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "doc_id bigint, media_type string, payload binary, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA_DDL = (
    "doc_id bigint, media_type string, n_bytes bigint, sha1 string, "
    "feature array<float>, decode_status string"
)

_HAVE_REAL_DECODERS = False  # no PIL/cv2/ffmpeg in this container
FEATURE_DIM = 8


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: derives FEATURE_DIM floats
    from the payload digest. Replace with PIL/librosa kernels in a container
    that ships them (gate: _HAVE_REAL_DECODERS)."""
    digest = hashlib.sha1(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + featurize media payloads with an Arrow-batched kernel.

    Real plumbing: column pruning keeps only (doc_id, media_type, payload);
    batches arrive as pandas; output schema is fixed. The decode itself is a
    deterministic fake until real codecs are present."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [
                _fake_decode_features(p if isinstance(p, (bytes, bytearray)) else b"")
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "sha1": payloads.map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "feature": feats,
                    "decode_status": "stubbed_fake"
                    if not _HAVE_REAL_DECODERS
                    else "ok",
                }
            )

    pruned = media.select("doc_id", "media_type", "payload")
    return pruned.mapInPandas(run, schema=FEATURE_SCHEMA_DDL)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: expands per-video frame indices natively
    (sequence+explode) so the decode UDF receives (payload, frame_idx) work
    units — the shuffle-free fan-out pattern for video pipelines."""
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .select("doc_id", "payload", "frame_idx")
    )
