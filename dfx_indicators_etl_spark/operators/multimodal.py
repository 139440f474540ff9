"""Multimodal column plumbing (SURVEY §2.C).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side machinery here is real and tested — schema,
Arrow batch shape, ``mapInPandas`` partition streaming — while the
codec itself is a deterministic stub (media libraries are not in this
container). Swapping ``_decode_stub_batch`` for a real decoder (PIL /
ffmpeg / torchaudio) changes nothing about the plan: decode stays an
embarrassingly-parallel narrow transform over Arrow record batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_binary_payload", "decode_features", "DECODE_SCHEMA"]

# Output schema of the decode step: id + typed media metadata.
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, "
    "n_frames int, checksum bigint"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the
    text stand in for encoded media) plus declared media metadata."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_stub_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode over Arrow batches.

    A real decoder would open ``payload`` with a media library here.
    The stub derives metadata arithmetically from the bytes so results
    are verifiable; raising NotImplementedError for unknown media
    types marks the genuine codec boundary.
    """
    for batch in batches:
        if not (batch["media_type"] == "image/fake").all():
            raise NotImplementedError(
                "real media codecs are not available in this environment"
            )
        n = batch["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": n,
                "width": (n % 640).astype("int32"),
                "height": (n * 7 % 480).astype("int32"),
                "n_frames": (n % 30 + 1).astype("int32"),
                "checksum": batch["payload"].map(lambda b: int(sum(b[:16]))),
            }
        )


def decode_features(df: DataFrame) -> DataFrame:
    """Decode/feature-extract media payloads via ``mapInPandas``.

    Narrow (no shuffle), Arrow-batched, partition-parallel — the shape
    a 100 TB media decode actually needs; only the per-batch Python
    body is a stub.
    """
    return df.mapInPandas(_decode_stub_batch, schema=DECODE_SCHEMA)
