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

__all__ = [
    "attach_binary_payload",
    "decode_features",
    "resize_images",
    "sample_frames",
    "DECODE_SCHEMA",
    "RESIZE_SCHEMA",
    "FRAME_SCHEMA",
]

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


RESIZE_SCHEMA = "doc_id bigint, out_bytes bigint, width int, height int, checksum bigint"


def resize_images(df: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """Resize stub: 1→1 payload transform with new metadata.

    A real resize decodes, scales, and re-encodes per batch (PIL /
    libvips); the stub truncates the payload to the target pixel budget
    so outputs stay verifiable. Same narrow Arrow-batched plan either
    way.
    """
    budget = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            resized = batch["payload"].map(lambda b: b[:budget])
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "out_bytes": resized.map(len),
                    "width": width,
                    "height": height,
                    "checksum": resized.map(lambda b: int(sum(b[:16]))),
                }
            )

    return df.mapInPandas(resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_checksum bigint"


def sample_frames(df: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling stub: 1→N row expansion per video payload.

    Emits every ``stride``-th frame of each payload's declared
    ``n_frames`` (the stub derives frame count and per-frame bytes from
    the payload arithmetically). The 1→N batch shape — one input row
    yielding a variable number of output rows — is exactly what a real
    ffmpeg frame extractor produces through this same ``mapInPandas``
    signature.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n = len(payload)
                if n == 0:
                    continue
                n_frames = n % 30 + 1
                step = n // n_frames
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(int(payload[i * step]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)
