"""Multimodal-column plumbing (beyond-reference scope).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side contract — schema, partitioning, Arrow batch
shape through ``mapInPandas`` — is real and tested; the actual media
decode is STUBBED (this container has no image/audio libs): pass
``fake_decode=True`` for a deterministic fake, otherwise the decode step
raises ``NotImplementedError`` where a real libjpeg/ffmpeg call belongs.
(Checked round 4: no PIL/Pillow wheel is available offline and installs
are disallowed, so the real branch stays gated; wiring it is a one-line
swap of the fake block for ``PIL.Image.open(io.BytesIO(b))`` etc.)

Scale notes: mapInPandas streams Arrow batches, so per-executor memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
corpus size; binary payloads never pass through a shuffle here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "RESIZED_SCHEMA",
    "FRAME_SCHEMA",
    "attach_media",
    "extract_features",
    "resize_images",
    "sample_frames",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature_hash", LongType(), True),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def attach_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic fake media column set from an id column —
    stands in for reading a real (id, payload) media table."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col(id_col) % 3 + 1).cast("int")).alias("kind"),
        F.unhex(F.sha2(F.col(id_col).cast("string"), 256)).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    The real decode (PIL / ffmpeg frame sampling / torchaudio resample)
    plugs into ``_decode_batch``; here it is stubbed.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "media decode requires image/audio libs not in this container"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    # deterministic fake "feature": first 8 payload bytes as int
                    "feature_hash": pdf["payload"].map(
                        lambda b: int.from_bytes(b[:8], "big", signed=True) if b else 0
                    ),
                }
            )
            yield out

    return media.mapInPandas(_decode_batch, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, fake_decode: bool = True
) -> DataFrame:
    """Resize image payloads via mapInPandas. Real path: PIL decode →
    resize → re-encode inside ``_resize_batch``; here the stub emits a
    deterministic truncated payload with the target dimensions so the
    Spark-side contract (schema, batch shape, 1:1 rows) is testable."""

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if not fake_decode:
                raise NotImplementedError("image resize requires PIL, not in this container")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # stub: deterministic function of payload + target dims
                    "payload": pdf["payload"].map(
                        lambda b: b[: max(4, (width * height) % max(1, len(b) or 1))] if b else b
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(_resize_batch, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 4, fake_decode: bool = True
) -> DataFrame:
    """Sample frames from video payloads (1:N row fan-out) via
    mapInPandas. Real path: ffmpeg/pyav seek+decode; the stub emits
    ``max_frames`` deterministic byte slices so partitioning and the
    exploding row contract are real."""

    def _sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if not fake_decode:
                raise NotImplementedError("frame sampling requires ffmpeg, not in this container")
            # vectorized 1:N fan-out: repeat ids, tile frame indices
            # (same repeat/tile shape as the resize path — no iterrows)
            n = len(pdf)
            payloads = pdf["payload"].map(lambda b: b or b"")
            ids = np.repeat(pdf["media_id"].to_numpy(), max_frames)
            idxs = np.tile(np.arange(max_frames, dtype="int64"), n)
            lens = np.maximum(payloads.map(len).to_numpy(dtype="int64"), 1)
            offs = (idxs * every_n) % np.repeat(lens, max_frames)
            frames = [
                p[off : off + 8]
                for p, off in zip(np.repeat(payloads.to_numpy(), max_frames), offs)
            ]
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(_sample_batch, schema=FRAME_SCHEMA)
