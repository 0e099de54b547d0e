"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed through Arrow-batched kernels.

The decode/feature steps are STUBBED (no image/audio libraries in this
container — see ``NotImplementedError`` markers and the deterministic fake
used by tests); the Spark-side plumbing is real: schemas, mapInPandas batch
shape, partition sizing, and the pattern for wiring a real decoder in
(replace ``_fake_decode`` with PIL/torchaudio calls — batch shapes are
already what those APIs want).

This mirrors how the reference treats model inference as an opaque batch UDF
(AbsEmbedder.encode, abc/inference/AbsEmbedder.py:243-298): Spark handles
partitioning/batching; the kernel sees one bounded pandas batch at a time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, sha256 string, feature array<float>"

FEATURE_DIM = 16


def synth_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                mimes[kind],
                bytearray(payload),
                64 if kind != "audio" else None,
                64 if kind != "audio" else None,
                1000 + i if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _real_decode(kind: str, payload: bytes):
    """Wire point for actual decoders. PIL.Image.open(BytesIO(payload)),
    torchaudio.load(...), etc. — not available in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; tests exercise the deterministic fake below"
    )


def _fake_decode(kind: str, payload: bytes) -> np.ndarray:
    """Deterministic stand-in: a FEATURE_DIM float vector derived from the
    payload digest — keeps every downstream shape/contract real."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / np.float32(65535.0)


def extract_features(
    media: DataFrame, use_real_decoder: bool = False, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction: binary payload → fixed-dim vector +
    integrity sha. The batch shape (pandas DataFrame of payload bytes) is
    exactly what a PIL/torchaudio/ffmpeg kernel consumes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, nbytes = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                nbytes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
                vec = (
                    _real_decode(kind, b)
                    if use_real_decoder
                    else _fake_decode(kind, b)
                )
                feats.append([float(x) for x in vec])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "sha256": shas,
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    timestamps (JVM-side sequence — the real decoder would seek to these).
    → (media_id, frame_ts_ms)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
