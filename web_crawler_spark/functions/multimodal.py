"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
``mapInPandas`` feature extraction — while the actual codec decode is stubbed
(PIL/librosa/ffmpeg are not in this container): ``decode_image`` raises
``NotImplementedError`` unless PIL is importable, and the feature extractor
falls back to a deterministic payload-derived pseudo-feature so the pipeline
is testable end-to-end.

Container-format sniffing (PNG/RIFF/mp4 magic bytes) is JVM-side over the
binary column — no Python for the cheap classification path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # decode stack is optional; absent in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MAGIC_HEX = {
    "image": "89504E470D0A1A0A",  # PNG
    "audio": "52494646",  # RIFF/WAV
    "video": "0000001866747970",  # ISO BMFF ftyp
}


def kind_from_magic(payload) -> "F.Column":
    """JVM-side container sniff on the first payload bytes."""
    head16 = F.hex(F.expr("substring(payload, 1, 8)"))
    return (
        F.when(head16.startswith(MAGIC_HEX["image"]), F.lit("image"))
        .when(head16.startswith(MAGIC_HEX["audio"]), F.lit("audio"))
        .when(head16.startswith(MAGIC_HEX["video"]), F.lit("video"))
        .otherwise(F.lit("unknown"))
    )


def decode_image(payload: bytes):
    """Real decode — requires PIL; STUB in this environment."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; install pillow on the cluster image"
        )
    import io

    return Image.open(io.BytesIO(payload))


FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic payload-derived pseudo-embedding standing in for the
    decoder output: byte-histogram moments over FEATURE_DIM buckets.  Shape
    and dtype match what a real extractor would emit, so downstream ANN /
    clustering plumbing is exercised for real."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    buckets = np.array_split(arr, FEATURE_DIM) if len(arr) >= FEATURE_DIM else [arr] * FEATURE_DIM
    return np.array([float(b.mean()) if len(b) else 0.0 for b in buckets])


def extract_features(media: DataFrame, use_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.  With
    ``use_decoder=True`` (cluster image with codecs) each payload is decoded
    for real; here the deterministic fallback keeps the batch shape honest."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                if use_decoder:
                    img = decode_image(bytes(payload))  # NotImplementedError here
                    feats.append(np.asarray(img, dtype=np.float64).mean(axis=(0, 1)).tolist())
                else:
                    feats.append(_fake_feature(bytes(payload)).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else None),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sniff_kinds(media: DataFrame) -> DataFrame:
    return media.select(
        "media_id", kind_from_magic(F.col("payload")).alias("kind_sniffed")
    )
