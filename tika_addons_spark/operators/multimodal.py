"""Multimodal column plumbing: binary payloads + typed metadata.

The reference handles opaque byte payloads as first-class data (XMP packet
scans over byte streams ``xmp-scraper/.../XMPScraper.java:115-143``, base64
bugzilla attachments ``BugzillaWorker.java:441``, zip-entry feature dumps
``ZipFeatureDumper.java:142-207``). Generalized here for training pipelines:
image/audio/video as ``binary`` columns with a typed metadata struct, and
decode/feature steps as Arrow-batched ``mapInPandas``.

The actual decoders (PIL/ffmpeg/etc.) are NOT in this container — the decode
step is STUBBED: ``decode_stub=True`` computes a deterministic fake feature
(sha256-seeded vector); ``decode_stub=False`` raises NotImplementedError
at task level, documenting exactly where a real decoder plugs in. The
Spark-side plumbing — schema, batching, partitioning, UDF signature — is
real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("magic", T.StringType(), True),
    ]
)

FEATURE_DIM = 16

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
]


def sniff_media(payload: bytes | None) -> str:
    if not payload:
        return "application/octet-stream"
    for magic, mt in _MAGIC:
        if payload.startswith(magic):
            return mt
    return "application/octet-stream"


def with_media_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata struct over a binary column — pure column exprs
    (length/sha2/prefix are all JVM-side)."""
    magic_hex = F.hex(F.substring(F.col(bin_col), 1, 4))
    return df.withColumn(
        "media_meta",
        F.struct(
            F.when(magic_hex.startswith("89504E47"), "image/png")
            .when(magic_hex.startswith("FFD8FF"), "image/jpeg")
            .when(magic_hex.startswith("47494638"), "image/gif")
            .when(magic_hex.startswith("52494646"), "audio/wav")
            .otherwise("application/octet-stream")
            .alias("media_type"),
            F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(bin_col), 256).alias("sha256"),
            magic_hex.alias("magic"),
        ),
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 16 floats seeded from the
    payload digest. Replace with a real decode+embed when the image/audio
    libs are available."""
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64)
    return list(np.round(arr / 65535.0, 6))


def extract_media_features(
    df: DataFrame, bin_col: str = "payload", id_col: str = "media_id",
    decode_stub: bool = True,
) -> DataFrame:
    """Arrow-batched decode/feature-extract step (mapInPandas).

    Real decoders drop in here per batch — the batch shape (pandas DataFrame
    with a bytes column), output schema, and partitioning contract are what
    production code would keep."""

    def batch(it):
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this "
                    "container; run with decode_stub=True"
                )
            feats = [
                _fake_feature(p if isinstance(p, (bytes, bytearray)) else b"")
                for p in pdf[bin_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": pdf[bin_col].map(
                        lambda p: len(p) if isinstance(p, (bytes, bytearray)) else 0
                    ),
                    "feature": feats,
                }
            )

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType, False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.DoubleType()), False),
        ]
    )
    return df.select(id_col, bin_col).mapInPandas(batch, schema=schema)
