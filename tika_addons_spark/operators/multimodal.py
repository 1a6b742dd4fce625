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

# single source of truth for magic-prefix detection: BOTH the pure-Python
# sniff and the JVM column expression derive from this table, and a parity
# test pins them to each other (longest prefixes first so e.g. \xff\xd8\xff
# wins over any shorter overlap).
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
    (length/sha2/prefix are all JVM-side). Detection branches are GENERATED
    from ``_MAGIC`` so this can never drift from :func:`sniff_media`."""
    magic_hex = F.hex(F.substring(F.col(bin_col), 1, 4))
    mt: F.Column | None = None
    for magic, mime in _MAGIC:
        cond = magic_hex.startswith(magic.hex().upper())
        mt = F.when(cond, mime) if mt is None else mt.when(cond, mime)
    mt = mt.otherwise("application/octet-stream")
    return df.withColumn(
        "media_meta",
        F.struct(
            mt.alias("media_type"),
            F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(bin_col), 256).alias("sha256"),
            magic_hex.alias("magic"),
        ),
    )


# ---------------------------------------------------------------------------
# REAL header kernels — pure-Python parsers of public container formats
# (PNG/GIF/JPEG headers, RIFF/WAVE chunks). No decoder libs needed: these
# read dimensions/duration straight from the byte layout, so the media path
# has a real, testable kernel (the pixel/sample decode remains stubbed).
# ---------------------------------------------------------------------------
def parse_media_header(payload: bytes | None) -> dict:
    """(media_type, width, height, duration_ms) from container headers.
    Total function: malformed/unknown bytes → type + null fields."""
    out = {
        "media_type": sniff_media(payload),
        "width": None,
        "height": None,
        "duration_ms": None,
    }
    if not payload:
        return out
    b = payload
    try:
        if b.startswith(b"\x89PNG\r\n\x1a\n") and len(b) >= 24 and b[12:16] == b"IHDR":
            out["width"] = int.from_bytes(b[16:20], "big")
            out["height"] = int.from_bytes(b[20:24], "big")
        elif b.startswith((b"GIF87a", b"GIF89a")) and len(b) >= 10:
            out["width"] = int.from_bytes(b[6:8], "little")
            out["height"] = int.from_bytes(b[8:10], "little")
        elif b.startswith(b"\xff\xd8\xff"):
            # scan JPEG segments for a start-of-frame marker
            pos = 2
            sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
            while pos + 3 < len(b):
                if b[pos] != 0xFF:
                    pos += 1
                    continue
                marker = b[pos + 1]
                if marker in sof and pos + 9 <= len(b):
                    out["height"] = int.from_bytes(b[pos + 5 : pos + 7], "big")
                    out["width"] = int.from_bytes(b[pos + 7 : pos + 9], "big")
                    break
                if 0xD0 <= marker <= 0xD9 or marker in (0x01, 0xFF):
                    pos += 2
                    continue
                pos += 2 + int.from_bytes(b[pos + 2 : pos + 4], "big")
        elif b.startswith(b"RIFF") and b[8:12] == b"WAVE":
            # walk chunks: fmt_ gives byte rate, data gives payload size
            pos, byte_rate, data_size = 12, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                csz = int.from_bytes(b[pos + 4 : pos + 8], "little")
                if cid == b"fmt " and pos + 36 <= len(b):
                    byte_rate = int.from_bytes(b[pos + 16 : pos + 20], "little")
                elif cid == b"data":
                    data_size = csz
                pos += 8 + csz + (csz & 1)
            if byte_rate and data_size is not None:
                out["duration_ms"] = int(round(data_size * 1000 / byte_rate))
    except Exception:  # malformed header: keep whatever parsed, never throw
        pass
    return out


def parse_media_headers(
    df: DataFrame, bin_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Arrow-batched header parse: (id, media_type, width, height,
    duration_ms) — the real kernel behind the decode seam."""

    def batch(it):
        for pdf in it:
            rows = [
                parse_media_header(
                    p if isinstance(p, (bytes, bytearray)) else None
                )
                for p in pdf[bin_col]
            ]
            out = pd.DataFrame(rows)
            out.insert(0, "id", pdf[id_col].values)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["duration_ms"] = out["duration_ms"].astype("Int64")
            yield out

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType, False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]
    )
    return df.select(id_col, bin_col).mapInPandas(batch, schema=schema)


# --- deterministic synthesizers (fixtures/tests; real public byte layouts) --
def make_png(width: int, height: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def make_gif(width: int, height: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def make_jpeg(width: int, height: int) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_wav(duration_ms: int, sample_rate: int = 8000) -> bytes:
    import struct

    byte_rate = sample_rate * 1 * 1  # mono, 8-bit
    n = int(round(duration_ms * byte_rate / 1000))
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 1, 8)
    data = b"\x00" * n
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


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
