"""Conversation-level rollups & ordered-position operators (A5, W1, W3).

The reference flattens container→embedded docs into rows carrying the parent
key and then computes container rollups by streaming over the element list
(``TikaEvalDocMapper.java:86-127``: total_embedded, num_attachments, ...;
``Indexer.java:259-275``: container_id/position stamping). Our analogue:
``(conv_id, turn_idx)`` rows, ``groupBy(conv_id)`` aggregates, window
numbering — all built-in, shuffle-once, map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import STATUS_REJECTED, STATUS_VALID


def with_position(df: DataFrame) -> DataFrame:
    """W1 — stable position-in-conversation numbering + container flag
    (element 0 ≡ the container row in the reference's List<Metadata>)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("position", F.row_number().over(w) - 1).withColumn(
        "is_container", F.col("position") == 0
    )


def conversation_rollup(extracted: DataFrame) -> DataFrame:
    """A5 — per-conversation aggregates (single shuffle, partial aggs
    map-side; the count/sum(when) pattern ≡ stream().filter().count())."""
    return extracted.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("chars_in").alias("chars_in"),
        F.sum("chars_out").alias("chars_out"),
        F.sum((F.col("parse_status") == STATUS_REJECTED).cast("long")).alias(
            "n_rejected"
        ),
        F.sum((F.col("parse_status") == STATUS_VALID).cast("long")).alias(
            "n_valid"
        ),
        F.sum(F.size(F.filter(F.col("spans"), lambda s: s.kind == F.lit("xpacket")))).alias(
            "n_xpackets"
        ),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum((F.col("detected_content_type") == "text/html").cast("long")).alias(
            "n_html_turns"
        ),
    )
