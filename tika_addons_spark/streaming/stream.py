"""Structured Streaming face of the extraction pipeline.

The reference is batch-only (SURVEY.md §2.10: bounded queues + poison pills,
no watermarks) — but the engine's operators are stream-ready by design: the
extraction map is stateless per turn, so the same ``mapInPandas`` plan runs
under ``readStream``. Provided:

- ``stream_extract``: file-source transcripts → extraction → parquet sink
  with checkpointing; ``trigger(availableNow=True)`` turns it into an
  incremental batch (the Spark-native form of the reference's
  resume-from-cache), processing only files not yet seen by the stream
  checkpoint.
- ``stream_conversation_stats``: watermarked sliding-window aggregate over
  turn timestamps — the late-data-tolerant rollup (A5's streaming analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.extract import extract_turns
from ..schema import TRANSCRIPTS_SCHEMA


def read_transcript_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def stream_extract(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental extraction: new transcript files → extracted parquet.

    The stream checkpoint IS the resume state (exactly-once file tracking);
    re-running after a kill processes only unseen files — the streaming
    twin of the batch pipeline's bucket checkpoint."""
    stream = read_transcript_stream(spark, source_dir)
    extracted = extract_turns(stream)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_conversation_stats(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Watermarked windowed rollup over turn event time (returns the
    streaming DataFrame; caller attaches a sink)."""
    stream = read_transcript_stream(spark, source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("chars_in"),
        )
    )
