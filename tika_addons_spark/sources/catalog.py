"""Table-format seam: Iceberg in production, parquet in the sandbox.

The north rule names Iceberg (MERGE-based checkpoint skip, snapshot commits).
The sandbox has no Iceberg runtime jar, so this module exposes one API with
two backends chosen at runtime:

- ``iceberg``: ``spark.read.table`` / ``writeTo(...).append()`` /
  ``MERGE INTO`` — used when the Iceberg extension is on the classpath.
- ``parquet`` (sandbox default): identical *semantics* — partition-dynamic
  overwrite for idempotent bucket re-writes, checkpoint table + broadcast
  anti-join instead of MERGE (the reference's resume-by-existence:
  ``bugtracker-crawler/.../GithubScraper.java:253-263``).

All engine code goes through these functions; pytest runs the parquet
backend.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..schema import CHECKPOINT_SCHEMA, TRANSCRIPTS_SCHEMA


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
        return True
    except Exception:
        return False


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Read the transcripts table. ``source`` is an Iceberg table name
    (``cat.db.transcripts``) or a parquet path. Schema is declared, never
    inferred — extra columns are pruned at the scan."""
    if source.endswith(".parquet") or os.path.isdir(source) or os.path.isfile(source):
        df = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(source)
    else:
        df = spark.read.table(source)
    return df.select([f.name for f in TRANSCRIPTS_SCHEMA.fields])


def write_extracted(df: DataFrame, target: str, partition_col: str = "bucket") -> None:
    """Write extraction output partitioned by bucket, idempotently:
    dynamic partition overwrite replaces exactly the buckets present in
    ``df`` (re-running a wave after a crash cannot double-write). With
    Iceberg this is ``writeTo(target).overwritePartitions()``."""
    spark = df.sparkSession
    if _is_path(target):
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy(partition_col).parquet(target)
    else:
        df.writeTo(target).overwritePartitions()


def read_extracted(spark: SparkSession, target: str) -> DataFrame:
    if _is_path(target):
        return spark.read.parquet(target)
    return spark.read.table(target)


def read_extracted_committed(
    spark: SparkSession, target: str, ckpt: str, run_id: str
) -> DataFrame:
    """Snapshot-consistent read: only buckets whose checkpoint row says
    ``completed`` for this run — the checkpoint table doubles as the commit
    manifest, so readers never see a wave that is mid-write (with Iceberg
    this isolation comes from snapshot reads; this is the parquet-backend
    equivalent, SURVEY.md §8)."""
    committed = (
        completed_keys(spark, ckpt, run_id)
        .select(
            F.regexp_extract("partition_key", r"bucket=(\d+)", 1)
            .cast("int")
            .alias("bucket")
        )
    )
    return read_extracted(spark, target).join(F.broadcast(committed), "bucket")


def append_checkpoint(df: DataFrame, ckpt: str) -> None:
    """Append checkpoint rows (one per completed partition_key). Parquet
    append of new files is atomic-enough per wave; Iceberg path is a real
    snapshot append."""
    if _is_path(ckpt):
        df.write.mode("append").parquet(ckpt)
    else:
        df.writeTo(ckpt).append()


def read_checkpoint(spark: SparkSession, ckpt: str) -> DataFrame:
    if _is_path(ckpt):
        # existence via the read itself, not os.path: a driver-local exists()
        # check is wrong for s3://, hdfs://... URIs — an existing remote
        # checkpoint would silently read as empty and resume would redo all
        # buckets (and double-write the output).
        try:
            return spark.read.schema(CHECKPOINT_SCHEMA).parquet(ckpt)
        except AnalysisException as e:
            # ONLY a missing path means "fresh run". Any other analysis
            # failure (permissions, malformed URI, schema conflict) on an
            # existing checkpoint must surface — swallowing it would resume
            # from scratch and double-write the output, the exact failure
            # this probe exists to prevent.
            if _is_path_not_found(e):
                return spark.createDataFrame([], CHECKPOINT_SCHEMA)
            raise
    return spark.read.table(ckpt)


def _is_path_not_found(e: AnalysisException) -> bool:
    try:
        klass = e.getCondition()  # PySpark ≥4 name; getErrorClass is deprecated
    except Exception:
        try:
            klass = e.getErrorClass()
        except Exception:
            klass = None
    if klass == "PATH_NOT_FOUND":
        return True
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def completed_keys(spark: SparkSession, ckpt: str, run_id: str) -> DataFrame:
    """Distinct partition_keys already completed for this run_id.

    This is the MERGE-skip predicate: on resume the work table is
    ``left_anti``-joined against it (J2 — the resume operator)."""
    return (
        read_checkpoint(spark, ckpt)
        .filter((F.col("run_id") == run_id) & (F.col("status") == "completed"))
        .select("partition_key")
        .distinct()
    )


def _is_path(target: str) -> bool:
    return "/" in target or target.endswith(".parquet")
