"""SparkSession factory with scale-aware defaults.

Local sandbox runs on local[N]; the same config block is what we would submit
with ``spark-submit --py-files engine.zip`` on a real cluster — only
master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size: extraction turns can be large strings; keep batches
# bounded so a batch of giant poison turns doesn't balloon executor memory,
# but big enough to amortize per-batch pandas/Arrow overhead.
ARROW_MAX_RECORDS = 4096

# JVM→Python socket buffer for pandas UDFs: the 64 KiB default is smaller
# than one Arrow batch, which serializes each task into a strict
# produce/consume ping-pong (python workers idle while the JVM prepares the
# next batch). 16 MiB lets batches queue so both sides stay busy — measured
# ~1.4× extraction throughput at local[32].
PANDAS_UDF_BUFFER = str(16 * 1024 * 1024)


def find_jdbc_driver_jar() -> str | None:
    """Locate a JDBC driver jar on this machine (none ships inside the
    Spark distribution). The DuckDB driver (org.duckdb:duckdb_jdbc, a
    public Maven artifact) appears in the local coursier/ivy caches on
    some hosts; when present the S6/S10 JDBC seams run END-TO-END against
    a real database (tests/test_jdbc_roundtrip.py) instead of
    plan-construction-only. On a real cluster the driver jar is passed
    with ``spark-submit --jars`` exactly like this."""
    import glob

    for pattern in (
        os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc*.jar"),
        os.path.expanduser("~/.ivy2/**/duckdb_jdbc*.jar"),
        os.path.expanduser("~/.m2/**/duckdb_jdbc*.jar"),
    ):
        hits = sorted(glob.glob(pattern, recursive=True))
        if hits:
            return hits[-1]
    return None


def get_spark(
    app_name: str = "tika_addons_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    with_jdbc: bool | None = None,
) -> SparkSession:
    """Build a session tuned for the extraction workload.

    AQE on (runtime coalesce + skew-join splitting), Arrow on (pandas UDF hot
    path), UTC timezone pinned so duckdb-oracle comparisons are stable.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # match parallelism, not the 200 default: at sandbox scale 200
        # partitions means 6x scheduling overhead per shuffle; on a real
        # cluster this is set to ~2-3x total cores by the submitter.
        # Robust parse: "local[8]" → 8; "local[*]", "local", "local[2,3]",
        # "spark://..." → cpus.
        import re as _re

        m = _re.fullmatch(r"local\[(\d+)\]", master)
        shuffle_partitions = max(int(m.group(1)), 4) if m else cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS)
        )
        .config("spark.sql.execution.pandas.udf.buffer.size", PANDAS_UDF_BUFFER)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # Floor on scan parallelism, derived from the session's core count
        # (never a constant): single-file parquet inputs land on 1-2 scan
        # tasks otherwise, serializing the scan-stage work (partial
        # aggregation, mapInPandas synth) onto one core. Splits are still
        # bounded below by row-group layout, so this is a no-op for
        # many-file cluster-scale tables.
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
    )
    # Shuffle/spill on RAM-backed storage when available: local-mode shuffle
    # goes through spark.local.dir, and disk /tmp was measured to both slow
    # and destabilize the repartition stage (29k→82k turns/s swings; tmpfs
    # gives a stable ~1.5× on the extraction job at local[32]). On a real
    # cluster this is the NVMe/ramdisk shuffle-dir best practice. Guard:
    # only when the tmpfs has real headroom — shuffle spill competing with
    # executor memory in a nearly-full /dev/shm must degrade to disk, not
    # OOM the host (SPARK_GRAFT_SHM_MIN_FREE_GB overrides, default 8 GiB).
    if os.path.isdir("/dev/shm"):
        try:
            _st = os.statvfs("/dev/shm")
            _shm_free = _st.f_bavail * _st.f_frsize
        except OSError:
            _shm_free = 0
        _min_free = float(
            os.environ.get("SPARK_GRAFT_SHM_MIN_FREE_GB", "8")
        ) * (1024**3)
        if _shm_free >= _min_free:
            builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    # JDBC driver jar is attached only on explicit opt-in (with_jdbc=True or
    # SPARK_GRAFT_JDBC=1): a stale/corrupt cached jar must not silently
    # change the classpath of sessions that never touch a jdbc: URL.
    if with_jdbc is None:
        with_jdbc = os.environ.get("SPARK_GRAFT_JDBC", "") == "1"
    if with_jdbc:
        jdbc_jar = find_jdbc_driver_jar()
        if jdbc_jar:
            builder = builder.config("spark.jars", jdbc_jar)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
