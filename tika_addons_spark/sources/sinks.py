"""Report sinks + sink factory (SURVEY.md §2.1 S9–S13).

The reference writes TSV (tab-join + ``[\\t\\r\\n]``→space clean,
``MimeAndDigester.java:328-359``), CSV with header
(``batchlite/.../writer/CSVMetadataWriter.java:31-69``), one-JSON-per-record
(``JSONMetadataWriter.java:27-50``), JDBC batches with value cleaning +
truncation (``JDBCMetadataWriter.java:63-122``), and picks the sink from the
target URI (``MetadataWriterFactory.java:26-34``).

Spark-first: each sink is a ``DataFrameWriter`` configuration plus the same
value-hygiene column transforms (clean + truncate, O5/F8), applied
declaratively so they run JVM-side. The primary data sink is the columnar
table (catalog.py); these are for reports/exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# JDBCMetadataWriter.java:111-122: values truncated to a max length with a
# *_truncated flag; we keep the same contract.
MAX_CELL_LEN = 10_000


def clean_string_columns(df: DataFrame, max_len: int = MAX_CELL_LEN) -> DataFrame:
    """F8 + O5 hygiene for flat-file sinks: NUL removed, tab/CR/LF → space,
    cells truncated with a boolean flag column per truncated field."""
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StringType):
            c = F.col(field.name)
            cleaned = F.regexp_replace(
                F.regexp_replace(c, "\x00", ""), "[\\t\\r\\n]", " "
            )
            out = out.withColumn(
                f"{field.name}_truncated",
                (F.length(cleaned) > max_len).alias(f"{field.name}_truncated"),
            ).withColumn(field.name, F.substring(cleaned, 1, max_len))
    return out


def write_tsv(df: DataFrame, path: str, **opts) -> None:
    """S9 — TSV with header; strings pre-cleaned so cells never break rows."""
    clean_string_columns(df).write.mode("overwrite").options(
        sep="\t", header=True, **opts
    ).csv(path)


def write_csv(df: DataFrame, path: str, **opts) -> None:
    """S11 — CSV (quoted, Excel-compatible defaults) with header."""
    df.write.mode("overwrite").options(
        header=True, quoteAll=False, escape='"', **opts
    ).csv(path)


def write_json_records(df: DataFrame, path: str, **opts) -> None:
    """S12 — newline-delimited JSON records (the table-scale form of the
    reference's one-file-per-record JSON tree)."""
    df.write.mode("overwrite").options(**opts).json(path)


def write_report(df: DataFrame, target: str) -> None:
    """S13 — sink factory by target suffix/scheme, mirroring
    MetadataWriterFactory: .tsv→TSV, .csv→CSV, jdbc:→JDBC, else JSON."""
    if target.endswith(".tsv"):
        write_tsv(df, target)
    elif target.endswith(".csv"):
        write_csv(df, target)
    elif target.startswith("jdbc:"):
        # S10 — JDBC batch sink with the reference's value hygiene
        # (JDBCMetadataWriter.java:63-122). Runs end-to-end when a driver
        # jar is on the classpath (session.find_jdbc_driver_jar).
        write_jdbc(clean_string_columns(df), target, "report")
    else:
        write_json_records(df, target)


def read_tsv(spark, path: str, schema=None) -> DataFrame:
    """S5 — TSV source (optionally gz; codec is auto-detected)."""
    reader = spark.read.options(sep="\t", header=True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_text_lines(spark, path: str) -> DataFrame:
    """S4 — compressed text source, one `value` row per line.

    gzip/bzip2 ride Spark's native codec auto-detection; **xz** (which the
    reference reads via XZInputStream, ``lang-id/.../CCAlignedCounter.java:
    17-19``) has no codec in stock Spark/Hadoop, so `.xz` paths go through a
    binaryFile scan + stdlib ``lzma`` decompress in a narrow mapInPandas.
    Scale note: xz streams are not splittable on ANY engine — the parallel
    unit is the file, identical to the Hadoop-codec behavior for gz."""
    if path.endswith(".xz"):
        import pandas as _pd

        bin_df = spark.read.format("binaryFile").load(path)

        def decomp(it):
            import lzma

            for pdf in it:
                values = []
                for content in pdf["content"]:
                    text = lzma.decompress(bytes(content)).decode("utf-8")
                    values.extend(text.splitlines())
                yield _pd.DataFrame({"value": values})

        return bin_df.select("content").mapInPandas(decomp, "value string")
    return spark.read.text(path)


def _jdbc_driver_for(url: str) -> str | None:
    return "org.duckdb.DuckDBDriver" if url.startswith("jdbc:duckdb:") else None


_DDL_TYPES: dict[type, str] = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.ByteType: "TINYINT",
    T.DoubleType: "DOUBLE",
    T.FloatType: "REAL",
    T.StringType: "VARCHAR",
    T.BooleanType: "BOOLEAN",
    T.TimestampType: "TIMESTAMP",
    T.DateType: "DATE",
    T.BinaryType: "BLOB",
}


def _jdbc_ddl_type(dt: T.DataType) -> str:
    """The DBCopier type lattice (DBCopier.java:68-105), Spark-side."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    for py_t, sql_t in _DDL_TYPES.items():
        if isinstance(dt, py_t):
            return sql_t
    return "VARCHAR"  # everything else rides as text, like the reference


def _raw_jdbc_execute(spark, url: str, driver_class: str | None,
                      statements: "list[str]") -> None:
    """Run DDL through the raw JDBC driver (loaded via Spark's session
    classloader, where spark.jars lives — the root JVM classloader can't
    see it)."""
    jvm = spark._jvm
    if driver_class:
        loader = jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader()
        drv = jvm.java.lang.Class.forName(driver_class, True, loader).newInstance()
        conn = drv.connect(url, jvm.java.util.Properties())
    else:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for q in statements:
            st.execute(q)
        st.close()
    finally:
        conn.close()


def write_jdbc(df: DataFrame, url: str, table: str,
               driver: str | None = None) -> None:
    """S10 — overwrite-semantics JDBC write that works on dialect-less
    databases: Spark ships no DuckDB dialect, and Spark 4.x's
    ``tableExists`` probe re-raises the driver's table-missing error for
    unknown dialects instead of treating it as create-me. So the
    drop/create DDL (types via :func:`_jdbc_ddl_type`) runs through the
    raw driver first, then Spark appends — the same split a production
    deployment gets from a registered JdbcDialect."""
    driver = driver or _jdbc_driver_for(url)
    cols = ", ".join(
        f'"{f.name}" {_jdbc_ddl_type(f.dataType)}' for f in df.schema.fields
    )
    _raw_jdbc_execute(
        df.sparkSession, url, driver,
        [f'DROP TABLE IF EXISTS "{table}"', f'CREATE TABLE "{table}" ({cols})'],
    )
    w = df.write.mode("append").format("jdbc").option("url", url).option(
        "dbtable", table
    )
    if driver:
        w = w.option("driver", driver)
    w.save()


def read_jdbc(
    spark,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **opts,
) -> DataFrame:
    """S6 — JDBC source (reference: eval-addons/.../DBCopier.java:68-105
    copies a whole JDBC table through a cursor; Spark-first that's a
    parallel partitioned read).

    For anything beyond a toy table pass the 4 partitioning options —
    a JDBC read without them is a SINGLE task holding one cursor, which at
    100 TB is both a driver-side bottleneck and a DB-side timeout. When a
    driver jar is present on the host (session.find_jdbc_driver_jar) this
    runs END-TO-END against a live database — tests/test_jdbc_roundtrip.py
    round-trips the type lattice and asserts the partitioned-read task
    count; without a jar the seam tests assert the option wiring only."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if url.startswith("jdbc:duckdb:"):
        reader = reader.option("driver", "org.duckdb.DuckDBDriver")
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()
