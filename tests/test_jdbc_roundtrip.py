"""S6/S10 JDBC source + sink END-TO-END against a live database.

The reference copies whole JDBC tables through a cursor with a type
lattice (``eval-addons/.../DBCopier.java:68-105``) and writes report rows
in JDBC batches with value hygiene (``JDBCMetadataWriter.java:63-122``).
These tests run the Spark seams against a real DuckDB database through the
DuckDB JDBC driver when the driver jar is present on the host (a public
Maven artifact found in the local coursier cache — the spark-submit
``--jars`` situation); they skip cleanly when no driver exists.
"""

from __future__ import annotations

import datetime

import pytest

from tika_addons_spark.session import find_jdbc_driver_jar
from tika_addons_spark.sources import sinks

pytestmark = pytest.mark.skipif(
    find_jdbc_driver_jar() is None, reason="no JDBC driver jar on this host"
)


def _url(tmp_path, name: str) -> str:
    return f"jdbc:duckdb:{tmp_path}/{name}.db"


def test_jdbc_sink_roundtrip_with_hygiene(spark, tmp_path):
    """write_report over jdbc: → real rows land in a real database, with
    the reference's value hygiene applied (tab/CR/LF → space, NUL removed,
    truncation flags)."""
    rows = [
        (1, "plain value", 1.5),
        (2, "tabs\tand\nnewlines\rhere", -2.25),
        (3, "nul\x00byte", 0.0),
    ]
    df = spark.createDataFrame(rows, "id long, note string, score double")
    url = _url(tmp_path, "report")
    sinks.write_report(df.coalesce(1), url)

    back = sinks.read_jdbc(spark, url, "report").orderBy("id").collect()
    assert [r.note for r in back] == [
        "plain value", "tabs and newlines here", "nulbyte",
    ]
    assert [r.score for r in back] == [1.5, -2.25, 0.0]
    assert all(r.note_truncated is False for r in back)


def test_jdbc_type_lattice_roundtrip(spark, tmp_path):
    """DBCopier's concern: every base type survives the there-and-back —
    integer/bigint, double, varchar, boolean, timestamp."""
    ts = datetime.datetime(2024, 5, 4, 12, 30, 15)
    df = spark.createDataFrame(
        [(7, 3.14159, "seven", True, ts), (8, -1.0, "eight", False, ts)],
        "k long, x double, s string, b boolean, ts timestamp",
    )
    url = _url(tmp_path, "lattice")
    sinks.write_jdbc(df.coalesce(1), url, "t")
    back = sinks.read_jdbc(spark, url, "t").orderBy("k")
    got = back.collect()
    assert [tuple(r) for r in got] == [
        (7, 3.14159, "seven", True, ts), (8, -1.0, "eight", False, ts),
    ]
    kinds = dict(back.dtypes)
    # the DuckDB JDBC driver reports BIGINT metadata in a way Spark's
    # generic dialect widens to decimal(20,0); values are exact either way
    assert kinds["k"] in ("bigint", "decimal(20,0)"), kinds
    assert kinds["x"] == "double"
    assert kinds["b"] == "boolean" and kinds["ts"] == "timestamp"


def test_jdbc_partitioned_read_is_parallel(spark, tmp_path):
    """The 100 TB shape: a partitioned JDBC read must fan out into
    numPartitions cursors (tasks), not one — and still return every row
    exactly once."""
    url = _url(tmp_path, "part")
    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    sinks.write_jdbc(df.coalesce(1), url, "nums")

    back = sinks.read_jdbc(
        spark, url, "nums",
        partition_column="id", lower_bound=0, upper_bound=1000,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(2 * i for i in range(1000))
