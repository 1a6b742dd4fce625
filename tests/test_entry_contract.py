"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 and compare against its oracle_sql() via DuckDB — row count, sorted
column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        except Exception:
            pass
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if out[c].dtype == object:
            # Decimal → float-ish string stable form
            out[c] = out[c].map(
                lambda v: float(v) if hasattr(v, "as_tuple") else v
            )
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].round(6)
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) < 1e-9
    return a == b


ORACLED = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    actual = _normalize(q(spark, SF_DIR).toPandas())
    expected = _normalize(duck.sql(entry_mod.oracle_sql()[name]).df())

    assert list(actual.columns) == list(expected.columns), (
        f"{name}: columns {list(actual.columns)} vs {list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: rows {len(actual)} vs {len(expected)}"
    )
    for col in actual.columns:
        av, ev = actual[col].tolist(), expected[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, ev))
            if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
