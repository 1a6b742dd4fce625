"""Catalyst plan audits: the physical plans must have the shapes we designed
for 100 TB — pushdown + pruning at the scan, broadcast for small dims,
whole-stage codegen for column-expression operators (SURVEY.md §4.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_column_pruning_at_scan(spark):
    # q03 touches only doc_id/text — the parquet ReadSchema must not include
    # lang/source/n_chars
    df = entry.q03_sha256_digest(spark, SF)
    txt = formatted(df)
    scan = [l for l in txt.splitlines() if "ReadSchema" in l]
    assert scan, txt
    assert "lang" not in scan[0] and "n_chars" not in scan[0]


def test_predicate_pushdown_to_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_orderkey") == 1)
        .select("l_orderkey", "l_quantity")
    )
    txt = formatted(df)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)" in txt, txt


def test_broadcast_join_for_small_dims(spark):
    df = entry.q12_region_customer_rollup(spark, SF)
    p = plan_of(df)
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, "dims must broadcast, not sort-merge"


def test_anti_join_shape(spark):
    df = entry.q11_resume_antijoin(spark, SF)
    p = plan_of(df)
    assert "LeftAnti" in p, p


def test_whole_stage_codegen_for_column_ops(spark):
    df = entry.q04_char_classes(spark, SF)
    p = plan_of(df)
    # '*(n)' prefixes mark whole-stage-codegen subtrees in the plan string
    assert "*(1)" in p or "WholeStageCodegen" in p, p
    assert "BatchEvalPython" not in p, "no row-at-a-time Python in column ops"


def test_extraction_single_python_stage(spark, transcripts_df):
    from tika_addons_spark.operators.extract import extract_turns

    p = plan_of(extract_turns(transcripts_df))
    # exactly one Arrow-batched python operator, no per-row PythonUDF eval
    assert p.count("MapInPandas") == 1, p
    assert "BatchEvalPython" not in p, p


def test_partial_aggregation_before_shuffle(spark):
    # groupBy aggregates must be map-side partial (HashAggregate appears
    # both below and above the Exchange)
    df = entry.q01_pricing_summary(spark, SF)
    p = plan_of(df)
    assert p.count("HashAggregate") >= 2, p
