"""Tier-2 correctness: the Spark engine must equal the standalone oracle
per turn, under stable (conv_id, turn_idx) ordering, and be invariant to
shuffle-partition count, Arrow batch size and salting (FIXTURES.md §2, §6)."""

from __future__ import annotations

import pandas as pd
import pytest

from tika_addons_spark.operators.compare import equality_gate
from tika_addons_spark.operators.extract import extract_turns
from tika_addons_spark.oracle import extract_one
from tika_addons_spark.plans.pipeline import salted_repartition
from tika_addons_spark.schema import EXTRACTED_SCHEMA


def oracle_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, r in pdf.iterrows():
        out = extract_one(r["text"] if isinstance(r["text"], str) else None)
        out["conv_id"] = r["conv_id"]
        out["turn_idx"] = r["turn_idx"]
        rows.append(out)
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def expected_df(spark, transcripts_pdf):
    exp = oracle_frame(transcripts_pdf)
    exp_schema = "conv_id string, turn_idx int, " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in EXTRACTED_SCHEMA.fields
        if f.name
        in {
            "extracted_text",
            "title",
            "detected_content_type",
            "parse_status",
            "chars_in",
            "chars_out",
        }
    )
    cols = [
        "conv_id",
        "turn_idx",
        "extracted_text",
        "title",
        "detected_content_type",
        "parse_status",
        "chars_in",
        "chars_out",
    ]
    return spark.createDataFrame(exp[cols], schema=exp_schema)


GATE_COLS = [
    "extracted_text",
    "title",
    "detected_content_type",
    "parse_status",
    "chars_in",
    "chars_out",
]


def test_engine_equals_oracle(spark, transcripts_df, expected_df):
    actual = extract_turns(transcripts_df)
    mism = equality_gate(actual, expected_df, GATE_COLS)
    rows = mism.limit(5).collect()
    assert not rows, f"mismatching turns: {rows}"


def test_spans_equal_oracle(spark, transcripts_df, transcripts_pdf):
    actual = (
        extract_turns(transcripts_df)
        .select("conv_id", "turn_idx", "spans")
        .toPandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
    )
    for _, r in transcripts_pdf.sample(60, random_state=1).iterrows():
        exp = extract_one(r["text"] if isinstance(r["text"], str) else None)
        got = actual.loc[(r["conv_id"], int(r["turn_idx"])), "spans"]
        got_norm = [
            {"kind": s["kind"], "start": s["start"], "end": s["end"]} for s in got
        ]
        assert got_norm == exp["spans"], (r["conv_id"], r["turn_idx"])


def test_engine_equals_oracle_nested_cols(spark, transcripts_df, transcripts_pdf):
    """Full-corpus gate over the nested/ordered fields the scalar gate
    misses: meta (map, key-sorted), warnings (exact order), spans (exact
    order+offsets), n_pages. A vectorized-path divergence in any of these
    now fails loudly."""
    actual = (
        extract_turns(transcripts_df)
        .select("conv_id", "turn_idx", "meta", "warnings", "spans", "n_pages")
        .toPandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
    )
    assert len(actual) == len(transcripts_pdf)
    n_checked = 0
    for _, r in transcripts_pdf.iterrows():
        exp = extract_one(r["text"] if isinstance(r["text"], str) else None)
        got = actual.loc[(r["conv_id"], int(r["turn_idx"]))]
        assert sorted((got["meta"] or {}).items()) == sorted(exp["meta"].items()), (
            r["conv_id"], r["turn_idx"],
        )
        assert list(got["warnings"]) == exp["warnings"], (r["conv_id"], r["turn_idx"])
        got_spans = [
            {"kind": s["kind"], "start": s["start"], "end": s["end"]}
            for s in got["spans"]
        ]
        assert got_spans == exp["spans"], (r["conv_id"], r["turn_idx"])
        got_np = None if pd.isna(got["n_pages"]) else int(got["n_pages"])
        assert got_np == exp["n_pages"], (r["conv_id"], r["turn_idx"])
        n_checked += 1
    assert n_checked == len(transcripts_pdf)


def test_arrow_path_equals_pandas_path(spark, transcripts_df):
    """The mapInArrow hot path (default) must be byte-identical to the
    mapInPandas twin over the full fixture corpus, all columns."""
    import hashlib

    from tika_addons_spark.operators.extract import extract_turns_pandas

    def digest(df):
        pdf = (
            df.orderBy("conv_id", "turn_idx")
            .selectExpr(
                "conv_id", "turn_idx", "extracted_text", "title",
                "to_json(map_entries(meta)) AS meta_j", "to_json(spans) AS spans_j",
                "detected_content_type", "parse_status",
                "to_json(warnings) AS warnings_j", "chars_in", "chars_out",
                "n_pages",
            )
            .toPandas()
        )
        return hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()

    assert digest(extract_turns(transcripts_df)) == digest(
        extract_turns_pandas(transcripts_df)
    )


def test_invariance_shuffle_partitions_and_salt(spark, transcripts_df):
    base = extract_turns(transcripts_df).orderBy("conv_id", "turn_idx")
    base_pdf = base.select(*GATE_COLS).toPandas()

    # salted repartition at two widths must not change results
    for n in (2, 16):
        alt = (
            extract_turns(salted_repartition(transcripts_df, n))
            .orderBy("conv_id", "turn_idx")
            .select(*GATE_COLS)
            .toPandas()
        )
        pd.testing.assert_frame_equal(base_pdf, alt)


def test_invariance_arrow_batch_size(spark, transcripts_df):
    base = (
        extract_turns(transcripts_df)
        .orderBy("conv_id", "turn_idx")
        .select(*GATE_COLS)
        .toPandas()
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        for n in ("16", "10000"):
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", n)
            alt = (
                extract_turns(transcripts_df)
                .orderBy("conv_id", "turn_idx")
                .select(*GATE_COLS)
                .toPandas()
            )
            pd.testing.assert_frame_equal(base, alt)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_poison_rows_do_not_fail_job(spark):
    poison = [
        ("c0", 0, None),
        ("c0", 1, ""),
        ("c0", 2, "%PDF-1.4\n\x00\x01garbage"),
        ("c0", 3, "<html><body><div>" + "a" * 10),
        ("c0", 4, "x" * 200_000),
    ]
    df = spark.createDataFrame(poison, "conv_id string, turn_idx int, text string")
    out = extract_turns(df).collect()
    assert len(out) == 5
    statuses = {r.turn_idx: r.parse_status for r in out}
    assert statuses[0] == "rejected"
    assert statuses[2] == "rejected"
    assert statuses[4] == "valid-warnings"  # truncated megarow
