"""extract_pages — the UDTF-shaped flatten operator (X7/X10 analogue)."""

from __future__ import annotations


def test_extract_pages_explodes_pdf_turns(spark):
    rows = [
        ("c1", 0, "%PDF-1.4\n%%Page 1\nfirst page text\n%%Page 2\nsecond page\n%%EOF"),
        ("c1", 1, "plain text turn — no pages"),
        ("c1", 2, "%PDF-1.4\n%%Page 1\nonly page\n%%EOF"),
        ("c1", 3, None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    from tika_addons_spark.operators.extract import extract_pages

    out = extract_pages(df).orderBy("turn_idx", "page_no").collect()
    assert [(r.turn_idx, r.page_no) for r in out] == [(0, 1), (0, 2), (2, 1)]
    assert out[0].page_text == "first page text"
    assert out[1].page_text == "second page"


def test_page_stats_compose_with_builtin_aggs(spark):
    from pyspark.sql import functions as F

    from tika_addons_spark.operators.extract import extract_pages

    df = spark.createDataFrame(
        [("c", 0, "%PDF-1.4\n%%Page 1\naa bb\n%%Page 2\ncc dd ee\n%%EOF")],
        "conv_id string, turn_idx int, text string",
    )
    # A4: per-page ratio stats via explode + avg (tokens per page)
    stats = (
        extract_pages(df)
        .groupBy("conv_id", "turn_idx")
        .agg(
            F.count("*").alias("n_pages"),
            F.round(F.avg(F.size(F.split("page_text", r"\s+"))), 4).alias(
                "tokens_per_page"
            ),
        )
        .collect()[0]
    )
    assert stats.n_pages == 2
    assert stats.tokens_per_page == 2.5
