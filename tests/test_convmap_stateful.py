"""Grouped-map conversation operators + stateful streaming state."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stamp_container_fields(spark):
    rows = [
        ("c1", 2, "u", "bbb", None, None),
        ("c1", 0, "u", "aaaa", None, None),  # out of order on purpose
        ("c1", 1, "a", "cc", None, None),
        ("c2", 5, "u", "x", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    from tika_addons_spark.operators.convmap import stamp_container_fields

    out = {
        (r.conv_id, r.turn_idx): r
        for r in stamp_container_fields(df).collect()
    }
    assert out[("c1", 0)].position == 0 and out[("c1", 2)].position == 2
    assert out[("c1", 1)].container_turn_idx == 0
    assert out[("c1", 0)].total_turns == 3
    assert out[("c1", 0)].conv_chars == 9  # 4 + 2 + 3
    assert out[("c2", 5)].position == 0 and out[("c2", 5)].total_turns == 1


def test_dedupe_consecutive_turns(spark):
    rows = [
        ("c", 0, "hello"),
        ("c", 1, "hello"),   # consecutive dup -> dropped
        ("c", 2, "world"),
        ("c", 3, "hello"),   # not consecutive -> kept
        ("c", 4, None),
        ("c", 5, None),      # null never treated as dup
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    from tika_addons_spark.operators.convmap import dedupe_consecutive_turns

    kept = sorted(r.turn_idx for r in dedupe_consecutive_turns(df).collect())
    assert kept == [0, 2, 3, 4, 5]


def test_stateful_running_state_across_microbatches(spark, tmp_path):
    from tika_addons_spark.streaming.stateful import conversation_running_state

    src = tmp_path / "src"
    src.mkdir()
    b1 = [("c1", 0, "aaaa"), ("c1", 1, "bb"), ("c2", 0, "c")]
    b2 = [("c1", 2, "ddd"), ("c2", 1, "ee")]
    schema = "conv_id string, turn_idx int, text string"
    spark.createDataFrame(b1, schema).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, text string"
        )
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(str(src) + "/*")
    )
    q = (
        conversation_running_state(stream)
        .writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per conv reflects the FULL accumulated state
    rows = spark.sql(
        "SELECT conv_id, max(n_turns) AS n, max(chars) AS ch, max(last_turn_idx) AS lt "
        "FROM conv_state GROUP BY conv_id"
    ).collect()
    got = {r.conv_id: (r.n, r.ch, r.lt) for r in rows}
    assert got["c1"] == (3, 9, 2)
    assert got["c2"] == (2, 3, 1)  # "c" (1 char) + "ee" (2 chars)


def test_streaming_exact_dedup_across_microbatches(spark, tmp_path):
    """A15's seen-set at stream scale: the first-seen survivor is stable
    across micro-batches and the duplicate count keeps accumulating."""
    from tika_addons_spark.streaming.stateful import streaming_exact_dedup

    src = tmp_path / "dsrc"
    src.mkdir()
    schema = "conv_id string, turn_idx int, text string"
    # batch 1: two distinct texts, one dup; batch 2: more dups of the first
    b1 = [("c1", 0, "same text"), ("c1", 1, "other"), ("c2", 0, "same text")]
    b2 = [("c3", 0, "same text"), ("c3", 1, "other")]
    # one part-file per intended micro-batch (createDataFrame defaults to
    # multiple partitions → multiple files → maxFilesPerTrigger would split
    # a "batch" at an arbitrary file boundary)
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT first_conv, first_turn, max(n_seen) AS n "
        "FROM stream_dedup GROUP BY first_conv, first_turn"
    ).collect()
    got = {(r.first_conv, r.first_turn): r.n for r in rows}
    # 'same text' seen 3 times, survivor = its first occurrence (c1, 0);
    # 'other' seen twice, survivor (c1, 1). Survivors never change.
    assert got == {("c1", 0): 3, ("c1", 1): 2}


def test_streaming_minhash_neardup_across_microbatches(spark, tmp_path):
    """Crawl-shape near-dup: a doc arriving in a LATER micro-batch must be
    paired against bucket members remembered from EARLIER batches, and the
    write_neardup_stream wrapper must deliver each pair ONCE per
    micro-batch (batch-path .distinct() contract) with NO caller-side
    dedup — a pair identical in every band would otherwise land
    n_bands times."""
    from tika_addons_spark.streaming.stateful import (
        streaming_minhash_neardup,
        write_neardup_stream,
    )

    src = tmp_path / "ndsrc"
    src.mkdir()
    schema = "doc_id string, text string"
    b1 = [("d1", "alpha beta gamma delta words"), ("d2", "wholly unrelated content here")]
    b2 = [("d3", "alpha beta gamma delta words"), ("d4", "another different thing entirely")]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    landed = []

    def sink(batch_df, batch_id):
        landed.extend(batch_df.collect())

    q = (
        write_neardup_stream(streaming_minhash_neardup(stream, threshold=0.9), sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # raw row count == distinct pair count: multiplicity folded in
    assert [(r.id_a, r.id_b) for r in landed] == [("d1", "d3")]
    assert all(r.est_jaccard == 1.0 for r in landed)
    assert "band" not in (landed[0].asDict() if landed else {})


def test_streaming_neardup_hot_bucket_saturates(spark, tmp_path):
    """max_bucket_size: once a bucket saturates, it stops emitting pairs
    AND stops growing state — bounded memory under a mega-family stream."""
    from tika_addons_spark.streaming.stateful import streaming_minhash_neardup

    src = tmp_path / "satsrc"
    src.mkdir()
    schema = "doc_id string, text string"
    fam = [(f"d{i}", "the very same boilerplate text") for i in range(12)]
    spark.createDataFrame(fam, schema).coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        streaming_minhash_neardup(stream, threshold=0.9, max_bucket_size=4)
        .writeStream.format("memory")
        .queryName("stream_neardup_sat")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pairs = {
        (r.id_a, r.id_b)
        for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM stream_neardup_sat"
        ).collect()
    }
    # only the first max_bucket_size members pair up: C(4,2) = 6 pairs
    assert len(pairs) == 6
    members = {x for p in pairs for x in p}
    assert members <= {f"d{i}" for i in range(4)}
