"""End-to-end job tests: checkpointed run, kill-and-resume equivalence
(FIXTURES.md §4), rollups, comparison harness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tika_addons_spark.operators.compare import align_runs, equality_gate, sim_sets
from tika_addons_spark.operators.extract import extract_turns
from tika_addons_spark.operators.rollup import conversation_rollup, with_position
from tika_addons_spark.plans.pipeline import run_extraction
from tika_addons_spark.sources import catalog


def test_run_and_checkpoint(spark, transcripts_path, tmp_path):
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    stats = run_extraction(
        spark, transcripts_path, out, ckpt, run_id="r1", n_buckets=8, n_waves=2
    )
    assert stats["completed_buckets"] == 8

    df = catalog.read_extracted(spark, out)
    n_in = spark.read.parquet(transcripts_path).count()
    assert df.count() == n_in

    ck = catalog.read_checkpoint(spark, ckpt)
    assert ck.count() == 8
    agg = ck.agg(F.sum("n_turns"), F.sum("chars_in")).collect()[0]
    assert agg[0] == n_in
    # lineage sums must equal recomputed sums from the data
    assert agg[1] == df.agg(F.sum("chars_in")).collect()[0][0]
    # content_types histogram covers every turn
    total_ct = ck.select(
        F.explode("content_types").alias("k", "v")
    ).agg(F.sum("v")).collect()[0][0]
    assert total_ct == n_in


def test_kill_and_resume_equals_clean_run(spark, transcripts_path, tmp_path):
    out_a = str(tmp_path / "a")
    ckpt_a = str(tmp_path / "cka")
    # clean single run
    run_extraction(spark, transcripts_path, out_a, ckpt_a, run_id="rA", n_buckets=8)

    # killed run: 2 of 4 waves committed, then resume with same run_id
    out_b = str(tmp_path / "b")
    ckpt_b = str(tmp_path / "ckb")
    st = run_extraction(
        spark, transcripts_path, out_b, ckpt_b,
        run_id="rB", n_buckets=8, n_waves=4, fail_after_waves=2,
    )
    assert st["killed"] and st["completed_buckets"] == 4
    done_before = catalog.completed_keys(spark, ckpt_b, "rB").count()
    assert done_before == 4

    st2 = run_extraction(
        spark, transcripts_path, out_b, ckpt_b, run_id="rB", n_buckets=8, n_waves=4
    )
    # resume processed ONLY the missing buckets
    assert st2["completed_buckets"] == 4

    a = catalog.read_extracted(spark, out_a)
    b = catalog.read_extracted(spark, out_b)
    cols = ["extracted_text", "parse_status", "detected_content_type", "chars_out"]
    assert equality_gate(b, a, cols).count() == 0
    assert a.count() == b.count()


def test_committed_read_isolation(spark, transcripts_path, tmp_path):
    """Readers using the checkpoint-as-manifest see ONLY completed waves."""
    out = str(tmp_path / "iso")
    ckpt = str(tmp_path / "isock")
    st = run_extraction(
        spark, transcripts_path, out, ckpt,
        run_id="iso", n_buckets=8, n_waves=4, fail_after_waves=2,
    )
    assert st["killed"]
    raw = catalog.read_extracted(spark, out)
    committed = catalog.read_extracted_committed(spark, out, ckpt, "iso")
    # the manifest view only exposes checkpointed buckets...
    assert committed.select("bucket").distinct().count() == 4
    assert committed.count() == raw.filter(
        F.col("bucket").isin(
            [int(r.partition_key.split("=")[1])
             for r in catalog.completed_keys(spark, ckpt, "iso").collect()]
        )
    ).count()
    # ...and after resume it equals the raw table
    run_extraction(spark, transcripts_path, out, ckpt, run_id="iso",
                   n_buckets=8, n_waves=4)
    assert (
        catalog.read_extracted_committed(spark, out, ckpt, "iso").count()
        == catalog.read_extracted(spark, out).count()
    )


def test_dedup_stage_kill_resume_and_skip(spark, transcripts_path, tmp_path):
    """End-to-end near-dup stage: runs after a killed-then-resumed
    extraction, labels every non-rejected turn with a cluster, marks
    survivors, and is itself resume-skipped on re-run (its own checkpoint
    key)."""
    from tika_addons_spark.plans.pipeline import DEDUP_STAGE_KEY, run_dedup_stage

    out = str(tmp_path / "ext")
    ckpt = str(tmp_path / "ck")
    dd = str(tmp_path / "dedup")
    # kill mid-run: extraction incomplete, dedup must NOT have run
    st = run_extraction(
        spark, transcripts_path, out, ckpt, run_id="rd", n_buckets=8,
        n_waves=4, fail_after_waves=2, dedup_target=dd,
    )
    assert st["killed"] and "dedup_turns" not in st

    # resume: remaining waves + the dedup stage
    st2 = run_extraction(
        spark, transcripts_path, out, ckpt, run_id="rd", n_buckets=8,
        n_waves=4, dedup_target=dd,
    )
    assert st2["completed_buckets"] == 4 and st2["dedup_skipped"] is False
    n_eligible = (
        catalog.read_extracted(spark, out)
        .filter(F.col("parse_status") != "rejected")
        .count()
    )
    assert st2["dedup_turns"] == n_eligible
    labels = spark.read.parquet(dd)
    assert labels.count() == n_eligible
    # every turn labeled exactly once; survivor = the cluster's own label
    assert labels.select("turn_uid").distinct().count() == n_eligible
    surv = labels.filter("is_survivor")
    assert surv.count() == st2["dedup_clusters"]
    assert (
        surv.filter(F.col("turn_uid") != F.col("cluster_id")).count() == 0
    )
    # identical texts must share a cluster (exact dup ⊆ near dup)
    ext = catalog.read_extracted(spark, out).filter(
        (F.col("parse_status") != "rejected") & (F.length("extracted_text") > 0)
    )
    jd = (
        ext.select(
            F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias(
                "turn_uid"
            ),
            F.sha2("extracted_text", 256).alias("digest"),
        )
        .join(labels, "turn_uid")
        .groupBy("digest")
        .agg(F.countDistinct("cluster_id").alias("n_clusters"), F.count("*").alias("n"))
        .filter((F.col("n") > 1) & (F.col("n_clusters") > 1))
    )
    assert jd.count() == 0

    # third run: everything (waves AND dedup) resume-skips
    st3 = run_extraction(
        spark, transcripts_path, out, ckpt, run_id="rd", n_buckets=8,
        n_waves=4, dedup_target=dd,
    )
    assert st3["completed_buckets"] == 0 and st3["dedup_skipped"] is True
    assert (
        catalog.read_checkpoint(spark, ckpt)
        .filter(F.col("partition_key") == DEDUP_STAGE_KEY)
        .count()
        == 1
    )


def test_rollup_and_position(spark, transcripts_df):
    ext = extract_turns(transcripts_df)
    roll = conversation_rollup(ext)
    row = roll.filter(F.col("conv_id") == "conv-00000000").collect()[0]
    assert row.n_turns == 800  # the whale
    assert row.n_valid + row.n_rejected <= row.n_turns
    assert row.chars_in > 0

    pos = with_position(ext).filter(F.col("conv_id") == "conv-00000001")
    rows = pos.orderBy("turn_idx").select("turn_idx", "position", "is_container").collect()
    assert [r.position for r in rows] == list(range(len(rows)))
    assert rows[0].is_container and not rows[1].is_container


def test_align_runs_sentinel(spark):
    a = spark.createDataFrame(
        [("c", 0, 10), ("c", 1, 20)], "conv_id string, turn_idx int, chars_out int"
    )
    b = spark.createDataFrame(
        [("c", 0, 10)], "conv_id string, turn_idx int, chars_out int"
    )
    al = align_runs({"t1": a, "t2": b}, ["chars_out"]).orderBy("turn_idx").collect()
    assert al[1].chars_out_t1 == 20 and al[1].chars_out_t2 == -1


def test_sim_sets_grouping(spark):
    a = spark.createDataFrame(
        [("c", 0, "the quick fox"), ("c", 1, "alpha beta")],
        "conv_id string, turn_idx int, extracted_text string",
    )
    b = spark.createDataFrame(
        [("c", 0, "quick the fox"), ("c", 1, "gamma delta")],
        "conv_id string, turn_idx int, extracted_text string",
    )
    s = sim_sets({"t1": a, "t2": b}).orderBy("turn_idx", "sim_set").collect()
    # turn 0: same token bag → one set with both runs
    t0 = [r for r in s if r.turn_idx == 0]
    assert len(t0) == 1 and sorted(t0[0].runs) == ["t1", "t2"]
    # turn 1: different bags → two sets
    t1 = [r for r in s if r.turn_idx == 1]
    assert len(t1) == 2
    assert {r.sim_set for r in t1} == {"set_0", "set_1"}
