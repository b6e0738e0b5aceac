"""P1-P9 scan-side operator semantics (SURVEY.md §2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from smos_spark.operators.masking import (
    drop_all_null_rows,
    filter_conv_range,
    filter_ts_range,
    mask_by_role,
    masked_read,
    subset_semi_join,
)


def test_mask_nulls_values_never_drops_rows(transcripts):
    masked = mask_by_role(transcripts)  # default read set excludes system
    assert masked.count() == transcripts.count()  # rows preserved
    sys_rows = masked.where(F.col("role") == "system")
    assert sys_rows.where(F.col("text").isNotNull()).count() == 0
    assert sys_rows.where(F.col("tool").isNotNull()).count() == 0
    # non-masked rows untouched
    n_text_before = transcripts.where(
        (F.col("role") != "system") & F.col("text").isNotNull()
    ).count()
    n_text_after = masked.where(F.col("text").isNotNull()).count()
    assert n_text_before == n_text_after


def test_helper_column_late_drop(transcripts):
    out = masked_read(transcripts, parameters=["text"])
    assert "role" not in out.columns  # force-read for masking, then popped
    assert "text" in out.columns and "conv_id" in out.columns
    out2 = masked_read(transcripts, parameters=["text", "role"])
    assert "role" in out2.columns


def test_conv_and_ts_range_filters(transcripts):
    sub = filter_conv_range(transcripts, "conv000010", "conv000019")
    ids = {r.conv_id for r in sub.select("conv_id").distinct().collect()}
    assert ids == {f"conv{i:06d}" for i in range(10, 20)}

    tsub = filter_ts_range(transcripts, start="2025-01-02", end="2025-01-03")
    row = tsub.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert str(row.lo) >= "2025-01-02" and str(row.hi) <= "2025-01-03 00:00:00"


def test_subset_semi_join(spark, transcripts):
    keys = spark.createDataFrame(
        [("conv000001",), ("conv000002",), ("conv999999",)], "conv_id string"
    )
    sub = subset_semi_join(transcripts, keys)
    got = {r.conv_id for r in sub.select("conv_id").distinct().collect()}
    assert got == {"conv000001", "conv000002"}
    # semi-join plan should be a broadcast join (no shuffle of big side)
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_drop_all_null_rows(spark):
    df = spark.createDataFrame(
        [("a", None, None), ("b", 1.0, None), ("c", None, "x")],
        "k string, v double, w string",
    )
    out = drop_all_null_rows(df, ["v", "w"])
    assert {r.k for r in out.collect()} == {"b", "c"}
