"""Structured Streaming tier maintenance: streaming results must equal
the batch rollup on the same data (the continuous-aggregate contract),
and file-stream ingest must resume exactly-once."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from smos_spark.operators.rollup import rollup_from_raw
from smos_spark.sources.store import TranscriptStore
from smos_spark.streaming.continuous import stream_ingest, streaming_rollup
from smos_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def turns(spark):
    return synth_transcripts(spark, n_conv=40, seed=11, span_days=2).cache()


def test_streaming_rollup_equals_batch(spark, turns, tmp_path):
    src = str(tmp_path / "src")
    turns.write.parquet(src)

    stream = spark.readStream.schema(turns.schema).parquet(src)
    agg = streaming_rollup(stream, "1m", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tier_1m_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.table("tier_1m_stream")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    exp = (
        rollup_from_raw(turns, "1m")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp)


def test_stream_ingest_builds_tiers_and_resumes(spark, turns, tmp_path):
    src = str(tmp_path / "landing")
    cut = "2025-01-02 00:00:00"
    turns.where(F.col("ts") < F.lit(cut).cast("timestamp")).write.mode(
        "append"
    ).parquet(src)

    store = TranscriptStore(tmp_path / "store", n_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    stream_ingest(spark, store, src, ckpt, run_id="s1")

    d1 = store.read_tier(spark, "1d")
    assert d1.count() > 0
    n_before = store.read_transcripts(spark).count()

    # second file lands → rerun drains ONLY the new file
    turns.where(F.col("ts") >= F.lit(cut).cast("timestamp")).write.mode(
        "append"
    ).parquet(src)
    stream_ingest(spark, store, src, ckpt, run_id="s1")

    assert store.read_transcripts(spark).count() == turns.count()
    # tiers equal the batch rollup over everything (exactly-once)
    got = (
        store.read_tier(spark, "1d")
        .select("conv_id", "bucket_start", "n_turns")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    exp = (
        rollup_from_raw(turns, "1d")
        .select("conv_id", "bucket_start", "n_turns")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert store.read_transcripts(spark).count() == n_before + turns.where(
        F.col("ts") >= F.lit(cut).cast("timestamp")
    ).count()


def test_streaming_dedup_within_watermark(spark, turns, tmp_path):
    """Replayed turns across micro-batches are dropped while inside
    the watermark horizon, and the surviving set equals the batch
    dropDuplicates on the same files; state is watermark-bounded by
    construction (dropDuplicatesWithinWatermark)."""
    from smos_spark.streaming.continuous import streaming_dedup

    src = tmp_path / "landing"
    base = turns.limit(200).cache()
    # batch 1: the original turns; batch 2: a full replay plus 50 new
    base.write.parquet(str(src / "f1"))
    replay = base.unionAll(turns.orderBy(F.desc("conv_id"), "ts").limit(50))
    replay.write.parquet(str(src / "f2"))

    from smos_spark.schema import TRANSCRIPTS_SCHEMA

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        streaming_dedup(stream, watermark="10 days")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_out").select("conv_id", "turn_idx")
    batch_equiv = (
        spark.read.parquet(str(src / "*"))
        .dropDuplicates(["conv_id", "turn_idx"])
        .select("conv_id", "turn_idx")
    )
    assert got.count() == got.dropDuplicates(["conv_id", "turn_idx"]).count()
    assert got.count() == batch_equiv.count()
    assert got.exceptAll(batch_equiv).count() == 0
