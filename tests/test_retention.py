"""Retention enforcement: aged-out tier partitions are dropped whole,
survivors untouched, expiry recorded in lineage + overview floor."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from smos_spark.operators.retention import apply_retention
from smos_spark.operators.rollup import reaggregate, rollup_from_raw
from smos_spark.sources.store import TranscriptStore
from smos_spark.synth import synth_transcripts


def test_apply_retention(spark, tmp_path):
    t = synth_transcripts(spark, n_conv=30, seed=21, span_days=6)
    store = TranscriptStore(tmp_path / "store", n_buckets=4)
    m1 = rollup_from_raw(t, "1m")
    store.write_tier(m1, "1m")
    store.write_tier(reaggregate(m1, "1h"), "1h")
    store.write_tier(reaggregate(m1, "1d"), "1d")

    all_dates = sorted(
        d.name.split("=")[1] for d in Path(store.tier_path("1m")).glob("bucket_date=*")
    )
    assert len(all_dates) >= 5
    # keep 2 days of 1m, 4 days of 1h, all of 1d, as of the last day
    now = all_dates[-1]
    dropped = apply_retention(
        spark, store, now, policy={"1m": 2, "1h": 4, "1d": None}
    )

    kept_1m = sorted(
        d.name.split("=")[1] for d in Path(store.tier_path("1m")).glob("bucket_date=*")
    )
    assert dropped["1m"] == [d for d in all_dates if d not in kept_1m]
    assert all(d >= min(kept_1m) for d in kept_1m)
    assert len(dropped["1m"]) > 0
    assert len(dropped["1h"]) > 0
    assert dropped["1d"] == []

    # surviving data still reads, and equals a fresh rollup restricted
    # to the retained window (drop nothing inside the horizon)
    kept = store.read_tier(spark, "1m")
    exp = rollup_from_raw(t, "1m").where(
        F.to_date("bucket_start") >= min(kept_1m)
    )
    assert kept.count() == exp.count()
    assert kept.exceptAll(exp).count() == 0

    # lineage rows recorded per dropped partition
    cp = store.read_checkpoint(spark)
    exp_rows = len(dropped["1m"]) + len(dropped["1h"])
    assert cp.where(F.col("run_id") == "retention").count() == exp_rows

    # overview floor advertised for expired tiers
    ov = store.load_overview()
    assert "1m" in ov.extra["retention_floor"]
    assert "1h" in ov.extra["retention_floor"]
    assert "1d" not in ov.extra["retention_floor"]

    # idempotent: second run drops nothing further
    dropped2 = apply_retention(
        spark, store, now, policy={"1m": 2, "1h": 4, "1d": None}
    )
    assert all(not v for v in dropped2.values())


def test_retention_expires_blocks_too(spark, tmp_path):
    """The compressed block store shares the tier's horizon: expired
    day partitions disappear from blocks_<tier>, lineage records each
    drop, and surviving blocks still decode."""
    from smos_spark.operators.compress import compress_series, decompress_series
    from smos_spark.operators.rollup import rollup_from_raw
    from smos_spark.sources.store import TranscriptStore
    from smos_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_conv=20, seed=13, span_days=6)
    store = TranscriptStore(str(tmp_path / "rb"), n_buckets=4)
    m1 = rollup_from_raw(t, "1m")
    store.write_tier(m1, "1m")
    blocks = compress_series(
        m1.select(
            "conv_id",
            F.col("bucket_start").alias("ts"),
            F.col("n_turns").cast("double").alias("n_turns"),
        ),
        ["n_turns"],
        stats=True,
        slice_col=F.to_date("ts"),
    )
    store.write_blocks(blocks, tier="1m")
    days = sorted(
        d.name.split("=")[1]
        for d in (tmp_path / "rb" / "blocks_1m").glob("block_date=*")
    )
    assert len(days) >= 4
    now = days[-1]
    dropped = apply_retention(spark, store, now, policy={"1m": 2})
    blk_dropped = [d for d in dropped["1m"] if d.startswith("blocks:")]
    assert blk_dropped
    left = sorted(
        d.name.split("=")[1]
        for d in (tmp_path / "rb" / "blocks_1m").glob("block_date=*")
    )
    import datetime as dt

    cutoff = dt.date.fromisoformat(now) - dt.timedelta(days=2)
    assert all(dt.date.fromisoformat(d) >= cutoff for d in left)
    # survivors still decode
    surv = decompress_series(
        store.read_blocks(spark, "1m").drop("block_date"), ["n_turns"]
    )
    assert surv.count() > 0
    # lineage rows for the block drops
    cp = store.read_checkpoint(spark)
    assert cp.where(F.col("tier") == "blocks_1m").count() == len(blk_dropped)
