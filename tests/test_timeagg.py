"""Duration-weighted aggregates: golden values, clipping, determinism."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from smos_spark.operators.timeagg import (
    ohlc,
    state_durations,
    time_weighted_avg,
    uptime,
)

_SCHEMA = "user_id string, ts timestamp, event_id long, value double"
_T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _at(sec: float) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=sec)


def test_ohlc_golden_and_tie_determinism(spark):
    # two samples share ts=0; event_id breaks the tie for open
    rows = [
        ("u", _at(0), 2, 5.00),   # tie, higher event_id
        ("u", _at(0), 1, 3.00),   # open (same ts, lower event_id)
        ("u", _at(10), 3, 9.00),  # high
        ("u", _at(20), 4, 1.00),  # low
        ("u", _at(30), 5, 4.00),  # close
        ("u", _at(3700), 6, 7.00),  # next hour bucket
        ("u", None, 7, 8.0),
        ("u", _at(40), 8, None),
    ]
    out = {
        r["bucket_start"]: r
        for r in ohlc(spark.createDataFrame(rows, _SCHEMA)).collect()
    }
    b0 = out[_T0]
    assert (b0["open_cents"], b0["high_cents"], b0["low_cents"],
            b0["close_cents"]) == (300, 900, 100, 400)
    assert b0["n_samples"] == 5 and b0["vsum_cents"] == 2200
    b1 = out[_T0 + dt.timedelta(hours=1)]
    assert b1["open_cents"] == b1["close_cents"] == 700
    assert len(out) == 2  # NULL ts / value rows contribute nothing


def test_time_weighted_avg_locf_and_day_clip(spark):
    day0 = dt.datetime(2024, 1, 1)
    rows = [
        # u: 2.00 for 100s, then 4.00 until day end (clipped: the next
        # sample is on day 2)
        ("u", day0.replace(hour=23, minute=58), 1, 2.00),
        ("u", day0.replace(hour=23, minute=58, second=100 - 60), 2, 4.00),
        ("u", day0 + dt.timedelta(days=1, hours=1), 3, 6.00),  # day 2
        ("v", day0.replace(hour=12), 4, 10.00),  # single sample
    ]
    out = {
        (r["user_id"], r["day"]): (int(r["twa_num"]), r["twa_den"])
        for r in time_weighted_avg(
            spark.createDataFrame(rows, _SCHEMA)
        ).collect()
    }
    # u day1: 200c * 40s + 400c * 80s (to midnight) in µs
    num, den = out[("u", day0)]
    assert den == 120_000_000
    assert num == 200 * 40_000_000 + 400 * 80_000_000
    # u day2: sample covers to end of ITS day (no successor)
    num2, den2 = out[("u", day0 + dt.timedelta(days=1))]
    assert den2 == 23 * 3600 * 1_000_000 and num2 == 600 * den2
    # v: single observation still emits (covers to its day end)
    numv, denv = out[("v", day0)]
    assert denv == 12 * 3600 * 1_000_000 and numv == 1000 * denv


def test_state_durations_golden(spark):
    rows = [
        ("c", _at(0), 0, "user"),
        ("c", _at(10), 1, "assistant"),
        ("c", _at(40), 2, "user"),
        ("c", _at(45), 3, "assistant"),  # final row: open interval
        ("d", _at(0), 0, "tool"),        # only row: no closed interval
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, ts timestamp, turn_idx long, role string"
    )
    out = {
        (r["conv_id"], r["role"]): (r["total_us"], r["n_intervals"])
        for r in state_durations(df).collect()
    }
    assert out[("c", "user")] == ((10 + 5) * 1_000_000, 2)
    assert out[("c", "assistant")] == (30 * 1_000_000, 1)
    assert ("d", "tool") not in out


def test_uptime_union_semantics(spark):
    rows = [
        # beats at 0s, 10s (gap 10 < 60 live), 200s (gap 190 > live)
        ("u", _at(0), 0, 0.0),
        ("u", _at(10), 1, 0.0),
        ("u", _at(200), 2, 0.0),
    ]
    r = uptime(
        spark.createDataFrame(rows, _SCHEMA), liveness_sec=60.0
    ).collect()[0]
    assert r["n_beats"] == 3 and r["span_us"] == 200_000_000
    # 10s (merged overlap) + 60s (beat 2 expires) + 60s (last beat)
    assert r["up_us"] == (10 + 60 + 60) * 1_000_000


def test_mad_outliers_golden_and_guard(spark):
    from smos_spark.operators.anomaly import mad_outliers

    # group g: values 1..9 plus one wild point; med=5, MAD=2
    rows = [("g", float(v), i) for i, v in enumerate(range(1, 10))]
    rows.append(("g", 100.0, 99))
    df = spark.createDataFrame(rows, "grp string, value double, id long")
    out = mad_outliers(df, "value", ["grp"], ["id"], k_num=5, k_den=1)
    flagged = {r["id"]: r for r in out.collect()}
    # |100-5| = 95 > 5*MAD. MAD of devs {400,300,...,0,...,9500}/2:
    # dev2 values are 2|v*100 - med2/… — just assert the wild point
    # and only the wild point is flagged at k=5
    assert set(flagged) == {99}
    r = flagged[99]
    assert r["value_cents"] == 10000 and r["med2"] == 2 * 550.0
    with pytest.raises(ValueError):
        mad_outliers(df, "value", ["grp"], ["id"], k_num=0)


def test_timeagg_plan_shapes(spark):
    """ohlc: ONE exchange, map-side-combined, NO per-key Window.
    twa / uptime / state_durations: ONE exchange total — the groupBy's
    clustering contains the window's partition key, so Spark reuses
    the window exchange instead of reshuffling."""
    rows = [("u", _at(i), i, float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, _SCHEMA)

    def plan(d):
        return d._jdf.queryExecution().executedPlan().toString()

    p = plan(ohlc(df))
    assert p.count("Exchange hashpartitioning") == 1
    assert "Window" not in p

    for d in (
        time_weighted_avg(df),
        uptime(df),
        state_durations(
            df.withColumnRenamed("value", "x").withColumn(
                "role", F.lit("r")
            ),
            key_cols=("user_id",),
            tie_cols=("event_id",),
        ),
    ):
        p = plan(d)
        assert p.count("Exchange hashpartitioning") == 1, p
        assert p.count("Window") == 1, p


def test_time_weighted_buckets_carry_and_guard(spark):
    from smos_spark.operators.timeagg import time_weighted_buckets

    h = 3600
    rows = [
        # u: value 2.00 at 00:30, next at 03:15 -> covers buckets
        # 0 (30min), 1 (full, NO sample inside — the carry), 2 (full),
        # 3 (15min); then 4.00 at 03:15 is the final sample (no end,
        # contributes nothing)
        ("u", _T0.replace(hour=0, minute=30), 1, 2.00),
        ("u", _T0.replace(hour=3, minute=15), 2, 4.00),
    ]
    out = {
        r["bucket_start"].hour: (int(r["twa_num"]), r["twa_den"])
        for r in time_weighted_buckets(
            spark.createDataFrame(rows, _SCHEMA), width_sec=3600.0
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0] == (200 * 1800 * 10**6, 1800 * 10**6)
    assert out[1] == (200 * h * 10**6, h * 10**6)   # carried, sample-free
    assert out[2] == (200 * h * 10**6, h * 10**6)
    assert out[3] == (200 * 900 * 10**6, 900 * 10**6)

    # the distributed span guard fails the job rather than fanning out
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    wide = spark.createDataFrame(
        [("u", _T0, 1, 1.0), ("u", _T0 + dt.timedelta(days=30), 2, 2.0)],
        _SCHEMA,
    )
    with _pytest.raises((Py4JJavaError, PySparkException, Exception)):
        time_weighted_buckets(
            wide, width_sec=3600.0, max_span_buckets=10
        ).collect()
    with _pytest.raises(ValueError):
        time_weighted_buckets(wide, width_sec=0.0)


def test_uptime_partials_merge_equals_direct(spark):
    """Daily partials stitched with the seam correction must equal the
    direct computation over the group's raw beats EXACTLY — including
    a beat whose liveness tail crosses midnight into the next day."""
    from smos_spark.operators.timeagg import (
        uptime,
        uptime_merge,
        uptime_partials,
    )

    day0 = dt.datetime(2024, 1, 1)
    rows = [
        # day 1 tail crosses midnight: beat at 23:59, live 300s
        ("u", day0.replace(hour=23, minute=50), 1, 0.0),
        ("u", day0.replace(hour=23, minute=59), 2, 0.0),
        # day 2 beat 60s after midnight: seam overlap with the tail
        ("u", day0 + dt.timedelta(days=1, minutes=1), 3, 0.0),
        ("u", day0 + dt.timedelta(days=1, hours=5), 4, 0.0),
        # a second key entirely inside one day
        ("v", day0.replace(hour=2), 5, 0.0),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    parts = uptime_partials(df, liveness_sec=300.0, unit="day")
    merged = (
        uptime_merge(
            parts.withColumn("week", F.date_trunc("week", "chunk")),
            group_cols=("week",),
            liveness_sec=300.0,
        )
        .toPandas()
        .sort_values(["user_id", "week"])
        .reset_index(drop=True)
    )
    direct = (
        uptime(
            df.withColumn("week", F.date_trunc("week", "ts")),
            key_cols=("user_id", "week"),
            liveness_sec=300.0,
        )
        .toPandas()
        .sort_values(["user_id", "week"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        merged[sorted(merged.columns)], direct[sorted(direct.columns)]
    )
    # the seam must actually have fired: day-1's tail overlaps day-2's
    # first beat (gap 120s < 300s liveness), so the merged union is
    # strictly below the no-overlap sum
    # hand value: beat gaps are 540s (> liveness → 300s), 120s (seam,
    # < liveness → 120s), 4h59m (> liveness → 300s), final tail 300s
    # → 300 + 120 + 300 + 300 = 1020s
    u = merged[merged.user_id == "u"].iloc[0]
    assert u["n_beats"] == 4 and u["up_us"] == 1_020_000_000


def test_state_duration_partials_merge_equals_direct(spark):
    """Chunk-local role durations + seam rows must equal the direct
    weekly computation EXACTLY, including the cross-midnight interval
    attributed to the earlier day's last state."""
    import pandas as pd

    from smos_spark.operators.timeagg import (
        state_duration_merge,
        state_duration_partials,
        state_durations,
    )

    day0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c", day0.replace(hour=23, minute=0), 0, "user"),
        ("c", day0.replace(hour=23, minute=30), 1, "assistant"),
        # next row is on day 2: the 23:30->01:00 interval (5400s) must
        # come back as a seam attributed to 'assistant'
        ("c", day0 + dt.timedelta(days=1, hours=1), 2, "user"),
        ("c", day0 + dt.timedelta(days=1, hours=2), 3, "tool"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, ts timestamp, turn_idx long, role string"
    )
    states, boundary = state_duration_partials(df, unit="day")
    wk = lambda d: d.withColumn("week", F.date_trunc("week", "chunk"))
    merged = (
        state_duration_merge(wk(states), wk(boundary))
        .toPandas()
        .sort_values(["conv_id", "week", "state"])
        .reset_index(drop=True)
    )
    direct = (
        state_durations(
            df.withColumn("week", F.date_trunc("week", "ts")),
            key_cols=("conv_id", "week"),
        )
        .withColumnRenamed("role", "state")
        .toPandas()
        .sort_values(["conv_id", "week", "state"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        merged[sorted(merged.columns)], direct[sorted(direct.columns)]
    )
    got = {r["state"]: r["total_us"] for _, r in merged.iterrows()}
    assert got["user"] == (1800 + 3600) * 1_000_000
    assert got["assistant"] == 5400 * 1_000_000  # the seam interval


def test_ohlc_merge_equals_direct(spark):
    """Hourly→daily candlestick reaggregation must equal running ohlc
    at the daily width directly — including a day whose open/close
    live in different hours."""
    import pandas as pd

    from smos_spark.operators.timeagg import ohlc, ohlc_merge

    rows = [
        ("u", _T0.replace(hour=1, minute=5), 1, 5.00),   # day open
        ("u", _T0.replace(hour=1, minute=30), 2, 9.00),  # day high
        ("u", _T0.replace(hour=13, minute=0), 3, 1.00),  # day low
        ("u", _T0.replace(hour=22, minute=59), 4, 4.00), # day close
        ("u", _T0 + dt.timedelta(days=1), 5, 7.00),      # next day
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    merged = (
        ohlc_merge(ohlc(df, width_sec=3600.0), width_sec=86400.0)
        .toPandas()
        .sort_values(["user_id", "bucket_start"])
        .reset_index(drop=True)
    )
    direct = (
        ohlc(df, width_sec=86400.0)
        .toPandas()
        .sort_values(["user_id", "bucket_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged[direct.columns], direct)
    d1 = merged.iloc[0]
    assert (d1["open_cents"], d1["high_cents"], d1["low_cents"],
            d1["close_cents"]) == (500, 900, 100, 400)


class TestWeightedMedian:
    def test_golden_day_clip_and_crossing(self, spark):
        from smos_spark.operators.timeagg import weighted_median

        day0 = dt.datetime(2024, 1, 1)
        rows = [
            # u: 1.00 for 6h, 3.00 for 6h, 2.00 for 12h (to day end)
            ("u", day0, 1, 1.00),
            ("u", day0 + dt.timedelta(hours=6), 2, 3.00),
            ("u", day0 + dt.timedelta(hours=12), 3, 2.00),
            # v: single sample covers 12:00 -> midnight
            ("v", day0 + dt.timedelta(hours=12), 4, 10.00),
            ("v", None, 5, 1.0),
            ("v", day0 + dt.timedelta(hours=13), 6, None),
        ]
        out = {
            r["user_id"]: r
            for r in weighted_median(
                spark.createDataFrame(rows, _SCHEMA)
            ).collect()
        }
        u = out["u"]
        # cumulative by cents: 100->6h, 200->18h (crossing: 2*6<24<=2*18)
        assert u["wmedian_cents"] == 200
        assert u["total_us"] == 86_400_000_000
        assert u["n_samples"] == 3
        v = out["v"]
        assert v["wmedian_cents"] == 1000
        assert v["total_us"] == 12 * 3_600_000_000
        assert v["n_samples"] == 1

    def test_even_split_takes_lower_level(self, spark):
        from smos_spark.operators.timeagg import weighted_median

        day0 = dt.datetime(2024, 1, 1)
        rows = [
            ("u", day0, 1, 1.00),
            ("u", day0 + dt.timedelta(hours=12), 2, 2.00),
        ]
        [r] = weighted_median(spark.createDataFrame(rows, _SCHEMA)).collect()
        # exactly half the mass at 100: 2*cumw == total -> lower median
        assert r["wmedian_cents"] == 100

    def test_no_cross_day_carry(self, spark):
        from smos_spark.operators.timeagg import weighted_median

        day0 = dt.datetime(2024, 1, 1)
        rows = [
            ("u", day0.replace(hour=23), 1, 5.00),
            ("u", day0 + dt.timedelta(days=1, hours=1), 2, 7.00),
        ]
        out = {
            r["day"]: r
            for r in weighted_median(
                spark.createDataFrame(rows, _SCHEMA)
            ).collect()
        }
        # day 1: the 23:00 sample covers only to ITS day end (1h)
        assert out[day0]["wmedian_cents"] == 500
        assert out[day0]["total_us"] == 3_600_000_000
        # day 2: the 01:00 sample covers to day-2 end (23h)
        d2 = out[day0 + dt.timedelta(days=1)]
        assert d2["wmedian_cents"] == 700
        assert d2["total_us"] == 23 * 3_600_000_000
