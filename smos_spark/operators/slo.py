"""SLO error-budget burn-rate alerts over the event stream.

The multiwindow, multi-burn-rate alert policy (Google SRE workbook
ch. 5, public): an alert fires only when the error-budget burn rate
exceeds its threshold over BOTH a short window (recency — the page
stops quickly once the problem stops) and a long window (severity —
one bad minute cannot page).  This is the canonical *derived alert
series* a retention-tier engine computes from its rolled-up counters,
the same tier discipline as operators/anomaly.py.

Exactness contract (house rules, see operators/anomaly.py):

* the only inputs are integer COUNTS per fixed bucket (`total`,
  `errors`) — no ratios are materialized before the comparison;
* burn rate  errors/total / (budget_ppm/10^6)  >  num/den  is decided
  by the cross-multiplied INTEGER inequality
      errors · 10^6 · den  >  total · budget_ppm · num
  evaluated in decimal(38,0) (Spark) / HUGEINT (DuckDB) so it stays
  exact at 10^12-row scale;
* the display columns `burn_fast_ppm` / `burn_slow_ppm` are
  floor(burn · 10^6) computed with the IDENTICAL double expression in
  both engines (same operands, same order — bit-equal, so the floor
  is equal), matching the xcorr_ppm convention in operators/stats.py.

Long windows are rolling sums over the SHORT buckets via a
rangeBetween frame on the integer bucket index, so bucket gaps (no
traffic) shorten the long sum instead of silently stretching it —
rows-between would be wrong on sparse series.

Scale: one groupBy down to (key, bucket) counters — the raw stream is
scanned once and reduced map-side; the window exchange afterwards
moves only O(keys · buckets) counter rows, never raw events.

Reference analog: the reference's per-day RFI/quality-flag fraction
screens (/root/reference/src/smos/smos_l2/reshuffle.py:60-75) are
exactly this shape — a ratio-of-counters health signal per time
bucket; at tier scale it becomes a windowed burn-rate policy.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["slo_burn_rate"]

_DEC = "decimal(38,0)"


def _dec(col):
    return col.cast(_DEC)


def slo_burn_rate(
    df: DataFrame,
    is_error_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    short_sec: int = 3600,
    long_buckets: int = 6,
    budget_ppm: int = 250_000,
    fast_num: int = 6,
    fast_den: int = 5,
    slow_num: int = 21,
    slow_den: int = 20,
) -> DataFrame:
    """Multiwindow multi-burn-rate SLO alerts per key.

    Parameters mirror the SRE-workbook policy: `budget_ppm` is the
    error budget 1−SLO in parts-per-million (250_000 = a 75 % SLO);
    the fast policy fires when the burn rate over ONE short bucket
    exceeds fast_num/fast_den, the slow policy when the burn over the
    trailing `long_buckets` buckets exceeds slow_num/slow_den; `alert`
    is 1 only when BOTH fire (the multiwindow AND).

    Output: one row per (key, bucket) with the short/long counters,
    floor-ppm burn rates, and the integer-exact `fast_exceeded`,
    `slow_exceeded`, `alert` flags (0/1 bigint).
    """
    if not 0 < budget_ppm <= 1_000_000:
        raise ValueError(f"budget_ppm must be in (0, 10^6], got {budget_ppm}")
    if long_buckets < 1:
        raise ValueError(f"long_buckets must be >= 1, got {long_buckets}")
    if min(fast_num, fast_den, slow_num, slow_den) <= 0:
        raise ValueError("burn-rate thresholds must be positive rationals")
    keys = list(key_cols)

    # integral `div`, NOT double `/`: near an exact bucket boundary the
    # rounded double quotient could cross the integer and mis-bucket
    width_us = int(short_sec) * 1_000_000
    bucket = F.expr(
        f"unix_micros(CAST({ts_col} AS TIMESTAMP)) div {width_us}L"
    )
    counters = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*keys, bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(
                F.when(F.col(is_error_col), F.lit(1)).otherwise(F.lit(0))
            ).alias("errors"),
        )
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rangeBetween(-(int(long_buckets) - 1), 0)
    )
    long_total = F.sum("total").over(w)
    long_errors = F.sum("errors").over(w)

    def _exceeded(err, tot, num, den):
        lhs = _dec(err) * _dec(F.lit(1_000_000)) * _dec(F.lit(int(den)))
        rhs = _dec(tot) * _dec(F.lit(int(budget_ppm))) * _dec(F.lit(int(num)))
        return F.when(lhs > rhs, F.lit(1)).otherwise(F.lit(0)).cast("long")

    def _ppm(err, tot):
        # identical double expression both engines; floor of bit-equal
        # doubles is equal (xcorr_ppm convention)
        burn = (
            err.cast("double")
            * F.lit(1_000_000.0)
            / (tot.cast("double") * F.lit(float(budget_ppm)))
        )
        return F.floor(burn * F.lit(1_000_000.0)).cast("long")

    out = (
        counters.withColumn("long_total", long_total)
        .withColumn("long_errors", long_errors)
        .withColumn(
            "bucket_ts",
            F.timestamp_micros(F.col("bucket") * F.lit(width_us)),
        )
        .withColumn("burn_fast_ppm", _ppm(F.col("errors"), F.col("total")))
        .withColumn(
            "burn_slow_ppm", _ppm(F.col("long_errors"), F.col("long_total"))
        )
        .withColumn(
            "fast_exceeded",
            _exceeded(F.col("errors"), F.col("total"), fast_num, fast_den),
        )
        .withColumn(
            "slow_exceeded",
            _exceeded(
                F.col("long_errors"), F.col("long_total"), slow_num, slow_den
            ),
        )
        .withColumn(
            "alert",
            (F.col("fast_exceeded") * F.col("slow_exceeded")).cast("long"),
        )
    )
    return out.select(
        *keys,
        "bucket",
        "bucket_ts",
        "total",
        "errors",
        "long_total",
        "long_errors",
        "burn_fast_ppm",
        "burn_slow_ppm",
        "fast_exceeded",
        "slow_exceeded",
        "alert",
    )
