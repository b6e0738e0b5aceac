"""Presentation-rate downsampling and per-series diagnostics.

The north-rule pipeline is rollup + downsample + retention; the tier
rollups (``rollup.py``) keep *aggregates* per bucket, while the
operators here keep or derive *representative rows*:

* ``m4_downsample`` — the M4 width-bucket downsample (Jugel et al.,
  VLDB 2014, public): per (key, pixel bucket) keep only the rows
  realizing first / last / min / max of the value.  M4 is the
  error-free choice for line-chart rendering: connecting the kept
  points reproduces the exact pixel raster of the full series at the
  chosen width.  Reference parity: this is the presentation-side
  twin of the reference's bulk reshuffle→plot path
  (/root/reference/src/smos/interface.py:222-254 reads dense series
  for plotting); at 10^12 turns you downsample server-side instead.
* ``counter_rate`` — reset-aware per-bucket increase of a cumulative
  counter (the Prometheus ``increase()`` semantics, public): a sample
  below its predecessor is a counter reset, contributing its own
  value instead of a negative delta.
* ``largest_gaps`` — per-key top-k largest sampling gaps (outage /
  data-loss detection); integer-µs arithmetic end-to-end.

Scale shape: each operator is ONE hash Exchange on its window
partition key. ``m4_downsample`` partitions by (key, bucket) so the
densest single bucket — not the hottest key — bounds task size; the
four orderings are in-partition sorts on the same Exchange.
``counter_rate`` and ``largest_gaps`` partition per key; for
pathological hot keys the bounded-partition pattern of
``rollup.rolling_stats_bucketed`` applies unchanged.

All comparisons are on raw column values (ordering, never float
arithmetic except the caller-visible counter deltas), so the DuckDB
twins in ``__spark_entry__.oracle_sql`` match exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from smos_spark.operators.rollup import _width_bucket

__all__ = ["m4_downsample", "counter_rate", "largest_gaps"]


def m4_downsample(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    width_sec: float = 3600.0,
    origin: str | None = None,
    tie_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Keep the ≤4 anchor rows (first/last/min/max) per (key, bucket).

    Rows with NULL ``ts_col`` or ``value_col`` are dropped (they can
    render nothing).  Ties are broken deterministically by
    (ts, *tie_cols) so the same anchors are chosen on every engine
    and every run.  Output: the input's key/ts/value columns plus
    ``bucket_start`` and four booleans ``is_first/is_last/is_min/
    is_max`` (one row may carry several — a bucket with one point is
    all four).
    """
    keys = [F.col(k) for k in key_cols]
    ties = [F.col(t) for t in tie_cols]
    work = (
        df.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .withColumn("bucket_start", _width_bucket(F.col(ts_col), width_sec, origin))
    )
    part = Window.partitionBy(*keys, F.col("bucket_start"))
    ts, val = F.col(ts_col), F.col(value_col)
    orders = {
        "is_first": [ts.asc(), *[t.asc() for t in ties]],
        "is_last": [ts.desc(), *[t.desc() for t in ties]],
        "is_min": [val.asc(), ts.asc(), *[t.asc() for t in ties]],
        "is_max": [val.desc(), ts.asc(), *[t.asc() for t in ties]],
    }
    for name, order in orders.items():
        work = work.withColumn(
            name, F.row_number().over(part.orderBy(*order)) == 1
        )
    flags = [F.col(n) for n in orders]
    kept = work.where(flags[0] | flags[1] | flags[2] | flags[3])
    return kept.select(
        *key_cols, "bucket_start", *tie_cols, ts_col, value_col, *orders.keys()
    )


def counter_rate(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    counter_col: str = "counter",
    width_sec: float = 3600.0,
    origin: str | None = None,
    tie_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Per-bucket increase of a cumulative counter with reset handling.

    Prometheus ``increase()`` semantics (public): sample-over-sample
    delta is ``v - prev`` when monotone, else ``v`` (the counter reset
    to 0 and climbed back to v; the pre-reset remainder is
    unknowable and dropped).  A key's first sample contributes 0 — no
    predecessor exists to measure from.  Output: one row per
    (key, bucket) with ``increase`` (sum of deltas, exact for integer
    counters) and ``n_samples``.
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col), *[F.col(t) for t in tie_cols]
    )
    v, prev = F.col(counter_col), F.lag(F.col(counter_col)).over(w)
    delta = (
        F.when(prev.isNull(), F.lit(0))
        .when(v >= prev, v - prev)
        .otherwise(v)
    )
    return (
        df.where(F.col(ts_col).isNotNull() & F.col(counter_col).isNotNull())
        .withColumn("_delta", delta)
        .groupBy(*keys, _width_bucket(F.col(ts_col), width_sec, origin).alias("bucket_start"))
        .agg(
            F.sum("_delta").alias("increase"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


def largest_gaps(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    top_k: int = 3,
    tie_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Top-k largest inter-sample gaps per key (outage detection).

    Gap = µs between consecutive samples in (ts, *tie_cols) order;
    a key's first sample opens no gap.  Ranking breaks ties by
    earlier ``gap_end`` (then tie cols) so top-k is deterministic.
    Output: key cols, ``gap_start``, ``gap_end``, ``gap_us``,
    ``gap_rank`` (1 = largest).
    """
    keys = [F.col(k) for k in key_cols]
    ties = [F.col(t) for t in tie_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), *ties)
    # cast("timestamp"): parquet NTZ timestamps are not valid unix_micros
    # input; the cast is a no-op under the session's pinned UTC tz
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("gap_start", F.lag(F.col(ts_col)).over(w))
        .withColumn(
            "gap_us", us - F.unix_micros(F.col("gap_start").cast("timestamp"))
        )
        .where(F.col("gap_us").isNotNull())
    )
    rank_w = Window.partitionBy(*keys).orderBy(
        F.col("gap_us").desc(), F.col(ts_col).asc(), *[t.asc() for t in ties]
    )
    return (
        gaps.withColumn("gap_rank", F.row_number().over(rank_w))
        .where(F.col("gap_rank") <= top_k)
        .select(
            *key_cols,
            "gap_start",
            F.col(ts_col).alias("gap_end"),
            "gap_us",
            "gap_rank",
        )
    )
