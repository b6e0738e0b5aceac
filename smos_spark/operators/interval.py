"""Interval (range-overlap) join — attach point events to the
intervals that contain them.

The missing piece of the time-series join algebra next to `asof_join`
(nearest-in-time) and `gap_fill` (grid left join): "which session /
maintenance window / attribution window does this event fall in".
Reference analog: the per-date image lookup resolves a timestamp into
the file interval covering it (/root/reference/src/smos/interface.py
date-indexed multi-file datasets); here the interval side is a
first-class table (e.g. `session_stats` output).

Spark-first shape: NOT the naive theta join
``l.ts BETWEEN r.start AND r.end`` — Catalyst plans that as
BroadcastNestedLoop/cartesian-per-key, O(points × intervals) at every
scale. Instead the classic bucketed range join (the same technique
Databricks' range-join optimization and every streaming interval join
use, public knowledge):

* pick a bucket width W (default: provided by the caller, typically
  the P99 interval length);
* every interval is exploded into the width-W buckets it spans —
  ``floor(start/W) .. floor(end/W)``, a bounded fan-out of
  ``len/W + 1`` copies;
* every point belongs to exactly ONE bucket, so the (key, bucket)
  equi-join matches each (point, interval) pair at most once — no
  post-join dedup — and the final ``start <= ts <= end`` filter is
  exact;
* a guard rejects intervals spanning more than ``max_buckets``
  buckets (a degenerate year-long interval under a minute-wide W
  would fan out 500k copies); widen W instead.

One shuffle on (key, bucket) for each side; fan-out bounded by
interval-length/W. Equi-join means AQE can split skewed buckets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    width_sec: float,
    on: str | Sequence[str] = "conv_id",
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    how: str = "inner",
    max_buckets: int = 4096,
) -> DataFrame:
    """Join every point row to every interval row of the same key with
    ``start_col <= ts < = end_col`` (both ends inclusive — SQL BETWEEN
    semantics). Output: all point columns + all non-key interval
    columns (caller renames collisions beforehand; a collision
    raises). ``how="inner"`` keeps matched points; ``how="left"``
    keeps unmatched points with NULL interval columns.

    ``width_sec`` is the bucket width; intervals longer than
    ``max_buckets * width_sec`` raise at plan-build time on the
    driver-side guard column (checked distributedly, fails the job
    rather than silently exploding).

    NULL handling: points with NULL ts and intervals with NULL bounds
    cannot overlap anything — dropped from the join (for
    ``how="left"`` the NULL-ts points still surface with NULL
    interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if width_sec <= 0:
        raise ValueError("width_sec must be positive")
    keys = [on] if isinstance(on, str) else list(on)
    clash = (set(intervals.columns) - set(keys)) & set(points.columns)
    if clash:
        raise ValueError(
            f"interval columns collide with point columns: {sorted(clash)}; "
            "rename before joining"
        )
    win_us = int(round(width_sec * 1_000_000))

    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = points.where(F.col(ts_col).isNotNull()).withColumn(
        "_bkt", F.floor(us(ts_col) / F.lit(win_us))
    )
    iv = intervals.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    )
    b0, b1 = F.floor(us(start_col) / F.lit(win_us)), F.floor(
        us(end_col) / F.lit(win_us)
    )
    # distributed guard: raise_error inside the span expression fails
    # the job on the first degenerate interval instead of fanning out
    span = b1 - b0 + 1
    span = F.when(
        span > max_buckets,
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: interval spans more than {max_buckets} "
                    f"buckets of {width_sec}s — widen width_sec (key="
                ),
                F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(span)
    iv = iv.withColumn(
        "_bkt", F.explode(F.sequence(b0, b0 + span - 1))
    )

    cond = [p["_bkt"] == iv["_bkt"]] + [
        p[k].eqNullSafe(iv[k]) for k in keys
    ]
    joined = p.join(iv, cond, "inner").where(
        (p[ts_col] >= iv[start_col]) & (p[ts_col] <= iv[end_col])
    )
    out_cols = [p[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in keys
    ]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    # left: a point is unmatched only if NO interval matched — union
    # the anti-join remainder (incl. NULL-ts points, which never enter
    # the bucketed join) with NULL interval columns. The anti-join
    # must be NULL-SAFE on every point column: with plain equality a
    # matched row carrying a NULL attribute never equals its own image
    # in `matched` and would be re-emitted as unmatched. `matched` is
    # persisted briefly so the bucketed join runs ONCE, not once per
    # union branch (bounded lifetime via the package cache ring).
    from smos_spark.operators.dedup import _release_later

    matched = matched.persist()
    _release_later(matched)
    seen = matched.select(*[F.col(c) for c in points.columns]).distinct()
    anti = [points[c].eqNullSafe(seen[c]) for c in points.columns]
    unmatched = points.join(seen, anti, "left_anti").select(
        *points.columns,
        *[
            F.lit(None).cast(intervals.schema[c].dataType).alias(c)
            for c in intervals.columns
            if c not in keys
        ],
    )
    return matched.unionByName(unmatched)
