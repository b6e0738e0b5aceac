"""Regularization + gap-fill — missing buckets become NULL rows.

Reference semantics (load-bearing, SURVEY.md §1.3): missing days are
MATERIALIZED as all-NaN rows, not absent rows — `_read_empty` fabricates
NaN arrays for every missing timestamp on the dense daily grid
(/root/reference/src/smos/interface.py:222-254, :502-525); the pinned
golden is `[0.198517, nan, nan]` for a 3-day range with days 2-3 missing
(/root/reference/tests/test_ICreshuffle.py:39-52).

Spark shape: dense per-key bucket grid (`sequence` + `explode`, the
S4 timestamp-grid generator) LEFT JOIN the tier table (J3). The join
keys are exactly the tier's grouping keys, so with both sides
partitioned on conv_id this is a co-partitioned join; the grid side is
generated, never scanned.

Fill strategies on top of the NULL rows — both pure JVM windows:
* ``forward_fill`` — `last(col, ignorenulls=True)` over
  (conv_id × bucket order).
* ``interpolate_linear`` — positional linear blend between the
  bracketing non-NULL neighbors (window last/first + row_number);
  the grouped-map pandas version survives as the cross-check oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from smos_spark.schema import TIER_PARTIAL_COLS, TIERS

__all__ = [
    "dense_grid",
    "gap_fill",
    "forward_fill",
    "interpolate_linear",
    "interpolate_linear_pandas",
]


def dense_grid(
    tier_df: DataFrame,
    tier: str,
    start=None,
    end=None,
) -> DataFrame:
    """Dense (conv_id, bucket_start) grid spanning each conv's observed
    [min, max] bucket range (or an explicit [start, end]) — the
    tstamps_for_daterange analog (interface.py:502-525)."""
    unit = TIERS[tier]["unit"]
    if start is not None and end is not None:
        bounds = tier_df.select("conv_id").distinct().select(
            "conv_id",
            F.date_trunc(unit, F.lit(start).cast("timestamp")).alias("_lo"),
            F.date_trunc(unit, F.lit(end).cast("timestamp")).alias("_hi"),
        )
    else:
        bounds = tier_df.groupBy("conv_id").agg(
            F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
        )
    if unit == "minute":
        # Chunked grid: one sequence() per conv at the 1m tier would
        # materialize the whole span as a single array row (a year ≈
        # 525k elements — executor OOM / sequence cap territory for
        # long-lived convs). Explode fixed 1440-minute chunks from
        # _lo, then the ≤1440 minutes inside each chunk. Chunk bounds
        # are computed in EPOCH SECONDS (timestamp_seconds), never by
        # interval addition: a day-time interval's day component adds
        # as a CALENDAR day (23/25 h under a DST session timezone),
        # which double-emits or drops the transition minutes; the
        # 1-minute sequence step itself is fixed-duration.
        chunks = bounds.select(
            "conv_id",
            F.unix_timestamp(F.col("_lo").cast("timestamp")).alias("_lo_s"),
            F.unix_timestamp(F.col("_hi").cast("timestamp")).alias("_hi_s"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(
                        (
                            F.unix_timestamp(F.col("_hi").cast("timestamp"))
                            - F.unix_timestamp(F.col("_lo").cast("timestamp"))
                        )
                        / (1440 * 60)
                    ).cast("int"),
                )
            ).alias("_k"),
        )
        return chunks.select(
            "conv_id",
            F.explode(
                F.expr(
                    "sequence(timestamp_seconds(_lo_s + _k * 86400),"
                    " timestamp_seconds(least(_lo_s + _k * 86400 + 86340, _hi_s)),"
                    " interval 1 minute)"
                )
            ).alias("bucket_start"),
        )
    step = f"interval 1 {unit}"
    return bounds.select(
        "conv_id",
        F.explode(F.expr(f"sequence(_lo, _hi, {step})")).alias("bucket_start"),
    )


def gap_fill(tier_df: DataFrame, tier: str, start=None, end=None) -> DataFrame:
    """LEFT JOIN the dense grid against the tier → gap buckets exist as
    rows with NULL partials (never dropped, never zero-filled: a gap
    bucket's n_turns is NULL, matching the reference's NaN rows —
    count 0 would lie about observed-but-empty vs unobserved)."""
    grid = dense_grid(tier_df, tier, start=start, end=end)
    return grid.join(tier_df, ["conv_id", "bucket_start"], "left")


def forward_fill(
    df: DataFrame,
    cols: Sequence[str],
    key: str = "conv_id",
    order: str = "bucket_start",
) -> DataFrame:
    """Forward-fill NULLs per key in bucket order via
    `last(ignorenulls=True)` — no UDF, stays in whole-stage codegen."""
    w = Window.partitionBy(key).orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def interpolate_linear(
    df: DataFrame,
    cols: Sequence[str],
    key: str = "conv_id",
    order: str = "bucket_start",
) -> DataFrame:
    """Linear interpolation of interior NULL runs per key (leading /
    trailing NULLs stay NULL) — pure window expressions, JVM-side.

    For each row: the last non-NULL value/position before it and the
    first after it bracket the NULL run; the fill is the positional
    linear blend (identical to pandas ``interpolate(method='linear',
    limit_area='inside')`` on the regular bucket grid). One window
    shuffle on the key; no Python — at ~10⁶ tiny per-key series the
    grouped-map alternative pays milliseconds of kernel dispatch per
    group (see ``interpolate_linear_pandas``, kept as the
    cross-check oracle)."""
    w = Window.partitionBy(key).orderBy(order)
    w_back = w.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = w.rowsBetween(0, Window.unboundedFollowing)
    rn = F.row_number().over(w)
    out = df.withColumn("_rn", rn)
    for c in cols:
        val = F.col(c).cast("double")
        marked = F.when(val.isNotNull(), F.struct(F.col("_rn").alias("p"), val.alias("v")))
        prev = F.last(marked, ignorenulls=True).over(w_back)
        nxt = F.first(marked, ignorenulls=True).over(w_fwd)
        frac = (F.col("_rn") - prev["p"]).cast("double") / (nxt["p"] - prev["p"]).cast(
            "double"
        )
        interp = F.when(
            val.isNotNull(), val
        ).when(
            prev.isNotNull() & nxt.isNotNull(),
            prev["v"] + (nxt["v"] - prev["v"]) * frac,
        )
        out = out.withColumn(c, interp)
    return out.drop("_rn")


def interpolate_linear_pandas(
    df: DataFrame,
    cols: Sequence[str],
    key: str = "conv_id",
    order: str = "bucket_start",
) -> DataFrame:
    """Grouped-map pandas reference implementation of
    ``interpolate_linear`` (cross-check oracle; the window version is
    the production path)."""
    import pandas as pd

    schema = df.schema
    out_cols = [f.name for f in schema.fields]
    cols = list(cols)

    def _interp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        for c in cols:
            s = pdf[c].astype("float64")
            pdf[c] = s.interpolate(method="linear", limit_area="inside")
        return pdf[out_cols]

    # cast target cols to double so interpolated values fit the schema
    casted = df
    new_fields = []
    for f in schema.fields:
        if f.name in cols:
            casted = casted.withColumn(f.name, F.col(f.name).cast("double"))
            new_fields.append(f"{f.name} double")
        else:
            new_fields.append(f"{f.name} {f.dataType.simpleString()}")
    out_schema = ", ".join(new_fields)
    return casted.groupBy(key).applyInPandas(_interp, schema=out_schema)


def gap_filled_tier(tier_df: DataFrame, tier: str, fill: str = "none") -> DataFrame:
    """Convenience: gap_fill + optional fill strategy over the partials."""
    filled = gap_fill(tier_df, tier)
    if fill == "none":
        return filled
    value_cols = [c for c in TIER_PARTIAL_COLS if c in filled.columns]
    if fill == "ffill":
        return forward_fill(filled, value_cols)
    if fill == "linear":
        return interpolate_linear(filled, value_cols)
    raise ValueError(f"unknown fill strategy: {fill}")
