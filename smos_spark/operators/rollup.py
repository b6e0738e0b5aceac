"""Retention-tier rollup cascade — the engine's core aggregation.

The reference's core operation is the img2ts pivot: time-major daily
images → location-major per-point series, clustered into 5°×5° cell
files (/root/reference/src/smos/smos_ic/reshuffle_ic.py:85-91,
docs/img2ts.rst:8-16). Our analog is a keyed windowed aggregation:
raw turns → per-(conv_id, bucket) partial aggregates at the 1m tier,
then *exact* re-aggregation 1m→1h→1d (sums/counts/min/max re-aggregate
losslessly; rates and means are derived views, never stored).

Scale notes (100 TB / 1000 executors):
* One wide shuffle on (conv_id, bucket) per tier build; coarser tiers
  re-aggregate the much smaller finer tier, never the raw table.
* Spark's partial (map-side) HashAggregate already absorbs most key
  skew for these algebraic aggregates; for pathological hot conv_ids
  `salted_rollup_from_raw` does an explicit two-phase
  (conv_id, bucket, salt) pre-aggregation then merges — see north rule.
* All expressions are built-in (whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smos_spark.schema import TIERS

__all__ = [
    "rollup_from_raw",
    "reaggregate",
    "with_derived",
    "salted_rollup_from_raw",
    "detect_hot_convs",
    "rollup_auto",
    "resample",
    "reaggregate_width",
]


def _bucket(col: Column, tier: str) -> Column:
    return F.date_trunc(TIERS[tier]["unit"], col)


def _partial_aggs() -> list[Column]:
    """Partial aggregates over raw turns. All algebraic → exact reagg."""
    length = F.length("text")
    return [
        F.count(F.lit(1)).alias("n_turns"),
        F.count(F.when(F.col("role") == "user", 1)).alias("n_role_user"),
        F.count(F.when(F.col("role") == "assistant", 1)).alias("n_role_assistant"),
        F.count(F.when(F.col("role") == "tool", 1)).alias("n_role_tool"),
        F.count(F.when(F.col("role") == "system", 1)).alias("n_role_system"),
        F.count(F.col("tool")).alias("n_tool_calls"),
        F.sum(length).alias("len_sum"),
        F.count(length).alias("len_cnt"),
        F.min(length).cast("long").alias("len_min"),
        F.max(length).cast("long").alias("len_max"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ]


_MERGE = {
    "n_turns": "sum",
    "n_role_user": "sum",
    "n_role_assistant": "sum",
    "n_role_tool": "sum",
    "n_role_system": "sum",
    "n_tool_calls": "sum",
    "len_sum": "sum",
    "len_cnt": "sum",
    "len_min": "min",
    "len_max": "max",
    "first_ts": "min",
    "last_ts": "max",
}


def _merge_aggs() -> list[Column]:
    out = []
    for name, how in _MERGE.items():
        agg = getattr(F, how)(F.col(name))
        if how == "sum":
            agg = agg.cast("long")
        out.append(agg.alias(name))
    return out


def rollup_from_raw(df: DataFrame, tier: str) -> DataFrame:
    """raw turns → tier partials at `tier` ('1m'|'1h'|'1d').

    One shuffle on (conv_id, bucket_start); map-side combine does the
    heavy lifting.
    """
    return df.groupBy(
        F.col("conv_id"), _bucket(F.col("ts"), tier).alias("bucket_start")
    ).agg(*_partial_aggs())


def reaggregate(tier_df: DataFrame, to_tier: str) -> DataFrame:
    """finer tier partials → coarser tier partials, exactly.

    1h is built from 1m, 1d from 1h — the continuous-aggregate cascade
    (reference analog: daily images ARE the 1d tier; SURVEY.md §2.4 A2).
    """
    return tier_df.groupBy(
        F.col("conv_id"), _bucket(F.col("bucket_start"), to_tier).alias("bucket_start")
    ).agg(*_merge_aggs())


def with_derived(tier_df: DataFrame, round_to: int | None = None) -> DataFrame:
    """Attach derived rate/mean columns (views over partials).

    Gap rows (n_turns NULL from gap-fill) yield NULL rates — the
    reference's all-NaN missing-day row semantics
    (/root/reference/src/smos/interface.py:50-52, :222-254).
    """
    n = F.col("n_turns").cast("double")

    def rt(c: str) -> Column:
        r = F.col(c).cast("double") / n
        return F.round(r, round_to) if round_to is not None else r

    len_mean = F.when(
        F.col("len_cnt") > 0, F.col("len_sum").cast("double") / F.col("len_cnt")
    )
    if round_to is not None:
        len_mean = F.round(len_mean, round_to)
    return tier_df.select(
        "*",
        rt("n_role_user").alias("rate_user"),
        rt("n_role_assistant").alias("rate_assistant"),
        rt("n_role_tool").alias("rate_tool"),
        rt("n_role_system").alias("rate_system"),
        rt("n_tool_calls").alias("tool_rate"),
        len_mean.alias("len_mean"),
    )


def salted_rollup_from_raw(df: DataFrame, tier: str, n_salts: int = 16) -> DataFrame:
    """Explicit two-phase rollup for hot-key skew (north rule).

    Phase 1 groups on (conv_id, bucket, salt) — a deterministic salt
    from the row's own (ts, turn_idx) spreads one hot conversation's
    bucket over `n_salts` reducers; phase 2 merges the partials.
    Results are identical to `rollup_from_raw` (asserted in tests).
    """
    salt = F.pmod(F.xxhash64("ts", "turn_idx"), F.lit(n_salts)).alias("_salt")
    phase1 = df.groupBy(
        F.col("conv_id"),
        _bucket(F.col("ts"), tier).alias("bucket_start"),
        salt,
    ).agg(*_partial_aggs())
    return phase1.groupBy("conv_id", "bucket_start").agg(*_merge_aggs())


def detect_hot_convs(
    df: DataFrame,
    hot_threshold: int = 1_000_000,
    sample_fraction: float = 0.001,
    seed: int = 42,
) -> list[str]:
    """Estimate the set of hot conversations from a cheap seeded
    sample: a conv whose sampled count / fraction exceeds the
    threshold is hot. At 10^12 turns a 0.1% sample is 10^9 rows —
    still a distributed count, never a full-key histogram on the
    driver; only the (tiny) hot list is collected.

    The sampled cutoff is clamped to ≥5 rows: when
    hot_threshold × sample_fraction < 1 every sampled key would
    qualify and the "tiny" collect would pull the whole key set to
    the driver (and route everything through the salted path).
    The collect itself is capped as a second backstop; when the clamp
    actually raises the effective detection threshold (keys with true
    counts between hot_threshold and 5/sample_fraction would be
    silently missed) the caller is warned to raise sample_fraction."""
    if hot_threshold * sample_fraction < 5.0:
        import warnings

        warnings.warn(
            f"detect_hot_convs: hot_threshold*sample_fraction = "
            f"{hot_threshold * sample_fraction:.2f} < 5 — the sampled cutoff "
            f"is clamped to 5 rows, so keys with true counts in "
            f"[{hot_threshold}, {5 / sample_fraction:.0f}) will NOT be "
            "detected as hot; raise sample_fraction (or hot_threshold) to "
            "make the sample selective",
            stacklevel=2,
        )
    cutoff = max(hot_threshold * sample_fraction, 5.0)
    max_hot = 10_000
    est = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy("conv_id")
        .count()
        .where(F.col("count") >= cutoff)
    )
    hot = [r.conv_id for r in est.limit(max_hot + 1).collect()]
    if len(hot) > max_hot:
        raise ValueError(
            f"detect_hot_convs found >{max_hot} 'hot' keys — the "
            "threshold/fraction combination is not selective; raise "
            "hot_threshold or sample_fraction"
        )
    return hot


def rollup_auto(
    df: DataFrame,
    tier: str,
    hot_threshold: int = 1_000_000,
    sample_fraction: float = 0.001,
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-aware rollup: hot conversations (detected by sampling) go
    through the two-phase salted aggregation, the cold majority
    through the plain single-shuffle rollup; results are identical to
    `rollup_from_raw` (asserted in tests). With no hot keys this is
    exactly the plain plan plus one cheap sampling job.

    Note Spark's map-side partial aggregation already absorbs moderate
    skew for these algebraic partials — use a threshold reflecting
    genuinely pathological keys (default 10^6 turns/conv)."""
    hot = detect_hot_convs(df, hot_threshold, sample_fraction, seed)
    if not hot:
        return rollup_from_raw(df, tier)
    is_hot = F.col("conv_id").isin(hot)
    cold_part = rollup_from_raw(df.where(~is_hot), tier)
    hot_part = salted_rollup_from_raw(df.where(is_hot), tier, n_salts=n_salts)
    return cold_part.unionByName(hot_part)


def _width_bucket(col: Column, width_sec: float, origin: str | None = None) -> Column:
    """Floor `col` to a width_sec-wide bucket in exact int64 epoch
    micros (`off - pmod(off, width)` — correct for any sign, no float
    epoch, no DST surprises; calendar-aware tiers use date_trunc)."""
    width_us = int(round(width_sec * 1_000_000))
    if width_us <= 0:
        raise ValueError(f"width_sec must be positive, got {width_sec}")
    us = F.unix_micros(col.cast("timestamp"))
    if origin is not None:
        origin_us = F.unix_micros(F.lit(origin).cast("timestamp"))
        off = us - origin_us
        return F.timestamp_micros(off - F.pmod(off, F.lit(width_us)) + origin_us)
    return F.timestamp_micros(us - F.pmod(us, F.lit(width_us)))


def resample(df: DataFrame, width_sec: float, origin: str | None = None) -> DataFrame:
    """Arbitrary-width downsample: raw turns → tier-shaped partials at
    ANY bucket width (15 s, 5 min, 6 h, …), not just the named
    calendar tiers. Same partial-aggregate contract as
    `rollup_from_raw`, so everything downstream (gap-fill, derived
    views, stores, codecs) composes unchanged. `origin` anchors the
    grid (e.g. '2025-01-01 00:30:00' for half-hour-offset buckets).

    One shuffle on (conv_id, bucket_start), map-side combine — the
    identical plan shape as the named tiers at any width and scale.
    """
    return df.groupBy(
        F.col("conv_id"),
        _width_bucket(F.col("ts"), width_sec, origin).alias("bucket_start"),
    ).agg(*_partial_aggs())


def reaggregate_width(
    tier_df: DataFrame, width_sec: float, origin: str | None = None
) -> DataFrame:
    """Exact re-aggregation of width partials into a coarser width.
    The caller guarantees the coarser width is an integer multiple of
    (and grid-aligned with) the finer one — same contract as the
    named-tier cascade, where 1h ⊇ 1m and 1d ⊇ 1h."""
    return tier_df.groupBy(
        F.col("conv_id"),
        _width_bucket(F.col("bucket_start"), width_sec, origin).alias("bucket_start"),
    ).agg(*_merge_aggs())
