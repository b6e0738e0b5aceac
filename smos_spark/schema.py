"""Authoritative schemas for the engine.

The transcripts schema is fixed by BASELINE.json ``input_hint`` — the
analog of the reference's externally-defined netCDF variable set
(/root/reference/src/smos/reshuffle.py:30-56 infers it from the first
file; we declare it).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ROLES = ("user", "assistant", "tool", "system")

# Retention tiers. unit = date_trunc unit; seconds = bucket width.
TIERS = {
    "1m": {"unit": "minute", "seconds": 60},
    "1h": {"unit": "hour", "seconds": 3600},
    "1d": {"unit": "day", "seconds": 86400},
}

# Tier tables store PARTIAL aggregates (sums/counts/min/max) that
# re-aggregate exactly into coarser tiers (SURVEY.md §2.4: "for
# quantile-like stats keep sum/count/min/max which reaggregate
# exactly"). Rates/means are derived views, never stored.
TIER_PARTIAL_COLS = [
    "n_turns",
    "n_role_user",
    "n_role_assistant",
    "n_role_tool",
    "n_role_system",
    "n_tool_calls",
    "len_sum",
    "len_cnt",
    "len_min",
    "len_max",
    "first_ts",
    "last_ts",
]

TIER_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("bucket_start", T.TimestampType(), False),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_role_user", T.LongType(), True),
        T.StructField("n_role_assistant", T.LongType(), True),
        T.StructField("n_role_tool", T.LongType(), True),
        T.StructField("n_role_system", T.LongType(), True),
        T.StructField("n_tool_calls", T.LongType(), True),
        T.StructField("len_sum", T.LongType(), True),
        T.StructField("len_cnt", T.LongType(), True),
        T.StructField("len_min", T.LongType(), True),
        T.StructField("len_max", T.LongType(), True),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)
