"""Conversation sessionization — gap-based session assignment.

The transcript-domain cousin of the reference's dense-day
regularization: instead of materializing missing buckets, split each
conversation's turn stream wherever the inter-turn gap exceeds a
threshold (idle timeout). Two implementations, one semantics:

* `sessionize` (batch): pure window expressions — `lag(ts)` marks
  gap-breaks, a running `sum` over the break flags numbers sessions.
  One shuffle on conv_id; whole-stage codegen; exact SQL twin.
* `sessionize_stream` (streaming): `applyInPandasWithState` keeps
  (last_ts, open-session aggregate) per conv_id and emits a session
  row when the event-time timeout fires or a new turn breaks the gap
  — the custom stateful operator shape for live transcript feeds.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize", "session_stats", "sessionize_stream"]


def sessionize(df: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Assign a 0-based `session_id` per conv: a new session starts
    where the gap from the previous turn exceeds `gap_seconds`.
    Stable under ts ties via the (ts, turn_idx) secondary order."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    prev_ts = F.lag("ts").over(w)
    is_break = (
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > gap_seconds)
    ).cast("long")
    return df.withColumn(
        "session_id",
        (F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast(
            "int"
        ),
    )


def session_stats(df: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """One row per (conv_id, session_id): bounds, turn count, length
    stats — the per-session rollup."""
    s = sessionize(df, gap_seconds)
    return s.groupBy("conv_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_turns"),
        F.count("tool").alias("n_tool_calls"),
        # 0 (not NULL) for text-less sessions — keeps batch and
        # streaming-state implementations bit-identical
        F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("len_sum"),
    )


def sessionize_stream(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
):
    """Streaming sessionization via applyInPandasWithState.

    State per conv_id: (session_start_us, last_ts_us, n_turns,
    n_tool_calls, len_sum). A batch's turns extend or close sessions;
    an event-time timeout (watermark-driven) flushes the open session
    when the conversation goes idle. Emits the same schema as
    `session_stats` (session_id restarts per state lifetime).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "conv_id string, session_id int, session_start timestamp, "
        "session_end timestamp, n_turns long, n_tool_calls long, len_sum long"
    )
    state_schema = "session_id int, start_us long, last_us long, n long, ntool long, lsum long"
    gap_us = gap_seconds * 1_000_000

    def _fn(key, pdfs, state: GroupState):
        (conv_id,) = key
        rows = []

        def emit(sid, start_us, last_us, n, ntool, lsum):
            rows.append(
                {
                    "conv_id": conv_id,
                    "session_id": sid,
                    "session_start": dt.datetime.utcfromtimestamp(start_us / 1e6),
                    "session_end": dt.datetime.utcfromtimestamp(last_us / 1e6),
                    "n_turns": n,
                    "n_tool_calls": ntool,
                    "len_sum": lsum,
                }
            )

        if state.hasTimedOut:
            if state.exists:
                emit(*state.get)
                state.remove()
            return iter([pd.DataFrame(rows)] if rows else [])

        sid, start_us, last_us, n, ntool, lsum = (
            state.get if state.exists else (0, None, None, 0, 0, 0)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            tools = pdf["tool"].to_numpy()
            lens = pdf["text"].map(lambda x: 0 if x is None else len(x)).to_numpy()
            for i in range(len(pdf)):
                t = int(ts_us[i])
                if start_us is None:
                    start_us, last_us = t, t
                elif t - last_us > gap_us:
                    emit(sid, start_us, last_us, n, ntool, lsum)
                    sid += 1
                    start_us, n, ntool, lsum = t, 0, 0, 0
                last_us = t
                n += 1
                ntool += int(tools[i] is not None)
                lsum += int(lens[i])
        state.update((sid, start_us, last_us, n, ntool, lsum))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        return iter([pd.DataFrame(rows)] if rows else [])

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
