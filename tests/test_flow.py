"""Conversation-flow analytics (operators/flow.py) vs pandas goldens.

Mirrors the reference's ordered-series contract tests
(/root/reference/tests/test_ICreshuffle.py:56-85): values are computed
independently in pandas over the same deterministic fixture and
matched exactly (all outputs are int64, so equality is bitwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from smos_spark.operators.flow import response_latency, transition_matrix


def _ordered(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values(["conv_id", "ts", "turn_idx"]).copy()
    out["us"] = out["ts"].astype("datetime64[us]").astype("int64")
    out["prev_role"] = out.groupby("conv_id")["role"].shift()
    out["prev_us"] = out.groupby("conv_id")["us"].shift()
    return out


def test_response_latency_matches_pandas(transcripts, transcripts_pdf):
    got = (
        response_latency(transcripts, from_role="user", to_role="assistant")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    o = _ordered(transcripts_pdf)
    pairs = o[(o.prev_role == "user") & (o.role == "assistant")].copy()
    pairs["lat"] = (pairs.us - pairs.prev_us).astype("int64")
    exp = (
        pairs.groupby("conv_id")["lat"]
        .agg(n_responses="count", total_us="sum", min_us="min", max_us="max")
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    exp["mean_us"] = exp.total_us // exp.n_responses
    assert len(got) == len(exp) > 0
    for col in ("n_responses", "total_us", "min_us", "max_us", "mean_us"):
        np.testing.assert_array_equal(got[col].to_numpy(), exp[col].to_numpy())


def test_transition_matrix_role(transcripts, transcripts_pdf):
    got = (
        transition_matrix(transcripts, col="role")
        .toPandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    o = _ordered(transcripts_pdf)
    pairs = o[o.prev_us.notna()]
    exp = (
        pairs.groupby(["prev_role", "role"])
        .size()
        .rename("n")
        .reset_index()
        .rename(columns={"prev_role": "src", "role": "dst"})
    )
    tot = exp.groupby("src")["n"].transform("sum")
    exp["share_ppm"] = (exp.n * 1_000_000) // tot
    exp = exp.sort_values(["src", "dst"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(got.n.to_numpy(), exp.n.to_numpy())
    np.testing.assert_array_equal(got.share_ppm.to_numpy(), exp.share_ppm.to_numpy())
    # row-normalization sanity: each src's shares sum to ~1e6 (floor loss < n_dst)
    sums = got.groupby("src").share_ppm.sum()
    assert ((sums > 1_000_000 - 10) & (sums <= 1_000_000)).all()


def test_transition_matrix_null_state(transcripts):
    """drop_null=False materializes NULL (the tool column on non-tool
    turns) as the '∅' state; every adjacent pair is then counted."""
    got = transition_matrix(transcripts, col="tool", drop_null=False).toPandas()
    n_rows = transcripts.count()
    n_convs = transcripts.select("conv_id").distinct().count()
    assert got.n.sum() == n_rows - n_convs  # one lost pair per conversation
    assert "∅" in set(got.src)


def test_dedup_consecutive_planted(spark):
    """Adjacent repeats dropped; same content later in the conv kept;
    all-NULL adjacent rows are duplicates; first turn always kept."""
    from pyspark.sql import functions as F

    from smos_spark.operators.flow import dedup_consecutive

    rows = [
        ("c1", 0, "user", "hi", None, "2025-01-01 00:00:00"),
        ("c1", 1, "user", "hi", None, "2025-01-01 00:00:01"),  # dup -> drop
        ("c1", 2, "assistant", "yo", None, "2025-01-01 00:00:02"),
        ("c1", 3, "user", "hi", None, "2025-01-01 00:00:03"),  # not adjacent
        ("c2", 0, None, None, None, "2025-01-01 00:00:00"),  # first: keep
        ("c2", 1, None, None, None, "2025-01-01 00:00:01"),  # null dup -> drop
        ("c2", 2, "user", None, None, "2025-01-01 00:00:02"),  # role differs
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    kept = sorted(
        (r.conv_id, r.turn_idx) for r in dedup_consecutive(df).collect()
    )
    assert kept == [("c1", 0), ("c1", 2), ("c1", 3), ("c2", 0), ("c2", 2)]


def test_dedup_consecutive_matches_pandas(transcripts, transcripts_pdf):
    """Kept count matches an independent pandas adjacent-dup scan, and
    the operator preserves every column."""
    from smos_spark.operators.flow import dedup_consecutive

    out = dedup_consecutive(transcripts)
    assert out.columns == transcripts.columns
    o = transcripts_pdf.sort_values(["conv_id", "ts", "turn_idx"])
    g = o.groupby("conv_id")
    same = (
        o["role"].eq(g["role"].shift()) | (o["role"].isna() & g["role"].shift().isna())
    ) & (
        o["text"].eq(g["text"].shift()) | (o["text"].isna() & g["text"].shift().isna())
    )
    has_prev = g.cumcount() > 0
    expected = int((~(same & has_prev)).sum())
    assert out.count() == expected < len(o)


def test_conv_features_matches_pandas(transcripts, transcripts_pdf):
    from smos_spark.operators.flow import conv_features

    got = (
        conv_features(transcripts)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    o = transcripts_pdf.copy()
    o["us"] = o["ts"].astype("datetime64[us]").astype("int64")
    o["chars"] = o["text"].str.len().fillna(0).astype("int64")
    g = o.groupby("conv_id")
    exp = pd.DataFrame(
        {
            "n_turns": g.size(),
            "n_user": g.apply(lambda x: int((x.role == "user").sum())),
            "n_assistant": g.apply(lambda x: int((x.role == "assistant").sum())),
            "n_tool_calls": g.apply(lambda x: int(x.tool.notna().sum())),
            "total_chars": g.chars.sum(),
            "max_chars": g.chars.max(),
            "duration_us": g.us.max() - g.us.min(),
            "n_roles": g.role.nunique(),
        }
    ).reset_index()
    exp["user_share_ppm"] = (exp.n_user * 1_000_000) // exp.n_turns
    exp = exp.sort_values("conv_id").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for c in exp.columns[1:]:
        np.testing.assert_array_equal(
            got[c].to_numpy().astype("int64"), exp[c].to_numpy().astype("int64"), c
        )


def test_training_pairs_known_answers(spark):
    """Context rendering, frame bounds, NULL text coalescing, and the
    empty-context first turn."""
    import datetime as dt

    from smos_spark.operators.flow import training_pairs

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("c", 0, "user", "hi", None, t0),
            ("c", 1, "assistant", "hello", None, t0 + dt.timedelta(seconds=1)),
            ("c", 2, "user", None, None, t0 + dt.timedelta(seconds=2)),
            ("c", 3, "assistant", "sure", None, t0 + dt.timedelta(seconds=3)),
            ("d", 0, "assistant", "cold open", None, t0),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["n_context"], r["prompt"], r["response"])
        for r in training_pairs(df, context_turns=2).collect()
    }
    assert got[("c", 1)] == (1, "user: hi", "hello")
    # frame is the last TWO turns, NULL text renders as ''
    assert got[("c", 3)] == (2, "assistant: hello\nuser: ", "sure")
    # a response with no context: empty prompt, never NULL
    assert got[("d", 0)] == (0, "", "cold open")
    assert ("c", 0) not in got and ("c", 2) not in got  # only assistant turns
