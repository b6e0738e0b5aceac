"""Structural invariants of the synthetic generator (FIXTURES.md §1)."""

from __future__ import annotations

from smos_spark.synth import synth_transcripts


def test_schema(transcripts):
    assert [f.name for f in transcripts.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    dt = dict((f.name, f.dataType.simpleString()) for f in transcripts.schema.fields)
    assert dt["turn_idx"] == "int"
    assert dt["ts"] == "timestamp"


def test_deterministic(spark, transcripts_pdf):
    again = (
        synth_transcripts(spark, n_conv=60, seed=42)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    base = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert base.equals(again)


def test_structural_features(transcripts_pdf):
    pdf = transcripts_pdf
    # roles all valid, system present (~5%)
    assert set(pdf.role.unique()) == {"user", "assistant", "tool", "system"}
    sys_rate = (pdf.role == "system").mean()
    assert 0.01 < sys_rate < 0.12

    # hot-key skew: hot conv (conv_idx 0) carries far more turns
    counts = pdf.groupby("conv_id").size()
    assert counts["conv000000"] > 20 * counts.drop("conv000000").median()

    # stable-order tie: turn 2 and 3 share identical ts in every conv
    for cid, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert g.iloc[2].ts == g.iloc[3].ts
        # ts non-decreasing with turn_idx
        assert g.ts.is_monotonic_increasing

    # empty-text and null-text both present, distinguishable
    assert (pdf.text == "").any()
    assert pdf.text.isna().any()

    # tool non-null iff role == tool, plus some assistant turns
    assert pdf.loc[pdf.role == "tool", "tool"].notna().all()
    assert pdf.loc[pdf.role == "user", "tool"].isna().all()
    assert pdf.loc[pdf.role == "assistant", "tool"].notna().any()


def test_missing_interval(transcripts_pdf):
    """~10% of convs have a forced >2h hole (missing-bucket analog of
    the missing 2018-01-02 image, reference test_ICreshuffle.py:39)."""
    pdf = transcripts_pdf
    holes = 0
    for cid, g in pdf.groupby("conv_id"):
        gaps = g.sort_values("turn_idx").ts.diff().dt.total_seconds()
        if (gaps > 7200).any():
            holes += 1
    assert holes >= 6  # every conv_idx % 10 == 0
