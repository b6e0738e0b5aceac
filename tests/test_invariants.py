"""The north-rule per-row invariant: per-turn TEXT EQUALITY under
STABLE TURN ORDERING, preserved through the partitioned store
round-trip (the reference's per-point value-identity contract,
/root/reference/tests/test_ICreshuffle.py:49-52, translated to
transcripts)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from smos_spark.sources.store import TranscriptStore
from smos_spark.synth import synth_transcripts


def _ordered_pdf(df) -> pd.DataFrame:
    return (
        df.orderBy("conv_id", "ts", "turn_idx")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
        .reset_index(drop=True)
    )


def test_store_roundtrip_text_equality(spark, tmp_path):
    t = synth_transcripts(spark, n_conv=30, seed=5, span_days=2)
    store = TranscriptStore(tmp_path / "store", n_buckets=4)
    store.append_transcripts(t)
    back = store.read_transcripts(spark)

    exp = _ordered_pdf(t)
    got = _ordered_pdf(back)
    # every turn present exactly once, text byte-identical, order stable
    pd.testing.assert_frame_equal(got, exp)


def test_stable_ordering_under_ts_ties(spark):
    """turn_idx 2 and 3 share a timestamp by construction (synth
    stressor #4); (ts, turn_idx) must order them deterministically."""
    t = synth_transcripts(spark, n_conv=10, seed=5, span_days=1)
    ties = (
        t.groupBy("conv_id", "ts")
        .agg(F.count(F.lit(1)).alias("n"), F.sort_array(F.collect_list("turn_idx")).alias("idx"))
        .where(F.col("n") > 1)
    )
    rows = ties.collect()
    assert rows, "synth must produce at least one ts tie"
    for r in rows:
        assert r.idx == sorted(r.idx)
        assert len(set(r.idx)) == len(r.idx)

    # repeated evaluation yields the identical global order (no
    # nondeterminism from partitioning)
    a = _ordered_pdf(t)
    b = _ordered_pdf(t)
    pd.testing.assert_frame_equal(a, b)


def test_masking_preserves_turn_identity(spark):
    """Value-nulling (P3) must not disturb row count, ordering, or the
    text of kept-role turns."""
    from smos_spark.operators.masking import mask_by_role

    t = synth_transcripts(spark, n_conv=20, seed=5, span_days=1)
    masked = mask_by_role(t)
    assert masked.count() == t.count()
    j = (
        t.alias("a")
        .join(masked.alias("b"), ["conv_id", "turn_idx"])
        .where(F.col("a.role").isin("user", "assistant", "tool"))
    )
    assert j.where(~F.col("a.text").eqNullSafe(F.col("b.text"))).count() == 0
