"""PAA segments + equal-width SAX words (operators/symbolic.py).

Pins the hand-computed word on a known day (including the clamp at
the top bin edge and a value landing exactly on an interior edge —
floor sends it UP a bin), the constant-day all-'a' rule, the
empty-segments-are-absent contract, and validation.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from smos_spark.operators.symbolic import paa, sax_words

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=k, ts=T0 + dt.timedelta(hours=h), value=v) for k, h, v in rows]
    )


ROWS = [
    # seg0 (hours 0-5): mean 2.00 -> sym floor((400-200)*4/1600)=0 'a'
    (1, 0, 1.0),
    (1, 1, 3.0),
    # seg1 (hours 6-11): 5.00 sits exactly on the 2nd bin edge ->
    # (500-100)*4/800 = 2 exactly -> 'c', not 'b'
    (1, 6, 5.0),
    # seg2 empty; seg3 (hours 18-23): day max -> raw bin 4 clamps to 'd'
    (1, 18, 9.0),
]


class TestPaa:
    def test_hand_computed_segments(self, spark):
        out = {
            r.seg: r
            for r in paa(
                _ev(spark, ROWS), "value", ("user_id",), n_segments=4, alphabet=4
            ).collect()
        }
        assert set(out) == {0, 1, 3}
        assert (out[0].n, out[0].sum_cents, out[0].sym) == (2, 400, 0)
        assert (out[1].sym, out[3].sym) == (2, 3)
        assert (out[0].day_min, out[0].day_max) == (100, 900)

    def test_constant_day_is_symbol_zero(self, spark):
        rows = [(1, h, 4.2) for h in (0, 7, 13, 19)]
        out = paa(
            _ev(spark, rows), "value", ("user_id",), n_segments=4, alphabet=4
        ).collect()
        assert len(out) == 4 and all(r.sym == 0 for r in out)

    def test_validation(self, spark):
        df = _ev(spark, ROWS)
        with pytest.raises(ValueError, match="n_segments"):
            paa(df, "value", ("user_id",), n_segments=0)
        with pytest.raises(ValueError, match="alphabet"):
            paa(df, "value", ("user_id",), alphabet=1)
        with pytest.raises(ValueError, match="alphabet"):
            paa(df, "value", ("user_id",), alphabet=27)


class TestSaxWords:
    def test_hand_computed_word_skips_empty_segment(self, spark):
        out = sax_words(
            _ev(spark, ROWS), "value", ("user_id",), n_segments=4, alphabet=4
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.sax_word, r.n_segments, r.n_samples) == ("acd", 3, 4)

    def test_motifs_count_repeating_words(self, spark):
        # the same daily shape shifted by a constant symbolizes to the
        # SAME word (equal-width bins are shift-invariant), so days
        # 0/1/2 are one motif "acd" x3; day 3's single sample ("a")
        # misses min_days=2
        from smos_spark.operators.symbolic import sax_motifs

        rows = list(ROWS)
        for d in (1, 2):
            rows += [(k, h + 24 * d, v + 10.0) for k, h, v in ROWS]
        rows.append((1, 24 * 3, 5.0))
        out = sax_motifs(
            _ev(spark, rows), "value", ("user_id",),
            n_segments=4, alphabet=4, min_days=2,
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.sax_word, r.n_days, r.n_samples) == ("acd", 3, 12)
        assert (r.first_day, r.last_day) == (T0, T0 + dt.timedelta(days=2))
        with pytest.raises(ValueError, match="min_days"):
            sax_motifs(_ev(spark, rows), "value", ("user_id",), min_days=0)

    def test_days_and_keys_independent(self, spark):
        rows = ROWS + [(1, 24, 1.0), (1, 30, 9.0), (2, 0, 7.0)]
        out = {
            (r.user_id, r.day): r.sax_word
            for r in sax_words(
                _ev(spark, rows), "value", ("user_id",), n_segments=4, alphabet=4
            ).collect()
        }
        assert out[(1, T0)] == "acd"
        assert out[(1, T0 + dt.timedelta(days=1))] == "ad"
        assert out[(2, T0)] == "a"  # single-sample day: constant -> 'a'
