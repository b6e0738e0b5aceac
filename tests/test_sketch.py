"""KMV cardinality sketch + Bloom-filter decontamination invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smos_spark.operators.sketch import (
    bloom_build,
    bloom_decontaminate,
    kmv_distinct,
    kmv_merge,
)
from smos_spark.operators.text import ngram_decontaminate


@pytest.fixture(scope="module")
def events(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .withColumn("day", F.date_trunc("day", "ts"))
        .cache()
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()


def test_kmv_estimate_within_bound(spark, events):
    """k=64 KMV: relative error well inside the ~3/sqrt(k) envelope on
    every day (distinct users/day ~130)."""
    est = {
        r["day"]: r["est_milli"] / 1000.0
        for r in kmv_distinct(events, key="user_id", group_cols=["day"], k=64).collect()
    }
    exact = {
        r["day"]: r["d"]
        for r in events.groupBy("day")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for day, e in est.items():
        assert abs(e - exact[day]) / exact[day] < 3 / (64**0.5), (day, e, exact[day])


def test_kmv_exact_below_k(spark, events):
    """Groups with fewer than k distinct keys return the EXACT count."""
    out = kmv_distinct(events, key="user_id", group_cols=["day"], k=4096).collect()
    exact = {
        r["day"]: r["d"]
        for r in events.groupBy("day")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    for r in out:
        assert r["n_kept"] == exact[r["day"]]
        assert r["est_milli"] == exact[r["day"]] * 1000


def test_kmv_partition_invariant(spark, events):
    """Same sketch on any partitioning (the mergeable-state contract)."""
    a = kmv_distinct(events, key="user_id", group_cols=["day"], k=16)
    b = kmv_distinct(events.repartition(13), key="user_id", group_cols=["day"], k=16)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmv_merge_equals_direct(spark, events):
    """Exact-merge property: weekly estimate from daily sketches is
    IDENTICAL to the sketch computed directly over the week."""
    daily = kmv_distinct(
        events, key="user_id", group_cols=["day"], k=16, keep_hashes=True
    ).withColumn("week", F.date_trunc("week", "day"))
    merged = kmv_merge(daily.select("week", "kmv_hashes"), ["week"], k=16)
    direct = kmv_distinct(
        events.withColumn("week", F.date_trunc("week", "ts")),
        key="user_id",
        group_cols=["week"],
        k=16,
    )
    assert sorted(map(tuple, merged.select("week", "n_kept", "est_milli").collect())) == sorted(
        map(tuple, direct.select("week", "n_kept", "est_milli").collect())
    )


def test_kmv_rejects_k1(spark, events):
    with pytest.raises(ValueError):
        kmv_distinct(events, key="user_id", k=1)


def test_kmv_portable_false_same_shape(spark, events):
    """xxhash64 hot path: different estimates (different hash family)
    but the same grouping/exactness contract."""
    out = kmv_distinct(
        events, key="user_id", group_cols=["day"], k=4096, portable=False
    ).collect()
    exact = {
        r["day"]: r["d"]
        for r in events.groupBy("day")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    for r in out:
        assert r["est_milli"] == exact[r["day"]] * 1000


def test_bloom_zero_false_negatives(spark, docs):
    """Every doc the exact join flags must be bloom-flagged (the Bloom
    guarantee); false positives allowed, false negatives never."""
    ev = docs.where(F.col("doc_id") % 41 == 0)
    corpus = docs.where(F.col("doc_id") % 41 != 0)
    flagged = {
        r["doc_id"]
        for r in bloom_decontaminate(corpus, ev, n=4).where("flagged").collect()
    }
    exact = {r["doc_id"] for r in ngram_decontaminate(corpus, ev, n=4).collect()}
    assert exact <= flagged
    # 2^16 bits for a few thousand grams: the FP burden must stay tiny
    assert len(flagged) <= len(exact) + 5


def test_bloom_short_and_empty_docs_unflagged(spark):
    """Docs below n tokens have no grams: n_grams=0, never flagged."""
    docs = spark.createDataFrame(
        [(1, "only three tokens here"), (2, "tiny"), (3, None)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(9, "a b c d e f g h i j k l m")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bloom_decontaminate(docs, ev, n=13).collect()}
    assert out[1]["n_grams"] == 0 and not out[1]["flagged"]
    assert out[2]["n_grams"] == 0 and not out[2]["flagged"]
    assert 3 not in out  # NULL text carries no grams to screen


def test_bloom_build_guards(spark, docs):
    grams = spark.createDataFrame([(1,)], "gram long")
    with pytest.raises(ValueError):
        bloom_build(grams, m_bits=100)  # not a multiple of 32
    with pytest.raises(ValueError):
        bloom_build(grams, m_bits=1 << 27)  # bitmap too large for a literal


def test_cms_merge_is_exact(spark, events):
    """Merged daily CM sketches == the sketch built directly from the
    week's raw rows — counter arrays bit-identical (integer sums are
    order/grouping independent)."""
    from smos_spark.operators.sketch import cms_build, cms_merge

    daily = cms_build(events, key="user_id", group_cols=["day"], width=32, depth=3)
    merged = cms_merge(
        daily.withColumn("week", F.date_trunc("week", "day")).select("week", "cms"),
        ["week"],
    )
    direct = cms_build(
        events.withColumn("week", F.date_trunc("week", "ts")),
        key="user_id",
        group_cols=["week"],
        width=32,
        depth=3,
    )
    m = {r["week"]: r["cms"] for r in merged.collect()}
    d = {r["week"]: r["cms"] for r in direct.collect()}
    assert m.keys() == d.keys() and len(m) > 1
    for wk in m:
        assert m[wk] == d[wk]


def test_cms_never_undercounts(spark, events):
    from smos_spark.operators.sketch import cms_build, cms_estimate

    sk = cms_build(events, key="user_id", group_cols=["day"], width=64, depth=4)
    est = cms_estimate(
        sk, keys=list(range(30)), key_name="user_id", width=64, depth=4
    )
    true = events.groupBy("day", "user_id").count()
    j = est.join(true, ["day", "user_id"], "left").na.fill(0, ["count"])
    assert j.where(F.col("est") < F.col("count")).count() == 0
    # and the estimate is non-trivial: exact for at least one key
    assert j.where((F.col("est") == F.col("count")) & (F.col("count") > 0)).count() > 0


def test_cms_state_guard():
    from smos_spark.operators.sketch import cms_build

    with pytest.raises(ValueError, match="2\\^20"):
        cms_build(None, key="k", width=1 << 18, depth=8)


def test_cms_depth1_estimate(spark, events):
    """depth=1 is buildable, so it must be queryable too (F.least needs
    ≥2 columns — regression: estimate special-cases the single probe)."""
    from smos_spark.operators.sketch import cms_build, cms_estimate

    sk = cms_build(events, key="user_id", group_cols=["day"], width=64, depth=1)
    est = cms_estimate(
        sk, keys=list(range(10)), key_name="user_id", width=64, depth=1
    )
    true = events.groupBy("day", "user_id").count()
    j = est.join(true, ["day", "user_id"], "left").na.fill(0, ["count"])
    assert j.where(F.col("est") < F.col("count")).count() == 0


def test_cms_estimate_rejects_mismatched_params(spark, events):
    """Probing with the wrong width/depth reads wrong counters and can
    UNDER-count — the estimate must fail loudly on the one mismatch
    that is detectable (array length != depth*width)."""
    from pyspark.errors import SparkRuntimeException
    from smos_spark.operators.sketch import cms_build, cms_estimate

    sk = cms_build(events, key="user_id", group_cols=["day"], width=64, depth=3)
    bad = cms_estimate(sk, keys=[1, 2], key_name="user_id", width=32, depth=3)
    with pytest.raises(SparkRuntimeException, match="width/depth"):
        bad.collect()


def test_bottomk_merge_is_exact(spark, events):
    """Merged daily bottom-k samples == the sample built directly from
    the week's raw rows — struct arrays identical, n_rows adds."""
    from smos_spark.operators.sketch import bottomk_merge, bottomk_sample

    daily = bottomk_sample(
        events, key="event_id", value="value", group_cols=["day"], k=32
    )
    merged = bottomk_merge(
        daily.withColumn("week", F.date_trunc("week", "day")).select(
            "week", "bk_sample", "n_rows"
        ),
        ["week"],
        k=32,
    )
    direct = bottomk_sample(
        events.withColumn("week", F.date_trunc("week", "ts")),
        key="event_id",
        value="value",
        group_cols=["week"],
        k=32,
    )
    m = {r["week"]: (r["bk_sample"], r["n_rows"]) for r in merged.collect()}
    d = {r["week"]: (r["bk_sample"], r["n_rows"]) for r in direct.collect()}
    assert m.keys() == d.keys() and len(m) > 1
    for wk in m:
        assert m[wk] == d[wk]


def test_bottomk_quantiles_exact_when_complete(spark):
    """Group smaller than k: the sample IS the group, so the quantile
    estimate equals the exact type-7 quantile (numpy default)."""
    import numpy as np

    from smos_spark.operators.sketch import bottomk_quantiles, bottomk_sample

    vals = [3.0, 1.5, 9.25, 4.0, 7.5, 2.25, 8.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, value double"
    )
    sk = bottomk_sample(df, key="id", value="value", group_cols=["g"], k=64)
    row = bottomk_quantiles(sk, [0.0, 0.5, 0.9, 1.0]).first()
    assert row["n_rows"] == len(vals)
    for p, name in [(0.0, "q0"), (0.5, "q50"), (0.9, "q90"), (1.0, "q100")]:
        assert row[name] == pytest.approx(np.quantile(vals, p), abs=1e-12)


def test_bottomk_sample_deterministic_and_bounded(spark, events):
    from smos_spark.operators.sketch import bottomk_sample

    a = bottomk_sample(events, key="event_id", value="value", group_cols=["day"], k=16)
    b = bottomk_sample(
        events.repartition(17), key="event_id", value="value", group_cols=["day"], k=16
    )
    ra = {r["day"]: r["bk_sample"] for r in a.collect()}
    rb = {r["day"]: r["bk_sample"] for r in b.collect()}
    assert ra == rb
    assert all(len(v) <= 16 for v in ra.values())


def test_bottomk_mapside_limit_in_plan(spark, events):
    """The k-cut must happen BEFORE the exchange (partial
    WindowGroupLimit): a full-frame count in the same Window node
    would defeat the rewrite and ship every row through the shuffle —
    pinned so the separate-count formulation can't regress."""
    from smos_spark.operators.sketch import bottomk_sample

    plan = (
        bottomk_sample(events, key="event_id", value="value", group_cols=["day"], k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    marker = "Exchange hashpartitioning(day"
    assert marker in plan, plan
    pre_exchange = plan.split(marker, 1)[-1]
    assert "WindowGroupLimit" in pre_exchange, plan


# ---------------------------------------------------------------------------
# fixed-universe histogram quantiles


def test_hist_merge_is_exact(spark, events):
    """Merged daily histograms == the histogram built directly from the
    week's raw rows — counter arrays bit-identical (integer sums are
    order/grouping independent). This is the quantile-state analog of
    test_cms_merge_is_exact."""
    from smos_spark.operators.sketch import hist_build, hist_merge

    daily = hist_build(
        events, value="value", group_cols=["day"], lo=0.0, hi=1024.0, n_bins=128
    )
    merged = hist_merge(
        daily.withColumn("week", F.date_trunc("week", "day")).select("week", "hist"),
        ["week"],
    )
    direct = hist_build(
        events.withColumn("week", F.date_trunc("week", "ts")),
        value="value",
        group_cols=["week"],
        lo=0.0,
        hi=1024.0,
        n_bins=128,
    )
    m = {r["week"]: r["hist"] for r in merged.collect()}
    d = {r["week"]: r["hist"] for r in direct.collect()}
    assert m.keys() == d.keys() and len(m) > 1
    for wk in m:
        assert m[wk] == d[wk]


def test_hist_quantiles_exact_on_integer_universe(spark):
    """With width-1 bins over an integer universe, the histogram
    quantile IS the exact type-1 (inverted-CDF) order statistic: the
    first value whose cumulative count reaches ceil(p*n)."""
    import math

    from smos_spark.operators.sketch import hist_build, hist_quantiles

    vals = [3, 7, 7, 7, 9, 12, 12, 31, 55, 55, 55, 55, 90]
    df = spark.createDataFrame([(v,) for v in vals], ["v"]).withColumn(
        "g", F.lit("a")
    )
    sk = hist_build(df, value="v", group_cols=["g"], lo=0.0, hi=128.0, n_bins=128)
    out = hist_quantiles(sk, [0.0, 0.5, 0.9, 1.0], lo=0.0, hi=128.0).collect()[0]
    svals = sorted(vals)

    def type1(p):
        return float(svals[max(1, math.ceil(p * len(svals))) - 1])

    assert out["n_rows"] == len(vals)
    assert out["q0"] == type1(0.0) == 3.0
    assert out["q50"] == type1(0.5)
    assert out["q90"] == type1(0.9)
    assert out["q100"] == type1(1.0) == 90.0


def test_hist_clamps_out_of_universe(spark):
    """Values outside [lo, hi) land in the edge bins — kept, not
    dropped, so n and rank positions stay true to the group."""
    from smos_spark.operators.sketch import hist_build, hist_quantiles

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (99.5,), (1000.0,)], ["v"]
    ).withColumn("g", F.lit("a"))
    sk = hist_build(df, value="v", group_cols=["g"], lo=0.0, hi=100.0, n_bins=100)
    row = sk.collect()[0]
    assert sum(row["hist"]) == 4
    assert row["hist"][0] == 2  # -5.0 clamped down + 0.5
    assert row["hist"][99] == 2  # 99.5 + 1000.0 clamped up
    q = hist_quantiles(sk, [1.0], lo=0.0, hi=100.0).collect()[0]
    assert q["q100"] == 99.0  # top bin lower edge


def test_hist_guards(spark, events):
    from smos_spark.operators.sketch import hist_build, hist_quantiles

    with pytest.raises(ValueError, match="n_bins"):
        hist_build(events, value="value", lo=0.0, hi=1.0, n_bins=0)
    with pytest.raises(ValueError, match="2\\^16"):
        hist_build(events, value="value", lo=0.0, hi=1.0, n_bins=(1 << 16) + 1)
    with pytest.raises(ValueError, match="hi > lo"):
        hist_build(events, value="value", lo=1.0, hi=1.0, n_bins=4)
    sk = hist_build(events, value="value", group_cols=["day"], lo=0.0, hi=8.0,
                    n_bins=8)
    with pytest.raises(ValueError, match="outside"):
        hist_quantiles(sk, [1.5], lo=0.0, hi=8.0)
    with pytest.raises(ValueError, match="non-empty"):
        hist_quantiles(sk, [], lo=0.0, hi=8.0)


def test_hist_cascade_minute_hour_day(spark, events):
    """The tier-cascade shape for quantile state: minute-grain
    histograms merged to hours, hour sketches merged to days — the
    day result is bit-identical to a direct day-grain build (merge is
    associative integer addition, so ANY cascade path agrees)."""
    from smos_spark.operators.sketch import hist_build, hist_merge

    base = events.withColumn("minute", F.date_trunc("minute", "ts"))
    m = hist_build(base, value="value", group_cols=["minute"],
                   lo=0.0, hi=512.0, n_bins=64)
    h = hist_merge(
        m.withColumn("hour", F.date_trunc("hour", "minute")).select("hour", "hist"),
        ["hour"],
    )
    d = hist_merge(
        h.withColumn("day", F.date_trunc("day", "hour")).select("day", "hist"),
        ["day"],
    )
    direct = hist_build(
        events.withColumn("day", F.date_trunc("day", "ts")),
        value="value", group_cols=["day"], lo=0.0, hi=512.0, n_bins=64,
    )
    got = {r["day"]: r["hist"] for r in d.collect()}
    exp = {r["day"]: r["hist"] for r in direct.collect()}
    assert got.keys() == exp.keys() and len(got) > 5
    for k in got:
        assert got[k] == exp[k]


def test_hist_plan_shapes(spark, events):
    """Plan pins for the histogram sketch: (1) hist_build's counting
    aggregate is map-side combined (partial_count before the exchange),
    so the shuffle carries at most groups*n_bins rows; (2) the quantile
    read adds NO exchange over the sketch rows — it is pure expression
    work on the array column."""
    from smos_spark.operators.sketch import hist_build, hist_quantiles

    sk = hist_build(events, value="value", group_cols=["day"],
                    lo=0.0, hi=512.0, n_bins=64)
    build_plan = sk._jdf.queryExecution().executedPlan().toString()
    first_exchange = build_plan.split("Exchange", 1)[-1]
    assert "partial_count" in first_exchange or "partial_count" in build_plan, (
        build_plan
    )

    cached = sk.cache()
    cached.count()
    try:
        q = hist_quantiles(cached, [0.5, 0.99], lo=0.0, hi=512.0)
        q_plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in q_plan.split("InMemoryTableScan")[0], q_plan
    finally:
        cached.unpersist()


def test_hist_excludes_nan_values(spark):
    """NaN values carry no order statistic: they must be EXCLUDED like
    NULL, not silently binned at lo (floor(NaN) casts to 0)."""
    from smos_spark.operators.sketch import hist_build, hist_quantiles

    df = spark.createDataFrame(
        [(float("nan"),), (0.5,), (None,), (2.5,)], "v double"
    ).withColumn("g", F.lit("a"))
    row = hist_build(df, value="v", group_cols=["g"], lo=0.0, hi=4.0,
                     n_bins=4).collect()[0]
    assert sum(row["hist"]) == 2 and row["hist"] == [1, 0, 1, 0]
    q = hist_quantiles(
        hist_build(df, value="v", group_cols=["g"], lo=0.0, hi=4.0, n_bins=4),
        [0.0], lo=0.0, hi=4.0,
    ).collect()[0]
    assert q["n_rows"] == 2 and q["q0"] == 0.0  # bin of 0.5, not NaN's bin


def test_hist_rebin_exact_and_guarded(spark, events):
    """hist_rebin by factor f == a direct build with n_bins/f over the
    same universe (adjacent-bin sums commute with the build), and the
    quantile read over >4096 bins refuses with guidance."""
    from smos_spark.operators.sketch import hist_build, hist_quantiles, hist_rebin

    fine = hist_build(events, value="value", group_cols=["day"],
                      lo=0.0, hi=512.0, n_bins=512)
    coarse = hist_rebin(fine, 8)
    direct = hist_build(events, value="value", group_cols=["day"],
                        lo=0.0, hi=512.0, n_bins=64)
    got = {r["day"]: r["hist"] for r in coarse.collect()}
    exp = {r["day"]: r["hist"] for r in direct.collect()}
    assert got.keys() == exp.keys()
    for k in got:
        assert got[k] == exp[k]
    # factor=1 is the identity, bad factors raise
    assert hist_rebin(fine, 1) is fine
    with pytest.raises(ValueError):
        hist_rebin(fine, 0)
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(Exception, match="does not divide"):
        hist_rebin(fine, 7).collect()
    # oversize quantile read refuses with the rebin hint
    big = hist_build(events, value="value", group_cols=["day"],
                     lo=0.0, hi=8192.0, n_bins=8192)
    with pytest.raises(Exception, match="hist_rebin"):
        hist_quantiles(big, [0.5], lo=0.0, hi=8192.0).collect()
    # and the documented path works: rebin to 4096 then read
    ok = hist_quantiles(hist_rebin(big, 2), [0.5], lo=0.0, hi=8192.0)
    assert ok.count() > 0
