"""Headline benchmark: engine operators at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query best-of-N sec...}, "sf": ...,
   "trials": N, "all_trials": {...}, "turns_per_sec": ...}

Each query is forced end-to-end with the `noop` DSv2 sink (full
materialization, no collect-to-driver, no skipped aggregate columns).

Noise control: the host shows up to 4× CPU-window variance between
runs (BENCH.md "Host reality check"), so every query runs
$SPARK_GRAFT_BENCH_TRIALS (default 2) ALTERNATING trials — the full
suite repeats end-to-end rather than timing one query N times in a
burst — and `queries` reports the per-query best. `all_trials` keeps
every sample so round-over-round deltas are attributable to plan
changes vs host noise. The persisted-ANN lifecycle is timed as two
entries: ann_index_build (cell-partitioned write + sidecar) and
ann_index_query (5 partition-pruned lookups) — the regression gate
should watch the query half.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from smos_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="smos_spark_bench")
    spark.sparkContext.setLogLevel("WARN")

    t = entry._transcripts(spark, sf_dir)
    n_turns = t.count()

    from smos_spark.operators.compress import compress_series, decompress_series
    from smos_spark.operators.dedup import dedup_exact, minhash_dedup_pairs
    from smos_spark.operators.gapfill import forward_fill, gap_fill
    from smos_spark.operators.rollup import reaggregate, rollup_from_raw, with_derived
    from smos_spark.operators.similarity import cosine_topk
    from smos_spark.operators.text import text_profile

    # the sf parquet files are single row-groups (1 input split); spread
    # them once so operator timings reflect parallel execution, as they
    # would on a many-file production table
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(64).cache()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(64).cache()
    docs.count(), embs.count()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("conv_id"), "ts", "value"
    )

    def q_rollup_cascade():
        m1 = rollup_from_raw(t, "1m")
        h1 = reaggregate(m1, "1h")
        d1 = reaggregate(h1, "1d")
        _force(with_derived(d1))
        _force(h1)
        _force(m1)

    def q_gapfill_ffill():
        h1 = reaggregate(rollup_from_raw(t, "1m"), "1h")
        filled = gap_fill(h1, "1h")
        _force(forward_fill(filled, ["n_turns", "len_sum"]))

    def q_codec_roundtrip():
        comp = compress_series(ev, ["value"])
        _force(decompress_series(comp, ["value"]))

    def q_codec_chimp():
        comp = compress_series(ev, ["value"], codec="chimp")
        _force(decompress_series(comp, ["value"], codec="chimp"))

    def q_dedup_exact():
        _force(dedup_exact(docs))

    def q_minhash_pairs():
        _force(minhash_dedup_pairs(docs, threshold=0.7, portable=False))

    def q_text_profile():
        _force(text_profile(docs, portable=False))

    def q_dup_spans():
        # cross-doc duplicate n-gram fraction: one 8-byte-gram window
        # shuffle (corpus-wide doc frequency) + one per-doc aggregate
        from smos_spark.operators.text import duplicate_span_ratio

        _force(duplicate_span_ratio(docs, n=8))

    def q_cosine_topk():
        _force(cosine_topk(embs, query_id=0, k=10))

    def q_ann_index():
        # persisted-index lifecycle, split: build (cell-partitioned
        # write + centroid sidecar) vs 5 partition-pruned queries
        import shutil
        import tempfile

        from smos_spark.operators.ann_index import build_ann_index

        root = tempfile.mkdtemp(prefix="smos_bench_ann_")
        try:
            t0 = time.time()
            idx = build_ann_index(embs, root, strategy="ivf", cell_col="label")
            build_s = time.time() - t0
            t0 = time.time()
            for qid in (0, 101, 202, 303, 404):
                _force(idx.topk(spark, query_id=qid, k=10, n_probe=3))
            query_s = time.time() - t0
            return {"ann_index_build": build_s, "ann_index_query": query_s}
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def q_sessionize():
        from smos_spark.operators.sessionize import session_stats

        _force(session_stats(t, gap_seconds=1800))

    def q_asof_rolling():
        # the round-3 window operators: point-in-time join (union +
        # one ordered window) and trailing RANGE-frame stats
        from smos_spark.operators.asof import asof_join, rolling_stats

        evf = spark.read.parquet(f"{sf_dir}/events.parquet")
        left = evf.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        right = evf.where(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        _force(asof_join(left, right, on="user_id"))
        _force(
            rolling_stats(
                evf.select("event_id", "user_id", "ts", "value"),
                window_sec=86400.0,
                on="user_id",
            )
        )

    e2e_stats: dict = {}

    def q_dedup_e2e():
        # the full training-data dedup path in one wall-time entry:
        # exact survivors + minhash/LSH near-dup pairs → connected
        # components → drop non-keep members of each dup cluster
        from smos_spark.operators.dedup import dedup_apply, near_dup_components

        pairs = minhash_dedup_pairs(docs, threshold=0.7, portable=False)
        comp = near_dup_components(pairs, stats=e2e_stats)
        drop = comp.where(~F.col("keep")).select("doc_id")
        _force(dedup_apply(docs).join(drop, "doc_id", "left_anti"))

    def q_quality_funnel():
        # composed cleaning cascade: per-stage accounting + surviving
        # corpus (flags codegen on one scan; boolean-only dedup shuffle)
        from smos_spark.operators.text import apply_funnel, quality_funnel

        _force(quality_funnel(docs))
        _force(apply_funnel(docs))

    def q_downsample():
        # presentation downsample + series diagnostics: M4 hourly
        # anchors, reset-aware counter rate, top-3 gap detection
        from smos_spark.operators.downsample import (
            counter_rate,
            largest_gaps,
            m4_downsample,
        )
        from pyspark.sql.window import Window

        evf = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "user_id", "ts", "value"
        )
        _force(m4_downsample(evf, width_sec=3600.0))
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cents = F.floor(F.col("value") * 100).cast("long") + 100
        counters = evf.select(
            "event_id",
            "user_id",
            "ts",
            F.pmod(F.sum(cents).over(w), F.lit(50000)).alias("counter"),
        )
        _force(counter_rate(counters, width_sec=3600.0))
        _force(largest_gaps(evf, top_k=3))

    def q_sketches():
        # fixed-size-state aggregations: KMV distinct (daily build +
        # exact weekly merge) and Bloom-screened decontamination
        # (zero-shuffle corpus scan against a bitmap literal)
        from smos_spark.operators.sketch import (
            bloom_decontaminate,
            bottomk_merge,
            bottomk_quantiles,
            bottomk_sample,
            kmv_distinct,
            kmv_merge,
        )

        evd = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "day", F.date_trunc("day", "ts")
        )
        daily = kmv_distinct(
            evd, key="user_id", group_cols=["day"], k=64, keep_hashes=True
        )
        _force(
            kmv_merge(
                daily.withColumn("week", F.date_trunc("week", "day")).select(
                    "week", "kmv_hashes"
                ),
                ["week"],
                k=64,
            )
        )
        _force(
            bloom_decontaminate(
                docs.where(F.col("doc_id") % 41 != 0),
                docs.where(F.col("doc_id") % 41 == 0),
                n=4,
            )
        )
        bk = bottomk_sample(
            evd, key="event_id", value="value", group_cols=["day"], k=64
        )
        _force(
            bottomk_quantiles(
                bottomk_merge(
                    bk.withColumn("week", F.date_trunc("week", "day")).select(
                        "week", "bk_sample", "n_rows"
                    ),
                    ["week"],
                    k=64,
                ),
                [0.5, 0.9, 0.99],
            )
        )

    def q_cms_sketch():
        # count-min frequency state: daily build (shuffle bounded by
        # groups·depth·width) + exact weekly merge + watchlist estimate
        from smos_spark.operators.sketch import cms_build, cms_estimate, cms_merge

        evd = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "day", F.date_trunc("day", "ts")
        )
        daily = cms_build(evd, key="user_id", group_cols=["day"], width=256, depth=4)
        weekly = cms_merge(
            daily.withColumn("week", F.date_trunc("week", "day")).select(
                "week", "cms"
            ),
            ["week"],
        )
        _force(
            cms_estimate(
                weekly, keys=list(range(32)), key_name="user_id", width=256, depth=4
            )
        )

    def q_quantile_sketch():
        # mergeable distribution state (round 5): daily fixed-universe
        # histograms (shuffle bounded by groups·n_bins) + exact weekly
        # merge + inverted-CDF quantile read (pure codegen, no shuffle)
        from smos_spark.operators.sketch import hist_build, hist_merge, hist_quantiles

        evd = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "day", F.date_trunc("day", "ts")
        )
        daily = hist_build(
            evd, value="value", group_cols=["day"], lo=0.0, hi=1024.0, n_bins=1024
        )
        weekly = hist_merge(
            daily.withColumn("week", F.date_trunc("week", "day")).select(
                "week", "hist"
            ),
            ["week"],
        )
        _force(hist_quantiles(weekly, [0.5, 0.9, 0.99], lo=0.0, hi=1024.0))

    def q_pack_sample():
        # training-set assembly: hash split + shard packing (bucketed
        # two-level prefix sum) + per-group curation
        from smos_spark.operators.sampling import (
            hash_split,
            pack_documents,
            sample_to_token_budget,
            topk_per_group,
        )
        from smos_spark.operators.text import token_count_re

        d = docs.withColumn("n_tokens", token_count_re(F.col("text")))
        _force(hash_split(d, key="doc_id"))
        _force(pack_documents(d, capacity=2048, n_buckets=64))
        _force(topk_per_group(docs, "lang", [F.desc("n_chars")], 10))
        _force(sample_to_token_budget(d, 100_000, group="lang"))

    def q_conv_flow():
        # conversation-flow analytics: one conv window + same-key agg
        # (latency) and the tiny O(|roles|²) transition aggregate
        from smos_spark.operators.flow import response_latency, transition_matrix

        _force(response_latency(t))
        _force(transition_matrix(t, col="role"))

    def q_knn_outliers():
        # blocked kNN graph (BLAS pair scoring, map-side top-k cut)
        # + centroid-outlier quality filter
        from smos_spark.operators.similarity import centroid_outliers, knn_graph

        _force(knn_graph(embs, k=5, block_col="label", portable=False))
        _force(centroid_outliers(embs, threshold_ppm=0))

    def q_quantized_topk():
        from smos_spark.operators.similarity import quantized_topk

        _force(quantized_topk(embs, query_id=0, k=10))

    def q_interval_join():
        # bucketed range-overlap join: clicks attributed to trailing
        # 2h purchase windows (equi-join on (key, bucket), bounded
        # interval fan-out — never a nested-loop range join)
        from smos_spark.operators.interval import interval_join

        evf = spark.read.parquet(f"{sf_dir}/events.parquet")
        purchases = evf.where(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("start_ts"),
            F.col("ts").alias("end_ts"),
        )
        clicks = evf.where(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts"
        )
        _force(interval_join(clicks, purchases, width_sec=7200.0, on="user_id"))

    def q_anomaly():
        # both exact anomaly detectors: seasonal baseline (bounded
        # groupBy + broadcast-back, raw side never shuffles) and the
        # windowed-closed-form CUSUM (one exchange, two cumulative
        # windows, zero UDFs)
        from smos_spark.operators.anomaly import (
            cusum_changepoints,
            seasonal_anomaly,
        )

        evf = spark.read.parquet(f"{sf_dir}/events.parquet")
        _force(
            seasonal_anomaly(
                evf, "value", ["event_type"], ["event_id"], k_num=5, k_den=2
            )
        )
        _force(
            cusum_changepoints(
                evf,
                "value",
                ["user_id"],
                tie_cols=["event_id"],
                slack_cents=4000,
                h_cents=8000,
            )
        )
    def q_lttb():
        # triangle downsample: counter-table lag/lead + one
        # co-partitioned join back to raw + per-slice top-1 window
        from smos_spark.operators.downsample import lttb_downsample

        evf = spark.read.parquet(f"{sf_dir}/events.parquet")
        _force(lttb_downsample(evf, "value", ("user_id",), n_segments=12))

    def q_paa_sax():
        # symbolic downsample: one map-side reduction to (key, day,
        # seg) counters, window + word groupBy on the counter table
        # (two Exchanges total, second onward counter-rows only)
        from smos_spark.operators.symbolic import sax_words

        evf = spark.read.parquet(f"{sf_dir}/events.parquet")
        _force(sax_words(evf, "value", ("user_id",), n_segments=8, alphabet=4))

    def q_slo_burn():
        # SRE multiwindow burn-rate alerts: one map-side-combined
        # reduction to (key, bucket) counters, long window over the
        # O(keys·buckets) counter table only — the raw stream is
        # scanned once and never re-shuffled
        from smos_spark.operators.slo import slo_burn_rate

        evf = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "ts",
            "user_id",
            (F.col("event_type") == "error").alias("is_err"),
        )
        _force(
            slo_burn_rate(
                evf,
                "is_err",
                key_cols=("user_id",),
                short_sec=3600,
                long_buckets=6,
                budget_ppm=200_000,
            )
        )

    def q_ngram_pairs():
        # exact prefix-filtered n-gram Jaccard (PLANS.md §29): df-
        # ordered prefix index -> candidate equi-join -> exact verify.
        # Was the 293s all-pairs form before round 4.
        from smos_spark.operators.dedup import ngram_jaccard_pairs

        _force(ngram_jaccard_pairs(docs, threshold=0.8, block_col="lang"))

    def q_tiered_read():
        # retention-aware tiered range read over the persisted store:
        # three partition-pruned segment scans (1d/1h/1m) stitched at
        # bucket-aligned cuts — zero shuffles; times the READ path
        # (the store is written once, in the untimed setup below)
        from smos_spark.operators.retention import tiered_read_store

        _force(
            tiered_read_store(
                spark, tiered_store,
                t0="2024-01-03", t1="2024-01-29",
                now="2024-01-31 06:30:00",
                keep_s={"1m": 453_600, "1h": 1_313_280, "1d": None},
            )
        )

    def q_timeagg():
        # the duration-weighted family over events: OHLC (single-
        # exchange aggregate), LOCF daily time-weighted mean + uptime
        # (one lag/lead exchange each), and Brown double-exponential
        # smoothing (one mapInPandas, O(1) carry)
        from smos_spark.operators.smooth import des
        from smos_spark.operators.timeagg import (
            ohlc,
            time_weighted_avg,
            uptime,
        )

        evf = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "user_id", "ts", "value"
        )
        _force(ohlc(evf, width_sec=3600.0))
        _force(time_weighted_avg(evf))
        _force(uptime(evf, liveness_sec=300.0))
        _force(
            des(
                evf, alpha=0.3, value_col="value", key_cols=("user_id",),
                ts_col="ts", tie_cols=("event_id",),
            )
        )

    def q_alerting():
        # hysteresis raise/clear over event values (one key-window
        # exchange, all codegen) + the hourly interval-concurrency
        # sweep over conversation spans (bucketed two-level sum)
        from smos_spark.operators.alerting import hysteresis_alerts
        from smos_spark.operators.interval import interval_concurrency

        evf = spark.read.parquet(f"{sf_dir}/events.parquet")
        _force(
            hysteresis_alerts(
                evf, "value", hi=150.0, lo=50.0, key_cols=("user_id",)
            )
        )
        iv = t.groupBy("conv_id").agg(
            F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts")
        )
        _force(interval_concurrency(iv, width_sec=3600.0, closed=True))

    def q_robust_stats():
        # round-5 second batch: Spearman (1 Exchange, 4 in-partition
        # sorts), winsorized means (1 Exchange), Mann-Kendall on the
        # bounded (user, day) pair join
        from smos_spark.operators.anomaly import mann_kendall
        from smos_spark.operators.stats import (
            grouped_spearman,
            winsorized_stats,
        )

        evf = spark.read.parquet(f"{sf_dir}/events.parquet")
        pairs = evf.where(
            F.col("props").isNotNull() & F.col("value").isNotNull()
        ).select(
            F.col("user_id"),
            F.length("props").cast("long").alias("x"),
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
        _force(grouped_spearman(pairs, "x", "y", ["user_id"]))
        daily = evf.where(
            F.col("ts").isNotNull() & F.col("value").isNotNull()
        ).select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.floor(F.col("value") * 100).cast("long").alias("v"),
        )
        _force(winsorized_stats(daily, "v", ["user_id", "day"]))
        _force(
            mann_kendall(
                evf.withColumn("day", F.date_trunc("day", F.col("ts"))),
                "value",
                ["user_id", "day"],
                epoch="2024-01-01",
                x_unit_s=60,
            )
        )

    def q_decompose():
        # classical decomposition + seasonally-adjusted remainder:
        # dense per-user hourly grid (sequence explode), 2x24 CMA
        # window, phase-partition seasonal window — 3 Exchanges, the
        # largest window table in the suite (users x ~700 buckets)
        from smos_spark.operators.anomaly import seasonal_adjust
        from smos_spark.operators.interval import interval_coverage

        evf = spark.read.parquet(f"{sf_dir}/events.parquet")
        _force(seasonal_adjust(evf, "value", ["user_id"]))
        dur_s = F.pmod(
            F.floor(F.col("value") * 100).cast("long"), F.lit(3600)
        ) + F.lit(60)
        iv = evf.where(
            F.col("ts").isNotNull() & F.col("value").isNotNull()
        ).select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("ts").alias("start_ts"),
            F.timestamp_micros(
                F.unix_micros(F.col("ts").cast("timestamp"))
                + dur_s * F.lit(1_000_000)
            ).alias("end_ts"),
        )
        _force(interval_coverage(iv, ["user_id", "day"]))

    def q_growth_attrib():
        # adoption curve (three bounded reductions), calendar-aligned
        # WoW equi-join, first-touch pick over the bucketed range
        # join, and the activation-lag join — all counter-table-sized
        # shuffles
        from smos_spark.operators.events import (
            conversion_lag,
            period_compare,
            user_growth,
        )
        from smos_spark.operators.interval import interval_attribute

        evf = spark.read.parquet(f"{sf_dir}/events.parquet")
        _force(user_growth(evf.select("user_id", "ts")))
        _force(
            period_compare(
                evf.select(
                    "user_id", "ts",
                    F.floor(F.col("value") * 100).cast("long").alias("v"),
                ),
                "v",
                ["user_id"],
            )
        )
        purchases = evf.where(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("start_ts"),
            F.col("ts").alias("end_ts"),
        )
        clicks = evf.where(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts"
        )
        _force(
            interval_attribute(
                clicks, purchases, width_sec=7200.0, on="user_id",
                interval_id_cols=["purchase_id"], tie_cols=["click_id"],
            )
        )
        _force(conversion_lag(evf, "event_type", "view", "purchase"))

    queries = {
        "sessionize": q_sessionize,
        "rollup_cascade": q_rollup_cascade,
        "gapfill_ffill": q_gapfill_ffill,
        "codec_roundtrip": q_codec_roundtrip,
        "codec_chimp": q_codec_chimp,
        "dedup_exact": q_dedup_exact,
        "minhash_pairs": q_minhash_pairs,
        "dedup_e2e": q_dedup_e2e,
        "text_profile": q_text_profile,
        "dup_spans": q_dup_spans,
        "quality_funnel": q_quality_funnel,
        "asof_rolling": q_asof_rolling,
        "downsample": q_downsample,
        "sketches": q_sketches,
        "cms_sketch": q_cms_sketch,
        "quantile_sketch": q_quantile_sketch,
        "pack_sample": q_pack_sample,
        "conv_flow": q_conv_flow,
        "knn_outliers": q_knn_outliers,
        "cosine_topk": q_cosine_topk,
        "quantized_topk": q_quantized_topk,
        "ann_index": q_ann_index,
        "interval_join": q_interval_join,
        "ngram_pairs": q_ngram_pairs,
        "anomaly": q_anomaly,
        "timeagg": q_timeagg,
        "tiered_read": q_tiered_read,
        "slo_burn": q_slo_burn,
        "paa_sax": q_paa_sax,
        "lttb": q_lttb,
        "alerting": q_alerting,
        "robust_stats": q_robust_stats,
        "decompose": q_decompose,
        "growth_attrib": q_growth_attrib,
    }

    # one-time setup for the tiered-read entry: persist the tier
    # cascade to a store so the entry times ONLY the stitched
    # partition-pruned read, not the rollup build (which
    # rollup_cascade already measures)
    import tempfile

    from smos_spark.operators.rollup import reaggregate as _reagg
    from smos_spark.sources.store import TranscriptStore

    _tiered_dir = tempfile.mkdtemp(prefix="bench_tiers_")
    tiered_store = TranscriptStore(_tiered_dir, n_buckets=8)
    _m1 = rollup_from_raw(t, "1m")
    tiered_store.write_tier(_m1, "1m")
    _h1 = _reagg(_m1, "1h")
    tiered_store.write_tier(_h1, "1h")
    tiered_store.write_tier(_reagg(_h1, "1d"), "1d")

    n_trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))
    # UNTIMED warm-up pass: first-trial samples previously carried up
    # to 3.6× cold-start skew (executor-thread spin-up, codegen, Arrow
    # worker pools, parquet footer cache — BENCH_r03 all_trials), which
    # made best-of-N a lottery rather than a measurement. One full
    # suite pass up front pays all one-time costs before trial 1.
    if os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0":
        for fn in queries.values():
            fn()
    samples: dict[str, list[float]] = {}
    for _trial in range(n_trials):
        for name, fn in queries.items():
            t0 = time.time()
            sub = fn()
            elapsed = round(time.time() - t0, 3)
            if isinstance(sub, dict):  # query reports its own phase split
                for sname, sv in sub.items():
                    samples.setdefault(sname, []).append(round(sv, 3))
            else:
                samples.setdefault(name, []).append(elapsed)

    timings = {k: min(v) for k, v in samples.items()}
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline operator suite wall time (best-of-N per query)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "trials": n_trials,
        "all_trials": samples,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "turns": n_turns,
        "turns_per_sec_rollup": round(n_turns / timings["rollup_cascade"], 1),
        "dedup_e2e_rounds": e2e_stats.get("rounds"),
    }
    # PERF REGRESSION GATE: compare each entry's best-of-N against the
    # newest prior-round BENCH_r*.json best (never-clobber files — read
    # only). An entry >1.3x its prior best is flagged loudly on stderr
    # and in the JSON; the process still exits 0 so the record is kept
    # (the host's CPU-window variance makes a hard fail a coin flip —
    # the flag plus all_trials is the attributable signal).
    here = os.path.dirname(os.path.abspath(__file__))
    prior = sorted(
        f for f in os.listdir(here)
        if f.startswith("BENCH_r") and f.endswith(".json")
    )
    regressions: dict[str, dict] = {}
    gate_src = None
    if prior and os.environ.get("SPARK_GRAFT_BENCH_GATE", "1") != "0":
        # a BENCH_r*.json is the HARNESS record {n, rc, sf, tail,
        # parsed}: per-query times live under parsed.queries when the
        # printed line fit the harness's 2000-char stdout tail (it did
        # not in rounds 3-4 — see the compact-line note below). Walk
        # newest-first to the most recent record that carries queries
        # at a matching SF; compare like-for-like only (a different SF
        # makes absolute times incomparable).
        prev: dict = {}
        for fname in reversed(prior):
            with open(os.path.join(here, fname)) as f:
                rec = json.load(f)
            parsed = rec.get("parsed") if isinstance(rec.get("parsed"), dict) else rec
            q = parsed.get("queries")
            sf = parsed.get("sf", rec.get("sf"))
            if q and str(sf) == str(out["sf"]):
                prev, gate_src = q, fname
                break
        for name, now in timings.items():
            base = prev.get(name)
            if base and now > 1.3 * base:
                regressions[name] = {
                    "prev_best": base,
                    "now_best": now,
                    "ratio": round(now / base, 2),
                }
        for name, r in regressions.items():
            print(
                f"PERF REGRESSION {name}: {r['now_best']}s vs "
                f"{r['prev_best']}s in {gate_src} ({r['ratio']}x > 1.3x gate)",
                file=sys.stderr,
            )
    out["regression_gate"] = {"gate_vs": gate_src,
                              "flagged": regressions}
    # scaling evidence (local[8] vs local[32] on the identical job/input,
    # produced by scripts/bench_scaling.py — see BENCH.md protocol)
    scaling_file = os.path.join(here, "BENCH_SCALING.json")
    if os.path.exists(scaling_file):
        with open(scaling_file) as f:
            out["scaling"] = json.load(f)
    # sf1 row-scaling evidence for the heavy entries (scripts/bench_sf1.py)
    sf1_file = os.path.join(here, "BENCH_SF1.json")
    if os.path.exists(sf1_file):
        with open(sf1_file) as f:
            out["sf1"] = json.load(f)
    # FULL record (all_trials, full scaling/sf1 blocks) to a side file;
    # stdout gets a COMPACT line. The harness keeps only the LAST 2000
    # chars of stdout and json-parses them — the full record outgrew
    # that in rounds 3-4 (BENCH_r03/r04 show parsed:null with a
    # truncated tail), so the printed line must stay under the cap.
    # Never-clobber: keep the best full record per SF. A smoke run at
    # another SF, or a re-run in a collapsed host window, must not
    # overwrite the standing record (BENCH.md "window collapse") — it
    # goes to BENCH_LOCAL_LAST.json instead.
    full_path = os.path.join(here, "BENCH_LOCAL_FULL.json")
    keep_standing = False
    if os.path.exists(full_path):
        try:
            with open(full_path) as f:
                standing = json.load(f)
            if str(standing.get("sf")) != str(out["sf"]):
                keep_standing = True
            else:
                sq, nq = standing.get("queries", {}), out["queries"]
                common = set(sq) & set(nq)
                if common and sum(nq[k] for k in common) > sum(
                    sq[k] for k in common
                ):
                    keep_standing = True
        except (ValueError, KeyError):
            pass
    with open(
        os.path.join(
            here, "BENCH_LOCAL_LAST.json" if keep_standing else
            "BENCH_LOCAL_FULL.json"
        ), "w",
    ) as f:
        json.dump(out, f, indent=1)
    compact = {
        k: out[k]
        for k in (
            "metric", "value", "unit", "queries", "trials", "sf", "turns",
            "turns_per_sec_rollup", "dedup_e2e_rounds",
        )
    }
    compact["regressions"] = sorted(regressions)
    if "scaling" in out:
        s = out["scaling"]
        compact["scaling"] = {
            "turns": s.get("turns"),
            "t8": s.get("throughput_8"),
            "t32": s.get("throughput_32"),
            "eff": s.get("scaling_efficiency"),
            "eff_vs_host_ceiling": s.get("efficiency_vs_ceiling"),
        }
    if "sf1" in out:
        compact["sf1_time_ratio_10x_rows"] = {
            k: v.get("time_ratio_10x_rows")
            for k, v in out["sf1"].get("entries", {}).items()
        }
    compact["full_record"] = (
        "BENCH_LOCAL_LAST.json" if keep_standing else "BENCH_LOCAL_FULL.json"
    )
    line = json.dumps(compact)
    if len(line) > 1900:  # stay under the 2000-char stdout tail cap
        compact.pop("sf1_time_ratio_10x_rows", None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
