"""Headline benchmark: engine operators at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...}

Each query is forced end-to-end with the `noop` DSv2 sink (full
materialization, no collect-to-driver, no skipped aggregate columns).
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

    def q_dedup_exact():
        _force(dedup_exact(docs))

    def q_minhash_pairs():
        _force(minhash_dedup_pairs(docs, threshold=0.7, portable=False))

    def q_text_profile():
        _force(text_profile(docs, portable=False))

    def q_cosine_topk():
        _force(cosine_topk(embs, query_id=0, k=10))

    def q_ann_index():
        # persisted-index lifecycle: one build (cell-partitioned write +
        # centroid sidecar), then partition-pruned queries
        import shutil
        import tempfile

        from smos_spark.operators.ann_index import build_ann_index

        root = tempfile.mkdtemp(prefix="smos_bench_ann_")
        try:
            idx = build_ann_index(embs, root, strategy="ivf", cell_col="label")
            for qid in (0, 101, 202, 303, 404):
                _force(idx.topk(spark, query_id=qid, k=10, n_probe=3))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def q_sessionize():
        from smos_spark.operators.sessionize import session_stats

        _force(session_stats(t, gap_seconds=1800))

    queries = {
        "sessionize": q_sessionize,
        "rollup_cascade": q_rollup_cascade,
        "gapfill_ffill": q_gapfill_ffill,
        "codec_roundtrip": q_codec_roundtrip,
        "dedup_exact": q_dedup_exact,
        "minhash_pairs": q_minhash_pairs,
        "text_profile": q_text_profile,
        "cosine_topk": q_cosine_topk,
        "ann_index": q_ann_index,
    }

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "turns": n_turns,
        "turns_per_sec_rollup": round(n_turns / timings["rollup_cascade"], 1),
    }
    # scaling evidence (local[8] vs local[32] on the identical job/input,
    # produced by scripts/bench_scaling.py — see BENCH.md protocol)
    scaling_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json")
    if os.path.exists(scaling_file):
        with open(scaling_file) as f:
            out["scaling"] = json.load(f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
