"""spark-submit entry point: the production rollup job.

Reads a transcripts parquet table, builds the 1m tier from raw, the 1h
tier from 1m, the 1d tier from 1h (exact partial re-aggregation), and
writes all three to a partitioned tier store
(bucket_date=YYYY-MM-DD/bucket_id=K — time-major for incremental
merges, key-bucketed for point-read locality). Prints one JSON line
with row counts + wall time; the scaling harness runs this identical
job at two parallelism levels (local[8] / local[32]) to evidence the
N→4N executor scaling-efficiency criterion.

Cluster launch shape (the real thing this mirrors):
  spark-submit --master <cluster> --py-files engine.zip \
      scripts/rollup_job.py --input s3://.../transcripts \
      --output s3://.../tiers
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet path")
    ap.add_argument("--output", required=True, help="tier store root")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--salted", action="store_true", help="two-phase skew-safe 1m rollup")
    ap.add_argument(
        "--blocks",
        action="store_true",
        help="also gap-fill the 1h series and write Gorilla/DoD-compressed "
        "per-conv blocks (the full north-star pipeline)",
    )
    args = ap.parse_args()

    from smos_spark.operators.rollup import (
        reaggregate,
        rollup_from_raw,
        salted_rollup_from_raw,
    )
    from smos_spark.session import get_spark
    from smos_spark.sources.store import TranscriptStore

    spark = get_spark(
        master=args.master,
        app_name="smos_spark_rollup",
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    raw = spark.read.parquet(args.input)
    if "ts_date" in raw.columns:
        raw = raw.drop("ts_date")

    build_1m = salted_rollup_from_raw if args.salted else rollup_from_raw
    m1 = build_1m(raw, "1m")

    phases = {}
    store = TranscriptStore(args.output, n_buckets=args.n_buckets)
    store.write_tier(m1, "1m")
    phases["1m"] = round(time.time() - t0, 3)
    t1 = time.time()
    m1_stored = store.read_tier(spark, "1m")
    h1 = reaggregate(m1_stored, "1h")
    store.write_tier(h1, "1h")
    phases["1h"] = round(time.time() - t1, 3)
    t2 = time.time()
    d1 = reaggregate(store.read_tier(spark, "1h"), "1d")
    store.write_tier(d1, "1d")
    phases["1d"] = round(time.time() - t2, 3)

    if args.blocks:
        # regularize + forward-fill the 1h series per conv, then
        # compress (delta-of-delta timestamps + Gorilla values) into
        # one block row per conversation — the compact long-retention
        # representation (codec work runs in Arrow-batched Python
        # workers; this stage scales with processes, not JVM threads).
        from pyspark.sql import functions as F

        from smos_spark.operators.compress import compress_series
        from smos_spark.operators.gapfill import forward_fill, gap_fill

        t3 = time.time()
        h1_stored = store.read_tier(spark, "1h").select(
            "conv_id", "bucket_start", "n_turns", "len_sum"
        )
        filled = forward_fill(
            gap_fill(h1_stored, "1h"), ["n_turns", "len_sum"]
        ).select(
            "conv_id",
            F.col("bucket_start").alias("ts"),
            F.col("n_turns").cast("double").alias("n_turns"),
            F.col("len_sum").cast("double").alias("len_sum"),
        )
        blocks = compress_series(filled, ["n_turns", "len_sum"])
        blocks.write.mode("overwrite").parquet(str(store.root / "blocks_1h"))
        phases["blocks"] = round(time.time() - t3, 3)

    wall = time.time() - t0

    n_turns = raw.count()
    counts = {tier: store.read_tier(spark, tier).count() for tier in ("1m", "1h", "1d")}
    print(
        json.dumps(
            {
                "job": "rollup",
                "master": spark.sparkContext.master,
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
                "turns": n_turns,
                "tier_rows": counts,
                "phases": phases,
                "wall_sec": round(wall, 3),
                "turns_per_sec": round(n_turns / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
