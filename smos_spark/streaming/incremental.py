"""Incremental, resumable tier maintenance — the extend_ts analog.

Reference semantics (/root/reference/src/smos/smos_l2/reshuffle.py:96-155):
  * `overview.yml` records last_day; extend starts there (:121-122)
  * prepend/overwrite is REFUSED (:75-77) — late data is an error, not
    a merge (our quarantine routes it to a side table instead of dying)
  * the state file is written only after a successful repurpose
    (:147-152) — commit follows data

Our engine upgrades that to per-batch lineage rows and idempotent
resume: a batch already present in the checkpoint table is skipped, so
re-running an interrupted job converges to the identical store (tested
byte-for-byte at the tier level in tests/test_incremental.py).

Merge strategy on parquet (no Iceberg MERGE in sandbox): tier buckets
straddling the batch boundary are re-aggregated from (existing tier ∪
new partials) and rewritten via dynamic partition overwrite — the
write-then-commit-manifest pattern; the overview commit is the atomic
rename at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smos_spark.operators.rollup import reaggregate, rollup_from_raw
from smos_spark.sources.store import Overview, TranscriptStore


class MonotonicAppendError(ValueError):
    """New batch starts at or before the store's last_day — the
    reference's prepend guard (smos_l2/reshuffle.py:75-77)."""


def split_late_rows(batch: DataFrame, last_day: str | None):
    """Route rows at/before the checkpoint — and rows with NULL ts,
    which a time-series store cannot place — to quarantine (late-data
    policy, SURVEY.md §2.8). Returns (on_time, late)."""
    null_ts = F.col("ts").isNull()
    if last_day is None:
        return batch.where(~null_ts), batch.where(null_ts)
    cut = F.lit(last_day).cast("timestamp")
    return (
        batch.where(F.col("ts") > cut),  # null ts fails the predicate
        batch.where(null_ts | (F.col("ts") <= cut)),
    )


def ingest_batch(
    store: TranscriptStore,
    batch: DataFrame,
    run_id: str,
    batch_id: int,
    strict: bool = False,
    quarantine: bool = True,
) -> dict:
    """Append one batch of raw turns and incrementally maintain all
    three tiers. Idempotent per (run_id, batch_id). Holds the store's
    advisory writer lock for the duration: the parquet+manifest layout
    has no snapshot isolation, so a second concurrent writer raises
    ConcurrentWriterError instead of interleaving partition
    overwrites."""
    store.acquire_writer_lock()
    try:
        return _ingest_batch_locked(store, batch, run_id, batch_id, strict, quarantine)
    finally:
        store.release_writer_lock()


def _ingest_batch_locked(
    store: TranscriptStore,
    batch: DataFrame,
    run_id: str,
    batch_id: int,
    strict: bool,
    quarantine: bool,
) -> dict:
    spark = batch.sparkSession
    ov = store.load_overview()

    # --- resume / idempotence: skip an already-committed batch ---
    cp = store.read_checkpoint(spark)
    if cp is not None:
        done = (
            cp.where((F.col("run_id") == run_id) & (F.col("batch_id") == batch_id))
            .limit(1)
            .count()
        )
        if done:
            return {"skipped": True, "batch_id": batch_id}

    if batch_id <= ov.last_batch_id:
        # overview says committed but checkpoint row missing → the
        # previous run died between data write and lineage append;
        # overview is the commit point, so treat as done.
        return {"skipped": True, "batch_id": batch_id}

    # --- monotonic guard / late/invalid-data routing ---
    # ONE bounds job computes raw counts AND the on-time-only
    # (non-null ts > last_day) variants as conditional aggregates, so
    # the late path needs no second scan. NULL-ts rows count as
    # not-on-time: a time-series store cannot place them, so they go
    # to quarantine rather than silently vanishing.
    if ov.last_day is not None:
        on_time = F.when(
            F.col("ts") > F.lit(ov.last_day).cast("timestamp"), F.col("ts")
        )
    else:
        on_time = F.col("ts")  # count() skips NULLs
    bounds = batch.agg(
        F.min("ts").alias("raw_lo"),
        F.count(F.lit(1)).alias("n_raw"),
        F.min(on_time).alias("lo"),
        F.max(on_time).alias("hi"),
        F.count(on_time).alias("n"),
    ).collect()[0]
    lo, hi, n_in = bounds.lo, bounds.hi, bounds.n
    if bounds.n_raw != n_in:  # some rows are late and/or NULL-ts
        if strict:
            raise MonotonicAppendError(
                f"batch has {bounds.n_raw - n_in} late/NULL-ts rows "
                f"(starts at {bounds.raw_lo}, store last_day {ov.last_day})"
            )
        batch, late = split_late_rows(batch, ov.last_day)
        if quarantine:
            late.write.mode("append").parquet(str(store.root / "_quarantine"))
    if n_in == 0:
        ov.last_batch_id = batch_id
        store.save_overview(ov)
        return {"skipped": False, "batch_id": batch_id, "rows_in": 0}

    batch = batch.cache()
    store.append_transcripts(batch)

    # --- tier maintenance: re-aggregate only affected buckets ---
    stats: list[dict] = []
    new_1m = rollup_from_raw(batch, "1m")
    affected = {"1m": new_1m}
    affected["1h"] = reaggregate(new_1m, "1h")
    affected["1d"] = reaggregate(affected["1h"], "1d")

    import datetime as _dt
    import shutil as _shutil
    from pathlib import Path

    from pyspark.sql import Observation

    # every bucket the batch touches starts on/after lo's calendar day
    # (bucket_start = date_trunc(unit, ts ≥ lo)), so the day-aligned
    # rewrite boundary is known WITHOUT a per-tier min() job
    batch_day = str(lo)[:10]
    # the batch's calendar-day span, enumerated driver-side (no job):
    # any derived compressed blocks for these days encode PRE-append
    # tier values and must be dropped (same tier/blocks consistency
    # rule as retention and merge_quarantine). Dropping an untouched
    # day in the span is safe — it just re-encodes later.
    d0 = _dt.date.fromisoformat(batch_day)
    d1 = _dt.date.fromisoformat(str(hi)[:10])
    batch_days = [
        str(d0 + _dt.timedelta(days=i)) for i in range((d1 - d0).days + 1)
    ]
    for tier in ("1m", "1h", "1d"):
        new_partials = affected[tier]
        tier_exists = Path(store.tier_path(tier)).exists()
        # rows_out via an observed metric on the write itself — no
        # post-write count job, no full-table scan
        obs = Observation(f"tier_{tier}_b{batch_id}")
        if not tier_exists:
            out = new_partials.observe(obs, F.count(F.lit(1)).alias("rows_out"))
            store.write_tier(out, tier, mode="overwrite")
        else:
            # only date partitions the batch touches need rewriting;
            # the boundary is day-aligned because the physical layout
            # partitions on bucket_date — everything before it is final
            # and is neither read (partition pruning) nor written.
            overlap = store.read_tier_since(spark, tier, batch_day)
            merged = reaggregate(overlap.unionByName(new_partials), tier)
            out = merged.observe(obs, F.count(F.lit(1)).alias("rows_out"))
            store.overwrite_tier_partitions(out, tier)
        for d in batch_days:
            bdir = Path(store.blocks_path(tier)) / f"block_date={d}"
            if bdir.exists():
                _shutil.rmtree(bdir)
                stats.append(
                    {
                        "run_id": run_id,
                        "batch_id": batch_id,
                        "tier": f"blocks_{tier}",
                        "partition_key": f"block_date={d}",
                        "rows_in": 0,
                        "rows_out": 0,
                        "min_ts": None,
                        "max_ts": None,
                        "committed_seq": -1,
                    }
                )
        out_rows = obs.get["rows_out"]
        stats.append(
            {
                "run_id": run_id,
                "batch_id": batch_id,
                "tier": tier,
                "partition_key": "all",
                "rows_in": n_in,
                "rows_out": out_rows,
                "min_ts": lo,
                "max_ts": hi,
                "committed_seq": batch_id * 10 + {"1m": 0, "1h": 1, "1d": 2}[tier],
            }
        )

    # --- commit: lineage rows, then overview (atomic rename last) ---
    store.append_checkpoint(spark, stats)
    ov.last_day = max(str(hi), ov.last_day or "")
    ov.last_batch_id = batch_id
    store.save_overview(ov)
    batch.unpersist()
    return {"skipped": False, "batch_id": batch_id, "rows_in": n_in}


def ingest_batches(
    store: TranscriptStore,
    batches: list[DataFrame],
    run_id: str,
    start_batch: int = 0,
) -> list[dict]:
    """Drive a sequence of time-ordered micro-batches (the imgbuffer
    loop analog, Trigger.AvailableNow shape)."""
    return [
        ingest_batch(store, b, run_id, i)
        for i, b in enumerate(batches[start_batch:], start=start_batch)
    ]


def merge_quarantine(
    store: TranscriptStore,
    spark: SparkSession,
    run_id: str,
) -> dict:
    """Late-data backfill — the Iceberg-MERGE analog the append-only
    ingest refuses to do inline. Quarantined rows (ts at/before the
    store's last_day) are merged into the raw table and every tier
    partition they touch is recomputed FROM RAW, so the store ends
    byte-identical to one built with the late rows on time.

    Idempotent under a crash at ANY point, without transactions:

    * the quarantine directory is FROZEN first by an atomic rename to
      ``_quarantine_merging`` — new late rows keep accumulating in a
      fresh ``_quarantine``; a leftover frozen dir on entry means a
      prior merge crashed and is simply re-processed;
    * the raw table is NOT appended to: the affected ``ts_date``
      partitions are rewritten as dedup(existing ∪ late) on the
      (conv_id, turn_idx) turn key via dynamic partition overwrite —
      re-running after any crash converges to the same bytes;
    * tiers are recomputed for the affected bucket_dates from the
      MERGED raw days (1m/1h/1d buckets never span a day, so a day
      recompute is self-contained) — also a dynamic overwrite;
    * derived compressed block stores (``blocks_<tier>/block_date=d``)
      are computed FROM tier rows, so a merged day makes its blocks
      stale: they are DROPPED for every affected day (same tier/blocks
      consistency rule retention enforces) and the drop is recorded in
      lineage — a reader hitting the missing day re-encodes from the
      (now correct) tier instead of silently serving pre-merge values;
    * the lineage row commits, then the frozen dir is deleted.
      A crash in between re-runs the (idempotent) rewrites once more.

    Survivor choice on a turn-key collision is DETERMINISTIC: the late
    row wins (a late delivery is a correction — MERGE/upsert
    semantics), and ties within a side break on (ts, role, tool, text),
    so re-running the merge — or racing rows inside one merge — always
    converges to the same bytes.

    NULL-ts rows can never be placed on the time axis; they are moved
    to ``_quarantine_unplaceable`` (mode=overwrite per merge — also
    rerun-safe) instead of poisoning retries forever.

    Scale shape: late data clusters near the append boundary, so the
    rewrite set is a handful of day partitions regardless of table
    size; everything else is partition-pruned out of both the read
    and the write. One shuffle per tier recompute, same plans as the
    original ingest.
    """
    import shutil
    from pathlib import Path

    store.acquire_writer_lock()
    try:
        qdir = Path(store.root) / "_quarantine"
        frozen = Path(store.root) / "_quarantine_merging"
        if not frozen.exists():
            if not qdir.exists():
                return {"merged": 0, "unplaceable": 0, "days": []}
            qdir.rename(frozen)

        from smos_spark.schema import TRANSCRIPTS_SCHEMA

        late = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(str(frozen))
        placeable = late.where(F.col("ts").isNotNull()).cache()
        b = late.agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count("ts").alias("n_late"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        ).collect()[0]
        n_null, n_late = b.n_all - b.n_late, b.n_late
        if n_null:
            (
                late.where(F.col("ts").isNull())
                .write.mode("overwrite")
                .parquet(str(Path(store.root) / "_quarantine_unplaceable"))
            )
        days = [
            str(r.d)
            for r in placeable.select(
                F.to_date("ts").alias("d")
            ).distinct().collect()
        ]
        if not days:
            shutil.rmtree(frozen)
            return {"merged": 0, "unplaceable": n_null, "days": []}

        # --- raw merge: rewrite only the affected day partitions ---
        from pyspark.sql import Window

        raw = spark.read.parquet(store.transcripts_path)
        existing_days = raw.where(F.col("ts_date").isin(days)).drop("ts_date")
        # deterministic survivor per turn key: late (_src=0) beats
        # existing (_src=1); within a side, (ts, role, tool, text) is a
        # total order over the payload so dropDuplicates' arbitrary pick
        # can't make reruns diverge. Window partitions are turn keys —
        # a handful of rows each, no skew.
        surv = Window.partitionBy("conv_id", "turn_idx").orderBy(
            "_src", "ts", "role", "tool", "text"
        )
        merged_days = (
            existing_days.withColumn("_src", F.lit(1))
            .unionByName(placeable.withColumn("_src", F.lit(0)))
            .withColumn("_rn", F.row_number().over(surv))
            .where(F.col("_rn") == 1)
            .drop("_src", "_rn")
            .withColumn("ts_date", F.to_date("ts"))
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged_days.repartition("ts_date")
                .write.partitionBy("ts_date")
                .mode("overwrite")
                .parquet(store.transcripts_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

        # --- tier recompute from the merged raw days ---
        raw_days = (
            spark.read.parquet(store.transcripts_path)
            .where(F.col("ts_date").isin(days))
            .drop("ts_date")
        )
        tiers = {"1m": rollup_from_raw(raw_days, "1m")}
        tiers["1h"] = reaggregate(tiers["1m"], "1h")
        tiers["1d"] = reaggregate(tiers["1h"], "1d")
        stats = []
        ov = store.load_overview()
        merge_batch = ov.last_batch_id + 1
        for tier, out in tiers.items():
            store.overwrite_tier_partitions(out, tier)
            # the tier's derived compressed block store shares the day
            # layout; its blocks for a merged day now encode PRE-merge
            # values — drop them (mirrors retention's block handling)
            for d in days:
                bdir = Path(store.blocks_path(tier)) / f"block_date={d}"
                if bdir.exists():
                    shutil.rmtree(bdir)
                    stats.append(
                        {
                            "run_id": run_id,
                            "batch_id": merge_batch,
                            "tier": f"blocks_{tier}",
                            "partition_key": f"block_date={d}",
                            "rows_in": 0,
                            "rows_out": 0,
                            "min_ts": None,
                            "max_ts": None,
                            "committed_seq": -1,
                        }
                    )
            stats.append(
                {
                    "run_id": run_id,
                    "batch_id": merge_batch,
                    "tier": tier,
                    "partition_key": ",".join(sorted(days)),
                    "rows_in": n_late,
                    "rows_out": -1,  # dynamic overwrite; day-scoped
                    "min_ts": b.lo,
                    "max_ts": b.hi,
                    "committed_seq": merge_batch * 10
                    + {"1m": 0, "1h": 1, "1d": 2}[tier],
                }
            )
        store.append_checkpoint(spark, stats)
        ov.last_batch_id = merge_batch
        store.save_overview(ov)
        placeable.unpersist()
        shutil.rmtree(frozen)
        return {"merged": n_late, "unplaceable": n_null, "days": sorted(days)}
    finally:
        store.release_writer_lock()
