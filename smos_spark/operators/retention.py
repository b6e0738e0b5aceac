"""Retention enforcement — expire aged-out tier partitions.

The point of the 1m/1h/1d tier cascade is RETENTION: fine tiers are
kept for a short horizon, coarse tiers longer (the classic downsample
+ expire policy; the reference's analog is simply never re-reading old
daily images once cell files exist). Enforcement here is partition-
level: a tier's `bucket_date=` directories older than the policy
horizon are dropped whole — no row rewrite, no scan of surviving data
(the Iceberg equivalent is `DELETE WHERE bucket_date < cutoff` +
`expire_snapshots`, which is likewise metadata-only on a
day-partitioned table).

Expiry is recorded in the store's checkpoint lineage (one metrics row
per dropped partition) so a resumed/auditing job can account for
missing history, and the overview gains `retention_floor` per tier —
readers can refuse to gap-fill below it (those buckets are *expired*,
not *missing*).
"""

from __future__ import annotations

import datetime as dt
import shutil
from pathlib import Path

from pyspark.sql import SparkSession

from smos_spark.sources.store import TranscriptStore

__all__ = [
    "DEFAULT_RETENTION",
    "apply_retention",
    "plan_tier_segments",
    "tiered_read",
    "tiered_read_store",
]

# horizon (days of bucket_date kept), per tier; None = keep forever
DEFAULT_RETENTION = {"1m": 7, "1h": 90, "1d": None}


def apply_retention(
    spark: SparkSession,
    store: TranscriptStore,
    now,
    policy: dict[str, int | None] | None = None,
    run_id: str = "retention",
) -> dict[str, list[str]]:
    """Drop tier partitions whose bucket_date is older than
    `now - policy[tier]` days. Returns {tier: [dropped dates]}.

    `now` is an explicit timestamp/date (never wall clock — jobs must
    be replayable); policy values are day counts or None (keep all).

    Holds the store's advisory writer lock for the duration (don't
    call while already holding it): partition drops and the lineage
    compaction would otherwise race a concurrent ingest_batch — the
    compaction snapshots the checkpoint directory, so an append
    landing mid-swap would be moved aside and deleted with it.
    """
    store.acquire_writer_lock()
    try:
        return _apply_retention_locked(spark, store, now, policy, run_id)
    finally:
        store.release_writer_lock()


def _apply_retention_locked(
    spark: SparkSession,
    store: TranscriptStore,
    now,
    policy: dict[str, int | None] | None,
    run_id: str,
) -> dict[str, list[str]]:
    policy = {**DEFAULT_RETENTION, **(policy or {})}
    if isinstance(now, str):
        now = dt.date.fromisoformat(now[:10])
    elif isinstance(now, dt.datetime):
        now = now.date()

    dropped: dict[str, list[str]] = {}
    lineage: list[dict] = []
    ov = store.load_overview()
    floors = dict(getattr(ov, "extra", {}).get("retention_floor", {}))

    for tier, days in policy.items():
        dropped[tier] = []
        if days is None:
            continue
        cutoff = now - dt.timedelta(days=days)
        tier_dir = Path(store.tier_path(tier))
        if not tier_dir.exists():
            continue
        for date_dir in sorted(tier_dir.glob("bucket_date=*")):
            d = dt.date.fromisoformat(date_dir.name.split("=", 1)[1])
            if d < cutoff:
                shutil.rmtree(date_dir)
                dropped[tier].append(str(d))
                lineage.append(
                    {
                        "run_id": run_id,
                        "batch_id": -1,
                        "tier": tier,
                        "partition_key": f"bucket_date={d}",
                        "rows_in": 0,
                        "rows_out": 0,
                        "min_ts": None,
                        "max_ts": None,
                        "committed_seq": -1,
                    }
                )
        # the tier's compressed block store (blocks_<tier>/block_date=…)
        # shares the day-partition layout and the SAME horizon: expired
        # tier rows must not survive as decodable blocks
        blocks_dir = Path(store.blocks_path(tier))
        if blocks_dir.exists():
            for date_dir in sorted(blocks_dir.glob("block_date=*")):
                d = dt.date.fromisoformat(date_dir.name.split("=", 1)[1])
                if d < cutoff:
                    shutil.rmtree(date_dir)
                    dropped[tier].append(f"blocks:{d}")
                    lineage.append(
                        {
                            "run_id": run_id,
                            "batch_id": -1,
                            "tier": f"blocks_{tier}",
                            "partition_key": f"block_date={d}",
                            "rows_in": 0,
                            "rows_out": 0,
                            "min_ts": None,
                            "max_ts": None,
                            "committed_seq": -1,
                        }
                    )
        if dropped[tier]:
            floors[tier] = str(cutoff)

    if lineage:
        store.append_checkpoint(spark, lineage)
    # retention is the natural periodic maintenance hook: fold the
    # per-batch single-file lineage appends back into one file
    store.compact_checkpoint(spark)
    if floors:
        if not hasattr(ov, "extra") or ov.extra is None:
            ov.extra = {}
        ov.extra["retention_floor"] = floors
        store.save_overview(ov)
    return dropped


def _ceil_to_unit(t: dt.datetime, seconds: int) -> dt.datetime:
    """Smallest unit-aligned timestamp >= t (pure integer µs math)."""
    us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    unit_us = seconds * 1_000_000
    snapped = -(-us // unit_us) * unit_us
    return dt.datetime.fromtimestamp(snapped / 1_000_000, dt.timezone.utc).replace(
        tzinfo=None
    )


def plan_tier_segments(
    tier_names,
    t0: dt.datetime | str,
    t1: dt.datetime | str,
    now: dt.datetime | str,
    keep_s=None,
):
    """Driver-side segment planner shared by `tiered_read` (in-memory
    frames) and `tiered_read_store` (partition-pruned store scans):
    returns (order, [(tier, lo, hi), …]) with lo/hi the bucket-aligned
    cut semantics documented on `tiered_read`.  Pure datetime math,
    O(#tiers)."""
    from smos_spark.schema import TIERS

    def _ts(x):
        if isinstance(x, str):
            return dt.datetime.fromisoformat(x)
        return x

    t0, t1, now = _ts(t0), _ts(t1), _ts(now)
    if t0 >= t1:
        raise ValueError("t0 must be < t1")
    for name in tier_names:
        if name not in TIERS:
            raise ValueError(f"unknown tier {name!r}")
    if keep_s is None:
        keep_s = {
            k: (None if v is None else v * 86400)
            for k, v in DEFAULT_RETENTION.items()
        }
    order = [name for name in TIERS if name in tier_names]  # fine→coarse
    if not order:
        raise ValueError("tiers must not be empty")

    # cut[i]: boundary between order[i] (serves newer) and order[i+1]
    cuts: list[dt.datetime] = []
    for i in range(len(order) - 1):
        keep = keep_s.get(order[i])
        coarser_sec = TIERS[order[i + 1]]["seconds"]
        if keep is None:  # finer tier keeps forever: it serves everything
            cut = t0
        else:
            cut = _ceil_to_unit(now - dt.timedelta(seconds=keep), coarser_sec)
        if cuts:
            cut = min(cut, cuts[-1])  # monotone: older cuts never newer
        cuts.append(cut)

    segments = []  # (tier, lo, hi)
    hi = t1
    for i, name in enumerate(order):
        if i < len(cuts):
            lo = max(t0, cuts[i])
        else:  # coarsest tier
            keep = keep_s.get(name)
            lo = t0
            if keep is not None:  # finite tail: older buckets are EXPIRED
                lo = max(
                    t0,
                    _ceil_to_unit(
                        now - dt.timedelta(seconds=keep),
                        TIERS[name]["seconds"],
                    ),
                )
        if lo < hi:
            segments.append((name, lo, hi))
        hi = min(hi, lo)
    return order, segments


def tiered_read(
    tiers,
    t0: dt.datetime | str,
    t1: dt.datetime | str,
    now: dt.datetime | str,
    keep_s=None,
):
    """Retention-aware tiered range read — the continuous-aggregate
    read path (TimescaleDB real-time-aggregate / Prometheus
    downsampled-read analog): serve [t0, t1) at the finest resolution
    each sub-range still retains, stitching tiers at deterministic
    bucket-aligned cuts.

    `tiers` maps tier name → its partials DataFrame (conv_id,
    bucket_start, …) as produced by ``rollup.rollup_from_raw`` /
    ``reaggregate``; `keep_s` maps tier → retention seconds (None =
    keep forever; defaults to DEFAULT_RETENTION days).  For each tier,
    data is available from `now − keep`; the cut between tier i and
    the next coarser tier is that availability start snapped UP to the
    COARSER tier's bucket boundary, so the coarser segment always ends
    on one of its own whole buckets (the finer tier's buckets align to
    every coarser boundary, so the finer segment starts clean too).
    Cuts are clamped monotone (a coarser tier can never cut after a
    finer one), which also makes inverted retention policies safe.

    Output: the UNION of the per-tier segment reads, each row tagged
    with its ``tier``; a bucket is served iff its bucket_start lies in
    the tier's segment — whole stored buckets, never partially
    re-aggregated ones, so every value is exactly a stored tier row.

    Scale shape: each segment is a pure range predicate on
    bucket_start pushed into that tier's scan (partition/row-group
    pruning on the store's bucket_date layout; no shuffle, no join —
    the union is read-only plan glue).  The driver-side boundary math
    is O(#tiers) plain datetimes.
    """
    from pyspark.sql import functions as F

    order, segments = plan_tier_segments(list(tiers), t0, t1, now, keep_s)
    out = None
    for name, lo, hi_ in segments:
        part = tiers[name].where(
            (F.col("bucket_start") >= F.lit(lo))
            & (F.col("bucket_start") < F.lit(hi_))
        )
        part = part.select(F.lit(name).alias("tier"), *tiers[name].columns)
        out = part if out is None else out.unionByName(part)
    if out is None:  # whole range expired: empty frame, finest schema
        base = tiers[order[0]]
        return base.where(F.lit(False)).select(
            F.lit(order[0]).alias("tier"), *base.columns
        )
    return out


def tiered_read_store(
    spark: SparkSession,
    store: TranscriptStore,
    t0: dt.datetime | str,
    t1: dt.datetime | str,
    now: dt.datetime | str,
    keep_s=None,
    tier_names=("1m", "1h", "1d"),
):
    """`tiered_read` against a TranscriptStore's persisted tier
    layout, with the segment range ALSO applied to the bucket_date
    PARTITION column so each segment's scan prunes to its own day
    directories (bucket_start alone is a data column — it row-group
    prunes via min/max stats but cannot drop partitions).  The
    bucket_date predicate is the enclosing-day widening of
    [lo, hi): date(lo) .. date(hi − 1µs), exact because a bucket's
    date is derived from its bucket_start."""
    from pyspark.sql import functions as F

    order, segments = plan_tier_segments(list(tier_names), t0, t1, now, keep_s)
    out = None
    cols = None
    for name, lo, hi in segments:
        df = spark.read.parquet(store.tier_path(name))
        if cols is None:
            cols = [c for c in df.columns if c not in ("bucket_id", "bucket_date")]
        part = (
            df.where(
                (F.col("bucket_date") >= F.lit(lo.date()))
                & (
                    F.col("bucket_date")
                    <= F.lit((hi - dt.timedelta(microseconds=1)).date())
                )
                & (F.col("bucket_start") >= F.lit(lo))
                & (F.col("bucket_start") < F.lit(hi))
            )
            .drop("bucket_id", "bucket_date")
            .select(F.lit(name).alias("tier"), *cols)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        base = store.read_tier(spark, order[0])
        return base.where(F.lit(False)).select(
            F.lit(order[0]).alias("tier"), *base.columns
        )
    return out
