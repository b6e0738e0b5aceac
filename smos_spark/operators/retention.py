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

__all__ = ["DEFAULT_RETENTION", "apply_retention"]

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
