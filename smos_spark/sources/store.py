"""Partitioned table store — the engine's cell-file/catalog analog.

Layout (parquet + manifest; an Iceberg runtime jar isn't available in
this sandbox, so snapshots are modeled by an atomic JSON overview +
an append-only checkpoint table — the logical semantics are identical
and the substitution is documented in BENCH/BASELINE.md):

    root/
      transcripts/ts_date=YYYY-MM-DD/...   raw turns, days(ts) pruning
      tiers/{1m,1h,1d}/bucket_id=K/...     tier partials, key-bucketed
      _checkpoint/                         per-batch lineage+metrics rows
      overview.json                        last_day / parameters state

* `ts_date` partitioning ≙ the reference's yearly-subdir + date-coded
  filename layout (/root/reference/src/smos/interface.py:436-444):
  time predicates prune whole directories.
* `bucket_id = pmod(xxhash64(conv_id), n_buckets)` ≙ the 5°×5° cell
  assignment `lonlat2cell` (/root/reference/src/smos/grid.py:100-105);
  a point read touches exactly one bucket directory the way the
  reference reads one cell file (docs/img2ts.rst:13-16).
* `overview.json` ≙ overview.yml (smos_l2/reshuffle.py:71-94): written
  only after a successful batch, read back for the monotonic guard.
"""

from __future__ import annotations

import json
import os
import warnings
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smos_spark.schema import TIERS

DEFAULT_N_BUCKETS = 64

#: expected distinct conv_ids per written file for the parquet bloom
#: filter (sizes the bitmap; ~80 KB/file at 2^16 NDV / 1% FPP)
DEFAULT_BLOOM_NDV = 1 << 16


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted tier maintenance on a locked store."""

CHECKPOINT_SCHEMA = (
    "run_id string, batch_id long, tier string, partition_key string, "
    "rows_in long, rows_out long, min_ts timestamp, max_ts timestamp, "
    "committed_seq long"
)


def bucket_expr(col: str = "conv_id", n_buckets: int = DEFAULT_N_BUCKETS):
    """Deterministic key→bucket assignment (J4, the lonlat2cell analog)."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


@dataclass
class Overview:
    """State sidecar (overview.yml analog, misc.py:82-90)."""

    last_day: str | None = None  # max ts seen, ISO string
    last_batch_id: int = -1
    parameters: dict | None = None
    extra: dict = None  # free-form state (e.g. retention_floor per tier)

    @classmethod
    def load(cls, path: Path) -> "Overview":
        if not path.exists():
            return cls(extra={})
        d = json.loads(path.read_text())
        return cls(
            last_day=d.get("last_day"),
            last_batch_id=d.get("last_batch_id", -1),
            parameters=d.get("parameters"),
            extra=d.get("extra") or {},
        )

    def save(self, path: Path) -> None:
        tmp = path.with_suffix(".tmp")
        tmp.write_text(
            json.dumps(
                {
                    "comment": "smos_spark store state (overview.yml analog)",
                    "last_day": self.last_day,
                    "last_batch_id": self.last_batch_id,
                    "parameters": self.parameters,
                    "extra": self.extra or {},
                }
            )
        )
        os.replace(tmp, path)  # atomic commit


class TranscriptStore:
    def __init__(
        self,
        root: str | Path,
        n_buckets: int | None = None,
        bloom_ndv: int | None = DEFAULT_BLOOM_NDV,
    ):
        """n_buckets=None reopens an existing store with the bucket
        count recorded in its overview sidecar (the layout is physical
        — reading with a different count silently misses buckets);
        for a new store it falls back to DEFAULT_N_BUCKETS.

        bloom_ndv sizes the per-file parquet BLOOM FILTER on conv_id
        written by every tier/block writer (None disables). Bucket
        pruning narrows a point read to one directory; within the
        bucket, files are conv-sorted so column min/max prunes
        row-groups of OTHER convs — the bloom filter closes the
        remaining gap (absent keys, and keys inside a row-group's
        [min,max] span that the group doesn't actually contain):
        equality predicates on conv_id skip whole row-groups without
        decoding them (asserted via scan metrics in
        test_point_read_bloom_prunes_row_groups). Write-time-only
        property; readers need no configuration."""
        self.root = Path(root)
        recorded = (Overview.load(self.root / "overview.json").extra or {}).get(
            "n_buckets"
        )
        if n_buckets is None:
            n_buckets = recorded if recorded is not None else DEFAULT_N_BUCKETS
        elif recorded is not None and n_buckets != recorded:
            raise ValueError(
                f"store at {self.root} is physically bucketed with "
                f"n_buckets={recorded}; reopening with {n_buckets} would "
                "mis-bucket reads and writes (omit n_buckets to reopen)"
            )
        self.n_buckets = n_buckets
        self.bloom_ndv = bloom_ndv
        self.root.mkdir(parents=True, exist_ok=True)

    def _with_point_read_options(self, writer):
        """Attach the conv_id bloom-filter options to a DataFrameWriter
        (all tier/block writers route through here so point-read
        pruning is uniform across layouts)."""
        if not self.bloom_ndv:
            return writer
        return writer.option(
            "parquet.bloom.filter.enabled#conv_id", "true"
        ).option("parquet.bloom.filter.expected.ndv#conv_id", str(self.bloom_ndv))

    # --- paths ---
    @property
    def transcripts_path(self) -> str:
        return str(self.root / "transcripts")

    def tier_path(self, tier: str) -> str:
        assert tier in TIERS
        return str(self.root / "tiers" / tier)

    @property
    def checkpoint_path(self) -> str:
        return str(self.root / "_checkpoint")

    @property
    def overview_path(self) -> Path:
        return self.root / "overview.json"

    # --- raw table ---
    def append_transcripts(self, df: DataFrame) -> None:
        (
            df.withColumn("ts_date", F.to_date("ts"))
            .repartition("ts_date")  # one writer wave per day partition
            .write.partitionBy("ts_date")
            .mode("append")
            .parquet(self.transcripts_path)
        )

    def read_transcripts(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.transcripts_path).drop("ts_date")

    # --- tier tables ---
    # Layout: bucket_date=YYYY-MM-DD/bucket_id=K/part-*.parquet
    # time-major first so incremental merges rewrite only the dates a
    # batch touches; key-bucketed second for point-read locality.
    def _with_partition_cols(self, tier_df: DataFrame) -> DataFrame:
        return tier_df.withColumn("bucket_date", F.to_date("bucket_start")).withColumn(
            "bucket_id", bucket_expr("conv_id", self.n_buckets)
        )

    def write_tier(self, tier_df: DataFrame, tier: str, mode: str = "overwrite") -> None:
        # Hash-repartition on the partition columns (one shuffle, no
        # sampling pass — repartitionByRange would re-execute the whole
        # upstream aggregate to sample range boundaries). The sort
        # leads with the partition columns so the dynamic-partition
        # writer's required ordering is already satisfied: no hidden
        # second sort, one open file at a time, conv-clustered rows.
        self._with_point_read_options(
            self._with_partition_cols(tier_df)
            .repartition("bucket_date", "bucket_id")
            .sortWithinPartitions("bucket_date", "bucket_id", "conv_id", "bucket_start")
            .write.partitionBy("bucket_date", "bucket_id")
            .mode(mode)
        ).parquet(self.tier_path(tier))
        self._ensure_overview()

    def overwrite_tier_partitions(self, tier_df: DataFrame, tier: str) -> None:
        """Dynamic partition overwrite — rewrites only the
        (bucket_date, bucket_id) partitions present in tier_df
        (the Iceberg-MERGE substitute)."""
        spark = tier_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            self._with_point_read_options(
                self._with_partition_cols(tier_df)
                .repartition("bucket_date", "bucket_id")
                .sortWithinPartitions("bucket_date", "bucket_id", "conv_id", "bucket_start")
                .write.partitionBy("bucket_date", "bucket_id")
                .mode("overwrite")
            ).parquet(self.tier_path(tier))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def read_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        return spark.read.parquet(self.tier_path(tier)).drop("bucket_id", "bucket_date")

    def read_tier_since(self, spark: SparkSession, tier: str, day_lo) -> DataFrame:
        """Tier rows with bucket_date >= day_lo — the filter hits the
        bucket_date PARTITION column, so older directories are pruned
        from the scan entirely."""
        df = spark.read.parquet(self.tier_path(tier))
        return df.where(F.col("bucket_date") >= F.to_date(F.lit(str(day_lo)))).drop(
            "bucket_id", "bucket_date"
        )

    def _bucket_literal(self, spark: SparkSession, conv_id: str) -> int:
        """Resolve a key's bucket to a LITERAL so partition filters
        actually prune directories (a column-vs-column predicate would
        scan every bucket). THE one definition of the key→bucket map
        shared by tier and block point reads — hash/cast changes here
        stay consistent across both layouts."""
        return (
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(self.n_buckets))
                .cast("int")
                .alias("b")
            )
            .collect()[0]
            .b
        )

    def read_tier_for_conv(self, spark: SparkSession, tier: str, conv_id: str) -> DataFrame:
        """Point read with bucket pruning: the partition filter on
        bucket_id restricts the scan to one directory — the read-one-
        cell-file locality of the reference (J2)."""
        b = self._bucket_literal(spark, conv_id)
        df = spark.read.parquet(self.tier_path(tier))
        return df.where(
            (F.col("bucket_id") == F.lit(b)) & (F.col("conv_id") == conv_id)
        ).drop("bucket_id")

    def blocks_path(self, tier: str) -> str:
        return str(self.root / f"blocks_{tier}")

    def write_blocks(
        self,
        blocks: DataFrame,
        tier: str = "1h",
        mode: str = "overwrite",
        codec: str = "gorilla",
    ) -> None:
        """Persist compressed per-conv block rows under
        blocks_<tier>/block_date=…/bucket_id=… — the K3 cell layout
        applied to the codec family. Expects the output of
        `compress_series(..., stats=True, slice_col=F.to_date(ts))`
        (day-sliced blocks with per-block min/max stats): the slice
        becomes the date partition, so time-range reads prune whole
        day directories, bucket_id prunes point reads, and the stored
        stats let `blocks_range_minmax` answer covered blocks without
        decoding. Same writer-sort discipline as write_tier (partition
        columns lead the sort — no hidden re-sort, one open file)."""
        if "slice" not in blocks.columns:
            raise ValueError(
                "write_blocks expects day-sliced blocks: run "
                "compress_series(..., slice_col=F.to_date(ts_col))"
            )
        # enforce DAY grain: blocks_range_minmax's day-partition
        # pruning assumes every block's span lies inside its slice day;
        # a coarser slice (week) would make the pruning DROP in-range
        # data silently. One limit(1) probe at write time.
        bad = blocks.where(
            (F.to_date("first_ts") != F.col("slice"))
            | (F.to_date("last_ts") != F.col("slice"))
        ).limit(1)
        if bad.count() > 0:
            raise ValueError(
                "write_blocks: block spans cross their slice value — "
                "slices must be DAY-grained (slice_col=F.to_date(ts_col))"
            )
        out = (
            blocks.withColumn("block_date", F.col("slice"))
            .withColumn("bucket_id", bucket_expr("conv_id", self.n_buckets))
            .drop("slice")
        )
        self._with_point_read_options(
            out.repartition("block_date", "bucket_id")
            .sortWithinPartitions("block_date", "bucket_id", "conv_id")
            .write.partitionBy("block_date", "bucket_id")
            .mode(mode)
        ).parquet(self.blocks_path(tier))
        # record layout + codec so a reopen can never mis-bucket point
        # reads (same guard as write_tier) or decode with the wrong
        # codec (gorilla/chimp blobs share a header and misparse
        # silently)
        self._ensure_overview()
        ov = self.load_overview()
        codecs = dict((ov.extra or {}).get("block_codecs") or {})
        codecs[tier] = codec
        ov.extra = {**(ov.extra or {}), "block_codecs": codecs}
        self.save_overview(ov)

    def read_blocks(
        self, spark: SparkSession, tier: str, day_lo=None, day_hi=None
    ) -> DataFrame:
        """Block rows, optionally pruned to block_date ∈ [day_lo,
        day_hi] — the filter hits the PARTITION column, so out-of-range
        day directories never enter the scan."""
        df = spark.read.parquet(self.blocks_path(tier))
        if day_lo is not None:
            df = df.where(F.col("block_date") >= F.to_date(F.lit(str(day_lo))))
        if day_hi is not None:
            df = df.where(F.col("block_date") <= F.to_date(F.lit(str(day_hi))))
        return df.drop("bucket_id")

    def read_blocks_for_conv(
        self, spark: SparkSession, tier: str, conv_id: str
    ) -> DataFrame:
        """Point read with bucket pruning (same literal-bucket
        resolution as read_tier_for_conv — J2 locality for blocks)."""
        b = self._bucket_literal(spark, conv_id)
        df = spark.read.parquet(self.blocks_path(tier))
        return df.where(
            (F.col("bucket_id") == F.lit(b)) & (F.col("conv_id") == conv_id)
        ).drop("bucket_id")

    def blocks_range_minmax(
        self,
        spark: SparkSession,
        tier: str,
        value_col: str,
        ts_from: str,
        ts_to: str,
        codec: str | None = None,
    ) -> DataFrame:
        """Per-conv (min, max, count) over [ts_from, ts_to] straight
        from the block store: day-partition pruning cuts the scan to
        the range's days, block stats answer fully-covered blocks
        without decode, and only the ≤2 boundary-day blocks per conv
        decompress (compress.range_minmax). ts_from/ts_to:
        'YYYY-MM-DD HH:MM:SS' strings or datetimes. `codec` defaults
        to the one recorded at write_blocks time — gorilla and chimp
        blobs share a header and misparse each other SILENTLY, so a
        mismatching explicit codec raises."""
        from datetime import datetime

        from smos_spark.operators.compress import range_minmax

        recorded = ((self.load_overview().extra or {}).get("block_codecs") or {}).get(
            tier
        )
        if codec is None:
            codec = recorded or "gorilla"
        elif recorded is not None and codec != recorded:
            raise ValueError(
                f"blocks_{tier} was written with codec {recorded!r}; "
                f"decoding with {codec!r} would corrupt values silently"
            )

        def _d(x):
            return (
                datetime.fromisoformat(x) if isinstance(x, str) else x
            ).date()

        blocks = self.read_blocks(
            spark, tier, day_lo=_d(ts_from), day_hi=_d(ts_to)
        )
        # stats columns are required for the covered-block fast path
        if f"{value_col}_min" not in blocks.columns:
            raise ValueError(
                f"blocks_{tier} lacks {value_col}_min/_max stats — write "
                "them with compress_series(..., stats=True)"
            )
        return range_minmax(blocks, value_col, ts_from, ts_to, codec=codec)

    def tier_bucket_count(self, tier: str) -> int:
        """Number of distinct key buckets on disk (the 2,449-cell-files
        assertion analog, tests/test_ICreshuffle.py:47)."""
        p = Path(self.tier_path(tier))
        buckets = set()
        for date_dir in p.glob("bucket_date=*"):
            for b in date_dir.glob("bucket_id=*"):
                buckets.add(b.name)
        return len(buckets)

    # --- subset re-export (reference K2 round trip) ---
    def export_subset(
        self,
        spark: SparkSession,
        out_root: str | Path,
        tier: str = "1h",
        conv_lo: str | None = None,
        conv_hi: str | None = None,
        ts_lo=None,
        ts_hi=None,
        parameters=None,
        n_buckets: int | None = None,
    ) -> "TranscriptStore":
        """Re-export a key/time subset of a tier as a NEW self-contained
        store with the same time-major day-partitioned layout — the
        reference's subset-and-write round trip
        (/root/reference/src/smos/interface.py:465-500, pinned by
        tests/test_ICimg_subset_and_write.py:38-77): read a subset of
        points, write them as new date-coded files that the SAME reader
        opens. Filters land on the scan (bucket_date partition pruning
        for the ts range; conv_id min/max row-group stats for the key
        range); one write, no driver materialization."""
        df = spark.read.parquet(self.tier_path(tier))
        if ts_lo is not None:
            df = df.where(F.col("bucket_start") >= F.lit(str(ts_lo)).cast("timestamp"))
            df = df.where(F.col("bucket_date") >= F.to_date(F.lit(str(ts_lo)[:10])))
        if ts_hi is not None:
            df = df.where(F.col("bucket_start") <= F.lit(str(ts_hi)).cast("timestamp"))
            df = df.where(F.col("bucket_date") <= F.to_date(F.lit(str(ts_hi)[:10])))
        df = df.drop("bucket_id", "bucket_date")
        if conv_lo is not None:
            df = df.where(F.col("conv_id") >= conv_lo)
        if conv_hi is not None:
            df = df.where(F.col("conv_id") <= conv_hi)
        if parameters:
            df = df.select("conv_id", "bucket_start", *list(parameters))
        out = TranscriptStore(out_root, n_buckets=n_buckets or self.n_buckets)
        out.write_tier(df, tier)
        ov = out.load_overview()
        ov.parameters = {
            "exported_from": str(self.root),
            "tier": tier,
            "conv_range": [conv_lo, conv_hi],
            "ts_range": [str(ts_lo) if ts_lo else None, str(ts_hi) if ts_hi else None],
        }
        out.save_overview(ov)
        return out

    # --- writer exclusion ---
    # The parquet+manifest substitute for Iceberg has no snapshot
    # isolation: two concurrent ingest_batch runs could interleave
    # partition overwrites and overview commits. This advisory lock
    # (O_EXCL lock file carrying pid + timestamp, stale after
    # `stale_sec`) makes the single-writer assumption explicit and
    # enforced rather than silent — the reference has the same
    # weakness via overview.yml and no lock at all.
    @property
    def lock_path(self) -> Path:
        return self.root / "_writer.lock"

    def acquire_writer_lock(self, stale_sec: int = 3600) -> None:
        import time

        payload = json.dumps({"pid": os.getpid(), "ts": time.time()})
        try:
            fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, payload.encode())
            os.close(fd)
            return
        except FileExistsError:
            pass
        try:
            held = json.loads(self.lock_path.read_text())
        except Exception:
            held = {}
        if time.time() - held.get("ts", 0) > stale_sec:
            # stale holder (crashed writer): steal atomically-ish
            tmp = self.lock_path.with_suffix(".steal")
            tmp.write_text(payload)
            os.replace(tmp, self.lock_path)
            return
        raise ConcurrentWriterError(
            f"store {self.root} is locked by writer {held.get('pid')} "
            f"(age {time.time() - held.get('ts', 0):.0f}s); concurrent tier "
            "maintenance would interleave partition overwrites"
        )

    def release_writer_lock(self) -> None:
        """Release only if WE still hold the lock. A writer that ran
        past stale_sec may have had its lock stolen by a newer writer;
        unconditionally unlinking would evict that new holder and let
        a third writer interleave with its in-flight partition
        overwrites."""
        import contextlib

        with contextlib.suppress(FileNotFoundError):
            try:
                held = json.loads(self.lock_path.read_text())
            except Exception:
                held = {}
            if held.get("pid") not in (None, os.getpid()):
                warnings.warn(
                    f"store {self.root}: writer lock now held by pid "
                    f"{held.get('pid')} (ours was stolen as stale) — "
                    "leaving it in place",
                    stacklevel=2,
                )
                return
            os.unlink(self.lock_path)

    # --- state ---
    def load_overview(self) -> Overview:
        return Overview.load(self.overview_path)

    def save_overview(self, ov: Overview) -> None:
        # every overview commit records the physical bucket layout so
        # a reopen (n_buckets=None) can never mis-bucket point reads
        ov.extra = {**(ov.extra or {}), "n_buckets": self.n_buckets}
        ov.save(self.overview_path)

    def _ensure_overview(self) -> None:
        if not self.overview_path.exists():
            self.save_overview(Overview(extra={}))

    # --- checkpoint lineage ---
    def _recover_checkpoint_swap(self) -> None:
        """Self-heal a compaction interrupted between its two directory
        renames: if `_checkpoint` is missing but `_checkpoint_old`
        survives, the old directory is the ONLY copy of the lineage —
        restore it. Called by every checkpoint entry point so a crashed
        compaction can never strand (or let a later run delete) the
        sole surviving history."""
        import shutil

        p = Path(self.checkpoint_path)
        old = Path(str(p) + "_old")
        tmp = Path(str(p) + "_compacting")
        if not p.exists() and old.exists():
            os.replace(old, p)
        # leftover tmp from an incomplete rewrite is garbage either way
        shutil.rmtree(tmp, ignore_errors=True)

    def append_checkpoint(self, spark: SparkSession, rows: list[dict]) -> None:
        if not rows:
            return
        self._recover_checkpoint_swap()
        spark.createDataFrame(
            [
                (
                    r["run_id"],
                    r["batch_id"],
                    r["tier"],
                    r["partition_key"],
                    r["rows_in"],
                    r["rows_out"],
                    r["min_ts"],
                    r["max_ts"],
                    r["committed_seq"],
                )
                for r in rows
            ],
            CHECKPOINT_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(self.checkpoint_path)

    def read_checkpoint(self, spark: SparkSession) -> DataFrame | None:
        self._recover_checkpoint_swap()
        if not Path(self.checkpoint_path).exists():
            return None
        return spark.read.parquet(self.checkpoint_path)

    def compact_checkpoint(self, spark: SparkSession, max_files: int = 16) -> int:
        """Compact the lineage table's per-batch coalesce(1) appends.
        At minutes-cadence streaming the one-tiny-file-per-batch
        appends pile up; once the directory exceeds `max_files`
        parquet files, rewrite it as one file via an atomic directory
        swap (readers either see the old layout or the new — never a
        half-compacted one, and every entry point first restores a
        compaction that crashed between its two renames). Callers must
        hold the advisory writer lock — compaction moves files a
        concurrent append may be writing into. Returns the resulting
        file count."""
        import shutil

        self._recover_checkpoint_swap()
        p = Path(self.checkpoint_path)
        if not p.exists():
            return 0
        files = [f for f in p.glob("*.parquet") if f.is_file()]
        if len(files) <= max_files:
            return len(files)
        tmp = Path(str(p) + "_compacting")
        old = Path(str(p) + "_old")
        shutil.rmtree(old, ignore_errors=True)
        spark.read.parquet(str(p)).coalesce(1).write.mode("overwrite").parquet(str(tmp))
        os.replace(p, old)
        os.replace(tmp, p)
        shutil.rmtree(old)
        return 1

    def compact_transcripts(
        self,
        spark: SparkSession,
        target_file_mb: int = 128,
        min_files: int = 8,
    ) -> dict:
        """Small-file compaction for the append-only raw table — the
        Iceberg ``rewrite_data_files`` maintenance analog. Each
        ``append_transcripts`` batch adds a file wave per touched day
        partition; at minutes-cadence ingest a day collects hundreds of
        tiny files, and at corpus scale every downstream scan pays that
        in task-scheduling and footer-read overhead.

        Strategy (one Spark job, not one per partition): list day
        directories DRIVER-side (cheap: O(days) + O(files) stat calls,
        no Spark jobs), pick dates whose file count exceeds both
        `min_files` and their byte-proportional target
        ``ceil(bytes / target_file_mb)``, then rewrite ONLY those
        dates with a single dynamic-partition-overwrite write. Rows are
        spread over each date's target file count via a salt column
        derived from a broadcast date→n_files map, so big days still
        get multiple parallel writers/files. Untouched dates keep
        their files byte-identical; readers see old-or-new per
        partition (same contract as overwrite_tier_partitions).
        Callers doing concurrent maintenance hold the advisory writer
        lock, like tier merges. Returns
        ``{"dates": k, "files_before": a, "files_after": b}``."""
        root = Path(self.transcripts_path)
        if not root.exists():
            return {"dates": 0, "files_before": 0, "files_after": 0}
        plan: dict[str, int] = {}
        before = 0
        for d in sorted(root.glob("ts_date=*")):
            if not d.is_dir():
                continue
            files = [f for f in d.glob("*.parquet") if f.is_file()]
            before += len(files)
            nbytes = sum(f.stat().st_size for f in files)
            target = max(1, -(-nbytes // (target_file_mb << 20)))
            if len(files) > max(min_files, target):
                plan[d.name.split("=", 1)[1]] = int(target)
        if not plan:
            return {"dates": 0, "files_before": before, "files_after": before}

        nmap = spark.createDataFrame(
            [(k, v) for k, v in plan.items()], "ts_date_str string, _nf int"
        )
        import datetime as _dt

        dates = [_dt.date.fromisoformat(k) for k in plan]
        df = (
            spark.read.parquet(str(root))
            .where(F.col("ts_date").isin(dates))  # partition pruning
            .withColumn("ts_date_str", F.col("ts_date").cast("string"))
            .join(F.broadcast(nmap), "ts_date_str")
            .withColumn("_fno", F.pmod(F.xxhash64("conv_id"), F.col("_nf")))
            .repartition("ts_date", "_fno")
            .sortWithinPartitions("ts_date", "conv_id", "turn_idx")
            .drop("ts_date_str", "_nf", "_fno")
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.partitionBy("ts_date").mode("overwrite").parquet(str(root))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        after = sum(
            1
            for d in root.glob("ts_date=*")
            if d.is_dir()
            for f in d.glob("*.parquet")
            if f.is_file()
        )
        return {"dates": len(plan), "files_before": before, "files_after": after}
