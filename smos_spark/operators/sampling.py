"""Deterministic corpus splitting + stratified sampling.

A training-data pipeline needs reproducible train/val/test assignment
and per-stratum quota sampling that (a) never depends on partitioning,
task order, or cluster size, and (b) is cheap at corpus scale.
Both operators here are driven by the portable md5 hash64
(`functions/texthash.py` — bit-identical in Spark and DuckDB), so each
ships an EXACT SQL oracle; `portable=False` swaps in JVM xxhash64 for
the 100 TB hot path (~10× cheaper, same distribution properties).

Scale shape:
* `hash_split` is a pure codegen expression over the key column —
  no shuffle, no state, no sampling pass; it composes with any scan
  and survives repartitioning/resume unchanged (same row → same
  split, always). This mirrors how the reference derives grid cell
  membership purely from the key, never from arrival order
  (/root/reference/src/smos/smos_ic/reshuffle.py:61-76).
* `stratified_sample` is one window shuffle on the stratum column,
  ranking rows by (hash, key); `row_number() <= n` keeps exactly n
  deterministic rows per stratum. For pathologically hot strata the
  full sort of that stratum dominates — at that scale pre-filter with
  a hash threshold (`pmod(hash, K) < ~n*K/stratum_count`) to shrink
  the window input first; the quota semantics are unchanged because
  the final rank still decides.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from smos_spark.functions.texthash import fast_hash64, md5_hash64

__all__ = ["hash_split", "split_bucket", "stratified_sample"]

#: split buckets resolve in millionths — fractions finer than 1e-6
#: (meaningless for corpus splits) would silently floor to 0.
MICRO = 1_000_000


def split_bucket(key_col: Column, seed: int = 42, portable: bool = True) -> Column:
    """Deterministic bucket in [0, MICRO) from the row KEY (not the
    row content): `pmod(hash64(key || ':' || seed), 1e6)`."""
    tagged = F.concat(key_col.cast("string"), F.lit(f":{seed}"))
    h = md5_hash64(tagged) if portable else fast_hash64(tagged)
    return F.pmod(h, F.lit(MICRO))


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    fractions: Mapping[str, float] | None = None,
    seed: int = 42,
    out_col: str = "split",
    portable: bool = True,
) -> DataFrame:
    """Assign every row a reproducible split label by hashing its key.

    `fractions` maps label → fraction (must sum to 1.0 within 1e-9);
    thresholds are exact micro-unit floors, so the assignment is a
    pure integer comparison — identical on every run, cluster size,
    and engine. Rows with the same key always land in the same split
    (the property that prevents train/test leakage across duplicate
    or re-ingested keys). Rows with a NULL key get a NULL split —
    they have no identity to hash, and silently defaulting them into
    one label would skew that split; the caller decides their fate."""
    fractions = dict(fractions or {"train": 0.98, "val": 0.01, "test": 0.01})
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = split_bucket(F.col(key), seed=seed, portable=portable)
    labels = list(fractions)
    cum = 0.0
    expr: Column | None = None
    for name in labels[:-1]:
        cum += fractions[name]
        thresh = int(cum * MICRO)
        expr = (
            F.when(bucket < thresh, F.lit(name))
            if expr is None
            else expr.when(bucket < thresh, F.lit(name))
        )
    last = F.lit(labels[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, F.when(F.col(key).isNotNull(), out))


def stratified_sample(
    df: DataFrame,
    stratum: str,
    n_per_stratum: int,
    key: str = "doc_id",
    seed: int = 42,
    portable: bool = True,
) -> DataFrame:
    """Exactly `n_per_stratum` deterministic rows per stratum (fewer
    only when the stratum is smaller): rank rows inside each stratum
    by (hash64(key||seed), key) — a reproducible shuffle order — and
    keep the first n. One window shuffle on the stratum column.

    Rows with a NULL key are EXCLUDED: without an identity there is
    no deterministic rank for them (two NULL-key rows are mutually
    unordered in every engine, and Spark and SQL engines disagree on
    where NULLs sort), which would silently break reproducibility."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    tagged = F.concat(F.col(key).cast("string"), F.lit(f":{seed}"))
    h = md5_hash64(tagged) if portable else fast_hash64(tagged)
    w = Window.partitionBy(stratum).orderBy(h.asc(), F.col(key).asc())
    return (
        df.where(F.col(key).isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )
