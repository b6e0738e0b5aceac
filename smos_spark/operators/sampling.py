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

__all__ = [
    "hash_split",
    "split_bucket",
    "split_thresholds",
    "stratified_sample",
    "topk_per_group",
    "pack_documents",
    "sample_to_token_budget",
]

#: split buckets resolve in millionths — fractions finer than 1e-6
#: (meaningless for corpus splits) would silently floor to 0.
MICRO = 1_000_000


def _tagged_hash(key_col: Column, seed: int, portable: bool) -> Column:
    """hash64(key || ':' || seed) — THE ordering/bucketing hash every
    operator in this module derives from. One definition: every DuckDB
    oracle depends on the exact ':{seed}' tag format, so a drift in one
    inlined copy would silently break that operator's cross-engine
    exactness while the others keep passing."""
    tagged = F.concat(key_col.cast("string"), F.lit(f":{seed}"))
    return md5_hash64(tagged) if portable else fast_hash64(tagged)


def split_bucket(key_col: Column, seed: int = 42, portable: bool = True) -> Column:
    """Deterministic bucket in [0, MICRO) from the row KEY (not the
    row content): `pmod(hash64(key || ':' || seed), 1e6)`."""
    return F.pmod(_tagged_hash(key_col, seed, portable), F.lit(MICRO))


def split_thresholds(fractions: Mapping[str, float]) -> list[int]:
    """Cumulative micro-unit upper bounds for each label but the last.
    Rounded, not truncated: float accumulation error in the cumulative
    sum is ±ulps around the exact boundary, and int() would pull e.g.
    0.29+0.58 → 869999.999… down to 869999, silently shifting one
    bucket-in-a-million across splits vs the requested fractions."""
    out, cum = [], 0.0
    for name in list(fractions)[:-1]:
        cum += fractions[name]
        out.append(round(cum * MICRO))
    return out


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
    thresholds are rounded micro-unit boundaries, so the assignment is a
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
    expr: Column | None = None
    for name, thresh in zip(labels[:-1], split_thresholds(fractions)):
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
    h = _tagged_hash(F.col(key), seed, portable)
    w = Window.partitionBy(stratum).orderBy(h.asc(), F.col(key).asc())
    return (
        df.where(F.col(key).isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def topk_per_group(
    df: DataFrame,
    group: str,
    order_by: list[Column],
    k: int,
    key: str = "doc_id",
) -> DataFrame:
    """Mixture curation: keep the top-k rows per group under an
    explicit score order (e.g. the k highest-quality docs per
    language). `order_by` MUST reach a total order — the key column is
    appended as the final tiebreak so ties never make the selection
    partition-dependent.

    One window shuffle on the group column; `row_number() <= k` is a
    rank limit Catalyst rewrites to WindowGroupLimit with a map-side
    partial top-k, so each input task forwards at most k rows per
    group before the exchange — the same shuffle bound as
    stratified_sample, with a score order instead of a hash order."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(group).orderBy(*order_by, F.col(key).asc())
    return (
        df.where(F.col(key).isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def sample_to_token_budget(
    df: DataFrame,
    budgets: Mapping[object, int] | int,
    group: str = "source",
    tokens_col: str = "n_tokens",
    key: str = "doc_id",
    seed: int = 42,
    portable: bool = True,
    default_budget: int | None = None,
) -> DataFrame:
    """Mixture sampling to a TOKEN budget: per group (domain, language,
    source), keep documents in deterministic hash order until the
    group's token budget is met — how a pretraining data mixture is
    assembled ("100 B tokens of web, 20 B of code, 5 B of papers").

    `budgets` maps group value → token budget (or a single int for
    every group); groups absent from the map fall back to
    `default_budget`, and with no default their rows are dropped (an
    unlisted domain contributes nothing — the explicit-mixture
    contract). A document is kept iff its EXCLUSIVE prefix sum of
    tokens (`tok_start`, also emitted) is < the budget, so the one
    straddling document is included and every group with enough tokens
    reaches its budget exactly once. Rows with NULL key or NULL token
    count are excluded (no identity / no weight).

    Determinism: order is (hash64(key||seed), key) — a pure function
    of the row key, so the same corpus yields the same sample on any
    partitioning, cluster size, or engine (exact SQL oracle with
    portable=True; portable=False swaps in JVM xxhash64 for the hot
    path).

    Scale shape: one window shuffle on the group column. The prefix
    sum cannot be cut map-side the way a rank limit can (every row's
    offset depends on all hash-smaller rows), so for a group whose
    corpus vastly exceeds its budget, pre-filter with a hash threshold
    (`split_bucket(key) < ~MICRO * budget*margin / group_tokens`)
    to shrink the window input — the final prefix-sum cut still
    decides, so the kept set is unchanged as long as the prefilter
    retains at least the budget's worth of tokens."""
    prefilter = None
    if isinstance(budgets, bool):
        raise ValueError("budgets must be an int or a mapping, not a bool")
    if isinstance(budgets, int):
        if budgets < 0:
            raise ValueError(f"budget must be >= 0, got {budgets}")
        budget_expr = F.lit(int(budgets)).cast("long")
    else:
        if not budgets:
            raise ValueError("budgets must be non-empty")
        pairs: list[Column] = []
        for g, b in budgets.items():
            if b < 0:
                raise ValueError(f"budget for {g!r} must be >= 0")
            pairs += [F.lit(g), F.lit(int(b)).cast("long")]
        mapped = F.element_at(F.create_map(*pairs), F.col(group))
        if default_budget is None:
            budget_expr = mapped
            # unlisted groups can never pass tok_start < NULL — filter
            # them BEFORE the window (scan-pushable) so whole unlisted
            # domains of the corpus never ship through the shuffle
            prefilter = mapped.isNotNull()
        else:
            budget_expr = F.coalesce(
                mapped, F.lit(int(default_budget)).cast("long")
            )
    h = _tagged_hash(F.col(key), seed, portable)
    w = (
        Window.partitionBy(group)
        .orderBy(h.asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    base = df.where(F.col(key).isNotNull() & F.col(tokens_col).isNotNull())
    if prefilter is not None:
        base = base.where(prefilter)
    return (
        base.withColumn("tok_start", cum - F.col(tokens_col).cast("long"))
        .where(F.col("tok_start") < budget_expr)
    )


def pack_documents(
    df: DataFrame,
    capacity: int,
    tokens_col: str = "n_tokens",
    key: str = "doc_id",
    n_buckets: int = 64,
    seed: int = 42,
    portable: bool = True,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a
    training shard under the standard LLM-pretraining layout — shuffle
    the corpus into a deterministic order, concatenate token streams,
    cut the stream every `capacity` tokens. A document's shard is the
    chunk where its first token lands (so a shard overflows by at most
    one document's tail — the piece the trainer truncates or wraps).

    Adds `shard_id` and `start_off` (the doc's global token offset).
    The order is (bucket, hash, key) with bucket = hash % n_buckets —
    a pure function of the key, so the packing is reproducible across
    runs, partitionings, and engines (exact SQL oracle), and
    re-ingesting the same corpus repacks identically.

    Scale shape — the distributed prefix sum: a naive global
    `sum() OVER (ORDER BY ...)` window is ONE task holding the whole
    corpus. Instead the cumulative sum runs per bucket (window
    partitioned by bucket: n_buckets parallel tasks), and each bucket's
    exclusive prefix offset — one n_buckets-row aggregate, collected
    and folded back as a literal map — shifts the local sums onto the
    global token axis. Identical integers to the global window (the
    oracle computes that global window directly); two scans + one
    window shuffle, no single-task stage. This is the same
    layout-over-driver-memory lesson as the reference's cell reshuffle
    (/root/reference/docs/img2ts.rst:8-16)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    h = _tagged_hash(F.col(key), seed, portable)
    base = (
        df.where(F.col(key).isNotNull() & F.col(tokens_col).isNotNull())
        .withColumn("_h", h)
        .withColumn("_bucket", F.pmod(F.col("_h"), F.lit(n_buckets)))
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col("_h").asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_cum", F.sum(F.col(tokens_col).cast("long")).over(w))
    totals = {
        r["_bucket"]: r["_t"]
        for r in base.groupBy("_bucket")
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("_t"))
        .collect()
    }
    off, offsets = 0, {}
    for b in range(n_buckets):
        offsets[b] = off
        off += totals.get(b, 0)
    offset_expr = F.element_at(
        F.array(*[F.lit(int(offsets[b])) for b in range(n_buckets)]),
        (F.col("_bucket") + 1).cast("int"),
    )
    start = (F.col("_cum") - F.col(tokens_col).cast("long")) + offset_expr
    return (
        local.withColumn("start_off", start)
        .withColumn("shard_id", F.floor(F.col("start_off") / capacity).cast("long"))
        .drop("_h", "_bucket", "_cum")
    )
