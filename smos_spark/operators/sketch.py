"""Mergeable sketches: KMV distinct-count + Bloom-filter membership.

At corpus scale, two aggregations dominate pipeline-health dashboards:
"how many distinct keys" (users, conversations, documents) and "is this
item in a known set" (benchmark n-grams, blocklisted fingerprints).
Exact answers need a full shuffle of every key; these two operators
answer them with FIXED-SIZE state that merges associatively, so the
heavy side never shuffles more than a few KB per group / zero rows at
all:

* `kmv_distinct` — K-Minimum-Values cardinality sketch: keep the k
  smallest DISTINCT hash values per group; estimate = (k-1)·SPACE/kth.
  The k-limit is enforced by `dense_rank() <= k`, which Spark's
  WindowGroupLimit rewrite pushes to the map side — each task forwards
  at most k distinct hashes per group, so the shuffle is O(groups·k)
  regardless of input size. Sketches MERGE exactly: the union of two
  groups' k-min sets contains the union's k-min set (`kmv_merge`), so
  coarser rollups (day→week) reuse finer sketches without rescanning —
  the same partial-reaggregation contract as the rollup tier cascade
  (operators/rollup.py), applied to cardinality.
* `bloom_decontaminate` — build a fixed-size Bloom bitmap from the
  reference set's n-gram hashes (one small aggregation), then test the
  corpus SCAN-SIDE against the bitmap as a literal array: no join, no
  shuffle, no state on the 100 TB side. This is the streaming-friendly
  complement to the exact `text.ngram_decontaminate` semi-join: false
  positives at a chosen rate, zero false negatives — screen with the
  bloom, confirm the tiny flagged subset with the exact join.

Determinism contract (what gives both operators EXACT DuckDB oracles):
all hashing is the portable md5 hash64 (functions/texthash.py,
bit-identical across engines); the KMV estimator divides two exactly
representable quantities once; the Bloom probes are Mersenne universal
hashes with 32-bit bitmap words so no shift ever touches the int64
sign bit (DuckDB raises on `1 << 63`; 32-bit words keep every mask
positive in both engines).

Reference analog: the reference's `overview.yml` sidecar keeps tiny
mergeable state (last_day) instead of rescanning the store
(/root/reference/src/smos/smos_l2/reshuffle.py:71-94); these sketches
are the same idea for cardinality/membership at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from smos_spark.functions.texthash import (
    MERSENNE_P,
    fast_hash64,
    hash_params,
    md5_hash64,
)
from smos_spark.operators.text import token_ngram_hashes

__all__ = [
    "kmv_distinct",
    "kmv_merge",
    "bloom_build",
    "bloom_decontaminate",
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "bottomk_sample",
    "bottomk_merge",
    "bottomk_quantiles",
    "hist_build",
    "hist_merge",
    "hist_rebin",
    "hist_quantiles",
]

#: md5_hash64 is 15 hex chars -> uniform on [0, 2^60)
_MD5_SPACE = float(1 << 60)
#: xxhash64 spans the full signed range; sign-bit flip makes it
#: order-preserving unsigned, SPACE = 2^64 offset by 2^63
_XX_SPACE = float(1 << 64)
_I64_MIN = -(1 << 63)


def _kmv_hash(key_col: Column, seed: int, portable: bool) -> Column:
    tagged = F.concat(key_col.cast("string"), F.lit(f":{seed}"))
    if portable:
        return md5_hash64(tagged)
    # map signed xxhash64 to unsigned ORDER (same int64 storage):
    # flipping the sign bit makes the ascending signed order equal the
    # unsigned order of the raw hash, keeping the estimator uniform.
    return fast_hash64(tagged).bitwiseXOR(F.lit(_I64_MIN))


def _kmv_estimate(n_kept: Column, kth: Column, k: int, portable: bool) -> Column:
    """(k-1)·SPACE / kth-min, or the exact count when the group holds
    fewer than k distinct hashes. Emitted as floor(est·1000) int64
    ("milli" fixed point): one double division of exactly-representable
    operands, then floor — bit-identical across engines, no float-hash
    ambiguity in the driver compare."""
    if portable:
        est = F.lit(float(k - 1) * _MD5_SPACE) / kth.cast("double")
    else:
        est = F.lit(float(k - 1) * _XX_SPACE) / (
            kth.cast("double") - F.lit(float(_I64_MIN))
        )
    exact = n_kept.cast("double")
    return F.floor(F.when(n_kept < k, exact).otherwise(est) * 1000).cast("long")


def kmv_distinct(
    df: DataFrame,
    key: str,
    group_cols: list[str | Column] | None = None,
    k: int = 64,
    seed: int = 42,
    portable: bool = True,
    keep_hashes: bool = False,
) -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group via a KMV sketch.

    Returns one row per group: `n_kept` (distinct hashes retained,
    <= k), `est_milli` (floor(estimate*1000)), and with
    `keep_hashes=True` the sorted retained hash array `kmv_hashes`
    for later merging (`kmv_merge`).

    Plan shape: one window shuffle partitioned by the group columns.
    `dense_rank() <= k` is a rank-limit Catalyst rewrites into
    WindowGroupLimit with a MAP-SIDE partial limit, so each input task
    emits at most k distinct hash values per group before the
    exchange — the shuffle is O(groups*k) however large the input.
    NULL keys are excluded (no identity to hash; mirrors
    sampling.stratified_sample)."""
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator divides by the k-th min)")
    group_cols = list(group_cols or [])
    h = _kmv_hash(F.col(key), seed, portable)
    base = df.where(F.col(key).isNotNull()).select(*group_cols, h.alias("_h"))
    gnames = base.columns[:-1]
    w = Window.partitionBy(*gnames).orderBy(F.col("_h").asc())
    kept = base.withColumn("_dr", F.dense_rank().over(w)).where(F.col("_dr") <= k)
    aggs = [
        F.count_distinct(F.col("_h")).alias("n_kept"),
        F.max("_h").alias("_kth"),
    ]
    if keep_hashes:
        aggs.append(F.sort_array(F.collect_set("_h")).alias("kmv_hashes"))
    out = kept.groupBy(*gnames).agg(*aggs)
    out = out.withColumn(
        "est_milli", _kmv_estimate(F.col("n_kept"), F.col("_kth"), k, portable)
    ).drop("_kth")
    return out


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int,
    portable: bool = True,
    hashes_col: str = "kmv_hashes",
    keep_hashes: bool = False,
) -> DataFrame:
    """Re-aggregate finer sketches (from `kmv_distinct(keep_hashes=True)`)
    to coarser groups WITHOUT rescanning the raw data.

    Exact-merge property: every one of the k smallest distinct hashes
    of a union is among the k smallest of the sub-group it came from,
    so exploding the retained arrays and re-ranking reproduces the
    sketch that a direct pass over the raw rows would build — the
    merged estimate is IDENTICAL, not merely similar (asserted in
    tests and by the events_kmv_weekly oracle, which computes the
    direct sketch). Input here is already O(groups*k) rows."""
    # duplicate hashes across sub-sketches (same key in several fine
    # groups) need no pre-distinct: dense_rank and count_distinct both
    # collapse them, saving a shuffle.
    exploded = sketches.select(*group_cols, F.explode(hashes_col).alias("_h"))
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    kept = exploded.withColumn("_dr", F.dense_rank().over(w)).where(F.col("_dr") <= k)
    aggs = [
        F.count_distinct(F.col("_h")).alias("n_kept"),
        F.max("_h").alias("_kth"),
    ]
    if keep_hashes:
        aggs.append(F.sort_array(F.collect_set("_h")).alias(hashes_col))
    out = kept.groupBy(*group_cols).agg(*aggs)
    return out.withColumn(
        "est_milli", _kmv_estimate(F.col("n_kept"), F.col("_kth"), k, portable)
    ).drop("_kth")


# ---------------------------------------------------------------------------
# Bloom filter


#: 32-bit bitmap words: bit index in [0, 31], every mask positive in
#: int64 — DuckDB raises on shifts into the sign bit, Spark silently
#: wraps; both are avoided by construction.
_WORD_BITS = 32
_BITMASKS = [1 << b for b in range(_WORD_BITS)]


def bloom_build(
    keys: DataFrame,
    hash_col: str = "gram",
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 42,
) -> list[int]:
    """Aggregate a Bloom bitmap (list of m_bits/32 int words) from a
    column of int64 hashes. One groupBy(word) bit_or aggregation —
    map-side combined, at most m_bits/32 rows cross the wire — then a
    tiny driver collect (the bitmap IS driver-sized by design: 2^16
    bits = 8 KB). Probes are Mersenne universal hashes of the input
    hash (functions/texthash.py), identical to the check side."""
    if m_bits % _WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {_WORD_BITS}")
    if m_bits > (1 << 26):
        # 2^26 bits = 8 MB literal / broadcast — beyond that the bitmap
        # no longer belongs in an expression; use the exact join.
        raise ValueError("m_bits > 2^26: bitmap too large for a literal; "
                         "use text.ngram_decontaminate (exact join) instead")
    params = hash_params(n_hashes, seed=seed)
    h = F.col(hash_col)
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.lit(a) * F.pmod(h, F.lit(MERSENNE_P)) + F.lit(b),
                        F.lit(MERSENNE_P),
                    )
                    % F.lit(m_bits)
                    for a, b in params
                ]
            )
        ).alias("pos")
    )
    mask_lit = F.array(*[F.lit(m) for m in _BITMASKS])
    words = (
        positions.select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.element_at(mask_lit, (F.col("pos") % _WORD_BITS + 1).cast("int")).alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // _WORD_BITS)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_check(hash_col: Column, bitmap: list[int], m_bits: int,
                n_hashes: int, seed: int = 42) -> Column:
    """Scan-side membership test of one int64 hash against a literal
    bitmap: true iff ALL n_hashes probe bits are set. Pure codegen —
    no join, no shuffle."""
    params = hash_params(n_hashes, seed=seed)
    bitmap_lit = F.array(*[F.lit(int(w)) for w in bitmap])
    mask_lit = F.array(*[F.lit(m) for m in _BITMASKS])
    cond = F.lit(True)
    for a, b in params:
        pos = F.pmod(
            F.lit(a) * F.pmod(hash_col, F.lit(MERSENNE_P)) + F.lit(b),
            F.lit(MERSENNE_P),
        ) % F.lit(m_bits)
        word = F.element_at(bitmap_lit, (F.shiftright(pos, 5) + 1).cast("int"))
        mask = F.element_at(mask_lit, (pos % _WORD_BITS + 1).cast("int"))
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-screened benchmark decontamination: per corpus doc, how
    many of its token n-grams MAY appear in the eval set (zero false
    negatives; false-positive rate set by m_bits/n_hashes).

    Returns (id_col, n_grams, n_hits, flagged). Unlike the exact
    semi-join (`text.ngram_decontaminate` — distinct + shuffle of the
    corpus gram stream), the corpus side here is one SCAN with a
    codegen membership expression over the per-doc gram array: at
    100 TB nothing shuffles; only the eval side (MBs) aggregates into
    the 8 KB bitmap. Screen here, then confirm `flagged` docs (a tiny
    subset) with the exact join."""
    eval_grams = token_ngram_hashes(
        eval_df, n=n, text_col=text_col, id_col=id_col
    ).select(F.explode("grams").alias("gram")).distinct()
    bitmap = bloom_build(
        eval_grams, hash_col="gram", m_bits=m_bits, n_hashes=n_hashes, seed=seed
    )
    doc_grams = token_ngram_hashes(docs, n=n, text_col=text_col, id_col=id_col)
    hits = F.size(
        F.filter(
            F.col("grams"),
            lambda g: bloom_check(g, bitmap, m_bits, n_hashes, seed=seed),
        )
    ).cast("long")
    return doc_grams.select(
        F.col(id_col),
        F.size("grams").cast("long").alias("n_grams"),
        hits.alias("n_hits"),
        (hits > 0).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch


def _cms_positions(
    key_col: Column, width: int, depth: int, seed: int, portable: bool
) -> list[Column]:
    """depth probe positions in [0, width) for one key — Mersenne
    universal hashes of the tagged md5/xxhash (identical probes on the
    build, merge-query, and oracle sides)."""
    from smos_spark.functions.texthash import universal_hash

    h = _kmv_hash(key_col, seed, portable)
    return [
        (universal_hash(h, a, b) % F.lit(width)).cast("long")
        for a, b in hash_params(depth, seed=seed)
    ]


def cms_build(
    df: DataFrame,
    key: str,
    group_cols: list[str | Column] | None = None,
    width: int = 256,
    depth: int = 4,
    seed: int = 42,
    portable: bool = True,
) -> DataFrame:
    """Count-min sketch per group: a depth×width int64 counter matrix
    stored row-major as one flat `cms` array. Point-query estimate =
    min over rows of counter[d, pos_d(key)] ≥ true count (never
    under-counts; over-counts bounded by N/width per row).

    The counters are plain integer SUMS — order-independent — so
    sketches merge EXACTLY (`cms_merge` == the sketch a direct pass
    over the merged rows would build, the same partial-reaggregation
    contract as `kmv_merge` and the rollup tier cascade).

    Plan shape: probe-position explode (depth rows/input row, pure
    codegen) → groupBy(group, pos) count with map-side combine — the
    shuffle carries at most groups·depth·width fixed-size rows however
    large the input — → one densify aggregation of the same size.
    NULL keys are excluded (no identity to hash)."""
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    if depth * width > (1 << 20):
        raise ValueError(
            f"depth*width = {depth * width} counters per group: beyond 2^20 "
            "the sketch no longer fits an array column sensibly — widen the "
            "grouping or use the exact aggregation"
        )
    group_cols = list(group_cols or [])
    pos = _cms_positions(F.col(key), width, depth, seed, portable)
    flat = F.array(*[p + F.lit(d * width) for d, p in enumerate(pos)])
    base = df.where(F.col(key).isNotNull()).select(
        *group_cols, F.explode(flat).alias("_pos")
    )
    gnames = [c for c in base.columns if c != "_pos"]
    counts = base.groupBy(*gnames, "_pos").agg(F.count(F.lit(1)).alias("_c"))
    return _cms_densify(counts, gnames, depth * width)


def _cms_densify(counts: DataFrame, gnames: list[str], n: int) -> DataFrame:
    """(group, _pos, _c) sparse counter rows → dense length-n array."""
    dense = counts.groupBy(*gnames).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_pos"), F.col("_c")))
        ).alias("_m")
    )
    counters = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("long")), F.lit(0).cast("long")
        ),
    )
    return dense.select(*gnames, counters.alias("cms"))


def cms_merge(
    sketches: DataFrame, group_cols: list[str], cms_col: str = "cms"
) -> DataFrame:
    """Merge finer sketches to coarser groups by elementwise counter
    addition — EXACT: integer sums are order- and grouping-independent,
    so the merged sketch is bit-identical to one built directly from
    the raw rows (the events_cms_weekly oracle proves this: it sketches
    the week straight from the events table). Input is already
    O(groups·depth·width) rows."""
    exploded = sketches.select(
        *group_cols, F.posexplode(cms_col).alias("_pos", "_c")
    )
    summed = exploded.groupBy(*group_cols, "_pos").agg(F.sum("_c").alias("_c"))
    # dense input arrays emit every index, so re-densify by sorting the
    # (pos, sum) structs back into array order — no length bookkeeping
    return summed.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_c"))),
            lambda s: s["_c"],
        ).alias(cms_col)
    )


def cms_estimate(
    sketches: DataFrame,
    keys: list,
    key_name: str = "key",
    width: int = 256,
    depth: int = 4,
    seed: int = 42,
    portable: bool = True,
    cms_col: str = "cms",
) -> DataFrame:
    """Point-query a small candidate key list against every sketch row:
    est = min over depth of counter[d, pos_d(key)]. The candidate side
    is caller-supplied and tiny by contract (a dashboard watchlist) —
    broadcast join, sketch rows never move. Returns
    (group_cols…, key_name, est).

    width/depth/seed MUST match the sketch's build parameters — probe
    positions index into the counter array, so a mismatch reads wrong
    cells and can UNDER-count (silently breaking the count-min ≥-true
    guarantee). The only part checkable after the fact is the array
    length, so that is asserted per row."""
    spark = sketches.sparkSession
    cand = spark.createDataFrame([(k,) for k in keys], [key_name])
    pos = _cms_positions(F.col(key_name), width, depth, seed, portable)
    cand_pos = cand.select(
        key_name,
        *[
            (p + F.lit(d * width) + F.lit(1)).cast("int").alias(f"_p{d}")
            for d, p in enumerate(pos)
        ],
    )
    probes = [F.element_at(F.col(cms_col), F.col(f"_p{d}")) for d in range(depth)]
    est = probes[0] if depth == 1 else F.least(*probes)
    # sketches built with different width/depth have a different array
    # length — fail loudly instead of reading wrong counters
    est = F.when(F.size(cms_col) == depth * width, est).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"cms_estimate(width={width}, depth={depth}) expects "
                    f"length-{depth * width} sketches, got length "
                ),
                F.size(cms_col).cast("string"),
                F.lit(" — width/depth must match cms_build's"),
            )
        )
    )
    gnames = [c for c in sketches.columns if c != cms_col]
    return sketches.crossJoin(F.broadcast(cand_pos)).select(
        *gnames, key_name, est.alias("est")
    )


# ---------------------------------------------------------------------------
# Bottom-k uniform sample (mergeable) + quantile estimation


def bottomk_sample(
    df: DataFrame,
    key: str,
    value: str,
    group_cols: list[str] | None = None,
    k: int = 64,
    seed: int = 42,
    portable: bool = True,
) -> DataFrame:
    """Mergeable uniform row sample: per group, keep the k rows whose
    key hashes smallest — the bottom-k sketch. Because membership is a
    pure function of the key, the sample is deterministic across runs,
    partitionings, and engines, and it MERGES exactly: every row among
    the k hash-smallest of a union is among the k hash-smallest of the
    sub-group it came from, so coarser rollups (day→week) re-rank the
    retained structs without rescanning raw rows (`bottomk_merge`) —
    the same exact-merge contract as `kmv_distinct`/`cms_merge`, here
    carrying a VALUE payload so order statistics (quantiles, via
    `bottomk_quantiles`) survive the merge.

    Returns one row per group: `bk_sample`, the hash-sorted array of
    (h, key, value) structs, plus `n_rows` (true group row count — the
    estimator's scale factor and the completeness signal: when
    n_rows <= k the sample IS the group and quantiles are exact).

    Plan shape: the rank window holds ONLY `row_number() <= k`, so
    Catalyst rewrites it to WindowGroupLimit with a map-side partial
    limit — each task forwards at most k rows per group, O(groups·k)
    over the wire however large the input. The group-size count runs
    as a SEPARATE map-side-combined aggregate (a full-frame count in
    the same Window node would defeat the rewrite and ship every row
    through the shuffle — checked in the plan-pin test); both
    aggregations hash-partition on the group columns, so the final
    join reuses their partitioning with no extra exchange. NULL keys
    and NULL values are excluded (no identity / no order statistic).
    The key should be row-unique (an event/doc id): rows sharing a key
    hash identically, and which of their values enters the sample
    would then be tie-ordered only by the value itself via the struct
    sort."""
    if k < 1:
        raise ValueError("k must be >= 1")
    group_cols = list(group_cols or [])
    if set(group_cols) & {"_h", "_k", "_v"}:
        raise ValueError("group_cols may not use the reserved names _h/_k/_v")
    h = _kmv_hash(F.col(key), seed, portable)
    base = df.where(F.col(key).isNotNull() & F.col(value).isNotNull()).select(
        *group_cols,
        h.alias("_h"),
        F.col(key).alias("_k"),
        F.col(value).cast("double").alias("_v"),
    )
    gnames = group_cols
    w = Window.partitionBy(*gnames).orderBy(F.col("_h").asc(), F.col("_k").asc())
    sample = (
        base.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .groupBy(*gnames)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_h"), F.col("_k"), F.col("_v")))
            ).alias("bk_sample")
        )
    )
    counts = base.groupBy(*gnames).agg(F.count(F.lit(1)).alias("n_rows"))
    return sample.join(counts, gnames)


def bottomk_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int,
    sample_col: str = "bk_sample",
    n_col: str = "n_rows",
) -> DataFrame:
    """Re-aggregate finer bottom-k samples to coarser groups without
    rescanning: explode the retained structs, re-rank by (h, key),
    keep k. EXACT: identical to the sketch a direct pass over the
    merged raw rows would build (asserted in tests and by the
    events_bottomk_weekly oracle, which builds the weekly sample
    straight from the events table). n_rows adds. Input is already
    O(groups·k) rows."""
    exploded = sketches.select(*group_cols, F.explode(sample_col).alias("_s"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_s._h").asc(), F.col("_s._k").asc()
    )
    kept = exploded.withColumn("_rk", F.row_number().over(w))
    merged = (
        kept.where(F.col("_rk") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_s")).alias(sample_col))
    )
    # n_rows sums ONE value per input sketch, so it aggregates
    # pre-explode (sketch identity is lost after the explode)
    totals = sketches.groupBy(*group_cols).agg(F.sum(n_col).alias(n_col))
    return merged.join(totals, group_cols)


def bottomk_quantiles(
    sketches: DataFrame,
    probs: list[float],
    sample_col: str = "bk_sample",
    prefix: str = "q",
) -> DataFrame:
    """Estimate quantiles from a bottom-k sample: sort the retained
    values, interpolate at rank p·(n-1) — the standard linear
    (type-7 / quantile_cont) rule, evaluated with an EXPLICIT
    v_lo + frac·(v_hi − v_lo) formula so the Spark expression and the
    SQL oracle fold the identical IEEE operations (hash-exact, no
    engine-internal interpolation variance). When the group had fewer
    rows than k the sample is complete and the estimate is the exact
    quantile. Adds one double column per prob (q50, q90, …); groups
    keep their other columns. Pure codegen over the array column —
    no shuffle."""
    if not probs:
        raise ValueError("probs must be non-empty")
    names = []
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"prob {p} outside [0, 1]")
        # exact, collision-free label: percent with '_' for the
        # decimal point (0.5 -> q50, 0.999 -> q99_9) — int(round(p*100))
        # would alias 0.999 onto q100 and overwrite earlier columns
        pct = f"{p * 100:g}".replace(".", "_").replace("-", "")
        names.append(f"{prefix}{pct}")
    if len(set(names)) != len(names):
        raise ValueError(f"probs produce duplicate column names: {names}")
    vals = F.array_sort(
        F.transform(F.col(sample_col), lambda s: s.getField("_v"))
    )
    n = F.size(vals)
    out = sketches
    for p, name in zip(probs, names):
        pos = F.lit(float(p)) * (n - F.lit(1)).cast("double")
        lo = F.floor(pos).cast("int")
        hi = F.ceil(pos).cast("int")
        frac = pos - lo.cast("double")
        v_lo = F.element_at(vals, lo + F.lit(1))
        v_hi = F.element_at(vals, hi + F.lit(1))
        q = v_lo + frac * (v_hi - v_lo)
        out = out.withColumn(name, F.when(n > 0, q))
    return out


# ---------------------------------------------------------------------------
# Fixed-universe histogram quantiles (mergeable)


def _hist_bin(value_col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Bin index in [0, n_bins): floor((v-lo)*n_bins/(hi-lo)), clamped
    into the edge bins — the identical expression the SQL oracle folds,
    so bin assignment is bit-deterministic across engines."""
    raw = F.floor(
        (value_col.cast("double") - F.lit(float(lo)))
        * F.lit(float(n_bins))
        / F.lit(float(hi - lo))
    ).cast("long")
    return F.least(
        F.greatest(raw, F.lit(0).cast("long")), F.lit(n_bins - 1).cast("long")
    )


def hist_build(
    df: DataFrame,
    value: str,
    group_cols: list[str | Column] | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 256,
) -> DataFrame:
    """Fixed-universe histogram sketch per group: a dense length-n_bins
    int64 count array over the declared value universe [lo, hi).
    Out-of-universe values clamp into the edge bins (never dropped —
    rank statistics stay consistent with the group's true row count);
    NULL and NaN values are excluded (no order statistic — floor(NaN)
    would otherwise cast to bin 0 and masquerade as a real minimum).

    This is the QUANTILE state the tier cascade was missing: the bin
    counters are plain integer sums — order- and grouping-independent —
    so sketches MERGE EXACTLY (`hist_merge` == the histogram a direct
    pass over the merged raw rows would build), the same
    partial-reaggregation contract as `kmv_merge`/`cms_merge` and the
    rollup tier cascade (operators/rollup.py). Quantiles read off the
    merged counts (`hist_quantiles`) are therefore identical whether
    the sketch came from 1m partials rolled to 1d or from one raw
    scan — with resolution bounded by the bin width, which is a FIXED
    universe-design choice, not a data-dependent error (unlike KLL's
    randomized rank error, this form is deterministic end to end —
    the property that makes an exact DuckDB oracle possible).

    Plan shape: one codegen bin expression per row → groupBy(group,
    bin) count with map-side combine — at most groups·n_bins fixed-size
    rows cross the wire however large the input — → one densify
    aggregation of the same size. Reference analog: the tier rollup's
    reaggregation-by-parts (SURVEY §2.4 A2), extended from
    sum/count/min/max moments to the full value distribution.

    Grain guidance: the per-group state is a DENSE n_bins int64 array,
    so sketch at the finest grain whose groups still expect on the
    order of n_bins rows and merge upward from there — sketching
    near-empty groups (e.g. minute grain with a handful of rows per
    minute under a 2048-bin universe) pays n_bins state for a few
    counts; build at the hour instead and hist_merge to days/weeks
    (the turn_len_quantiles_1d contract query is the worked
    example)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if n_bins > (1 << 16):
        raise ValueError(
            f"n_bins = {n_bins}: beyond 2^16 counters per group the dense "
            "state stops paying for itself — coarsen the universe (quantile "
            "resolution 1/65536 of the range is already far below any "
            "percentile use) or use the exact aggregation"
        )
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    group_cols = list(group_cols or [])
    vd = F.col(value).cast("double")
    base = df.where(F.col(value).isNotNull() & ~F.isnan(vd)).select(
        *group_cols, _hist_bin(F.col(value), lo, hi, n_bins).alias("_pos")
    )
    gnames = [c for c in base.columns if c != "_pos"]
    counts = base.groupBy(*gnames, "_pos").agg(F.count(F.lit(1)).alias("_c"))
    return _cms_densify(counts, gnames, n_bins).withColumnRenamed("cms", "hist")


def hist_merge(
    sketches: DataFrame, group_cols: list[str], hist_col: str = "hist"
) -> DataFrame:
    """Merge finer histograms to coarser groups by elementwise counter
    addition — EXACT for the same reason `cms_merge` is: integer sums
    are order- and grouping-independent, so the merged histogram is
    bit-identical to one built directly from the raw rows (proven by
    the events_quantile_weekly oracle, which bins the week straight
    from the events table). Input is already O(groups·n_bins) rows."""
    return cms_merge(sketches, group_cols, cms_col=hist_col)


def hist_rebin(
    sketches: DataFrame, factor: int, hist_col: str = "hist"
) -> DataFrame:
    """EXACT coarsening: merge every `factor` adjacent bins by integer
    addition — new[i] = Σ old[i·f .. i·f+f-1]. The rebinned sketch is
    bit-identical to one built directly with n_bins/factor over the
    same universe (adjacent-bin sums commute with the build's
    groupBy), so fine build grains can be read cheaply: build at 2^16
    bins for archival fidelity, rebin to ≤4096 before
    `hist_quantiles` (whose cumulative fold is quadratic in array
    length). Pure codegen, O(n_bins) per row, no shuffle. The array
    length must be divisible by factor (checked distributedly)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if factor == 1:
        return sketches
    n = F.size(hist_col)
    n_new = (n / F.lit(factor)).cast("int")
    rebinned = F.transform(
        F.sequence(F.lit(0), n_new - F.lit(1)),
        lambda i: F.aggregate(
            F.slice(F.col(hist_col), i * factor + F.lit(1), factor),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    guarded = F.when(n % factor == 0, rebinned).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"hist_rebin: factor {factor} does not divide length "),
                n.cast("string"),
            )
        )
    )
    return sketches.withColumn(hist_col, guarded)


def hist_quantiles(
    sketches: DataFrame,
    probs: list[float],
    lo: float,
    hi: float,
    hist_col: str = "hist",
    prefix: str = "q",
    with_n: str | None = "n_rows",
) -> DataFrame:
    """Read quantiles off histogram sketches: for each prob p, the
    LOWER EDGE of the first bin whose cumulative count reaches
    ceil(p·n) (the inverted-CDF / type-1 rule at histogram
    resolution; p=0 maps to the first non-empty bin). Deterministic:
    one cumulative integer sum, one ceil of an exactly-folded double
    product, one edge expression lo + bin·(hi−lo)/n_bins — the SQL
    oracle evaluates the identical operations, so results are
    hash-exact across engines. Universe (lo, hi) MUST match the
    build's (n_bins is read from the array length).

    Pure codegen over the array column — no shuffle: the cumulative
    sum is an `aggregate` fold and each prob's bin index is
    `size(filter(cum < target))` (valid because cum is
    non-decreasing). The fold's array concat makes it QUADRATIC in
    the bin count, so reads are gated at 4096 bins (≈8M element
    copies per row, measured fine; 2^16 would be ~2×10⁹) — rebin
    finer sketches first (`hist_rebin` is exact). Adds one double
    column per prob plus `with_n` (the group's total count — set None
    to skip); empty groups yield NULL quantiles."""
    if not probs:
        raise ValueError("probs must be non-empty")
    names = []
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"prob {p} outside [0, 1]")
        pct = f"{p * 100:g}".replace(".", "_").replace("-", "")
        names.append(f"{prefix}{pct}")
    if len(set(names)) != len(names):
        raise ValueError(f"probs produce duplicate column names: {names}")
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    zero = F.struct(
        F.lit(0).cast("long").alias("s"), F.array().cast("array<long>").alias("a")
    )
    cum = F.aggregate(
        F.col(hist_col),
        zero,
        lambda acc, x: F.struct(
            (acc["s"] + x).alias("s"),
            F.concat(acc["a"], F.array(acc["s"] + x)).alias("a"),
        ),
        lambda acc: acc["a"],
    )
    cum = F.when(F.size(hist_col) <= 4096, cum).otherwise(
        F.raise_error(
            F.concat(
                F.lit("hist_quantiles: array length "),
                F.size(hist_col).cast("string"),
                F.lit(
                    " > 4096 — the cumulative fold is quadratic in bins; "
                    "hist_rebin to <= 4096 first (exact)"
                ),
            )
        )
    )
    out = sketches.withColumn("_cum", cum)
    n_bins_col = F.size(hist_col).cast("double")
    n = F.element_at(F.col("_cum"), -1)
    if with_n:
        out = out.withColumn(with_n, n)
    for p, name in zip(probs, names):
        target = F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(float(p)) * n.cast("double")).cast("long"),
        )
        bin0 = F.size(F.filter(F.col("_cum"), lambda c: c < target)).cast("double")
        q = (
            F.lit(float(lo))
            + bin0 * F.lit(float(hi - lo)) / n_bins_col
        )
        out = out.withColumn(name, F.when(n > 0, q))
    return out.drop("_cum")
