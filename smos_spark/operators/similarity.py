"""Approximate-nearest-neighbor search over an embedding column.

Three strategies, one API (query by an existing vec_id, so both sides
of the oracle resolve the same query vector):

* brute-force cosine top-k — the correctness baseline; broadcast the
  (single) query vector, one pass, JVM-side arithmetic.
* IVF (inverted-file): coarse-partition vectors by a centroid
  assignment (precomputed label or k-means-lite buckets), rank
  centroids by query distance, probe only the best n_probe partitions
  — at 100 TB this is the difference between a full scan and touching
  ~n_probe/n_cells of the data (partition pruning on the bucket col).
* Hyperplane LSH — seeded random hyperplanes → bit signature; probe
  the query's bucket (+ optional multi-probe neighbors).

Determinism contract: IVF centroids are QUANTIZED means — per-dimension
integer sums of round(x·1e6) divided by (n·1e6) — so they are exactly
order-independent: the same value on any partitioning, any engine.
That is what gives `ivf_topk` an exact DuckDB oracle (a float avg()
would differ in the last ulp between summation orders).

Index lifecycle at scale: these functions compute their coarse
structure in-line (fine for one-shot queries and the sf oracles);
`smos_spark.operators.ann_index.build_ann_index` persists the same
structure (cell-partitioned vectors + centroid/plane sidecar) so a
query is a partition-pruned read — the reference's own reshuffle
lesson (/root/reference/docs/img2ts.rst:8-16: precompute the layout,
prune at read).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from smos_spark.operators.dedup import cosine

__all__ = [
    "cosine_topk",
    "ivf_centroids",
    "ivf_topk",
    "lsh_bucket",
    "lsh_assign",
    "lsh_topk",
    "kmeans_assign",
    "ivf_topk_auto",
    "quantized_topk",
    "knn_graph",
    "centroid_outliers",
]


def _query_vec_np(df: DataFrame, key: str, vec_col: str, query_id: int) -> np.ndarray:
    """The query vector, collected once (a single-row lookup)."""
    row = df.where(F.col(key) == query_id).select(vec_col).collect()
    if not row:
        raise KeyError(f"{key}={query_id} not found")
    return np.asarray(row[0][0], dtype=np.float64)


def _lit_array(vec) -> Column:
    """A small vector as a literal array — broadcast-as-literal: no
    join at all in the scan."""
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: one scan + a k-row sort (TakeOrderedAndProject
    physical op — no full sort, no shuffle of the data)."""
    q = _lit_array(_query_vec_np(df, key, vec_col, query_id))
    scored = df.where(F.col(key) != query_id).select(
        F.col(key),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(key)).limit(k)


def ivf_centroids(
    df: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(cell, centroid) via quantized exact means: Σ round(x·1e6) as
    int64 per dimension, divided by n·1e6. Integer sums are
    order-independent, so the centroid is bit-identical across
    partitionings and engines (the DuckDB oracle twin computes the
    same integers). One aggregation pass, map-side partials."""
    dfd = df.withColumn("_v", F.col(vec_col).cast("array<double>"))
    if dim is None:
        dim = len(dfd.select(vec_col).limit(1).collect()[0][0])
    agg = dfd.groupBy(cell_col).agg(
        *[
            F.sum(F.round(F.col("_v")[i] * 1e6).cast("long")).alias(f"_s{i}")
            for i in range(dim)
        ],
        F.count(F.lit(1)).alias("_c"),
    )
    return agg.select(
        cell_col,
        F.array(
            *[
                F.col(f"_s{i}").cast("double") / (F.col("_c").cast("double") * F.lit(1e6))
                for i in range(dim)
            ]
        ).alias("centroid"),
    )


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    key: str = "vec_id",
    cell_col: str = "label",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: cells are the precomputed coarse partition (`label`
    here; any clustering works). Rank cells by cosine(query, centroid),
    scan only the top n_probe cells. Approximate by design — returns
    exact top-k *within* the probed cells.

    Pass `centroids` (from `ivf_centroids` at index-build time, or an
    AnnIndex sidecar) to skip the in-line centroid aggregation — at
    scale centroids are computed ONCE when the table is written, and a
    query touches only the probed partitions."""
    qv = _query_vec_np(df, key, vec_col, query_id)
    if centroids is None:
        centroids = ivf_centroids(df, cell_col, vec_col, dim=len(qv))
    q = _lit_array(qv)
    probe_cells = [
        r[cell_col]
        for r in centroids.select(
            cell_col, cosine(F.col("centroid"), q).alias("d")
        )
        .orderBy(F.desc("d"), F.asc(cell_col))
        .limit(n_probe)
        .collect()
    ]
    # literal IN-list on the cell column → partition pruning when the
    # table is physically partitioned by cell
    scored = (
        df.where(F.col(cell_col).isin(probe_cells) & (F.col(key) != query_id))
        .select(
            F.col(key),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(key)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-of-projection bit signature → integer bucket id, as pure
    Catalyst expressions. The plane matrix is seeded & embedded as
    literals (identical on every executor and every run). This is the
    PORTABLE path (exact DuckDB twin: the fold order of the dot
    product matches list_sum); `lsh_assign(portable=False)` is the
    Arrow-batched hot path for bulk bucketing."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.shiftleft(F.when(dot > 0, F.lit(1).cast("long")).otherwise(0), j)
    return bucket


def _lsh_bucket_udf(planes: np.ndarray):
    """Arrow-batched bucket kernel: a batch of vectors against the
    (n_planes, dim) plane matrix in one BLAS product — one sign test
    per (vector, plane), no interpreted per-element lambdas."""
    from pyspark.sql.functions import pandas_udf

    pl = np.ascontiguousarray(planes, dtype=np.float64)
    weights = (np.int64(1) << np.arange(len(pl), dtype=np.int64))

    @pandas_udf("long")
    def _b(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(((m @ pl.T > 0) * weights).sum(axis=1))

    return _b


def lsh_assign(
    df: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    bucket_col: str = "_bucket",
    portable: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """df + bucket column. Written ONCE at ingest/index-build time and
    stored as a partition column — queries then prune to ≤ 1+n_planes
    bucket directories instead of re-bucketing the table."""
    if dim is None:
        dim = len(df.select(vec_col).limit(1).collect()[0][0])
    planes = _hyperplanes(dim, n_planes, seed)
    if portable:
        return df.withColumn(
            bucket_col, lsh_bucket(F.col(vec_col).cast("array<double>"), planes)
        )
    return df.withColumn(bucket_col, _lsh_bucket_udf(planes)(F.col(vec_col)))


def quantized_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """Top-k by int8-quantized cosine — the memory-bandwidth path for
    brute-force ANN at corpus scale: vectors are stored/scanned as int8
    (4× smaller than float32, 8× than float64), the dot product and the
    squared norms are INTEGER sums (64 dims × 127² < 2^20, so Σ and the
    norm product stay far inside int64 — exact in any order, on any
    partitioning, in any engine), and only the final
    dot/√(‖q‖²·‖d‖²) division runs in doubles, once per row in a fixed
    expression order. That makes the ranking bit-deterministic with an
    exact DuckDB twin — a float32 dot product would differ in the last
    ulp between summation orders and engines.

    Same physical shape as `cosine_topk`: one scan + TakeOrderedAndProject
    (no shuffle, no sort of the full table); the quantized query vector
    ships as a literal int array. Accuracy loss vs exact cosine is
    bounded by the quantization step (~1/254 of the max component).

    Reference analog: the reference stores float rasters zlib-packed
    and reads them back through a fixed decode
    (/root/reference/src/smos/interface.py:341,376); here the "codec"
    is int8 quantization chosen so the MATH, not just the storage, is
    exact."""
    qcols = df.select(
        F.col(key), *_quantize_cols(F.col(vec_col))
    )
    qrow = qcols.where(F.col(key) == query_id).select("_q").collect()
    if not qrow:
        raise KeyError(f"{key}={query_id} not found")
    qvec = [int(x) for x in qrow[0][0]]
    qlit = F.array(*[F.lit(x) for x in qvec])
    qn2 = sum(x * x for x in qvec)
    dot = F.aggregate(
        F.zip_with(F.col("_q"), qlit, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    score = F.when(
        (F.col("_n2") > 0) & (F.lit(qn2) > 0),
        dot.cast("double") / F.sqrt((F.col("_n2") * F.lit(qn2)).cast("double")),
    ).otherwise(F.lit(0.0))
    scored = qcols.where(F.col(key) != query_id).select(
        F.col(key), score.alias("qcos")
    )
    return scored.orderBy(F.desc("qcos"), F.asc(key)).limit(k)


def _quantize_cols(vec: Column) -> list[Column]:
    """Symmetric per-vector int8 quantization as pure codegen exprs:
    scale s = max(|x|); q_i = floor(x_i/s*127 + 0.5) in [-127, 127]
    (floor(v+0.5) is the same round-half-up in every engine — unlike
    round(), whose half-tie mode differs between Spark and DuckDB).
    Returns [_q (array<bigint>), _n2 (Σq_i², int64-exact)]; a zero
    vector quantizes to all-zero with norm 0."""
    v = vec.cast("array<double>")
    s = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        s > 0,
        F.transform(v, lambda x: F.floor(x / s * 127 + F.lit(0.5)).cast("long")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
    n2 = F.aggregate(
        F.transform(q, lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return [q.alias("_q"), n2.alias("_n2")]


def lsh_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    key: str = "vec_id",
    multiprobe_hamming: int = 1,
    portable: bool = False,
) -> DataFrame:
    """LSH ANN: bucket all vectors by hyperplane signature, scan the
    query's bucket plus buckets within `multiprobe_hamming` bit flips.
    At scale the bucket id is a partition/cluster column → pruning
    (see ann_index.build_ann_index for the persisted form).
    portable=True buckets with Catalyst expressions (exact DuckDB
    twin); default is the Arrow-batched kernel."""
    qv = _query_vec_np(df, key, vec_col, query_id)
    bucketed = lsh_assign(
        df, n_planes=n_planes, seed=seed, vec_col=vec_col,
        bucket_col="_bucket", portable=portable, dim=len(qv),
    )
    # the query's bucket comes from the SAME bucketing pass (one tiny
    # lookup job) so kernel/expression float folds can never disagree
    # between query and data side
    qb = bucketed.where(F.col(key) == query_id).select("_bucket").collect()[0][0]
    probe = {qb}
    if multiprobe_hamming >= 1:
        probe |= {qb ^ (1 << j) for j in range(n_planes)}
    q = _lit_array(qv)
    scored = (
        bucketed.where(F.col("_bucket").isin(list(probe)) & (F.col(key) != query_id))
        .select(
            F.col(key),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(key)).limit(k)


def _assign_cells_udf(centroids: np.ndarray, round_to: int = 6):
    """Arrow-batched nearest-centroid assignment: batch matrix (n, d)
    against the driver-held (k, d) centroid matrix in one BLAS
    product. Centroids are tiny (k×d floats) — they ship inside the
    UDF closure; the data itself never leaves the executors.

    Similarities are rounded to `round_to` decimals before the argmax
    (ties → lowest cell, np.argmax picks the first max): assignment
    then has an exact SQL twin (`round(cos, 6)` with cell-asc
    tie-break) instead of depending on BLAS summation order."""
    from pyspark.sql.functions import pandas_udf

    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(
            np.argmax(np.round(m @ cn.T, round_to), axis=1).astype(np.int32)
        )

    return _assign


def kmeans_assign(
    df: DataFrame,
    k: int = 16,
    n_iters: int = 2,
    vec_col: str = "embedding",
    key: str = "vec_id",
    seed: int = 42,
    cell_col: str = "cell",
    portable: bool = False,
) -> DataFrame:
    """Lightweight Lloyd k-means over cosine distance for IVF coarse
    cells on UNLABELED data. Deterministic seeding (k rows chosen by
    hash order, ties → key); per iteration: one distributed assignment
    pass (BLAS batch kernel, round-6 similarities so assignment is
    engine-portable) + one groupBy quantized-mean (order-exact
    integer sums); the (k, dim) centroid matrix lives on the driver.
    Returns df + `cell` column — at scale the table is written
    partitioned/clustered by this column, so IVF probes become
    partition pruning.

    portable=True seeds with the md5-based hash64 instead of xxhash64:
    every step (seeding, round-6 assignment, quantized means) then has
    an exact DuckDB twin — the whole k-means becomes verifiable SQL."""
    from smos_spark.functions.texthash import md5_hash64

    dfd = df.withColumn("_v", F.col(vec_col).cast("array<double>"))
    dim = len(dfd.select(vec_col).limit(1).collect()[0][0])
    hcol = (
        md5_hash64(F.concat_ws(":", F.col(key).cast("string"), F.lit(str(seed))))
        if portable
        else F.xxhash64(F.col(key).cast("string"), F.lit(seed))
    )
    seed_rows = (
        dfd.select("_v", hcol.alias("_h"), F.col(key).alias("_k"))
        .orderBy("_h", "_k")
        .limit(k)
        .collect()
    )
    centroids = np.array([r._v for r in seed_rows], dtype=np.float64)
    for _ in range(n_iters):
        assigned = dfd.withColumn(cell_col, _assign_cells_udf(centroids)(F.col("_v")))
        means = (
            assigned.groupBy(cell_col)
            .agg(
                *[
                    F.sum(F.round(F.col("_v")[i] * 1e6).cast("long")).alias(f"s{i}")
                    for i in range(dim)
                ],
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        for r in means:
            centroids[r[cell_col]] = [r[f"s{i}"] / (r["c"] * 1e6) for i in range(dim)]
    return dfd.withColumn(cell_col, _assign_cells_udf(centroids)(F.col("_v"))).drop("_v")


def ivf_topk_auto(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 3,
    vec_col: str = "embedding",
    key: str = "vec_id",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """IVF ANN over unlabeled vectors: k-means-lite coarse cells +
    probe-the-nearest-cells search (ivf_topk). portable=True makes the
    full pipeline (seeding→assignment→means→probe→rank) an exact
    DuckDB twin — see kmeans_assign."""
    cells = kmeans_assign(
        df, k=n_cells, vec_col=vec_col, key=key, seed=seed, cell_col="cell",
        portable=portable,
    )
    return ivf_topk(
        cells, query_id=query_id, k=k, n_probe=n_probe,
        vec_col=vec_col, key=key, cell_col="cell",
    )


def knn_graph(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    key: str = "vec_id",
    block_col: str | None = "label",
    portable: bool = True,
) -> DataFrame:
    """k-nearest-neighbor graph over the embedding table: for every
    vector, its top-k most-cosine-similar neighbors — the backbone of
    diversity sampling, cluster seeding, and graph-based dedup over a
    training corpus.

    Candidate generation is BLOCK-BOUNDED, never all-pairs: neighbors
    are searched within `block_col` (a semantic label, or an IVF/LSH
    cell from `kmeans_assign`/`lsh_assign`/`ann_index` — the same
    coarse structure the ANN queries probe). At corpus scale the join
    is O(Σ_b |b|²) with |b| ≈ N/cells, and the per-source top-k is cut
    map-side by the Partial WindowGroupLimit before the exchange, so
    the shuffle carries O(N·k) rows, not the candidate pairs.

    Ranking is the round-6 cosine with a neighbor-id tie-break — the
    same bit-deterministic ordering contract as `cosine_topk` — and
    the score is exported as an exact ppm int. Returns
    (src, dst, rk, cos_ppm).

    Reference analog: the reference's cell-based gpi lookup
    (/root/reference/src/smos/grid.py via pygeogrids) bounds every
    spatial search to a cell; blocks play that role in vector space.
    """
    if block_col is None:
        raise ValueError(
            "knn_graph requires a block column (label / IVF cell / LSH "
            "bucket): an unblocked kNN graph is an all-pairs join — "
            "assign blocks first (kmeans_assign / lsh_assign)."
        )
    a = df.select(
        F.col(block_col).alias("_blk"),
        F.col(key).alias("src"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    ).where(F.col("_blk").isNotNull())
    b = df.select(
        F.col(block_col).alias("_blk"),
        F.col(key).alias("dst"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    ).where(F.col("_blk").isNotNull())
    pairs = a.join(b, "_blk").where(F.col("src") != F.col("dst"))
    if portable:
        # fold-order-exact Catalyst expression: the DuckDB-twin path
        score = cosine(F.col("_va"), F.col("_vb"))
    else:
        # Arrow-batched BLAS kernel — the hot path: the expression
        # cosine is interpreted per array element, the kernel does the
        # whole batch in one einsum (same round-6 contract)
        from smos_spark.operators.dedup import _cosine_pairs_udf

        score = _cosine_pairs_udf()(F.col("_va"), F.col("_vb"))
    scored = pairs.select("src", "dst", score.alias("_cos"))
    w = Window.partitionBy("src").orderBy(F.desc("_cos"), F.asc("dst"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "src",
            "dst",
            "rk",
            # _cos is the round-6 cosine; most 6-decimal fractions are
            # not exact doubles, so floor(x*1e6) loses 1 ppm for ~1% of
            # values — round() is exact for every round-6 input
            F.round(F.col("_cos") * F.lit(1_000_000)).cast("long").alias("cos_ppm"),
        )
    )


def centroid_outliers(
    df: DataFrame,
    threshold_ppm: int = 0,
    cell_col: str = "label",
    vec_col: str = "embedding",
    key: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Embedding-space quality filter: flag vectors whose cosine to
    their OWN cell centroid falls below `threshold_ppm` (parts-per-
    million, i.e. 0 = pointing away from the cluster it was assigned
    to) — mislabel / noise detection over a training-embedding corpus.

    Exactness contract: the centroid is the quantized integer-sum mean
    (`ivf_centroids` — order-independent, bit-identical across engines
    and partitionings), and the emitted score is floor(cos·1e6) of the
    RAW cosine double (no round-6 step): both engines fold the same
    doubles in the same order, so the int64 ppm and the threshold cut
    are hash-exact. Output: (key, cell_col, cos_ppm).

    Scale shape: one centroid aggregation pass (shuffle = O(cells)
    fixed-size integer state), then a join the optimizer broadcasts
    when the centroid table fits (no forced hint — a 10^9-cell index
    shuffles instead of OOMing the driver), then a scan-side codegen
    expression. Never all-pairs, no Python in the hot path.

    Reference analog: flag-based value masking keeps rows but marks
    bad values (/root/reference/src/smos/smos_ic/interface_ic.py:121-133);
    here the "flag" is derived from the geometry itself.
    """
    if centroids is None:
        centroids = ivf_centroids(df, cell_col, vec_col)
    joined = df.join(centroids, cell_col)
    c = cosine(
        F.col(vec_col).cast("array<double>"), F.col("centroid"), round_to=None
    )
    return (
        joined.select(
            F.col(key),
            F.col(cell_col),
            F.floor(c * F.lit(1_000_000.0)).cast("long").alias("cos_ppm"),
        )
        .where(F.col("cos_ppm") < int(threshold_ppm))
    )
