"""Persisted ANN index: build once, partition-pruned queries.

Mirrors the reference's reshuffle-then-prune lifecycle
(/root/reference/docs/img2ts.rst:8-16 — precompute the cell layout so
reads touch one cell file): the index write partitions vectors by
cell/bucket; a top-k query must (a) rank cells on the driver from the
sidecar alone and (b) scan only the probed partition directories.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _scan_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ivf_index_labeled_prunes_and_matches(spark, embs, tmp_path):
    from smos_spark.operators.ann_index import AnnIndex, build_ann_index
    from smos_spark.operators.similarity import ivf_topk

    idx = build_ann_index(embs, tmp_path / "ivf", strategy="ivf", cell_col="label")
    assert idx.n_cells_on_disk() == 10

    reopened = AnnIndex.open(tmp_path / "ivf")
    got = reopened.topk(spark, query_id=0, k=10, n_probe=3)
    plan = _scan_plan(got)
    # the literal cell IN-list reaches the scan's partition filters
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1]

    # only the probed directories are touched
    qv = np.asarray(
        embs.where(F.col("vec_id") == 0).select("embedding").collect()[0][0],
        dtype=np.float64,
    )
    probe = reopened._probe_cells(qv, n_probe=3, multiprobe_hamming=0)
    assert len(probe) == 3
    scan = (
        spark.read.parquet(reopened.vectors_path)
        .where(F.col("cell").isin(probe))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    touched = {f.f.split("cell=")[1].split("/")[0] for f in scan}
    assert touched <= {str(c) for c in probe}

    # same answer as the in-line (non-persisted) IVF path
    inline = ivf_topk(embs, query_id=0, k=10, n_probe=3).toPandas()
    assert got.toPandas().vec_id.tolist() == inline.vec_id.tolist()


def test_ivf_index_unlabeled_kmeans(spark, embs, tmp_path):
    from smos_spark.operators.ann_index import build_ann_index
    from smos_spark.operators.similarity import cosine_topk

    idx = build_ann_index(
        embs.drop("label"), tmp_path / "kmeans", strategy="ivf", n_cells=8
    )
    assert 1 <= idx.n_cells_on_disk() <= 8
    # probing ALL cells must reproduce brute force exactly — a broken
    # probe ranking or pruned scan cannot pass this
    for qid in (0, 42):
        full = idx.topk(spark, query_id=qid, k=10, n_probe=8).toPandas()
        brute_q = cosine_topk(embs, query_id=qid, k=10).toPandas()
        assert full.vec_id.tolist() == brute_q.vec_id.tolist()
    # recall@10 at n_probe=3 of 8: these near-random synthetic vectors
    # cluster weakly, so per-query recall varies (measured 0.3-0.7);
    # the MEAN over 5 queries is pinned at >= 0.5 (measured 0.54 —
    # a broken probe lands near 3/8 = 0.375)
    recalls = []
    for qid in (0, 7, 42, 99, 123):
        got = idx.topk(spark, query_id=qid, k=10, n_probe=3).toPandas()
        assert len(got) == 10
        brute = cosine_topk(embs, query_id=qid, k=10).toPandas()
        recalls.append(len(set(got.vec_id) & set(brute.vec_id)) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_lsh_index_prunes_and_matches(spark, embs, tmp_path):
    from smos_spark.operators.ann_index import build_ann_index
    from smos_spark.operators.similarity import lsh_topk

    idx = build_ann_index(embs, tmp_path / "lsh", strategy="lsh", n_planes=6)
    assert idx.n_cells_on_disk() <= 64

    got = idx.topk(spark, query_id=0, k=10, multiprobe_hamming=1)
    plan = _scan_plan(got)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1]

    # kernel-bucketed index agrees with the in-line kernel path
    inline = lsh_topk(embs, query_id=0, k=10, n_planes=6).toPandas()
    assert got.toPandas().vec_id.tolist() == inline.vec_id.tolist()


def test_lsh_kernel_matches_expression_buckets(spark, embs):
    """The Arrow-batched BLAS bucket kernel and the Catalyst expression
    path (the DuckDB-oracle twin) assign identical buckets."""
    from smos_spark.operators.similarity import lsh_assign

    fast = lsh_assign(embs, n_planes=8, bucket_col="b").select("vec_id", "b").toPandas()
    slow = (
        lsh_assign(embs, n_planes=8, bucket_col="b", portable=True)
        .select("vec_id", "b")
        .toPandas()
    )
    merged = fast.merge(slow, on="vec_id", suffixes=("_f", "_p"))
    assert (merged.b_f == merged.b_p).all()


def test_query_vec_and_query_id_agree(spark, embs, tmp_path):
    from smos_spark.operators.ann_index import build_ann_index

    idx = build_ann_index(embs, tmp_path / "ivf2", strategy="ivf", cell_col="label")
    qv = embs.where(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    by_vec = idx.topk(spark, query_vec=qv, query_id=7, k=5, n_probe=2).toPandas()
    by_id = idx.topk(spark, query_id=7, k=5, n_probe=2).toPandas()
    assert by_vec.vec_id.tolist() == by_id.vec_id.tolist()


def test_lsh_planes_guard(spark, embs, tmp_path):
    """n_planes > 16 would mean 2^n partition directories — must raise,
    mirroring the ngram_jaccard_pairs O(n²) guard."""
    from smos_spark.operators.ann_index import build_ann_index

    with pytest.raises(ValueError, match="partition directories"):
        build_ann_index(embs, tmp_path / "big", strategy="lsh", n_planes=20)


def test_ivf_index_256_cells_bounded_jobs_and_pruning(spark, tmp_path):
    """Protects the driver-side cell ranking as the sidecar grows: a
    256-cell build must run a small CONSTANT number of Spark jobs (not
    O(n_cells)), and a probe must touch at most n_probe cell
    directories by actual file count."""
    from smos_spark.operators.ann_index import build_ann_index

    dim = 16
    vecs = spark.range(4096).select(
        F.col("id").cast("int").alias("vec_id"),
        F.pmod(F.col("id"), F.lit(256)).cast("int").alias("label"),
        F.array(
            # deterministic synthetic vectors, mildly clustered by label
            *[
                (
                    F.sin((F.pmod(F.col("id"), F.lit(256)) + 1) * (i + 1) * 0.37)
                    + F.sin((F.col("id") + 1) * (i + 1) * 0.011) * 0.1
                ).cast("float")
                for i in range(dim)
            ]
        ).alias("embedding"),
    )

    sc = spark.sparkContext
    sc.setJobGroup("ann256build", "ann 256-cell index build")
    try:
        idx = build_ann_index(vecs, tmp_path / "ann256", strategy="ivf", cell_col="label")
    finally:
        sc.setJobGroup("ann256other", "")
    n_build_jobs = len(sc.statusTracker().getJobIdsForGroup("ann256build"))
    assert 1 <= n_build_jobs <= 8, n_build_jobs  # constant, NOT O(n_cells)
    assert idx.n_cells_on_disk() == 256

    got = idx.topk(spark, query_id=0, k=10, n_probe=3)
    qv = np.asarray(
        vecs.where(F.col("vec_id") == 0).select("embedding").collect()[0][0],
        dtype=np.float64,
    )
    probe = idx._probe_cells(qv, n_probe=3, multiprobe_hamming=0)
    assert len(probe) == 3
    files = (
        spark.read.parquet(idx.vectors_path)
        .where(F.col("cell").isin(probe))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    touched_dirs = {f.f.split("cell=")[1].split("/")[0] for f in files}
    assert len(touched_dirs) <= 3
    assert touched_dirs <= {str(c) for c in probe}
    assert got.count() == 10
