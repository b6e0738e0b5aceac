"""Deterministic split + stratified sampling invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smos_spark.operators.sampling import hash_split, stratified_sample


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()


def test_hash_split_partition_invariant(spark, docs):
    """Same key → same split regardless of partitioning (the property
    that prevents train/test leakage across re-ingestion)."""
    a = hash_split(docs, key="doc_id").select("doc_id", "split")
    b = hash_split(docs.repartition(13), key="doc_id").select("doc_id", "split")
    assert a.orderBy("doc_id").collect() == b.orderBy("doc_id").collect()


def test_hash_split_proportions_and_total(spark, docs):
    out = hash_split(docs, fractions={"train": 0.8, "val": 0.2})
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n
    # 500 keys: expect roughly the requested proportions
    assert 0.7 * n <= counts["train"] <= 0.9 * n
    assert counts["val"] >= 1


def test_hash_split_seed_changes_assignment(spark, docs):
    a = hash_split(docs, seed=1).select("doc_id", "split")
    b = hash_split(docs, seed=2).select("doc_id", "split")
    diff = (
        a.alias("a")
        .join(b.alias("b"), "doc_id")
        .where(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert diff > 0


def test_hash_split_rejects_bad_fractions(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, fractions={"train": 0.5, "val": 0.4})


def test_stratified_sample_exact_quota_and_determinism(spark, docs):
    out = stratified_sample(docs, stratum="lang", n_per_stratum=3)
    per = out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for r in per:
        assert r["n"] == min(3, sizes[r["lang"]])
    again = stratified_sample(docs.repartition(7), stratum="lang", n_per_stratum=3)
    assert (
        out.select("doc_id").orderBy("doc_id").collect()
        == again.select("doc_id").orderBy("doc_id").collect()
    )


def test_stratified_sample_small_stratum(spark):
    df = spark.createDataFrame(
        [(i, "only" if i == 0 else "many") for i in range(10)], "doc_id long, lang string"
    )
    out = stratified_sample(df, stratum="lang", n_per_stratum=4)
    got = {r["lang"]: 1 for r in out.collect()}
    n_only = out.where(F.col("lang") == "only").count()
    assert n_only == 1 and "many" in got


def test_null_keys_are_explicit(spark):
    """NULL keys: hash_split emits NULL split (never silently lands in
    a real label); stratified_sample excludes them (no deterministic
    rank exists)."""
    df = spark.createDataFrame(
        [(None, "en"), (1, "en"), (2, "en"), (None, "fr")],
        "doc_id long, lang string",
    )
    s = hash_split(df, fractions={"train": 0.5, "test": 0.5})
    by_key = {r["doc_id"]: r["split"] for r in s.collect()}
    assert by_key[None] is None
    assert all(v in ("train", "test") for k, v in by_key.items() if k is not None)

    out = stratified_sample(df, stratum="lang", n_per_stratum=10)
    assert out.where(F.col("doc_id").isNull()).count() == 0
    assert out.count() == 2
