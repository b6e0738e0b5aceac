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


def test_topk_per_group_deterministic_and_bounded(spark, docs):
    from smos_spark.operators.sampling import topk_per_group

    out = topk_per_group(docs.withColumn("q", F.length("text")), "lang", [F.desc("q")], 3)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 3 for n in per.values())
    again = topk_per_group(
        docs.repartition(7).withColumn("q", F.length("text")), "lang", [F.desc("q")], 3
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_pack_documents_two_level_prefix_matches_global(spark, docs):
    """The bucketed prefix sum must reproduce the single global window
    EXACTLY (the oracle computes the global form)."""
    from pyspark.sql import Window

    from smos_spark.functions.texthash import md5_hash64
    from smos_spark.operators.sampling import pack_documents
    from smos_spark.operators.text import token_count_re

    d = docs.withColumn("n_tokens", token_count_re(F.col("text")))
    packed = pack_documents(d, capacity=1024, n_buckets=8)
    h = md5_hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":42")))
    base = (
        d.where(F.col("doc_id").isNotNull() & F.col("n_tokens").isNotNull())
        .withColumn("_h", h)
        .withColumn("_b", F.pmod(F.col("_h"), F.lit(8)))
    )
    wg = Window.orderBy(
        F.col("_b").asc(), F.col("_h").asc(), F.col("doc_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    glob = base.withColumn(
        "start_glob", F.sum(F.col("n_tokens").cast("long")).over(wg) - F.col("n_tokens")
    )
    a = {r["doc_id"]: r["start_off"] for r in packed.collect()}
    b = {r["doc_id"]: r["start_glob"] for r in glob.collect()}
    assert a == b


def test_pack_documents_shard_invariants(spark, docs):
    """Shards are dense from 0; per-shard token mass is capacity-bounded
    up to one straddling document; packing is partition-invariant."""
    from smos_spark.operators.sampling import pack_documents
    from smos_spark.operators.text import token_count_re

    cap = 1024
    d = docs.withColumn("n_tokens", token_count_re(F.col("text")))
    packed = pack_documents(d, capacity=cap, n_buckets=8).cache()
    total = d.agg(F.sum("n_tokens")).collect()[0][0]
    shards = sorted(r["shard_id"] for r in packed.select("shard_id").distinct().collect())
    assert shards == list(range((total + cap - 1) // cap)) or shards == list(
        range(max(shards) + 1)
    )
    # every doc starts inside its shard's token window
    bad = packed.where(
        (F.col("start_off") < F.col("shard_id") * cap)
        | (F.col("start_off") >= (F.col("shard_id") + 1) * cap)
    ).count()
    assert bad == 0
    again = pack_documents(d.repartition(11), capacity=cap, n_buckets=8)
    assert sorted(map(tuple, packed.select("doc_id", "shard_id", "start_off").collect())) == sorted(
        map(tuple, again.select("doc_id", "shard_id", "start_off").collect())
    )


def test_quantized_topk_close_to_exact(spark):
    """int8-quantized cosine top-k: high overlap with the exact ranking
    and full determinism across partitionings."""
    from smos_spark.operators.similarity import cosine_topk, quantized_topk

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    q = [r["vec_id"] for r in quantized_topk(embs, query_id=0, k=10).collect()]
    e = [r["vec_id"] for r in cosine_topk(embs, query_id=0, k=10).select("vec_id").collect()]
    assert len(set(q) & set(e)) >= 8
    q2 = [r["vec_id"] for r in quantized_topk(embs.repartition(9), query_id=0, k=10).collect()]
    assert q == q2
