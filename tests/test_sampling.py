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


def test_split_thresholds_round_not_truncate():
    """0.29+0.58 accumulates to 0.869999…97 in float; int() would
    yield 869999 and move one bucket-in-a-million between splits."""
    from smos_spark.operators.sampling import split_thresholds

    assert split_thresholds({"a": 0.29, "b": 0.58, "c": 0.13}) == [290000, 870000]
    assert split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05}) == [
        900000,
        950000,
    ]
    # a third of a corpus twice: boundaries land on the nearest micro
    assert split_thresholds({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}) == [333333, 666667]


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


def test_token_budget_reaches_budget_and_straddles(spark, docs):
    """Every group with enough tokens reaches its budget: the kept
    token sum is >= budget and < budget + max kept doc (exactly one
    straddling doc); tok_start of every kept doc is < budget."""
    from smos_spark.operators.sampling import sample_to_token_budget

    d = docs.withColumn("n_tokens", (F.floor(F.col("n_chars") / 4) + 1).cast("long"))
    budget = 2000
    out = sample_to_token_budget(d, budget, group="lang").cache()
    assert out.where(F.col("tok_start") >= budget).count() == 0
    sums = {
        r["lang"]: (r["s"], r["m"])
        for r in out.groupBy("lang")
        .agg(F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("m"))
        .collect()
    }
    totals = {
        r["lang"]: r["s"]
        for r in d.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    }
    for lang, (s, m) in sums.items():
        if totals[lang] >= budget:
            assert s >= budget, (lang, s)
        assert s < budget + m, (lang, s, m)


def test_token_budget_partition_invariant(spark, docs):
    from smos_spark.operators.sampling import sample_to_token_budget

    d = docs.withColumn("n_tokens", (F.floor(F.col("n_chars") / 4) + 1).cast("long"))
    a = sample_to_token_budget(d, 1500, group="lang").select("doc_id", "tok_start")
    b = sample_to_token_budget(d.repartition(11), 1500, group="lang").select(
        "doc_id", "tok_start"
    )
    assert a.orderBy("doc_id").collect() == b.orderBy("doc_id").collect()


def test_token_budget_per_group_map_and_default(spark, docs):
    """Per-group budgets from a map; unlisted groups follow
    default_budget (None = dropped entirely)."""
    from smos_spark.operators.sampling import sample_to_token_budget

    d = docs.withColumn("n_tokens", (F.floor(F.col("n_chars") / 4) + 1).cast("long"))
    langs = sorted(r["lang"] for r in d.select("lang").distinct().collect())
    assert len(langs) >= 2
    big, *rest = langs
    out = sample_to_token_budget(d, {big: 1000}, group="lang")
    kept_langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert kept_langs == {big}
    out2 = sample_to_token_budget(d, {big: 1000}, group="lang", default_budget=300)
    kept2 = {r["lang"] for r in out2.select("lang").distinct().collect()}
    assert kept2 == set(langs)
    # the defaulted groups obey the smaller budget
    starts = out2.where(F.col("lang") != big).agg(F.max("tok_start")).first()[0]
    assert starts < 300


def test_token_budget_matches_duckdb(spark, docs):
    """Exact SQL twin: same md5 hash order, same exclusive prefix-sum
    cut — identical doc_id/tok_start sets."""
    import duckdb

    from smos_spark.operators.sampling import sample_to_token_budget

    d = docs.withColumn("n_tokens", (F.floor(F.col("n_chars") / 4) + 1).cast("long"))
    got = sorted(
        (r["doc_id"], r["tok_start"])
        for r in sample_to_token_budget(d, 2000, group="lang").collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    exp = sorted(
        (r[0], r[1])
        for r in con.sql(
            """
        WITH d AS (
          SELECT doc_id, lang,
            (n_chars // 4 + 1)::BIGINT AS n_tokens,
            CAST(('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 15))
              AS BIGINT) AS h
          FROM documents WHERE doc_id IS NOT NULL),
        c AS (
          SELECT doc_id,
            sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - n_tokens AS tok_start
          FROM d)
        SELECT doc_id, tok_start FROM c WHERE tok_start < 2000
        """
        ).fetchall()
    )
    assert got == exp


def test_token_budget_rejects_bad_args(spark, docs):
    from smos_spark.operators.sampling import sample_to_token_budget

    with pytest.raises(ValueError):
        sample_to_token_budget(docs, {})
    with pytest.raises(ValueError):
        sample_to_token_budget(docs, {"en": -5})
