"""Text analysis + dedup + similarity operators on driver testdata
(sf0.001) with DuckDB cross-checks where the oracle is SQL-clean."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_token_counts_match_duckdb(docs, ddb):
    from smos_spark.operators.text import token_count_re, token_count_ws

    got = (
        docs.select(
            "doc_id",
            token_count_ws(F.col("text")).alias("tws"),
            token_count_re(F.col("text")).alias("tre"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    exp = ddb.execute(
        """
        select doc_id,
               case when text is null then null
                    when trim(text) = '' then 0
                    else len(regexp_extract_all(trim(text), '\\S+')) end as tws,
               len(regexp_extract_all(text, '[A-Za-z0-9]+')) as tre
        from documents order by doc_id
        """
    ).fetchdf()
    np.testing.assert_array_equal(got.tws.values, exp.tws.values)
    np.testing.assert_array_equal(got.tre.values, exp.tre.values)


def test_fingerprint_matches_duckdb(docs, ddb):
    from smos_spark.operators.text import fingerprint

    got = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", fingerprint(F.col("text"), k=8).alias("fp"))
        .orderBy("doc_id")
        .toPandas()
    )
    exp = ddb.execute(
        """
        select doc_id,
          list_min(list_transform(
            list_transform(generate_series(1, greatest(len(text)-7, 1)),
                           i -> substr(text, i::int, 8)),
            sh -> ('0x' || substr(md5(sh), 1, 15))::BIGINT)) as fp
        from documents where text is not null order by doc_id
        """
    ).fetchdf()
    np.testing.assert_array_equal(got.fp.values, exp.fp.values)


def test_lang_id_and_quality_deterministic(docs):
    from smos_spark.operators.text import text_profile

    prof = text_profile(docs).cache()
    p = prof.toPandas()
    assert set(p.lang_pred.unique()) <= {"en", "es", "de", "fr", "und"}
    q = p.quality.dropna()
    assert ((q >= 0) & (q <= 1)).all()
    # deterministic: second run identical
    p2 = text_profile(docs).toPandas()
    assert p.sort_values("doc_id").quality.equals(p2.sort_values("doc_id").quality)


def test_dedup_exact(spark, docs, ddb):
    from smos_spark.operators.dedup import dedup_exact

    got = dedup_exact(docs).toPandas().sort_values("content_hash").reset_index(drop=True)
    exp = ddb.execute(
        """
        select ('0x' || substr(md5(text),1,15))::BIGINT as content_hash,
               min(doc_id) as keep_id, count(*) as n_dupes
        from documents where text is not null
        group by 1 order by 1
        """
    ).fetchdf()
    np.testing.assert_array_equal(got.content_hash.values, exp.content_hash.values)
    np.testing.assert_array_equal(got.keep_id.values, exp.keep_id.values)
    np.testing.assert_array_equal(got.n_dupes.values, exp.n_dupes.values)


def test_minhash_lsh_finds_planted_dupes(spark):
    from smos_spark.operators.dedup import minhash_dedup_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog again and once"),  # near dup
        (4, "completely different content about spark aggregation pipelines"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_dedup_pairs(df, threshold=0.6).toPandas()
    got = {tuple(x) for x in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (1, 2) in got
    assert (1, 3) in got or (2, 3) in got
    assert not any(4 in p for p in got)
    # exact dup has jaccard 1.0
    j12 = pairs[(pairs.id_a == 1) & (pairs.id_b == 2)].jaccard.iloc[0]
    assert j12 == 1.0


def test_simhash_pairs(spark):
    from smos_spark.operators.dedup import simhash_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # identical → hamming 0
        (3, "alpha beta gamma delta epsilon zeta eta iota"),  # 1 token off
        (4, "totally unrelated words describing storage engines here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_pairs(df, max_hamming=8).toPandas()
    got = {tuple(x) for x in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (1, 2) in got
    h12 = pairs[(pairs.id_a == 1) & (pairs.id_b == 2)].hamming.iloc[0]
    assert h12 == 0
    assert not any(4 in p for p in got)


def test_ngram_jaccard_blocked(spark):
    from smos_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (1, "a b c d e f g h", "s1"),
        (2, "a b c d e f g h", "s1"),
        (3, "a b c d e f g h", "s2"),  # same text, other block → not compared
        (4, "x y z w v u t s", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pairs = ngram_jaccard_pairs(df, threshold=0.9, block_col="source").toPandas()
    got = {tuple(x) for x in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert got == {(1, 2)}


def test_embedding_near_dup_matches_duckdb(embs, ddb):
    from smos_spark.operators.dedup import embedding_near_dup

    got = (
        embedding_near_dup(embs, threshold=0.9)
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    exp = ddb.execute(
        """
        select a.vec_id as id_a, b.vec_id as id_b,
          round(
            list_sum(list_transform(generate_series(1, len(a.embedding)),
              i -> a.embedding[i]::double * b.embedding[i]::double))
            / (sqrt(list_sum(list_transform(a.embedding, x -> x::double*x::double)))
             * sqrt(list_sum(list_transform(b.embedding, x -> x::double*x::double)))),
          6) as cos_sim
        from embeddings a join embeddings b
          on a.label = b.label and a.vec_id < b.vec_id
        where cos_sim >= 0.9
        order by id_a, id_b
        """
    ).fetchdf()
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got.id_a.values, exp.id_a.values)
    np.testing.assert_array_equal(got.id_b.values, exp.id_b.values)
    np.testing.assert_allclose(got.cos_sim.values, exp.cos_sim.values, atol=1e-6)


def test_cosine_topk_and_variants(embs):
    from smos_spark.operators.similarity import cosine_topk, ivf_topk, lsh_topk

    brute = cosine_topk(embs, query_id=0, k=10).toPandas()
    assert len(brute) == 10
    assert brute.cos_sim.is_monotonic_decreasing

    ivf = ivf_topk(embs, query_id=0, k=10, n_probe=3).toPandas()
    assert len(ivf) == 10
    # IVF recall vs brute force should be decent with 3/10 cells probed
    recall = len(set(ivf.vec_id) & set(brute.vec_id)) / 10
    assert recall >= 0.3

    lsh = lsh_topk(embs, query_id=0, k=10, n_planes=6).toPandas()
    assert 1 <= len(lsh) <= 10
    # every LSH hit's score matches the brute-force score for that id
    merged = lsh.merge(brute, on="vec_id", suffixes=("_l", "_b"))
    if len(merged):
        np.testing.assert_allclose(merged.cos_sim_l, merged.cos_sim_b)


def test_multimodal_plumbing(spark):
    from smos_spark.operators.multimodal import (
        extract_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, n=48)
    feats = extract_features(media, dim=16, strict=False).toPandas()
    assert len(feats) == 48
    assert feats.decode_ok.all()
    assert feats.feat.map(len).eq(16).all()
    # deterministic
    feats2 = extract_features(media, dim=16, strict=False).toPandas()
    a = np.array(feats.sort_values("media_id").feat.tolist())
    b = np.array(feats2.sort_values("media_id").feat.tolist())
    np.testing.assert_array_equal(a, b)

    plan = frame_sample_plan(media, every_ms=1000).toPandas()
    assert (plan.frame_ms % 1000 == 0).all()

    # strict default: opaque (non-container) payloads are flagged, not faked
    strict = extract_features(media, dim=16).toPandas()
    assert not strict.decode_ok.any() and strict.feat.isna().all()


def test_ivf_auto_unlabeled(embs):
    from smos_spark.operators.similarity import cosine_topk, ivf_topk_auto

    brute = cosine_topk(embs, query_id=0, k=10).toPandas()
    auto = ivf_topk_auto(
        embs.drop("label"), query_id=0, k=10, n_cells=8, n_probe=3
    ).toPandas()
    assert len(auto) == 10
    recall = len(set(auto.vec_id) & set(brute.vec_id)) / 10
    assert recall >= 0.3
    # deterministic across runs
    auto2 = ivf_topk_auto(
        embs.drop("label"), query_id=0, k=10, n_cells=8, n_probe=3
    ).toPandas()
    assert auto.vec_id.tolist() == auto2.vec_id.tolist()


def test_ngram_unblocked_raises(spark):
    from smos_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="block_col"):
        ngram_jaccard_pairs(df)
    # explicit opt-in still works for tiny data
    got = ngram_jaccard_pairs(df, threshold=0.9, allow_unblocked=True).toPandas()
    assert len(got) == 1


def test_embedding_near_dup_unlabeled_lsh_blocking(spark, embs):
    """block_col=None auto-blocks via hyperplane-LSH (+1-bit
    multiprobe) instead of requiring a label: every reported pair is a
    true near-dup (cosine verified), and recall vs the exact
    all-pairs ground truth is high."""
    import itertools

    from smos_spark.operators.dedup import embedding_near_dup

    thr = 0.35
    got = (
        embedding_near_dup(embs.drop("label"), block_col=None, threshold=thr)
        .toPandas()
        .sort_values(["id_a", "id_b"])
    )
    pdf = embs.select("vec_id", "embedding").toPandas()
    m = np.stack(pdf.embedding.to_numpy()).astype("float64")
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    ids = pdf.vec_id.to_numpy()
    truth = {
        (int(ids[i]), int(ids[j]))
        for i, j in itertools.combinations(range(len(ids)), 2)
        if sims[i, j] >= thr
    }
    found = set(zip(got.id_a.astype(int), got.id_b.astype(int)))
    assert found <= truth  # exact precision (pairs are cosine-verified)
    assert len(truth) > 0
    assert len(found) / len(truth) >= 0.8  # multiprobe recall


def test_near_dup_components_chain(spark):
    """Min-label propagation resolves multi-hop clusters: a 6-node
    chain (needs several rounds), a triangle, and an isolated pair."""
    from smos_spark.operators.dedup import near_dup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # chain
         (10, 11), (11, 12), (10, 12),             # triangle
         (20, 21)],                                # pair
        "id_a long, id_b long",
    )
    got = near_dup_components(pairs).toPandas().sort_values("doc_id")
    comp = dict(zip(got.doc_id, got.component))
    assert all(comp[n] == 1 for n in (1, 2, 3, 4, 5, 6))
    assert all(comp[n] == 10 for n in (10, 11, 12))
    assert comp[20] == comp[21] == 20
    keep = set(got[got.keep].doc_id)
    assert keep == {1, 10, 20}


def test_near_dup_components_long_chain_pointer_jumping(spark):
    """A 40-node chain converges well inside max_iters thanks to the
    pointer-jumping step (O(log diameter) rounds, not O(diameter))."""
    from smos_spark.operators.dedup import near_dup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 140)], "id_a long, id_b long"
    )
    got = near_dup_components(pairs, max_iters=10).toPandas()
    assert (got.component == 100).all()
    assert set(got[got.keep].doc_id) == {100}


def test_dedup_apply_and_token_topk(spark):
    from smos_spark.operators.dedup import dedup_apply
    from smos_spark.operators.text import token_topk

    df = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the cat sat"),   # exact dup of 0 → dropped
            (2, "the dog ran"),
            (3, None),            # NULL text survives (nothing to hash)
            (4, "the cat sat"),   # another dup → dropped
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dedup_apply(df).select("doc_id").collect())
    assert kept == [0, 2, 3]

    top = token_topk(df, k=2).toPandas()
    assert top.token.tolist() == ["the", "cat"]
    assert top.cnt.tolist() == [4, 3]


def test_repetition_profile_known_values(spark):
    from smos_spark.operators.text import repetition_profile

    df = spark.createDataFrame(
        [
            # 5 lines: "aa" x3 (dup 2, chars 4), "bbb" x2 (dup 1, chars 3)
            (1, "aa\naa\nbbb\n aa \nbbb"),
            (2, "unique one\nunique two"),  # no dups
            (3, "   \n\n  x"),  # blanks dropped -> 1 line
            (4, ""),  # zero lines
            (5, None),  # filtered out
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile(df, counts=True).collect()
    }
    assert 5 not in got
    assert got[1] == {
        "doc_id": 1,
        "n_lines": 5,
        "n_dup_lines": 3,
        "dup_chars": 7,
        "total_chars": 12,
    }
    assert got[2]["n_dup_lines"] == 0 and got[2]["dup_chars"] == 0
    assert got[3] == {
        "doc_id": 3,
        "n_lines": 1,
        "n_dup_lines": 0,
        "dup_chars": 0,
        "total_chars": 1,
    }
    assert got[4]["n_lines"] == 0 and got[4]["total_chars"] == 0

    fr = {
        r["doc_id"]: r.asDict() for r in repetition_profile(df).collect()
    }
    assert fr[1]["dup_line_frac"] == 0.6  # 3/5
    assert fr[1]["dup_line_char_frac"] == round(7 / 12, 6)
    assert fr[4]["dup_line_frac"] == 0.0


def test_ngram_decontaminate_known_overlap(spark):
    from smos_spark.operators.text import ngram_decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox yesterday"),  # shares 4-gram
            (2, "a quick brown dog sat"),  # only 3-gram overlap
            (3, "completely different text here"),
            (4, None),
            (5, "short"),  # < n tokens
        ],
        "doc_id long, text string",
    )
    hit = sorted(
        r["doc_id"] for r in ngram_decontaminate(corpus, eval_df, n=4).collect()
    )
    assert hit == [1]
    # n=3: doc 2's "quick brown dog"? not in eval (eval has quick brown fox).
    hit3 = sorted(
        r["doc_id"] for r in ngram_decontaminate(corpus, eval_df, n=3).collect()
    )
    assert hit3 == [1]
    # case-insensitivity + punctuation stripping
    corpus2 = spark.createDataFrame(
        [(9, "The QUICK, brown fox!")], "doc_id long, text string"
    )
    assert [r["doc_id"] for r in ngram_decontaminate(corpus2, eval_df, n=4).collect()] == [9]


def test_drop_boilerplate_lines_known(spark):
    from smos_spark.operators.text import drop_boilerplate_lines

    df = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\n\nfooter"),
            (2, "COOKIE BANNER\nreal content two\nfooter"),
            (3, "COOKIE BANNER\nunique three\nfooter"),
            (4, "COOKIE BANNER"),  # fully boilerplate -> dropped doc
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in drop_boilerplate_lines(df, max_df=3).collect()
    }
    # banner + footer appear in 3 docs -> dropped; blank line kept
    assert out[1] == "real content one\n"
    assert out[2] == "real content two"
    assert out[3] == "unique three"
    assert 4 not in out
    # max_df=4: only the banner (df=4... actually banner df=4? it's in
    # all 4 docs; footer df=3) is dropped
    out4 = {
        r["doc_id"]: r["text"]
        for r in drop_boilerplate_lines(df, max_df=4).collect()
    }
    assert out4[1] == "real content one\n\nfooter"
    assert 4 not in out4


def test_pii_profile_and_redact(spark):
    from smos_spark.operators.text import pii_profile, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-site.org then http://x.io/p?q=1 at 192.168.0.1 done"),
            (2, "no artifacts here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    prof = {r["doc_id"]: r.asDict() for r in pii_profile(df).collect()}
    assert 3 not in prof
    assert prof[1]["n_emails"] == 1 and prof[1]["n_urls"] == 1 and prof[1]["n_ipv4"] == 1
    assert prof[2] == {"doc_id": 2, "n_emails": 0, "n_urls": 0, "n_ipv4": 0}
    red = df.where(F.col("doc_id") == 1).select(
        redact_pii(F.col("text")).alias("t")
    ).collect()[0]["t"]
    assert red == "mail <EMAIL> then <URL> at <IPV4> done"


def test_quality_funnel_known(spark):
    from smos_spark.operators.text import apply_funnel, quality_funnel

    base = "the and of to is in that it " * 10   # quality-passing English
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),                            # exact dup of 1
            (3, "el la de que los una por con " * 10),  # Spanish
            (4, "short"),                          # < 20 chars
            (5, ""),                               # empty
            (6, None),                             # null
            (7, base + "tail"),                    # unique survivor
        ],
        "doc_id long, text string",
    )
    funnel = {r["stage"]: r.asDict() for r in quality_funnel(df).collect()}
    assert funnel["nonempty"]["n_in"] == 7 and funnel["nonempty"]["n_kept"] == 5
    assert funnel["min_len_20"] == {
        "stage_idx": 1, "stage": "min_len_20", "n_in": 5, "n_kept": 4, "n_dropped": 1
    }
    assert funnel["lang_en"]["n_kept"] == 3          # drops the Spanish doc
    assert funnel["quality_500000"]["n_kept"] == 3
    assert funnel["dedup_exact"]["n_kept"] == 2      # 1 survives, 2 dropped
    kept = sorted(r["doc_id"] for r in apply_funnel(df).collect())
    assert kept == [1, 7]


def test_quality_funnel_dedup_among_survivors_only(spark):
    """A dup whose earlier twin FAILED an upstream stage must survive
    dedup — first occurrence is counted among survivors."""
    from smos_spark.operators.text import apply_funnel

    good = "the and of to is in that it " * 10
    df = spark.createDataFrame(
        [(1, "short"), (2, good), (3, good)],
        "doc_id long, text string",
    )
    # doc 1 is short — but docs 2/3 are dups of EACH OTHER, not of 1
    stages = [("nonshort", F.length("text") >= 20)]
    kept = sorted(r["doc_id"] for r in apply_funnel(df, stages=stages).collect())
    assert kept == [2]
    df2 = spark.createDataFrame(
        [(1, good), (2, good)], "doc_id long, text string"
    )
    # doc 1 fails min_len? no — both pass; sanity: plain dedup keeps min id
    kept2 = sorted(r["doc_id"] for r in apply_funnel(df2, stages=stages).collect())
    assert kept2 == [1]


def test_knn_graph_matches_numpy(embs):
    """Blocked kNN graph vs a numpy within-label brute force using the
    same round-6 cosine + dst-asc tie-break ordering contract."""
    from smos_spark.operators.similarity import knn_graph

    k = 3
    got = (
        knn_graph(embs, k=k, block_col="label")
        .toPandas()
        .sort_values(["src", "rk"])
        .reset_index(drop=True)
    )
    pdf = embs.select("vec_id", "embedding", "label").toPandas()
    m = np.stack(pdf.embedding.to_numpy()).astype("float64")
    norms = np.linalg.norm(m, axis=1)
    ids = pdf.vec_id.to_numpy()
    labels = pdf.label.to_numpy()
    exp_rows = []
    for i in range(len(pdf)):
        mask = (labels == labels[i]) & (ids != ids[i])
        cand = np.where(mask)[0]
        cos = np.round((m[cand] @ m[i]) / (norms[cand] * norms[i]), 6)
        order = sorted(range(len(cand)), key=lambda j: (-cos[j], ids[cand[j]]))
        for rk, j in enumerate(order[:k], start=1):
            exp_rows.append((ids[i], ids[cand[j]], rk, int(np.round(cos[j] * 1e6))))
    import pandas as pd

    exp = (
        pd.DataFrame(exp_rows, columns=["src", "dst", "rk", "cos_ppm"])
        .sort_values(["src", "rk"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) == len(pdf) * k
    np.testing.assert_array_equal(got.src.to_numpy(), exp.src.to_numpy())
    np.testing.assert_array_equal(got.dst.to_numpy(), exp.dst.to_numpy())
    # round(round6_cos * 1e6) is exact for every round-6 value — no
    # representation-boundary tolerance needed (unlike floor)
    np.testing.assert_array_equal(got.cos_ppm.to_numpy(), exp.cos_ppm.to_numpy())


def test_knn_graph_requires_block():
    from smos_spark.operators.similarity import knn_graph

    with pytest.raises(ValueError, match="block"):
        knn_graph(None, block_col=None)


def test_centroid_outliers_matches_numpy(embs):
    """Quality filter vs numpy: quantized-integer centroids are exact,
    so only the final double fold can differ (BLAS pairwise vs left
    fold) — allow ±1 ppm at the boundary."""
    from smos_spark.operators.similarity import centroid_outliers

    got = centroid_outliers(embs, threshold_ppm=0).toPandas()
    pdf = embs.select("vec_id", "embedding", "label").toPandas()
    m = np.stack(pdf.embedding.to_numpy()).astype("float64")
    labels = pdf.label.to_numpy()
    qsum = {}
    for lab in set(labels):
        block = m[labels == lab]
        s = np.round(block * 1e6).astype("int64").sum(axis=0)
        qsum[lab] = s / (len(block) * 1e6)
    ppm = {}
    for i, vid in enumerate(pdf.vec_id.to_numpy()):
        cen = qsum[labels[i]]
        c = (m[i] @ cen) / (np.linalg.norm(m[i]) * np.linalg.norm(cen))
        ppm[vid] = int(np.floor(c * 1e6))
    got_ids = set(got.vec_id)
    for vid, p in ppm.items():
        if p <= -2:
            assert vid in got_ids, (vid, p)
        if p >= 1:
            assert vid not in got_ids, (vid, p)
    for row in got.itertuples():
        assert abs(row.cos_ppm - ppm[row.vec_id]) <= 1



def test_normalize_text_known_values(spark):
    """NFC composition, control strip, whitespace collapse, trim —
    planted unicode rows with exact expected outputs; NULL stays NULL."""
    from smos_spark.operators.text import normalize_text

    rows = [
        (1, "e\u0301xtra   space\tand\nnewline  "),  # NFD e+accent -> \u00e9
        (2, None),
        (3, "plain"),
        (4, "nbsp\u00a0stays  intact"),  # unicode space NOT collapsed
        (5, "bell\x07and\x0bvt\x0cff"),  # controls stripped
        (6, "  lead trail\r\n"),
    ]
    exp = {
        1: "\u00e9xtra space and newline",
        2: None,
        3: "plain",
        4: "nbsp\u00a0stays intact",
        5: "bellandvtff",
        6: "lead trail",
    }
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_norm for r in normalize_text(df).collect()}
    assert got == exp
    # cross-engine: DuckDB twin produces byte-identical strings
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    duck = dict(
        duckdb.sql(
            r"""
        SELECT doc_id, trim(regexp_replace(regexp_replace(nfc_normalize(text),
          '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
          '[ \t\n\r]+', ' ', 'g'), ' ') FROM pdf
    """
        ).fetchall()
    )
    assert duck == exp


def test_knn_graph_mapside_topk_in_plan(embs):
    """The per-source top-k must be cut BEFORE the exchange: a partial
    WindowGroupLimit ahead of the shuffle bounds it to O(N·k) rows
    (PLANS.md §22) — pinned here so a regression can't silently ship
    the full candidate-pair set through the wire."""
    from smos_spark.operators.similarity import knn_graph

    plan = (
        knn_graph(embs, k=3, block_col="label")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    marker = "Exchange hashpartitioning(src"
    # guard the pin itself: if the marker string drifts, split()[-1]
    # would return the WHOLE plan and the final (post-shuffle)
    # WindowGroupLimit would satisfy the check spuriously
    assert marker in plan, plan
    pre_exchange = plan.split(marker, 1)[-1]
    assert "WindowGroupLimit" in pre_exchange, plan


def test_duplicate_span_ratio_planted(spark):
    """Planted cross-doc duplicate passage: docs 1/2 share a 6-token
    span, doc 3 is unique, doc 4 too short for any gram (absent).
    In-doc repetition must NOT inflate the count (distinct grams)."""
    from smos_spark.operators.text import duplicate_span_ratio

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"{shared} one two three"),
        (2, f"intro words here {shared}"),
        (3, "totally unique content nothing shared at all"),
        (4, "too short"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup"], r["dup_ppm"])
        for r in duplicate_span_ratio(df, n=3).collect()
    }
    assert set(got) == {1, 2, 3}
    # doc1: 9 tokens -> 7 grams; the 4 grams inside the shared span
    # also appear in doc2
    assert got[1] == (7, 4, 4 * 1_000_000 // 7)
    assert got[2] == (7, 4, 4 * 1_000_000 // 7)
    assert got[3] == (5, 0, 0)
    # in-doc repetition: same span twice in ONE doc -> distinct grams,
    # df stays 1, nothing counted as duplicate
    solo = spark.createDataFrame(
        [(9, f"{shared} filler {shared}")], "doc_id long, text string"
    )
    r9 = duplicate_span_ratio(solo, n=3).first()
    assert r9["n_dup"] == 0


def test_chunk_documents_roundtrip_and_overlap(spark):
    """Chunks reassemble the original exactly (drop each post-0
    chunk's first `overlap` chars, concatenate); consecutive chunks
    share exactly `overlap` chars; empty doc yields one empty chunk."""
    from smos_spark.operators.text import chunk_documents

    rows = [
        (1, "abcdefghijklmnopqrstuvwxyz0123456789"),  # 36 chars
        (2, "short"),
        (3, ""),
        (4, None),
        (5, "x" * 10),  # exact multiple edge: size 10, overlap 4, stride 6
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, size=10, overlap=4).toPandas()
    assert 4 not in set(out.doc_id)
    by_doc = {k: g.sort_values("chunk_idx") for k, g in out.groupby("doc_id")}
    originals = dict((r[0], r[1]) for r in rows if r[1] is not None)
    for doc_id, g in by_doc.items():
        assert list(g.chunk_idx) == list(range(g.n_chunks.iloc[0]))
        rebuilt = g.chunk_text.iloc[0] + "".join(
            c[4:] for c in g.chunk_text.iloc[1:]
        )
        assert rebuilt == originals[doc_id], doc_id
        for a, b in zip(g.chunk_text, g.chunk_text[1:]):
            assert a[-4:] == b[:4] or len(b) < 4  # shared overlap
        assert (g.chunk_start == g.chunk_idx * 6).all()
    assert by_doc[3].n_chunks.iloc[0] == 1 and by_doc[3].chunk_text.iloc[0] == ""
    assert by_doc[2].n_chunks.iloc[0] == 1
    # 36 chars, size 10, stride 6 -> 1 + ceil(26/6) = 6 chunks
    assert by_doc[1].n_chunks.iloc[0] == 6
    # exact-coverage edge: 10 chars fits one window exactly
    assert by_doc[5].n_chunks.iloc[0] == 1

    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents(df, size=10, overlap=10)


def test_chunk_documents_property(spark):
    """Property: for random ASCII strings and (size, overlap) configs,
    chunks always reassemble the original and chunk count matches the
    stride formula. Uses one Spark job over all cases."""
    import random

    rng = random.Random(7)
    cases = []
    for i in range(40):
        n = rng.randrange(0, 300)
        s = "".join(rng.choice("abcdefgh ") for _ in range(n))
        cases.append((i, s))
    df = spark.createDataFrame(cases, "doc_id long, text string")
    for size, overlap in [(1, 0), (7, 3), (50, 49), (120, 24)]:
        from smos_spark.operators.text import chunk_documents

        out = chunk_documents(df, size=size, overlap=overlap).toPandas()
        stride = size - overlap
        for doc_id, g in out.groupby("doc_id"):
            g = g.sort_values("chunk_idx")
            orig = cases[doc_id][1]
            rebuilt = g.chunk_text.iloc[0] + "".join(
                c[overlap:] for c in g.chunk_text.iloc[1:]
            )
            assert rebuilt == orig, (doc_id, size, overlap)
            exp_n = 1 + max(0, -(-(len(orig) - size) // stride)) if len(orig) > size else 1
            assert g.n_chunks.iloc[0] == exp_n, (doc_id, size, overlap)


def test_duplicate_span_ratio_null_ids_excluded(spark):
    """NULL-id docs have no identity: excluded from output AND from
    doc frequency (two distinct NULL-id docs must not merge into one
    pseudo-doc and fake a cross-doc duplicate)."""
    from smos_spark.operators.text import duplicate_span_ratio

    rows = [
        (None, "alpha beta gamma delta"),
        (None, "alpha beta gamma delta"),
        (1, "epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = duplicate_span_ratio(df, n=3).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["n_dup"] == 0


def test_ngram_threshold_zero_raises(spark, docs):
    """threshold<=0 would require gram-disjoint pairs (a cross join,
    outside the prefix-filter theorem) — refused."""
    from smos_spark.operators.dedup import ngram_jaccard_pairs

    with pytest.raises(ValueError, match="threshold"):
        ngram_jaccard_pairs(docs, threshold=0.0, block_col="lang")


def test_simhash_batch_vote_matches_per_row_reference():
    """simhash_votes_batch (segmented reduceat over the whole Arrow
    batch) must produce bit-identical signatures to the obvious
    per-row vote loop, across ragged/None/empty/single-token rows and
    hashes with the sign bit set (two's-complement view round-trip)."""
    from smos_spark.operators.dedup import simhash_votes_batch

    rng = np.random.default_rng(11)
    arrs = []
    for n in [0, 1, 2, 7, 64, 1, 0, 3, 129, 5]:
        if n == 0:
            arrs.append(None if len(arrs) % 2 else [])
        else:
            arrs.append(
                rng.integers(-(2**63), 2**63, size=n, dtype=np.int64).tolist()
            )
    got = np.zeros(len(arrs), dtype=np.int64)
    simhash_votes_batch(arrs, got)

    shifts = np.arange(64, dtype=np.uint64)
    exp = np.zeros(len(arrs), dtype=np.int64)
    for i, h in enumerate(arrs):
        if h is None or not len(h):
            continue
        hv = np.asarray(h, dtype=np.int64).view(np.uint64)
        bits = ((hv[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        votes = 2 * bits.sum(axis=0) - len(hv)
        sig = np.uint64(0)
        for j in np.flatnonzero(votes > 0):
            sig |= np.uint64(1) << np.uint64(j)
        exp[i] = np.int64(sig.astype(np.int64)) if sig < (1 << 63) else np.int64(
            int(sig) - (1 << 64)
        )
    np.testing.assert_array_equal(got, exp)


def test_simhash_batch_vote_slicing_identical():
    """The bounded-transient slicing (max_flat) must not change any
    signature: force multiple slices (max_flat smaller than single
    rows and than the batch) and compare against the unsliced run."""
    from smos_spark.operators.dedup import simhash_votes_batch

    rng = np.random.default_rng(23)
    arrs = [
        rng.integers(-(2**63), 2**63, size=n, dtype=np.int64).tolist()
        for n in [5, 40, 0, 130, 7, 256, 1, 90]
    ]
    arrs[2] = None
    unsliced = np.zeros(len(arrs), dtype=np.int64)
    simhash_votes_batch(arrs, unsliced, max_flat=1 << 30)
    for max_flat in (1, 16, 64, 128, 300):
        sliced = np.zeros(len(arrs), dtype=np.int64)
        simhash_votes_batch(arrs, sliced, max_flat=max_flat)
        np.testing.assert_array_equal(sliced, unsliced, err_msg=str(max_flat))


def test_bm25_topk_matches_duckdb(docs, ddb):
    """bm25_topk vs the oracle expression evaluated in DuckDB on the
    same corpus: same ids, same ranks, bit-identical score_micro (the
    rational idf/saturation substitution makes the score exact SQL)."""
    from smos_spark.operators.text import bm25_topk

    import __spark_entry__ as entrymod

    terms = ["spark", "join", "vector"]
    got = (
        bm25_topk(docs, terms=terms, k=10)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    exp = (
        ddb.execute(entrymod._bm25_oracle_sql(terms, k=10))
        .fetchdf()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score_micro"].tolist() == exp["score_micro"].tolist()


def test_bm25_topk_properties(docs):
    """Ranks are 1..n contiguous, scores non-increasing, every hit
    contains at least one query term; input validation rejects empty,
    non-[a-z0-9], duplicate terms and k < 1."""
    from smos_spark.operators.text import bm25_topk

    out = bm25_topk(docs, terms=["customer", "vector"], k=5).toPandas()
    assert out["rank"].tolist() == list(range(1, len(out) + 1))
    scores = out["score_micro"].tolist()
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    hit_ids = set(out["doc_id"].tolist())
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.col("doc_id").isin(list(hit_ids)))
        .select("doc_id", "text")
        .collect()
    }
    for did in hit_ids:
        low = texts[did].lower()
        assert ("customer" in low) or ("vector" in low)

    import pytest as _pytest

    for bad in ([], ["UPPER"], ["ok", "ok"], ["has space"]):
        with _pytest.raises(ValueError):
            bm25_topk(docs, terms=bad, k=5)
    with _pytest.raises(ValueError):
        bm25_topk(docs, terms=["ok"], k=0)
