"""Text-analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting — all pure built-in Column expressions
(whole-stage codegen, no Python on the hot path), each with an exact
DuckDB-SQL twin in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from smos_spark.functions.texthash import md5_hash64

TOKEN_RE = "[A-Za-z0-9]+"
# BPE-ish: letter runs, digit runs, single punctuation marks
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
PUNCT_RE = "[^A-Za-z0-9\\s]"

# language marker words (regex word-boundary matches, lowercase input)
LANG_MARKERS = {
    "en": "(^| )(the|and|of|to|is|in|that|it)( |$)",
    "es": "(^| )(el|la|de|que|los|una|por|con)( |$)",
    "de": "(^| )(der|die|und|das|ist|nicht|ein|mit)( |$)",
    "fr": "(^| )(le|les|des|est|une|dans|pour|sur)( |$)",
}
LANG_ORDER = ("en", "es", "de", "fr")  # deterministic tie-break


def token_count_ws(col: Column) -> Column:
    """Whitespace tokenization count (0 for empty, NULL for NULL)."""
    trimmed = F.trim(col)
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(
        F.when(trimmed == "", 0).otherwise(
            F.size(F.split(trimmed, "\\s+")).cast("long")
        )
    )


def token_count_re(col: Column, pattern: str = TOKEN_RE) -> Column:
    """Regex token count (BPE-ish with BPE_RE)."""
    return F.regexp_count(col, F.lit(pattern)).cast("long")


def punct_ratio(col: Column) -> Column:
    return F.when(
        F.length(col) > 0,
        F.regexp_count(col, F.lit(PUNCT_RE)).cast("double") / F.length(col),
    ).otherwise(F.lit(0.0))


def lang_scores(col: Column) -> dict[str, Column]:
    low = F.lower(col)
    return {lang: F.regexp_count(low, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}


def lang_id(col: Column) -> Column:
    """Argmax of stopword-marker hit counts; 'und' (undetermined) when
    no marker fires. Ties break in LANG_ORDER."""
    scores = lang_scores(col)
    best = None
    for lang in LANG_ORDER:
        s = scores[lang]
        cond_better = [
            s >= scores[o] if LANG_ORDER.index(o) > LANG_ORDER.index(lang) else s > scores[o]
            for o in LANG_ORDER
            if o != lang
        ]
        cond = cond_better[0]
        for c in cond_better[1:]:
            cond = cond & c
        branch = F.when((s > 0) & cond, F.lit(lang))
        best = branch if best is None else best.when((s > 0) & cond, F.lit(lang))
    return F.coalesce(best, F.lit("und"))


def quality_score(col: Column, round_to: int = 6) -> Column:
    """Deterministic [0,1] quality heuristic: rewards mid-range length
    and healthy token/stopword structure, penalizes punctuation soup.
    score = 0.4*len_term + 0.3*(1 - punct) + 0.3*stopword_term
    """
    n = F.length(col).cast("double")
    len_term = F.least(n / 500.0, F.lit(1.0))
    p_term = 1.0 - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    tokens = token_count_re(col).cast("double")
    stop_hits = lang_scores(col)["en"].cast("double")
    stop_term = F.when(tokens > 0, F.least(stop_hits * 10.0 / tokens, F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    score = 0.4 * len_term + 0.3 * p_term + 0.3 * stop_term
    return F.round(F.when(col.isNull(), F.lit(None)).otherwise(score), round_to)


def fingerprint(col: Column, k: int = 8, portable: bool = True) -> Column:
    """Winnowing-style document fingerprint: min hash over all k-char
    shingles (rolling window). portable=True uses the md5 hash with a
    DuckDB twin; portable=False runs the vectorized numpy rolling-hash
    kernel (the 100 TB hot path — Catalyst transform lambdas are
    interpreted per element). Short/NULL docs hash the whole text."""
    if not portable:
        from smos_spark.operators.dedup import _hashed_shingles_udf

        return F.array_min(_hashed_shingles_udf(k)(col))
    n_sh = F.greatest(F.length(col) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n_sh)
    return F.array_min(
        F.transform(idx, lambda i: md5_hash64(col.substr(i, F.lit(k))))
    )


def text_profile(
    df: DataFrame, text_col: str = "text", portable: bool = True
) -> DataFrame:
    """One row per doc: length, token counts, punct ratio, lang, quality,
    fingerprint — the full text-analysis pass, single scan.
    portable=False swaps the fingerprint to the vectorized numpy
    rolling-hash kernel (hot path)."""
    c = F.col(text_col)
    return df.select(
        *[x for x in df.columns if x != text_col],
        F.length(c).alias("n_chars_computed"),
        token_count_ws(c).alias("n_tokens_ws"),
        token_count_re(c, BPE_RE).alias("n_tokens_bpe"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        fingerprint(c, portable=portable).alias("fp"),
    )


def token_topk(
    df: DataFrame, k: int = 20, text_col: str = "text", pattern: str = "[a-z0-9]+"
) -> DataFrame:
    """Top-k most frequent tokens across the corpus (vocabulary /
    heavy-hitter analysis). One explode + one hash-keyed groupBy with
    map-side combine, then a k-row TakeOrderedAndProject — no full
    sort, no collect. Deterministic tie-break: count desc, token asc."""
    toks = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), 0)
    ).alias("token")
    return (
        df.where(F.col(text_col).isNotNull())
        .select(toks)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )


def repetition_profile(
    df: DataFrame, text_col: str = "text", counts: bool = False
) -> DataFrame:
    """Gopher-style repetition signals per document: count of non-empty
    lines, fraction of lines that are duplicates, and the char-weighted
    duplicate-line fraction (the signal the published quality filters
    threshold on — e.g. drop docs with >30% chars in duplicate lines).

    Pure Column expressions, single scan, no shuffle. The char-weighted
    term sorts the line array once and charges the length of every line
    equal to its sorted predecessor — O(L log L) per doc instead of the
    naive O(L^2) distinct-x-filter scan, so a pathological million-line
    document costs ~20M comparisons, not 10^12. Exact DuckDB twin in
    __spark_entry__.oracle_sql() (same sort-adjacent formulation).

    counts=True emits the exact integer numerators/denominators
    (n_dup_lines, dup_chars, total_chars) instead of rounded ratios —
    the float-free form the correctness oracle compares.
    """
    keep = [x for x in df.columns if x != text_col]
    # Two projection boundaries so the line array and its sorted copy
    # materialize once per row: the sorted array is referenced from
    # inside the aggregate() lambda, and an inlined array_sort(split(…))
    # would re-evaluate per lambda iteration — O(L^2 log L) per doc
    # (Catalyst keeps a projection whose alias is multiply referenced
    # by a non-cheap expression; same pitfall as ngram_decontaminate).
    base = df.where(F.col(text_col).isNotNull()).select(
        *keep,
        F.filter(
            F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
            lambda x: x != "",
        ).alias("_lines"),
    )
    base = base.select(*keep, "_lines", F.array_sort("_lines").alias("_srt"))
    lines, srt = F.col("_lines"), F.col("_srt")
    n_lines = F.size(lines)
    # chars of every element equal to its sorted predecessor
    dup_chars = F.when(
        n_lines >= 2,
        F.aggregate(
            F.sequence(F.lit(2), n_lines),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.element_at(srt, i) == F.element_at(srt, i - 1),
                F.length(F.element_at(srt, i)).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    ).otherwise(F.lit(0).cast("long"))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    n_dup = (n_lines - F.size(F.array_distinct(lines))).cast("long")
    if counts:
        return base.select(
            *keep,
            n_lines.cast("long").alias("n_lines"),
            n_dup.alias("n_dup_lines"),
            dup_chars.alias("dup_chars"),
            total_chars.alias("total_chars"),
        )
    return base.select(
        *keep,
        n_lines.cast("long").alias("n_lines"),
        F.round(
            F.when(n_lines > 0, n_dup.cast("double") / n_lines).otherwise(0.0), 6
        ).alias("dup_line_frac"),
        F.round(
            F.when(total_chars > 0, dup_chars.cast("double") / total_chars).otherwise(
                0.0
            ),
            6,
        ).alias("dup_line_char_frac"),
    )


def token_ngram_hashes(
    df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DISTINCT token n-gram hashes as one array column
    `grams` (md5_hash64 of the space-joined token window — 8 bytes per
    gram downstream instead of the gram text). Shared by the exact
    decontamination join (`ngram_decontaminate`) and the Bloom-filter
    scan-side variant (`operators.sketch.bloom_decontaminate`).

    The token array is materialized in its own projection: the alias
    is referenced from inside the transform() lambda, and Catalyst
    does not collapse a projection whose alias is multiply referenced
    by a non-cheap expression — so the O(len) regex extraction runs
    once per row. Inlined, it re-runs inside every lambda iteration:
    O(len^2) per doc, which hangs on multi-KB documents (observed:
    130 KB doc -> minutes)."""
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0
        ).alias("_toks"),
    )
    tc = F.col("_toks")
    g = F.when(
        F.size(tc) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - (n - 1)),
            lambda i: md5_hash64(F.array_join(F.slice(tc, i, F.lit(n)), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return base.select(F.col(id_col), F.array_distinct(g).alias("grams"))


def ngram_decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: return the ids of corpus docs that
    share any token n-gram with the evaluation set (the published
    standard is 13-gram overlap; training docs containing eval-set
    n-grams leak test answers and must be dropped before training).

    Shape at 100 TB: each side is one scan producing distinct per-doc
    n-gram hashes (md5_hash64 of the space-joined token window — 8
    bytes shuffled per gram instead of the gram text), then a left-semi
    join. The eval side is a benchmark suite — MBs, not TBs — so AQE
    broadcasts it on its own; no forced broadcast hint (a survivor-set
    lesson: never hint a side whose size grows with the data, see
    PLANS.md dedup_apply note). The final distinct is one shuffle on
    the contaminated id subset only.

    Reference analog: the reference engine has no text ops; this
    extends the dedup family (dedup.py) the way SURVEY.md §2's
    training-pipeline addendum specifies.
    """

    def grams(df: DataFrame) -> DataFrame:
        return token_ngram_hashes(df, n=n, text_col=text_col, id_col=id_col).select(
            F.col(id_col), F.explode("grams").alias("gram")
        )

    eval_grams = grams(eval_df).select("gram").distinct()
    return (
        grams(docs)
        .join(eval_grams, "gram", "left_semi")
        .select(id_col)
        .distinct()
    )


def duplicate_span_ratio(
    docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicate-span fraction: per document, the share
    of its distinct token n-grams that also occur in ≥ `min_docs`
    documents corpus-wide — the standard "duplicate n-gram fraction"
    quality signal (RefinedWeb/Gopher use it to drop boilerplate-heavy
    and templated pages that exact/minhash dedup misses because no
    WHOLE document matches).

    Returns (id_col, n_grams, n_dup, dup_ppm) with dup_ppm the exact
    integral-div parts-per-million. Documents with no grams (NULL text
    or fewer than n tokens) are absent — they carry no span evidence.

    Scale shape — deliberately NOT a window over gram: a
    `count() OVER (PARTITION BY gram)` puts every occurrence of a
    mega-duplicated boilerplate gram (millions of docs) into ONE task,
    and windows cannot be AQE-skew-split. Instead: (a) document
    frequency via groupBy(gram) count — the map-side combine collapses
    a hot gram to one row per task before the exchange; (b) the
    ≥min_docs grams left-semi join back onto the gram stream — a join
    AQE CAN skew-split; (c) per-doc totals and dup counts as two
    doc-keyed aggregations with map-side partials. In-doc repeats
    don't inflate the signal: `token_ngram_hashes` emits distinct
    grams per doc, so the gram count IS the document frequency.
    Compare `repetition_profile` (WITHIN-doc repetition) and
    `minhash_dedup_pairs` (whole-doc near-duplicates) — this operator
    catches the cross-doc duplicated-passage middle ground.
    """
    # NULL ids are excluded (no identity — the sampling/sketch
    # contract): distinct NULL-id documents would otherwise merge into
    # one pseudo-doc under groupBy, corrupting both their own row and
    # the corpus doc-frequency
    g = token_ngram_hashes(
        docs.where(F.col(id_col).isNotNull()),
        n=n, text_col=text_col, id_col=id_col,
    )
    grams = g.select(F.col(id_col), F.explode("grams").alias("gram"))
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("gram")
    )
    # per-doc totals come from size() on the pre-explode array — zero
    # shuffle AND one fewer evaluation of the gram-extraction subtree
    # (the expensive md5 transform would otherwise run a third time)
    totals = g.select(
        F.col(id_col), F.size("grams").alias("n_grams")
    ).where(F.col("n_grams") > 0)
    dups = (
        grams.join(dup_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    per_doc = totals.join(dups, id_col, "left").na.fill(0, ["n_dup"])
    return per_doc.withColumn(
        "dup_ppm", F.expr("(n_dup * 1000000) div n_grams")
    )


def distinctive_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k DISTINCTIVE terms: rank a doc's terms by
    tf/df — its own term frequency divided by the number of corpus
    docs containing the term (document-frequency normalization, the
    rational core of tf-idf). log-idf is deliberately avoided: ln()
    is not guaranteed bit-identical across engines, while tf/df is
    ONE division of two exact int64 counts — deterministic ranking,
    exact SQL oracle. Ties break on the term string.

    Returns (id_col, term, tf, df_docs). Plan shape: tokenize+explode
    → groupBy(doc, term) tf (shuffle 1) → groupBy(term) df from the
    tf rows — one row per (doc, term), so df counts docs by plain
    count (shuffle 2, input already deduplicated) → join tf×df on term
    (AQE broadcasts the df side when it fits; no forced hint) →
    row_number ≤ k per doc (map-side WindowGroupLimit). The corpus
    never shuffles raw text — tokens reduce to (doc, term, count)
    before any exchange."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = tf.join(dfreq, "term").withColumn(
        "_score", F.col("tf").cast("double") / F.col("df_docs").cast("double")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_score"), F.asc("term")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(id_col, "term", "tf", "df_docs")
    )


def drop_boilerplate_lines(
    df: DataFrame,
    max_df: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide boilerplate removal (the C4-family filter): rebuild
    each document dropping every line whose trimmed form appears in
    >= max_df distinct documents (nav bars, cookie banners, license
    headers). Blank lines are kept verbatim and never counted.

    Shape at 100 TB: posexplode -> line-hash document-frequency count
    (two-phase countDistinct, map-side partial) -> anti join on the
    8-byte line hash (boilerplate side is the high-DF tail -- small;
    AQE broadcasts when it fits, no forced hint) -> one groupBy
    rebuild per doc ordered by line position. Three shuffles total,
    all on hashed keys; line text itself is never shuffled twice.
    """
    lined = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )
    lined = lined.select(
        id_col, "_pos", "_line", F.xxhash64(F.trim("_line")).alias("_lh")
    )
    boiler = (
        lined.where(F.trim("_line") != "")
        .groupBy("_lh")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .where(F.col("_df") >= max_df)
        .select("_lh")
    )
    kept = lined.join(
        boiler.withColumnRenamed("_lh", "_bh"),
        (F.col("_lh") == F.col("_bh")) & (F.trim("_line") != ""),
        "left_anti",
    )
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s.getField("_line"),
            ),
        ).alias(text_col)
    )


# web-artifact / PII patterns — shared by Spark (Java regex) and the
# DuckDB oracle (RE2): no lookaround, no backrefs, ASCII classes only,
# so both engines scan leftmost/non-overlapping identically
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[^\\s]+"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def pii_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc web-artifact / PII counts (emails, URLs, IPv4s) — the
    filter inputs of the C4/RefinedWeb-style cleaning passes. Pure
    codegen regexp_count expressions, single scan, no shuffle."""
    c = F.col(text_col)
    return df.where(c.isNotNull()).select(
        *[x for x in df.columns if x != text_col],
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(URL_RE)).cast("long").alias("n_urls"),
        F.regexp_count(c, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
    )


def redact_pii(col: Column) -> Column:
    """Replace URLs, then emails, then bare IPv4s with typed sentinels
    (URLs first so an address inside a query string is consumed by the
    <URL> token, not double-redacted)."""
    out = F.regexp_replace(col, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, IPV4_RE, "<IPV4>")


def default_funnel_stages(
    text_col: str = "text",
    min_len: int = 20,
    lang: str = "en",
    quality_ppm: int = 500_000,
) -> list[tuple[str, Column]]:
    """The default corpus-cleaning cascade: non-empty → minimum length
    → language → quality threshold. The quality stage thresholds the
    exact ppm floor (integer), never the raw double, so the cut is
    engine-portable."""
    c = F.col(text_col)
    q_ppm = F.floor(quality_score(c, round_to=12) * 1e6).cast("long")
    return [
        ("nonempty", c.isNotNull() & (F.trim(c) != "")),
        (f"min_len_{min_len}", F.length(c) >= min_len),
        (f"lang_{lang}", lang_id(c) == lang),
        (f"quality_{quality_ppm}", q_ppm >= quality_ppm),
    ]


def quality_funnel(
    df: DataFrame,
    stages: list[tuple[str, Column]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup_exact: bool = True,
) -> DataFrame:
    """Per-stage removal accounting for a composed cleaning pipeline —
    the number every large corpus run reports ("X% dropped by the
    language filter, Y% by dedup"). Stages apply CUMULATIVELY; the
    optional terminal dedup stage keeps the first (lowest id) doc per
    exact content hash AMONG the stage survivors only.

    Returns (stage_idx, stage, n_in, n_kept, n_dropped) — one row per
    stage. Shape at 100 TB: one scan computing all cumulative flags as
    codegen expressions and ONE single-row aggregate exploded to the
    funnel rows — no per-stage passes, no driver-side loops over data.
    The dedup_exact stage count is a count(DISTINCT hash) over the
    survivors, NOT a row_number window over the content hash: the
    two-phase distinct aggregate collapses a mega-duplicated document
    map-side, where a hash-partitioned window would put every copy in
    one task (the same skew trap §26 documents for duplicate spans) —
    and for pure accounting "first surviving occurrence per hash" and
    "number of distinct surviving hashes" are the same count.
    """
    stages = list(stages or default_funnel_stages(text_col))
    flags = []
    cum = None
    for name, pred in stages:
        pred = F.coalesce(pred, F.lit(False))
        cum = pred if cum is None else (cum & pred)
        flags.append((name, cum))
    work = df.select(
        F.col(id_col), F.col(text_col), *[c.alias(f"_c{i}") for i, (_, c) in enumerate(flags)]
    )
    aggs = [
        F.sum(F.when(F.col(f"_c{i}"), 1).otherwise(0)).cast("long").alias(f"_k{i}")
        for i in range(len(flags))
    ]
    if dedup_exact:
        last = F.col(f"_c{len(flags) - 1}")
        aggs.append(
            F.count_distinct(
                F.when(last, F.md5(F.coalesce(F.col(text_col), F.lit(""))))
            )
            .cast("long")
            .alias(f"_k{len(flags)}")
        )
        flags.append(("dedup_exact", None))
    agg = work.agg(F.count(F.lit(1)).cast("long").alias("_k_in"), *aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(name).alias("stage"),
                (F.col("_k_in") if i == 0 else F.col(f"_k{i - 1}")).alias("n_in"),
                F.col(f"_k{i}").alias("n_kept"),
                (
                    (F.col("_k_in") if i == 0 else F.col(f"_k{i - 1}"))
                    - F.col(f"_k{i}")
                ).alias("n_dropped"),
            )
            for i, (name, _) in enumerate(flags)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


def apply_funnel(
    df: DataFrame,
    stages: list[tuple[str, Column]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup_exact: bool = True,
) -> DataFrame:
    """The corpus that survives `quality_funnel`'s cascade (same
    semantics, same window; returns the input columns)."""
    stages = list(stages or default_funnel_stages(text_col))
    cum = None
    for _, pred in stages:
        pred = F.coalesce(pred, F.lit(False))
        cum = pred if cum is None else (cum & pred)
    kept = df.where(cum)
    if dedup_exact:
        w = Window.partitionBy(
            F.md5(F.coalesce(F.col(text_col), F.lit("")))
        ).orderBy(F.col(id_col))
        kept = (
            kept.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    return kept


# ---------------------------------------------------------------------------
# Unicode normalization

#: C0/C1 control characters EXCEPT tab/newline/CR (those are whitespace)
CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
#: explicit ASCII whitespace class, deliberately NOT backslash-s:
#: Python's matches unicode spaces while RE2's is ASCII-only, so the
#: portable contract names its characters
WS_RE = "[ \\t\\n\\r]+"


def chunk_documents(
    df: DataFrame,
    size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    the standard preparation for embedding / retrieval pipelines
    (windows of `size` chars, each starting `size - overlap` after the
    previous, so consecutive chunks share `overlap` chars of context).

    Returns (id_col, chunk_idx, chunk_start, chunk_text, n_chunks):
    chunk_start is the 0-based char offset, n_chunks the doc's total —
    enough to reassemble the document exactly (drop each chunk's first
    `overlap` chars after chunk 0 and concatenate; pinned by a
    round-trip test). Every document yields ≥1 chunk (an empty or
    whitespace doc yields one empty chunk row, keeping doc counts
    stable through the pipeline); NULL text is excluded.

    Scale shape: pure codegen — one `sequence` + `explode` over
    ceil((len-overlap)/stride) offsets and a `substring` per chunk; no
    shuffle, no Python. Explosion factor is bounded by len/stride per
    doc (the same array-blowup consideration as token_ngram_hashes —
    for multi-GB pathological docs, cap upstream with a length filter
    in the quality funnel)."""
    if size < 1:
        raise ValueError("size must be >= 1")
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    t = F.col(text_col)
    n = F.length(t)
    # number of stride-starts covering the doc: 1 + ceil(max(n-size,0)/stride)
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(n - F.lit(size), F.lit(0)).cast("double") / F.lit(stride)
        ).cast("int")
    )
    base = df.where(t.isNotNull()).select(
        F.col(id_col), t.alias("_t"), n_chunks.alias("n_chunks")
    )
    return base.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
        F.col("n_chunks"),
        F.col("_t"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx"),
        (F.col("chunk_idx").cast("long") * stride).alias("chunk_start"),
        # substring is 1-based; length cap handles the final partial chunk
        F.substring(
            F.col("_t"), (F.col("chunk_idx") * stride + 1).cast("int"), size
        ).alias("chunk_text"),
        F.col("n_chunks"),
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
) -> DataFrame:
    """Canonical text cleanup for training corpora: Unicode NFC
    normalization, C0/C1 control-character strip (tab/newline/CR are
    treated as whitespace instead), ASCII-whitespace run collapse to a
    single space, and space trim. NULL stays NULL.

    The kernel is one Arrow-batched pandas UDF using pandas' vectorized
    str methods (`.str.normalize('NFC')` etc.) — Spark has no built-in
    Unicode normalizer; everything else stays a C loop per batch. The
    DuckDB twin is nfc_normalize + the SAME explicit-class regexes, so
    outputs are byte-identical (both engines implement standard NFC;
    unicode spaces are deliberately left alone — collapsing them would
    tie the contract to each engine's unicode-property tables).

    Scale shape: embarrassingly parallel scan-side map, no shuffle.

    Reference analog: value-level cleanup at read time
    (/root/reference/src/smos/smos_ic/interface_ic.py:113-133 masks
    non-finite values in place); this is the text equivalent.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        out = s.str.normalize("NFC")
        out = out.str.replace(CTRL_RE, "", regex=True)
        out = out.str.replace(WS_RE, " ", regex=True)
        return out.str.strip(" ")

    return df.withColumn(out_col, _norm(F.col(text_col)))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by a rational BM25 relevance score for a fixed
    query-term list (the retrieval step of a dedup-then-retrieve
    training-data pipeline; reference analog: the attribute-filtered
    read path of /root/reference/src/smos/interface.py:83-126, scoring
    instead of masking).

    Scoring is BM25 with k1=6/5, b=3/4, with BOTH transcendental-free
    substitutions that keep the score an exact SQL expression:
      idf(t)    = (2N - 2df + 1) / (2df + 1)     (Robertson idf sans ln —
                  same argument, monotone-identical ranking per term)
      tfpart(t) = 22·tf·S / (10·S·tf + 3·S + 9·dl·N)
                  (the standard saturation term with avgdl = S/N,
                  multiplied through by 10·S: every operand is a count)
      score     = Σ_t idf(t)·tfpart(t), fixed left-to-right fold
    All arithmetic is IEEE double +,-,×,÷ in a FIXED expression shape,
    so Spark and DuckDB produce bit-identical scores — ln() would not.

    Per-term tf uses word-boundary regexp counts (no tokenize+explode:
    the term list is small and fixed, so tf is |terms| codegen column
    expressions); dl is the [a-z0-9]+ token count. Corpus stats
    (N, S=Σdl, df per term) are ONE aggregate row broadcast back over
    the corpus — the only shuffle besides the final top-k, which is a
    TakeOrderedAndProject (O(k) per partition, no global sort).

    Returns (id_col, rank, score_micro) — floor(score·1e6), rank 1..k
    ordered by (score desc, id asc). NULL-text rows never match.
    """
    import re as _re

    if k < 1:
        raise ValueError("k must be >= 1")
    if not terms:
        raise ValueError("terms must be non-empty")
    for t in terms:
        if not _re.fullmatch("[a-z0-9]+", t):
            raise ValueError(f"terms must match [a-z0-9]+, got {t!r}")
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct")

    low = F.lower(F.col(text_col))
    base = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.regexp_count(low, F.lit("[a-z0-9]+")).cast("long").alias("_dl"),
        *[
            F.regexp_count(low, F.lit(f"\\b{t}\\b")).cast("long").alias(f"_tf_{t}")
            for t in terms
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_s"),
        *[
            F.sum((F.col(f"_tf_{t}") > 0).cast("long")).alias(f"_df_{t}")
            for t in terms
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))

    def _term_score(t: str) -> Column:
        tf = F.col(f"_tf_{t}").cast("double")
        df_ = F.col(f"_df_{t}").cast("double")
        n = F.col("_n").cast("double")
        s = F.col("_s").cast("double")
        dl = F.col("_dl").cast("double")
        idf = (F.lit(2.0) * n - F.lit(2.0) * df_ + F.lit(1.0)) / (
            F.lit(2.0) * df_ + F.lit(1.0)
        )
        tfpart = (F.lit(22.0) * tf * s) / (
            F.lit(10.0) * s * tf + F.lit(3.0) * s + F.lit(9.0) * dl * n
        )
        return F.when(F.col(f"_tf_{t}") > 0, idf * tfpart).otherwise(F.lit(0.0))

    score = _term_score(terms[0])
    for t in terms[1:]:
        score = score + _term_score(t)
    top = (
        scored.withColumn("_score", score)
        .where(F.col("_score") > 0)
        .orderBy(F.desc("_score"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("_score"), F.asc(id_col))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn(
            "score_micro", F.floor(F.col("_score") * F.lit(1000000.0)).cast("long")
        )
        .select(id_col, "rank", "score_micro")
    )
