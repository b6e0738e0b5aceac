"""Text-analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting — all pure built-in Column expressions
(whole-stage codegen, no Python on the hot path), each with an exact
DuckDB-SQL twin in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
