"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design:
* exact     — one shuffle on the content hash; map-side combine.
* minhash   — shingle→signature is a scan-side expression; LSH banding
              turns O(n²) into per-band groupBys (shuffle keyed by
              band hash, AQE handles bucket skew); only candidate
              pairs get the exact Jaccard verify.
* simhash   — signature scan-side; near-dup via banding on signature
              chunks, verify with bit_count(xor) ≤ d.
* embedding — blocked cross join (block key = label/LSH bucket) with
              vectorized cosine; never an unblocked cross join.

All hashes use the portable md5-based hash64 (functions.texthash) so
each operator has an exact DuckDB oracle at sf0.01.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smos_spark.functions.texthash import (
    fast_hash64,
    hash_params,
    md5_hash64,
    universal_hash,
)

_CACHE_RING: list = []


def _release_later(df, keep: int = 2) -> None:
    """Bounded lifetime for operator-internal persisted plans: keep the
    most recent `keep` cached frames alive (covering the returned
    plan's execution), unpersist older ones. Deterministic — no GC
    timing — so repeated calls in a long-lived session cannot
    accumulate executor storage; evicting a frame that some stale
    un-executed plan still references only costs recomputation."""
    import contextlib

    _CACHE_RING.append(df)
    while len(_CACHE_RING) > keep:
        old = _CACHE_RING.pop(0)
        with contextlib.suppress(Exception):  # session may be gone
            old.unpersist(False)


__all__ = [
    "dedup_exact",
    "char_shingles",
    "minhash_signature",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "embedding_near_dup",
    "near_dup_components",
    "dedup_apply",
]


# ---------------------------------------------------------------- exact
def dedup_exact(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Exact dedup: one survivor (min key) per distinct content hash.
    Returns (content_hash, keep_id, n_dupes)."""
    return (
        df.where(F.col(text_col).isNotNull())
        .groupBy(md5_hash64(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(key).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


# -------------------------------------------------------------- minhash
def _hashed_shingles_udf(k: int):
    """Arrow-batched shingle hasher: text → array<long> of DISTINCT
    rolling-hashed k-byte shingles. Fully vectorized per document
    (sliding_window_view + wrapping uint64 polynomial hash + finalizer)
    — replaces ~2000 interpreted Catalyst substr+hash calls per doc.
    Fast-path only (no DuckDB twin; the portable md5 path keeps one)."""
    from pyspark.sql.functions import pandas_udf

    P = np.uint64(1099511628211)  # FNV prime as polynomial base
    powers = P ** np.arange(k - 1, -1, -1, dtype=np.uint64)

    def _hash_doc(s: str):
        b = np.frombuffer(s.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        if len(b) < k:
            w = np.zeros((1, k), dtype=np.uint64)
            w[0, : len(b)] = b
        else:
            w = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        h = (w * powers).sum(axis=1, dtype=np.uint64)
        # splitmix-style avalanche so sequential shingles spread
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return np.unique(h).view(np.int64)

    @pandas_udf("array<long>")
    def _sh(texts: pd.Series) -> pd.Series:
        return texts.map(lambda s: None if s is None else _hash_doc(s))

    return _sh


def _minhash_from_hashes_udf(n_hashes: int, seed: int):
    """Arrow-batched signature kernel: array<long> shingle hashes →
    array<long> signature. All 32 universal hashes × all shingles of a
    batch in one (n_hashes, N) numpy broadcast + segment-min."""
    from pyspark.sql.functions import pandas_udf

    from smos_spark.functions.texthash import MERSENNE_P

    params = np.array(hash_params(n_hashes, seed), dtype=np.int64)  # (n, 2)
    a = params[:, 0:1]  # (n, 1)
    b = params[:, 1:2]

    @pandas_udf("array<long>")
    def _sig(hashes: pd.Series) -> pd.Series:
        lengths = hashes.map(lambda h: 0 if h is None else len(h)).to_numpy()
        if lengths.sum() == 0:
            return pd.Series([[] for _ in range(len(hashes))])
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in hashes if h is not None and len(h)]
        )
        hp = flat % MERSENNE_P  # pmod: result sign follows divisor
        hp[hp < 0] += MERSENNE_P
        all_h = (a * hp[None, :] + b) % MERSENNE_P  # (n_hashes, N)
        starts = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        out = []
        for row, (s, ln) in enumerate(zip(starts, lengths)):
            if ln == 0:
                out.append([])
            else:
                out.append(all_h[:, s : s + ln].min(axis=1).tolist())
        return pd.Series(out)

    return _sig


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct k-char shingles (whole short text = single shingle)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(k))))


def minhash_signature(
    col: Column, n_hashes: int = 32, k: int = 5, seed: int = 42, portable: bool = True
) -> Column:
    """MinHash signature: per hash function, min over shingle hashes.
    Pure array expressions — computed during the scan, no shuffle.
    portable=True hashes shingles with the md5-based hash64 (exact
    DuckDB twin); portable=False uses xxhash64 — ~10× cheaper, the
    100 TB hot path."""
    if not portable:
        # hot path: numpy rolling-hash shingling + the n-way
        # universal-hash min, both Arrow-batched (Catalyst higher-order
        # lambdas are interpreted per element — 2000 substr calls and
        # 32 transforms per doc dominate runtime at scale).
        return _signature_from_shingles(_hashed_shingles_udf(k)(col), n_hashes, seed, False)
    return _signature_from_shingles(char_shingles(col, k), n_hashes, seed, True)


def _signature_from_shingles(
    sh_col: Column, n_hashes: int, seed: int, portable: bool
) -> Column:
    """Signature from an existing shingle column (string shingles for
    the portable path, pre-hashed longs for the fast path) — lets
    callers that also need the shingles compute them once."""
    if not portable:
        return _minhash_from_hashes_udf(n_hashes, seed)(sh_col)
    shingle_hashes = F.transform(sh_col, md5_hash64)

    def _uh(a: int, b: int):
        return lambda h: universal_hash(h, a, b)

    sig = [
        F.array_min(F.transform(shingle_hashes, _uh(a, b)))
        for a, b in hash_params(n_hashes, seed)
    ]
    return F.array(*sig)


def lsh_candidate_pairs(
    df: DataFrame,
    key: str = "doc_id",
    sig_col: str = "sig",
    bands: int = 8,
) -> DataFrame:
    """Band the signature, group by (band_idx, band_hash), emit
    candidate pairs (a < b). The groupBy is the only shuffle; the
    self-join happens inside buckets only."""
    banded = df.select(
        F.col(key),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(
                    F.col(sig_col),
                    b * (F.size(sig_col) / bands).cast("int") + 1,
                    (F.size(sig_col) / bands).cast("int"),
                ),
            )
        ).alias("band_idx", "band"),
    ).select(key, "band_idx", F.xxhash64(F.col("band").cast("string")).alias("bh"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{key}") < F.col(f"r.{key}")),
        )
        .select(F.col(f"l.{key}").alias("id_a"), F.col(f"r.{key}").alias("id_b"))
        .distinct()
    )


def exact_jaccard(sh_a: Column, sh_b: Column, round_to: int = 6) -> Column:
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(F.array_union(sh_a, sh_b)).cast("double")
    return F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), round_to)


def _jaccard_longs_udf(round_to: int = 6):
    """Vectorized Jaccard over pre-hashed DISTINCT SORTED long-array
    shingles (np.unique output) — `array_intersect` is an interpreted
    per-element HOF; np.intersect1d(assume_unique) is ~10× cheaper."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _j(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a))
        for i, (x, y) in enumerate(zip(a, b)):
            x = np.asarray(x, dtype=np.int64)
            y = np.asarray(y, dtype=np.int64)
            ni = np.intersect1d(x, y, assume_unique=True).size
            nu = x.size + y.size - ni
            out[i] = round(ni / nu, round_to) if nu else 0.0
        return pd.Series(out)

    return _j


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    portable: bool = True,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signature → banded candidate
    pairs → exact shingle-Jaccard verify ≥ threshold.
    Returns (id_a, id_b, jaccard).

    The signature/shingle base is persisted while the plan is built:
    it feeds three consumers (banding + both verify sides) and
    recomputing the per-shingle hash cascade 3× dominates runtime
    otherwise. Cache lifetime is bounded by `_release_later`: the two
    most recent bases stay cached (covering the returned plan's
    execution), older ones are unpersisted — repeated calls in a
    long-lived session cannot accumulate executor storage. Fast path
    (portable=False) shingles+hashes in numpy and verifies Jaccard on
    long arrays — ~5× cheaper than string-array intersection."""
    if portable:
        sh = char_shingles(F.col(text_col), k)
    else:
        sh = _hashed_shingles_udf(k)(F.col(text_col))
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(key), sh.alias("_sh"))
        .select(
            key,
            "_sh",
            _signature_from_shingles(F.col("_sh"), n_hashes, seed, portable).alias("sig"),
        )
        .persist()
    )
    cand = lsh_candidate_pairs(base, key=key, sig_col="sig", bands=bands)
    a = base.select(F.col(key).alias("id_a"), F.col("_sh").alias("sh_a"))
    b = base.select(F.col(key).alias("id_b"), F.col("_sh").alias("sh_b"))
    jac = (
        _jaccard_longs_udf()(F.col("sh_a"), F.col("sh_b"))
        if not portable
        else exact_jaccard("sh_a", "sh_b")
    )
    _release_later(base)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------- n-gram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    allow_unblocked: bool = False,
) -> DataFrame:
    """Word n-gram Jaccard similarity via EXACT prefix filtering.

    Candidate pairs come from a prefix-filtered inverted-index join
    (Chaudhuri et al. ICDE'06 SSJoin; Bayardo et al. WWW'07 "Scaling
    up all pairs similarity search"), then each candidate is verified
    with the exact Jaccard on the full gram arrays — the output is
    IDENTICAL to the all-pairs form, but the quadratic term shrinks to
    pairs sharing a rare prefix gram:

      * grams are globally ordered by (document frequency, gram) —
        rarest first — inside each block;
      * a doc with s grams indexes only its first
        ``s - ceil(threshold*s) + 1`` grams (any J >= t pair must
        share at least one gram in both prefixes, so recall is exact);
      * candidates = prefix-gram equi-join, verified on the arrays.

    Per-doc work is O(|grams|); the join is driven by rare grams, so a
    hot boilerplate gram lands in nobody's prefix and never fans out.
    A block column (lang/source/length bucket) still bounds the index;
    without one the prefix index is global, which is correct but can
    still concentrate shuffle on one index — RAISES unless the caller
    passes allow_unblocked=True (tiny/test data only)."""
    if block_col is None and not allow_unblocked:
        raise ValueError(
            "ngram_jaccard_pairs without block_col builds one global "
            "prefix index; pass block_col=... or allow_unblocked=True "
            "for small data"
        )
    if not 0 < threshold <= 1:
        # the prefix-filter theorem needs t > 0 (at t=0 EVERY pair
        # qualifies — including gram-disjoint ones that share no
        # candidate gram); "all pairs regardless of similarity" is a
        # cross join, not a similarity join. t > 1 is unsatisfiable
        # (Jaccard <= 1) and would compute a zero/negative prefix
        # length — a confusing slice error instead of this message
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # tokenize behind a projection boundary: `_t` is referenced from
    # inside the transform() lambda, and an inlined split() would
    # re-evaluate per element — O(len^2) per doc (see
    # text.ngram_decontaminate for the measured version of this trap)
    extra = [F.col(block_col)] if block_col else []
    toked = df.where(F.col(text_col).isNotNull()).select(
        F.col(key),
        F.split(F.lower(F.col(text_col)), "\\s+").alias("_t"),
        *extra,
    )
    tc = F.col("_t")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(tc) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(tc, i + 1, n)),
        )
    )
    base = toked.select(F.col(key), grams.alias("_g"), *extra).persist()
    block = [block_col] if block_col else []

    # --- candidate generation: df-ordered prefix index ---
    ex = base.select(F.col(key), *extra, F.explode("_g").alias("_gram"))
    dfreq = ex.groupBy("_gram", *block).agg(F.count(F.lit(1)).alias("_df"))
    ranked = ex.join(dfreq, ["_gram", *block]).groupBy(F.col(key), *extra).agg(
        F.array_sort(F.collect_list(F.struct("_df", "_gram"))).alias("_r")
    )
    # prefix length s - ceil(t*s) + 1 as floor((1-t)*s + eps) + 1: the
    # epsilon absorbs float slop BELOW an exact integer boundary and
    # can only ENLARGE the prefix, so exact recall is never at risk
    plen = (
        F.floor(F.size("_r") * F.lit(1.0 - threshold) + F.lit(1e-6)) + 1
    ).cast("int")
    prefix = ranked.select(
        F.col(key),
        *extra,
        F.explode(F.slice("_r", F.lit(1), plen)).alias("_s"),
    ).select(F.col(key), *extra, F.col("_s._gram").alias("_pg"))
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            [F.col("a._pg") == F.col("b._pg")]
            + [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block]
            + [F.col(f"a.{key}") < F.col(f"b.{key}")],
        )
        .select(
            F.col(f"a.{key}").alias("id_a"), F.col(f"b.{key}").alias("id_b")
        )
        .distinct()
    )

    # --- exact verify on the cached gram arrays (candidates only) ---
    ga = base.select(F.col(key).alias("id_a"), F.col("_g").alias("_ga"))
    gb = base.select(F.col(key).alias("id_b"), F.col("_g").alias("_gb"))
    _release_later(base)
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            exact_jaccard(F.col("_ga"), F.col("_gb")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------- simhash
def simhash_votes_batch(arrs: list, out: np.ndarray,
                        max_flat: int = 1 << 18) -> None:
    """Segmented SimHash vote for one Arrow batch, no per-row Python:
    flatten every row's token hashes into one (Σn,) array, build the
    (Σn × 64) bit matrix once, and collapse it to per-row bit sums with
    a single ``np.add.reduceat`` over the row boundaries. Writes int64
    signatures (two's-complement view of the uint64 bit pack) into
    ``out`` at the rows with ≥1 hash; empty/None rows stay 0."""
    shifts = np.arange(64, dtype=np.uint64)
    lengths = np.fromiter(
        (0 if a is None else len(a) for a in arrs), dtype=np.int64, count=len(arrs)
    )
    nz = np.flatnonzero(lengths)
    if not nz.size:
        return
    seg_lens = lengths[nz]
    # bound the (Σn × 64) bit-matrix transient: process row slices whose
    # flattened hash count stays ≤ 2^18 (≈128 MB peak) regardless of the
    # Arrow batch size — a 65536-row batch of long docs would otherwise
    # allocate tens of GB in one shot. Slices align to row boundaries,
    # so per-row votes are identical to the unsliced computation.
    cum = np.cumsum(seg_lens)
    start = 0
    while start < len(nz):
        base = int(cum[start - 1]) if start else 0
        end = int(np.searchsorted(cum, base + max_flat, side="right"))
        end = max(end, start + 1)  # a single over-long row still processes
        idx = nz[start:end]
        lens = seg_lens[start:end]
        flat = np.concatenate(
            [np.asarray(arrs[i], dtype=np.int64) for i in idx]
        ).view(np.uint64)
        bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        boundaries = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sums = np.add.reduceat(bits, boundaries, axis=0)  # (rows, 64)
        votes = 2 * sums - lens[:, None]
        sig = ((votes > 0).astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
        out[idx] = sig.view(np.int64)
        start = end


def _simhash_from_hashes_udf():
    """Arrow-batched SimHash kernel: array<long> token hashes → long
    signature. The whole batch collapses through one segmented
    reduceat vote (simhash_votes_batch) — no per-row Python loop, vs
    64 interpreted aggregate() folds per doc in the expression path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sh(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        if len(hashes):
            simhash_votes_batch(list(hashes), out)
        return pd.Series(out)

    return _sh


def simhash(col: Column, nbits: int = 64, portable: bool = True) -> Column:
    """64-bit SimHash from whitespace tokens: per bit, sign of Σ±1 over
    token hashes → bit. portable=True folds with built-in aggregate()
    expressions (deterministic md5 basis); portable=False hashes tokens
    with xxhash64 and collapses the bit matrix in numpy (hot path)."""
    toks = F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+"), 0)
    if not portable:
        return _simhash_from_hashes_udf()(F.transform(toks, fast_hash64))
    th = F.transform(toks, md5_hash64)

    def _bitfold(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = [
        F.when(F.aggregate(th, F.lit(0), _bitfold(j)) > 0, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias(f"b{j}")
        for j in range(nbits)
    ]
    sig = F.lit(0).cast("long")
    for j, b in enumerate(bits):
        sig = sig + F.shiftleft(b, j)
    return sig


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    max_hamming: int = 3,
    n_chunks: int = 4,
    portable: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into
    n_chunks 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical
    chunk), bucket-join on chunks, verify bit_count(xor) ≤ max_hamming."""
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(key), simhash(F.col(text_col), portable=portable).alias("sh")
    )
    width = 64 // n_chunks
    mask = (1 << width) - 1
    chunked = base.select(
        key,
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), i * width).bitwiseAND(F.lit(mask))
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .select(
            F.col(f"a.{key}").alias("id_a"),
            F.col(f"b.{key}").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)


# ----------------------------------------------------------- components
def near_dup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph → the "keep one
    survivor per duplicate cluster" step of a training-data dedup
    pipeline. Returns (doc_id, component, keep) for every id appearing
    in `pairs`; component = min id reachable; keep = (doc_id == component).

    Min-label propagation with pointer jumping: per round every node
    takes the min of (its label, its neighbors' labels, its label's
    label). The neighbor step moves information one hop; the pointer
    jump (comp := comp(comp)) halves remaining chain depth, so
    convergence is O(log diameter) rounds — max_iters=25 covers any
    graph that fits in storage. Two joins + one groupBy shuffle per
    round, labels never leave the cluster; convergence is checked
    with a single-row aggregate. Raises on non-convergence instead of
    silently splitting clusters. Pass `stats={}` to receive
    {'rounds': n} — the convergence round count."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    # each round references the previous labels THREE times (neighbor
    # join, pointer jump, change flag) — without lineage truncation the
    # logical plan grows exponentially and the analyzer OOMs around
    # round ~7. localCheckpoint materializes the round and flattens
    # the plan; superseded round blocks are freed by the ContextCleaner
    # when their RDDs go out of scope.
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = 1
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.select("node", F.col("comp").alias("_old"))
            .join(nbr_min, F.col("node") == nbr_min.src, "left")
            .select(
                "node",
                "_old",
                F.least(
                    F.col("_old"), F.coalesce(F.col("nbr_comp"), F.col("_old"))
                ).alias("_c1"),
            )
        )
        jump = labels.select(
            F.col("node").alias("_pn"), F.col("comp").alias("_pc")
        )
        new_labels = (
            stepped.join(jump, stepped._c1 == jump._pn, "left")
            .select(
                "node",
                F.least(F.col("_c1"), F.coalesce(F.col("_pc"), F.col("_c1"))).alias(
                    "comp"
                ),
                (
                    F.least(F.col("_c1"), F.coalesce(F.col("_pc"), F.col("_c1")))
                    < F.col("_old")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(
            F.count(F.when(F.col("_changed"), 1)).alias("n")
        ).collect()[0].n
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        edges.unpersist(False)
        raise RuntimeError(
            f"near_dup_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing) — a duplicate chain longer "
            "than max_iters would silently split clusters; raise max_iters"
        )
    edges.unpersist(False)
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("component"),
        (F.col("node") == F.col("comp")).alias("keep"),
    )


# ------------------------------------------------------------ embedding
def _lsh_band_sigs_udf(n_bands: int, band_width: int, dim: int, seed: int):
    """Arrow-batched banded hyperplane signatures: one BLAS product of
    the batch against all n_bands×band_width planes, then per-band
    sign-bit buckets → array<long> of n_bands bucket ids."""
    from pyspark.sql.functions import pandas_udf

    from smos_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_bands * band_width, seed)
    weights = (np.int64(1) << np.arange(band_width, dtype=np.int64))

    @pandas_udf("array<long>")
    def _sigs(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        bits = (m @ planes.T) > 0  # (n, n_bands*band_width)
        buckets = (bits.reshape(len(m), n_bands, band_width) * weights).sum(axis=2)
        return pd.Series(list(buckets))

    return _sigs


def _lsh_banded_candidates(
    df: DataFrame,
    vec_col: str,
    key: str,
    n_bands: int,
    band_width: int,
    seed: int,
) -> DataFrame:
    """Candidate pairs sharing ≥1 (band_idx, bucket) — the embedding
    twin of minhash's lsh_candidate_pairs: one keyed shuffle on the
    band hash, self-join inside buckets only, never all-pairs."""
    dim = len(df.select(vec_col).limit(1).collect()[0][0])
    banded = df.select(
        F.col(key),
        F.posexplode(
            _lsh_band_sigs_udf(n_bands, band_width, dim, seed)(F.col(vec_col))
        ).alias("band_idx", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .select(F.col(f"a.{key}").alias("id_a"), F.col(f"b.{key}").alias("id_b"))
        .distinct()
    )


def cosine(a: Column, b: Column, round_to: int | None = 6) -> Column:
    """Cosine similarity of two float arrays via zip_with/aggregate —
    JVM-side, no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    c = F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
    return F.round(c, round_to) if round_to is not None else c


def _cosine_pairs_udf(round_to: int = 6):
    """Arrow-batched pairwise cosine: stacks a batch of vector pairs
    into two matrices and does the whole batch with BLAS row ops —
    the zip_with/aggregate expression path is interpreted per element."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _c(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        denom = na * nb
        sims = np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0), 0.0)
        return pd.Series(np.round(sims, round_to))

    return _c


def embedding_near_dup(
    df: DataFrame,
    vec_col: str = "embedding",
    key: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.95,
    portable: bool = True,
    n_bands: int = 12,
    band_width: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vectors: blocked pairwise cosine ≥ threshold.
    Block by a coarse key (a label when one exists) so the join is
    bucket-local, never all-pairs. With block_col=None candidates come
    from BANDED hyperplane LSH (n_bands independent signatures of
    band_width planes each — the minhash-banding shape): a pair is a
    candidate if it agrees on ALL planes of ≥1 band, giving recall
    1-(1-pᵂ)ᴮ where p = 1-θ/π; the defaults hold ≥0.95 down to
    cosine ≈ 0.35. Each candidate is then cosine-verified, so
    precision is exact. portable=False scores candidate pairs with
    the Arrow-batched BLAS kernel (hot path)."""
    if block_col is None:
        cands = _lsh_banded_candidates(
            df, vec_col=vec_col, key=key,
            n_bands=n_bands, band_width=band_width, seed=seed,
        )
        vecs_a = df.select(
            F.col(key).alias("id_a"),
            F.col(vec_col).cast("array<double>").alias("_va"),
        )
        vecs_b = df.select(
            F.col(key).alias("id_b"),
            F.col(vec_col).cast("array<double>").alias("_vb"),
        )
        score = (
            cosine(F.col("_va"), F.col("_vb"))
            if portable
            else _cosine_pairs_udf()(F.col("_va"), F.col("_vb"))
        )
        return (
            cands.join(vecs_a, "id_a")
            .join(vecs_b, "id_b")
            .select("id_a", "id_b", score.alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold)
        )
    cols = [F.col(key), F.col(vec_col).cast("array<double>").alias("_v")]
    if block_col:
        cols.append(F.col(block_col))
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{key}") < F.col(f"b.{key}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    score = (
        cosine(F.col("a._v"), F.col("b._v"))
        if portable
        else _cosine_pairs_udf()(F.col("a._v"), F.col("b._v"))
    )
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{key}").alias("id_a"),
            F.col(f"b.{key}").alias("id_b"),
            score.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def dedup_apply(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Materialize the deduplicated corpus: keep exactly the min-key
    survivor of every distinct content hash (plus rows with NULL text,
    which have no content to deduplicate on).

    Scale strategy: the survivor set has one row per DISTINCT document
    — at corpus scale that is billions of rows, NOT broadcastable, so
    no broadcast hint is forced. The corpus joins the aggregated
    survivors on `content_hash`: the aggregation's output is already
    hash-partitioned by content_hash, so only the corpus side
    shuffles (one Exchange, same key as the dedup groupBy), and AQE
    is free to downgrade to a broadcast when the survivor set
    actually is small. `keep_id == key` then picks the single
    survivor row of each hash group."""
    keep = dedup_exact(df, text_col=text_col, key=key).select("content_hash", "keep_id")
    hashed = df.where(F.col(text_col).isNotNull()).withColumn(
        "_ch", md5_hash64(F.col(text_col))
    )
    # Join on content_hash ALONE: the aggregation's output is already
    # hash-partitioned on it, so the survivor side joins without a
    # second Exchange (a composite (hash, keep_id) condition would
    # re-shuffle the O(distinct-docs) frame). content_hash is unique
    # in `keep`, so the join never fans out; the keep_id filter then
    # selects the one survivor row of each hash group.
    survivors = (
        hashed.join(keep, hashed["_ch"] == keep["content_hash"])
        .where(hashed[key] == keep["keep_id"])
        .select(*df.columns)
    )
    return survivors.unionByName(df.where(F.col(text_col).isNull()))
