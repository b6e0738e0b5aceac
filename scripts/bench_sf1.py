"""sf1 headline bench: the 6 most expensive suite entries at 10× the
sf0.1 row counts, with per-trial host-window probes.

Answers the round-4 verdict's item 5: the 100×-scale claim rests on
plan audits plus the 38M-turn scaling runs; this run adds MEASURED
per-entry row-scaling for the heavy candidate-generation operators
(dedup_e2e, sketches, ngram_pairs, minhash_pairs, knn_outliers,
cms_sketch — the bench.py entries, reproduced verbatim but
parameterized by input tables).

Input synthesis (deterministic, no external data): each sf0.1 table is
replicated 10× Spark-side with seeded mutations —
  * documents: copy k gets doc_id += k·5000 and a deterministic tail
    token appended (replicas are NEAR-duplicates of their original:
    the corpus carries a dense true-pair structure, the HARD case for
    minhash/ngram candidate generation — same construction as the
    round-4 §29 10× measurement);
  * embeddings: vec_id += k·2000, label += k·10 (block COUNT scales
    with the corpus, block size stays constant — the realistic ANN
    regime; keeping labels fixed would grow blocked-pair work
    quadratically by design, not by deficiency), one deterministic
    component perturbed;
  * events: event_id += k·100000, user_id += k·1500 (10× users, same
    day span — groups keep their day grain, sketch state bounds
    unchanged by construction).

Protocol (per-trial window probes — the host's deliverable
parallelism swings 2-4× between windows, see BENCH.md "Host reality
check"): for each entry, probe → time at sf0.1 → time at sf1 →
probe. The ratio column is attributable only when the adjacent probes
agree; both are recorded. Writes BENCH_SF1.json at the repo root
(bench.py embeds it into its output when present).

Usage: python scripts/bench_sf1.py [--entries a,b,...] [--scratch DIR]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"


def _cpu_unit(_: int) -> int:
    s = 0
    for i in range(2_000_000):
        s += i * i
    return s


def mini_probe(cores: int = 32) -> float:
    units = max(2 * cores, 16)
    t0 = time.time()
    with mp.Pool(cores) as pool:
        pool.map(_cpu_unit, range(units))
    return round(units / (time.time() - t0), 2)


def synth_sf1(spark, scratch: Path) -> dict:
    """10× each sf0.1 table, deterministic (seed folded into the copy
    index — no RNG)."""
    out = {}
    copies = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("k")

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    d = docs.select("*", copies).select(
        (F.col("doc_id") + F.col("k") * 5000).alias("doc_id"),
        F.when(F.col("k") == 0, F.col("text")).otherwise(
            F.concat_ws(
                " ",
                F.col("text"),
                F.format_string("mut%d", F.col("k")),
                F.sha1(F.concat(F.col("text"), F.col("k").cast("string"))).substr(1, 8),
            )
        ).alias("text"),
        "lang",
        "source",
    )
    d = d.withColumn("n_chars", F.length("text").cast("long"))
    d.repartition(64).write.mode("overwrite").parquet(str(scratch / "documents.parquet"))
    out["documents"] = spark.read.parquet(str(scratch / "documents.parquet")).count()

    embs = spark.read.parquet(f"{SF01}/embeddings.parquet")
    e = embs.select("*", copies).select(
        (F.col("vec_id") + F.col("k") * 2000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x + F.when(i == 0, F.col("k").cast("float") * 0.001).otherwise(
                    F.lit(0.0).cast("float")
                )
            ).cast("float"),
        ).alias("embedding"),
        (F.col("label") + F.col("k") * 10).cast("int").alias("label"),
    )
    e.repartition(64).write.mode("overwrite").parquet(str(scratch / "embeddings.parquet"))
    out["embeddings"] = spark.read.parquet(str(scratch / "embeddings.parquet")).count()

    ev = spark.read.parquet(f"{SF01}/events.parquet")
    v = ev.select("*", copies).select(
        (F.col("event_id") + F.col("k") * 100000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("k") * 1500).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    v.repartition(64).write.mode("overwrite").parquet(str(scratch / "events.parquet"))
    out["events"] = spark.read.parquet(str(scratch / "events.parquet")).count()
    return out


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def make_queries(spark, sf_dir: str):
    """The 6 heavy bench.py entries, verbatim semantics, over sf_dir."""
    from smos_spark.operators.dedup import (
        dedup_apply,
        dedup_exact,
        minhash_dedup_pairs,
        near_dup_components,
        ngram_jaccard_pairs,
    )
    from smos_spark.operators.similarity import centroid_outliers, knn_graph
    from smos_spark.operators.sketch import (
        bloom_decontaminate,
        bottomk_merge,
        bottomk_quantiles,
        bottomk_sample,
        cms_build,
        cms_estimate,
        cms_merge,
        kmv_distinct,
        kmv_merge,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(64).cache()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(64).cache()
    docs.count(), embs.count()

    def q_minhash_pairs():
        _force(minhash_dedup_pairs(docs, threshold=0.7, portable=False))

    def q_dedup_e2e():
        pairs = minhash_dedup_pairs(docs, threshold=0.7, portable=False)
        comp = near_dup_components(pairs)
        drop = comp.where(~F.col("keep")).select("doc_id")
        _force(dedup_apply(docs).join(drop, "doc_id", "left_anti"))

    def q_ngram_pairs():
        _force(ngram_jaccard_pairs(docs, threshold=0.8, block_col="lang"))

    def q_knn_outliers():
        _force(knn_graph(embs, k=5, block_col="label", portable=False))
        _force(centroid_outliers(embs, threshold_ppm=0))

    def q_sketches():
        evd = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "day", F.date_trunc("day", "ts")
        )
        daily = kmv_distinct(
            evd, key="user_id", group_cols=["day"], k=64, keep_hashes=True
        )
        _force(
            kmv_merge(
                daily.withColumn("week", F.date_trunc("week", "day")).select(
                    "week", "kmv_hashes"
                ),
                ["week"],
                k=64,
            )
        )
        _force(
            bloom_decontaminate(
                docs.where(F.col("doc_id") % 41 != 0),
                docs.where(F.col("doc_id") % 41 == 0),
                n=4,
            )
        )
        bk = bottomk_sample(
            evd, key="event_id", value="value", group_cols=["day"], k=64
        )
        _force(
            bottomk_quantiles(
                bottomk_merge(
                    bk.withColumn("week", F.date_trunc("week", "day")).select(
                        "week", "bk_sample", "n_rows"
                    ),
                    ["week"],
                    k=64,
                ),
                [0.5, 0.9, 0.99],
            )
        )

    def q_cms_sketch():
        evd = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "day", F.date_trunc("day", "ts")
        )
        daily = cms_build(evd, key="user_id", group_cols=["day"], width=256, depth=4)
        weekly = cms_merge(
            daily.withColumn("week", F.date_trunc("week", "day")).select(
                "week", "cms"
            ),
            ["week"],
        )
        _force(
            cms_estimate(
                weekly, keys=list(range(32)), key_name="user_id", width=256, depth=4
            )
        )

    _ = dedup_exact  # parity with bench.py imports
    return {
        "minhash_pairs": q_minhash_pairs,
        "dedup_e2e": q_dedup_e2e,
        "ngram_pairs": q_ngram_pairs,
        "knn_outliers": q_knn_outliers,
        "sketches": q_sketches,
        "cms_sketch": q_cms_sketch,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", default="")
    ap.add_argument("--scratch", default="/tmp/smos_sf1")
    ap.add_argument("--out", default=str(REPO / "BENCH_SF1.json"))
    args = ap.parse_args()

    from smos_spark.session import get_spark

    spark = get_spark(app_name="smos_bench_sf1")
    spark.sparkContext.setLogLevel("WARN")

    scratch = Path(args.scratch)
    scratch.mkdir(parents=True, exist_ok=True)
    rows = synth_sf1(spark, scratch)
    print("sf1 rows:", rows, file=sys.stderr)

    q01 = make_queries(spark, SF01)
    q1 = make_queries(spark, str(scratch))
    names = [n for n in q01 if not args.entries or n in args.entries.split(",")]

    results: dict[str, dict] = {}
    for name in names:
        # warm BOTH inputs outside the timing (codegen, Arrow pools,
        # parquet footers) so neither side carries cold-start skew
        q01[name]()
        q1[name]()
        p0 = mini_probe()
        t0 = time.time()
        q01[name]()
        t_sf01 = round(time.time() - t0, 2)
        t0 = time.time()
        q1[name]()
        t_sf1 = round(time.time() - t0, 2)
        p1 = mini_probe()
        results[name] = {
            "sf0.1_s": t_sf01,
            "sf1_s": t_sf1,
            "time_ratio_10x_rows": round(t_sf1 / t_sf01, 2),
            "window_probe_before": p0,
            "window_probe_after": p1,
        }
        print(f"{name}: sf0.1={t_sf01}s sf1={t_sf1}s "
              f"ratio={results[name]['time_ratio_10x_rows']}x "
              f"probes={p0}/{p1}", file=sys.stderr)

    out = {
        "protocol": "per-entry adjacent window probes; one warmed trial per SF; "
                    "10x rows sf0.1->sf1 (synth_sf1, deterministic)",
        "rows": rows,
        "entries": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
