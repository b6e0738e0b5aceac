"""Persisted ANN index — K3-for-vectors.

The reference's central lesson is that the expensive part of a
time-series workload is the LAYOUT, done once: the reshuffle writes
cell files so every later read touches exactly one cell
(/root/reference/docs/img2ts.rst:8-16,
/root/reference/src/smos/smos_ic/reshuffle_ic.py:85-91). This module
applies the same lifecycle to vectors: `build_ann_index` writes the
embedding table PARTITIONED BY its coarse cell (IVF centroid cell or
LSH hyperplane bucket) plus a tiny JSON sidecar holding the probe
structure (centroids / planes). A top-k query then

  1. ranks cells on the DRIVER against the sidecar (k×d floats — no
     Spark job at all), and
  2. scans ONLY the probed partition directories (Catalyst partition
     pruning on the literal IN-list).

At 100 TB that is the difference between a full scan per query and
reading ~n_probe/n_cells of the data. Contrast with the in-line
`similarity.ivf_topk`/`lsh_topk`, which recompute the coarse structure
per call — correct, but the wrong lifecycle at scale.

Layout:
    root/
      vectors/cell=K/part-*.parquet   (key, vec_col) rows, one dir per cell
      index.json                      {strategy, dim, params, centroids|planes}
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smos_spark.operators.similarity import (
    _hyperplanes,
    _lit_array,
    _lsh_bucket_udf,
    ivf_centroids,
    kmeans_assign,
)
from smos_spark.operators.dedup import cosine

__all__ = ["build_ann_index", "AnnIndex"]


def build_ann_index(
    df: DataFrame,
    root: str | Path,
    strategy: str = "ivf",
    cell_col: str | None = None,
    n_cells: int = 16,
    n_iters: int = 2,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> "AnnIndex":
    """One pass over the vectors → cell-partitioned table + sidecar.

    strategy='ivf': cells from `cell_col` if given (precomputed
    labels), else deterministic k-means-lite; centroids are quantized
    exact means (order-independent — see similarity.ivf_centroids).
    strategy='lsh': cells are hyperplane buckets (Arrow-batched BLAS
    kernel, one matrix product per batch); planes go to the sidecar.
    """
    root = Path(root)
    dim = len(df.select(vec_col).limit(1).collect()[0][0])
    meta: dict = {
        "strategy": strategy,
        "dim": dim,
        "key": key,
        "vec_col": vec_col,
        "seed": seed,
    }
    if strategy == "ivf":
        if cell_col is None:
            assigned = kmeans_assign(
                df, k=n_cells, n_iters=n_iters, vec_col=vec_col, key=key,
                seed=seed, cell_col="cell",
            )
        else:
            assigned = df.withColumn("cell", F.col(cell_col))
        cent = ivf_centroids(assigned, "cell", vec_col, dim=dim).collect()
        # list of [cell, centroid] pairs — JSON keeps the cell's type
        # (int labels stay ints, matching the partition column type)
        meta["centroids"] = sorted(
            ([r["cell"], list(r["centroid"])] for r in cent), key=lambda p: str(p[0])
        )
    elif strategy == "lsh":
        # 2^n_planes cell= partition directories: n_planes=20 would
        # silently write ~1M tiny partitions (driver + filesystem
        # blowup) — guarded the same way ngram_jaccard_pairs guards
        # its O(n²) edge
        if n_planes > 16:
            raise ValueError(
                f"build_ann_index(strategy='lsh', n_planes={n_planes}) would "
                f"create 2^{n_planes} = {1 << n_planes} partition directories; "
                "use n_planes <= 16 (or IVF cells, which bound the partition "
                "count at n_cells)"
            )
        planes = _hyperplanes(dim, n_planes, seed)
        assigned = df.withColumn("cell", _lsh_bucket_udf(planes)(F.col(vec_col)))
        meta["n_planes"] = n_planes
        meta["planes"] = planes.tolist()
    else:
        raise ValueError(f"unknown strategy: {strategy}")

    (
        assigned.select(key, vec_col, "cell")
        .repartition("cell")
        .sortWithinPartitions("cell", key)
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(str(root / "vectors"))
    )
    tmp = root / "index.json.tmp"
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, root / "index.json")  # atomic: readers never see a torn sidecar
    return AnnIndex(root, meta)


class AnnIndex:
    def __init__(self, root: str | Path, meta: dict):
        self.root = Path(root)
        self.meta = meta

    @classmethod
    def open(cls, root: str | Path) -> "AnnIndex":
        root = Path(root)
        return cls(root, json.loads((root / "index.json").read_text()))

    @property
    def vectors_path(self) -> str:
        return str(self.root / "vectors")

    def _probe_cells(
        self,
        qv: np.ndarray,
        n_probe: int,
        multiprobe_hamming: int,
        stored_bucket: int | None = None,
    ):
        """Rank cells against the sidecar on the driver — no Spark job.

        For LSH, prefer `stored_bucket` (the query row's own partition
        value from the index, produced by the SAME kernel pass that
        bucketed the data) — a driver-side recomputation uses a
        different BLAS shape whose float fold could flip a
        near-zero-projection sign. The driver fallback only runs for
        out-of-index query vectors. The IVF ranking uses the engine's
        exact formula (round(dot/(|a||b|), 6), ties → cell asc)."""
        if self.meta["strategy"] == "ivf":
            pairs = self.meta["centroids"]
            cells = [p[0] for p in pairs]
            cen = np.array([p[1] for p in pairs], dtype=np.float64)
            dots = cen @ qv
            denom = np.linalg.norm(cen, axis=1) * np.linalg.norm(qv)
            sims = np.round(
                np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0), 0.0), 6
            )
            order = sorted(range(len(cells)), key=lambda i: (-sims[i], cells[i]))
            return [cells[i] for i in order[:n_probe]]
        if stored_bucket is not None:
            qb = int(stored_bucket)
        else:
            planes = np.array(self.meta["planes"], dtype=np.float64)
            qb = int(((planes @ qv > 0) * (1 << np.arange(len(planes)))).sum())
        n_planes = self.meta["n_planes"]
        probe = {qb}
        if multiprobe_hamming >= 1:
            probe |= {qb ^ (1 << j) for j in range(n_planes)}
        return sorted(probe)

    def topk(
        self,
        spark: SparkSession,
        query_vec=None,
        query_id=None,
        k: int = 10,
        n_probe: int = 3,
        multiprobe_hamming: int = 1,
    ) -> DataFrame:
        """Partition-pruned top-k: the scan touches only the probed
        cell= directories (literal IN-list on the partition column)."""
        key, vec_col = self.meta["key"], self.meta["vec_col"]
        vectors = spark.read.parquet(self.vectors_path)
        stored_bucket = None
        if query_vec is None:
            if query_id is None:
                raise ValueError("pass query_vec or query_id")
            # id lookup costs one scan of the index table; prefer
            # query_vec when the caller already holds the vector. The
            # row's own cell rides along so LSH probing reuses the
            # index's bucketing verbatim.
            row = (
                vectors.where(F.col(key) == query_id).select(vec_col, "cell").collect()
            )
            if not row:
                raise KeyError(f"{key}={query_id} not in index")
            query_vec = row[0][0]
            if self.meta["strategy"] == "lsh":
                stored_bucket = row[0][1]
        qv = np.asarray(query_vec, dtype=np.float64)
        probe = self._probe_cells(qv, n_probe, multiprobe_hamming, stored_bucket)
        q = _lit_array(qv)
        scored = vectors.where(F.col("cell").isin(probe))
        if query_id is not None:
            scored = scored.where(F.col(key) != query_id)
        scored = scored.select(
            F.col(key),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
        )
        return scored.orderBy(F.desc("cos_sim"), F.asc(key)).limit(k)

    def n_cells_on_disk(self) -> int:
        return len(list(Path(self.vectors_path).glob("cell=*")))
