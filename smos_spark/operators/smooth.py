"""Exponentially-weighted smoothing over per-key time series.

EWMA is the classic streaming smoother (`y_t = (1-α)·y_{t-1} + α·x_t`,
the `adjust=False` recurrence): monitoring dashboards, anomaly
baselines, and label-smoothing features all want it, and it is the one
ubiquitous time-series transform the rest of this package's
window algebra cannot express — the recurrence is inherently
sequential per key, so a RANGE/ROWS frame cannot compute it and a
Python loop per row would be the forbidden slow path.

Spark-first shape (same transport as `compress_series`,
operators/compress.py): repartition on the key, sort within
partitions by (key, ts, ties), and stream Arrow batches through ONE
mapInPandas with group-carry — a group split across batch boundaries
is carried forward, so each processed chunk holds complete groups
and pandas' C-implemented ``groupby().ewm(alpha, adjust=False)``
computes every group in the chunk vectorized (no per-group Python
call, no per-row loop).

Exactness: the pandas recurrence multiplies exactly like DuckDB's
``list_reduce(…, (acc, x) -> acc*(1-α) + x*α)`` — verified bit-equal
on the contract data — so the operator ships an EXACT oracle despite
being float recursion.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ewma"]


def ewma(
    df: DataFrame,
    alpha: float,
    value_col: str = "value",
    key_cols: Sequence[str] = ("conv_id",),
    ts_col: str = "ts",
    tie_cols: Sequence[str] = (),
    out_col: str = "ewma",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-row EWMA of ``value_col`` per key in (ts, *ties) order:
    ``y_1 = x_1``; ``y_t = (1-alpha)·y_{t-1} + alpha·x_t``.

    Rows with NULL ts or NULL value are EXCLUDED (a decay step over a
    missing sample is undefined and engines disagree on NaN handling;
    gap-fill first if the series needs regularization). Output: the
    selected key/ts/tie/value columns plus ``out_col`` (double).
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    keys = list(key_cols)
    ties = list(tie_cols)
    cols = [*keys, ts_col, *ties, value_col]
    src = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(*cols)
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    arranged = src.repartition(n_parts, *keys).sortWithinPartitions(
        *keys, ts_col, *ties
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    ) + f", {out_col} double"

    def _smooth(chunk: pd.DataFrame) -> pd.DataFrame:
        out = chunk.copy()
        out[out_col] = (
            chunk[value_col]
            .astype("float64")
            .groupby([chunk[k] for k in keys], sort=False, dropna=False)
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .reset_index(level=list(range(len(keys))), drop=True)
        )
        return out

    def _stream(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # NULL-safe boundary detection: Arrow maps a nullable
            # numeric key to float64 NaN, and NaN != NaN would split a
            # NULL-keyed series at every row (and silently restart the
            # recursion at a batch boundary) — treat both-missing as
            # equal, matching groupby(dropna=False)
            change = None
            for k in keys:
                col = pdf[k]
                neq = (col != col.shift()) & ~(col.isna() & col.shift().isna())
                change = neq if change is None else (change | neq)
            starts = np.flatnonzero(change.to_numpy())
            starts = np.concatenate(([0], starts[starts > 0]))
            # the last group may continue into the next Arrow batch
            carry = pdf.iloc[starts[-1] :]
            if len(starts) == 1:
                continue
            yield _smooth(pdf.iloc[: starts[-1]])
        if carry is not None and len(carry):
            yield _smooth(carry)

    return arranged.mapInPandas(_stream, schema=schema)
