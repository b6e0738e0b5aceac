"""Compressed per-conversation series blocks.

The reference persists each grid point's series inside a zlib-chunked
cell file (/root/reference/src/smos/interface.py:341,376 — zlib
complevel 6, chunksize 1000). Our engine's analog stores one compressed
block row per (conv_id, value column): delta-of-delta timestamps +
Gorilla XOR values (smos_spark.functions.codecs), produced by a
grouped-map Arrow kernel.

Scale: one shuffle on conv_id (same partitioning the tier rollup uses —
on a real cluster both read the bucket(conv_id) layout, so this is
co-partitioned). The Python loop is per group, and groups stream
through Arrow batches; blobs are orders of magnitude smaller than the
row form, so the write amplification is negative.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smos_spark.functions.codecs import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)

__all__ = ["compress_series", "decompress_series"]


def compress_series(
    df: DataFrame,
    value_cols: Sequence[str],
    key: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """→ one row per key: (key, n, first_ts, last_ts, ts_blob,
    <col>_blob…). Ordering inside the block is (ts, *order_cols) —
    the stable-turn-order invariant."""
    value_cols = list(value_cols)
    order = [ts_col] + list(order_cols or [])
    schema = (
        f"{key} string, n long, first_ts timestamp, last_ts timestamp, ts_blob binary, "
        + ", ".join(f"{c}_blob binary" for c in value_cols)
    )

    def _enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        ts = pdf[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        row = {
            key: [pdf[key].iloc[0]],
            "n": [len(pdf)],
            "first_ts": [pdf[ts_col].iloc[0]],
            "last_ts": [pdf[ts_col].iloc[-1]],
            "ts_blob": [dod_encode(ts)],
        }
        for c in value_cols:
            vals = pdf[c].astype("float64").to_numpy()
            row[f"{c}_blob"] = [gorilla_encode(vals)]
        return pd.DataFrame(row)

    return df.groupBy(key).applyInPandas(_enc, schema=schema)


def decompress_series(
    comp: DataFrame,
    value_cols: Sequence[str],
    key: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Inverse of compress_series → long form (key, ts, *value_cols).
    mapInPandas: no shuffle at all — each block row expands in place."""
    value_cols = list(value_cols)
    schema = f"{key} string, {ts_col} timestamp, " + ", ".join(
        f"{c} double" for c in value_cols
    )

    def _dec(batches):
        for pdf in batches:
            frames = []
            for _, r in pdf.iterrows():
                ts = dod_decode(bytes(r["ts_blob"])).astype("datetime64[us]")
                data = {key: r[key], ts_col: ts}
                for c in value_cols:
                    data[c] = gorilla_decode(bytes(r[f"{c}_blob"]))
                frames.append(pd.DataFrame(data))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return comp.mapInPandas(_dec, schema=schema)
