"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed via Arrow-batched mapInPandas.

The image/audio decode libraries are NOT in this container, so the
decode step is a clearly-marked deterministic FAKE (or raises
NotImplementedError in strict mode) — the Spark-side contract that
matters at 100 TB is real and tested: schema, batch shape, partition
sizing, and the mapInPandas signature that a real decoder would slot
into (swap `_fake_decode` for PIL/ffmpeg and nothing else changes).

Scale notes: binary payloads ride the normal columnar path (parquet
binary + Arrow). Keep `spark.sql.files.maxPartitionBytes` modest and
`arrow.maxRecordsPerBatch` low for large blobs so an Arrow batch of
images fits executor memory — the imgbuffer knob of the reference
(/root/reference/src/smos/reshuffle.py:135-138) reborn.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feat array<float>, decode_ok boolean"
)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (hash-derived payload bytes).
    All derivations use the portable md5-based hash64 and sha2-256 hex
    — identical in DuckDB — so the feature-extraction query has an
    exact SQL oracle despite the stubbed decoder."""
    from smos_spark.functions.texthash import md5_hash64

    def h(tag: str):
        return md5_hash64(F.concat(F.lit(tag + ":"), F.col("id").cast("string")))

    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(h("k"), F.lit(3)) + 1).cast("int"),
    )
    payload_len = (F.pmod(h("l"), F.lit(4096)) + 64).cast("int")
    # deterministic pseudo-bytes: repeated sha2 hex of the id, truncated
    payload = F.substring(
        F.repeat(F.sha2(F.concat(F.lit("p"), F.col("id").cast("string")), 256), 70),
        1,
        4160,
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.pmod(h("d"), F.lit(60000)).alias("duration_ms"),
        payload.substr(F.lit(1), payload_len).cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """DETERMINISTIC FAKE of image/audio decode + feature extraction.
    Real deployment: replace with PIL.Image.open / soundfile.read +
    a model forward pass. Kept byte-driven so tests are stable."""
    if payload is None:
        raise ValueError("null payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    # float64 mean (sum of 8 small ints is exact; /8 is a power-of-two
    # division) — bit-identical to the SQL twin's avg(code)/255
    chunks = np.resize(arr.astype(np.float64), dim * 8).reshape(dim, 8)
    return chunks.mean(axis=1) / 255.0


def extract_features(
    df: DataFrame, dim: int = 16, strict: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    plumbing a production decoder plugs into. strict=True raises
    NotImplementedError (no decoder in this container)."""
    if strict:
        raise NotImplementedError(
            "media decoding libraries (PIL/ffmpeg/soundfile) are not "
            "available in this environment; wire a real decoder into "
            "_fake_decode for production use"
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for p in pdf["payload"]:
                try:
                    feats.append(_fake_decode(bytes(p), dim).tolist())
                    ok.append(True)
                except Exception:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feat": feats,
                    "decode_ok": ok,
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode each video row into the frame
    timestamps a decoder would extract — plumbing only (the decode of
    each frame is the stubbed step)."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )
