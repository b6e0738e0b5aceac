"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The decode step is REAL for the two public container formats that are
pure header+payload math — RIFF/WAVE PCM16 audio and 24-bpp
uncompressed BMP images — implemented here in numpy with no external
media libraries (`decode_wav`, `decode_bmp`). Features are computed
from the actual payload bytes. Formats that genuinely need a codec
library (JPEG, MP3, H.264 …) are out of reach in this container;
`extract_features(strict=False)` keeps the legacy deterministic
byte-driven fake for those payloads so the plumbing stays testable.

Scale notes: binary payloads ride the normal columnar path (parquet
binary + Arrow). Keep `spark.sql.files.maxPartitionBytes` modest and
`arrow.maxRecordsPerBatch` low for large blobs so an Arrow batch of
images fits executor memory — the imgbuffer knob of the reference
(/root/reference/src/smos/reshuffle.py:135-138) reborn.
"""

from __future__ import annotations

import struct
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


DECODE_SCHEMA = (
    "media_id long, kind string, fmt string, n_bytes long, width long, "
    "height long, sample_rate long, n_units long, sum_val long, "
    "sum_sq long, vmin long, vmax long, decode_ok boolean"
)


def _synth_params(media_id: int) -> dict:
    """Deterministic generative parameters per media_id — every value
    below is reproducible in ANSI SQL (the DuckDB oracle recomputes the
    signal from these formulas with generate_series)."""
    if media_id % 2 == 0:  # audio: PCM16 mono WAV
        return {
            "kind": "audio",
            "a": media_id % 97 + 3,
            "b": media_id % 251,
            "n_samples": 256 + (media_id * 37) % 512,
            "rate": 8000 + (media_id % 5) * 2000,
            "junk_len": 10 + (media_id % 4) * 2,
        }
    return {  # image: 24-bpp BMP (widths 5..16 exercise row padding)
        "kind": "image",
        "w": 5 + media_id % 12,
        "h": 3 + media_id % 7,
    }


def _synth_payload(media_id: int) -> bytes:
    p = _synth_params(media_id)
    if p["kind"] == "audio":
        i = np.arange(p["n_samples"], dtype=np.int64)
        samples = ((p["a"] * i + p["b"]) % 65536 - 32768).astype(np.int16)
        return encode_wav(samples, p["rate"], extra_chunk=b"\x6a" * p["junk_len"])
    y, x, c = np.meshgrid(
        np.arange(p["h"]), np.arange(p["w"]), np.arange(3), indexing="ij"
    )
    px = ((media_id + 7 * y + 13 * x + 101 * c) % 256).astype(np.uint8)
    return encode_bmp(px)


def synth_media_bytes(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL container payloads: even
    media_ids are PCM16 WAV files (with a junk chunk so decoders must
    chunk-walk), odd ones 24-bpp BMPs with non-multiple-of-4 row
    strides. Byte construction is a per-row loop inside the Arrow
    batch — acceptable here because this is a test/bench fixture, not
    a scale-path operator (ragged binary assembly has no batch form)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [_synth_params(int(i))["kind"] for i in ids],
                    "payload": [_synth_payload(int(i)) for i in ids],
                }
            )

    return spark.range(n).mapInPandas(
        _gen, schema="media_id long, kind string, payload binary"
    )


def decode_features(df: DataFrame) -> DataFrame:
    """Exact integer features computed from the ACTUAL payload bytes
    through the numpy WAV/BMP decoders: dims/rate from the parsed
    headers, sum/sum-of-squares/min/max over the decoded signal (all
    int64-exact, so the contract row hash-matches a SQL oracle that
    regenerates the signal from first principles). Absent dims use the
    -1 sentinel (nullable ints would float-ify in Arrow→pandas)."""

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "fmt n_bytes width height sample_rate n_units "
                    "sum_val sum_sq vmin vmax decode_ok".split()
                )
            }
            for p in pdf["payload"]:
                try:
                    d = decode_media(bytes(p) if p is not None else None)
                    v = d["values"]
                    out["fmt"].append(d["fmt"])
                    out["n_bytes"].append(len(p))
                    out["width"].append(d["width"])
                    out["height"].append(d["height"])
                    out["sample_rate"].append(d["sample_rate"])
                    out["n_units"].append(len(v) // d["n_channels"])
                    out["sum_val"].append(int(v.sum()))
                    out["sum_sq"].append(int((v * v).sum()))
                    out["vmin"].append(int(v.min()) if len(v) else 0)
                    out["vmax"].append(int(v.max()) if len(v) else 0)
                    out["decode_ok"].append(True)
                except Exception:
                    # failure rows use the SAME -1 absent-dimension
                    # sentinel as success rows (a 0 would read as a
                    # real zero-width/zero-rate measurement); counts
                    # and value sums are 0 — nothing was decoded
                    for k in ("width", "height", "sample_rate"):
                        out[k].append(-1)
                    for k in ("n_units", "sum_val", "sum_sq", "vmin", "vmax"):
                        out[k].append(0)
                    out["fmt"].append("?")
                    out["decode_ok"].append(False)
                    out["n_bytes"].append(len(p) if p is not None else 0)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], **out}
            )

    return df.mapInPandas(_dec, schema=DECODE_SCHEMA)


# ------------------------------------------------------------------ codecs
# Pure-numpy encoders/decoders for the two public formats that are
# header + payload math: RIFF/WAVE PCM16 and 24-bpp uncompressed BMP.
# Specs: Microsoft RIFF/WAVEFORMATEX and BITMAPINFOHEADER (public).


def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    extra_chunk: bytes | None = None,
) -> bytes:
    """Encode int16 PCM samples ((frames,) mono or (frames, ch)) as a
    canonical RIFF/WAVE byte string. extra_chunk, if given, is written
    as a 'jnk ' chunk between fmt and data (word-padded per RIFF) to
    exercise decoder chunk-walking."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.tobytes()  # interleaved frame-major
    block_align = 2 * n_ch
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk is not None:
        body += b"jnk " + struct.pack("<I", len(extra_chunk)) + extra_chunk
        if len(extra_chunk) % 2:
            body += b"\x00"  # RIFF chunks are word-aligned
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM16 byte string → ((frames, ch) int16
    array, sample_rate). Walks the chunk list (skipping unknown chunks
    with word-alignment) rather than assuming a 44-byte header."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_len = struct.unpack_from("<I", payload, 4)[0]
    if riff_len + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos, n_ch, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= riff_len + 8:
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", payload, pos + 8)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding fmt={audio_fmt} bits={bits}")
        elif tag == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)  # word alignment
    if n_ch is None or data is None:
        raise ValueError("missing fmt or data chunk")
    s = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        s = s[: (len(s) // n_ch) * n_ch].reshape(-1, n_ch)
    else:
        s = s[:, None]
    return s, int(rate)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bpp bottom-up BMP
    (BITMAPINFOHEADER, BGR byte order, rows padded to 4 bytes)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, RGB→BGR
    img = rows.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + img


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bpp uncompressed BMP byte string → (h, w, 3) uint8
    RGB array (row 0 = top). Handles bottom-up (positive height) and
    top-down (negative height) layouts and 4-byte row padding."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    h = abs(h_signed)
    stride = (3 * w + 3) // 4 * 4
    if offset + h * stride > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    px = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return px if h_signed < 0 else px[::-1]


def decode_media(payload: bytes) -> dict:
    """Dispatch on container magic bytes and decode. Returns
    {fmt, width, height, sample_rate, n_channels, values} where
    `values` is the decoded signal as one int64 array — interleaved
    PCM samples for WAV, (y, x, RGB)-order pixel bytes for BMP.
    Raises ValueError for anything that isn't a supported container."""
    if payload is None:
        raise ValueError("null payload")
    b = bytes(payload)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        samples, rate = decode_wav(b)
        return {
            "fmt": "wav",
            "width": -1,
            "height": -1,
            "sample_rate": rate,
            "n_channels": samples.shape[1],
            "values": samples.reshape(-1).astype(np.int64),
        }
    if b[:2] == b"BM":
        px = decode_bmp(b)
        return {
            "fmt": "bmp",
            "width": px.shape[1],
            "height": px.shape[0],
            "sample_rate": -1,
            "n_channels": 3,
            "values": px.reshape(-1).astype(np.int64),
        }
    raise ValueError("unrecognized media container")


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """DETERMINISTIC byte-driven FAKE for payloads whose real format
    needs a codec library not present here (JPEG/MP3/...). Used only
    by extract_features(strict=False); real containers never reach it."""
    if payload is None:
        raise ValueError("null payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    # float64 mean (sum of 8 small ints is exact; /8 is a power-of-two
    # division) — bit-identical to the SQL twin's avg(code)/255
    chunks = np.resize(arr.astype(np.float64), dim * 8).reshape(dim, 8)
    return chunks.mean(axis=1) / 255.0


def _real_feat(payload: bytes, dim: int) -> np.ndarray:
    """dim-length feature vector from ACTUAL decoded signal values:
    mean of each of dim contiguous segments, scaled to [-1, 1] (PCM/2^15)
    or [0, 1] (pixel/255)."""
    d = decode_media(payload)
    vals = d["values"].astype(np.float64)
    scale = 32768.0 if d["fmt"] == "wav" else 255.0
    segs = np.array_split(vals, dim)
    return np.array([s.mean() if len(s) else 0.0 for s in segs]) / scale


def extract_features(
    df: DataFrame, dim: int = 16, strict: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads, computed
    from the ACTUAL bytes via the numpy WAV/BMP decoders (dim segment
    means of the decoded signal). strict=True (default): payloads that
    aren't a supported container yield decode_ok=false. strict=False:
    such payloads fall back to the legacy deterministic byte-driven
    fake — plumbing mode for formats needing an external codec."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for p in pdf["payload"]:
                try:
                    feats.append(_real_feat(bytes(p), dim).tolist())
                    ok.append(True)
                except Exception:
                    if strict or p is None:
                        feats.append(None)
                        ok.append(False)
                    else:
                        feats.append(_fake_decode(bytes(p), dim).tolist())
                        ok.append(True)
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
