"""Real multimodal decode: pure-numpy RIFF/WAVE-PCM16 and 24-bpp BMP
codecs, exact-integer feature extraction from actual payload bytes."""

from __future__ import annotations

import numpy as np
import pytest


# ------------------------------------------------------------- wav codec
def test_wav_roundtrip_mono_and_stereo():
    from smos_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    got, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and got.shape == (777, 1)
    np.testing.assert_array_equal(got[:, 0], mono)

    stereo = rng.integers(-32768, 32768, size=(120, 2), dtype=np.int16)
    got, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and got.shape == (120, 2)
    np.testing.assert_array_equal(got, stereo)


def test_wav_chunk_walking_and_word_alignment():
    from smos_spark.operators.multimodal import decode_wav, encode_wav

    s = np.arange(-50, 51, dtype=np.int16)  # odd frame count → odd data size? 2B each, even
    # odd-length junk chunk forces the word-alignment pad byte
    b = encode_wav(s, 8000, extra_chunk=b"x" * 13)
    got, rate = decode_wav(b)
    np.testing.assert_array_equal(got[:, 0], s)
    assert rate == 8000
    # junk chunk is physically present and padded
    assert b.count(b"jnk ") == 1 and len(b) % 2 == 0


def test_wav_rejects_garbage_and_truncation():
    from smos_spark.operators.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all........")
    good = encode_wav(np.ones(64, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(good[:30])
    # non-PCM format code rejected
    bad = bytearray(good)
    bad[20] = 3  # fmt code float
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


# ------------------------------------------------------------- bmp codec
@pytest.mark.parametrize("w,h", [(5, 3), (6, 4), (7, 1), (16, 9), (1, 1)])
def test_bmp_roundtrip_padded_widths(w, h):
    from smos_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    b = encode_bmp(px)
    assert len(b) == 54 + h * ((3 * w + 3) // 4 * 4)
    np.testing.assert_array_equal(decode_bmp(b), px)


def test_bmp_topdown_negative_height():
    import struct

    from smos_spark.operators.multimodal import decode_bmp, encode_bmp

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    b = bytearray(encode_bmp(px))
    # flip to top-down: negate height and reverse the stored row order
    stride = (3 * 3 + 3) // 4 * 4
    rows = bytes(b[54:])
    b[54:] = rows[stride:] + rows[:stride]
    struct.pack_into("<i", b, 22, -2)
    np.testing.assert_array_equal(decode_bmp(bytes(b)), px)


def test_bmp_rejects_unsupported():
    from smos_spark.operators.multimodal import decode_bmp, encode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"PNG......whatever...............................................")
    good = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    good[28] = 8  # bpp=8 → unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(good))


# -------------------------------------------------------- decode_media
def test_decode_media_dispatch_and_values():
    from smos_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_wav,
    )

    s = np.array([-3, 0, 7, 32767, -32768], dtype=np.int16)
    d = decode_media(encode_wav(s, 12000))
    assert d["fmt"] == "wav" and d["sample_rate"] == 12000
    np.testing.assert_array_equal(d["values"], s.astype(np.int64))

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    d = decode_media(encode_bmp(px))
    assert d["fmt"] == "bmp" and d["width"] == 2 and d["height"] == 2
    np.testing.assert_array_equal(d["values"], px.reshape(-1).astype(np.int64))

    with pytest.raises(ValueError):
        decode_media(b"\x00" * 100)


# ----------------------------------------------- spark-side operators
def test_decode_features_matches_generative_ground_truth(spark):
    """decode_features must reproduce, from the actual container bytes,
    the exact integer stats of the generative formulas in _synth_params."""
    from smos_spark.operators.multimodal import (
        _synth_params,
        decode_features,
        synth_media_bytes,
    )

    n = 32
    got = (
        decode_features(synth_media_bytes(spark, n))
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert bool(got.decode_ok.all())
    for mid in range(n):
        p = _synth_params(mid)
        r = got.loc[mid]
        if p["kind"] == "audio":
            i = np.arange(p["n_samples"], dtype=np.int64)
            vals = (p["a"] * i + p["b"]) % 65536 - 32768
            assert r.fmt == "wav"
            assert r.n_bytes == 52 + p["junk_len"] + 2 * p["n_samples"]
            assert (r.width, r.height) == (-1, -1)
            assert r.sample_rate == p["rate"]
        else:
            y, x, c = np.meshgrid(
                np.arange(p["h"]), np.arange(p["w"]), np.arange(3), indexing="ij"
            )
            vals = ((mid + 7 * y + 13 * x + 101 * c) % 256).reshape(-1)
            assert r.fmt == "bmp"
            assert r.n_bytes == 54 + p["h"] * ((3 * p["w"] + 3) // 4 * 4)
            assert (r.width, r.height) == (p["w"], p["h"])
            assert r.sample_rate == -1
        assert r.sum_val == vals.sum()
        assert r.sum_sq == (vals.astype(np.int64) ** 2).sum()
        assert (r.vmin, r.vmax) == (vals.min(), vals.max())


def test_extract_features_strict_real_bytes(spark):
    """strict (default) path: features derive from actual decoded
    signal; non-container payloads are flagged, not faked."""
    from smos_spark.operators.multimodal import (
        decode_media,
        extract_features,
        synth_media_bytes,
    )

    media = synth_media_bytes(spark, 8)
    pdf = extract_features(media, dim=4).toPandas().set_index("media_id").sort_index()
    assert bool(pdf.decode_ok.all())
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, payload in raw.items():
        d = decode_media(payload)
        scale = 32768.0 if d["fmt"] == "wav" else 255.0
        exp = [
            float(s.mean()) / scale
            for s in np.array_split(d["values"].astype(np.float64), 4)
        ]
        np.testing.assert_allclose(pdf.loc[mid].feat, exp, rtol=1e-6)

    # opaque payload: strict flags it; legacy mode falls back to the fake
    opaque = spark.createDataFrame(
        [(99, "image", bytearray(b"\x89PNG fake compressed payload"))],
        "media_id long, kind string, payload binary",
    )
    srow = extract_features(opaque).collect()[0]
    assert srow["decode_ok"] is False and srow["feat"] is None
    lrow = extract_features(opaque, strict=False).collect()[0]
    assert lrow["decode_ok"] is True and lrow["feat"] is not None


def test_decode_failure_rows_use_minus1_dim_sentinel(spark):
    """Failure rows must use the SAME -1 absent-dimension sentinel as
    success rows (a 0 would read as a real zero-width measurement)."""
    from smos_spark.operators.multimodal import decode_features

    df = spark.createDataFrame(
        [(1, "audio", bytearray(b"notariff")), (2, "image", None)],
        "media_id long, kind string, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_features(df).collect()}
    for mid in (1, 2):
        r = rows[mid]
        assert r["decode_ok"] is False
        assert r["width"] == -1 and r["height"] == -1 and r["sample_rate"] == -1
        assert r["n_units"] == 0 and r["sum_val"] == 0 and r["fmt"] == "?"
    assert rows[1]["n_bytes"] == 8 and rows[2]["n_bytes"] == 0
