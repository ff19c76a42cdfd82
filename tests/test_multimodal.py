"""Real multimodal decoders (pure-numpy BMP + PCM WAV) and the
Arrow-batched featurizer paths over them."""

import pytest

# --- REAL decoders (no codec libs needed): BMP + PCM WAV -------------------

def _make_bmp(w, h, pixels_rgb, top_down=False):
    """Synthesize an uncompressed 24-bit BMP from an (h, w, 3) RGB array."""
    import struct

    import numpy as np

    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = pixels_rgb[:, :, ::-1]
    order = bgr if top_down else bgr[::-1]
    rows[:, : w * 3] = order.reshape(h, w * 3)
    pix = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h),
                       1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def _make_wav(rate, samples):
    """Synthesize a 16-bit PCM WAV from an (n, channels) int16 array."""
    import struct

    data = samples.astype("<i2").tobytes()
    ch = samples.shape[1]
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_bmp_real():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    for top_down in (False, True):
        out = decode_bmp(_make_bmp(7, 5, img, top_down=top_down))
        assert out.shape == (5, 7, 3)
        assert (out == img).all()
    with pytest.raises(ValueError, match="BMP"):
        decode_bmp(b"NOPE" * 20)


def test_decode_wav_real():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import decode_wav

    t = np.arange(8000)
    wave = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    stereo = np.stack([wave, -wave], axis=1)
    samples, rate = decode_wav(_make_wav(8000, stereo))
    assert rate == 8000 and samples.shape == (8000, 2)
    assert (samples == stereo).all()
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"junk")


def test_image_features_real_bmp_spark(spark):
    """extract_image_features with REAL decode (no fake) over BMP bytes."""
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import extract_image_features

    img = np.full((4, 6, 3), 100, dtype=np.uint8)
    img[:, :, 0] = 200      # R=200, G=100, B=100 -> mean 133.33
    bmp = _make_bmp(6, 4, img)
    df = spark.createDataFrame([(1, bytearray(bmp)), (2, None)],
                               "id int, data binary")
    rows = {r["id"]: r["image_features"]
            for r in extract_image_features(df).collect()}
    f = rows[1]
    assert (f["width"], f["height"]) == (6, 4)
    assert abs(f["mean_luma"] - (200 + 100 + 100) / 3.0) < 1e-9
    assert rows[2] is None


def test_audio_features_real_wav_spark(spark):
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import extract_audio_features

    # full-scale square wave -> rms ~ 0.5 at amplitude 16384
    sq = np.where(np.arange(4000) % 2 == 0, 16384, -16384).astype(np.int16)
    wav = _make_wav(16000, sq.reshape(-1, 1))
    df = spark.createDataFrame([(1, bytearray(wav))], "id int, data binary")
    f = extract_audio_features(df).collect()[0]["audio_features"]
    assert f["sample_rate"] == 16000 and f["channels"] == 1
    assert abs(f["duration_s"] - 0.25) < 1e-9
    assert abs(f["rms"] - 0.5) < 1e-3
