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


# --------------------------------------------------------------------------
# PNG (independent plain-python encoder below; decoder is numpy+zlib)
# --------------------------------------------------------------------------

def _png_chunk(cid: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _make_png(pixels, ctype, filters, palette=None) -> bytes:
    """Encode an (h, w, channels) nested list as a PNG using the given
    per-row filter types — pure-python filtering, independent of the
    numpy decode path."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0])
    bpp = len(pixels[0][0])
    flat = [[ch for px in row for ch in px] for row in pixels]
    stride = w * bpp
    raw = bytearray()
    prev = [0] * stride
    for y, row in enumerate(flat):
        ft = filters[y % len(filters)]
        raw.append(ft)
        cur = row
        for i in range(stride):
            left = cur[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = cur[i]
            elif ft == 1:
                v = (cur[i] - left) % 256
            elif ft == 2:
                v = (cur[i] - up) % 256
            elif ft == 3:
                v = (cur[i] - (left + up) // 2) % 256
            else:
                v = (cur[i] - _paeth(left, up, ul)) % 256
            raw.append(v)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", bytes(palette))
    comp = zlib.compress(bytes(raw))
    # split IDAT to prove multi-chunk concatenation works
    out += _png_chunk(b"IDAT", comp[: len(comp) // 2])
    out += _png_chunk(b"IDAT", comp[len(comp) // 2:])
    out += _png_chunk(b"IEND", b"")
    return out


def test_decode_png_rgb_all_filters():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (10, 7, 3)).astype(int).tolist()
    # cycle through every filter type across rows
    buf = _make_png(img, ctype=2, filters=[0, 1, 2, 3, 4])
    out = decode_png(buf)
    assert out.shape == (10, 7, 3)
    assert (out == np.array(img, dtype=np.uint8)).all()


def test_decode_png_gray_rgba_palette():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (5, 6, 1)).astype(int).tolist()
    out = decode_png(_make_png(gray, ctype=0, filters=[4, 3, 1]))
    assert out.shape == (5, 6)
    assert (out == np.array(gray, dtype=np.uint8)[:, :, 0]).all()

    rgba = rng.randint(0, 256, (4, 4, 4)).astype(int).tolist()
    out = decode_png(_make_png(rgba, ctype=6, filters=[2, 4]))
    assert out.shape == (4, 4, 4)
    assert (out == np.array(rgba, dtype=np.uint8)).all()

    # palette: indices 0..3 -> 4-entry RGB palette
    pal = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    idx = [[[(x + y) % 4] for x in range(5)] for y in range(3)]
    out = decode_png(_make_png(idx, ctype=3, filters=[1], palette=pal))
    assert out.shape == (3, 5, 3)
    assert tuple(out[0][1]) == (40, 50, 60)
    assert tuple(out[1][0]) == (40, 50, 60)


def test_decode_png_rejects_bad_input():
    import pytest as _pytest

    from geoparquet_io_spark.operators.multimodal import decode_png

    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_image_features_real_png_spark(spark):
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import extract_image_features

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (6, 9, 3)).astype(int).tolist()
    buf = _make_png(img, ctype=2, filters=[0, 1, 2, 3, 4])
    df = spark.createDataFrame([(1, bytearray(buf))], ["id", "data"])
    row = extract_image_features(df).collect()[0]["image_features"]
    assert (row["width"], row["height"]) == (9, 6)
    expected = float(np.array(img, dtype=np.uint8).astype("f8").mean())
    assert abs(row["mean_luma"] - expected) < 1e-9
