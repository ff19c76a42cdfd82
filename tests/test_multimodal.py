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


# --- REAL video: RIFF/AVI container + MJPEG / DIB frames -------------------

def _dib_frame(img_rgb):
    """AVI '00db' payload: bottom-up BGR rows, 4-byte padded stride."""
    import numpy as np

    h, w = img_rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img_rgb[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def test_avi_header_layout_independent():
    """Check build_avi's bytes against the published AVI 1.0 layout with
    raw struct unpacks (NOT via parse_avi), so writer and reader cannot
    share a bug."""
    import struct

    import numpy as np

    from geoparquet_io_spark.functions.avi import build_avi

    img = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(4, 8, 3)
    buf = build_avi([_dib_frame(img)] * 2, 8, 4, fps=10, codec="DIB ")
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    assert struct.unpack_from("<I", buf, 4)[0] == len(buf) - 8
    # hdrl LIST starts right after 'AVI '
    assert buf[12:16] == b"LIST" and buf[20:24] == b"hdrl"
    # avih chunk: first DWORD us/frame, dwTotalFrames at +16, w/h at +32
    assert buf[24:28] == b"avih"
    body = 32
    us, total, w, h = struct.unpack_from("<I", buf, body)[0], \
        struct.unpack_from("<I", buf, body + 16)[0], \
        struct.unpack_from("<I", buf, body + 32)[0], \
        struct.unpack_from("<I", buf, body + 36)[0]
    assert (us, total, w, h) == (100000, 2, 8, 4)
    # the two frame chunks appear in order inside LIST movi
    movi = buf.index(b"movi")
    first = buf.index(b"00db", movi)
    size = struct.unpack_from("<I", buf, first + 4)[0]
    assert size == len(_dib_frame(img))


def test_avi_mjpeg_roundtrip_bit_exact(spark):
    """MJPEG AVI: frames encoded by the independent in-test T.81 encoder,
    sampled by the REAL (non-fake) sample_frames path, decoded bit-exact
    by extract_video_features."""
    import numpy as np

    from tests.test_jpeg import encode_jpeg_ref
    from geoparquet_io_spark.functions.avi import build_avi, parse_avi
    from geoparquet_io_spark.operators.multimodal import (
        extract_video_features, sample_frames)

    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
            for _ in range(3)]
    encoded = [encode_jpeg_ref(im) for im in imgs]   # (bytes, exact recon)
    buf = build_avi([e[0] for e in encoded], 24, 16, fps=5, codec="MJPG")

    info = parse_avi(buf)
    assert (info.width, info.height, info.codec, info.fps) == (24, 16, "MJPG", 5.0)
    assert len(info.frames) == 3

    df = spark.createDataFrame([(1, bytearray(buf))], ["id", "data"])
    rows = sample_frames(df, "data", stride=2).collect()[0]["frames"]
    assert [r["frame_index"] for r in rows] == [0, 2]
    assert [round(r["t_s"], 3) for r in rows] == [0.0, 0.4]
    assert bytes(rows[0]["frame"]) == encoded[0][0]     # byte-exact payload
    assert bytes(rows[1]["frame"]) == encoded[2][0]

    feats = extract_video_features(df, "data").collect()[0]["video_features"]
    assert feats["n_frames"] == 3 and feats["codec"] == "MJPG"
    for mean, (_, recon) in zip(feats["frame_means"], encoded):
        want = float(np.asarray(recon, dtype=np.float64).mean())
        assert abs(mean - want) < 1e-9   # decoder is exact on quantized coefs


def test_avi_dib_features_spark(spark):
    import numpy as np

    from geoparquet_io_spark.functions.avi import build_avi
    from geoparquet_io_spark.operators.multimodal import extract_video_features

    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 256, (6, 8, 3)).astype(np.uint8) for _ in range(4)]
    buf = build_avi([_dib_frame(i) for i in imgs], 8, 6, fps=10, codec="DIB ")
    df = spark.createDataFrame([(1, bytearray(buf))], ["id", "data"])
    f = extract_video_features(df, "data", stride=1, max_frames=2) \
        .collect()[0]["video_features"]
    assert (f["width"], f["height"], f["fps"], f["n_frames"]) == (8, 6, 10.0, 4)
    assert len(f["frame_means"]) == 2
    for m, img in zip(f["frame_means"], imgs[:2]):
        assert abs(m - img.astype("f8").mean()) < 1e-9


def test_sample_frames_fake_path_shape(spark):
    from geoparquet_io_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, bytearray(b"x" * 2500))], ["id", "data"])
    rows = sample_frames(df, "data", every_n_bytes=1000,
                         deterministic_fake=True).collect()[0]["frames"]
    assert [r["frame_index"] for r in rows] == [0, 1]
    assert all(len(bytes(r["frame"])) == 1000 for r in rows)


def test_parse_avi_rejects_non_avi():
    import pytest as _pytest

    from geoparquet_io_spark.functions.avi import parse_avi

    with _pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with _pytest.raises(ValueError):
        parse_avi(b"\x00" * 64)


# --- PNG completeness: 16-bit depth + Adam7 interlace ----------------------

def _filter_rows(byte_rows, bpp, filters):
    """Independent pure-python per-row filtering of raw byte rows."""
    out = bytearray()
    prev = [0] * len(byte_rows[0])
    for y, cur in enumerate(byte_rows):
        ft = filters[y % len(filters)]
        out.append(ft)
        for i in range(len(cur)):
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
            out.append(v)
        prev = cur
    return bytes(out)


_ADAM7_GRID = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
               (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _make_png2(arr, ctype, filters, depth=8, interlace=0):
    """General independent PNG encoder: (h, w, ch) uint8/16 array,
    8/16-bit, optional Adam7."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(arr)
    h, w, ch = arr.shape
    if depth == 16:
        hi = (arr >> 8).astype(np.uint8)
        lo = (arr & 0xFF).astype(np.uint8)
        byts = np.stack([hi, lo], axis=-1).reshape(h, w, ch * 2)
    else:
        byts = arr.astype(np.uint8)
    bpp = byts.shape[2]

    raw = bytearray()
    if interlace == 0:
        rows = [[int(v) for v in byts[y].reshape(-1)] for y in range(h)]
        raw += _filter_rows(rows, bpp, filters)
    else:
        for (x0, y0, dx, dy) in _ADAM7_GRID:
            sub = byts[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            rows = [[int(v) for v in sub[y].reshape(-1)]
                    for y in range(sub.shape[0])]
            raw += _filter_rows(rows, bpp, filters)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return out


def test_decode_png_16bit_gray_and_rgb():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(21)
    gray = rng.randint(0, 65536, (9, 7, 1)).astype(np.uint16)
    buf = _make_png2(gray, ctype=0, filters=[0, 1, 2, 3, 4], depth=16)
    out = decode_png(buf)
    assert out.dtype == np.uint16
    assert np.array_equal(out, gray[:, :, 0])

    rgb = rng.randint(0, 65536, (6, 11, 3)).astype(np.uint16)
    buf = _make_png2(rgb, ctype=2, filters=[4, 3, 2, 1, 0], depth=16)
    assert np.array_equal(decode_png(buf), rgb)


def test_decode_png_adam7_interlaced():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(22)
    # dimensions chosen so every pass is non-empty AND non-multiple of 8
    rgb = rng.randint(0, 256, (13, 11, 3)).astype(np.uint8)
    buf = _make_png2(rgb, ctype=2, filters=[0, 1, 2, 3, 4], interlace=1)
    assert np.array_equal(decode_png(buf), rgb)
    # tiny images: several Adam7 passes are EMPTY
    for shape in ((1, 1), (2, 3), (5, 4)):
        img = rng.randint(0, 256, (*shape, 4)).astype(np.uint8)
        buf = _make_png2(img, ctype=6, filters=[1, 4], interlace=1)
        assert np.array_equal(decode_png(buf), img)


def test_decode_png_adam7_16bit():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(23)
    ga = rng.randint(0, 65536, (10, 9, 2)).astype(np.uint16)
    buf = _make_png2(ga, ctype=4, filters=[4, 2], depth=16, interlace=1)
    assert np.array_equal(decode_png(buf), ga)


# --- perceptual image hashing (dHash) --------------------------------------

def test_dhash_scale_invariant_and_sensitive():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import dhash

    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, (8, 9, 3)).astype(np.uint8)
    h1 = dhash(img)
    # exact 2x nearest upsample pools back to the identical grid
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    assert dhash(up) == h1
    # unrelated image: far away in hamming
    other = rng.randint(0, 256, (8, 9, 3)).astype(np.uint8)
    assert bin((h1 ^ dhash(other)) & ((1 << 64) - 1)).count("1") > 10


def test_image_near_duplicate_pairs_complete_vs_bruteforce(spark):
    """Banded pairing loses no pair vs brute-force hamming (pigeonhole)."""
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import (
        dhash, image_near_duplicate_pairs)

    rng = np.random.RandomState(32)
    bufs = []
    base = rng.randint(0, 256, (8, 9, 3)).astype(np.uint8)
    for i in range(12):
        img = base.copy()
        # progressively larger perturbations -> a spread of distances
        img[: i % 8, : i % 9] = rng.randint(0, 256, (i % 8, i % 9, 3))
        bufs.append((i, bytearray(_make_bmp(9, 8, img))))
    hashes = {
        i: dhash(__import__("geoparquet_io_spark.operators.multimodal",
                            fromlist=["decode_bmp"]).decode_bmp(bytes(b)))
        for i, b in bufs}
    def ham(a, b):
        return bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")

    want = sorted((a, b, ham(a, b)) for a in hashes for b in hashes
                  if a < b and ham(a, b) <= 6)
    df = spark.createDataFrame(bufs, "img_id int, data binary")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_duplicate_pairs(df, "img_id",
                                            max_hamming=6).collect())
    assert got == want
    assert want, "fixture must actually produce near-dup pairs"


def test_image_near_duplicate_pairs_guard(spark):
    import pytest as _pytest

    from geoparquet_io_spark.operators.multimodal import (
        image_near_duplicate_pairs)

    df = spark.createDataFrame([(1, bytearray(b""))], "id int, data binary")
    with _pytest.raises(ValueError, match="pigeonhole"):
        image_near_duplicate_pairs(df, "id", max_hamming=8, bands=8)


def test_audio_features_dsp_sine(spark):
    """Pure 1 kHz sine at 8 kHz: ZCR == 2*f0/rate, spectral centroid
    lands on f0 — the physics pins the DSP."""
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import (
        extract_audio_features)

    rate, f0 = 8000, 1000
    t = np.arange(4096) / rate
    sig = (np.sin(2 * np.pi * f0 * t) * 30000).astype(np.int16) \
        .reshape(-1, 1)
    df = spark.createDataFrame([(1, bytearray(_make_wav(rate, sig)))],
                               ["id", "data"])
    f = extract_audio_features(df).collect()[0]["audio_features"]
    assert abs(f["zcr"] - 2 * f0 / rate) < 0.001
    assert abs(f["spectral_centroid_hz"] - f0) < 5.0
    assert abs(f["rms"] - (30000 / 32768) / np.sqrt(2)) < 1e-3


def test_resample_methods_analytic():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import _resample

    # nearest 2x upscale: out(r, c) == in(r//2, c//2)
    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, (4, 5, 3)).astype(np.uint8)
    up = _resample(img, 10, 8, "nearest")
    for r in range(8):
        for c in range(10):
            assert (up[r, c] == img[r // 2, c // 2]).all()
    # area 2x downscale of exact blocks: floor of the 2x2 block mean
    big = rng.randint(0, 256, (6, 8)).astype(np.uint8)
    down = _resample(big, 4, 3, "area")
    want = big.reshape(3, 2, 4, 2).swapaxes(1, 2).reshape(3, 4, 4)
    assert (down == np.floor(want.mean(axis=2))).all()
    # bilinear on a linear ramp stays linear (interior points exact)
    ramp = np.tile(np.arange(0, 200, 2, dtype=np.uint8), (10, 1))
    out = _resample(ramp, 50, 10, "bilinear")
    inner = out[0, 1:-1].astype(int)
    diffs = np.diff(inner)
    assert diffs.min() >= 3 and diffs.max() <= 5   # slope 2*100/50 = 4


def test_resize_images_spark_pipeline(spark):
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import resize_images

    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (6, 8, 3)).astype(np.uint8)
    df = spark.createDataFrame([(1, bytearray(_make_bmp(8, 6, img)))],
                               ["id", "data"])
    row = resize_images(df, 4, 3, method="area").collect()[0]["resized"]
    assert (row["width"], row["height"], row["channels"]) == (4, 3, 3)
    got = np.frombuffer(bytes(row["data"]), np.uint8).reshape(3, 4, 3)
    want = np.floor(
        img.astype("f8").reshape(3, 2, 4, 2, 3).mean(axis=(1, 3)))
    assert (got == want).all()


def test_decode_wav_float32(spark):
    import struct

    import numpy as np

    from geoparquet_io_spark.operators.multimodal import (
        decode_wav, extract_audio_features)

    rate = 16000
    t = np.arange(1024) / rate
    # bin-aligned tone (28 cycles in 1024 samples) -> no leakage
    sig = (0.5 * np.sin(2 * np.pi * 437.5 * t)).astype(np.float32) \
        .reshape(-1, 1)
    data = sig.astype("<f4").tobytes()
    buf = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, rate,
                                   rate * 4, 4, 32)
           + b"data" + struct.pack("<I", len(data)) + data)
    samples, r = decode_wav(buf)
    assert r == rate and samples.dtype == np.float32
    assert np.allclose(samples[:, 0], sig[:, 0])
    df = spark.createDataFrame([(1, bytearray(buf))], ["id", "data"])
    f = extract_audio_features(df).collect()[0]["audio_features"]
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(f["spectral_centroid_hz"] - 437.5) < 5


def test_sample_frames_fake_short_payload_empty(spark):
    """Payload shorter than every_n_bytes must yield ZERO fake frames —
    sequence(0, -1) used to fabricate frames [0, -1]."""
    from geoparquet_io_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, b"x" * 500), (2, b"y" * 2500)],
                               ["id", "data"])
    out = {r["id"]: r["frames"]
           for r in sample_frames(df, every_n_bytes=1024,
                                  deterministic_fake=True).collect()}
    assert out[1] == []
    assert [f["frame_index"] for f in out[2]] == [0, 1]


def test_dhash_rejects_oversize_hash(spark):
    import numpy as np
    import pytest

    from geoparquet_io_spark.operators.multimodal import dhash

    with pytest.raises(ValueError, match="hash_size"):
        dhash(np.zeros((16, 16)), hash_size=10)


def test_resize_16bit_png_normalizes_to_uint8(spark):
    """16-bit PNG input must scale to the RGB uint8 output contract
    (not emit uint16 bytes / clip to white / wrap mod 256)."""
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import resize_images

    rng = np.random.RandomState(31)
    img = rng.randint(0, 65536, (10, 8, 3)).astype(np.uint16)
    buf = _make_png2(img, ctype=2, filters=[0], depth=16)
    df = spark.createDataFrame([(1, bytearray(buf))], ["id", "data"])
    for method in ("nearest", "bilinear", "area"):
        r = resize_images(df, 4, 4, method=method).collect()[0]["resized"]
        assert r["channels"] == 3
        assert len(r["data"]) == 4 * 4 * 3  # uint8 bytes, not uint16
        vals = np.frombuffer(bytes(r["data"]), dtype=np.uint8)
        # top byte of the uint16 values: mean ~127, nothing degenerate
        assert vals.mean() > 32 and vals.mean() < 224, (method, vals.mean())


def test_avi_audio_first_video_stream_found():
    """An AVI declaring its audio strl before the video strl names its
    video chunks 01dc — extraction must follow the header's video
    stream, not assume stream 0."""
    import struct as _s

    from geoparquet_io_spark.functions.avi import extract_frames, parse_avi

    def chunk(cid, body):
        return cid + _s.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = chunk(b"avih", _s.pack("<14I", 100000, 0, 0, 0x10, 1, 0, 2, 0,
                                  4, 2, 0, 0, 0, 0))
    strh_aud = chunk(b"strh", b"auds" + b"\x00" * 52)
    strh_vid = chunk(b"strh", b"vids" + b"MJPG"
                     + _s.pack("<IHHIIIIIIiI4H", 0, 0, 0, 0, 1, 10, 0,
                               1, 0, -1, 0, 0, 0, 4, 2))
    strf_vid = chunk(b"strf", _s.pack("<IiiHHIIiiII", 40, 4, 2, 1, 24,
                                      0, 0, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh_aud)
               + lst(b"strl", strh_vid + strf_vid))
    payload = b"\xAB" * 32
    movi = lst(b"movi", chunk(b"01dc", payload) + chunk(b"00wb", b"\x00" * 8))
    riff_body = b"AVI " + hdrl + movi
    buf = b"RIFF" + _s.pack("<I", len(riff_body)) + riff_body

    info = parse_avi(buf)
    assert info.video_stream == 1
    assert info.bits == 24
    frames = extract_frames(buf, info)          # default = video stream
    assert frames == [payload]
    assert extract_frames(buf, info, stream=0) == []


def test_avi_32bpp_dib_decode_and_8bpp_gate():
    import struct as _s

    import numpy as np

    from geoparquet_io_spark.functions.avi import AviInfo, decode_frame

    # 2x2 BGRA bottom-up: stride = 2*4 = 8 (already 4-aligned)
    px = np.array([[[1, 2, 3, 9], [4, 5, 6, 9]],      # bottom row
                   [[7, 8, 9, 9], [10, 11, 12, 9]]], np.uint8)
    frame = px.tobytes()
    info = AviInfo(2, 2, 10.0, 1, "DIB ", [], 0, 32)
    rgb = decode_frame(frame, info)
    # top-left pixel = last row's first pixel, BGR->RGB
    assert tuple(rgb[0, 0]) == (9, 8, 7)
    assert tuple(rgb[1, 1]) == (6, 5, 4)
    import pytest as _p
    with _p.raises(ValueError, match="bit depth"):
        decode_frame(b"\x00" * 64, AviInfo(2, 2, 10.0, 1, "DIB ", [], 0, 8))


# --- r9 review-fix regressions ------------------------------------------------

def test_dhash_small_images_are_not_constant(spark):
    """Images smaller than the pool grid used to produce NaN pooled
    cells -> every gradient False -> dhash 0 for EVERY small image, so
    dedup_images silently deleted distinct small images (r9 review,
    verified by execution).  Distinct small images must hash apart."""
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import dhash

    a = np.arange(16, dtype=np.uint8).reshape(4, 4)          # gradient
    b = np.array([[255, 0], [0, 255]], dtype=np.uint8)       # checker
    ha, hb = dhash(a), dhash(b)
    assert ha != hb
    assert not (ha == 0 and hb == 0)


def test_dhash_ignores_opaque_alpha_plane():
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import dhash

    rgb = (np.arange(16 * 16 * 3, dtype=np.uint8)
           .reshape(16, 16, 3))
    rgba = np.concatenate(
        [rgb, np.full((16, 16, 1), 255, dtype=np.uint8)], axis=2)
    assert dhash(rgb) == dhash(rgba)


def test_resample_area_upscale_has_no_nan_garbage():
    """area upscaling used to mean empty index splits -> NaN -> floored
    to black garbage pixels (r9 review, verified by execution)."""
    import numpy as np

    from geoparquet_io_spark.operators.multimodal import _resample

    img = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    out = _resample(img, 4, 4, "area")
    assert out.shape == (4, 4)
    assert set(np.unique(out)) == {10, 20, 30, 40}   # nearest-stretched


def test_resize_images_normalizes_alpha_channels(spark):
    """Gray+alpha and RGBA decodes must emit the declared 3-channel
    row-major RGB tensor, not 2/4-channel pass-through (r9 review)."""
    from geoparquet_io_spark.operators.multimodal import resize_images

    rgba = [[[200, 0, 0, 255] for _ in range(6)] for _ in range(6)]
    buf = _make_png(rgba, ctype=6, filters=[0])
    df = spark.createDataFrame([(1, bytearray(buf))],
                               "id long, data binary")
    row = resize_images(df, 4, 4).collect()[0]["resized"]
    assert row["channels"] == 3
    assert len(row["data"]) == 4 * 4 * 3


def test_decode_wav_zero_channels_is_value_error():
    import struct

    import pytest

    from geoparquet_io_spark.operators.multimodal import decode_wav

    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    buf = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="channels"):
        decode_wav(buf)


def test_fake_decoder_empty_payload(spark):
    from geoparquet_io_spark.operators.multimodal import (
        extract_image_features)

    df = spark.createDataFrame([(1, bytearray(b""))], "id long, data binary")
    row = extract_image_features(df, deterministic_fake=True).collect()[0]
    f = row["image_features"]
    assert f["width"] == 8 and f["height"] == 8 and f["mean_luma"] == 0.0


def test_near_dup_pairs_reject_zero_bit_bands(spark):
    import pytest

    from geoparquet_io_spark.operators.multimodal import (
        dedup_images, image_near_duplicate_pairs)

    df = spark.createDataFrame([(1, bytearray(b"xx"))], "id long, data binary")
    with pytest.raises(ValueError, match="band"):
        image_near_duplicate_pairs(df, "id", hash_size=2, bands=8)
    with pytest.raises(ValueError, match="band"):
        dedup_images(df, "id", hash_size=2)


# --- r9 codec review-fix regressions ------------------------------------------

def test_avi_dib_frame_with_jpeg_magic_bytes_decodes_as_dib():
    """Routing by payload magic misrouted a DIB frame whose bottom-left
    pixel is BGR(255,216,*) into the JPEG decoder (r9 review, verified
    by execution) — the container codec is authoritative."""
    import numpy as np

    from geoparquet_io_spark.functions.avi import (
        build_avi, decode_frame, extract_frames, parse_avi)

    w, h = 4, 2
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            # bottom-left pixel writes bytes FF D8 (JPEG SOI magic)
            row += bytes((255, 216, 5)) if (y == h - 1 and x == 0) \
                else bytes((0, 0, 0))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    buf = build_avi([b"".join(rows)], w, h, codec="DIB ")
    info = parse_avi(buf)
    out = decode_frame(extract_frames(buf, info)[0], info)
    assert out.shape == (2, 4, 3)
    assert tuple(out[-1, 0]) == (5, 216, 255)     # RGB of the BGR bytes


def test_avi_fractional_fps_roundtrip():
    from geoparquet_io_spark.functions.avi import build_avi, parse_avi

    buf = build_avi([b"\x00" * 16], 2, 2, fps=29.97, codec="DIB ")
    assert abs(parse_avi(buf).fps - 29.97) < 1e-9


def test_truncated_codec_inputs_raise_value_error():
    """Truncation is routine in a curation pipeline: every decoder's
    documented failure mode is ValueError, not IndexError/struct.error
    (r9 review, all verified by execution)."""
    import numpy as np
    import pytest

    from geoparquet_io_spark.functions.flac import (
        decode_flac, encode_flac, parse_streaminfo)
    from geoparquet_io_spark.functions.jpeg import decode_jpeg

    for bad in (b"\xff\xd8\xff\xe0", b"\xff\xd8\xff\xe0\x00\x02\xff"):
        with pytest.raises(ValueError, match="truncated JPEG"):
            decode_jpeg(bad)
    s = (np.sin(np.linspace(0, 20, 2000)) * 20000).astype("i4") \
        .reshape(-1, 2)
    f = encode_flac(s, sample_rate=8000, bits_per_sample=16)
    with pytest.raises(ValueError, match="truncated FLAC"):
        decode_flac(f[:len(f) // 2])
    with pytest.raises(ValueError, match="truncated FLAC"):
        parse_streaminfo(b"fLaC\x00\x00\x00")


def test_id3v22_tags_return_empty_not_garbage():
    from geoparquet_io_spark.functions.mp3 import id3v2_tags

    v22 = (b"ID3\x02\x00\x00" + bytes([0, 0, 0, 10])
           + b"TT2\x00\x00\x05\x00titl" + b"\xff\xfb\x90\x00" * 4)
    assert id3v2_tags(v22) == {}      # was raw MP3 bytes as "tag text"


def test_geotiff_rejects_rotated_transform_and_wide_epsg():
    import numpy as np
    import pytest

    from geoparquet_io_spark.functions.tiff import (
        build_geotiff, decode_tiff, geotiff_info)

    img = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="16-bit"):
        build_geotiff(img, epsg=102100, origin=(0.0, 0.0),
                      scale=(1.0, 1.0))
    # a rotated ModelTransformation must be rejected, not silently
    # misgeoreferenced: craft one by patching a written matrix
    buf = bytearray(build_geotiff(img, epsg=32633, origin=(10.0, 20.0),
                                  scale=(1.0, 1.0)))
    info = geotiff_info(bytes(buf))
    assert info.epsg == 32633
