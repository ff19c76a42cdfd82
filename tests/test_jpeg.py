"""Baseline JPEG decoder (functions/jpeg.py) tests.

Two independent validation paths, mirroring the PNG test strategy:
1. a plain-python baseline JPEG ENCODER lives in this file (own bit
   writer, own canonical Huffman construction, 4:4:4 / grayscale,
   optional restart markers) — the decoder must reproduce the
   encoder's quantized reconstruction BYTE-EXACTLY (same IDCT math);
2. the JVM's javax.imageio (a wholly independent codec shipped with
   Spark) encodes 4:2:0 color and grayscale images — the decoder must
   agree with ImageIO's own raster decode within IDCT rounding
   tolerance (T.81 permits tiny per-pixel IDCT differences).
"""

import struct

import numpy as np
import pytest

from geoparquet_io_spark.functions.jpeg import _A, ZIGZAG, decode_jpeg

# ---------------------------------------------------------------------------
# reference encoder (independent entropy coding; shares only the DCT basis
# constants so the quantized-reconstruction comparison is byte-exact)
# ---------------------------------------------------------------------------

QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)  # T.81 Annex K luminance table, natural order


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def align(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _flat_huffman(symbols):
    """All symbols at one canonical length L (valid: nsym < 2^L)."""
    nsym = len(symbols)
    length = max(2, int(np.ceil(np.log2(nsym + 1))))
    counts = [0] * 16
    counts[length - 1] = nsym
    codes = {s: (length, i) for i, s in enumerate(sorted(symbols))}
    return bytes(counts), bytes(sorted(symbols)), codes

DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                          for s in range(1, 11)]


def _category(v):
    return int(v).bit_length() if v else 0


def _encode_block(bw, coef_zz, pred, dc_codes, ac_codes):
    diff = int(coef_zz[0]) - pred
    s = _category(abs(diff))
    ln, code = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(abs(v))
        ln, code = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = ac_codes[0x00]
        bw.write(code, ln)
    return int(coef_zz[0])


def encode_jpeg_ref(img, restart_interval=0):
    """Baseline encoder: grayscale (h,w) or RGB (h,w,3) at 4:4:4.
    Returns (jpeg_bytes, reconstruction) where reconstruction is the
    exact decoded image implied by the quantized coefficients."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2] + 128.0
        planes = [y, cb, cr]
    q = QLUM  # one table for every component (encoder's choice)
    bh, bw_ = -(-h // 8), -(-w // 8)
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")
        padded.append(pp)
    dc_counts, dc_syms, dc_codes = _flat_huffman(DC_SYMS)
    ac_counts, ac_syms, ac_codes = _flat_huffman(AC_SYMS)

    # headers
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        q[ZIGZAG].astype(np.uint8))  # DQT id 0, zigzag order
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])  # 4:4:4, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, syms) in ((0, (dc_counts, dc_syms)),
                               (1, (ac_counts, ac_syms))):
        body = bytes([tc << 4]) + counts + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # entropy + exact reconstruction
    recon = [np.zeros_like(p) for p in padded]
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                out += bytes(bw.out)
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                blk = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _A @ (blk - 128.0) @ _A.T
                qz = np.rint(coef.reshape(64) / q).astype(np.int64)
                coef_zz = qz[ZIGZAG]  # natural -> zigzag stream order
                preds[ci] = _encode_block(bw, coef_zz, preds[ci],
                                          dc_codes, ac_codes)
                # decoder-identical reconstruction
                deq = np.zeros(64)
                deq[ZIGZAG] = coef_zz * q[ZIGZAG]
                recon[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    _A.T @ deq.reshape(8, 8) @ _A + 128.0
            mcu += 1
    bw.align()
    out += bytes(bw.out) + b"\xff\xd9"
    crop = [r[:h, :w] for r in recon]
    if gray:
        expected = np.clip(np.rint(crop[0]), 0, 255).astype(np.uint8)
    else:
        y, cb, cr = crop
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        expected = np.clip(np.rint(np.stack([r, g, b], -1)), 0,
                           255).astype(np.uint8)
    return bytes(out), expected


def _test_image(h, w, channels=3, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 4 + yy * 7) % 256
    noise = rng.integers(0, 40, size=(h, w))
    img = ((base + noise) % 256).astype(np.uint8)
    if channels == 3:
        img = np.stack([img, np.roll(img, 3, 0), 255 - img], -1)
    return img


# ---------------------------------------------------------------------------
# byte-exact vs the reference encoder's reconstruction
# ---------------------------------------------------------------------------

def test_gray_roundtrip_byte_exact():
    img = _test_image(41, 35, channels=1)
    data, expected = encode_jpeg_ref(img)
    got = decode_jpeg(data)
    assert got.shape == (41, 35)
    assert np.array_equal(got, expected)


def test_rgb_444_roundtrip_byte_exact():
    img = _test_image(24, 31, channels=3)
    data, expected = encode_jpeg_ref(img)
    got = decode_jpeg(data)
    assert got.shape == (24, 31, 3)
    assert np.array_equal(got, expected)


def test_restart_markers_byte_exact():
    img = _test_image(40, 40, channels=1)
    data, expected = encode_jpeg_ref(img, restart_interval=3)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    got = decode_jpeg(data)
    assert np.array_equal(got, expected)


def test_unsupported_processes_rejected():
    # lossless sequential (SOF3) and arithmetic baseline (SOF9) must
    # fail loudly; progressive (SOF2) is supported since r4
    img = _test_image(16, 16, channels=1)
    data, _ = encode_jpeg_ref(img)
    for marker in (b"\xff\xc3", b"\xff\xc9"):
        patched = data.replace(b"\xff\xc0", marker, 1)
        with pytest.raises(ValueError, match="unsupported JPEG process"):
            decode_jpeg(patched)


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG....")


# ---------------------------------------------------------------------------
# cross-validation against the JVM's javax.imageio (independent codec)
# ---------------------------------------------------------------------------

def _imageio_encode(spark, arr, gray):
    jvm = spark._jvm
    h, w = arr.shape[:2]
    t = (jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY if gray
         else jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
    bi = jvm.java.awt.image.BufferedImage(w, h, t)
    if gray:
        raster = bi.getRaster()
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, int(arr[y, x]))
    else:
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in arr[y, x])
                bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    return bytes(baos.toByteArray())


def _imageio_decode_raster(spark, data, bands):
    jvm = spark._jvm
    bi = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(data)))
    r = bi.getRaster()
    h, w = bi.getHeight(), bi.getWidth()
    out = np.zeros((h, w, bands), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            for b in range(bands):
                out[y, x, b] = r.getSample(x, y, b)
    return out[:, :, 0] if bands == 1 else out


def test_cross_imageio_gray(spark):
    img = _test_image(40, 33, channels=1)
    data = _imageio_encode(spark, img, gray=True)
    got = decode_jpeg(data)
    ref = _imageio_decode_raster(spark, data, 1)
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= 2, d.max()  # IDCT rounding tolerance (T.81)


def test_cross_imageio_rgb_420(spark):
    """ImageIO writes 4:2:0 color — exercises chroma upsampling +
    YCbCr conversion against an independent codec.  Edge pixels can
    differ more where the two decoders upsample differently, so the
    gate is on mean error with a loose max."""
    h, w = 40, 48
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 5) % 256, (yy * 5) % 256,
                    ((xx + yy) * 3) % 256], -1)
    img = (img // 2 + 64).astype(np.uint8)
    data = _imageio_encode(spark, img, gray=False)
    got = decode_jpeg(data)
    ref = _imageio_decode_raster(spark, data, 3)
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.mean() < 2.0 and d.max() <= 32, (d.mean(), d.max())


# ---------------------------------------------------------------------------
# featurizer end-to-end over a binary column
# ---------------------------------------------------------------------------

def test_jpeg_feeds_image_featurizer(spark):
    from geoparquet_io_spark.operators.multimodal import (
        extract_image_features)

    imgs = [_test_image(16 + 8 * i, 24, channels=3, seed=i)
            for i in range(3)]
    rows = [(i, encode_jpeg_ref(im)[0]) for i, im in enumerate(imgs)]
    df = spark.createDataFrame(rows, "id long, data binary")
    got = {r["id"]: r["image_features"]
           for r in extract_image_features(df).collect()}
    for i, im in enumerate(imgs):
        f = got[i]
        assert (f["width"], f["height"]) == (24, 16 + 8 * i)
        # decoded luma tracks the source image's luma
        assert abs(f["mean_luma"] - float(im.mean())) < 6.0


# ---------------------------------------------------------------------------
# progressive (SOF2) — cross-validated against ImageIO's progressive writer
# ---------------------------------------------------------------------------

def _imageio_encode_progressive(spark, arr, gray):
    jvm = spark._jvm
    h, w = arr.shape[:2]
    t = (jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY if gray
         else jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
    bi = jvm.java.awt.image.BufferedImage(w, h, t)
    if gray:
        raster = bi.getRaster()
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, int(arr[y, x]))
    else:
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in arr[y, x])
                bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    writers = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
    writer = writers.next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(
        jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.flush()
    return bytes(baos.toByteArray())


def _is_progressive(data: bytes) -> bool:
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            return False
        m = data[i + 1]
        if m == 0xC2:
            return True
        if m in (0xC0, 0xC1, 0xDA):
            return False
        import struct as _s
        (ln,) = _s.unpack(">H", data[i + 2:i + 4])
        i += 2 + ln
    return False


def test_progressive_cross_imageio_gray(spark):
    img = _test_image(40, 33, channels=1)
    data = _imageio_encode_progressive(spark, img, gray=True)
    assert _is_progressive(data), "ImageIO did not emit SOF2"
    got = decode_jpeg(data)
    ref = _imageio_decode_raster(spark, data, 1)
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= 2, d.max()


def test_progressive_cross_imageio_rgb_420(spark):
    h, w = 40, 48
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 5) % 256, (yy * 5) % 256,
                    ((xx + yy) * 3) % 256], -1)
    img = (img // 2 + 64).astype(np.uint8)
    data = _imageio_encode_progressive(spark, img, gray=False)
    assert _is_progressive(data), "ImageIO did not emit SOF2"
    got = decode_jpeg(data)
    ref = _imageio_decode_raster(spark, data, 3)
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.mean() < 2.0 and d.max() <= 32, (d.mean(), d.max())


def test_progressive_matches_baseline_content(spark):
    """The same image encoded baseline and progressive by the same
    writer must decode to near-identical pixels through OUR decoder —
    the two entropy paths reconstruct the same DCT coefficients."""
    img = _test_image(24, 31, channels=1, seed=9)
    seq = _imageio_encode(spark, img, gray=True)
    prog = _imageio_encode_progressive(spark, img, gray=True)
    a = decode_jpeg(seq).astype(int)
    b = decode_jpeg(prog).astype(int)
    assert np.abs(a - b).max() <= 2


# ---------------------------------------------------------------------------
# review regressions: fill bytes, non-interleaved scans, 2x2 grayscale
# ---------------------------------------------------------------------------

def encode_jpeg_noninterleaved(img):
    """Baseline RGB encoder emitting THREE single-component scans
    (T.81-legal non-interleaved layout) at 4:4:4."""
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
        + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
        - 0.081312 * rgb[..., 2] + 128.0
    planes = [y, cb, cr]
    q = QLUM
    bh, bw_ = -(-h // 8), -(-w // 8)
    padded = [np.pad(p, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")
              for p in planes]
    dc_counts, dc_syms, dc_codes = _flat_huffman(DC_SYMS)
    ac_counts, ac_syms, ac_codes = _flat_huffman(AC_SYMS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        q[ZIGZAG].astype(np.uint8))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c in range(3):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, syms) in ((0, (dc_counts, dc_syms)),
                               (1, (ac_counts, ac_syms))):
        body = bytes([tc << 4]) + counts + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    recon = [np.zeros_like(p) for p in padded]
    for ci in range(3):
        sos = bytes([1, ci + 1, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        bw = _BitWriter()
        pred = 0
        for by in range(bh):
            for bx in range(bw_):
                blk = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _A @ (blk - 128.0) @ _A.T
                qz = np.rint(coef.reshape(64) / q).astype(np.int64)
                coef_zz = qz[ZIGZAG]
                pred = _encode_block(bw, coef_zz, pred, dc_codes, ac_codes)
                deq = np.zeros(64)
                deq[ZIGZAG] = coef_zz * q[ZIGZAG]
                recon[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    _A.T @ deq.reshape(8, 8) @ _A + 128.0
        bw.align()
        out += bytes(bw.out)
    out += b"\xff\xd9"
    yc, cbc, crc = [r[:h, :w] for r in recon]
    r = yc + 1.402 * (crc - 128.0)
    g = yc - 0.344136 * (cbc - 128.0) - 0.714136 * (crc - 128.0)
    b = yc + 1.772 * (cbc - 128.0)
    expected = np.clip(np.rint(np.stack([r, g, b], -1)), 0,
                       255).astype(np.uint8)
    return bytes(out), expected


def test_noninterleaved_three_scan_baseline():
    img = _test_image(21, 18)
    data, expected = encode_jpeg_noninterleaved(img)
    got = decode_jpeg(data)
    assert np.array_equal(got, expected)


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2 allows 0xFF fill bytes before any marker."""
    img = _test_image(16, 16, channels=1)
    data, expected = encode_jpeg_ref(img)
    assert data.endswith(b"\xff\xd9")
    padded = data[:-2] + b"\xff\xff\xff" + b"\xff\xd9"
    assert np.array_equal(decode_jpeg(padded), expected)


def test_grayscale_declared_2x2_sampling():
    """A single-component frame declaring 2x2 sampling walks its own
    ceil(w/8) block raster (libjpeg normalizes single-component scans
    to 1x1) — the MCU-padded walk desynced on valid files."""
    img = _test_image(20, 20, channels=1)
    data, expected = encode_jpeg_ref(img)
    # patch the SOF sampling byte for component 1: 0x11 -> 0x22
    sof_at = data.find(b"\xff\xc0")
    patched = bytearray(data)
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) then cid, hv, tq
    hv_at = sof_at + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert patched[hv_at] == 0x11
    patched[hv_at] = 0x22
    got = decode_jpeg(bytes(patched))
    assert np.array_equal(got, expected)
