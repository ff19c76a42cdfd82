"""GIF decoder vs an independent in-test encoder.

The encoder here implements GIF's LZW and block layout from the spec
text, sharing no code with ``functions/gif.py``, so a round-trip match
is real evidence (same discipline as the JPEG/PNG/AVI tests).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geoparquet_io_spark.functions.gif import (decode_gif,
                                               decode_gif_frames)


class _BitsLSB:
    """LSB-first bit packer (GIF code stream order)."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _BitsLSB()
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    bw.write(clear, width)
    prev = b""
    for sym in indices:
        cur = prev + bytes([int(sym)])
        if cur in table:
            prev = cur
            continue
        bw.write(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            bw.write(clear, width)
            width = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        prev = bytes([int(sym)])
    if prev:
        bw.write(table[prev], width)
    bw.write(end, width)
    return bw.flush()


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(h: int) -> list[int]:
    return (list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2)))


def encode_gif_ref(frames, palette, *, interlace=False, transparent=None,
                   delays_cs=None, disposals=None, local_tables=None,
                   bg_index=0, screen=None):
    """Independent GIF89a writer.

    ``frames``: list of (top, left, index-array) patches; ``palette``:
    (n, 3) global table (n a power of two); ``local_tables``: optional
    per-frame palettes.
    """
    palette = np.asarray(palette, dtype=np.uint8)
    nbits = max(int(np.ceil(np.log2(len(palette)))), 1)
    if screen is None:
        screen = (max(t + f.shape[0] for t, _, f in frames),
                  max(l + f.shape[1] for _, l, f in frames))
    h, w = screen
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (nbits - 1), bg_index, 0)
    pad = np.zeros(((1 << nbits) - len(palette), 3), np.uint8)
    out += np.vstack([palette, pad]).tobytes()
    for k, (top, left, idx) in enumerate(frames):
        if transparent is not None or delays_cs or disposals:
            gflags = (0x01 if transparent is not None else 0)
            if disposals:
                gflags |= (disposals[k] & 0x07) << 2
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", gflags, (delays_cs or [0] * len(frames))[k],
                transparent or 0) + b"\x00"
        ih, iw = idx.shape
        ltab = (local_tables or {}).get(k)
        iflags = (0x40 if interlace else 0)
        body = b""
        if ltab is not None:
            lb = max(int(np.ceil(np.log2(len(ltab)))), 1)
            iflags |= 0x80 | (lb - 1)
            lpad = np.zeros(((1 << lb) - len(ltab), 3), np.uint8)
            body = np.vstack([np.asarray(ltab, np.uint8), lpad]).tobytes()
            mcs = max(lb, 2)
        else:
            mcs = max(nbits, 2)
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, iflags)
        out += body
        rows = idx[_interlace_rows(ih)] if interlace else idx
        out += bytes([mcs]) + _subblocks(_lzw_encode(rows.ravel(), mcs))
    out += b"\x3b"
    return bytes(out)


def test_gif_single_frame_roundtrip():
    rng = np.random.RandomState(0)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (13, 17))
    buf = encode_gif_ref([(0, 0, idx)], pal)
    assert np.array_equal(decode_gif(buf), pal[idx])


def test_gif_long_stream_width_growth():
    """>4096-symbol image forces LZW width growth to 12 bits + dict reset."""
    rng = np.random.RandomState(1)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, (64, 96))
    buf = encode_gif_ref([(0, 0, idx)], pal)
    assert np.array_equal(decode_gif(buf), pal[idx])


def test_gif_interlaced():
    rng = np.random.RandomState(2)
    pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, (21, 9))
    buf = encode_gif_ref([(0, 0, idx)], pal, interlace=True)
    assert np.array_equal(decode_gif(buf), pal[idx])


def test_gif_animation_transparency_disposal():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    base = rng.randint(1, 8, (10, 10))
    patch = rng.randint(1, 8, (4, 4))
    patch[1, 1] = 0      # transparent hole
    buf = encode_gif_ref(
        [(0, 0, base), (3, 2, patch)], pal, transparent=0,
        delays_cs=[10, 25], disposals=[1, 0], screen=(10, 10))
    frames, delays = decode_gif_frames(buf)
    assert len(frames) == 2 and delays == [0.1, 0.25]
    assert np.array_equal(frames[0], pal[base])
    want = pal[base].copy()
    want[3:7, 2:6] = pal[patch]
    want[4, 3] = pal[base][4, 3]   # transparency preserves the canvas
    assert np.array_equal(frames[1], want)


def test_gif_local_color_table():
    rng = np.random.RandomState(4)
    gpal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    lpal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    f0 = rng.randint(0, 4, (6, 6))
    f1 = rng.randint(0, 8, (6, 6))
    buf = encode_gif_ref([(0, 0, f0), (0, 0, f1)], gpal,
                         local_tables={1: lpal}, screen=(6, 6))
    frames, _ = decode_gif_frames(buf)
    assert np.array_equal(frames[0], gpal[f0])
    assert np.array_equal(frames[1], lpal[f1])


def test_gif_rejects_non_gif():
    with pytest.raises(ValueError):
        decode_gif(b"NOPE" + b"\x00" * 32)


def test_gif_via_image_featurizer(spark):
    from geoparquet_io_spark.operators.multimodal import (
        extract_image_features)

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (32, 3)).astype(np.uint8)
    idx = rng.randint(0, 32, (7, 11))
    buf = encode_gif_ref([(0, 0, idx)], pal)
    df = spark.createDataFrame([(1, bytearray(buf))], ["id", "data"])
    row = extract_image_features(df).collect()[0]["image_features"]
    assert (row["width"], row["height"]) == (11, 7)
    assert abs(row["mean_luma"] - pal[idx].astype("f8").mean()) < 1e-9


def test_gif_lzw_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from geoparquet_io_spark.functions.gif import _lzw_decode

    @settings(max_examples=200, deadline=None)
    @given(st.integers(2, 8), st.data())
    def check(mcs, data):
        syms = data.draw(st.lists(
            st.integers(0, (1 << mcs) - 1), min_size=0, max_size=600))
        enc = _lzw_encode(syms, mcs)
        assert _lzw_decode(mcs, enc) == syms

    check()


def test_gif_disposal_3_restores_pre_draw_canvas():
    """Disposal 3 must revert to the canvas BEFORE the current frame
    drew — not frames[-2] (which, after a disposal-2 clear, is the
    pre-clear composite)."""
    from geoparquet_io_spark.functions.gif import decode_gif_frames

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    full = np.full((4, 4), 1, np.uint8)        # frame 0: all red
    patch = np.full((2, 2), 2, np.uint8)       # frames 1-2: green patch
    buf = encode_gif_ref(
        [(0, 0, full), (1, 1, patch), (0, 0, patch)], pal,
        disposals=[0, 2, 3], delays_cs=[1, 1, 1], screen=(4, 4),
        bg_index=0)
    frames, _ = decode_gif_frames(buf)
    # after frame 1 (disposal 2): its rect was cleared to background
    # frame 2 draws at (0,0) on the CLEARED canvas
    f2 = frames[2]
    assert tuple(f2[0, 0]) == (0, 255, 0)           # frame-2 patch
    assert tuple(f2[2, 2]) == (0, 0, 0)             # cleared, NOT red


def test_gif_oversized_descriptor_clipped():
    """A frame rect overhanging the logical screen is clipped like
    mainstream decoders do, not a numpy broadcast crash."""
    from geoparquet_io_spark.functions.gif import decode_gif

    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.ones((4, 4), np.uint8)
    buf = encode_gif_ref([(8, 8, idx)], pal, screen=(10, 10))
    arr = decode_gif(buf)
    assert arr.shape == (10, 10, 3)
    assert tuple(arr[9, 9]) == (255, 255, 255)
    assert tuple(arr[0, 0]) == (0, 0, 0)
