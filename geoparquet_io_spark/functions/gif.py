"""GIF87a/GIF89a decoder — pure python/numpy, no codec library.

Covers the format for real: logical screen descriptor, global/local
color tables, variable-width LZW decompression of the pixel indices,
interlaced images (the 4-pass row order), GIF89a graphic-control
extensions (transparency index, frame delay, disposal), and multi-frame
(animated) files composited onto the logical screen per the disposal
rules most files use (unspecified/keep = draw over previous canvas,
restore-background = clear the frame's rect first).

Feeds ``operators/multimodal.py`` the same way the BMP/PNG/JPEG
decoders do; animated GIFs also expose a frame list so the video
featurizer path can sample them.  Reference treats media through
external binaries (``core/convert.py``); here the whole format needs
none.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW: variable code width, clear/end codes, 12-bit cap."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                return out          # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            dictionary.append(prev + entry[:1])
        elif code == len(dictionary):   # the KwKwK case
            entry = prev + prev[:1]
            dictionary.append(entry)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        prev = entry
        if len(dictionary) >= (1 << width) and width < 12:
            width += 1


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(buf: bytes) -> tuple[list[np.ndarray], list[float]]:
    """Decode every frame of a GIF.

    Returns ``(frames, delays_s)`` — each frame is the fully composited
    (h, w, 3) uint8 RGB logical screen at that point of the animation;
    delays are the GIF89a graphic-control delays in seconds (0.0 when
    unspecified).
    """
    if len(buf) < 13 or buf[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF file")
    w, h, flags, bg_index, _ = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_table = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_table is not None and bg_index < len(global_table):
        canvas[:] = global_table[bg_index]
    background = canvas.copy()

    frames: list[np.ndarray] = []
    delays: list[float] = []
    transparent: int | None = None
    delay_s = 0.0
    disposal = 0

    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:       # trailer
            break
        if block == 0x21:       # extension
            label = buf[pos]
            pos += 1
            if label == 0xF9 and buf[pos] >= 4:   # graphic control
                gflags, delay_cs, tindex = struct.unpack_from(
                    "<BHB", buf, pos + 1)
                transparent = tindex if gflags & 0x01 else None
                delay_s = delay_cs / 100.0
                disposal = (gflags >> 2) & 0x07
            # skip sub-blocks (any extension type)
            while pos < len(buf) and buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")

        # image descriptor
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        table = global_table
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image without any color table")
        min_code_size = buf[pos]
        pos += 1
        chunks = []
        while pos < len(buf) and buf[pos]:
            sz = buf[pos]
            chunks.append(buf[pos + 1: pos + 1 + sz])
            pos += 1 + sz
        pos += 1   # block terminator

        idx = np.array(_lzw_decode(min_code_size, b"".join(chunks)),
                       dtype=np.int32)
        if len(idx) < iw * ih:
            idx = np.pad(idx, (0, iw * ih - len(idx)))
        idx = idx[: iw * ih].reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)

        # clip descriptors that overhang the logical screen (real-world
        # malformation every mainstream decoder clips): a raw assignment
        # would raise an unintelligible broadcast error
        ch = max(0, min(ih, canvas.shape[0] - top))
        cw = max(0, min(iw, canvas.shape[1] - left))
        idx = idx[:ch, :cw]
        patch = table[np.clip(idx, 0, len(table) - 1)]
        region = canvas[top:top + ch, left:left + cw]
        if transparent is not None:
            mask = (idx == transparent)[..., None]
            patch = np.where(mask, region, patch)
        # disposal 3 restores the state BEFORE this frame drew — which
        # is NOT frames[-1] when the previous frame's disposal already
        # mutated the canvas (e.g. disposal 2 background clears)
        pre_draw = canvas.copy() if disposal == 3 else None
        canvas[top:top + ch, left:left + cw] = patch
        frames.append(canvas.copy())
        delays.append(delay_s)

        if disposal == 2:       # restore background in the frame's rect
            canvas[top:top + ch, left:left + cw] = \
                background[top:top + ch, left:left + cw]
        elif disposal == 3:     # restore-previous: revert this frame
            canvas = pre_draw
        transparent = None
        delay_s = 0.0
        disposal = 0

    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays


def decode_gif(buf: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(buf)[0][0]
