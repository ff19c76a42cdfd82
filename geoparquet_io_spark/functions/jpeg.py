"""Baseline JPEG decoder in pure python + numpy (no codec library).

Implements the baseline sequential DCT process of ITU-T T.81 (the
public JPEG standard): marker parse (DQT/DHT/SOF0/SOF1/DRI/SOS),
canonical Huffman entropy decode with byte unstuffing and restart
markers, DC prediction, dequantize + dezigzag, exact 8x8 inverse DCT
via the orthonormal cosine basis (float64 matrix products), chroma
upsampling for 4:2:0 / 4:2:2 / 4:1:1 layouts, and the standard
YCbCr -> RGB conversion.  Progressive (SOF2) and arithmetic-coded
streams are rejected loudly.

Scope: this is the CORRECTNESS decoder for the multimodal feature
pipeline (operators/multimodal.py) — a python-loop entropy decoder is
fine inside an Arrow-batched UDF where each task decodes its own
files; it is not a throughput codec.  Reference surface: the reference
engine shells image decode out to GDAL/PIL-class libraries
(absent in this container); this replaces the loud gate for the most
common compressed format with a real implementation.

Decoder-conformance note: T.81 allows tiny IDCT rounding differences
between implementations, so tests compare against an independent
decoder (the JVM's javax.imageio) with a small per-pixel tolerance
instead of byte equality.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal 8x8 DCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _Bits:
    """MSB-first bit reader over unstuffed entropy bytes."""

    __slots__ = ("d", "n", "pos")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data) * 8
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("truncated JPEG entropy data")
        b = (self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v


def _build_huffman(counts: bytes, symbols: bytes) -> dict:
    """Canonical JPEG Huffman table -> {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v


def _split_scan(buf: bytes, i: int) -> tuple[list[bytes], int]:
    """Entropy data from offset i: unstuff FF00, split at RSTn, stop at
    any other marker.  Returns (segments, offset_of_next_marker)."""
    segments: list[bytes] = []
    cur = bytearray()
    n = len(buf)
    while i < n:
        b = buf[i]
        if b == 0xFF:
            nb = buf[i + 1] if i + 1 < n else None
            if nb == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if nb is not None and 0xD0 <= nb <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline JPEG -> uint8 array (h, w) grayscale or
    (h, w, 3) RGB."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    i = 2
    n = len(buf)
    while i < n:
        if buf[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        m = buf[i + 1]
        i += 2
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        (seg_len,) = struct.unpack(">H", buf[i:i + 2])
        seg = buf[i + 2:i + seg_len]
        i += seg_len
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8
                                        ).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2"
                                        ).astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = seg[p + 1:p + 17]
                nsym = sum(counts)
                symbols = seg[p + 17:p + 17 + nsym]
                huff[(tc, th)] = _build_huffman(counts, symbols)
                p += 17 + nsym
        elif m in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (got {prec})")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG process (SOF marker "
                             f"0x{m:02X})")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                scomps.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 15})
            segments, i = _split_scan(buf, i)
            scan = {"comps": scomps, "segments": segments}
            # baseline: single scan; ignore anything after it except EOI
            break
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    return _decode_scan(frame, scan, qt, huff, restart_interval)


def _decode_scan(frame, scan, qt, huff, restart_interval) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
    order = [by_id[s["cs"]] | {"td": s["td"], "ta": s["ta"]}
             for s in scan["comps"]]
    segments = scan["segments"]
    total_mcus = mcus_x * mcus_y
    seg_idx = 0
    bits = _Bits(segments[0])
    pred = {c["id"]: 0 for c in comps}
    per_seg = restart_interval if restart_interval else total_mcus
    for mcu in range(total_mcus):
        if mcu > 0 and mcu % per_seg == 0 and seg_idx + 1 < len(segments):
            seg_idx += 1
            bits = _Bits(segments[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for c in order:
            q = qt[c["tq"]]
            dc_tbl = huff[(0, c["td"])]
            ac_tbl = huff[(1, c["ta"])]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.int64)
                    s = _huff_decode(bits, dc_tbl)
                    diff = _extend(bits.read(s), s) if s else 0
                    pred[c["id"]] += diff
                    coef[0] = pred[c["id"]]
                    k = 0
                    while k < 63:
                        rs = _huff_decode(bits, ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r + 1
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        coef[k] = _extend(bits.read(s), s)
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = coef * q
                    spatial = _A.T @ block.reshape(8, 8) @ _A + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = spatial
    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
