"""FLAC decode/encode in pure Python+numpy — public spec (RFC 9639 /
xiph FLAC format), no codec library.

Decoder covers the full lossless core: STREAMINFO parsing, frame
headers (all blocksize/samplerate/bps codes, UTF-8-style coded
numbers), subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32),
Rice-partitioned residuals (4- and 5-bit params + escape-to-raw),
wasted bits, and all stereo decorrelations (L/S, R/S, M/S).  CRCs are
parsed but not enforced (decode is the goal; tampering shows up as
garbage samples the tests would catch).

Encoder is the verification subset (verbatim / constant / fixed
predictors with Rice residuals, independent channels) used by the
round-trip tests the same way the in-test JPEG/AVI encoders anchor the
image/video decoders.

Reference parity note: the reference repo has no audio codec at all —
this extends the multimodal surface (SURVEY 2.12-adjacent) the way
functions/mp3.py did for MPEG audio metadata.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


class _Bits:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8

    def read(self, n: int) -> int:
        # bulk read: one int.from_bytes over the covered byte span
        # instead of n single-bit loop iterations (headers are ~50 bits
        # per frame; the per-bit loop dominated small-frame decode)
        if n == 0:
            return 0
        pos = self.pos
        end = pos + n
        last = (end + 7) >> 3
        data = self.data
        if last > len(data):
            raise IndexError("bit read past end of data")
        chunk = int.from_bytes(data[pos >> 3:last], "big")
        self.pos = end
        return (chunk >> ((last << 3) - end)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        pos, data = self.pos, self.data
        while not (data[pos >> 3] >> (7 - (pos & 7))) & 1:
            n += 1
            pos += 1
        self.pos = pos + 1
        return n

    def align(self):
        self.pos = (self.pos + 7) & ~7


def parse_streaminfo(data: bytes) -> dict:
    """STREAMINFO block of a FLAC stream -> dict of stream parameters."""
    if data[:4] != MAGIC:
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    try:
        return _parse_streaminfo_inner(data)
    except IndexError:
        raise ValueError(
            "truncated FLAC stream (metadata cut short)") from None


def _parse_streaminfo_inner(data: bytes) -> dict:
    pos = 4
    info = None
    while True:
        hdr = data[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        size = int.from_bytes(data[pos + 1:pos + 4], "big")
        if btype == 0:
            b = _Bits(data, pos + 4)
            info = {
                "min_block": b.read(16), "max_block": b.read(16),
                "min_frame": b.read(24), "max_frame": b.read(24),
                "sample_rate": b.read(20),
                "channels": b.read(3) + 1,
                "bits_per_sample": b.read(5) + 1,
                "total_samples": b.read(36),
                "frames_offset": None,
            }
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO block")
    info["frames_offset"] = pos
    return info


def _coded_number(b: _Bits) -> int:
    """UTF-8-style variable-length frame/sample number."""
    first = b.read(8)
    if first < 0x80:
        return first
    n_ones = 0
    v = first
    while v & 0x80:
        n_ones += 1
        v <<= 1
    out = first & (0x7F >> n_ones)
    for _ in range(n_ones - 1):
        out = (out << 6) | (b.read(8) & 0x3F)
    return out


def _residual(b: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = b.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = b.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition count does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = b.read(pbits)
        if param == escape:
            raw = b.read(5)
            for i in range(n):
                out[idx + i] = b.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = b.unary()
                u = (q << param) | b.read(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += n
    return out


def _subframe(b: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if b.read(1):
        raise ValueError("subframe padding bit set")
    stype = b.read(6)
    wasted = 0
    if b.read(1):
        wasted = b.unary() + 1
    eff = bps - wasted
    if stype == 0:                       # CONSTANT
        out = np.full(blocksize, b.read_signed(eff), dtype=np.int64)
    elif stype == 1:                     # VERBATIM
        nbytes = eff >> 3
        end = (b.pos >> 3) + nbytes * blocksize
        if (b.pos & 7) == 0 and eff in (8, 16, 32) and end <= len(b.data):
            # byte-aligned whole-byte samples ARE a big-endian signed
            # integer array: one numpy frombuffer replaces blocksize x
            # eff single-bit reads (the per-sample python loop was the
            # whole decode cost for verbatim streams).  Arithmetic is
            # identical: read_signed(n) == big-endian two's complement.
            out = np.frombuffer(b.data, dtype=f">i{nbytes}",
                                count=blocksize,
                                offset=b.pos >> 3).astype(np.int64)
            b.pos += (eff * blocksize)
        else:
            # unaligned / odd widths / truncated tail: bit-exact scalar
            # path (truncation then raises through the usual contract)
            out = np.array([b.read_signed(eff) for _ in range(blocksize)],
                           dtype=np.int64)
    elif 8 <= stype <= 12:               # FIXED order 0-4
        order = stype - 8
        warm = [b.read_signed(eff) for _ in range(order)]
        res = _residual(b, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            acc = res[i - order]
            for k, c in enumerate(coefs):
                acc += c * out[i - 1 - k]
            out[i] = acc
    elif stype >= 32:                    # LPC order 1-32
        order = stype - 31
        warm = [b.read_signed(eff) for _ in range(order)]
        precision = b.read(4) + 1
        shift = b.read_signed(5)
        coefs = [b.read_signed(precision) for _ in range(order)]
        res = _residual(b, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for k in range(order):
                acc += coefs[k] * out[i - 1 - k]
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted if wasted else out


_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(data: bytes) -> tuple[np.ndarray, dict]:
    """FLAC bytes -> (samples[n, channels] int32, streaminfo dict).

    Truncated input raises ValueError like every other malformation —
    the bit reader's bare IndexError escaped to callers that catch the
    documented error contract."""
    try:
        return _decode_flac_inner(data)
    except IndexError:
        raise ValueError("truncated FLAC stream (ran out of bytes "
                         "mid-frame)") from None


def _decode_flac_inner(data: bytes) -> tuple[np.ndarray, dict]:
    info = parse_streaminfo(data)
    b = _Bits(data, info["frames_offset"])
    nch = info["channels"]
    chunks: list[np.ndarray] = []
    got = 0
    total = info["total_samples"]
    while got < total or (total == 0 and b.pos + 16 <= len(data) * 8):
        sync = b.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"lost frame sync at bit {b.pos - 14}")
        b.read(1)                        # reserved
        b.read(1)                        # blocking strategy
        bs_code = b.read(4)
        sr_code = b.read(4)
        ch_code = b.read(4)
        bps_code = b.read(3)
        b.read(1)                        # reserved
        _coded_number(b)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = b.read(8) + 1
        elif bs_code == 7:
            blocksize = b.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            b.read(8)
        elif sr_code in (13, 14):
            b.read(16)
        bps = info["bits_per_sample"] if bps_code == 0 \
            else _BPS_CODES[bps_code]
        b.read(8)                        # CRC-8 (not enforced)
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("frame channel count != STREAMINFO")
            chans = [_subframe(b, blocksize, bps) for _ in range(nch)]
        else:                            # stereo decorrelation
            if nch != 2:
                raise ValueError("decorrelated frame in non-stereo stream")
            if ch_code == 8:             # left/side
                left = _subframe(b, blocksize, bps)
                side = _subframe(b, blocksize, bps + 1)
                chans = [left, left - side]
            elif ch_code == 9:           # right/side
                side = _subframe(b, blocksize, bps + 1)
                right = _subframe(b, blocksize, bps)
                chans = [right + side, right]
            elif ch_code == 10:          # mid/side
                mid = _subframe(b, blocksize, bps)
                side = _subframe(b, blocksize, bps + 1)
                m2 = (mid << 1) | (side & 1)
                chans = [(m2 + side) >> 1, (m2 - side) >> 1]
            else:
                raise ValueError(f"reserved channel assignment {ch_code}")
        b.align()
        b.read(16)                       # CRC-16 (not enforced)
        chunks.append(np.stack(chans, axis=1))
        got += blocksize
    samples = np.concatenate(chunks, axis=0) if chunks else \
        np.zeros((0, nch), dtype=np.int64)
    if total:
        samples = samples[:total]
    return samples.astype(np.int32), info


# ---------------------------------------------------------------------------
# Encoder (verification subset)
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def align(self):
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _write_rice(w: _BitWriter, residuals: np.ndarray, param: int):
    for r in residuals:
        u = (int(r) << 1) if r >= 0 else ((-int(r)) << 1) - 1   # zigzag
        q, rem = u >> param, u & ((1 << param) - 1)
        w.write(0, q)
        w.write(1, 1)
        w.write(rem, param)


def _best_rice_param(res: np.ndarray) -> int:
    # zigzag once: it is independent of p (was recomputed 15x per
    # subframe in the encoder's parameter search)
    u = np.where(res >= 0, res.astype(np.int64) << 1,
                 ((-res.astype(np.int64)) << 1) - 1)
    best, bestbits = 0, None
    for p in range(15):
        bits = int(np.sum((u >> p) + 1 + p))
        if bestbits is None or bits < bestbits:
            best, bestbits = p, bits
    return best


def _write_coded_number(w: "_BitWriter", f: int) -> None:
    """Coded frame number: full UTF-8-style coded number (1-7 bytes),
    matching the decoder's _coded_number — a fixed 2-byte form silently
    desyncs any stream with >= 2048 frames."""
    if f < 0x80:
        w.write(f, 8)
        return
    tail = []
    v = f
    while True:
        tail.append(0x80 | (v & 0x3F))
        v >>= 6
        nbytes = len(tail) + 1
        if nbytes > 7:
            # >= 2^36 frames cannot be coded in the 7-byte form; without
            # this the next check computes 1 << -1 (negative shift)
            raise ValueError(
                f"frame number {f} too large for FLAC coded number "
                "(max 7 bytes / 36 value bits)")
        # lead byte has (7 - nbytes) free value bits
        if v < (1 << (7 - nbytes)):
            break
    lead = (0xFF00 >> nbytes) & 0xFF
    w.write(lead | v, 8)
    for b in reversed(tail):
        w.write(b, 8)


def encode_flac(samples: np.ndarray, sample_rate: int = 44100,
                bits_per_sample: int = 16, blocksize: int = 4096,
                subframe: str = "fixed") -> bytes:
    """PCM -> FLAC bytes (independent channels; ``subframe`` in
    {"verbatim", "constant-or-verbatim", "fixed"}).  The "fixed" mode
    picks the best fixed predictor order 0-2 per subframe with one Rice
    partition — small files, exercises the decoder's predictor and Rice
    paths.  "verbatim" stores raw samples (the form whose payload bytes
    a SQL oracle can recompute against)."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    out = bytearray(MAGIC)
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16     # md5 unset (allowed)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for f, start in enumerate(range(0, n, blocksize)):
        blk = samples[start:start + blocksize]
        bs = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)
        w.write(7, 4)                    # blocksize: 16-bit field
        w.write(0, 4)                    # sample rate: from streaminfo
        w.write(nch - 1, 4)              # independent channels
        # bps code must match bits_per_sample or the decoder reads the
        # wrong sample width and desyncs (the table is _BPS_CODES)
        bps_code = {v: k for k, v in _BPS_CODES.items()}.get(bits_per_sample)
        if bps_code is None:
            raise ValueError(
                f"bits_per_sample {bits_per_sample} has no FLAC frame "
                f"code (supported: {sorted(_BPS_CODES.values())})")
        w.write(bps_code, 3)
        w.write(0, 1)
        _write_coded_number(w, f)
        w.write(bs - 1, 16)
        assert w.nacc == 0               # header fields are byte-aligned
        w.write(_crc8(bytes(w.buf)), 8)
        for ch in range(nch):
            s = blk[:, ch]
            w.write(0, 1)
            if subframe == "verbatim":
                w.write(1, 6)
                w.write(0, 1)
                for v in s:
                    w.write(int(v), bits_per_sample)
                continue
            if subframe == "constant-or-verbatim" and np.all(s == s[0]):
                w.write(0, 6)
                w.write(0, 1)
                w.write(int(s[0]), bits_per_sample)
                continue
            if subframe == "fixed" and len(s) > 2:
                # choose order 0-2 by residual magnitude
                cands = {0: s.copy(), 1: s[1:] - s[:-1],
                         2: np.diff(np.diff(s))}
                order = min((int(np.abs(r).sum()), o)
                            for o, r in cands.items())[1]
                res = cands[order]
                w.write(8 + order, 6)
                w.write(0, 1)
                for v in s[:order]:
                    w.write(int(v), bits_per_sample)
                p = _best_rice_param(res)
                w.write(0, 2)            # rice method 0
                w.write(0, 4)            # partition order 0
                w.write(p, 4)
                _write_rice(w, res, p)
            else:
                w.write(1, 6)
                w.write(0, 1)
                for v in s:
                    w.write(int(v), bits_per_sample)
        w.align()
        frame_wo_crc = w.bytes()
        crc16 = _crc16(frame_wo_crc)
        out += frame_wo_crc + struct.pack(">H", crc16)
    return bytes(out)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc
