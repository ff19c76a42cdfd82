"""MPEG audio (MP3/MP2/MP1) frame-level parsing — pure python.

What a 100 TB audio-curation pipeline needs from MP3 files is almost
always frame-level metadata — duration, bitrate mode, sample rate,
channel mode, frame count, truncation — not PCM.  All of that is
computable from the public ISO 11172-3 / 13818-3 header layout with no
codec library, and that is what this module does for REAL:

- frame sync + header field decode (MPEG-1/2/2.5, Layer I-III, the
  published bitrate/sample-rate tables, padding, channel mode)
- frame length arithmetic and a full frame walk (so a truncated or
  corrupted tail is detected, not guessed)
- ID3v2 tag skip (syncsafe size) and ID3v1 tail detection
- Xing/Info and VBRI headers for variable-bitrate duration

Full PCM decode (Huffman entropy tables + hybrid filterbank) genuinely
requires a codec implementation this container cannot verify bit-exactly
and stays gated in ``operators/multimodal.py`` with a loud error.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

# ISO 11172-3 Table B.1 (kbit/s); index 0 = free format, 15 = invalid.
_BITRATE = {
    # (version_key, layer): row   — version_key: 1 = MPEG-1, 2 = MPEG-2/2.5
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_SAMPLE_RATE = {   # Hz by version bits (00=2.5, 10=2, 11=1), index 0-2
    0: [11025, 12000, 8000],    # MPEG-2.5
    2: [22050, 24000, 16000],   # MPEG-2
    3: [44100, 48000, 32000],   # MPEG-1
}

_SAMPLES_PER_FRAME = {  # (version_key, layer)
    (1, 1): 384, (1, 2): 1152, (1, 3): 1152,
    (2, 1): 384, (2, 2): 1152, (2, 3): 576,
}

_MODE = ["stereo", "joint_stereo", "dual_channel", "mono"]


class Mp3Frame(NamedTuple):
    offset: int
    size: int               # whole frame incl. header
    version: str            # "1" | "2" | "2.5"
    layer: int              # 1 | 2 | 3
    bitrate_kbps: int
    sample_rate: int
    samples: int
    mode: str
    crc: bool


class Mp3Info(NamedTuple):
    frames: list            # list[Mp3Frame]
    duration_s: float
    avg_bitrate_kbps: float
    vbr: bool
    xing_frames: int | None     # frame count claimed by a Xing/VBRI header
    id3v2_size: int             # bytes skipped at the front (0 if none)
    trailing_garbage: int       # unparseable bytes at the tail


def _id3v2_size(buf: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if absent)."""
    if len(buf) < 10 or buf[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in buf[6:10]):
        return 0    # size is syncsafe; a set high bit means not a tag
    size = (buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9]
    footer = 10 if buf[5] & 0x10 else 0
    return 10 + size + footer


def parse_frame_header(buf: bytes, pos: int) -> Mp3Frame | None:
    """Decode the 4-byte header at ``pos``; None if not a valid frame."""
    if pos + 4 > len(buf):
        return None
    h = struct.unpack_from(">I", buf, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (h >> 19) & 0x3
    lbits = (h >> 17) & 0x3
    if vbits == 1 or lbits == 0:
        return None
    version = {0: "2.5", 2: "2", 3: "1"}[vbits]
    vkey = 1 if vbits == 3 else 2
    layer = 4 - lbits
    crc = not ((h >> 16) & 0x1)
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None     # free-format / invalid — don't guess lengths
    bitrate = _BITRATE[(vkey, layer)][br_idx]
    rate = _SAMPLE_RATE[vbits][sr_idx]
    padding = (h >> 9) & 0x1
    mode = _MODE[(h >> 6) & 0x3]
    samples = _SAMPLES_PER_FRAME[(vkey, layer)]
    if layer == 1:
        size = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        size = samples // 8 * bitrate * 1000 // rate + padding
    return Mp3Frame(pos, size, version, layer, bitrate, rate, samples,
                    mode, crc)


def _xing_frame_count(buf: bytes, frame: Mp3Frame):
    """(frame count, tag kind) from a Xing/Info/VBRI header in the
    first frame, or (None, None).  The KIND matters: LAME writes
    'Xing' for VBR streams but 'Info' for CBR — treating any tag as
    VBR misclassified virtually every LAME CBR file."""
    # Xing offset: header(4) + optional CRC(2) + side info
    side = {("1", False): 17, ("1", True): 32,
            ("2", False): 9, ("2", True): 17}[
        ("1" if frame.version == "1" else "2", frame.mode != "mono")]
    p = frame.offset + 4 + (2 if frame.crc else 0) + side
    tag = bytes(buf[p:p + 4])
    if tag in (b"Xing", b"Info"):
        flags = struct.unpack_from(">I", buf, p + 4)[0]
        if flags & 0x1:
            return struct.unpack_from(">I", buf, p + 8)[0], tag.decode()
        return None, tag.decode()
    q = frame.offset + 4 + 32    # VBRI sits at a fixed 32-byte offset
    if buf[q:q + 4] == b"VBRI":
        return struct.unpack_from(">I", buf, q + 14)[0], "VBRI"
    return None, None


def parse_mp3(buf: bytes, max_resync: int = 1 << 16) -> Mp3Info:
    """Walk every frame of an MPEG audio stream.

    Resyncs after at most ``max_resync`` bytes of garbage (a corrupt
    region bigger than that raises).  Raises ``ValueError`` when no
    valid frame exists at all.
    """
    start = _id3v2_size(buf)
    end = len(buf)
    if end >= 128 and buf[end - 128:end - 125] == b"TAG":
        end -= 128      # ID3v1 tail
    frames: list[Mp3Frame] = []
    xing, tag_kind = None, None
    pos = start
    garbage = 0
    truncated = False
    while pos + 4 <= end:
        fr = parse_frame_header(buf, pos)
        if fr is None or pos + fr.size > end:
            if fr is not None and pos + fr.size > end:
                # truncated final frame: ADD the remaining bytes — the
                # bare assignment silently dropped resync garbage
                # already counted before this header
                garbage += end - pos
                truncated = True
                break
            pos += 1
            garbage += 1
            if garbage > max_resync:
                raise ValueError("unrecoverable MPEG audio stream")
            continue
        if not frames:
            xing, tag_kind = _xing_frame_count(buf, fr)
        frames.append(fr)
        pos = fr.offset + fr.size
        garbage = 0
    if not frames:
        raise ValueError("no MPEG audio frames found")

    has_tag_frame = tag_kind is not None
    audio = frames[1:] if has_tag_frame else frames
    dur = sum(f.samples / f.sample_rate for f in audio)
    payload = sum(f.size for f in audio)
    avg = payload * 8 / dur / 1000 if dur else 0.0
    # VBR: varying frame bitrates, or a tag that MEANS vbr (Xing/VBRI);
    # an 'Info' tag is LAME's CBR marker and must not flip this
    vbr = (len({f.bitrate_kbps for f in audio}) > 1
           or tag_kind in ("Xing", "VBRI"))
    # 1-3 bytes after the last whole frame never enter the loop — they
    # are trailing garbage too (unless we broke on a truncated frame,
    # where garbage already counts to end)
    trailing = garbage if truncated else garbage + max(0, end - pos)
    return Mp3Info(frames, dur, avg, vbr, xing, start, trailing)


_TEXT_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def id3v2_tags(buf: bytes) -> dict:
    """Text frames of a leading ID3v2.3/2.4 tag as {frame_id: text}
    (TIT2 title, TPE1 artist, TALB album, TCON genre, TDRC/TYER year,
    ... every T*** frame).  Returns {} when no tag is present; frame
    sizes are syncsafe for v2.4 and plain big-endian for v2.3."""
    total = _id3v2_size(buf)
    if not total or len(buf) < 10:
        return {}
    major = buf[3]
    if major < 3:
        # ID3v2.2 frames use 3-byte ids + 3-byte sizes: parsing them as
        # 10-byte v2.3 headers read bogus frame sizes spanning into the
        # audio data and returned raw MP3 bytes as "tag text"
        return {}
    pos = 10
    if buf[5] & 0x40:       # extended header: skip by its own size
        ext = (struct.unpack_from(">I", buf, 10)[0]
               if major == 3 else _syncsafe(buf, 10))
        # v2.3's size EXCLUDES its own 4 size bytes; v2.4's includes it
        pos += ext + (4 if major == 3 else 0)
    out: dict[str, str] = {}
    end = min(total, len(buf))
    while pos + 10 <= end:
        fid = buf[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break       # padding
        size = (_syncsafe(buf, pos + 4) if major >= 4
                else struct.unpack_from(">I", buf, pos + 4)[0])
        body = buf[pos + 10: pos + 10 + size]
        pos += 10 + size
        if not fid.startswith(b"T") or not body:
            continue
        enc = _TEXT_ENCODINGS.get(body[0], "latin-1")
        try:
            text = body[1:].decode(enc, "replace").strip("\x00")
        except LookupError:     # pragma: no cover
            continue
        out[fid.decode("ascii", "replace")] = text
    return out


def _syncsafe(buf: bytes, pos: int) -> int:
    return ((buf[pos] & 0x7F) << 21) | ((buf[pos + 1] & 0x7F) << 14) \
        | ((buf[pos + 2] & 0x7F) << 7) | (buf[pos + 3] & 0x7F)
