"""RIFF/AVI container parsing + MJPEG / DIB frame decode — pure numpy.

Closes the "video" half of the compressed-codec gate (reference:
``core/convert.py`` treats media via external binaries; SURVEY §2
multimodal row) for the one video format that needs NO codec library:

- **container**: RIFF ``AVI `` — ``hdrl`` (``avih`` main header, per-stream
  ``strl``/``strh``/``strf``), ``movi`` frame chunks (``##dc``/``##db``),
  optional ``idx1`` index.  The parser walks the chunk tree exactly as
  written in the AVI 1.0 spec (MSDN AVIMAINHEADER/AVISTREAMHEADER layout).
- **frames**: MJPEG (each ``##dc`` payload is a baseline/progressive JPEG —
  decoded by the existing pure-numpy T.81 implementation in
  ``functions/jpeg.py``) and uncompressed DIB (``##db``: raw bottom-up
  BGR rows, same layout as the BMP pixel array).

MP3 / H.264 / VP9 etc. genuinely need codec libraries and stay gated in
``operators/multimodal.py``.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np


class AviFrame(NamedTuple):
    stream: int          # stream number from the chunk fourcc ("00dc" -> 0)
    kind: str            # "dc" (compressed) | "db" (uncompressed DIB)
    offset: int          # payload offset into the file buffer
    size: int


class AviInfo(NamedTuple):
    width: int
    height: int
    fps: float
    n_frames: int        # from the main header (dwTotalFrames)
    codec: str           # video stream handler fourcc, e.g. "MJPG" / "DIB "
    frames: list         # list[AviFrame] for ALL streams, file order
    video_stream: int = 0  # strl index of the video stream ("01dc" -> 1)
    bits: int = 24       # DIB bit depth from the video strf (24 / 32)


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking word-aligned chunks."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        yield cid, pos + 8, min(size, end - pos - 8)
        pos += 8 + size + (size & 1)


def parse_avi(buf: bytes) -> AviInfo:
    """Parse an AVI file's structure without decoding any pixels.

    Returns container metadata + the frame index.  Raises ``ValueError``
    on anything that is not a RIFF/AVI file or is structurally broken.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    riff_end = min(len(buf), 8 + struct.unpack_from("<I", buf, 4)[0])

    width = height = n_frames = 0
    us_per_frame = 0
    codec = ""
    fps = 0.0
    frames: list[AviFrame] = []
    stream_no = 0
    video_stream = 0
    bits = 24
    expect_video_strf = False

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, n_frames, us_per_frame, codec, fps, \
            stream_no, video_stream, bits, expect_video_strf
        for cid, body, size in _chunks(buf, pos, end):
            if cid == b"LIST":
                ltype = buf[body:body + 4]
                if ltype == b"movi":
                    _index_movi(body + 4, body + size)
                else:  # hdrl / strl / odml ... recurse
                    walk(body + 4, body + size)
            elif cid == b"avih" and size >= 40:
                (us_per_frame, _, _, _, n_frames, _, _, _,
                 width, height) = struct.unpack_from("<10I", buf, body)
            elif cid == b"strh" and size >= 32:
                fcc_type = buf[body:body + 4]
                if fcc_type == b"vids":
                    handler = buf[body + 4:body + 8]
                    scale, rate = struct.unpack_from("<II", buf, body + 20)
                    codec = handler.decode("ascii", "replace").strip("\x00")
                    if scale:
                        fps = rate / scale
                    # remember WHICH strl is the video: an AVI that
                    # declares audio first names its video chunks 01dc,
                    # and a hardcoded stream-0 default finds no frames
                    video_stream = stream_no
                    expect_video_strf = True
                else:
                    expect_video_strf = False
                stream_no += 1
            elif cid == b"strf" and expect_video_strf:
                if size >= 16:
                    # BITMAPINFOHEADER: biBitCount at offset 14
                    bits = struct.unpack_from("<H", buf, body + 14)[0] or 24
                expect_video_strf = False

    def _index_movi(pos: int, end: int) -> None:
        for cid, body, size in _chunks(buf, pos, end):
            if cid == b"LIST":    # 'rec ' grouping — recurse into it
                _index_movi(body + 4, body + size)
                continue
            if (len(cid) == 4 and cid[:2].isdigit()
                    and cid[2:] in (b"dc", b"db")):
                frames.append(AviFrame(int(cid[:2]), cid[2:].decode(),
                                       body, size))

    walk(12, riff_end)
    if not fps and us_per_frame:
        fps = 1e6 / us_per_frame
    if width == 0 or height == 0:
        raise ValueError("AVI missing avih main header")
    return AviInfo(width, height, fps, n_frames, codec, frames,
                   video_stream, bits)


def extract_frames(buf: bytes, info: AviInfo | None = None,
                   stream: int | None = None) -> list[bytes]:
    """Frame payloads (bytes) of one stream, in file order.  Default:
    the VIDEO stream the header declares (not stream 0 — audio-first
    files name their video chunks 01dc)."""
    info = info or parse_avi(buf)
    if stream is None:
        stream = info.video_stream
    return [buf[f.offset:f.offset + f.size]
            for f in info.frames if f.stream == stream]


def decode_frame(frame: bytes, info: AviInfo) -> np.ndarray:
    """Decode one frame payload to (h, w, 3) uint8 RGB.

    MJPEG frames go through the pure-numpy T.81 decoder; bare payloads
    are uncompressed DIB — bottom-up BGR rows with 4-byte row padding,
    exactly the BMP pixel-array layout.

    Routing: the container's declared CODEC decides (the header is
    authoritative); payload magic is only the fallback for files whose
    stream header omits the handler.  Magic alone misrouted a DIB
    frame whose bottom-left pixel happens to be BGR(255, 216, *) into
    the JPEG decoder, which then crashed on 'bad marker alignment'.
    """
    codec = (info.codec or "").upper().strip()
    if codec:
        is_jpeg = codec.startswith("MJPG") or codec.startswith("JPEG")
    else:
        is_jpeg = frame[:2] == b"\xff\xd8"
    if is_jpeg:
        from geoparquet_io_spark.functions.jpeg import decode_jpeg

        arr = decode_jpeg(frame)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        return arr
    w, h = info.width, info.height
    bits = getattr(info, "bits", 24) or 24
    if bits not in (24, 32):
        # 8bpp-palette / 16bpp DIBs would decode as garbage if forced
        # through the 24bpp math — honest gate, like the codec gates
        raise ValueError(f"uncompressed DIB bit depth {bits} not "
                         "supported (24/32 only)")
    bpp = bits // 8
    stride = (w * bpp + 3) & ~3
    if len(frame) < stride * h:
        raise ValueError(
            f"DIB frame too short: {len(frame)} < {stride * h}")
    rows = np.frombuffer(frame, np.uint8, stride * h).reshape(h, stride)
    px = rows[:, :w * bpp].reshape(h, w, bpp)
    rgb = px[:, :, :3][::-1, :, ::-1]     # drop alpha/X, bottom-up, BGR->RGB
    return rgb.copy()


def build_avi(frames: list[bytes], width: int, height: int,
              fps: float = 25.0, codec: str = "MJPG") -> bytes:
    """Minimal AVI 1.0 writer (single video stream, +idx1).

    The product uses it for round-trip self-checks and for writing
    frame-sampled clips back out; tests pair it with an independent
    in-test reader.  ``codec="DIB "`` marks uncompressed BGR frames.
    """
    kind = b"db" if codec.startswith("DIB") else b"dc"
    us_per_frame = int(round(1e6 / fps)) if fps else 0
    # (1000, fps*1000), not (1, round(fps)): dwScale/dwRate exist
    # precisely to carry fractional rates — 29.97 previously round-
    # tripped as 30.0 and every i/fps timestamp drifted ~0.1%
    scale, rate = (1000, int(round(fps * 1000.0))) if fps else (0, 0)

    avih = struct.pack("<14I", us_per_frame, 0, 0, 0x10, len(frames), 0,
                       1, 0, width, height, 0, 0, 0, 0)
    # dwFlags wPriority wLanguage dwInitialFrames dwScale dwRate dwStart
    # dwLength dwSuggestedBufferSize dwQuality(-1=default) dwSampleSize rcFrame
    strh = (b"vids" + codec.encode("ascii").ljust(4)[:4]
            + struct.pack("<IHHIIIIIIiI4H", 0, 0, 0, 0, scale, rate, 0,
                          len(frames), 0, -1, 0, 0, 0, width, height))
    compression = 0 if kind == b"db" else int.from_bytes(b"MJPG", "little")
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                       compression, width * height * 3, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    idx = b""
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00" + kind + struct.pack("<III", 0x10, len(movi_body), len(f))
        movi_body += chunk(b"00" + kind, f)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
