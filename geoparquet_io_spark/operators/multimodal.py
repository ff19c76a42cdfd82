"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested.  Decode status by format:

- uncompressed 24-bit BMP, RIFF PCM WAV, 8-bit PNG (all five
  scanline filters, palette/gray/RGB/RGBA; inflate via stdlib zlib),
  and JPEG — baseline (full T.81 sequential DCT: Huffman entropy
  decode, restart markers, 4:2:0/4:2:2 chroma upsampling, exact IDCT)
  AND progressive (SOF2 successive approximation, Annex G) —
  decode for REAL with pure-numpy parsers (functions/jpeg.py) — no
  codec library needed — feeding the image/audio featurizers
  end-to-end;
- GIF87a/89a (variable-width LZW, interlace, transparency, animated
  multi-frame compositing) decodes for REAL too (functions/gif.py);
- video: RIFF/AVI containers parse for REAL (functions/avi.py) and the
  two no-codec-library frame formats decode for real too — MJPEG
  (frames are T.81 JPEGs, pure-numpy decode) and uncompressed DIB
  (raw BGR rows).  ``sample_frames`` / ``extract_video_features``
  run the real path on any AVI payload;
- MP3/MP2/MP1: frame-level parsing is REAL (functions/mp3.py — header
  walk, ID3 skip, Xing/VBRI, duration/bitrate/channel stats via
  ``extract_audio_metadata``); only PCM decode (Huffman + hybrid
  filterbank) stays gated;
- remaining compressed formats (MP3 PCM decode, H.264/VP9 video) need
  codec libraries absent from this container: importable libs are used
  when present, otherwise a clearly-marked ``NotImplementedError`` or a
  deterministic fake (for pipeline-shape testing).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_T = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("byte_size", T.LongType()),
    T.StructField("digest", T.StringType()),
])

IMAGE_FEATURES_T = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
])


def media_metadata(data: Column, media_type: str) -> Column:
    """Typed metadata struct for an opaque binary column — native exprs."""
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.length(data).cast("long").alias("byte_size"),
        F.md5(data).alias("digest"),
    )


def decode_bmp(buf: bytes) -> np.ndarray:
    """REAL pure-numpy decoder for uncompressed 24-bit BMP (the format
    needs no codec library): returns (h, w, 3) uint8 RGB.  Handles
    bottom-up and top-down files and 4-byte row padding."""
    import struct

    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = height < 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    need = pixel_off + stride * h
    if len(buf) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(buf, dtype=np.uint8,
                         count=stride * h, offset=pixel_off)
    rows = rows.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()   # BGR -> RGB


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """REAL pure-numpy decoder for RIFF WAV — integer PCM (8/16/32-bit,
    format 1) and IEEE float (32/64-bit, format 3): returns
    ((n_samples, channels) array, sample_rate)."""
    import struct

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    # a malformed fmt chunk must be a diagnosable 'bad WAV' ValueError,
    # not a ZeroDivisionError here (channels) or in the duration math of
    # every caller (rate)
    if channels < 1 or rate < 1:
        raise ValueError(
            f"WAV fmt chunk declares channels={channels}, rate={rate} — "
            "both must be >= 1")
    if audio_fmt == 1:
        dtype = {8: np.uint8, 16: np.int16, 32: np.int32}.get(bits)
    elif audio_fmt == 3:
        dtype = {32: np.float32, 64: np.float64}.get(bits)
    else:
        raise ValueError(
            f"only PCM (1) and IEEE-float (3) WAV supported "
            f"(format {audio_fmt})")
    if dtype is None:
        raise ValueError(
            f"unsupported bit depth {bits} for WAV format {audio_fmt}")
    samples = np.frombuffer(data, dtype=dtype)
    n = len(samples) // channels
    return samples[: n * channels].reshape(n, channels), rate


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, off: int, h: int, w: int,
                  bpp: int) -> tuple[np.ndarray, int]:
    """Unfilter one (sub-)image of h scanlines of w pixels with
    ``bpp`` BYTES per pixel starting at ``off``; returns the
    (h, w*bpp) byte rows and the new offset.  Filters operate on
    bytes with bpp-byte left lanes regardless of sample depth —
    exactly the spec's definition."""
    stride = w * bpp
    if len(raw) < off + h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        o = off + y * (stride + 1)
        ftype = raw[o]
        line = np.frombuffer(raw, np.uint8, stride, o + 1)
        if ftype == 0:          # None
            cur = line.copy()
        elif ftype == 2:        # Up
            cur = line + prev   # uint8 wraps mod 256, per spec
        elif ftype == 1:        # Sub: cumulative left sum per byte lane
            cur = (np.cumsum(line.reshape(w, bpp).astype(np.int64), axis=0)
                   % 256).astype(np.uint8).reshape(stride)
        elif ftype in (3, 4):   # Average / Paeth: true left dependency --
            # loop over x (vector over byte lanes); up row is known
            ln = line.reshape(w, bpp).astype(np.int64)
            up = prev.reshape(w, bpp).astype(np.int64)
            cur2 = np.zeros((w, bpp), dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            ul = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                if ftype == 3:
                    pred = (left + up[x]) >> 1
                else:
                    p = left + up[x] - ul
                    pa = np.abs(p - left)
                    pb = np.abs(p - up[x])
                    pc = np.abs(p - ul)
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, up[x], ul))
                cur2[x] = (ln[x] + pred) % 256
                left = cur2[x]
                ul = up[x]
            cur = cur2.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out, off + h * (stride + 1)


# Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def decode_png(buf: bytes) -> np.ndarray:
    """REAL PNG decoder in pure numpy + stdlib zlib (no codec library):
    parses chunks, inflates IDAT, and unfilters scanlines (all five
    filter types).  Supports 8-bit and 16-bit depth, grayscale / RGB /
    palette / gray+alpha / RGBA, non-interlaced AND Adam7 interlaced.
    Palette images are expanded to RGB.  Returns (h, w[, channels])
    uint8 (or uint16 for depth 16)."""
    import struct
    import zlib

    if buf[:8] != PNG_MAGIC:
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    while pos + 8 <= len(buf):
        size = int.from_bytes(buf[pos:pos + 4], "big")
        cid = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif cid == b"PLTE":
            plte = body
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        pos += 12 + size   # length + type + payload + CRC
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth not in (8, 16):
        raise ValueError(f"only 8/16-bit PNG supported (depth={depth})")
    if ctype == 3 and depth != 8:
        raise ValueError("palette PNG must be 8-bit")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    bpp = channels * (depth // 8)

    if interlace == 0:
        rows, _ = _png_unfilter(raw, 0, h, w, bpp)
        byts = rows.reshape(h, w, bpp)
    else:                   # Adam7: 7 independently-filtered sub-images
        byts = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, off = _png_unfilter(raw, off, ph, pw, bpp)
            byts[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)

    if depth == 16:         # network byte order per spec
        arr = byts.reshape(h, w * channels, 2)
        arr = (arr[:, :, 0].astype(np.uint16) << 8) | arr[:, :, 1]
        arr = arr.reshape(h, w, channels)
    else:
        arr = byts.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return pal[arr[:, :, 0]]
    if channels == 1:
        return arr[:, :, 0].copy()
    return arr


def _decode_image_real(buf: bytes) -> np.ndarray:
    if buf[:2] == b"BM":
        return decode_bmp(buf)   # no codec library needed
    if buf[:8] == PNG_MAGIC:
        return decode_png(buf)   # pure numpy + stdlib zlib
    if buf[:2] == b"\xff\xd8":
        # baseline JPEG: pure numpy T.81 implementation (functions/jpeg.py)
        from geoparquet_io_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(buf)
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        # pure-python LZW + compositing (functions/gif.py)
        from geoparquet_io_spark.functions.gif import decode_gif

        return decode_gif(buf)
    try:  # pragma: no cover - Pillow absent in this container
        from PIL import Image  # noqa: F401
        import io

        return np.asarray(Image.open(io.BytesIO(buf)))
    except ImportError as e:
        raise NotImplementedError(
            "decoding this image format requires Pillow, which is not in "
            "this container (BMP/PNG/baseline-JPEG decode natively); "
            "use deterministic_fake=True to exercise the pipeline"
        ) from e


def _decode_image_fake(buf: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes -> pseudo-image whose shape and
    pixels derive only from the payload (so tests are reproducible).
    An EMPTY (zero-length, non-NULL) payload yields an 8x8 black image —
    b'' repeated is still empty and cannot fill any shape."""
    h = 8 + (len(buf) % 8)
    w = 8 + (buf[0] % 8 if buf else 0)
    src = buf if buf else b"\x00"
    arr = np.frombuffer((src * ((h * w * 3) // len(src) + 1))[: h * w * 3],
                        dtype=np.uint8)
    return arr.reshape(h, w, 3)


def extract_image_features(
    df: DataFrame,
    data_column: str = "data",
    feature_column: str = "image_features",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode -> (width, height, mean luminance) via Arrow-batched
    mapInPandas; the batch shape is what a real CV featurizer would use."""
    decode = _decode_image_fake if deterministic_fake else _decode_image_real
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(feature_column, IMAGE_FEATURES_T, True)]
    )
    idx = df.columns.index(data_column)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf.iloc[:, idx]:
                if buf is None:
                    feats.append(None)
                    continue
                img = decode(bytes(buf))
                # luminance on the 8-bit scale regardless of depth (a
                # 16-bit PNG otherwise reports 0-65535, ~257x the 8-bit
                # value for the same photo) and over COLOR planes only
                # (alpha is opacity, not light)
                arr = (img >> 8) if img.dtype == np.uint16 else img
                a = arr.astype("f8")
                if a.ndim == 3:
                    c = a.shape[2]
                    if c == 2:
                        a = a[:, :, 0]
                    elif c >= 4:
                        a = a[:, :, :3]
                luma = float(a.mean())
                feats.append({"width": int(img.shape[1]), "height": int(img.shape[0]),
                              "mean_luma": luma})
            pdf[feature_column] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


FRAME_T = T.ArrayType(T.StructType([
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("t_s", T.DoubleType()),
    T.StructField("frame", T.BinaryType()),
]))


def sample_frames(
    df: DataFrame,
    data_column: str = "data",
    every_n_bytes: int = 1024,
    frame_column: str = "frames",
    deterministic_fake: bool = False,
    stride: int = 1,
    max_frames: int | None = None,
) -> DataFrame:
    """Video frame sampling.

    REAL path (default): payloads are RIFF/AVI containers — the pure-python
    parser (functions/avi.py) indexes the ``movi`` chunks and emits every
    ``stride``-th frame payload (MJPEG bytes or raw DIB) with its
    timestamp, capped at ``max_frames``.  Sampling never decodes pixels,
    so cost is O(container index), not O(video) — the shape that matters
    when the real corpus is 100 TB of clips.  Arrow-batched mapInPandas;
    per-row output is bounded by ``max_frames``.

    Formats needing codec libraries (MP4/H.264 etc.) are not parseable
    here; ``deterministic_fake=True`` keeps the legacy byte-slicing stub
    for pipeline-shape tests on arbitrary payloads.
    """
    if deterministic_fake:
        n = F.greatest(F.floor(F.length(data_column) / every_n_bytes).cast("int"), F.lit(0))
        # sequence over max(n,1) then slice to n: sequence(0, -1) would
        # run DESCENDING and fabricate frames [0, -1] for short payloads
        frames = F.slice(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda j: F.struct(
                    (j - 1).cast("int").alias("frame_index"),
                    (j - 1).cast("double").alias("t_s"),
                    F.substring(F.col(data_column),
                                ((j - 1) * every_n_bytes + 1).cast("int"),
                                every_n_bytes).alias("frame"),
                ),
            ), 1, n)
        return df.withColumn(frame_column, frames)

    from geoparquet_io_spark.functions.avi import extract_frames, parse_avi

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(frame_column, FRAME_T, True)]
    )
    idx = df.columns.index(data_column)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf.iloc[:, idx]:
                if buf is None:
                    out.append(None)
                    continue
                raw = bytes(buf)   # one copy of the (large) payload
                info = parse_avi(raw)
                dt = 1.0 / info.fps if info.fps else 0.0
                payloads = extract_frames(raw, info)
                rows = [{"frame_index": i, "t_s": i * dt, "frame": p}
                        for i, p in enumerate(payloads)][::max(stride, 1)]
                if max_frames is not None:
                    rows = rows[:max_frames]
                out.append(rows)
            pdf[frame_column] = out
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


VIDEO_FEATURES_T = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("fps", T.DoubleType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("codec", T.StringType()),
    T.StructField("frame_means", T.ArrayType(T.DoubleType())),
])


def extract_video_features(
    df: DataFrame,
    data_column: str = "data",
    feature_column: str = "video_features",
    stride: int = 1,
    max_frames: int | None = None,
) -> DataFrame:
    """REAL video featurizer for AVI payloads: container metadata plus the
    mean pixel value of every ``stride``-th decoded frame (MJPEG via the
    pure-numpy T.81 decoder, DIB as raw BGR).  Arrow-batched mapInPandas;
    decode cost is bounded by ``max_frames`` per row.
    """
    from geoparquet_io_spark.functions.avi import (decode_frame,
                                                   extract_frames, parse_avi)

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(feature_column, VIDEO_FEATURES_T, True)]
    )
    idx = df.columns.index(data_column)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf.iloc[:, idx]:
                if buf is None:
                    feats.append(None)
                    continue
                raw = bytes(buf)
                info = parse_avi(raw)
                sampled = extract_frames(raw, info)[::max(stride, 1)]
                if max_frames is not None:
                    sampled = sampled[:max_frames]
                means = [float(decode_frame(p, info).astype("f8").mean())
                         for p in sampled]
                feats.append({
                    "width": info.width, "height": info.height,
                    "fps": float(info.fps), "n_frames": len(info.frames),
                    "codec": info.codec, "frame_means": means,
                })
            pdf[feature_column] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


AUDIO_FEATURES_T = T.StructType([
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("spectral_centroid_hz", T.DoubleType()),
])


def extract_audio_features(
    df: DataFrame,
    data_column: str = "data",
    feature_column: str = "audio_features",
) -> DataFrame:
    """REAL audio featurizer for PCM WAV and FLAC payloads (pure-numpy
    decoders, no codec library — functions/flac.py implements the full
    lossless core): sample rate, channels, duration, RMS amplitude
    (normalized to [0,1] full scale), zero-crossing rate of the mono
    mix (sign changes / adjacent pairs), and spectral centroid in Hz
    (magnitude-weighted mean rfft frequency).  Arrow-batched
    mapInPandas — the same batch shape a compressed-codec featurizer
    would use."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(feature_column, AUDIO_FEATURES_T, True)]
    )
    idx = df.columns.index(data_column)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geoparquet_io_spark.functions.flac import decode_flac

        for pdf in batches:
            feats = []
            for buf in pdf.iloc[:, idx]:
                if buf is None:
                    feats.append(None)
                    continue
                raw = bytes(buf)
                if raw[:4] == b"fLaC":
                    samples, info = decode_flac(raw)
                    rate = info["sample_rate"]
                    x = samples.astype("f8") / float(
                        1 << (info["bits_per_sample"] - 1))
                else:
                    samples, rate = decode_wav(raw)
                    x = samples.astype("f8")
                    if samples.dtype == np.uint8:
                        x = (x - 128.0) / 128.0
                    elif samples.dtype == np.int16:
                        x = x / 32768.0
                    elif samples.dtype == np.int32:
                        x = x / 2147483648.0
                    # float WAV (format 3) is already full-scale [-1, 1]
                mono = x.mean(axis=1) if x.size else x.reshape(0)
                if mono.size > 1:
                    s = np.signbit(mono)
                    zcr = float((s[1:] != s[:-1]).mean())
                    mag = np.abs(np.fft.rfft(mono))
                    freqs = np.fft.rfftfreq(mono.size, d=1.0 / rate)
                    tot = float(mag.sum())
                    cent = float((freqs * mag).sum() / tot) if tot else 0.0
                else:
                    zcr, cent = 0.0, 0.0
                feats.append({
                    "sample_rate": int(rate),
                    "channels": int(samples.shape[1]),
                    "duration_s": float(samples.shape[0] / rate),
                    "rms": float(np.sqrt((x ** 2).mean())) if x.size else 0.0,
                    "zcr": zcr,
                    "spectral_centroid_hz": cent,
                })
            pdf[feature_column] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


AUDIO_META_T = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("bitrate_kbps", T.DoubleType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("vbr", T.BooleanType()),
])


def extract_audio_metadata(
    df: DataFrame,
    data_column: str = "data",
    feature_column: str = "audio_meta",
) -> DataFrame:
    """REAL container-level audio metadata — no PCM decode, no codec
    library: PCM WAV via the fmt/data chunks, MPEG audio (MP3/MP2/MP1)
    via the full frame walk in functions/mp3.py (ID3 skip, Xing/VBRI
    aware).  This is the 100 TB-corpus operator: duration/bitrate/
    layout stats cost O(container index) per file, never O(audio).
    Arrow-batched mapInPandas."""
    from geoparquet_io_spark.functions.mp3 import parse_mp3

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(feature_column, AUDIO_META_T, True)]
    )
    idx = df.columns.index(data_column)

    def one(raw: bytes) -> dict:
        if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
            samples, rate = decode_wav(raw)
            return {"format": "wav", "sample_rate": int(rate),
                    "channels": int(samples.shape[1]),
                    "duration_s": float(samples.shape[0] / rate),
                    "bitrate_kbps": float(
                        rate * samples.shape[1] * samples.dtype.itemsize * 8
                        / 1000.0),
                    "n_frames": None, "vbr": False}
        if raw[:4] == b"fLaC":
            from geoparquet_io_spark.functions.flac import parse_streaminfo

            si = parse_streaminfo(raw)   # header-only: O(1), no PCM decode
            dur = (si["total_samples"] / si["sample_rate"]
                   if si["sample_rate"] else 0.0)
            return {"format": "flac", "sample_rate": si["sample_rate"],
                    "channels": si["channels"],
                    "duration_s": float(dur),
                    "bitrate_kbps": float(len(raw) * 8 / dur / 1000.0)
                    if dur else None,
                    "n_frames": None, "vbr": True}
        info = parse_mp3(raw)
        f0 = info.frames[0]
        return {"format": f"mp{f0.layer}", "sample_rate": f0.sample_rate,
                "channels": 1 if f0.mode == "mono" else 2,
                "duration_s": float(info.duration_s),
                "bitrate_kbps": float(info.avg_bitrate_kbps),
                "n_frames": len(info.frames), "vbr": bool(info.vbr)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [None if buf is None else one(bytes(buf))
                     for buf in pdf.iloc[:, idx]]
            pdf[feature_column] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _gray_pool(img: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Grayscale + area-block average-pool to (rows, cols): COLOR
    channels are averaged (alpha planes are opacity, not luminance —
    the same image with and without an opaque alpha must pool alike),
    then row/col index blocks (np.array_split) are averaged.

    Images SMALLER than the grid are nearest-stretched first: an empty
    index split's mean is NaN, and every NaN gradient comparison is
    False — so every small image used to dhash to the same constant 0
    and dedup_images silently deleted distinct small images."""
    g = img.astype("f8")
    if g.ndim == 3:
        c = g.shape[2]
        if c == 2:          # gray + alpha: luminance is the gray plane
            g = g[:, :, 0]
        elif c >= 4:        # RGBA: drop alpha
            g = g[:, :, :3].mean(axis=2)
        else:
            g = g.mean(axis=2)
    if g.shape[0] == 0 or g.shape[1] == 0:
        raise ValueError("cannot pool an empty (0-dimension) image")
    if g.shape[0] < rows:
        g = g[np.floor(np.arange(rows) * g.shape[0] / rows).astype(int)]
    if g.shape[1] < cols:
        g = g[:, np.floor(np.arange(cols) * g.shape[1] / cols).astype(int)]
    if g.shape == (rows, cols):
        # every pool block is exactly one pixel: pooling is the identity
        # (mean of a single element).  Skipping the rows x cols python
        # loop here is EXACT, and it is the common thumbnail-hash case
        # (r12 measurement: the block loop was ~0.5 ms per image, 100x
        # the decode cost).
        return g
    pooled = np.empty((rows, cols), dtype="f8")
    rsplit = np.array_split(np.arange(g.shape[0]), rows)
    csplit = np.array_split(np.arange(g.shape[1]), cols)
    for i, ri in enumerate(rsplit):
        band = g[ri]
        for j, cj in enumerate(csplit):
            pooled[i, j] = band[:, cj].mean()
    return pooled


def dhash(img: np.ndarray, hash_size: int = 8) -> int:
    """Difference hash: pool to (hash_size, hash_size + 1) grayscale,
    emit one bit per horizontal gradient (left > right), row-major.
    hash_size 8 -> 64 bits (the standard pHash-library layout).
    hash_size is capped at 8: the signature column is a signed 64-bit
    long, and a larger grid would overflow it at runtime."""
    if not 1 <= hash_size <= 8:
        raise ValueError(
            f"hash_size must be in [1, 8] (hash_size^2 bits must fit a "
            f"64-bit long), got {hash_size}")
    pooled = _gray_pool(img, hash_size, hash_size + 1)
    bits = (pooled[:, :-1] > pooled[:, 1:]).ravel()
    # MSB-first pack (identical to the former (v << 1) | bit loop):
    # packbits pads the LAST byte's low bits, so shift them back out
    pb = np.packbits(bits)
    v = int.from_bytes(pb.tobytes(), "big") >> (8 * len(pb) - bits.size)
    if v >= 1 << 63:        # two's-complement into a signed 64-bit long
        v -= 1 << 64
    return v


def add_image_dhash(
    df: DataFrame,
    data_column: str = "data",
    hash_column: str = "dhash",
    hash_size: int = 8,
) -> DataFrame:
    """Perceptual difference-hash over an image binary column (any
    format the real decoders speak: BMP/PNG/JPEG/GIF).  The 100 TB
    image-dedup primitive: one decode + 64-bit signature per file,
    map-only; pairing happens on the signatures, never the pixels."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(hash_column, T.LongType(), True)]
    )
    idx = df.columns.index(data_column)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for buf in pdf.iloc[:, idx]:
                if buf is None:
                    vals.append(None)
                    continue
                vals.append(dhash(_decode_image_real(bytes(buf)), hash_size))
            pdf[hash_column] = pd.array(vals, dtype="Int64")
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def image_near_duplicate_pairs(
    df: DataFrame,
    id_column: str,
    data_column: str = "data",
    max_hamming: int = 6,
    hash_size: int = 8,
    bands: int = 8,
) -> DataFrame:
    """Image near-dup pairs by dHash hamming distance, banded so the
    pair space never goes all-pairs: the 64-bit signature splits into
    ``bands`` byte bands and candidates meet on a (band, value)
    equi-join.  Pigeonhole completeness: ``max_hamming < bands``
    guarantees one identical band per qualifying pair.  Same LSH shape
    as dedup.simhash_candidate_pairs (operators/dedup.py:370)."""
    if not 0 <= max_hamming < bands:
        raise ValueError(
            f"max_hamming must be < bands={bands} for pigeonhole "
            f"completeness, got {max_hamming}")
    width = hash_size * hash_size
    if bands > width:
        # bw = 0 would make every band value 0 and degrade the LSH
        # equi-join to the all-pairs cross product it exists to avoid
        raise ValueError(
            f"bands ({bands}) must be <= hash_size^2 ({width}) so each "
            "band carries at least one signature bit")
    bw = width // bands
    sigs = add_image_dhash(df, data_column, "dh", hash_size) \
        .select(F.col(id_column).alias("id"), F.col("dh")) \
        .localCheckpoint(eager=False)
    banded = sigs.select(
        "id", "dh",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("b"),
                     F.shiftrightunsigned(F.col("dh"), bw * b)
                     .bitwiseAND(F.lit((1 << bw) - 1)).alias("v"))
            for b in range(bands)
        ])).alias("band"),
    ).select("id", "dh", F.col("band.b").alias("b"),
             F.col("band.v").alias("v"))
    a = banded.select(F.col("id").alias("id_a"),
                      F.col("dh").alias("dh_a"), "b", "v")
    bb = banded.select(F.col("id").alias("id_b"),
                       F.col("dh").alias("dh_b"), "b", "v")
    pairs = (a.join(bb, ["b", "v"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "dh_a", "dh_b")
             .distinct())
    ham = F.bit_count(F.col("dh_a").bitwiseXOR(F.col("dh_b")))
    return (pairs.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def dedup_images(df: DataFrame, id_column: str, data_column: str = "data",
                 max_hamming: int = 6, hash_size: int = 8) -> DataFrame:
    """Remove near-duplicate images by dHash hamming distance, keeping
    the smallest id of every neighborhood.  Pairing runs on the
    DISTINCT-HASH graph (dedup.hamming_dedup_survivors): a re-uploaded
    image repeated a million times is one node, so boilerplate masses
    never create quadratic pair volume (the failure mode measured for
    all-pairs LSH in SCALING.md)."""
    from geoparquet_io_spark.operators.dedup import hamming_dedup_survivors

    bands = 8
    if not 0 <= max_hamming < bands:
        raise ValueError(
            f"max_hamming must be < {bands} for pigeonhole completeness, "
            f"got {max_hamming}")
    if hash_size * hash_size < bands:
        raise ValueError(
            f"hash_size^2 ({hash_size * hash_size}) must be >= {bands} "
            "bands so each band carries at least one signature bit")
    sigs = add_image_dhash(df, data_column, "dh", hash_size) \
        .select(F.col(id_column), F.col("dh"))
    keep = hamming_dedup_survivors(
        sigs, id_column, "dh", max_hamming=max_hamming,
        bands=bands, band_bits=hash_size * hash_size // bands)
    return df.join(keep, id_column, "left_semi")


RESIZED_T = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("data", T.BinaryType()),   # row-major RGB uint8
])


def _resample(img: np.ndarray, out_w: int, out_h: int,
              method: str) -> np.ndarray:
    """Pure-numpy resample to (out_h, out_w[, ch]).

    - ``nearest``: half-pixel-center mapping, floor(x + 0.5);
    - ``bilinear``: 4-neighbor lerp on the same half-pixel grid;
    - ``area``: block average over index splits (exact when the factor
      divides the input), stored as floor of the mean (deterministic).
    """
    in_h, in_w = img.shape[:2]
    if method == "area":
        g = img.astype("f8")
        three = g.ndim == 3
        # nearest-upscale BEFORE the block split when the output grid is
        # larger than the input: empty np.array_split groups mean to NaN
        # and floor/cast turned 3/4 of an upscaled image into black
        if out_h > in_h:
            g = g[np.floor(np.arange(out_h) * in_h / out_h).astype(int)]
        if out_w > in_w:
            g = g[:, np.floor(np.arange(out_w) * in_w / out_w).astype(int)]
        rs = np.array_split(np.arange(g.shape[0]), out_h)
        cs = np.array_split(np.arange(g.shape[1]), out_w)
        out = np.empty((out_h, out_w) + g.shape[2:], dtype="f8")
        for i, ri in enumerate(rs):
            for j, cj in enumerate(cs):
                block = g[np.ix_(ri, cj)]
                out[i, j] = block.mean(axis=(0, 1)) if three \
                    else block.mean()
        return np.floor(out).astype(np.uint8)
    sx = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    sy = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    if method == "nearest":
        ix = np.clip(np.floor(sx + 0.5).astype(int), 0, in_w - 1)
        iy = np.clip(np.floor(sy + 0.5).astype(int), 0, in_h - 1)
        return img[np.ix_(iy, ix)]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    x0 = np.clip(np.floor(sx).astype(int), 0, in_w - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    y0 = np.clip(np.floor(sy).astype(int), 0, in_h - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    fx = np.clip(sx - x0, 0.0, 1.0)[None, :]
    fy = np.clip(sy - y0, 0.0, 1.0)[:, None]
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    g = img.astype("f8")
    top = g[np.ix_(y0, x0)] * (1 - fx) + g[np.ix_(y0, x1)] * fx
    bot = g[np.ix_(y1, x0)] * (1 - fx) + g[np.ix_(y1, x1)] * fx
    return np.clip(np.round(top * (1 - fy) + bot * fy), 0, 255) \
        .astype(np.uint8)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    data_column: str = "data",
    out_column: str = "resized",
    method: str = "bilinear",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize an image binary column (any decodable format) to a fixed
    (width, height) — the model-input normalization step of a training
    pipeline.  Output struct: dims + row-major RGB uint8 bytes (the
    tensor layout, index (r*W + c)*3 + ch), ready for feature
    extraction or packing; map-only Arrow-batched decode+resample."""
    decode = _decode_image_fake if deterministic_fake else _decode_image_real
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_column, RESIZED_T, True)]
    )
    idx = df.columns.index(data_column)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for buf in pdf.iloc[:, idx]:
                if buf is None:
                    vals.append(None)
                    continue
                img = decode(bytes(buf))
                # output contract is RGB uint8: 16-bit PNGs (decode_png
                # legitimately returns uint16) must be SCALED down, not
                # passed through (nearest would emit 6-byte pixels,
                # bilinear would clip to white, area would wrap mod 256)
                if img.dtype == np.uint16:
                    img = (img >> 8).astype(np.uint8)
                elif img.dtype != np.uint8:
                    img = np.clip(img, 0, 255).astype(np.uint8)
                # normalize EVERY decode shape to 3-channel RGB — the
                # declared output contract is row-major RGB with stride
                # 3; gray+alpha (PNG color type 4) and RGBA (type 6)
                # previously passed through as 2/4-channel tensors
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
                elif img.shape[2] == 1:
                    img = np.repeat(img, 3, axis=2)
                elif img.shape[2] == 2:    # gray+alpha: gray plane x3
                    img = np.repeat(img[:, :, :1], 3, axis=2)
                elif img.shape[2] >= 4:    # RGBA: drop alpha
                    img = img[:, :, :3]
                small = _resample(img, width, height, method)
                vals.append({"width": width, "height": height,
                             "channels": int(small.shape[2]),
                             "data": small.tobytes()})
            pdf[out_column] = vals
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
