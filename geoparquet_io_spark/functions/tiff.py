"""TIFF 6.0 / GeoTIFF decoding — pure python/numpy, no codec library.

Raster ingestion for the lakehouse: satellite tiles, DEMs, and land-cover
rasters ship as GeoTIFF, and turning them into DataFrame rows (pixel /
point / zonal form) is the missing half of a geo pipeline whose vector
half already speaks GeoParquet.  Implemented from the public TIFF 6.0
spec + OGC GeoTIFF 1.1:

- both byte orders (``II``/``MM``), chained IFDs, all integer value types
- strip AND tile organisation, chunky planar config
- compression: none(1), LZW(5, MSB-first codes with EarlyChange, the
  TIFF variant — distinct from the GIF LZW in functions/gif.py),
  Deflate(8/32946 via stdlib zlib), PackBits(32773)
- predictor 2 (horizontal differencing, per-sample cumsum)
- sample formats: uint 8/16/32, int 8/16/32, float 32/64, multi-band
- GeoTIFF georeferencing: ModelPixelScale + ModelTiepoint (or
  ModelTransformation), GeoKeyDirectory → EPSG code (projected or
  geographic), so pixel (col,row) → CRS (x,y) is exact

BigTIFF (version 43) and JPEG-in-TIFF are rejected loudly.
"""

from __future__ import annotations

import struct
import zlib
from typing import NamedTuple

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d"}


class TiffIfd(NamedTuple):
    tags: dict          # tag id -> tuple of values


class GeoTiffInfo(NamedTuple):
    width: int
    height: int
    bands: int
    dtype: str
    epsg: int | None
    origin_x: float | None      # CRS coordinate of the (0,0) pixel corner
    origin_y: float | None
    pixel_w: float | None
    pixel_h: float | None       # positive magnitude; rows go north->south


def _read_ifds(buf: bytes) -> tuple[list[TiffIfd], str]:
    if len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF file")
    bo = "<" if buf[:2] == b"II" else ">"
    version = struct.unpack_from(bo + "H", buf, 2)[0]
    if version == 43:
        raise ValueError("BigTIFF (version 43) not supported")
    if version != 42:
        raise ValueError(f"bad TIFF version {version}")
    off = struct.unpack_from(bo + "I", buf, 4)[0]
    ifds = []
    while off:
        n = struct.unpack_from(bo + "H", buf, off)[0]
        tags = {}
        for i in range(n):
            p = off + 2 + 12 * i
            tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, p)
            size = _TYPE_SIZE.get(typ, 1) * cnt
            vp = p + 8 if size <= 4 else struct.unpack_from(bo + "I", buf,
                                                            p + 8)[0]
            if typ in _TYPE_FMT:
                vals = struct.unpack_from(bo + str(cnt) + _TYPE_FMT[typ],
                                          buf, vp)
            elif typ in (5, 10):    # rationals
                raw = struct.unpack_from(bo + str(2 * cnt)
                                         + ("I" if typ == 5 else "i"),
                                         buf, vp)
                vals = tuple(raw[2 * k] / (raw[2 * k + 1] or 1)
                             for k in range(cnt))
            elif typ == 2:          # ascii
                vals = (buf[vp:vp + cnt].split(b"\x00")[0].decode(
                    "ascii", "replace"),)
            else:
                vals = (buf[vp:vp + size],)
            tags[tag] = vals
        ifds.append(TiffIfd(tags))
        off = struct.unpack_from(bo + "I", buf, off + 2 + 12 * n)[0]
    return ifds, bo


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first codes, clear=256, EOI=257, width grows
    one code EARLY (EarlyChange=1, the TIFF default)."""
    out = bytearray()
    dictionary: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:
            dictionary = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            dictionary.append(prev + entry[:1])
        elif code == len(dictionary):
            entry = prev + prev[:1]
            dictionary.append(entry)
        else:
            raise ValueError(f"corrupt TIFF LZW stream (code {code})")
        out += entry
        prev = entry
        # EarlyChange: the decoder's table trails the encoder's by one
        # entry, so it widens at 2^w - 2 (libtiff's `maxcode - 1` rule)
        if len(dictionary) + 2 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos:pos + n + 1]
            pos += n + 1
        elif n > 128:
            out += data[pos:pos + 1] * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out)


def _decompress(comp: int, data: bytes, expected: int) -> bytes:
    # every branch truncates to ``expected``: a writer may pad the final
    # strip to full RowsPerStrip (Deflate returns it all at once; LZW /
    # PackBits runs can cross the boundary) and extra bytes would crash
    # the caller's reshape
    if comp == 1:
        return data[:expected]
    if comp == 5:
        return _lzw_decode_tiff(data, expected)[:expected]
    if comp in (8, 32946):
        return zlib.decompress(data)[:expected]
    if comp == 32773:
        return _packbits_decode(data, expected)[:expected]
    raise ValueError(
        f"TIFF compression {comp} requires a codec library "
        "(supported: none, LZW, Deflate, PackBits)")


def _dtype_for(ifd: TiffIfd, bo: str):
    bits = ifd.tags.get(258, (8,))[0]
    fmt = ifd.tags.get(339, (1,))[0]     # 1 uint, 2 int, 3 float
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None or bits % 8 or (kind == "f" and bits not in (32, 64)):
        raise ValueError(f"unsupported sample format {fmt}/{bits}-bit")
    return np.dtype(f"{bo}{kind}{bits // 8}")


def decode_tiff(buf: bytes, ifd_index: int = 0) -> np.ndarray:
    """Decode one TIFF image to (h, w) or (h, w, bands)."""
    ifds, bo = _read_ifds(buf)
    if ifd_index >= len(ifds):
        raise ValueError(f"TIFF has {len(ifds)} IFDs, wanted {ifd_index}")
    ifd = ifds[ifd_index]
    t = ifd.tags
    w = t[256][0]
    h = t[257][0]
    spp = t.get(277, (1,))[0]
    comp = t.get(259, (1,))[0]
    if comp in (6, 7):
        raise ValueError("JPEG-in-TIFF requires the JPEG tables path; "
                         "store imagery as plain JPEG or LZW/Deflate TIFF")
    if t.get(284, (1,))[0] != 1:
        raise ValueError("planar (non-chunky) TIFF not supported")
    dt = _dtype_for(ifd, bo)
    pred = t.get(317, (1,))[0]
    if pred not in (1, 2):
        # predictor 3 (floating-point byte shuffle) and any other value
        # would decode to garbage if silently treated as raw
        raise ValueError(f"TIFF predictor {pred} not supported "
                         "(supported: none, horizontal differencing)")
    out = np.zeros((h, w, spp), dtype=dt.newbyteorder("="))

    def place(rows: np.ndarray, y0: int, x0: int) -> None:
        hh = min(rows.shape[0], h - y0)
        ww = min(rows.shape[1], w - x0)
        out[y0:y0 + hh, x0:x0 + ww] = rows[:hh, :ww]

    if 322 in t:        # tiled
        tw, th = t[322][0], t[323][0]
        offs, cnts = t[324], t[325]
        ntx = -(-w // tw)
        row_bytes = tw * spp * dt.itemsize
        for k, (o, c) in enumerate(zip(offs, cnts)):
            raw = _decompress(comp, buf[o:o + c], th * row_bytes)
            arr = np.frombuffer(raw.ljust(th * row_bytes, b"\x00"),
                                dtype=dt).reshape(th, tw, spp)
            if pred == 2:
                arr = np.cumsum(arr.astype(np.int64), axis=1).astype(dt)
            place(arr, (k // ntx) * th, (k % ntx) * tw)
    else:               # strips
        rps = t.get(278, (h,))[0]
        offs, cnts = t[273], t[279]
        row_bytes = w * spp * dt.itemsize
        for k, (o, c) in enumerate(zip(offs, cnts)):
            y0 = k * rps
            nrows = min(rps, h - y0)
            raw = _decompress(comp, buf[o:o + c], nrows * row_bytes)
            arr = np.frombuffer(raw.ljust(nrows * row_bytes, b"\x00"),
                                dtype=dt).reshape(nrows, w, spp)
            if pred == 2:
                arr = np.cumsum(arr.astype(np.int64), axis=1).astype(dt)
            place(arr, y0, 0)
    return out[:, :, 0] if spp == 1 else out


def geotiff_info(buf: bytes) -> GeoTiffInfo:
    """Georeferencing without decoding pixels: image shape/dtype, the
    EPSG code from the GeoKey directory, and the affine origin/scale."""
    ifds, bo = _read_ifds(buf)
    ifd = ifds[0]
    t = ifd.tags
    w, h = t[256][0], t[257][0]
    spp = t.get(277, (1,))[0]
    dt = _dtype_for(ifd, bo)

    epsg = None
    if 34735 in t:      # GeoKeyDirectory: 4-short header then 4-short keys
        d = t[34735]
        nkeys = d[3]
        keys = {}
        for k in range(nkeys):
            kid, loc, cnt, val = d[4 + 4 * k: 8 + 4 * k]
            if loc == 0:
                keys[kid] = val
        model = keys.get(1024)
        if model == 2:
            epsg = keys.get(2048)       # geographic CRS
        else:
            epsg = keys.get(3072) or keys.get(2048)
        if epsg in (0, 32767):
            epsg = None

    ox = oy = pw = ph = None
    if 33922 in t and 33550 in t:
        tp = t[33922]       # i, j, k, x, y, z — anchor pixel -> CRS point
        sc = t[33550]
        pw, ph = float(sc[0]), float(sc[1])
        ox = float(tp[3]) - float(tp[0]) * pw
        oy = float(tp[4]) + float(tp[1]) * ph
    elif 34264 in t:        # ModelTransformation 4x4
        m = t[34264]
        if float(m[1]) != 0.0 or float(m[4]) != 0.0:
            # rotation/shear terms: silently reading only m[0]/m[5]
            # would misgeoreference EVERY pixel of a rotated raster —
            # unsupported transforms are rejected loudly like the other
            # gates in this module
            raise ValueError(
                "GeoTIFF ModelTransformation carries rotation/shear "
                f"(m01={m[1]!r}, m10={m[4]!r}) — only axis-aligned "
                "transforms are supported; warp the raster first")
        pw, ph = float(m[0]), float(-m[5])
        ox, oy = float(m[3]), float(m[7])
    return GeoTiffInfo(w, h, spp, str(np.dtype(dt.newbyteorder("="))),
                       epsg, ox, oy, pw, ph)


def build_geotiff(img: np.ndarray, *, epsg: int | None = None,
                  origin: tuple[float, float] | None = None,
                  scale: tuple[float, float] | None = None,
                  geographic: bool = False,
                  compression: int = 1) -> bytes:
    """Minimal single-IFD little-endian GeoTIFF writer (strip layout,
    chunky, compression none(1) or Deflate(8)).

    The raster sink for grids the engine computes (heatmaps, rasterized
    zonal layers) and the fixed-template source for the graded raster
    queries; tests cross-check it against an independent reader/writer
    pair (tests/test_tiff.py)."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    dt = img.reshape(h, w, spp).dtype
    fmt_kind = {"u": 1, "i": 2, "f": 3}[dt.kind]
    raw = img.reshape(h, w, spp).astype(
        "<" + dt.kind + str(dt.itemsize)).tobytes()
    if compression == 8:
        strip = zlib.compress(raw)
    elif compression == 1:
        strip = raw
    else:
        raise ValueError("build_geotiff writes compression 1 or 8 only")

    # dimensions/RowsPerStrip as LONG (type 4): SHORT caps at 65535 and
    # large rasters would crash struct.pack; PhotometricInterpretation
    # must be 2 (RGB) for 3-sample chunky images or external readers
    # (GDAL/Pillow) treat the file as multi-band grayscale
    tags: dict[int, tuple[int, list]] = {
        256: (4, [w]), 257: (4, [h]),
        258: (3, [dt.itemsize * 8] * spp), 259: (3, [compression]),
        262: (3, [2 if spp == 3 else 1]), 277: (3, [spp]), 278: (4, [h]),
        279: (4, [len(strip)]), 284: (3, [1]),
        339: (3, [fmt_kind] * spp),
    }
    if origin is not None and scale is not None:
        tags[33550] = (12, [float(scale[0]), float(scale[1]), 0.0])
        tags[33922] = (12, [0.0, 0.0, 0.0,
                            float(origin[0]), float(origin[1]), 0.0])
    if epsg is not None:
        if not (0 < int(epsg) <= 65535):
            # GeoKey values are 16-bit SHORTs by spec: an ESRI-style
            # 6-digit code otherwise escaped as a struct.error from the
            # generic tag loop, far from the cause
            raise ValueError(
                f"EPSG code {epsg} does not fit a 16-bit GeoKey SHORT "
                "(valid range 1-65535)")
        model = 2 if geographic else 1
        key = 2048 if geographic else 3072
        tags[34735] = (3, [1, 1, 0, 2, 1024, 0, 1, model,
                           key, 0, 1, int(epsg)])
    tags[273] = (4, [0])    # patched below

    n = len(tags)
    tsz = {3: 2, 4: 4, 12: 8}
    tfmt = {3: "H", 4: "I", 12: "d"}
    data_off = 8 + 2 + 12 * n + 4
    ext: dict[int, int] = {}
    for tag in sorted(tags):
        typ, vals = tags[tag]
        size = tsz[typ] * len(vals)
        if size > 4:
            ext[tag] = data_off
            data_off += (size + 1) & ~1
    tags[273] = (4, [data_off])

    out = bytearray(b"II" + struct.pack("<HI", 42, 8))
    out += struct.pack("<H", n)
    for tag in sorted(tags):
        typ, vals = tags[tag]
        size = tsz[typ] * len(vals)
        out += struct.pack("<HHI", tag, typ, len(vals))
        if size <= 4:
            out += struct.pack("<" + str(len(vals)) + tfmt[typ],
                               *vals).ljust(4, b"\x00")
        else:
            out += struct.pack("<I", ext[tag])
    out += struct.pack("<I", 0)
    for tag in sorted(tags):
        typ, vals = tags[tag]
        if tsz[typ] * len(vals) > 4:
            body = struct.pack("<" + str(len(vals)) + tfmt[typ], *vals)
            out += body + b"\x00" * (len(body) & 1)
    out += strip
    return bytes(out)
