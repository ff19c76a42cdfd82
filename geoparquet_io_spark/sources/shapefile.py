"""ESRI Shapefile IO in pure Python — no GDAL required.

The reference converts Shapefiles through DuckDB's GDAL bridge
(core/convert.py:995-1132; core/format_writers.py:99-243).  The format
itself is a public fixed-layout 1990s spec (ESRI Shapefile Technical
Description, July 1998): ``.shp`` geometry records, ``.shx`` fixed
8-byte record index, ``.dbf`` fixed-width dBASE III attributes,
``.prj`` WKT — so this engine parses it directly.

Scale shape: the ``.shx`` index (8 bytes/record) and the ``.dbf``
header are read driver-side — a few KB of planning metadata; the
actual record payloads are then read on EXECUTORS, each task seeking
into its slice of ``.shp``/``.dbf`` by the precomputed offsets
(``mapInPandas`` over record ranges).  A shapefile caps at 2 GB so one
file is never "big data", but a DIRECTORY of shapefiles fans out to
one-plus tasks per file with no driver bottleneck.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np

from geoparquet_io_spark.functions import wkb as W

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8
# Z/M variants carry the same XY layout first; Z/M arrays trail and are
# dropped on read (GeoParquet WKB here is 2-D)
_BASE_TYPE = {0: 0, 1: 1, 3: 3, 5: 5, 8: 8,
              11: 1, 13: 3, 15: 5, 18: 8,
              21: 1, 23: 3, 25: 5, 28: 8}


# ---------------------------------------------------------------------------
# Geometry record -> WKB
# ---------------------------------------------------------------------------

def _ring_signed_area(ring: np.ndarray) -> float:
    # one shared shoelace kernel (functions/wkb.py) — divergent copies
    # of ring math were the source of boundary-semantics bugs
    a, _, _ = W._ring_area_centroid(np.asarray(ring, dtype="f8"))
    return a


def _rings_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Shapefile polygon rings -> WKB Polygon/MultiPolygon.

    Spec orientation: outer rings clockwise (negative shoelace area),
    holes counter-clockwise.  Each hole attaches to the SMALLEST outer
    ring containing its first vertex — "first containing" misfiled the
    hole of a nested island-in-lake polygon into the outermost shell.
    Containment is boundary-inclusive (wkb kernel): snapped data with a
    hole touching its shell at a vertex must not become a solid ring.
    Files that ignore orientation (all rings one direction) degrade to
    one polygon per ring."""
    # one shoelace pass per ring (this runs per RECORD in the executor
    # hot path — the area was previously recomputed up to 3x per ring)
    sa = [_ring_signed_area(r) for r in rings]
    outers = [r for r, a in zip(rings, sa) if a < 0]
    if not outers:                      # orientation-ignorant writer
        outers, holes = rings, []
        areas = [abs(a) for a in sa]
    else:
        holes = [r for r, a in zip(rings, sa) if a >= 0]
        areas = [abs(a) for a in sa if a < 0]
    polys: list[list[np.ndarray]] = [[o] for o in outers]
    for h in holes:
        px, py = float(h[0, 0]), float(h[0, 1])
        best = None
        for i, poly in enumerate(polys[:len(areas)]):
            if W._point_in_ring(px, py, np.asarray(poly[0], dtype="f8")):
                if best is None or areas[i] < areas[best]:
                    best = i
        if best is not None:
            polys[best].append(h)
        else:
            polys.append([h[::-1]])     # orphan hole -> own polygon
    if len(polys) == 1:
        return W.encode_polygon(polys[0])
    return W.encode_multipolygon(polys)


def shape_record_to_wkb(content: bytes) -> bytes | None:
    """One .shp record content (starting at its LE shape-type int) ->
    WKB bytes, or None for a Null shape."""
    stype = struct.unpack_from("<i", content, 0)[0]
    base = _BASE_TYPE.get(stype)
    if base is None:
        raise ValueError(f"unsupported shapefile shape type {stype}")
    if base == SHAPE_NULL:
        return None
    if base == SHAPE_POINT:
        x, y = struct.unpack_from("<2d", content, 4)
        return W.encode_point(x, y)
    if base == SHAPE_MULTIPOINT:
        n = struct.unpack_from("<i", content, 36)[0]
        pts = np.frombuffer(content, dtype="<f8", count=2 * n,
                            offset=40).reshape(-1, 2)
        return (b"\x01\x04\x00\x00\x00" + struct.pack("<I", n)
                + b"".join(W.encode_point(x, y) for x, y in pts))
    # polyline / polygon: bbox(32) numParts numPoints parts points
    n_parts, n_pts = struct.unpack_from("<2i", content, 36)
    parts = struct.unpack_from(f"<{n_parts}i", content, 44)
    coords = np.frombuffer(content, dtype="<f8", count=2 * n_pts,
                           offset=44 + 4 * n_parts).reshape(-1, 2)
    bounds = list(parts) + [n_pts]
    rings = [coords[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
    if base == SHAPE_POLYLINE:
        if len(rings) == 1:
            return W.encode_linestring(rings[0])
        return (b"\x01\x05\x00\x00\x00" + struct.pack("<I", len(rings))
                + b"".join(W.encode_linestring(r) for r in rings))
    return _rings_to_wkb(rings)


# ---------------------------------------------------------------------------
# DBF attributes
# ---------------------------------------------------------------------------

def read_dbf_header(path: str) -> dict:
    with open(path, "rb") as fh:
        head = fh.read(32)
        n_records = struct.unpack_from("<I", head, 4)[0]
        header_size, record_size = struct.unpack_from("<2H", head, 8)
        fields = []
        raw = fh.read(header_size - 32)
        off = 0
        while off + 32 <= len(raw) and raw[off] != 0x0D:
            name = raw[off:off + 11].split(b"\x00")[0].decode(
                "latin-1").strip()
            ftype = chr(raw[off + 11])
            flen = raw[off + 16]
            fdec = raw[off + 17]
            fields.append({"name": name, "type": ftype,
                           "length": flen, "decimals": fdec})
            off += 32
    return {"n_records": n_records, "header_size": header_size,
            "record_size": record_size, "fields": fields}


def _parse_dbf_value(raw: bytes, f: dict):
    s = raw.decode("latin-1").strip()
    t = f["type"]
    if t == "C":
        return s if s else None
    if t in ("N", "F"):
        if not s or s == "*" * len(s):
            return None
        if f["decimals"] or t == "F":
            return float(s)
        # decimals=0 maps to LongType in the Spark schema, but some
        # writers emit '3.0' in integer N fields — accept INTEGRAL
        # float text so the Int64 cast downstream never fails, yet
        # refuse genuinely fractional values (silently rounding '3.7'
        # would corrupt data on read)
        if "." in s or "e" in s.lower():
            v = float(s)
            if v != int(v):
                raise ValueError(
                    f"fractional value {s!r} in integer DBF field "
                    f"{f['name']!r} (N..0) — the file's declared type "
                    "does not match its data")
            return int(v)
        return int(s)
    if t == "L":
        if s in ("T", "t", "Y", "y"):
            return True
        if s in ("F", "f", "N", "n"):
            return False
        return None
    if t == "D":
        return s if s else None          # YYYYMMDD, kept as string
    return s if s else None


def _dbf_spark_type(f: dict):
    from pyspark.sql import types as T

    t = f["type"]
    if t in ("N", "F"):
        if f["decimals"] or t == "F":
            return T.DoubleType()
        if f["length"] > 18:
            # an N19+/N20 integer field can exceed int64 — a long cast
            # would OverflowError the whole read; decimal is lossless
            return T.DecimalType(min(f["length"], 38), 0)
        return T.LongType()
    if t == "L":
        return T.BooleanType()
    return T.StringType()


# ---------------------------------------------------------------------------
# Read
# ---------------------------------------------------------------------------

def read_shx_offsets(path: str) -> list[tuple[int, int]]:
    """.shx -> [(byte_offset, content_bytes)] per record (driver-side,
    8 bytes/record planning metadata)."""
    with open(path, "rb") as fh:
        data = fh.read()
    out = []
    for off in range(100, len(data), 8):
        o, ln = struct.unpack_from(">2i", data, off)
        out.append((o * 2, ln * 2))
    return out


def read_shapefile(spark, path: str, geometry_column: str = "geometry",
                   tasks: int | None = None):
    """Shapefile (.shp + .dbf [+ .prj]) -> GeoTable.

    Planning reads the tiny .shx/.dbf headers driver-side; the record
    payloads are fetched by executors over index ranges."""
    import pandas as pd

    from pyspark.sql import types as T

    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

    from geoparquet_io_spark.sources.remote import (
        is_fetchable_url, localize_file, task_local_path,
    )

    base = os.path.splitext(path)[0]
    shp, shx, dbf, prj = (base + e for e in (".shp", ".shx", ".dbf", ".prj"))
    shp_name = dbf_name = None
    if is_fetchable_url(path):
        # .shp is required; sidecars are fetched best-effort (a missing
        # .shx just falls back to the sequential header scan)
        shp, shp_name = localize_file(spark, shp)
        shx = localize_file(spark, shx, optional=True)[0] or ""
        dbf, dbf_name = localize_file(spark, dbf, optional=True)
        prj = localize_file(spark, prj, optional=True)[0] or ""
        dbf = dbf or ""
    offsets = read_shx_offsets(shx) if os.path.isfile(shx) else \
        _scan_shp_offsets(shp)
    dbf_meta = read_dbf_header(dbf) if os.path.isfile(dbf) else None
    if dbf_meta:
        # a DBF attribute legally named like the geometry column (or a
        # duplicate DBF name) collides in both the Struct schema and the
        # scan dict — the attribute silently overwrote the WKB column
        # and every task failed with a column-count mismatch
        taken = {geometry_column}
        for f in dbf_meta["fields"]:
            if f["name"] in taken:
                base, k = f["name"], 1
                while f"{base}_{k}" in taken:
                    k += 1
                f["name"] = f"{base}_{k}"
            taken.add(f["name"])
    n = len(offsets)
    if dbf_meta and dbf_meta["n_records"] != n:
        raise ValueError(
            f".dbf has {dbf_meta['n_records']} records but .shp has {n}")

    fields = [T.StructField(geometry_column, T.BinaryType())]
    if dbf_meta:
        fields += [T.StructField(f["name"], _dbf_spark_type(f))
                   for f in dbf_meta["fields"]]
    schema = T.StructType(fields)
    crs = read_prj_epsg(prj) if os.path.isfile(prj) else None

    if n == 0:
        df = spark.createDataFrame([], schema)
    else:
        n_tasks = tasks or min(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            max(1, n // 2000) or 1)
        step = (n + n_tasks - 1) // n_tasks
        # each range row CARRIES its span slice: closing over the whole
        # offsets list would serialize the full per-record table into
        # every task binary (multi-GB at ~70M records) — as rows, each
        # task receives only its slice.  i0 rides along for the DBF seek.
        ranges = [(i, [o for o, _ in offsets[i:j]],
                   [ln for _, ln in offsets[i:j]])
                  for i, j in ((i, min(n, i + step))
                               for i in range(0, n, step))]
        rdf = spark.createDataFrame(
            ranges, "i0 bigint, offs array<bigint>, lens array<bigint>") \
            .repartition(len(ranges))

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            shp_t = task_local_path(shp, shp_name)
            dbf_t = task_local_path(dbf, dbf_name) if dbf else dbf
            for pdf in batches:
                for i0, offs, lens in zip(pdf["i0"], pdf["offs"],
                                          pdf["lens"]):
                    i0 = int(i0)
                    i1 = i0 + len(offs)
                    rows = []
                    with open(shp_t, "rb") as fh:
                        for off, ln in zip(offs, lens):
                            off, ln = int(off), int(ln)
                            fh.seek(off + 8)     # skip record header
                            rows.append(
                                shape_record_to_wkb(fh.read(ln)))
                    out = {geometry_column: rows}
                    if dbf_meta:
                        rs, hs = (dbf_meta["record_size"],
                                  dbf_meta["header_size"])
                        with open(dbf_t, "rb") as fh:
                            fh.seek(hs + i0 * rs)
                            blob = fh.read((i1 - i0) * rs)
                        for j, f in enumerate(dbf_meta["fields"]):
                            start = 1 + sum(g["length"] for g in
                                            dbf_meta["fields"][:j])
                            out[f["name"]] = [
                                _parse_dbf_value(
                                    blob[k * rs + start:
                                         k * rs + start + f["length"]], f)
                                for k in range(i1 - i0)]
                    pdf_out = pd.DataFrame(out)
                    for f, sf in zip(dbf_meta["fields"] if dbf_meta else [],
                                     fields[1:]):
                        if isinstance(sf.dataType, T.LongType):
                            pdf_out[f["name"]] = \
                                pdf_out[f["name"]].astype("Int64")
                        elif isinstance(sf.dataType, T.DecimalType):
                            import decimal

                            pdf_out[f["name"]] = pdf_out[f["name"]].map(
                                lambda v: None if pd.isna(v)
                                else decimal.Decimal(int(v)))
                    yield pdf_out

        df = rdf.mapInPandas(scan, schema=schema)

    gmeta = GeoColumnMeta(crs=crs)
    return GeoTable(df, GeoMeta(primary_column=geometry_column,
                                columns={geometry_column: gmeta}))


def _scan_shp_offsets(shp: str) -> list[tuple[int, int]]:
    """No .shx: one sequential driver pass over .shp record HEADERS
    (seek-skip, content never read) to rebuild the index."""
    out = []
    size = os.path.getsize(shp)
    with open(shp, "rb") as fh:
        off = 100
        while off + 8 <= size:
            fh.seek(off)
            _, ln = struct.unpack(">2i", fh.read(8))
            out.append((off, ln * 2))
            off += 8 + ln * 2
    return out


def read_prj_epsg(prj_path: str) -> str | None:
    """.prj WKT -> "EPSG:code" via the LAST AUTHORITY clause (the one
    naming the whole CRS), or None for 4326/unknown."""
    import re

    with open(prj_path, "r", encoding="utf-8", errors="replace") as fh:
        wkt = fh.read()
    codes = re.findall(r'AUTHORITY\["EPSG",\s*"?(\d+)"?\]', wkt)
    if not codes:
        # authority-less ESRI-style WKT: WGS84 names mean lon/lat default
        return None
    code = int(codes[-1])
    return None if code == 4326 else f"EPSG:{code}"


# ---------------------------------------------------------------------------
# Write
# ---------------------------------------------------------------------------

def _wkb_to_shape_record(wkb: bytes) -> tuple[int, bytes]:
    """WKB -> (shape_type, .shp record content). 2-D only."""
    g = W.parse(wkb)
    t = g.type_name
    if t == "POINT":
        x, y = g.parts[0][0]
        return SHAPE_POINT, struct.pack("<i2d", SHAPE_POINT, x, y)
    if t == "MULTIPOINT":
        pts = np.vstack([c.parts[0] for c in g.children]) if g.children \
            else np.empty((0, 2))
        return SHAPE_MULTIPOINT, _packed_parts(SHAPE_MULTIPOINT, None, pts)
    if t in ("LINESTRING", "MULTILINESTRING"):
        lines = g.parts if t == "LINESTRING" else \
            [c.parts[0] for c in g.children]
        return SHAPE_POLYLINE, _packed_parts(SHAPE_POLYLINE, lines, None)
    if t in ("POLYGON", "MULTIPOLYGON"):
        rings = []
        polys = [g] if t == "POLYGON" else g.children
        for poly in polys:
            for i, r in enumerate(poly.parts):
                a = _ring_signed_area(np.asarray(r, dtype="f8"))
                # outer must be CW (area<0), holes CCW
                if (i == 0 and a > 0) or (i > 0 and a < 0):
                    r = r[::-1]
                rings.append(np.asarray(r, dtype="f8"))
        return SHAPE_POLYGON, _packed_parts(SHAPE_POLYGON, rings, None)
    raise ValueError(f"cannot write geometry type {t} to shapefile")


def _packed_parts(stype: int, parts: list[np.ndarray] | None,
                  flat_pts: np.ndarray | None) -> bytes:
    if parts is not None:
        coords = np.vstack(parts) if parts else np.empty((0, 2))
    else:
        coords = flat_pts
    if len(coords):
        bbox = (coords[:, 0].min(), coords[:, 1].min(),
                coords[:, 0].max(), coords[:, 1].max())
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)
    out = [struct.pack("<i4d", stype, *bbox)]
    if parts is not None:
        out.append(struct.pack("<2i", len(parts), len(coords)))
        idx = 0
        for p in parts:
            out.append(struct.pack("<i", idx))
            idx += len(p)
    else:
        out.append(struct.pack("<i", len(coords)))
    out.append(np.ascontiguousarray(coords, dtype="<f8").tobytes())
    return b"".join(out)


def _dbf_field_spec(name: str, dtype, sample_vals) -> dict:
    from pyspark.sql import types as T

    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                          T.LongType)):
        # width from the DATA (all rows are driver-side anyway): N<=18
        # reads back as LongType, so common integer columns round-trip
        # type-stable; only genuinely wide values need N19/N20 (which
        # the reader maps to DecimalType to avoid int64 overflow)
        sample_vals = list(sample_vals)
        width = max([len(str(int(v))) for v in sample_vals
                     if v is not None] or [1])
        return {"name": name[:10], "type": "N",
                "length": max(width, 18), "decimals": 0}
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"name": name[:10], "type": "N", "length": 24, "decimals": 8}
    if isinstance(dtype, T.BooleanType):
        return {"name": name[:10], "type": "L", "length": 1, "decimals": 0}
    width = max([len(str(v)) for v in sample_vals if v is not None] or [1])
    return {"name": name[:10], "type": "C",
            "length": min(254, max(1, width)), "decimals": 0}


def _format_dbf_value(v, f: dict) -> bytes:
    ln = f["length"]
    if v is None:
        return b" " * ln
    if f["type"] == "N":
        s = (f"{v:.{f['decimals']}f}" if f["decimals"] else str(int(v)))
        if len(s) > ln and f["decimals"]:
            # shave fractional digits before giving up — the integer
            # part and sign must survive intact
            for dec in range(f["decimals"] - 1, -1, -1):
                s = f"{v:.{dec}f}"
                if len(s) <= ln:
                    break
        if len(s) > ln:
            # NEVER truncate digits (silently corrupts values); DBF has
            # no widening protocol mid-write, so fail loudly
            raise ValueError(
                f"value {v!r} does not fit DBF field "
                f"{f['name']!r} (N{ln}.{f['decimals']})")
        return s.rjust(ln).encode("latin-1")
    if f["type"] == "L":
        return b"T" if v else b"F"
    s = str(v)
    if len(s) > ln:
        # same loud-failure policy as numeric fields: C fields are sized
        # from the full data, so this only fires at the 254-byte DBF cap
        raise ValueError(
            f"value of length {len(s)} does not fit DBF field "
            f"{f['name']!r} (C{ln}, format maximum 254)")
    try:
        return s.ljust(ln).encode("latin-1")
    except UnicodeEncodeError:
        # errors='replace' silently turned CJK/emoji text into '?' —
        # character corruption gets the same loud failure as numeric
        # overflow (this single-codepage writer cannot represent it)
        raise ValueError(
            f"value {s!r} for DBF field {f['name']!r} contains "
            "characters outside latin-1 — DBF C fields here are "
            "latin-1; transliterate or drop the column")


def write_shapefile(gt, path: str) -> None:
    """GeoTable -> .shp/.shx/.dbf (+.prj) — driver-side single-file sink,
    the same shape as the reference's COPY FORMAT GDAL.  All geometries
    must share one shapefile shape class (point / line / polygon /
    multipoint); nested attribute columns are dropped like the
    reference does."""
    if gt.geometry_column is None:
        raise ValueError(
            "write_shapefile requires a geometry column; this table has none"
        )
    base = os.path.splitext(path)[0]
    gcol = gt.geometry_column
    df = gt.df
    nested = [f.name for f in df.schema.fields
              if f.dataType.simpleString().startswith(
                  ("struct", "array", "map")) and f.name != gcol]
    if nested:
        import warnings

        warnings.warn(f"dropping nested columns unsupported by "
                      f"shapefile: {nested}")
        df = df.drop(*nested)
    rows = df.collect()

    records, stypes = [], set()
    for r in rows:
        wkb = r[gcol]
        if wkb is None:
            records.append((SHAPE_NULL, struct.pack("<i", SHAPE_NULL)))
        else:
            rec = _wkb_to_shape_record(bytes(wkb))
            records.append(rec)
            stypes.add(rec[0])
    if len(stypes) > 1:
        raise ValueError(
            f"shapefile requires a single shape class, got {sorted(stypes)}")
    stype = next(iter(stypes)) if stypes else SHAPE_NULL

    # file bbox
    xs, ys = [], []
    for r in rows:
        if r[gcol] is not None:
            x0, y0, x1, y1 = W.envelope(bytes(r[gcol]))
            xs += [x0, x1]
            ys += [y0, y1]
    bbox = (min(xs), min(ys), max(xs), max(ys)) if xs else (0, 0, 0, 0)

    shp_parts, shx_parts = [], []
    off_words = 50                       # header = 100 bytes = 50 words
    for i, (_, content) in enumerate(records):
        ln_words = len(content) // 2
        shx_parts.append(struct.pack(">2i", off_words, ln_words))
        shp_parts.append(struct.pack(">2i", i + 1, ln_words) + content)
        off_words += 4 + ln_words

    def header(total_words: int) -> bytes:
        return (struct.pack(">i", 9994) + b"\x00" * 20
                + struct.pack(">i", total_words)
                + struct.pack("<2i", 1000, stype)
                + struct.pack("<8d", *bbox, 0, 0, 0, 0))

    body = b"".join(shp_parts)
    with open(base + ".shp", "wb") as fh:
        fh.write(header(50 + len(body) // 2) + body)
    with open(base + ".shx", "wb") as fh:
        fh.write(header(50 + 4 * len(records)) + b"".join(shx_parts))

    attr_fields = [f for f in df.schema.fields if f.name != gcol]
    # C-field widths from ALL rows (they're already collected): sizing
    # from a 100-row sample truncated longer strings later in the file
    specs = [_dbf_field_spec(f.name, f.dataType,
                             (r[f.name] for r in rows))
             for f in attr_fields]
    # DBF names cap at 10 chars: deduplicate truncations or a column
    # silently vanishes on round-trip (two fields, one name)
    seen: dict[str, int] = {}
    for s in specs:
        if s["name"] in seen:
            seen[s["name"]] += 1
            suffix = f"_{seen[s['name']]}"
            s["name"] = s["name"][:10 - len(suffix)] + suffix
        seen.setdefault(s["name"], 0)
    record_size = 1 + sum(s["length"] for s in specs)
    header_size = 32 + 32 * len(specs) + 1
    with open(base + ".dbf", "wb") as fh:
        fh.write(struct.pack("<4B", 0x03, 124, 1, 1)
                 + struct.pack("<I", len(rows))
                 + struct.pack("<2H", header_size, record_size)
                 + b"\x00" * 20)
        for s in specs:
            fh.write(s["name"].encode("latin-1").ljust(11, b"\x00")
                     + s["type"].encode() + b"\x00" * 4
                     + bytes([s["length"], s["decimals"]]) + b"\x00" * 14)
        fh.write(b"\x0D")
        for r in rows:
            fh.write(b" " + b"".join(
                _format_dbf_value(r[f.name], s)
                for f, s in zip(attr_fields, specs)))
        fh.write(b"\x1A")

    crs = gt.crs
    if isinstance(crs, str) and crs.upper().startswith("EPSG:"):
        from geoparquet_io_spark.functions.crs_wkt import wkt_for_epsg

        code = crs.split(":")[1]
        full = wkt_for_epsg(int(code))
        with open(base + ".prj", "w") as fh:
            # minimal AUTHORITY-only stub for codes outside the engine's
            # projection registry — still round-trips via read_prj_epsg
            fh.write(full if full is not None else
                     f'PROJCS["EPSG:{code}",AUTHORITY["EPSG","{code}"]]')
    elif crs is None:
        from geoparquet_io_spark.sources.gpkg import _WGS84_WKT

        with open(base + ".prj", "w") as fh:
            fh.write(_WGS84_WKT)
