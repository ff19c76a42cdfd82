"""FlatGeobuf IO in pure Python — no GDAL required.

The reference converts FlatGeobuf via DuckDB's GDAL bridge
(core/convert.py:995-1132; core/format_writers.py:99-243).  FlatGeobuf
is a fully public format (https://flatgeobuf.org, BSD spec): an 8-byte
magic, a size-prefixed FlatBuffers ``Header``, an optional packed
Hilbert R-tree index, then size-prefixed FlatBuffers ``Feature``
records.  The FlatBuffers layer here is functions/flatbuf.py (own
minimal runtime).

Scale shape: the driver walks ONLY the size prefixes to collect each
feature's (offset, length) — O(file) sequential IO but zero parsing;
the actual FlatBuffers/geometry decode (the expensive part) runs on
EXECUTORS over byte ranges via ``mapInPandas``.  The write is
driver-side single-file like every single-file sink here (and the
reference's COPY).  The index is skipped on read (its node layout is
size-computable) and omitted on write (``index_node_size=0``, allowed
by the spec).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np

from geoparquet_io_spark.functions import flatbuf as FB
from geoparquet_io_spark.functions import wkb as W

MAGIC = b"\x66\x67\x62\x03\x66\x67\x62\x00"

# GeometryType enum (flatgeobuf header.fbs)
GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3
GEOM_MULTIPOINT, GEOM_MULTILINESTRING, GEOM_MULTIPOLYGON = 4, 5, 6
GEOM_COLLECTION = 7
_GEOM_NAMES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
               5: "MultiLineString", 6: "MultiPolygon",
               7: "GeometryCollection"}
# WKT type name (wkb.Geom.type_name) -> FlatGeobuf GeometryType code —
# the single source for both the per-geometry tables and the header
_WKT_TO_CODE = {"POINT": GEOM_POINT, "LINESTRING": GEOM_LINESTRING,
                "POLYGON": GEOM_POLYGON, "MULTIPOINT": GEOM_MULTIPOINT,
                "MULTILINESTRING": GEOM_MULTILINESTRING,
                "MULTIPOLYGON": GEOM_MULTIPOLYGON,
                "GEOMETRYCOLLECTION": GEOM_COLLECTION}

# ColumnType enum (flatgeobuf header.fbs)
COL_BYTE, COL_UBYTE, COL_BOOL, COL_SHORT, COL_USHORT = 0, 1, 2, 3, 4
COL_INT, COL_UINT, COL_LONG, COL_ULONG = 5, 6, 7, 8
COL_FLOAT, COL_DOUBLE, COL_STRING, COL_JSON = 9, 10, 11, 12
COL_DATETIME, COL_BINARY = 13, 14
_FIXED_FMT = {COL_BYTE: ("b", 1), COL_UBYTE: ("B", 1), COL_BOOL: ("B", 1),
              COL_SHORT: ("h", 2), COL_USHORT: ("H", 2), COL_INT: ("i", 4),
              COL_UINT: ("I", 4), COL_LONG: ("q", 8), COL_ULONG: ("Q", 8),
              COL_FLOAT: ("f", 4), COL_DOUBLE: ("d", 8)}
_VARLEN = {COL_STRING, COL_JSON, COL_DATETIME, COL_BINARY}


# ---------------------------------------------------------------------------
# Geometry table <-> WKB
# ---------------------------------------------------------------------------
# Geometry fields: 0 ends [uint] (cumulative END VERTEX index per ring,
# the convention of the reference implementations), 1 xy [double],
# 6 type ubyte, 7 parts [Geometry].

def _geom_table_to_wkb(t: FB.Table, gtype: int) -> bytes:
    own = t.scalar(6, "B", 0)
    if own:
        gtype = own
    if gtype == GEOM_POINT:
        xy = t.vector_scalars(1, "d", 8) or [float("nan")] * 2
        return W.encode_point(xy[0], xy[1])
    if gtype == GEOM_LINESTRING:
        xy = np.asarray(t.vector_scalars(1, "d", 8) or [],
                        dtype="f8").reshape(-1, 2)
        return W.encode_linestring(xy)
    if gtype == GEOM_MULTIPOINT:
        xy = np.asarray(t.vector_scalars(1, "d", 8) or [],
                        dtype="f8").reshape(-1, 2)
        return (b"\x01\x04\x00\x00\x00" + struct.pack("<I", len(xy))
                + b"".join(W.encode_point(x, y) for x, y in xy))
    if gtype in (GEOM_POLYGON, GEOM_MULTILINESTRING):
        xy = np.asarray(t.vector_scalars(1, "d", 8) or [],
                        dtype="f8").reshape(-1, 2)
        ends = t.vector_scalars(0, "I", 4) or ([len(xy)] if len(xy) else [])
        rings, start = [], 0
        for e in ends:
            rings.append(xy[start:e])
            start = e
        if gtype == GEOM_POLYGON:
            return W.encode_polygon(rings)
        return (b"\x01\x05\x00\x00\x00" + struct.pack("<I", len(rings))
                + b"".join(W.encode_linestring(r) for r in rings))
    if gtype in (GEOM_MULTIPOLYGON, GEOM_COLLECTION):
        parts = t.vector_tables(7) or []
        if gtype == GEOM_MULTIPOLYGON:
            if not parts:
                # official writers (C++/JS/GDAL) FLATTEN a single-polygon
                # MultiPolygon to bare xy+ends with no parts vector;
                # returning an empty multi here silently lost the
                # geometry of every such feature
                xy = t.vector_scalars(1, "d", 8)
                if xy:
                    poly = _geom_table_to_wkb(t, GEOM_POLYGON)
                    return (b"\x01\x06\x00\x00\x00" + struct.pack("<I", 1)
                            + poly)
            wkbs = [_geom_table_to_wkb(p, GEOM_POLYGON) for p in parts]
            return (b"\x01\x06\x00\x00\x00" + struct.pack("<I", len(wkbs))
                    + b"".join(wkbs))
        wkbs = [_geom_table_to_wkb(p, GEOM_UNKNOWN) for p in parts]
        return (b"\x01\x07\x00\x00\x00" + struct.pack("<I", len(wkbs))
                + b"".join(wkbs))
    raise ValueError(f"unsupported FlatGeobuf geometry type {gtype}")


def _build_geom_table(b: FB.Builder, g: W.Geom, declared: int) -> int:
    """WKB Geom -> Geometry table offset; sets type field only when it
    differs from the header-declared type (spec convention)."""
    fields: dict = {}
    t = g.type_name
    code = _WKT_TO_CODE[t]
    if t == "POINT":
        xy = g.parts[0].reshape(-1)
        fields[1] = ("offset", b.vector_scalars("d", 8, xy))
    elif t == "LINESTRING":
        fields[1] = ("offset",
                     b.vector_scalars("d", 8, g.parts[0].reshape(-1)))
    elif t == "MULTIPOINT":
        pts = np.vstack([c.parts[0] for c in g.children]) if g.children \
            else np.empty((0, 2))
        fields[1] = ("offset", b.vector_scalars("d", 8, pts.reshape(-1)))
    elif t in ("POLYGON", "MULTILINESTRING"):
        rings = g.parts if t == "POLYGON" else \
            [c.parts[0] for c in g.children]
        flat = np.vstack(rings) if rings else np.empty((0, 2))
        ends = np.cumsum([len(r) for r in rings]).tolist()
        fields[0] = ("offset", b.vector_scalars("I", 4, ends))
        fields[1] = ("offset", b.vector_scalars("d", 8, flat.reshape(-1)))
    elif t in ("MULTIPOLYGON", "GEOMETRYCOLLECTION"):
        parts = [_build_geom_table(b, c, GEOM_UNKNOWN) for c in g.children]
        fields[7] = ("offset", b.vector_offsets(parts))
    else:
        raise ValueError(f"cannot write geometry type {t} to FlatGeobuf")
    if code != declared:
        fields[6] = ("scalar", "B", 1, code)
    return b.table(fields)


# ---------------------------------------------------------------------------
# Properties blob
# ---------------------------------------------------------------------------

def decode_properties(blob: bytes, columns: list[dict]) -> dict:
    out: dict = {}
    off = 0
    while off + 2 <= len(blob):
        ci = struct.unpack_from("<H", blob, off)[0]
        off += 2
        if ci >= len(columns):
            # untrusted file bytes: a corrupt column index otherwise
            # dies as a bare IndexError deep in an executor task
            raise ValueError(
                f"corrupt FlatGeobuf properties: column index {ci} out "
                f"of range (header declares {len(columns)} columns)")
        col = columns[ci]
        ct = col["type"]
        if ct in _FIXED_FMT:
            fmt, size = _FIXED_FMT[ct]
            v = struct.unpack_from("<" + fmt, blob, off)[0]
            off += size
            if ct == COL_BOOL:
                v = bool(v)
            out[col["name"]] = v
        elif ct in _VARLEN:
            n = struct.unpack_from("<I", blob, off)[0]
            off += 4
            raw = blob[off:off + n]
            off += n
            out[col["name"]] = raw if ct == COL_BINARY \
                else raw.decode("utf-8")
        else:
            raise ValueError(f"unknown FlatGeobuf column type {ct}")
    return out


def encode_properties(row: dict, columns: list[dict]) -> bytes:
    out = []
    for i, col in enumerate(columns):
        v = row.get(col["name"])
        if v is None:
            continue
        ct = col["type"]
        out.append(struct.pack("<H", i))
        if ct in _FIXED_FMT:
            fmt, _ = _FIXED_FMT[ct]
            out.append(struct.pack("<" + fmt,
                                   int(v) if ct == COL_BOOL else v))
        else:
            raw = v if isinstance(v, (bytes, bytearray)) \
                else str(v).encode("utf-8")
            out.append(struct.pack("<I", len(raw)) + bytes(raw))
    return b"".join(out)


# ---------------------------------------------------------------------------
# Header
# ---------------------------------------------------------------------------

def _parse_header(buf: bytes) -> dict:
    h = FB.root(buf)
    cols = []
    for c in (h.vector_tables(7) or []):
        cols.append({"name": c.string(0), "type": c.scalar(1, "B", 0)})
    crs_t = h.table(10)
    crs = None
    if crs_t is not None:
        org, code = crs_t.string(0), crs_t.scalar(1, "i", 0)
        if code and (org or "EPSG").upper() == "EPSG" and code != 4326:
            crs = f"EPSG:{code}"
    return {
        "name": h.string(0),
        "envelope": h.vector_scalars(1, "d", 8),
        "geometry_type": h.scalar(2, "B", 0),
        "has_z": bool(h.scalar(3, "B", 0)),
        "has_m": bool(h.scalar(4, "B", 0)),
        "columns": cols,
        "features_count": h.scalar(8, "Q", 0),
        "index_node_size": h.scalar(9, "H", 16),
        "crs": crs,
    }


def _rtree_levels(num_items: int, node_size: int) -> list[int]:
    """Node counts per level, LEAF level first (do-while: always at
    least one parent level, matching the reference implementations)."""
    node_size = max(2, node_size)
    levels = [num_items]
    n = num_items
    while True:
        n = (n + node_size - 1) // node_size
        levels.append(n)
        if n == 1:
            break
    return levels


def packed_rtree_size(num_items: int, node_size: int) -> int:
    """Byte size of the packed Hilbert R-tree index (40-byte nodes:
    4 doubles + uint64 offset), summed over all levels."""
    if num_items == 0 or node_size == 0:
        return 0
    return sum(_rtree_levels(num_items, node_size)) * 40


def build_packed_rtree(boxes: "np.ndarray", offsets: list[int],
                       node_size: int = 16) -> bytes:
    """Packed R-tree over Hilbert-ordered items: leaves carry (bbox,
    byte offset of the feature within the features section); internal
    nodes carry the union bbox and the node INDEX of their first child
    (self-consistent convention, enforced by :func:`search_packed_rtree`
    and round-trip tests).  Stored root level first, leaves last —
    40 bytes per node."""
    n = len(offsets)
    levels = _rtree_levels(n, node_size)         # leaf-first
    stored = list(reversed(levels))              # root-first
    starts = [0]
    for c in stored[:-1]:
        starts.append(starts[-1] + c)
    # nodes as (xmin, ymin, xmax, ymax, offset)
    total = sum(stored)
    nodes = [(0.0, 0.0, 0.0, 0.0, 0)] * total
    leaf_start = starts[-1]
    for i in range(n):
        b = boxes[i]
        nodes[leaf_start + i] = (float(b[0]), float(b[1]), float(b[2]),
                                 float(b[3]), int(offsets[i]))
    node_size = max(2, node_size)
    for li in range(len(stored) - 2, -1, -1):    # build parents bottom-up
        cstart, ccount = starts[li + 1], stored[li + 1]
        for j in range(stored[li]):
            first = cstart + j * node_size
            last = min(first + node_size, cstart + ccount)
            xs0 = min(nodes[k][0] for k in range(first, last))
            ys0 = min(nodes[k][1] for k in range(first, last))
            xs1 = max(nodes[k][2] for k in range(first, last))
            ys1 = max(nodes[k][3] for k in range(first, last))
            # internal offset = first child's BYTE offset within the
            # tree (the reference C++ packer's convention); our search
            # derives children STRUCTURALLY so either convention reads
            nodes[starts[li] + j] = (xs0, ys0, xs1, ys1, first * 40)
    return b"".join(struct.pack("<4dQ", *nd) for nd in nodes)


def search_packed_rtree(index: bytes, num_items: int, node_size: int,
                        rect: tuple[float, float, float, float]
                        ) -> list[int]:
    """Leaf ITEM indices (file order) whose bbox intersects ``rect`` —
    driver-side descent over the packed tree, O(log + hits).

    Children are derived STRUCTURALLY from the level bounds (child j of
    the k-th node at a level starts at that level's base + k*node_size)
    rather than from the stored internal ``offset`` field — reference
    implementations disagree on that field's convention (byte offset vs
    node index), while the packed layout itself is fully determined by
    (num_items, node_size).  Works on our own files AND external
    conforming writers."""
    if num_items == 0:
        return []
    stored = list(reversed(_rtree_levels(num_items, node_size)))
    starts = [0]
    for c in stored[:-1]:
        starts.append(starts[-1] + c)
    leaf_start = starts[-1]
    node_size = max(2, node_size)
    xmin, ymin, xmax, ymax = rect

    def node(i):
        return struct.unpack_from("<4dQ", index, i * 40)

    out = []
    queue = [(0, 0)]                     # (node index, level index)
    while queue:
        i, li = queue.pop()
        x0, y0, x1, y1, _off = node(i)
        if x0 > xmax or x1 < xmin or y0 > ymax or y1 < ymin:
            continue
        if i >= leaf_start:
            out.append(i - leaf_start)
        else:
            first = starts[li + 1] + (i - starts[li]) * node_size
            cend = starts[li + 1] + stored[li + 1]
            queue.extend((c, li + 1)
                         for c in range(first, min(first + node_size, cend)))
    return sorted(out)


def _spark_to_coltype(dt) -> int:
    from pyspark.sql import types as T

    if isinstance(dt, T.BooleanType):
        return COL_BOOL
    if isinstance(dt, (T.ByteType, T.ShortType)):
        return COL_SHORT
    if isinstance(dt, T.IntegerType):
        return COL_INT
    if isinstance(dt, T.LongType):
        return COL_LONG
    if isinstance(dt, T.FloatType):
        return COL_FLOAT
    if isinstance(dt, (T.DoubleType, T.DecimalType)):
        return COL_DOUBLE
    if isinstance(dt, T.BinaryType):
        return COL_BINARY
    return COL_STRING


def _coltype_to_spark(ct: int):
    from pyspark.sql import types as T

    if ct == COL_BOOL:
        return T.BooleanType()
    if ct in (COL_BYTE, COL_UBYTE, COL_SHORT, COL_USHORT, COL_INT,
              COL_UINT, COL_LONG, COL_ULONG):
        return T.LongType()
    if ct in (COL_FLOAT, COL_DOUBLE):
        return T.DoubleType()
    if ct == COL_BINARY:
        return T.BinaryType()
    return T.StringType()


# ---------------------------------------------------------------------------
# Read
# ---------------------------------------------------------------------------

def _decode_feature(buf: bytes, cols: list[dict], gdecl: int):
    """Scalar decode of one feature buffer — the single source of
    decoded values for both read paths."""
    f = FB.root(buf)
    gt_tab = f.table(0)
    wkb = None if gt_tab is None else _geom_table_to_wkb(gt_tab, gdecl)
    props = decode_properties(f.vector_bytes(1) or b"", cols)
    return wkb, props


def _fast_point_decode(bufs: list[bytes], cols: list[dict], gdecl: int):
    """Vectorized template-verify decode for a span of point features —
    the read-side mirror of :func:`_fast_point_features` (guide §4.2).

    Features are grouped by buffer length; for each large-enough group
    the first feature is decoded scalar, re-serialized through
    :func:`_serialize_feature`, and accepted as OUR writer's layout
    only if the bytes reproduce exactly.  The sentinel template for
    that null-mask then gives the payload slots, and an explicit numpy
    check that every OTHER byte is identical across the whole group
    proves all its features share the layout — after which coord /
    property bytes are sliced out vectorized.  Any deviation falls
    back to the scalar decoder per feature (external writers, mixed
    layouts, per-feature type overrides), so results are identical by
    construction.

    Returns ``(geo_col, prop_cols)`` or ``None`` (caller streams the
    scalar loop)."""
    if gdecl != GEOM_POINT or not bufs:
        return None
    if any(c["type"] not in _FAST_PROP for c in cols):
        return None
    n = len(bufs)
    names = [c["name"] for c in cols]
    geo_col: list = [None] * n
    prop_cols: dict[str, list] = {nm: [None] * n for nm in names}

    def scalar(i: int) -> None:
        wkb, props = _decode_feature(bufs[i], cols, gdecl)
        geo_col[i] = wkb
        for nm in names:
            prop_cols[nm][i] = props.get(nm)

    groups: dict[int, list[int]] = {}
    for i, b in enumerate(bufs):
        groups.setdefault(len(b), []).append(i)

    for length, idxs in groups.items():
        if len(idxs) < len(cols) + 8:
            for i in idxs:
                scalar(i)
            continue
        i0 = idxs[0]
        wkb0, props0 = _decode_feature(bufs[i0], cols, gdecl)
        if wkb0 is not None and (len(wkb0) != 21
                                 or not wkb0.startswith(_PT_PREFIX)):
            for i in idxs:
                scalar(i)
            continue
        if _serialize_feature(wkb0, dict(props0), cols, gdecl) != bufs[i0]:
            for i in idxs:
                scalar(i)
            continue
        present = [c for c in cols if c["name"] in props0]
        tpl = _point_template(wkb0 is None, present, cols, gdecl)
        if tpl is None or len(tpl[0]) != length:
            for i in idxs:
                scalar(i)
            continue
        base, offs, slots = tpl
        M = np.frombuffer(b"".join(bufs[i] for i in idxs),
                          np.uint8).reshape(len(idxs), length)
        smask = np.ones(length, dtype=bool)
        for s, w in slots:
            smask[offs[s]:offs[s] + w] = False
        if not (M[:, smask]
                == np.frombuffer(bufs[i0], np.uint8)[smask]).all():
            for i in idxs:
                scalar(i)
            continue
        k = len(idxs)
        if wkb0 is not None:
            o = offs["xy"]
            out = np.empty((k, 21), np.uint8)
            out[:, :5] = np.frombuffer(_PT_PREFIX, np.uint8)
            out[:, 5:] = M[:, o:o + 16]    # LE doubles ARE the payload
            blob = out.tobytes()
            for j, i in enumerate(idxs):
                geo_col[i] = blob[j * 21:(j + 1) * 21]
        for c in present:
            _, wd = _FIXED_FMT[c["type"]]
            o = offs[c["name"]]
            raw = np.ascontiguousarray(M[:, o:o + wd])
            ct = c["type"]
            if ct == COL_DOUBLE:
                vals = raw.view("<f8").ravel().tolist()
            elif ct == COL_FLOAT:
                # np.float32 -> python float widens exactly, matching
                # struct.unpack("<f")
                vals = raw.view("<f4").ravel().tolist()
            elif ct == COL_BOOL:
                vals = [bool(v) for v in raw.ravel().tolist()]
            else:
                vals = raw.view(
                    {2: "<i2", 4: "<i4", 8: "<i8"}[wd]).ravel().tolist()
            col_list = prop_cols[c["name"]]
            for j, i in enumerate(idxs):
                col_list[i] = vals[j]
    return geo_col, prop_cols

def read_fgb(spark, path: str, geometry_column: str = "geometry",
             tasks: int | None = None,
             bbox: tuple[float, float, float, float] | None = None):
    """FlatGeobuf -> GeoTable.  The driver plans feature (offset, size)
    spans — from the packed R-tree's leaf offsets when the file carries
    an index (O(index), no size-prefix walk), else by walking the
    4-byte prefixes — and executors decode their byte ranges.

    ``bbox``: with an index, prunes to features whose ENVELOPE
    intersects the rect at the index level before any feature bytes are
    read (the conservative prefilter contract of ``read_pruned`` —
    apply the exact geometry filter downstream).  Without an index the
    argument raises (no silent full scan)."""
    import pandas as pd

    from pyspark.sql import types as T

    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.sources.remote import (
        is_fetchable_url, localize_file, task_local_path,
    )

    fetch_name = None
    if is_fetchable_url(path):
        path, fetch_name = localize_file(spark, path)

    file_size = os.path.getsize(path)
    with open(path, "rb") as fh:
        if fh.read(8) != MAGIC:
            raise ValueError(f"{path!r} is not a FlatGeobuf file")
        hsize = struct.unpack("<I", fh.read(4))[0]
        header = _parse_header(fh.read(hsize))
        if header.get("has_z") or header.get("has_m"):
            # fail BEFORE the feature-section work (the Z/M stance
            # matches the WKB parser): has_z/has_m is known from the
            # header alone, and the unindexed path below would
            # otherwise walk every size prefix of a multi-GB file first
            raise ValueError(
                f"{path!r} declares Z/M coordinates "
                f"(hasZ={header['has_z']}, hasM={header['has_m']}) — "
                "only 2-D FlatGeobuf is supported")
        isize = packed_rtree_size(header["features_count"],
                                  header["index_node_size"])
        index = fh.read(isize) if isize else b""
        feat_start = fh.tell()
        if isize:
            # spans straight from the leaf offsets: consecutive in file
            # order, lengths from diffs — no walk
            n_items = header["features_count"]
            leaf_off = len(index) - n_items * 40
            offs = [struct.unpack_from("<4dQ", index,
                                       leaf_off + i * 40)[4]
                    for i in range(n_items)]
            ends = offs[1:] + [file_size - feat_start]
            spans_all = [(feat_start + o + 4, e - o - 4)
                         for o, e in zip(offs, ends)]
            if bbox is not None:
                keep = search_packed_rtree(
                    index, n_items, header["index_node_size"], bbox)
                feat_spans = [spans_all[i] for i in keep]
            else:
                feat_spans = spans_all
        else:
            if bbox is not None:
                raise ValueError(
                    "bbox read requires an indexed FlatGeobuf file "
                    "(this one has index_node_size=0)")
            # offsets walk: 4-byte prefixes only, no parsing
            feat_spans = []
            while True:
                raw = fh.read(4)
                if len(raw) < 4:
                    break
                ln = struct.unpack("<I", raw)[0]
                feat_spans.append((fh.tell(), ln))
                fh.seek(ln, os.SEEK_CUR)

    cols = header["columns"]
    clash = [c["name"] for c in cols if c["name"] == geometry_column]
    if clash:
        # untrusted file header: a property named like the geometry
        # column would silently overwrite the decoded WKB in the
        # record dicts below
        raise ValueError(
            f"FlatGeobuf property column {geometry_column!r} collides "
            "with the geometry output column — pass a different "
            "geometry_column=")
    fields = [T.StructField(geometry_column, T.BinaryType())] + [
        T.StructField(c["name"], _coltype_to_spark(c["type"]))
        for c in cols]
    schema = T.StructType(fields)
    gdecl = header["geometry_type"]
    n = len(feat_spans)

    if n == 0:
        df = spark.createDataFrame([], schema)
    else:
        # >= 512 features per task: the per-feature python decode is
        # ~0.1-0.2 ms, so a 512-feature task does ~50-100 ms of work —
        # comparable to task overhead; the old 2000 floor left a
        # 5000-feature file on 2 cores (r12).  The shuffle-partitions
        # cap still bounds task count on big files.
        n_tasks = tasks or min(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            max(1, n // 512) or 1)
        step = (n + n_tasks - 1) // n_tasks
        # each range row CARRIES its own span slice: capturing the whole
        # feat_spans list in the scan closure would serialize the full
        # per-feature table into the task binary of EVERY task (hundreds
        # of MB at 10M features) — as DataFrame rows, each task receives
        # only its slice
        ranges = [([o for o, _ in feat_spans[i:j]],
                   [ln for _, ln in feat_spans[i:j]])
                  for i, j in ((i, min(n, i + step))
                               for i in range(0, n, step))]
        rdf = spark.createDataFrame(
            ranges, "offs array<bigint>, lens array<bigint>") \
            .repartition(len(ranges))

        # point-declared files with fixed-width-only properties are
        # candidates for the vectorized template-verify decode; the
        # gate ALSO bounds memory (point feature buffers are small, so
        # materializing a range of them is safe)
        use_fast = gdecl == GEOM_POINT and \
            all(c["type"] in _FAST_PROP for c in cols)

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            fgb_t = task_local_path(path, fetch_name)
            for pdf in batches:
                for offs, lens in zip(pdf["offs"], pdf["lens"]):
                    # column lists, one DataFrame per range: the former
                    # list-of-dicts DataFrame constructor re-inferred
                    # the schema per row (r12)
                    geo_col: list = []
                    prop_cols: dict[str, list] = {
                        c["name"]: [] for c in cols}
                    fast = None
                    with open(fgb_t, "rb") as fh:
                        bufs = None
                        if use_fast:
                            bufs = []
                            for off, ln in zip(offs, lens):
                                fh.seek(int(off))
                                bufs.append(fh.read(int(ln)))
                            fast = _fast_point_decode(bufs, cols, gdecl)
                        if fast is not None:
                            geo_col, prop_cols = fast
                        else:
                            # scalar path over the bytes already in hand
                            # when the fast gate read them (a declined
                            # fast decode must not re-read every
                            # feature); lazy per-feature reads otherwise
                            if bufs is None:
                                def _iter_bufs():
                                    for off, ln in zip(offs, lens):
                                        fh.seek(int(off))
                                        yield fh.read(int(ln))
                                feature_bufs = _iter_bufs()
                            else:
                                feature_bufs = iter(bufs)
                            for buf in feature_bufs:
                                f = FB.root(buf)
                                gt_tab = f.table(0)
                                geo_col.append(
                                    None if gt_tab is None else
                                    _geom_table_to_wkb(gt_tab, gdecl))
                                props = decode_properties(
                                    f.vector_bytes(1) or b"", cols)
                                for c in cols:
                                    prop_cols[c["name"]].append(
                                        props.get(c["name"]))
                    data = {geometry_column: geo_col}
                    data.update(prop_cols)
                    out = pd.DataFrame(data,
                                       columns=[f.name for f in fields])
                    for c, sf in zip(cols, fields[1:]):
                        if isinstance(sf.dataType, T.LongType):
                            out[c["name"]] = out[c["name"]].astype("Int64")
                    yield out

        df = rdf.mapInPandas(scan, schema=schema)

    gname = _GEOM_NAMES.get(gdecl)
    gmeta = GeoColumnMeta(crs=header["crs"],
                          geometry_types=[gname] if gname else [])
    return GeoTable(df, GeoMeta(primary_column=geometry_column,
                                columns={geometry_column: gmeta}))


# ---------------------------------------------------------------------------
# Write
# ---------------------------------------------------------------------------

def _serialize_feature(wkb: bytes | None, prop_row: dict, cols: list[dict],
                       declared: int) -> bytes:
    """One feature buffer (no size prefix) — the single source of
    feature bytes for BOTH write paths.  The fast path below builds its
    byte templates THROUGH this function, which is what makes template
    patching byte-identical by construction."""
    fb = FB.Builder()
    ffields: dict = {}
    if wkb is not None:
        ffields[0] = ("offset",
                      _build_geom_table(fb, W.parse(wkb), declared))
    props = encode_properties(prop_row, cols)
    if props:
        ffields[1] = ("offset", fb.vector_bytes(props))
    return fb.finish(fb.table(ffields))


# fast-path property types: fixed width, numpy-exact conversion from the
# python values struct.pack would accept (strings/binary/datetime vary
# per row and fall back to the generic per-feature builder)
_FAST_PROP = {COL_BOOL, COL_SHORT, COL_INT, COL_LONG, COL_FLOAT, COL_DOUBLE}
_INT_BOUNDS = {COL_SHORT: (-1 << 15, (1 << 15) - 1),
               COL_INT: (-1 << 31, (1 << 31) - 1),
               COL_LONG: (-1 << 63, (1 << 63) - 1),
               COL_BOOL: (0, 255)}
_PT_PREFIX = b"\x01\x01\x00\x00\x00"        # little-endian WKB point


def _sentinel_bytes(width: int, which: int) -> bytes:
    """``width`` bytes, every byte differing between which=0 and
    which=1, high byte < 0x80 (finite positive when read as LE
    int/float, so struct round-trips are bit-exact)."""
    base = 0x21 if which == 0 else 0x51
    return bytes((base + i) for i in range(width))


def _point_template(geom_null: bool, present: list[dict],
                    cols: list[dict], declared: int):
    """Template buffer + payload slot offsets for a point-feature
    layout (one null-mask): built THROUGH :func:`_serialize_feature`
    with sentinel payloads, slots located by per-slot sentinel diffs.
    Returns ``(base, offs, slots)`` — ``slots`` is ``[(name, width)]``
    with ``"xy"`` for the 16 coordinate bytes — or ``None`` when any
    diff is non-contiguous / slots overlap (never expected; the guard
    keeps fallback behavior airtight)."""
    slots = ([] if geom_null else [("xy", 16)]) + \
        [(c["name"], _FIXED_FMT[c["type"]][1]) for c in present]

    def build(sel: dict) -> bytes:
        if geom_null:
            wk = None
        else:
            x = struct.unpack("<d", _sentinel_bytes(8, sel.get("xy", 0)))[0]
            wk = W.encode_point(x, x)
        prow = {}
        for c in present:
            fmt, wd = _FIXED_FMT[c["type"]]
            sb = _sentinel_bytes(wd, sel.get(c["name"], 0))
            if c["type"] in (COL_FLOAT, COL_DOUBLE):
                prow[c["name"]] = struct.unpack("<" + fmt, sb)[0]
            else:
                prow[c["name"]] = int.from_bytes(
                    sb, "little", signed=fmt.islower())
        return _serialize_feature(wk, prow, cols, declared)

    base = build({})
    offs: dict[str, int] = {}
    for sname, wd in slots:
        var = build({sname: 1})
        if len(var) != len(base):
            return None
        d = [p for p in range(len(base)) if base[p] != var[p]]
        if len(d) != wd or d[-1] - d[0] != wd - 1:
            return None
        offs[sname] = d[0]
    spans = sorted((offs[s], offs[s] + wd) for s, wd in slots)
    if any(a1 > a0 for (_, a1), (a0, _) in zip(spans, spans[1:])):
        return None
    return base, offs, slots


def _fast_point_features(rows, gcol: str, cols: list[dict], declared: int):
    """Vectorized template-patch serialization for all-POINT features
    with fixed-size-only properties (guide §4.2 — replace the per-row
    python Builder with one numpy byte-patch per null-mask group).

    For a fixed null-mask the Builder's output layout depends only on
    STRUCTURE (field ids, widths, vector lengths), never on payload
    values — so one template built through :func:`_serialize_feature`
    with sentinel payloads, plus per-slot sentinel DIFFS to locate the
    payload byte ranges, reproduces every feature by patching coord /
    property bytes into a tiled copy of the template.  Any surprise
    (diff not contiguous, probe row mismatch, non-LE/non-21-byte WKB,
    value outside the column's struct range) falls back to the generic
    path for bit-identical behavior including its error behavior.

    Returns ``(feat_bufs, feat_boxes, env)`` or ``None``.
    """
    if declared != GEOM_POINT or not rows:
        return None
    if any(c["type"] not in _FAST_PROP for c in cols):
        return None
    names = [c["name"] for c in cols]
    n = len(rows)

    wkbs: list[bytes | None] = []
    for r in rows:
        g = r[gcol]
        if g is not None:
            g = bytes(g)
            if len(g) != 21 or not g.startswith(_PT_PREFIX):
                return None
        wkbs.append(g)
    colvals: dict[str, list] = {}
    for c in cols:
        vals = [r[c["name"]] for r in rows]
        bounds = _INT_BOUNDS.get(c["type"])
        for v in vals:
            if v is None:
                continue
            if not isinstance(v, (int, float)):
                return None          # Decimal/str/...: generic decides
            if bounds is not None and (isinstance(v, float)
                                       or not bounds[0] <= v <= bounds[1]):
                return None          # keep struct.pack's error behavior
        colvals[c["name"]] = vals

    # boxes + extent: mirrors the generic loop's fold exactly —
    # W.envelope of a point is (x, y, x, y), NaN in either coordinate
    # propagates to all four, and NaN envelopes are skipped
    feat_boxes: list[tuple] = [None] * n
    env: list = [None] * 4
    fx: list[float] = []
    fy: list[float] = []
    for i, g in enumerate(wkbs):
        if g is None:
            feat_boxes[i] = (0.0, 0.0, 0.0, 0.0)
            continue
        x, y = struct.unpack_from("<2d", g, 5)
        if x == x and y == y:
            feat_boxes[i] = (x, y, x, y)
            fx.append(x)
            fy.append(y)
        else:
            feat_boxes[i] = (0.0, 0.0, 0.0, 0.0)
    if fx:
        env = [min(fx), min(fy), max(fx), max(fy)]

    groups: dict[tuple, list[int]] = {}
    for i in range(n):
        key = (wkbs[i] is None,) + tuple(
            colvals[nm][i] is None for nm in names)
        groups.setdefault(key, []).append(i)

    def generic(i: int) -> bytes:
        return _serialize_feature(
            wkbs[i], {nm: colvals[nm][i] for nm in names}, cols, declared)

    feat_bufs: list[bytes | None] = [None] * n
    for key, idxs in groups.items():
        geom_null = key[0]
        present = [c for c, isnull in zip(cols, key[1:]) if not isnull]
        if len(idxs) < len(present) + 6:
            for i in idxs:
                feat_bufs[i] = generic(i)
            continue
        tpl = _point_template(geom_null, present, cols, declared)
        if tpl is None:
            for i in idxs:
                feat_bufs[i] = generic(i)
            continue
        base, offs, _slots = tpl

        tmpl = np.frombuffer(base, dtype=np.uint8)
        L = len(base)
        for lo in range(0, len(idxs), 65536):     # bound transient memory
            chunk = idxs[lo:lo + 65536]
            k = len(chunk)
            M = np.tile(tmpl, (k, 1))
            if not geom_null:
                A = np.frombuffer(b"".join(wkbs[i] for i in chunk),
                                  np.uint8).reshape(k, 21)
                o = offs["xy"]
                M[:, o:o + 16] = A[:, 5:]   # WKB payload IS the LE doubles
            for c in present:
                _, wd = _FIXED_FMT[c["type"]]
                vals = [colvals[c["name"]][i] for i in chunk]
                ct = c["type"]
                if ct == COL_DOUBLE:
                    arr = np.asarray(vals, dtype="<f8")
                elif ct == COL_FLOAT:
                    arr = np.asarray(vals, dtype="<f8").astype("<f4")
                elif ct == COL_BOOL:
                    arr = np.asarray([int(v) for v in vals], dtype="u1")
                else:
                    arr = np.asarray([int(v) for v in vals],
                                     dtype="<i8").astype(
                        {2: "<i2", 4: "<i4", 8: "<i8"}[wd])
                o = offs[c["name"]]
                M[:, o:o + wd] = np.ascontiguousarray(arr) \
                    .view(np.uint8).reshape(k, wd)
            blob = M.tobytes()
            for j, i in enumerate(chunk):
                feat_bufs[i] = blob[j * L:(j + 1) * L]
        # probe: first and last row of the group must equal the
        # per-feature builder's bytes (cheap end-to-end self-check; a
        # mismatch demotes the whole group to the generic path)
        for probe in {idxs[0], idxs[-1]}:
            if feat_bufs[probe] != generic(probe):
                for i in idxs:
                    feat_bufs[i] = generic(i)
                break
    return feat_bufs, feat_boxes, env


def write_fgb(gt, path: str, name: str | None = None,
              index_node_size: int = 16) -> None:
    """GeoTable -> FlatGeobuf file (driver-side single-file sink).

    With ``index_node_size > 0`` (default 16, the format's default) the
    features are Hilbert-ordered (functions/hilbert.py — the same
    curve the sort operator uses) and a packed R-tree index is written
    between header and features: bbox reads then prune at the INDEX
    (see :func:`read_fgb` ``bbox=``) and the driver derives feature
    spans from the leaf offsets without walking size prefixes.
    ``index_node_size=0`` writes a plain stream (spec-legal)."""
    if gt.geometry_column is None:
        raise ValueError(
            "write_fgb requires a geometry column; this table has none"
        )
    df = gt.df
    gcol = gt.geometry_column
    nested = [f.name for f in df.schema.fields
              if f.dataType.simpleString().startswith(
                  ("struct", "array", "map")) and f.name != gcol]
    if nested:
        import warnings

        warnings.warn(f"dropping nested columns unsupported by "
                      f"FlatGeobuf: {nested}")
        df = df.drop(*nested)
    rows = df.collect()

    cols = [{"name": f.name, "type": _spark_to_coltype(f.dataType)}
            for f in df.schema.fields if f.name != gcol]
    # declared geometry type: single type -> its code, else Unknown.
    # A 21-byte buffer with the LE point prefix can only parse to POINT
    # — skipping the full parse for that shape keeps this pass O(1) per
    # point feature (the write-side dominator after the fast path).
    gtypes = set()
    for r in rows:
        if r[gcol] is not None:
            g = bytes(r[gcol])
            gtypes.add("POINT" if len(g) == 21 and g.startswith(_PT_PREFIX)
                       else W.geometry_type(g))
    declared = GEOM_UNKNOWN
    if len(gtypes) == 1:
        declared = _WKT_TO_CODE.get(next(iter(gtypes)), GEOM_UNKNOWN)

    env = [None] * 4
    srs_code = 0
    crs = gt.crs
    if isinstance(crs, str) and crs.upper().startswith("EPSG:"):
        srs_code = int(crs.split(":")[1])
    elif isinstance(crs, dict):
        cid = crs.get("id", {})
        if cid.get("authority", "").upper() == "EPSG":
            srs_code = int(cid.get("code", 0))

    # serialize every feature first (needed for offsets/boxes when
    # indexing; also keeps the no-index path identical)
    fast = _fast_point_features(rows, gcol, cols, declared)
    if fast is not None:
        feat_bufs, feat_boxes, env = fast
    else:
        feat_bufs = []
        feat_boxes = []
        for r in rows:
            wkb = bytes(r[gcol]) if r[gcol] is not None else None
            if wkb is not None:
                bx = W.envelope(wkb)
                if bx[0] == bx[0]:
                    feat_boxes.append(bx)
                    # dataset extent folded into the SAME pass (the
                    # former separate envelope loop re-parsed every
                    # geometry, r12); empty geometries' NaN envelopes
                    # are skipped so the header extent / Hilbert grid
                    # stay finite
                    env[0] = bx[0] if env[0] is None else min(env[0], bx[0])
                    env[1] = bx[1] if env[1] is None else min(env[1], bx[1])
                    env[2] = bx[2] if env[2] is None else max(env[2], bx[2])
                    env[3] = bx[3] if env[3] is None else max(env[3], bx[3])
                else:
                    # empty geometry: NaN boxes corrupt the packed
                    # R-tree node bounds — same (0,0,0,0) placeholder
                    # as NULLs
                    feat_boxes.append((0.0, 0.0, 0.0, 0.0))
            else:
                feat_boxes.append((0.0, 0.0, 0.0, 0.0))
            feat_bufs.append(_serialize_feature(
                wkb, {c["name"]: r[c["name"]] for c in cols}, cols,
                declared))

    index_bytes = b""
    node_size = index_node_size if len(rows) else 0
    if node_size:
        import numpy as np

        from geoparquet_io_spark.functions.hilbert import (
            scale_to_grid, xy_to_hilbert)

        boxes = np.asarray(feat_boxes, dtype="f8")
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        ext = (env if env[0] is not None
               else [float(cx.min()), float(cy.min()),
                     float(cx.max()), float(cy.max())])
        d = xy_to_hilbert(scale_to_grid(cx, ext[0], ext[2]),
                          scale_to_grid(cy, ext[1], ext[3]))
        order = np.argsort(d, kind="stable")
        feat_bufs = [feat_bufs[i] for i in order]
        boxes = boxes[order]
        offsets, cur = [], 0
        for buf in feat_bufs:
            offsets.append(cur)
            cur += 4 + len(buf)
        index_bytes = build_packed_rtree(boxes, offsets, node_size)

    b = FB.Builder()
    col_offs = []
    for c in cols:
        noff = b.string(c["name"])
        col_offs.append(b.table({0: ("offset", noff),
                                 1: ("scalar", "B", 1, c["type"])}))
    hfields: dict = {
        0: ("offset", b.string(name
                               or os.path.splitext(
                                   os.path.basename(path))[0])),
        2: ("scalar", "B", 1, declared),
        8: ("scalar", "Q", 8, len(rows)),
        9: ("scalar", "H", 2, node_size),
    }
    if env[0] is not None:
        hfields[1] = ("offset", b.vector_scalars("d", 8, env))
    if col_offs:
        hfields[7] = ("offset", b.vector_offsets(col_offs))
    if srs_code:
        crs_off = b.table({0: ("offset", b.string("EPSG")),
                           1: ("scalar", "i", 4, srs_code)})
        hfields[10] = ("offset", crs_off)
    header_buf = b.finish(b.table(hfields))

    with open(path, "wb") as fh:
        fh.write(MAGIC)
        fh.write(struct.pack("<I", len(header_buf)))
        fh.write(header_buf)
        fh.write(index_bytes)
        for buf in feat_bufs:
            fh.write(struct.pack("<I", len(buf)))
            fh.write(buf)
