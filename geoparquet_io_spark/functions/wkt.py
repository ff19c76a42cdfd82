"""WKT <-> WKB conversion (pure python).

The reference relies on DuckDB's ST_GeomFromText / ST_AsText
(core/convert.py:374-460, core/format_writers.py:245-357).  This module
implements the same subset over the local WKB kernel.
"""

from __future__ import annotations

import re

import numpy as np

from geoparquet_io_spark.functions import wkb

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _parse_coords(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        parts = pair.split()
        if len(parts) < 2:
            raise ValueError(f"bad WKT coordinate: {pair!r}")
        pts.append((float(parts[0]), float(parts[1])))
    return np.array(pts, dtype="f8")


def _split_rings(body: str):
    """Split '(r1),(r2)' at top level."""
    rings, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                rings.append(body[start:i])
    if not rings:
        raise ValueError(f"bad WKT ring list: {body!r}")
    return rings


_EMPTY_WKB = {
    # ISO encodings of EMPTY: POINT as NaN coords (PostGIS convention),
    # everything else as a 0-count body
    "POINT": wkb.encode_point(float("nan"), float("nan")),
    "LINESTRING": b"\x01\x02\x00\x00\x00" + (0).to_bytes(4, "little"),
    "POLYGON": b"\x01\x03\x00\x00\x00" + (0).to_bytes(4, "little"),
    "MULTIPOINT": b"\x01\x04\x00\x00\x00" + (0).to_bytes(4, "little"),
    "MULTILINESTRING": b"\x01\x05\x00\x00\x00" + (0).to_bytes(4, "little"),
    "MULTIPOLYGON": b"\x01\x06\x00\x00\x00" + (0).to_bytes(4, "little"),
    "GEOMETRYCOLLECTION": b"\x01\x07\x00\x00\x00" + (0).to_bytes(4, "little"),
}


def _split_geoms(body: str):
    """Split a GEOMETRYCOLLECTION body at depth-0 commas into component
    WKT strings ('POINT (1 2), LINESTRING (0 0, 1 1)' -> 2 parts)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return [p for p in (s.strip() for s in parts) if p]


def from_wkt(text: str) -> bytes:
    """Parse WKT to WKB bytes. Raises ValueError on anything unparseable."""
    s = text.strip()
    me = re.match(r"^\s*([A-Za-z]+)\s+EMPTY\s*$", s, re.I)
    if me:
        out = _EMPTY_WKB.get(me.group(1).upper())
        if out is None:
            raise ValueError(f"invalid WKT: {text!r}")
        return out
    m = re.match(r"^\s*([A-Za-z]+)\s*(Z|M|ZM)?\s*\((.*)\)\s*$", s, re.S)
    if not m:
        raise ValueError(f"invalid WKT: {text!r}")
    typ = m.group(1).upper()
    if m.group(2):
        raise ValueError("only 2-D WKT supported")
    body = m.group(3)
    if typ == "GEOMETRYCOLLECTION":
        parts = [from_wkt(p) for p in _split_geoms(body)]
        return (b"\x01\x07\x00\x00\x00" + len(parts).to_bytes(4, "little")
                + b"".join(parts))
    if typ == "POINT":
        c = _parse_coords(body)
        return wkb.encode_point(c[0, 0], c[0, 1])
    if typ == "LINESTRING":
        return wkb.encode_linestring(_parse_coords(body))
    if typ == "POLYGON":
        return wkb.encode_polygon([_parse_coords(r) for r in _split_rings(body)])
    if typ == "MULTIPOINT":
        # both MULTIPOINT(1 2, 3 4) and MULTIPOINT((1 2),(3 4))
        body2 = body.replace("(", "").replace(")", "")
        pts = _parse_coords(body2)
        out = [b"\x01\x04\x00\x00\x00", len(pts).to_bytes(4, "little")]
        for x, y in pts:
            out.append(wkb.encode_point(x, y))
        return b"".join(out)
    if typ == "MULTILINESTRING":
        lines = [_parse_coords(r) for r in _split_rings(body)]
        out = [b"\x01\x05\x00\x00\x00", len(lines).to_bytes(4, "little")]
        for ln in lines:
            out.append(wkb.encode_linestring(ln))
        return b"".join(out)
    if typ == "MULTIPOLYGON":
        polys = []
        for poly_body in _split_top(body):
            polys.append([_parse_coords(r) for r in _split_rings(poly_body)])
        return wkb.encode_multipolygon(polys)
    raise ValueError(f"unsupported WKT type: {typ}")


def _split_top(body: str):
    """Split '((..)),((..))' into '(..)','(..)' groups at depth 1."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
            if depth == 1:
                start = i + 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _coords_str(arr: np.ndarray, max_coords: int | None = None) -> str:
    if max_coords is not None and len(arr) > max_coords:
        shown = ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in arr[:max_coords])
        return f"{shown}, ... ({len(arr)} points)"
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in arr)


def to_wkt(buf: bytes, max_coords: int | None = None) -> str:
    """WKB -> WKT (ST_AsText). ``max_coords`` truncates each ring to that
    many coordinates with an ellipsis marker, for inspect display
    (reference: inspect_utils.py:473-517)."""
    g = wkb.parse(buf)
    return _geom_to_wkt(g, max_coords)


def _geom_to_wkt(g: "wkb.Geom", max_coords: int | None = None) -> str:
    t = g.gtype
    mc = max_coords
    if t == wkb.POINT:
        arr = g.parts[0]
        if len(arr) == 0 or np.isnan(arr[0, 0]):
            return "POINT EMPTY"
        return f"POINT ({_coords_str(arr)})"
    if t == wkb.LINESTRING:
        if len(g.parts[0]) == 0:
            return "LINESTRING EMPTY"
        return f"LINESTRING ({_coords_str(g.parts[0], mc)})"
    if t == wkb.POLYGON:
        if not g.parts:
            return "POLYGON EMPTY"
        rings = ", ".join(f"({_coords_str(r, mc)})" for r in g.parts)
        return f"POLYGON ({rings})"
    if t == wkb.MULTIPOINT:
        if not g.children:
            return "MULTIPOINT EMPTY"
        pts = ", ".join(f"({_coords_str(c.parts[0])})" for c in g.children)
        return f"MULTIPOINT ({pts})"
    if t == wkb.MULTILINESTRING:
        if not g.children:
            return "MULTILINESTRING EMPTY"
        lines = ", ".join(f"({_coords_str(c.parts[0], mc)})" for c in g.children)
        return f"MULTILINESTRING ({lines})"
    if t == wkb.MULTIPOLYGON:
        if not g.children:
            return "MULTIPOLYGON EMPTY"
        polys = ", ".join(
            "(" + ", ".join(f"({_coords_str(r, mc)})" for r in c.parts) + ")"
            for c in g.children
        )
        return f"MULTIPOLYGON ({polys})"
    if t == wkb.GEOMETRYCOLLECTION:
        if not g.children:
            return "GEOMETRYCOLLECTION EMPTY"
        inner = ", ".join(_geom_to_wkt(c, mc) for c in g.children)
        return f"GEOMETRYCOLLECTION ({inner})"
    raise ValueError(f"unsupported geometry type {t}")
