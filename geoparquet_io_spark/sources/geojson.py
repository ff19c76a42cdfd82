"""GeoJSON writer (expression port of core/geojson_stream.py:136-330).

Each row becomes a Feature JSON string assembled with NATIVE expressions:
geometry JSON from the WKT/WKB kernel (pandas UDF — the only python hop)
and properties via ``to_json(struct(...))``; the FeatureCollection wrapper
is written driver-side around a streamed iterator, exactly like the
reference's chunked stdout writer.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geoparquet_io_spark.functions import wkb as _wkb


def _geom_to_geojson_dict(g: "_wkb.Geom") -> dict:
    import math as _math

    t = g.gtype
    # EMPTY forms: RFC 7946 represents them as an empty coordinates
    # array — POINT EMPTY's NaN-coordinate WKB encoding must NOT leak
    # literal NaN tokens into the JSON (invalid per RFC 8259)
    if t == _wkb.POINT:
        c = g.parts[0][0]
        if _math.isnan(c[0]) or _math.isnan(c[1]):
            return {"type": "Point", "coordinates": []}
        return {"type": "Point", "coordinates": [float(c[0]), float(c[1])]}
    if t == _wkb.LINESTRING:
        return {"type": "LineString",
                "coordinates": [[float(x), float(y)] for x, y in g.parts[0]]}
    if t == _wkb.POLYGON:
        return {
            "type": "Polygon",
            "coordinates": [[[float(x), float(y)] for x, y in r] for r in g.parts],
        }
    if t == _wkb.MULTIPOINT:
        # drop NaN (POINT EMPTY) members: RFC 8259 has no NaN token and
        # an empty member point is not representable inside MultiPoint
        return {"type": "MultiPoint",
                "coordinates": [[float(c.parts[0][0, 0]), float(c.parts[0][0, 1])]
                                for c in g.children
                                if not (_math.isnan(c.parts[0][0, 0])
                                        or _math.isnan(c.parts[0][0, 1]))]}
    if t == _wkb.MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [[[float(x), float(y)] for x, y in c.parts[0]]
                                for c in g.children]}
    if t == _wkb.MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [
                [[[float(x), float(y)] for x, y in r] for r in c.parts]
                for c in g.children
            ],
        }
    if t == _wkb.GEOMETRYCOLLECTION:
        return {"type": "GeometryCollection",
                "geometries": [_geom_to_geojson_dict(c) for c in g.children]}
    raise ValueError(f"unsupported geometry type {t}")


def st_asgeojson(precision: int | None = None):
    """WKB -> GeoJSON geometry string (ST_AsGeoJSON + ST_ReducePrecision,
    reference: core/geojson_stream.py:187-218)."""

    @pandas_udf(T.StringType())
    def _gj(col: pd.Series) -> pd.Series:
        def conv(b):
            if b is None:
                return None
            d = _geom_to_geojson_dict(_wkb.parse(bytes(b)))
            if precision is not None:
                _round_geom(d, precision)
            # allow_nan=False: a NaN vertex anywhere (beyond the handled
            # empty-point forms) must raise, not emit a literal NaN
            # token that makes the whole output invalid JSON (RFC 8259)
            return json.dumps(d, separators=(",", ":"), allow_nan=False)

        return col.map(conv)

    return _gj


def _round_coords(c, p: int):
    if isinstance(c, float):
        return round(c, p)
    return [_round_coords(x, p) for x in c]


def _round_geom(d: dict, p: int) -> None:
    """Round in place; GeometryCollections have 'geometries', not
    'coordinates'."""
    if "geometries" in d:
        for sub in d["geometries"]:
            _round_geom(sub, p)
    else:
        d["coordinates"] = _round_coords(d["coordinates"], p)


def feature_lines(df: DataFrame, geometry_column: str,
                  precision: int | None = 7) -> DataFrame:
    """One GeoJSON Feature string per row (distributed)."""
    if geometry_column is None:
        raise ValueError(
            "GeoJSON output requires a geometry column; this table has none"
        )
    props = [c for c in df.columns if c != geometry_column]
    gj = st_asgeojson(precision)(F.col(geometry_column))
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":'),
        F.coalesce(gj, F.lit("null")),
        F.lit(',"properties":'),
        F.coalesce(F.to_json(F.struct(*[F.col(c) for c in props])), F.lit("{}")),
        F.lit("}"),
    )
    return df.select(feature.alias("feature"))


def write_geojson(
    gt,
    path: str,
    precision: int | None = 7,
    chunk_rows: int = 10_000,
) -> None:
    """Single FeatureCollection file, streamed through the driver with
    ``toLocalIterator`` (bounded memory, like the reference's chunked
    stdout writer core/geojson_stream.py:320-375)."""
    feats = feature_lines(gt.df, gt.geometry_column, precision)
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[\n')
        first = True
        for row in feats.toLocalIterator(prefetchPartitions=True):
            if not first:
                f.write(",\n")
            f.write(row["feature"])
            first = False
        f.write("\n]}\n")


def read_geojson(spark, path: str, geometry_column: str = "geometry"):
    """GeoJSON FeatureCollection -> GeoTable.  Driver-side parse (GeoJSON is
    not splittable as one document; mirrors the reference's single-node
    GDAL path, core/convert.py:995-1132)."""
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

    with open(path) as f:
        doc = json.load(f)
    feats = doc.get("features", [])
    rows = []
    for ft in feats:
        props = dict(ft.get("properties") or {})
        props[geometry_column] = _geojson_to_wkb(ft.get("geometry"))
        rows.append(props)
    if not rows:
        raise ValueError(f"no features in {path}")
    # explicit schema from the UNION of keys across all features: a
    # pandas round-trip NaN-fills missing keys, creating mixed-type
    # object columns createDataFrame can't convert (heterogeneous
    # properties are legal GeoJSON)
    schema, names = _infer_property_schema(rows, skip={geometry_column})
    out_schema = T.StructType(
        list(schema.fields)
        + [T.StructField(geometry_column, T.BinaryType(), True)])
    data = [tuple(_coerce_json_value(r.get(k), f.dataType)
                  for k, f in zip(names, schema.fields))
            + (r[geometry_column],) for r in rows]
    df = spark.createDataFrame(data, out_schema)
    geo = GeoMeta(primary_column=geometry_column,
                  columns={geometry_column: GeoColumnMeta()})
    return GeoTable(df, geo)


def _coerce_json_value(v, dt):
    """Value -> the merged field type (nested objects/arrays surface as
    JSON text, same convention as read_geojsonl; conflict-widened string
    columns stringify scalars)."""
    if v is None:
        return None
    if isinstance(v, (dict, list)):
        v = json.dumps(v, separators=(",", ":"))
    if isinstance(dt, T.StringType):
        return v if isinstance(v, str) else json.dumps(v)
    if isinstance(dt, T.DoubleType):
        return float(v)
    return v


def _infer_property_schema(rows: list[dict], skip: set) -> tuple:
    """Merged (schema, names) over ALL rows: bool < long < double < string;
    any type conflict widens to string; all-null -> string."""
    ranks = {T.BooleanType(): 0, T.LongType(): 1, T.DoubleType(): 2,
             T.StringType(): 3}
    merged: dict = {}
    for r in rows:
        for k, v in r.items():
            if k in skip:
                continue
            if v is None:
                merged.setdefault(k, None)
                continue
            if isinstance(v, bool):
                dt = T.BooleanType()
            elif isinstance(v, int):
                dt = T.LongType()
            elif isinstance(v, float):
                dt = T.DoubleType()
            else:
                dt = T.StringType()
            cur = merged.get(k)
            if cur is None:
                merged[k] = dt
            elif cur != dt:
                # long+double -> double; anything else -> string
                pair = {ranks[cur], ranks[dt]}
                merged[k] = T.DoubleType() if pair == {1, 2} else T.StringType()
    names = list(merged)
    fields = [T.StructField(k, merged[k] or T.StringType()) for k in names]
    return T.StructType(fields), names


def _coords2d(c) -> "np.ndarray":
    """Position list -> (n, 2) array.  RFC 7946 permits [x, y, z]
    positions; the z is DROPPED (2-D engine) — reshaping an Nx3 array
    to (-1, 2) would interleave z into x/y, silently corrupting every
    vertex."""
    import numpy as np

    arr = np.asarray(c, dtype="f8")
    if arr.ndim == 1:                      # empty coordinate list
        return arr.reshape(0, 2)
    return np.ascontiguousarray(arr[:, :2])


def _geojson_to_wkb(g: dict | None) -> bytes | None:
    if g is None:
        return None

    t = g["type"]
    if t == "GeometryCollection":
        parts = [_geojson_to_wkb(sub) for sub in g.get("geometries", [])]
        return (b"\x01\x07\x00\x00\x00" + len(parts).to_bytes(4, "little")
                + b"".join(parts))
    c = g["coordinates"]
    if t == "Point":
        if not len(c):                     # Point EMPTY: NaN-coordinate WKB
            return _wkb.encode_point(float("nan"), float("nan"))
        return _wkb.encode_point(float(c[0]), float(c[1]))
    if t == "LineString":
        return _wkb.encode_linestring(_coords2d(c))
    if t == "Polygon":
        return _wkb.encode_polygon([_coords2d(r) for r in c])
    if t == "MultiPolygon":
        return _wkb.encode_multipolygon(
            [[_coords2d(r) for r in poly] for poly in c]
        )
    if t == "MultiPoint":
        out = [b"\x01\x04\x00\x00\x00", len(c).to_bytes(4, "little")]
        for pos in c:
            out.append(_wkb.encode_point(float(pos[0]), float(pos[1])))
        return b"".join(out)
    if t == "MultiLineString":
        out = [b"\x01\x05\x00\x00\x00", len(c).to_bytes(4, "little")]
        for line in c:
            out.append(_wkb.encode_linestring(_coords2d(line)))
        return b"".join(out)
    raise ValueError(f"unsupported GeoJSON geometry {t}")


# ---------------------------------------------------------------------------
# GeoJSONSeq (newline-delimited features) — the SPLITTABLE variant
# ---------------------------------------------------------------------------

def write_geojsonl(gt, path: str, precision: int | None = 7,
                   single_file: bool = True) -> None:
    """Newline-delimited GeoJSON (GDAL "GeoJSONSeq" / RFC 8142 minus the
    RS byte — one Feature JSON per line).  Unlike a FeatureCollection
    document this is SPLITTABLE: ``single_file=False`` writes one part
    per task with ``df.write.text`` (the 100 TB shape); the default
    streams a single file through the driver like :func:`write_geojson`."""
    feats = feature_lines(gt.df, gt.geometry_column, precision)
    if not single_file:
        feats.write.mode("overwrite").text(path)
        return
    with open(path, "w") as f:
        for row in feats.toLocalIterator(prefetchPartitions=True):
            f.write(row["feature"])
            f.write("\n")


def read_geojsonl(spark, path: str, geometry_column: str = "geometry",
                  schema=None, sample_lines: int = 100):
    """GeoJSONSeq -> GeoTable, DISTRIBUTED: ``spark.read.text`` splits
    the file(s) across tasks (newlines are record boundaries, the
    whole point of the Seq variant vs a FeatureCollection document);
    each task JSON-parses its lines and encodes WKB with the same
    kernel as :func:`read_geojson`.

    ``schema``: property schema (StructType, without the geometry
    column).  Defaults to inference from a driver-side sample of the
    first ``sample_lines`` lines (strings/longs/doubles/booleans, type
    conflicts within the sample widen long+double -> double, anything
    else -> string).  Data past the sample that doesn't fit the
    inferred schema fails LOUDLY (property key never seen in the
    sample, fractional value in a long column) with the remedy named —
    silent truncation or a bare Arrow cast error helps nobody."""
    from typing import Iterator

    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

    lines = spark.read.text(path)
    if schema is None:
        sample = [r["value"] for r in lines.limit(sample_lines).collect()]
        feats = []
        for ln in sample:
            ln = ln.strip().lstrip("\x1e")       # tolerate RFC 8142 RS
            if not ln:
                continue
            feats.append(dict(json.loads(ln).get("properties") or {}))
        # skip a property named like the geometry column (read_geojson
        # does the same): without this the inferred schema AND the
        # appended binary field both claim the name, duplicating the
        # column and corrupting the Arrow conversion
        schema, _ = _infer_property_schema(feats, skip={geometry_column})
    out_schema = T.StructType(
        list(schema.fields)
        + [T.StructField(geometry_column, T.BinaryType(), True)])
    names = [f.name for f in schema.fields]

    name_set = set(names)
    field_types = {f.name: f.dataType for f in schema.fields}

    def parse_lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ln in pdf["value"]:
                ln = ln.strip().lstrip("\x1e")
                if not ln:
                    continue
                ft = json.loads(ln)
                props = ft.get("properties") or {}
                extra = set(props) - name_set
                if extra:
                    raise ValueError(
                        f"property keys {sorted(extra)} not in the inferred "
                        f"schema (first lines lacked them) — pass schema= or "
                        f"raise sample_lines= (currently the first "
                        f"{sample_lines} lines)")
                rows.append(
                    {**{k: _coerce_json_value(props.get(k), field_types[k])
                        for k in names},
                     geometry_column: _geojson_to_wkb(ft.get("geometry"))})
            out = pd.DataFrame(rows, columns=names + [geometry_column])
            for f in schema.fields:
                if isinstance(f.dataType, T.LongType):
                    col = out[f.name]
                    # pd.isna covers both None and the NaN pandas puts in
                    # for keys missing from a row
                    frac = col.map(
                        lambda v: isinstance(v, float) and not pd.isna(v)
                        and v != int(v))
                    if frac.any():
                        bad = col[frac].iloc[0]
                        raise ValueError(
                            f"column {f.name!r} inferred as long from the "
                            f"first {sample_lines} lines but holds fractional "
                            f"value {bad!r} — pass schema= or raise "
                            f"sample_lines=")
                    out[f.name] = col.map(
                        lambda v: None if pd.isna(v) else int(v)).astype("Int64")
            yield out

    df = lines.mapInPandas(parse_lines, schema=out_schema)
    geo = GeoMeta(primary_column=geometry_column,
                  columns={geometry_column: GeoColumnMeta()})
    return GeoTable(df, geo)
