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
    t = g.gtype
    if t == _wkb.POINT:
        c = g.parts[0][0]
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
        return {"type": "MultiPoint",
                "coordinates": [[float(c.parts[0][0, 0]), float(c.parts[0][0, 1])]
                                for c in g.children]}
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
                d["coordinates"] = _round_coords(d["coordinates"], precision)
            return json.dumps(d, separators=(",", ":"))

        return col.map(conv)

    return _gj


def _round_coords(c, p: int):
    if isinstance(c, float):
        return round(c, p)
    return [_round_coords(x, p) for x in c]


def feature_lines(df: DataFrame, geometry_column: str,
                  precision: int | None = 7) -> DataFrame:
    """One GeoJSON Feature string per row (distributed)."""
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
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    geo = GeoMeta(primary_column=geometry_column,
                  columns={geometry_column: GeoColumnMeta()})
    return GeoTable(df, geo)


def _geojson_to_wkb(g: dict | None) -> bytes | None:
    if g is None:
        return None
    import numpy as np

    t = g["type"]
    c = g["coordinates"]
    if t == "Point":
        return _wkb.encode_point(float(c[0]), float(c[1]))
    if t == "LineString":
        return _wkb.encode_linestring(np.array(c, dtype="f8"))
    if t == "Polygon":
        return _wkb.encode_polygon([np.array(r, dtype="f8") for r in c])
    if t == "MultiPolygon":
        return _wkb.encode_multipolygon(
            [[np.array(r, dtype="f8") for r in poly] for poly in c]
        )
    if t == "MultiPoint":
        out = [b"\x01\x04\x00\x00\x00", len(c).to_bytes(4, "little")]
        for x, y in c:
            out.append(_wkb.encode_point(float(x), float(y)))
        return b"".join(out)
    if t == "MultiLineString":
        out = [b"\x01\x05\x00\x00\x00", len(c).to_bytes(4, "little")]
        for line in c:
            out.append(_wkb.encode_linestring(np.array(line, dtype="f8")))
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
                  schema=None):
    """GeoJSONSeq -> GeoTable, DISTRIBUTED: ``spark.read.text`` splits
    the file(s) across tasks (newlines are record boundaries, the
    whole point of the Seq variant vs a FeatureCollection document);
    each task JSON-parses its lines and encodes WKB with the same
    kernel as :func:`read_geojson`.

    ``schema``: property schema (StructType, without the geometry
    column).  Defaults to inference from a driver-side sample of the
    first lines (strings/longs/doubles/booleans)."""
    from typing import Iterator

    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

    lines = spark.read.text(path)
    if schema is None:
        sample = [r["value"] for r in lines.limit(100).collect()]
        seen: dict = {}
        for ln in sample:
            ln = ln.strip().lstrip("\x1e")       # tolerate RFC 8142 RS
            if not ln:
                continue
            ft = json.loads(ln)
            for k, v in (ft.get("properties") or {}).items():
                if k not in seen or seen[k] is None:
                    seen[k] = v
        fields = []
        for k, v in seen.items():
            if isinstance(v, bool):
                dt = T.BooleanType()
            elif isinstance(v, int):
                dt = T.LongType()
            elif isinstance(v, float):
                dt = T.DoubleType()
            else:
                # strings; nested objects/arrays surface as JSON text
                dt = T.StringType()
            fields.append(T.StructField(k, dt))
        schema = T.StructType(fields)
    out_schema = T.StructType(
        list(schema.fields)
        + [T.StructField(geometry_column, T.BinaryType(), True)])
    names = [f.name for f in schema.fields]

    def parse_lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ln in pdf["value"]:
                ln = ln.strip().lstrip("\x1e")
                if not ln:
                    continue
                ft = json.loads(ln)
                props = ft.get("properties") or {}

                def norm(v):
                    if isinstance(v, (dict, list)):
                        return json.dumps(v, separators=(",", ":"))
                    return v

                rows.append(
                    {**{k: norm(props.get(k)) for k in names},
                     geometry_column: _geojson_to_wkb(ft.get("geometry"))})
            out = pd.DataFrame(rows, columns=names + [geometry_column])
            for f in schema.fields:
                if isinstance(f.dataType, T.LongType):
                    out[f.name] = out[f.name].astype("Int64")
            yield out

    df = lines.mapInPandas(parse_lines, schema=out_schema)
    geo = GeoMeta(primary_column=geometry_column,
                  columns={geometry_column: GeoColumnMeta()})
    return GeoTable(df, geo)
