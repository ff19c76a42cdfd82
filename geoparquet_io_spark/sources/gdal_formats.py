"""GDAL vector formats: GeoPackage / Shapefile / FlatGeobuf.

The reference reads these via DuckDB's ST_Read and writes via
COPY (FORMAT GDAL) (core/convert.py:42,547,916;
core/format_writers.py:99-243) — both single-node GDAL under the hood.
This engine needs NO GDAL: each format has a pure-Python implementation
against its public spec —

- GeoPackage: stdlib sqlite3 (sources/gpkg.py), distributed rowid scan;
- Shapefile: fixed-layout .shp/.shx/.dbf parser (sources/shapefile.py),
  distributed record-range scan;
- FlatGeobuf: own FlatBuffers runtime (sources/fgb.py +
  functions/flatbuf.py), distributed byte-range decode.

When ``pyogrio`` IS installed it is preferred as the fast path (real
GDAL covers more dialect corners: encodings, exotic shape types,
projected .prj WKT variants); otherwise the pure readers serve.
``read_gdal``/``write_gdal`` dispatch on extension either way.
"""

from __future__ import annotations

import os

GDAL_DRIVERS = {
    ".gpkg": "GPKG",
    ".shp": "ESRI Shapefile",
    ".fgb": "FlatGeobuf",
    ".geojson": "GeoJSON",
}

# GDAL can't hold nested columns; the reference drops them
# (core/format_writers.py:99-243)
_UNSUPPORTED_TYPES = ("struct", "array", "map")


def _pyogrio():
    try:
        import pyogrio  # noqa: F401

        return pyogrio
    except ImportError:
        return None


def read_gdal(spark, path: str, geometry_column: str = "geometry",
              layer: str | None = None):
    """Vector file -> GeoTable.  Dispatches by extension to the
    pure-Python readers; uses pyogrio when present (fast path)."""
    ext = os.path.splitext(path)[1].lower()
    if _pyogrio() is None or ext == ".geojson":
        if ext == ".gpkg":
            from geoparquet_io_spark.sources.gpkg import read_gpkg

            return read_gpkg(spark, path, layer=layer)
        if ext == ".shp":
            from geoparquet_io_spark.sources.shapefile import read_shapefile

            return read_shapefile(spark, path,
                                  geometry_column=geometry_column)
        if ext == ".fgb":
            from geoparquet_io_spark.sources.fgb import read_fgb

            return read_fgb(spark, path, geometry_column=geometry_column)
        if ext == ".geojson":
            from geoparquet_io_spark.sources.geojson import read_geojson

            return read_geojson(spark, path,
                                geometry_column=geometry_column)
        raise ValueError(f"no reader for extension {ext!r} ({path})")
    return _read_pyogrio(spark, path, geometry_column, layer=layer)


def _read_pyogrio(spark, path: str, geometry_column: str,
                  layer: str | None = None):
    pyogrio = _pyogrio()  # pragma: no cover - exercised when GDAL present
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

    kw = {} if layer is None else {"layer": layer}
    table = pyogrio.raw.read_arrow(path, **kw)[1]  # arrow, WKB geometry
    pdf = table.to_pandas()
    if "wkb_geometry" in pdf.columns:
        pdf = pdf.rename(columns={"wkb_geometry": geometry_column})
    df = spark.createDataFrame(pdf)
    geo = GeoMeta(primary_column=geometry_column,
                  columns={geometry_column: GeoColumnMeta()})
    return GeoTable(df, geo)


def write_gdal(gt, path: str, driver: str | None = None,
               layer: str | None = None) -> None:
    """GeoTable -> single vector file.  Driver inferred from extension;
    pure-Python writers by default, pyogrio when installed (except
    GeoJSON, which always uses the native writer)."""
    ext = os.path.splitext(path)[1].lower()
    if driver is None:
        driver = GDAL_DRIVERS.get(ext)
        if driver is None:
            raise ValueError(f"cannot infer GDAL driver for {path}")
    if _pyogrio() is None or ext == ".geojson":
        if ext == ".gpkg":
            from geoparquet_io_spark.sources.gpkg import write_gpkg

            return write_gpkg(gt, path, layer=layer)
        if ext == ".shp":
            from geoparquet_io_spark.sources.shapefile import write_shapefile

            return write_shapefile(gt, path)
        if ext == ".fgb":
            from geoparquet_io_spark.sources.fgb import write_fgb

            return write_fgb(gt, path)
        if ext == ".geojson":
            from geoparquet_io_spark.sources.geojson import write_geojson

            return write_geojson(gt, path)
        raise ValueError(f"no writer for extension {ext!r} ({path})")
    return _write_pyogrio(gt, path, driver, layer)


def _write_pyogrio(gt, path: str, driver: str, layer: str | None):
    pyogrio = _pyogrio()  # pragma: no cover - exercised when GDAL present
    df = gt.df
    keep = [
        f.name for f in df.schema.fields
        if not f.dataType.simpleString().startswith(_UNSUPPORTED_TYPES)
        or f.name == gt.geometry_column
    ]
    dropped = [c for c in df.columns if c not in keep]
    if dropped:
        import warnings

        warnings.warn(f"dropping nested columns unsupported by GDAL: {dropped}")
    table = df.select(*keep).toArrow()

    # single declared type -> pass it through; else let GDAL promote
    declared = list(gt.geo.primary.geometry_types) if gt.geo is not None else []
    geometry_type = declared[0] if len(declared) == 1 else "Unknown"
    crs = gt.crs or "EPSG:4326"
    if isinstance(crs, dict):  # PROJJSON -> AUTH:CODE if identifiable
        from geoparquet_io_spark.functions.crs import normalize_crs

        crs = normalize_crs(crs)
    pyogrio.raw.write_arrow(
        table,
        path,
        layer=layer or os.path.splitext(os.path.basename(path))[0],
        driver=driver,
        geometry_name=gt.geometry_column,
        geometry_type=geometry_type,
        crs=crs,
    )
