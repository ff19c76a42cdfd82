"""GDAL vector formats: GeoPackage / Shapefile / FlatGeobuf.

The reference reads these via DuckDB's ST_Read and writes via
COPY (FORMAT GDAL) (core/convert.py:42,547,916; core/format_writers.py:99-243)
— both single-node GDAL under the hood.  This container has no GDAL, so
these are import-gated on ``pyogrio``: present -> driver-side read to
Arrow then parallelize / collect-and-write; absent -> a clear error.
The single-file, driver-side nature mirrors the reference exactly.
"""

from __future__ import annotations

GDAL_DRIVERS = {
    ".gpkg": "GPKG",
    ".shp": "ESRI Shapefile",
    ".fgb": "FlatGeobuf",
    ".geojson": "GeoJSON",
}

# GDAL can't hold nested columns; the reference drops them
# (core/format_writers.py:99-243)
_UNSUPPORTED_TYPES = ("struct", "array", "map")


def _require_pyogrio():
    try:
        import pyogrio  # noqa: F401

        return pyogrio
    except ImportError as e:
        raise NotImplementedError(
            "GeoPackage/Shapefile/FlatGeobuf IO requires pyogrio+GDAL, which "
            "are not in this container; install pyogrio to enable "
            "(the reference uses DuckDB's GDAL bridge the same single-node way)"
        ) from e


def read_gdal(spark, path: str, geometry_column: str = "geometry"):
    """GDAL vector file -> GeoTable (driver-side read, like ST_Read)."""
    pyogrio = _require_pyogrio()
    from geoparquet_io_spark.geotable import GeoTable  # pragma: no cover
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

    table = pyogrio.raw.read_arrow(path)[1]  # arrow table with WKB geometry
    pdf = table.to_pandas()
    if "wkb_geometry" in pdf.columns:
        pdf = pdf.rename(columns={"wkb_geometry": geometry_column})
    df = spark.createDataFrame(pdf)
    geo = GeoMeta(primary_column=geometry_column,
                  columns={geometry_column: GeoColumnMeta()})
    return GeoTable(df, geo)


def write_gdal(gt, path: str, driver: str | None = None,
               layer: str | None = None) -> None:
    """GeoTable -> GDAL single file via ``pyogrio.raw.write_arrow``
    (collect-to-driver, like the reference's COPY FORMAT GDAL; no
    geopandas needed — GDAL consumes the Arrow stream with the geometry
    as a WKB binary column).  Nested columns are dropped with the same
    rule as the reference (core/format_writers.py:99-243)."""
    pyogrio = _require_pyogrio()
    import os

    if driver is None:
        driver = GDAL_DRIVERS.get(os.path.splitext(path)[1].lower())
        if driver is None:
            raise ValueError(f"cannot infer GDAL driver for {path}")
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
