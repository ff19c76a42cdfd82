"""CSV/TSV -> GeoTable converters with geometry auto-detection.

Reference: _build_csv_conversion_query + detection heuristics
(core/convert.py:104-460).  Detection reads a small driver-side sample
(delimiter sniffing + column-name/content checks); the conversion itself
is a distributed ``spark.read.csv`` + native/WKT expressions.
"""

from __future__ import annotations

import csv as _csv
import io
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from geoparquet_io_spark.functions import geom as G
from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

WKT_COLUMN_NAMES = {"wkt", "geometry", "geom", "the_geom", "wkt_geometry"}
LAT_NAMES = {"lat", "latitude", "y"}
LON_NAMES = {"lon", "lng", "long", "longitude", "x"}
_WKT_PREFIXES = ("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
                 "MULTILINESTRING", "MULTIPOLYGON")


def sniff_dialect(path: str, sample_bytes: int = 64 * 1024,
                  delimiter: str | None = None) -> tuple[str, list[str]]:
    """(delimiter, header columns) from a driver-side sample
    (reference delimiter sniffing: core/convert.py:104-180).

    ``delimiter``: when the caller already knows it, the header is
    parsed with it directly — re-sniffing could pick a different one
    (e.g. decimal commas in a semicolon file) and split the header
    wrong.  Header names are returned RAW (no strip): they must match
    the Spark CSV reader's column names exactly."""
    with open(path, "r", newline="", errors="replace") as f:
        sample = f.read(sample_bytes)
    delim = delimiter
    if delim is None:
        try:
            dialect = _csv.Sniffer().sniff(sample, delimiters=",;\t|")
            delim = dialect.delimiter
        except _csv.Error:
            delim = ","
    header = next(_csv.reader(io.StringIO(sample), delimiter=delim), [])
    return delim, header


def detect_geometry_columns(path: str, delim: str, header: list[str]):
    """-> ("wkt", col) | ("latlon", (lat, lon)) | (None, None)
    (reference: core/convert.py:104-250)."""
    # compare stripped-lowercase, return the RAW header name (Spark's
    # reader keeps surrounding whitespace in column names)
    lower = {h.strip().lower(): h for h in header}
    for name in WKT_COLUMN_NAMES:
        if name in lower:
            return "wkt", lower[name]
    lat = next((lower[n] for n in LAT_NAMES if n in lower), None)
    lon = next((lower[n] for n in LON_NAMES if n in lower), None)
    if lat and lon:
        return "latlon", (lat, lon)
    # content-based: scan a few rows for WKT-looking values
    with open(path, "r", newline="", errors="replace") as f:
        reader = _csv.reader(f, delimiter=delim)
        next(reader, None)
        for _ in range(20):
            row = next(reader, None)
            if row is None:
                break
            for col, val in zip(header, row):
                if val and val.strip().upper().startswith(_WKT_PREFIXES):
                    return "wkt", col
    return None, None


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str | None = None,
    wkt_column: str | None = None,
    lat_column: str | None = None,
    lon_column: str | None = None,
    skip_invalid: bool = False,
    geometry_column: str = "geometry",
    crs: str = "OGC:CRS84",
):
    """CSV/TSV -> GeoTable.  Auto-detects delimiter and geometry columns
    when not given; drops the source columns like the reference
    (core/convert.py:374-460)."""
    from geoparquet_io_spark.geotable import GeoTable

    header: list[str] = []
    if delimiter is None or (wkt_column is None and lat_column is None):
        from geoparquet_io_spark.sources.remote import (
            is_fetchable_url, localize_file)

        sniff_path = path
        if is_fetchable_url(path):
            # remote CSV (s3/https/...): spark.read.csv handles the scan
            # fine, but dialect/geometry sniffing needs a driver-local
            # copy — same localization the shapefile/gpkg readers use
            sniff_path, _ = localize_file(spark, path)
        elif not os.path.isfile(path):  # glob/dir: sniff the first file
            import glob as _g

            hits = sorted(_g.glob(path) or _g.glob(os.path.join(path, "*")))
            if not hits:
                raise FileNotFoundError(path)
            sniff_path = hits[0]
        delimiter, header = sniff_dialect(sniff_path, delimiter=delimiter)
        if wkt_column is None and lat_column is None:
            kind, cols = detect_geometry_columns(sniff_path, delimiter, header)
            if kind == "wkt":
                wkt_column = cols
            elif kind == "latlon":
                lat_column, lon_column = cols
            else:
                raise ValueError(
                    f"no geometry column detected in {path} (header {header})"
                )

    df = (
        spark.read.option("header", "true")
        .option("sep", delimiter)
        .option("inferSchema", "true")
        .csv(path)
    )

    if wkt_column is not None:
        parse = G.st_try_geomfromtext if skip_invalid else G.st_geomfromtext
        df = df.withColumn(geometry_column, parse(F.col(wkt_column).cast("string")))
        if wkt_column != geometry_column:
            df = df.drop(wkt_column)
        if skip_invalid:
            df = df.filter(F.col(geometry_column).isNotNull())
    else:
        lat = F.col(lat_column).cast("double")
        lon = F.col(lon_column).cast("double")
        valid = (
            lat.isNotNull() & lon.isNotNull()
            & (lat >= -90) & (lat <= 90) & (lon >= -180) & (lon <= 180)
        )
        if skip_invalid:
            df = df.filter(valid)
        else:
            # range validation (reference: core/convert.py:254): embed the
            # check INSIDE the geometry expression — a standalone assert
            # column would be pruned by the optimizer before evaluation
            lon = F.when(valid, lon).otherwise(
                F.raise_error(
                    F.concat(F.lit("lat/lon out of range: "),
                             lat.cast("string"), F.lit(","), lon.cast("string"))
                ).cast("double")
            )
        df = df.withColumn(geometry_column, G.st_point(lon, lat))
        df = df.drop(lat_column, lon_column)

    geo = GeoMeta(
        primary_column=geometry_column,
        columns={geometry_column: GeoColumnMeta(crs=crs)},
    )
    return GeoTable(df, geo)


def write_csv(
    gt,
    path: str,
    include_wkt: bool = True,
    include_bbox: bool = False,
    single_file: bool = True,
) -> None:
    """GeoTable -> CSV with geometry as WKT text
    (reference: core/format_writers.py:245-357)."""
    df = gt.df
    geom = gt.geometry_column
    if geom:
        if include_wkt:
            df = df.withColumn("wkt", G.st_astext(F.col(geom)))
        if include_bbox and gt.bbox_column:
            b = F.col(gt.bbox_column)
            df = (
                df.withColumn("bbox_xmin", b["xmin"])
                .withColumn("bbox_ymin", b["ymin"])
                .withColumn("bbox_xmax", b["xmax"])
                .withColumn("bbox_ymax", b["ymax"])
            )
        drop = [geom] + ([gt.bbox_column] if gt.bbox_column else [])
        df = df.drop(*drop)
    if single_file:
        df = df.coalesce(1)
        tmp = path + ".__tmp__"
        df.write.option("header", "true").mode("overwrite").csv(tmp)
        import glob as _g
        import shutil

        part = _g.glob(os.path.join(tmp, "part-*.csv"))[0]
        if os.path.isdir(path):
            # a prior multi-file write left a DIRECTORY here: moving the
            # part would land it INSIDE as path/part-*.csv with no error
            shutil.rmtree(path)
        shutil.move(part, path)
        shutil.rmtree(tmp)
    else:
        df.write.option("header", "true").mode("overwrite").csv(path)
