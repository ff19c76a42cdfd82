"""Oracle-backed queries for the pure-Python vector formats
(GeoPackage / Shapefile / FlatGeobuf — sources/gpkg.py,
sources/shapefile.py, sources/fgb.py).

Each query puts the WHOLE format path inside the correctness gate:
events -> WKB points -> write <format> -> read back (distributed
scan) -> recover coordinates from WKB -> aggregate.  The DuckDB
oracle computes the same aggregate straight from the parquet table,
never touching the format — so a match proves the encode/decode chain
is lossless.  Reference parity: convert to/from GeoPackage, Shapefile,
FlatGeobuf (core/convert.py:995-1132, core/format_writers.py:99-243),
here with zero GDAL dependency.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from geoparquet_io_spark.queries import _events_points, register
from geoparquet_io_spark.testsupport.tables import (
    EVENT_LAT_SQL,
    EVENT_LON_SQL,
)

_EVT = (f"SELECT event_id, {EVENT_LON_SQL} AS lon, {EVENT_LAT_SQL} AS lat "
        f"FROM events WHERE event_id % 20 = 0")

_AGG_SQL = f"""
    WITH pts AS ({_EVT})
    SELECT COUNT(*) AS n,
           COUNT(DISTINCT event_id) AS n_ids,
           ROUND(SUM(lon), 3) AS sum_x,
           ROUND(SUM(lat), 3) AS sum_y,
           ROUND(MIN(lon), 1) AS min_x,
           ROUND(MAX(lat), 1) AS max_y
    FROM pts
    """


def _subset(spark, sf_dir):
    """Deterministic slice of the events points (1/20th) as a GeoTable
    with event_id kept."""
    from geoparquet_io_spark.geotable import GeoTable

    gt = _events_points(spark, sf_dir)
    return GeoTable(gt.df.filter(F.col("event_id") % 20 == 0)
                    .select("event_id", "geometry"), gt.geo)


def _agg_back(df, gcol="geometry"):
    from geoparquet_io_spark.functions import geom as G

    return df.select(
        "event_id",
        G.st_x(F.col(gcol)).alias("x"),
        G.st_y(F.col(gcol)).alias("y"),
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        F.round(F.sum("x"), 3).alias("sum_x"),
        F.round(F.sum("y"), 3).alias("sum_y"),
        F.round(F.min("x"), 1).alias("min_x"),
        F.round(F.max("y"), 1).alias("max_y"),
    )


@register("convert_gpkg_roundtrip", _AGG_SQL)
def q_gpkg_roundtrip(spark, sf_dir):
    """events points -> GeoPackage (stdlib sqlite3 writer) -> distributed
    rowid-range read -> coordinate aggregate."""
    from geoparquet_io_spark.sources.gpkg import read_gpkg, write_gpkg

    gt = _subset(spark, sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="gpkg_rt_"), "pts.gpkg")
    write_gpkg(gt, out, layer="pts")
    back = read_gpkg(spark, out)
    return _agg_back(back.df)


@register("convert_shp_roundtrip", _AGG_SQL)
def q_shp_roundtrip(spark, sf_dir):
    """events points -> Shapefile (.shp/.shx/.dbf) -> distributed
    record-range read -> coordinate aggregate."""
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile,
        write_shapefile,
    )

    gt = _subset(spark, sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="shp_rt_"), "pts.shp")
    write_shapefile(gt, out)
    back = read_shapefile(spark, out)
    return _agg_back(back.df)


@register("convert_fgb_roundtrip", _AGG_SQL)
def q_fgb_roundtrip(spark, sf_dir):
    """events points -> FlatGeobuf (own FlatBuffers runtime) ->
    distributed byte-range read -> coordinate aggregate."""
    from geoparquet_io_spark.sources.fgb import read_fgb, write_fgb

    gt = _subset(spark, sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="fgb_rt_"), "pts.fgb")
    write_fgb(gt, out)
    back = read_fgb(spark, out)
    return _agg_back(back.df)
