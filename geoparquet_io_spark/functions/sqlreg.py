"""Spark SQL registration of the ST_* surface.

``register_sql_functions(spark)`` makes the engine's geometry functions
callable from plain ``spark.sql`` / ``df.selectExpr`` — the idiomatic
Spark path for analysts who write SQL against temp views instead of the
fluent GeoTable API.  Every registered function is the SAME Arrow-
batched pandas UDF the column API uses (functions/geom.py over the
numpy WKB kernel), so SQL and fluent plans execute identically; the
simple constant-argument wrappers (``st_simplify``) re-expose the
column builders at fixed signatures.

Reference surface: the reference exposes these through DuckDB spatial
SQL (SURVEY 2.11); this is the Spark-SQL equivalent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geoparquet_io_spark.functions import geom as G
from geoparquet_io_spark.functions import wkb as _wkb

SQL_FUNCTIONS = (
    "st_point st_box st_geomfromtext st_try_geomfromtext st_astext "
    "st_x st_y st_geometrytype st_intersects st_distance st_area "
    "st_length st_npoints st_convexhull st_simplify"
).split()


@pandas_udf(T.BinaryType())
def _st_simplify_udf(g: pd.Series, tol: pd.Series) -> pd.Series:
    out = []
    for b, t in zip(g, tol):
        # NULL tolerance -> NULL result, like every other registered
        # ST_* function's null handling (float(None) killed the task)
        out.append(None if b is None or t is None or t != t
                   else _wkb.simplify(bytes(b), float(t)))
    return pd.Series(out)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the ST_* functions for SQL use; returns the names.
    Safe to call repeatedly (re-registration replaces)."""
    udfs = {
        "st_point": G.st_point,
        "st_box": G.st_box,
        "st_geomfromtext": G.st_geomfromtext,
        "st_try_geomfromtext": G.st_try_geomfromtext,
        "st_astext": G.st_astext,
        "st_x": G.st_x,
        "st_y": G.st_y,
        "st_geometrytype": G.st_geometrytype,
        "st_intersects": G.st_intersects,
        "st_distance": G.st_distance,
        "st_area": G.st_area,
        "st_length": G.st_length,
        "st_npoints": G.st_npoints,
        "st_convexhull": G.st_convexhull,
        "st_simplify": _st_simplify_udf,
    }
    for name, fn in udfs.items():
        spark.udf.register(name, fn)
    return sorted(udfs)
