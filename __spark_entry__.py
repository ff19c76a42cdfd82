"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline; ``queries()`` /
``oracle_sql()`` expose the operator registry in
``geoparquet_io_spark/queries.py`` (one entry per implemented operator
from SURVEY.md section 2, each with a DuckDB-oracle SQL mirror).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on sf0.001: synthesize WKB points from events,
    add bbox covering column, bbox-extract, hilbert-sort, project."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.queries import _events_points

    gt = _events_points(spark, "/root/testdata/sf0.001")
    out = gt.extract(bbox=(-150, -75, 150, 75)).sort_hilbert(keep_key=True)
    from geoparquet_io_spark.functions import geom as G

    return out.df.select(
        "event_id",
        F.col("__hilbert").alias("hilbert_key"),
        G.st_x(F.col("geometry")).alias("x"),
        G.st_y(F.col("geometry")).alias("y"),
        "event_type",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geoparquet_io_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from geoparquet_io_spark.queries import all_oracles

    return all_oracles()
