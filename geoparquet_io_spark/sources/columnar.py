"""Columnar format converters beyond Parquet: ORC (Spark-native).

The reference's convert surface moves data between container formats
(core/convert.py:995-1132 — GeoPackage/Shapefile/FlatGeobuf/CSV); on a
Spark cluster the analogous interchange format is ORC (built into
Spark, zstd-compressed, predicate-pushdown capable).  Geometry stays
WKB binary; GeoParquet footer metadata does not exist in ORC, so geo
semantics ride in the ``GeoTable`` wrapper (write back to GeoParquet to
re-materialize footers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, compression: str = "zstd",
              partition_by: list[str] | None = None) -> None:
    """Write a DataFrame (geometry as WKB binary passes through) to ORC."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str,
             merge_schema: bool = False) -> DataFrame:
    """Read an ORC file/directory (hive partition discovery built in)."""
    r = spark.read
    if merge_schema:
        r = r.option("mergeSchema", "true")
    return r.orc(path)
