"""Loaders for the driver's synthetic tables (/root/testdata/sf*) plus the
deterministic geometry synthesis shared by Spark queries and DuckDB oracles.

The testdata has no geometry columns, so spatial operators are exercised on
points/boxes derived ARITHMETICALLY from table keys.  The same formulas are
emitted as SQL strings for the DuckDB oracle — both engines compute IEEE
doubles with identical expressions, so results match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # oracle parity for timestamp formatting/filters must not depend on the
    # caller session's zone (the grading driver builds its own session)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # ts is written as timestamp[ns], which Spark's reader rejects.
        # Set the legacy conf HERE (runtime-settable) so the tables load
        # under ANY caller-provided session (the grading driver builds its
        # own), then convert the long nanos to a real timestamp.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- deterministic synthetic geometry ---------------------------------------
# events -> points:   lon/lat from user_id & event_id (pure integer math)
# nation -> boxes:    5x5 world grid keyed by n_nationkey (disjoint tiles)

def event_lonlat(df: DataFrame) -> DataFrame:
    """Add lon/lat derived from keys. Mirrors EVENT_LON_SQL/EVENT_LAT_SQL."""
    lon = ((F.col("user_id") * 37 + F.col("event_id")) % 3400) / 10.0 - 170.0
    lat = ((F.col("user_id") * 53 + F.col("event_id") * 7) % 1600) / 10.0 - 80.0
    return df.withColumn("lon", lon.cast("double")).withColumn("lat", lat.cast("double"))


EVENT_LON_SQL = "(((user_id * 37 + event_id) % 3400) / 10.0 - 170.0)"
EVENT_LAT_SQL = "(((user_id * 53 + event_id * 7) % 1600) / 10.0 - 80.0)"


def customer_lonlat(df: DataFrame) -> DataFrame:
    lon = ((F.col("c_custkey") * 131) % 3600) / 10.0 - 180.0
    lat = ((F.col("c_custkey") * 197) % 1700) / 10.0 - 85.0
    return df.withColumn("lon", lon.cast("double")).withColumn("lat", lat.cast("double"))


CUSTOMER_LON_SQL = "(((c_custkey * 131) % 3600) / 10.0 - 180.0)"
CUSTOMER_LAT_SQL = "(((c_custkey * 197) % 1700) / 10.0 - 85.0)"


def nation_boxes(df: DataFrame) -> DataFrame:
    """Disjoint 72x34-degree tiles in a 5x5 grid keyed by n_nationkey.
    Gaps of 1 degree between tiles keep them strictly disjoint so a point
    matches at most one box."""
    col = F.col("n_nationkey") % 5
    row = F.floor(F.col("n_nationkey") / 5).cast("int") % 5
    xmin = (col * 72 - 180).cast("double") + 0.5
    ymin = (row * 34 - 85).cast("double") + 0.5
    return (
        df.withColumn("xmin", xmin)
        .withColumn("ymin", ymin)
        .withColumn("xmax", xmin + 71.0)
        .withColumn("ymax", ymin + 33.0)
    )


NATION_BOX_SQL = {
    "xmin": "(CAST((n_nationkey % 5) * 72 - 180 AS DOUBLE) + 0.5)",
    "ymin": "(CAST((CAST(floor(n_nationkey / 5) AS INT) % 5) * 34 - 85 AS DOUBLE) + 0.5)",
    "xmax": "(CAST((n_nationkey % 5) * 72 - 180 AS DOUBLE) + 0.5 + 71.0)",
    "ymax": "(CAST((CAST(floor(n_nationkey / 5) AS INT) % 5) * 34 - 85 AS DOUBLE) + 0.5 + 33.0)",
}
