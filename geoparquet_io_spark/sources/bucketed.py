"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated big-big equi-join is the
shuffle.  Writing both sides bucketed on the join key (``bucketBy`` +
``sortBy`` + ``saveAsTable``) pins the partitioning in the table layout;
subsequent joins read co-located buckets with NO Exchange in the plan
(asserted in tests/test_bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 64,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key/count — bucket-local."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
