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


def _bucket_spec(spark: SparkSession, table: str) -> tuple | None:
    """(bucket_columns, num_buckets) from the catalog, or None when the
    table is not bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols, n = None, None
    for r in rows:
        if r["col_name"] == "Num Buckets":
            n = int(r["data_type"])
        elif r["col_name"] == "Bucket Columns":
            cols = r["data_type"].strip("[]` ").replace("`", "")
    if cols is None or n is None:
        return None
    return tuple(c.strip() for c in cols.split(",")), n


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key/count — bucket-local.

    The spec is VERIFIED up front: mismatched bucket counts, a
    non-bucketed side, or a different bucket key would silently degrade
    to the full shuffle join this function exists to avoid."""
    specs = []
    for t in (left_table, right_table):
        spec = _bucket_spec(spark, t)
        if spec is None:
            raise ValueError(
                f"table {t!r} is not bucketed — write it with "
                "write_bucketed() or use a plain join")
        if key not in spec[0]:
            raise ValueError(
                f"table {t!r} is bucketed on {spec[0]}, not on the join "
                f"key {key!r} — the join would shuffle anyway")
        specs.append(spec)
    if specs[0][1] != specs[1][1]:
        raise ValueError(
            f"bucket counts differ ({specs[0][1]} vs {specs[1][1]}) — "
            "at least one side would re-shuffle; rewrite with matching "
            "num_buckets")
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
