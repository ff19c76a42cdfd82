"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the configuration is
chosen to also be correct on a large cluster (AQE on, skew-join on,
arrow-batched pandas UDFs, pushdown everything).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "geoparquet_io_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        # '*' is the idiomatic local[] value for "all cores" — int('*')
        # crashed before the session was even built
        shuffle_partitions = (os.cpu_count() or 8) if cpus == "*" \
            else int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime re-plan, skew-join mitigation, partition coalescing.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDFs and toPandas — the kernel's fast path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Pushdown everything the Parquet reader supports.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.recordLevelFilter.enabled", "false")
        # pandas-written nanosecond timestamps: read as long, convert in loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Sane defaults for 100k-row row-groups (reference ParquetWriteSettings,
        # core/common.py:70-110): zstd, stats+dictionary on.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
