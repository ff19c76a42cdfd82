"""Parquet bloom filters: Spark-native write path + parquet-mr-backed
presence check (pyarrow 16 exposes no bloom API, so the checker drives
the driver-JVM ParquetFileReader)."""

import json
import os

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=20000):
    return (spark.range(0, n)
            .select(F.col("id").alias("doc_id"),
                    F.md5(F.col("id").cast("string")).alias("fingerprint"),
                    (F.col("id") % 5).alias("bucket")))


def test_write_bloom_and_check(spark, tmp_path):
    from geoparquet_io_spark.operators.inspect_check import (
        check_bloom_filters)
    from geoparquet_io_spark.sources.geoparquet import write_bloom

    p = str(tmp_path / "bl")
    files = write_bloom(_docs(spark).coalesce(1), p,
                        ["fingerprint", "doc_id"], ndv=20000)
    assert files
    rep = check_bloom_filters(spark, p)
    assert rep["ok"]
    assert set(rep["columns_with_bloom"]) == {"fingerprint", "doc_id"}
    sizes = rep["files"][0]["row_groups"][0]["columns"]
    assert all(v > 0 for v in sizes.values())
    # equality probe on the bloom column still returns exact results
    got = (spark.read.parquet(p)
           .filter(F.col("fingerprint") == F.md5(F.lit("123")))
           .collect())
    assert [r["doc_id"] for r in got] == [123]


def test_dictionary_encoded_column_gets_no_bloom(spark, tmp_path):
    """parquet-mr omits the bloom when the row group stays fully
    dictionary-encoded (the dictionary already skips exactly) — the
    checker must report what was ACTUALLY written, not what was asked."""
    from geoparquet_io_spark.operators.inspect_check import (
        check_bloom_filters)
    from geoparquet_io_spark.sources.geoparquet import write_bloom

    p = str(tmp_path / "bl")
    write_bloom(_docs(spark).coalesce(1), p, ["bucket"])  # 5 distinct values
    rep = check_bloom_filters(spark, p)
    assert not rep["ok"]
    assert rep["columns_with_bloom"] == []


def test_pyarrow_written_files_report_absent(spark, tmp_path):
    from geoparquet_io_spark.operators.inspect_check import (
        check_bloom_filters)
    from geoparquet_io_spark.sources.geoparquet import write

    p = str(tmp_path / "plain")
    write(_docs(spark, 1000), p)
    rep = check_bloom_filters(spark, p)
    assert not rep["ok"] and rep["columns_with_bloom"] == []


def test_write_bloom_rejects_unknown_column(spark, tmp_path):
    from geoparquet_io_spark.sources.geoparquet import write_bloom

    with pytest.raises(ValueError, match="not in schema"):
        write_bloom(_docs(spark, 10), str(tmp_path / "x"), ["nope"])


def test_check_bloom_cli(spark, tmp_path, capsys):
    from geoparquet_io_spark.cli import main
    from geoparquet_io_spark.sources.geoparquet import write_bloom

    p = str(tmp_path / "bl")
    write_bloom(_docs(spark).coalesce(1), p, ["fingerprint"], ndv=20000)
    assert main(["check", "bloom", p]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["columns_with_bloom"] == ["fingerprint"]


def test_bucketed_join_verifies_spec(spark, tmp_path):
    import pytest as _p

    from geoparquet_io_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    import shutil

    df = spark.range(100).withColumnRenamed("id", "k")
    # clean any leftover managed-table locations from crashed runs
    # (the catalog is session-scoped, the warehouse dirs are not)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bj_l", "bj_r", "bj_r4", "bj_plain"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    write_bucketed(df, "bj_l", "k", num_buckets=8)
    write_bucketed(df, "bj_r", "k", num_buckets=8)
    write_bucketed(df, "bj_r4", "k", num_buckets=4)
    df.write.format("parquet").mode("overwrite").saveAsTable("bj_plain")
    assert bucketed_join(spark, "bj_l", "bj_r", "k").count() == 100
    with _p.raises(ValueError, match="not bucketed"):
        bucketed_join(spark, "bj_l", "bj_plain", "k")
    with _p.raises(ValueError, match="counts differ"):
        bucketed_join(spark, "bj_l", "bj_r4", "k")
    with _p.raises(ValueError, match="join"):
        bucketed_join(spark, "bj_l", "bj_r", "nope")
