"""ArcGIS-pagination source (fake fetcher), STAC generation, remote paths."""

from pyspark.sql import types as T

from tests.conftest import SF_SMOKE


def test_arcgis_paginated_reader(spark):
    from geoparquet_io_spark.sources.remote import arcgis_to_geotable

    TOTAL = 2500
    PAGE = 1000

    def fake_fetch(offset: int, count: int):
        end = min(offset + count, TOTAL)
        return [
            {"oid": i, "name": f"f{i}", "__x": -100.0 + i * 0.01, "__y": 30.0 + i * 0.005}
            for i in range(offset, end)
        ]

    schema = T.StructType([
        T.StructField("oid", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    gt = arcgis_to_geotable(spark, TOTAL, schema, fake_fetch, page_size=PAGE)
    assert gt.count() == TOTAL
    assert gt.geometry_column == "geometry"
    # geometry actually decodes
    from geoparquet_io_spark.functions import geom as G
    from pyspark.sql import functions as F

    row = gt.df.filter(F.col("oid") == 0).select(
        G.st_x(F.col("geometry")).alias("x")).collect()[0]
    assert row["x"] == -100.0
    # pipeline composes: bbox + extract on the fetched table
    sub = gt.add_bbox().extract(bbox=(-95, 30, -90, 45))
    assert 0 < sub.count() < TOTAL


def test_remote_path_normalization():
    from geoparquet_io_spark.sources.remote import is_remote_path, normalize_remote_path

    assert is_remote_path("s3://bucket/k.parquet")
    assert normalize_remote_path("s3://b/k") == "s3a://b/k"
    assert normalize_remote_path("gs://b/k") == "gs://b/k"
    assert not is_remote_path("/local/path")


def test_stac_item_roundtrip(spark, tmp_path):
    from geoparquet_io_spark.queries import _events_points
    from geoparquet_io_spark.sources.stac import (
        generate_stac_collection, validate_stac_item, write_stac_item,
    )

    gt = _events_points(spark, SF_SMOKE)
    b = gt.bounds()
    gt.geo.primary.bbox = list(b)
    pq_path = str(tmp_path / "stac_src.parquet")
    gt.write(pq_path)
    item = write_stac_item(pq_path, str(tmp_path / "item.json"),
                           datetime_utc="2026-01-01T00:00:00Z")
    assert validate_stac_item(item) == []
    assert item["bbox"] == list(b)
    assert item["properties"]["table:row_count"] == gt.count()
    coll = generate_stac_collection([item], "test-coll")
    assert coll["extent"]["spatial"]["bbox"][0] == list(b)
    bad = dict(item)
    del bad["geometry"]
    assert validate_stac_item(bad)
