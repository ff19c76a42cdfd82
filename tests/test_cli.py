"""CLI surface: each command drives the engine end-to-end."""

import json

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    from geoparquet_io_spark.queries import _events_points

    p = str(tmp_path_factory.mktemp("cli") / "src.parquet")
    _events_points(spark, SF_SMOKE).write(p)
    return p


def _run(argv):
    from geoparquet_io_spark.cli import main

    return main(argv)


def test_extract(src, tmp_path, capsys):
    out = str(tmp_path / "ex.parquet")
    assert _run(["extract", src, out, "--bbox=-60,-40,40,60",
                 "--columns", "event_id"]) == 0
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert set(t.column_names) == {"event_id", "geometry", "bbox"}
    assert 0 < t.num_rows < 1000


def test_add_and_sort_and_check(src, tmp_path, capsys):
    mid = str(tmp_path / "qk.parquet")
    assert _run(["add", "quadkey", src, mid, "--zoom", "6"]) == 0
    out = str(tmp_path / "sorted.parquet")
    assert _run(["sort", "hilbert", mid, out]) == 0
    assert _run(["check", "all", out]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["issues"] == [] and rep["spec_errors"] == []


def test_partition_cli(src, tmp_path, capsys):
    out = str(tmp_path / "parts")
    assert _run(["partition", "string", src, out, "--column", "event_type"]) == 0
    assert json.loads(capsys.readouterr().out)["files"] >= 3


def test_inspect_summary(src, capsys):
    assert _run(["inspect", "summary", src]) == 0
    s = json.loads(capsys.readouterr().out)
    assert s["rows"] == 1000 and s["geo"]["primary_column"] == "geometry"


def test_convert_csv(tmp_path, capsys):
    csv = tmp_path / "in.csv"
    csv.write_text("id,wkt\n1,POINT (1 2)\n2,POINT (3 4)\n3,POINT (5 6)\n")
    out = str(tmp_path / "conv.parquet")
    assert _run(["convert", str(csv), out]) == 0
    import pyarrow.parquet as pq

    assert pq.read_metadata(out).num_rows == 3
    assert b"geo" in pq.read_schema(out).metadata


def test_inspect_head_tail(src, capsys):
    assert _run(["inspect", "head", src, "-n", "3"]) == 0
    out_head = capsys.readouterr().out
    assert "POINT" in out_head
    assert _run(["inspect", "tail", src, "-n", "3"]) == 0
    out_tail = capsys.readouterr().out
    assert "POINT" in out_tail and out_tail != out_head


def test_reproject_cli(src, tmp_path):
    out = str(tmp_path / "merc.parquet")
    assert _run(["reproject", src, out, "--to-crs", "EPSG:3857"]) == 0
    import pyarrow.parquet as pq
    import json as _json

    geo = _json.loads(pq.read_schema(out).metadata[b"geo"])
    assert geo["columns"]["geometry"]["crs"] == "EPSG:3857"


def test_admin_cli_and_publish_stac(src, tmp_path, spark, capsys):
    # build an admin file
    from geoparquet_io_spark.functions import geom as G
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.testsupport.tables import load_table, nation_boxes
    from pyspark.sql import functions as F

    n = nation_boxes(load_table(spark, SF_SMOKE, "nation"))
    n = n.withColumn("geometry", G.st_box("xmin", "ymin", "xmax", "ymax"))
    n = n.withColumn("bbox", G.bbox_struct(
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))) \
        .select("n_name", "geometry", "bbox")
    admin_path = str(tmp_path / "admin.parquet")
    GeoTable(n, GeoMeta(columns={"geometry": GeoColumnMeta()})).write(admin_path)

    out = str(tmp_path / "enriched.parquet")
    assert _run(["add-admin-divisions", src, out, "--admin", admin_path,
                 "--levels", "n_name"]) == 0
    import pyarrow.parquet as pq

    assert "admin:n_name" in pq.read_schema(out).names

    stac_out = str(tmp_path / "item.json")
    assert _run(["publish-stac", out, stac_out]) == 0
    got = json.loads(capsys.readouterr().out)
    assert "bbox" in got


def test_cli_validate_sample_asof(spark, tmp_path):
    from geoparquet_io_spark.cli import main
    from geoparquet_io_spark.queries import _events_points

    from pyspark.sql import functions as F

    gt = _events_points(spark, SF_SMOKE)
    src = str(tmp_path / "in.parquet")
    gt.write(src)

    assert main(["validate", src]) == 0

    out = str(tmp_path / "sampled")
    assert main(["sample", src, out, "--key", "event_id",
                 "--fraction", "0.3"]) == 0
    n = spark.read.parquet(out).count()
    assert 0 < n < gt.count()

    out2 = str(tmp_path / "split")
    assert main(["sample", src, out2, "--key", "event_id",
                 "--splits", "train=0.8,valid=0.2"]) == 0
    back = spark.read.parquet(out2)
    assert set(r["split"] for r in back.select("split").distinct().collect()) \
        == {"train", "valid"}

    right = str(tmp_path / "right.parquet")
    markers = gt.df.filter("event_id % 5 = 0") \
        .groupBy("user_id", "ts").agg(F.max("event_id").alias("mid"))
    from geoparquet_io_spark.geotable import GeoTable
    GeoTable(markers, None).write(right)
    out3 = str(tmp_path / "joined")
    assert main(["asof-join", src, right, out3, "--key", "user_id",
                 "--broadcast"]) == 0
    j = spark.read.parquet(out3)
    assert j.count() == gt.count() and "asof_mid" in j.columns
