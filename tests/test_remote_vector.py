"""Remote (http://) single-file vector reads: the gpkg/shp/fgb readers
localize the file cluster-wide via SparkContext.addFile and scan the
per-node copy — no GDAL, no network access inside executor tasks
beyond Spark's own file server."""

import functools
import threading
from http.server import HTTPServer, SimpleHTTPRequestHandler

import pytest
from pyspark.sql import Row

from geoparquet_io_spark.functions import wkb as W
from geoparquet_io_spark.geotable import GeoTable
from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta


@pytest.fixture()
def http_root(tmp_path):
    handler = functools.partial(
        SimpleHTTPRequestHandler, directory=str(tmp_path))
    handler.log_message = lambda *a, **k: None
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield tmp_path, f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


def _points(spark, n=7, crs="EPSG:4326"):
    rows = [Row(id=i, name=f"p{i}",
                geometry=bytearray(W.encode_point(i * 1.5, i * -0.5)))
            for i in range(n)]
    df = spark.createDataFrame(rows)
    return GeoTable(df, GeoMeta(primary_column="geometry", columns={
        "geometry": GeoColumnMeta(crs=crs, geometry_types=["Point"])}))


def _key(gt):
    return sorted((bytes(r.geometry).hex(), r.id, r.name)
                  for r in gt.df.select("geometry", "id", "name").collect())


def test_remote_gpkg_read(spark, http_root):
    from geoparquet_io_spark.sources.gpkg import read_gpkg, write_gpkg

    root, url = http_root
    gt = _points(spark)
    write_gpkg(gt, str(root / "remote_pts_a.gpkg"), layer="pts")
    back = read_gpkg(spark, f"{url}/remote_pts_a.gpkg")
    assert _key(back) == _key(gt)


def test_object_store_gpkg_read_via_hadoop_fs(spark, tmp_path, monkeypatch):
    """Object-store GeoPackage: an s3a://-style path goes through the
    HADOOP-FS branch of localize_file (connector existence probe +
    SparkContext.addFile) before sqlite3.connect ever sees it.  The test
    registers a mock scheme backed by Hadoop's LocalFileSystem so the
    full connector code path runs without cloud credentials — the same
    dispatch an s3a/gs/abfs URL takes with the real jars on the
    classpath."""
    from geoparquet_io_spark.sources import remote as R
    from geoparquet_io_spark.sources.gpkg import read_gpkg, write_gpkg

    # file:// resolves through the same FileSystem dispatch s3a/gs
    # take (Path -> getFileSystem -> exists -> addFile); Hadoop's local
    # FS plays the object-store connector without cloud credentials
    monkeypatch.setattr(
        R, "FETCHABLE_SCHEMES", R.FETCHABLE_SCHEMES + ("file://",))

    gt = _points(spark)
    write_gpkg(gt, str(tmp_path / "store_pts.gpkg"), layer="pts")
    url = f"file://{tmp_path}/store_pts.gpkg"
    assert R.is_fetchable_url(url)
    assert R._remote_exists(spark, url)           # connector probe branch
    back = read_gpkg(spark, url)
    assert _key(back) == _key(gt)
    # a missing object errors out cleanly, same as http 404
    with pytest.raises(IOError, match="cannot fetch"):
        read_gpkg(spark, f"file://{tmp_path}/absent.gpkg")


def test_remote_shapefile_read_with_sidecars(spark, http_root):
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile, write_shapefile,
    )

    root, url = http_root
    gt = _points(spark, crs="EPSG:3006")
    write_shapefile(gt, str(root / "remote_pts_b"))
    back = read_shapefile(spark, f"{url}/remote_pts_b.shp")
    assert back.crs == "EPSG:3006"          # .prj sidecar fetched
    assert sorted(bytes(r.geometry).hex() for r in back.df.collect()) == \
        sorted(bytes(r.geometry).hex() for r in gt.df.collect())
    assert back.df.count() == 7             # .dbf attrs present
    assert "name" in back.df.columns


def test_remote_shapefile_read_missing_optional_sidecars(spark, http_root):
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile, write_shapefile,
    )

    root, url = http_root
    gt = _points(spark, n=4)
    write_shapefile(gt, str(root / "remote_pts_c"))
    for ext in (".shx", ".dbf", ".prj"):
        (root / ("remote_pts_c" + ext)).unlink()
    back = read_shapefile(spark, f"{url}/remote_pts_c.shp")
    # geometry still decodes via the sequential header scan
    assert sorted(bytes(r.geometry).hex() for r in back.df.collect()) == \
        sorted(bytes(r.geometry).hex() for r in gt.df.collect())
    assert back.df.columns == ["geometry"]


def test_remote_fgb_read_and_bbox_prune(spark, http_root):
    from geoparquet_io_spark.sources.fgb import read_fgb, write_fgb

    root, url = http_root
    gt = _points(spark, n=20)
    write_fgb(gt, str(root / "remote_pts_d.fgb"))
    back = read_fgb(spark, f"{url}/remote_pts_d.fgb")
    assert _key(back) == _key(gt)
    # indexed bbox prune works through the localized copy too
    pruned = read_fgb(spark, f"{url}/remote_pts_d.fgb",
                      bbox=(0.0, -3.0, 7.0, 0.0))
    ids = sorted(r.id for r in pruned.df.collect())
    assert ids == [i for i in range(20) if 0 <= i * 1.5 <= 7.0]


def test_remote_missing_file_raises(spark, http_root):
    from geoparquet_io_spark.sources.gpkg import read_gpkg

    _, url = http_root
    with pytest.raises(IOError):
        read_gpkg(spark, f"{url}/nope_not_here.gpkg")
