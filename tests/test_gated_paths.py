"""Fake-backed execution of the environment-gated paths: pyogrio GDAL
read/write, the BigQuery reader chain, the live-HTTP ArcGIS fetcher, and
the admin-catalog remote fetch.  The fakes stand in ONLY for the external
boundary (GDAL, the connector, the network); every line of our own code
runs for real."""

import io
import json
import sys
import types

import numpy as np
import pyarrow as pa
import pytest

from geoparquet_io_spark.functions.wkb import encode_point


def _wkb_points(n=5):
    xs = np.linspace(-10, 10, n)
    ys = np.linspace(40, 44, n)
    return [encode_point(float(x), float(y)) for x, y in zip(xs, ys)], xs, ys


# ---------------------------------------------------------------------------
# pyogrio fakes
# ---------------------------------------------------------------------------

class _FakeRaw:
    def __init__(self, store):
        self.store = store

    def read_arrow(self, path, **kwargs):
        meta = {"crs": "EPSG:4326"}
        wkb, xs, ys = _wkb_points()
        table = pa.table({
            "name": [f"p{i}" for i in range(len(xs))],
            "value": pa.array(np.arange(len(xs)), type=pa.int64()),
            "wkb_geometry": pa.array(list(wkb), type=pa.binary()),
        })
        self.store["read_path"] = path
        self.store["read_kwargs"] = kwargs
        return meta, table

    def write_arrow(self, table, path, **kwargs):
        self.store["write"] = {"table": table, "path": path, **kwargs}


@pytest.fixture()
def fake_pyogrio(monkeypatch):
    store = {}
    mod = types.ModuleType("pyogrio")
    mod.raw = _FakeRaw(store)
    monkeypatch.setitem(sys.modules, "pyogrio", mod)
    monkeypatch.setitem(sys.modules, "pyogrio.raw", mod.raw)
    return store


def test_read_gdal_executes_with_fake(spark, fake_pyogrio):
    from geoparquet_io_spark.sources.gdal_formats import read_gdal

    gt = read_gdal(spark, "/tmp/fake.gpkg")
    assert fake_pyogrio["read_path"] == "/tmp/fake.gpkg"
    rows = gt.df.collect()
    assert len(rows) == 5
    assert gt.geometry_column in gt.df.columns       # renamed from wkb_geometry
    assert all(r[gt.geometry_column] is not None for r in rows)
    assert {r["name"] for r in rows} == {f"p{i}" for i in range(5)}


def test_read_gdal_forwards_layer_to_pyogrio(spark, fake_pyogrio):
    """Multi-layer GeoPackage: layer= must reach pyogrio (regression —
    the fast path used to drop it and silently read the default layer)."""
    from geoparquet_io_spark.sources.gdal_formats import read_gdal

    read_gdal(spark, "/tmp/fake.gpkg", layer="roads")
    assert fake_pyogrio["read_kwargs"] == {"layer": "roads"}
    read_gdal(spark, "/tmp/fake.gpkg")
    assert fake_pyogrio["read_kwargs"] == {}      # default layer: no kwarg


def test_write_gdal_executes_with_fake(spark, fake_pyogrio):
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.sources.gdal_formats import write_gdal

    wkb, xs, ys = _wkb_points()
    df = spark.createDataFrame(
        [(f"p{i}", bytearray(w), {"nested": i}) for i, w in enumerate(wkb)],
        "name string, geometry binary, extra map<string,int>")
    geo = GeoMeta(columns={"geometry": GeoColumnMeta(
        geometry_types=["Point"], crs="EPSG:4326")})
    gt = GeoTable(df, geo)
    with pytest.warns(UserWarning, match="nested"):
        write_gdal(gt, "/tmp/out.fgb")
    w = fake_pyogrio["write"]
    assert w["driver"] == "FlatGeobuf"              # inferred from .fgb
    assert w["layer"] == "out"
    assert w["geometry_name"] == "geometry"
    assert w["geometry_type"] == "Point"
    assert w["crs"] == "EPSG:4326"
    assert "extra" not in w["table"].column_names   # nested dropped
    assert w["table"].num_rows == 5


def test_write_gdal_unknown_extension_errors(spark, fake_pyogrio):
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.sources.gdal_formats import write_gdal

    wkb, _, _ = _wkb_points(2)
    df = spark.createDataFrame([(bytearray(w),) for w in wkb],
                               "geometry binary")
    gt = GeoTable(df, GeoMeta(columns={"geometry": GeoColumnMeta()}))
    with pytest.raises(ValueError, match="driver"):
        write_gdal(gt, "/tmp/out.unknownext")


# ---------------------------------------------------------------------------
# BigQuery reader chain (fake reader at the spark.read boundary)
# ---------------------------------------------------------------------------

class _FakeBQReader:
    def __init__(self, spark, log):
        self._spark = spark
        self._log = log

    def format(self, fmt):
        self._log["format"] = fmt
        return self

    def option(self, k, v):
        self._log.setdefault("options", {})[k] = v
        return self

    def load(self):
        return self._spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, v double")


class _FakeSparkBQ:
    """Duck-typed stand-in: read_bigquery only touches .read."""

    def __init__(self, spark, log):
        self._spark = spark
        self._log = log

    @property
    def read(self):
        return _FakeBQReader(self._spark, self._log)


def test_read_bigquery_executes_with_fake(spark):
    from geoparquet_io_spark.sources.remote import read_bigquery

    log = {}
    df = read_bigquery(_FakeSparkBQ(spark, log), "proj-demo.ds.tbl",
                       where="v > 5", columns=["id", "v"])
    assert log["format"] == "bigquery"
    assert log["options"]["table"] == "proj-demo.ds.tbl"
    assert log["options"]["filter"] == "v > 5"      # pushdown reached reader
    assert df.columns == ["id", "v"]                # column projection applied
    assert df.count() == 2


def test_read_bigquery_gate_message(spark):
    from geoparquet_io_spark.sources.remote import read_bigquery

    with pytest.raises(NotImplementedError, match="connector"):
        read_bigquery(spark, "proj-demo.ds.tbl")


# ---------------------------------------------------------------------------
# live-HTTP ArcGIS fetcher (urlopen faked with canned feature pages)
# ---------------------------------------------------------------------------

def test_default_arcgis_fetcher_http_path(monkeypatch):
    """The REAL urllib fetcher runs (driver-side) against a canned HTTP
    response: URL parameter construction, pushdown encoding, and feature
    parsing all execute."""
    from geoparquet_io_spark.sources import remote

    captured = []

    def fake_urlopen(url):
        captured.append(url)
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(url).query)
        offset = int(q["resultOffset"][0])
        count = int(q["resultRecordCount"][0])
        feats = [
            {"attributes": {"fid": offset + i, "kind": "road"},
             "geometry": {"x": -100.0 + (offset + i) * 0.1, "y": 35.0}}
            for i in range(min(count, max(0, 7 - offset)))
        ]
        body = json.dumps({"features": feats}).encode()

        class _Resp(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return _Resp(body)

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    fetch = remote._default_arcgis_fetcher(
        "https://svc.example/FeatureServer/0", where="kind='road'",
        out_fields="fid,kind", bbox=(-110, 30, -90, 40), token="tok123")
    recs = fetch(0, 3)
    assert [r["fid"] for r in recs] == [0, 1, 2]
    assert recs[0]["__x"] == -100.0 and recs[0]["__y"] == 35.0
    recs2 = fetch(6, 3)          # tail page honors resultOffset
    assert [r["fid"] for r in recs2] == [6]
    u = captured[0]
    assert "where=kind" in u and "resultOffset=0" in u
    assert "geometryType=esriGeometryEnvelope" in u
    assert "token=tok123" in u and "outSR=4326" in u


def test_arcgis_to_geotable_distributed(spark):
    """Distributed pagination end-to-end with a (cloudpickled) fake page
    fetcher — the mapInPandas sharding, schema fill, and WKB point
    encoding run on executors for real."""
    from geoparquet_io_spark.sources import remote

    def fetch(offset, count):
        return [
            {"fid": offset + i, "kind": "road",
             "__x": -100.0 + (offset + i) * 0.1, "__y": 35.0}
            for i in range(min(count, max(0, 7 - offset)))
        ]

    import pyspark.sql.types as T

    gt = remote.arcgis_to_geotable(
        spark, total_count=7,
        attr_schema=T.StructType([
            T.StructField("fid", T.LongType()),
            T.StructField("kind", T.StringType()),
        ]),
        fetch_page=fetch, page_size=3)
    rows = gt.df.collect()
    assert len(rows) == 7
    assert {r["fid"] for r in rows} == set(range(7))
    assert all(r["geometry"] is not None for r in rows)


# ---------------------------------------------------------------------------
# admin-catalog remote fetch (urlretrieve faked; schema-checked fixture)
# ---------------------------------------------------------------------------

@pytest.fixture()
def admin_fixture(spark, tmp_path):
    """Local parquet mimicking the countries-dataset column layout."""
    wkb, xs, ys = _wkb_points(4)
    df = spark.createDataFrame(
        [("Europe", f"Country{i}", bytearray(w))
         for i, w in enumerate(wkb)],
        "continent string, country string, geometry binary")
    p = str(tmp_path / "ne_admin.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    return p


def test_admin_catalog_remote_fetch_executes(spark, monkeypatch, tmp_path,
                                             admin_fixture):
    import shutil

    from geoparquet_io_spark.sources import admin_catalog as ac

    calls = []

    def fake_urlretrieve(url, dest):
        calls.append(url)
        # the fixture is a directory-parquet; pack the part file like a
        # single-file download
        import glob

        part = glob.glob(admin_fixture + "/*.parquet")[0]
        shutil.copy(part, dest)

    monkeypatch.setattr("urllib.request.urlretrieve", fake_urlretrieve)
    cache = str(tmp_path / "cache")
    gt = ac.load_admin_dataset(
        spark, "countries",
        source="https://fake.example/admin/ne.parquet", cache_dir=cache)
    assert len(calls) == 1
    spec = ac.CATALOG["countries"]
    # the spec's level columns exist in the (fixture) schema
    for col in spec.level_columns.values():
        assert col in gt.df.columns
    assert gt.df.count() == 4
    # second load hits the cache — no new download
    ac.load_admin_dataset(spark, "countries",
                          source="https://fake.example/admin/ne.parquet",
                          cache_dir=cache)
    assert len(calls) == 1


def test_admin_catalog_validate_levels():
    from geoparquet_io_spark.sources import admin_catalog as ac

    spec = ac.CATALOG["countries"]
    spec.validate_levels(["continent"])
    with pytest.raises(ValueError):
        spec.validate_levels(["galaxy"])


def test_bigquery_table_id_validation():
    """Reference parity (core/extract_bigquery.py:33-135): id
    normalization and validation run BEFORE any connector is touched."""
    from geoparquet_io_spark.sources.remote import normalize_bigquery_table

    assert normalize_bigquery_table("my-proj.ds.tbl") == "my-proj.ds.tbl"
    assert normalize_bigquery_table("ds.tbl", project="my-proj") == \
        "my-proj.ds.tbl"
    with pytest.raises(ValueError, match="no project"):
        normalize_bigquery_table("ds.tbl")
    with pytest.raises(ValueError, match="invalid BigQuery project"):
        normalize_bigquery_table("UPPER.ds.tbl")
    with pytest.raises(ValueError, match="invalid BigQuery project"):
        normalize_bigquery_table("ab.ds.tbl")          # too short
    with pytest.raises(ValueError, match="invalid BigQuery table"):
        normalize_bigquery_table("my-proj.ds.bad-name")
    with pytest.raises(ValueError, match="dataset.table"):
        normalize_bigquery_table("a.b.c.d")


def test_read_bigquery_exclude_and_guards(spark):
    from geoparquet_io_spark.sources.remote import read_bigquery

    log = {}
    df = read_bigquery(_FakeSparkBQ(spark, log), "ds.tbl",
                       project="proj-demo", exclude_columns=["name"])
    assert df.columns == ["id", "v"]
    with pytest.raises(ValueError, match="exclusive"):
        read_bigquery(_FakeSparkBQ(spark, log), "proj-demo.ds.tbl",
                      columns=["id"], exclude_columns=["v"])


class _FakeBQGeoReader(_FakeBQReader):
    def load(self):
        return self._spark.createDataFrame(
            [(1, "POINT (10 20)"), (2, "POINT (-5 7.5)")],
            "id long, geog string")


class _FakeSparkBQGeo(_FakeSparkBQ):
    @property
    def read(self):
        return _FakeBQGeoReader(self._spark, self._log)


def test_read_bigquery_geography_to_geotable(spark):
    """GEOGRAPHY columns (WKT from the connector) convert to a WKB
    geometry column and the result is a GeoTable (reference:
    ST_AsWKB select, core/extract_bigquery.py:459-496)."""
    from geoparquet_io_spark.functions import wkb as W
    from geoparquet_io_spark.sources.remote import read_bigquery

    log = {}
    gt = read_bigquery(_FakeSparkBQGeo(spark, log), "proj-demo.ds.geo",
                       geography_column="geog")
    assert gt.geometry_column == "geometry"
    rows = {r["id"]: bytes(r["geometry"]) for r in gt.df.collect()}
    assert W.point_xy(rows[1]) == (10.0, 20.0)
    assert W.point_xy(rows[2]) == (-5.0, 7.5)
    assert "geog" not in gt.df.columns
