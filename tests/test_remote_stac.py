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


# --- STAC spec validation depth (corrupted-fixture per check class) --------

def _good_item(tmp_path):
    import json
    data = tmp_path / "d.parquet"
    data.write_bytes(b"PAR1")
    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "id": "it1",
        "geometry": {"type": "Polygon", "coordinates": [[
            [0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]]]},
        "bbox": [0.0, 0.0, 2.0, 2.0],
        "properties": {"datetime": "2026-01-02T03:04:05Z",
                       "proj:code": "EPSG:4326"},
        "links": [{"rel": "self", "href": "it1.json"}],
        "assets": {"data": {"href": str(data),
                            "type": "application/vnd.apache.parquet",
                            "roles": ["data"]}},
    }


def test_stac_validate_good_item(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    res = validate_stac_dict(_good_item(tmp_path), stac_dir=str(tmp_path))
    assert res["valid"] and not res["errors"] and not res["warnings"]
    assert res["info"]["asset_count"] == 1


def test_stac_bad_datetime(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    it = _good_item(tmp_path)
    it["properties"]["datetime"] = "02/01/2026 03:04"
    res = validate_stac_dict(it)
    assert not res["valid"]
    assert any("RFC 3339" in e for e in res["errors"])


def test_stac_geometry_outside_bbox(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    it = _good_item(tmp_path)
    it["bbox"] = [0.0, 0.0, 1.0, 1.0]     # geometry spans to 2.0
    res = validate_stac_dict(it)
    assert any("outside bbox" in e for e in res["errors"])


def test_stac_unclosed_ring(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    it = _good_item(tmp_path)
    it["geometry"]["coordinates"][0][-1] = [9.0, 9.0]
    res = validate_stac_dict(it)
    assert any("not closed" in e for e in res["errors"])


def test_stac_bbox_ordering(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    it = _good_item(tmp_path)
    it["bbox"] = [0.0, 2.0, 2.0, 0.0]          # inverted LATITUDE: error
    res = validate_stac_dict(it)
    assert any("ordering" in e for e in res["errors"])
    # west > east is a LEGAL antimeridian crossing (GeoJSON 5.2) — the
    # old check rejected valid Fiji-area items
    it2 = _good_item(tmp_path)
    it2["bbox"] = [177.0, -20.0, -178.0, -16.0]
    it2.pop("geometry", None)
    res2 = validate_stac_dict(it2)
    assert not any("ordering" in e for e in res2["errors"])


def test_stac_asset_href_and_roles(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    it = _good_item(tmp_path)
    it["assets"] = {"data": {"href": "missing.parquet"}}
    res = validate_stac_dict(it, stac_dir=str(tmp_path))
    assert any("does not resolve" in w for w in res["warnings"])
    assert any("media type" in w for w in res["warnings"])
    assert any("'data' role" in w for w in res["warnings"])
    assert res["valid"]  # warnings only


def test_stac_missing_self_link(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    it = _good_item(tmp_path)
    it["links"] = []
    res = validate_stac_dict(it, stac_dir=str(tmp_path))
    assert any("self" in w for w in res["warnings"])


def test_stac_malformed_proj_code(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    it = _good_item(tmp_path)
    it["properties"]["proj:code"] = "EPSG_4326"
    res = validate_stac_dict(it)
    assert any("proj code" in e for e in res["errors"])


def test_stac_collection_checks(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    coll = {
        "type": "Collection", "stac_version": "1.0.0", "id": "c",
        "description": "d", "license": "proprietary",
        "extent": {"spatial": {"bbox": [[0.0, 0.0, 1.0, 1.0]]},
                   "temporal": {"interval": [["2026-01-01T00:00:00Z",
                                              "2026-02-01T00:00:00Z"]]}},
        "links": [{"rel": "self", "href": "c.json"}],
    }
    assert validate_stac_dict(coll)["valid"]
    bad = dict(coll)
    bad["extent"] = {"spatial": {"bbox": [[0.0, 1.0, 1.0, 0.0]]},
                     "temporal": {"interval": [["2026-02-01T00:00:00Z",
                                                "2026-01-01T00:00:00Z"]]}}
    res = validate_stac_dict(bad)
    assert any("invalid collection bbox" in e for e in res["errors"])
    assert any("reversed" in e for e in res["errors"])


def test_stac_validate_file_paths(tmp_path):
    import json

    from geoparquet_io_spark.sources.stac import validate_stac_file

    p = tmp_path / "item.json"
    p.write_text(json.dumps(_good_item(tmp_path)))
    assert validate_stac_file(str(p))["valid"]
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert not validate_stac_file(str(bad))["valid"]
    assert not validate_stac_file(str(tmp_path / "nope.json"))["valid"]


def test_stac_generated_items_pass_validation(spark, tmp_path):
    """Our own generator output must pass our own validator with no
    errors (end-to-end coherence)."""
    from geoparquet_io_spark.queries import _events_points
    from geoparquet_io_spark.sources.stac import (
        generate_stac_item, validate_stac_dict,
    )
    from tests.conftest import SF_SMOKE

    gt = _events_points(spark, SF_SMOKE)
    out = str(tmp_path / "pts.parquet")
    gt.write(out)
    item = generate_stac_item(out)
    res = validate_stac_dict(item, stac_dir=str(tmp_path))
    assert not res["errors"]


def test_stac_item_3d_bbox_and_projjson(tmp_path, spark):
    """6-element bboxes publish planar corners (slicing [:4] grabbed
    zmin as xmax); PROJJSON footers publish proj:code/projjson, never
    null; the projection extension is declared when used."""
    from geoparquet_io_spark.sources.stac import (
        generate_stac_item,
        validate_stac_dict,
    )

    import geoparquet_io_spark as gps
    from geoparquet_io_spark.queries import _events_points

    p = str(tmp_path / "d.parquet")
    _events_points(spark, SF_SMOKE).head(5).write(p)
    # patch the footer to a 3D bbox + PROJJSON crs
    import json

    import pyarrow.parquet as pq

    from geoparquet_io_spark.sources.geoparquet import patch_footer_metadata

    geo = json.loads(pq.read_schema(p).metadata[b"geo"])
    col = geo["columns"]["geometry"]
    col["bbox"] = [10.0, 20.0, 0.0, 30.0, 40.0, 100.0]
    col["crs"] = {"type": "GeographicCRS",
                  "id": {"authority": "EPSG", "code": 4326}}
    patch_footer_metadata(p, {b"geo": json.dumps(geo).encode()})
    item = generate_stac_item(p)
    assert item["bbox"] == [10.0, 20.0, 30.0, 40.0]
    assert item["properties"]["proj:code"] == "EPSG:4326"
    assert any("projection" in e for e in item["stac_extensions"])
    assert validate_stac_dict(item)["valid"], validate_stac_dict(item)


def test_stac_validator_malformed_coords_reported(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    it = _good_item(tmp_path)
    it["geometry"] = {"type": "Polygon", "coordinates": [[0, 0], [1, 1]]}
    res = validate_stac_dict(it)
    assert any("malformed" in e for e in res["errors"])   # not a crash


def test_stac_collection_null_datetimes(tmp_path):
    from geoparquet_io_spark.sources.stac import generate_stac_collection

    items = [
        {"bbox": [0, 0, 1, 1],
         "properties": {"datetime": None,
                        "start_datetime": "2026-01-01T00:00:00Z",
                        "end_datetime": "2026-01-02T00:00:00Z"}},
        {"bbox": [1, 1, 2, 2],
         "properties": {"datetime": "2026-03-01T00:00:00Z"}},
    ]
    coll = generate_stac_collection(items, "c1")
    iv = coll["extent"]["temporal"]["interval"][0]
    assert iv == ["2026-01-01T00:00:00Z", "2026-03-01T00:00:00Z"]


# --- r9 review-fix regressions ------------------------------------------------

def test_stac_proj_code_accepts_non_numeric_authorities(tmp_path):
    """proj:code may be non-numeric (OGC:CRS84 — which generate_stac_item
    itself emits for the default CRS); the validator previously rejected
    its own output (r9 review, verified by execution)."""
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    base = {
        "type": "Feature", "stac_version": "1.0.0", "id": "x",
        "geometry": {"type": "Polygon", "coordinates": [
            [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
        "bbox": [0, 0, 1, 1],
        "properties": {"datetime": "2020-01-01T00:00:00Z",
                       "proj:code": "OGC:CRS84"},
        "assets": {}, "links": [{"rel": "self", "href": "x.json"}],
    }
    assert validate_stac_dict(dict(base))["errors"] == []
    bad = dict(base); bad["properties"] = dict(base["properties"],
                                               **{"proj:code": "nocolon"})
    assert any("proj code" in e for e in validate_stac_dict(bad)["errors"])


def test_stac_collection_flat_bbox_reported_not_crashed():
    from geoparquet_io_spark.sources.stac import validate_stac_dict

    col = {
        "type": "Collection", "stac_version": "1.0.0", "id": "c",
        "description": "d", "license": "proprietary",
        "extent": {"spatial": {"bbox": [0.0, 0.0, 1.0, 1.0]},
                   "temporal": {"interval": [[None, None]]}},
        "links": [],
    }
    res = validate_stac_dict(col)
    assert res["valid"] is False
    assert any("LIST of bboxes" in e for e in res["errors"])


def test_stac_collection_extent_sees_end_datetime():
    from geoparquet_io_spark.sources.stac import generate_stac_collection

    items = [{"bbox": [0, 0, 1, 1], "properties": {
        "datetime": None,
        "start_datetime": "2020-01-01T00:00:00Z",
        "end_datetime": "2025-12-31T00:00:00Z"}}]
    col = generate_stac_collection(items, "c")
    iv = col["extent"]["temporal"]["interval"][0]
    assert iv == ["2020-01-01T00:00:00Z", "2025-12-31T00:00:00Z"]


def test_stac_validate_file_on_directory_returns_invalid(tmp_path):
    from geoparquet_io_spark.sources.stac import validate_stac_file

    res = validate_stac_file(str(tmp_path))
    assert res["valid"] is False and res["errors"]


def test_inspect_summary_missing_path_is_file_not_found():
    import pytest

    from geoparquet_io_spark.operators.inspect_check import inspect_summary

    with pytest.raises(FileNotFoundError):
        inspect_summary("/nonexistent/nowhere")


def test_arcgis_layer_info_hits_layer_root(spark):
    """_arcgis_layer_info previously went through _arcgis_query (which
    appends /query) and fetched a FEATURES page instead of metadata —
    objectIdField and supportsPagination were never actually read."""
    import threading
    from http.server import HTTPServer

    from tests.test_arcgis_http import _Handler
    from geoparquet_io_spark.sources.remote import _arcgis_layer_info

    _Handler.require_token = False
    _Handler.requests_seen = []
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        info = _arcgis_layer_info(
            f"http://127.0.0.1:{srv.server_port}/FeatureServer/0")
    finally:
        srv.shutdown()
    assert info.get("objectIdField") == "oid"
    assert info["advancedQueryCapabilities"]["supportsPagination"] is True
