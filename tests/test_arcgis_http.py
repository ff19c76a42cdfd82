"""Real-HTTP ArcGIS extraction path (sources/remote.py:
_default_arcgis_fetcher / arcgis_count / extract_arcgis) against a
stdlib http.server FeatureService mock — paging, server-side
maxRecordCount + exceededTransferLimit, token auth, and error
surfacing, all without network (reference behavior:
core/arcgis.py:335-712)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

N_FEATURES = 37
MAX_RECORD_COUNT = 4          # server cap << client page windows
TOKEN = "sekrit"


def _feature(i):
    return {
        "attributes": {"oid": i, "name": f"f{i}", "score": i * 0.5},
        "geometry": {"x": float(i), "y": float(-i)},
    }


class _Handler(BaseHTTPRequestHandler):
    require_token = False
    requests_seen: list = []

    def log_message(self, *a):          # silence
        pass

    def do_GET(self):
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        type(self).requests_seen.append(q)
        if not u.path.endswith("/query"):
            if q.get("f") == "json":
                # layer-root metadata probe (pagination + oid field)
                return self._send({
                    "objectIdField": "oid",
                    "advancedQueryCapabilities": {
                        "supportsPagination": True}})
            return self._send({"error": {"code": 404, "message": "no"}})
        if self.require_token and q.get("token") != TOKEN:
            return self._send({"error": {
                "code": 499, "message": "Token Required"}})
        where = q.get("where", "1=1")
        if "bogus" in where:
            return self._send({"error": {
                "code": 400, "message": "Invalid where clause",
                "details": ["'bogus' is not a field"]}})
        ids = list(range(N_FEATURES))
        if where == "oid < 10":
            ids = [i for i in ids if i < 10]
        if q.get("returnCountOnly") == "true":
            return self._send({"count": len(ids)})
        off = int(q.get("resultOffset", 0))
        want = int(q.get("resultRecordCount", len(ids)))
        page = ids[off:off + min(want, MAX_RECORD_COUNT)]
        doc = {"features": [_feature(i) for i in page]}
        if off + len(page) < len(ids) and len(page) == MAX_RECORD_COUNT:
            doc["exceededTransferLimit"] = True
        self._send(doc)

    def _send(self, doc):
        body = json.dumps(doc).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def service():
    _Handler.require_token = False
    _Handler.requests_seen = []
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/FeatureServer/0"
    srv.shutdown()


def test_count_probe(service):
    from geoparquet_io_spark.sources.remote import arcgis_count

    assert arcgis_count(service) == N_FEATURES
    assert arcgis_count(service, where="oid < 10") == 10


def test_fetcher_fills_window_past_server_cap(service):
    """A client window larger than maxRecordCount is filled by the
    internal exceededTransferLimit walk — no gap, no duplicates."""
    from geoparquet_io_spark.sources.remote import _default_arcgis_fetcher

    fetch = _default_arcgis_fetcher(service, "1=1", "*")
    recs = fetch(0, 11)                 # server caps each response at 4
    assert [r["oid"] for r in recs] == list(range(11))
    recs2 = fetch(30, 20)               # runs off the end: partial window
    assert [r["oid"] for r in recs2] == list(range(30, N_FEATURES))
    assert all(r["__x"] == float(r["oid"]) for r in recs2)


def test_error_json_raises(service):
    from geoparquet_io_spark.sources.remote import _default_arcgis_fetcher

    fetch = _default_arcgis_fetcher(service, "bogus = 1", "*")
    with pytest.raises(RuntimeError, match="Invalid where clause"):
        fetch(0, 5)


def test_token_auth(service):
    from geoparquet_io_spark.sources.remote import (
        _default_arcgis_fetcher, arcgis_count)

    _Handler.require_token = True
    with pytest.raises(RuntimeError, match="Token Required"):
        arcgis_count(service)
    assert arcgis_count(service, token=TOKEN) == N_FEATURES
    fetch = _default_arcgis_fetcher(service, "1=1", "*", token=TOKEN)
    assert len(fetch(0, 6)) == 6


def test_extract_arcgis_end_to_end(spark, service):
    """Full flow over real HTTP: count probe + schema inference +
    distributed windows -> GeoTable with WKB points."""
    from geoparquet_io_spark.functions import wkb as W
    from geoparquet_io_spark.sources.remote import extract_arcgis

    gt = extract_arcgis(spark, service, page_size=10)
    rows = gt.df.collect()
    assert len(rows) == N_FEATURES
    assert sorted(r["oid"] for r in rows) == list(range(N_FEATURES))
    types = dict(gt.df.dtypes)
    assert types["oid"] == "bigint" and types["score"] == "double"
    assert types["name"] == "string"
    one = next(r for r in rows if r["oid"] == 5)
    x, y = W.point_xy(bytes(one["geometry"]))
    assert (x, y) == (5.0, -5.0)
    assert gt.geo.primary.geometry_types == ["Point"]


def test_extract_arcgis_where_pushdown(spark, service):
    from geoparquet_io_spark.sources.remote import extract_arcgis

    gt = extract_arcgis(spark, service, where="oid < 10", page_size=4)
    assert sorted(r["oid"] for r in gt.df.collect()) == list(range(10))
    # the where clause reached the server on every request
    assert all(q.get("where") == "oid < 10"
               for q in _Handler.requests_seen if "where" in q)


def test_bbox_param_reaches_server(service):
    from geoparquet_io_spark.sources.remote import arcgis_count

    arcgis_count(service, bbox=(-10, -10, 10, 10))
    q = _Handler.requests_seen[-1]
    geom = json.loads(q["geometry"])
    assert geom["xmin"] == -10 and geom["ymax"] == 10
    assert q["geometryType"] == "esriGeometryEnvelope"
