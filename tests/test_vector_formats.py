"""Pure-Python GeoPackage / Shapefile / FlatGeobuf IO
(sources/gpkg.py, sources/shapefile.py, sources/fgb.py,
functions/flatbuf.py).

Ground truth comes from the reference repo's GDAL-produced fixtures
(tests/data/buildings_test.*): the same 42 building polygons exist as
.shp and .gpkg written by real GDAL, so the two independent decoders
must agree with each other — and our writers must round-trip
bit-exactly."""

import math
import os

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geoparquet_io_spark.functions import wkb as W
from geoparquet_io_spark.geotable import GeoTable
from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

REF_DATA = "/root/reference/tests/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted")


def _mixed_table(spark, crs="EPSG:32633"):
    rows = [
        Row(geometry=bytearray(W.encode_point(1.5, -2.5)),
            name="a", n=7, x=1.25, flag=True),
        Row(geometry=bytearray(W.encode_point(3.0, 4.0)),
            name=None, n=None, x=None, flag=False),
        Row(geometry=bytearray(W.encode_point(-10.0, 0.5)),
            name="c", n=-3, x=2.5, flag=None),
    ]
    df = spark.createDataFrame(rows)
    return GeoTable(df, GeoMeta(primary_column="geometry", columns={
        "geometry": GeoColumnMeta(crs=crs, geometry_types=["Point"])}))


def _rows_key(df, gcol="geometry"):
    out = []
    for r in df.collect():
        g = r[gcol]
        out.append(tuple(
            [None if g is None else bytes(g).hex()]
            + [str(r[c]) for c in df.columns if c != gcol]))
    return sorted(out, key=str)


# ---------------------------------------------------------------------------
# GeoPackage
# ---------------------------------------------------------------------------

@needs_ref
def test_gpkg_reads_gdal_fixture(spark):
    from geoparquet_io_spark.sources.gpkg import list_layers, read_gpkg

    p = f"{REF_DATA}/buildings_test.gpkg"
    layers = list_layers(p)
    assert layers[0]["layer"] == "buildings_test"
    gt = read_gpkg(spark, p)
    rows = gt.df.collect()
    assert len(rows) == 42
    assert {W.geometry_type(bytes(r["geometry"])) for r in rows} == \
        {"POLYGON"}
    assert gt.geo.primary.geometry_types == ["Polygon"]
    assert gt.crs is None            # 4326 -> default lon/lat
    # coordinates agree with the layer's declared contents bounds
    envs = [W.envelope(bytes(r["geometry"])) for r in rows]
    assert min(e[0] for e in envs) == pytest.approx(6.123943)
    assert max(e[3] for e in envs) == pytest.approx(50.1377572)


@needs_ref
def test_gpkg_crs_detected(spark):
    from geoparquet_io_spark.sources.gpkg import read_gpkg

    gt = read_gpkg(spark, f"{REF_DATA}/buildings_test_6933.gpkg")
    assert gt.crs == "EPSG:6933"
    assert gt.df.count() == 42


@needs_ref
def test_gpkg_write_read_roundtrip_bitexact(spark, tmp_path):
    from geoparquet_io_spark.sources.gpkg import read_gpkg, write_gpkg

    gt = read_gpkg(spark, f"{REF_DATA}/buildings_test.gpkg")
    out = str(tmp_path / "rt.gpkg")
    write_gpkg(gt, out)
    back = read_gpkg(spark, out)
    assert _rows_key(back.df) == _rows_key(gt.df)


def test_gpkg_structure_and_attr_types(spark, tmp_path):
    """Written files carry the spec tables, application id, and typed
    attributes; blobs are GP-headed WKB with the right srs + envelope."""
    import sqlite3
    import struct

    from geoparquet_io_spark.sources.gpkg import (
        read_gpkg, strip_gp_header, write_gpkg)

    gt = _mixed_table(spark)
    out = str(tmp_path / "mixed.gpkg")
    write_gpkg(gt, out, layer="pts")
    con = sqlite3.connect(out)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    assert con.execute(
        "SELECT data_type, srs_id FROM gpkg_contents").fetchone() == \
        ("features", 32633)
    assert con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns"
    ).fetchone()[0] == "POINT"
    blob = con.execute("SELECT geometry FROM pts LIMIT 1").fetchone()[0]
    assert blob[:2] == b"GP"
    assert struct.unpack_from("<i", blob, 4)[0] == 32633
    assert strip_gp_header(blob)[:1] == b"\x01"      # LE WKB
    con.close()
    back = read_gpkg(spark, out)
    assert back.crs == "EPSG:32633"
    assert _rows_key(back.df.select(gt.df.columns)) == _rows_key(gt.df)


def test_gpkg_distributed_scan_partitions(spark, tmp_path):
    """The read is a rowid-range mapInPandas fan-out, not a driver
    collect: with tasks=4 the plan carries 4 input partitions."""
    from geoparquet_io_spark.sources.gpkg import read_gpkg, write_gpkg

    rows = [Row(geometry=bytearray(W.encode_point(float(i), float(-i))),
                v=i) for i in range(500)]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "many.gpkg")
    write_gpkg(gt, out)
    back = read_gpkg(spark, out, tasks=4)
    assert back.df.rdd.getNumPartitions() == 4
    assert back.df.count() == 500
    assert back.df.agg({"v": "sum"}).collect()[0][0] == sum(range(500))


# ---------------------------------------------------------------------------
# Shapefile
# ---------------------------------------------------------------------------

@needs_ref
def test_shapefile_reads_gdal_fixture_and_agrees_with_gpkg(spark):
    """Two independent decoders (our .shp parser vs our sqlite GPKG
    reader) over GDAL's two encodings of the SAME data must agree."""
    from geoparquet_io_spark.sources.gpkg import read_gpkg
    from geoparquet_io_spark.sources.shapefile import read_shapefile

    shp = read_shapefile(spark, f"{REF_DATA}/buildings_test.shp")
    gpk = read_gpkg(spark, f"{REF_DATA}/buildings_test.gpkg")
    def envs(df, idcol):
        return {str(r[idcol]): tuple(round(v, 9) for v in
                                     W.envelope(bytes(r["geometry"])))
                for r in df.collect()}
    assert envs(shp.df, "id") == envs(gpk.df, "id")
    assert shp.df.count() == 42


@needs_ref
def test_shapefile_write_read_roundtrip_bitexact(spark, tmp_path):
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile, write_shapefile)

    gt = read_shapefile(spark, f"{REF_DATA}/buildings_test.shp")
    out = str(tmp_path / "rt.shp")
    write_shapefile(gt, out)
    for ext in (".shp", ".shx", ".dbf", ".prj"):
        assert os.path.isfile(str(tmp_path / f"rt{ext}")), ext
    back = read_shapefile(spark, out)
    assert _rows_key(back.df) == _rows_key(gt.df)


def test_shapefile_attr_types_roundtrip(spark, tmp_path):
    from geoparquet_io_spark.sources.shapefile import (
        read_dbf_header, read_shapefile, write_shapefile)

    gt = _mixed_table(spark, crs=None)
    out = str(tmp_path / "mixed.shp")
    write_shapefile(gt, out)
    hdr = read_dbf_header(str(tmp_path / "mixed.dbf"))
    types = {f["name"]: f["type"] for f in hdr["fields"]}
    assert types == {"name": "C", "n": "N", "x": "N", "flag": "L"}
    back = read_shapefile(spark, out)
    got = {r["name"]: (r["n"], r["x"], r["flag"])
           for r in back.df.collect()}
    assert got["a"] == (7, 1.25, True)
    assert got[None] == (None, None, False)
    assert got["c"] == (-3, 2.5, None)


def test_shapefile_dbf_numeric_width_and_integer_dot(spark, tmp_path):
    """DBF numeric robustness: (1) int64 extremes round-trip (N20 field —
    N18 used to silently truncate digits); (2) overflow raises instead of
    corrupting; (3) an integer N field whose text contains '.' (some
    writers emit '3.0') parses as int so the Int64 cast never fails;
    (4) a too-wide float sheds fractional digits before failing."""
    from geoparquet_io_spark.sources.shapefile import (
        _format_dbf_value, _parse_dbf_value, read_shapefile,
        write_shapefile)

    big, small = 9223372036854775807, -9223372036854775808
    df = spark.createDataFrame(
        [Row(geometry=bytearray(W.encode_point(0.0, 0.0)), n=big),
         Row(geometry=bytearray(W.encode_point(1.0, 1.0)), n=small)])
    gt = GeoTable(df, GeoMeta(primary_column="geometry",
                              columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "wide.shp")
    write_shapefile(gt, out)
    vals = {r["n"] for r in read_shapefile(spark, out).df.collect()}
    assert vals == {big, small}

    with pytest.raises(ValueError, match="does not fit"):
        _format_dbf_value(10 ** 19, {"name": "n", "type": "N",
                                     "length": 18, "decimals": 0})
    # fractional shaving: 12345678.9 in N10.4 -> '12345678.9' fits at 1dp
    got = _format_dbf_value(12345678.9, {"name": "x", "type": "N",
                                         "length": 10, "decimals": 4})
    assert got == b"12345678.9"
    with pytest.raises(ValueError, match="does not fit"):
        _format_dbf_value(-1234567890.5, {"name": "x", "type": "N",
                                          "length": 10, "decimals": 4})

    fld = {"name": "n", "type": "N", "length": 10, "decimals": 0}
    assert _parse_dbf_value(b"       3.0", fld) == 3
    assert isinstance(_parse_dbf_value(b"       3.0", fld), int)
    assert _parse_dbf_value(b"      1e2 ", fld) == 100
    # genuinely fractional text in an integer field: loud, not rounded
    with pytest.raises(ValueError, match="fractional value"):
        _parse_dbf_value(b"       3.7", fld)
    fld_f = {"name": "x", "type": "F", "length": 10, "decimals": 0}
    assert _parse_dbf_value(b"       3.5", fld_f) == 3.5


def test_shapefile_polygon_holes_and_multipolygon(spark, tmp_path):
    """Ring orientation semantics: outer CW / hole CCW grouping survives
    a write->read round trip for polygon-with-hole and multipolygon."""
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile, write_shapefile)

    outer = np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.], [0., 0.]])
    hole = np.array([[4., 4.], [6., 4.], [6., 6.], [4., 6.], [4., 4.]])
    poly_hole = W.encode_polygon([outer, hole])
    mp = W.encode_multipolygon(
        [[outer], [np.array([[20., 20.], [24., 20.], [24., 24.],
                             [20., 20.]])]])
    df = spark.createDataFrame(
        [Row(geometry=bytearray(poly_hole), tag="hole"),
         Row(geometry=bytearray(mp), tag="multi")])
    gt = GeoTable(df, GeoMeta(primary_column="geometry",
                              columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "polys.shp")
    write_shapefile(gt, out)
    back = {r["tag"]: bytes(r["geometry"])
            for r in read_shapefile(spark, out).df.collect()}
    gh = W.parse(back["hole"])
    assert gh.type_name == "POLYGON" and len(gh.parts) == 2
    assert W.area(back["hole"]) == pytest.approx(100 - 4)
    gm = W.parse(back["multi"])
    assert gm.type_name == "MULTIPOLYGON" and len(gm.children) == 2
    assert W.area(back["multi"]) == pytest.approx(100 + 8)


def test_shapefile_without_shx_rebuilds_index(spark, tmp_path):
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile, write_shapefile)

    gt = _mixed_table(spark, crs=None)
    out = str(tmp_path / "noshx.shp")
    write_shapefile(gt, out)
    os.remove(str(tmp_path / "noshx.shx"))
    back = read_shapefile(spark, out)
    assert back.df.count() == 3


def test_prj_epsg_parse(tmp_path):
    from geoparquet_io_spark.sources.shapefile import read_prj_epsg

    p = str(tmp_path / "a.prj")
    with open(p, "w") as fh:
        fh.write('PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",'
                 'AUTHORITY["EPSG","4326"]],AUTHORITY["EPSG","32633"]]')
    assert read_prj_epsg(p) == "EPSG:32633"
    with open(p, "w") as fh:
        fh.write('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984"]]')
    assert read_prj_epsg(p) is None


# ---------------------------------------------------------------------------
# FlatGeobuf
# ---------------------------------------------------------------------------

@needs_ref
def test_fgb_roundtrip_of_gdal_polygons(spark, tmp_path):
    from geoparquet_io_spark.sources.fgb import read_fgb, write_fgb
    from geoparquet_io_spark.sources.shapefile import read_shapefile

    gt = read_shapefile(spark, f"{REF_DATA}/buildings_test.shp")
    out = str(tmp_path / "b.fgb")
    write_fgb(gt, out)
    back = read_fgb(spark, out)
    assert back.geo.primary.geometry_types == ["Polygon"]
    assert _rows_key(back.df.select(gt.df.columns)) == _rows_key(gt.df)


def test_fgb_mixed_geometries_and_nulls(spark, tmp_path):
    from geoparquet_io_spark.sources.fgb import read_fgb, write_fgb

    line = W.encode_linestring(np.array([[0., 0.], [1., 1.], [2., 0.]]))
    outer = np.array([[0., 0.], [4., 0.], [4., 4.], [0., 4.], [0., 0.]])
    hole = np.array([[1., 1.], [2., 1.], [2., 2.], [1., 1.]])
    rows = [
        Row(geometry=bytearray(W.encode_point(1.5, -2.5)), tag="pt"),
        Row(geometry=bytearray(line), tag="ln"),
        Row(geometry=bytearray(W.encode_polygon([outer, hole])), tag="pg"),
        Row(geometry=bytearray(W.encode_multipolygon(
            [[outer], [outer + 10.0]])), tag="mp"),
        Row(geometry=None, tag="null"),
    ]
    df = spark.createDataFrame(rows, "geometry binary, tag string")
    gt = GeoTable(df, GeoMeta(primary_column="geometry",
                              columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "mix.fgb")
    write_fgb(gt, out)
    back = read_fgb(spark, out)
    got = {r["tag"]: r["geometry"] for r in back.df.collect()}
    assert got["null"] is None
    for tag in ("pt", "ln", "pg", "mp"):
        exp = next(bytes(r["geometry"]) for r in rows if r.tag == tag)
        assert bytes(got[tag]) == exp, tag


def test_fgb_header_fields(spark, tmp_path):
    import struct

    from geoparquet_io_spark.sources.fgb import (
        MAGIC, _parse_header, read_fgb, write_fgb)

    gt = _mixed_table(spark)
    out = str(tmp_path / "hdr.fgb")
    write_fgb(gt, out, name="mylayer")
    with open(out, "rb") as fh:
        assert fh.read(8) == MAGIC
        hsize = struct.unpack("<I", fh.read(4))[0]
        hdr = _parse_header(fh.read(hsize))
    assert hdr["name"] == "mylayer"
    assert hdr["features_count"] == 3
    assert hdr["index_node_size"] == 16     # packed R-tree written by default
    assert hdr["geometry_type"] == 1                 # Point
    assert hdr["crs"] == "EPSG:32633"
    assert [c["name"] for c in hdr["columns"]] == ["name", "n", "x", "flag"]
    assert hdr["envelope"] == [-10.0, -2.5, 3.0, 4.0]
    back = read_fgb(spark, out)
    assert back.crs == "EPSG:32633"
    assert _rows_key(back.df.select(gt.df.columns)) == _rows_key(gt.df)


def test_fgb_rtree_size_formula():
    from geoparquet_io_spark.sources.fgb import packed_rtree_size

    assert packed_rtree_size(0, 16) == 0
    assert packed_rtree_size(10, 0) == 0
    # 1 leaf level under one root: 2 nodes
    assert packed_rtree_size(1, 16) == 2 * 40
    # 100 items, node 16: 100 + 7 + 1 = 108 nodes
    assert packed_rtree_size(100, 16) == 108 * 40


# ---------------------------------------------------------------------------
# FlatBuffers runtime
# ---------------------------------------------------------------------------

def test_flatbuf_build_read_scalars_strings_vectors():
    from geoparquet_io_spark.functions import flatbuf as FB

    b = FB.Builder()
    s = b.string("héllo")
    v = b.vector_scalars("d", 8, [1.5, -2.5, 3.25])
    child = b.table({0: ("scalar", "i", 4, 42)})
    vt = b.vector_offsets([child])
    root_off = b.table({
        0: ("offset", s),
        1: ("scalar", "q", 8, -7),
        2: ("offset", v),
        3: ("offset", vt),
        7: ("scalar", "B", 1, 9),        # sparse field id
    })
    buf = b.finish(root_off)
    t = FB.root(buf)
    assert t.string(0) == "héllo"
    assert t.scalar(1, "q") == -7
    assert t.vector_scalars(2, "d", 8) == [1.5, -2.5, 3.25]
    assert t.vector_tables(3)[0].scalar(0, "i") == 42
    assert t.scalar(7, "B") == 9
    assert t.scalar(5, "i", default=123) == 123      # absent -> default
    assert t.string(6) is None
    # 8-byte scalars land 8-aligned (spec requirement)
    soff = t._field_pos(1)
    assert soff % 8 == 0
    dvec = t._indirect(2)
    assert (dvec + 4) % 8 == 0


def test_flatbuf_empty_table_and_bytes_vector():
    from geoparquet_io_spark.functions import flatbuf as FB

    b = FB.Builder()
    empty = b.table({})
    bv = b.vector_bytes(b"\x01\x02\x03")
    root_off = b.table({0: ("offset", empty), 1: ("offset", bv)})
    buf = b.finish(root_off)
    t = FB.root(buf)
    assert t.table(0) is not None
    assert t.vector_bytes(1) == b"\x01\x02\x03"
    assert t.table(0).scalar(0, "i", default=5) == 5


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def test_read_write_gdal_dispatch_pure_python(spark, tmp_path):
    try:
        import pyogrio  # noqa: F401

        pytest.skip("pyogrio present: dispatch prefers GDAL")
    except ImportError:
        pass
    from geoparquet_io_spark.sources.gdal_formats import read_gdal, write_gdal

    gt = _mixed_table(spark, crs=None)
    for ext in (".gpkg", ".shp", ".fgb", ".geojson"):
        out = str(tmp_path / f"d{ext}")
        write_gdal(gt, out)
        back = read_gdal(spark, out)
        assert back.df.count() == 3, ext


# ---------------------------------------------------------------------------
# FlatGeobuf packed Hilbert R-tree index
# ---------------------------------------------------------------------------

def test_fgb_rtree_search_matches_brute_force():
    import struct

    from geoparquet_io_spark.sources.fgb import (
        build_packed_rtree, packed_rtree_size, search_packed_rtree)

    rng = np.random.RandomState(3)
    n, node_size = 257, 4                  # several tree levels
    lo = rng.uniform(-100, 100, size=(n, 2))
    boxes = np.hstack([lo, lo + rng.uniform(0.1, 5, size=(n, 2))])
    offsets = list(range(0, n * 50, 50))
    idx = build_packed_rtree(boxes, offsets, node_size)
    assert len(idx) == packed_rtree_size(n, node_size)
    # leaf nodes preserve (box, offset) in item order
    leaf_off = len(idx) - n * 40
    x0, y0, x1, y1, off = struct.unpack_from("<4dQ", idx, leaf_off)
    assert (x0, y0, x1, y1) == tuple(boxes[0]) and off == 0
    for rect in [(-50, -50, 50, 50), (0, 0, 1, 1), (200, 200, 300, 300),
                 (-100, -100, 105, 105)]:
        got = search_packed_rtree(idx, n, node_size, rect)
        exp = [i for i in range(n)
               if not (boxes[i][0] > rect[2] or boxes[i][2] < rect[0]
                       or boxes[i][1] > rect[3] or boxes[i][3] < rect[1])]
        assert got == exp, rect


def test_fgb_indexed_write_read_and_bbox_prune(spark, tmp_path):
    """Default writes carry the index: features are Hilbert-ordered,
    spans derive from leaf offsets, and bbox reads prune at the index
    before touching feature bytes."""
    import struct

    from geoparquet_io_spark.sources.fgb import (
        MAGIC, _parse_header, read_fgb, write_fgb)

    rows = [Row(geometry=bytearray(W.encode_point(float(i % 50),
                                                  float(i // 50))),
                pid=i) for i in range(300)]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "indexed.fgb")
    write_fgb(gt, out)
    with open(out, "rb") as fh:
        assert fh.read(8) == MAGIC
        hsize = struct.unpack("<I", fh.read(4))[0]
        hdr = _parse_header(fh.read(hsize))
    assert hdr["index_node_size"] == 16
    # full read: all rows, exact WKB
    back = read_fgb(spark, out)
    assert back.df.count() == 300
    got = {r["pid"]: bytes(r["geometry"]) for r in back.df.collect()}
    for r in rows:
        assert got[r.pid] == bytes(r.geometry)
    # bbox read prunes to the envelope-intersecting features only
    sub = read_fgb(spark, out, bbox=(10, 2, 20, 4)).df.collect()
    exp_ids = {r.pid for r in rows
               if 10 <= (r.pid % 50) <= 20 and 2 <= (r.pid // 50) <= 4}
    assert {r["pid"] for r in sub} == exp_ids and exp_ids
    # unindexed file refuses bbox (no silent full scan)
    out2 = str(tmp_path / "plain.fgb")
    write_fgb(gt, out2, index_node_size=0)
    assert read_fgb(spark, out2).df.count() == 300
    with pytest.raises(ValueError, match="indexed"):
        read_fgb(spark, out2, bbox=(0, 0, 1, 1))


def test_fgb_index_orders_features_by_hilbert(spark, tmp_path):
    import struct

    from geoparquet_io_spark.functions.hilbert import (
        scale_to_grid, xy_to_hilbert)
    from geoparquet_io_spark.sources.fgb import read_fgb, write_fgb

    rng = np.random.RandomState(5)
    pts = rng.uniform(-10, 10, size=(100, 2))
    rows = [Row(geometry=bytearray(W.encode_point(*pts[i])), pid=i)
            for i in range(100)]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "h.fgb")
    write_fgb(gt, out)
    back = read_fgb(spark, out, tasks=1).df.collect()
    # recompute hilbert d in FILE order -> must be nondecreasing
    xs = np.array([W.point_xy(bytes(r["geometry"]))[0] for r in back])
    ys = np.array([W.point_xy(bytes(r["geometry"]))[1] for r in back])
    ext = (xs.min(), ys.min(), xs.max(), ys.max())
    d = xy_to_hilbert(scale_to_grid(xs, ext[0], ext[2]),
                      scale_to_grid(ys, ext[1], ext[3]))
    # mapInPandas preserves per-task order; tasks=1 -> file order
    assert (np.diff(d.astype(np.int64)) >= 0).all()


# ---------------------------------------------------------------------------
# GeoJSONSeq
# ---------------------------------------------------------------------------

def test_geojsonl_roundtrip_and_distributed_read(spark, tmp_path):
    from geoparquet_io_spark.sources.geojson import (
        read_geojsonl, write_geojsonl)

    outer = np.array([[0., 0.], [4., 0.], [4., 4.], [0., 4.], [0., 0.]])
    rows = [
        Row(geometry=bytearray(W.encode_point(1.25, -2.5)), name="a", n=7),
        Row(geometry=bytearray(W.encode_polygon([outer])), name="b", n=-1),
        Row(geometry=None, name="c", n=None),
    ]
    gt = GeoTable(spark.createDataFrame(rows, "geometry binary, "
                                        "name string, n long"),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    p = str(tmp_path / "f.geojsonl")
    write_geojsonl(gt, p, precision=None)
    lines = [ln for ln in open(p).read().splitlines() if ln]
    assert len(lines) == 3
    import json as _json

    assert all(_json.loads(ln)["type"] == "Feature" for ln in lines)
    back = read_geojsonl(spark, p)
    got = {r["name"]: (r["n"], None if r["geometry"] is None
                       else bytes(r["geometry"]).hex())
           for r in back.df.collect()}
    assert got["a"] == (7, bytes(rows[0].geometry).hex())
    assert got["b"] == (-1, bytes(rows[1].geometry).hex())
    assert got["c"] == (None, None)
    # multi-part output is read back whole (splittable form)
    d = str(tmp_path / "parts")
    write_geojsonl(gt, d, single_file=False)
    assert read_geojsonl(spark, d).df.count() == 3


# ---------------------------------------------------------------------------
# Corruption robustness: truncated/mangled inputs fail loudly, never
# hang and never return silently-wrong data
# ---------------------------------------------------------------------------

def _pts_gt(spark, n=20):
    rows = [Row(geometry=bytearray(W.encode_point(float(i), float(-i))),
                v=i) for i in range(n)]
    return GeoTable(spark.createDataFrame(rows),
                    GeoMeta(primary_column="geometry",
                            columns={"geometry": GeoColumnMeta()}))


def test_fgb_truncation_fails_loudly(spark, tmp_path):
    from geoparquet_io_spark.sources.fgb import read_fgb, write_fgb

    src = str(tmp_path / "ok.fgb")
    write_fgb(_pts_gt(spark), src)
    raw = open(src, "rb").read()
    # bad magic
    bad = str(tmp_path / "bad.fgb")
    open(bad, "wb").write(b"XXXX" + raw[4:])
    with pytest.raises(ValueError, match="not a FlatGeobuf"):
        read_fgb(spark, bad)
    # truncated inside the header
    open(bad, "wb").write(raw[:14])
    with pytest.raises(Exception):
        read_fgb(spark, bad)
    # truncated mid-features: planning survives (spans from index), the
    # distributed decode of the missing range errors at action time
    open(bad, "wb").write(raw[:len(raw) - 7])
    try:
        got = read_fgb(spark, bad)
        with pytest.raises(Exception):
            got.df.collect()
    except Exception:
        pass                                     # planning-time error also fine


def test_gpkg_not_a_database_fails(spark, tmp_path):
    from geoparquet_io_spark.sources.gpkg import list_layers, read_gpkg

    bad = str(tmp_path / "bad.gpkg")
    open(bad, "wb").write(b"definitely not sqlite")
    with pytest.raises(Exception):
        list_layers(bad)
    # a valid sqlite db with no gpkg tables
    import sqlite3

    plain = str(tmp_path / "plain.gpkg")
    con = sqlite3.connect(plain)
    con.execute("CREATE TABLE t (a int)")
    con.commit()
    con.close()
    with pytest.raises(Exception):
        read_gpkg(spark, plain)


def test_shapefile_corruption_fails_loudly(spark, tmp_path):
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile, write_shapefile)

    src = str(tmp_path / "ok.shp")
    write_shapefile(_pts_gt(spark), src)
    # dbf/shp record count mismatch is detected at plan time
    raw_dbf = open(str(tmp_path / "ok.dbf"), "rb").read()
    mangled = bytearray(raw_dbf)
    mangled[4:8] = (99).to_bytes(4, "little")    # lie about record count
    open(str(tmp_path / "ok.dbf"), "wb").write(bytes(mangled))
    with pytest.raises(ValueError, match="records"):
        read_shapefile(spark, src)


def test_gp_blob_invalid_envelope_indicator():
    from geoparquet_io_spark.sources.gpkg import strip_gp_header

    blob = b"GP\x00" + bytes([0x0A]) + b"\x00" * 40   # indicator 5
    with pytest.raises(ValueError, match="envelope indicator"):
        strip_gp_header(blob)
    # r9: non-GP blobs raise (silently NULLing every row of a
    # plain-WKB layer made the data vanish with no error)
    with pytest.raises(ValueError, match="GP header"):
        strip_gp_header(b"\x01\x02")
    assert strip_gp_header(None) is None


def test_gpkg_multi_layer_append(spark, tmp_path):
    """append=True adds layers to one GeoPackage container; read_gpkg
    requires layer= when several exist and reads each independently."""
    from geoparquet_io_spark.sources.gpkg import (
        list_layers, read_gpkg, write_gpkg)

    a = _mixed_table(spark, crs=None)
    b = _pts_gt(spark, n=10)
    p = str(tmp_path / "multi.gpkg")
    write_gpkg(a, p, layer="first")
    write_gpkg(b, p, layer="second", append=True)
    names = sorted(l["layer"] for l in list_layers(p))
    assert names == ["first", "second"]
    with pytest.raises(ValueError, match="several layers"):
        read_gpkg(spark, p)
    assert read_gpkg(spark, p, layer="first").df.count() == 3
    assert read_gpkg(spark, p, layer="second").df.count() == 10
    with pytest.raises(ValueError, match="already exists"):
        write_gpkg(b, p, layer="first", append=True)


# ---------------------------------------------------------------------------
# FlatBuffers runtime property test
# ---------------------------------------------------------------------------

def test_flatbuf_property_roundtrip():
    """Randomized tables (scalars of every width, strings, double
    vectors, sparse field ids) round-trip through Builder -> root()."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from geoparquet_io_spark.functions import flatbuf as FB

    scalar = st.sampled_from([("b", 1), ("B", 1), ("h", 2), ("H", 2),
                              ("i", 4), ("I", 4), ("q", 8), ("d", 8)])

    @st.composite
    def field(draw):
        kind = draw(st.sampled_from(["scalar", "string", "dvec"]))
        if kind == "scalar":
            fmt, size = draw(scalar)
            if fmt == "d":
                v = draw(st.floats(allow_nan=False, allow_infinity=False,
                                   width=64))
            else:
                bits = size * 8 - (1 if fmt.islower() else 0)
                lo = -(1 << (size * 8 - 1)) if fmt.islower() else 0
                v = draw(st.integers(min_value=lo,
                                     max_value=(1 << bits) - 1))
            return ("scalar", fmt, size, v)
        if kind == "string":
            return ("string", draw(st.text(max_size=40)))
        return ("dvec", draw(st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            max_size=20)))

    @given(st.dictionaries(st.integers(min_value=0, max_value=20),
                           field(), max_size=8))
    @settings(max_examples=60, deadline=None)
    def check(fields):
        b = FB.Builder()
        built = {}
        for fid, spec in fields.items():
            if spec[0] == "scalar":
                built[fid] = spec
            elif spec[0] == "string":
                built[fid] = ("offset", b.string(spec[1]))
            else:
                built[fid] = ("offset", b.vector_scalars("d", 8, spec[1]))
        buf = b.finish(b.table(built))
        t = FB.root(buf)
        for fid, spec in fields.items():
            if spec[0] == "scalar":
                _, fmt, size, v = spec
                got = t.scalar(fid, fmt, default=None)
                if fmt == "d":
                    assert got == v or (got != got and v != v)
                else:
                    assert got == v
            elif spec[0] == "string":
                assert t.string(fid) == spec[1]
            else:
                assert t.vector_scalars(fid, "d", 8) == spec[1]

    check()


def test_prj_projected_wkt_with_embedded_gcs(tmp_path):
    """A projected WKT embeds a GEOGCS (often named GCS_WGS_1984); the
    LAST authority code — the projection's — must win (regression for
    an and/or precedence slip)."""
    from geoparquet_io_spark.sources.shapefile import read_prj_epsg

    p = str(tmp_path / "p.prj")
    with open(p, "w") as fh:
        fh.write('PROJCS["UTM33",GEOGCS["GCS_WGS_1984",'
                 'AUTHORITY["EPSG","4326"]],AUTHORITY["EPSG","32633"]]')
    assert read_prj_epsg(p) == "EPSG:32633"


# ---------------------------------------------------------------------------
# Format-parser review regressions (fgb flattened multis / Z files /
# collisions, gpkg fid edge cases, flatbuf sub-4-byte vectors)
# ---------------------------------------------------------------------------

def test_fgb_flattened_single_part_multipolygon_decodes():
    """Official writers flatten a 1-polygon MultiPolygon to bare
    xy+ends with NO parts vector — that layout must not decode to an
    empty multi."""
    from geoparquet_io_spark.functions import flatbuf as FB
    from geoparquet_io_spark.sources.fgb import (
        GEOM_MULTIPOLYGON,
        _geom_table_to_wkb,
    )

    b = FB.Builder()
    ring = [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 0.0]
    fields = {
        0: ("offset", b.vector_scalars("I", 4, [4])),   # ends
        1: ("offset", b.vector_scalars("d", 8, ring)),  # xy
    }
    t = b.table(fields)
    buf = FB.root(b.finish(t))
    wkb = _geom_table_to_wkb(buf, GEOM_MULTIPOLYGON)
    g = W.parse(wkb)
    assert g.gtype == W.MULTIPOLYGON
    assert len(g.children) == 1
    assert abs(W.area(wkb) - 8.0) < 1e-12


def test_fgb_rejects_z_files(tmp_path, spark):
    """A header declaring hasZ must error, not silently drop Z."""
    import struct as _s

    from geoparquet_io_spark.functions import flatbuf as FB
    from geoparquet_io_spark.sources.fgb import MAGIC, read_fgb

    b = FB.Builder()
    t = b.table({2: ("scalar", "B", 1, 1),      # geometry_type Point
                 3: ("scalar", "B", 1, 1),      # hasZ
                 8: ("scalar", "Q", 8, 0),      # features_count
                 9: ("scalar", "H", 2, 0)})     # no index
    hdr = b.finish(t)
    p = tmp_path / "z.fgb"
    p.write_bytes(MAGIC + _s.pack("<I", len(hdr)) + hdr)
    import pytest as _p
    with _p.raises(ValueError, match="Z/M"):
        read_fgb(spark, str(p))


def test_fgb_geometry_column_collision_raises(tmp_path, spark):
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.sources.fgb import read_fgb, write_fgb
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(geom=bytearray(W.encode_point(1.0, 2.0)), geometry="clash")])
    gt = GeoTable(df, GeoMeta(primary_column="geom",
                              columns={"geom": GeoColumnMeta()}))
    p = str(tmp_path / "clash.fgb")
    write_fgb(gt, p)
    import pytest as _p
    with _p.raises(ValueError, match="collides"):
        read_fgb(spark, p)                      # default geometry_column
    out = read_fgb(spark, p, geometry_column="geom2")
    assert out.df.select("geometry").first()[0] == "clash"


def test_flatbuf_sub4byte_vector_alignment():
    """ubyte/ushort vectors must keep data at t+4 from the length
    prefix — padding between them shifted every element."""
    from geoparquet_io_spark.functions import flatbuf as FB

    for fmt, size, vals in (("B", 1, [1, 2, 3]), ("h", 2, [7, -9, 11]),
                            ("B", 1, [5]), ("h", 2, [1, 2, 3, 4, 5])):
        b = FB.Builder()
        t = b.table({0: ("offset", b.vector_scalars(fmt, size, vals))})
        root = FB.root(b.finish(t))
        assert root.vector_scalars(0, fmt, size) == vals


def test_gpkg_fid_edge_cases(tmp_path, spark):
    """String fid stays a regular attribute; NULL integer fid
    autoincrements instead of crashing."""
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.sources.gpkg import read_gpkg, write_gpkg

    meta = GeoMeta(primary_column="geometry",
                   columns={"geometry": GeoColumnMeta()})
    # string fid: preserved as data
    df1 = spark.createDataFrame(
        [(bytearray(W.encode_point(1.0, 2.0)), "feature-1")],
        "geometry binary, fid string")
    p1 = str(tmp_path / "sfid.gpkg")
    write_gpkg(GeoTable(df1, meta), p1)
    back1 = read_gpkg(spark, p1).df.collect()
    assert [r["fid"] for r in back1] == ["feature-1"]
    # nullable integer fid: null row autoincrements
    df2 = spark.createDataFrame(
        [(bytearray(W.encode_point(0.0, 0.0)), 7),
         (bytearray(W.encode_point(1.0, 1.0)), None)],
        "geometry binary, fid long")
    p2 = str(tmp_path / "nfid.gpkg")
    write_gpkg(GeoTable(df2, meta), p2)
    fids = sorted(r["fid"] for r in read_gpkg(spark, p2).df.collect())
    assert 7 in fids and len(fids) == 2 and None not in fids


def test_gpkg_extended_blob_rejected():
    from geoparquet_io_spark.sources.gpkg import strip_gp_header

    blob = b"GP\x00" + bytes([0x03 | 0x20]) + b"\x00" * 12
    import pytest as _p
    with _p.raises(ValueError, match="Extended"):
        strip_gp_header(blob)


def test_shapefile_nested_polygon_hole_assignment():
    """Island-in-lake: the pond hole must attach to the ISLAND shell
    (smallest containing ring), not the outermost lake shell."""
    from geoparquet_io_spark.sources.shapefile import _rings_to_wkb

    def ring(pts, cw):
        arr = np.array(pts + [pts[0]], dtype="f8")
        return arr[::-1] if cw != (_area(arr) < 0) else arr

    def _area(a):
        x, y = a[:, 0], a[:, 1]
        return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    outer = ring([(0, 0), (10, 0), (10, 10), (0, 10)], cw=True)      # lake shore
    lake = ring([(1, 1), (9, 1), (9, 9), (1, 9)], cw=False)          # hole in A
    island = ring([(3, 3), (7, 3), (7, 7), (3, 7)], cw=True)         # shell B
    pond = ring([(4, 4), (6, 4), (6, 6), (4, 6)], cw=False)          # hole in B
    wkb = _rings_to_wkb([outer, lake, island, pond])
    g = W.parse(wkb)
    assert g.gtype == W.MULTIPOLYGON
    by_area = sorted(g.children, key=lambda p: abs(_area(p.parts[0])))
    assert len(by_area[0].parts) == 2        # island carries the pond hole
    assert len(by_area[1].parts) == 2        # lake shell carries the lake hole
    # total area: (100-64) + (16-4) = 48
    assert abs(W.area(wkb) - 48.0) < 1e-9


def test_shapefile_hole_touching_shell_vertex():
    """A hole sharing its first vertex with the shell must stay a hole
    (boundary-inclusive containment), not become a solid polygon."""
    from geoparquet_io_spark.sources.shapefile import _rings_to_wkb

    shell = np.array([(0, 0), (0, 8), (8, 8), (8, 0), (0, 0)], dtype="f8")  # CW
    hole = np.array([(0, 0), (2, 1), (1, 2), (0, 0)], dtype="f8")           # CCW
    wkb = _rings_to_wkb([shell, hole])
    g = W.parse(wkb)
    assert g.gtype == W.POLYGON and len(g.parts) == 2
    assert abs(W.area(wkb) - (64.0 - 1.5)) < 1e-9


def test_shapefile_dbf_name_collisions_and_full_width(tmp_path, spark):
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile,
        write_shapefile,
    )
    from pyspark.sql import Row

    long_text = "x" * 40
    rows = [Row(geometry=bytearray(W.encode_point(float(i), 0.0)),
                population_2020=i * 10, population_2021=i * 10 + 1,
                name="short" if i < 2 else long_text) for i in range(3)]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    p = str(tmp_path / "dup.shp")
    write_shapefile(gt, p)
    back = read_shapefile(spark, p).df
    # truncated names deduplicated: BOTH columns survive
    assert len(back.columns) == 4
    got = back.orderBy(back.columns[1]).collect()
    cols = sorted(c for c in back.columns if c.startswith("populati"))
    assert len(cols) == 2
    vals = {tuple(sorted((r[cols[0]], r[cols[1]]))) for r in got}
    assert (0, 1) in vals
    # string sized from ALL rows: the 40-char value survives intact
    assert any(r["name"] == long_text for r in got)


def test_shapefile_wide_n_field_reads_as_decimal(tmp_path, spark):
    """An N20.0 field holding values beyond int64 must read without
    overflow (decimal), while small-int columns stay long-typed."""
    import struct as _s

    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile,
        write_shapefile,
    )
    from pyspark.sql import Row

    rows = [Row(geometry=bytearray(W.encode_point(1.0, 2.0)), n=7)]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    p = str(tmp_path / "wide.shp")
    write_shapefile(gt, p)
    assert dict(read_shapefile(spark, p).df.dtypes)["n"] == "bigint"
    # hand-patch the DBF to N20 with a >int64 value
    dbf = p[:-4] + ".dbf"
    raw = bytearray(open(dbf, "rb").read())
    # field descriptor: bytes 32..64; length byte at offset 32+16
    raw[32 + 16] = 20
    hs = _s.unpack_from("<H", raw, 8)[0]
    rs_old = _s.unpack_from("<H", raw, 10)[0]
    _s.pack_into("<H", raw, 10, rs_old + 2)
    body = raw[:hs + 1] + b"9999999999999999999 ".rjust(21) + raw[hs + 1 + rs_old:]
    open(dbf, "wb").write(bytes(raw[:hs]) + bytes(body[hs:]))
    out = read_shapefile(spark, p).df
    assert dict(out.dtypes)["n"].startswith("decimal")
    assert int(out.first()["n"]) == 9999999999999999999


def test_rasterize_points_drops_out_of_extent():
    import pandas as pd

    from geoparquet_io_spark.functions.tiff import decode_tiff
    from geoparquet_io_spark.operators.raster import rasterize_points

    pdf = pd.DataFrame({
        "x": [0.5, 1.5, -5.0, 99.0],       # last two out of extent
        "y": [1.5, 0.5, 1.5, -99.0],
        "value": [10.0, 20.0, 777.0, 888.0]})
    buf = rasterize_points(pdf, 2, 2, origin=(0.0, 2.0), scale=(1.0, 1.0),
                           agg="sum")
    arr = decode_tiff(buf)
    assert arr[0, 0] == 10.0 and arr[1, 1] == 20.0
    assert arr.sum() == 30.0               # foreign points NOT in border cells


def test_geotiff_band_arg_validated(spark):
    import pytest as _p

    from geoparquet_io_spark.functions.tiff import build_geotiff
    from geoparquet_io_spark.operators.raster import geotiff_to_points

    img = np.arange(16, dtype="u1").reshape(4, 4)
    buf = build_geotiff(img, origin=(0.0, 4.0), scale=(1.0, 1.0))
    df = spark.createDataFrame([(1, bytearray(buf))], "rid long, data binary")
    with _p.raises(Exception, match="1 band"):
        geotiff_to_points(df, band=2).collect()
    assert geotiff_to_points(df, band=0).count() == 16


def test_sample_raster_empty_rasters_table(spark):
    from geoparquet_io_spark.operators.raster import sample_raster_at_points

    pts = spark.createDataFrame([(0.5, 0.5)], "x double, y double")
    empty = spark.createDataFrame([], "rid string, data binary")
    out = sample_raster_at_points(pts, empty, raster_id_column="rid").collect()
    assert len(out) == 1 and out[0]["value"] is None or (
        out[0]["value"] != out[0]["value"])  # NULL or NaN


# --- r9 review-fix regressions ------------------------------------------------

def test_gpkg_bool_with_nulls_distributed_read(spark, tmp_path):
    """BOOLEAN columns come back from sqlite as 0/1 ints plus None; the
    distributed mapInPandas read previously had no pandas cast for them
    and the Arrow conversion died on the int/bool mix (r9 review)."""
    from geoparquet_io_spark.sources.gpkg import read_gpkg, write_gpkg

    rows = [Row(geometry=bytearray(W.encode_point(float(i), 0.0)),
                flag=(None if i % 3 == 0 else i % 2 == 0))
            for i in range(300)]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "bools.gpkg")
    write_gpkg(gt, out)
    back = read_gpkg(spark, out, tasks=4)
    got = back.df.groupBy("flag").count().collect()
    by = {r["flag"]: r["count"] for r in got}
    assert by[None] == 100 and by[True] == 100 and by[False] == 100


def test_gpkg_empty_point_writes_empty_flag_and_clean_bounds(spark, tmp_path):
    """POINT EMPTY (NaN,NaN WKB) must carry the spec empty flag instead
    of a NaN envelope, and must not poison gpkg_contents bounds."""
    import math
    import sqlite3
    import struct as _s

    from geoparquet_io_spark.sources.gpkg import write_gpkg

    nan_pt = _s.pack("<BIdd", 1, 1, math.nan, math.nan)
    rows = [Row(geometry=bytearray(nan_pt), v=1),
            Row(geometry=bytearray(W.encode_point(2.0, 3.0)), v=2)]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "empty.gpkg")
    write_gpkg(gt, out)
    con = sqlite3.connect(out)
    try:
        (layer,) = [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents")]
        bounds = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents").fetchone()
        blobs = [r[0] for r in con.execute(
            f'SELECT "geometry" FROM "{layer}" ORDER BY "v"')]
    finally:
        con.close()
    assert bounds == (2.0, 3.0, 2.0, 3.0)        # NaN never entered min/max
    assert blobs[0][3] & 0x10                    # empty flag set
    assert ((blobs[0][3] >> 1) & 0x07) == 0      # no envelope doubles


def test_shapefile_dbf_field_named_geometry_is_renamed(spark, tmp_path):
    """A DBF attribute legally named like the geometry column used to
    overwrite the WKB column in the scan dict and fail every task."""
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile, write_shapefile)

    rows = [Row(geometry=bytearray(W.encode_point(float(i), 1.0)), g2=i)
            for i in range(5)]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "clash.shp")
    write_shapefile(gt, out)
    dbf = out[:-4] + ".dbf"
    with open(dbf, "r+b") as fh:     # rename field 'g2' -> 'geometry'
        fh.seek(32)
        fh.write(b"geometry\x00\x00\x00")
    back = read_shapefile(spark, out)
    assert set(back.df.columns) == {"geometry", "geometry_1"}
    assert back.df.filter(F.col("geometry").isNotNull()).count() == 5
    assert sorted(r["geometry_1"] for r in back.df.collect()) == list(range(5))


def test_shapefile_non_latin1_text_raises(spark, tmp_path):
    from geoparquet_io_spark.sources.shapefile import write_shapefile

    rows = [Row(geometry=bytearray(W.encode_point(1.0, 1.0)), name="東京")]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    with pytest.raises(ValueError, match="latin-1"):
        write_shapefile(gt, str(tmp_path / "cjk.shp"))


def test_geojson_multipoint_with_empty_member_is_valid_json(spark):
    import json as _json
    import struct as _s

    from geoparquet_io_spark.sources.geojson import st_asgeojson

    nan_pt = _s.pack("<BIdd", 1, 1, float("nan"), float("nan"))
    ok_pt = W.encode_point(1.0, 2.0)
    mp = (_s.pack("<BII", 1, 4, 2) + nan_pt + ok_pt)
    df = spark.createDataFrame([(bytearray(mp),)], "geometry binary")
    s = df.select(st_asgeojson()(F.col("geometry")).alias("j")) \
        .collect()[0]["j"]
    d = _json.loads(s)                  # strict: NaN token would fail
    assert d == {"type": "MultiPoint", "coordinates": [[1.0, 2.0]]}


def test_write_csv_single_file_replaces_directory(spark, tmp_path):
    from geoparquet_io_spark.sources.csv_geo import write_csv

    gt = _mixed_table(spark)
    out = str(tmp_path / "out.csv")
    write_csv(gt, out, single_file=False)
    assert os.path.isdir(out)
    write_csv(gt, out, single_file=True)
    assert os.path.isfile(out)          # not a part file inside the dir


def test_fgb_empty_geometry_does_not_poison_header_envelope(spark, tmp_path):
    """An empty geometry's NaN envelope used to seed min()/max() and
    stay NaN forever — garbage header extent and a meaningless Hilbert
    sort grid (r9 review, verified by execution)."""
    import struct as _s

    from geoparquet_io_spark.sources.fgb import read_fgb, write_fgb

    empty_ls = _s.pack("<BII", 1, 2, 0)       # LINESTRING EMPTY
    rows = [Row(geometry=bytearray(empty_ls), v=0),
            Row(geometry=bytearray(W.encode_point(2.0, 3.0)), v=1),
            Row(geometry=bytearray(W.encode_point(5.0, 7.0)), v=2)]
    gt = GeoTable(spark.createDataFrame(rows),
                  GeoMeta(primary_column="geometry",
                          columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "empty.fgb")
    write_fgb(gt, out)
    from geoparquet_io_spark.sources.fgb import _parse_header
    with open(out, "rb") as fh:
        fh.read(8)
        hsize = _s.unpack("<I", fh.read(4))[0]
        hdr = _parse_header(fh.read(hsize))
    env = hdr.get("envelope")
    assert env and all(v == v for v in env), env
    assert env == [2.0, 3.0, 5.0, 7.0]
    assert read_fgb(spark, out).df.count() == 3


def test_fgb_corrupt_column_index_is_value_error():
    import pytest

    from geoparquet_io_spark.sources.fgb import decode_properties

    import struct as _s
    cols = [{"name": "a", "type": 4}]         # one int column
    blob = _s.pack("<H", 7) + b"\x00" * 8     # column index 7 of 1
    with pytest.raises(ValueError, match="column index"):
        decode_properties(blob, cols)


def test_fgb_fast_point_write_bitexact_vs_generic(spark, tmp_path,
                                                 monkeypatch):
    """The vectorized template-patch point writer (r12) must produce a
    file BYTE-IDENTICAL to the per-feature builder across every
    null-mask / coordinate edge case: null geometries, NaN coords,
    null properties, all fixed-width property types."""
    import random

    from geoparquet_io_spark.sources import fgb

    random.seed(42)
    rows = []
    for i in range(300):
        if i % 31 == 0:
            g = None
        elif i == 50:
            g = bytearray(W.encode_point(float("nan"), 1.0))
        elif i == 51:
            g = bytearray(W.encode_point(1.0, float("nan")))
        else:
            g = bytearray(W.encode_point(random.uniform(-180, 180),
                                         random.uniform(-90, 90)))
        rows.append(Row(
            geometry=g,
            a=None if i % 11 == 0 else random.randint(-2**62, 2**62),
            b=None if i % 13 == 0 else random.uniform(-1e300, 1e300),
            c=None if i % 7 == 0 else bool(i % 2),
            d=None if i % 17 == 0 else random.randint(-2**31, 2**31 - 1),
            e=None if i % 19 == 0 else random.uniform(-1e38, 1e38),
            f=None if i % 23 == 0 else random.randint(-2**15, 2**15 - 1)))
    df = spark.createDataFrame(
        rows, "geometry binary, a long, b double, c boolean, d int, "
              "e float, f short")
    gt = GeoTable(df, GeoMeta(primary_column="geometry",
                              columns={"geometry": GeoColumnMeta()}))

    p_fast = str(tmp_path / "t1" )
    p_gen = str(tmp_path / "t2")
    os.makedirs(p_fast), os.makedirs(p_gen)
    p_fast = os.path.join(p_fast, "pts.fgb")
    p_gen = os.path.join(p_gen, "pts.fgb")

    engaged = {"n": 0}
    orig = fgb._fast_point_features

    def counting(*a, **k):
        out = orig(*a, **k)
        if out is not None:
            engaged["n"] += 1
        return out

    monkeypatch.setattr(fgb, "_fast_point_features", counting)
    fgb.write_fgb(gt, p_fast)
    assert engaged["n"] == 1, "fast path did not engage"
    monkeypatch.setattr(fgb, "_fast_point_features",
                        lambda *a, **k: None)
    fgb.write_fgb(gt, p_gen)
    with open(p_fast, "rb") as f1, open(p_gen, "rb") as f2:
        assert f1.read() == f2.read()


def test_fgb_fast_point_write_fallbacks():
    """Applicability guards: anything the numpy patcher cannot
    reproduce with struct.pack semantics must return None (generic
    path, including its error behavior)."""
    from geoparquet_io_spark.sources import fgb

    cols = [{"name": "a", "type": fgb.COL_LONG}]
    pt = {"geometry": W.encode_point(1.0, 2.0), "a": 1}
    rows = [dict(pt) for _ in range(40)]

    def run(rows, cols=cols, declared=fgb.GEOM_POINT):
        return fgb._fast_point_features(rows, "geometry", cols, declared)

    assert run(rows) is not None
    # declared type not POINT
    assert run(rows, declared=fgb.GEOM_UNKNOWN) is None
    # var-len property type
    assert run(rows, cols=[{"name": "a", "type": fgb.COL_STRING}]) is None
    # float value in an int column (struct.pack would raise)
    bad = [dict(pt) for _ in range(40)]
    bad[7]["a"] = 1.5
    assert run(bad) is None
    # out-of-range int (struct.error in the generic path)
    bad = [dict(pt) for _ in range(40)]
    bad[3]["a"] = 1 << 63
    assert run(bad) is None
    # non-LE / non-point WKB
    bad = [dict(pt) for _ in range(40)]
    bad[5]["geometry"] = b"\x00" + bytes(W.encode_point(1, 2))[1:]
    assert run(bad) is None


def test_fgb_fast_point_decode_matches_scalar(spark, tmp_path,
                                              monkeypatch):
    """The vectorized template-verify reader (r12) must produce rows
    identical to the scalar decoder — values AND python types — and
    individual deviant features (per-feature geometry type overrides)
    must fall back per feature, not poison the group."""
    import random

    from geoparquet_io_spark.sources import fgb

    random.seed(9)
    rows = []
    for i in range(400):
        g = None if i % 41 == 0 else bytearray(
            W.encode_point(random.uniform(-180, 180),
                           random.uniform(-90, 90)))
        rows.append(Row(
            geometry=g,
            a=None if i % 11 == 0 else random.randint(-2**62, 2**62),
            b=None if i % 13 == 0 else random.uniform(-1e300, 1e300),
            c=None if i % 7 == 0 else bool(i % 2)))
    df = spark.createDataFrame(
        rows, "geometry binary, a long, b double, c boolean")
    gt = GeoTable(df, GeoMeta(primary_column="geometry",
                              columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "pts.fgb")
    fgb.write_fgb(gt, out)

    back_fast = fgb.read_fgb(spark, out).df.collect()
    monkeypatch.setattr(fgb, "_fast_point_decode", lambda *a, **k: None)
    back_scalar = fgb.read_fgb(spark, out).df.collect()
    monkeypatch.undo()

    def nn(v):
        return (v is None, 0 if v is None else v)

    def key(rows):
        return sorted(
            (nn(None if r["geometry"] is None else bytes(r["geometry"])),
             nn(r["a"]), nn(r["b"]), nn(r["c"])) for r in rows)

    assert key(back_fast) == key(back_scalar)
    assert len(back_fast) == 400

    # direct kernel equivalence incl. a non-point override feature
    cols = [{"name": "a", "type": fgb.COL_LONG}]
    bufs = [fgb._serialize_feature(W.encode_point(float(i), -float(i)),
                                   {"a": i}, cols, fgb.GEOM_POINT)
            for i in range(100)]
    line = W.encode_linestring(np.array([[0., 0.], [1., 1.]]))
    bufs[40] = fgb._serialize_feature(line, {"a": 40}, cols,
                                      fgb.GEOM_POINT)
    geo, props = fgb._fast_point_decode(bufs, cols, fgb.GEOM_POINT)
    for i, b in enumerate(bufs):
        wkb_s, props_s = fgb._decode_feature(b, cols, fgb.GEOM_POINT)
        assert geo[i] == wkb_s, i
        assert props["a"][i] == props_s.get("a"), i
        assert type(props["a"][i]) is type(props_s.get("a")), i
    assert geo[40] == line


def test_fgb_fast_decode_external_layout_fuzz(spark, tmp_path):
    """r13: adversarial externally-shaped feature buffers — permuted
    property entry order (valid FlatGeobuf, same length, different
    layout), trailing padding (new length group), and an alien FIRST
    feature of a length group — must all demote to the scalar decoder
    and decode to exactly the same values, at every group boundary."""
    import random
    import struct

    from geoparquet_io_spark.sources import fgb

    random.seed(13)
    rows = [Row(geometry=bytearray(W.encode_point(i * 1.5, -i * 0.25)),
                a=random.randint(-2**40, 2**40),
                b=random.uniform(-1e6, 1e6))
            for i in range(120)]
    df = spark.createDataFrame(rows, "geometry binary, a long, b double")
    gt = GeoTable(df, GeoMeta(primary_column="geometry",
                              columns={"geometry": GeoColumnMeta()}))
    out = str(tmp_path / "pts.fgb")
    fgb.write_fgb(gt, out)
    raw = open(out, "rb").read()
    hlen = struct.unpack_from("<I", raw, 8)[0]
    hdr = fgb._parse_header(raw[12:12 + hlen])
    isize = fgb.packed_rtree_size(hdr["features_count"],
                                  hdr["index_node_size"])
    feat_start = 12 + hlen + isize
    body, pos, feats = bytearray(raw[:feat_start]), feat_start, []
    while pos < len(raw):
        ln = struct.unpack_from("<I", raw, pos)[0]
        feats.append(raw[pos + 4:pos + 4 + ln])
        pos += 4 + ln
    assert len(feats) == 120

    def permute_props(buf: bytes) -> bytes:
        # swap the two (uint16 col idx + 8-byte value) entries: a VALID
        # properties encoding our writer never produces
        props = fgb.FB.root(buf).vector_bytes(1)
        assert props is not None and len(props) == 20
        start = buf.rindex(props)
        return buf[:start] + props[10:] + props[:10] + buf[start + 20:]

    def rebuild(path, fuzzed):
        # the packed R-tree's leaf nodes carry each feature's offset
        # (relative to the feature section, pointing at its size
        # prefix): re-stamp them so padded features keep valid spans
        new_body = bytearray(body)
        leaf_off = feat_start - isize \
            + (isize - hdr["features_count"] * 40)
        off = 0
        for i, f in enumerate(fuzzed):
            struct.pack_into("<Q", new_body, leaf_off + i * 40 + 32, off)
            off += 4 + len(f)
        with open(path, "wb") as fh:
            fh.write(new_body)
            for f in fuzzed:
                fh.write(struct.pack("<I", len(f)))
                fh.write(f)

    def key(rs):
        return sorted((bytes(r["geometry"]), r["a"], round(r["b"], 9))
                      for r in rs)

    base = key(fgb.read_fgb(spark, out).df.collect())

    # (a) alien FIRST feature + every 3rd alien + padded stragglers
    fz_a = [permute_props(f) if i % 3 == 0
            else (f + b"\x00" * 4 if i % 7 == 0 else f)
            for i, f in enumerate(feats)]
    # (b) our-layout first, aliens later in the same length group
    fz_b = [permute_props(f) if (i > 20 and i % 5 == 0) else f
            for i, f in enumerate(feats)]
    for tag, fz in (("first-alien", fz_a), ("late-alien", fz_b)):
        p = str(tmp_path / f"fuzz_{tag}.fgb")
        rebuild(p, fz)
        assert key(fgb.read_fgb(spark, p).df.collect()) == base, tag
        # kernel level: fast-decode of the mutated span == scalar
        cols = [{"name": "a", "type": fgb.COL_LONG},
                {"name": "b", "type": fgb.COL_DOUBLE}]
        got = fgb._fast_point_decode(list(fz), cols, fgb.GEOM_POINT)
        assert got is not None
        geo_col, prop_cols = got
        for i, f in enumerate(fz):
            wkb, props = fgb._decode_feature(f, cols, fgb.GEOM_POINT)
            assert geo_col[i] == wkb, (tag, i)
            assert prop_cols["a"][i] == props.get("a"), (tag, i)
            assert prop_cols["b"][i] == props.get("b"), (tag, i)
