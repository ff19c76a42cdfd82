"""Full-WKT CRS text: structure, parameter fidelity vs the projection
kernels, and sink round-trips through .prj / gpkg_spatial_ref_sys."""

import re

import pytest

from geoparquet_io_spark.functions import projections as P
from geoparquet_io_spark.functions.crs_wkt import (
    _PROJCS_INFO, wkt_for_epsg,
)


# -- minimal WKT1 parser (independent of the generator) ---------------------

def parse_wkt(text):
    """WKT1 -> (keyword, [children]) tree; scalars stay as str/float."""
    pos = 0

    def node():
        nonlocal pos
        m = re.match(r'\s*([A-Z_0-9]+)\[', text[pos:])
        assert m, f"expected node at ...{text[pos:pos + 40]!r}"
        kw = m.group(1)
        pos += m.end()
        children = []
        while True:
            c = text[pos]
            if c == "]":
                pos += 1
                return (kw, children)
            if c == ",":
                pos += 1
                continue
            if c == '"':
                m2 = re.match(r'"([^"]*)"', text[pos:])
                children.append(m2.group(1))
                pos += m2.end()
            elif re.match(r'[A-Z_0-9]+\[', text[pos:]):
                children.append(node())
            else:
                m2 = re.match(r'[-+0-9.eE]+', text[pos:])
                children.append(float(m2.group(0)))
                pos += m2.end()

    tree = node()
    assert text[pos:].strip() == "", "trailing garbage after WKT"
    return tree


def find(tree, kw):
    out = []
    if tree[0] == kw:
        out.append(tree)
    for c in tree[1]:
        if isinstance(c, tuple):
            out.extend(find(c, kw))
    return out


def params_of(tree):
    return {p[1][0]: p[1][1] for p in find(tree, "PARAMETER")}


ALL_CODES = ([4326, 3857, 32633, 32719, 25832, 26918, 28355, 27700,
              2056, 21781, 31370, 5514] + sorted(_PROJCS_INFO))


@pytest.mark.parametrize("code", ALL_CODES)
def test_wkt_parses_and_names_itself(code):
    wkt = wkt_for_epsg(code)
    assert wkt is not None
    tree = parse_wkt(wkt)
    assert tree[0] == ("GEOGCS" if code == 4326 else "PROJCS")
    # the LAST authority clause in string order is the CRS's own code
    # (the contract shapefile.read_prj_epsg depends on)
    last = re.findall(r'AUTHORITY\["EPSG","(\d+)"\]', wkt)[-1]
    assert int(last) == code
    # exactly one datum, one spheroid, sane ellipsoid numbers
    # (a sphere writes inverse flattening 0 by WKT convention)
    (sph,) = find(tree, "SPHEROID")
    name, a, inv_f = sph[1][:3]
    assert 6_300_000 < a < 6_400_000 and (290 < inv_f < 310 or inv_f == 0)


@pytest.mark.parametrize("code", sorted(_PROJCS_INFO))
def test_projection_parameters_match_kernel_table(code):
    fam, (a, f), params = P.EPSG_TABLE[code]
    tree = parse_wkt(wkt_for_epsg(code))
    got = params_of(tree)
    (sph,) = find(tree, "SPHEROID")
    assert sph[1][1] == a
    assert abs(sph[1][2] - (1.0 / f if f else 0.0)) < 1e-6
    expect = {
        "tm": {"latitude_of_origin": "lat0", "central_meridian": "lon0",
               "scale_factor": "k0", "false_easting": "fe",
               "false_northing": "fn"},
        "lcc": {"standard_parallel_1": "lat1", "standard_parallel_2": "lat2",
                "latitude_of_origin": "lat0", "central_meridian": "lon0",
                "false_easting": "fe", "false_northing": "fn"},
        "albers": {"standard_parallel_1": "lat1",
                   "standard_parallel_2": "lat2",
                   "latitude_of_center": "lat0",
                   "longitude_of_center": "lon0",
                   "false_easting": "fe", "false_northing": "fn"},
        "laea": {"latitude_of_center": "lat0",
                 "longitude_of_center": "lon0",
                 "false_easting": "fe", "false_northing": "fn"},
        "ps": {"latitude_of_origin": "lat_ts", "central_meridian": "lon0",
               "false_easting": "fe", "false_northing": "fn"},
        "cea": {"standard_parallel_1": "lat_ts", "central_meridian": "lon0",
                "false_easting": "fe", "false_northing": "fn"},
        "poly": {"latitude_of_origin": "lat0", "central_meridian": "lon0",
                 "false_easting": "fe", "false_northing": "fn"},
    }[fam]
    for wkt_key, table_key in expect.items():
        assert abs(got[wkt_key] - params[table_key]) < 1e-9, (code, wkt_key)


def test_utm_wkt_parameters():
    tree = parse_wkt(wkt_for_epsg(32719))  # WGS 84 / UTM 19S
    got = params_of(tree)
    assert got["central_meridian"] == -69.0
    assert got["scale_factor"] == 0.9996
    assert got["false_northing"] == 10000000.0
    assert "UTM zone 19S" in wkt_for_epsg(32719)
    assert find(tree, "GEOGCS")[0][1][0] == "WGS 84"


def test_datum_shift_codes_carry_towgs84():
    for code, first in ((27700, 446.448), (2056, 674.374),
                        (31370, -106.8686), (5514, 589.0)):
        tree = parse_wkt(wkt_for_epsg(code))
        (tow,) = find(tree, "TOWGS84")
        assert tow[1][0] == first, code
    # plain GRS80 frames carry an all-zero hint, WGS84 none
    (tow,) = find(parse_wkt(wkt_for_epsg(25832)), "TOWGS84")
    assert all(v == 0 for v in tow[1])
    assert find(parse_wkt(wkt_for_epsg(32633)), "TOWGS84") == []


def test_unsupported_code_returns_none():
    assert wkt_for_epsg(999999) is None
    assert wkt_for_epsg(2263) is None  # NY Long Island ftUS: not registered


# -- sink round-trips -------------------------------------------------------

def _point_table(spark, crs, scale=1000.0, n=5):
    from pyspark.sql import Row

    from geoparquet_io_spark.functions import wkb as W
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

    rows = [Row(id=i, geometry=bytearray(
        W.encode_point(500000.0 + i * scale, 5000000.0 + i * scale)))
        for i in range(n)]
    df = spark.createDataFrame(rows)
    return GeoTable(df, GeoMeta(primary_column="geometry", columns={
        "geometry": GeoColumnMeta(crs=crs, geometry_types=["Point"])}))


def test_shapefile_prj_full_wkt_roundtrip(spark, tmp_path):
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile, write_shapefile,
    )

    gt = _point_table(spark, "EPSG:3006")
    base = str(tmp_path / "pts")
    write_shapefile(gt, base)
    tree = parse_wkt(open(base + ".prj").read())
    assert tree[0] == "PROJCS" and tree[1][0] == "SWEREF99 TM"
    assert params_of(tree)["central_meridian"] == 15.0
    back = read_shapefile(spark, base + ".shp")
    assert back.crs == "EPSG:3006"
    assert back.df.count() == 5


def test_shapefile_prj_stub_for_unregistered_code(spark, tmp_path):
    from geoparquet_io_spark.sources.shapefile import (
        read_shapefile, write_shapefile,
    )

    gt = _point_table(spark, "EPSG:2263", n=3)
    base = str(tmp_path / "stub")
    write_shapefile(gt, base)
    assert 'AUTHORITY["EPSG","2263"]' in open(base + ".prj").read()
    assert read_shapefile(spark, base + ".shp").crs == "EPSG:2263"


def test_gpkg_srs_definition_full_wkt(spark, tmp_path):
    import sqlite3

    from geoparquet_io_spark.sources.gpkg import read_gpkg, write_gpkg

    gt = _point_table(spark, "EPSG:32633", n=4)
    path = str(tmp_path / "utm.gpkg")
    write_gpkg(gt, path, layer="pts")
    con = sqlite3.connect(path)
    (defn,) = con.execute(
        "SELECT definition FROM gpkg_spatial_ref_sys WHERE srs_id=32633"
    ).fetchone()
    con.close()
    tree = parse_wkt(defn)
    assert tree[0] == "PROJCS" and "UTM zone 33N" in tree[1][0]
    back = read_gpkg(spark, path)
    assert back.crs == "EPSG:32633"
