"""Pure-kernel unit + property tests (no Spark session needed)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geoparquet_io_spark.functions import hilbert, wkb, wkt


finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)


@given(finite, finite)
@settings(max_examples=200, deadline=None)
def test_point_roundtrip(x, y):
    b = wkb.encode_point(x, y)
    px, py = wkb.point_xy(b)
    assert (px, py) == (x, y)
    assert wkb.envelope(b) == (x, y, x, y)


@given(st.lists(st.tuples(finite, finite), min_size=2, max_size=20))
@settings(max_examples=100, deadline=None)
def test_linestring_envelope(coords):
    b = wkb.encode_linestring(np.array(coords))
    e = wkb.envelope(b)
    xs = [c[0] for c in coords]
    ys = [c[1] for c in coords]
    assert e == (min(xs), min(ys), max(xs), max(ys))


def test_wkt_roundtrip():
    cases = [
        "POINT (1.5 -2.5)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
        "MULTIPOINT ((1 2), (3 4))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
    ]
    for w in cases:
        assert wkt.to_wkt(wkt.from_wkt(w)) == w


def test_big_endian_parse():
    import struct

    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 3.0, 4.0)
    assert wkb.point_xy(be) == (3.0, 4.0)


def test_point_in_polygon_boundary_cases():
    tri = wkt.from_wkt("POLYGON ((-60 -60, 60 -60, 0 60, -60 -60))")
    inside = [(0, 0), (59, -59), (0, 59), (-60, -60), (0, 60), (0, -60)]
    outside = [(-100, 0), (-59, 59), (30, 30), (60, 60), (-50, -70)]
    for x, y in inside:
        assert wkb.intersects(wkb.encode_point(x, y), tri), (x, y)
    for x, y in outside:
        assert not wkb.intersects(wkb.encode_point(x, y), tri), (x, y)


def test_polygon_hole():
    holed = wkt.from_wkt(
        "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0), (40 40, 60 40, 60 60, 40 60, 40 40))"
    )
    assert not wkb.intersects(wkb.encode_point(50, 50), holed)
    assert wkb.intersects(wkb.encode_point(10, 10), holed)
    assert wkb.intersects(wkb.encode_point(40, 50), holed)  # hole boundary


def test_polygon_polygon():
    a = wkt.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    overlap = wkt.from_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    disjoint = wkt.from_wkt("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))")
    contained = wkt.from_wkt("POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))")
    assert wkb.intersects(a, overlap)
    assert not wkb.intersects(a, disjoint)
    assert wkb.intersects(a, contained)
    assert wkb.intersects(contained, a)


def test_distance():
    poly = wkt.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert wkb.distance(wkb.encode_point(20, 10), poly) == 10.0
    assert wkb.distance(wkb.encode_point(5, 5), poly) == 0.0
    assert wkb.distance(wkb.encode_point(13, 14), poly) == 5.0  # corner 3-4-5


def test_centroid_polygon():
    sq = wkt.from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert wkb.centroid(sq) == (1.0, 1.0)


def test_hilbert_locality_and_bijection():
    # order-4 grid: all 256 cells map to unique d in [0, 256)
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    d = hilbert.xy_to_hilbert(xs.ravel(), ys.ravel(), 4)
    assert sorted(d.tolist()) == list(range(256))
    # consecutive d are adjacent cells (the defining Hilbert property)
    order = np.argsort(d)
    gx, gy = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(gx)) + np.abs(np.diff(gy))
    assert (steps == 1).all()


def test_transform_roundtrip():
    from geoparquet_io_spark.functions import crs

    f = crs.get_transformer("EPSG:4326", "EPSG:3857")
    g = crs.get_transformer("EPSG:3857", "EPSG:4326")
    lon = np.array([-170.0, 0.0, 12.5, 179.9])
    lat = np.array([-80.0, 0.0, 45.0, 80.0])
    x, y = f(lon, lat)
    lon2, lat2 = g(x, y)
    assert np.allclose(lon, lon2) and np.allclose(lat, lat2)
    # EPSG:5070 joined the built-in registry (functions/projections.py);
    # a code outside the registry still raises with guidance
    x5, y5 = crs.get_transformer("EPSG:4326", "EPSG:5070")(
        np.array([-96.0]), np.array([23.0]))
    assert abs(x5[0]) < 1e-6 and abs(y5[0]) < 1e-6
    with pytest.raises(ValueError, match="projection registry"):
        crs.get_transformer("EPSG:4326", "EPSG:99999")


def test_geo_meta_roundtrip():
    from geoparquet_io_spark.meta import GeoMeta

    g = GeoMeta()
    g.primary.geometry_types = ["Point"]
    g.primary.crs = "EPSG:4326"
    g.set_covering("bbox")
    g2 = GeoMeta.from_json(g.to_json())
    assert g2.primary_column == "geometry"
    assert g2.primary.covering["bbox"]["xmin"] == ["bbox", "xmin"]
    assert g2.validate() == []
    g2.primary.encoding = "nope"
    assert g2.validate()


# --- property tests: predicate laws -----------------------------------------

coord = st.floats(min_value=-100, max_value=100, allow_nan=False)


def _rand_box(x, y, w, h):
    return wkb.encode_box_polygon(x, y, x + abs(w) + 0.001, y + abs(h) + 0.001)


@given(coord, coord, coord, coord, st.floats(0.1, 50), st.floats(0.1, 50),
       st.floats(0.1, 50), st.floats(0.1, 50))
@settings(max_examples=100, deadline=None)
def test_intersects_symmetric_boxes(x1, y1, x2, y2, w1, h1, w2, h2):
    a = _rand_box(x1, y1, w1, h1)
    b = _rand_box(x2, y2, w2, h2)
    assert wkb.intersects(a, b) == wkb.intersects(b, a)
    # boxes intersect iff envelopes overlap (axis-aligned rectangles)
    ea, eb = wkb.envelope(a), wkb.envelope(b)
    env_overlap = not (ea[0] > eb[2] or eb[0] > ea[2] or ea[1] > eb[3] or eb[1] > ea[3])
    assert wkb.intersects(a, b) == env_overlap


@given(coord, coord, coord, coord, st.floats(0.1, 50), st.floats(0.1, 50))
@settings(max_examples=100, deadline=None)
def test_point_box_membership(px, py, bx, by, w, h):
    box = _rand_box(bx, by, w, h)
    e = wkb.envelope(box)
    inside = e[0] <= px <= e[2] and e[1] <= py <= e[3]
    assert wkb.intersects(wkb.encode_point(px, py), box) == inside


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=8))
@settings(max_examples=100, deadline=None)
def test_wkt_roundtrip_polygons(pts):
    ring = pts + [pts[0]]
    try:
        poly = wkb.encode_polygon([np.array(ring)])
    except Exception:
        return
    w = wkt.to_wkt(poly)
    assert wkb.envelope(wkt.from_wkt(w)) == wkb.envelope(poly)


@given(st.integers(0, 65535), st.integers(0, 65535))
@settings(max_examples=200, deadline=None)
def test_hilbert_matches_scalar_reference(x, y):
    """Vectorized kernel vs straightforward per-point transcription of the
    public xy2d algorithm."""
    def xy2d(order, x, y):
        rx = ry = 0
        d = 0
        s = order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    got = hilbert.xy_to_hilbert(np.array([x]), np.array([y]), 16)[0]
    assert int(got) == xy2d(1 << 16, x, y)


# --------------------------------------------------------------------------
# area / length / simplify / npoints
# --------------------------------------------------------------------------

def test_area_polygon_with_hole_and_multipolygon():
    import numpy as np

    from geoparquet_io_spark.functions import wkb as W

    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype="f8")
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], dtype="f8")
    poly = W.encode_polygon([shell, hole])
    assert W.area(poly) == 100.0 - 4.0
    assert W.length(poly) == 40.0 + 8.0   # both rings count in perimeter
    assert W.npoints(poly) == 10

    tri = np.array([[0, 0], [4, 0], [0, 3], [0, 0]], dtype="f8")
    mp = W.encode_multipolygon([[shell], [tri]])
    assert W.area(mp) == 100.0 + 6.0
    assert W.npoints(mp) == 9

    pt = W.encode_point(1.0, 2.0)
    assert W.area(pt) == 0.0 and W.length(pt) == 0.0 and W.npoints(pt) == 1

    line = W.encode_linestring(np.array([[0, 0], [3, 4], [3, 10]], dtype="f8"))
    assert W.area(line) == 0.0
    assert W.length(line) == 5.0 + 6.0
    assert W.npoints(line) == 3


def test_simplify_drops_collinear_keeps_corners():
    import numpy as np

    from geoparquet_io_spark.functions import wkb as W

    # zigzag line with a tiny wiggle: tol below wiggle keeps it, above drops
    line = np.array([[0, 0], [1, 0.001], [2, 0], [3, 2], [4, 0]], dtype="f8")
    buf = W.encode_linestring(line)
    loose = W.parse(W.simplify(buf, 0.01)).parts[0]
    assert [tuple(p) for p in loose] == [(0, 0), (2, 0), (3, 2), (4, 0)] or \
           len(loose) == 4
    tight = W.parse(W.simplify(buf, 1e-6)).parts[0]
    assert len(tight) == 5   # wiggle preserved below tolerance

    # ring that would collapse below 4 points is left unsimplified
    sliver = np.array([[0, 0], [5, 1e-9], [10, 0], [0, 0]], dtype="f8")
    out = W.parse(W.simplify(W.encode_polygon([sliver]), 1.0)).parts[0]
    assert len(out) == 4

    import pytest as _p
    with _p.raises(ValueError):
        W.simplify(buf, -1.0)


def test_convex_hull_shapes():
    import numpy as np

    from geoparquet_io_spark.functions import wkb as W

    # square + interior + edge-midpoint points -> hull is the square
    pts = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (2, 0), (1, 3)]
    mp = W.encode_multipolygon([])  # not used; build via linestring instead
    line = W.encode_linestring(np.array(pts, dtype="f8"))
    hull = W.parse(W.convex_hull(line))
    assert hull.gtype == W.POLYGON
    ring = hull.parts[0]
    assert len(ring) == 5
    assert W.area(W.convex_hull(line)) == 16.0
    # CCW orientation: positive signed area
    a, _, _ = W._ring_area_centroid(ring)
    assert a > 0

    # collinear -> linestring of the two extremes
    col = W.encode_linestring(np.array([(0, 0), (1, 1), (3, 3)], dtype="f8"))
    out = W.parse(W.convex_hull(col))
    assert out.gtype == W.LINESTRING
    assert [tuple(p) for p in out.parts[0]] == [(0.0, 0.0), (3.0, 3.0)]

    # single point
    pt = W.encode_point(2.0, 5.0)
    out = W.parse(W.convex_hull(pt))
    assert out.gtype == W.POINT


def test_buffer_point_n_gon():
    import math

    from geoparquet_io_spark.functions import wkb as W

    buf = W.buffer_point(10.0, -5.0, 3.0, segments=64)
    g = W.parse(buf)
    assert g.gtype == W.POLYGON and len(g.parts[0]) == 65
    exact_area = 0.5 * 64 * 9.0 * math.sin(2 * math.pi / 64)
    assert abs(W.area(buf) - exact_area) < 1e-9
    # all vertices exactly radius away from the center
    for vx, vy in g.parts[0][:-1]:
        assert abs(math.hypot(vx - 10.0, vy + 5.0) - 3.0) < 1e-12

    import pytest as _p
    with _p.raises(ValueError):
        W.buffer_point(0, 0, -1.0)
    with _p.raises(ValueError):
        W.buffer_point(0, 0, 1.0, segments=2)


def test_centroid_multipoint_is_mean():
    # regression: single-point components were summed UNWEIGHTED while the
    # total weight was 1e-300 -> centroid exploded by 1e300
    mp = wkt.from_wkt("MULTIPOINT (1 1, 3 5)")
    cx, cy = wkb.centroid(mp)
    assert abs(cx - 2.0) < 1e-9 and abs(cy - 3.0) < 1e-9
    # mixed with a line: the line's length dominates (points ~ weightless)
    gc = wkt.from_wkt("GEOMETRYCOLLECTION (POINT (100 100), LINESTRING (0 0, 2 0))")
    cx, cy = wkb.centroid(gc)
    assert abs(cx - 1.0) < 1e-6 and abs(cy) < 1e-6


def test_ewkb_zm_flags_rejected():
    import struct
    # EWKB LINESTRING Z: flag 0x80000000, 3 doubles per vertex — parsing
    # as 2-D silently interleaved garbage before the guard
    buf = struct.pack("<BII", 1, 0x80000002, 2) + struct.pack(
        "<6d", 0, 0, 5, 1, 1, 5)
    with pytest.raises(ValueError, match="2-D"):
        wkb.parse(buf)
    buf_m = struct.pack("<BII", 1, 0x40000001, 1) + struct.pack("<3d", 1, 2, 9)
    with pytest.raises(ValueError, match="2-D"):
        wkb.parse(buf_m)


def test_distance_empty_component():
    pt = wkb.encode_point(1.0, 2.0)
    empty_line = wkt.from_wkt("LINESTRING EMPTY")
    assert math.isnan(wkb.distance(pt, empty_line))
    assert math.isnan(wkb.distance(empty_line, pt))
    # an empty component alongside a real one: real one still measured
    mixed = wkt.from_wkt("GEOMETRYCOLLECTION (LINESTRING EMPTY, POINT (4 2))")
    assert abs(wkb.distance(pt, mixed) - 3.0) < 1e-12


def test_clip_fully_inside_polyline_stays_single():
    # regression: p + 1.0*(q-p) need not equal q in floats; a 1-ulp gap
    # split fully-inside polylines into spurious MULTILINESTRING parts
    pts = np.array([(524.5612093932093, 10.1), (-995.7891213121348, 20.2),
                    (333.3333333333333, -77.7)], dtype="f8")
    line = wkb.encode_linestring(pts)
    out = wkb.parse(wkb.clip_to_rect(line, -1e4, -1e4, 1e4, 1e4))
    assert out.gtype == wkb.LINESTRING
    assert np.allclose(out.parts[0], pts)


def test_simplify_multi_and_collection():
    ml = wkt.from_wkt(
        "MULTILINESTRING ((0 0, 1 0.001, 2 0), (0 5, 2 5.001, 4 5))")
    out = wkb.parse(wkb.simplify(ml, 0.1))
    assert out.gtype == wkb.MULTILINESTRING
    assert [len(c.parts[0]) for c in out.children] == [2, 2]
    mp = wkt.from_wkt("MULTIPOINT (1 1, 3 5)")
    assert wkb.simplify(mp, 0.5) is not None
    assert wkt.to_wkt(wkb.simplify(mp, 0.5)) == wkt.to_wkt(mp)
    gc = wkt.from_wkt(
        "GEOMETRYCOLLECTION (POINT (9 9), LINESTRING (0 0, 1 0.001, 2 0))")
    out = wkb.parse(wkb.simplify(gc, 0.1))
    assert out.gtype == wkb.GEOMETRYCOLLECTION
    assert out.children[0].gtype == wkb.POINT
    assert len(out.children[1].parts[0]) == 2


def test_buffer_point_nan_radius_raises():
    with pytest.raises(ValueError, match="radius"):
        wkb.buffer_point(0.0, 0.0, float("nan"))


def test_wkt_geometrycollection_and_empty_roundtrip():
    gc = "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 2 0), POLYGON ((0 0, 1 0, 1 1, 0 0)))"
    assert wkt.to_wkt(wkt.from_wkt(gc)) == gc
    # nested collection
    nested = "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT (5 6)), POINT (7 8))"
    assert wkt.to_wkt(wkt.from_wkt(nested)) == nested
    # EMPTY forms round-trip for every type
    for t in ("LINESTRING", "POLYGON", "MULTIPOINT", "MULTILINESTRING",
              "MULTIPOLYGON", "GEOMETRYCOLLECTION", "POINT"):
        assert wkt.to_wkt(wkt.from_wkt(f"{t} EMPTY")) == f"{t} EMPTY"
    # kernel functions tolerate the empties
    assert wkb.area(wkt.from_wkt("POLYGON EMPTY")) == 0.0
    assert wkb.length(wkt.from_wkt("LINESTRING EMPTY")) == 0.0
    assert math.isnan(wkb.envelope(wkt.from_wkt("GEOMETRYCOLLECTION EMPTY"))[0])
    assert wkb.geometry_type(wkt.from_wkt("MULTIPOLYGON EMPTY")) == "MULTIPOLYGON"


# --- r12 optimization: bulk point-in-polygon parity -------------------------

def _pip_poly(wkt_str):
    return wkb.parse(wkt.from_wkt(wkt_str))


def test_points_in_polygon_bulk_matches_scalar_adversarial():
    """The vectorized spatial-join kernel must agree with the scalar
    kernel bit-for-bit on every boundary case: on-edge, on-vertex,
    strictly-inside, in-hole, ON the hole boundary, outside, and far
    away.  (The r12 spatial_join fast path routes through the bulk
    form; a drift here silently changes join results.)"""
    poly = _pip_poly(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (4 4, 6 4, 6 6, 4 6, 4 4))")
    pts = [
        (5, 1),      # inside shell
        (5, 5),      # inside hole -> outside
        (4, 5),      # on hole boundary -> inside
        (4, 4),      # hole vertex -> inside
        (0, 0),      # shell vertex
        (5, 0),      # on shell edge
        (10, 10),    # shell corner
        (-1, 5),     # outside
        (11, 11),    # outside
        (5, 10),     # top edge
        (4.5, 4),    # on hole edge
        (5.000001, 5.000001),  # just inside hole
        (3.999999, 5),         # just outside hole
    ]
    px = np.array([p[0] for p in pts], dtype=np.float64)
    py = np.array([p[1] for p in pts], dtype=np.float64)
    bulk = wkb._points_in_polygon_bulk(px, py, poly)
    scalar = np.array([
        wkb._point_in_polygon(float(x), float(y), poly) for x, y in pts])
    assert (bulk == scalar).all()


@given(st.lists(st.tuples(st.floats(min_value=-12, max_value=12,
                                    allow_nan=False),
                          st.floats(min_value=-12, max_value=12,
                                    allow_nan=False)),
                min_size=1, max_size=64))
@settings(max_examples=60, deadline=None)
def test_points_in_ring_bulk_property(pts):
    poly = _pip_poly(
        "POLYGON ((0 0, 10 0, 12 5, 10 10, 0 10, -2 5, 0 0),"
        " (3 3, 7 3, 7 7, 3 7, 3 3))")
    px = np.array([p[0] for p in pts], dtype=np.float64)
    py = np.array([p[1] for p in pts], dtype=np.float64)
    bulk = wkb._points_in_polygon_bulk(px, py, poly)
    scalar = np.array([
        wkb._point_in_polygon(float(x), float(y), poly) for x, y in pts])
    assert (bulk == scalar).all()
