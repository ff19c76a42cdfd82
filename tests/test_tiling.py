"""Rectangle clipping kernel (wkb.clip_to_rect) + clip_to_grid tiling
operator.  Invariant: polygon AREA and line LENGTH are conserved across
a grid cut."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geoparquet_io_spark.functions import wkb as W


def test_clip_rect_polygon_cases():
    box = W.encode_box_polygon(0, 0, 10, 10)
    assert W.area(W.clip_to_rect(box, 5, 5, 20, 20)) == pytest.approx(25)
    assert W.clip_to_rect(box, 11, 11, 20, 20) is None
    # concave L-shape: clip that cuts through the notch
    L = W.encode_polygon([np.array(
        [[0., 0.], [10., 0.], [10., 4.], [4., 4.], [4., 10.], [0., 10.],
         [0., 0.]])])
    full = W.area(L)
    left = W.area(W.clip_to_rect(L, 0, 0, 4, 10))
    right = W.clip_to_rect(L, 4, 0, 10, 10)
    assert left + W.area(right) == pytest.approx(full)
    # hole survives when fully inside the window
    outer = np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.], [0., 0.]])
    hole = np.array([[4., 4.], [6., 4.], [6., 6.], [4., 6.], [4., 4.]])
    ph = W.encode_polygon([outer, hole])
    assert W.area(W.clip_to_rect(ph, 0, 0, 7, 7)) == pytest.approx(45)


def test_clip_rect_lines_points():
    ln = W.encode_linestring(np.array([[-5., 5.], [15., 5.]]))
    assert W.length(W.clip_to_rect(ln, 0, 0, 10, 10)) == pytest.approx(10)
    zig = W.encode_linestring(np.array(
        [[-2., 1.], [3., 1.], [3., 20.], [8., 20.], [8., 2.]]))
    c = W.clip_to_rect(zig, 0, 0, 10, 10)
    # two disjoint kept pieces -> multilinestring
    assert W.geometry_type(c) == "MULTILINESTRING"
    assert W.length(c) == pytest.approx(3 + 9 + 8)
    assert W.clip_to_rect(W.encode_point(5, 5), 0, 0, 2, 2) is None
    pt = W.encode_point(1, 1)
    assert W.clip_to_rect(pt, 0, 0, 2, 2) == pt


def test_clip_to_grid_conserves_area(spark):
    from geoparquet_io_spark.operators.tiling import clip_to_grid

    rng = np.random.RandomState(9)
    rows = []
    for i in range(40):
        x0, y0 = rng.uniform(-40, 30, 2)
        w, h = rng.uniform(1, 25, 2)
        rows.append(Row(gid=i, geometry=bytearray(
            W.encode_box_polygon(x0, y0, x0 + w, y0 + h)),
            area=float(w * h)))
    df = spark.createDataFrame(rows)
    tiles = clip_to_grid(df.drop("area"), cell_size=10.0)
    # every piece sits fully inside its cell
    pieces = tiles.collect()
    for r in pieces:
        e = W.envelope(bytes(r["geometry"]))
        assert e[0] >= r["cell_x"] * 10 - 1e-9
        assert e[2] <= (r["cell_x"] + 1) * 10 + 1e-9
    # per-geometry area is conserved across the cut
    got = {}
    for r in pieces:
        got[r["gid"]] = got.get(r["gid"], 0.0) + W.area(bytes(r["geometry"]))
    for r in rows:
        assert got[r.gid] == pytest.approx(r.area, rel=1e-9)


def test_clip_to_grid_points_and_nulls(spark):
    from geoparquet_io_spark.operators.tiling import clip_to_grid

    rows = [Row(gid=0, geometry=bytearray(W.encode_point(5.0, 5.0))),
            Row(gid=1, geometry=bytearray(W.encode_point(10.0, 0.0))),
            Row(gid=2, geometry=None)]
    df = spark.createDataFrame(rows, "gid long, geometry binary")
    out = clip_to_grid(df, cell_size=10.0).collect()
    cells = {r["gid"]: (r["cell_x"], r["cell_y"]) for r in out}
    assert cells[0] == (0, 0)
    assert cells[1] == (1, 0)              # boundary point: right cell
    assert 2 not in cells                  # null geometry dropped
