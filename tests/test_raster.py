"""Raster operators over the pure-numpy GeoTIFF path."""

from __future__ import annotations

import numpy as np
import pytest

from tests.test_tiff import write_tiff_ref


def test_build_geotiff_vs_independent_reader():
    """Product writer x independent test reader (and the reverse) —
    writer and decoder cannot share a bug."""
    import struct

    from geoparquet_io_spark.functions.tiff import build_geotiff

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (5, 9)).astype(np.uint8)
    buf = build_geotiff(img, epsg=32633, origin=(100.0, 200.0),
                        scale=(10.0, 10.0))
    # independent raw-struct spot checks on the product writer's bytes
    assert buf[:2] == b"II" and struct.unpack_from("<H", buf, 2)[0] == 42
    n = struct.unpack_from("<H", buf, 8)[0]
    tags = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from("<HHI", buf, 10 + 12 * i)
        tags[tag] = (typ, cnt, 10 + 12 * i + 8)
    assert struct.unpack_from("<H", buf, tags[256][2])[0] == 9   # width
    assert struct.unpack_from("<H", buf, tags[257][2])[0] == 5   # height
    off = struct.unpack_from("<I", buf, tags[273][2])[0]
    assert buf[off:off + 45] == img.tobytes()
    # and the independent writer's bytes through the product reader
    from geoparquet_io_spark.functions.tiff import decode_tiff

    assert np.array_equal(
        decode_tiff(write_tiff_ref(img, compression=5)), img)


def test_extract_raster_metadata_spark(spark):
    from geoparquet_io_spark.operators.raster import extract_raster_metadata

    rng = np.random.RandomState(1)
    dem = (rng.rand(12, 10) * 2000).astype(np.float32)
    buf = write_tiff_ref(dem, compression=8,
                         geo=dict(epsg=32633, origin=(500000.0, 4650000.0),
                                  scale=(30.0, 30.0)))
    df = spark.createDataFrame([(1, bytearray(buf))], ["id", "data"])
    m = extract_raster_metadata(df).collect()[0]["raster_meta"]
    assert (m["width"], m["height"], m["bands"], m["epsg"]) == (10, 12, 1, 32633)
    assert m["dtype"] == "float32"
    assert abs(m["band_mean"] - float(dem.astype("f8").mean())) < 1e-9
    assert m["band_min"] == pytest.approx(float(dem.min()))


def test_geotiff_to_points_exact_coords(spark):
    from geoparquet_io_spark.operators.raster import geotiff_to_points

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    buf = write_tiff_ref(img, geo=dict(epsg=32633, origin=(1000.0, 2000.0),
                                       scale=(10.0, 5.0)))
    df = spark.createDataFrame([(7, bytearray(buf))], ["img_id", "data"])
    rows = geotiff_to_points(df).orderBy("row", "col").collect()
    assert len(rows) == 12
    r0 = rows[0]
    assert (r0["img_id"], r0["col"], r0["row"]) == (7, 0, 0)
    assert (r0["x"], r0["y"]) == (1005.0, 1997.5)   # pixel CENTER
    assert rows[-1]["value"] == 11.0
    assert rows[-1]["x"] == 1000.0 + 3.5 * 10.0

    strided = geotiff_to_points(df, stride=2).collect()
    assert sorted((r["row"], r["col"]) for r in strided) == \
        [(0, 0), (0, 2), (2, 0), (2, 2)]


def test_geotiff_to_points_guards(spark):
    from geoparquet_io_spark.operators.raster import geotiff_to_points

    img = np.zeros((50, 50), dtype=np.uint8)
    geo = dict(epsg=4326, origin=(0.0, 0.0), scale=(1.0, 1.0))
    df = spark.createDataFrame(
        [(1, bytearray(write_tiff_ref(img, geo=geo)))], ["id", "data"])
    with pytest.raises(Exception, match="max_pixels"):
        geotiff_to_points(df, max_pixels=100).collect()
    # no georeferencing -> loud error
    df2 = spark.createDataFrame(
        [(1, bytearray(write_tiff_ref(img)))], ["id", "data"])
    with pytest.raises(Exception, match="georeferencing"):
        geotiff_to_points(df2).collect()


def test_geotiff_to_points_chunked_flush_identical(spark, monkeypatch):
    """The bounded sub-chunk frame flush (r13 memory cap) must produce
    exactly the rows of the single-frame build — including kept-column
    replication across a flush boundary that splits mid-batch."""
    from geoparquet_io_spark.operators import raster as raster_mod

    geo = dict(epsg=32633, origin=(1000.0, 2000.0), scale=(10.0, 5.0))
    rows_in = []
    for i in range(5):
        img = (np.arange(12, dtype=np.uint8).reshape(3, 4) + i)
        rows_in.append((i, f"r{i}", bytearray(write_tiff_ref(img, geo=geo))))
    df = spark.createDataFrame(rows_in, ["img_id", "tag", "data"]) \
        .coalesce(1)   # one batch so the cap splits INSIDE it

    def _collect():
        out = raster_mod.geotiff_to_points(df)
        return [tuple(r) for r in
                out.orderBy("img_id", "row", "col").collect()]

    baseline = _collect()
    # cap of 7 < the 12 px per raster: every raster flushes alone
    monkeypatch.setattr(raster_mod, "_POINTS_CHUNK_ROWS", 7)
    assert _collect() == baseline
    # cap of 25 splits after every 3rd raster
    monkeypatch.setattr(raster_mod, "_POINTS_CHUNK_ROWS", 25)
    assert _collect() == baseline
    assert len(baseline) == 60


def test_rasterize_points_roundtrip():
    """points -> raster -> points recovers the per-cell means."""
    import pandas as pd

    from geoparquet_io_spark.functions.tiff import decode_tiff, geotiff_info
    from geoparquet_io_spark.operators.raster import rasterize_points

    pts = pd.DataFrame({
        "x": [5.0, 5.1, 25.0, 35.0],
        "y": [95.0, 95.2, 85.0, 75.0],
        "value": [2.0, 4.0, 10.0, 7.0],
    })
    buf = rasterize_points(pts, width=4, height=3, origin=(0.0, 100.0),
                           scale=(10.0, 10.0), epsg=32633)
    arr = decode_tiff(buf)
    assert arr.dtype == np.float32 and arr.shape == (3, 4)
    assert arr[0, 0] == pytest.approx(3.0)    # mean of 2 and 4
    assert arr[1, 2] == pytest.approx(10.0)
    assert arr[2, 3] == pytest.approx(7.0)
    assert geotiff_info(buf).epsg == 32633


def test_raster_points_compose_with_vector_ops(spark):
    """The exploded points drive an ordinary zonal groupBy — raster
    pixels aggregated per 2x2-degree zone with plain Spark exprs."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.operators.raster import geotiff_to_points

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    geo = dict(epsg=4326, origin=(0.0, 4.0), scale=(1.0, 1.0))
    df = spark.createDataFrame(
        [(1, bytearray(write_tiff_ref(img, geo=geo)))], ["id", "data"])
    pts = geotiff_to_points(df)
    zones = pts.groupBy(
        F.floor(F.col("x") / 2).alias("zx"),
        F.floor(F.col("y") / 2).alias("zy"),
    ).agg(F.sum("value").alias("s"), F.count("*").alias("n"))
    got = {(r["zx"], r["zy"]): (r["s"], r["n"]) for r in zones.collect()}
    # zone (0,1) covers rows 0-1, cols 0-1 -> values 0,1,4,5
    assert got[(0, 1)] == (10.0, 4)      # values 0,1,4,5
    assert got[(1, 0)] == (50.0, 4)      # values 10,11,14,15
    assert sum(v[1] for v in got.values()) == 16


def test_sample_raster_at_points(spark):
    """Point enrichment: two non-overlapping tiles, points inside each,
    one point outside every tile -> NULL."""
    import numpy as np
    from pyspark.sql import functions as F

    from geoparquet_io_spark.operators.raster import sample_raster_at_points

    a = np.arange(12, dtype=np.uint8).reshape(3, 4)        # tile A
    b = (np.arange(12, dtype=np.uint8) + 100).reshape(3, 4)  # tile B
    ta = write_tiff_ref(a, geo=dict(epsg=32633, origin=(0.0, 30.0),
                                    scale=(10.0, 10.0)))
    tb = write_tiff_ref(b, geo=dict(epsg=32633, origin=(100.0, 30.0),
                                    scale=(10.0, 10.0)))
    rasters = spark.createDataFrame(
        [("A", bytearray(ta)), ("B", bytearray(tb))], ["raster_id", "data"])
    pts = spark.createDataFrame(
        [(1, 5.0, 25.0),     # tile A pixel (0,0) -> 0
         (2, 35.0, 5.0),     # tile A pixel (2,3) -> 11
         (3, 105.0, 25.0),   # tile B pixel (0,0) -> 100
         (4, 500.0, 500.0)], # no tile -> NULL
        ["pid", "x", "y"])
    got = {r["pid"]: (r["raster_id"], r["value"])
           for r in sample_raster_at_points(pts, rasters).collect()}
    assert got[1] == ("A", 0.0)
    assert got[2] == ("A", 11.0)
    assert got[3] == ("B", 100.0)
    assert got[4][0] is None
    import math

    assert got[4][1] is None or math.isnan(got[4][1])


def test_rasterize_polygons_triangle_and_hole(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from geoparquet_io_spark.functions import wkb as _wkb
    from geoparquet_io_spark.operators.raster import rasterize_polygons

    # right triangle legs 40x30 on a 10m grid over [0,80]x[0,60];
    # fractional origin keeps centers off edges
    tri = _wkb.encode_polygon(
        [np.array([[0, 0], [40, 0], [0, 30], [0, 0]], float)])
    # square with a square hole
    sq = _wkb.encode_polygon([
        np.array([[40, 30], [80, 30], [80, 60], [40, 60], [40, 30]], float),
        np.array([[50, 40], [70, 40], [70, 50], [50, 50], [50, 40]], float),
    ])
    df = spark.createDataFrame(
        [(1, bytearray(tri)), (2, bytearray(sq))], ["pid", "geometry"])
    out = rasterize_polygons(df, 8, 6, origin=(0.3, 60.7),
                             scale=(10.0, 10.0))
    got = {(r["pid"], r["col"], r["row"]) for r in out.collect()}
    # brute-force expectation over all 48 centers
    want = set()
    for c in range(8):
        for r in range(6):
            x = 0.3 + c * 10 + 5
            y = 60.7 - (r * 10 + 5)
            if x >= 0 and y >= 0 and x / 40 + y / 30 < 1:
                want.add((1, c, r))
            if 40 < x < 80 and 30 < y < 60 \
                    and not (50 < x < 70 and 40 < y < 50):
                want.add((2, c, r))
    assert got == want and want


def test_rasterize_polygons_multipolygon(spark):
    import numpy as np

    from geoparquet_io_spark.functions import wkb as _wkb
    from geoparquet_io_spark.operators.raster import rasterize_polygons

    mp = _wkb.encode_multipolygon([
        [np.array([[0, 0], [20, 0], [20, 20], [0, 20], [0, 0]], float)],
        [np.array([[40, 40], [60, 40], [60, 60], [40, 60], [40, 40]],
                  float)],
    ])
    df = spark.createDataFrame([(1, bytearray(mp))], ["pid", "geometry"])
    out = rasterize_polygons(df, 6, 6, origin=(0.1, 60.1),
                             scale=(10.0, 10.0))
    cells = {(r["col"], r["row"]) for r in out.collect()}
    assert (0, 5) in cells and (1, 4) in cells     # lower-left square
    assert (4, 1) in cells and (5, 0) in cells     # upper-right square
    assert (3, 3) not in cells                     # the gap between


def test_sample_raster_at_points_overlapping_tiles(spark):
    """A point under OVERLAPPING tile extents is answered ONCE (min
    raster_id tie-break), never duplicated one-row-per-covering-tile."""
    import numpy as np

    from geoparquet_io_spark.operators.raster import sample_raster_at_points

    a = np.full((3, 4), 7, dtype=np.uint8)
    b = np.full((3, 4), 9, dtype=np.uint8)
    ta = write_tiff_ref(a, geo=dict(epsg=32633, origin=(0.0, 30.0),
                                    scale=(10.0, 10.0)))
    tb = write_tiff_ref(b, geo=dict(epsg=32633, origin=(20.0, 30.0),
                                    scale=(10.0, 10.0)))  # overlaps A in x
    rasters = spark.createDataFrame(
        [("A", bytearray(ta)), ("B", bytearray(tb))], ["raster_id", "data"])
    pts = spark.createDataFrame(
        [(1, 25.0, 25.0),    # covered by BOTH -> A wins (min id), value 7
         (2, 5.0, 25.0),     # only A
         (3, 45.0, 25.0),    # only B
         (4, 500.0, 500.0)], # neither -> NULL
        ["pid", "x", "y"])
    out = sample_raster_at_points(pts, rasters).collect()
    assert len(out) == 4                       # exactly one row per point
    got = {r["pid"]: (r["raster_id"], r["value"]) for r in out}
    assert got[1] == ("A", 7.0)
    assert got[2] == ("A", 7.0)
    assert got[3] == ("B", 9.0)
    assert got[4][0] is None


def test_raster_reserved_column_and_error_guards(spark):
    """r9 review fixes: kept input columns colliding with computed
    output columns raise upfront (they silently overwrote pixel
    coordinates); sample_raster_at_points rejects pre-existing
    value/raster_id columns and names the offending raster on a
    georeferencing error."""
    import numpy as np
    import pytest

    from geoparquet_io_spark.operators.raster import (
        geotiff_to_points, rasterize_polygons, sample_raster_at_points)

    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    t = write_tiff_ref(a, geo=dict(epsg=32633, origin=(0.0, 30.0),
                                   scale=(10.0, 10.0)))
    df = spark.createDataFrame([("f1", 7.0, bytearray(t))],
                               ["rid", "x", "data"])
    with pytest.raises(ValueError, match="collide"):
        geotiff_to_points(df, keep_columns=["rid", "x"])
    # default keep (everything but data) collides via 'x' too
    with pytest.raises(ValueError, match="collide"):
        geotiff_to_points(df)
    with pytest.raises(ValueError, match="collide"):
        rasterize_polygons(
            spark.createDataFrame([("g", b"")], ["row", "geometry"]),
            width=4, height=3, origin=(0.0, 30.0), scale=(10.0, 10.0))
    pts = spark.createDataFrame([(1, 5.0, 25.0, 9.9)],
                                ["pid", "x", "y", "value"])
    rasters = spark.createDataFrame([("A", bytearray(t))],
                                    ["raster_id", "data"])
    with pytest.raises(ValueError, match="value"):
        sample_raster_at_points(pts, rasters)
    # ungeoreferenced tile: error NAMES the raster id
    bare = write_tiff_ref(a)   # no geo kwargs -> no tiepoint/scale
    bad = spark.createDataFrame([("broken", bytearray(bare))],
                                ["raster_id", "data"])
    good_pts = spark.createDataFrame([(1, 5.0, 25.0)], ["pid", "x", "y"])
    with pytest.raises(Exception, match="broken"):
        sample_raster_at_points(good_pts, bad)


def test_rasterize_points_nodata_nan_distinguishes_empty_cells():
    """nodata=NaN keeps no-observation cells apart from genuine 0.0
    aggregates (default 0.0 preserved for compatibility) — r9 review."""
    import math

    import numpy as np
    import pandas as pd

    from geoparquet_io_spark.functions.tiff import decode_tiff
    from geoparquet_io_spark.operators.raster import rasterize_points

    pts = pd.DataFrame({"x": [5.0], "y": [25.0], "value": [0.0]})
    buf = rasterize_points(pts, width=2, height=1, origin=(0.0, 30.0),
                           scale=(10.0, 10.0), nodata=float("nan"))
    arr = np.asarray(decode_tiff(buf), dtype="f8").reshape(1, 2)
    assert arr[0, 0] == 0.0            # observed aggregate of exactly 0
    assert math.isnan(arr[0, 1])       # no observations -> NaN, not 0
    buf0 = rasterize_points(pts, width=2, height=1, origin=(0.0, 30.0),
                            scale=(10.0, 10.0))
    arr0 = np.asarray(decode_tiff(buf0), dtype="f8").reshape(1, 2)
    assert arr0[0, 1] == 0.0           # default unchanged


def test_rasterize_points_nan_value_does_not_poison_cell():
    """Regression (r10 sweep): a NaN value summed into its cell made the
    whole cell's mean NaN, and the nodata rewrite then disguised the
    poisoned cell as empty.  NaN-valued points are not observations —
    the remaining finite points in the same cell must aggregate
    normally."""
    import math

    import pandas as pd

    from geoparquet_io_spark.functions.tiff import decode_tiff
    from geoparquet_io_spark.operators.raster import rasterize_points

    pts = pd.DataFrame({
        "x": [0.5, 0.5, 1.5],
        "y": [0.5, 0.5, 0.5],
        "value": [4.0, math.nan, 7.0],
    })
    buf = rasterize_points(pts, width=2, height=1, origin=(0.0, 1.0),
                           scale=(1.0, 1.0), agg="mean", nodata=0.0)
    arr = decode_tiff(buf)
    import numpy as np

    a = np.asarray(arr, dtype="f8").reshape(1, 2)
    assert a[0, 0] == 4.0       # NaN row excluded, finite row kept
    assert a[0, 1] == 7.0
    # count semantics: the NaN row is not an observation
    buf = rasterize_points(pts, width=2, height=1, origin=(0.0, 1.0),
                           scale=(1.0, 1.0), agg="count")
    a = np.asarray(decode_tiff(buf), dtype="f8").reshape(1, 2)
    assert a[0, 0] == 1.0 and a[0, 1] == 1.0
