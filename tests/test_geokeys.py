"""Geokeys unit tests: the Spark-native Morton/geohash expressions vs
independent pure-python references (per-bit interleave, bisection
geohash) — different algorithms, same answers."""

from pyspark.sql import functions as F


def _ref_interleave(gx: int, gy: int, order: int) -> int:
    v = 0
    for i in range(order):
        v |= ((gx >> i) & 1) << (2 * i)
        v |= ((gy >> i) & 1) << (2 * i + 1)
    return v


def _ref_geohash(lon: float, lat: float, precision: int) -> str:
    """Classic bisection encoder (independent of the bit-spread route)."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, out, ch, even = 0, [], 0, True
    while len(out) < precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lo_lon = mid
            else:
                ch = ch * 2
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lo_lat = mid
            else:
                ch = ch * 2
                hi_lat = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(alphabet[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_morton_matches_per_bit_reference(spark):
    from geoparquet_io_spark.functions.geokeys import morton_key

    pts = [(i, -170.0 + 37.3 * i, -80.0 + 17.9 * i) for i in range(9)]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    bounds = (-170.0, -80.0, 163.0, 81.0)
    got = {r["id"]: r["k"] for r in df.select(
        "id", morton_key(F.col("x"), F.col("y"), bounds, order=16).alias("k")
    ).collect()}
    n = (1 << 16) - 1
    import math
    for i, x, y in pts:
        gx = min(n, max(0, math.floor((x - bounds[0]) / (bounds[2] - bounds[0]) * n + 0.5)))
        gy = min(n, max(0, math.floor((y - bounds[1]) / (bounds[3] - bounds[1]) * n + 0.5)))
        assert got[i] == _ref_interleave(gx, gy, 16), (i, x, y)


def test_geohash_known_values(spark):
    from geoparquet_io_spark.functions.geokeys import geohash

    # includes the canonical (42.605, -5.603) -> ezs42 example + poles/antimeridian
    pts = [(0, -5.603, 42.605), (1, 0.0, 0.0), (2, -180.0, -90.0),
           (3, 179.999, 89.999), (4, 2.2945, 48.8584)]
    df = spark.createDataFrame(pts, ["id", "lon", "lat"])
    for p in (5, 7):
        got = {r["id"]: r["g"] for r in df.select(
            "id", geohash(F.col("lon"), F.col("lat"), p).alias("g")).collect()}
        for i, lon, lat in pts:
            assert got[i] == _ref_geohash(lon, lat, p), (i, lon, lat, p)
    assert got[0][:5] == "ezs42"


def test_sort_zorder_improves_locality_and_is_native(spark):
    from geoparquet_io_spark.queries import _events_points
    from tests.conftest import SF_SMOKE

    gt = _events_points(spark, SF_SMOKE)
    out = gt.sort_zorder(keep_key=True)
    # the key computation itself must be native: a plain lon/lat frame
    # (no WKB decode) plans with zero python evals
    from geoparquet_io_spark.functions.geokeys import morton_key

    plain = spark.createDataFrame([(1, 0.0, 0.0)], ["id", "x", "y"]).select(
        morton_key(F.col("x"), F.col("y"), (-1.0, -1.0, 1.0, 1.0)).alias("k"))
    pplan = plain._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in pplan and "ArrowEvalPython" not in pplan
    keys = [r["__zorder"] for r in out.df.select("__zorder").collect()]
    assert keys == sorted(keys) and len(keys) > 0
    # dropped key by default
    assert "__zorder" not in gt.sort_zorder().df.columns


def test_geohash_even_precision_matches_reference(spark):
    """Even precisions interleaved lon onto the wrong bit positions —
    every even-precision geohash decoded to a different location."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.functions.geokeys import GEOHASH32, geohash

    def ref_geohash(lon, lat, p):
        lat_i, lon_i = [-90.0, 90.0], [-180.0, 180.0]
        bits, ch, even, out = 0, 0, True, ""
        while len(out) < p:
            iv, v = (lon_i, lon) if even else (lat_i, lat)
            mid = (iv[0] + iv[1]) / 2
            if v > mid:
                ch, iv[0] = ch * 2 + 1, mid
            else:
                ch, iv[1] = ch * 2, mid
            even = not even
            bits += 1
            if bits == 5:
                out += GEOHASH32[ch]
                bits, ch = 0, 0
        return out

    pts = [(10.40744, 57.64911), (-0.1278, 51.5074), (151.2, -33.86),
           (-122.42, 37.77)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for p in (1, 2, 5, 6, 7, 8, 11, 12):
        got = [r[0] for r in df.select(
            geohash(F.col("lon"), F.col("lat"), p)).collect()]
        want = [ref_geohash(lon, lat, p) for lon, lat in pts]
        assert got == want, (p, got, want)


def test_geokeys_null_coordinates_propagate(spark):
    from pyspark.sql import functions as F

    from geoparquet_io_spark.functions.geokeys import geohash, morton_key
    from geoparquet_io_spark.functions.quadkey import quadkey

    df = spark.createDataFrame([(None, 45.0), (None, None), (10.0, 20.0)],
                               "lon double, lat double")
    rows = df.select(
        geohash(F.col("lon"), F.col("lat"), 6).alias("g"),
        quadkey(F.col("lon"), F.col("lat"), 6).alias("q"),
        morton_key(F.col("lon"), F.col("lat"),
                   (-180.0, -90.0, 180.0, 90.0)).alias("m"),
    ).collect()
    assert rows[0]["g"] is None and rows[0]["q"] is None and rows[0]["m"] is None
    assert rows[1]["g"] is None and rows[1]["q"] is None
    assert rows[2]["g"] is not None and rows[2]["q"] is not None


def test_morton_degenerate_envelope_no_crash(spark):
    from pyspark.sql import functions as F

    from geoparquet_io_spark.functions.geokeys import morton_key

    df = spark.createDataFrame([(5.0, 1.0), (5.0, 2.0)], "x double, y double")
    out = df.select(morton_key(F.col("x"), F.col("y"),
                               (5.0, 0.0, 5.0, 10.0)).alias("m")).collect()
    assert all(r["m"] is not None for r in out)   # no DIVIDE_BY_ZERO
