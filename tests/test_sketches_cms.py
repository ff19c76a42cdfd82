"""Count-min sketch + MAD outlier unit tests."""

from pyspark.sql import functions as F

from geoparquet_io_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
    heavy_hitters,
)
from geoparquet_io_spark.operators.stats import mad_outliers


def _toy(spark):
    # item i appears i times, i in 1..20
    rows = [(f"item{i}",) for i in range(1, 21) for _ in range(i)]
    return spark.createDataFrame(rows, "v string")


def test_cms_never_underestimates(spark):
    df = _toy(spark)
    cms = count_min_sketch(df, "v", depth=4, width=64)
    items = df.select("v").distinct()
    est = {r.v: r.cms_estimate for r in
           cms_estimate(cms, items, "v", depth=4, width=64).collect()}
    exact = {r.v: r.n for r in
             df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)


def test_cms_exact_at_generous_width(spark):
    df = _toy(spark)
    cms = count_min_sketch(df, "v", depth=4, width=4096)
    items = df.select("v").distinct()
    est = {r.v: r.cms_estimate for r in
           cms_estimate(cms, items, "v", depth=4, width=4096).collect()}
    exact = {r.v: r.n for r in
             df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    # 20 keys into 4 x 4096 buckets: all-4-row collisions are absent,
    # so the min recovers the exact count
    assert est == exact


def test_cms_mergeable_bucketwise(spark):
    # sketch(A union B) == bucket-wise sum of sketch(A) + sketch(B)
    df = _toy(spark)
    a = df.filter(F.col("v").isin([f"item{i}" for i in range(1, 11)]))
    b = df.filter(~F.col("v").isin([f"item{i}" for i in range(1, 11)]))
    whole = count_min_sketch(df, "v", depth=2, width=32)
    pa = count_min_sketch(a, "v", depth=2, width=32)
    pb = count_min_sketch(b, "v", depth=2, width=32)
    merged = (pa.unionByName(pb)
              .groupBy("hash_row", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    w = {(r.hash_row, r.bucket): r.cnt for r in whole.collect()}
    m = {(r.hash_row, r.bucket): r.cnt for r in merged.collect()}
    assert w == m


def test_cms_null_values_counted(spark):
    df = spark.createDataFrame([("a",), (None,), (None,)], "v string")
    cms = count_min_sketch(df, "v", depth=2, width=16)
    assert cms.agg(F.sum("cnt")).collect()[0][0] == 6  # 3 rows x depth 2


def test_heavy_hitters_threshold(spark):
    df = _toy(spark)  # 210 rows total
    out = heavy_hitters(df, "v", min_fraction=0.08)  # ceil(16.8) = 17
    got = {r.v: (r.n_exact, r.est_sound) for r in out.collect()}
    assert set(got) == {"item17", "item18", "item19", "item20"}
    assert all(sound for _, sound in got.values())


def test_mad_outliers_flags_known_extreme(spark):
    rows = [("g", float(v), i) for i, v in enumerate([10, 11, 9, 10, 12, 10, 11, 500])]
    df = spark.createDataFrame(rows, "g string, v double, i long")
    out = mad_outliers(df, "g", "v", k=3.5).collect()
    assert [r.i for r in out] == [7]
    assert out[0].robust_z > 100


def test_mad_outliers_zero_mad_group_no_crash(spark):
    # constant group: MAD = 0 -> comparison against 0; the lone deviant
    # is infinitely deviant and must flag, identical rows must not
    rows = [("g", 5.0, i) for i in range(9)] + [("g", 6.0, 9)]
    df = spark.createDataFrame(rows, "g string, v double, i long")
    out = mad_outliers(df, "g", "v", k=3.5).collect()
    assert [r.i for r in out] == [9]
