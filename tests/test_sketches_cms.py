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


def test_heavy_hitters_sketch_matches_exact(spark):
    """Sketch-only path (Misra-Gries candidates + CMS probe) must agree
    with the exact histogram at test scale — no misses, no phantoms."""
    from geoparquet_io_spark.operators.sketches import heavy_hitters_sketch

    df = _toy(spark)  # 210 rows
    out = heavy_hitters_sketch(df, "v", min_fraction=0.08).collect()
    got = {r.v: r.cms_estimate for r in out}
    assert set(got) == {"item17", "item18", "item19", "item20"}
    # CMS never underestimates
    assert got["item20"] >= 20


def test_heavy_hitter_candidates_survive_adversarial_partitioning(spark):
    """The Misra-Gries guarantee must hold under a hostile layout: a
    heavy key diluted evenly across many partitions full of singleton
    noise keys still surfaces as a candidate in every partition it
    dominates."""
    from geoparquet_io_spark.operators.sketches import \
        heavy_hitter_candidates

    rows = []
    for p in range(8):
        rows += [("hot", p)] * 30                       # 240 hot rows
        rows += [(f"noise_{p}_{i}", p) for i in range(70)]  # 560 noise
    df = spark.createDataFrame(rows, "v string, p int") \
        .repartition(8, "p")
    cand = {r.v for r in
            heavy_hitter_candidates(df, "v", min_fraction=0.25).collect()}
    assert "hot" in cand
    # bounded output: at most capacity per partition
    assert len(cand) <= 8 * (2 * 4 + 1)


def test_heavy_hitters_sketch_plan_no_full_cardinality_shuffle(spark):
    """Plan shape: the sketch path's only hash aggregations key on
    (hash_row, bucket) or on the tiny candidate set — never a groupBy
    over the raw key column of the full input."""
    from geoparquet_io_spark.operators.sketches import (
        count_min_sketch,
        heavy_hitter_candidates,
    )
    from geoparquet_io_spark.plans import formatted_plan

    df = _toy(spark)
    cand_plan = formatted_plan(
        heavy_hitter_candidates(df, "v", min_fraction=0.08))
    assert "MapInPandas" in cand_plan          # map-only candidate pass
    cms_plan = formatted_plan(count_min_sketch(df, "v"))
    assert "hash_row" in cms_plan and "bucket" in cms_plan


def test_cms_join_size_exact_when_collision_free(spark):
    """With a handful of distinct keys in a 1024-bucket sketch the
    inner product has (almost surely) no colliding buckets, so the
    estimate equals the exact join size: sum of per-key count
    products."""
    from geoparquet_io_spark.operators.sketches import (
        cms_join_size_estimate, count_min_sketch)

    a = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 2, 3]], ["k"])
    b = spark.createDataFrame([(k,) for k in [1, 2, 2, 4]], ["k"])
    est = cms_join_size_estimate(
        count_min_sketch(a, "k"), count_min_sketch(b, "k")).collect()[0]
    # exact = 3*1 (k=1) + 2*2 (k=2) + 0 + 0 = 7
    assert est["est_join_rows"] == 7


def test_cms_join_size_never_underestimates(spark):
    from pyspark.sql import functions as F

    from geoparquet_io_spark.operators.sketches import (
        cms_join_size_estimate, count_min_sketch)

    a = spark.range(2000).select((F.col("id") % 97).alias("k"))
    b = spark.range(500).select((F.col("id") % 37).alias("k"))
    exact = a.join(b, "k").count()
    est = cms_join_size_estimate(
        count_min_sketch(a, "k"), count_min_sketch(b, "k")) \
        .collect()[0]["est_join_rows"]
    assert est >= exact


# -- KMV overlap -------------------------------------------------------------

def test_kmv_exact_under_k(spark):
    """Union below k: the sketches are the full hash sets, so union /
    intersection / jaccard are EXACT."""
    from geoparquet_io_spark.operators.sketches import (
        kmv_overlap_estimate, kmv_sketch)

    a = spark.createDataFrame([(f"v{i}",) for i in range(60)], ["x"])
    b = spark.createDataFrame([(f"v{i}",) for i in range(40, 100)], ["x"])
    sk_a = kmv_sketch(a, "x", k=256)
    sk_b = kmv_sketch(b, "x", k=256)
    row = kmv_overlap_estimate(sk_a, sk_b, k=256).collect()[0]
    assert row["union_distinct_est"] == 100
    assert row["intersect_est"] == 20
    assert row["jaccard_micro"] == 200000      # 20/100

    # duplicates and nulls don't inflate the sketch
    a_dup = a.union(a).union(
        spark.createDataFrame([(None,)], "x string"))
    row2 = kmv_overlap_estimate(kmv_sketch(a_dup, "x", k=256),
                                sk_b, k=256).collect()[0]
    assert row2["union_distinct_est"] == 100


def test_kmv_estimator_accuracy_past_k(spark):
    """Past k the (k-1)/theta estimator engages: union/intersection
    within ~15% of truth at k=512 over 8k distinct values."""
    from geoparquet_io_spark.operators.sketches import (
        kmv_overlap_estimate, kmv_sketch)

    n, shared = 5000, 2000
    a = spark.createDataFrame(
        [(f"a{i}",) for i in range(n - shared)]
        + [(f"s{i}",) for i in range(shared)], ["x"])
    b = spark.createDataFrame(
        [(f"b{i}",) for i in range(n - shared)]
        + [(f"s{i}",) for i in range(shared)], ["x"])
    row = kmv_overlap_estimate(kmv_sketch(a, "x", k=512),
                               kmv_sketch(b, "x", k=512), k=512).collect()[0]
    true_union = 2 * n - shared
    assert abs(row["union_distinct_est"] - true_union) / true_union < 0.15
    assert abs(row["intersect_est"] - shared) / shared < 0.30


def test_kmv_sketch_plan_take_ordered(spark):
    """The bottom-k must run as TakeOrdered (per-partition k + driver
    merge), never a global sort."""
    from geoparquet_io_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame([(f"v{i}",) for i in range(100)], ["x"])
    plan = kmv_sketch(df, "x", k=16)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, "x", k=1)


# --- r9 review-fix regressions ------------------------------------------------

def test_heavy_hitters_sketch_null_heavy_float_column(spark):
    """A float column that is half NULL must surface the NULL key as a
    heavy hitter: per-batch NaN objects used to fragment the Misra-Gries
    dict (id-based NaN hashing), evicting the key every batch — a false
    negative the no-false-negatives guarantee rules out (r9 review,
    verified on pandas 2.2.2)."""
    from geoparquet_io_spark.operators.sketches import (
        heavy_hitter_candidates)

    rows = [(float(i),) if i % 2 else (None,) for i in range(4000)]
    df = spark.createDataFrame(rows, "v double").repartition(4)
    cands = heavy_hitter_candidates(df, "v", min_fraction=0.3).collect()
    assert any(r["v"] is None for r in cands), cands


def test_hll_distinct_check_all_null_group_has_boolean_verdict(spark):
    from geoparquet_io_spark.operators.sketches import hll_distinct_check

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", None), ("b", None)],
        "g string, v string")
    out = {r["g"]: r["est_ok"] for r in
           hll_distinct_check(df, "g", "v").collect()}
    assert out["a"] is True
    assert out["b"] is True          # not NULL: all-null group verdict
