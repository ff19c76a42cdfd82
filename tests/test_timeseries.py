"""Unit tests for operators/timeseries.py: gap-fill interpolation
semantics, EWMA recurrence bit-parity, trip segmentation boundaries,
PSI identity, and partition invariance of the keyed kernels."""

import datetime as dt

from pyspark.sql import functions as F

from geoparquet_io_spark.operators.timeseries import (
    ewma,
    population_stability,
    resample_gapfill,
    trip_segments,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gapfill_linear_interpolation(spark):
    # one key, hourly buckets, observations at h0 (v=10) and h3 (v=40):
    # gaps at h1/h2 must interpolate to 20 and 30
    df = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(3), 40.0)], "k long, ts timestamp, v double")
    out = resample_gapfill(df, "ts", "v", 3600, "k").orderBy("bucket_sec")
    rows = out.collect()
    assert [r.is_gap for r in rows] == [False, True, True, False]
    assert [r.filled_value for r in rows] == [10.0, 20.0, 30.0, 40.0]


def test_gapfill_edges_hold_nearest(spark):
    # leading/trailing gaps cannot interpolate: nearest observed value
    df = spark.createDataFrame(
        [(1, _ts(1), 5.0), (1, _ts(1, 30), 7.0), (1, _ts(3), 9.0)],
        "k long, ts timestamp, v double")
    out = resample_gapfill(df, "ts", "v", 3600, "k").orderBy("bucket_sec")
    rows = out.collect()
    # h1 bucket averages the two observations
    assert rows[0].avg_value == 6.0
    assert [r.filled_value for r in rows] == [6.0, 7.5, 9.0]


def test_gapfill_multiple_keys_independent_spines(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(2), 3.0), (2, _ts(5), 8.0)],
        "k long, ts timestamp, v double")
    out = resample_gapfill(df, "ts", "v", 3600, "k")
    per_key = {r["k"]: r["n"] for r in
               out.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert per_key == {1: 3, 2: 1}  # key 2's spine is its own single bucket


def test_ewma_matches_explicit_recurrence(spark):
    vals = [10.0, 20.0, 5.0, 80.0, 3.25, 40.5]
    df = spark.createDataFrame(
        [(1, _ts(i), v, i) for i, v in enumerate(vals)],
        "k long, ts timestamp, v double, i long")
    out = {r.rn: r.ewma for r in
           ewma(df, "k", "ts", "v", alpha=0.25, order_tiebreak="i",
                round_digits=10).collect()}
    s = vals[0]
    expect = {1: round(s, 10)}
    for i, x in enumerate(vals[1:], start=2):
        s = 0.75 * s + 0.25 * x
        expect[i] = round(s, 10)
    assert out == expect


def test_ewma_partition_invariance(spark):
    # same result whether the input arrives in 1 or 8 partitions
    rows = [(k, _ts(i % 23, i % 60), float((k * 31 + i * 7) % 100), i)
            for k in range(5) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, i long")
    a = sorted(map(tuple, ewma(df.coalesce(1), "k", "ts", "v", 0.25, "i").collect()))
    b = sorted(map(tuple, ewma(df.repartition(8), "k", "ts", "v", 0.25, "i").collect()))
    assert a == b


def test_trip_segments_split_on_gap(spark):
    # key 1: three points, 2nd->3rd gap exceeds threshold -> 2 trips
    df = spark.createDataFrame(
        [(1, _ts(0), 0.0, 0.0, 1), (1, _ts(1), 1.0, 0.0, 2),
         (1, _ts(9), 2.0, 0.0, 3)],
        "k long, ts timestamp, lon double, lat double, i long")
    out = trip_segments(df, "k", "ts", "lon", "lat",
                        gap_seconds=2 * 3600, order_tiebreak="i")
    trips = {r.trip_no: r for r in out.collect()}
    assert set(trips) == {1, 2}
    assert trips[1].n_points == 2 and trips[2].n_points == 1
    # 1 degree of longitude at the equator ~ 111.19 km
    assert abs(trips[1].distance_m - 111195) < 200
    assert trips[2].distance_m == 0


def test_trip_duration_and_bounds(spark):
    df = spark.createDataFrame(
        [(7, _ts(3), 0.0, 0.0, 1), (7, _ts(4), 0.0, 0.0, 2)],
        "k long, ts timestamp, lon double, lat double, i long")
    r = trip_segments(df, "k", "ts", "lon", "lat", 7200, "i").collect()[0]
    assert r.duration_sec == 3600
    assert r.end_sec - r.start_sec == 3600
    assert r.distance_m == 0


def test_psi_identical_distributions_zero(spark):
    df = spark.createDataFrame([(float(i % 50),) for i in range(500)], "v double")
    out = population_stability(df, df, "v", 0.0, 50.0, 5)
    assert all(r.term_micro == 0 for r in out.collect())
    assert out.count() == 5


def test_psi_detects_shift(spark):
    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], "v double")
    b = spark.createDataFrame([(float(i % 10) + 40,) for i in range(100)], "v double")
    out = population_stability(a, b, "v", 0.0, 50.0, 5)
    total = sum(r.term_micro for r in out.collect()) / 1e6
    assert total > 1.0  # disjoint supports -> large PSI


def test_psi_clamps_out_of_range(spark):
    a = spark.createDataFrame([(-5.0,), (100.0,)], "v double")
    out = population_stability(a, a, "v", 0.0, 50.0, 5)
    bins = sorted(r.bin for r in out.collect())
    assert bins == [0, 4]  # clamped to edge bins, no rows lost


def test_gapfill_spine_guard_raises_on_sparse_wide_key(spark):
    # one key with 2 points a year apart at 1-second buckets would need
    # ~31.5M spine rows; the guard must fail LOUDLY, naming the key
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    df = spark.createDataFrame(
        [(7, dt.datetime(2023, 1, 1), 1.0),
         (7, dt.datetime(2024, 1, 1), 2.0)],
        "k long, ts timestamp, v double")
    guarded = resample_gapfill(df, "ts", "v", 1, "k",
                               max_buckets_per_key=1_000_000)
    with pytest.raises(Exception, match="max_buckets_per_key"):
        guarded.collect()
    # raising the cap (explicit opt-in) or coarsening the bucket works
    ok = resample_gapfill(df, "ts", "v", 86400, "k").count()
    assert ok == 366


def test_trajectory_topk_similar_identical_trajectories(spark):
    """Two keys visiting the same cells must be each other's rank-1
    neighbor with jaccard 1.0; a disjoint key matches nothing."""
    from geoparquet_io_spark.operators.timeseries import \
        trajectory_topk_similar

    rows = []
    for i in range(6):
        rows.append(("a", float(i * 10), 0.0))
        rows.append(("b", float(i * 10) + 1.0, 0.5))   # same 10-deg cells
        rows.append(("c", float(i * 10), 500.0 + i))   # far away
    df = spark.createDataFrame(rows, ["user", "x", "y"])
    out = {(r["user"], r["rank"]): (r["neighbor"], r["jaccard"])
           for r in trajectory_topk_similar(
               df, "user", "x", "y", cell_size=10.0, k=3).collect()}
    assert out[("a", 1)] == ("b", 1.0)
    assert out[("b", 1)] == ("a", 1.0)
    assert ("c", 1) not in out                       # no shared cells


def test_trajectory_topk_hot_cell_guard(spark):
    """Adversarial everyone-visits-one-cell corpus: with max_cell_freq
    set, the globally-hot cell is dropped BEFORE the self-join, so pair
    volume is bounded by the discriminative cells only — and rankings
    through those cells are unchanged (the hot cell carried no
    signal).  Without the cap the same corpus pairs everyone with
    everyone."""
    from geoparquet_io_spark.operators.timeseries import (
        trajectory_cell_signature, trajectory_topk_similar)

    n_users = 60
    rows = []
    for u in range(n_users):
        rows.append((f"u{u:02d}", 0.5, 0.5))            # THE airport cell
        rows.append((f"u{u:02d}", 100.0 + 10.0 * u, 0.5))  # private cell
        if u % 2 == 0:                                   # pair structure
            rows.append((f"u{u:02d}", -50.0 + 10.0 * (u // 2), 30.0))
            rows.append((f"u{(u + 1) % n_users:02d}",
                         -50.0 + 10.0 * (u // 2), 30.0))
    df = spark.createDataFrame(rows, ["user", "x", "y"])

    uncapped = trajectory_topk_similar(df, "user", "x", "y",
                                       cell_size=1.0, k=n_users)
    capped = trajectory_topk_similar(df, "user", "x", "y",
                                     cell_size=1.0, k=n_users,
                                     max_cell_freq=10)
    # bounded: hot cell gone -> only the shared pair-cells produce
    # candidates (2 per shared cell), nothing close to n^2
    n_cap = capped.count()
    assert n_cap < 2 * n_users
    assert uncapped.count() >= n_users * (n_users - 1)   # everyone pairs
    # neighbors that DO survive are exactly the pair-structure ones
    surv = {(r["user"], r["neighbor"]) for r in capped.collect()}
    for a, b in surv:
        assert abs(int(a[1:]) - int(b[1:])) in (1, n_users - 1)
    # and the guard leaves a no-hot-cell corpus byte-identical
    clean = df.filter("x > 50")                          # drop airport rows
    base = trajectory_topk_similar(clean, "user", "x", "y",
                                   cell_size=1.0, k=5)
    guarded = trajectory_topk_similar(clean, "user", "x", "y",
                                      cell_size=1.0, k=5,
                                      max_cell_freq=10)
    assert sorted(map(tuple, base.collect())) == \
        sorted(map(tuple, guarded.collect()))
    # sanity: the hot cell really was above the cap
    sig = trajectory_cell_signature(df, "user", "x", "y", 1.0)
    top = sig.groupBy("cx", "cy").count().agg({"count": "max"}) \
        .collect()[0][0]
    assert top == n_users


def test_trajectory_topk_plan_is_bucketed(spark):
    from geoparquet_io_spark.operators.timeseries import \
        trajectory_topk_similar

    df = spark.createDataFrame([("a", 1.0, 1.0)], ["user", "x", "y"])
    plan = trajectory_topk_similar(df, "user", "x", "y")._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_psi_excludes_null_and_nan(spark):
    from geoparquet_io_spark.operators.timeseries import population_stability

    a = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    b_dirty = spark.createDataFrame(
        [(float(v),) for v in range(10)]
        + [(None,)] * 6 + [(float("nan"),)] * 6, "v double")
    clean = population_stability(a, a, "v", 0.0, 10.0, n_bins=5)
    dirty = population_stability(a, b_dirty, "v", 0.0, 10.0, n_bins=5)
    # identical value distributions: PSI terms must be identical even
    # with nulls/NaNs present (they were silently binned into bin 0)
    get = lambda df: sorted((r["bin"], r["n_b"], r["term_micro"])
                            for r in df.collect())
    assert get(clean) == get(dirty)


def test_haversine_antipodal_no_nan(spark):
    from pyspark.sql import functions as F

    from geoparquet_io_spark.operators.timeseries import haversine_km

    df = spark.createDataFrame([(45.0, 120.0, -45.0, -60.0)],
                               "lat1 double, lon1 double, lat2 double, lon2 double")
    d = df.select(haversine_km(F.col("lat1"), F.col("lon1"),
                               F.col("lat2"), F.col("lon2")).alias("d")) \
        .first()["d"]
    import math
    assert not math.isnan(d)
    assert abs(d - math.pi * 6371.0088) < 1.0     # antipodal = half circumference


def test_resample_gapfill_no_interp_has_filled_value(spark):
    from geoparquet_io_spark.operators.timeseries import resample_gapfill

    df = spark.createDataFrame(
        [(1, 0, 5.0), (1, 50_000, 7.0)],
        "user_id long, t long, value double").selectExpr(
        "user_id", "CAST(to_timestamp(t) AS timestamp) AS ts", "value")
    out = resample_gapfill(df, "ts", "value", 21600, "user_id",
                           interpolate=False)
    assert "filled_value" in out.columns
    rows = {r["bucket_sec"]: (r["filled_value"], r["is_gap"])
            for r in out.collect()}
    assert rows[0] == (5.0, False)
    assert rows[21600][1] is True and rows[21600][0] is None


def test_cell_signature_drops_null_coords(spark):
    from geoparquet_io_spark.operators.discovery import cell_signature

    df = spark.createDataFrame(
        [(1.0, 1.0), (None, 2.0), (float("nan"), 3.0), (11.0, 1.0)],
        "x double, y double")
    cells = cell_signature(df, "x", "y", 5.0).collect()
    assert len(cells) == 2
    assert all(r["cx"] is not None and r["cy"] is not None for r in cells)


def test_cms_join_size_disjoint_keys_is_zero(spark):
    from geoparquet_io_spark.operators.sketches import (
        cms_join_size_estimate,
        count_min_sketch,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "k string")
    ca = count_min_sketch(a, "k", depth=4, width=64)
    cb = count_min_sketch(b, "k", depth=4, width=64)
    est = cms_join_size_estimate(ca, cb).first()["est_join_rows"]
    assert est is not None
    # the min over rows is 0 whenever ANY hash row separates the key
    # sets perfectly; with 4 rows x 64 buckets over 50+50 keys that is
    # overwhelmingly likely — and never NULL either way
    assert est >= 0


def test_kmv_overlap_empty_sketches_zero(spark):
    from geoparquet_io_spark.operators.sketches import (
        kmv_overlap_estimate,
        kmv_sketch,
    )

    e = spark.createDataFrame([], "v string")
    sa, sb = kmv_sketch(e, "v"), kmv_sketch(e, "v")
    row = kmv_overlap_estimate(sa, sb).first()
    assert (row["union_distinct_est"], row["intersect_est"],
            row["jaccard_micro"]) == (0, 0, 0)


def test_r9_validation_and_null_semantics(spark):
    """r9 review fixes: zero-width buckets and degenerate PSI ranges
    raise instead of silently collapsing; ewma skips nulls per the
    documented recurrence; trip distance bridges across null fixes."""
    import pytest
    from geoparquet_io_spark.operators.timeseries import resample

    df = spark.createDataFrame(
        [(1, _ts(0), 1.0)], "k long, ts timestamp, v double")
    with pytest.raises(ValueError, match="every_seconds"):
        resample(df, "ts", "v", every_seconds=0)
    with pytest.raises(ValueError, match="every_seconds"):
        resample_gapfill(df, "ts", "v", every_seconds=0, key_column="k")
    with pytest.raises(ValueError, match="hi must be > lo"):
        population_stability(df, df, "v", lo=5.0, hi=5.0, n_bins=10)
    with pytest.raises(ValueError, match="n_bins"):
        population_stability(df, df, "v", lo=0.0, hi=1.0, n_bins=0)


def test_ewma_null_rows_skip_recurrence(spark):
    """NULL value: emits NULL and the recurrence continues from the
    previous non-null state — [1, NULL, 3] at alpha .5 is [1, NULL, 2],
    not the carried-and-reweighted 2.333 pandas default (r9 review)."""
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0, 0), (1, _ts(1), None, 1), (1, _ts(2), 3.0, 2)],
        "k long, ts timestamp, v double, i long")
    out = {r.rn: r.ewma for r in
           ewma(df, "k", "ts", "v", alpha=0.5, order_tiebreak="i").collect()}
    assert out[1] == 1.0
    assert out[2] is None
    assert out[3] == 2.0


def test_trip_segments_null_coordinate_bridges(spark):
    """A fix with NULL lon/lat is dropped and the adjacent real fixes
    bridge: the trip's distance must equal the 2-point direct leg, not
    silently omit both legs around the null (r9 review)."""
    rows = [(1, _ts(0, 0), 0.0, 0.0),
            (1, _ts(0, 1), None, None),
            (1, _ts(0, 2), 1.0, 0.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, lon double, lat double")
    got = trip_segments(df, "k", "ts", "lon", "lat",
                        gap_seconds=3600).collect()
    assert len(got) == 1
    t = got[0]
    assert t["n_points"] == 2
    # 1 degree of longitude on the equator ~ 111.19 km
    assert abs(t["distance_m"] - 111_195) < 500
