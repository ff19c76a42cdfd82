"""fuzzy_join (SymSpell deletion-neighborhood linkage) and funnel_steps
(ordered-sequence analytics)."""

import itertools

import pytest
from pyspark.sql import functions as F


def _lev(a, b):
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[:], i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return d[-1]


WORDS = ["kitten", "sitten", "sittin", "sitting", "mitten", "apple",
         "appel", "aple", "spark", "shark", "stark", "sparky", ""]


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_join_complete_and_exact(spark, k):
    from geoparquet_io_spark.operators.linkage import fuzzy_join

    left = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "lid int, ls string")
    right = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "rid int, rs string")
    got = sorted((r["lid"], r["rid"], r["distance"]) for r in
                 fuzzy_join(left, right, "lid", "ls", "rid", "rs",
                            k).collect())
    exp = sorted((i, j, _lev(a, b)) for (i, a), (j, b) in
                 itertools.product(enumerate(WORDS), repeat=2)
                 if _lev(a, b) <= k)
    assert got == exp


def test_fuzzy_join_has_no_cartesian(spark):
    from geoparquet_io_spark.operators.linkage import fuzzy_join
    from geoparquet_io_spark.plans import formatted_plan

    left = spark.createDataFrame([(1, "abc")], "lid int, ls string")
    right = spark.createDataFrame([(1, "abd")], "rid int, rs string")
    plan = formatted_plan(
        fuzzy_join(left, right, "lid", "ls", "rid", "rs", 1))
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan, plan


def test_fuzzy_join_rejects_bad_k(spark):
    from geoparquet_io_spark.operators.linkage import fuzzy_join

    df = spark.createDataFrame([(1, "a")], "i int, s string")
    with pytest.raises(ValueError):
        fuzzy_join(df, df, "i", "s", "i", "s", 0)
    with pytest.raises(ValueError):
        fuzzy_join(df, df, "i", "s", "i", "s", 3)


# ---------------------------------------------------------------------------
# funnel_steps
# ---------------------------------------------------------------------------

def _ts(s):
    return f"2024-01-01 {s}"


def test_funnel_strict_ordering(spark):
    from geoparquet_io_spark.operators.stats import funnel_steps

    rows = [
        # u1 completes A -> B -> C in order
        (1, _ts("10:00:00"), "A"), (1, _ts("10:05:00"), "B"),
        (1, _ts("10:10:00"), "C"),
        # u2: B happens BEFORE A -> only step 1 counts; C before B too
        (2, _ts("09:00:00"), "B"), (2, _ts("09:30:00"), "A"),
        (2, _ts("09:10:00"), "C"),
        # u3: A then C (no B) -> steps_completed 1
        (3, _ts("08:00:00"), "A"), (3, _ts("08:30:00"), "C"),
        # u4: never does A -> absent from output
        (4, _ts("07:00:00"), "B"), (4, _ts("07:30:00"), "C"),
        # u5: simultaneous A and B -> strict > excludes B
        (5, _ts("06:00:00"), "A"), (5, _ts("06:00:00"), "B"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, e string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["user_id"]: (r["steps_completed"], r["t_2"], r["t_3"])
           for r in funnel_steps(df, "user_id", "ts", "e",
                                 ["A", "B", "C"]).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert out[1][0] == 3
    assert out[2][0] == 1 and out[2][1] is None
    assert out[3][0] == 1
    assert out[5][0] == 1  # strict inequality: same-instant B not counted
    # u2 retry: a LATER B after A does count
    rows.append((2, _ts("09:40:00"), "B"))
    df2 = spark.createDataFrame(rows, "user_id int, ts string, e string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out2 = {r["user_id"]: r["steps_completed"]
            for r in funnel_steps(df2, "user_id", "ts", "e",
                                  ["A", "B", "C"]).collect()}
    assert out2[2] == 2  # A (09:30) -> B (09:40); C (09:10) too early


def test_funnel_no_window_in_plan(spark):
    from geoparquet_io_spark.operators.stats import funnel_steps
    from geoparquet_io_spark.plans import formatted_plan

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "A")],
        "user_id int, ts string, e string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    plan = formatted_plan(funnel_steps(df, "user_id", "ts", "e",
                                       ["A", "B"]))
    assert "Window" not in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan, plan
