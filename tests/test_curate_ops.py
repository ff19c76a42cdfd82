"""Unit tests for the round-2 curation batch: PII scrub, unigram LM
scoring, duplicated n-grams, MERGE/upsert — crafted fixtures with
hand-computed expectations, plus plan assertions for the scale shape."""

import math

import pytest
from pyspark.sql import functions as F


def test_pii_scrub_counts_and_redaction(spark):
    from geoparquet_io_spark.operators.text import pii_scrub

    rows = [
        (1, "mail a@b.com and c.d+x@e-f.org, ip 10.0.0.1, call 555-123-4567"),
        (2, "no pii here at all"),
        (3, "9.9.9.9 999-999-9999 z@z.io"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r for r in pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 1, 1)
    assert out[1]["text_redacted"] == (
        "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>"
    )
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[2]["text_redacted"] == "no pii here at all"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (1, 1, 1)


def test_pii_scrub_is_map_only_native(spark):
    from geoparquet_io_spark.operators.text import pii_scrub

    df = spark.createDataFrame([(1, "x")], ["id", "text"])
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unigram_logprob_hand_computed(spark):
    from geoparquet_io_spark.operators.text import unigram_logprob

    # corpus: "a a b" + "b c" -> counts a:2 b:2 c:1, N=5
    df = spark.createDataFrame([(1, "a a b"), (2, "b c")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}

    def lp_micro(c, n=5.0):
        return round(math.log(c / n) * 1e6)

    exp1 = round((2 * lp_micro(2) + lp_micro(2)) / 3 / 1e6, 6)
    exp2 = round((lp_micro(2) + lp_micro(1)) / 2 / 1e6, 6)
    assert out[1]["n_tokens"] == 3 and out[1]["avg_logprob"] == pytest.approx(exp1)
    assert out[2]["n_tokens"] == 2 and out[2]["avg_logprob"] == pytest.approx(exp2)


def test_duplicated_ngram_stats_hand_computed(spark):
    from geoparquet_io_spark.operators.text import duplicated_ngram_stats

    # docs 1 and 2 share exactly one trigram ("x y z"); doc 3 is disjoint
    df = spark.createDataFrame(
        [(1, "x y z q"), (2, "p x y z"), (3, "m n o")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in duplicated_ngram_stats(df, n=3).collect()}
    assert (out[1]["n_shingles"], out[1]["dup_shingles"]) == (2, 1)
    assert out[1]["dup_ngram_fraction"] == 0.5
    assert (out[2]["n_shingles"], out[2]["dup_shingles"]) == (2, 1)
    assert (out[3]["n_shingles"], out[3]["dup_shingles"]) == (1, 0)


def test_merge_upsert_semantics(spark):
    from geoparquet_io_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"]
    )
    changes = spark.createDataFrame(
        [(2, "b2", 25, "U"),   # update
         (3, None, 0, "D"),    # delete
         (9, "new", 99, "U")], # insert
        ["k", "s", "v", "op"],
    )
    got = sorted(tuple(r) for r in merge_upsert(base, changes, keys="k").collect())
    assert got == [(1, "a", 10), (2, "b2", 25), (9, "new", 99)]


def test_merge_upsert_rejects_missing_columns(spark):
    from geoparquet_io_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, 2)], ["k", "v"])
    changes = spark.createDataFrame([(1, "U")], ["k", "op"])
    with pytest.raises(ValueError, match="missing base columns"):
        merge_upsert(base, changes, keys="k")


def test_merge_upsert_plan_has_no_nested_loop(spark):
    from geoparquet_io_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, 10)], ["k", "v"])
    changes = spark.createDataFrame([(1, 11, "U")], ["k", "v", "op"])
    plan = merge_upsert(base, changes, keys="k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_unigram_logprob_has_no_python_eval(spark):
    from geoparquet_io_spark.operators.text import unigram_logprob

    df = spark.createDataFrame([(1, "a b"), (2, "b c")], ["doc_id", "text"])
    plan = unigram_logprob(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_normalize_text_folds_and_flags(spark):
    from geoparquet_io_spark.operators.text import normalize_text

    rows = [
        (1, "Hello’s “World” — ok now"),
        (2, "already clean"),
        (3, "Tabs\tand\ncontrol\x07chars   squeezed"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["text_norm"], r["was_changed"])
           for r in normalize_text(df).collect()}
    assert out[1] == ("hello's \"world\" - ok now", True)
    assert out[2] == ("already clean", False)
    assert out[3] == ("tabs and control chars squeezed", True)


def test_normalize_text_map_only(spark):
    from geoparquet_io_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, "X")], ["doc_id", "text"])
    plan = normalize_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_histogram_bins_and_validation(spark):
    from geoparquet_io_spark.operators.stats import histogram

    df = spark.createDataFrame([(float(v),) for v in
                                [0, 1, 2.5, 9.99, 10, -1, 5, 5, 7.5]], ["x"])
    got = {r["bin"]: (r["n"], r["min_v"], r["max_v"], r["bin_lo"])
           for r in histogram(df, "x", 0.0, 10.0, 4).collect()}
    # bins of width 2.5 over [0,10): 10 and -1 excluded
    assert got[0] == (2, 0.0, 1.0, 0.0)
    assert got[1] == (1, 2.5, 2.5, 2.5)
    assert got[2] == (2, 5.0, 5.0, 5.0)
    assert got[3] == (2, 7.5, 9.99, 7.5)

    import pytest as _p
    with _p.raises(ValueError):
        histogram(df, "x", 5.0, 5.0, 4)
    with _p.raises(ValueError):
        histogram(df, "x", 0.0, 10.0, 0)


def test_profile_columns_nulls_types_and_mode_tiebreak(spark):
    from geoparquet_io_spark.operators.stats import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, None), (10, "a"), (9, "c")],
        "k int, s string")
    got = {r["col_name"]: tuple(r) for r in
           profile_columns(df, ["k", "s"]).collect()}
    # numeric min/max compare in-type (10 > 9), then cast to string
    assert got["k"] == ("k", 6, 0, 6, "1", "10", "1", 1)
    # null excluded from distinct/top; a/b tie at 2 -> smallest value wins
    assert got["s"] == ("s", 6, 1, 3, "a", "c", "a", 2)


def test_scd2_semantics(spark):
    from geoparquet_io_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "a", "2023-01-01", "2023-06-01"),  # closed history
            (1, "b", "2023-06-01", None),          # current, will change
            (2, "x", "2023-01-01", None),          # current, no change
            (3, "y", "2023-01-01", None),          # current, no-op change
            (4, None, "2023-01-01", None),         # current NULL attr
        ],
        "k int, v string, valid_from string, valid_to string") \
        .withColumn("valid_from", F.col("valid_from").cast("timestamp")) \
        .withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    ch = spark.createDataFrame(
        [
            (1, "c", "2024-01-01"),
            (3, "y", "2024-01-01"),   # identical -> no-op
            (4, None, "2024-01-01"),  # null == null -> no-op (null-safe)
            (5, "new", "2024-01-01"),
        ], "k int, v string, effective_ts string") \
        .withColumn("effective_ts",
                    F.col("effective_ts").cast("timestamp"))
    out = scd2_apply(dim, ch, "k", ["v"])
    rows = sorted(
        (r["k"], r["v"], str(r["valid_from"])[:10],
         None if r["valid_to"] is None else str(r["valid_to"])[:10])
        for r in out.collect())
    assert rows == sorted([
        (1, "a", "2023-01-01", "2023-06-01"),
        (1, "b", "2023-06-01", "2024-01-01"),   # closed by the change
        (1, "c", "2024-01-01", None),           # new current
        (2, "x", "2023-01-01", None),
        (3, "y", "2023-01-01", None),           # no-op: untouched
        (4, None, "2023-01-01", None),          # null-safe no-op
        (5, "new", "2024-01-01", None),
    ])


def test_scd2_rejects_missing_columns(spark):
    import pytest as _p

    from geoparquet_io_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame([(1,)], "k int")
    ch = spark.createDataFrame([(1,)], "k int")
    with _p.raises(ValueError, match="missing column"):
        scd2_apply(dim, ch, "k", ["v"])


def test_rrf_fusion_hand_computed(spark):
    from geoparquet_io_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                               "doc_id int, rank int")
    r2 = spark.createDataFrame([(20, 1), (40, 2)], "doc_id int, rank int")
    got = {r["doc_id"]: (r["rrf_score"], r["n_rankings"], r["rank"])
           for r in rrf_fuse([r1, r2], "doc_id", k=60).collect()}
    # doc 20: 1/62 + 1/61; doc 10: 1/61; doc 40: 1/62; doc 30: 1/63
    assert got[20][1] == 2 and got[20][2] == 1
    assert abs(got[20][0] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert [got[i][2] for i in (20, 10, 40, 30)] == [1, 2, 3, 4]


def test_grouped_outliers_semantics(spark):
    from geoparquet_io_spark.operators.stats import grouped_outliers

    rows = ([("a", 10.0)] * 10 + [("a", 1000.0)]   # clear outlier
            + [("b", 5.0)] * 5)                     # zero variance
    df = spark.createDataFrame(rows, "g string, v double")
    out = grouped_outliers(df, "g", "v", z=2.0).collect()
    a_flags = [(r["v"], r["is_outlier"]) for r in out if r["g"] == "a"]
    assert (1000.0, True) in a_flags
    assert all(not f for v, f in a_flags if v == 10.0)
    b = [r for r in out if r["g"] == "b"]
    assert all(not r["is_outlier"] and r["z_score"] is None for r in b)


def test_grouped_outliers_no_window(spark):
    from geoparquet_io_spark.operators.stats import grouped_outliers
    from geoparquet_io_spark.plans import formatted_plan

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    plan = formatted_plan(grouped_outliers(df, "g", "v"))
    assert "Window" not in plan, plan


def test_grouped_quantiles_hand_computed(spark):
    from geoparquet_io_spark.operators.stats import grouped_quantiles

    df = spark.createDataFrame(
        [("a", v) for v in [1.0, 2.0, 3.0, 4.0]] + [("b", 10.0)],
        "g string, v double")
    got = {(r["g"], r["probability"]): r["quantile"]
           for r in grouped_quantiles(df, "g", "v", [0.5, 1.0]).collect()}
    assert got[("a", 0.5)] == 2.5   # linear interpolation
    assert got[("a", 1.0)] == 4.0
    assert got[("b", 0.5)] == 10.0


def test_cohort_retention_hand_computed(spark):
    from geoparquet_io_spark.operators.stats import cohort_retention

    rows = [
        (1, "2024-01-01 10:00:00"),  # cohort wk of Jan 1 (Monday)
        (1, "2024-01-09 10:00:00"),  # next week -> index 1
        (2, "2024-01-03 10:00:00"),  # same cohort, only week 0
        (3, "2024-01-10 10:00:00"),  # cohort Jan 8
        (3, "2024-01-22 10:00:00"),  # two weeks later -> index 2
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(str(r["cohort"])[:10], r["period_index"]): r["n_users"]
           for r in cohort_retention(df, "user_id", "ts").collect()}
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1, ("2024-01-08", 2): 1,
    }


def test_grouped_outliers_keeps_null_group_rows(spark):
    """NULL group keys must not be dropped (null-safe join): they form
    their own group and get flagged against that group's stats."""
    from geoparquet_io_spark.operators.stats import grouped_outliers

    df = spark.createDataFrame(
        [(None, 1.0), (None, 1.0), (None, 1.0), (None, 100.0),
         ("a", 5.0), ("a", 5.1)],
        "g string, v double")
    out = grouped_outliers(df, "g", "v", z=1.0).collect()
    assert len(out) == 6  # every input row survives
    nulls = [r for r in out if r.g is None]
    assert len(nulls) == 4
    assert sum(r.is_outlier for r in nulls) >= 1  # 100.0 flagged


def test_pack_sequences_hand_computed(spark):
    """Chunk layout is the exact concat-and-chunk rule: exclusive prefix
    offsets, boundary documents span chunks, empty docs sit in their
    start chunk, negative counts are rejected."""
    import pytest

    from geoparquet_io_spark.operators.sampling import pack_sequences

    rows = [(1, 3), (2, 5), (3, 0), (4, 9), (5, 2)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = {r["doc_id"]: (r["start_offset"], r["first_chunk"],
                         r["last_chunk"], r["chunks_spanned"])
           for r in pack_sequences(df, max_tokens=4).collect()}
    # offsets: 0, 3, 8, 8, 17
    assert out[1] == (0, 0, 0, 1)      # tokens 0-2 -> chunk 0
    assert out[2] == (3, 0, 1, 2)      # tokens 3-7 -> spans chunks 0-1
    assert out[3] == (8, 2, 2, 1)      # empty doc at offset 8 -> chunk 2
    assert out[4] == (8, 2, 4, 3)      # tokens 8-16 -> chunks 2,3,4
    assert out[5] == (17, 4, 4, 1)     # tokens 17-18 -> chunk 4

    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(df, max_tokens=0)
    bad = spark.createDataFrame([(1, -2)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError, match="negative token counts"):
        pack_sequences(bad, max_tokens=4).collect()
    nul = spark.createDataFrame([(1, 3), (2, None)],
                                "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="NULL values"):
        pack_sequences(nul, max_tokens=4).collect()


def test_pack_sequences_distributed_prefix_matches_global(spark):
    """The two-pass prefix sum (range partitions + driver prefix +
    per-partition windows) must equal the single global running sum,
    and the plan must not contain a partition-less global window."""
    from pyspark.sql import Window

    from geoparquet_io_spark.operators.sampling import pack_sequences

    rows = [(i, (i * 7) % 13) for i in range(1, 501)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]) \
        .repartition(8)
    got = {r["doc_id"]: r["start_offset"]
           for r in pack_sequences(df, max_tokens=32).collect()}
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    exp = {r["doc_id"]: r["s"] or 0
           for r in df.select("doc_id", F.sum("n_tokens").over(w)
                              .alias("s")).collect()}
    assert got == exp
    plan = pack_sequences(df, max_tokens=32)._jdf \
        .queryExecution().executedPlan().toString()
    # per-partition windows only: every window spec carries __pid
    import re
    for frag in re.findall(r"Window \[[^\]]*\]", plan):
        assert "__pid" in frag or "windowspecdefinition" not in frag


def test_quantile_labels_round_not_truncate(spark):
    from geoparquet_io_spark.operators.stats import column_quantiles

    df = spark.range(100).selectExpr("CAST(id AS DOUBLE) AS v")
    out = column_quantiles(df, "v", probabilities=(0.29, 0.57, 0.055))
    assert out.columns == ["p29", "p57", "p5_5"]


def test_mad_outliers_null_group_flagged(spark):
    """A NULL group key is a real group: its outliers must be flagged,
    not silently dropped by an inner equi-join."""
    from geoparquet_io_spark.operators.stats import mad_outliers

    rows = [(None, float(v)) for v in [10, 10, 10, 11, 9, 10, 500]] + \
           [("a", float(v)) for v in [1, 1, 1, 2, 0, 1, 300]]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = mad_outliers(df, "g", "v", k=3.5).collect()
    flagged = {(r["g"], r["v"]) for r in out}
    assert (None, 500.0) in flagged and ("a", 300.0) in flagged


def test_chi_square_ignores_null_categories(spark):
    """NULL categories are excluded consistently (n, marginals, dof and
    the cell sum must describe the same table)."""
    from geoparquet_io_spark.operators.stats import chi_square_independence

    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
            (None, "x"), ("a", None)]
    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi_square_independence(df, "r", "c").collect()[0]
    assert out["n"] == 4          # null-key rows excluded from N too
    assert out["dof"] == 1        # 2x2, null categories not counted
    assert abs(out["chi2"]) < 1e-12  # perfectly independent 2x2


def test_check_spatial_order_single_row_partitions(spark):
    """All-single-row partitions -> no consecutive pairs; must report
    unordered NaN ratio, not crash on float(None)."""
    import math

    from geoparquet_io_spark.operators.stats import check_spatial_order
    from geoparquet_io_spark.queries import _events_points
    from tests.conftest import SF_SMOKE

    gt = _events_points(spark, SF_SMOKE)
    one_per_part = gt.df.limit(40).repartition(64)
    rep = check_spatial_order(one_per_part, geometry_column="geometry")
    # 64 partitions / 40 rows: most partitions single-row; if ANY pair
    # exists the ratio is finite, otherwise NaN — either way no crash
    assert rep["random_avg_distance"] is not None
    assert isinstance(rep["ratio"], float)


def test_cohort_retention_calendar_days(spark):
    """period_index comes from calendar-day arithmetic (DST-immune)."""
    import datetime as dt

    from geoparquet_io_spark.operators.stats import cohort_retention

    rows = [(1, dt.datetime(2024, 3, 4, 12)),   # cohort week Mar 4
            (1, dt.datetime(2024, 3, 11, 1)),   # next week -> index 1
            (2, dt.datetime(2024, 3, 4, 8))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {(str(r["cohort"])[:10], r["period_index"]): r["n_users"]
           for r in cohort_retention(df, "user_id", "ts", unit="week").collect()}
    assert out[("2024-03-04", 0)] == 2
    assert out[("2024-03-04", 1)] == 1


def test_token_budget_rejects_nulls(spark):
    import pytest as _p

    from geoparquet_io_spark.operators.sampling import (
        select_under_token_budget,
    )

    base = [(1, 0.9, 10), (2, 0.5, 10)]
    df_ns = spark.createDataFrame(base + [(3, None, 10)],
                                  "doc_id long, score double, n_tokens long")
    with _p.raises(ValueError, match="score"):
        select_under_token_budget(df_ns, 15)
    df_nt = spark.createDataFrame(base + [(3, 0.7, None)],
                                  "doc_id long, score double, n_tokens long")
    with _p.raises(ValueError, match="n_tokens"):
        select_under_token_budget(df_nt, 15)
    # clean data still selects
    df_ok = spark.createDataFrame(base,
                                  "doc_id long, score double, n_tokens long")
    assert [r["doc_id"] for r in select_under_token_budget(df_ok, 15)
            .collect()] == [1]


def test_dedup_exact_key_column_excluded_from_default(spark):
    from geoparquet_io_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], "doc_id long, text string")
    out = dedup_exact(df, key_column="doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3]   # smallest key wins


def test_minhash_band_divisibility_all_entry_points(spark):
    import pytest as _p

    from geoparquet_io_spark.operators.dedup import (
        dedup_minhash,
        minhash_candidate_pairs,
        minhash_star_edges,
    )

    df = spark.createDataFrame([(1, "hello world")], "id long, text string")
    for fn in (minhash_candidate_pairs, minhash_star_edges):
        with _p.raises(ValueError, match="divisible"):
            fn(df, "id", num_hashes=10, bands=4)
    with _p.raises(ValueError, match="pair_mode"):
        dedup_minhash(df, "id", pair_mode="stars")


# --- r9 review-fix regressions ------------------------------------------------

def test_chunk_dedup_emits_fully_duplicated_docs(spark):
    """A doc whose EVERY chunk is a duplicate (and a blank doc) must
    still appear in the output with clean_text='' / n_kept_chunks=0 —
    they previously vanished entirely (r9 review)."""
    from geoparquet_io_spark.operators.text import chunk_dedup

    body = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, body), (2, body), (3, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["clean_text"], r["n_kept_chunks"])
           for r in chunk_dedup(df, chunk_words=10).collect()}
    assert len(out) == 3
    assert out[1] == (body, 1)        # first occurrence survives
    assert out[2] == ("", 0)          # full duplicate: present, empty
    assert out[3] == ("", 0)          # blank doc: present, empty


def test_chunk_passages_rejects_stride_gt_size(spark):
    """stride > size leaves words uncovered and emits empty windows —
    both violate the coverage contract, so it must raise (r9 review)."""
    import pytest
    from geoparquet_io_spark.operators.text import chunk_passages

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_passages(df, size=32, stride=40)


def test_normalize_text_null_text_was_changed_false(spark):
    from geoparquet_io_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, None), (2, "A  B")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["was_changed"]
           for r in normalize_text(df).collect()}
    assert out[1] is False            # NULL text: flag is False, not NULL
    assert out[2] is True


def test_split_by_hash_rejects_negative_weight(spark):
    """Weights {-0.02, 0.94, 0.08} sum to 1 but the negative split is
    silently empty and its mass misassigned (r9 review)."""
    import pytest
    from geoparquet_io_spark.operators.sampling import split_by_hash

    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    with pytest.raises(ValueError, match="must be >= 0"):
        split_by_hash(df, "id", {"test": -0.02, "train": 0.94,
                                 "valid": 0.08})


def test_budget_selector_rejects_nan_scores_and_negative_tokens(spark):
    import math

    import pytest
    from geoparquet_io_spark.operators.sampling import (
        mixture_under_token_budget, select_under_token_budget)

    nan_df = spark.createDataFrame(
        [(1, 0.9, 10), (2, math.nan, 10), (3, 0.5, 10)],
        "doc_id long, score double, n_tokens long")
    with pytest.raises(ValueError, match="NaN"):
        select_under_token_budget(nan_df, budget=15)
    neg_df = spark.createDataFrame(
        [(1, 0.9, 10), (2, 0.8, -500), (3, 0.5, 10)],
        "doc_id long, score double, n_tokens long")
    with pytest.raises(ValueError, match="negative"):
        select_under_token_budget(neg_df, budget=15)
    neg_mix = neg_df.withColumn("source", F.lit("web"))
    with pytest.raises(ValueError, match="negative"):
        mixture_under_token_budget(neg_mix, {"web": 15})
