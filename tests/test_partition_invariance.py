"""Partition-count invariance: the testdata parquet is one row group
(single input partition), so these tests re-run key operators over an
8-file copy of the same rows and require IDENTICAL results — catching
bugs that only appear with real parallelism (per-partition state,
ordinal arithmetic, map-side combines, window partitioning)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_multi(spark, tmp_path_factory):
    """documents split across 8 shuffled files."""
    p = str(tmp_path_factory.mktemp("multi") / "docs")
    (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
     .repartition(8, F.col("doc_id") * 2654435761 % 97)
     .write.parquet(p))
    return p


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_unigram_and_buckets_partition_invariant(spark, docs_multi):
    from geoparquet_io_spark.operators.text import (perplexity_buckets,
                                                    unigram_logprob)

    single = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
        .filter(F.length(F.trim("text")) > 0)
    multi = spark.read.parquet(docs_multi) \
        .filter(F.length(F.trim("text")) > 0)
    assert _rows(unigram_logprob(single)) == _rows(unigram_logprob(multi))
    assert _rows(perplexity_buckets(single)) == \
        _rows(perplexity_buckets(multi))


def test_dup_spans_and_chunk_dedup_partition_invariant(spark, docs_multi):
    from geoparquet_io_spark.operators.text import (chunk_dedup,
                                                    duplicated_spans)

    single = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    multi = spark.read.parquet(docs_multi)
    assert _rows(duplicated_spans(single, n=3)) == \
        _rows(duplicated_spans(multi, n=3))
    assert _rows(chunk_dedup(single)) == _rows(chunk_dedup(multi))


def test_minhash_pairs_partition_invariant(spark, docs_multi):
    from geoparquet_io_spark.operators.dedup import minhash_candidate_pairs

    single = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    multi = spark.read.parquet(docs_multi)
    assert _rows(minhash_candidate_pairs(single, "doc_id")) == \
        _rows(minhash_candidate_pairs(multi, "doc_id"))


def test_global_rank_partition_invariant(spark, docs_multi):
    from geoparquet_io_spark.operators.sorts import global_rank

    single = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    multi = spark.read.parquet(docs_multi)
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    a = {r["doc_id"]: r["rk"]
         for r in global_rank(single, order, "rk").collect()}
    b = {r["doc_id"]: r["rk"]
         for r in global_rank(multi, order, "rk").collect()}
    assert a == b
    # and for several explicit partition counts
    for parts in (1, 3, 17):
        c = {r["doc_id"]: r["rk"]
             for r in global_rank(multi, order, "rk",
                                  num_partitions=parts).collect()}
        assert c == a, parts


def test_token_budget_partition_invariant(spark, docs_multi):
    from geoparquet_io_spark.operators.sampling import (
        mixture_under_token_budget, select_under_token_budget)
    from geoparquet_io_spark.operators.text import tokens

    def prep(df):
        return df.filter(F.length(F.trim("text")) > 0).select(
            "doc_id", "source",
            ((F.col("doc_id") % 89).cast("double") / 89.0).alias("score"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"))

    single = prep(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    multi = prep(spark.read.parquet(docs_multi))
    assert _rows(select_under_token_budget(single, 900)) == \
        _rows(select_under_token_budget(multi, 900))
    budgets = {"src0": 300, "src1": 500}
    assert _rows(mixture_under_token_budget(single, budgets)) == \
        _rows(mixture_under_token_budget(multi, budgets))


def test_dissolve_hull_partition_invariant(spark):
    """Partial-hull merge must equal the single-pass hull regardless of
    how vertices are scattered across partitions."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.functions import geom as G
    from geoparquet_io_spark.operators.dissolve import dissolve_hull

    rows = []
    for g in range(4):
        for i in range(50):
            # circle-ish cloud plus guaranteed extreme corner points
            rows.append((g, float((i * 37) % 10), float((i * 53) % 7 + g)))
        rows += [(g, -5.0, -5.0), (g, 15.0, -5.0), (g, 15.0, 15.0),
                 (g, -5.0, 15.0)]
    df = spark.createDataFrame(rows, "grp int, x double, y double") \
        .withColumn("geometry", G.st_point(F.col("x"), F.col("y")))
    outs = []
    for parts in (1, 3, 8):
        got = {(r["grp"]): (r["n_hull_points"], round(r["hull_area"], 9))
               for r in dissolve_hull(df.repartition(parts), "grp")
               .collect()}
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
    assert all(v == (4, 400.0) for v in outs[0].values())


def test_dissolve_hull_degenerate_groups(spark):
    from pyspark.sql import functions as F

    from geoparquet_io_spark.functions import geom as G
    from geoparquet_io_spark.operators.dissolve import dissolve_hull

    rows = [("pt", 1.0, 1.0), ("pt", 1.0, 1.0),
            ("line", 0.0, 0.0), ("line", 1.0, 1.0), ("line", 2.0, 2.0)]
    df = spark.createDataFrame(rows, "grp string, x double, y double") \
        .withColumn("geometry", G.st_point(F.col("x"), F.col("y")))
    got = {r["grp"]: (r["n_hull_points"], r["hull_area"])
           for r in dissolve_hull(df, "grp").collect()}
    assert got["pt"] == (1, 0.0)
    assert got["line"] == (2, 0.0)  # collinear -> LINESTRING, area 0
