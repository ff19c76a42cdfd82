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
