"""Unit tests for the round-3 text-pipeline additions: distributed
global rank, RAG passage chunking, Lee-et-al duplicated-span coverage,
the composite quality gate, and CCNet-style perplexity bucketing."""

import random
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# global_rank
# ---------------------------------------------------------------------------

def test_global_rank_matches_driver_sort(spark):
    from geoparquet_io_spark.operators.sorts import global_rank

    rng = random.Random(7)
    vals = [(i, rng.randint(0, 50)) for i in range(400)]  # heavy ties
    df = spark.createDataFrame(vals, "id long, v long").repartition(7)
    out = global_rank(df, [F.col("v").asc(), F.col("id").asc()], "rk")
    got = {r["id"]: r["rk"] for r in out.collect()}
    exp = {i: k + 1 for k, (i, _) in
           enumerate(sorted(vals, key=lambda t: (t[1], t[0])))}
    assert got == exp


def test_global_rank_has_no_single_partition_window(spark):
    """The whole point: ranks come from range partitions + local ordinals,
    never a window over SinglePartition."""
    from geoparquet_io_spark.operators.sorts import global_rank
    from geoparquet_io_spark.plans import formatted_plan

    df = spark.range(100).withColumn("v", F.col("id") % 13)
    out = global_rank(df, [F.col("v").asc(), F.col("id").asc()], "rk")
    plan = formatted_plan(out)
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan


# ---------------------------------------------------------------------------
# chunk_passages
# ---------------------------------------------------------------------------

def _mirror_passages(doc_id, text, size, stride):
    ws = [w for w in text.split(" ") if w]
    if not ws:
        return []
    n_pass = 1 + -(-max(len(ws) - size, 0) // stride)
    return [
        (doc_id, k, " ".join(ws[k * stride:k * stride + size]),
         len(ws[k * stride:k * stride + size]))
        for k in range(n_pass)
    ]


def test_chunk_passages_matches_python_mirror(spark):
    from geoparquet_io_spark.operators.text import chunk_passages

    docs = [
        (1, "a b c d e f g h i j"),
        (2, "x y"),
        (3, "   "),
        (4, ""),
        (5, " ".join(f"w{i}" for i in range(25))),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["passage_no"], r["passage"], r["n_tokens"])
        for r in chunk_passages(d, size=4, stride=3).collect())
    exp = sorted(sum((_mirror_passages(i, t, 4, 3) for i, t in docs), []))
    assert got == exp
    # full coverage: every word appears in at least one passage
    words_out = set()
    for _, _, p, _ in got:
        words_out.update(p.split(" "))
    words_in = set(w for _, t in docs for w in t.split(" ") if w)
    assert words_in <= words_out


def test_chunk_passages_is_map_only(spark):
    from geoparquet_io_spark.operators.text import chunk_passages
    from geoparquet_io_spark.plans import formatted_plan

    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = formatted_plan(chunk_passages(d))
    assert "Exchange" not in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# duplicated_spans
# ---------------------------------------------------------------------------

def test_duplicated_spans_hand_computed(spark):
    from geoparquet_io_spark.operators.text import duplicated_spans

    docs = [
        # shares the 6-token run "the quick brown fox jumps over" with doc 2
        (1, "the quick brown fox jumps over the lazy dog end"),
        (2, "start the quick brown fox jumps over something else"),
        (3, "totally unique words here only once nothing shared at all"),
        # two disjoint duplicated spans with doc 5
        (4, "alpha beta gamma xx yy zz delta epsilon zeta qq"),
        (5, "alpha beta gamma q1 q2 q3 delta epsilon zeta q4"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"], r["n_tokens"])
           for r in duplicated_spans(d, n=3).collect()}
    # docs 1/2: 4 duplicated windows merge into one 6-token span each
    assert got[1] == (1, 6, 10)
    assert got[2] == (1, 6, 9)
    assert 3 not in got  # no duplicated window -> no row
    # docs 4/5: "alpha beta gamma" and "delta epsilon zeta" = 2 spans, 3+3
    assert got[4] == (2, 6, 10)
    assert got[5] == (2, 6, 10)


def test_duplicated_spans_intra_doc_repeat_counts(spark):
    """A window repeated WITHIN one doc is duplicated text too (Lee et al.
    count all non-first occurrences, intra- or inter-document)."""
    from geoparquet_io_spark.operators.text import duplicated_spans

    d = spark.createDataFrame(
        [(1, "p q r zz p q r")], "doc_id long, text string")
    got = duplicated_spans(d, n=3).collect()
    assert len(got) == 1
    # windows at 0 ("p q r") and 4 ("p q r") duplicated -> two 3-token spans
    assert (got[0]["n_dup_spans"], got[0]["dup_tokens"]) == (2, 6)


# ---------------------------------------------------------------------------
# quality_filter
# ---------------------------------------------------------------------------

def test_quality_filter_rules_and_reasons(spark):
    from geoparquet_io_spark.operators.text import quality_filter

    docs = [
        (1, "the quick brown fox jumps over a lazy dog"),  # keep
        (2, "hi"),                                # word_count (+stopwords)
        (3, "@@@@ #### $$$$ %%%% ^^^^ &&&& the in a of"),  # symbol_ratio
        (4, "no stop words present whatsoever currently"),  # stopwords
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["keep"], r["fail_reasons"])
           for r in quality_filter(d).collect()}
    assert got[1] == (True, "")
    assert got[2][0] is False and "word_count" in got[2][1]
    assert got[3][0] is False and "symbol_ratio" in got[3][1]
    assert got[4] == (False, "stopwords")


def test_quality_filter_is_map_only(spark):
    from geoparquet_io_spark.operators.text import quality_filter
    from geoparquet_io_spark.plans import formatted_plan

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = formatted_plan(quality_filter(d))
    assert "Exchange" not in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# perplexity_buckets
# ---------------------------------------------------------------------------

def test_perplexity_buckets_even_thirds_and_order(spark):
    from geoparquet_io_spark.operators.text import perplexity_buckets

    # 4 groups of 3 docs; within a group identical scores -> doc_id tiebreak
    docs = [(i, " ".join([f"tok{i % 4}"] * 3 + ["common"]))
            for i in range(12)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    rows = perplexity_buckets(d).collect()
    assert Counter(r["bucket"] for r in rows) == Counter(
        head=4, middle=4, tail=4)
    # head bucket has the highest avg_logprob values
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["avg_logprob"])
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])


def test_perplexity_buckets_on_testdata_schema(spark):
    from geoparquet_io_spark.operators.text import perplexity_buckets

    d = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
         .filter(F.length(F.trim("text")) > 0))
    n = d.count()
    rows = perplexity_buckets(d).collect()
    assert len(rows) == n
    counts = Counter(r["bucket_no"] for r in rows)
    # exact integer-division split: sizes differ by at most 1
    assert set(counts) == {0, 1, 2}
    assert max(counts.values()) - min(counts.values()) <= 1


def test_empty_corpus_is_typed_empty_not_crash(spark):
    """Every text-pipeline operator must return a typed empty frame on
    an empty corpus (daily-ingest pipelines see empty partitions)."""
    from geoparquet_io_spark.operators.text import (
        chunk_passages, duplicated_spans, perplexity_buckets,
        quality_filter, unigram_logprob)

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert chunk_passages(empty).count() == 0
    assert duplicated_spans(empty).count() == 0
    assert quality_filter(empty).count() == 0
    u = unigram_logprob(empty)
    assert u.count() == 0
    assert [f.name for f in u.schema.fields] == \
        ["doc_id", "n_tokens", "avg_logprob"]
    assert perplexity_buckets(empty).count() == 0


def test_language_id_zero_hits_is_und(spark):
    from geoparquet_io_spark.operators.text import language_id

    df = spark.createDataFrame(
        [(1, "xyzzy plugh foo"), (2, ""), (3, "12345 678"),
         (4, None), (5, "the cat and the hat")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"]
           for r in language_id(df).collect()}
    assert got == {1: "und", 2: "und", 3: "und", 4: "und", 5: "en"}


def test_quality_filter_null_text_fails(spark):
    from geoparquet_io_spark.operators.text import quality_filter

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = quality_filter(df).first()
    assert row["keep"] is False
    assert row["fail_reasons"] == "null_text"


def test_chunk_passages_whitespace_tokenization(spark):
    from geoparquet_io_spark.operators.text import chunk_passages

    text = "\n".join(f"w{i}" for i in range(20))   # newline separators
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_passages(df, size=8, stride=8).collect()
    # 20 words, size=stride=8 -> passages of 8/8/4 tokens
    assert sorted(r["n_tokens"] for r in rows) == [4, 8, 8]
    # tabs too
    df2 = spark.createDataFrame([(2, "a\tb\tc  d")], "doc_id long, text string")
    assert chunk_passages(df2, size=2, stride=2).count() == 2


def test_ngram_contamination_short_docs_surface(spark):
    from geoparquet_io_spark.operators.text import ngram_contamination

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "too short"), (3, None)],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(10, "alpha beta gamma")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_shingles"], r["hits"], r["contamination_rate"])
           for r in ngram_contamination(corpus, ev, n=3).collect()}
    assert set(got) == {1, 2, 3}        # every corpus doc audited
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (0, 0, None)        # too short to shingle: explicit
    assert got[3] == (0, 0, None)
