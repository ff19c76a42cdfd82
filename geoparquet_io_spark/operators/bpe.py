"""Distributed BPE tokenizer training (Sennrich et al. 2016, byte-pair
encoding on word-internal character pairs) and the matching encoder.

Why this distributes well: after the first word-count aggregate the
iterative phase never touches the corpus again — it runs on the DISTINCT
word table (vocabulary-sized: millions of rows at 100 TB corpus scale,
not billions), so each merge iteration is one map-only projection plus
one small pair-count aggregate.  The per-iteration driver traffic is a
single (pair, count) row.

Representation: a word is its space-joined symbol string ("h e l l o");
a merge rewrites every non-overlapping left-to-right occurrence of
" A B " to " AB " on the delimiter-padded string — the same scan order
Python's ``str.replace``, Spark's ``replace`` and DuckDB's ``replace``
all implement, which is what makes the unrolled-SQL oracle exact.

Simplification vs the paper: no end-of-word marker symbol (merges never
cross word boundaries either way); tie-breaks are (count DESC, pair
ASC), deterministic across engines for ASCII corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoparquet_io_spark.operators.text import tokens


def word_counts(df: DataFrame, text_column: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens of lowercased text."""
    from geoparquet_io_spark.operators.skew import spread

    return (spread(df)
            .select(F.explode(tokens(F.lower(F.col(text_column))))
                    .alias("word"))
            .filter(F.length("word") > 0)
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _char_split(word):
    """'hello' -> 'h e l l o' (one space between code points)."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def _pair_counts(sym_df: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol table.  Overlapping
    occurrences all count (Sennrich's get_stats), each weighted by the
    word's corpus frequency."""
    arr = F.split(F.col("sym"), " ")
    pairs = (sym_df.withColumn("a", arr)
             .filter(F.size("a") >= 2)
             .select("cnt", F.explode(F.expr(
                 "transform(sequence(1, size(a) - 1), "
                 "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"
             )).alias("pair")))
    return pairs.groupBy("pair").agg(F.sum("cnt").alias("c"))


def train_bpe(df: DataFrame, text_column: str = "text",
              num_merges: int = 16, min_pair_count: int = 2) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a corpus.  Returns a small
    DataFrame (rank, pair, merged, pair_count) in merge order.

    Each iteration: one pair-count aggregate over the vocab table
    (map-side combine), one single-row collect, one map-only rewrite
    projection.  The vocab table is localCheckpoint-ed each round so
    lineage and codegen depth stay O(1) across iterations."""
    spark = df.sparkSession
    words = word_counts(df, text_column)
    sym = words.select(_char_split(F.col("word")).alias("sym"), "cnt")
    sym = sym.localCheckpoint(eager=True)
    merges = []
    for rank in range(1, num_merges + 1):
        best = (_pair_counts(sym)
                .orderBy(F.desc("c"), F.asc("pair"))
                .limit(1).collect())
        if not best or best[0]["c"] < min_pair_count:
            break
        pair, c = best[0]["pair"], int(best[0]["c"])
        merged = pair.replace(" ", "")
        merges.append((rank, pair, merged, c))
        sym = sym.select(
            F.trim(F.replace(
                F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                F.lit(f" {pair} "), F.lit(f" {merged} "))).alias("sym"),
            "cnt")
        sym = sym.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank long, pair string, merged string, pair_count long")


def encode_bpe(df: DataFrame, merges: list[tuple[str, str]],
               text_column: str = "text",
               out_column: str = "bpe_tokens") -> DataFrame:
    """Apply learned merges (list of (pair, merged) in rank order) to
    every word of ``text_column``; adds ``out_column`` as the array of
    BPE tokens for the document.

    Map-only: the merge chain compiles to one projection (each merge is
    a literal string replace).  Keep merge counts moderate (<~200) per
    projection — chain a second ``encode_bpe`` call for larger vocabs
    to stay inside codegen limits."""
    words = tokens(F.lower(F.col(text_column)))
    sym = F.transform(words, lambda w: _char_split(w))
    for pair, merged in merges:
        sym = F.transform(sym, lambda s: F.trim(F.replace(
            F.concat(F.lit(" "), s, F.lit(" ")),
            F.lit(f" {pair} "), F.lit(f" {merged} "))))
    flat = F.flatten(F.transform(sym, lambda s: F.split(s, " ")))
    return df.withColumn(out_column,
                         F.filter(flat, lambda t: F.length(t) > 0))
