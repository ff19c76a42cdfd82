"""Text-analysis operators for large-scale training-data pipelines.

These go beyond the reference's own surface (BASELINE.json north star):
language-ID, quality scoring, token counting, fingerprinting — each
implemented with NATIVE Spark expressions only (no python UDFs), so the
whole pipeline stays inside whole-stage codegen and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# language -> characteristic stopwords (tiny n-gram-free heuristic; the
# point is the operator shape, not linguistic accuracy)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ich", "ein"),
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "dans"),
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty -> empty array)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_token_count(text: Column) -> Column:
    """BPE-ish sub-word estimate: words + digit runs + punctuation marks
    each count as a token."""
    words = F.size(F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda w: F.length(w) > 0))
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return (words + punct).cast("long")


def stopword_hits(text: Column, stopwords: tuple[str, ...]) -> Column:
    toks = tokens(F.lower(text))
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))


def quality_features(df: DataFrame, text_column: str = "text") -> DataFrame:
    """Length / punctuation / stopword features + a composite score in [0,1]
    (shape follows C4/Gopher-style quality filters — public heuristics)."""
    t = F.col(text_column)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    sw = stopword_hits(t, ENGLISH_STOPWORDS)
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_toks = F.greatest(n_tokens, F.lit(1))
    alpha_ratio = alpha / safe_chars
    punct_ratio = punct / safe_chars
    digit_ratio = digits / safe_chars
    stop_ratio = sw / safe_toks
    mean_tok_len = n_chars / safe_toks
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(digit_ratio * 5, F.lit(1.0)))
    )
    return (
        df.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("digit_ratio", digit_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("quality_score", score)
    )


def language_id(df: DataFrame, text_column: str = "text",
                column: str = "lang_pred") -> DataFrame:
    """Stopword-vote language identification; deterministic tie-break on
    language code order."""
    t = F.lower(F.col(text_column))
    scores = [(lang, stopword_hits(t, sws)) for lang, sws in sorted(LANG_STOPWORDS.items())]
    best_lang = F.lit("und")
    best_score = F.lit(-1)
    # iterate in reverse so earlier (alphabetical) languages win ties
    for lang, score in reversed(scores):
        is_better = score >= best_score
        strictly = score > best_score
        # tie -> alphabetically first wins: use >= when scanning reversed
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return df.withColumn(column, best_lang)


def fingerprint(df: DataFrame, text_column: str = "text",
                column: str = "fingerprint") -> DataFrame:
    """Normalization-invariant document fingerprint:
    md5(lower(collapse_whitespace(text)))."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_column))), r"\s+", " ")
    return df.withColumn(column, F.md5(norm))


def tf_idf_top_terms(df: DataFrame, id_column: str = "doc_id",
                     text_column: str = "text", k: int = 3,
                     round_digits: int = 6) -> DataFrame:
    """Top-k terms per document by tf-idf (smoothed idf:
    ln(1 + N/df)) — the classic relevance/keyword-extraction primitive a
    text-curation pipeline runs at corpus scale.

    Scale shape: explode tokens -> ONE groupBy (doc, term) with map-side
    combine -> document frequencies as a second small agg broadcast back
    -> partitioned window for the per-doc top-k.  No python, no driver
    loops; both aggregations are plain shuffles on well-distributed keys.
    Deterministic tie-break on the term string for oracle parity.
    """
    n_docs = df.count()
    toks = df.select(
        F.col(id_column).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_column)))).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc", "term",
        F.round(F.col("tf") * F.log(F.lit(1.0) + F.lit(float(n_docs)) / F.col("df")),
                round_digits).alias("tfidf"),
    )
    w = Window.partitionBy("doc").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("doc").alias(id_column), "term", "tfidf",
                    F.col("rank").cast("int").alias("rank")))
