"""Text-analysis operators for large-scale training-data pipelines.

These go beyond the reference's own surface (BASELINE.json north star):
language-ID, quality scoring, token counting, fingerprinting — each
implemented with NATIVE Spark expressions only (no python UDFs), so the
whole pipeline stays inside whole-stage codegen and scales linearly.

Tokenize/explode-heavy operators call operators.skew.spread() on entry:
single-row-group inputs otherwise pin the whole map side to one task
(measured multi-x wins at sf0.1); the gate makes it a no-op whenever
the scan already parallelizes (any real multi-file lake).
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
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
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
    # a language must score AT LEAST ONE stopword hit to beat "und":
    # seeding at -1 let zero-hit (numeric/code/empty) text be labeled
    # with whatever language the scan visited last
    best_score = F.lit(0)
    # iterate in reverse so earlier (alphabetical) languages win ties
    for lang, score in reversed(scores):
        # tie -> alphabetically first wins: use >= when scanning reversed
        is_better = (score >= best_score) & (score > 0)
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return df.withColumn(column, best_lang)


def fingerprint(df: DataFrame, text_column: str = "text",
                column: str = "fingerprint") -> DataFrame:
    """Normalization-invariant document fingerprint:
    md5(lower(collapse_whitespace(text)))."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_column))), r"\s+", " ")
    return df.withColumn(column, F.md5(norm))


def repetition_features(df: DataFrame, id_column: str = "doc_id",
                        text_column: str = "text",
                        round_digits: int = 6) -> DataFrame:
    """Gopher-style repetition signals per document (public heuristics:
    Rae et al. 2021 "Scaling Language Models", repetition filters):

    - ``distinct_ratio``  — type/token ratio (low => degenerate text)
    - ``top_token_frac``  — share of the single most frequent token
    - ``top_bigram_frac`` — share of the most frequent word bigram

    Scale shape: two explodes (tokens, bigrams) each feeding a
    ``groupBy`` with map-side partial aggregation, re-aggregated per
    document, then a co-partitioned equi-join on the document id.  All
    expressions are native (codegen); no python, no window over the
    whole corpus.  Documents with fewer than 2 tokens are excluded
    (bigram metrics undefined).
    """
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
    doc = F.col(id_column).alias("doc")
    toks = (
        df.select(doc, tokens(F.lower(F.col(text_column))).alias("t"))
        .filter(F.size("t") >= 2)
    )
    tc = (
        toks.select("doc", F.explode("t").alias("term"))
        .groupBy("doc", "term").agg(F.count("*").alias("c"))
    )
    ta = tc.groupBy("doc").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_cnt"),
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat(F.element_at(F.col("t"), i), F.lit(" "),
                           F.element_at(F.col("t"), i + 1)),
    )
    bc = (
        toks.select("doc", F.explode(bigrams).alias("bigram"))
        .groupBy("doc", "bigram").agg(F.count("*").alias("c"))
    )
    ba = bc.groupBy("doc").agg(F.max("c").alias("top_bigram_cnt"))
    r = round_digits
    return ta.join(ba, "doc").select(
        F.col("doc").alias(id_column),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(F.col("n_distinct") / F.col("n_tokens"), r).alias("distinct_ratio"),
        F.round(F.col("top_cnt") / F.col("n_tokens"), r).alias("top_token_frac"),
        F.round(F.col("top_bigram_cnt") / (F.col("n_tokens") - 1), r).alias("top_bigram_frac"),
    )


def word_ngrams(tokens_col: Column, n: int) -> Column:
    """Array of word ``n``-grams (space-joined) from a token array.
    Caller must guarantee ``size(tokens_col) >= n`` (Spark's ``sequence``
    would otherwise run DESCENDING and fabricate indices)."""
    idx = F.sequence(F.lit(1), F.size(tokens_col) - (n - 1))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, i + j) for j in range(n)]
        ),
    )


def _doc_shingles(df: DataFrame, id_column: str, text_column: str,
                  n: int) -> DataFrame:
    """Distinct md5-hashed word n-gram shingles per document."""
    t = tokens(F.lower(F.col(text_column)))
    return (
        df.select(F.col(id_column).alias("doc"), t.alias("t"))
        .filter(F.size("t") >= n)
        .select("doc", F.explode(word_ngrams(F.col("t"), n)).alias("sh"))
        .select("doc", F.md5("sh").alias("h"))
        .distinct()
    )


def ngram_contamination(corpus_df: DataFrame, eval_df: DataFrame,
                        id_column: str = "doc_id", text_column: str = "text",
                        n: int = 3, round_digits: int = 6,
                        broadcast_eval: bool = True) -> DataFrame:
    """Benchmark-contamination check (public practice: the GPT-3 / Gopher
    train-test decontamination procedure): for every corpus document,
    the count and fraction of its distinct word n-grams that also occur
    anywhere in the eval set.

    Scale shape: corpus shingles are exploded + deduped per document
    (one shuffle with map-side combine); the eval side collapses to one
    DISTINCT hash set — eval benchmarks are tiny relative to a 100 TB
    corpus, so it is BROADCAST and the probe is map-side.  Final per-doc
    aggregation is the second (and last) shuffle.  Hashing shingles to
    md5 keeps join keys fixed-width and engine-portable.
    """
    cs = _doc_shingles(corpus_df, id_column, text_column, n)
    es = _doc_shingles(eval_df, id_column, text_column, n).select("h").distinct()
    es = es.withColumn("hit", F.lit(1))
    if broadcast_eval:
        es = F.broadcast(es)
    agg = (
        cs.join(es, "h", "left")
        .groupBy("doc")
        .agg(F.count("*").alias("__ns"), F.count("hit").alias("__hs"))
    )
    # EVERY corpus document gets a row — docs too short to shingle
    # surface as n_shingles=0 / rate NULL, so absence can't be misread
    # as "checked, clean" in an audit
    ids = corpus_df.select(F.col(id_column).alias("doc")).distinct()
    return (
        ids.join(agg, "doc", "left")
        .select(
            F.col("doc").alias(id_column),
            F.coalesce(F.col("__ns"), F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce(F.col("__hs"), F.lit(0)).cast("long").alias("hits"),
            F.round(F.col("__hs") / F.col("__ns"),
                    round_digits).alias("contamination_rate"),
        )
    )


# PII patterns chosen to be portable between Java regex (Spark) and RE2
# (DuckDB): plain character classes, \d, \b, bounded repetition only.
# Applied in THIS order, each on the output of the previous redaction, so
# counts and redacted text are deterministic across engines.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_column: str = "text",
              output_column: str | None = None) -> DataFrame:
    """Detect + redact PII-shaped spans (emails, IPv4 addresses, phone
    numbers) — the standard pre-training scrub pass (public practice; see
    e.g. the C4/Dolma cleanup pipelines).

    Adds ``n_<kind>`` match counts and a fully redacted text column.
    Scale shape: pure native ``regexp_count`` / ``regexp_replace``
    expressions — map-only, whole-stage codegen, zero shuffles; scales
    linearly with input bytes.  Counts are taken on the progressively
    redacted text (email first), so an IP inside an email counts once.
    """
    out = output_column or f"{text_column}_redacted"
    cur = F.col(text_column)
    counts = []
    for kind, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select("*", *counts, cur.alias(out))


def unigram_logprob(df: DataFrame, id_column: str = "doc_id",
                    text_column: str = "text",
                    round_digits: int = 6) -> DataFrame:
    """Corpus-unigram-LM document scoring: mean per-token log-probability
    under the corpus's own unigram distribution — the cheap perplexity
    proxy quality filters use (public practice: CCNet's LM filtering,
    simplified to unigrams so it is exactly SQL-expressible).

    Scale shape: one explode -> groupBy (doc, term) with map-side combine;
    vocabulary counts re-aggregated from that (second small shuffle); a
    shuffle equi-join back on ``term`` (vocab << corpus; AQE may broadcast
    it); final per-doc aggregation.  Per-term log-probs are quantized to
    integer micro-nats BEFORE summation so the per-doc sum is
    order-independent and engine-exact (float sums are not associative;
    integer sums are).
    """
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
    toks = df.select(
        F.col(id_column).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_column)))).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    # pin the (doc, term) aggregation: the total-count collect below is
    # an ACTION, and without this the scan + tokenize + aggregation
    # would run again for the scored join query (bigram_logprob already
    # checkpoints its count table for exactly this reason)
    tf = tf.localCheckpoint(eager=False)
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    total = vocab.agg(F.sum("c")).collect()[0][0]
    if total is None:
        # empty corpus: typed empty result, not a crash
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField(id_column, df.schema[id_column].dataType),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("avg_logprob", T.DoubleType()),
        ])
        return df.sparkSession.createDataFrame([], schema)
    lp_micro = F.round(
        F.log(F.col("c") / F.lit(float(total))) * 1e6, 0
    ).cast("long")
    scored = tf.join(vocab.withColumn("lp_micro", lp_micro).drop("c"), "term")
    return (
        scored.groupBy("doc")
        .agg(F.sum("tf").alias("n_tokens"),
             F.sum(F.col("tf") * F.col("lp_micro")).alias("micro_sum"))
        .select(
            F.col("doc").alias(id_column),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("micro_sum") / F.col("n_tokens") / 1e6,
                    round_digits).alias("avg_logprob"),
        )
    )


def duplicated_ngram_stats(df: DataFrame, id_column: str = "doc_id",
                           text_column: str = "text", n: int = 3,
                           round_digits: int = 6) -> DataFrame:
    """Within-corpus duplicated-text signal: for each document, the
    fraction of its distinct word n-grams that also occur in at least one
    OTHER document (the Dolma/RefinedWeb "duplicate n-gram fraction"
    heuristic — catches boilerplate and near-copies that exact-hash dedup
    misses).

    Scale shape: explode + per-doc-distinct shingles (one shuffle with
    map-side combine), shingle-frequency aggregation (second shuffle on
    the md5 key — uniformly distributed, no skew), join back, per-doc
    aggregation.  All-integer arithmetic until the final rounding.
    """
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
    sh = _doc_shingles(df, id_column, text_column, n)
    freq = sh.groupBy("h").agg(F.count("*").alias("nd"))
    return (
        sh.join(freq, "h")
        .groupBy("doc")
        .agg(F.count("*").alias("n_shingles"),
             F.sum((F.col("nd") >= 2).cast("long")).alias("dup_shingles"))
        .select(
            F.col("doc").alias(id_column),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("dup_shingles").cast("long").alias("dup_shingles"),
            F.round(F.col("dup_shingles") / F.col("n_shingles"),
                    round_digits).alias("dup_ngram_fraction"),
        )
    )


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
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
    # N rides the query as a broadcast 1-row aggregate (the bm25_scores
    # pattern) instead of a separate df.count() ACTION — the eager count
    # was a full extra corpus scan before the scoring query even started
    stats = df.agg(F.count(F.lit(1)).cast("double").alias("__ndocs"))
    toks = df.select(
        F.col(id_column).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_column)))).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # no forced broadcast: dfreq is vocabulary-sized, which grows with
    # the corpus (Heaps' law) — let AQE decide, like unigram_logprob
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(stats)).select(
        "doc", "term",
        F.round(F.col("tf") * F.log(F.lit(1.0) + F.col("__ndocs") / F.col("df")),
                round_digits).alias("tfidf"),
    )
    w = Window.partitionBy("doc").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("doc").alias(id_column), "term", "tfidf",
                    F.col("rank").cast("int").alias("rank")))


def chunk_dedup(df: DataFrame, id_column: str = "doc_id",
                text_column: str = "text", chunk_words: int = 10,
                out_column: str = "clean_text") -> DataFrame:
    """Span-level corpus dedup (the C4 / Dolma paragraph-dedup shape for
    flat text): split each document into consecutive ``chunk_words``-word
    chunks, keep only each chunk's GLOBAL first occurrence (ordered by
    (doc id, position)), and reassemble the surviving chunks in order.

    Scale shape: chunking is a native array transform (no explode-regroup
    round trip — one posexplode only); first-occurrence selection is a
    window partitioned BY CHUNK TEXT (equi-partitioned by content, the
    same key a 100 TB run would bucket on — skew only if one chunk
    dominates the corpus); reassembly is one groupBy the doc id.  Two
    shuffles total, all native expressions.
    """
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
    words = F.filter(F.split(F.col(text_column), r"\s+"),
                     lambda w: w != F.lit(""))
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "),
    )
    exploded = (
        df.select(F.col(id_column), F.posexplode(chunks)
                  .alias("__chunk_no", "__chunk"))
        .filter(F.col("__chunk") != "")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__chunk").orderBy(id_column, "__chunk_no")
    kept = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    agg = (
        kept.groupBy(id_column)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("__chunk_no", "__chunk"))),
                    lambda s: s["__chunk"],
                ), " ").alias(out_column),
            F.count("*").alias("n_kept_chunks"),
        )
    )
    # every input document gets a row: a doc whose EVERY chunk is a
    # duplicate (the function's core use case) and blank docs previously
    # vanished from the output entirely — a pipeline joining clean_text
    # back on doc_id lost those rows with no audit signal
    return (
        df.select(F.col(id_column))
        .join(agg, id_column, "left")
        .select(
            F.col(id_column),
            F.coalesce(F.col(out_column), F.lit("")).alias(out_column),
            F.coalesce(F.col("n_kept_chunks"), F.lit(0)).cast("long")
            .alias("n_kept_chunks"),
        )
    )


def bm25_scores(df: DataFrame, query_terms: list[str],
                id_column: str = "doc_id", text_column: str = "text",
                k1: float = 1.2, b: float = 0.75, k: int = 10,
                round_digits: int = 6) -> DataFrame:
    """BM25 retrieval scoring of every document against a bag of query
    terms — the classic lexical-search primitive a data pipeline uses for
    quality-targeted selection and retrieval-augmented curation.

    Okapi BM25 with the Lucene-style non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``:

        score(d) = sum_t idf(t) * tf(t,d)*(k1+1) /
                          (tf(t,d) + k1*(1 - b + b*dl(d)/avgdl))

    Scale shape: the query-term bag is a small literal, so per-document
    term frequencies are plain array expressions over the token array —
    no explode, no (doc, term) shuffle, no per-doc aggregation shuffle
    at all.  One scalar aggregate computes corpus stats AND the
    per-term document frequencies together (count/avg/sum indicators,
    map-side combined to a single row) and broadcasts back; every
    document's score is then a per-row expression and the global top-k
    is a TakeOrderedAndProject.  Zero document-keyed exchanges, no
    python, no driver loops.  Returns the top-``k`` docs (score desc,
    id asc tie-break).
    """
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
    terms = sorted(set(t.lower() for t in query_terms))

    docs = df.filter(F.length(F.trim(F.col(text_column))) > 0).select(
        F.col(id_column).alias("doc"),
        tokens(F.lower(F.col(text_column))).alias("__toks"),
    ).withColumn("dl", F.size("__toks").cast("double"))

    # per-doc tf of each literal term: one array traversal per term,
    # computed in the scan projection (tf == the old explode+count).
    # NB: the lambda must take exactly ONE argument — a second parameter
    # (even a defaulted one) makes pyspark pass the element INDEX to it.
    def _tf(term: str) -> Column:
        return F.size(F.filter("__toks", lambda x: x == F.lit(term)))

    tfs = docs.select(
        "doc", "dl",
        *[_tf(t).cast("double").alias(f"__tf{i}")
          for i, t in enumerate(terms)])

    # ONE scalar agg: corpus stats + per-term document frequencies
    # (df(t) == number of docs with tf(t) >= 1, exactly the old
    # explode->filter->groupBy count) broadcast as a 1-row dimension
    stats = tfs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("double"))
          .alias(f"__df{i}") for i in range(len(terms))])

    scored = tfs.crossJoin(F.broadcast(stats))

    def _score(i: int) -> Column:
        tf, dfq = F.col(f"__tf{i}"), F.col(f"__df{i}")
        idf = F.log(F.lit(1.0) + (F.col("n_docs") - dfq + F.lit(0.5))
                    / (dfq + F.lit(0.5)))
        return idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl") / F.col("avgdl")))

    # sum only over hit terms (tf=0 contributes exactly +0.0, but the
    # old shape had no row at all — keep the guard for -0.0/NaN safety)
    total = None
    for i in range(len(terms)):
        s = F.when(F.col(f"__tf{i}") > 0, _score(i)).otherwise(F.lit(0.0))
        total = s if total is None else total + s
    n_hit = None
    for i in range(len(terms)):
        h = (F.col(f"__tf{i}") > 0).cast("int")
        n_hit = h if n_hit is None else n_hit + h
    per_doc = (scored
               .select("doc", F.round(total, round_digits).alias("bm25"),
                       n_hit.cast("int").alias("n_terms_hit"))
               .filter(F.col("n_terms_hit") > 0))
    # global top-k as TakeOrderedAndProject (never a one-partition window
    # over the full corpus); the rank window then runs over only k rows
    topk = per_doc.orderBy(F.desc("bm25"), F.asc("doc")).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc"))
    return (topk.withColumn("rank", F.row_number().over(w).cast("int"))
            .select(F.col("doc").alias(id_column), "bm25", "n_terms_hit", "rank"))


def hashed_linear_score(df: DataFrame, weights: list[float], bias: float,
                        id_column: str = "doc_id", text_column: str = "text",
                        salt: str = "hlc",
                        round_digits: int = 6) -> DataFrame:
    """FastText-style hashed linear classifier (the public CCNet /
    LLaMA-data quality-filter shape): each token hashes into one of
    ``len(weights)`` buckets, the document score is the sigmoid of
    ``bias + mean(bucket weights)`` (mean pooling over tokens, exactly
    fastText's sentence-vector average with a 1-D output).

    Model weights arrive as a plain literal list, so the whole scorer is
    native expressions: explode -> md5-bucket -> literal-array lookup ->
    one partial-agg shuffle per doc.  No python in the plan, and the
    identical arithmetic is SQL-mirrorable for the oracle gate.
    """
    from geoparquet_io_spark.operators.sampling import _hash_draw
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)

    n_buckets = len(weights)
    if n_buckets < 1:
        raise ValueError("weights must be non-empty")
    warr = F.array(*[F.lit(float(x)) for x in weights])

    toks = df.filter(F.length(F.trim(F.col(text_column))) > 0).select(
        F.col(id_column).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_column)))).alias("term"),
    ).filter(F.length("term") > 0)
    bucket = (_hash_draw(F.col("term"), salt) % n_buckets).cast("int")
    scored = toks.select("doc", F.element_at(warr, bucket + 1).alias("w"))
    agg = scored.groupBy("doc").agg(
        F.sum("w").alias("__sw"), F.count("*").cast("double").alias("__n"))
    z = F.lit(float(bias)) + F.col("__sw") / F.col("__n")
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return agg.select(
        F.col("doc").alias(id_column),
        F.round(score, round_digits).alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


NORMALIZE_PUNCT_FROM = "\u2019\u2018\u201c\u201d\u2014\u2013\u00a0"
NORMALIZE_PUNCT_TO = "''\"\"--" + " "


def normalize_text(df: DataFrame, text_column: str = "text",
                   out_column: str = "text_norm") -> DataFrame:
    """Canonical text normalization (the C4/CCNet preprocessing staple):
    lowercase, smart-quote/dash/nbsp folding, control-character strip,
    whitespace collapse, trim.  Map-only native expressions; emits the
    normalized column plus a ``was_changed`` flag so pipelines can audit
    normalization rates."""
    t = F.col(text_column)
    norm = F.lower(t)
    norm = F.translate(norm, NORMALIZE_PUNCT_FROM, NORMALIZE_PUNCT_TO)
    norm = F.regexp_replace(norm, r"[\x00-\x1F\x7F]", " ")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    # NULL text: was_changed is FALSE, not NULL — (NULL != NULL) is NULL
    # and silently fell out of avg(was_changed)-style audit aggregates
    return (df.withColumn(out_column, norm)
            .withColumn("was_changed",
                        F.coalesce(norm != t, F.lit(False))))


def chunk_passages(df: DataFrame, id_column: str = "doc_id",
                   text_column: str = "text", size: int = 32,
                   stride: int = 24) -> DataFrame:
    """Split documents into overlapping fixed-size token passages (the
    RAG / retrieval-index chunking primitive: ``size``-token windows
    every ``stride`` tokens, last window ragged).  Map-only native
    expressions: ONE array build + ONE posexplode, no shuffle at all —
    the output inherits the input partitioning, which is exactly what a
    100 TB chunk-and-embed pipeline wants (chunking adds zero exchanges
    before the embed stage).

    Passage count per doc: ``1 + ceil(max(n_words - size, 0) / stride)``
    (so every word is covered and windows beyond the end are not
    emitted); empty docs emit nothing.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        # windows would skip words (33-40 uncovered at size=32,
        # stride=40) AND the count formula would emit empty windows past
        # the end — both violate the coverage contract above
        raise ValueError(
            f"stride ({stride}) must be <= size ({size}): larger strides "
            "leave words uncovered by any passage")
    words = F.filter(F.split(F.col(text_column), r"\s+"),
                     lambda w: w != F.lit(""))
    n = F.size(words)
    n_pass = (F.lit(1)
              + F.ceil(F.greatest(n - size, F.lit(0)) / F.lit(stride))
              .cast("int"))
    passages = F.transform(
        F.sequence(F.lit(0), n_pass - 1),
        lambda i: F.struct(
            i.alias("no"),
            F.array_join(F.slice(words, i * stride + 1, size), " ")
             .alias("p"),
        ),
    )
    exploded = (
        df.filter(n > 0)
          .select(F.col(id_column), F.explode(passages).alias("__e"))
          .select(
              id_column,
              F.col("__e.no").cast("int").alias("passage_no"),
              F.col("__e.p").alias("passage"),
          )
    )
    return exploded.withColumn(
        "n_tokens",
        F.size(F.filter(F.split(F.col("passage"), r"\s+"),
                        lambda w: w != F.lit(""))).cast("int"))


def duplicated_spans(df: DataFrame, id_column: str = "doc_id",
                     text_column: str = "text", n: int = 5,
                     round_digits: int = 6) -> DataFrame:
    """Exact-substring duplicate SPAN coverage per document — the Lee et
    al. 2021 ("Deduplicating Training Data Makes Language Models Better")
    shape: every length-``n`` token window that occurs more than once in
    the corpus marks its token range as duplicated; overlapping duplicated
    windows are merged into maximal spans (interval union), and the
    operator reports per-doc span count + duplicated-token coverage.
    The reference engine has no substring-level dedup; this is the
    standard corpus-hygiene signal its users would need at LLM scale.

    Scale shape: window generation is one array transform + posexplode
    (map-only); window frequency is ONE groupBy on the md5 of the window
    text (uniform key, map-side combine); the interval merge is a window
    partitioned BY DOCUMENT (bounded partitions — never a global window):
    island detection via running-max-end over preceding rows, then one
    per-doc aggregate.  All-integer interval arithmetic.
    """
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
    words = F.filter(F.split(F.col(text_column), r"\s+"),
                     lambda w: w != F.lit(""))
    nw = F.size(words)
    base = df.select(F.col(id_column).alias("doc"),
                     words.alias("__w"), nw.alias("__nw"))
    wins = (
        base.filter(F.col("__nw") >= n)
        .select(
            "doc", "__nw",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__nw") - n),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.md5(F.array_join(F.slice(F.col("__w"), i + 1, n),
                                           " ")).alias("h"),
                    ),
                )
            ).alias("__win"),
        )
        .select("doc", "__nw",
                F.col("__win.start").alias("start"),
                F.col("__win.h").alias("h"))
    )
    # NOTE: wins feeds both the frequency agg and the join probe side, so
    # window generation runs twice.  Persisting it was MEASURED a wash on
    # a cold run (materializing the exploded table costs what the second
    # map-phase compute costs) and at 100 TB an exploded-larger-than-input
    # cache is a spill hazard — recompute is the right trade.
    freq = wins.groupBy("h").agg(F.count("*").alias("nd"))
    dup = (wins.join(freq, "h").filter(F.col("nd") >= 2)
           .select("doc", "__nw", "start"))
    w_prev = (Window.partitionBy("doc").orderBy("start")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("doc").orderBy("start")
             .rowsBetween(Window.unboundedPreceding, 0))
    flagged = dup.withColumn(
        "__new_island",
        F.when(F.col("start") > F.coalesce(
            F.max(F.col("start") + n - 1).over(w_prev), F.lit(-1)),
            F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("__island", F.sum("__new_island").over(w_run))
    spans = (
        flagged.groupBy("doc", "__nw", "__island")
        .agg((F.max("start") - F.min("start") + n).alias("span_tokens"))
    )
    return (
        spans.groupBy("doc", "__nw")
        .agg(F.count("*").alias("n_dup_spans"),
             F.sum("span_tokens").alias("dup_tokens"))
        .select(
            F.col("doc").alias(id_column),
            F.col("__nw").cast("long").alias("n_tokens"),
            F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
            F.col("dup_tokens").cast("long").alias("dup_tokens"),
            F.round(F.col("dup_tokens") / F.col("__nw"),
                    round_digits).alias("dup_token_fraction"),
        )
    )


def quality_filter(df: DataFrame, text_column: str = "text",
                   min_words: int = 5, max_words: int = 100000,
                   min_mean_word_len: float = 2.0,
                   max_mean_word_len: float = 12.0,
                   max_symbol_ratio: float = 0.3,
                   min_stopword_hits: int = 1) -> DataFrame:
    """Composite document-quality gate (the Gopher/C4/FineWeb filter-chain
    shape, simplified to exactly SQL-expressible rules): word-count range,
    mean word length range, symbol-character ratio cap, and an
    any-common-stopword requirement.  Emits ``keep`` plus a
    comma-joined ``fail_reasons`` audit column — curation pipelines keep
    the reasons to report per-rule kill rates.

    Map-only native expressions (zero shuffles, zero UDFs): at 100 TB
    this is a pure scan-side filter that AQE can fuse with whatever
    follows.
    """
    t = F.col(text_column)
    wrds = F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(wrds)
    total_word_chars = F.length(F.regexp_replace(t, r"\s+", ""))
    mean_wl = total_word_chars / F.greatest(n_words, F.lit(1))
    symbols = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    symbol_ratio = symbols / F.greatest(F.length(t), F.lit(1))
    sw = stopword_hits(t, ENGLISH_STOPWORDS)
    reasons = F.concat_ws(
        ",",
        # NULL text must fail explicitly: every other rule's condition is
        # NULL for it, concat_ws skips NULLs, and '' would read as "keep"
        F.when(t.isNull(), F.lit("null_text")),
        F.when((n_words < min_words) | (n_words > max_words),
               F.lit("word_count")),
        F.when((mean_wl < min_mean_word_len) | (mean_wl > max_mean_word_len),
               F.lit("mean_word_len")),
        F.when(symbol_ratio > max_symbol_ratio, F.lit("symbol_ratio")),
        F.when(sw < min_stopword_hits, F.lit("stopwords")),
    )
    return (
        df.withColumn("n_words", n_words.cast("long"))
          .withColumn("mean_word_len", F.round(mean_wl, 6))
          .withColumn("symbol_ratio", F.round(symbol_ratio, 6))
          .withColumn("stopword_hits", sw.cast("long"))
          .withColumn("fail_reasons", reasons)
          .withColumn("keep", F.length(reasons) == 0)
    )


PERPLEXITY_BUCKET_LABELS = ("head", "middle", "tail")


def perplexity_buckets(df: DataFrame, id_column: str = "doc_id",
                       text_column: str = "text",
                       n_buckets: int = 3) -> DataFrame:
    """CCNet-style perplexity bucketing (public practice: CCNet splits a
    crawl into head/middle/tail thirds by LM perplexity and trains on the
    head).  Here the LM is the corpus's own unigram model
    (:func:`unigram_logprob`, exactly SQL-expressible), higher mean
    log-prob = lower perplexity = earlier bucket.

    Scale shape: the scoring is the unigram pipeline's two shuffles; the
    bucketing is an exact global rank via
    :func:`~geoparquet_io_spark.operators.sorts.global_rank`
    (range repartition + local ordinal + tiny offset table — NO
    single-partition window), then integer arithmetic
    ``((rank-1) * n_buckets) div n`` so bucket boundaries are
    engine-exact (no float division at the edges).
    """
    from geoparquet_io_spark.operators.sorts import global_rank

    # localCheckpoint (not persist): blocks auto-release when the plan
    # is GC'd — no CacheManager entry leaks across a long session.
    # LAZY: the full count on the next line materializes it anyway;
    # eager would pay one extra job cycle for the same pinned state
    scored = unigram_logprob(df, id_column, text_column) \
        .localCheckpoint(eager=False)
    n = scored.count()
    ranked = global_rank(
        scored,
        [F.col("avg_logprob").desc(), F.col(id_column).asc()],
        rank_column="__rn",
    )
    bucket_no = F.expr(f"((__rn - 1) * {int(n_buckets)}) div {max(int(n), 1)}")
    labels = F.array(*[F.lit(l) for l in PERPLEXITY_BUCKET_LABELS]) \
        if n_buckets == 3 else None
    out = ranked.withColumn("bucket_no", bucket_no.cast("int"))
    if labels is not None:
        out = out.withColumn(
            "bucket", F.element_at(labels, F.col("bucket_no") + 1))
    else:
        out = out.withColumn(
            "bucket", F.concat(F.lit("b"), F.col("bucket_no").cast("string")))
    return out.select(id_column, "n_tokens", "avg_logprob", "bucket_no",
                      "bucket")


def zipf_fit(df: DataFrame, text_column: str = "text",
             top_n: int = 500, round_digits: int = 6) -> DataFrame:
    """Zipf's-law fit over the corpus term-frequency distribution: OLS of
    ``ln(freq)`` on ``ln(rank)`` across the ``top_n`` most frequent
    terms, returning the slope (the Zipf exponent, ~ -1 for natural
    language), intercept, and R² — the classic corpus-health diagnostic
    (a synthetic/boilerplate corpus shows a visibly non-Zipfian curve).

    Scale shape: one explode -> term-count groupBy with map-side
    combine; the top-``top_n`` terms come via ``orderBy().limit()``
    (TakeOrdered — per-partition top-n, never a global sort); ranking
    and the OLS sums then run over <= ``top_n`` rows.  Engine-exact
    float parity: the ln values are quantized to integer micro-nats
    BEFORE the regression sums (integer sums are order-independent);
    the closed-form OLS arithmetic on those exact integers is the same
    double expression in both engines.
    """
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
    toks = df.select(
        F.explode(tokens(F.lower(F.col(text_column)))).alias("term")
    ).filter(F.length("term") > 0)
    tc = toks.groupBy("term").agg(F.count("*").alias("c"))
    top = tc.orderBy(F.desc("c"), F.asc("term")).limit(top_n)
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    ranked = top.withColumn("r", F.row_number().over(w))
    x = F.round(F.log(F.col("r").cast("double")) * 1e6, 0).cast("long")
    y = F.round(F.log(F.col("c").cast("double")) * 1e6, 0).cast("long")
    sums = ranked.select(x.alias("x"), y.alias("y")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = F.when(varx != 0.0, cov / varx)
    r2 = F.when((varx != 0.0) & (vary != 0.0), (cov * cov) / (varx * vary))
    intercept = F.when(varx != 0.0, (sy - (cov / varx) * sx) / n / F.lit(1e6))
    return sums.select(
        n.cast("long").alias("n_terms"),
        F.round(slope, round_digits).alias("zipf_slope"),
        F.round(intercept, round_digits).alias("zipf_intercept"),
        F.round(r2, round_digits).alias("r2"),
    )


def bigram_logprob(df: DataFrame, id_column: str = "doc_id",
                   text_column: str = "text",
                   lambda_bigram: float = 0.75,
                   round_digits: int = 6) -> DataFrame:
    """Interpolated bigram-LM document scoring: mean per-transition
    log P(w_i | w_{i-1}) where
    P = lambda * MLE_bigram + (1 - lambda) * MLE_unigram
    (Jelinek-Mercer interpolation — the classic smoothing that stays
    exactly SQL-expressible; pick an exact binary lambda so both engines
    compute identical doubles).

    Scale shape: ONE map-only pass builds (doc, w1, w2) transition rows
    from each doc's token array (no positional self-join); bigram and
    unigram count tables aggregate with map-side combine; two equi-joins
    back (count tables are vocab-sized — AQE-broadcastable).  Per-pair
    log-probs quantize to integer micro-nats before the per-doc sum, so
    results are order-independent and engine-exact (same device as
    ``unigram_logprob``)."""
    from geoparquet_io_spark.operators.skew import spread

    df = spread(df)
    toks = df.select(F.col(id_column).alias("doc"),
                     tokens(F.lower(F.col(text_column))).alias("a"))
    # filter BEFORE transform: sequence(1, 0) would generate a
    # DESCENDING [1, 0] for sub-2-token docs, not an empty list
    pairs = toks.filter(F.size("a") >= 2).select(
        "doc",
        F.explode(F.expr(
            "transform(sequence(1, size(a) - 1), "
            "i -> struct(element_at(a, i) as w1, element_at(a, i + 1) as w2))"
        )).alias("p")
    ).select("doc", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # ONE corpus-scale aggregation; unigram/next-word counts and the
    # total all roll up from the vocab-bounded bigram table instead of
    # re-tokenizing the corpus three more times.  localCheckpoint so the
    # total-count action doesn't recompute the explode for the joins.
    big = (pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
           .localCheckpoint(eager=False))
    uni = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # unigram denominator: total transitions (so the two MLEs share a
    # consistent event space: next-word distribution)
    nexts = big.groupBy(F.col("w2").alias("w")).agg(F.sum("c12").alias("c2"))
    total = big.agg(F.sum("c12")).collect()[0][0] or 0
    if total == 0:
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField(id_column, df.schema[id_column].dataType),
            T.StructField("n_transitions", T.LongType()),
            T.StructField("avg_logprob", T.DoubleType()),
        ])
        return df.sparkSession.createDataFrame([], schema)
    lam = float(lambda_bigram)
    p = (F.lit(lam) * (F.col("c12") / F.col("c1"))
         + F.lit(1.0 - lam) * (F.col("c2") / F.lit(float(total))))
    # per-DISTINCT-bigram log-prob table (vocab-bounded), then one join
    # against the per-doc transition frequencies — the corpus-sized side
    # joins once, not three times
    lp = (big.join(uni, "w1")
          .join(nexts.withColumnRenamed("w", "w2"), "w2")
          .select("w1", "w2", F.round(F.log(p) * 1e6, 0).cast("long")
                  .alias("lp_micro")))
    tf = pairs.groupBy("doc", "w1", "w2").agg(F.count("*").alias("tf"))
    scored = tf.join(lp, ["w1", "w2"])
    return (scored.groupBy("doc")
            .agg(F.sum("tf").alias("n_transitions"),
                 F.sum(F.col("tf") * F.col("lp_micro")).alias("micro_sum"))
            .select(F.col("doc").alias(id_column),
                    F.col("n_transitions").cast("long").alias("n_transitions"),
                    F.round(F.col("micro_sum") / F.col("n_transitions") / 1e6,
                            round_digits).alias("avg_logprob")))
