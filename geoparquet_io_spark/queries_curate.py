"""Oracle-backed queries: round-2 curation + relational-surface batch.

PII scrubbing, corpus unigram-LM scoring, within-corpus duplicated
n-grams, MERGE/upsert changelog application, pivot, ROLLUP, and windowed
event analytics.  Shares REGISTRY with queries.py (imported from there).

Float-parity strategy (same as the rest of the registry): quantize any
value that feeds a cross-row SUM to integers first (micro-nats / cents),
so summation order cannot change the result; round only at the end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from geoparquet_io_spark.queries import register
from geoparquet_io_spark.testsupport.tables import load_table

# ---------------------------------------------------------------------------
# PII scrub — the synthetic corpus contains no PII, so both engines append
# the SAME deterministic PII-shaped suffix derived from doc_id; the query
# then proves regex-dialect parity on real matches, not just zeros.
# ---------------------------------------------------------------------------

_PII_SUFFIX_SQL = (
    "substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' at 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)"
)


@register(
    "text_pii_scrub",
    f"""
    WITH synth AS (
      SELECT doc_id, {_PII_SUFFIX_SQL} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(
                regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(
                regexp_replace(
                  regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                  '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
                '\\+?\\d{{3}}[- ]\\d{{3}}[- ]\\d{{4}}')) AS BIGINT) AS n_phone,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
             '\\+?\\d{{3}}[- ]\\d{{3}}[- ]\\d{{4}}', '<PHONE>', 'g') AS text_redacted
    FROM synth
    """,
)
def q_pii_scrub(spark, sf_dir):
    from geoparquet_io_spark.operators.text import pii_scrub

    d = load_table(spark, sf_dir, "documents")
    synth = d.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" at 10.0.0."), (F.col("doc_id") % 256).cast("string"),
        ).alias("t"),
    )
    return pii_scrub(synth, text_column="t", output_column="text_redacted").select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "text_redacted"
    )


# ---------------------------------------------------------------------------
# corpus unigram-LM log-prob scoring
# ---------------------------------------------------------------------------

@register(
    "text_unigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents WHERE len(trim(text)) > 0
    ),
    tf AS (
      SELECT doc, term, COUNT(*) AS tf FROM toks
      WHERE len(term) > 0 GROUP BY doc, term
    ),
    vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY term),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM vocab),
    scored AS (
      SELECT tf.doc, tf.tf,
             CAST(ROUND(ln(vocab.c / tot.n) * 1e6) AS BIGINT) AS lp_micro
      FROM tf JOIN vocab ON tf.term = vocab.term CROSS JOIN tot
    )
    SELECT doc AS doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(tf * lp_micro) AS BIGINT) / CAST(SUM(tf) AS BIGINT) / 1e6, 6)
             AS avg_logprob
    FROM scored GROUP BY doc
    """,
)
def q_unigram_logprob(spark, sf_dir):
    from geoparquet_io_spark.operators.text import unigram_logprob

    d = load_table(spark, sf_dir, "documents")
    return unigram_logprob(d)


# ---------------------------------------------------------------------------
# within-corpus duplicated n-gram fraction
# ---------------------------------------------------------------------------

_NGRAM3_SQL = "list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"


@register(
    "text_dup_ngrams",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents WHERE len(trim(text)) > 0
    ),
    sh AS (
      SELECT DISTINCT doc_id AS doc, md5(sh) AS h
      FROM (SELECT doc_id, unnest({_NGRAM3_SQL}) AS sh
            FROM tok WHERE len(t) >= 3)
    ),
    freq AS (SELECT h, COUNT(*) AS nd FROM sh GROUP BY h)
    SELECT sh.doc AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN freq.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_shingles,
           ROUND(SUM(CASE WHEN freq.nd >= 2 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS dup_ngram_fraction
    FROM sh JOIN freq ON sh.h = freq.h
    GROUP BY sh.doc
    """,
)
def q_dup_ngrams(spark, sf_dir):
    from geoparquet_io_spark.operators.text import duplicated_ngram_stats

    d = load_table(spark, sf_dir, "documents")
    return duplicated_ngram_stats(d, n=3)


# ---------------------------------------------------------------------------
# MERGE / upsert — changelog synthesized deterministically from orders:
#   keys % 10 == 0 -> 'U' (bump cents by 1000), % 10 == 1 -> 'D' (delete),
#   % 10 == 2 -> 'U' under a fresh negative key (pure insert).
# ---------------------------------------------------------------------------

_ORDER_CENTS_SQL = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


@register(
    "merge_upsert_orders",
    f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, {_ORDER_CENTS_SQL} AS cents FROM orders
    ),
    changes AS (
      SELECT o_orderkey, o_orderstatus, cents + 1000 AS cents, 'U' AS op
      FROM base WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, cents, 'D' AS op
      FROM base WHERE o_orderkey % 10 = 1
      UNION ALL
      SELECT -o_orderkey, 'N', cents, 'U' AS op
      FROM base WHERE o_orderkey % 10 = 2
    )
    SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN c.op IS NOT NULL THEN c.cents ELSE b.cents END AS cents
    FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def q_merge_upsert(spark, sf_dir):
    from geoparquet_io_spark.operators.merge import merge_upsert

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    updates = (base.filter(F.col("o_orderkey") % 10 == 0)
               .withColumn("cents", F.col("cents") + 1000)
               .withColumn("op", F.lit("U")))
    deletes = (base.filter(F.col("o_orderkey") % 10 == 1)
               .withColumn("op", F.lit("D")))
    inserts = (base.filter(F.col("o_orderkey") % 10 == 2)
               .withColumn("o_orderkey", -F.col("o_orderkey"))
               .withColumn("o_orderstatus", F.lit("N"))
               .withColumn("op", F.lit("U")))
    changes = updates.unionByName(deletes).unionByName(inserts)
    return merge_upsert(base, changes, keys="o_orderkey")


# ---------------------------------------------------------------------------
# pivot (conditional aggregation) — cents kept integral for exact sums
# ---------------------------------------------------------------------------

@register(
    "pivot_status_by_priority",
    f"""
    WITH o AS (
      SELECT o_orderpriority, o_orderstatus, {_ORDER_CENTS_SQL} AS cents FROM orders
    )
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN cents END) AS BIGINT) AS cents_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN cents END) AS BIGINT) AS cents_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN cents END) AS BIGINT) AS cents_p,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM o GROUP BY o_orderpriority
    """,
)
def q_pivot_status(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    # one shuffle: pivot with explicit values skips the distinct-scan pass
    piv = (o.groupBy("o_orderpriority")
           .pivot("o_orderstatus", ["F", "O", "P"])
           .agg(F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n")))
    return piv.select(
        "o_orderpriority",
        F.col("F_cents").alias("cents_f"),
        F.col("O_cents").alias("cents_o"),
        F.col("P_cents").alias("cents_p"),
        (F.coalesce(F.col("F_n"), F.lit(0)) + F.coalesce(F.col("O_n"), F.lit(0))
         + F.coalesce(F.col("P_n"), F.lit(0))).cast("long").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# ROLLUP — region/nation account-balance subtotals with grouping flags
# ---------------------------------------------------------------------------

@register(
    "rollup_acctbal_region_nation",
    """
    WITH c AS (
      SELECT r.r_name, n.n_name,
             CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS cents
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM c GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup_acctbal(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name",
                F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.sum("cents").alias("cents"),
        F.count("*").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# windowed event analytics — lag / rolling frame / row_number per user
# ---------------------------------------------------------------------------

@register(
    "window_user_event_stats",
    """
    WITH e AS (
      SELECT user_id, event_id,
             CAST(ROUND(value * 1e6) AS BIGINT) AS vmicro, ts
      FROM events WHERE user_id % 50 = 7
    )
    SELECT user_id, event_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
           LAG(vmicro) OVER w AS prev_vmicro,
           CAST(SUM(vmicro) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS rolling3_vmicro
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_user_events(spark, sf_dir):
    e = (load_table(spark, sf_dir, "events")
         .filter(F.col("user_id") % 50 == 7)
         .select("user_id", "event_id",
                 F.round(F.col("value") * 1e6, 0).cast("long").alias("vmicro"), "ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-2, Window.currentRow)
    return e.select(
        "user_id", "event_id",
        F.row_number().over(w).cast("long").alias("seq"),
        F.lag("vmicro").over(w).alias("prev_vmicro"),
        F.sum("vmicro").over(wf).alias("rolling3_vmicro"),
    )


@register(
    "stats_outliers_mad",
    """
    WITH med AS (
      SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY 1
    ), j AS (
      SELECT e.event_type, e.event_id, e.value, med
      FROM events e JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type, ROUND(quantile_cont(ABS(value - med), 0.5), 6) AS mad
      FROM j GROUP BY 1
    )
    SELECT event_type, event_id, value, med, mad,
           CASE WHEN mad > 0
                THEN ROUND(ABS(value - med) / (mad * 1.4826), 6)
           END AS robust_z
    FROM j JOIN mad USING (event_type)
    WHERE ABS(value - med) > 3.5 * (mad * 1.4826)
    """,
)
def q_outliers_mad(spark, sf_dir):
    """Modified-z-score outliers per event type
    (operators/stats.py:mad_outliers).  Median/MAD via the exact
    percentile aggregate == DuckDB quantile_cont, rounded before the
    comparison so both engines test identical operands."""
    from geoparquet_io_spark.operators.stats import mad_outliers

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value")
    return mad_outliers(ev, "event_type", "value", k=3.5)


@register(
    "stats_heavy_hitters",
    """
    WITH exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM events GROUP BY 1
      HAVING COUNT(*) >= CAST(CEIL((SELECT COUNT(*) FROM events) * 0.008) AS BIGINT)
    ), probes AS (
      SELECT e.user_id, h.i AS hash_row,
             CAST(concat('0x', substr(md5(concat('cms', h.i, ':',
                  CAST(e.user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 1024
               AS bucket
      FROM events e, (SELECT UNNEST([0, 1, 2, 3]) AS i) h
    ), cms AS (
      SELECT hash_row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM probes GROUP BY 1, 2
    ), item_probes AS (
      SELECT x.user_id, h.i AS hash_row,
             CAST(concat('0x', substr(md5(concat('cms', h.i, ':',
                  CAST(x.user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 1024
               AS bucket
      FROM exact x, (SELECT UNNEST([0, 1, 2, 3]) AS i) h
    ), est AS (
      SELECT p.user_id, MIN(COALESCE(c.cnt, 0)) AS cms_estimate
      FROM item_probes p LEFT JOIN cms c USING (hash_row, bucket)
      GROUP BY 1
    )
    SELECT exact.user_id, n_exact, cms_estimate,
           (cms_estimate >= n_exact) AS est_sound
    FROM exact JOIN est USING (user_id)
    """,
)
def q_heavy_hitters(spark, sf_dir):
    """Frequent-item detection with a count-min sketch cross-checked
    against the exact histogram (operators/sketches.py:heavy_hitters).
    The oracle mirrors the md5 bucket math bit-for-bit, so even hash
    collisions agree across engines."""
    from geoparquet_io_spark.operators.sketches import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", min_fraction=0.008,
                         depth=4, width=1024)


@register(
    "stats_heavy_hitters_sketch",
    """
    WITH total AS (SELECT COUNT(*) AS n FROM events),
    probes AS (
      SELECT e.user_id, h.i AS hash_row,
             CAST(concat('0x', substr(md5(concat('cms', h.i, ':',
                  CAST(e.user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 4096
               AS bucket
      FROM events e, (SELECT UNNEST([0, 1, 2, 3, 4]) AS i) h
    ), cms AS (
      SELECT hash_row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM probes GROUP BY 1, 2
    ), item_probes AS (
      SELECT x.user_id, h.i AS hash_row,
             CAST(concat('0x', substr(md5(concat('cms', h.i, ':',
                  CAST(x.user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 4096
               AS bucket
      FROM (SELECT DISTINCT user_id FROM events) x,
           (SELECT UNNEST([0, 1, 2, 3, 4]) AS i) h
    ), est AS (
      SELECT p.user_id, MIN(COALESCE(c.cnt, 0)) AS cms_estimate
      FROM item_probes p LEFT JOIN cms c USING (hash_row, bucket)
      GROUP BY 1
    )
    SELECT user_id, cms_estimate FROM est
    WHERE cms_estimate >= CAST(CEIL((SELECT n FROM total) * 0.008) AS BIGINT)
    """,
)
def q_heavy_hitters_sketch(spark, sf_dir):
    """SKETCH-ONLY heavy hitters: per-partition Misra-Gries candidates
    (map-only, bounded state) -> count-min probe -> threshold — no
    full-cardinality shuffle anywhere, the form a 100 TB stream needs
    (operators/sketches.py:heavy_hitters_sketch).  The oracle computes
    the partition-INDEPENDENT definition {x : cms_estimate(x) >=
    threshold} over all distinct keys; the Spark result equals it
    because the Misra-Gries guarantee admits every true heavy hitter
    and the 5x4096 sketch leaves no false positive at this scale —
    the md5 bucket math is mirrored bit-for-bit."""
    from geoparquet_io_spark.operators.sketches import heavy_hitters_sketch

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters_sketch(ev, "user_id", min_fraction=0.008,
                                depth=5, width=4096)


@register(
    "cube_orders_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_orders(spark, sf_dir):
    """CUBE grouping sets (all 2^k subtotal combinations) with GROUPING
    flags — one shuffle, Spark expands the grouping sets internally."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"))
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.grouping("o_orderstatus").cast("int").alias("g_status"),
                 F.grouping("o_orderpriority").cast("int").alias("g_priority"),
                 F.sum("cents").alias("cents"),
                 F.count("*").alias("n_orders"))
            .select("o_orderstatus", "o_orderpriority", "g_status",
                    "g_priority", "cents", "n_orders"))


@register(
    "window_rank_family",
    """
    SELECT doc_id, source,
           CAST(dense_rank() OVER w AS INT) AS dr,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pr,
           ROUND(cume_dist() OVER w, 6) AS cd
    FROM documents
    WHERE n_chars > 0
    WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)
    """,
)
def q_window_rank_family(spark, sf_dir):
    """The ranking-window family (dense_rank / ntile / percent_rank /
    cume_dist) partitioned by source — per-key windows only, so the
    shuffle is one hash exchange on source and no single-reducer sort
    exists at any scale."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id", "source",
        F.dense_rank().over(w).cast("int").alias("dr"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"))


@register(
    "stats_cms_join_size",
    """
    WITH a AS (SELECT l_partkey AS k FROM lineitem),
    b AS (SELECT l_partkey AS k FROM lineitem WHERE l_quantity < 10),
    pa AS (
      SELECT h.i AS hash_row,
             CAST(concat('0x', substr(md5(concat('cms', h.i, ':',
                  CAST(a.k AS VARCHAR))), 1, 8)) AS BIGINT) % 1024 AS bucket
      FROM a, (SELECT UNNEST([0, 1, 2, 3]) AS i) h
    ), ca AS (
      SELECT hash_row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pa GROUP BY 1, 2
    ), pb AS (
      SELECT h.i AS hash_row,
             CAST(concat('0x', substr(md5(concat('cms', h.i, ':',
                  CAST(b.k AS VARCHAR))), 1, 8)) AS BIGINT) % 1024 AS bucket
      FROM b, (SELECT UNNEST([0, 1, 2, 3]) AS i) h
    ), cb AS (
      SELECT hash_row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pb GROUP BY 1, 2
    ), ip AS (
      SELECT ca.hash_row, SUM(ca.cnt * cb.cnt) AS ip
      FROM ca JOIN cb USING (hash_row, bucket) GROUP BY 1
    ),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_join_rows FROM ip),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_rows
           FROM a JOIN b USING (k))
    SELECT exact_join_rows, est_join_rows,
           (est_join_rows >= exact_join_rows) AS est_sound
    FROM ex, est
    """,
)
def q_cms_join_size(spark, sf_dir):
    """Join-cardinality estimation from count-min sketch inner products
    (operators/sketches.py:cms_join_size_estimate) cross-checked against
    the exact join count — the oracle mirrors the md5 bucket math
    bit-for-bit, so the estimate (collisions included) agrees exactly."""
    from geoparquet_io_spark.operators.sketches import (
        cms_join_size_estimate, count_min_sketch)

    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_partkey").alias("k"))
    b = li.filter(F.col("l_quantity") < 10).select(F.col("l_partkey").alias("k"))
    est = cms_join_size_estimate(count_min_sketch(a, "k"),
                                 count_min_sketch(b, "k"))
    exact = a.join(b, "k").agg(
        F.count("*").cast("long").alias("exact_join_rows"))
    return exact.crossJoin(est).select(
        "exact_join_rows", "est_join_rows",
        (F.col("est_join_rows") >= F.col("exact_join_rows")).alias("est_sound"))


# ---------------------------------------------------------------------------
# Sequence packing (GPT-style concat-and-chunk) — r6
# ---------------------------------------------------------------------------

_TOKS = "string_split_regex(trim(text), '\\s+')"


@register(
    "curate_pack_sequences",
    f"""
    WITH d AS (
      SELECT doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                       ELSE len({_TOKS}) END AS BIGINT) AS n
      FROM documents
    ),
    o AS (
      SELECT doc_id, n,
             CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS start
      FROM d
    )
    SELECT doc_id, n AS n_tokens, start AS start_offset,
           CAST(FLOOR(start / 512.0) AS BIGINT) AS first_chunk,
           CAST(FLOOR((start + GREATEST(n, 1) - 1) / 512.0) AS BIGINT)
             AS last_chunk,
           CAST(CAST(FLOOR((start + GREATEST(n, 1) - 1) / 512.0) AS BIGINT)
                - CAST(FLOOR(start / 512.0) AS BIGINT) + 1 AS INTEGER)
             AS chunks_spanned
    FROM o
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing of the corpus into 512-token training
    chunks (operators/sampling.py:pack_sequences): a DISTRIBUTED prefix
    sum — per-partition totals to the driver (one row per partition),
    per-partition windows do the rest; no single-reducer global window.
    The oracle is the equivalent global running-sum window."""
    from geoparquet_io_spark.operators.sampling import pack_sequences
    from geoparquet_io_spark.operators.text import token_count

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens"))
    return pack_sequences(d, max_tokens=512, id_column="doc_id",
                          token_column="n_tokens")


# ---------------------------------------------------------------------------
# Zipf's-law corpus fit
# ---------------------------------------------------------------------------

@register(
    "text_zipf_fit",
    """
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents WHERE len(trim(text)) > 0
    ),
    tc AS (
      SELECT term, COUNT(*) AS c FROM toks
      WHERE len(term) > 0 GROUP BY term
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r
      FROM tc ORDER BY c DESC, term LIMIT 500
    ),
    pts AS (
      SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
             CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
      FROM ranked
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n / 1e6, 6) AS zipf_intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def q_zipf_fit(spark, sf_dir):
    """Zipf-exponent OLS fit over the top-500 term frequencies
    (operators/text.py:zipf_fit): TakeOrdered top-n, micro-nat
    quantized regression sums — the corpus-health diagnostic."""
    from geoparquet_io_spark.operators.text import zipf_fit

    d = load_table(spark, sf_dir, "documents")
    return zipf_fit(d, top_n=500)
