"""Language-model / tokenizer operator queries (round-3 continuation 4):
bigram LM scoring and the distributed BPE trainer.  Shares REGISTRY and
determinism rules with queries.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoparquet_io_spark.queries import register
from geoparquet_io_spark.testsupport.tables import load_table

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


@register(
    "text_bigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id AS doc, {_TOKS} AS a FROM documents
    ), pairs AS (
      SELECT doc,
             UNNEST(list_transform(range(1, len(a)), i -> a[i])) AS w1,
             UNNEST(list_transform(range(1, len(a)), i -> a[i + 1])) AS w2
      FROM toks WHERE len(a) >= 2
    ), big AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2
    ), uni AS (
      SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY 1
    ), nexts AS (
      SELECT w2 AS w, COUNT(*) AS c2 FROM pairs GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM pairs
    ), lp AS (
      SELECT b.w1, b.w2,
             CAST(ROUND(LN(0.75 * (c12 / c1) + 0.25 * (c2 / t)) * 1e6, 0)
                  AS BIGINT) AS lp_micro
      FROM big b JOIN uni USING (w1) JOIN nexts n ON b.w2 = n.w, tot
    ), tf AS (
      SELECT doc, w1, w2, COUNT(*) AS tf FROM pairs GROUP BY 1, 2, 3
    )
    SELECT doc AS doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_transitions,
           ROUND(CAST(SUM(tf * lp_micro) AS BIGINT)
                 / CAST(SUM(tf) AS BIGINT) / 1e6, 6) AS avg_logprob
    FROM tf JOIN lp USING (w1, w2) GROUP BY 1
    """,
)
def q_bigram_logprob(spark, sf_dir):
    """Jelinek-Mercer interpolated bigram LM over the corpus's own
    counts (operators/text.py:bigram_logprob) — integer micro-nat sums
    make the per-doc aggregate order-independent and engine-exact."""
    from geoparquet_io_spark.operators.text import bigram_logprob

    d = load_table(spark, sf_dir, "documents")
    return bigram_logprob(d, "doc_id", "text", lambda_bigram=0.75)
