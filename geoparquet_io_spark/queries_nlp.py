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


def _bpe_oracle_sql(num_merges: int) -> str:
    """Unrolled sequential-BPE oracle: each merge step recomputes pair
    counts and applies the (count DESC, pair ASC) argmax via scalar
    subqueries — DuckDB's replace() shares Spark's left-to-right
    non-overlapping scan, so the rewrite chain is engine-exact."""
    parts = [f"""
    WITH words AS (
      SELECT w AS word, COUNT(*) AS cnt FROM (
        SELECT UNNEST({_TOKS}) AS w FROM documents
      ) WHERE len(w) > 0 GROUP BY 1
    ), sym0 AS MATERIALIZED (
      SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym, cnt
      FROM words
    )"""]
    for n in range(1, num_merges + 1):
        parts.append(f""", pc{n} AS MATERIALIZED (
      SELECT pair, SUM(cnt) AS c FROM (
        SELECT cnt, UNNEST(list_transform(range(1, len(a)),
                    i -> a[i] || ' ' || a[i + 1])) AS pair
        FROM (SELECT string_split(sym, ' ') AS a, cnt FROM sym{n - 1})
        WHERE len(a) >= 2
      ) GROUP BY 1 HAVING SUM(cnt) >= 2
    ), best{n} AS MATERIALIZED (
      SELECT pair, replace(pair, ' ', '') AS merged, CAST(c AS BIGINT) AS c
      FROM pc{n} ORDER BY c DESC, pair ASC LIMIT 1
    ), sym{n} AS MATERIALIZED (
      SELECT trim(replace(' ' || sym || ' ',
                  ' ' || (SELECT pair FROM best{n}) || ' ',
                  ' ' || (SELECT merged FROM best{n}) || ' ')) AS sym, cnt
      FROM sym{n - 1}
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({n} AS BIGINT) AS rank, pair, merged, "
        f"c AS pair_count FROM best{n}" for n in range(1, num_merges + 1))
    parts.append(f"\n    SELECT * FROM ({union}) ORDER BY rank")
    return "".join(parts)


@register("text_bpe_merges", _bpe_oracle_sql(8))
def q_bpe_merges(spark, sf_dir):
    """Distributed BPE trainer, strictly sequential (batch_size=1) —
    one pair-count aggregate over the DISTINCT-word table per merge,
    never rescanning the corpus (operators/bpe.py:train_bpe).  The
    oracle unrolls the identical 8 argmax-and-rewrite steps in SQL.
    local_vocab_rows=None pins the DISTRIBUTED iteration here (the
    batched query below exercises the driver-local fast path), so both
    routes stay driver-measured."""
    from geoparquet_io_spark.operators.bpe import train_bpe

    d = load_table(spark, sf_dir, "documents")
    return train_bpe(d, "text", num_merges=8, batch_size=1,
                     local_vocab_rows=None)


@register("text_bpe_merges_batched", _bpe_oracle_sql(8))
def q_bpe_merges_batched(spark, sf_dir):
    """Batched BPE trainer (batch_size=4): up to 4 symbol-DISJOINT top
    pairs merge per Spark round, cutting driver round-trips ~4x — the
    change that makes real 30k-merge vocabularies feasible.  Compared
    against the SEQUENTIAL oracle: disjoint admission keeps admitted
    pair counts sequential-exact, and on this corpus no freshly-formed
    pair outranks a batch member, so the outputs are identical (the
    equality is what this gate checks).  This corpus's vocab fits
    LOCAL_VOCAB_ROWS, so this query also drives the r8 driver-local
    iteration route end-to-end against the SQL oracle."""
    from geoparquet_io_spark.operators.bpe import train_bpe

    d = load_table(spark, sf_dir, "documents")
    return train_bpe(d, "text", num_merges=8, batch_size=4)
