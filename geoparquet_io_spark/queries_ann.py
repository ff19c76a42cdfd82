"""IVF ANN + stateful-streaming-parity oracle queries.

The IVF oracle embeds the SAME deterministic LCG centroids as literals in
generated SQL: assignment = first-index argmin of squared L2 distances,
probing = nprobe smallest centroid distances per query — both engines
compute identical doubles, so list membership matches exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geoparquet_io_spark.queries import register
from geoparquet_io_spark.testsupport.tables import load_table

_DIM = 64
_NCENT = 8
_NPROBE = 3
_K = 3


def _centroid_sql_literal(c: list[float]) -> str:
    return "[" + ",".join(repr(x) for x in c) + "]"


def _sqdist_sql(vec: str, cent_lit: str) -> str:
    return (
        f"list_reduce([({vec}[i] - {cent_lit}[i]) * ({vec}[i] - {cent_lit}[i]) "
        f"FOR i IN range(1, {_DIM + 1})], (x, y) -> x + y)"
    )


def _dot_sql(a: str, b: str) -> str:
    return f"list_reduce([{a}[i] * {b}[i] FOR i IN range(1, {_DIM + 1})], (x, y) -> x + y)"


def _cosine_sql(a: str, b: str) -> str:
    return (f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))")


def _ivf_oracle() -> str:
    from geoparquet_io_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(_DIM, _NCENT, seed=7)
    lits = [_centroid_sql_literal(c) for c in cents]
    d_exprs_v = [_sqdist_sql("v", l) for l in lits]
    d_exprs_q = [_sqdist_sql("qv", l) for l in lits]
    dv_cols = ", ".join(f"{e} AS d{i}" for i, e in enumerate(d_exprs_v))
    dq_cols = ", ".join(f"{e} AS d{i}" for i, e in enumerate(d_exprs_q))
    dlist = ", ".join(f"d{i}" for i in range(_NCENT))
    # first-index argmin (ties keep the earlier index — matches the Spark loop)
    argmin = "CASE " + " ".join(
        f"WHEN d{i} = m THEN {i}" for i in range(_NCENT)
    ) + " END"
    case_d = "CASE ci " + " ".join(f"WHEN {i} THEN d{i}" for i in range(_NCENT)) + " END"
    return f"""
    WITH e AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE) FOR i IN range(1, {_DIM + 1})] AS v
               FROM embeddings),
    dv AS (SELECT vec_id, v, {dv_cols} FROM e),
    assigned AS (SELECT vec_id, v, {argmin} AS ivf_list
                 FROM (SELECT *, least({dlist}) AS m FROM dv)),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
    dq AS (SELECT query_id, qv, {dq_cols} FROM q),
    probe AS (
      SELECT query_id, qv, ci, {case_d} AS d
      FROM dq CROSS JOIN (SELECT unnest(range({_NCENT})) AS ci)
      QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, ci) <= {_NPROBE}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND({_cosine_sql('p.qv', 'a.v')}, 6) AS cosine
      FROM probe p JOIN assigned a ON a.ivf_list = p.ci
      WHERE a.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_K}
    """


@register("similarity_ivf_topk", _ivf_oracle())
def q_ivf_topk(spark, sf_dir):
    from geoparquet_io_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0)
    return ivf_topk(e, q, dim=_DIM, k=_K, n_centroids=_NCENT, nprobe=_NPROBE,
                    seed=7, round_digits=6)


@register(
    "stateful_user_totals",
    """
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def q_stateful_totals(spark, sf_dir):
    """Batch parity of the applyInPandasWithState running totals — the
    streaming form is exercised in tests/test_streaming.py."""
    from geoparquet_io_spark.streaming.stateful import running_user_totals

    ev = load_table(spark, sf_dir, "events")
    out = running_user_totals(ev)
    return out.select("user_id", "n_events", F.round("sum_value", 4).alias("sum_value"))


def _lsh_topk_oracle() -> str:
    """LSH bucket top-k: same hyperplane-literal trick as the near-dup
    oracle — candidates meet only inside a sign-bit bucket."""
    from geoparquet_io_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(_DIM, 8, seed=42)
    lits = ["[" + ",".join(repr(x) for x in p) + "]" for p in planes]
    def bits(v):
        return " || ".join(
            f"(CASE WHEN {_dot_sql(v, l)} >= 0 THEN '1' ELSE '0' END)"
            for l in lits)
    return f"""
    WITH e AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE)
                              FOR i IN range(1, {_DIM + 1})] AS v
               FROM embeddings),
    d AS (SELECT vec_id AS neighbor_id, v AS dv, {bits('v')} AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, {bits('v')} AS bucket
          FROM e WHERE vec_id % 97 = 0),
    scored AS (
      SELECT q.query_id, d.neighbor_id,
             ROUND({_cosine_sql('q.qv', 'd.dv')}, 6) AS cosine
      FROM d JOIN q USING (bucket)
      WHERE d.neighbor_id != q.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_K}
    """


@register("similarity_lsh_topk", _lsh_topk_oracle())
def q_lsh_topk(spark, sf_dir):
    """Bucketed approximate top-k (operators/similarity.py:lsh_topk)."""
    from geoparquet_io_spark.operators.similarity import lsh_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0)
    return lsh_topk(e, q, dim=_DIM, k=_K, n_planes=8, seed=42, round_digits=6)


@register(
    "skew_salted_distinct",
    """
    SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_count
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_distinct(spark, sf_dir):
    """Skew-safe two-phase COUNT DISTINCT (hot keys spread over salted
    reducers; operators/skew.py:salted_distinct_count) — oracle is the
    plain COUNT DISTINCT it must equal."""
    from geoparquet_io_spark.operators.skew import salted_distinct_count

    li = load_table(spark, sf_dir, "lineitem")
    return salted_distinct_count(li, "l_returnflag", "l_partkey")
