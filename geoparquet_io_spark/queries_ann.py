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


def _cents_cte(cents: list[list[float]]) -> str:
    """1-row CTE binding the centroid list-of-lists ONCE as a value:
    referencing ``cs[k][i]`` instead of inlining the full literal at
    every ``[i]`` access keeps DuckDB from re-evaluating the list
    literal per element per row (the semantic_dedup oracle lost ~80 s
    to that).  Identical doubles, identical fold order — verified
    EQUAL row-for-row at sf0.001/sf0.01 against the inline form."""
    return ("cents AS (SELECT ["
            + ", ".join(_centroid_sql_literal(c) for c in cents)
            + "] AS cs)")


def _ivf_oracle() -> str:
    from geoparquet_io_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(_DIM, _NCENT, seed=7)
    lits = [f"cs[{k + 1}]" for k in range(len(cents))]
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
    WITH {_cents_cte(cents)},
    e AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE) FOR i IN range(1, {_DIM + 1})] AS v
               FROM embeddings),
    dv AS (SELECT vec_id, v, {dv_cols} FROM e, cents),
    assigned AS (SELECT vec_id, v, {argmin} AS ivf_list
                 FROM (SELECT *, least({dlist}) AS m FROM dv)),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
    dq AS (SELECT query_id, qv, {dq_cols} FROM q, cents),
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


@register(
    "embedding_label_centroids",
    """
    WITH ex AS (
      SELECT label, unnest(embedding) AS v,
             unnest(range(0, len(embedding))) AS pos
      FROM embeddings
    )
    SELECT label, CAST(pos AS INT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(v), 6) + 0.0 AS mean_v
    FROM ex GROUP BY 1, 2
    """,
)
def q_label_centroids(spark, sf_dir):
    """Per-label centroid of the embedding column — the class-prototype
    aggregation (mean vector per label) used for nearest-class-mean
    classification and cluster summarization.

    Scale shape: posexplode to (label, dim) pairs -> ONE groupBy with
    map-side partial aggregation over |labels| * dim keys.  No python,
    no window; the +0.0 normalizes IEEE signed zero for hash parity
    (means near zero round to -0.0 on one engine, +0.0 on the other).
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return ex.groupBy("label", "pos").agg(
        F.count("*").alias("n"),
        (F.round(F.avg("v"), 6) + F.lit(0.0)).alias("mean_v"),
    ).select("label", F.col("pos").cast("int").alias("pos"),
             F.col("n").cast("long").alias("n"), "mean_v")


_PQ_M = 4
_PQ_CODES = 8
_PQ_SUB = _DIM // _PQ_M


def _sqdist_sub_sql(vec: str, cent_lit: str, offset: int, sub: int) -> str:
    return (
        f"list_reduce([({vec}[{offset} + i] - {cent_lit}[i]) * "
        f"({vec}[{offset} + i] - {cent_lit}[i]) "
        f"FOR i IN range(1, {sub + 1})], (x, y) -> x + y)"
    )


def _pq_oracle() -> str:
    """Mirrors pq_topk_adc op-for-op: same LCG codebooks as literals,
    first-index argmin encoding, ADC = left-assoc sum of per-subvector
    LUT lookups (identical doubles in both engines)."""
    from geoparquet_io_spark.operators.similarity import pq_codebooks

    cbs = pq_codebooks(_DIM, _PQ_M, _PQ_CODES, seed=11)
    dv_cols, qd_cols, code_cols = [], [], []
    for j in range(_PQ_M):
        off = j * _PQ_SUB
        for c in range(_PQ_CODES):
            lit = _centroid_sql_literal(cbs[j][c])
            dv_cols.append(f"{_sqdist_sub_sql('v', lit, off, _PQ_SUB)} AS cd{j}_{c}")
            qd_cols.append(f"{_sqdist_sub_sql('qv', lit, off, _PQ_SUB)} AS qd{j}_{c}")
        dlist = ", ".join(f"cd{j}_{c}" for c in range(_PQ_CODES))
        argmin = "CASE " + " ".join(
            f"WHEN cd{j}_{c} = least({dlist}) THEN {c}" for c in range(_PQ_CODES)
        ) + " END"
        code_cols.append(f"{argmin} AS c{j}")
    adc = " + ".join(
        "(CASE a.c%d %s END)" % (
            j, " ".join(f"WHEN {c} THEN q.qd{j}_{c}" for c in range(_PQ_CODES)))
        for j in range(_PQ_M)
    )
    return f"""
    WITH e AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE) FOR i IN range(1, {_DIM + 1})] AS v
               FROM embeddings),
    dv AS (SELECT vec_id, {", ".join(dv_cols)} FROM e),
    a AS (SELECT vec_id, {", ".join(code_cols)} FROM dv),
    q0 AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
    q AS (SELECT query_id, {", ".join(qd_cols)} FROM q0),
    scored AS (
      SELECT q.query_id, a.vec_id AS neighbor_id, ROUND({adc}, 6) AS adc_dist
      FROM a CROSS JOIN q
      WHERE a.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_dist, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_K}
    """


@register("similarity_pq_topk", _pq_oracle())
def q_pq_topk(spark, sf_dir):
    from geoparquet_io_spark.operators.similarity import pq_topk_adc

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0)
    return pq_topk_adc(e, q, dim=_DIM, m=_PQ_M, n_codes=_PQ_CODES, k=_K,
                       seed=11, round_digits=6)


@register("similarity_ivf_index_search", _ivf_oracle())
def q_ivf_index_search(spark, sf_dir):
    """Persisted-IVF-index search (operators/similarity.py:
    build_ivf_index/search_ivf_index): the corpus is assigned + written
    partitionBy(ivf_list) ONCE, then the search reads only the probed
    hive partitions (partition pruning at file level) and must return
    byte-identical results to the in-memory ivf_topk oracle."""
    import tempfile

    from geoparquet_io_spark.operators.similarity import (build_ivf_index,
                                                          search_ivf_index)

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0)
    path = tempfile.mkdtemp(prefix="gpq_ivf_")
    build_ivf_index(spark, e, path, dim=_DIM, n_centroids=_NCENT, seed=7)
    return search_ivf_index(spark, path, q, k=_K, nprobe=_NPROBE,
                            round_digits=6)


def _kmeans_oracle(k: int = 8, iters: int = 2, rd: int = 6) -> str:
    """Unrolled Lloyd iterations in SQL: the init centroids embed as
    literals; each step recomputes assignment (row_number argmin — ties
    to the lower cluster index, matching np.argmin/array_position) and
    per-dim rounded means, with empty clusters inheriting the previous
    table.  Given identical rounded centroids the per-row distances are
    bit-identical sequential folds in both engines; only the mean's
    summation order is engine-sensitive, which rounding absorbs."""
    from geoparquet_io_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(_DIM, k, seed=7)
    vals = ", ".join(
        "(%d, [%s])" % (j, ",".join(repr(round(float(x), rd)) for x in c))
        for j, c in enumerate(cents))
    mean_list = "[" + ", ".join(
        f"round(sum(v[{i + 1}]) / count(*), {rd})" for i in range(_DIM)) + "]"

    def step(n: int, prev: str) -> str:
        return f"""
    d{n} AS (SELECT e.vec_id, e.v, c.cluster,
                    list_reduce([(e.v[i] - c.c[i]) * (e.v[i] - c.c[i])
                                 FOR i IN range(1, {_DIM + 1})],
                                (x, y) -> x + y) AS dist
             FROM e CROSS JOIN {prev} c),
    a{n} AS (SELECT vec_id, v, cluster FROM
             (SELECT vec_id, v, cluster,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist, cluster) AS rn
              FROM d{n}) WHERE rn = 1),
    m{n} AS (SELECT cluster, {mean_list} AS c FROM a{n} GROUP BY cluster),
    c{n}(cluster, c) AS (SELECT cluster, c FROM m{n}
                         UNION ALL
                         SELECT cluster, c FROM {prev}
                         WHERE cluster NOT IN (SELECT cluster FROM m{n}))"""

    steps = ",".join(step(n + 1, f"c{n}") for n in range(iters))
    fin = iters + 1
    return f"""
    WITH e AS (SELECT vec_id,
                      [CAST(embedding[i] AS DOUBLE) FOR i IN range(1, {_DIM + 1})] AS v
               FROM embeddings),
    c0(cluster, c) AS (VALUES {vals}),
    {steps},
    df_ AS (SELECT e.vec_id, c.cluster,
                   list_reduce([(e.v[i] - c.c[i]) * (e.v[i] - c.c[i])
                                FOR i IN range(1, {_DIM + 1})],
                               (x, y) -> x + y) AS dist
            FROM e CROSS JOIN c{iters} c),
    af AS (SELECT vec_id, cluster FROM
           (SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cluster) AS rn
            FROM df_) WHERE rn = 1),
    sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS size
              FROM af GROUP BY cluster)
    SELECT CAST(c.cluster AS INTEGER) AS cluster,
           COALESCE(s.size, 0) AS size,
           CAST(t.i AS INTEGER) AS d, c.c[t.i + 1] AS coord
    FROM c{iters} c LEFT JOIN sizes s USING (cluster)
    CROSS JOIN (SELECT unnest(range(0, {_DIM})) AS i) t
    """


@register("kmeans_train_model", _kmeans_oracle())
def q_kmeans_train(spark, sf_dir):
    """Distributed Lloyd k-means over the full embeddings table
    (operators/similarity.py:kmeans_fit_distributed): per iteration one
    Arrow-batched assignment pass + a k x dim map-side-combined sum
    aggregation; only the centroid matrix visits the driver.  Output is
    the trained model as (cluster, size, dim, coord) scalars."""
    from geoparquet_io_spark.operators.similarity import kmeans_model_table

    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_model_table(spark, e, _DIM, n_centroids=8, iterations=2)


def _ivf_recall_oracle(nprobe: int = 1) -> str:
    """Recall@k of IVF(nprobe) vs brute force, both recomputed in SQL
    with the identical literals/rounding/tie-breaks as their standalone
    oracles, then joined as plain set arithmetic."""
    from geoparquet_io_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(_DIM, _NCENT, seed=7)
    lits = [f"cs[{k + 1}]" for k in range(len(cents))]
    dv_cols = ", ".join(f"{_sqdist_sql('v', l)} AS d{i}"
                        for i, l in enumerate(lits))
    dq_cols = ", ".join(f"{_sqdist_sql('qv', l)} AS d{i}"
                        for i, l in enumerate(lits))
    dlist = ", ".join(f"d{i}" for i in range(_NCENT))
    argmin = "CASE " + " ".join(
        f"WHEN d{i} = m THEN {i}" for i in range(_NCENT)) + " END"
    case_d = "CASE ci " + " ".join(
        f"WHEN {i} THEN d{i}" for i in range(_NCENT)) + " END"
    return f"""
    WITH {_cents_cte(cents)},
    e AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE) FOR i IN range(1, {_DIM + 1})] AS v
               FROM embeddings),
    dv AS (SELECT vec_id, v, {dv_cols} FROM e, cents),
    assigned AS (SELECT vec_id, v, {argmin} AS ivf_list
                 FROM (SELECT *, least({dlist}) AS m FROM dv)),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
    dq AS (SELECT query_id, qv, {dq_cols} FROM q, cents),
    probe AS (
      SELECT query_id, qv, ci, {case_d} AS d
      FROM dq CROSS JOIN (SELECT unnest(range({_NCENT})) AS ci)
      QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, ci) <= {nprobe}
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY ROUND({_cosine_sql('p.qv', 'a.v')}, 6) DESC,
                          a.vec_id) AS rn
        FROM probe p JOIN assigned a ON a.ivf_list = p.ci
        WHERE a.vec_id != p.query_id)
      WHERE rn <= {_K}
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY ROUND({_cosine_sql('q.qv', 'e.v')}, 6) DESC,
                          e.vec_id) AS rn
        FROM q CROSS JOIN e
        WHERE e.vec_id != q.query_id)
      WHERE rn <= {_K}
    ),
    truth AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_true
              FROM exact GROUP BY query_id),
    hits AS (SELECT a.query_id, CAST(count(*) AS BIGINT) AS hits
             FROM approx a JOIN exact x USING (query_id, neighbor_id)
             GROUP BY a.query_id)
    SELECT t.query_id, COALESCE(h.hits, 0) AS hits, t.n_true,
           ROUND(COALESCE(h.hits, 0) / t.n_true, 4) AS recall
    FROM truth t LEFT JOIN hits h USING (query_id)
    """


@register("similarity_ivf_recall", _ivf_recall_oracle())
def q_ivf_recall(spark, sf_dir):
    """Recall@k measurement of the IVF probe against brute force
    (operators/similarity.py:ann_recall) — nprobe=1 so the number is
    non-trivially below 1; the tuning loop an ANN deployment runs."""
    from geoparquet_io_spark.operators.similarity import (ann_recall,
                                                          brute_force_topk,
                                                          ivf_topk)

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0)
    approx = ivf_topk(e, q, dim=_DIM, k=_K, n_centroids=_NCENT, nprobe=1,
                      seed=7, round_digits=6)
    exact = brute_force_topk(e, q, k=_K, round_digits=6, dim=_DIM)
    return ann_recall(approx, exact)


def _ivf_pq_oracle() -> str:
    """IVF-PQ composed oracle: the IVF assignment/probe CTEs (centroid
    literals, first-index argmin, ORDER BY d, ci probe) joined with the
    PQ code/LUT CTEs (per-subvector argmin encoding, ADC = left-assoc
    sum of CASE lookups) — every double identical in both engines."""
    from geoparquet_io_spark.operators.similarity import (ivf_centroids,
                                                          pq_codebooks)

    cents = ivf_centroids(_DIM, _NCENT, seed=7)
    cbs = pq_codebooks(_DIM, _PQ_M, _PQ_CODES, seed=11)
    lits = [_centroid_sql_literal(c) for c in cents]
    dv_cols = ", ".join(f"{_sqdist_sql('v', l)} AS d{i}"
                        for i, l in enumerate(lits))
    dq_cols = ", ".join(f"{_sqdist_sql('qv', l)} AS d{i}"
                        for i, l in enumerate(lits))
    dlist = ", ".join(f"d{i}" for i in range(_NCENT))
    argmin = "CASE " + " ".join(
        f"WHEN d{i} = m THEN {i}" for i in range(_NCENT)) + " END"
    case_d = "CASE ci " + " ".join(
        f"WHEN {i} THEN d{i}" for i in range(_NCENT)) + " END"
    code_cols, qd_cols = [], []
    for j in range(_PQ_M):
        off = j * _PQ_SUB
        sq = [f"{_sqdist_sub_sql('v', _centroid_sql_literal(cbs[j][c]), off, _PQ_SUB)}"
              for c in range(_PQ_CODES)]
        cd_defs = ", ".join(f"{e} AS cd{j}_{c}" for c, e in enumerate(sq))
        code_cols.append((cd_defs, j))
        for c in range(_PQ_CODES):
            lit = _centroid_sql_literal(cbs[j][c])
            qd_cols.append(
                f"{_sqdist_sub_sql('qv', lit, off, _PQ_SUB)} AS qd{j}_{c}")
    cd_all = ", ".join(defs for defs, _ in code_cols)
    code_exprs = []
    for j in range(_PQ_M):
        cds = ", ".join(f"cd{j}_{c}" for c in range(_PQ_CODES))
        am = "CASE " + " ".join(
            f"WHEN cd{j}_{c} = least({cds}) THEN {c}"
            for c in range(_PQ_CODES)) + " END"
        code_exprs.append(f"{am} AS c{j}")
    adc = " + ".join(
        "(CASE a.c%d %s END)" % (
            j, " ".join(f"WHEN {c} THEN p.qd{j}_{c}"
                        for c in range(_PQ_CODES)))
        for j in range(_PQ_M))
    return f"""
    WITH e AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE) FOR i IN range(1, {_DIM + 1})] AS v
               FROM embeddings),
    dv AS (SELECT vec_id, v, {dv_cols} FROM e),
    ass AS (SELECT vec_id, v, {argmin} AS ivf_list
            FROM (SELECT *, least({dlist}) AS m FROM dv)),
    cdv AS (SELECT vec_id, ivf_list, {cd_all} FROM ass),
    a AS (SELECT vec_id, ivf_list, {", ".join(code_exprs)} FROM cdv),
    q0 AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
    dq AS (SELECT query_id, qv, {dq_cols} FROM q0),
    probe0 AS (
      SELECT query_id, qv, ci, {case_d} AS d
      FROM dq CROSS JOIN (SELECT unnest(range({_NCENT})) AS ci)
      QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, ci) <= {_NPROBE}
    ),
    probe AS (SELECT query_id, ci, {", ".join(qd_cols)} FROM probe0),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, ROUND({adc}, 6) AS adc_dist
      FROM probe p JOIN a ON a.ivf_list = p.ci
      WHERE a.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_dist, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_K}
    """


@register("similarity_ivf_pq_topk", _ivf_pq_oracle())
def q_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ ANN (operators/similarity.py:ivf_pq_topk): probe nprobe
    inverted lists, rank members by PQ asymmetric distance — the
    composed compression (candidate pruning x code compression) that a
    billion-vector deployment actually runs."""
    from geoparquet_io_spark.operators.similarity import ivf_pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0)
    return ivf_pq_topk(e, q, dim=_DIM, k=_K, n_centroids=_NCENT,
                       nprobe=_NPROBE, m=_PQ_M, n_codes=_PQ_CODES,
                       seed=7, pq_seed=11, round_digits=6)


def _random_projection_oracle(out_dim: int = 8, seed: int = 23) -> str:
    """Same LCG planes as literals; each output dim is the identical
    left-assoc list_reduce dot * 1/sqrt(out_dim), rounded, -0.0-folded."""
    import math as _math

    from geoparquet_io_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(_DIM, out_dim, seed)
    scale = repr(1.0 / _math.sqrt(float(out_dim)))
    comps = ", ".join(
        f"ROUND({_dot_sql('v', _centroid_sql_literal(p))} * {scale}, 6) + 0.0"
        f" AS p{i}"
        for i, p in enumerate(planes))
    return f"""
    WITH e AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE)
                              FOR i IN range(1, {_DIM + 1})] AS v
               FROM embeddings)
    SELECT vec_id, {comps} FROM e
    """


@register("embedding_random_projection", _random_projection_oracle())
def q_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss dense random projection 64d -> 8d
    (operators/similarity.py:random_projection): map-only native HOF
    dots against LCG plane literals — the dimensionality-reduction
    front end for ANN / semantic-dedup at high-dim scale."""
    from geoparquet_io_spark.operators.similarity import random_projection

    e = load_table(spark, sf_dir, "embeddings")
    p = random_projection(e, dim=_DIM, out_dim=8, seed=23, round_digits=6)
    return p.select(
        "vec_id",
        *[F.element_at("proj", i + 1).alias(f"p{i}") for i in range(8)])


@register(
    "embedding_nearest_centroid",
    f"""
    WITH ex AS (
      SELECT vec_id, label, unnest(range(0, len(embedding))) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    cent AS (
      SELECT label AS cand, pos, ROUND(AVG(v), 6) AS m
      FROM ex WHERE vec_id % 5 != 0 GROUP BY 1, 2
    ),
    dist AS (
      SELECT t.vec_id, t.label AS label_true, c.cand,
             SUM(CAST(ROUND((t.v - c.m) * (t.v - c.m) * 1e9) AS BIGINT)) AS d
      FROM ex t JOIN cent c USING (pos)
      WHERE t.vec_id % 5 = 0
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT vec_id, label_true, cand AS label_pred
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d, cand) AS rn
            FROM dist)
      WHERE rn = 1
    )
    SELECT label_true, label_pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """,
)
def q_nearest_centroid(spark, sf_dir):
    """Nearest-class-mean classification audit (operators/similarity.py:
    nearest_centroid_confusion): per-label prototype vectors from the
    train split (id %% 5 != 0), squared-L2 nearest-centroid prediction
    on the held-out split, confusion-matrix output.  Distance terms are
    integer nano-quantized so summation order is engine-exact."""
    from geoparquet_io_spark.operators.similarity import (
        nearest_centroid_confusion,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return nearest_centroid_confusion(e, dim=_DIM, test_mod=5)


@register(
    "similarity_embedding_hygiene",
    f"""
    WITH checked AS (
      SELECT vec_id,
        (embedding IS NOT NULL
         AND len(embedding) = {_DIM}
         AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS u(x)
                         WHERE x IS NULL OR isnan(x) OR isinf(x))
        ) AS ok
      FROM embeddings
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(MIN(CASE WHEN ok THEN vec_id END) AS BIGINT) AS first_valid,
           CAST(MIN(CASE WHEN NOT ok THEN vec_id END) AS BIGINT)
             AS first_invalid
    FROM checked
    """,
)
def q_embedding_hygiene(spark, sf_dir):
    """ANN input hygiene audit (operators/similarity.py:
    is_valid_embedding / filter_valid_embeddings): Spark and DuckDB
    share the IEEE total order where NaN outranks every real number, so
    one NaN-component embedding hijacks rank 1 of every top-k list —
    the audit counts vectors that are non-NULL, dim-length, and
    all-finite, evaluated per element with native expressions on both
    engines."""
    from geoparquet_io_spark.operators.similarity import \
        filter_valid_embeddings

    e = load_table(spark, sf_dir, "embeddings")
    flagged = filter_valid_embeddings(e, "embedding", dim=_DIM,
                                      flag_column="ok")
    return flagged.agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_valid"),
        F.min(F.when(F.col("ok"), F.col("vec_id"))).alias("first_valid"),
        F.min(F.when(~F.col("ok"), F.col("vec_id"))).alias("first_invalid"),
    )
