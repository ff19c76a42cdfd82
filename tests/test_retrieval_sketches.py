"""Unit tests for the round-3 additions: BM25 retrieval scoring,
SemDeDup semantic dedup, and mergeable HLL sketch rollups — crafted
fixtures with hand-computed expectations plus plan/scale assertions."""

import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------

def _bm25_expected(corpus, terms, k1=1.2, b=0.75):
    """Independent reference implementation (plain python)."""
    docs = {i: t.lower().split() for i, t in corpus if t.strip()}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    dfreq = {t: sum(1 for d in docs.values() if t in d) for t in terms}
    out = {}
    for i, d in docs.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = d.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(d) / avgdl))
            hits += 1
        if hits:
            out[i] = (round(s, 6), hits)
    return out


def test_bm25_hand_computed(spark):
    from geoparquet_io_spark.operators.text import bm25_scores

    corpus = [
        (1, "spark shuffle spark join"),
        (2, "window window window agg"),
        (3, "the quick fox"),
        (4, "spark window shuffle"),
        (5, "   "),
    ]
    terms = ["spark", "window", "shuffle"]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r["doc_id"]: (r["bm25"], r["n_terms_hit"], r["rank"])
           for r in bm25_scores(df, terms, k=10).collect()}
    exp = _bm25_expected(corpus, terms)
    assert set(got) == set(exp)
    for i, (s, hits) in exp.items():
        assert got[i][0] == pytest.approx(s, abs=1e-6)
        assert got[i][1] == hits
    # rank ordering: score desc, id asc
    ranked = sorted(got.items(), key=lambda kv: kv[1][2])
    scores = [kv[1][0] for kv in ranked]
    assert scores == sorted(scores, reverse=True)


def test_bm25_topk_truncates(spark):
    from geoparquet_io_spark.operators.text import bm25_scores

    rows = [(i, "spark data") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_scores(df, ["spark"], k=5).collect()
    assert len(out) == 5
    assert [r["rank"] for r in sorted(out, key=lambda r: r["doc_id"])] == [1, 2, 3, 4, 5]


def test_bm25_no_global_sort_of_corpus(spark):
    """Top-k must be TakeOrderedAndProject, not a full global sort+window."""
    from geoparquet_io_spark.operators.text import bm25_scores

    df = spark.createDataFrame([(1, "spark")], ["doc_id", "text"])
    plan = bm25_scores(df, ["spark"], k=10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------------------------------
# SemDeDup
# --------------------------------------------------------------------------

def test_semantic_dedup_survivor_rule(spark):
    from geoparquet_io_spark.operators.similarity import semantic_dedup

    # 2-D embeddings, two obvious clusters around (1,0) and (0,1).
    rows = [
        (1, [1.0, 0.0]),      # cluster A, survivor
        (2, [0.999, 0.01]),   # near-dup of 1 -> dropped
        (3, [0.9, 0.1]),      # cluster A but below threshold vs 1? cos ~0.993 -> dropped too
        (4, [0.0, 1.0]),      # cluster B, survivor
        (5, [-0.01, 0.999]),  # near-dup of 4 -> dropped
        (6, [0.0, -1.0]),     # cluster B (closer to (0,1)? no: sq dist to (1,0) is 3, to (0,1) is 5) -> A
    ]
    cents = [[1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: (r["cluster"], r["kept"])
           for r in semantic_dedup(df, cents, threshold=0.99).collect()}
    assert len(out) == 6
    assert out[1] == (0, True)
    assert out[2][0] == 0 and out[2][1] is False
    assert out[4] == (1, True)
    assert out[5][0] == 1 and out[5][1] is False
    # 6 is anti-correlated with everything in its cluster -> kept
    assert out[6][1] is True


def test_semantic_dedup_no_cartesian(spark):
    from geoparquet_io_spark.operators.similarity import (ivf_centroids,
                                                          semantic_dedup)

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.0, 0.5]) for i in range(10)],
        ["vec_id", "embedding"])
    plan = semantic_dedup(df, ivf_centroids(4, 4, seed=7))._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_incremental_replay(spark, tmp_path):
    """Daily-ingest contract: (1) batch rows near a persisted kept
    vector are dropped, intra-batch dups keep the lowest id; (2) after
    absorbing the batch's survivors into the index, RE-ingesting the
    same batch keeps nothing new (idempotent replay); (3) against an
    empty index the result equals plain semantic_dedup of the batch."""
    from geoparquet_io_spark.operators.similarity import (
        semantic_dedup, semantic_dedup_incremental)

    cents = [[1.0, 0.0], [0.0, 1.0]]
    index_rows = [(100, [1.0, 0.0]), (101, [0.0, 1.0])]
    idx = spark.createDataFrame(index_rows, ["vec_id", "embedding"])
    batch_rows = [
        (1, [0.999, 0.01]),    # near index 100 -> dropped
        (2, [0.7, 0.7]),       # new direction -> kept (cluster 0 tie)
        (3, [0.705, 0.695]),   # near-dup of 2, larger id -> dropped
        (4, [0.0, -1.0]),      # anti-correlated -> kept
    ]
    batch = spark.createDataFrame(batch_rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r["kept"]
           for r in semantic_dedup_incremental(
               batch, idx, cents, threshold=0.99).collect()}
    assert out == {1: False, 2: True, 3: False, 4: True}

    # replay: absorb survivors, re-ingest the identical batch
    survivors = [(vid, emb) for vid, emb in batch_rows if out[vid]]
    idx2 = spark.createDataFrame(index_rows + survivors,
                                 ["vec_id", "embedding"])
    replay = {r["vec_id"]: r["kept"]
              for r in semantic_dedup_incremental(
                  batch, idx2, cents, threshold=0.99).collect()}
    # every batch row now has a witness in the index (1.0 cosine with
    # itself for the absorbed survivors) -> nothing kept
    assert replay == {1: False, 2: False, 3: False, 4: False}

    # empty index degenerates to plain semantic_dedup
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    inc = {r["vec_id"]: r["kept"]
           for r in semantic_dedup_incremental(
               batch, empty, cents, threshold=0.99).collect()}
    plain = {r["vec_id"]: r["kept"]
             for r in semantic_dedup(batch, cents,
                                     threshold=0.99).collect()}
    assert inc == plain


def test_semantic_dedup_incremental_blocked_matches_unblocked(spark):
    """Hot-cluster memory guard: with max_cluster_size forcing the
    cross check into sub-blocks (and the intra path into the chain),
    kept-sets match the uncapped run on a mutual-dup mass — no task
    ever materializes the whole cluster, same answer."""
    from geoparquet_io_spark.operators.similarity import \
        semantic_dedup_incremental

    cents = [[1.0, 0.0], [0.0, 1.0]]
    # 90 near-identical batch vectors + 30 near-identical index vectors,
    # all in cluster 0 — far above the cap of 8
    batch = spark.createDataFrame(
        [(i, [1.0, i * 1e-6]) for i in range(90)]
        + [(1000, [0.0, 1.0])],                      # cluster-1 loner
        ["vec_id", "embedding"])
    idx = spark.createDataFrame(
        [(5000 + i, [1.0, 5e-7 + i * 1e-6]) for i in range(30)],
        ["vec_id", "embedding"])
    uncapped = {r["vec_id"]: r["kept"]
                for r in semantic_dedup_incremental(
                    batch, idx, cents, threshold=0.99,
                    max_cluster_size=None).collect()}
    capped = {r["vec_id"]: r["kept"]
              for r in semantic_dedup_incremental(
                  batch, idx, cents, threshold=0.99,
                  max_cluster_size=8, window=8).collect()}
    assert capped == uncapped
    # the mass is killed by the index; the loner survives
    assert capped[1000] is True
    assert sum(capped.values()) == 1


def test_semantic_dedup_incremental_no_cartesian(spark):
    from geoparquet_io_spark.operators.similarity import (
        ivf_centroids, semantic_dedup_incremental)

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.0, 0.5]) for i in range(10)],
        ["vec_id", "embedding"])
    idx = spark.createDataFrame(
        [(100 + i, [0.5, float(i % 2), 1.0, 0.0]) for i in range(4)],
        ["vec_id", "embedding"])
    plan = semantic_dedup_incremental(df, idx, ivf_centroids(4, 4, seed=7)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# HLL sketches
# --------------------------------------------------------------------------

def test_hll_shard_merge_equals_exact_small_cardinality(spark):
    """Sharded sketches unioned per group must recover the exact distinct
    count at small cardinality (DataSketches HLL is exact in coupon
    mode), proving the merge is lossless across shards."""
    from geoparquet_io_spark.operators.sketches import (hll_rollup,
                                                        hll_shard_sketches)

    rows = [(g, f"v{g}_{i % (20 * (g + 1))}")
            for g in range(3) for i in range(500)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    sk = hll_shard_sketches(df, "grp", "val", n_shards=8, lgk=14)
    assert sk.count() <= 3 * 8
    got = {r["grp"]: r["approx_distinct"] for r in hll_rollup(sk, "grp").collect()}
    assert got == {0: 20, 1: 40, 2: 60}


def test_hll_distinct_check_bound_holds(spark):
    from geoparquet_io_spark.operators.sketches import hll_distinct_check

    rows = [(f"g{i % 4}", i % 997) for i in range(5000)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = hll_distinct_check(df, "grp", "val", rel_tol=0.05).collect()
    assert len(out) == 4
    assert all(r["est_ok"] for r in out)


def test_hll_plan_stays_jvm_side(spark):
    from geoparquet_io_spark.operators.sketches import (hll_rollup,
                                                        hll_shard_sketches)

    df = spark.createDataFrame([("a", 1)], ["grp", "val"])
    plan = hll_rollup(hll_shard_sketches(df, "grp", "val"), "grp")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------------------------------------
# int8 quantization
# --------------------------------------------------------------------------

def test_quantize_int8_roundtrip_bound_and_zero_vector(spark):
    import numpy as np

    from geoparquet_io_spark.operators.similarity import (
        dequantize_embeddings_int8, quantize_embeddings_int8)

    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(20)]
    rows.append((99, [0.0] * 16))   # zero vector must not divide by zero
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = quantize_embeddings_int8(df)
    back = dequantize_embeddings_int8(q)
    for r in back.collect():
        v = r["embedding"]
        codes = r["codes"]
        approx = r["embedding_approx"]
        assert all(-127 <= c <= 127 for c in codes)
        for x, a in zip(v, approx):
            assert abs(x - a) <= r["scale"] * 0.5000001
        if r["vec_id"] == 99:
            assert r["scale"] == 1.0 and all(c == 0 for c in codes)


def test_quantize_int8_plan_map_only(spark):
    from geoparquet_io_spark.operators.similarity import quantize_embeddings_int8

    df = spark.createDataFrame([(1, [1.0, -2.0])], ["vec_id", "embedding"])
    plan = quantize_embeddings_int8(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_dedup_skew_cap_matches_all_pairs(spark):
    """Adversarial skew: every vector lands in ONE cluster as a mutual
    near-duplicate mass.  The capped (chain-band) path must produce the
    SAME kept-set as unconditional all-pairs — only the cluster minimum
    survives — while generating linear, not quadratic, pair volume."""
    from geoparquet_io_spark.operators.similarity import semantic_dedup

    n = 300
    rows = [(i, [1.0, 1e-6 * i, 0.0, 0.5]) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1.0, 0.0, 0.0, 0.5], [-1.0, 0.0, 0.0, -0.5]]
    capped = {r["vec_id"]: r["kept"] for r in semantic_dedup(
        df, cents, threshold=0.999, max_cluster_size=50, window=8
    ).collect()}
    exact = {r["vec_id"]: r["kept"] for r in semantic_dedup(
        df, cents, threshold=0.999, max_cluster_size=None).collect()}
    assert capped == exact
    assert capped[0] is True
    assert sum(capped.values()) == 1          # only the minimum survives


def test_chain_band_pairs_volume_is_linear(spark):
    """The oversize-cluster pairing generates <= 2*window pairs per row
    (banded join), never the n^2 of the all-pairs equi-join."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.operators.similarity import (
        _chain_band_pairs, as_double_array, dot)

    n, w = 400, 8
    df = spark.createDataFrame(
        [(i, [1.0, 0.001 * i]) for i in range(n)], ["id", "embedding"])
    rows = df.select(
        "id", as_double_array(F.col("embedding")).alias("v")
    ).withColumn("n", F.sqrt(dot(F.col("v"), F.col("v")))) \
     .withColumn("cluster", F.lit(0))
    pairs = _chain_band_pairs(rows, window=w)
    n_pairs = pairs.count()
    assert n_pairs <= n * w                   # linear bound (vs n^2/2=80k)
    assert n_pairs == (n - w) * w + w * (w - 1) // 2   # exact band count
    # every pair is a true id-order predecessor within the window
    bad = pairs.filter((F.col("id_b") <= F.col("id_a"))
                       | (F.col("id_b") - F.col("id_a") > w)).count()
    assert bad == 0


def test_semantic_dedup_capped_plan_no_cartesian(spark):
    from geoparquet_io_spark.operators.similarity import (ivf_centroids,
                                                          semantic_dedup)

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.0, 0.5]) for i in range(40)],
        ["vec_id", "embedding"])
    plan = semantic_dedup(df, ivf_centroids(4, 4, seed=7),
                          max_cluster_size=10)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_arrow_scorer_matches_hof_arithmetic(spark):
    """The Arrow gram-matrix scorer must reproduce the native-HOF
    cosine arithmetic exactly: recompute the kept-set with the
    all-pairs HOF expression path (the former implementation) and
    demand identical output on random data."""
    import numpy as np
    from pyspark.sql import functions as F

    from geoparquet_io_spark.operators.similarity import (
        _nearest_centroid, as_double_array, dot, ivf_centroids,
        semantic_dedup)

    rng = np.random.RandomState(11)
    dim, n = 16, 200
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = ivf_centroids(dim, 4, seed=3)
    thresh = 0.5
    got = {r["vec_id"]: (r["cluster"], r["kept"])
           for r in semantic_dedup(df, cents, threshold=thresh).collect()}

    # reference arithmetic: pure HOF expressions, all-pairs equi-join
    v = df.select(F.col("vec_id").alias("id"),
                  as_double_array(F.col("embedding")).alias("v")) \
        .withColumn("cluster", _nearest_centroid(F.col("v"), cents)) \
        .withColumn("n", F.sqrt(dot(F.col("v"), F.col("v"), dim)))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                 F.col("n").alias("na"), "cluster")
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("n").alias("nb"), "cluster")
    sim = dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb"))
    losers = {r["id_b"] for r in a.join(b, "cluster")
              .filter(F.col("id_a") < F.col("id_b"))
              .filter(sim >= thresh).select("id_b").collect()}
    want = {r["id"]: (r["cluster"], r["id"] not in losers)
            for r in v.select("id", "cluster").collect()}
    assert got == want
    assert any(not kept for _, kept in got.values())   # non-trivial case


def test_cluster_losers_arrow_blockwise_matches_whole(spark):
    """Blocked gram computation (block smaller than the cluster) must
    equal the single-block result — pins the predecessor mask and the
    block seams."""
    import numpy as np

    from geoparquet_io_spark.operators.similarity import (
        _assign_clusters_arrow, _cluster_losers_arrow)
    from pyspark.sql import functions as F

    rng = np.random.RandomState(4)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "embedding"])
    src = df.select(
        "id",
        F.transform("embedding", lambda c: c.cast("double")).alias("v"))
    pool = _assign_clusters_arrow(src, [[0.0] * 8])
    small = {r["id"] for r in
             _cluster_losers_arrow(pool, 0.3, block=7).collect()}
    whole = {r["id"] for r in
             _cluster_losers_arrow(pool, 0.3, block=4096).collect()}
    assert small == whole and len(whole) > 0
