"""Unit tests for PageRank, exact stratified sampling, the hashed linear
quality classifier, and the ORC converter."""

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------

def _pagerank_expected(edges, d=0.85, iters=3):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        inc = {v: 0.0 for v in nodes}
        for s, t in edges:
            inc[t] += pr[s] / out[s]
        pr = {v: (1 - d) / n + d * inc[v] for v in nodes}
    return {v: round(p, 6) for v, p in pr.items()}


def test_pagerank_hand_computed(spark):
    from geoparquet_io_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["pagerank"] for r in pagerank(df).collect()}
    exp = _pagerank_expected(edges)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-6)
    # 3 has the most in-links -> highest rank; 4 has none -> lowest
    assert got[3] == max(got.values())
    assert got[4] == min(got.values())


def test_pagerank_dedups_edges_and_validates(spark):
    from geoparquet_io_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2), (1, 2), (2, 1)], ["src", "dst"])
    got = {r["node"]: r["pagerank"] for r in pagerank(df, iterations=2).collect()}
    exp = _pagerank_expected([(1, 2), (2, 1)], iters=2)
    assert got == pytest.approx(exp)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.5)
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


# --------------------------------------------------------------------------
# stratified_take
# --------------------------------------------------------------------------

def test_stratified_take_exact_counts_and_determinism(spark):
    from geoparquet_io_spark.operators.sampling import stratified_take

    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, ["k", "stratum"])
    out1 = stratified_take(df, "k", "stratum", 7)
    counts = {r["stratum"]: r["n"] for r in
              out1.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 7, "s1": 7, "s2": 7}
    # deterministic: repartitioned input picks the identical rows
    out2 = stratified_take(df.repartition(13), "k", "stratum", 7)
    assert sorted(r["k"] for r in out1.collect()) == \
           sorted(r["k"] for r in out2.collect())
    # stratum smaller than n -> keeps all of it
    small = stratified_take(df.filter("k < 2"), "k", "stratum", 7)
    assert small.count() == 2


# --------------------------------------------------------------------------
# hashed_linear_score
# --------------------------------------------------------------------------

def test_hashed_linear_score_extremes(spark):
    from geoparquet_io_spark.operators.text import hashed_linear_score

    # all-positive weights -> every doc keeps; all-negative -> none
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "  ")],
        ["doc_id", "text"])
    pos = hashed_linear_score(df, [2.0] * 8, 0.0).collect()
    assert len(pos) == 2   # blank doc dropped
    for r in pos:
        assert r["keep"] is True
        # sigmoid(0 + 2.0) exactly, since every bucket weight is 2.0
        assert r["quality_score"] == pytest.approx(0.880797, abs=1e-6)
    neg = hashed_linear_score(df, [-2.0] * 8, 0.0).collect()
    assert all(r["keep"] is False for r in neg)


def test_hashed_linear_score_plan_native(spark):
    from geoparquet_io_spark.operators.text import hashed_linear_score

    df = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    plan = hashed_linear_score(df, [0.5] * 16, 0.1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------------------------------------
# ORC converter
# --------------------------------------------------------------------------

def test_orc_roundtrip_preserves_data(spark, tmp_path):
    from geoparquet_io_spark.sources.columnar import read_orc, write_orc

    rows = [(i, f"t{i}", bytes([i % 256, 255 - i % 256])) for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "s", "b"])
    path = str(tmp_path / "orc_out")
    write_orc(df, path, compression="zstd", partition_by=None)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) == \
           sorted(tuple(r) for r in df.collect())


def test_orc_partitioned_write_discovery(spark, tmp_path):
    import os

    from geoparquet_io_spark.sources.columnar import read_orc, write_orc

    df = spark.createDataFrame([(i, f"p{i % 2}") for i in range(20)], ["id", "part"])
    path = str(tmp_path / "orc_part")
    write_orc(df, path, partition_by=["part"])
    assert sorted(d for d in os.listdir(path) if d.startswith("part=")) == \
           ["part=p0", "part=p1"]
    back = read_orc(spark, path)
    assert back.count() == 20
    assert back.filter("part = 'p1'").count() == 10


# --------------------------------------------------------------------------
# select_under_token_budget
# --------------------------------------------------------------------------

def _budget_expected(rows, budget):
    """Reference global-window rule in plain python."""
    out, c = [], 0
    for i, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        if c + t <= budget:
            out.append(i)
            c += t
    # prefix rule: stop at first overflow
    kept, c = [], 0
    for i, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        c += t
        if c <= budget:
            kept.append(i)
        else:
            break
    return kept


def test_token_budget_prefix_rule(spark):
    from geoparquet_io_spark.operators.sampling import select_under_token_budget

    rows = [(i, (i * 37 % 100) / 100.0, 10 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "score", "n_tokens"])
    for budget in (0, 55, 500, 10_000_000):
        got = sorted(r["doc_id"] for r in
                     select_under_token_budget(df, budget).collect())
        assert got == sorted(_budget_expected(rows, budget)), budget
    import pytest as _p
    with _p.raises(ValueError):
        select_under_token_budget(df, -1)


def test_token_budget_no_global_window(spark):
    """The plan must not contain a single-partition window over the whole
    input — only the boundary bucket is windowed."""
    from geoparquet_io_spark.operators.sampling import select_under_token_budget

    rows = [(i, (i % 10) / 10.0, 5) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "score", "n_tokens"])
    out = select_under_token_budget(df, 100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window partitions by the bucket column, never an empty clause
    assert "partitionBy" not in plan or "__b" in plan
    got = out.count()
    assert got == 20   # 100-token budget / 5 tokens, highest scores first


# --------------------------------------------------------------------------
# weighted_take
# --------------------------------------------------------------------------

def test_weighted_take_matches_python_mirror(spark):
    import hashlib

    from geoparquet_io_spark.operators.sampling import weighted_take

    rows = [(i, f"s{i % 2}", float(1 + i % 9)) for i in range(60)]
    df = spark.createDataFrame(rows, ["k", "stratum", "w"])

    def draw(key, salt="wtake"):
        h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
        return int(h[:8], 16)

    def mirror(n, stratum=None):
        pri = [(k, s, pow((draw(k) + 0.5) / 2**32, 1.0 / w))
               for k, s, w in rows]
        if stratum is None:
            return sorted(k for k, _, _ in
                          sorted(pri, key=lambda t: (-t[2], t[0]))[:n])
        keep = []
        for sv in ("s0", "s1"):
            grp = [t for t in pri if t[1] == sv]
            keep += [k for k, _, _ in
                     sorted(grp, key=lambda t: (-t[2], t[0]))[:n]]
        return sorted(keep)

    got_g = sorted(r["k"] for r in weighted_take(df, "k", "w", 7).collect())
    assert got_g == mirror(7)
    got_s = sorted(r["k"] for r in
                   weighted_take(df, "k", "w", 5, "stratum").collect())
    assert got_s == mirror(5, stratum=True)

    import pytest as _p
    # validation rides inside the priority expression (no extra input
    # pass), so it surfaces lazily at action time
    with _p.raises(Exception, match="positive weights"):
        weighted_take(df.withColumn("w", df.w - 5.0), "k", "w", 3).collect()


def _mixture_expected(rows, budgets):
    """Per-group prefix rule in plain python."""
    kept = []
    for g, budget in budgets.items():
        c = 0
        for i, grp, s, t in sorted((r for r in rows if r[1] == g),
                                   key=lambda r: (-r[2], r[0])):
            c += t
            if c <= budget:
                kept.append(i)
            else:
                break
    return sorted(kept)


def test_mixture_budget_per_group_prefix_rule(spark):
    from geoparquet_io_spark.operators.sampling import (
        mixture_under_token_budget)

    rows = [(i, f"g{i % 4}", (i * 37 % 100) / 100.0, 10 + i % 7)
            for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score",
                                      "n_tokens"])
    for budgets in ({"g0": 120, "g1": 55}, {"g0": 0, "g2": 10_000_000},
                    {"g0": 333, "g1": 77, "g2": 200, "g3": 1}):
        got = sorted(r["doc_id"] for r in
                     mixture_under_token_budget(df, budgets).collect())
        assert got == _mixture_expected(rows, budgets), budgets
    # unlisted groups are dropped entirely
    out = mixture_under_token_budget(df, {"g0": 10_000_000}).collect()
    assert {r["source"] for r in out} == {"g0"}
    import pytest as _p
    with _p.raises(ValueError):
        mixture_under_token_budget(df, {"g0": -1})


def test_dsir_prefers_target_like_documents(spark):
    """DSIR (importance resampling) must overwhelmingly select pool docs
    drawn from the target's vocabulary over off-domain docs."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.operators.sampling import dsir_select

    tvocab = [f"med{i}" for i in range(30)]       # "medical" domain
    ovocab = [f"web{i}" for i in range(30)]       # generic web
    rows = []
    for i in range(40):   # target corpus: pure domain text
        rows.append((10_000 + i, " ".join(tvocab[(i + j) % 30]
                                          for j in range(20)), "target"))
    for i in range(50):   # pool: 25 in-domain, 25 off-domain
        vocab = tvocab if i < 25 else ovocab
        rows.append((i, " ".join(vocab[(i + j) % 30]
                                 for j in range(20)), "pool"))
    df = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    out = dsir_select(df.filter("kind = 'pool'"),
                      df.filter("kind = 'target'"), n=20,
                      num_features=128)
    picked = [r["doc_id"] for r in out.collect()]
    assert len(picked) == 20
    in_domain = sum(1 for d in picked if d < 25)
    assert in_domain >= 18, picked   # near-total preference
    # and logweights separate the domains
    lws = {r["doc_id"]: r["logweight"] for r in out.collect()}
    assert all(lws[d] > 0 for d in picked if d < 25)


def test_dsir_topn_is_take_ordered(spark):
    from geoparquet_io_spark.operators.sampling import dsir_select
    from geoparquet_io_spark.plans import formatted_plan

    df = spark.createDataFrame(
        [(i, "a b c", "p") for i in range(10)]
        + [(100, "a b", "t")], "doc_id long, text string, k string")
    out = dsir_select(df.filter("k = 'p'"), df.filter("k = 't'"), n=3,
                      num_features=16)
    plan = formatted_plan(out)
    assert "TakeOrderedAndProject" in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan, plan


def test_triangle_count_vs_bruteforce(spark):
    """Random graph: degree-ordered count == itertools brute force."""
    import itertools
    import random

    from geoparquet_io_spark.operators.graph import triangle_count

    rng = random.Random(7)
    edges = {(a, b) for a in range(15) for b in range(a + 1, 15)
             if rng.random() < 0.3}
    adj = {v: set() for v in range(15)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want_total = sum(1 for x, y, z in itertools.combinations(range(15), 3)
                     if y in adj[x] and z in adj[x] and z in adj[y])
    per_v = {v: sum(1 for x, y, z in itertools.combinations(range(15), 3)
                    if v in (x, y, z)
                    and y in adj[x] and z in adj[x] and z in adj[y])
             for v in range(15)}
    # feed DIRECTED duplicates + self loops: operator must canonicalize
    raw = [(a, b) for a, b in edges] + [(b, a) for a, b in edges] \
        + [(3, 3), (5, 5)]
    df = spark.createDataFrame(raw, ["src", "dst"])
    got = {r["vertex"]: r["n_triangles"]
           for r in triangle_count(df).collect()}
    assert got == {v: c for v, c in per_v.items() if c > 0}
    tot = triangle_count(df, per_vertex=False).collect()[0]["n_triangles"]
    assert tot == want_total


def test_triangle_count_plan_no_cartesian(spark):
    from geoparquet_io_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    plan = triangle_count(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_count_string_vertices(spark):
    """String vertex ids (URLs/doc hashes) must count triangles — the
    old cast('long') nulled them and silently returned zero."""
    from geoparquet_io_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "c.com"), ("a.com", "c.com"),
         ("c.com", "d.com")], ["src", "dst"])
    total = triangle_count(edges, per_vertex=False).collect()[0]["n_triangles"]
    assert total == 1
    per_v = {r["vertex"] for r in triangle_count(edges).collect()}
    assert per_v == {"a.com", "b.com", "c.com"}


def test_pagerank_empty_edges(spark):
    from geoparquet_io_spark.operators.graph import pagerank

    from pyspark.sql import functions as F

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"]) \
        .filter(F.lit(False))
    assert pagerank(edges).count() == 0  # empty result, not ZeroDivisionError


def test_pagerank_drops_null_endpoint_edges(spark):
    """NULL src/dst edges are excluded like triangle_count does: they
    inflated n_nodes, emitted a spurious null rank row, and their rank
    mass silently vanished in the joins anyway (r9 review)."""
    from geoparquet_io_spark.operators.graph import pagerank

    dirty = spark.createDataFrame(
        [(None, "b"), ("a", "b"), ("b", None), ("b", "a")],
        "src string, dst string")
    clean = dirty.filter("src IS NOT NULL AND dst IS NOT NULL")
    got = {r["node"]: r["pagerank"]
           for r in pagerank(dirty, iterations=3).collect()}
    want = {r["node"]: r["pagerank"]
            for r in pagerank(clean, iterations=3).collect()}
    assert got == want
    assert None not in got and set(got) == {"a", "b"}
