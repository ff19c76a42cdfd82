"""Persisted IVF index: build/load/search parity with the in-memory
path, and file-level partition pruning at search time."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _embeddings(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_index_search_equals_in_memory_ivf(spark, tmp_path):
    from geoparquet_io_spark.operators.similarity import (
        build_ivf_index, ivf_topk, search_ivf_index)

    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") % 61 == 0)
    path = str(tmp_path / "idx")
    meta = build_ivf_index(spark, e, path, dim=64, n_centroids=8, seed=7)
    assert meta["n_vectors"] == e.count()
    got = sorted(
        tuple(r) for r in
        search_ivf_index(spark, path, q, k=3, nprobe=3).collect())
    exp = sorted(
        tuple(r) for r in
        ivf_topk(e, q, dim=64, k=3, n_centroids=8, nprobe=3,
                 seed=7).collect())
    assert got == exp and len(got) > 0


def test_index_meta_roundtrip(spark, tmp_path):
    from geoparquet_io_spark.operators.similarity import (
        build_ivf_index, ivf_centroids, load_ivf_index)

    e = _embeddings(spark)
    path = str(tmp_path / "idx")
    build_ivf_index(spark, e, path, dim=64, n_centroids=8, seed=7)
    vec, meta = load_ivf_index(spark, path)
    assert meta["dim"] == 64 and meta["n_centroids"] == 8
    assert meta["centroids"] == ivf_centroids(64, 8, seed=7)
    assert "ivf_list" in vec.columns
    assert vec.count() == e.count()


def test_search_prunes_partitions(spark, tmp_path):
    """The probed-lists filter must reach the scan as a PARTITION filter
    (hive pruning skips unprobed lists' files before any row is read)."""
    from geoparquet_io_spark.operators.similarity import (
        build_ivf_index, search_ivf_index)
    from geoparquet_io_spark.plans import formatted_plan

    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") == 0)  # one query -> nprobe lists
    path = str(tmp_path / "idx")
    build_ivf_index(spark, e, path, dim=64, n_centroids=8, seed=7)
    out = search_ivf_index(spark, path, q, k=3, nprobe=2)
    plan = formatted_plan(out)
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and "ivf_list" in scan[0], plan
    # and the search is still correct on the pruned read
    assert out.count() == 3


def test_trained_centroids_flow_through_index(spark, tmp_path):
    from geoparquet_io_spark.operators.similarity import (
        build_ivf_index, ivf_train_centroids, load_ivf_index,
        search_ivf_index)

    e = _embeddings(spark)
    cents = ivf_train_centroids(e, dim=64, n_centroids=4, sample_rows=500,
                                iterations=2)
    path = str(tmp_path / "idx")
    build_ivf_index(spark, e, path, dim=64, n_centroids=4, centroids=cents)
    _, meta = load_ivf_index(spark, path)
    assert meta["centroids"] == cents
    q = e.filter(F.col("vec_id") % 101 == 0)
    got = search_ivf_index(spark, path, q, k=2, nprobe=2).collect()
    assert len(got) > 0
    assert all(r["rank"] <= 2 for r in got)


def test_kmeans_fit_distributed_converges_to_true_centers(spark):
    """Two well-separated blobs: after 2 distributed Lloyd steps the
    trained centroids sit on the blob means (within rounding)."""
    import numpy as np

    from geoparquet_io_spark.operators.similarity import \
        kmeans_fit_distributed

    rng = np.random.RandomState(2)
    rows = []
    for i in range(200):
        base = [5.0, 5.0] if i % 2 == 0 else [-5.0, -5.0]
        rows.append((i, [float(base[0] + 0.1 * rng.randn()),
                         float(base[1] + 0.1 * rng.randn())]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_fit_distributed(
        df, dim=2, n_centroids=2, iterations=2,
        init=[[1.0, 1.0], [-1.0, -1.0]])
    got = sorted(tuple(c) for c in cents)
    assert abs(got[0][0] + 5.0) < 0.1 and abs(got[0][1] + 5.0) < 0.1
    assert abs(got[1][0] - 5.0) < 0.1 and abs(got[1][1] - 5.0) < 0.1


def test_kmeans_fit_empty_cluster_keeps_previous_centroid(spark):
    """A centroid that captures no points must carry through unchanged
    (rounded) rather than collapse to NaN."""
    from geoparquet_io_spark.operators.similarity import \
        kmeans_fit_distributed

    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(10)], ["vec_id", "embedding"])
    cents = kmeans_fit_distributed(
        df, dim=2, n_centroids=2, iterations=3,
        init=[[1.0, 1.0], [99.0, 99.0]])
    assert cents[0] == [1.0, 1.0]
    assert cents[1] == [99.0, 99.0]     # never assigned -> unchanged


def test_kmeans_model_table_sizes_sum_to_rows(spark):
    from geoparquet_io_spark.operators.similarity import kmeans_model_table

    df = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(60)],
        ["vec_id", "embedding"])
    out = kmeans_model_table(spark, df, dim=2, n_centroids=3, iterations=2)
    rows = out.collect()
    # one row per (non-empty cluster, dim); sizes consistent across dims
    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r["cluster"], set()).add(r["size"])
    assert all(len(s) == 1 for s in per_cluster.values())
    assert sum(next(iter(s)) for s in per_cluster.values()) == 60


def test_ann_recall_set_arithmetic(spark):
    from geoparquet_io_spark.operators.similarity import ann_recall

    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], ["query_id", "neighbor_id"])
    exact = spark.createDataFrame(
        [(1, 10), (1, 12), (2, 20), (2, 21), (3, 30)],
        ["query_id", "neighbor_id"])
    out = {r["query_id"]: (r["hits"], r["n_true"], r["recall"])
           for r in ann_recall(approx, exact).collect()}
    assert out[1] == (1, 2, 0.5)        # one of two true neighbors found
    assert out[2] == (1, 2, 0.5)
    assert out[3] == (0, 1, 0.0)        # query absent from approx -> 0


def test_hyperplanes_span_both_signs():
    """The LCG draw must cover [-1, 1): a [-1, 0)-only range put every
    plane in one orthant (pairwise cosine ~0.7) and collapsed LSH
    bucketing toward the two all-same-sign buckets."""
    from geoparquet_io_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(64, 8, seed=42)
    flat = [x for p in planes for x in p]
    assert any(x > 0 for x in flat) and any(x < 0 for x in flat)
    # pairwise cosines should look random, not near-parallel
    import math
    cos = []
    for i in range(len(planes)):
        for j in range(i + 1, len(planes)):
            d = sum(a * b for a, b in zip(planes[i], planes[j]))
            cos.append(abs(d))
    assert max(cos) < 0.6, f"planes nearly parallel: max |cos| {max(cos):.2f}"


def test_ann_recall_dedups_pair_lists(spark):
    """Duplicate (query, neighbor) rows in either input must not inflate
    recall above 1.0 — the inputs are treated as SETS."""
    from geoparquet_io_spark.operators.similarity import ann_recall

    approx = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11)], ["query_id", "neighbor_id"])
    exact = spark.createDataFrame(
        [(1, 10), (1, 12)], ["query_id", "neighbor_id"])
    r = ann_recall(approx, exact).collect()[0]
    assert r["hits"] == 1 and r["n_true"] == 2 and r["recall"] == 0.5


def test_kmeans_init_length_validated(spark):
    import pytest

    from geoparquet_io_spark.operators.similarity import kmeans_fit_distributed

    df = spark.createDataFrame([(1, [0.0, 1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="init has"):
        kmeans_fit_distributed(df, dim=2, n_centroids=3,
                               init=[[0.0, 1.0], [1.0, 0.0]])


def test_kmeans_model_table_reports_empty_clusters(spark):
    """A collapsed cluster appears explicitly with size=0, keeping the
    one-row-per-(cluster, dim) contract."""
    from geoparquet_io_spark.operators.similarity import kmeans_model_table

    # all points identical -> every non-winning cluster is empty
    df = spark.createDataFrame([(i, [1.0, 1.0]) for i in range(5)],
                               ["vec_id", "embedding"])
    out = kmeans_model_table(spark, df, dim=2, n_centroids=4, iterations=1)
    rows = out.collect()
    assert len(rows) == 4 * 2
    sizes = {r["cluster"]: r["size"] for r in rows}
    assert sum(1 for v in sizes.values() if v == 0) == 3
    assert sum(sizes.values()) == 5


def test_zero_norm_embedding_does_not_crash(spark):
    """Spark 4 ANSI mode: one all-zero embedding must yield NULL cosine
    (sinking in rankings), not a DIVIDE_BY_ZERO job kill."""
    from geoparquet_io_spark.operators.similarity import brute_force_topk

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = brute_force_topk(df, df.filter("vec_id = 1"), k=2).collect()
    ids = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ids[0] == 2                     # zero vector never wins
    assert all(r["cosine"] is None for r in out if r["neighbor_id"] == 3)


def test_brute_topk_kernel_edge_semantics(spark):
    """r7 Arrow-kernel brute_force_topk edge parity with the HOF shape:
    duplicated query ids exclude their self-pair for EVERY instance;
    null vectors and length-mismatched vectors fill ranks with NULL
    cosine (sinking last); null neighbor ids drop under exclusion."""
    from geoparquet_io_spark.operators.similarity import brute_force_topk

    rows = [(1, [1.0, 0.0]), (1, [0.0, 1.0]),       # duplicate id 1!
            (2, [0.9, 0.1]), (3, None),              # null vector
            (4, [1.0, 0.0, 0.0]),                    # length mismatch
            (None, [0.8, 0.2])]                      # null id
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 1")                      # BOTH id-1 vectors
    out = brute_force_topk(df, q, k=6).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    # self-pairs for id 1 excluded for BOTH query instances; null id
    # dropped (NULL != 1 is NULL); survivors: 2 scored per instance,
    # 3/4 as NULL fillers (id-asc ties), one per instance
    assert [r["neighbor_id"] for r in by_rank] == [2, 2, 3, 3, 4, 4]
    assert all(r["neighbor_id"] != 1 for r in out)
    fillers = [r for r in out if r["neighbor_id"] in (3, 4)]
    assert all(r["cosine"] is None for r in fillers)
    valid = [r for r in out if r["neighbor_id"] == 2]
    assert all(r["cosine"] is not None for r in valid)
    # NULL cosine never outranks a valid score
    assert max(r["rank"] for r in valid) < min(r["rank"] for r in fillers)


def test_brute_topk_exact_on_degenerate_all_tied_corpus(spark):
    """When every candidate in a task ties at the selection boundary
    (constant embeddings — realistic for quantized / one-hot corpora),
    the id-ascending tie-break must stay EXACT: the old fixed 2*cap
    argpartition window kept an arbitrary positional subset of the
    ties, silently returning wrong neighbor ids (r7 ADVICE).  Ids are
    laid out in DESCENDING row order so a positional window provably
    misses the winners."""
    from geoparquet_io_spark.operators.similarity import (
        _topk_tie_cap, brute_force_topk)

    n, k = 400, 3
    assert n > 2 * _topk_tie_cap(k)        # the old window cannot hold all ties
    rows = [(i, [1.0, 0.0]) for i in range(n - 1, -1, -1)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").coalesce(1)
    out = sorted(brute_force_topk(df, df.filter("vec_id = 1"), k=k).collect(),
                 key=lambda r: r["rank"])
    # all cosines tie at 1.0 -> winners are the k smallest ids, self excluded
    assert [r["neighbor_id"] for r in out] == [0, 2, 3]
    assert all(r["cosine"] == 1.0 for r in out)


def test_brute_topk_chunked_prune_matches_reference(spark):
    """Differential check of the r8 chunk + running-threshold-prune
    machinery: _SCORE_CELLS forced tiny (many chunks per batch, prune
    active from the first trim) on heavily-quantized random embeddings
    (round_digits=1 -> dense ties at every boundary), multiple
    partitions; the result must equal an independent numpy top-k with
    the same (cosine desc, id asc) ordering."""
    import numpy as np

    from geoparquet_io_spark.operators import similarity as S

    rng = np.random.default_rng(42)
    n, dim, k = 600, 4, 3
    vecs = rng.integers(-2, 3, size=(n, dim)).astype(float)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    # 2 partitions x ~300 rows, 64-row chunks (score_cells floor): the
    # amortized 2*cap trim fires mid-task (cap(k=3) = 88), so later
    # chunks really exercise the threshold prune, not just chunking
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(2)
    q = df.filter(F.col("vec_id") % 37 == 0)
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in S.brute_force_topk(df, q, k=k, round_digits=1,
                                    dim=dim, score_cells=64).collect())

    # independent reference: full cosine matrix + stable (desc, id) sort
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    want = []
    for qi in range(0, n, 37):
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = (vecs @ vecs[qi]) / (norms * norms[qi])
        order = sorted(
            (i for i in range(n) if i != qi and not np.isnan(sims[i])),
            key=lambda i: (-round(sims[i], 1), i))
        fill = [i for i in range(n) if i != qi and np.isnan(sims[i])]
        top = order[:k] + fill[:max(0, k - len(order))]
        for rank, i in enumerate(top[:k], start=1):
            c = None if np.isnan(sims[i]) else round(float(sims[i]), 1)
            want.append((qi, rank, i, c))
    assert got == sorted(want)


def test_lsh_dim_mismatch_fails_loud(spark):
    import pytest as _p

    from geoparquet_io_spark.operators.similarity import lsh_topk

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0])],
                               ["vec_id", "embedding"])
    with _p.raises(Exception, match="vector length"):
        lsh_topk(df, df.limit(1), dim=3, k=1).collect()


def test_rrf_fuse_dedupes_within_ranking(spark):
    from geoparquet_io_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame([(7, 3), (7, 7), (8, 1)], ["doc", "rank"])
    r2 = spark.createDataFrame([(7, 2), (8, 5)], ["doc", "rank"])
    out = {r["doc"]: (r["rrf_score"], r["n_rankings"])
           for r in rrf_fuse([r1, r2], "doc").collect()}
    # doc 7 contributes its BEST rank (3) once from r1, not 3 and 7
    assert out[7][1] == 2
    assert abs(out[7][0] - (1 / 63 + 1 / 62)) < 1e-6  # round_digits=6


def test_ivf_interrupted_build_detected(spark, tmp_path):
    import json
    import os

    import pytest as _p

    from geoparquet_io_spark.operators.similarity import (
        build_ivf_index,
        load_ivf_index,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 4), float(i % 3)]) for i in range(20)],
        ["vec_id", "embedding"])
    path = str(tmp_path / "idx")
    build_ivf_index(spark, df, path, dim=2, n_centroids=2)
    load_ivf_index(spark, path)           # clean build loads
    # simulate a crash between vector rewrite and sidecar swap
    os.unlink(os.path.join(path, "vectors", "_BUILD_TOKEN"))
    with _p.raises(ValueError, match="interrupted"):
        load_ivf_index(spark, path)
    # non-local paths are an honest gate
    with _p.raises(NotImplementedError, match="sidecar"):
        build_ivf_index(spark, df, "s3a://bucket/idx", dim=2)


def test_ivf_build_excludes_nonfinite_vectors(spark, tmp_path):
    """A vector containing NaN/Inf gets cluster NULL from the assignment
    kernel; the build must not write it to __HIVE_DEFAULT_PARTITION__
    nor count it in n_vectors (the silent-inflation failure mode the
    NULL-vector filter already guards)."""
    import math
    import os

    from geoparquet_io_spark.operators.similarity import (
        build_ivf_index,
        load_ivf_index,
    )

    rows = [(i, [float(i % 4), float(i % 3)]) for i in range(20)]
    rows += [(100, [math.nan, 1.0]), (101, [math.inf, 0.0]), (102, None)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    path = str(tmp_path / "idx")
    meta = build_ivf_index(spark, df, path, dim=2, n_centroids=2)
    assert meta["n_vectors"] == 20
    parts = os.listdir(os.path.join(path, "vectors"))
    assert not any("HIVE_DEFAULT" in p for p in parts)
    vectors, _ = load_ivf_index(spark, path)
    ids = {r["vec_id"] for r in vectors.select("vec_id").collect()}
    assert ids == set(range(20))


def test_ivf_trained_rejects_empty_centroids(spark):
    import pytest as _p

    from geoparquet_io_spark.operators.similarity import ivf_topk_trained

    df = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    with _p.raises(ValueError, match="empty"):
        ivf_topk_trained(df, df, dim=2, centroids=[])


def test_brute_topk_nan_denom_ranks_first(spark):
    """Spark's NaN total order makes `when(denom > 0)` TRUE for a NaN
    norm, so a NaN-component vector yields a NaN cosine that ranks
    FIRST under desc — the kernel must not demote it to a NULL filler
    (r7 review repro)."""
    import math

    from geoparquet_io_spark.operators.similarity import brute_force_topk

    rows = [(1, [1.0, 0.0]), (2, [math.nan, 1.0]), (3, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(brute_force_topk(df, df.filter("vec_id = 1"), k=2).collect(),
                 key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in out] == [2, 3]
    assert math.isnan(out[0]["cosine"])
    assert abs(out[1]["cosine"] - 0.993884) < 1e-6


def test_brute_topk_null_element_vector_is_filler(spark):
    """A vector CONTAINING a null element poisons the HOF fold -> NULL
    cosine (filler, sinks last) — Arrow's to_numpy turns the null into
    NaN, which without masking would rank it FIRST as a fake NaN
    cosine (r7 second review pass)."""
    from geoparquet_io_spark.operators.similarity import brute_force_topk

    rows = [(1, [1.0, 0.0]), (2, [None, 1.0]), (3, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(brute_force_topk(df, df.filter("vec_id = 1"), k=2).collect(),
                 key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in out] == [3, 2]
    assert out[0]["cosine"] is not None       # real neighbor first
    assert out[1]["cosine"] is None           # null-element row: filler


def test_null_vector_rows_do_not_kill_dim_checked_paths(spark):
    """A NULL embedding must pass through as_double_array's dim gate as
    NULL (r9 review: F.size(NULL) made the when-condition NULL, routing
    the row into raise_error with a NULL message — one missing embedding
    killed the whole job in every dim-enforcing path)."""
    from geoparquet_io_spark.operators.similarity import lsh_topk

    rows = [(1, [1.0, 0.0]), (2, None), (3, [0.9, 0.1]), (4, [1.0, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = lsh_topk(df, df.filter("vec_id = 1"), dim=2, k=3, n_planes=2)
    got = {r["neighbor_id"] for r in out.collect()}
    assert 2 not in got            # NULL row excluded, not crashed
    assert got                     # and real neighbors still found


def test_ivf_topk_ragged_data_vector_raises(spark):
    """ivf_topk silently DROPPED wrong-length data vectors (NULL-padded
    zip_with -> NULL centroid distances -> NULL ivf_list -> row vanishes
    from the equi-join); the dim gate must instead raise loudly on both
    sides (r9 review)."""
    import pytest
    from geoparquet_io_spark.operators.similarity import ivf_topk

    rows = [(1, [1.0, 0.0]), (2, [0.5]), (3, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="vector length"):
        ivf_topk(df, df.filter("vec_id = 1"), dim=2, k=2,
                 n_centroids=4).collect()
    with pytest.raises(Exception, match="vector length"):
        ivf_topk(df.filter("vec_id != 2"), df, dim=2, k=2,
                 n_centroids=4).collect()


def test_ivf_topk_trained_delegates_to_ivf_topk(spark):
    """The trained path shares ivf_topk's body (r9 dedup of the drifted
    copies): explicit centroids through either entry point must agree."""
    from geoparquet_io_spark.operators.similarity import (
        ivf_centroids, ivf_topk, ivf_topk_trained)

    e = _embeddings(spark).limit(200)
    q = e.filter(F.col("vec_id") % 61 == 0)
    cents = ivf_centroids(64, 8, seed=7)
    a = sorted(tuple(r) for r in
               ivf_topk(e, q, dim=64, k=3, n_centroids=8, nprobe=3,
                        seed=7).collect())
    b = sorted(tuple(r) for r in
               ivf_topk_trained(e, q, dim=64, k=3, nprobe=3,
                                centroids=cents).collect())
    assert a == b and a


def test_lsh_topk_shuffle_join_path_matches_broadcast(spark):
    """broadcast_queries=False (the escape path brute_force_topk's size
    error points at) must return identical rows via the shuffle
    equi-join."""
    from geoparquet_io_spark.operators.similarity import lsh_topk

    e = _embeddings(spark).limit(300)
    q = e.filter(F.col("vec_id") % 61 == 0)
    a = sorted(tuple(r) for r in
               lsh_topk(e, q, dim=64, k=3).collect())
    b = sorted(tuple(r) for r in
               lsh_topk(e, q, dim=64, k=3,
                        broadcast_queries=False).collect())
    assert a == b and a


def test_semantic_dedup_null_embedding_rows_kept(spark):
    """NULL-embedding rows get cluster NULL and kept=True — the assign
    kernel's np.stack previously died on the first batch containing a
    None (opaque executor shape error); a row with no embedding can
    neither lose nor witness (r9 review)."""
    from geoparquet_io_spark.operators.similarity import (
        ivf_centroids, semantic_dedup)

    cents = ivf_centroids(4, 2, seed=7)
    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, None),
            (3, [1.0, 0.0, 0.0, 0.0]), (4, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: (r["cluster"], r["kept"])
           for r in semantic_dedup(df, cents, threshold=0.99).collect()}
    assert len(out) == 4
    assert out[2] == (None, True)          # null row: kept, no cluster
    assert out[1][1] is True               # lowest-id duplicate survives
    assert out[3][1] is False              # its twin loses
    assert out[4][1] is True


def test_semantic_dedup_incremental_null_embedding_rows_kept(spark):
    from geoparquet_io_spark.operators.similarity import (
        ivf_centroids, semantic_dedup_incremental)

    cents = ivf_centroids(4, 2, seed=7)
    idx = spark.createDataFrame([(100, [1.0, 0.0, 0.0, 0.0])],
                                "vec_id long, embedding array<double>")
    new = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, None), (3, [0.0, 0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: (r["cluster"], r["kept"])
           for r in semantic_dedup_incremental(
               new, idx, cents, threshold=0.99).collect()}
    assert out[1][1] is False              # killed by the index witness
    assert out[2] == (None, True)          # null row: kept
    assert out[3][1] is True


def test_kmeans_fit_skips_null_vectors(spark):
    """NULL vectors contribute nothing to a mean — previously the assign
    kernel crashed (np.stack over None), then the NULL-cluster group's
    int(None) would crash the driver loop."""
    from geoparquet_io_spark.operators.similarity import (
        kmeans_fit_distributed)

    rows = [(0, [0.0, 0.0]), (1, [0.0, 2.0]), (2, None), (3, [10.0, 10.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit_distributed(
        df, dim=2, n_centroids=2, iterations=2,
        init=[[0.0, 1.0], [9.0, 9.0]])
    assert cents[0] == [0.0, 1.0] and cents[1] == [10.0, 10.0]


def test_semantic_dedup_null_id_consistent_across_cluster_routing(spark):
    """A NULL-id row must get the SAME survivor semantics whichever path
    its cluster size routes it through (r9 review: pandas sort_values
    puts None LAST in the all-pairs scorer while Spark's default asc
    window put NULLs FIRST in the banded chain — so a null-id row
    flipped from losing to killing when a cluster crossed
    max_cluster_size).  Consistent rule: null-id rows never witness and
    are always reported kept (the final equi-join on id cannot match a
    NULL key)."""
    from geoparquet_io_spark.operators.similarity import (
        ivf_centroids, semantic_dedup)

    cents = ivf_centroids(4, 2, seed=7)
    vec = [1.0, 0.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(1, vec), (2, vec), (None, vec)],
        "vec_id long, embedding array<double>")

    def kept(max_cluster_size):
        rows = semantic_dedup(df, cents, threshold=0.9,
                              max_cluster_size=max_cluster_size,
                              window=64).collect()
        return {r["vec_id"]: r["kept"] for r in rows}

    all_pairs = kept(None)          # arrow all-pairs scorer
    chained = kept(2)               # cluster of 3 > 2 -> banded chain
    assert all_pairs == chained
    assert all_pairs[1] is True     # lowest real id survives
    assert all_pairs[2] is False    # loses to id 1
    assert all_pairs[None] is True  # null id: never killed, never kills


def test_kmeans_nan_vector_does_not_collapse_clusters(spark):
    """Regression (r10 sweep): one NaN-element vector made its cluster's
    centroid NaN; on the next assignment pass numpy argmin returns the
    first all-NaN distance index, so EVERY vector collapsed into that
    cluster.  Non-finite vectors must be excluded like NULLs — the
    trained centroids must be finite and identical to training on the
    clean subset alone."""
    import math

    from geoparquet_io_spark.operators.similarity import \
        kmeans_fit_distributed

    clean_rows = [(i, [float(i % 4), float((i * 7) % 5)])
                  for i in range(40)]
    dirty_rows = clean_rows + [
        (100, [math.nan, 0.0]), (101, [0.0, math.inf]), (102, None),
        (103, [1.0, None])]
    clean = spark.createDataFrame(clean_rows,
                                  "vec_id long, embedding array<double>")
    dirty = spark.createDataFrame(dirty_rows,
                                  "vec_id long, embedding array<double>")
    c1 = kmeans_fit_distributed(clean, dim=2, n_centroids=4, iterations=3)
    c2 = kmeans_fit_distributed(dirty, dim=2, n_centroids=4, iterations=3)
    assert c1 == c2
    assert all(math.isfinite(x) for c in c2 for x in c)
