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
