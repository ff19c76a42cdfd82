"""Mergeable-sketch operators (HyperLogLog) for 100 TB rollups.

The scale pattern: build ONE sketch per (group, shard) as data lands —
cheap map-side partial aggregation — persist the sketches (a few KB per
group), then answer any distinct-count rollup by UNIONING sketches
instead of rescanning the raw data.  This is how warehouse-scale
distinct counting works (Apache DataSketches; Spark exposes it natively
as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
all JVM-side, no python in the plan).

The reference has only DuckDB ``APPROX_COUNT_DISTINCT`` inside its
stats surface (core/inspect_utils.py:717-796); this generalizes it to
re-mergeable persisted sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_shard_sketches(df: DataFrame, group_column: str, value_column: str,
                       shard_column=None, n_shards: int = 16,
                       lgk: int = 14) -> DataFrame:
    """Phase 1: one HLL sketch per (group, shard).

    ``shard_column`` defaults to a deterministic hash shard of the value,
    standing in for whatever physical unit the sketches would be
    persisted per (file, partition, day...).  Output is tiny:
    n_groups * n_shards rows of binary sketches.
    """
    shard = (shard_column if shard_column is not None
             else F.pmod(F.xxhash64(F.col(value_column)), F.lit(n_shards)))
    return (df.groupBy(F.col(group_column), shard.alias("shard"))
            .agg(F.hll_sketch_agg(F.col(value_column), F.lit(lgk))
                 .alias("sketch")))


def hll_rollup(sketches: DataFrame, group_column: str) -> DataFrame:
    """Phase 2: merge shard sketches per group and estimate.  Runs over
    the sketch table only — never touches raw data again."""
    return (sketches.groupBy(group_column)
            .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch")))
                 .alias("approx_distinct")))


def hll_distinct_check(df: DataFrame, group_column: str, value_column: str,
                       rel_tol: float = 0.05, n_shards: int = 16,
                       lgk: int = 14) -> DataFrame:
    """Self-verifying distinct rollup: build per-shard sketches, merge to
    group level, and join back against the EXACT per-group distinct count
    (affordable at test scale) asserting the estimate lands within
    ``rel_tol``.  Returns (group, n_exact, est_ok) so a SQL oracle can
    validate the exact values and the claimed error bound.
    """
    est = hll_rollup(
        hll_shard_sketches(df, group_column, value_column,
                           n_shards=n_shards, lgk=lgk),
        group_column)
    exact = (df.groupBy(group_column)
             .agg(F.count_distinct(F.col(value_column)).alias("n_exact")))
    joined = exact.join(est, group_column)
    err = F.abs(F.col("approx_distinct") - F.col("n_exact")) \
        / F.col("n_exact").cast("double")
    return joined.select(
        group_column,
        F.col("n_exact"),
        (err <= F.lit(rel_tol)).alias("est_ok"),
    )
