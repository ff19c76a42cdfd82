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
    # an all-NULL group has n_exact = 0: err is then NULL (0/0) and a
    # self-verifying check must never emit a NULL verdict — the estimate
    # is "ok" iff it is also zero/absent
    ok = F.when(F.col("n_exact") == 0,
                F.coalesce(F.col("approx_distinct"), F.lit(0)) == 0) \
        .otherwise(err <= F.lit(rel_tol))
    return joined.select(
        group_column,
        F.col("n_exact"),
        ok.alias("est_ok"),
    )


# --- count-min sketch --------------------------------------------------------

def _cms_bucket(value, row: int, width: int):
    """md5-derived bucket for hash row ``row`` — bit-identical in DuckDB:
    CAST(concat('0x', substr(md5(concat('cms<row>:', CAST(v AS VARCHAR))),
    1, 8)) AS BIGINT) % width.  The 8-hex-char value is < 2^32 so plain
    ``%`` and ``pmod`` agree."""
    v = F.coalesce(value.cast("string"), F.lit("\x00__null__"))
    h = F.md5(F.concat(F.lit(f"cms{row}:"), v))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                  F.lit(width))


def count_min_sketch(df: DataFrame, value_column: str,
                     depth: int = 4, width: int = 1024) -> DataFrame:
    """Build a count-min sketch as a (hash_row, bucket, cnt) table.

    Scale shape: each input row explodes into ``depth`` probes, then ONE
    groupBy(hash_row, bucket) with map-side combine — partials collapse
    to at most depth*width rows per task regardless of input size, so
    the shuffle is O(depth*width*tasks), not O(rows).  The sketch itself
    is at most depth*width rows (a few KB) and is mergeable by summing
    counts bucket-wise — the same persist-then-merge pattern as the HLL
    rollup above.
    """
    col = F.col(value_column)
    probes = F.explode(F.array(*[
        F.struct(F.lit(i).alias("hash_row"),
                 _cms_bucket(col, i, width).alias("bucket"))
        for i in range(depth)
    ])).alias("p")
    return (df.select(probes)
            .select(F.col("p.hash_row").alias("hash_row"),
                    F.col("p.bucket").alias("bucket"))
            .groupBy("hash_row", "bucket")
            .agg(F.count("*").alias("cnt")))


def cms_estimate(cms: DataFrame, items: DataFrame, item_column: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate counts for ``items`` from a CMS table: each item
    probes its ``depth`` buckets (equi-join against the tiny sketch —
    AQE broadcasts it) and takes the min.  Estimates are never below the
    true count; overestimates only on all-``depth`` collisions."""
    col = F.col(item_column)
    probes = F.explode(F.array(*[
        F.struct(F.lit(i).alias("hash_row"),
                 _cms_bucket(col, i, width).alias("bucket"))
        for i in range(depth)
    ])).alias("p")
    probed = (items.select(col.alias(item_column), probes)
              .select(item_column, "p.hash_row", "p.bucket"))
    j = probed.join(F.broadcast(cms), ["hash_row", "bucket"], "left")
    return (j.groupBy(item_column)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cms_estimate")))


def heavy_hitters(df: DataFrame, column: str, min_fraction: float,
                  depth: int = 4, width: int = 1024) -> DataFrame:
    """Items occurring in at least ``min_fraction`` of rows, with exact
    count AND the count-min estimate side by side (est >= exact always;
    the query's oracle checks both).

    NOTE: this is the self-VERIFYING form — the exact pass pays the full
    O(cardinality) key histogram the sketch exists to avoid, so it's for
    validation and bounded-cardinality columns.  The production path for
    unbounded streams is :func:`heavy_hitters_sketch` below (Misra-Gries
    candidates + CMS probe, no full-cardinality shuffle)."""
    import math

    total = df.count()
    # ceil: "at least min_fraction of rows" — truncation would admit
    # items strictly below the fraction
    threshold = int(math.ceil(total * min_fraction))
    exact = (df.groupBy(F.col(column))
             .agg(F.count("*").alias("n_exact"))
             .filter(F.col("n_exact") >= threshold))
    cms = count_min_sketch(df, column, depth, width)
    est = cms_estimate(cms, exact.select(column), column, depth, width)
    return (exact.join(est, column)
            .select(column, "n_exact", "cms_estimate",
                    (F.col("cms_estimate") >= F.col("n_exact")).alias("est_sound")))


def heavy_hitter_candidates(df: DataFrame, column: str,
                            min_fraction: float,
                            capacity: int | None = None) -> DataFrame:
    """Per-partition Misra-Gries candidate generation: a map-only pass
    emitting at most ``capacity`` candidate values per partition, with
    NO shuffle proportional to key cardinality.

    Guarantee (no false negatives): an item with global frequency
    >= ``min_fraction`` has local frequency >= ``min_fraction`` in at
    least one partition, and Misra-Gries with capacity
    ``2*ceil(1/min_fraction)+1`` keeps every item whose local frequency
    exceeds ``1/capacity`` — so every true heavy hitter survives in some
    partition's summary.  False positives are expected (the CMS probe
    filters them).

    State per task is bounded by ``capacity`` counters regardless of
    input size — the property the exact histogram lacks at 100 TB.
    Batch counting uses pandas' C ``value_counts``; the Python loop runs
    over DISTINCT values per Arrow batch, not rows."""
    import math

    cap = capacity or (2 * int(math.ceil(1.0 / min_fraction)) + 1)
    field = df.schema[column]
    schema = f"`{column}` {field.dataType.simpleString()}"

    def gen(batches):
        import pandas as pd

        # one canonical NaN key: every batch's value_counts returns a
        # DISTINCT NaN object, and since hash(nan) is id-based two NaNs
        # never dict-match — a 50%-NULL float column used to fragment
        # into one per-batch counter each, all evicted, and the heavy
        # NULL/NaN key never became a candidate (a false negative the
        # guarantee above rules out)
        canon_nan = float("nan")
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[column].value_counts(dropna=False).items():
                if isinstance(v, float) and v != v:
                    v = canon_nan
                if v in counters:
                    counters[v] += int(c)
                else:
                    counters[v] = int(c)
                    if len(counters) > cap:
                        dmin = min(counters.values())
                        counters = {kk: cc - dmin
                                    for kk, cc in counters.items()
                                    if cc > dmin}
        keys = list(counters.keys())
        # pandas conflates NULL and NaN for float columns, so a
        # surviving NaN key may stand for either: emit BOTH so the CMS
        # probe (which counts NULL under its sentinel and NaN as 'NaN')
        # can keep whichever is genuinely heavy — candidates are a
        # superset by contract, extras cost one probe row
        if any(isinstance(k, float) and k != k for k in keys) \
                and None not in keys:
            keys.append(None)
        yield pd.DataFrame({column: pd.Series(keys, dtype=object)})

    return df.select(column).mapInPandas(gen, schema=schema).distinct()


def heavy_hitters_sketch(df: DataFrame, column: str, min_fraction: float,
                         depth: int = 5, width: int = 4096,
                         capacity: int | None = None) -> DataFrame:
    """Sketch-only heavy hitters — NO full-cardinality shuffle anywhere
    (the form :func:`heavy_hitters` demonstrates but does not have):

    1. candidates: per-partition Misra-Gries top-k (map-only, <=
       capacity rows per task, tiny distinct),
    2. counts: count-min sketch probe (shuffle bounded at depth*width
       rows per task; the sketch is a few KB and broadcast to the
       probe join),
    3. filter: CMS estimate >= ceil(total * min_fraction).

    No false negatives (candidate guarantee + CMS never underestimates);
    false positives only when all ``depth`` hash rows of a sub-threshold
    candidate collide with heavier keys — width sizes that probability.
    Returns (column, cms_estimate).
    """
    import math

    # the row total falls out of the sketch for free: every row lands in
    # exactly one bucket of each hash row, so sum(cnt | hash_row=0) ==
    # count(*) — a separate df.count() was a third full pass over the
    # raw data.  localCheckpoint so the total-agg materializes the
    # sketch once and the probe join reuses it.
    cms = count_min_sketch(df, column, depth, width) \
        .localCheckpoint(eager=False)
    total = cms.filter(F.col("hash_row") == 0) \
        .agg(F.sum("cnt")).collect()[0][0] or 0
    threshold = int(math.ceil(total * min_fraction))
    cand = heavy_hitter_candidates(df, column, min_fraction, capacity)
    est = cms_estimate(cms, cand, column, depth, width)
    return (est.filter(F.col("cms_estimate") >= threshold)
            .select(column, "cms_estimate"))


def cms_join_size_estimate(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """Estimate the INNER equi-join output cardinality |A ⋈_k B| from
    two count-min sketches built on the join key — without executing
    the join (public technique: CM-sketch inner products, Cormode &
    Muthukrishnan 2005 §4.2).

    est = min over hash rows of the bucketwise inner product
    Σ_b cnt_a[b]*cnt_b[b].  Each row's product >= the true size (every
    true (k,k) pairing lands in some shared bucket; collisions only
    add), so the min never underestimates; expected overestimate is
    N_a*N_b/width per row.

    The planner use: decide broadcast vs shuffle vs pre-aggregation
    from two few-KB sketches instead of paying the shuffle to learn
    the answer.  Sketch tables are <= depth*width rows, so this whole
    estimate is a broadcast-size join no matter how big A and B are.
    """
    j = (cms_a.select("hash_row", "bucket", F.col("cnt").alias("cnt_a"))
         .join(cms_b.select("hash_row", "bucket",
                            F.col("cnt").alias("cnt_b")),
               ["hash_row", "bucket"]))
    per_row = j.groupBy("hash_row").agg(
        F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
    # a hash row with ZERO shared buckets has inner product 0 — it
    # simply doesn't appear in the inner join.  The row spine comes
    # from the sketches themselves (their hash_row sets are identical
    # by construction), so a fully-disjoint key pair estimates 0, not
    # NULL / the min over only the colliding rows.
    spine = cms_a.select("hash_row").distinct()
    full = spine.join(per_row, "hash_row", "left") \
        .select(F.coalesce("ip", F.lit(0)).alias("ip"))
    return full.agg(F.coalesce(F.min("ip"), F.lit(0))
                    .cast("long").alias("est_join_rows"))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketches: dataset overlap WITHOUT a join
# ---------------------------------------------------------------------------

# hash space: first 15 md5 hex chars -> [0, 16^15) = [0, 2^60)
_KMV_SPACE = float(1 << 60)


def kmv_sketch(df: DataFrame, value_column: str, k: int = 1024) -> DataFrame:
    """The ``k`` smallest md5-derived hash values of the column's
    DISTINCT values — the classic KMV/bottom-k distinct sketch
    (Bar-Yossef et al. 2002; same md5 trick as the CMS buckets, so a
    SQL oracle reproduces it bit-for-bit).

    Plan shape: distinct on the 8-byte hash (one map-side-combined
    shuffle), then ``orderBy().limit(k)`` — Spark executes that as
    TakeOrdered (each partition keeps its k smallest, driver merges),
    never a global sort.  The sketch is <= k rows regardless of input
    size; build once per dataset, answer any pairwise overlap later.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = F.conv(F.substring(F.md5(F.col(value_column).cast("string")),
                           1, 15), 16, 10).cast("long")
    return (df.where(F.col(value_column).isNotNull())
            .select(h.alias("hv"))
            .distinct().orderBy("hv").limit(k))


def kmv_overlap_estimate(sketch_a: DataFrame, sketch_b: DataFrame,
                         k: int = 1024) -> DataFrame:
    """Distinct-overlap estimate between two datasets from their KMV
    sketches alone — |A ∪ B|, |A ∩ B| and Jaccard without ever joining
    the datasets (the contamination / dataset-dedup planning question
    at 100 TB: both sketches are KB-scale).

    Method (Beyer et al. 2007): merge the two bottom-k sets, keep the
    k smallest distinct hashes; with theta = the k-th smallest,
    ``union_est = (k-1) * SPACE / theta``; Jaccard is the fraction of
    those k that appear in BOTH sketches; the intersection estimate is
    their product.  When the union has fewer than k distinct hashes the
    sketches ARE the full hash sets and every figure is exact.  All
    arithmetic is integer or a single double division — engine-exact,
    so the SQL oracle matches bit-for-bit.

    Returns one row: (union_distinct_est, intersect_est,
    jaccard_micro) — jaccard in integer micro-units.
    """
    a = sketch_a.select(F.col("hv").alias("hv"))
    b = sketch_b.select(F.col("hv").alias("hv"))
    both = (a.intersect(b)).select("hv", F.lit(True).alias("in_both"))
    uni = a.union(b).distinct().orderBy("hv").limit(k)
    merged = uni.join(both, "hv", "left")
    agg = merged.agg(
        F.count("*").alias("m"),
        F.max("hv").alias("theta"),
        F.sum(F.when(F.col("in_both"), 1).otherwise(0)).alias("matches"),
    )
    m, theta, matches = F.col("m"), F.col("theta"), F.col("matches")
    union_est = F.when(
        m < F.lit(k), m.cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(_KMV_SPACE)) / theta)
    # m = 0 (both sketches empty): every figure is exactly 0 — the
    # division would emit NULLs a consumer can't arithmetic on
    jac = F.when(m > 0, matches.cast("double") / m).otherwise(F.lit(0.0))
    union_est = F.when(m == 0, F.lit(0.0)).otherwise(union_est)
    return agg.select(
        F.floor(union_est).cast("long").alias("union_distinct_est"),
        F.floor(jac * union_est).cast("long").alias("intersect_est"),
        F.floor(jac * F.lit(1e6)).cast("long").alias("jaccard_micro"),
    )
