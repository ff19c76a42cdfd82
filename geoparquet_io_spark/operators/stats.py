"""Aggregation operators (SURVEY.md 2.5) + spatial-order check (2.14).

bounds                  -> core/hilbert_order.py:80-92, api/table.py:113-163
stats                   -> api/table.py:1473-1616 (single batched agg)
analyze_partition       -> core/partition_common.py:167-330
preview_partition       -> core/partition_common.py:478
check_spatial_order     -> core/check_spatial_order.py:13-51
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoparquet_io_spark.functions import geom as G


def bounds(
    df: DataFrame,
    geometry_column: str | None = None,
    bbox_column: str | None = None,
) -> tuple[float, float, float, float]:
    """Dataset envelope in ONE aggregate pass.  Uses the bbox covering
    column when present (native min/max — pushdown-friendly), else one
    envelope-UDF pass over the geometry."""
    if bbox_column and bbox_column in df.columns:
        b = F.col(bbox_column)
        row = df.agg(
            F.min(b["xmin"]).alias("xmin"),
            F.min(b["ymin"]).alias("ymin"),
            F.max(b["xmax"]).alias("xmax"),
            F.max(b["ymax"]).alias("ymax"),
        ).collect()[0]
    elif geometry_column:
        env = G.st_envelope_struct(F.col(geometry_column)).alias("e")
        row = (
            df.select(env)
            .agg(
                F.min("e.xmin").alias("xmin"),
                F.min("e.ymin").alias("ymin"),
                F.max("e.xmax").alias("xmax"),
                F.max("e.ymax").alias("ymax"),
            )
            .collect()[0]
        )
    else:
        raise ValueError("bounds needs a geometry or bbox column")
    return (row["xmin"], row["ymin"], row["xmax"], row["ymax"])


_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_ORDERED = _NUMERIC + (T.StringType, T.DateType, T.TimestampType, T.BooleanType)


def stats(df: DataFrame, geometry_columns: set[str] | None = None,
          approx: bool = True) -> DataFrame:
    """Per-column null count / min / max / distinct count, batched into a
    single SELECT like the reference (api/table.py:1473-1616).
    Geometry/binary columns report nulls only."""
    geometry_columns = geometry_columns or set()
    aggs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"{f.name}__nulls"))
        orderable = isinstance(f.dataType, _ORDERED) and f.name not in geometry_columns
        if orderable:
            aggs.append(F.min(c).cast("string").alias(f"{f.name}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{f.name}__max"))
            d = F.approx_count_distinct(c) if approx else F.count_distinct(c)
            aggs.append(d.alias(f"{f.name}__distinct"))
    wide = df.agg(*aggs)
    # unpivot to (column, nulls, min, max, approx_distinct)
    rows = wide.collect()[0].asDict()
    spark = df.sparkSession
    out = []
    for f in df.schema.fields:
        out.append(
            (
                f.name,
                f.dataType.simpleString(),
                rows.get(f"{f.name}__nulls"),
                rows.get(f"{f.name}__min"),
                rows.get(f"{f.name}__max"),
                rows.get(f"{f.name}__distinct"),
            )
        )
    return spark.createDataFrame(
        out, "column string, type string, nulls long, min string, max string, distinct long"
    )


@dataclass
class PartitionAnalysis:
    """Reference thresholds: core/partition_common.py:171-178."""

    num_partitions: int
    total_rows: int
    min_rows: int
    max_rows: int
    avg_rows: float
    median_rows: float
    imbalance: float
    errors: list[str]
    warnings: list[str]

    @property
    def ok(self) -> bool:
        return not self.errors


MAX_PARTITIONS = 10_000
MIN_AVG_ROWS = 100
MAX_IMBALANCE = 1000.0


def analyze_partition_strategy(df: DataFrame, key) -> PartitionAnalysis:
    """Preflight guardrails before a partitioned write
    (reference: core/partition_common.py:167-330)."""
    counts = df.groupBy(F.expr(key) if isinstance(key, str) else key).count()
    row = counts.agg(
        F.count("*").alias("n"),
        F.sum("count").alias("total"),
        F.min("count").alias("mn"),
        F.max("count").alias("mx"),
        F.avg("count").alias("avg"),
        F.expr("percentile(count, 0.5)").alias("med"),
    ).collect()[0]
    n = row["n"] or 0
    med = float(row["med"] or 0)
    imb = (float(row["mx"]) / med) if med else float("inf") if n else 0.0
    errors, warnings = [], []
    if n > MAX_PARTITIONS:
        errors.append(f"{n} partitions exceeds {MAX_PARTITIONS}")
    if n and float(row["avg"]) < MIN_AVG_ROWS:
        errors.append(f"average rows/partition {row['avg']:.1f} < {MIN_AVG_ROWS}")
    if imb > MAX_IMBALANCE:
        errors.append(f"imbalance {imb:.0f}x exceeds {MAX_IMBALANCE}x")
    elif imb > 100:
        warnings.append(f"imbalance {imb:.0f}x")
    return PartitionAnalysis(
        num_partitions=int(n),
        total_rows=int(row["total"] or 0),
        min_rows=int(row["mn"] or 0),
        max_rows=int(row["mx"] or 0),
        avg_rows=float(row["avg"] or 0),
        median_rows=med,
        imbalance=imb,
        errors=errors,
        warnings=warnings,
    )


def preview_partition(df: DataFrame, key, n: int = 10) -> DataFrame:
    """Top-n partition values by count (core/partition_common.py:478).
    Deterministic tiebreak on the value itself."""
    kcol = F.expr(key) if isinstance(key, str) else key
    return (
        df.groupBy(kcol.alias("value"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("value"))
        .limit(n)
    )


def check_spatial_order(
    df: DataFrame,
    geometry_column: str | None = None,
    bbox_column: str | None = None,
    sample_size: int = 100,
    seed: int = 42,
    threshold: float = 0.5,
) -> dict:
    """Consecutive-vs-random average distance ratio
    (reference: core/check_spatial_order.py:13-51,98-138).

    ratio = avg(dist(row_i, row_{i+1})) / avg(dist(random pair));
    ratio < threshold => data is spatially clustered.
    """
    from geoparquet_io_spark.operators.add_columns import _centroid_lonlat

    x, y = _centroid_lonlat(df, geometry_column, bbox_column)
    pts = df.select(x.alias("x"), y.alias("y"))

    # consecutive distances via PARTITION-LOCAL lag: a global-order window
    # would funnel everything through one reducer; within-partition order
    # is file order, and only the n_partitions-1 boundary pairs are lost —
    # statistically irrelevant to the ratio at any scale.
    w = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.monotonically_increasing_id()
    )
    consec = (
        pts.withColumn("px", F.lag("x").over(w))
        .withColumn("py", F.lag("y").over(w))
        .filter(F.col("px").isNotNull())
        .select(F.hypot(F.col("x") - F.col("px"), F.col("y") - F.col("py")).alias("d"))
        .agg(F.avg("d").alias("avg"))
        .collect()[0]["avg"]
    )
    a = pts.orderBy(F.rand(seed)).limit(sample_size).alias("a")
    b = pts.orderBy(F.rand(seed + 1)).limit(sample_size).alias("b")
    rand_avg = (
        a.crossJoin(b)
        .filter((F.col("a.x") != F.col("b.x")) | (F.col("a.y") != F.col("b.y")))
        .select(F.hypot(F.col("a.x") - F.col("b.x"), F.col("a.y") - F.col("b.y")).alias("d"))
        .agg(F.avg("d").alias("avg"))
        .collect()[0]["avg"]
    )
    # consec is None when no partition has 2+ rows (e.g. many single-row
    # files): no consecutive pairs exist, so no order claim can be made
    ratio = (float(consec) / float(rand_avg)
             if consec is not None and rand_avg else float("nan"))
    return {
        "consecutive_avg_distance": float(consec) if consec is not None else None,
        "random_avg_distance": float(rand_avg) if rand_avg is not None else None,
        "ratio": ratio,
        "ordered": ratio < threshold,
    }


def column_quantiles(df: DataFrame, column: str,
                     probabilities=(0.25, 0.5, 0.75),
                     exact: bool = True,
                     round_digits: int | None = None) -> DataFrame:
    """Quantiles of a numeric column.  ``exact=True`` uses SQL
    ``percentile`` (sort-based, linear interpolation — matches DuckDB
    quantile_cont); ``exact=False`` uses ``percentile_approx``
    (single-pass sketch — the 100 TB default, no full sort).  One
    aggregate either way.  ``round_digits`` is for callers that need
    cross-engine comparable output (the oracle query passes 6); library
    callers get full precision by default."""
    fn = "percentile" if exact else "percentile_approx"
    probs = ", ".join(repr(float(p)) for p in probabilities)
    row = df.selectExpr(f"{fn}({column}, array({probs})) AS q")
    def _label(p: float) -> str:
        # round, not int-truncate: int(0.29 * 100) == 28 (float repr);
        # keep enough digits that close probabilities can't collide
        s = f"{p * 100:.4f}".rstrip("0").rstrip(".")
        return "p" + s.replace(".", "_")

    labels = [_label(p) for p in probabilities]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate quantile labels from {probabilities}")
    cols = []
    for i, (p, lab) in enumerate(zip(probabilities, labels)):
        c = F.col("q")[i]
        if round_digits is not None:
            c = F.round(c, round_digits)
        cols.append(c.alias(lab))
    return row.select(*cols)


def top_k_per_group(df: DataFrame, group_column: str, order_column: str,
                    k: int, descending: bool = True,
                    rank_column: str = "rank",
                    tiebreak_column: str | None = None) -> DataFrame:
    """Top-k rows per group (e.g. k best-quality documents per source):
    partitioned window — per-group state only, shuffles once on the group
    key, never a global sort.  ``tiebreak_column`` makes ranking
    deterministic when order values collide (required for oracle parity
    and reproducible curation)."""
    order = [F.col(order_column).desc() if descending
             else F.col(order_column).asc()]
    if tiebreak_column:
        order.append(F.col(tiebreak_column).asc())
    w = Window.partitionBy(group_column).orderBy(*order)
    return (df.withColumn(rank_column, F.row_number().over(w))
            .filter(F.col(rank_column) <= k))


def histogram(df, column: str, lo: float, hi: float, n_bins: int):
    """Fixed-width histogram over [lo, hi): one partial-agg shuffle on the
    bin id (floor((x-lo)/width) — arithmetic identical in any engine, no
    width_bucket dependency).  Returns (bin, bin_lo, n, min_v, max_v) for
    non-empty bins; out-of-range rows are excluded (count them upstream
    if needed)."""
    from pyspark.sql import functions as F

    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    width = (hi - lo) / n_bins
    x = F.col(column).cast("double")
    # clamp to n_bins-1: floor((x-lo)/width) can overshoot to n_bins in
    # floating point for x just under hi (verified: the quotient rounds
    # up to an exact integer), emitting a phantom bin whose bin_lo == hi
    # and breaking the documented [lo, hi) contract
    b = F.least(F.lit(n_bins - 1),
                F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("int"))
    return (df.filter((x >= lo) & (x < hi))
            .withColumn("bin", b)
            .groupBy("bin")
            .agg(F.count("*").alias("n"),
                 F.min(x).alias("min_v"),
                 F.max(x).alias("max_v"))
            .withColumn("bin_lo", F.lit(float(lo)) + F.col("bin") * F.lit(width))
            .select("bin", "bin_lo", "n", "min_v", "max_v"))


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column data profile — the "describe my table" primitive a
    curation pipeline runs before trusting a new source: row/null
    counts, EXACT distinct count, min/max, and the modal value with a
    deterministic (count DESC, value ASC) tie-break.

    Scale shape: one value-count groupBy per profiled column (map-side
    combine; the per-value table re-aggregates to six scalars, so
    nothing wide ever reaches the driver), plus one scalar aggregate
    for row/null counts; single-row frames cross-join into one output
    row per column.  Profile the handful of columns you care about,
    not all thousand — each costs a shuffle by design (exact distinct
    is not sketchable).  min/max compare in the column's own type and
    are cast to string only for the uniform output schema.
    """
    outs = []
    for c in columns:
        base = df.agg(
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(c)).alias("n_nulls"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        )
        vc = (df.filter(F.col(c).isNotNull())
              .groupBy(F.col(c).cast("string").alias("__v"))
              .agg(F.count("*").alias("__cnt")))
        top = vc.agg(
            F.count("*").alias("n_distinct"),
            F.expr("min_by(__v, struct(-__cnt, __v))").alias("top_value"),
            F.max("__cnt").alias("top_count"),
        )
        outs.append(
            base.crossJoin(top).select(
                F.lit(c).alias("col_name"), "n_rows", "n_nulls",
                "n_distinct", "min_value", "max_value", "top_value",
                "top_count"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def funnel_steps(df: DataFrame, user_column: str, ts_column: str,
                 event_column: str, steps: list[str]) -> DataFrame:
    """Ordered-sequence funnel (the product-analytics staple): per user,
    the earliest completion time of each step where step i+1 must occur
    STRICTLY AFTER the user's earliest completion of step i.  Returns
    one row per user who completed step 1, with t_1..t_n (null once the
    sequence breaks) and ``steps_completed``.

    Scale shape: one filtered aggregate per step (map-side combine on
    the user key) chained by equi-joins on the user id — n_steps small
    shuffles, no windows, no per-user sorting; AQE can broadcast the
    shrinking completed-users side at each stage.  Exactly mirrors the
    correlated-min SQL a warehouse would run.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    t_cols = [f"t_{i + 1}" for i in range(len(steps))]
    cur = (df.filter(F.col(event_column) == steps[0])
           .groupBy(F.col(user_column).alias("__u"))
           .agg(F.min(ts_column).alias(t_cols[0])))
    for i, step in enumerate(steps[1:], start=1):
        nxt = (df.filter(F.col(event_column) == step)
               .select(F.col(user_column).alias("__u"),
                       F.col(ts_column).alias("__ts")))
        prev_t = t_cols[i - 1]
        stepped = (nxt.join(cur.select("__u", prev_t), "__u")
                   .filter(F.col("__ts") > F.col(prev_t))
                   .groupBy("__u")
                   .agg(F.min("__ts").alias(t_cols[i])))
        cur = cur.join(stepped, "__u", "left")
    done = sum(F.col(t).isNotNull().cast("int") for t in t_cols)
    return cur.select(F.col("__u").alias(user_column), *t_cols,
                      done.cast("int").alias("steps_completed"))


def grouped_outliers(df: DataFrame, group_column: str, value_column: str,
                     z: float = 3.0, flag_column: str = "is_outlier",
                     round_digits: int = 6) -> DataFrame:
    """Per-group z-score outlier flagging (the numeric-column cleaning
    staple): each row gets its group's population z-score and a flag
    for ``|z| > z_threshold``.  Two passes expressed as one aggregate +
    one equi-join (both on the group key, map-side combined; AQE
    broadcasts the stats side when it is small — no forced hint, so a
    high-cardinality group column can't OOM the driver) — no windows,
    so group size never hits a single task.  Zero-variance groups flag
    nothing.  The join is NULL-SAFE (``<=>``): rows whose group key is
    NULL form their own group and are flagged against that group's
    stats rather than silently dropped."""
    stats_df = (df.groupBy(F.col(group_column).alias("__g"))
                .agg(F.avg(value_column).alias("__mean"),
                     F.stddev_pop(value_column).alias("__sd")))
    j = df.join(stats_df, F.col(group_column).eqNullSafe(F.col("__g")), "left")
    zscore = F.when(F.col("__sd") > 0,
                    (F.col(value_column) - F.col("__mean")) / F.col("__sd"))
    return (j.withColumn("z_score", F.round(zscore, round_digits))
            .withColumn(flag_column,
                        F.coalesce(F.abs(zscore) > z, F.lit(False)))
            .drop("__g", "__mean", "__sd"))


def grouped_quantiles(df: DataFrame, group_column: str, value_column: str,
                      probabilities: list[float],
                      round_digits: int = 6) -> DataFrame:
    """EXACT per-group quantiles (linear interpolation — the
    ``percentile`` aggregate, same definition as SQL ``quantile_cont``),
    one row per (group, probability).  One aggregate shuffle with
    map-side partial collection; exactness costs a per-group sort
    inside the aggregate, which is the correct trade for bounded
    groups — use approx_percentile upstream when groups are huge."""
    if not probabilities:
        raise ValueError("probabilities must be non-empty")
    arr = ", ".join(repr(float(p)) for p in probabilities)
    agg = df.groupBy(group_column).agg(
        F.expr(f"percentile({value_column}, array({arr}))").alias("__qs"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in probabilities]).alias("p"),
        F.col("__qs").alias("q"))
    return (agg.select(group_column, F.explode(pairs).alias("__e"))
            .select(group_column,
                    F.col("__e.p").alias("probability"),
                    F.round(F.col("__e.q"), round_digits)
                    .alias("quantile")))


def cohort_retention(df: DataFrame, user_column: str, ts_column: str,
                     unit: str = "week") -> DataFrame:
    """Cohort retention matrix (the product-analytics staple): each
    user's cohort is the truncated period of their FIRST event; the
    matrix counts distinct active users per (cohort, period_index).

    Scale shape: one per-user min aggregate (map-side combine), one
    join back on the user key (AQE-broadcastable: one row per user),
    one distinct-count aggregate on (cohort, period) — no windows.
    """
    first = (df.groupBy(F.col(user_column).alias("__u"))
             .agg(F.date_trunc(unit, F.min(ts_column)).alias("__cohort")))
    j = df.select(F.col(user_column).alias("__u"),
                  F.date_trunc(unit, F.col(ts_column)).alias("__period")) \
        .join(first, "__u")
    days = {"week": 7, "day": 1}
    if unit not in days:
        raise ValueError(f"unsupported unit {unit!r} (use week/day)")
    # CALENDAR-day difference, not epoch seconds: a DST transition inside
    # the span would make the second-diff fall 1h short of a full period
    # and truncate the user into the wrong retention cell
    idx = F.floor(
        F.datediff(F.to_date("__period"), F.to_date("__cohort"))
        / F.lit(days[unit])).cast("int")
    return (j.withColumn("period_index", idx)
            .groupBy(F.col("__cohort").alias("cohort"), "period_index")
            .agg(F.countDistinct("__u").alias("n_users")))


def mad_outliers(df: DataFrame, group_column: str, value_column: str,
                 k: float = 3.5, round_digits: int = 6) -> DataFrame:
    """Robust per-group outliers by median absolute deviation: flag rows
    with |x - median| > k * (MAD * 1.4826) — the modified-z-score rule
    (Iglewicz & Hoaglin), immune to the outliers inflating the spread
    the way stddev-based ``grouped_outliers`` is.

    Scale shape: two exact-percentile aggregates (one for the median,
    one for the MAD of deviations) + two joins back on the group key —
    both join sides are one-row-per-group and AQE-broadcastable.  The
    median/MAD are rounded BEFORE the comparison so both engines compare
    identical operands."""
    # eqNullSafe joins: a NULL group is a real group (same contract as
    # grouped_outliers) — plain equi-joins would silently drop its rows
    # and outliers there could never be flagged
    g = F.col(group_column)
    med = df.groupBy(group_column).agg(
        F.round(F.expr(f"percentile({value_column}, 0.5)"),
                round_digits).alias("med")) \
        .withColumnRenamed(group_column, "__mg")
    j = df.join(med, g.eqNullSafe(F.col("__mg"))).drop("__mg")
    mad = j.groupBy(group_column).agg(
        F.round(F.expr(
            f"percentile(abs({value_column} - med), 0.5)"),
            round_digits).alias("mad")) \
        .withColumnRenamed(group_column, "__dg")
    j2 = j.join(mad, g.eqNullSafe(F.col("__dg"))).drop("__dg")
    return (j2.filter(F.abs(F.col(value_column) - F.col("med"))
                      > F.lit(k) * (F.col("mad") * F.lit(1.4826)))
            .withColumn("robust_z",
                        # MAD=0 (constant group + one deviant): the row
                        # still flags (|dev| > 0) but the score is
                        # undefined — NULL, not a div-by-zero error
                        F.when(F.col("mad") > 0,
                               F.round(F.abs(F.col(value_column) - F.col("med"))
                                       / (F.col("mad") * F.lit(1.4826)),
                                       round_digits))))


def ab_test(df: DataFrame, group_column: str, value_column: str,
            group_a, group_b) -> DataFrame:
    """Welch's unequal-variance t-test between two experiment arms,
    computed from distributed moments only (count / mean / sample
    variance per arm — one aggregate, no data leaves the executors
    except six numbers).

    Returns one row: per-arm n/mean/var, the Welch t statistic, and the
    Welch-Satterthwaite degrees of freedom.  p-values need the
    t-distribution CDF — compute downstream (scipy) or compare |t|
    against fixed critical values; the statistic itself is exact.
    """
    g = F.col(group_column)
    v = F.col(value_column).cast("double")
    agg = df.filter(g.isin([group_a, group_b])).groupBy(group_column).agg(
        F.count(v).alias("n"),
        F.avg(v).alias("mean"),
        F.var_samp(v).alias("var"),
    )
    a = agg.filter(g == group_a).select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"))
    b = agg.filter(g == group_b).select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"))
    j = a.crossJoin(b)      # 1 x 1 rows — a join in name only
    se2a = F.col("var_a") / F.col("n_a")
    se2b = F.col("var_b") / F.col("n_b")
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2a + se2b)
    dof = ((se2a + se2b) ** 2
           / (se2a ** 2 / (F.col("n_a") - 1)
              + se2b ** 2 / (F.col("n_b") - 1)))
    return j.select("n_a", "mean_a", "var_a", "n_b", "mean_b", "var_b",
                    t.alias("t_welch"), dof.alias("dof"))


def chi_square_independence(df: DataFrame, row_column: str,
                            col_column: str) -> DataFrame:
    """Pearson chi-square statistic for independence of two categorical
    columns, from the contingency counts: one groupBy for the cells,
    two marginal rollups, expected = row_total * col_total / N.
    Returns (chi2, dof, n) — all exact; the cell work is one shuffle
    bounded by the category-pair cardinality, never the row count.

    Rows with NULL in either column are EXCLUDED up front (the standard
    complete-case contingency convention) so n, the marginals, dof, and
    the chi2 sum all describe the same table — counting them in n while
    the equi-joins dropped their cells silently skewed the statistic."""
    df = df.filter(F.col(row_column).isNotNull()
                   & F.col(col_column).isNotNull())
    cells = df.groupBy(row_column, col_column).agg(
        F.count("*").alias("o")).localCheckpoint(eager=False)
    rowt = cells.groupBy(row_column).agg(F.sum("o").alias("rt"))
    colt = cells.groupBy(col_column).agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o")).collect()[0][0]
    if n is None:
        raise ValueError(
            "chi_square_independence needs at least one row with "
            f"non-null {row_column!r} and {col_column!r}")
    e = (cells.join(rowt, row_column).join(colt, col_column)
         .withColumn("e", F.col("rt") * F.col("ct") / F.lit(float(n))))
    nr = rowt.count()
    nc = colt.count()
    return e.agg(
        F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")).alias("chi2"),
        F.lit((nr - 1) * (nc - 1)).cast("long").alias("dof"),
        F.lit(int(n)).cast("long").alias("n"))
