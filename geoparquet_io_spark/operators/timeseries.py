"""Time-series operators: bucket resampling with gap-filling and linear
interpolation, per-key EWMA smoothing, gap-based trip/session
segmentation, and PSI population-drift scoring.

Reference parity: the reference engine exposes time-bucketed aggregation
and gap sessionization through its SQL surface (see
``/root/reference`` docs on temporal rollups); these re-express the same
semantics with Spark windows and aggregates.

Scale shape (100 TB posture):
- ``resample``: ONE groupBy shuffle on (key, bucket) with map-side
  combine; the spine is one row per (key, bucket) — generated from each
  key's own min/max (a tiny aggregate), never a cross join against a
  global calendar.
- interpolation windows are partitioned by key — no single-reducer
  global window.
- ``ewma`` is applyInPandas per key: the recurrence is inherently
  sequential per key but keys are independent; the per-key kernel is
  pandas' C ``ewm`` implementation, not a Python loop.
- ``trip_segments``: two key-partitioned windows (lag + running sum) in
  the SAME partitioning — Spark plans them in one shuffle; step
  distances are quantized to integer metres before summation so the
  per-trip sum is order-independent and engine-exact.
- ``population_stability``: two scans + a bin-aligned merge of two tiny
  histogram aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_sec(ts_col):
    """Epoch seconds (floor) — unix_timestamp handles both TIMESTAMP and
    TIMESTAMP_NTZ under the session UTC zone (oracle: epoch_us // 1e6)."""
    return F.unix_timestamp(ts_col)


def _bucket_sec(ts_col, every_seconds: int):
    """Epoch-second bucket start (integer arithmetic, oracle-exact)."""
    if every_seconds < 1:
        # pmod(e, 0) is NULL in Spark: every row would silently collapse
        # into one null bucket (and gapfill's sequence over null lo/hi
        # explodes to ZERO rows) — r9 review
        raise ValueError(f"every_seconds must be >= 1, got {every_seconds}")
    e = _epoch_sec(ts_col)
    return e - F.pmod(e, F.lit(every_seconds))


def resample(df: DataFrame, ts_column: str, value_column: str,
             every_seconds: int, key_column: str | None = None,
             round_digits: int = 6) -> DataFrame:
    """Bucketed resample: avg/min/max/count of ``value_column`` per
    ``every_seconds`` bucket (per key when given).  avg is rounded —
    float sums are order-dependent across engines."""
    keys = ([key_column] if key_column else []) + ["bucket_sec"]
    out = (df.withColumn("bucket_sec", _bucket_sec(F.col(ts_column), every_seconds))
             .groupBy(*keys)
             .agg(F.round(F.avg(value_column), round_digits).alias("avg_value"),
                  F.min(value_column).alias("min_value"),
                  F.max(value_column).alias("max_value"),
                  F.count("*").alias("n")))
    return out


def resample_gapfill(df: DataFrame, ts_column: str, value_column: str,
                     every_seconds: int, key_column: str,
                     interpolate: bool = True,
                     round_digits: int = 6,
                     max_buckets_per_key: int = 2_000_000) -> DataFrame:
    """Resample to fixed buckets, then fill EMPTY buckets along each
    key's own [min, max] bucket range; linear interpolation between the
    neighbouring observed buckets (edges stay at the nearest observed
    value — ffill/bfill).

    Columns: key, bucket_sec, avg_value (observed, null when gap),
    filled_value (interpolated), is_gap.

    The spine comes from each key's min/max bucket (one tiny aggregate +
    ``sequence`` explode) — proportional to the filled output, not to
    keys × global calendar.

    Spine guard (100 TB posture): ONE sparse key spanning a long range
    at a fine bucket (two points a year apart at 1-second buckets =
    31.5M spine rows for that key; Spark's ``sequence`` hard-errors
    past 2^31 elements) would blow up a single task.  The per-key
    bucket count is computed in the same min/max aggregate and any key
    exceeding ``max_buckets_per_key`` raises a loud executor-side error
    naming the key — no extra driver action, no silent truncation."""
    agg = resample(df, ts_column, value_column, every_seconds,
                   key_column, round_digits).select(
        key_column, "bucket_sec", "avg_value")
    n_buckets = ((F.col("hi") - F.col("lo")) / every_seconds + 1).cast("long")
    guard = F.when(
        n_buckets > max_buckets_per_key,
        F.raise_error(F.concat(
            F.lit("resample_gapfill: key "),
            F.col(key_column).cast("string"),
            F.lit(" needs "), n_buckets.cast("string"),
            F.lit(f" spine buckets > max_buckets_per_key="
                  f"{max_buckets_per_key}; coarsen every_seconds, filter "
                  f"the key, or raise max_buckets_per_key explicitly"))),
    ).otherwise(F.col("lo"))
    spine = (agg.groupBy(key_column)
                .agg(F.min("bucket_sec").alias("lo"), F.max("bucket_sec").alias("hi"))
                .select(key_column,
                        F.explode(F.sequence(guard, F.col("hi"),
                                             F.lit(every_seconds))).alias("bucket_sec")))
    joined = spine.join(agg, [key_column, "bucket_sec"], "left")
    if not interpolate:
        # same output contract as the interpolating path (the docstring
        # promises filled_value either way): without interpolation the
        # filled value is simply the observed one (NULL in gaps)
        return (joined
                .withColumn("filled_value", F.col("avg_value"))
                .withColumn("is_gap", F.col("avg_value").isNull()))

    w = Window.partitionBy(key_column).orderBy("bucket_sec")
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    w_next = w.rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last("avg_value", ignorenulls=True).over(w_prev)
    next_v = F.first("avg_value", ignorenulls=True).over(w_next)
    obs_bucket = F.when(F.col("avg_value").isNotNull(), F.col("bucket_sec"))
    prev_t = F.last(obs_bucket, ignorenulls=True).over(w_prev)
    next_t = F.first(obs_bucket, ignorenulls=True).over(w_next)
    frac = (F.col("bucket_sec") - prev_t) / (next_t - prev_t)
    interp = F.when(prev_v.isNull(), next_v).when(next_v.isNull(), prev_v) \
              .when(next_t == prev_t, prev_v) \
              .otherwise(F.round(prev_v + (next_v - prev_v) * frac, round_digits))
    return (joined
            .withColumn("filled_value", interp)
            .withColumn("is_gap", F.col("avg_value").isNull()))


def ewma(df: DataFrame, key_column: str, ts_column: str, value_column: str,
         alpha: float, order_tiebreak: str | None = None,
         round_digits: int = 6) -> DataFrame:
    """Per-key exponentially-weighted moving average,
    ``s_0 = x_0; s_i = (1-alpha)*s_{i-1} + alpha*x_i`` (adjust=False).

    Inherently sequential per key, so this is applyInPandas with the
    pandas C ``ewm`` kernel — keys process in parallel, no driver loop.
    Pick ``alpha`` with an exact binary representation (0.25, 0.5,
    0.125...) and the recurrence is bit-identical to an engine-side
    recursive evaluation: each step is two exact products and one add of
    the same IEEE operands.  Result is rounded for cross-engine compare.
    NULL values are skipped by the recurrence (the next non-null
    continues from the previous non-null state) and emit NULL.

    Returns key, rn (1-based order), ewma."""
    import pandas as pd

    tiebreak = [order_tiebreak] if order_tiebreak else []
    ktype = df.schema[key_column].dataType.simpleString()
    schema = f"{key_column} {ktype}, rn long, ewma double"
    cols = [key_column, ts_column, value_column] + tiebreak

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values([ts_column] + tiebreak, kind="mergesort")
        # no pandas-side rounding: numpy rounds HALF_EVEN while Spark's
        # ROUND is HALF_UP (matching DuckDB) — round in Spark below.
        # NULL values: the recurrence SKIPS them (ignore_na=True applies
        # s=(1-a)s+a*x over non-null x only) and the null row itself
        # emits null — pandas' default instead presented the carried
        # previous mean as a real value AND re-weighted across the gap,
        # breaking the documented recurrence (r9 review)
        vals = pdf[value_column].astype("float64")
        s = vals.ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
        s = s.where(~vals.isna(), np.nan)
        return pd.DataFrame({
            key_column: pdf[key_column].values,
            "rn": range(1, len(pdf) + 1),
            "ewma": s.values,
        })

    out = (df.select(*cols)
             .groupBy(key_column)
             .applyInPandas(kernel, schema=schema))
    return out.withColumn("ewma", F.round("ewma", round_digits))


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km (mean Earth radius 6371.0088).
    Single fixed expression tree so both engines evaluate the identical
    IEEE double operations (libm sin/cos may still differ by ~1 ulp —
    quantize before cross-engine summation)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (F.pow(F.sin(dlat / 2), 2)
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2))
    # clamp: FP rounding can push a one ulp past 1 for near-antipodal
    # pairs, and asin(>1) = NaN silently zeroes the distance downstream
    return F.lit(2 * 6371.0088) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


HAVERSINE_SQL = (
    "(2 * 6371.0088) * asin(sqrt(least(1.0, "
    "pow(sin(radians({lat2} - {lat1}) / 2), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians({lon2} - {lon1}) / 2), 2))))"
)


def trip_segments(df: DataFrame, key_column: str, ts_column: str,
                  lon_column: str, lat_column: str,
                  gap_seconds: int, order_tiebreak: str | None = None) -> DataFrame:
    """Gap-based trip segmentation: a new trip starts when the time since
    the previous point exceeds ``gap_seconds``.  Per trip: point count,
    start/end epoch seconds, duration, and total consecutive-point
    haversine distance.

    Both windows share the (key) partitioning — one shuffle.  Step
    distances are rounded to integer metres and summed as BIGINT so the
    per-trip total is order-independent (sum of doubles is not).

    Rows with a NULL coordinate are DROPPED first (a GPS fix with no
    position): both legs touching such a row would otherwise be null
    and F.sum would silently omit them, under-reporting every affected
    trip's distance while still counting the point (r9 review) — with
    the row gone, the adjacent real fixes bridge directly."""
    tiebreak = [order_tiebreak] if order_tiebreak else []
    df = df.filter(F.col(lon_column).isNotNull()
                   & F.col(lat_column).isNotNull())
    w = Window.partitionBy(key_column).orderBy(ts_column, *tiebreak)
    ts_sec = _epoch_sec(F.col(ts_column))
    prev_ts = F.lag(ts_sec).over(w)
    prev_lon = F.lag(lon_column).over(w)
    prev_lat = F.lag(lat_column).over(w)
    new_trip = F.when(
        prev_ts.isNull() | ((ts_sec - prev_ts) > gap_seconds),
        F.lit(1)).otherwise(F.lit(0))
    step_m = F.when(
        new_trip == 1, F.lit(0).cast("long")).otherwise(
        F.round(haversine_km(prev_lat, prev_lon,
                             F.col(lat_column), F.col(lon_column)) * 1000.0, 0)
        .cast("long"))
    steps = (df.withColumn("__new", new_trip)
               .withColumn("__step_m", step_m)
               .withColumn("trip_no",
                           F.sum("__new").over(
                               w.rowsBetween(Window.unboundedPreceding, 0))))
    steps = steps.withColumn("__sec", ts_sec)
    return (steps.groupBy(key_column, "trip_no")
                 .agg(F.count("*").alias("n_points"),
                      F.min("__sec").alias("start_sec"),
                      F.max("__sec").alias("end_sec"),
                      (F.max("__sec") - F.min("__sec")).alias("duration_sec"),
                      F.sum("__step_m").alias("distance_m")))


def population_stability(df_a: DataFrame, df_b: DataFrame, column: str,
                         lo: float, hi: float, n_bins: int,
                         min_share: float = 1e-6) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column over fixed [lo, hi) bins (out-of-range values clamp to the
    edge bins — every row counts, standard scorecard practice).

    Per-bin term ``(pa - pb) * ln(pa / pb)`` with shares floored at
    ``min_share`` to keep empty bins finite.  Terms are emitted per bin
    in integer micro-units (``term_micro``) so the caller's total
    ``sum(term_micro)/1e6`` is order-independent and engine-exact.

    NULL/NaN values are EXCLUDED (they have no bin; silently counting
    them in bin 0 distorted the index) — compare null rates separately
    if missingness itself is the drift of interest.

    Two scans, two tiny aggregates, one bin-aligned outer merge — no
    per-row join."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        # width 0 -> division by zero -> null bins -> greatest/least
        # clamp every row into bin 0 and PSI silently reports ~0
        # regardless of drift (r9 review)
        raise ValueError(f"hi must be > lo, got lo={lo} hi={hi}")
    width = (hi - lo) / n_bins

    def binned(df, name):
        c = F.col(column)
        b = F.floor((c - F.lit(lo)) / F.lit(width)).cast("long")
        b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
        return (df.filter(c.isNotNull() & ~F.isnan(c.cast("double")))
                .select(b.alias("bin")).groupBy("bin").agg(
                    F.count("*").alias(name)))

    ha, hb = binned(df_a, "n_a"), binned(df_b, "n_b")
    merged = ha.join(hb, "bin", "full").select(
        "bin",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b")).localCheckpoint(eager=False)
    # ONE totals job over the (<= n_bins)-row merged table
    tot_row = merged.agg(F.sum("n_a"), F.sum("n_b")).collect()[0]
    tot_a = tot_row[0] or 0
    tot_b = tot_row[1] or 0
    pa = F.greatest(F.col("n_a") / F.lit(float(tot_a)), F.lit(min_share))
    pb = F.greatest(F.col("n_b") / F.lit(float(tot_b)), F.lit(min_share))
    term = (pa - pb) * F.log(pa / pb)
    return merged.withColumn(
        "term_micro", F.round(term * 1e6, 0).cast("long"))


def trajectory_cell_signature(df: DataFrame, key_column: str,
                              x_column: str, y_column: str,
                              cell_size: float) -> DataFrame:
    """Grid-cell visit signature per trajectory: the DISTINCT set of
    cells a key's points touch.  Map + one distinct — the compact
    representation similarity search runs on (a trajectory of millions
    of points collapses to its visited-cell set).  Delegates to the one
    shared grid-signature kernel (operators/discovery.py:cell_signature,
    which also drops null/NaN coordinates — they'd inflate Jaccard
    denominators without ever matching)."""
    from geoparquet_io_spark.operators.discovery import cell_signature

    return (cell_signature(df, x_column, y_column, cell_size,
                           dataset_column=key_column)
            .withColumnRenamed("dataset", "key"))


def trajectory_topk_similar(df: DataFrame, key_column: str,
                            x_column: str, y_column: str,
                            cell_size: float = 5.0, k: int = 5,
                            round_digits: int = 6,
                            max_cell_freq: int | None = None) -> DataFrame:
    """Distributed trajectory top-k similarity search, the REPOSE shape
    (ICDE 2021, "Distributed Top-k Trajectory Similarity Search"):
    trajectories are partitioned by the reference cells they visit, so
    candidate pairs meet ONLY through a shared cell (bucketed
    self-join — the all-pairs trajectory product never materializes),
    then scored set-wise: Jaccard over visited-cell sets.

    Pair volume is Σ_cell |members|² — bounded by locality, not corpus
    size; a globally-hot cell (everyone visits the airport) is the
    skew hole.  ``max_cell_freq`` guards it the way REPOSE's
    reference-point selection does: cells visited by MORE than that
    many trajectories are dropped from the signature universe before
    the self-join — a cell everyone shares identifies nobody, so it
    carries no ranking signal, only quadratic pair volume.  Dropped
    cells leave BOTH the pairing and the size denominators (Jaccard
    over the filtered universe stays a true set similarity).  Pick the
    cap above the hottest legitimate cell (frequencies are a one-line
    pre-check: ``sig.groupBy("cx","cy").count()``) so normal corpora
    are byte-identical with or without it.

    Output: (key, neighbor, shared_cells, jaccard, rank<=k) per key.
    """
    sig = trajectory_cell_signature(df, key_column, x_column, y_column,
                                    cell_size)
    if max_cell_freq is not None:
        freq = sig.groupBy("cx", "cy").agg(F.count("*").alias("__cf"))
        sig = (sig.join(F.broadcast(freq.filter(
                   F.col("__cf") > max_cell_freq)), ["cx", "cy"],
                   "left_anti"))
    sizes = sig.groupBy("key").agg(F.count("*").alias("n"))
    a = sig.select(F.col("key").alias("ka"), "cx", "cy")
    b = sig.select(F.col("key").alias("kb"), "cx", "cy")
    pairs = (a.join(b, ["cx", "cy"])
             .filter(F.col("ka") != F.col("kb"))
             .groupBy("ka", "kb").agg(F.count("*").alias("shared_cells")))
    scored = (
        pairs
        .join(sizes.select(F.col("key").alias("ka"), F.col("n").alias("na")),
              "ka")
        .join(sizes.select(F.col("key").alias("kb"), F.col("n").alias("nb")),
              "kb")
        .withColumn("jaccard", F.round(
            F.col("shared_cells")
            / (F.col("na") + F.col("nb") - F.col("shared_cells")),
            round_digits))
    )
    w = Window.partitionBy("ka").orderBy(F.desc("jaccard"), F.asc("kb"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("ka").alias(key_column),
                    F.col("kb").alias("neighbor"),
                    F.col("shared_cells").cast("long").alias("shared_cells"),
                    "jaccard",
                    F.col("rank").cast("int").alias("rank")))
