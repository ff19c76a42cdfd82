"""As-of (temporal) join: for each left row, the LATEST right row with
``right_ts <= left_ts`` per key.

Spark has no ASOF JOIN; the classic scale-correct encoding is the
union-window trick: tag both inputs, union them, and run ONE window per
key ordered by (ts, right-before-left) taking the last non-null right
payload at or before the current row.  Cost: a single shuffle on the key
(the window's partitionBy) over left+right together — no per-key loops,
no range cross-products, no driver involvement.  Skewed keys behave like
any windowed aggregation (AQE/salting apply).

Semantics match DuckDB/kdb ASOF JOIN with inclusive match
(``right_ts <= left_ts``); the oracle query runs DuckDB's native
ASOF LEFT JOIN against this implementation.  Right rows should be unique
per (key, right_ts); equal-timestamp duplicates have no defined winner
in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_prefix_clash(left_cols, rcols, prefix: str) -> None:
    """Duplicate output names corrupt both variants: the union-window
    select emits two identically-named columns (parquet write fails),
    and the pandas batch assignment silently OVERWRITES the left data
    while the declared schema still lists both fields."""
    clash = [f"{prefix}{c}" for c in rcols if f"{prefix}{c}" in left_cols]
    if clash:
        raise ValueError(
            f"as-of output column(s) {clash} already exist on the left "
            "side — pick another prefix or rename the left columns")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_columns: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """LEFT as-of join; right payload columns appear as ``{prefix}{col}``
    (NULL when no right row is at or before the left timestamp)."""
    rcols = right_columns or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    _check_prefix_clash(left.columns, rcols, prefix)
    payload = F.struct(*[F.col(c) for c in rcols])
    # SQL semantics: a NULL key never equals anything and a NULL ts never
    # satisfies <=, so such right rows can never match — drop them, or the
    # window would group NULL keys together and sort NULL ts first (a
    # universal earliest match)
    r = right.filter(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        payload.alias("__payload"),
        F.lit(1).alias("__is_right"),
    )
    lcols = [c for c in left.columns]
    # left rows with a NULL key/ts can never match — and every NULL-key
    # row would hash to ONE window partition (a straggler reducer at
    # scale).  Route them around the shuffle and union back with NULL
    # payload columns.
    null_left = left.filter(
        F.col(key).isNull() | F.col(left_ts).isNull())
    left_ok = left.filter(
        F.col(key).isNotNull() & F.col(left_ts).isNotNull())
    l = left_ok.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(0).alias("__is_right"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    # right rows must come BEFORE left rows at equal ts (inclusive <=)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.select("__k", "__ts", "__payload", "__is_right",
                 *[F.lit(None).cast(l.schema[f"__l_{c}"].dataType)
                   .alias(f"__l_{c}") for c in lcols]) \
         .unionByName(l)
    u = u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = u.filter(F.col("__is_right") == 0).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col("__match").getField(c).alias(f"{prefix}{c}") for c in rcols],
    )
    nulls = null_left.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
          for c in rcols],
    )
    return out.unionByName(nulls)


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_columns: list[str] | None = None,
    prefix: str = "asof_",
    max_broadcast_rows: int = 5_000_000,
) -> DataFrame:
    """Map-only as-of join for a SMALL right side (e.g. a marker/dimension
    table): the right table is collected, sorted per key, and shipped in
    a ``mapInPandas`` closure; each batch binary-searches
    (``np.searchsorted``) its timestamps — the big left side never
    shuffles, unlike the union-window encoding which shuffles
    left+right on the key.  Same inclusive ``right_ts <= left_ts``
    semantics (equivalence-tested against :func:`asof_join`)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    rcols = right_columns or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    _check_prefix_clash(left.columns, rcols, prefix)
    import datetime as _dt

    _dt_types = (T.TimestampType, T.TimestampNTZType, T.DateType)
    _int_types = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    ts_is_datetime = isinstance(right.schema[right_ts].dataType, _dt_types)
    left_is_datetime = isinstance(left.schema[left_ts].dataType, _dt_types)
    if ts_is_datetime != left_is_datetime:
        # int64-ns keys vs raw floats silently never match (1.7e18 vs
        # 1.7e9 scales) — incompatible schemas must fail fast
        raise ValueError(
            f"asof_join_broadcast: left ts {left.schema[left_ts].dataType}"
            f" and right ts {right.schema[right_ts].dataType} are not the"
            " same time family (datetime vs numeric)")
    # instants (TimestampType) are keyed as unix MICROSECONDS computed
    # IN SPARK on both sides: .collect() renders timestamps in the
    # DRIVER OS timezone while Arrow batches use the session timezone,
    # so comparing the two shifted every match on a non-UTC host (r9
    # review).  NTZ/Date have no timezone and keep the ns path.
    ts_is_instant = isinstance(right.schema[right_ts].dataType,
                               T.TimestampType)
    left_is_instant = isinstance(left.schema[left_ts].dataType,
                                 T.TimestampType)
    if ts_is_instant != left_is_instant:
        # an instant (unix-us) on one side and a wall time (NTZ/Date,
        # ns) on the other would compare different units/epoch notions
        raise ValueError(
            "asof_join_broadcast: TimestampType (an instant) on one "
            "side and NTZ/Date (a wall time) on the other — cast them "
            "to the same type first")
    # integral numeric ts stay int64 end-to-end (when BOTH sides are
    # integral): float64 loses ulps past 2^53 (epoch-ns scale),
    # breaking the inclusive <= boundary
    both_ts_integral = (
        isinstance(right.schema[right_ts].dataType, _int_types)
        and isinstance(left.schema[left_ts].dataType, _int_types))
    key_integral = isinstance(left.schema[key].dataType, _int_types)

    r_sel_ts = (F.unix_micros(F.col(right_ts)).alias(right_ts)
                if ts_is_instant else F.col(right_ts))
    r_local = right.select(F.col(key), r_sel_ts, *[F.col(c) for c in rcols]) \
        .limit(max_broadcast_rows + 1).collect()
    if len(r_local) > max_broadcast_rows:
        raise ValueError(
            f"right side exceeds {max_broadcast_rows} rows — use the "
            "shuffle-based asof_join")

    def _ts_key(t):
        """Comparable scalar: int64 (unix-us instants, ns for NTZ/date,
        raw integral); float otherwise."""
        if isinstance(t, (_dt.datetime, _dt.date)):
            return int(pd.Timestamp(t).value)
        if ts_is_instant or both_ts_integral:
            return int(t)
        return float(t)

    # NaN parity with the shuffle-based asof_join (r10): Spark (and
    # DuckDB) treat NaN as EQUAL to NaN and GREATER than every other
    # value, so a NaN float key is a real group and a NaN float ts
    # matches the latest marker.  Python disagrees twice — nan != nan
    # makes dict lookups miss (every NaN key got its own entry, never
    # found again), and list.sort with NaN comparisons leaves the ts
    # array in undefined order.  Canonicalize NaN keys to a sentinel,
    # and sort NaN timestamps explicitly last (numpy's sort/searchsorted
    # order, which also ranks a NaN query above everything — exactly
    # the window semantics).
    _NANKEY = object()

    def _key_canon(v):
        return _NANKEY if isinstance(v, float) and v != v else v

    by_key: dict = {}
    for row in r_local:
        if row[key] is None or row[right_ts] is None:
            continue  # NULL key/ts can never match (SQL semantics)
        by_key.setdefault(_key_canon(row[key]), []).append(
            (_ts_key(row[right_ts]), tuple(row[c] for c in rcols)))
    ts_dtype = ("int64" if (ts_is_datetime or both_ts_integral)
                else "float64")
    lookup = {}
    for k, v in by_key.items():
        # sort on ts only: payload tuples may hold Nones, which are not
        # orderable (equal-ts duplicates keep no defined winner, as
        # doc'd); (isnan, ts) puts NaN last deterministically
        v.sort(key=lambda x: (x[0] != x[0], x[0]))
        lookup[k] = (np.array([t for t, _ in v], dtype=ts_dtype),
                     [p for _, p in v])
    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(f"{prefix}{c}", right.schema[c].dataType, True)
           for c in rcols]
    )

    def _tmp(base: str) -> str:
        while base in left.columns:
            base = "_" + base
        return base

    # exact helper columns computed in Spark, sentinel-coalesced so the
    # pandas conversion never degrades int64 to float64 (a batch with
    # one NULL converts the whole column and 2^53+1 rounds): the
    # original column's isna mask decides NULL routing, never the value
    SENT = -(1 << 62)
    work = left
    helper_cols: list[str] = []
    ts_name = left_ts
    if left_is_instant:
        ts_name = _tmp("__asof_us")
        work = work.withColumn(ts_name, F.coalesce(
            F.unix_micros(F.col(left_ts)), F.lit(SENT)))
        helper_cols.append(ts_name)
    elif both_ts_integral:
        ts_name = _tmp("__asof_tsl")
        work = work.withColumn(ts_name, F.coalesce(
            F.col(left_ts).cast("long"), F.lit(SENT)))
        helper_cols.append(ts_name)
    key_name = key
    if key_integral:
        key_name = _tmp("__asof_k")
        work = work.withColumn(key_name, F.coalesce(
            F.col(key).cast("long"), F.lit(SENT)))
        helper_cols.append(key_name)
    # explicit Spark-side NULL flags: in a float64 pandas batch NULL and
    # NaN are indistinguishable (both arrive as NaN), but their asof
    # semantics differ — NULL never matches, NaN matches the LATEST
    # marker (NaN ranks above every ts in Spark and DuckDB alike).
    # pd.isna() was silently treating NaN keys/timestamps as NULL.
    knull_name = _tmp("__asof_knull")
    work = work.withColumn(knull_name, F.col(key).isNull())
    helper_cols.append(knull_name)
    tnull_name = _tmp("__asof_tnull")
    work = work.withColumn(tnull_name, F.col(left_ts).isNull())
    helper_cols.append(tnull_name)
    key_idx = work.columns.index(key_name)
    ts_idx = work.columns.index(ts_name)
    knull_idx = work.columns.index(knull_name)
    tnull_idx = work.columns.index(tnull_name)
    exact_ts = left_is_instant or both_ts_integral
    exact_key = key_integral

    def join_batches(batches):
        for pdf in batches:
            key_na = pdf.iloc[:, knull_idx].to_numpy(dtype=bool)
            if exact_key:
                keys = [int(v) for v in pdf.iloc[:, key_idx]]
            else:
                keys = pdf.iloc[:, key_idx].to_numpy()
            ts_series = pdf.iloc[:, ts_idx]
            na = pdf.iloc[:, tnull_idx].to_numpy(dtype=bool) | key_na
            if exact_ts:
                tss = ts_series.to_numpy(dtype="int64")
            elif left_is_datetime:
                # DateType arrives as OBJECT dtype of datetime.date (the
                # Arrow serializer's date_as_object) — pd.to_datetime
                # normalizes both that and datetime64 columns.  Keep
                # int64 ns (their range exceeds float53 precision).
                tss = pd.to_datetime(ts_series) \
                    .to_numpy("datetime64[ns]").view("int64")
            else:
                tss = ts_series.to_numpy(dtype="float64", na_value=np.nan)
            matches = []
            for kv, tv, bad in zip(keys, tss, na):
                ent = None if bad else lookup.get(_key_canon(kv))
                if ent is None:  # unknown/NULL key or NULL/NaN ts
                    matches.append(None)
                    continue
                ts_arr, payloads = ent
                # rightmost position with ts <= tv (inclusive)
                i = int(np.searchsorted(ts_arr, tv, side="right")) - 1
                matches.append(payloads[i] if i >= 0 else None)
            out = pdf.copy()
            if helper_cols:
                out = out.drop(columns=helper_cols)
            for j, c in enumerate(rcols):
                out[f"{prefix}{c}"] = pd.Series(
                    [None if m is None else m[j] for m in matches],
                    dtype="object")
            yield out

    return work.mapInPandas(join_batches, schema=out_schema)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_column: str,
    lo_column: str,
    hi_column: str,
    interval_columns: list[str] | None = None,
    bucket_size: float | None = None,
    how: str = "inner",
    point_id: str | None = None,
) -> DataFrame:
    """Point-in-interval join (``lo <= value < hi``) for two LARGE sides —
    the 1-D analogue of the PBSM grid spatial join: each interval
    replicates to every bucket it overlaps, points hash to one bucket,
    and the join is a plain equi-join on the bucket id (one shuffle per
    side, co-partitioned; Spark's naive plan for a range theta-join is a
    nested-loop cross product).  ``bucket_size`` defaults to the average
    interval width (one small aggregate over the interval side) — buckets much smaller than intervals
    replicate too much, much larger ones lose pruning.

    ``how='left'`` needs ``point_id`` (unique) to restore unmatched
    points via an anti-join, mirroring grid_spatial_join.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if how == "left" and not point_id:
        raise ValueError("left range join needs point_id")
    icols = interval_columns or [
        c for c in intervals.columns if c not in (lo_column, hi_column)
    ]
    clash = set(icols) & set(points.columns)
    if clash:
        raise ValueError(
            f"interval columns {sorted(clash)} collide with point columns; "
            "rename one side or pass interval_columns explicitly")
    reserved = {"__bucket", "__lo", "__hi"} & set(points.columns)
    if reserved:
        # __bucket would be silently OVERWRITTEN with internal bucket
        # ids in the output (and __lo/__hi die as ambiguous references)
        raise ValueError(
            f"points has reserved column(s) {sorted(reserved)} — "
            "range_join uses them internally; rename them first")
    iv = intervals.select(
        F.col(lo_column).alias("__lo"),
        F.col(hi_column).alias("__hi"),
        *[F.col(c).alias(f"__r_{c}") for c in icols],
    )
    # empty/inverted intervals (hi <= lo) can never match; drop BEFORE the
    # width average so malformed rows can't poison the bucket size
    iv = iv.filter(F.col("__hi") > F.col("__lo"))
    if bucket_size is None:
        row = iv.select(
            F.avg(F.col("__hi") - F.col("__lo")).alias("w")).collect()[0]
        w = row["w"]
        bucket_size = float(w) if w is not None and w > 0 else 1.0
    elif bucket_size <= 0:
        raise ValueError(f"bucket_size must be positive, got {bucket_size}")
    b = float(bucket_size)
    hi_bucket = F.floor(F.col("__hi") / b).cast("long")
    # hi is exclusive: an exactly boundary-aligned hi never reaches its
    # own bucket (explicit case, not an epsilon hack)
    hi_bucket = F.when(F.col("__hi") % F.lit(b) == 0, hi_bucket - 1) \
        .otherwise(hi_bucket)
    lo_bucket = F.floor(F.col("__lo") / b).cast("long")
    iv = iv.withColumn(
        "__bucket",
        F.explode(F.sequence(lo_bucket, F.greatest(hi_bucket, lo_bucket))),
    )
    pt = points.withColumn("__bucket",
                           F.floor(F.col(value_column) / b).cast("long"))
    joined = (
        pt.join(iv, "__bucket")
        .filter((F.col(value_column) >= F.col("__lo"))
                & (F.col(value_column) < F.col("__hi")))
    )
    matched = joined.select(
        *[F.col(c) for c in points.columns],
        *[F.col(f"__r_{c}").alias(c) for c in icols],
    )
    if how == "inner":
        return matched
    # eqNullSafe: a matched NULL point_id must not be re-emitted by the
    # restore anti-join (plain equi anti never matches NULL)
    mk = matched.select(F.col(point_id).alias("__mpid"))
    missing = points.join(
        mk, F.col(point_id).eqNullSafe(F.col("__mpid")), "left_anti")
    for c in icols:
        missing = missing.withColumn(c, F.lit(None))
    return matched.unionByName(missing)
