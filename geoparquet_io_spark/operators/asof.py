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
    payload = F.struct(*[F.col(c) for c in rcols])
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        payload.alias("__payload"),
        F.lit(1).alias("__is_right"),
    )
    lcols = [c for c in left.columns]
    l = left.select(
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
    return out
