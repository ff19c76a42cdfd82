"""Keyed changelog application (MERGE / upsert) as a batch operator.

The reference has no MERGE (it is a file-transform tool), but any engine
feeding incremental training-data snapshots needs one: apply a changelog
of upserts/deletes to a base table and produce the next snapshot.

Scale shape: ONE equi-join on the merge key.  The changelog is typically
tiny relative to the base (a day of changes vs the full corpus), so we
use a full-outer join that AQE will plan as a shuffle join on the key —
at 100 TB the base side is already partitioned/bucketed by key, so the
join co-locates without a second shuffle of the base.  No driver
collection, no nested loops (plan-asserted in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, changes: DataFrame,
                 keys: Sequence[str] | str, op_column: str = "op",
                 delete_op: str = "D") -> DataFrame:
    """Apply a keyed changelog to ``base``.

    ``changes`` must carry the base columns plus ``op_column`` with values
    like 'U' (upsert — update if the key exists, insert otherwise) and
    ``delete_op`` ('D' — drop the key).  Exactly one change row per key
    (enforce upstream with a window if the log can contain several).

    Semantics per key:
      - change with op == delete_op  -> row removed
      - change with any other op (or a NULL op) -> change payload wins
        (upsert)
      - no change                    -> base row kept
    """
    if isinstance(keys, str):
        keys = [keys]
    payload = [c for c in base.columns if c not in keys]
    missing = [c for c in payload + list(keys) if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing base columns: {missing}")
    if op_column not in changes.columns:
        raise ValueError(
            f"changes missing op column {op_column!r} "
            f"(have {sorted(changes.columns)})")
    b = _reject_null_keys(base, keys, "base").alias("b")
    # presence FLAG, not op-nullness: a change row with NULL op for an
    # absent key must still upsert its payload — op-nullness would emit
    # a phantom all-NULL row from the missing base side instead
    c = _reject_null_keys(changes, keys, "changes") \
        .withColumn("__chg", F.lit(True)).alias("c")
    joined = b.join(c, on=list(keys), how="full_outer")
    has_change = F.col("c.__chg").isNotNull()
    cols = [F.col(k) for k in keys] + [
        F.when(has_change, F.col(f"c.{p}")).otherwise(F.col(f"b.{p}")).alias(p)
        for p in payload
    ]
    # eqNullSafe: a NULL op must evaluate NOT-delete (plain == yields
    # NULL and the filter would silently drop the row)
    return joined.filter(
        ~(has_change & F.col(f"c.{op_column}").eqNullSafe(F.lit(delete_op)))
    ).select(*cols)


def _reject_null_keys(df: DataFrame, keys: Sequence[str], side: str) -> DataFrame:
    """NULL merge keys never match an equality join, so every operator
    here would silently mishandle them (ignored deletes, duplicated
    rows, added+removed diffs).  The guard is embedded IN the key
    expressions (a dropped helper column would be pruned away), so it
    evaluates exactly when the join reads the key — no extra pass."""
    def g(c: str):
        k = F.col(c)
        return F.when(k.isNull(), F.raise_error(F.lit(
            f"{side}: NULL merge key {c!r} — key columns must be "
            "non-null (filter or impute upstream)"))
            .cast(df.schema[c].dataType)).otherwise(k).alias(c)
    return df.select(*[g(c) if c in keys else F.col(c)
                       for c in df.columns])


def row_hash_expr(columns: Sequence[str]) -> F.Column:
    """Null-safe payload hash over ``columns`` — the shared change
    detector for :func:`dataset_diff` and the snapshot CDF.  A plain
    ``xxhash64(cols...)`` SKIPS null inputs, so rows differing only in
    WHICH column holds NULL hash identically and real updates vanish
    from a diff; this encoding is unambiguous:

    - null-mask prefix disambiguates NULL from any literal sentinel
      string (a value equal to the sentinel still compares unequal to
      NULL — tested);
    - length prefix makes the encoding prefix-free: no crafted
      separator-containing value can alias a neighboring field.
    """
    parts = []
    for c in columns:
        s = F.coalesce(F.col(c).cast("string"), F.lit(""))
        parts.append(F.when(F.col(c).isNull(),
                            F.lit("1")).otherwise(F.lit("0")))
        parts.append(F.length(s).cast("string"))
        parts.append(F.lit(":"))
        parts.append(s)
    return F.md5(F.concat(*parts))


def dataset_diff(old: DataFrame, new: DataFrame,
                 keys: Sequence[str] | str,
                 compare_columns: Sequence[str] | None = None) -> DataFrame:
    """Keyed diff of two dataset versions — the audit primitive behind
    "what changed between corpus v3 and v4?".

    Returns one row per key present in either side with ``diff_status`` in
    {'added', 'removed', 'changed', 'unchanged'}.  Change detection hashes
    the compared payload columns (md5 over a null-sentineled concat), so
    wide rows compare with one cheap column each side instead of N
    pairwise equality predicates surviving the join.

    Scale shape: one full outer join on the key (both sides shuffle once
    on the same key — co-partitioned); the hash is map-side.  Aggregate
    ``groupBy(diff_status).count()`` for the drift report.
    """
    if isinstance(keys, str):
        keys = [keys]
    if compare_columns is None:
        compare_columns = [c for c in old.columns if c not in keys]
    missing_o = [c for c in compare_columns if c not in old.columns]
    missing_n = [c for c in compare_columns if c not in new.columns]
    if missing_o or missing_n:
        raise ValueError(
            f"compare columns missing: old={missing_o} new={missing_n}")

    o = _reject_null_keys(old, keys, "old") \
        .select(*keys, row_hash_expr(compare_columns).alias("__h_old"))
    n = _reject_null_keys(new, keys, "new") \
        .select(*keys, row_hash_expr(compare_columns).alias("__h_new"))
    j = o.join(n, on=list(keys), how="full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") == F.col("__h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("diff_status"))


def scd2_apply(dim: DataFrame, changes: DataFrame,
               keys: Sequence[str] | str,
               attrs: Sequence[str],
               effective_column: str = "effective_ts",
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Slowly-changing-dimension TYPE 2 merge (the standard warehouse
    history pattern): ``dim`` carries (keys, attrs, valid_from,
    valid_to NULL = current); ``changes`` carries (keys, attrs,
    effective_column).  Per change batch:

    - closed history rows pass through untouched;
    - a current row whose change has IDENTICAL attrs passes through
      (no-op change — no spurious version);
    - a current row whose change differs is CLOSED
      (``valid_to = effective``) and a new current row opens;
    - a change for an unseen key inserts a new current row.

    One change per key per batch (enforce upstream; later batches chain).
    Attr comparison is null-safe.  Scale shape: ONE equi-join of the
    current slice against the (small) change batch + unions — history
    rows never join at all, and at 100 TB a dimension bucketed by key
    co-locates the join without re-shuffling the big side.
    """
    if isinstance(keys, str):
        keys = [keys]
    attrs = list(attrs)
    out_cols = [*keys, *attrs, valid_from, valid_to]
    for c in out_cols:
        if c not in dim.columns:
            raise ValueError(f"dim missing column {c!r}")
    for c in [*keys, *attrs, effective_column]:
        if c not in changes.columns:
            raise ValueError(f"changes missing column {c!r}")
    dim = _reject_null_keys(dim, keys, "dim")
    changes = _reject_null_keys(changes, keys, "changes")
    history = dim.filter(F.col(valid_to).isNotNull()).select(*out_cols)
    current = dim.filter(F.col(valid_to).isNull()).select(*out_cols) \
        .withColumn("__cur", F.lit(True))
    eff = F.col(effective_column)
    ch = changes.select(
        *keys,
        *[F.col(a).alias(f"__new_{a}") for a in attrs],
        # NULL effective_ts would CLOSE a row with valid_to=NULL (still
        # "current") while also opening a new one — two open rows per
        # key, breaking the single-current invariant
        F.when(eff.isNull(), F.raise_error(F.lit(
            f"changes: NULL {effective_column!r} — every change needs "
            "an effective timestamp")).cast(
                changes.schema[effective_column].dataType))
        .otherwise(eff).alias("__eff")) \
        .withColumn("__chg", F.lit(True))
    # the join feeds THREE branches (kept/closed/opened): checkpoint so
    # it executes once per batch, not three times
    j = current.join(ch, list(keys), "full_outer") \
        .localCheckpoint(eager=False)
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"__new_{a}"))
    # join-presence FLAGS, not data columns: a current row may carry a
    # legitimately NULL valid_from ('since forever'), and testing it
    # for presence would silently drop that row from the dimension
    has_change = F.col("__chg").isNotNull()
    had_current = F.col("__cur").isNotNull()
    # current rows: kept open (no change / no-op), or closed
    kept = (j.filter(had_current & (~has_change | ~differs))
            .select(*out_cols))
    closed = (j.filter(had_current & has_change & differs)
              .select(*keys, *attrs, valid_from,
                      F.col("__eff").alias(valid_to)))
    opened = (j.filter(has_change & (~had_current | differs))
              .select(*keys,
                      *[F.col(f"__new_{a}").alias(a) for a in attrs],
                      F.col("__eff").alias(valid_from),
                      F.lit(None).cast(dim.schema[valid_to].dataType)
                      .alias(valid_to)))
    return history.unionByName(kept).unionByName(closed) \
        .unionByName(opened)
