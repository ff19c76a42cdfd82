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
      - change with any other op     -> change payload wins (upsert)
      - no change                    -> base row kept
    """
    if isinstance(keys, str):
        keys = [keys]
    payload = [c for c in base.columns if c not in keys]
    missing = [c for c in payload + list(keys) if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing base columns: {missing}")
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, on=list(keys), how="full_outer")
    has_change = F.col(f"c.{op_column}").isNotNull()
    cols = [F.col(k) for k in keys] + [
        F.when(has_change, F.col(f"c.{p}")).otherwise(F.col(f"b.{p}")).alias(p)
        for p in payload
    ]
    return joined.filter(
        ~(has_change & (F.col(f"c.{op_column}") == delete_op))
    ).select(*cols)


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

    def row_hash(df: DataFrame) -> F.Column:
        # null-mask prefix disambiguates NULL from any literal sentinel
        # string (a value equal to the sentinel must still compare unequal
        # to NULL — tested)
        parts = []
        for c in compare_columns:
            s = F.coalesce(F.col(c).cast("string"), F.lit(""))
            parts.append(F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0")))
            # length prefix makes the encoding prefix-free: no crafted
            # separator-containing value can alias a neighboring field
            parts.append(F.length(s).cast("string"))
            parts.append(F.lit(":"))
            parts.append(s)
        return F.md5(F.concat(*parts))

    o = old.select(*keys, row_hash(old).alias("__h_old"))
    n = new.select(*keys, row_hash(new).alias("__h_new"))
    j = o.join(n, on=list(keys), how="full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") == F.col("__h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("diff_status"))
