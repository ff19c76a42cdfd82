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
