"""Greedy sequence packing — batch-assembly for LLM training pipelines.

Packs variable-length documents into fixed token-budget groups ("packs"),
the standard preprocessing step before concatenating documents into
training sequences.  Greedy first-fit-in-order semantics: within each
group, walk rows in a deterministic order and open a new pack whenever
the running token total would exceed the budget.  An oversized single
document (> budget) gets a pack of its own.

This is inherently *sequential within a group* — exactly the kind of
operator Spark's built-ins can't express — so it runs as an
Arrow-batched ``applyInPandas`` over ``groupBy(group)``:

- groups pack **in parallel** across executors (the unit of scale is
  the group — language, source shard, date bucket ...);
- within a group the greedy walk is a tight numpy-backed loop over one
  in-memory pandas partition;
- for a 100 TB corpus, bound group size by pre-sharding the group key
  (e.g. ``group = (lang, md5(doc_id) % n_shards)``) so every group fits
  an executor — packing quality is unaffected because packs never cross
  groups anyway.

Beyond-reference operator (no counterpart in geoparquet-io); the greedy
recurrence is mirrored exactly by a DuckDB recursive CTE in the
registered oracle (queries_data.py: pack_greedy).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def pack_sequences(df: DataFrame, group_column: str, order_column: str,
                   size_column: str, budget: int,
                   pack_column: str = "pack_id") -> DataFrame:
    """Assign each row a ``pack_column`` (0-based per group) by greedy
    first-fit in ``order_column`` order so that each pack's total
    ``size_column`` stays within ``budget`` (single oversized rows get
    their own pack).  ``order_column`` must be unique within a group for
    the result to be deterministic; NULL sizes count as 0.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # copy — StructType.add would mutate the DataFrame's cached schema
    cols = [f.name for f in df.schema.fields]
    out_schema = StructType(
        list(df.schema.fields) + [StructField(pack_column, LongType())]
    )

    def _pack(pdf):
        pdf = pdf.sort_values(order_column, kind="mergesort").reset_index(drop=True)
        sizes = pdf[size_column].fillna(0).to_numpy()
        packs = np.empty(len(pdf), dtype=np.int64)
        acc = budget + 1  # force the first row to open pack 0
        pack = -1
        for i, sz in enumerate(sizes):
            if acc + sz > budget:
                pack += 1
                acc = sz
            else:
                acc += sz
            packs[i] = pack
        pdf = pdf[cols]
        pdf[pack_column] = packs
        return pdf

    return df.groupBy(group_column).applyInPandas(_pack, out_schema)
