"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user counters with state timeout — the pattern for any
custom streaming state the built-in windows can't express
(SURVEY.md 2.12 notes the reference has no true streaming; this is the
Spark-native capability a 100 TB event pipeline needs).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])


def _update_user_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        n, total = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [total]})
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(60_000)  # flush after 60s idle
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: continuously-updated per-user totals with 60 s idle
    timeout.  Batch: plain groupBy (same schema) so the operator is
    batch/stream agnostic for oracle checks."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.sum("value").alias("sum_value")
        )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
