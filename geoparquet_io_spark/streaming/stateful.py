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
    T.StructField("n_valid", T.LongType()),
])

def _output_schema(key_type: T.DataType) -> T.StructType:
    """Output schema with the key column's ACTUAL type — hardcoding
    LongType broke the streaming branch for string/int user ids while
    the batch branch (plain groupBy) happily accepted them."""
    return T.StructType([
        T.StructField("user_id", key_type),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ])


def _emit(key, n, total, nv):
    # batch parity on the null edge: Spark SUM over all-NULL values is
    # NULL, pandas .sum() would silently report 0.0 — emit None unless
    # at least one non-null value was ever seen
    return pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "sum_value": [total if nv else None],
    })


def _update_user_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        # flush the current totals but KEEP the state: removing it reset
        # a user's running count to zero after any 60 s idle gap, so the
        # next event emitted n_events=1 and the update-mode sink
        # overwrote the real total — breaking batch parity.  No new
        # timeout is registered; the next data batch re-arms it.
        n, total, nv = state.get
        yield _emit(key, n, total, nv)
        return
    n, total, nv = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        nv += int(pdf["value"].notna().sum())
        total += float(pdf["value"].sum())  # skips NaN; gated by nv
    state.update((n, total, nv))
    state.setTimeoutDuration(60_000)  # flush after 60s idle
    yield _emit(key, n, total, nv)


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
            outputStructType=_output_schema(
                events.schema["user_id"].dataType),
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
