"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user counters with state timeout — the pattern for any
custom streaming state the built-in windows can't express
(SURVEY.md 2.12 notes the reference has no true streaming; this is the
Spark-native capability a 100 TB event pipeline needs).

State-size trade-off: correct *running* totals require keeping each
key's state for the life of the query (dropping it on idle-flush reset
counters, breaking batch parity).  On streams with high key churn
(many one-shot user_ids) that grows without bound — pass
``eviction_ttl_sec`` to deliberately drop a key's state after that
long with no events; a key seen again after eviction restarts from
zero, which is the documented trade, not a bug.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FLUSH_IDLE_MS = 60_000

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("n_valid", T.LongType()),
    # 1 after an idle flush; a second consecutive timeout (the eviction
    # horizon) with no interleaved data may then drop the state
    T.StructField("idle", T.LongType()),
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


def _read_state(state: GroupState) -> tuple:
    """Unpack state defensively: a checkpoint written under an older
    STATE_SCHEMA (pre-``idle``, 3 fields) otherwise surfaces as an
    opaque tuple-unpack/deserialization error deep inside the stream.
    There is no in-place migration for applyInPandasWithState state —
    tell the operator exactly what to do instead."""
    vals = tuple(state.get)
    if len(vals) != len(STATE_SCHEMA.fields):
        raise RuntimeError(
            "running_user_totals: checkpointed state has "
            f"{len(vals)} fields but this code expects "
            f"{len(STATE_SCHEMA.fields)} (the state schema gained the "
            "'idle' field). Drain the old query to capture its final "
            "totals, then restart with a FRESH checkpoint directory — "
            "applyInPandasWithState state cannot be migrated in place.")
    return vals


def _make_update_fn(eviction_ttl_ms: int | None):
    def _update_user_totals(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, total, nv, idle = _read_state(state)
            if idle and eviction_ttl_ms is not None:
                # second consecutive timeout = eviction horizon reached
                # with zero events since the flush: drop deliberately
                # (long-horizon TTL for high-churn key spaces; the key
                # restarts from zero if ever seen again)
                state.remove()
                return
            # flush the current totals but KEEP the state: removing it
            # reset a user's running count to zero after any 60 s idle
            # gap, so the next event emitted n_events=1 and the
            # update-mode sink overwrote the real total — breaking
            # batch parity.
            state.update((n, total, nv, 1))
            if eviction_ttl_ms is not None:
                state.setTimeoutDuration(
                    max(1, eviction_ttl_ms - FLUSH_IDLE_MS))
            yield _emit(key, n, total, nv)
            return
        n, total, nv, _ = _read_state(state) if state.exists else (0, 0.0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            nv += int(pdf["value"].notna().sum())
            total += float(pdf["value"].sum())  # skips NaN; gated by nv
        state.update((n, total, nv, 0))
        state.setTimeoutDuration(FLUSH_IDLE_MS)  # flush after 60s idle
        yield _emit(key, n, total, nv)

    return _update_user_totals


# default (no-eviction) update fn — also the unit-test seam
_update_user_totals = _make_update_fn(None)


def running_user_totals(
    events: DataFrame, eviction_ttl_sec: float | None = None
) -> DataFrame:
    """Streaming: continuously-updated per-user totals with 60 s idle
    timeout.  Batch: plain groupBy (same schema) so the operator is
    batch/stream agnostic for oracle checks.

    ``eviction_ttl_sec``: optional long-horizon TTL — a key with no
    events for this long has its state dropped (bounds state on
    high-churn key spaces; running totals restart from zero if the key
    reappears).  ``None`` (default) keeps state forever: exact running
    totals, state grows with distinct-key count.

    Checkpoint compatibility: the state schema gained an ``idle`` field
    with the TTL feature — a query checkpointed under the old 3-field
    schema cannot restart on this code.  Drain the old query (process
    remaining input, note the emitted totals), then start fresh; there
    is no in-place state migration for applyInPandasWithState.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.sum("value").alias("sum_value")
        )
    ttl_ms = None
    if eviction_ttl_sec is not None:
        ttl_ms = max(int(eviction_ttl_sec * 1000), FLUSH_IDLE_MS + 1)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(ttl_ms),
            outputStructType=_output_schema(
                events.schema["user_id"].dataType),
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
