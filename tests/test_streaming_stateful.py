"""Structured Streaming, stateful half: windowed aggregations,
stream-stream joins, sessionization, and the applyInPandasWithState
custom operator (running totals, TTL eviction, checkpoint restarts).
Split from test_streaming.py so the suite's two slowest streaming
halves run in parallel shards (sinks/soak stay in test_streaming.py)."""

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-write events as a small multi-file directory (stream source)."""
    from geoparquet_io_spark.testsupport.tables import load_table

    d = tmp_path_factory.mktemp("events_stream_st")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(4).write.mode("overwrite").parquet(str(d))
    return str(d)


def _drain_stateful(q, done, timeout=120.0):
    """applyInPandasWithState + ProcessingTimeTimeout never
    self-terminates under availableNow (the timeout service keeps the
    query alive past the last batch), so a blind awaitTermination(T)
    burns the whole T.  Poll for the FINAL expected state, then stop —
    `done()` must check the complete expected values, not mere
    presence, so a mid-stream partial can never pass early."""
    import time

    end = time.time() + timeout
    try:
        while time.time() < end:
            if q.awaitTermination(2):
                return
            try:
                ok = done()
            except Exception:   # memory table not registered yet
                ok = False
            if ok:
                return
        raise AssertionError("stream did not reach expected state in time")
    finally:
        q.stop()


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    from geoparquet_io_spark.streaming.events import (
        read_events_stream,
        windowed_event_counts,
    )

    batch_df = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(batch_df, "1 hour").collect()
    }

    stream = read_events_stream(spark, events_dir, schema=batch_df.schema)
    assert stream.isStreaming
    out = windowed_event_counts(stream, "1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stateful_running_totals(spark, events_dir):
    """applyInPandasWithState running totals: final update-mode state must
    equal the batch groupBy."""
    from geoparquet_io_spark.streaming.events import read_events_stream
    from geoparquet_io_spark.streaming.stateful import running_user_totals

    batch_df = spark.read.parquet(events_dir)
    expected = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 4))
        for r in running_user_totals(batch_df).collect()
    }
    stream = read_events_stream(spark, events_dir, schema=batch_df.schema)
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )

    def _totals():
        # last update per user wins: memory sink appends updates in
        # order; keep the max count per user
        got = {}
        for r in spark.sql(
                "SELECT user_id, n_events, sum_value FROM user_totals"
        ).collect():
            prev = got.get(r["user_id"])
            if prev is None or r["n_events"] >= prev[0]:
                got[r["user_id"]] = (r["n_events"], round(r["sum_value"], 4))
        return got

    _drain_stateful(q, lambda: _totals() == expected)
    assert _totals() == expected


def test_stream_stream_join_equals_batch(spark, events_dir):
    """Watermarked interval join: stream-stream result == the identical
    stateless batch join."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.streaming.events import (
        read_events_stream,
        stream_stream_join,
    )

    batch = spark.read.parquet(events_dir)
    la = batch.select("user_id", "ts", "event_id")
    rb = batch.select("user_id", "ts", F.col("event_id").alias("other_id"))

    expected = {
        (r["user_id"], r["event_id"], r["r_other_id"])
        for r in stream_stream_join(
            la, rb, key="user_id", interval="30 minutes").collect()
    }
    assert expected  # nonzero evidence

    sa = read_events_stream(spark, events_dir, schema=batch.schema) \
        .select("user_id", "ts", "event_id")
    sb = read_events_stream(spark, events_dir, schema=batch.schema) \
        .select("user_id", "ts", F.col("event_id").alias("other_id"))
    out = stream_stream_join(sa, sb, key="user_id", interval="30 minutes")
    q = (out.writeStream.format("memory").queryName("ssj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["event_id"], r["r_other_id"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    assert got == expected


def test_sessionize_stream_flushes_closed_sessions(spark, events_dir):
    """session_window in APPEND mode emits a session only once the
    watermark passes its end.  With availableNow, the wrap-up batch
    advances the watermark to max(ts) - gap: every session closed before
    that must be emitted, every emitted row must match the batch result
    exactly, and sessions still open at end-of-input may be withheld."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from geoparquet_io_spark.streaming.events import (read_events_stream,
                                                      sessionize)

    batch_df = spark.read.parquet(events_dir)
    gap = "30 minutes"
    batch_rows = {
        (r["session_start"], r["session_end"], r["user_id"]):
            (r["n_events"], r["sum_value"])
        for r in sessionize(batch_df, gap).collect()
    }

    stream = read_events_stream(spark, events_dir, schema=batch_df.schema)
    out = sessionize(stream, gap)
    q = (out.writeStream.format("memory").queryName("sess_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {
        (r["session_start"], r["session_end"], r["user_id"]):
            (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    # correctness: everything emitted agrees with batch
    for k, v in got.items():
        assert batch_rows.get(k) == v, k
    # completeness: sessions closed before the final watermark all emitted
    from geoparquet_io_spark.streaming.events import _watermarkable

    max_ts = _watermarkable(batch_df, "ts").agg(F.max("ts")).collect()[0][0]
    final_wm = max_ts - _dt.timedelta(minutes=30)
    must_emit = {k for k in batch_rows if k[1] <= final_wm}
    assert must_emit, "fixture should close at least one session"
    missing = must_emit - set(got)
    assert not missing, f"closed sessions withheld: {sorted(missing)[:3]}"


def test_sliding_windows_stream_equals_batch(spark, events_dir):
    from geoparquet_io_spark.streaming.events import (read_events_stream,
                                                      sliding_event_counts)

    batch_df = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in sliding_event_counts(batch_df, "1 hour", "30 minutes").collect()
    }
    stream = read_events_stream(spark, events_dir, schema=batch_df.schema)
    out = sliding_event_counts(stream, "1 hour", "30 minutes")
    q = (out.writeStream.format("memory").queryName("slide_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM slide_counts").collect()
    }
    assert got == expected and len(got) > 0


def test_stream_stream_join_outer_key_not_null(spark, events_dir):
    """full_outer interval join must surface the key from whichever side
    matched — unmatched right rows previously emitted key=NULL."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.streaming.events import stream_stream_join

    batch = spark.read.parquet(events_dir)
    la = batch.filter(F.col("user_id") % 2 == 0) \
        .select("user_id", "ts", "event_id")
    rb = batch.filter(F.col("user_id") % 2 == 1) \
        .select("user_id", "ts", F.col("event_id").alias("other_id"))
    out = stream_stream_join(la, rb, key="user_id", interval="30 minutes",
                             how="full_outer")
    assert out.filter(F.col("user_id").isNull()).count() == 0
    # both sides' keys present (disjoint key sets -> no actual matches)
    keys = {r["user_id"] % 2 for r in out.select("user_id").distinct().collect()}
    assert keys == {0, 1}


def test_stateful_totals_all_null_values_match_batch(spark):
    """Batch SUM over all-NULL values is NULL; the pandas state update
    must emit None for such a user, not 0.0."""
    from geoparquet_io_spark.streaming.stateful import _update_user_totals

    import pandas as pd

    class _FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self._v = True, v

        def setTimeoutDuration(self, ms):
            pass

        @property
        def get(self):
            return self._v

    st = _FakeState()
    pdf = pd.DataFrame({"value": [None, None]}, dtype="float64")
    out = list(_update_user_totals((7,), iter([pdf]), st))[0]
    assert out["n_events"].iloc[0] == 2
    assert pd.isna(out["sum_value"].iloc[0])
    # a later non-null batch flips it to a real sum
    out2 = list(_update_user_totals((7,), iter([pd.DataFrame({"value": [2.5]})]), st))[0]
    assert out2["sum_value"].iloc[0] == 2.5 and out2["n_events"].iloc[0] == 3


def test_stateful_old_checkpoint_schema_raises_clear_error():
    """State checkpointed under the pre-``idle`` 3-field schema must
    fail with an actionable message (drain + fresh checkpoint dir), not
    an opaque tuple-unpack error mid-stream (r7 ADVICE)."""
    import pandas as pd
    import pytest

    from geoparquet_io_spark.streaming.stateful import _update_user_totals

    class OldState:
        exists = True
        hasTimedOut = False

        @property
        def get(self):
            return (3, 1.5, 2)        # old 3-field state

        def update(self, v):
            pass

        def setTimeoutDuration(self, ms):
            pass

    with pytest.raises(RuntimeError, match="FRESH checkpoint"):
        list(_update_user_totals(
            (7,), iter([pd.DataFrame({"value": [1.0]})]), OldState()))

    class OldTimedOut(OldState):
        exists = True
        hasTimedOut = True

    with pytest.raises(RuntimeError, match="FRESH checkpoint"):
        list(_update_user_totals((7,), iter([]), OldTimedOut()))


def test_stateful_timeout_flush_keeps_running_totals():
    """An idle-timeout flush must EMIT but not RESET: removing state let
    the next event overwrite a user's true running total with 1."""
    from geoparquet_io_spark.streaming.stateful import _update_user_totals

    import pandas as pd

    class FakeState:
        def __init__(self):
            self.hasTimedOut = False
            self._v = None
            self.removed = False
        @property
        def exists(self):
            return self._v is not None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self._v = v
        def remove(self):
            self.removed = True
            self._v = None
        def setTimeoutDuration(self, ms):
            pass

    st = FakeState()
    batch = pd.DataFrame({"value": [1.0, 2.0, None]})
    out1 = list(_update_user_totals((7,), iter([batch]), st))
    assert out1[0]["n_events"].iloc[0] == 3
    # idle timeout fires: flush, but state survives
    st.hasTimedOut = True
    out2 = list(_update_user_totals((7,), iter([]), st))
    assert out2[0]["n_events"].iloc[0] == 3
    assert not st.removed and st.exists
    # next events continue the RUNNING total
    st.hasTimedOut = False
    out3 = list(_update_user_totals((7,), iter([pd.DataFrame({"value": [5.0]})]), st))
    assert out3[0]["n_events"].iloc[0] == 4
    assert out3[0]["sum_value"].iloc[0] == 8.0


def test_stateful_eviction_ttl_drops_idle_state():
    """With eviction_ttl_sec set, a key idle past the TTL has its state
    deliberately dropped (bounded state on high-churn key spaces); a key
    that gets data between flush and horizon is spared."""
    from geoparquet_io_spark.streaming.stateful import _make_update_fn

    import pandas as pd

    class FakeState:
        def __init__(self):
            self.hasTimedOut = False
            self._v = None
            self.removed = False
            self.timeout_ms = None
        @property
        def exists(self):
            return self._v is not None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self._v = v
        def remove(self):
            self.removed = True
            self._v = None
        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    fn = _make_update_fn(3_600_000)  # 1 h eviction horizon
    st = FakeState()
    list(fn((7,), iter([pd.DataFrame({"value": [1.0, 2.0]})]), st))
    assert st.timeout_ms == 60_000
    # first timeout: flush, keep state, re-arm to the eviction horizon
    st.hasTimedOut = True
    out = list(fn((7,), iter([]), st))
    assert out and out[0]["n_events"].iloc[0] == 2
    assert st.exists and not st.removed
    assert st.timeout_ms == 3_600_000 - 60_000
    # data between flush and horizon clears the idle mark
    st.hasTimedOut = False
    list(fn((7,), iter([pd.DataFrame({"value": [3.0]})]), st))
    st.hasTimedOut = True
    out2 = list(fn((7,), iter([]), st))  # flush again, still alive
    assert out2[0]["n_events"].iloc[0] == 3 and st.exists
    # second consecutive timeout = horizon reached: state dropped, no emit
    out3 = list(fn((7,), iter([]), st))
    assert out3 == [] and st.removed and not st.exists

    # default fn never evicts
    from geoparquet_io_spark.streaming.stateful import _update_user_totals
    st2 = FakeState()
    list(_update_user_totals((7,), iter([pd.DataFrame({"value": [1.0]})]), st2))
    st2.hasTimedOut = True
    list(_update_user_totals((7,), iter([]), st2))
    list(_update_user_totals((7,), iter([]), st2))
    assert st2.exists and not st2.removed


def test_stateful_ttl_query_restarts_from_own_checkpoint(spark, tmp_path):
    """A TTL-enabled running_user_totals query must RESUME from its own
    checkpoint (r7 verdict #6): stop after one availableNow pass, land
    more files, restart with the same checkpoint dir — the second run's
    emissions must carry CUMULATIVE totals (state restored under the
    4-field schema), not restart from zero."""
    from geoparquet_io_spark.streaming.events import read_events_stream
    from geoparquet_io_spark.streaming.stateful import running_user_totals

    d, ckpt = tmp_path / "tevents", str(tmp_path / "tckpt")
    df1 = spark.createDataFrame(
        [(7, 1.0), (7, 2.0), (9, 5.0)], "user_id long, value double")
    df1.write.parquet(str(d))
    emitted: dict[int, tuple] = {}

    def run_once(want):
        stream = read_events_stream(spark, str(d), schema=df1.schema)
        q = (running_user_totals(stream, eviction_ttl_sec=3600)
             .writeStream.foreachBatch(
                 lambda b, _e: emitted.update(
                     {r["user_id"]: (r["n_events"], r["sum_value"])
                      for r in b.collect()}))
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        _drain_stateful(
            q, lambda: all(emitted.get(k) == v for k, v in want.items()))

    run_once({7: (2, 3.0), 9: (1, 5.0)})
    assert emitted[7] == (2, 3.0) and emitted[9] == (1, 5.0)
    spark.createDataFrame([(7, 4.0)], "user_id long, value double") \
        .write.mode("append").parquet(str(d))
    # cumulative, not reset: checkpointed state picked up and extended
    run_once({7: (3, 7.0)})
    assert emitted[7] == (3, 7.0)


def test_stateful_totals_string_user_id(spark, tmp_path):
    """The output schema must follow the key column's actual type."""
    from geoparquet_io_spark.streaming.events import read_events_stream
    from geoparquet_io_spark.streaming.stateful import running_user_totals

    d = tmp_path / "sevents"
    df = spark.createDataFrame(
        [("alice", 1.0), ("alice", 2.0), ("bob", 5.0)],
        "user_id string, value double")
    df.write.parquet(str(d))
    stream = read_events_stream(spark, str(d), schema=df.schema)
    q = (running_user_totals(stream)
         .writeStream.format("memory").queryName("str_totals")
         .outputMode("update").trigger(availableNow=True).start())
    want = {"alice": (2, 3.0), "bob": (1, 5.0)}

    def _totals():
        return {r["user_id"]: (r["n_events"], r["sum_value"])
                for r in spark.sql("SELECT * FROM str_totals").collect()}

    _drain_stateful(q, lambda: _totals() == want)
    assert _totals() == want


def test_windowed_counts_batch_stream_type_parity(spark, events_dir):
    """Batch and stream outputs of the agnostic transformations must
    carry identical column types (NTZ vs session-tz timestamps would
    write conflicting parquet annotations into a shared sink)."""
    from geoparquet_io_spark.streaming.events import (
        read_events_stream,
        windowed_event_counts,
    )

    batch_df = spark.read.parquet(events_dir)
    batch_out = windowed_event_counts(batch_df, "1 hour")
    stream_out = windowed_event_counts(
        read_events_stream(spark, events_dir, schema=batch_df.schema),
        "1 hour")
    assert batch_out.schema == stream_out.schema
