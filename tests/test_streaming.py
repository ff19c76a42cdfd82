"""Structured Streaming: the same transformations must produce identical
results under readStream as in batch mode (tested via memory sink)."""

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-write events as a small multi-file directory (stream source)."""
    from geoparquet_io_spark.testsupport.tables import load_table

    d = tmp_path_factory.mktemp("events_stream")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(4).write.mode("overwrite").parquet(str(d))
    return str(d)


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


def test_stream_dedup(spark, events_dir):
    from geoparquet_io_spark.streaming.events import read_events_stream, stream_dedup

    batch_df = spark.read.parquet(events_dir)
    stream = read_events_stream(spark, events_dir, schema=batch_df.schema)
    out = stream_dedup(stream, ["user_id", "event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM dedup_stream").collect()[0]["n"]
    expected = batch_df.dropDuplicates(["user_id", "event_type"]).count()
    assert got == expected
