"""Structured Streaming surface.

The reference's "streaming" is Arrow-IPC pipe transport, not continuous
processing (core/streaming.py; SURVEY.md 2.12) — lazy DataFrame chaining
covers that.  This module adds the real streaming counterpart a Spark
engine should have: file-source streams over the same tables, windowed
aggregation with watermarks, and streaming dedup — each transformation is
batch/stream agnostic so the batch oracle can validate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """File-source stream over a directory of event parquet files."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def _watermarkable(df: DataFrame, ts_column: str) -> DataFrame:
    """Spark 4 infers plain-microsecond parquet timestamps as TIMESTAMP_NTZ,
    which ``withWatermark`` rejects.  Cast to session-tz TIMESTAMP — the cast
    keeps the wall-clock value (NTZ -> instant -> same wall clock on
    collect), so stream results stay comparable with the un-cast batch
    plan."""
    if dict(df.dtypes).get(ts_column) == "timestamp_ntz":
        df = df.withColumn(ts_column, F.col(ts_column).cast("timestamp"))
    return df


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_column: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type; watermark bounds
    state for late data.  Works identically on batch DataFrames (pass a
    batch df -> the same plan without watermark state)."""
    df = events
    if df.isStreaming:
        df = _watermarkable(df, ts_column).withWatermark(ts_column, watermark)
    return (
        df.groupBy(F.window(F.col(ts_column), window_duration), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def stream_dedup(events: DataFrame, key_columns: list[str],
                 watermark: str = "2 hours", ts_column: str = "ts") -> DataFrame:
    """Streaming exact dedup with bounded state (dropDuplicatesWithinWatermark)."""
    if events.isStreaming:
        return _watermarkable(events, ts_column) \
            .withWatermark(ts_column, watermark) \
            .dropDuplicatesWithinWatermark(key_columns)
    return events.dropDuplicates(key_columns)


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_column: str = "ts",
    user_column: str = "user_id",
) -> DataFrame:
    """Session windows per user (session_window — native stateful op)."""
    df = events
    if df.isStreaming:
        df = _watermarkable(df, ts_column).withWatermark(ts_column, gap)
    return (
        df.groupBy(F.session_window(F.col(ts_column), gap), F.col(user_column))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            user_column, "n_events", "sum_value",
        )
    )


def write_geoparquet_stream(
    stream_df,
    path: str,
    geo,
    checkpoint: str,
    trigger_available_now: bool = True,
    **write_kwargs,
):
    """Streaming sink producing GeoParquet with footer metadata: each
    micro-batch goes through the executor-side footer writer via
    foreachBatch (Spark's parquet streaming sink cannot stamp custom
    footer metadata, same gap as the batch writer)."""
    from geoparquet_io_spark.sources.geoparquet import write as _write

    snapshot = write_kwargs.pop("snapshot", False)
    batch_no = {"n": 0}

    def sink(batch_df, epoch_id):
        # overwrite=True makes the epoch write idempotent: a retried epoch
        # (same epoch_id after a failure) replaces its own directory instead
        # of appending duplicate uuid-named files — preserving the
        # exactly-once guarantee of checkpointed foreachBatch
        _write(batch_df, f"{path}/epoch={epoch_id}", geo,
               overwrite=True, **write_kwargs)
        if snapshot:
            # every micro-batch lands as a committed, time-travelable
            # version: readers pin a snapshot and never see a half-written
            # epoch; the snapshot history is the ingest audit trail.
            # Exactly-once: epoch_id= makes a replayed epoch a no-op
            # (returns the already-committed version) instead of a
            # duplicate; members = prior snapshot + this epoch's files,
            # with prior footer stats REUSED (reuse=) so per-batch cost
            # is O(this epoch), not O(all files ever) — the stream stays
            # incremental over its life.
            import os as _os

            from geoparquet_io_spark.operators.maintenance import (
                _list_parquet_files,
                commit_snapshot,
                snapshot_history,
            )

            hist = snapshot_history(path)
            prior = hist[-1] if hist else None
            epoch_files = _list_parquet_files(f"{path}/epoch={epoch_id}")
            prior_files = ([_os.path.join(path, r["file"])
                            for r in prior["files"]] if prior else [])
            commit_snapshot(batch_df.sparkSession, path,
                            files=sorted(set(prior_files) | set(epoch_files)),
                            note=f"epoch={epoch_id}",
                            epoch_id=int(epoch_id), reuse=prior)
        batch_no["n"] += 1

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
    interval: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join of two streams on ``key``: rows pair when
    the right event lands within [left_ts, left_ts + interval).

    Streaming semantics: BOTH sides are watermarked, and the event-time
    range condition lets Spark expire join state once the watermark
    passes a row's interval — bounded state at any input rate (the
    documented requirement for stream-stream joins).  On batch inputs
    the identical plan runs stateless, which is what the parity test and
    the batch oracle validate.
    """
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__lts"),
        *[c for c in left.columns if c not in (key, left_ts)],
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns
          if c not in (key, right_ts)],
    )
    if left.isStreaming:
        l = _watermarkable(l, "__lts").withWatermark("__lts", watermark)
    if right.isStreaming:
        r = _watermarkable(r, "__rts").withWatermark("__rts", watermark)
    cond = (
        (l["__k"] == r["__k"])
        & (r["__rts"] >= l["__lts"])
        & (r["__rts"] < l["__lts"] + F.expr(f"INTERVAL {interval}"))
    )
    joined = l.join(r, cond, how)
    return joined.select(
        l["__k"].alias(key),
        F.col("__lts").alias(left_ts),
        F.col("__rts").alias(f"r_{right_ts}"),
        *[c for c in joined.columns if c not in ("__k", "__lts", "__rts")],
    )


def sliding_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str = "30 minutes",
    watermark: str = "2 hours",
    ts_column: str = "ts",
) -> DataFrame:
    """Sliding (hopping) window counts — each event contributes to
    window/slide overlapping windows (Spark expands the membership
    natively inside WindowExec; no manual explode).  Same
    batch/stream-agnostic contract as windowed_event_counts."""
    df = events
    if df.isStreaming:
        df = _watermarkable(df, ts_column).withWatermark(ts_column, watermark)
    return (
        df.groupBy(F.window(F.col(ts_column), window_duration, slide_duration),
                   F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("window.start").alias("window_start"),
                "event_type", "n_events", "sum_value")
    )


def stream_hll_sketch_sink(
    stream_df,
    path: str,
    group_column: str,
    value_column: str,
    checkpoint: str,
    n_shards: int = 16,
    lgk: int = 14,
    trigger_available_now: bool = True,
    keep_versions: int = 2,
):
    """Streaming cardinality telemetry: each micro-batch's values fold
    into a PERSISTED HLL sketch table (one sketch per (group, shard)),
    so "distinct users/urls/docs so far" is answerable any time from a
    few KB per group — without ever rescanning the stream's history.

    Per epoch: build the batch's shard sketches (map-side partial agg,
    operators/sketches.py:hll_shard_sketches), union-merge them with the
    current sketch table (register-max: ``hll_union_agg``), write the
    merged table to a fresh version dir, atomically repoint ``_LATEST``.

    Exactly-once WITHOUT epoch bookkeeping: HLL union is idempotent —
    a replayed epoch re-merges the identical sketch and the register
    maxima are unchanged — so crash/replay can only converge to the
    same registers.  Each attempt writes a UNIQUE dir (never in-place
    over the version it read); stale versions beyond ``keep_versions``
    are pruned after the pointer moves.

    At scale the sketch table stays n_groups * n_shards rows regardless
    of stream volume; the per-epoch cost is O(batch + sketch table).
    """
    sink = hll_sketch_sink_fn(path, group_column, value_column,
                              n_shards=n_shards, lgk=lgk,
                              keep_versions=keep_versions)
    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_latest_version(spark: SparkSession, path: str):
    """The DataFrame behind ``path/_LATEST`` — None when no version has
    been published yet.  Shared by the versioned foreachBatch sinks."""
    import os

    ptr = os.path.join(path, "_LATEST")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        cur = fh.read().strip()
    return spark.read.parquet(os.path.join(path, cur))


def _publish_version(df: DataFrame, path: str, epoch_id,
                     keep_versions: int, partition_by: str | None = None):
    """Write ``df`` to a UNIQUE version dir, atomically repoint
    ``_LATEST``, prune stale versions.  Each attempt writes fresh —
    never in place over the version it read — so a crashed publish
    leaves the previous pointer intact."""
    import os
    import shutil
    import uuid

    ptr = os.path.join(path, "_LATEST")
    vdir = f"v-{int(epoch_id):08d}-{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if partition_by is not None:
        w = w.partitionBy(partition_by)
    w.parquet(os.path.join(path, vdir))
    tmp = ptr + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        fh.write(vdir)
    os.replace(tmp, ptr)
    vers = sorted(d for d in os.listdir(path) if d.startswith("v-"))
    for stale in vers[:-keep_versions]:
        if stale != vdir:
            shutil.rmtree(os.path.join(path, stale), ignore_errors=True)


def hll_sketch_sink_fn(path: str, group_column: str, value_column: str,
                       n_shards: int = 16, lgk: int = 14,
                       keep_versions: int = 2):
    """The foreachBatch body behind :func:`stream_hll_sketch_sink`,
    exposed so the replay path is directly testable (call it twice with
    the same batch: registers must not move)."""
    from geoparquet_io_spark.operators.sketches import hll_shard_sketches

    def sink(batch_df, epoch_id):
        sk = hll_shard_sketches(batch_df, group_column, value_column,
                                n_shards=n_shards, lgk=lgk)
        prev = _read_latest_version(batch_df.sparkSession, path)
        if prev is not None:
            merged = (prev.unionByName(sk)
                      .groupBy(group_column, "shard")
                      .agg(F.hll_union_agg(F.col("sketch")).alias("sketch")))
        else:
            merged = sk
        _publish_version(merged, path, epoch_id, keep_versions)

    return sink


def read_hll_sketches(spark: SparkSession, path: str) -> DataFrame:
    """The persisted sketch table behind ``stream_hll_sketch_sink``
    (feed to operators/sketches.py:hll_rollup for estimates)."""
    df = _read_latest_version(spark, path)
    if df is None:
        raise FileNotFoundError(f"no published version under {path!r}")
    return df


# ---------------------------------------------------------------------------
# Streaming semantic-dedup ingest (r6): each micro-batch dedups against
# the PERSISTED kept-set and its survivors are absorbed into it
# ---------------------------------------------------------------------------

def semantic_dedup_sink_fn(path: str, centroids, id_column: str = "vec_id",
                           vector_column: str = "embedding",
                           threshold: float = 0.95,
                           max_cluster_size: int | None = 10_000,
                           keep_versions: int = 2):
    """The foreachBatch body behind :func:`stream_semantic_dedup_sink`,
    exposed so replay is directly testable.

    Per epoch: read the current kept-set version, run
    ``semantic_dedup_incremental`` (operators/similarity.py) on the
    batch, append the batch's SURVIVORS to the kept-set, write a fresh
    version dir partitioned by cluster, atomically repoint ``_LATEST``.

    Exactly-once without epoch bookkeeping: absorption is idempotent —
    a replayed batch finds each of its own survivors already in the
    index at cosine exactly 1.0 and keeps nothing new, so crash/replay
    converges to the same kept-set (same argument as the HLL sink's
    register-max merge).  Each attempt writes a UNIQUE dir; stale
    versions beyond ``keep_versions`` are pruned after the pointer
    moves.
    """
    from geoparquet_io_spark.operators.similarity import \
        semantic_dedup_incremental

    def sink(batch_df, epoch_id):
        spark = batch_df.sparkSession
        src = batch_df.select(id_column, vector_column)
        prior = _read_latest_version(spark, path)
        index = (prior.select(id_column, vector_column) if prior is not None
                 else spark.createDataFrame([], src.schema))
        flags = semantic_dedup_incremental(
            src, index, centroids, id_column, vector_column,
            threshold=threshold, max_cluster_size=max_cluster_size)
        survivors = (src.join(flags.filter("kept"), id_column, "left_semi")
                     .join(flags.select(id_column, "cluster"), id_column))
        # prior rows keep the cluster they were stored under (the hive
        # partition column reads back as a data column)
        full = (prior.unionByName(survivors).dropDuplicates([id_column])
                if prior is not None else survivors)
        _publish_version(full, path, epoch_id, keep_versions,
                         partition_by="cluster")

    return sink


def stream_semantic_dedup_sink(stream_df, path: str, centroids,
                               checkpoint: str, id_column: str = "vec_id",
                               vector_column: str = "embedding",
                               threshold: float = 0.95,
                               max_cluster_size: int | None = 10_000,
                               trigger_available_now: bool = True,
                               keep_versions: int = 2):
    """Streaming semantic-dedup ingest: micro-batches of embeddings are
    deduplicated against the persisted kept-set (never recomputing it)
    and their survivors absorbed — the continuous version of the
    batch ``semantic_dedup_incremental`` pipeline."""
    sink = semantic_dedup_sink_fn(path, centroids, id_column,
                                  vector_column, threshold,
                                  max_cluster_size, keep_versions)
    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_semantic_index(spark: SparkSession, path: str) -> DataFrame:
    """The persisted kept-set behind ``stream_semantic_dedup_sink``."""
    df = _read_latest_version(spark, path)
    if df is None:
        raise FileNotFoundError(f"no published version under {path!r}")
    return df
