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
    """File-source stream over a directory of event parquet files.
    ``schema=None`` infers it from the files already present (Spark's
    file streaming source requires an explicit schema unless
    ``spark.sql.streaming.schemaInference`` is enabled, so a bare None
    would raise immediately)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


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
    # cast on BOTH branches: stream and batch outputs of an agnostic
    # transformation must carry the same column types, or a batch
    # backfill appended to the stream's sink writes conflicting parquet
    # timestamp annotations
    df = _watermarkable(events, ts_column)
    if df.isStreaming:
        df = df.withWatermark(ts_column, watermark)
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
    ev = _watermarkable(events, ts_column)   # type parity with batch
    if ev.isStreaming:
        return ev.withWatermark(ts_column, watermark) \
            .dropDuplicatesWithinWatermark(key_columns)
    return ev.dropDuplicates(key_columns)


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_column: str = "ts",
    user_column: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per user (session_window — native stateful op).
    ``watermark`` controls late-data tolerance independently of the
    session ``gap`` (default: the gap itself — short sessions with a
    long late-arrival allowance need an explicit watermark)."""
    df = _watermarkable(events, ts_column)   # type parity with batch
    if df.isStreaming:
        df = df.withWatermark(ts_column, watermark or gap)
    return (
        df.groupBy(F.session_window(F.col(ts_column), gap), F.col(user_column))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            user_column, "n_events", "sum_value",
        )
    )


def _start(stream_df, sink, checkpoint: str,
           trigger_available_now: bool):
    """Shared foreachBatch launch (one place for checkpoint/trigger
    wiring across all sinks)."""
    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
    sink = geoparquet_stream_sink_fn(path, geo, **write_kwargs)
    return _start(stream_df, sink, checkpoint, trigger_available_now)


def geoparquet_stream_sink_fn(path: str, geo, **write_kwargs):
    """The foreachBatch body behind :func:`write_geoparquet_stream`,
    exposed so the crash-replay path is directly testable (a replayed
    epoch of an already-committed snapshot must be a complete no-op —
    in particular it must NOT rewrite the epoch directory the committed
    snapshot references)."""
    from geoparquet_io_spark.sources.geoparquet import write as _write

    snapshot = write_kwargs.pop("snapshot", False)
    # reject kwargs the sink itself owns AT CONSTRUCTION, not as a
    # TypeError on the first micro-batch: overwrite in particular is
    # forced True per-epoch (idempotent epoch-dir replace) — passing
    # overwrite=False to get "append semantics" would otherwise kill
    # the query at batch 0 with a confusing multiple-values error
    owned = {"overwrite", "path", "geo"} & set(write_kwargs)
    if owned:
        raise ValueError(
            f"geoparquet stream sink owns {sorted(owned)}: epoch dirs "
            "are always overwrite=True (idempotent replay); pass "
            "snapshot/compression/etc. only")

    def sink(batch_df, epoch_id):
        prior = None
        if snapshot:
            from geoparquet_io_spark.operators.maintenance import (
                _snapshot_history_shared,
                commit_snapshot,
            )

            # replay check BEFORE touching the epoch directory: if this
            # epoch already committed (crash after commit, before the
            # checkpoint offset landed), rewriting the dir would delete
            # the exact uuid-named files the committed snapshot
            # references — permanently wedging the stream.  Already
            # committed -> the whole sink is a no-op.
            # shared (uncopied) read: this runs EVERY micro-batch and
            # only inspects records — copying V versions x F files of
            # membership per 2-row batch is the hot-path cost the parse
            # cache exists to avoid (r9 review)
            hist = _snapshot_history_shared(path)
            if any(h.get("epoch_id") == int(epoch_id) for h in hist):
                return
            # second guard: a CONCURRENT committer (files=None membership
            # sweep — compaction, maintenance) may have committed this
            # epoch's files WITHOUT the epoch_id marker.  If any snapshot
            # references a file inside this epoch dir, rewriting the dir
            # would delete committed data — same no-op rule.
            import os as _os

            pfx = f"epoch={int(epoch_id)}" + _os.sep
            pfx_alt = f"epoch={int(epoch_id)}/"
            for h in hist:
                for r in h.get("files", []) + h.get("delete_files", []):
                    if r["file"].startswith((pfx, pfx_alt)):
                        return
            prior = hist[-1] if hist else None
        # overwrite=True makes the epoch write idempotent: a retried epoch
        # (same epoch_id after a failure BEFORE its commit) replaces its
        # own directory instead of appending duplicate uuid-named files —
        # preserving the exactly-once guarantee of checkpointed
        # foreachBatch
        _write(batch_df, f"{path}/epoch={epoch_id}", geo,
               overwrite=True, **write_kwargs)
        if snapshot:
            # every micro-batch lands as a committed, time-travelable
            # version: readers pin a snapshot and never see a half-written
            # epoch; the snapshot history is the ingest audit trail.
            # files=None: membership (prior snapshot + never-referenced
            # new files == this epoch's dir) is RE-DERIVED from fresh
            # history on every optimistic-commit attempt, so a concurrent
            # committer (compaction, maintenance) that wins the race is
            # honored instead of silently overwritten (the lost-update
            # class a fixed files= list reintroduces).  Prior footer
            # stats are REUSED (reuse= — a size+mtime-validated cache,
            # safe even if stale) so per-batch cost is O(this epoch),
            # not O(all files ever).
            commit_snapshot(batch_df.sparkSession, path,
                            files=None,
                            note=f"epoch={epoch_id}",
                            epoch_id=int(epoch_id), reuse=prior)

    return sink


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
    # the output prefixes right payload columns with r_ and uses
    # __k/__lts/__rts internally — collisions would either raise an
    # AMBIGUOUS_REFERENCE deep in the final select or silently drop a
    # user column; fail upfront with names (r8 review)
    reserved = {"__k", "__lts", "__rts"}
    bad = sorted(reserved.intersection(left.columns)
                 | reserved.intersection(right.columns))
    clash = sorted(
        set(left.columns) & {f"r_{c}" for c in right.columns
                             if c not in (key, right_ts)})
    if bad or clash:
        raise ValueError(
            "stream_stream_join reserves __k/__lts/__rts and prefixes "
            f"right payload columns with r_: rename {bad + clash} on "
            "the input(s)")
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
    l = _watermarkable(l, "__lts")   # type parity with batch
    r = _watermarkable(r, "__rts")
    if left.isStreaming:
        l = l.withWatermark("__lts", watermark)
    if right.isStreaming:
        r = r.withWatermark("__rts", watermark)
    cond = (
        (l["__k"] == r["__k"])
        & (r["__rts"] >= l["__lts"])
        & (r["__rts"] < l["__lts"] + F.expr(f"INTERVAL {interval}"))
    )
    joined = l.join(r, cond, how)
    # outer joins: an unmatched row has NULLs on the other side, so the
    # key must coalesce across sides or every unmatched right row lands
    # in one NULL key group downstream
    key_out = F.coalesce(l["__k"], r["__k"]) if how != "inner" else l["__k"]
    return joined.select(
        key_out.alias(key),
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
    df = _watermarkable(events, ts_column)   # type parity with batch
    if df.isStreaming:
        df = df.withWatermark(ts_column, watermark)
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
    return _start(stream_df, sink, checkpoint, trigger_available_now)


def _latest_version_dirs(path: str) -> list[str]:
    """Version dirs referenced by ``path/_LATEST`` (one per line — the
    delta-chain sinks list several), empty when nothing is published."""
    import os

    ptr = os.path.join(path, "_LATEST")
    if not os.path.exists(ptr):
        return []
    with open(ptr) as fh:
        return [ln.strip() for ln in fh if ln.strip()]


def _read_latest_version(spark: SparkSession, path: str):
    """The DataFrame behind ``path/_LATEST`` — None when no version has
    been published yet.  Shared by the versioned foreachBatch sinks;
    a multi-line pointer (delta chain) unions all listed dirs."""
    import os

    dirs = _latest_version_dirs(path)
    if not dirs:
        return None
    return spark.read.parquet(*[os.path.join(path, d) for d in dirs])


#: unreferenced version dirs younger than this are never pruned — an
#: in-flight reader's lazy DataFrame may still be scanning them (same
#: retention idea as vacuum's min_age grace window)
_PRUNE_MIN_AGE_SEC = 600


def _publish_version(df: DataFrame, path: str, epoch_id,
                     keep_versions: int,
                     base_dirs: list[str] | None = None):
    """Write ``df`` to a UNIQUE version dir, atomically repoint
    ``_LATEST``, prune stale versions.  Each attempt writes fresh —
    never in place over the version it read — so a crashed publish
    leaves the previous pointer intact.

    ``base_dirs``: delta-chain mode — the new pointer references these
    EXISTING dirs plus the new one (the append-only shape for sinks
    whose state grows with the stream, e.g. the semantic-dedup
    kept-set: per-epoch I/O stays O(batch), not O(index)).

    Pruning never touches a dir the new pointer references, keeps the
    ``keep_versions`` most recent unreferenced dirs for in-flight
    readers, and NEVER removes a dir younger than the grace window
    (a concurrent reader's pinned DataFrame may still scan it)."""
    import os
    import shutil
    import time
    import uuid

    ptr = os.path.join(path, "_LATEST")
    vdir = f"v-{int(epoch_id):08d}-{uuid.uuid4().hex[:8]}"
    out = os.path.join(path, vdir)
    df.write.mode("overwrite").parquet(out)
    if not any(f.endswith(".parquet")
               for _, _, fs in os.walk(out) for f in fs):
        # zero-row frame: Spark's writer leaves only _SUCCESS and a
        # data-file-less dir is unreadable (UNABLE_TO_INFER_SCHEMA) —
        # the pointer must never reference one.  Emit one schema-only
        # file (same fix class as sources/geoparquet.py's empty write).
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        pq.write_table(
            pa.Table.from_batches([], schema=to_arrow_schema(df.schema)),
            os.path.join(out, "part-00000-empty.parquet"))
    referenced = list(base_dirs or []) + [vdir]
    # dirs the OLD pointer referenced but the new one won't: their
    # prune clock must start at DEREFERENCE time, not write time — a
    # compaction dereferences arbitrarily old dirs, and an mtime-age
    # gate alone would delete them out from under a reader that grabbed
    # the previous pointer moments ago (r8 review)
    try:
        with open(ptr) as fh:
            old_ref = {ln.strip() for ln in fh if ln.strip()}
    except OSError:
        old_ref = set()
    tmp = ptr + f".tmp-{uuid.uuid4().hex[:8]}"
    try:
        with open(tmp, "w") as fh:
            fh.write("\n".join(referenced))
            # rename-without-fsync can leave an EMPTY pointer after a
            # power loss — which silently resets the persisted state
            # (prior=None) on restart
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, ptr)
        try:
            dfd = os.open(path, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass
    finally:
        # crash between write and replace must not leak tmp pointers
        # (the pruner only considers v-* dirs, so they'd pile up forever)
        if os.path.exists(tmp):
            os.unlink(tmp)
    ref = set(referenced)
    for gone in old_ref - ref:
        full = os.path.join(path, gone)
        try:
            os.utime(full, None)     # restart the grace clock
        except OSError:
            pass
    vers = sorted(d for d in os.listdir(path)
                  if d.startswith("v-") and d not in ref)
    now = time.time()
    for stale in vers[:-keep_versions] if keep_versions else vers:
        full = os.path.join(path, stale)
        try:
            age = now - os.path.getmtime(full)
        except OSError:
            continue
        if age >= _PRUNE_MIN_AGE_SEC:
            shutil.rmtree(full, ignore_errors=True)


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
                           keep_versions: int = 2,
                           compact_chain_length: int = 32):
    """The foreachBatch body behind :func:`stream_semantic_dedup_sink`,
    exposed so replay is directly testable.

    Per epoch: read the current kept-set (a DELTA CHAIN of version
    dirs), run ``semantic_dedup_incremental`` (operators/similarity.py)
    on the batch, and publish ONLY the batch's surviving rows as a new
    delta dir — the ``_LATEST`` pointer lists every live delta, so the
    kept-set is their union and per-epoch WRITE cost is O(batch), not
    O(index).  (The previous full-rewrite shape made lifetime sink I/O
    O(N^2) over the stream's life — a 100-row micro-batch against a
    10M-vector index re-wrote all 10M rows.)

    Exactly-once without epoch bookkeeping: absorption is idempotent —
    a replayed batch finds each of its own survivors already in the
    index at cosine exactly 1.0, keeps nothing new, and an empty
    survivor set publishes NOTHING, so crash/replay converges to the
    same kept-set.  A crash between delta write and pointer swap
    leaves an unreferenced dir the age-gated pruner removes later.
    """
    from geoparquet_io_spark.operators.similarity import \
        semantic_dedup_incremental

    def sink(batch_df, epoch_id):
        import os

        spark = batch_df.sparkSession
        # at-least-once upstreams can deliver the same row twice in ONE
        # micro-batch; duplicate ids corrupt the flags join both ways
        # (equal ids are not each other's intra-batch witness under the
        # strict id_a < id_b rule, so a doubled row fans out to 4
        # published rows — or, on the banded hot-cluster path, the
        # anti-join drops BOTH copies and a novel vector never enters
        # the index).  One id = one candidate row per epoch.
        src = batch_df.select(id_column, vector_column) \
            .dropDuplicates([id_column])
        # read _LATEST exactly ONCE and derive the prior frame from the
        # same dir list the new pointer will extend — a second read was
        # a TOCTOU window where a concurrent pointer move made the dedup
        # basis and the published chain disagree
        base = _latest_version_dirs(path)
        prior = (spark.read.parquet(*[os.path.join(path, d) for d in base])
                 if base else None)
        index = (prior.select(id_column, vector_column) if prior is not None
                 else spark.createDataFrame([], src.schema))
        flags = semantic_dedup_incremental(
            src, index, centroids, id_column, vector_column,
            threshold=threshold, max_cluster_size=max_cluster_size)
        # one inner join on the kept-filtered flags: survivors + cluster
        # (a left_semi on kept followed by a cluster join re-shuffled the
        # same rows twice for the identical result)
        survivors = src.join(
            flags.filter("kept").select(id_column, "cluster"), id_column)
        if prior is not None:
            # an id re-sent with a changed, non-matching embedding must
            # not appear twice in the chain (the full-rewrite shape
            # deduped by id; the delta shape anti-joins instead)
            survivors = survivors.join(prior.select(id_column),
                                       id_column, "left_anti")
        survivors = survivors.localCheckpoint(eager=True)
        if survivors.limit(1).count() == 0:
            # kept-set unchanged (replayed epoch, or an all-deduped /
            # empty FIRST batch): publish nothing.  Publishing a
            # schema-only delta here would ride in every later pointer
            # forever; readers already handle the no-version-yet state
            # (read_semantic_index raises FileNotFoundError exactly as
            # before any batch ran).
            return
        if prior is not None and len(base) + 1 > compact_chain_length:
            # LSM-style compaction: past the cap, publish the FULL union
            # as one dir instead of appending — otherwise the chain (and
            # every read's file listing) grows one dir per epoch forever.
            # Amortized extra write cost: O(index / compact_chain_length)
            # per epoch.
            _publish_version(prior.unionByName(survivors), path, epoch_id,
                             keep_versions)
        else:
            _publish_version(survivors, path, epoch_id, keep_versions,
                             base_dirs=base)

    return sink


def stream_semantic_dedup_sink(stream_df, path: str, centroids,
                               checkpoint: str, id_column: str = "vec_id",
                               vector_column: str = "embedding",
                               threshold: float = 0.95,
                               max_cluster_size: int | None = 10_000,
                               trigger_available_now: bool = True,
                               keep_versions: int = 2,
                               compact_chain_length: int = 32):
    """Streaming semantic-dedup ingest: micro-batches of embeddings are
    deduplicated against the persisted kept-set (never recomputing it)
    and their survivors absorbed — the continuous version of the
    batch ``semantic_dedup_incremental`` pipeline."""
    sink = semantic_dedup_sink_fn(path, centroids, id_column,
                                  vector_column, threshold,
                                  max_cluster_size, keep_versions,
                                  compact_chain_length)
    return _start(stream_df, sink, checkpoint, trigger_available_now)


def read_semantic_index(spark: SparkSession, path: str) -> DataFrame:
    """The persisted kept-set behind ``stream_semantic_dedup_sink``."""
    df = _read_latest_version(spark, path)
    if df is None:
        raise FileNotFoundError(f"no published version under {path!r}")
    return df
