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


def test_ivf_recall_vs_brute_force(spark):
    """IVF probes must recover most true neighbours (recall sanity)."""
    from geoparquet_io_spark.operators.similarity import brute_force_topk, ivf_topk
    from geoparquet_io_spark.testsupport.tables import load_table
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(e, q, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ivf_topk(e, q, dim=64, k=3, n_centroids=8, nprobe=8).collect()}
    # nprobe == n_centroids probes everything -> recall must be 1.0
    assert approx == exact


def test_streaming_geoparquet_sink(spark, events_dir, tmp_path):
    """foreachBatch sink writes GeoParquet WITH footer geo metadata from a
    stream; read back equals the batch input."""
    import pyarrow.parquet as pq

    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.streaming.events import (
        read_events_stream, write_geoparquet_stream,
    )

    batch_df = spark.read.parquet(events_dir)
    stream = read_events_stream(spark, events_dir, schema=batch_df.schema)
    geo = GeoMeta(columns={"geometry": GeoColumnMeta()})
    out = str(tmp_path / "stream_out")
    q = write_geoparquet_stream(
        stream, out, geo, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    import glob

    files = glob.glob(f"{out}/**/*.parquet", recursive=True)
    assert files
    assert all(b"geo" in pq.read_schema(f).metadata for f in files)
    back = spark.read.option("recursiveFileLookup", "true").parquet(out)
    assert back.count() == batch_df.count()


def test_stream_hll_sketch_sink_equals_batch(spark, events_dir, tmp_path):
    """Incremental per-micro-batch sketch merging must land on the SAME
    registers as one batch-built sketch table (HLL union is exact
    register-max), so the estimates agree exactly."""
    from geoparquet_io_spark.operators.sketches import (hll_rollup,
                                                        hll_shard_sketches)
    from geoparquet_io_spark.streaming.events import (read_hll_sketches,
                                                      stream_hll_sketch_sink)

    batch_df = spark.read.parquet(events_dir)
    expected = {r["event_type"]: r["approx_distinct"]
                for r in hll_rollup(
                    hll_shard_sketches(batch_df, "event_type", "user_id"),
                    "event_type").collect()}

    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1)      # force >1 micro-batch
              .parquet(events_dir))
    path = str(tmp_path / "sketches")
    q = stream_hll_sketch_sink(
        stream, path, "event_type", "user_id",
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {r["event_type"]: r["approx_distinct"]
           for r in hll_rollup(read_hll_sketches(spark, path),
                               "event_type").collect()}
    assert got == expected and len(got) > 0


def test_stream_hll_sink_replay_idempotent(spark, events_dir, tmp_path):
    """A replayed epoch (same batch folded twice) must not change the
    registers — the property the exactly-once story rests on."""
    import os

    from geoparquet_io_spark.operators.sketches import hll_rollup
    from geoparquet_io_spark.streaming.events import (hll_sketch_sink_fn,
                                                      read_hll_sketches)

    batch_df = spark.read.parquet(events_dir)
    path = str(tmp_path / "sk")
    os.makedirs(path, exist_ok=True)
    # drive the foreachBatch body directly, simulating a crash-replay
    sink = hll_sketch_sink_fn(path, "event_type", "user_id")
    sink(batch_df, 0)
    first = {r["event_type"]: r["approx_distinct"]
             for r in hll_rollup(read_hll_sketches(spark, path),
                                 "event_type").collect()}
    sink(batch_df, 0)        # replay of the same epoch
    again = {r["event_type"]: r["approx_distinct"]
             for r in hll_rollup(read_hll_sketches(spark, path),
                                 "event_type").collect()}
    assert first == again and len(first) > 0


def test_stream_semantic_dedup_sink_absorbs_and_replays(spark, tmp_path):
    """Streaming semantic-dedup ingest: batch 1's survivors are
    absorbed into the persisted kept-set; batch 2's near-dups of them
    are dropped; replaying an absorbed batch changes nothing (each of
    its survivors is already in the index at cosine 1.0)."""
    import os

    from geoparquet_io_spark.streaming.events import (
        read_semantic_index, semantic_dedup_sink_fn)

    cents = [[1.0, 0.0], [0.0, 1.0]]
    path = str(tmp_path / "semidx")
    os.makedirs(path, exist_ok=True)
    sink = semantic_dedup_sink_fn(path, cents, threshold=0.99)

    b1 = spark.createDataFrame(
        [(1, [1.0, 0.001]), (2, [1.0, 0.002]),      # mutual dups -> keep 1
         (3, [0.0, 1.0])],                          # distinct -> keep
        ["vec_id", "embedding"])
    sink(b1, 0)
    idx1 = {r["vec_id"] for r in read_semantic_index(spark, path).collect()}
    assert idx1 == {1, 3}

    b2 = spark.createDataFrame(
        [(10, [1.0, 0.003]),                        # dup of absorbed 1
         (11, [0.0, -1.0])],                        # new direction
        ["vec_id", "embedding"])
    sink(b2, 1)
    idx2 = {r["vec_id"] for r in read_semantic_index(spark, path).collect()}
    assert idx2 == {1, 3, 11}

    sink(b2, 1)                                     # crash-replay epoch 1
    idx3 = {r["vec_id"] for r in read_semantic_index(spark, path).collect()}
    assert idx3 == idx2
    # cluster partition column survives the round trip
    cols = set(read_semantic_index(spark, path).columns)
    assert {"vec_id", "embedding", "cluster"} <= cols


def test_snapshot_sink_replay_is_noop(spark, events_dir, tmp_path):
    """Crash-replay of an already-committed epoch must be a complete
    no-op: the epoch directory the committed snapshot references must
    NOT be rewritten (rewriting deletes the exact uuid-named files the
    snapshot lists, wedging the stream)."""
    import glob
    import os

    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.operators.maintenance import (read_snapshot,
                                                           snapshot_history)
    from geoparquet_io_spark.streaming.events import geoparquet_stream_sink_fn

    batch_df = spark.read.parquet(events_dir)
    geo = GeoMeta(columns={"geometry": GeoColumnMeta()})
    out = str(tmp_path / "snapsink")
    os.makedirs(out, exist_ok=True)
    sink = geoparquet_stream_sink_fn(out, geo, snapshot=True)
    sink(batch_df, 0)
    hist1 = snapshot_history(out)
    assert len(hist1) == 1 and hist1[0]["epoch_id"] == 0
    files1 = sorted(glob.glob(f"{out}/epoch=0/*.parquet"))
    sink(batch_df, 0)  # crash-replay of the committed epoch
    assert sorted(glob.glob(f"{out}/epoch=0/*.parquet")) == files1, \
        "replay rewrote the epoch dir the committed snapshot references"
    assert len(snapshot_history(out)) == 1
    # the committed snapshot still reads
    assert read_snapshot(spark, out, 1).count() == batch_df.count()
    # a genuinely new epoch still commits incrementally
    sink(batch_df.limit(5), 1)
    hist2 = snapshot_history(out)
    assert len(hist2) == 2
    assert read_snapshot(spark, out, 2).count() == batch_df.count() + 5


def test_versioned_sink_empty_first_batch_readable(spark, tmp_path):
    """An empty first micro-batch must still publish a READABLE version
    (Spark's writer leaves a data-file-less dir for zero-row frames;
    the pointer must never reference one)."""
    import os

    from pyspark.sql import functions as F

    from geoparquet_io_spark.streaming.events import (hll_sketch_sink_fn,
                                                      read_hll_sketches)

    path = str(tmp_path / "sk_empty")
    os.makedirs(path, exist_ok=True)
    sink = hll_sketch_sink_fn(path, "event_type", "user_id")
    empty = (spark.createDataFrame([("a", 1)], ["event_type", "user_id"])
             .filter(F.lit(False)))
    sink(empty, 0)
    assert read_hll_sketches(spark, path).count() == 0  # readable, not a crash
    nonempty = spark.createDataFrame([("a", 1), ("a", 2), ("b", 1)],
                                     ["event_type", "user_id"])
    sink(nonempty, 1)
    assert read_hll_sketches(spark, path).count() > 0


def test_semantic_sink_publishes_deltas_not_rewrites(spark, tmp_path):
    """The kept-set is a delta CHAIN: an epoch publishes only its own
    survivors; prior delta dirs are referenced, not rewritten — per-epoch
    write cost stays O(batch) as the index grows."""
    import os

    from geoparquet_io_spark.streaming.events import (_latest_version_dirs,
                                                      read_semantic_index,
                                                      semantic_dedup_sink_fn)

    cents = [[1.0, 0.0], [0.0, 1.0]]
    path = str(tmp_path / "semdelta")
    os.makedirs(path, exist_ok=True)
    sink = semantic_dedup_sink_fn(path, cents, threshold=0.99)
    b1 = spark.createDataFrame([(1, [1.0, 0.001]), (3, [0.0, 1.0])],
                               ["vec_id", "embedding"])
    sink(b1, 0)
    dirs1 = _latest_version_dirs(path)
    assert len(dirs1) == 1
    mtimes1 = {d: os.path.getmtime(os.path.join(path, d)) for d in dirs1}
    b2 = spark.createDataFrame([(11, [0.0, -1.0])], ["vec_id", "embedding"])
    sink(b2, 1)
    dirs2 = _latest_version_dirs(path)
    assert len(dirs2) == 2 and dirs1[0] in dirs2  # chain, not rewrite
    assert os.path.getmtime(os.path.join(path, dirs1[0])) == mtimes1[dirs1[0]]
    assert {r["vec_id"] for r in read_semantic_index(spark, path).collect()} \
        == {1, 3, 11}
    sink(b2, 1)  # replay: survivors all self-match -> publish nothing
    assert _latest_version_dirs(path) == dirs2


@pytest.mark.slow
def test_semantic_sink_soak_bounded_and_matches_batch(spark, tmp_path,
                                                      monkeypatch):
    """Long-run soak of the streaming semantic-dedup sink (r6 verdict
    #6): over many micro-batches with a small compaction cap the chain
    length and on-disk dir count must stay BOUNDED (read amplification
    = chain length), and the final kept-set must be byte-identical to a
    batch semantic_dedup recompute over everything ever ingested.

    Ids ascend with epochs so the batch lowest-id survivor rule and the
    incremental first-absorbed rule provably agree; every duplicate
    group is a tight mutual-dup mass (no chains, where the two rules
    legitimately diverge)."""
    import math
    import os

    from geoparquet_io_spark.operators.similarity import semantic_dedup
    from geoparquet_io_spark.streaming import events as EV

    monkeypatch.setattr(EV, "_PRUNE_MIN_AGE_SEC", 0)  # age gate off: prune NOW
    cents = [[1.0, 0.0], [0.0, 1.0]]
    path = str(tmp_path / "semsoak")
    os.makedirs(path, exist_ok=True)
    CAP = 4
    sink = EV.semantic_dedup_sink_fn(path, cents, threshold=0.99,
                                     keep_versions=2,
                                     compact_chain_length=CAP)

    def vec(angle_deg, jitter=0.0):
        a = math.radians(angle_deg + jitter)
        return [math.cos(a), math.sin(a)]

    N_EPOCHS, N_DIRS = 60, 24          # epochs 24.. repeat earlier angles
    all_rows = []
    for e in range(N_EPOCHS):
        if e == 15:
            # mid-soak RESTART (r7 verdict #6): a fresh sink fn must
            # resume from the on-disk chain alone — any hidden
            # in-memory state would desync the kept-set after a real
            # stream restart
            sink = EV.semantic_dedup_sink_fn(path, cents, threshold=0.99,
                                             keep_versions=2,
                                             compact_chain_length=CAP)
        # +3 deg offset keeps every pair clear of the 45/225 deg cluster
        # boundary: a pair straddling it is assigned to DIFFERENT
        # clusters and SemDeDup (by design) never dedups across clusters
        ang = 3.0 + 15.0 * (e % N_DIRS)
        rows = [(10 * e, vec(ang)),          # group survivor (lowest id)
                (10 * e + 1, vec(ang, 0.1))]  # intra-batch near-dup
        all_rows += rows
        sink(spark.createDataFrame(rows, ["vec_id", "embedding"]), e)
        chain = EV._latest_version_dirs(path)
        assert len(chain) <= CAP, f"epoch {e}: chain {len(chain)} > {CAP}"
        on_disk = [d for d in os.listdir(path) if d.startswith("v-")]
        assert len(on_disk) <= CAP + 2, \
            f"epoch {e}: {len(on_disk)} dirs on disk (unbounded growth)"

    got = sorted(
        (r["vec_id"], tuple(r["embedding"]))
        for r in EV.read_semantic_index(spark, path)
        .select("vec_id", "embedding").collect())
    expected_ids = {10 * e for e in range(N_DIRS)}
    assert {i for i, _ in got} == expected_ids
    # byte-identical to the batch recompute over the full ingest history
    corpus = spark.createDataFrame(all_rows, ["vec_id", "embedding"])
    batch = semantic_dedup(corpus, cents, threshold=0.99)
    want = sorted(
        (r["vec_id"], tuple(r["embedding"]))
        for r in corpus.join(batch.filter("kept").select("vec_id"),
                             "vec_id").collect())
    assert got == want


def test_publish_version_no_tmp_leak_on_crash(spark, tmp_path, monkeypatch):
    """A crash between tmp-pointer write and rename must not leave
    _LATEST.tmp-* orphans (the pruner never looks at them)."""
    import os

    from geoparquet_io_spark.streaming import events as E

    path = str(tmp_path / "vsink")
    os.makedirs(path)
    df = spark.createDataFrame([(1,)], "id long")
    def boom(src, dst):
        raise OSError("disk full")

    monkeypatch.setattr("os.replace", boom)
    import pytest as _p
    with _p.raises(OSError):
        E._publish_version(df, path, 0, keep_versions=2)
    monkeypatch.undo()
    leftovers = [f for f in os.listdir(path) if f.startswith("_LATEST.tmp")]
    assert leftovers == []


def test_semantic_sink_compacts_chain(spark, tmp_path):
    """Past compact_chain_length the delta chain collapses to ONE dir,
    with the kept-set unchanged."""
    import os

    from geoparquet_io_spark.streaming.events import (
        _latest_version_dirs,
        read_semantic_index,
        semantic_dedup_sink_fn,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    path = str(tmp_path / "semidx2")
    os.makedirs(path)
    sink = semantic_dedup_sink_fn(path, cents, threshold=0.999,
                                  compact_chain_length=3)
    # 4 distinct-direction batches: epochs 0-2 append deltas, epoch 3
    # triggers compaction (chain would reach 4 > 3)
    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, -1.0]]
    for e, v in enumerate(vecs):
        sink(spark.createDataFrame([(e, v)], ["vec_id", "embedding"]), e)
    assert len(_latest_version_dirs(path)) == 1      # compacted
    idx = {r["vec_id"] for r in read_semantic_index(spark, path).collect()}
    assert idx == {0, 1, 2, 3}


def test_snapshot_sink_skips_epoch_swept_by_concurrent_committer(
        spark, events_dir, tmp_path):
    """If a concurrent commit_snapshot(files=None) swept a crashed
    epoch's files into a snapshot (no epoch_id marker), the replay must
    NOT rewrite the epoch dir — that would delete committed files."""
    import glob
    import os

    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.operators.maintenance import (
        commit_snapshot,
        read_snapshot,
        snapshot_history,
    )
    from geoparquet_io_spark.streaming.events import geoparquet_stream_sink_fn

    path = str(tmp_path / "snapsink")
    os.makedirs(path)
    geo = None
    sink = geoparquet_stream_sink_fn(path, geo, snapshot=True)
    batch = spark.read.parquet(events_dir).limit(5) \
        .select("event_id", "event_type")
    # simulate: epoch 0 wrote its dir but CRASHED before commit_snapshot
    from geoparquet_io_spark.sources.geoparquet import write as _w
    _w(batch, f"{path}/epoch=0", None, overwrite=True)
    files_before = sorted(glob.glob(f"{path}/epoch=0/*.parquet"))
    # concurrent maintenance commit sweeps everything (no epoch_id)
    commit_snapshot(spark, path, files=None, note="maintenance sweep")
    v = snapshot_history(path)[-1]["version"]
    # replay of epoch 0 must be a no-op
    sink(batch, 0)
    files_after = sorted(glob.glob(f"{path}/epoch=0/*.parquet"))
    assert files_after == files_before          # dir untouched
    assert read_snapshot(spark, path, v).count() == 5


def test_semantic_sink_duplicate_ids_in_one_batch(spark, tmp_path):
    """At-least-once upstreams can deliver the same row twice in ONE
    micro-batch (r8 review): duplicate ids must neither fan out to
    duplicated index rows nor be dropped entirely by the intra-batch
    anti-join — one id, one index row."""
    import os

    from geoparquet_io_spark.streaming.events import (read_semantic_index,
                                                      semantic_dedup_sink_fn)

    cents = [[1.0, 0.0], [0.0, 1.0]]
    path = str(tmp_path / "dupidx")
    os.makedirs(path, exist_ok=True)
    sink = semantic_dedup_sink_fn(path, cents, threshold=0.99)
    b = spark.createDataFrame(
        [(1, [1.0, 0.001]), (1, [1.0, 0.001]),       # exact duplicate row
         (2, [0.0, 1.0]), (2, [0.0, 1.0])],
        ["vec_id", "embedding"])
    sink(b, 0)
    rows = read_semantic_index(spark, path).collect()
    assert sorted(r["vec_id"] for r in rows) == [1, 2]   # once each
    # replay still converges
    sink(b, 0)
    rows2 = read_semantic_index(spark, path).collect()
    assert sorted(r["vec_id"] for r in rows2) == [1, 2]


def test_semantic_sink_empty_first_batch_publishes_nothing(spark, tmp_path):
    """An empty (or all-deduped-away) FIRST batch must not publish a
    junk schema-only delta that rides in every later pointer (r8
    review): the index stays in the no-version-yet state until real
    survivors exist."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from geoparquet_io_spark.streaming.events import (read_semantic_index,
                                                      semantic_dedup_sink_fn)

    cents = [[1.0, 0.0], [0.0, 1.0]]
    path = str(tmp_path / "emptyidx")
    os.makedirs(path, exist_ok=True)
    sink = semantic_dedup_sink_fn(path, cents, threshold=0.99)
    empty = spark.createDataFrame(
        [(1, [1.0, 0.0])], ["vec_id", "embedding"]).filter(F.lit(False))
    sink(empty, 0)
    assert not [d for d in os.listdir(path) if d.startswith("v-")]
    with pytest.raises(FileNotFoundError):
        read_semantic_index(spark, path)
    sink(spark.createDataFrame([(5, [1.0, 0.0])], ["vec_id", "embedding"]), 1)
    assert [r["vec_id"] for r in read_semantic_index(spark, path).collect()] \
        == [5]


def test_publish_version_grace_restarts_on_dereference(spark, tmp_path,
                                                       monkeypatch):
    """Compaction dereferences arbitrarily OLD delta dirs; their prune
    clock must restart at DEREFERENCE time (r8 review) — an mtime-age
    gate alone would delete them out from under a reader still scanning
    the previous pointer's list."""
    import os
    import time

    from geoparquet_io_spark.streaming import events as EV

    monkeypatch.setattr(EV, "_PRUNE_MIN_AGE_SEC", 9999)
    cents = [[1.0, 0.0], [0.0, 1.0]]
    path = str(tmp_path / "graceidx")
    os.makedirs(path, exist_ok=True)
    sink = EV.semantic_dedup_sink_fn(path, cents, threshold=0.99,
                                     keep_versions=0,
                                     compact_chain_length=2)
    import math

    def ingest(e):
        a = math.radians(3.0 + 20.0 * e)
        sink(spark.createDataFrame(
            [(e, [math.cos(a), math.sin(a)])], ["vec_id", "embedding"]), e)

    ingest(0)
    ingest(1)                          # chain now [v0, v1] (cap 2)
    pre = EV._latest_version_dirs(path)
    assert len(pre) == 2
    # make both referenced dirs ancient: without the dereference-time
    # grace restart, the compaction epoch would prune them instantly
    for d in pre:
        os.utime(os.path.join(path, d), (1.0, 1.0))
    ingest(2)                          # 2+1 > cap -> compaction epoch
    live = EV._latest_version_dirs(path)
    assert len(live) == 1              # pointer now ONE compacted dir
    on_disk = [d for d in os.listdir(path) if d.startswith("v-")]
    # the dereferenced ancient dirs survive (grace restarted) ...
    assert set(pre) <= set(on_disk)
    now = time.time()
    for d in pre:
        age = now - os.path.getmtime(os.path.join(path, d))
        assert age < 3600, (d, age)    # clock restarted at dereference


def test_stream_stream_join_rejects_colliding_columns(spark):
    """Reserved internals (__k/__lts/__rts) and r_-prefix collisions
    must fail upfront with names, not AMBIGUOUS_REFERENCE mid-plan or a
    silently dropped column (r8 review)."""
    import pytest

    from geoparquet_io_spark.streaming.events import stream_stream_join

    base = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 2.0)],
        "user_id long, ts string, value double")
    clash = base.withColumnRenamed("value", "r_other")
    other = base.withColumnRenamed("value", "other")
    with pytest.raises(ValueError, match="r_"):
        stream_stream_join(clash, other, key="user_id")
    resv = base.withColumnRenamed("value", "__k")
    with pytest.raises(ValueError, match="__k"):
        stream_stream_join(resv, other, key="user_id")


def test_geoparquet_stream_sink_rejects_owned_kwargs(tmp_path):
    """overwrite/path/geo in write_kwargs must be rejected at sink
    CONSTRUCTION, not surface as a TypeError killing the query at its
    first micro-batch (r8 review)."""
    import pytest

    from geoparquet_io_spark.streaming.events import geoparquet_stream_sink_fn

    with pytest.raises(ValueError, match="overwrite"):
        geoparquet_stream_sink_fn(str(tmp_path / "x"), None, overwrite=False)
