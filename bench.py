"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Every query is forced through the noop sink so projections and UDF
columns are fully evaluated (a bare count() would let Spark prune them).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: relational aggs/joins + geometry pipeline + scale ops
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue",
    "extract_where_columns",
    "geo_bbox_fast_path",
    "geo_hilbert_key",
    "geo_quadkey_z6",
    "geo_spatial_join",
    "geo_reproject_mercator",
    "geo_kdtree_cells",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "similarity_cosine_topk",
    "text_quality",
    "stream_window_counts",
    "geo_h3_res0",
    "geo_h3_res9_full",
    "geo_reproject_albers",
    "text_bm25_topk",
    "semantic_dedup",
    "graph_pagerank",
    "geo_distance_join",
    "geo_knn_join",
    # round-3 continuation-2 additions
    "text_dup_spans",
    "similarity_ivf_index_search",
    "join_fuzzy_names",
    "events_funnel",
    "geo_dissolve_hull",
    # round-4 additions
    "stats_heavy_hitters_sketch",
    "text_bpe_merges_batched",
    "raster_zonal_stats",
    "graph_triangles",
    "multimodal_image_near_dup",
    "sort_zorder_multicolumn",
    # round-5 additions
    "convert_fgb_roundtrip",
    "geo_clip_to_grid",
    "dataset_zone_map_prune",
    "multimodal_flac_features",
    "kmeans_train_model",
    "similarity_ivf_recall",
]

# regression thresholds vs the committed bench_baseline.json
# (reference: benchmarks/config.py:9-19 — warn >10%, fail >25%)
WARN_PCT = 10.0
FAIL_PCT = 25.0
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def check_regressions(timings: dict[str, float]) -> dict:
    """Compare a run against the committed baseline.  Returns
    {"warn": {...}, "fail": {...}} of per-query slowdown percentages."""
    if not os.path.exists(BASELINE_FILE):
        return {"warn": {}, "fail": {}}
    doc = json.load(open(BASELINE_FILE))
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    def _norm(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return str(v)

    if _norm(doc.get("sf")) != _norm(sf):
        # baseline recorded at a different scale factor: not comparable
        return {"warn": {}, "fail": {}, "skipped": f"baseline sf={doc.get('sf')}"}
    base = doc.get("queries", {})
    warn: dict[str, float] = {}
    fail: dict[str, float] = {}
    for name, sec in timings.items():
        b = base.get(name)
        if not b:
            continue
        pct = (sec - b) / b * 100.0
        if pct > FAIL_PCT:
            fail[name] = round(pct, 1)
        elif pct > WARN_PCT:
            warn[name] = round(pct, 1)
    return {"warn": warn, "fail": fail}


def _wait_for_quiet(max_load1: float = 0.8,
                    timeout_s: int = 300, poll_s: int = 10):
    """Host-contention guard: 1-2s queries flap 20-40% on a loaded host
    (NOTES_r3; r4/r5 both showed +20-29% drift across ~10 queries with
    zero code changes at load1 1.7).  The old per-CPU threshold
    (load1/ncpu <= 0.5) passed trivially on a 32-core host — an
    ABSOLUTE load1 gate is what actually predicts the flap, because the
    noise hits the single-stage sub-second queries whose one or two
    tasks lose the core lottery.  Wait (bounded) for load1 <=
    ``max_load1``.  Never refuses outright — a noisy number beats a
    missing one — but the observed load and wait are recorded in the
    output JSON so a contended run is visible to the reader."""
    try:
        # SPARK_GRAFT_BENCH_MAX_LOAD1 is ABSOLUTE load1.  The legacy
        # SPARK_GRAFT_BENCH_MAX_LOAD meant load1 PER CPU; reinterpreting
        # it silently would make an old 0.5 unreachable on a busy host,
        # so it is honored with its original per-CPU meaning + a note.
        if "SPARK_GRAFT_BENCH_MAX_LOAD1" in os.environ:
            limit = float(os.environ["SPARK_GRAFT_BENCH_MAX_LOAD1"])
        elif "SPARK_GRAFT_BENCH_MAX_LOAD" in os.environ:
            limit = float(os.environ["SPARK_GRAFT_BENCH_MAX_LOAD"]) \
                * (os.cpu_count() or 1)
            print("note: SPARK_GRAFT_BENCH_MAX_LOAD is per-CPU (legacy); "
                  "use SPARK_GRAFT_BENCH_MAX_LOAD1 for an absolute gate",
                  file=sys.stderr)
        else:
            limit = max_load1
        waited = 0
        while waited < timeout_s:
            if os.getloadavg()[0] <= limit:
                break
            time.sleep(poll_s)
            waited += poll_s
        return round(os.getloadavg()[0], 2), waited
    except OSError:  # getloadavg unavailable (non-unix)
        return None, 0


def main() -> None:
    load1, waited = _wait_for_quiet()

    from geoparquet_io_spark.session import get_spark
    from geoparquet_io_spark.queries import REGISTRY

    spark = get_spark("bench")
    # Warm the paths every timed query exercises, so the FIRST query
    # doesn't absorb one-time JVM/codegen/worker init (~0.5s observed on
    # tpch_q1): parquet scan + whole-stage codegen + shuffle, the Python
    # worker pool (Arrow batch path), and the noop sink.
    from pyspark.sql import functions as F

    warm = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    warm.groupBy("n_regionkey").count().write.format("noop") \
        .mode("overwrite").save()

    def _warm_udf(batches):
        for b in batches:
            yield b

    warm.limit(8).mapInPandas(_warm_udf, warm.schema).write \
        .format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        fn = REGISTRY[name][0]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # the reference's published 3-op pipeline (extract -> add bbox ->
    # hilbert sort -> write), BASELINE.md: 34s CLI / 16s piped / 7s API at
    # 400k rows.  Ours runs it lazily end-to-end including the write.
    import tempfile

    from geoparquet_io_spark.queries import _events_points

    t0 = time.perf_counter()
    gt = _events_points(spark, SF_DIR)
    out_path = tempfile.mkdtemp(prefix="bench_3op_") + "/out.parquet"
    gt.extract(bbox=(-150, -75, 150, 75)).sort_hilbert().write(out_path)
    timings["pipeline_3op_write"] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load1_at_start": load1,
        "waited_for_quiet_sec": waited,
    }
    if "--check" in sys.argv:
        reg = check_regressions(timings)
        out["regressions"] = reg
        for name, pct in reg["warn"].items():
            print(f"WARN {name} {pct:+.1f}% vs baseline", file=sys.stderr)
        for name, pct in reg["fail"].items():
            print(f"FAIL {name} {pct:+.1f}% vs baseline", file=sys.stderr)
        print(json.dumps(out))
        spark.stop()
        sys.exit(1 if reg["fail"] else 0)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
