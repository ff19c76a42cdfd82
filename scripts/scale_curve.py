#!/usr/bin/env python
"""Strong-scaling measurement: the same registry queries at sf0.01,
sf0.1, and a synthetic 10x of sf0.1 ("sf1x"), reporting per-row cost so
sub/super-linear behavior is visible.

The sf1x dataset derives from the DRIVER-PROVIDED sf0.1 tables only
(TESTDATA.md): each scaled table unions 10 key-shifted copies, so join
integrity (orders->lineitem, customer->orders) is preserved and the
key-derived synthetic geometry stays valid but distinct per copy.
Document text is salted per copy (" cpN" suffix) so near-dup structure
scales linearly instead of exploding quadratically from 10 exact
clones.

Usage:
    python scripts/scale_curve.py            # measure, print JSON
    python scripts/scale_curve.py --md       # also rewrite SCALING.md
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTOR = 10
BASE = "/root/testdata/sf0.1"
SF1X = os.environ.get("SPARK_GRAFT_SF1X_DIR", "/tmp/sparkgraft_scale/sf1x")

# key shift per copy: far above any real key, keeps joins consistent
SHIFT = 10_000_000

SCALED = {
    "events": ("event_id", ["user_id"]),
    "documents": ("doc_id", []),
    "embeddings": ("vec_id", []),
    "customer": ("c_custkey", []),
    "orders": ("o_orderkey", ["o_custkey"]),
    "lineitem": ("l_orderkey", []),
}
COPIED = ["region", "nation", "supplier", "part"]

# query -> table whose row count defines "rows" for per-row cost
QUERIES = {
    "tpch_q1_pricing_summary": "lineitem",
    "geo_hilbert_key": "events",
    "geo_bbox_fast_path": "events",
    "geo_quadkey_z6": "events",
    "dedup_exact_fingerprint": "documents",
    "dedup_minhash_pairs": "documents",
    "dedup_minhash_survivors": "documents",
    "text_quality": "documents",
    "similarity_cosine_topk": "embeddings",
    "geo_spatial_join": "customer",
    "semantic_dedup": "embeddings",
    "kmeans_train_model": "embeddings",
    "similarity_ivf_index_search": "embeddings",
}


def build_sf1x(spark) -> None:
    from pyspark.sql import functions as F

    marker = os.path.join(SF1X, "_BUILT")
    if os.path.exists(marker):
        return
    os.makedirs(SF1X, exist_ok=True)
    for t in COPIED:
        spark.read.parquet(f"{BASE}/{t}.parquet").coalesce(1) \
            .write.mode("overwrite").parquet(f"{SF1X}/{t}.parquet")
    for t, (key, also) in SCALED.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for i in range(FACTOR):
            p = df.withColumn(key, F.col(key) + F.lit(i * SHIFT))
            for c in also:
                p = p.withColumn(c, F.col(c) + F.lit(i * SHIFT))
            if t == "documents" and i > 0:
                p = p.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" cp{i}")))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{SF1X}/{t}.parquet")
    open(marker, "w").write("ok\n")


def measure(spark, sf_dir: str) -> dict:
    from geoparquet_io_spark.queries import REGISTRY

    out = {}
    for name, table in QUERIES.items():
        rows = spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
        fn = REGISTRY[name][0]
        best = None
        for _ in range(2):          # warm JIT/scan caches; keep best
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = {"sec": round(best, 3), "rows": rows,
                     "us_per_row": round(best / rows * 1e6, 3)}
    return out


def main() -> None:
    from geoparquet_io_spark.session import get_spark

    spark = get_spark("scale-curve")
    spark.range(1000).count()
    build_sf1x(spark)

    results = {}
    for label, d in [("sf0.01", "/root/testdata/sf0.01"),
                     ("sf0.1", BASE), ("sf1x", SF1X)]:
        results[label] = measure(spark, d)

    print(json.dumps(results))
    if "--md" in sys.argv:
        write_md(results)
    spark.stop()


def write_md(results: dict) -> None:
    lines = [
        "# Strong-scaling measurements",
        "",
        "`scripts/scale_curve.py` runs the same registry queries at",
        "sf0.01 (~6k lineitem rows), sf0.1 (~600k), and a synthetic 10x",
        "of sf0.1 built by key-shifted union of the driver-provided",
        "tables (doc text salted per copy).  All local[32]; wall-clock",
        "best-of-2 per point, so numbers carry ~10-20% host noise.",
        "",
        "Reading the table: **us/row falling as rows grow** means fixed",
        "Spark overhead (job setup, planning) amortizing — the operator",
        "itself scales linearly or better; us/row *rising* would flag a",
        "super-linear term (quadratic pair volume, driver bottleneck).",
        "",
        "| query | sf0.01 sec | sf0.1 sec | sf1x sec | sf0.01 us/row |"
        " sf0.1 us/row | sf1x us/row |",
        "|---|---|---|---|---|---|---|",
    ]
    for q in QUERIES:
        r = [results[s][q] for s in ("sf0.01", "sf0.1", "sf1x")]
        lines.append(
            f"| {q} | " + " | ".join(f"{x['sec']}" for x in r) + " | "
            + " | ".join(f"{x['us_per_row']}" for x in r) + " |")
    lines += [
        "",
        "## Findings acted on",
        "",
        "- **All-pairs LSH output is quadratic in boilerplate clusters.**",
        "  The first run of this curve showed `dedup_minhash_pairs` going",
        "  1.1s -> 42s on 10x the docs: the 10x corpus put ~4.8k",
        "  near-identical docs in single band buckets, emitting 70M",
        "  candidate pairs from 50k rows.  Two-layer fix: the dedup path",
        "  defaults to `minhash_star_edges` (operators/dedup.py) — each",
        "  bucket member pairs only with the bucket's min id, provably",
        "  the same survivors and connected components, O(n*bands) edges",
        "  — and `minhash_candidate_pairs` itself now carries a",
        "  `max_bucket_size` cap (default 128) routing hot buckets to a",
        "  sorted-id predecessor chain: m-1 edges per bucket, identical",
        "  connectivity/survivors, only far-apart per-pair verification",
        "  inside a hot bucket is approximated (mutual-dup masses verify",
        "  identically; pass max_bucket_size=None for the literal",
        "  all-pairs contract).  Measured on the same 10x corpus the",
        "  capped pairs query is ~4s / 81 us/row (was 49s / 982), with",
        "  us/row FALLING across the curve; sf0.01/sf0.1 bucket maxima",
        "  (60/478) keep the sf0.01 oracle byte-identical.",
        "",
        "Latest raw JSON is printed by the script; regenerate with",
        "`python scripts/scale_curve.py --md` (the sf1x build is cached",
        "under /tmp and rebuilt only when absent).",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"), "w") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    main()
