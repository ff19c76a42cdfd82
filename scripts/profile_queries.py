"""Per-query profiling harness for the optimization rounds.

For each headline query: run it through the noop sink ``reps`` times in
one session, record per-rep seconds and the number of Spark jobs the
LAST rep launched (distinct job-group ids via the status tracker).  A
query that fires many jobs is paying for hidden actions (collects,
eager checkpoints, bounds passes) — the first thing guide §1/§2 says to
look at.

Usage:
    python scripts/profile_queries.py [reps] [query ...]

Prints a table and writes /tmp/profile_queries.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])

    from bench import HEADLINE, _run_query, _warm
    from geoparquet_io_spark.queries import REGISTRY
    from geoparquet_io_spark.session import get_spark

    spark = get_spark("profile-queries")
    sc = spark.sparkContext
    _warm(spark)

    names = [n for n in HEADLINE + ["pipeline_3op_write"]
             if n == "pipeline_3op_write" or n in REGISTRY]
    if only:
        names = [n for n in names if n in only]

    results: dict[str, dict] = {}
    for name in names:
        times = []
        n_jobs = None
        for rep in range(reps):
            group = f"profile:{name}:{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            sec = _run_query(spark, name)
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            if sec is None:
                break
            times.append(round(wall, 3))
            try:
                n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            except Exception:
                n_jobs = -1
        if times:
            results[name] = {
                "times": times,
                "min": min(times),
                "jobs": n_jobs,
            }
            print(f"{name:35s} min={min(times):7.3f} "
                  f"jobs={n_jobs:3d}  all={times}")
    spark.stop()

    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    total_min = sum(v["min"] for v in results.values())
    print(f"\ntotal (min-of-{reps}): {total_min:.2f}s over "
          f"{len(results)} queries")


if __name__ == "__main__":
    main()
