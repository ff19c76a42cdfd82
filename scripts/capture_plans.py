"""Capture .explain('formatted') for headline queries to plans/r<N>/.

Usage:
    python scripts/capture_plans.py before|after [query ...]

Writes plans/r12/<query>_<tag>.txt for each headline query (or the
subset given).  Uses the same session factory and data dir as bench.py
so the plans match what the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUND = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from bench import HEADLINE
    from geoparquet_io_spark.queries import REGISTRY
    from geoparquet_io_spark.session import get_spark

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", ROUND)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    names = [n for n in HEADLINE if n in REGISTRY]
    if only:
        names = [n for n in names if n in only]
    for name in names:
        fn = REGISTRY[name][0]
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception as exc:  # capture what we can; a broken query
            plan = f"ERROR building plan: {exc!r}\n"  # shows up loudly
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
