"""Plan-inspection helpers: verify the physical plans this engine relies
on (pushdown, broadcast, codegen) actually materialize.

The reference gets row-group pruning from DuckDB implicitly; here the
same property must hold through Catalyst — these helpers make it
assertable in tests and visible in benchmarks (SURVEY.md section 4)."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or \
        "BroadcastNestedLoopJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")


def plan_summary(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    return {
        "pushed_filters": pushed_filters(df),
        "read_schema": read_schema_columns(df),
        "codegen_stages": plan.count("WholeStageCodegen"),
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "python_evals": plan.count("ArrowEvalPython") + plan.count("BatchEvalPython"),
    }
