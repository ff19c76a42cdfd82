"""JSONL (newline-delimited JSON) source/sink — the de-facto LLM-corpus
interchange format (C4, Dolma, RedPajama, FineWeb all ship JSONL).

Spark's native json reader/writer does the heavy lifting (distributed,
splittable with line-based records, zstd/gzip codecs); these wrappers
pin the semantics a corpus pipeline needs:

- explicit schema (never infer on 100 TB — inference is a full extra
  scan and drifts with corrupt rows)
- PERMISSIVE corrupt-row capture into ``_corrupt_record`` (bad rows are
  quarantined, not dropped silently), or strict FAILFAST
- deterministic column order on write (JSON objects are unordered;
  re-ordering makes byte-level diffs meaningless otherwise)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType | None = None,
               keep_corrupt: bool = True) -> DataFrame:
    """Read JSONL.  With a schema and ``keep_corrupt``, malformed lines
    land in ``_corrupt_record`` instead of vanishing (PERMISSIVE mode);
    without ``keep_corrupt`` the read FAILFASTs on the first bad line."""
    r = spark.read
    if schema is not None:
        if keep_corrupt:
            schema = T.StructType(
                list(schema.fields)
                + [T.StructField(CORRUPT_COL, T.StringType(), True)])
            r = r.schema(schema).option("mode", "PERMISSIVE") \
                .option("columnNameOfCorruptRecord", CORRUPT_COL)
        else:
            r = r.schema(schema).option("mode", "FAILFAST")
    return r.json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None,
                partition_by: list[str] | None = None) -> None:
    """Write JSONL with columns in their DataFrame order (stable field
    order per line)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
