"""Dataset maintenance at scale: file-skipping manifests and compaction.

Two operational primitives a 100 TB GeoParquet lake needs that the
single-file reference never faced:

- **Manifest / file skipping**: a distributed footer sweep producing a
  tiny (file, rows, bytes, bbox) table.  A spatial query then prunes at
  FILE granularity before Spark ever lists row groups — the Iceberg/
  Delta zone-map idea expressed over plain GeoParquet footers (this
  repo's writers already stamp a per-file bbox,
  sources/geoparquet.py:write per_file_bbox; reference invariant
  core/partition_common.py:657-705).
- **Compaction**: bin small files up to a target size in one
  repartition + rewrite, preserving footer geo metadata.  Small-file
  proliferation is the classic lake failure mode (every file = one
  task + one footer read).
"""

from __future__ import annotations

import glob as _glob
import math
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType([
    T.StructField("file", T.StringType(), False),
    T.StructField("n_rows", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("xmin", T.DoubleType()),
    T.StructField("ymin", T.DoubleType()),
    T.StructField("xmax", T.DoubleType()),
    T.StructField("ymax", T.DoubleType()),
])


def _list_parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(_glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True))


def build_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Distributed footer sweep -> manifest DataFrame (one row per file).

    The file LIST goes through the driver (names only — bounded); the
    footer READS run on executors via mapInPandas, so a million-file
    dataset sweeps in parallel instead of serially on the driver.
    bbox columns are NULL when a footer has no geo bbox.  Persist the
    result next to the dataset and refresh incrementally on ingest.
    """
    import pandas as pd

    files = _list_parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")

    paths_df = spark.createDataFrame([(f,) for f in files], ["file"]) \
        .repartition(min(len(files), 64))

    def sweep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        from geoparquet_io_spark.meta import GeoMeta

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                pf = pq.ParquetFile(f)
                md = pf.metadata
                bbox = None
                g = GeoMeta.from_footer(pf.schema_arrow.metadata)
                if g is not None and g.primary is not None:
                    bbox = g.primary.bbox
                rows.append({
                    "file": f,
                    "n_rows": md.num_rows,
                    "n_bytes": os.path.getsize(f),
                    "xmin": bbox[0] if bbox else None,
                    "ymin": bbox[1] if bbox else None,
                    "xmax": bbox[2] if bbox else None,
                    "ymax": bbox[3] if bbox else None,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MANIFEST_SCHEMA])

    return paths_df.mapInPandas(sweep, schema=MANIFEST_SCHEMA)


def prune_files(manifest: DataFrame,
                bbox: tuple[float, float, float, float]) -> tuple[list[str], list[str]]:
    """Split manifest files into (kept, skipped) for a query bbox.
    Files without a footer bbox are conservatively KEPT (pruning must
    never lose rows).  Only file NAMES reach the driver."""
    xmin, ymin, xmax, ymax = bbox
    overlap = (F.col("xmax") >= xmin) & (F.col("xmin") <= xmax) \
        & (F.col("ymax") >= ymin) & (F.col("ymin") <= ymax)
    keep = overlap | F.col("xmin").isNull()
    rows = manifest.select("file", keep.alias("keep")).collect()
    kept = [r["file"] for r in rows if r["keep"]]
    skipped = [r["file"] for r in rows if not r["keep"]]
    return kept, skipped


def read_pruned(spark: SparkSession, path: str,
                bbox: tuple[float, float, float, float],
                manifest: DataFrame | None = None):
    """Read only the files whose footer bbox can intersect ``bbox`` —
    file-granularity skipping BEFORE Spark's row-group pruning.  Returns
    (GeoTable, report) where report counts scanned vs skipped files.
    Apply the exact bbox filter on the result (`.extract(bbox=...)`) —
    pruning is conservative, not exact."""
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.sources.geoparquet import read

    if manifest is None:
        manifest = build_manifest(spark, path)
    kept, skipped = prune_files(manifest, bbox)
    report = {"files_total": len(kept) + len(skipped),
              "files_scanned": len(kept), "files_skipped": len(skipped)}
    gt = read(spark, path)  # footer geo metadata from the dataset root
    if not kept:
        # degenerate: nothing can match; keep the dataset schema with an
        # always-false filter so callers still get the right columns
        return GeoTable(gt.df.filter(F.lit(False)), gt.geo), report
    return GeoTable(spark.read.parquet(*kept), gt.geo), report


def compact(spark: SparkSession, in_path: str, out_path: str,
            target_file_mb: float = 256.0,
            compression: str = "zstd") -> dict:
    """Compact a small-file dataset into ~``target_file_mb`` files:
    one repartition (count derived from actual on-disk bytes) + one
    rewrite through the footer-preserving GeoParquet writer.  Returns a
    report dict.  Non-geo datasets compact the same way (geo metadata
    simply absent)."""
    from geoparquet_io_spark.sources.geoparquet import read, write

    files = _list_parquet_files(in_path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {in_path!r}")
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    gt = read(spark, in_path)
    df = gt.df.repartition(n_out)
    written = write(df, out_path, geo=gt.geo, compression=compression)
    return {
        "files_before": len(files),
        "files_after": len(written),
        "bytes_before": total_bytes,
        "bytes_after": sum(os.path.getsize(f) for f in written),
        "target_file_mb": target_file_mb,
    }


def manifest_staleness(manifest: DataFrame, path: str) -> dict:
    """Compare a persisted manifest against the dataset's CURRENT file
    listing: files added/removed/resized since the sweep.  A stale
    manifest prunes incorrectly (a new file it never saw would be
    silently skipped by file-list reads), so ingest jobs should refresh
    or incrementally extend it; this is the audit.  Names/sizes only —
    no data read."""
    current = {f: os.path.getsize(f) for f in _list_parquet_files(path)}
    recorded = {r["file"]: r["n_bytes"] for r in
                manifest.select("file", "n_bytes").collect()}
    added = sorted(set(current) - set(recorded))
    removed = sorted(set(recorded) - set(current))
    resized = sorted(f for f in set(current) & set(recorded)
                     if current[f] != recorded[f])
    return {
        "fresh": not (added or removed or resized),
        "files_added": added,
        "files_removed": removed,
        "files_resized": resized,
    }
