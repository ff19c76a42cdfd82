"""GeoParquet read/write for Spark.

Reference behavior: read at api/table.py:166-236 (+ partition_reader),
write strategies at core/common.py:2960-3118 / core/write_strategies/.
Spark's parquet writer cannot emit custom footer key-value metadata, so
the write path here runs pyarrow ``ParquetWriter``s INSIDE executors via
``mapInPandas`` — one pass, no driver materialization, footer ``geo``
metadata stamped on every file (SURVEY.md section 7 milestone 2).
"""

from __future__ import annotations

import glob as _glob
import os
import uuid
from typing import Iterator

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

from geoparquet_io_spark.meta import GeoMeta, GeoColumnMeta

# Reference best-practice write defaults (core/common.py:70-110):
# ZSTD level 15, 100k-row row groups, stats+dictionary on.
DEFAULT_COMPRESSION = "zstd"
DEFAULT_COMPRESSION_LEVEL = 15
DEFAULT_ROW_GROUP_ROWS = 100_000


def _first_parquet_file(path: str) -> str | None:
    if os.path.isfile(path):
        return path
    hits = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return hits[0] if hits else None


def read_footer_geo(path: str) -> GeoMeta | None:
    """Driver-side footer metadata read — O(1), no Spark job
    (reference reads footers the same way, core/duckdb_metadata.py:61-240)."""
    f = _first_parquet_file(path)
    if f is None:
        return None
    schema = pq.read_schema(f)
    return GeoMeta.from_footer(schema.metadata)


def read(spark: SparkSession, path: str, geometry_column: str | None = None):
    """Read GeoParquet -> GeoTable (reference: api/table.py:166-185)."""
    from geoparquet_io_spark.geotable import GeoTable

    df = spark.read.parquet(path)
    geo = read_footer_geo(path)
    if geo is None and geometry_column:
        geo = GeoMeta(primary_column=geometry_column,
                      columns={geometry_column: GeoColumnMeta()})
    if geo is not None and geometry_column:
        geo = geo.with_primary_column(geometry_column)
    return GeoTable(df, geo)


def read_partition(
    spark: SparkSession,
    path: str,
    hive_partitioning: bool = True,
    allow_schema_diff: bool = False,
):
    """Read a partitioned dataset (reference: core/partition_reader.py:22-78).
    ``allow_schema_diff`` == DuckDB union_by_name == Spark mergeSchema."""
    from geoparquet_io_spark.geotable import GeoTable

    reader = spark.read
    if allow_schema_diff:
        reader = reader.option("mergeSchema", "true")
    if not hive_partitioning:
        # treat dirs as plain file globs, no partition column synthesis
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.parquet(path)
    return GeoTable(df, read_footer_geo(path))


# ---------------------------------------------------------------------------
# Write
# ---------------------------------------------------------------------------

def _arrow_schema_with_geo(df: DataFrame, geo: GeoMeta | None) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(df.schema)
    if geo is not None:
        schema = schema.with_metadata(
            {**(schema.metadata or {}), b"geo": geo.to_json().encode()}
        )
    return schema


def write(
    df: DataFrame,
    path: str,
    geo: GeoMeta | None = None,
    partition_by: list[str] | None = None,
    single_file: bool | None = None,
    compression: str = DEFAULT_COMPRESSION,
    compression_level: int = DEFAULT_COMPRESSION_LEVEL,
    row_group_rows: int = DEFAULT_ROW_GROUP_ROWS,
    max_rows_per_file: int | None = None,
    overwrite: bool = True,
    per_file_bbox: str | None = None,
) -> list[str]:
    """Write GeoParquet with footer ``geo`` metadata.  Returns written files.

    - ``single_file=True`` -> exactly ``path`` (a .parquet file), streamed
      through the driver batch-by-batch (reference single-file semantics;
      its arrow_streaming strategy, write_strategies/arrow_streaming.py:81-341).
    - directory mode (default)   -> one file per task via executor-side
      pyarrow writers; with ``partition_by`` -> hive ``col=value/`` dirs.
    - ``per_file_bbox=<bbox column>`` -> each file's footer ``geo`` metadata
      carries THAT file's bbox (the reference invariant for partitioned
      outputs, core/partition_common.py:657-705).  Costs one executor-local
      rewrite per file (the reference's disk-rewrite strategy).
    """
    if single_file is None:
        single_file = path.endswith(".parquet") and partition_by is None

    if single_file:
        return _write_single_file(df, path, geo, compression, compression_level, row_group_rows)
    return _write_distributed(
        df, path, geo, partition_by, compression, compression_level, row_group_rows,
        max_rows_per_file, overwrite, per_file_bbox,
    )


def _write_single_file(df, path, geo, compression, compression_level, row_group_rows):
    schema = _arrow_schema_with_geo(df, geo)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    writer = pq.ParquetWriter(
        path, schema, compression=compression, compression_level=compression_level
    )
    try:
        # toArrow() materializes; for the huge case use directory mode.
        tbl = df.toArrow().cast(schema)
        if tbl.num_rows == 0:
            writer.write_table(tbl)
        for batch_start in range(0, tbl.num_rows, row_group_rows):
            writer.write_table(tbl.slice(batch_start, row_group_rows))
    finally:
        writer.close()
    return [path]


def _write_distributed(
    df, path, geo, partition_by, compression, compression_level, row_group_rows,
    max_rows_per_file, overwrite, per_file_bbox=None,
):
    if per_file_bbox is not None and per_file_bbox not in df.columns:
        raise ValueError(f"per_file_bbox column {per_file_bbox!r} not in schema")
    geo_json = geo.to_json() if geo is not None else None
    schema = _arrow_schema_with_geo(df, geo)
    schema_ser = schema.serialize().to_pybytes()
    if overwrite and os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    part_cols = list(partition_by or [])
    if part_cols:
        # co-locate each partition value; AQE may still split skewed keys,
        # which just yields >1 file for that value (allowed by the layout).
        df = df.repartition(*part_cols)
    data_cols = [f.name for f in schema if f.name not in part_cols]
    data_schema = pa.schema(
        [schema.field(n) for n in data_cols], metadata=schema.metadata
    )

    def write_partition(batches: Iterator["pa.RecordBatch"]):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        full_schema = pa.ipc.read_schema(pa.BufferReader(schema_ser))
        dschema = pa.schema(
            [full_schema.field(n) for n in data_cols], metadata=full_schema.metadata
        )
        # per-key open writer: key -> [writer, file, rows_in_file]
        open_w: dict[tuple, list] = {}
        emitted: list[tuple[str, int]] = []

        def _open(k: tuple):
            d = path
            if part_cols:
                d = os.path.join(
                    path, *[f"{c}={_hive_escape(v)}" for c, v in zip(part_cols, k)]
                )
                os.makedirs(d, exist_ok=True)
            f = os.path.join(d, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.parquet")
            w = pq.ParquetWriter(
                f, dschema, compression=compression,
                compression_level=compression_level,
            )
            open_w[k] = [w, f, 0]
            return open_w[k]

        file_bbox: dict[str, list] = {}

        def _track_bbox(f: str, sub: "pa.Table"):
            if per_file_bbox is None:
                return
            import pyarrow.compute as pc

            col = sub.column(per_file_bbox).combine_chunks()
            vals = [
                pc.min(col.field("xmin")).as_py(), pc.min(col.field("ymin")).as_py(),
                pc.max(col.field("xmax")).as_py(), pc.max(col.field("ymax")).as_py(),
            ]
            cur = file_bbox.get(f)
            if cur is None:
                file_bbox[f] = vals
            else:
                file_bbox[f] = [min(cur[0], vals[0]), min(cur[1], vals[1]),
                                max(cur[2], vals[2]), max(cur[3], vals[3])]

        def _finish_file(f: str):
            """Stamp this file's own bbox into its geo footer metadata
            (executor-local rewrite — the reference's disk-rewrite strategy)."""
            if per_file_bbox is None or geo_json is None or f not in file_bbox:
                return
            from geoparquet_io_spark.meta import GeoMeta as _GM

            g = _GM.from_json(geo_json)
            g.primary.bbox = [float(v) for v in file_bbox[f]]
            tbl = pq.read_table(f)
            tbl = tbl.replace_schema_metadata(
                {**(tbl.schema.metadata or {}), b"geo": g.to_json().encode()}
            )
            pq.write_table(tbl, f, compression=compression,
                           compression_level=compression_level,
                           row_group_size=row_group_rows)

        def _append(k: tuple, sub: "pa.Table"):
            sub = sub.cast(dschema)
            while sub.num_rows:
                slot = open_w.get(k) or _open(k)
                take = sub.num_rows
                if max_rows_per_file:
                    take = min(take, max_rows_per_file - slot[2])
                slot[0].write_table(sub.slice(0, take))
                _track_bbox(slot[1], sub.slice(0, take))
                slot[2] += take
                sub = sub.slice(take)
                if max_rows_per_file and slot[2] >= max_rows_per_file:
                    slot[0].close()
                    _finish_file(slot[1])
                    emitted.append((slot[1], slot[2]))
                    del open_w[k]

        try:
            for batch in batches:
                tbl = pa.Table.from_batches([batch]).cast(full_schema)
                if part_cols:
                    keys = list(zip(*[tbl.column(c).to_pylist() for c in part_cols]))
                    by_key: dict[tuple, list[int]] = {}
                    for i, k in enumerate(keys):
                        by_key.setdefault(k, []).append(i)
                    for k, idxs in by_key.items():
                        _append(k, tbl.take(idxs).select(data_cols))
                else:
                    _append((), tbl.select(data_cols))
        finally:
            for w, f, n in open_w.values():
                w.close()
                _finish_file(f)
                emitted.append((f, n))
        out = pa.table(
            {
                "file": [f for f, _ in emitted],
                "rows": [n for _, n in emitted],
            },
            schema=pa.schema([("file", pa.string()), ("rows", pa.int64())]),
        )
        yield from out.to_batches()

    result_schema = "file string, rows long"
    res = df.mapInArrow(write_partition, schema=result_schema) if hasattr(df, "mapInArrow") else None
    if res is None:  # pragma: no cover - old spark fallback
        raise RuntimeError("requires Spark >= 3.3 (mapInArrow)")
    rows = res.collect()
    return [r["file"] for r in rows]


def _hive_escape(v) -> str:
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(v)
    return "".join(ch if ch.isalnum() or ch in "-_." else f"%{ord(ch):02X}" for ch in s)
