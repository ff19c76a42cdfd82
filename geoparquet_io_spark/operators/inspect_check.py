"""Validation / inspection operators (SURVEY.md 2.14).

check_structure  -> core/check_parquet_structure.py:14-533 (row groups,
                    compression, bbox covering assessment)
validate         -> core/validate.py (spec checks: metadata shape,
                    physical schema, data-vs-metadata)
check_fixes      -> core/check_fixes.py:27-318 (re-write applying fixes)
inspect_*        -> core/inspect.py, core/metadata_utils.py

All footer work is driver-side pyarrow (O(1), no Spark job — the
reference's own rule, core/duckdb_metadata.py); data-dependent checks are
small Spark aggregates.
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from geoparquet_io_spark.meta import GeoMeta

# reference targets (core/check_parquet_structure.py:44-105)
ROW_GROUP_MIN_ROWS = 10_000
ROW_GROUP_MAX_ROWS = 200_000
ROW_GROUP_TARGET_MIN_MB = 64
ROW_GROUP_TARGET_MAX_MB = 256
RECOMMENDED_CODEC = "ZSTD"


def _files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


@dataclass
class StructureReport:
    num_files: int
    num_row_groups: int
    total_rows: int
    avg_rows_per_group: float
    min_rows_per_group: int
    max_rows_per_group: int
    compressions: dict[str, set]
    has_geo_metadata: bool
    has_bbox_covering: bool
    issues: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.issues


def check_structure(path: str) -> StructureReport:
    files = _files(path)
    if not files:
        raise FileNotFoundError(path)
    n_groups = 0
    total = 0
    group_rows: list[int] = []
    comps: dict[str, set] = {}
    for f in files:
        md = pq.read_metadata(f)
        total += md.num_rows
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            n_groups += 1
            group_rows.append(rg.num_rows)
            for c in range(rg.num_columns):
                col = rg.column(c)
                comps.setdefault(col.path_in_schema, set()).add(col.compression)
    geo = GeoMeta.from_footer(pq.read_schema(files[0]).metadata)
    has_cov = bool(geo and geo.primary.covering)
    issues = []
    avg = total / n_groups if n_groups else 0
    if group_rows and max(group_rows) > ROW_GROUP_MAX_ROWS:
        issues.append(f"row group has {max(group_rows)} rows > {ROW_GROUP_MAX_ROWS}")
    if avg and avg < ROW_GROUP_MIN_ROWS and total > ROW_GROUP_MIN_ROWS:
        issues.append(f"average rows/group {avg:.0f} < {ROW_GROUP_MIN_ROWS}")
    bad_codecs = {c for s in comps.values() for c in s} - {RECOMMENDED_CODEC}
    if bad_codecs:
        issues.append(f"non-{RECOMMENDED_CODEC} compression: {sorted(bad_codecs)}")
    if geo is None:
        issues.append("no geo footer metadata")
    return StructureReport(
        num_files=len(files),
        num_row_groups=n_groups,
        total_rows=total,
        avg_rows_per_group=avg,
        min_rows_per_group=min(group_rows) if group_rows else 0,
        max_rows_per_group=max(group_rows) if group_rows else 0,
        compressions=comps,
        has_geo_metadata=geo is not None,
        has_bbox_covering=has_cov,
        issues=issues,
    )


def validate(spark, path: str, sample_rows: int = 10_000) -> list[str]:
    """GeoParquet spec checks on a written file: metadata shape, physical
    schema, data-vs-metadata (subset of core/validate.py that applies to
    files this engine writes)."""
    files = _files(path)
    if not files:
        return [f"no parquet files at {path}"]
    errors: list[str] = []
    schema = pq.read_schema(files[0])
    geo = GeoMeta.from_footer(schema.metadata)
    if geo is None:
        return ["missing 'geo' footer metadata"]
    errors.extend(geo.validate())
    # physical schema: geometry must be plain binary (not grouped/repeated)
    import pyarrow as pa

    for name in geo.columns:
        if name not in schema.names:
            errors.append(f"geometry column {name!r} missing from schema")
            continue
        f = schema.field(name)
        if not pa.types.is_binary(f.type) and not pa.types.is_large_binary(f.type):
            errors.append(f"geometry column {name!r} is {f.type}, expected binary")
    if errors:
        return errors
    # data-vs-metadata on a sample: geometry parses, types match, bbox contains data
    from geoparquet_io_spark.functions import geom as G

    gcol = geo.primary_column
    df = spark.read.parquet(path).select(gcol).limit(sample_rows)
    types_rows = df.select(G.st_geometrytype(F.col(gcol)).alias("t")).distinct().collect()
    seen = {r["t"] for r in types_rows if r["t"] is not None}
    declared = set(geo.primary.geometry_types)
    if declared:
        pretty = {t.title().replace("string", "String").replace("point", "Point")
                  .replace("polygon", "Polygon") for t in seen}
        mapped = {
            "POINT": "Point", "LINESTRING": "LineString", "POLYGON": "Polygon",
            "MULTIPOINT": "MultiPoint", "MULTILINESTRING": "MultiLineString",
            "MULTIPOLYGON": "MultiPolygon", "GEOMETRYCOLLECTION": "GeometryCollection",
        }
        undeclared = {mapped.get(t, t) for t in seen} - declared
        if undeclared:
            errors.append(f"data contains undeclared geometry types: {sorted(undeclared)}")
    if geo.primary.bbox:
        env = df.select(G.st_envelope_struct(F.col(gcol)).alias("e")).agg(
            F.min("e.xmin").alias("xmin"), F.min("e.ymin").alias("ymin"),
            F.max("e.xmax").alias("xmax"), F.max("e.ymax").alias("ymax"),
        ).collect()[0]
        bx = geo.primary.bbox
        if env["xmin"] is not None and (
            env["xmin"] < bx[0] or env["ymin"] < bx[1]
            or env["xmax"] > bx[2] or env["ymax"] > bx[3]
        ):
            errors.append("metadata bbox does not contain the data extent")
    return errors


def check_fixes(spark, path: str, out_path: str, hilbert: bool = False) -> list[str]:
    """Re-write applying recommended fixes: zstd recompress, row-group
    resize, add bbox column + covering, optional hilbert re-sort
    (reference: core/check_fixes.py:27-318)."""
    import geoparquet_io_spark as gps

    gt = gps.read(spark, path)
    applied = []
    if gt.geometry_column and gt.bbox_column is None:
        gt = gt.add_bbox()
        applied.append("added bbox covering column")
    if hilbert:
        gt = gt.sort_hilbert()
        applied.append("hilbert re-sort")
    gt.write(out_path)  # writer defaults: zstd15 + 100k row groups
    applied.append("rewrote with zstd + 100k-row groups")
    return applied


def inspect_summary(path: str) -> dict:
    """Footer-only summary (reference: core/inspect.py:64-247)."""
    files = _files(path)
    md = pq.read_metadata(files[0])
    schema = pq.read_schema(files[0])
    geo = GeoMeta.from_footer(schema.metadata)
    return {
        "files": len(files),
        "rows": sum(pq.read_metadata(f).num_rows for f in files),
        "columns": schema.names,
        "row_groups": md.num_row_groups,
        "geo": None if geo is None else {
            "version": geo.version,
            "primary_column": geo.primary_column,
            "geometry_types": geo.primary.geometry_types,
            "crs": geo.primary.crs,
            "covering": geo.primary.covering,
            "bbox": geo.primary.bbox,
        },
        "created_by": md.created_by,
    }


def _wkt_preview(gt, df, max_wkt_chars: int):
    from geoparquet_io_spark.functions import geom as G

    g = gt.geometry_column
    if g:
        df = df.withColumn(
            g,
            F.substring(G.st_astext(F.col(g)), 1, max_wkt_chars),
        )
    return df


def inspect_head(spark, path: str, n: int = 10, max_wkt_chars: int = 60):
    """Preview rows with WKT-truncated geometry display
    (reference: core/inspect_utils.py:473-517)."""
    import geoparquet_io_spark as gps

    gt = gps.read(spark, path)
    return _wkt_preview(gt, gt.df.limit(n), max_wkt_chars)


def inspect_tail(spark, path: str, n: int = 10, max_wkt_chars: int = 60):
    """Last n rows (reference: api/table.py:1426-1471 tail slice)."""
    import geoparquet_io_spark as gps

    gt = gps.read(spark, path)
    tail_gt = gt.tail(n)
    return _wkt_preview(gt, tail_gt.df, max_wkt_chars)
