"""Projection / filter / limit — the reference's ``extract`` operator.

Reference: column selection core/extract.py:484-526, bbox fast/slow path
core/extract.py:554-585, geometry filter core/extract.py:581-584, WHERE
validation core/extract.py:49-101, LIMIT core/extract.py:619-621.

Spark-first notes: the bbox covering fast path emits pure struct-field
min/max comparisons, which Catalyst pushes down to Parquet row-group
statistics — the same row-group pruning the reference gets from DuckDB.
The slow path is the exact ST_Intersects pandas UDF, applied AFTER the
cheap envelope prefilter so the UDF only sees candidate rows.
"""

from __future__ import annotations

import re
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoparquet_io_spark.functions import geom as G
from geoparquet_io_spark.functions import wkb as _wkb
from geoparquet_io_spark.functions import wkt as _wkt

# Reference denylist (validate_where_clause, core/extract.py:49-101),
# extended with Spark's EXPRESSION-level escape hatches: reflect /
# java_method invoke arbitrary JVM static methods from inside F.expr —
# the statement keywords alone gave false security here because F.expr
# cannot execute statements anyway.
_FORBIDDEN_WHERE = re.compile(
    r"(?i)\b(DROP|DELETE|INSERT|UPDATE|ALTER|CREATE|TRUNCATE|EXEC|EXECUTE|"
    r"ATTACH|DETACH|PRAGMA|INSTALL|LOAD|COPY|GRANT|REVOKE|"
    r"REFLECT|JAVA_METHOD)\b|;|--|/\*"
)


def validate_where_clause(where: str) -> None:
    if _FORBIDDEN_WHERE.search(where):
        raise ValueError(f"WHERE clause contains forbidden keyword/character: {where!r}")


def build_column_selection(
    df: DataFrame,
    include: list[str] | None,
    exclude: list[str] | None,
    geometry_column: str | None,
    bbox_column: str | None,
) -> list[str]:
    """Keep-geometry rule + original column order
    (reference: core/extract.py:484-526, overlap rules :1088-1109)."""
    existing = df.columns
    if include and exclude:
        overlap = set(include) & set(exclude)
        if overlap:
            raise ValueError(f"columns in both include and exclude: {sorted(overlap)}")
    for name in (include or []) + (exclude or []):
        if name not in existing:
            raise ValueError(f"column {name!r} not in schema {existing}")
    if include is not None:
        keep = set(include)
        # geometry + bbox ride along unless explicitly excluded
        if geometry_column and geometry_column in existing:
            keep.add(geometry_column)
        if bbox_column and bbox_column in existing:
            keep.add(bbox_column)
    else:
        keep = set(existing)
    if exclude:
        keep -= set(exclude)
    return [c for c in existing if c in keep]


def check_crs_bbox_mismatch(bbox, crs) -> None:
    """Warn when the filter bbox looks geographic but the data CRS is
    projected (reference: core/extract.py:104-247)."""
    from geoparquet_io_spark.functions import crs as _crs

    if bbox is None or crs is None:
        return
    xmin, ymin, xmax, ymax = bbox
    looks_geographic = (-180 <= xmin <= 180 and -180 <= xmax <= 180
                        and -90 <= ymin <= 90 and -90 <= ymax <= 90)
    try:
        projected = not _crs.is_geographic(crs)
    except (ValueError, TypeError):
        return
    if looks_geographic and projected:
        warnings.warn(
            f"bbox {bbox} looks like lon/lat degrees but the data CRS is "
            f"{_crs.normalize_crs(crs)!r} (projected) — the filter will "
            "likely match nothing; reproject or pass projected coordinates",
            stacklevel=3,
        )


def extract(
    df: DataFrame,
    geometry_column: str | None = None,
    bbox_column: str | None = None,
    columns: list[str] | None = None,
    exclude_columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    geometry_wkt: str | None = None,
    where: str | None = None,
    limit: int | None = None,
    crs=None,
) -> DataFrame:
    out = df
    check_crs_bbox_mismatch(bbox, crs)

    if bbox is not None:
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)
        if ymin > ymax:
            raise ValueError(f"bbox {bbox}: ymin > ymax")
        if xmin > xmax:
            # a west>east box is an ANTIMERIDIAN query, which a single
            # min/max compare (or an inverted polygon) silently matches
            # nothing on — split explicitly
            raise ValueError(
                f"bbox {bbox} crosses the antimeridian (xmin > xmax) — "
                "run two extracts, (xmin, ymin, 180, ymax) and "
                "(-180, ymin, xmax, ymax), and union the results")
        if bbox_column and bbox_column in out.columns:
            # fast path: covering-column min/max compare (pushdown-
            # friendly).  NOTE this is envelope-vs-envelope semantics —
            # the covering contract (reference core/extract.py:554-585);
            # a geometry whose ENVELOPE touches the box passes even when
            # the exact shape does not.  The slow path below is exact.
            out = out.filter(G.bbox_intersects(F.col(bbox_column), xmin, ymin, xmax, ymax))
        elif geometry_column:
            # slow path: exact intersects vs envelope polygon
            env_wkt = _wkt.to_wkt(_wkb.encode_box_polygon(xmin, ymin, xmax, ymax))
            out = out.filter(G.st_intersects_wkt(F.col(geometry_column), env_wkt))
        else:
            raise ValueError("bbox filter needs a bbox column or geometry column")

    if geometry_wkt is not None:
        if not geometry_column:
            raise ValueError("geometry filter needs a geometry column")
        filt = G.st_intersects_wkt(F.col(geometry_column), geometry_wkt)
        if bbox_column and bbox_column in out.columns:
            # cheap envelope prefilter before the exact UDF
            e = _wkb.envelope(_wkt.from_wkt(geometry_wkt))
            out = out.filter(G.bbox_intersects(F.col(bbox_column), *e))
        out = out.filter(filt)

    if where is not None:
        validate_where_clause(where)
        out = out.filter(F.expr(where))

    cols = build_column_selection(out, columns, exclude_columns, geometry_column, bbox_column)
    if cols != out.columns:
        out = out.select(*cols)

    if limit is not None:
        out = out.limit(int(limit))
    return out
