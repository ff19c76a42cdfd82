"""Sort operators (SURVEY.md 2.7).

sort_hilbert  -> core/hilbert_order.py:98-113 (ORDER BY ST_Hilbert over
                 the dataset envelope)
sort_column   -> core/sort_by_column.py:27-80
sort_quadkey  -> core/sort_quadkey.py:30-85

Scale note: a global ORDER BY in Spark is a range-partitioned sort
(sample -> range boundaries -> shuffle -> per-partition sort), which IS
the 100 TB-correct strategy; output files are globally ordered by the
key with file boundaries at range splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoparquet_io_spark.functions import geom as G
from geoparquet_io_spark.operators.add_columns import _centroid_lonlat
from geoparquet_io_spark.operators.stats import bounds as _bounds


def sort_hilbert(
    df: DataFrame,
    geometry_column: str | None = None,
    bbox_column: str | None = None,
    key_column: str | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """Order rows along a Hilbert curve over the dataset envelope.

    Two passes like the reference (bounds agg, then keyed sort,
    core/hilbert_order.py:80-113); the bounds pass is a 4-value agg that
    reads only the bbox/geometry column.
    """
    x, y = _centroid_lonlat(df, geometry_column, bbox_column)
    env = _bounds(df, geometry_column=geometry_column, bbox_column=bbox_column)
    key = key_column or "__hilbert"
    out = df.withColumn(key, G.st_hilbert(x, y, env))
    out = out.orderBy(key)
    if not keep_key:
        out = out.drop(key)
    return out


def sort_column(df: DataFrame, columns: list[str] | str,
                descending: list[bool] | bool | None = None) -> DataFrame:
    """Multi-column sort (reference: core/sort_by_column.py:27-80)."""
    if isinstance(columns, str):
        columns = [columns]
    if descending is None:
        descending = [False] * len(columns)
    if isinstance(descending, bool):
        descending = [descending] * len(columns)
    exprs = [F.col(c).desc() if d else F.col(c).asc() for c, d in zip(columns, descending)]
    return df.orderBy(*exprs)


def sort_quadkey(
    df: DataFrame,
    geometry_column: str | None = None,
    bbox_column: str | None = None,
    zoom: int = 13,
    keep_column: bool = False,
    quadkey_column: str = "quadkey",
) -> DataFrame:
    """Z-order by quadkey string (reference: core/sort_quadkey.py:30-85).
    Adds the quadkey column when missing (native exprs, codegen-able)."""
    from geoparquet_io_spark.operators.add_columns import add_quadkey

    added = False
    if quadkey_column not in df.columns:
        df = add_quadkey(df, geometry_column, bbox_column, zoom, quadkey_column)
        added = True
    out = df.orderBy(quadkey_column)
    if added and not keep_column:
        out = out.drop(quadkey_column)
    return out


def sort_zorder(
    df: DataFrame,
    geometry_column: str | None = None,
    bbox_column: str | None = None,
    order: int = 16,
    key_column: str | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """Order rows along a Morton (Z-order) curve over the dataset
    envelope — the layout key Delta/Iceberg-style Z-ORDER compaction
    uses.  Same two-pass shape as sort_hilbert (bounds agg, then
    range-partitioned global sort); the key itself is ~10 integer ops
    via magic-mask bit spreading (functions/geokeys.py), all codegen."""
    from geoparquet_io_spark.functions.geokeys import morton_key

    x, y = _centroid_lonlat(df, geometry_column, bbox_column)
    env = _bounds(df, geometry_column=geometry_column, bbox_column=bbox_column)
    key = key_column or "__zorder"
    out = df.withColumn(key, morton_key(x, y, env, order=order))
    out = out.orderBy(key)
    if not keep_key:
        out = out.drop(key)
    return out


def sample_rows(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """ORDER BY random() LIMIT k equivalent (core/check_spatial_order.py:38-39)."""
    return df.orderBy(F.rand(seed)).limit(n)
