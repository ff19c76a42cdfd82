"""Group-wise geometry aggregation (dissolve): convex hull per group.

The reference has per-geometry functions only (SURVEY 2.11); a
curation/analytics pipeline also needs the AGGREGATE form — "one hull
per region / per cluster / per day" — which at 100 TB must not ship
every vertex of a group to one task.

Scale shape (hulls compose: hull(A ∪ B) == hull(hull(A) ∪ hull(B))):
  phase 1 — mapInPandas computes a PARTIAL hull per (input partition,
            group), no shuffle: each partition emits at most one small
            hull WKB per group it touches;
  phase 2 — groupBy(group).applyInPandas merges the partial hulls.
The shuffle therefore moves only partial-hull vertices (bounded by
hull complexity, typically tens of points), never the raw vertex sets
— the same partial-aggregate trick Spark applies to sums, expressed
for a non-algebraic geometry aggregate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from geoparquet_io_spark.functions import wkb as _wkb


def _group_hull(group_vals, bufs) -> dict:
    pts = []
    for b in bufs:
        if b is None:
            continue
        g = _wkb.parse(bytes(b))
        arrs = [a for a in g.rings() if len(a)]
        if arrs:
            pts.append(np.vstack(arrs))
    if not pts:
        return None
    return _wkb.hull_of_points(np.vstack(pts))


def dissolve_hull(df: DataFrame, group_column: str,
                  geometry_column: str = "geometry",
                  hull_column: str = "hull") -> DataFrame:
    """One convex hull per ``group_column`` value, with ``n_hull_points``
    (distinct hull vertices) and ``hull_area`` (shoelace; 0 for
    degenerate point/line hulls)."""
    gfield = df.schema[group_column]
    partial_schema = T.StructType([
        T.StructField(group_column, gfield.dataType, True),
        T.StructField("__partial", T.BinaryType(), True),
    ])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            for gv, sub in pdf.groupby(group_column, sort=False):
                h = _group_hull(gv, sub[geometry_column])
                if h is None:
                    continue
                prev = acc.get(gv)
                acc[gv] = h if prev is None else _group_hull(gv, [prev, h])
        if acc:
            yield pd.DataFrame(
                {group_column: list(acc.keys()),
                 "__partial": list(acc.values())})

    part = df.select(group_column, geometry_column) \
        .mapInPandas(partials, schema=partial_schema)

    out_schema = T.StructType([
        T.StructField(group_column, gfield.dataType, True),
        T.StructField(hull_column, T.BinaryType(), True),
        T.StructField("n_hull_points", T.IntegerType(), True),
        T.StructField("hull_area", T.DoubleType(), True),
    ])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        gv = pdf[group_column].iloc[0]
        h = _group_hull(gv, pdf["__partial"])
        g = _wkb.parse(h)
        rings = [a for a in g.rings() if len(a)]
        npts = int(len(np.unique(np.vstack(rings), axis=0)))
        try:
            area = float(_wkb.area(h))
        except (ValueError, IndexError):
            area = 0.0
        return pd.DataFrame({group_column: [gv], hull_column: [h],
                             "n_hull_points": [npts],
                             "hull_area": [area]})

    return part.groupBy(group_column).applyInPandas(merge,
                                                    schema=out_schema)
