"""Map tiling: clip geometries to a regular grid.

The tiling primitive every vector-tile / spatial-partition pipeline
needs: each geometry is cut into per-cell pieces (polygon area and line
length are conserved across the cut), so downstream per-tile work
(rendering, per-tile files, tile-local joins) never sees geometry that
crosses a tile boundary.

Scale shape: map-only — each geometry expands to exactly the grid
cells its ENVELOPE overlaps and is clipped per cell with the
Sutherland-Hodgman / Liang-Barsky kernels (functions/wkb.py:
clip_to_rect); cost is O(bbox cells x vertices) per geometry, no
shuffle, no driver state.  Partitioning the output by (cell_x, cell_y)
afterwards is an ordinary hive write.

Reference: the reference has no clipping operator (its DuckDB spatial
build exposes ST_Intersection but no query uses it) — this is a
beyond-reference capability like the raster/zonal family.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def clip_to_grid(
    df: DataFrame,
    cell_size: float,
    origin: tuple[float, float] = (0.0, 0.0),
    geometry_column: str = "geometry",
    keep_columns: list[str] | None = None,
    drop_empty: bool = True,
) -> DataFrame:
    """One row per (input geometry, overlapped grid cell) with the
    geometry CLIPPED to that cell.

    Output columns: ``keep_columns`` (default: all non-geometry
    columns) + ``cell_x``, ``cell_y`` (integer cell indices from
    ``origin``) + the clipped ``geometry_column``.  ``drop_empty``
    removes cells where the clip degenerates to nothing (envelope
    overlapped but the geometry itself didn't).
    """
    import pandas as pd

    from geoparquet_io_spark.functions import wkb as W

    keep = keep_columns if keep_columns is not None else \
        [c for c in df.columns if c != geometry_column]
    src = df.select(*keep, geometry_column)
    out_schema = T.StructType(
        [src.schema[c] for c in keep]
        + [T.StructField("cell_x", T.LongType()),
           T.StructField("cell_y", T.LongType()),
           T.StructField(geometry_column, T.BinaryType(), True)]
    )
    ox, oy = float(origin[0]), float(origin[1])
    cs = float(cell_size)
    gi = len(keep)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                buf = rec[gi]
                if buf is None:
                    continue
                buf = bytes(buf)
                x0, y0, x1, y1 = W.envelope(buf)
                cx0 = math.floor((x0 - ox) / cs)
                cx1 = max(cx0, math.floor((x1 - ox) / cs - 1e-12))
                cy0 = math.floor((y0 - oy) / cs)
                cy1 = max(cy0, math.floor((y1 - oy) / cs - 1e-12))
                for cx in range(cx0, cx1 + 1):
                    for cy in range(cy0, cy1 + 1):
                        clipped = W.clip_to_rect(
                            buf, ox + cx * cs, oy + cy * cs,
                            ox + (cx + 1) * cs, oy + (cy + 1) * cs)
                        if clipped is None and drop_empty:
                            continue
                        rows.append(tuple(rec[:gi]) + (cx, cy, clipped))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return src.mapInPandas(run, schema=out_schema)
