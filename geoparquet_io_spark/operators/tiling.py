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
    max_cells_per_geometry: int = 1_000_000,
) -> DataFrame:
    """One row per (input geometry, overlapped grid cell) with the
    geometry CLIPPED to that cell.

    Output columns: ``keep_columns`` (default: all non-geometry
    columns) + ``cell_x``, ``cell_y`` (integer cell indices from
    ``origin``) + the clipped ``geometry_column``.  ``drop_empty``
    removes cells where the clip degenerates to nothing (envelope
    overlapped but the geometry itself didn't).

    NULL geometries and geometries with no coordinates (EMPTY, or any
    NaN-enveloped input) overlap no cell and emit nothing — previously
    a single such row crashed every task (``math.floor(nan)``).
    ``max_cells_per_geometry`` is a loud guard against the silent
    worst case at scale: one globe-spanning geometry against a tiny
    cell size would loop billions of clip calls inside one task — an
    unkillable straggler, not a result.  Raise the cap deliberately if
    a geometry legitimately overlaps that many cells."""
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
                if not (math.isfinite(x0) and math.isfinite(y0)
                        and math.isfinite(x1) and math.isfinite(y1)):
                    continue    # EMPTY / NaN geometry: overlaps no cell
                cx0 = math.floor((x0 - ox) / cs)
                cx1 = max(cx0, math.floor((x1 - ox) / cs - 1e-12))
                cy0 = math.floor((y0 - oy) / cs)
                cy1 = max(cy0, math.floor((y1 - oy) / cs - 1e-12))
                n_cells = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
                if n_cells > max_cells_per_geometry:
                    raise ValueError(
                        f"clip_to_grid: a geometry with envelope "
                        f"({x0}, {y0}, {x1}, {y1}) overlaps {n_cells} "
                        f"cells at cell_size={cs} — over the "
                        f"max_cells_per_geometry cap "
                        f"({max_cells_per_geometry}).  Use a coarser "
                        "cell_size or raise the cap deliberately.")
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
