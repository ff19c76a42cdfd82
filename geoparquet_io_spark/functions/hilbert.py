"""Hilbert-curve distance, vectorized with numpy.

DuckDB's ST_Hilbert (used by the reference for spatial ordering,
core/hilbert_order.py:98-113) maps a geometry's centroid, scaled into a
2^16 x 2^16 grid over a dataset envelope, to the distance along a
Hilbert curve.  This is the standard public xy->d algorithm
(Hamilton / Wikipedia "Hilbert curve"), vectorized over numpy arrays so
a pandas UDF can compute keys per Arrow batch.
"""

from __future__ import annotations

import numpy as np

ORDER = 16  # 2^16 grid per side, like DuckDB spatial's ST_Hilbert


def xy_to_hilbert(x: np.ndarray, y: np.ndarray, order: int = ORDER) -> np.ndarray:
    """Map integer grid coords (uint32 arrays in [0, 2^order)) to Hilbert d."""
    x = x.astype(np.uint64).copy()
    y = y.astype(np.uint64).copy()
    d = np.zeros_like(x, dtype=np.uint64)
    s = np.uint64(1) << np.uint64(order - 1)
    one = np.uint64(1)
    zero = np.uint64(0)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == zero
        flip = swap & (rx == one)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
        s >>= one
    return d


def scale_to_grid(vals: np.ndarray, lo: float, hi: float, order: int = ORDER) -> np.ndarray:
    """Scale doubles in [lo, hi] into [0, 2^order - 1] integer grid."""
    n = (1 << order) - 1
    span = hi - lo
    if span <= 0:
        return np.zeros(len(vals), dtype=np.uint64)
    scaled = np.floor((np.asarray(vals, dtype="f8") - lo) / span * n + 0.5)
    return np.clip(scaled, 0, n).astype(np.uint64)


def hilbert_key(
    x: np.ndarray, y: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float,
    order: int = ORDER,
) -> np.ndarray:
    """Hilbert distance (uint64 -> int64-safe) for coordinate arrays scaled
    to the dataset envelope, mirroring ST_Hilbert(geom, bounds)."""
    gx = scale_to_grid(np.asarray(x, dtype="f8"), xmin, xmax, order)
    gy = scale_to_grid(np.asarray(y, dtype="f8"), ymin, ymax, order)
    return xy_to_hilbert(gx, gy, order).astype(np.int64)
