"""Quadkey (Bing tile key) computation as NATIVE Spark expressions.

The reference computes quadkeys in a row-at-a-time python UDF
(lat_lon_to_quadkey, core/add_quadkey_column.py:171-235).  Here the whole
computation — Web-Mercator tile math + bit interleaving — is built as a
Spark Column expression tree, so it runs JVM-side inside whole-stage
codegen with no python round-trip.  A matching DuckDB SQL generator keeps
the correctness oracle exactly in sync.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LAT = 85.05112878
MIN_ZOOM, MAX_ZOOM = 0, 23  # reference: core/add_quadkey_column.py:256-261


def _validate_zoom(zoom: int) -> None:
    if not (MIN_ZOOM <= zoom <= MAX_ZOOM):
        raise ValueError(f"zoom must be in [{MIN_ZOOM},{MAX_ZOOM}], got {zoom}")


def tile_xy(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Web-Mercator tile (tx, ty) at ``zoom`` as long Columns.

    NULL *and NaN* coordinates PROPAGATE to NULL tiles: Spark's
    least/greatest skip NULL args and floor(NaN) is 0, so the bare
    clamps silently filed missing coordinates into the top-left tile
    (real-looking quadkey '000…') either way."""
    n = float(1 << zoom)
    # nanvl(v, NULL): same NaN -> NULL contract as when(~isnan(v), v)
    # in one intrinsic (r12)
    lon = F.nanvl(lon, F.lit(None).cast("double"))
    lat = F.nanvl(lat, F.lit(None).cast("double"))
    lat_c = F.greatest(F.lit(-MAX_LAT), F.least(F.lit(MAX_LAT), lat))
    lat_c = F.when(lat.isNotNull(), lat_c)
    x = (lon + F.lit(180.0)) / F.lit(360.0)
    siny = F.sin(F.radians(lat_c))
    y = F.lit(0.5) - F.log((F.lit(1.0) + siny) / (F.lit(1.0) - siny)) / F.lit(4.0 * math.pi)
    fx = F.floor(x * F.lit(n)).cast("long")
    fy = F.floor(y * F.lit(n)).cast("long")
    tx = F.when(fx.isNotNull(),
                F.least(F.lit(int(n) - 1), F.greatest(F.lit(0), fx)))
    ty = F.when(fy.isNotNull(),
                F.least(F.lit(int(n) - 1), F.greatest(F.lit(0), fy)))
    return tx, ty


def quadkey(lon: Column, lat: Column, zoom: int) -> Column:
    """Quadkey string of length ``zoom`` from lon/lat Columns (native exprs)."""
    _validate_zoom(zoom)
    if zoom == 0:
        return F.lit("")
    tx, ty = tile_xy(lon, lat, zoom)
    digits = []
    for i in range(zoom):
        shift = zoom - 1 - i
        bx = F.shiftright(tx, shift) % 2
        by = F.shiftright(ty, shift) % 2
        digits.append((by * 2 + bx).cast("string"))
    return F.concat(*digits)


# --- DuckDB-oracle SQL mirror (same math, same clamping) -------------------

def tile_xy_sql(lon_sql: str, lat_sql: str, zoom: int) -> tuple[str, str]:
    n = float(1 << zoom)
    lat_c = f"greatest(-{MAX_LAT}, least({MAX_LAT}, {lat_sql}))"
    x = f"(({lon_sql}) + 180.0) / 360.0"
    siny = f"sin(radians({lat_c}))"
    y = f"(0.5 - ln((1.0 + {siny}) / (1.0 - {siny})) / {4.0 * math.pi})"
    tx = f"least({int(n)-1}, greatest(0, CAST(floor(({x}) * {n}) AS BIGINT)))"
    ty = f"least({int(n)-1}, greatest(0, CAST(floor(({y}) * {n}) AS BIGINT)))"
    return tx, ty


def quadkey_sql(lon_sql: str, lat_sql: str, zoom: int) -> str:
    _validate_zoom(zoom)
    if zoom == 0:
        return "''"
    tx, ty = tile_xy_sql(lon_sql, lat_sql, zoom)
    digits = []
    for i in range(zoom):
        shift = zoom - 1 - i
        digits.append(
            f"CAST((((ty >> {shift}) & 1) * 2 + ((tx >> {shift}) & 1)) AS VARCHAR)"
        )
    concat = "||".join(digits)
    return f"(SELECT {concat} FROM (SELECT {tx} AS tx, {ty} AS ty) __qk)"
