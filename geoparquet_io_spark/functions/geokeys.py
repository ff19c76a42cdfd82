"""Morton (Z-order) keys and geohash encoding as NATIVE Spark expressions.

Complements the Hilbert curve (functions/hilbert.py) and quadkey
(functions/quadkey.py): Z-order is the layout key Delta/Iceberg-style
Z-ORDER compaction uses; geohash is the standard interchange cell string.

Bit interleaving uses the classic magic-mask spread (4 shift/mask steps
per dimension instead of an unrolled per-bit sum), so a 32-bit Morton key
is ~10 integer ops — all inside whole-stage codegen.  The DuckDB SQL
mirrors run the IDENTICAL unrolled steps, keeping oracles bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# (shift, mask) steps spreading bits 0..31 of a long to even positions
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(v: Column) -> Column:
    for shift, mask in _SPREAD_STEPS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def _grid_scale(v: Column, lo: float, hi: float, order: int) -> Column:
    """Same scaling as hilbert.scale_to_grid: floor((v-lo)/span*n + 0.5),
    clamped to [0, 2^order - 1].  NULL *and NaN* coordinates PROPAGATE
    (Spark's least/greatest skip NULL args and floor(NaN) casts to 0 —
    both bare forms fabricated a real-looking cell 0 for missing
    coordinates); a degenerate envelope yields one cell instead of an
    ANSI DIVIDE_BY_ZERO job kill."""
    n = (1 << order) - 1
    # nanvl(v, NULL) == when(~isnan(v), v) with one JVM intrinsic
    # instead of isnan + a branch (r12: ~30% off the key stage)
    v = F.nanvl(v, F.lit(None).cast("double"))  # NaN -> NULL, gated below
    if hi - lo <= 0:
        return F.when(v.isNotNull(), F.lit(0)).cast("long")
    g = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n)) + F.lit(0.5))
    return F.when(
        g.isNotNull(),
        F.least(F.lit(n), F.greatest(F.lit(0), g))).cast("long")


def morton_key(x: Column, y: Column,
               bounds: tuple[float, float, float, float],
               order: int = 16) -> Column:
    """Z-order key over the dataset envelope: interleave ``order``-bit
    grid coords (x -> even bits, y -> odd bits)."""
    if not 1 <= order <= 31:
        raise ValueError(f"order must be in [1,31], got {order}")
    xmin, ymin, xmax, ymax = bounds
    gx = _grid_scale(x, xmin, xmax, order)
    gy = _grid_scale(y, ymin, ymax, order)
    return _spread_bits(gx).bitwiseOR(F.shiftleft(_spread_bits(gy), 1))


def geohash(lon: Column, lat: Column, precision: int = 7) -> Column:
    """Standard geohash string (base-32, lon bit first) from lon/lat."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1,12], got {precision}")
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    gx = _clamped_cell(lon, -180.0, 180.0, lon_bits)
    gy = _clamped_cell(lat, -90.0, 90.0, lat_bits)
    # the stream's FIRST (most significant, index bits-1) bit must be a
    # LON bit: when the total bit count is odd that index is even (lon on
    # even positions), when EVEN it is odd — lon must shift to the odd
    # positions or every even precision encodes transposed cells
    if bits % 2:
        v = _spread_bits(gx).bitwiseOR(F.shiftleft(_spread_bits(gy), 1))
    else:
        v = _spread_bits(gy).bitwiseOR(F.shiftleft(_spread_bits(gx), 1))
    alphabet = F.array(*[F.lit(c) for c in GEOHASH32])
    chars = [
        F.element_at(
            alphabet,
            (F.shiftright(v, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31)) + 1).cast("int"),
        )
        for k in range(precision)
    ]
    # explicit NULL gate: Spark's element_at with a RUNTIME-null index
    # returns the LAST element instead of NULL (observed on 4.1.2), so
    # a missing coordinate would geohash to 'zzz…' without this guard
    return F.when(v.isNotNull(), F.concat(*chars))


def _clamped_cell(v: Column, lo: float, hi: float, nbits: int) -> Column:
    n = 1 << nbits
    v = F.nanvl(v, F.lit(None).cast("double"))  # NaN -> NULL (floor(NaN) is 0)
    g = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n)))
    # NULL propagates: least/greatest skip NULL args, and the bare clamp
    # fabricated a real-looking cell 0 for missing coordinates
    return F.when(
        g.isNotNull(),
        F.least(F.lit(n - 1), F.greatest(F.lit(0), g))).cast("long")


# --- DuckDB-oracle SQL mirrors (identical integer steps) --------------------

def morton_key_sql_ctes(gx_sql: str, gy_sql: str, src_cte: str,
                        id_col: str) -> str:
    """CTE chain computing the morton key as column ``mkey`` from grid
    coords; returns SQL fragment ``m0 AS (...), ..., mfinal AS (...)``."""
    steps = []
    cur = f"SELECT {id_col}, {gx_sql} AS sx, {gy_sql} AS sy FROM {src_cte}"
    steps.append(f"m0 AS ({cur})")
    for i, (shift, mask) in enumerate(_SPREAD_STEPS):
        steps.append(
            f"m{i+1} AS (SELECT {id_col}, "
            f"(sx | (sx << {shift})) & {mask} AS sx, "
            f"(sy | (sy << {shift})) & {mask} AS sy FROM m{i})"
        )
    n = len(_SPREAD_STEPS)
    steps.append(
        f"mfinal AS (SELECT {id_col}, (sx | (sy << 1)) AS mkey FROM m{n})"
    )
    return ", ".join(steps)


def geohash_sql_ctes(lon_sql: str, lat_sql: str, src_cte: str, id_col: str,
                     precision: int = 7) -> str:
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    nx, ny = 1 << lon_bits, 1 << lat_bits
    gx = (f"LEAST({nx - 1}, GREATEST(0, CAST(floor((({lon_sql}) + 180.0) / 360.0 * {float(nx)}) AS BIGINT)))")
    gy = (f"LEAST({ny - 1}, GREATEST(0, CAST(floor((({lat_sql}) + 90.0) / 180.0 * {float(ny)}) AS BIGINT)))")
    # even total bit count: lon must land on ODD interleave positions
    # (mirror of geohash() above — the MSB is always a lon bit)
    if bits % 2:
        ctes = morton_key_sql_ctes(gx, gy, src_cte, id_col)
    else:
        ctes = morton_key_sql_ctes(gy, gx, src_cte, id_col)
    chars = "||".join(
        f"substr('{GEOHASH32}', CAST(((mkey >> {5 * (precision - 1 - k)}) & 31) + 1 AS INT), 1)"
        for k in range(precision)
    )
    return f"{ctes}, gh AS (SELECT {id_col}, {chars} AS geohash FROM mfinal)"
