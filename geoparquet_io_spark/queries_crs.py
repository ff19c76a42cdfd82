"""Oracle-backed reprojection queries for the ellipsoidal projections
(functions/projections.py): Albers 5070, UTM 33N, Lambert-93.

The Spark side runs the REAL operator path (GeoTable.reproject -> WKB
re-encode -> st_x/st_y); the DuckDB oracle mirrors the same public
closed-form formulas with the projection constants embedded as literals
(same trick as the hilbert/quadkey oracles).  Coordinates are rounded to
0.1 m on both sides: numpy and DuckDB libm differ by ulps (~1e-8 m at
this coordinate scale), far below the rounding quantum.

Reference for semantics: core/reproject.py:94-160 and the crs-* fixtures.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from geoparquet_io_spark.functions import geom as G
from geoparquet_io_spark.functions import projections as P
from geoparquet_io_spark.queries import register, _events_points
from geoparquet_io_spark.testsupport.tables import EVENT_LON_SQL, EVENT_LAT_SQL

_EVT = f"SELECT event_id, {EVENT_LON_SQL} AS lon, {EVENT_LAT_SQL} AS lat FROM events"


def _spark_reproject(spark, sf_dir, epsg: str, lon_range=None):
    gt = _events_points(spark, sf_dir)
    df = gt.df
    if lon_range is not None:
        df = df.filter(F.col("lon").between(*lon_range))
        gt = type(gt)(df, gt.geo)
    out = gt.reproject(epsg)
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )



def _wrap_dlon_sql(lon0: float) -> str:
    """SQL mirror of projections._wrap_dlon: wrap (lon - lon0) into
    [-180, 180], preserving exactly +-180 — LCC/Albers theta is LINEAR
    in the delta, so the oracle must wrap exactly like the kernel."""
    d = f"(lon - {lon0!r})"
    return (f"(CASE WHEN abs{d} <= 180.0 THEN {d} "
            f"ELSE (({d} + 540.0) % 360.0) - 180.0 END)")


# --- Albers Equal Area (EPSG:5070, CONUS Albers) ---------------------------

_AC = P.make_albers(*P.GRS80, lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0,
                    fe=0.0, fn=0.0)


def _albers_sql() -> str:
    e, e2 = _AC.e, _AC.e * _AC.e
    return f"""
    WITH pts AS ({_EVT}),
    s AS (SELECT event_id, lon, sin(radians(lat)) AS sp FROM pts),
    q AS (SELECT event_id, lon,
      {1.0 - e2!r} * (sp / (1.0 - {e2!r} * sp * sp)
        - {1.0 / (2.0 * e)!r} * ln((1.0 - {e!r} * sp) / (1.0 + {e!r} * sp))) AS qv
      FROM s),
    r AS (SELECT event_id,
      {_AC.a!r} * sqrt({_AC.C!r} - {_AC.n!r} * qv) / {_AC.n!r} AS rho,
      {_AC.n!r} * radians({_wrap_dlon_sql(_AC.lon0)}) AS theta
      FROM q)
    SELECT event_id,
      ROUND(rho * sin(theta), 1) + 0.0 AS px,
      ROUND({_AC.rho0!r} - rho * cos(theta), 1) + 0.0 AS py
    FROM r
    """


@register("geo_reproject_albers", _albers_sql())
def q_reproject_albers(spark, sf_dir):
    return _spark_reproject(spark, sf_dir, "EPSG:5070")


# --- Lambert Conformal Conic (EPSG:2154, Lambert-93) -----------------------

_LC = P.make_lcc(*P.GRS80, lat1=44.0, lat2=49.0, lat0=46.5, lon0=3.0,
                 fe=700000.0, fn=6600000.0)


def _lcc_sql(_LC=None) -> str:
    _LC = _LC if _LC is not None else globals()["_LC"]
    e = _LC.e
    return f"""
    WITH pts AS ({_EVT}),
    s AS (SELECT event_id, lon, radians(lat) AS phi, sin(radians(lat)) AS sp
          FROM pts),
    t AS (SELECT event_id, lon,
      tan({math.pi / 4.0!r} - phi / 2.0)
        / pow((1.0 - {e!r} * sp) / (1.0 + {e!r} * sp), {e / 2.0!r}) AS tv
      FROM s),
    r AS (SELECT event_id,
      {_LC.a * _LC.F!r} * pow(tv, {_LC.n!r}) AS rho,
      {_LC.n!r} * radians({_wrap_dlon_sql(_LC.lon0)}) AS theta
      FROM t)
    SELECT event_id,
      ROUND({_LC.fe!r} + rho * sin(theta), 1) + 0.0 AS px,
      ROUND({_LC.fn!r} + {_LC.rho0!r} - rho * cos(theta), 1) + 0.0 AS py
    FROM r
    """


@register("geo_reproject_lcc", _lcc_sql())
def q_reproject_lcc(spark, sf_dir):
    return _spark_reproject(spark, sf_dir, "EPSG:2154")


# --- Transverse Mercator (EPSG:32633, UTM zone 33N) ------------------------
# restricted to the zone's own longitude band (the Krueger series is a
# near-zone expansion; both sides would agree anywhere, but values far
# outside the band are not meaningful UTM coordinates)

_TC = P.make_tm(*P.WGS84, lat0=0.0, lon0=15.0, k0=0.9996,
                fe=500000.0, fn=0.0)


def _tm_sql() -> str:
    e = _TC.e
    kA = _TC.k0 * _TC.A
    # xi/eta series: sinh/cosh/atanh/asinh spelled via exp/ln (DuckDB has no
    # hyperbolics); ulp-level differences vs numpy are absorbed by ROUND(.,1)
    xi_terms = " + ".join(
        f"{a!r} * sin({2 * j} * xip) * ((exp({2 * j} * etap) + exp({-2 * j} * etap)) / 2.0)"
        for j, a in enumerate(_TC.alpha, start=1)
    )
    eta_terms = " + ".join(
        f"{a!r} * cos({2 * j} * xip) * ((exp({2 * j} * etap) - exp({-2 * j} * etap)) / 2.0)"
        for j, a in enumerate(_TC.alpha, start=1)
    )
    return f"""
    WITH pts AS ({_EVT}),
    zone AS (SELECT * FROM pts WHERE lon BETWEEN 9.0 AND 21.0),
    a1 AS (SELECT event_id, lon, tan(radians(lat)) AS t FROM zone),
    a2 AS (SELECT event_id, lon, t,
      (exp({e!r} * 0.5 * ln((1.0 + {e!r} * t / sqrt(1.0 + t * t))
                          / (1.0 - {e!r} * t / sqrt(1.0 + t * t))))
       - exp(-({e!r} * 0.5 * ln((1.0 + {e!r} * t / sqrt(1.0 + t * t))
                              / (1.0 - {e!r} * t / sqrt(1.0 + t * t)))))) / 2.0 AS sig
      FROM a1),
    a3 AS (SELECT event_id, t, sig,
      t * sqrt(1.0 + sig * sig) - sig * sqrt(1.0 + t * t) AS tp,
      radians(lon - {_TC.lon0!r}) AS dlon
      FROM a2),
    a4 AS (SELECT event_id,
      atan2(tp, cos(dlon)) AS xip,
      ln(sin(dlon) / sqrt(tp * tp + cos(dlon) * cos(dlon))
         + sqrt(sin(dlon) * sin(dlon) / (tp * tp + cos(dlon) * cos(dlon)) + 1.0)) AS etap
      FROM a3)
    SELECT event_id,
      ROUND({_TC.fe!r} + {kA!r} * (etap + {eta_terms}), 1) + 0.0 AS px,
      ROUND({kA!r} * (xip + {xi_terms}), 1) + 0.0 AS py
    FROM a4
    """


@register("geo_reproject_utm33", _tm_sql())
def q_reproject_utm33(spark, sf_dir):
    return _spark_reproject(spark, sf_dir, "EPSG:32633", lon_range=(9.0, 21.0))


# --- H3 res-0 base cells (derivation-validated kernel) ----------------------

def _h3_res0_oracle() -> str:
    """The SQL mirrors functions/h3.py op-for-op: containing-face argmax,
    gnomonic projection with embedded face frames, deterministic cube
    rounding, and the derived (face, slot) -> base-cell LUT as literals."""
    from geoparquet_io_spark.functions import h3 as _hk

    o = _hk.res0_oracle_sql("lat", "lng")
    return f"""
    WITH __src__ AS (SELECT event_id, {EVENT_LAT_SQL} AS lat,
                            {EVENT_LON_SQL} AS lng FROM events),
    {o['ctes']}
    SELECT cell AS h3_res0, CAST(COUNT(*) AS BIGINT) AS n
    FROM ijk {o['join']}
    GROUP BY 1
    """


@register("geo_h3_res0", _h3_res0_oracle())
def q_h3_res0(spark, sf_dir):
    """True H3 base-cell counts over the events points — H3-compatible ids
    (validated: pentagon set + published SF base cell; functions/h3.py).
    Reference: core/add_h3_column.py:57-84 at resolution 0."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    # no type hints: `from __future__ import annotations` stringifies them
    # beyond what pandas_udf's inference accepts; legacy SCALAR inference
    # from the decorator argument is what we want anyway
    @pandas_udf(LongType())
    def _cell(lats, lons):
        import numpy as np

        from geoparquet_io_spark.functions import h3 as _hk

        la = lats.to_numpy(dtype=np.float64)
        lo = lons.to_numpy(dtype=np.float64)
        return pd.Series(_hk.latlng_to_res0_cell(la, lo))

    gt = _events_points(spark, sf_dir)
    return (gt.df.select(_cell(F.col("lat"), F.col("lon")).alias("h3_res0"))
            .groupBy("h3_res0").agg(F.count("*").alias("n")))


# --- Polar Stereographic North (EPSG:3413, NSIDC sea ice grid) -------------

_PS = P.make_polar_stereo(*P.WGS84, lat_ts=70.0, lon0=-45.0, fe=0.0, fn=0.0)


def _ps_north_sql() -> str:
    e = _PS.e
    return f"""
    WITH pts AS ({_EVT}),
    s AS (SELECT event_id, lon, radians(lat) AS phi, sin(radians(lat)) AS sp FROM pts),
    t AS (SELECT event_id, lon,
      tan(pi() / 4.0 - phi / 2.0)
        * pow((1.0 + {e!r} * sp) / (1.0 - {e!r} * sp), {e / 2.0!r}) AS tv
      FROM s),
    r AS (SELECT event_id,
      CAST({_PS.a!r} AS DOUBLE) * {_PS.mc!r} * tv / {_PS.tc!r} AS rho,
      radians(lon - {_PS.lon0!r}) AS dlam
      FROM t)
    SELECT event_id,
      ROUND(rho * sin(dlam), 1) + 0.0 AS px,
      ROUND(-rho * cos(dlam), 1) + 0.0 AS py
    FROM r
    """


@register("geo_reproject_ps_north", _ps_north_sql())
def q_reproject_ps_north(spark, sf_dir):
    """Polar Stereographic variant B (Snyder pp. 160-162; EPSG method
    9829) — the NSIDC sea-ice grid the polar EO community exchanges.
    Reference semantics: core/reproject.py:94-160 (arbitrary PROJ pair)."""
    return _spark_reproject(spark, sf_dir, "EPSG:3413")


# --- OSGB 27700: Helmert datum shift + Airy TM, full SQL mirror ------------

_OSGB_TC = P.make_tm(*P.AIRY1830, lat0=49.0, lon0=-2.0, k0=0.9996012717,
                     fe=400000.0, fn=-100000.0)


def _osgb_sql() -> str:
    """DuckDB mirror of the whole EPSG:27700 pipeline: WGS84 lon/lat ->
    ECEF -> inverse position-vector Helmert (WGS84 -> OSGB36) -> geodetic
    on Airy 1830 (5 unrolled lat iterations) -> Krueger-series TM.
    Constants embedded as literals; 0.1 m rounding absorbs libm ulps."""
    wa, wf = P.WGS84
    we2 = 2.0 * wf - wf * wf
    aa, af = P.AIRY1830
    ae2 = 2.0 * af - af * af
    tx, ty, tz, rx, ry, rz, s = P._DATUM_OSGB36
    # inverse (WGS84 -> OSGB36): negate position-vector params
    import math as _m
    arc = _m.pi / (180.0 * 3600.0)
    m = 1.0 - s * 1e-6
    rxr, ryr, rzr = -rx * arc, -ry * arc, -rz * arc
    c = _OSGB_TC
    e = c.e
    kA = c.k0 * c.A
    xi_terms = " + ".join(
        f"{a!r} * sin({2 * j} * xip) * ((exp({2 * j} * etap) + exp({-2 * j} * etap)) / 2.0)"
        for j, a in enumerate(c.alpha, start=1))
    eta_terms = " + ".join(
        f"{a!r} * cos({2 * j} * xip) * ((exp({2 * j} * etap) - exp({-2 * j} * etap)) / 2.0)"
        for j, a in enumerate(c.alpha, start=1))
    lat_step = (
        "atan2(Z, p * (1.0 - {ae2} * ({aa} / sqrt(1.0 - {ae2} * sin(la{i}) * sin(la{i})))"
        " / (({aa} / sqrt(1.0 - {ae2} * sin(la{i}) * sin(la{i})))"
        " + p / cos(la{i}) - ({aa} / sqrt(1.0 - {ae2} * sin(la{i}) * sin(la{i}))))))"
    )
    lat_ctes = ",\n    ".join(
        f"it{i + 1} AS (SELECT event_id, Z, p, lon2, "
        + lat_step.format(ae2=repr(ae2), aa=repr(aa), i=i)
        + f" AS la{i + 1} FROM it{i})"
        for i in range(5)
    )
    return f"""
    WITH pts AS ({_EVT}),
    win AS (SELECT * FROM pts WHERE lon BETWEEN -14.0 AND 10.0
                                AND lat BETWEEN 45.0 AND 75.0),
    g AS (SELECT event_id,
      ({wa!r} / sqrt(1.0 - {we2!r} * sin(radians(lat)) * sin(radians(lat))))
        * cos(radians(lat)) * cos(radians(lon)) AS X0,
      ({wa!r} / sqrt(1.0 - {we2!r} * sin(radians(lat)) * sin(radians(lat))))
        * cos(radians(lat)) * sin(radians(lon)) AS Y0,
      ({wa!r} / sqrt(1.0 - {we2!r} * sin(radians(lat)) * sin(radians(lat))))
        * (1.0 - {we2!r}) * sin(radians(lat)) AS Z0
      FROM win),
    h AS (SELECT event_id,
      {m!r} * (X0 - ({rzr!r}) * Y0 + ({ryr!r}) * Z0) + ({-tx!r}) AS X,
      {m!r} * (({rzr!r}) * X0 + Y0 - ({rxr!r}) * Z0) + ({-ty!r}) AS Y,
      {m!r} * (-(({ryr!r})) * X0 + ({rxr!r}) * Y0 + Z0) + ({-tz!r}) AS Z
      FROM g),
    it0 AS (SELECT event_id, Z, sqrt(X * X + Y * Y) AS p,
                   atan2(Y, X) AS lon2,
                   atan2(Z, sqrt(X * X + Y * Y) * (1.0 - {ae2!r})) AS la0
            FROM h),
    {lat_ctes},
    ll AS (SELECT event_id, degrees(lon2) AS lon, degrees(la5) AS lat FROM it5),
    a1 AS (SELECT event_id, lon, tan(radians(lat)) AS t FROM ll),
    a2 AS (SELECT event_id, lon, t,
      (exp({e!r} * 0.5 * ln((1.0 + {e!r} * t / sqrt(1.0 + t * t))
                          / (1.0 - {e!r} * t / sqrt(1.0 + t * t))))
       - exp(-({e!r} * 0.5 * ln((1.0 + {e!r} * t / sqrt(1.0 + t * t))
                              / (1.0 - {e!r} * t / sqrt(1.0 + t * t)))))) / 2.0 AS sig
      FROM a1),
    a3 AS (SELECT event_id, t, sig,
      t * sqrt(1.0 + sig * sig) - sig * sqrt(1.0 + t * t) AS tp,
      radians(lon - {c.lon0!r}) AS dlon
      FROM a2),
    a4 AS (SELECT event_id,
      atan2(tp, cos(dlon)) AS xip,
      ln(sin(dlon) / sqrt(tp * tp + cos(dlon) * cos(dlon))
         + sqrt(sin(dlon) * sin(dlon) / (tp * tp + cos(dlon) * cos(dlon)) + 1.0)) AS etap
      FROM a4src)
    SELECT event_id,
      ROUND({c.fe!r} + {kA!r} * (etap + {eta_terms}), 1) + 0.0 AS px,
      ROUND({c.fn!r} - {c.k0 * c.m0!r} + {kA!r} * (xip + {xi_terms}), 1) + 0.0 AS py
    FROM a4
    """.replace("FROM a4src", "FROM a3")


@register("geo_reproject_osgb", _osgb_sql())
def q_reproject_osgb(spark, sf_dir):
    """EPSG:27700 (British National Grid): the full datum-shifted path —
    position-vector Helmert onto OSGB36, Airy 1830 Krueger TM.  Kernel
    parameters are validated against the published OS worked example in
    tests/test_projections_epsg.py; the oracle mirrors every step in SQL."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(-14.0, 10.0)
                      & F.col("lat").between(45.0, 75.0))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject("EPSG:27700")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


# --- r4: data-driven EPSG table codes (functions/projections.py
# EPSG_TABLE) — one newly-wired national grid per family shape ---------------

_PL = P.make_tm(*P.GRS80, lat0=0.0, lon0=19.0, k0=0.9993,
                fe=500000.0, fn=-5300000.0)


def _tm_registry_sql(_PL, lon_lo: float, lon_hi: float) -> str:
    """Parameterized TM oracle: same Krueger machinery as the UTM
    oracle with an arbitrary registry row's constants, zone-banded so
    the near-zone series is meaningful on both sides."""
    e = _PL.e
    kA = _PL.k0 * _PL.A
    eta_terms = " + ".join(
        f"{a!r} * cos({2 * j} * xip) * ((exp({2 * j} * etap) - exp({-2 * j} * etap)) / 2.0)"
        for j, a in enumerate(_PL.alpha, start=1))
    xi_terms = " + ".join(
        f"{a!r} * sin({2 * j} * xip) * ((exp({2 * j} * etap) + exp({-2 * j} * etap)) / 2.0)"
        for j, a in enumerate(_PL.alpha, start=1))
    return f"""
    WITH pts AS ({_EVT}),
    zone AS (SELECT * FROM pts WHERE lon BETWEEN {lon_lo!r} AND {lon_hi!r}),
    a1 AS (SELECT event_id, lon, tan(radians(lat)) AS t FROM zone),
    a2 AS (SELECT event_id, lon, t,
      (exp({e!r} * 0.5 * ln((1.0 + {e!r} * t / sqrt(1.0 + t * t))
                          / (1.0 - {e!r} * t / sqrt(1.0 + t * t))))
       - exp(-({e!r} * 0.5 * ln((1.0 + {e!r} * t / sqrt(1.0 + t * t))
                              / (1.0 - {e!r} * t / sqrt(1.0 + t * t)))))) / 2.0 AS sig
      FROM a1),
    a3 AS (SELECT event_id, t, sig,
      t * sqrt(1.0 + sig * sig) - sig * sqrt(1.0 + t * t) AS tp,
      radians(lon - {_PL.lon0!r}) AS dlon
      FROM a2),
    a4 AS (SELECT event_id,
      atan2(tp, cos(dlon)) AS xip,
      ln(sin(dlon) / sqrt(tp * tp + cos(dlon) * cos(dlon))
         + sqrt(sin(dlon) * sin(dlon) / (tp * tp + cos(dlon) * cos(dlon)) + 1.0)) AS etap
      FROM a3)
    SELECT event_id,
      ROUND({_PL.fe!r} + {kA!r} * (etap + {eta_terms}), 1) + 0.0 AS px,
      ROUND({_PL.fn - _PL.k0 * _PL.m0!r} + {kA!r} * (xip + {xi_terms}), 1)
        + 0.0 AS py
    FROM a4
    """


@register("geo_reproject_poland_tm", _tm_registry_sql(_PL, 13.0, 25.0))
def q_reproject_poland_tm(spark, sf_dir):
    """EPSG:2180 via the data-driven EPSG_TABLE row (TM family, CS92
    constants: k0=0.9993, FN=-5.3e6) — validates the table dispatch
    end-to-end against the formula oracle."""
    return _spark_reproject(spark, sf_dir, "EPSG:2180", lon_range=(13.0, 25.0))


# --- r7: generated-series registry rows driven end-to-end --------------------

_JP9 = P.make_tm(*P.GRS80, lat0=36.0, lon0=139.0 + 50.0 / 60.0, k0=0.9999,
                 fe=0.0, fn=0.0)


@register("geo_reproject_jgd2011_ix", _tm_registry_sql(_JP9, 133.0, 147.0))
def q_reproject_jgd2011_ix(spark, sf_dir):
    """EPSG:6677 (JGD2011 / Japan Plane Rectangular CS IX) via the r7
    GENERATED series rows (projections._generated_epsg_rows) — the
    first TM oracle with a nonzero latitude of origin, so it also pins
    the k0*m0 meridian-arc offset end-to-end."""
    return _spark_reproject(spark, sf_dir, "EPSG:6677",
                            lon_range=(133.0, 147.0))


_CC49 = P.make_lcc(*P.GRS80, lat1=48.25, lat2=49.75, lat0=49.0, lon0=3.0,
                   fe=1700000.0, fn=8200000.0)


@register("geo_reproject_rgf93_cc49", _lcc_sql(_CC49))
def q_reproject_rgf93_cc49(spark, sf_dir):
    """EPSG:3949 (RGF93 v1 / CC49) via the r7 generated RGF93 conic
    band series — one-degree LCC band, northing offset 8200 km."""
    return _spark_reproject(spark, sf_dir, "EPSG:3949")


_CA = P.make_lcc(*P.GRS80, lat1=49.0, lat2=77.0, lat0=49.0, lon0=-95.0,
                 fe=0.0, fn=0.0)


@register("geo_reproject_canada_lcc", _lcc_sql(_CA))
def q_reproject_canada_lcc(spark, sf_dir):
    """EPSG:3978 (NAD83 / Canada Atlas Lambert) via the EPSG_TABLE row —
    the parametrized LCC oracle with the Canada Atlas constants."""
    return _spark_reproject(spark, sf_dir, "EPSG:3978")


_EASE = P.make_cea(*P.WGS84, lat_ts=30.0, lon0=0.0, fe=0.0, fn=0.0)


def _cea_sql() -> str:
    """EPSG:6933 (WGS84 / NSIDC EASE-Grid 2.0 Global) — cylindrical
    equal-area: x = a*k0*lambda, y = a*q/(2*k0) with Snyder's authalic
    q; every constant is baked from the same make_cea row the engine
    dispatches to, so a table typo breaks the match."""
    e, e2 = _EASE.e, _EASE.e * _EASE.e
    return f"""
    WITH pts AS ({_EVT}),
    s AS (SELECT event_id, lon, sin(radians(lat)) AS sp FROM pts),
    q AS (SELECT event_id, lon,
      {1.0 - e2!r} * (sp / (1.0 - {e2!r} * sp * sp)
        - {1.0 / (2.0 * e)!r} * ln((1.0 - {e!r} * sp) / (1.0 + {e!r} * sp))) AS qv
      FROM s)
    SELECT event_id,
      ROUND({_EASE.a * _EASE.k0!r} * radians(lon), 1) + 0.0 AS px,
      ROUND({_EASE.a / (2.0 * _EASE.k0)!r} * qv, 1) + 0.0 AS py
    FROM q
    """


@register("geo_reproject_ease2", _cea_sql())
def q_reproject_ease2(spark, sf_dir):
    """EPSG:6933 via the EPSG_TABLE cea row — the kernel whose x(+-180)
    extent matches the published EASE-Grid 2.0 grid to the cm
    (tests/test_projections_epsg.py)."""
    return _spark_reproject(spark, sf_dir, "EPSG:6933")


# --- r6: parameterized-CRS escape hatch (projections.proj_from_params) ------
# A code ABSENT from the EPSG registry works by passing its published
# parameters as a dict — the reference reaches the same CRSs through
# PROJ's database (core/reproject.py:94-160).

# EPSG:5243 (ETRS89 / LCC Germany) — deliberately NOT in EPSG_TABLE
_DE5243 = {"family": "lcc", "ellps": "GRS80",
           "lat1": 48.0 + 40.0 / 60.0, "lat2": 53.0 + 40.0 / 60.0,
           "lat0": 51.0, "lon0": 10.5, "fe": 0.0, "fn": 0.0,
           "crs": "EPSG:5243"}
_DE_C = P.make_lcc(*P.GRS80, lat1=_DE5243["lat1"], lat2=_DE5243["lat2"],
                   lat0=51.0, lon0=10.5, fe=0.0, fn=0.0)


@register("geo_reproject_params_lcc", _lcc_sql(_DE_C))
def q_reproject_params_lcc(spark, sf_dir):
    """EPSG:5243 via the PARAMETER-DICT path: the code is not in the
    registry (get_transformer('EPSG:5243') raises), so the query passes
    {'family': 'lcc', 'ellps': 'GRS80', ...} — the arbitrary-CRS escape
    hatch.  Oracle is the same parameterized LCC formula mirror."""
    return _spark_reproject(spark, sf_dir, _DE5243)


# EPSG:31287 (MGI / Austria Lambert) — Bessel 1841 + MGI->WGS84 Helmert,
# also NOT in EPSG_TABLE; exercises the params path's towgs84 branch.
_AT_TOWGS84 = (577.326, 90.129, 463.919, 5.137, 1.474, 5.297, 2.4232)
_AT31287 = {"family": "lcc", "ellps": "BESSEL1841",
            "lat1": 49.0, "lat2": 46.0, "lat0": 47.5,
            "lon0": 13.0 + 20.0 / 60.0, "fe": 400000.0, "fn": 400000.0,
            "towgs84": list(_AT_TOWGS84), "crs": "EPSG:31287"}
_AT_C = P.make_lcc(*P.BESSEL1841, lat1=49.0, lat2=46.0, lat0=47.5,
                   lon0=13.0 + 20.0 / 60.0, fe=400000.0, fn=400000.0)


def _austria_lcc_sql() -> str:
    """DuckDB mirror of the full EPSG:31287 pipeline: WGS84 -> ECEF ->
    inverse position-vector Helmert (WGS84 -> MGI) -> geodetic on
    Bessel 1841 (5 unrolled lat iterations) -> LCC-2SP.  Same Helmert
    CTE shape as the OSGB oracle with the MGI constants."""
    wa, wf = P.WGS84
    we2 = 2.0 * wf - wf * wf
    ba, bf = P.BESSEL1841
    be2 = 2.0 * bf - bf * bf
    tx, ty, tz, rx, ry, rz, s = _AT_TOWGS84
    import math as _m
    arc = _m.pi / (180.0 * 3600.0)
    m = 1.0 - s * 1e-6
    rxr, ryr, rzr = -rx * arc, -ry * arc, -rz * arc
    c = _AT_C
    e = c.e
    lat_step = (
        "atan2(Z, p * (1.0 - {be2} * ({ba} / sqrt(1.0 - {be2} * sin(la{i}) * sin(la{i})))"
        " / (({ba} / sqrt(1.0 - {be2} * sin(la{i}) * sin(la{i})))"
        " + p / cos(la{i}) - ({ba} / sqrt(1.0 - {be2} * sin(la{i}) * sin(la{i}))))))"
    )
    lat_ctes = ",\n    ".join(
        f"it{i + 1} AS (SELECT event_id, Z, p, lon2, "
        + lat_step.format(be2=repr(be2), ba=repr(ba), i=i)
        + f" AS la{i + 1} FROM it{i})"
        for i in range(5)
    )
    return f"""
    WITH pts AS ({_EVT}),
    win AS (SELECT * FROM pts WHERE lon BETWEEN 9.0 AND 18.0
                                AND lat BETWEEN 45.0 AND 50.0),
    g AS (SELECT event_id,
      ({wa!r} / sqrt(1.0 - {we2!r} * sin(radians(lat)) * sin(radians(lat))))
        * cos(radians(lat)) * cos(radians(lon)) AS X0,
      ({wa!r} / sqrt(1.0 - {we2!r} * sin(radians(lat)) * sin(radians(lat))))
        * cos(radians(lat)) * sin(radians(lon)) AS Y0,
      ({wa!r} / sqrt(1.0 - {we2!r} * sin(radians(lat)) * sin(radians(lat))))
        * (1.0 - {we2!r}) * sin(radians(lat)) AS Z0
      FROM win),
    h AS (SELECT event_id,
      {m!r} * (X0 - ({rzr!r}) * Y0 + ({ryr!r}) * Z0) + ({-tx!r}) AS X,
      {m!r} * (({rzr!r}) * X0 + Y0 - ({rxr!r}) * Z0) + ({-ty!r}) AS Y,
      {m!r} * (-(({ryr!r})) * X0 + ({rxr!r}) * Y0 + Z0) + ({-tz!r}) AS Z
      FROM g),
    it0 AS (SELECT event_id, Z, sqrt(X * X + Y * Y) AS p,
                   atan2(Y, X) AS lon2,
                   atan2(Z, sqrt(X * X + Y * Y) * (1.0 - {be2!r})) AS la0
            FROM h),
    {lat_ctes},
    ll AS (SELECT event_id, degrees(lon2) AS lon, la5 AS phi,
                  sin(la5) AS sp FROM it5),
    t AS (SELECT event_id, lon,
      tan({_m.pi / 4.0!r} - phi / 2.0)
        / pow((1.0 - {e!r} * sp) / (1.0 + {e!r} * sp), {e / 2.0!r}) AS tv
      FROM ll),
    r AS (SELECT event_id,
      {c.a * c.F!r} * pow(tv, {c.n!r}) AS rho,
      {c.n!r} * radians({_wrap_dlon_sql(c.lon0)}) AS theta
      FROM t)
    SELECT event_id,
      ROUND({c.fe!r} + rho * sin(theta), 1) + 0.0 AS px,
      ROUND({c.fn!r} + {c.rho0!r} - rho * cos(theta), 1) + 0.0 AS py
    FROM r
    """


@register("geo_reproject_params_datum", _austria_lcc_sql())
def q_reproject_params_datum(spark, sf_dir):
    """EPSG:31287 via the parameter-dict path WITH towgs84: Bessel 1841
    LCC plus the published MGI->WGS84 position-vector Helmert — proves
    the escape hatch covers datum-shifted CRSs, not just
    WGS84-coincident ones.  Oracle mirrors every step in SQL."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(9.0, 18.0)
                      & F.col("lat").between(45.0, 50.0))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject(_AT31287)
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


# --- r8: generated-series + SPCS83 registry rows driven end-to-end -----------

_MGA55 = P.make_tm(*P.GRS80, lat0=0.0, lon0=147.0, k0=0.9996,
                   fe=500000.0, fn=10000000.0)


@register("geo_reproject_mga2020_55", _tm_registry_sql(_MGA55, 141.0, 153.0))
def q_reproject_mga2020_55(spark, sf_dir):
    """EPSG:7855 (GDA2020 / MGA zone 55) via the r8 MGA2020 range rule —
    the first southern-hemisphere TM oracle (FN 10,000 km), so it also
    pins the false-northing sign convention end-to-end."""
    return _spark_reproject(spark, sf_dir, "EPSG:7855",
                            lon_range=(141.0, 153.0))


_NTM10 = P.make_tm(*P.GRS80, lat0=58.0, lon0=10.5, k0=1.0,
                   fe=100000.0, fn=1000000.0)


@register("geo_reproject_ntm10", _tm_registry_sql(_NTM10, 4.5, 16.5))
def q_reproject_ntm10(spark, sf_dir):
    """EPSG:5110 (ETRS89 / NTM zone 10) via the r8 generated Norway
    series (1-degree belts, k0 = 1): narrowest TM belt in the registry
    plus a nonzero lat0, exercising the k0*m0 offset at k0 exactly 1."""
    return _spark_reproject(spark, sf_dir, "EPSG:5110",
                            lon_range=(4.5, 16.5))


_CA5 = P.make_lcc(*P.GRS80, lat1=34.0 + 2.0 / 60.0, lat2=35.0 + 28.0 / 60.0,
                  lat0=33.5, lon0=-118.0, fe=2000000.0, fn=500000.0)


@register("geo_reproject_spcs_ca5", _lcc_sql(_CA5))
def q_reproject_spcs_ca5(spark, sf_dir):
    """EPSG:26945 (NAD83 / California zone 5) via the r8 SPCS83 spec
    table — validates the State Plane dispatch end-to-end against the
    parameterized LCC formula oracle."""
    return _spark_reproject(spark, sf_dir, "EPSG:26945")


# --- r9: SWEREF99 local / Estonia 1997 / DKTM series rows driven end-to-end --

_SW1330 = P.make_tm(*P.GRS80, lat0=0.0, lon0=13.5, k0=1.0,
                    fe=150000.0, fn=0.0)


@register("geo_reproject_sweref1330", _tm_registry_sql(_SW1330, 7.5, 19.5))
def q_reproject_sweref1330(spark, sf_dir):
    """EPSG:3008 (SWEREF99 13 30) via the r9 generated Swedish local
    series — the narrow-belt k0=1 / FE 150 km shape, and the first of
    the irregular dd-mm central meridians (13.5 deg) in an oracle."""
    return _spark_reproject(spark, sf_dir, "EPSG:3008",
                            lon_range=(7.5, 19.5))


_EST97 = P.make_lcc(*P.GRS80, lat1=59.0 + 20.0 / 60.0, lat2=58.0,
                    lat0=57.0 + 31.0 / 60.0 + 3.19415 / 3600.0,
                    lon0=24.0, fe=500000.0, fn=6375000.0)


@register("geo_reproject_estonia97", _lcc_sql(_EST97))
def q_reproject_estonia97(spark, sf_dir):
    """EPSG:3301 (Estonian Coordinate System of 1997) via the r9 pinned
    LCC row — north-first standard parallels (59 deg 20 min over 58)
    with a 6,375 km false northing, the first Baltic conic oracle."""
    return _spark_reproject(spark, sf_dir, "EPSG:3301")


_DKTM3 = P.make_tm(*P.GRS80, lat0=0.0, lon0=11.75, k0=0.99998,
                   fe=600000.0, fn=-5000000.0)


@register("geo_reproject_dktm3", _tm_registry_sql(_DKTM3, 5.75, 17.75))
def q_reproject_dktm3(spark, sf_dir):
    """EPSG:4095 (ETRS89 / DKTM3) via the r9 generated Danish series —
    fractional central meridian (11.75), sub-unity k0 (0.99998) and a
    NEGATIVE 5,000 km false northing in one row."""
    return _spark_reproject(spark, sf_dir, "EPSG:4095",
                            lon_range=(5.75, 17.75))


# --- round-9b oracles: UPS (variant A), southern GK from the pole, ---------
# --- SIRGAS UTM south ------------------------------------------------------

_UPS_N = P.make_polar_stereo(*P.WGS84, lat_ts=90.0, lon0=0.0,
                             fe=2000000.0, fn=2000000.0, k0=0.994)


def _ups_north_sql() -> str:
    """Polar stereographic VARIANT A (EPSG method 9810, pole-tangent
    k0): same SQL shape as the 3413 variant-B oracle — the k0 form is
    baked into the (mc, tc=1) constants by make_polar_stereo."""
    e = _UPS_N.e
    return f"""
    WITH pts AS ({_EVT}),
    s AS (SELECT event_id, lon, radians(lat) AS phi,
                 sin(radians(lat)) AS sp FROM pts WHERE lat >= 55.0),
    t AS (SELECT event_id, lon,
      tan(pi() / 4.0 - phi / 2.0)
        * pow((1.0 + {e!r} * sp) / (1.0 - {e!r} * sp), {e / 2.0!r}) AS tv
      FROM s),
    r AS (SELECT event_id,
      CAST({_UPS_N.a!r} AS DOUBLE) * {_UPS_N.mc!r} * tv / {_UPS_N.tc!r} AS rho,
      radians(lon - {_UPS_N.lon0!r}) AS dlam
      FROM t)
    SELECT event_id,
      ROUND({_UPS_N.fe!r} + rho * sin(dlam), 1) + 0.0 AS px,
      ROUND({_UPS_N.fn!r} - rho * cos(dlam), 1) + 0.0 AS py
    FROM r
    """


@register("geo_reproject_ups_north", _ups_north_sql())
def q_reproject_ups_north(spark, sf_dir):
    """EPSG:32661 (WGS 84 / UPS North) — the military/polar grid, and
    the registry's first VARIANT-A polar stereographic (k0 = 0.994 AT
    the pole, where variant B's lat_ts constants divide 0/0).  Matches
    the EPSG Guidance Note worked example to the cm (unit test).
    Reference semantics: core/reproject.py:94-160."""
    return _spark_reproject_lat(spark, sf_dir, "EPSG:32661", lat_min=55.0)


def _spark_reproject_lat(spark, sf_dir, epsg: str, lat_min=None,
                         lat_max=None):
    gt = _events_points(spark, sf_dir)
    df = gt.df
    if lat_min is not None:
        df = df.filter(F.col("lat") >= lat_min)
    if lat_max is not None:
        df = df.filter(F.col("lat") <= lat_max)
    gt = type(gt)(df, gt.geo)
    out = gt.reproject(epsg)
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


_POSGAR5 = P.make_tm(*P.GRS80, lat0=-90.0, lon0=-60.0, k0=1.0,
                     fe=5500000.0, fn=0.0)


@register("geo_reproject_posgar5", _tm_registry_sql(_POSGAR5, -63.0, -57.0))
def q_reproject_posgar5(spark, sf_dir):
    """EPSG:5347 (POSGAR 2007 / Argentina faja 5) via the r9b generated
    series — the first oracle whose latitude of origin is the SOUTH
    POLE (lat0 = -90: the Krueger m0 term is a quarter-meridian), the
    Argentine Gauss-Kruger convention."""
    return _spark_reproject(spark, sf_dir, "EPSG:5347",
                            lon_range=(-63.0, -57.0))


_SIRGAS23S = P.make_tm(*P.GRS80, lat0=0.0, lon0=-45.0, k0=0.9996,
                       fe=500000.0, fn=10000000.0)


@register("geo_reproject_sirgas_utm23s",
          _tm_registry_sql(_SIRGAS23S, -48.0, -42.0))
def q_reproject_sirgas_utm23s(spark, sf_dir):
    """EPSG:31983 (SIRGAS 2000 / UTM 23S — the Sao Paulo zone) via the
    r9b generated Brazilian series: southern-hemisphere UTM (FN 10,000
    km) under the SIRGAS frame."""
    return _spark_reproject(spark, sf_dir, "EPSG:31983",
                            lon_range=(-48.0, -42.0))


# --- round-10 oracles: oblique stereographic (RD New), Gauss-sphere --------
# --- oblique Mercator with scale (EOV), Mollweide (ESRI:54009) --------------

def _helmert_ll_ctes(datum, local_ell, lon_lo, lon_hi, lat_lo, lat_hi) -> str:
    """CTE prefix ``pts .. ll`` mirroring the kernel's WGS84 -> local
    datum chain in SQL: geodetic -> ECEF on WGS84, inverse
    position-vector Helmert (all 7 parameters negated, exactly like
    projections._helmert_apply(inverse=True)), then 5 unrolled
    geodetic-latitude iterations on the local ellipsoid — the same
    blocks the OSGB oracle uses, parameterized for any pinned datum."""
    wa, wf = P.WGS84
    we2 = 2.0 * wf - wf * wf
    aa, af = local_ell
    ae2 = 2.0 * af - af * af
    tx, ty, tz, rx, ry, rz, s = datum
    arc = math.pi / (180.0 * 3600.0)
    m = 1.0 - s * 1e-6
    rxr, ryr, rzr = -rx * arc, -ry * arc, -rz * arc
    lat_step = (
        "atan2(Z, p * (1.0 - {ae2} * ({aa} / sqrt(1.0 - {ae2} * sin(la{i}) * sin(la{i})))"
        " / (({aa} / sqrt(1.0 - {ae2} * sin(la{i}) * sin(la{i})))"
        " + p / cos(la{i}) - ({aa} / sqrt(1.0 - {ae2} * sin(la{i}) * sin(la{i}))))))"
    )
    lat_ctes = ",\n    ".join(
        f"it{i + 1} AS (SELECT event_id, Z, p, lon2, "
        + lat_step.format(ae2=repr(ae2), aa=repr(aa), i=i)
        + f" AS la{i + 1} FROM it{i})"
        for i in range(5)
    )
    return f"""
    WITH pts AS ({_EVT}),
    win AS (SELECT * FROM pts WHERE lon BETWEEN {lon_lo!r} AND {lon_hi!r}
                                AND lat BETWEEN {lat_lo!r} AND {lat_hi!r}),
    g AS (SELECT event_id,
      ({wa!r} / sqrt(1.0 - {we2!r} * sin(radians(lat)) * sin(radians(lat))))
        * cos(radians(lat)) * cos(radians(lon)) AS X0,
      ({wa!r} / sqrt(1.0 - {we2!r} * sin(radians(lat)) * sin(radians(lat))))
        * cos(radians(lat)) * sin(radians(lon)) AS Y0,
      ({wa!r} / sqrt(1.0 - {we2!r} * sin(radians(lat)) * sin(radians(lat))))
        * (1.0 - {we2!r}) * sin(radians(lat)) AS Z0
      FROM win),
    h AS (SELECT event_id,
      {m!r} * (X0 - ({rzr!r}) * Y0 + ({ryr!r}) * Z0) + ({-tx!r}) AS X,
      {m!r} * (({rzr!r}) * X0 + Y0 - ({rxr!r}) * Z0) + ({-ty!r}) AS Y,
      {m!r} * (-(({ryr!r})) * X0 + ({rxr!r}) * Y0 + Z0) + ({-tz!r}) AS Z
      FROM g),
    it0 AS (SELECT event_id, Z, sqrt(X * X + Y * Y) AS p,
                   atan2(Y, X) AS lon2,
                   atan2(Z, sqrt(X * X + Y * Y) * (1.0 - {ae2!r})) AS la0
            FROM h),
    {lat_ctes},
    ll AS (SELECT event_id, degrees(lon2) AS lon, degrees(la5) AS lat
           FROM it5)"""


_RDNEW = P.make_oblique_stereo(*P.BESSEL1841,
                               lat0=52.0 + 9.0 / 60.0 + 22.178 / 3600.0,
                               lon0=5.0 + 23.0 / 60.0 + 15.500 / 3600.0,
                               k0=0.9999079, fe=155000.0, fn=463000.0)


def _rdnew_sql() -> str:
    """Helmert (Amersfoort) chain + EPSG method 9809 closed-form forward:
    conformal latitude chi from the w-substitution, then the spherical
    oblique stereographic on the conformal sphere (R, n, c, chi0 from
    the kernel constructor the GN7-2 worked example pins)."""
    c = _RDNEW
    e = c.e
    two_rk = 2.0 * c.R * c.k0
    return _helmert_ll_ctes(P._DATUM_AMERSFOORT, P.BESSEL1841,
                            0.0, 14.0, 44.0, 60.0) + f""",
    s1 AS (SELECT event_id, lon, sin(radians(lat)) AS sp FROM ll),
    s2 AS (SELECT event_id,
      {c.n!r} * radians({_wrap_dlon_sql(math.degrees(c.lam0))}) AS dL,
      {c.c!r} * pow(((1.0 + sp) / (1.0 - sp))
        * pow((1.0 - {e!r} * sp) / (1.0 + {e!r} * sp), {e!r}), {c.n!r}) AS w
      FROM s1),
    s3 AS (SELECT event_id, dL, asin((w - 1.0) / (w + 1.0)) AS chi FROM s2),
    s4 AS (SELECT event_id, dL, chi,
      1.0 + sin(chi) * {math.sin(c.chi0)!r}
          + cos(chi) * {math.cos(c.chi0)!r} * cos(dL) AS B
      FROM s3)
    SELECT event_id,
      ROUND({c.fe!r} + {two_rk!r} * cos(chi) * sin(dL) / B, 1) + 0.0 AS px,
      ROUND({c.fn!r} + {two_rk!r} * (sin(chi) * {math.cos(c.chi0)!r}
            - cos(chi) * {math.sin(c.chi0)!r} * cos(dL)) / B, 1) + 0.0 AS py
    FROM s4
    """


@register("geo_reproject_rdnew", _rdnew_sql())
def q_reproject_rdnew(spark, sf_dir):
    """EPSG:28992 (Amersfoort / RD New) — the Dutch national grid and
    the registry's first OBLIQUE ("double") STEREOGRAPHIC (EPSG method
    9809: every other conformal row is conic/cylindric).  Kernel pinned
    by the GN7-2 worked example (53N 6E -> 196105.283, 557057.739);
    oracle mirrors the full Helmert + conformal-sphere chain in SQL.
    Reference semantics: core/reproject.py:94-160."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(0.0, 14.0)
                      & F.col("lat").between(44.0, 60.0))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject("EPSG:28992")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


_EOV = P.make_swiss(*P.GRS67,
                    lat0=47.0 + 8.0 / 60.0 + 39.8174 / 3600.0,
                    lon0=19.0 + 2.0 / 60.0 + 54.8584 / 3600.0,
                    e0=650000.0, n0=200000.0, k0=0.99993)


def _eov_sql() -> str:
    """Helmert (HD72) chain + Gauss-sphere oblique Mercator forward with
    the kc=0.99993 sphere scale (EPSG 19931 / HOM variant B at azimuth
    90, PROJ somerc) — alpha, R, b0, K from the kernel constructor."""
    c = _EOV
    e = c.e
    return _helmert_ll_ctes(P._DATUM_HD72, P.GRS67,
                            12.0, 27.0, 42.0, 52.0) + f""",
    s1 AS (SELECT event_id, radians(lon) AS lam, radians(lat) AS phi,
                  sin(radians(lat)) AS sp FROM ll),
    s2 AS (SELECT event_id, lam,
      {c.alpha!r} * ln(tan(pi() / 4.0 + phi / 2.0))
        - {c.alpha * e / 2.0!r} * ln((1.0 + {e!r} * sp) / (1.0 - {e!r} * sp))
        + {c.K!r} AS S
      FROM s1),
    s3 AS (SELECT event_id,
      2.0 * (atan(exp(S)) - pi() / 4.0) AS b,
      {c.alpha!r} * (lam - {c.lam0!r}) AS l
      FROM s2),
    s4 AS (SELECT event_id,
      atan2(sin(l), {math.sin(c.b0)!r} * tan(b)
                    + {math.cos(c.b0)!r} * cos(l)) AS lbar,
      asin({math.cos(c.b0)!r} * sin(b)
           - {math.sin(c.b0)!r} * cos(b) * cos(l)) AS bbar
      FROM s3)
    SELECT event_id,
      ROUND({c.R!r} * lbar + {c.e0!r}, 1) + 0.0 AS px,
      ROUND({c.R / 2.0!r} * ln((1.0 + sin(bbar)) / (1.0 - sin(bbar)))
            + {c.n0!r}, 1) + 0.0 AS py
    FROM s4
    """


@register("geo_reproject_eov", _eov_sql())
def q_reproject_eov(spark, sf_dir):
    """EPSG:23700 (HD72 / EOV) — Hungary's national grid: EPSG's HOM
    variant B with azimuth = rectified angle = 90 degrees on GRS67,
    which reduces to the Gauss-sphere oblique Mercator with a sphere
    scale (the somerc family) — the registry's first SCALED
    double-projection row (the Swiss rows run kc=1).  Centre->origin,
    kc-at-centre, and Budapest-band invariants pinned in unit tests.
    Reference semantics: core/reproject.py:94-160."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(12.0, 27.0)
                      & F.col("lat").between(42.0, 52.0))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject("EPSG:23700")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


_MOLL = P.make_mollweide(P.WGS84[0])


def _mollweide_sql() -> str:
    """Snyder Mollweide with 8 unrolled Newton iterations for theta
    (2t + sin 2t = pi sin phi); the events window keeps |lat| <= 80 so
    the Newton denominator 2 + 2cos(2t) stays far from its polar zero
    (the kernel handles the poles; the oracle only needs the data's
    domain)."""
    c = _MOLL
    cx = 2.0 * math.sqrt(2.0) / math.pi
    sq2 = math.sqrt(2.0)
    newton = ",\n    ".join(
        f"n{i + 1} AS (SELECT event_id, dlam, target, "
        f"t{i} - (2.0 * t{i} + sin(2.0 * t{i}) - target)"
        f" / (2.0 + 2.0 * cos(2.0 * t{i})) AS t{i + 1} FROM n{i})"
        for i in range(8)
    )
    return f"""
    WITH pts AS ({_EVT}),
    s AS (SELECT event_id, radians(lon) AS dlam, radians(lat) AS phi,
                 pi() * sin(radians(lat)) AS target FROM pts),
    n0 AS (SELECT event_id, dlam, target, phi AS t0 FROM s),
    {newton}
    SELECT event_id,
      ROUND({cx * c.R!r} * dlam * cos(t8), 1) + 0.0 AS px,
      ROUND({sq2 * c.R!r} * sin(t8), 1) + 0.0 AS py
    FROM n8
    """


@register("geo_reproject_mollweide", _mollweide_sql())
def q_reproject_mollweide(spark, sf_dir):
    """ESRI:54009 (World Mollweide) — the equal-area world projection
    global zonal statistics default, and the registry's first
    PSEUDOCYLINDRIC row and first ESRI-authority code (the reference
    reaches ESRI codes through PROJ's authority tables;
    core/reproject.py:94-160).  Closed-form pole/equator identities and
    the equal-area Jacobian pinned in unit tests."""
    return _spark_reproject(spark, sf_dir, "ESRI:54009")


# --- r11: SPCS83 foot-axis grids (ftUS + international ft) ------------------
# The oracle reuses the meter LCC/TM SQL with the ELLIPSOID scaled by the
# axis unit: every length in the conformal forward (rho = a F t^n, the
# Krueger kA and m0, the false origin) is linear in a, so a kernel built
# on a/u with fe/fn in the native unit IS the foot-grid forward.

_CA5_FT = P.make_lcc(P.GRS80[0] / P.FT_US, P.GRS80[1],
                     lat1=34.0 + 2.0 / 60.0, lat2=35.0 + 28.0 / 60.0,
                     lat0=33.5, lon0=-118.0,
                     fe=6561666.667, fn=1640416.667)


@register("geo_reproject_ca5_ftus", _lcc_sql(_CA5_FT))
def q_reproject_ca5_ftus(spark, sf_dir):
    """EPSG:2229 (NAD83 / California zone 5 ftUS) — the registry's
    first FOOT-AXIS grid (EPSG unit 9003, US survey foot): same
    parallels as the 26945 meter twin but the EPSG-published false
    origin 6,561,666.667 / 1,640,416.667 ftUS (0.1 mm off the meter
    twin's round 2,000,000 / 500,000 m — a distinct CRS, not a
    rescale).  LA-basin anchor and twin-consistency pinned in unit
    tests.  Reference resolves ftUS codes via PROJ
    (core/reproject.py:94-160)."""
    return _spark_reproject(spark, sf_dir, "EPSG:2229")


_NYLI_FT = P.make_lcc(P.GRS80[0] / P.FT_US, P.GRS80[1],
                      lat1=40.0 + 40.0 / 60.0, lat2=41.0 + 2.0 / 60.0,
                      lat0=40.0 + 10.0 / 60.0, lon0=-74.0,
                      fe=984250.0, fn=0.0)


@register("geo_reproject_nyli_ftus", _lcc_sql(_NYLI_FT))
def q_reproject_nyli_ftus(spark, sf_dir):
    """EPSG:2263 (NAD83 / New York Long Island ftUS) — the grid NYC
    open data ships in.  FE 984,250 ftUS = 300,000 m EXACTLY, so the
    32118 meter twin must agree to float precision after the unit
    rescale (pinned in unit tests along with an NYC-area anchor)."""
    return _spark_reproject(spark, sf_dir, "EPSG:2263")


_AZE_FT = P.make_tm(P.GRS80[0] / P.FT_INTL, P.GRS80[1],
                    lat0=31.0, lon0=-(110.0 + 10.0 / 60.0), k0=0.9999,
                    fe=700000.0, fn=0.0)


@register("geo_reproject_az_east_ift",
          _tm_registry_sql(_AZE_FT, -116.0, -104.0))
def q_reproject_az_east_ift(spark, sf_dir):
    """EPSG:2222 (NAD83 / Arizona East ft) — INTERNATIONAL feet (EPSG
    unit 9002): Arizona legislated ift, not ftUS, so FE 700,000 ift =
    213,360 m exactly and the 26948 meter twin must agree to float
    precision after the rescale (pinned in unit tests).  Zone-banded
    like every TM oracle (the Krueger series is a near-zone
    expansion)."""
    return _spark_reproject(spark, sf_dir, "EPSG:2222",
                            lon_range=(-116.0, -104.0))


# --- r11: legacy national grids (NTF Lambert II, TM65 Irish Grid) ------------
# Generic datum-chain composers over _helmert_ll_ctes: the CTE prefix
# lands WGS84 points on the LOCAL ellipsoid as ll(lon, lat degrees);
# the tails below are the same LCC / Krueger-TM SQL bodies as the
# parameterized oracles, reading from ll instead of pts.


def _lcc_ll_sql(c, datum, ell, lon_lo, lon_hi, lat_lo, lat_hi) -> str:
    e = c.e
    return _helmert_ll_ctes(datum, ell, lon_lo, lon_hi,
                            lat_lo, lat_hi) + f""",
    s AS (SELECT event_id, lon, radians(lat) AS phi,
                 sin(radians(lat)) AS sp FROM ll),
    t AS (SELECT event_id, lon,
      tan({math.pi / 4.0!r} - phi / 2.0)
        / pow((1.0 - {e!r} * sp) / (1.0 + {e!r} * sp), {e / 2.0!r}) AS tv
      FROM s),
    r AS (SELECT event_id,
      {c.a * c.F!r} * pow(tv, {c.n!r}) AS rho,
      {c.n!r} * radians({_wrap_dlon_sql(c.lon0)}) AS theta
      FROM t)
    SELECT event_id,
      ROUND({c.fe!r} + rho * sin(theta), 1) + 0.0 AS px,
      ROUND({c.fn!r} + {c.rho0!r} - rho * cos(theta), 1) + 0.0 AS py
    FROM r
    """


def _tm_ll_sql(c, datum, ell, lon_lo, lon_hi, lat_lo, lat_hi) -> str:
    e = c.e
    kA = c.k0 * c.A
    eta_terms = " + ".join(
        f"{a!r} * cos({2 * j} * xip) * ((exp({2 * j} * etap) - exp({-2 * j} * etap)) / 2.0)"
        for j, a in enumerate(c.alpha, start=1))
    xi_terms = " + ".join(
        f"{a!r} * sin({2 * j} * xip) * ((exp({2 * j} * etap) + exp({-2 * j} * etap)) / 2.0)"
        for j, a in enumerate(c.alpha, start=1))
    return _helmert_ll_ctes(datum, ell, lon_lo, lon_hi,
                            lat_lo, lat_hi) + f""",
    a1 AS (SELECT event_id, lon, tan(radians(lat)) AS t FROM ll),
    a2 AS (SELECT event_id, lon, t,
      (exp({e!r} * 0.5 * ln((1.0 + {e!r} * t / sqrt(1.0 + t * t))
                          / (1.0 - {e!r} * t / sqrt(1.0 + t * t))))
       - exp(-({e!r} * 0.5 * ln((1.0 + {e!r} * t / sqrt(1.0 + t * t))
                              / (1.0 - {e!r} * t / sqrt(1.0 + t * t)))))) / 2.0 AS sig
      FROM a1),
    a3 AS (SELECT event_id, t, sig,
      t * sqrt(1.0 + sig * sig) - sig * sqrt(1.0 + t * t) AS tp,
      radians(lon - {c.lon0!r}) AS dlon
      FROM a2),
    a4 AS (SELECT event_id,
      atan2(tp, cos(dlon)) AS xip,
      ln(sin(dlon) / sqrt(tp * tp + cos(dlon) * cos(dlon))
         + sqrt(sin(dlon) * sin(dlon) / (tp * tp + cos(dlon) * cos(dlon)) + 1.0)) AS etap
      FROM a3)
    SELECT event_id,
      ROUND({c.fe!r} + {kA!r} * (etap + {eta_terms}), 1) + 0.0 AS px,
      ROUND({c.fn!r} - {c.k0 * c.m0!r} + {kA!r} * (xip + {xi_terms}), 1)
        + 0.0 AS py
    FROM a4
    """


_NTF2 = P.make_lcc(*P.CLARKE1880IGN,
                   lat1=45.0 + 53.0 / 60.0 + 56.108 / 3600.0,
                   lat2=47.0 + 41.0 / 60.0 + 45.652 / 3600.0,
                   lat0=46.8, lon0=2.0 + 20.0 / 60.0 + 14.025 / 3600.0,
                   fe=600000.0, fn=2200000.0)


@register("geo_reproject_ntf_lambert2",
          _lcc_ll_sql(_NTF2, P._DATUM_NTF, P.CLARKE1880IGN,
                      -6.0, 10.0, 41.0, 52.0))
def q_reproject_ntf_lambert2(spark, sf_dir):
    """EPSG:27572 (NTF Paris / Lambert zone II carto) — the grid the
    huge installed base of pre-RGF93 French data ships in: Clarke 1880
    IGN LCC (1SP via IGN's exact 2SP equivalents, Paris meridian folded
    into lon0) + the EPSG 1193 geocentric translation.  Paris anchor
    ~(601,150, 2,428,700) pinned in unit tests."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(-6.0, 10.0)
                      & F.col("lat").between(41.0, 52.0))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject("EPSG:27572")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


_IRISH = P.make_tm(*P.AIRY_MOD, lat0=53.5, lon0=-8.0, k0=1.000035,
                   fe=200000.0, fn=250000.0)


# --- r12: legacy datum-chain grids (DHDN GK, Pulkovo GK, NAD27) ------------

_GK4 = P.make_tm(*P.BESSEL1841, lat0=0.0, lon0=12.0, k0=1.0,
                 fe=4_500_000.0, fn=0.0)


@register("geo_reproject_dhdn_gk4",
          _tm_ll_sql(_GK4, P._DATUM_DHDN, P.BESSEL1841,
                     9.0, 15.0, 47.0, 55.5))
def q_reproject_dhdn_gk4(spark, sf_dir):
    """EPSG:31468 (DHDN / 3-degree Gauss-Krueger zone 4) — the German
    legacy cadastre/utility grid (Bessel 1841, k0 = 1, FE 4.5M) with
    the national EPSG 1777 position-vector Helmert.  Berlin anchor
    ~(4,595,500, 5,821,700) and a DHDN-vs-ETRS89 shift-presence check
    pinned in unit tests.  Reference resolves the family via PROJ
    (core/reproject.py:94-160)."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(9.0, 15.0)
                      & F.col("lat").between(47.0, 55.5))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject("EPSG:31468")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


_PGK7 = P.make_tm(*P.KRASSOWSKY, lat0=0.0, lon0=39.0, k0=1.0,
                  fe=7_500_000.0, fn=0.0)


@register("geo_reproject_pulkovo_gk7",
          _tm_ll_sql(_PGK7, P._DATUM_PULKOVO42, P.KRASSOWSKY,
                     36.0, 42.0, 40.0, 70.0))
def q_reproject_pulkovo_gk7(spark, sf_dir):
    """EPSG:28407 (Pulkovo 1942 / Gauss-Krueger zone 7, Krassowsky
    1940) — the Soviet-era national series whose zone number prefixes
    the false easting (7.5M covers Moscow at 39E); datum via the EPSG
    1254 geocentric translation.  Moscow anchor ~(7,413,300, 6,182,300)
    pinned in unit tests."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(36.0, 42.0)
                      & F.col("lat").between(40.0, 70.0))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject("EPSG:28407")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


_N27Z14 = P.make_tm(*P.CLARKE1866, lat0=0.0, lon0=-99.0, k0=0.9996,
                    fe=500_000.0, fn=0.0)


@register("geo_reproject_nad27_utm14",
          _tm_ll_sql(_N27Z14, P._DATUM_NAD27, P.CLARKE1866,
                     -102.0, -96.0, 25.0, 50.0))
def q_reproject_nad27_utm14(spark, sf_dir):
    """EPSG:26714 (NAD27 / UTM zone 14N, Clarke 1866) — the pre-NAD83
    family, shipped as the grid-free EPSG 1173 Helmert with a
    DOCUMENTED ~10 m bound vs the authoritative NADCON grid (see
    projections._DATUM_NAD27); unit tests pin the exact roundtrip and
    the classic ~200 m NAD27-vs-NAD83 UTM offset."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(-102.0, -96.0)
                      & F.col("lat").between(25.0, 50.0))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject("EPSG:26714")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


_ED50_32 = P.make_tm(*P.INTL1924, lat0=0.0, lon0=9.0, k0=0.9996,
                     fe=500_000.0, fn=0.0)


@register("geo_reproject_ed50_utm32",
          _tm_ll_sql(_ED50_32, P._DATUM_ED50, P.INTL1924,
                     6.0, 12.0, 36.0, 62.0))
def q_reproject_ed50_utm32(spark, sf_dir):
    """EPSG:23032 (ED50 / UTM zone 32N, International 1924) — the
    pre-ETRS89 European installed base (North Sea energy grids, legacy
    national maps); datum via the EPSG 1133 mean translation (~5 m,
    national refinements through the params escape hatch).  Oslo
    anchor and an ED50-vs-ETRS89 shift-presence check pinned in unit
    tests."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(6.0, 12.0)
                      & F.col("lat").between(36.0, 62.0))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject("EPSG:23032")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )


# --- r12: remaining high-traffic SPCS foot grids --------------------------

_PAS_FT = P.make_lcc(P.GRS80[0] / P.FT_US, P.GRS80[1],
                     lat1=39.0 + 56.0 / 60.0, lat2=40.0 + 58.0 / 60.0,
                     lat0=39.0 + 20.0 / 60.0, lon0=-77.75,
                     fe=1968500.0, fn=0.0)


@register("geo_reproject_pa_south_ftus", _lcc_sql(_PAS_FT))
def q_reproject_pa_south_ftus(spark, sf_dir):
    """EPSG:2272 (NAD83 / Pennsylvania South ftUS) — the grid
    Philadelphia/Pittsburgh municipal data ships in.  FE 1,968,500
    ftUS = 600,000 m EXACTLY, so the 32129 meter twin agrees to float
    precision after the unit rescale (pinned in unit tests with a
    Philadelphia anchor).  Reference resolves ftUS codes via PROJ
    (core/reproject.py:94-160)."""
    return _spark_reproject(spark, sf_dir, "EPSG:2272")


_MIS_FT = P.make_lcc(P.GRS80[0] / P.FT_INTL, P.GRS80[1],
                     lat1=42.0 + 6.0 / 60.0, lat2=43.0 + 40.0 / 60.0,
                     lat0=41.5, lon0=-(84.0 + 22.0 / 60.0),
                     fe=13123359.58, fn=0.0)


@register("geo_reproject_mi_south_ift", _lcc_sql(_MIS_FT))
def q_reproject_mi_south_ift(spark, sf_dir):
    """EPSG:2253 (NAD83 / Michigan South ft) — INTERNATIONAL feet like
    Arizona (Michigan legislated ift): FE 13,123,359.58 ift is the
    published cm-rounding of the 26990 meter twin's 4,000,000 m
    (twin consistency + a Detroit anchor pinned in unit tests).  The
    13.1M-ift false easting makes a ftUS/ift or meter mixup
    unmistakable in any downstream join."""
    return _spark_reproject(spark, sf_dir, "EPSG:2253")


@register("geo_reproject_irish_grid",
          _tm_ll_sql(_IRISH, P._DATUM_TM65, P.AIRY_MOD,
                     -11.0, -5.0, 51.0, 56.0))
def q_reproject_irish_grid(spark, sf_dir):
    """EPSG:29902 (TM65 / Irish Grid) — Airy Modified TM with the
    k0 = 1.000035 national scale and the OSi/OSNI 1975 position-vector
    Helmert (EPSG tfm 1641).  Dublin anchor ~(315,900, 234,600) pinned
    in unit tests."""
    gt = _events_points(spark, sf_dir)
    df = gt.df.filter(F.col("lon").between(-11.0, -5.0)
                      & F.col("lat").between(51.0, 56.0))
    gt = type(gt)(df, gt.geo)
    out = gt.reproject("EPSG:29902")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 1) + F.lit(0.0)).alias("px"),
        (F.round(G.st_y(F.col("geometry")), 1) + F.lit(0.0)).alias("py"),
    )
