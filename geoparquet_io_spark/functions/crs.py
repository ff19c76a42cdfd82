"""CRS handling + coordinate transforms (no pyproj in this container).

The reference transforms via DuckDB ST_Transform with PROJ strings
(core/reproject.py:94-160) and classifies CRSs as geographic/projected
(core/extract.py:111-145).  Natively supported here: spherical Mercator
(EPSG:4326 <-> EPSG:3857), every projection family in
functions/projections.py (~35 EPSG codes, all UTM zone ranges, Helmert
datum chains), parameterized {"family": ...} dict specs, and composite
projected->projected pipelines through 4326.  An unsupported pair
raises with a clear message naming the params escape hatch and the
user-supplied transformer UDF hook.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np

EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = math.pi * EARTH_RADIUS

GEOGRAPHIC_CRS = {
    "EPSG:4326", "OGC:CRS84", "CRS84",
    # geographic CRSs of the GRS80-family datums this engine already
    # treats as WGS84-coincident (projections.py datum note): data
    # tagged with them must transform like 4269 (NAD83) always did
    "EPSG:4269",   # NAD83
    "EPSG:4258",   # ETRS89
    "EPSG:4283",   # GDA94
    "EPSG:4171",   # RGF93
    "EPSG:4167",   # NZGD2000
    "EPSG:4619",   # SWEREF99
    "EPSG:4612",   # JGD2000
    "EPSG:4490",   # CGCS2000
    "EPSG:4759",   # NAD83(NSRS2007)
    "EPSG:4148",   # Hartebeesthoek94
    # r9: the registry grew projected rows for these frames without
    # their geographic codes — data tagged with the frame's own lon/lat
    # CRS (e.g. EPSG:7844 GDA2020, Australia's CURRENT standard) was
    # misclassified as projected and get_transformer raised
    "EPSG:7844",   # GDA2020
    "EPSG:4674",   # SIRGAS 2000
    "EPSG:6318",   # NAD83(2011)
    "EPSG:4617",   # NAD83(CSRS)
    "EPSG:6668",   # JGD2011
    "EPSG:3824",   # TWD97
    "EPSG:4765",   # Slovenia 1996 (D96)
    "EPSG:4669",   # LKS94 (Lithuania)
    "EPSG:4661",   # LKS-92 (Latvia)
    "EPSG:4761",   # HTRS96 (Croatia)
    "EPSG:4173",   # IRENET95
    "EPSG:4180",   # EST97 (Estonia)
    "EPSG:4737",   # Korea 2000
    "EPSG:4190",   # POSGAR 98
    "EPSG:9075",   # POSGAR 2007 (geographic 2D)
    "EPSG:4686",   # MAGNA-SIRGAS
    # NOT listed on purpose: classical datums needing a Helmert shift
    # (NTF 4275, OSGB36 4277, CH1903 4149, ...) — treating them
    # coincident would silently offset data by ~100 m
}
DEFAULT_CRS = "OGC:CRS84"


def normalize_crs(crs) -> str:
    """Accept 'EPSG:4326' strings or PROJJSON dicts -> 'AUTH:CODE'."""
    if crs is None:
        return DEFAULT_CRS
    if isinstance(crs, str):
        return crs.upper()
    if isinstance(crs, dict):
        ident = crs.get("id") or {}
        auth, code = ident.get("authority"), ident.get("code")
        if auth and code is not None:
            return f"{auth}:{code}".upper()
        raise ValueError("PROJJSON without id.authority/id.code not supported")
    raise TypeError(f"unsupported CRS spec: {type(crs)}")


def is_geographic(crs) -> bool:
    # PROJJSON's id is OPTIONAL: a spec-legal dict without one still
    # carries its own discriminator — classify from "type" instead of
    # crashing inspect/extract on a readable file
    if isinstance(crs, dict) and not (crs.get("id") or {}).get("code"):
        t = str(crs.get("type", ""))
        if t in ("GeographicCRS", "Geographic2DCRS", "Geographic3DCRS"):
            return True
        if t in ("ProjectedCRS", "CompoundCRS", "EngineeringCRS"):
            return False
    return normalize_crs(crs) in GEOGRAPHIC_CRS


def _pipeline_step(crs: str):
    """(to_4326, from_4326) numpy transforms for one CRS, or None."""
    if crs == "EPSG:4326":
        ident = lambda x, y: (x, y)
        return ident, ident
    if crs == "EPSG:3857":
        return _mercator_to_lonlat, _lonlat_to_mercator
    if crs.startswith("EPSG:"):
        from geoparquet_io_spark.functions import projections as _proj

        try:
            code = int(crs.split(":", 1)[1])
        except ValueError:
            return None
        pair = _proj._proj_for_epsg(code)
        if pair is not None:
            fwd, inv = pair
            return inv, fwd
    if crs.startswith("ESRI:"):
        from geoparquet_io_spark.functions import projections as _proj

        try:
            code = int(crs.split(":", 1)[1])
        except ValueError:
            return None
        pair = _proj._proj_for_esri(code)
        if pair is not None:
            fwd, inv = pair
            return inv, fwd
    return None


def _params_step(spec: dict):
    """(to_4326, from_4326) for a {"family": ...} parameter spec —
    the arbitrary-CRS escape hatch (projections.proj_from_params)."""
    from geoparquet_io_spark.functions import projections as _proj

    fwd, inv = _proj.proj_from_params(spec)
    return inv, fwd


def _family_hint(crs: str) -> str:
    """Name the CRS FAMILY in the unsupported-code error when the code
    falls in a recognizable legacy block — a user holding NAD27 State
    Plane data should learn the datum decision (grid-free Helmert,
    ~10 m) and the exact escape-hatch spec, not just 'unsupported'."""
    try:
        code = int(crs.split(":", 1)[1]) if crs.startswith("EPSG:") else -1
    except ValueError:
        return ""
    if 26729 <= code <= 26798 or 32001 <= code <= 32060:
        return (
            ".  This code is NAD27 State Plane (SPCS27): the engine "
            "ships NAD27 via the grid-free EPSG 1173 Helmert (~10 m in "
            "CONUS; see projections._DATUM_NAD27) for EPSG:4267 and the "
            "UTM zones 26703-26722 — for an SPCS27 zone pass its "
            "published parameters, e.g. {'family': 'lcc', 'ellps': "
            "'CLARKE1866', 'towgs84': (-8, 160, 176), ...}"
        )
    return ""


def get_transformer(src, dst) -> Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]:
    """Vectorized (x, y) -> (x', y') for a supported CRS pair.

    Any supported pair composes through EPSG:4326 (src inverse -> dst
    forward); supported projections are spherical Mercator (closed form)
    plus the ellipsoidal families in :mod:`projections` (UTM / TM, LCC,
    Albers, LAEA — the reference's own fixture CRSs 3794/5070/32633 among
    them; reference: core/reproject.py:94-160).

    ``src``/``dst`` may each also be a PARAMETER DICT
    (``{"family": "lcc", "ellps": "GRS80", ...}`` — see
    :func:`projections.proj_from_params`) so a CRS missing from the
    EPSG registry works with its published parameters.
    """
    spec_s = isinstance(src, dict) and "family" in src
    spec_d = isinstance(dst, dict) and "family" in dst
    s = "<params>" if spec_s else normalize_crs(src)
    d = "<params>" if spec_d else normalize_crs(dst)
    if s in GEOGRAPHIC_CRS:
        s = "EPSG:4326"
    if d in GEOGRAPHIC_CRS:
        d = "EPSG:4326"
    if s == d and not (spec_s or spec_d):
        return lambda x, y: (x, y)
    step_s = _params_step(src) if spec_s else _pipeline_step(s)
    step_d = _params_step(dst) if spec_d else _pipeline_step(d)
    if step_s is None or step_d is None:
        missing = s if step_s is None else d
        raise ValueError(
            f"transform {s} -> {d} not supported without pyproj "
            f"({missing} is not in the built-in projection registry); "
            "pass its published parameters as a dict "
            "({'family': 'lcc', 'ellps': 'GRS80', ...} — see "
            "projections.proj_from_params) or a custom transformer to "
            "reproject(transformer=...)" + _family_hint(missing)
        )
    to_4326, _ = step_s
    _, from_4326 = step_d
    if s == "EPSG:4326":
        return from_4326
    if d == "EPSG:4326":
        return to_4326

    def _composite(x, y):
        lon, lat = to_4326(np.asarray(x, dtype=np.float64),
                           np.asarray(y, dtype=np.float64))
        return from_4326(lon, lat)

    return _composite


def _lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray):
    x = lon * ORIGIN_SHIFT / 180.0
    lat_c = np.clip(lat, -89.9999, 89.9999)
    y = np.log(np.tan((90.0 + lat_c) * math.pi / 360.0)) * EARTH_RADIUS
    return x, y


def _mercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    lon = x / ORIGIN_SHIFT * 180.0
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS)) - math.pi / 2.0)
    return lon, lat
