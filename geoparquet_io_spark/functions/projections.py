"""Ellipsoidal map projections, numpy-vectorized (no pyproj in this
container — these are the public closed-form formulas).

Covers the projection families the reference's own benchmark corpus uses
(reference: core/reproject.py:94-160, fixtures tests/data/crs-*.parquet):

- Transverse Mercator (Krueger series, order n^6 — Karney 2011
  "Transverse Mercator with an accuracy of a few nanometers"): all UTM
  zones (EPSG:326xx / 327xx / 258xx), EPSG:3794 (Slovene national grid).
- Lambert Conformal Conic 2SP (Snyder 1987, pp. 107-109): EPSG:2154
  (Lambert-93), US state planes on request.
- Albers Equal Area 2SP (Snyder, pp. 101-102): EPSG:5070 (CONUS Albers).
- Lambert Azimuthal Equal Area (Snyder, pp. 187-190): EPSG:3035
  (ETRS89 LAEA Europe).

All functions take/return degrees lon/lat on the geographic side and
meters on the projected side, operating on numpy arrays (the reproject
pandas UDF feeds whole Arrow batches through, so the per-row cost is a
handful of vector ops).

Datum note: WGS84 vs GRS80-family datums (ETRS89 / NAD83 / RGF93 /
Slovenia 1996 / GDA94) differ by centimeters; like most non-grid-shift
software we treat those geographic coordinates as interchangeable.
Classical datums (OSGB36, CH1903+, BD72, S-JTSK) go through the
position-vector 7-parameter Helmert transforms below (catalogue accuracy
~1-2 m — the same class PROJ uses without grid-shift files); the
projection+datum chains are validated against published national worked
examples in tests/test_projections_epsg.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

# ellipsoids: (semi-major axis a, flattening f)
WGS84 = (6378137.0, 1.0 / 298.257223563)
GRS80 = (6378137.0, 1.0 / 298.257222101)


# ---------------------------------------------------------------------------
# Transverse Mercator (Krueger series)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _TMConsts:
    a: float
    f: float
    k0: float
    lon0: float
    fe: float
    fn: float
    e: float
    n: float
    A: float           # rectifying radius
    alpha: tuple       # forward series coefficients
    beta: tuple        # inverse series coefficients
    m0: float          # meridian arc at lat_0 (scaled by k0 at use site)


def _tm_series(n: float):
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    alpha = (
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
        + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
        + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 76204800,
    )
    beta = (
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
        - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    )
    return alpha, beta


def _tm_xi_eta(lat_rad, lon_rad, c: "_TMConsts"):
    """Gauss-Schreiber coordinates (xi', eta') for arrays of radians."""
    e = c.e
    sphi = np.sin(lat_rad)
    # conformal latitude via tau -> tau' (Karney eq. 7-9)
    t = np.tan(lat_rad)
    sig = np.sinh(e * np.arctanh(e * t / np.hypot(1.0, t)))
    tp = t * np.hypot(1.0, sig) - sig * np.hypot(1.0, t)
    dlon = lon_rad - math.radians(c.lon0)
    # wrap to [-pi, pi] so zone-adjacent points stay finite
    dlon = (dlon + math.pi) % (2 * math.pi) - math.pi
    xi_p = np.arctan2(tp, np.cos(dlon))
    eta_p = np.arcsinh(np.sin(dlon) / np.hypot(tp, np.cos(dlon)))
    return xi_p, eta_p, sphi


def _tm_meridian_arc(lat_deg: float, c: "_TMConsts") -> float:
    """Meridian distance from the equator (A * xi at the central meridian)."""
    if lat_deg == 0.0:
        return 0.0
    xi_p, _, _ = _tm_xi_eta(np.array([math.radians(lat_deg)]),
                            np.array([math.radians(c.lon0)]), c)
    xi = xi_p.copy()
    for j, a in enumerate(c.alpha, start=1):
        xi = xi + a * np.sin(2 * j * xi_p)  # eta'=0 -> cosh term = 1
    return float(c.A * xi[0])


def make_tm(a: float, f: float, lat0: float, lon0: float, k0: float,
            fe: float, fn: float) -> "_TMConsts":
    n = f / (2.0 - f)
    A = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0 + n**6 / 256.0)
    alpha, beta = _tm_series(n)
    c = _TMConsts(a=a, f=f, k0=k0, lon0=lon0, fe=fe, fn=fn,
                  e=math.sqrt(f * (2 - f)), n=n, A=A,
                  alpha=alpha, beta=beta, m0=0.0)
    if lat0 != 0.0:
        object.__setattr__(c, "m0", _tm_meridian_arc(lat0, c))
    return c


def _wrap_dlon(dlon_deg):
    """Wrap a longitude difference into [-180, 180]: kernels that use
    the delta LINEARLY (LCC/Albers theta = n*dlon, CEA x = a*k0*dlon)
    are NOT periodic in it — unwrapped antimeridian deltas land one
    world width away (verified: NZTM inverse feeds lon 183.5 into
    EASE-Grid forward -> +17,705 km instead of -17,029 km).  Exactly
    +-180 is PRESERVED (both signs are valid world-edge positions; the
    EASE-Grid published corners pin x(+-180) = +-half-world)."""
    d = np.asarray(dlon_deg, dtype=np.float64)
    return np.where(np.abs(d) <= 180.0, d, (d + 180.0) % 360.0 - 180.0)


def tm_forward(lon: np.ndarray, lat: np.ndarray, c: _TMConsts):
    lat_r, lon_r = np.radians(lat), np.radians(lon)
    xi_p, eta_p, _ = _tm_xi_eta(lat_r, lon_r, c)
    xi, eta = xi_p.copy(), eta_p.copy()
    for j, al in enumerate(c.alpha, start=1):
        xi = xi + al * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + al * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    x = c.fe + c.k0 * c.A * eta
    y = c.fn + c.k0 * (c.A * xi - c.m0)
    return x, y


def tm_inverse(x: np.ndarray, y: np.ndarray, c: _TMConsts):
    xi = (y - c.fn + c.k0 * c.m0) / (c.k0 * c.A)
    eta = (x - c.fe) / (c.k0 * c.A)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, be in enumerate(c.beta, start=1):
        xi_p = xi_p - be * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - be * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    tp = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
    dlon = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = _wrap_dlon(c.lon0 + np.degrees(dlon))
    lat = np.degrees(np.arctan(_tau_newton(tp, c.e)))
    return lon, lat


def _tau_newton(tp: np.ndarray, e: float) -> np.ndarray:
    """Solve tau (tan of geodetic lat) from tau' (tan of conformal lat)
    by Newton iteration (Karney 2011, eq. 19-21). Converges in <=3 steps."""
    e2 = e * e
    tau = tp / (1.0 - e2)  # first guess
    for _ in range(4):
        sig = np.sinh(e * np.arctanh(e * tau / np.hypot(1.0, tau)))
        f_val = tau * np.hypot(1.0, sig) - sig * np.hypot(1.0, tau) - tp
        dtau = ((np.hypot(1.0, sig) * np.hypot(1.0, tau) - sig * tau)
                * (1.0 - e2) * np.hypot(1.0, tau) / (1.0 + (1.0 - e2) * tau * tau))
        tau = tau - f_val / dtau
    return tau


# ---------------------------------------------------------------------------
# Lambert Conformal Conic 2SP (Snyder pp. 107-109)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _LCCConsts:
    a: float
    e: float
    n: float
    F: float
    rho0: float
    lon0: float
    fe: float
    fn: float


def _snyder_m(phi, e):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e * e * s * s)


def _snyder_t(phi, e):
    s = np.sin(phi)
    return (np.tan(math.pi / 4.0 - phi / 2.0)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))


def make_lcc1sp(a: float, f: float, lat0: float, k0: float,
                lon0: float, fe: float, fn: float) -> _LCCConsts:
    """EPSG method 9801 (Lambert Conic Conformal 1SP): the cone is
    tangent at lat0 and k0 scales every radius, which in the Snyder
    constants is exactly F -> k0 * F (rho0 follows).  Exact by
    construction — no 2SP-equivalent parallels needed."""
    c = make_lcc(a, f, lat1=lat0, lat2=lat0, lat0=lat0,
                 lon0=lon0, fe=fe, fn=fn)
    return _LCCConsts(a=c.a, e=c.e, n=c.n, F=c.F * k0, rho0=c.rho0 * k0,
                      lon0=c.lon0, fe=c.fe, fn=c.fn)


def make_lcc(a: float, f: float, lat1: float, lat2: float, lat0: float,
             lon0: float, fe: float, fn: float) -> _LCCConsts:
    e = math.sqrt(f * (2 - f))
    p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
    m1, m2 = (float(_snyder_m(np.array([p]), e)[0]) for p in (p1, p2))
    t1, t2, t0 = (float(_snyder_t(np.array([p]), e)[0]) for p in (p1, p2, p0))
    if abs(lat1 - lat2) < 1e-12:
        n = math.sin(p1)
    else:
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    F = m1 / (n * t1 ** n)
    rho0 = a * F * t0 ** n
    return _LCCConsts(a=a, e=e, n=n, F=F, rho0=rho0, lon0=lon0, fe=fe, fn=fn)


def lcc_forward(lon: np.ndarray, lat: np.ndarray, c: _LCCConsts):
    phi = np.radians(lat)
    t = _snyder_t(phi, c.e)
    rho = c.a * c.F * np.power(t, c.n)
    theta = c.n * np.radians(_wrap_dlon(lon - c.lon0))
    x = c.fe + rho * np.sin(theta)
    y = c.fn + c.rho0 - rho * np.cos(theta)
    return x, y


def lcc_inverse(x: np.ndarray, y: np.ndarray, c: _LCCConsts):
    dx = x - c.fe
    dy = c.rho0 - (y - c.fn)
    rho = np.sign(c.n) * np.hypot(dx, dy)
    theta = np.arctan2(np.sign(c.n) * dx, np.sign(c.n) * dy)
    t = np.power(rho / (c.a * c.F), 1.0 / c.n)
    lon = c.lon0 + np.degrees(theta / c.n)
    # phi = pi/2 - 2 atan(t * ((1 - e sin phi)/(1 + e sin phi))^(e/2)), iterate
    phi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = np.sin(phi)
        phi = math.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - c.e * s) / (1.0 + c.e * s)) ** (c.e / 2.0))
    return lon, np.degrees(phi)


# ---------------------------------------------------------------------------
# Albers Equal Area 2SP (Snyder pp. 101-102)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _AlbersConsts:
    a: float
    e: float
    n: float
    C: float
    rho0: float
    lon0: float
    fe: float
    fn: float


def _snyder_q(phi, e):
    s = np.sin(phi)
    if e == 0.0:            # sphere: lim_{e->0} q = 2 sin(phi)
        return 2.0 * s
    return (1.0 - e * e) * (
        s / (1.0 - e * e * s * s)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


def _phi_from_q(q: np.ndarray, e: float) -> np.ndarray:
    """Geodetic latitude from Snyder's authalic q (eq. 3-16 iteration);
    exact closed form on a sphere (q = 2 sin(phi))."""
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    if e == 0.0:
        return phi
    e2 = e * e
    for _ in range(8):
        s = np.sin(phi)
        phi = phi + (1.0 - e2 * s * s) ** 2 / (2.0 * np.cos(phi)) * (
            q / (1.0 - e2)
            - s / (1.0 - e2 * s * s)
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
    return phi


def make_albers(a: float, f: float, lat1: float, lat2: float, lat0: float,
                lon0: float, fe: float, fn: float) -> _AlbersConsts:
    e = math.sqrt(f * (2 - f))
    p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
    m1 = float(_snyder_m(np.array([p1]), e)[0])
    m2 = float(_snyder_m(np.array([p2]), e)[0])
    q1 = float(_snyder_q(np.array([p1]), e)[0])
    q2 = float(_snyder_q(np.array([p2]), e)[0])
    q0 = float(_snyder_q(np.array([p0]), e)[0])
    if abs(lat1 - lat2) < 1e-12:
        n = math.sin(p1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * math.sqrt(C - n * q0) / n
    return _AlbersConsts(a=a, e=e, n=n, C=C, rho0=rho0, lon0=lon0, fe=fe, fn=fn)


def albers_forward(lon: np.ndarray, lat: np.ndarray, c: _AlbersConsts):
    q = _snyder_q(np.radians(lat), c.e)
    rho = c.a * np.sqrt(c.C - c.n * q) / c.n
    theta = c.n * np.radians(_wrap_dlon(lon - c.lon0))
    x = c.fe + rho * np.sin(theta)
    y = c.fn + c.rho0 - rho * np.cos(theta)
    return x, y


def albers_inverse(x: np.ndarray, y: np.ndarray, c: _AlbersConsts):
    dx = x - c.fe
    dy = c.rho0 - (y - c.fn)
    rho = np.hypot(dx, dy)
    q = (c.C - (rho * c.n / c.a) ** 2) / c.n
    theta = np.arctan2(np.sign(c.n) * dx, np.sign(c.n) * dy)
    lon = c.lon0 + np.degrees(theta / c.n)
    return lon, np.degrees(_phi_from_q(q, c.e))


# ---------------------------------------------------------------------------
# Cylindrical Equal-Area, normal aspect (Snyder pp. 81-85; EPSG method 9835)
# — the EASE-Grid 2.0 family (EPSG:6933 global, lat_ts=30)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _CEAConsts:
    a: float
    e: float
    k0: float
    lon0: float
    fe: float
    fn: float


def make_cea(a: float, f: float, lat_ts: float, lon0: float,
             fe: float, fn: float) -> _CEAConsts:
    e = math.sqrt(f * (2 - f))
    ts = math.radians(lat_ts)
    k0 = math.cos(ts) / math.sqrt(1.0 - e * e * math.sin(ts) ** 2)
    return _CEAConsts(a=a, e=e, k0=k0, lon0=lon0, fe=fe, fn=fn)


def cea_forward(lon: np.ndarray, lat: np.ndarray, c: _CEAConsts):
    q = _snyder_q(np.radians(lat), c.e)
    x = c.fe + c.a * c.k0 * np.radians(_wrap_dlon(lon - c.lon0))
    y = c.fn + c.a * q / (2.0 * c.k0)
    return x, y


def cea_inverse(x: np.ndarray, y: np.ndarray, c: _CEAConsts):
    lon = c.lon0 + np.degrees((x - c.fe) / (c.a * c.k0))
    q = 2.0 * c.k0 * (y - c.fn) / c.a
    return lon, np.degrees(_phi_from_q(q, c.e))


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal Area, oblique (Snyder pp. 187-190)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# American Polyconic (Snyder pp. 124-126) — Brazil's legacy national
# projection (SAD69 29101, SIRGAS 2000 5880)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _PolyConsts:
    a: float
    e: float
    lon0: float
    fe: float
    fn: float
    m0: float


def _merid_arc(phi: np.ndarray, a: float, e: float) -> np.ndarray:
    """Meridian distance from the equator, Snyder eq. 3-21 (vectorized;
    the TM kernel's arc is tied to its series constants, this one is
    standalone for non-conformal families)."""
    e2 = e * e
    e4 = e2 * e2
    e6 = e4 * e2
    return a * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
                - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0
                   + 45.0 * e6 / 1024.0) * np.sin(2.0 * phi)
                + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * np.sin(4.0 * phi)
                - (35.0 * e6 / 3072.0) * np.sin(6.0 * phi))


def make_polyconic(a: float, f: float, lat0: float, lon0: float,
                   fe: float, fn: float) -> _PolyConsts:
    e = math.sqrt(f * (2 - f))
    m0 = float(_merid_arc(np.array([math.radians(lat0)]), a, e)[0])
    return _PolyConsts(a=a, e=e, lon0=lon0, fe=fe, fn=fn, m0=m0)


def _poly_forward_rad(dlam: np.ndarray, phi: np.ndarray, c: _PolyConsts):
    """Origin-stripped forward in radians (shared by forward + the
    inverse's Newton loop).  The phi -> 0 limit (x = a*dlam, y = -m0)
    is taken through a safe substitute: with |phi| floored at 1e-10,
    cot(phi)*sin(dlam*sin(phi)) -> N*dlam and cot(phi)*(1-cos(E)) -> 0
    to double precision, so the expression is continuous through the
    equator (Brazil's domain crosses it)."""
    small = np.abs(phi) < 1e-10
    ph = np.where(small, 1e-10, phi)
    sp = np.sin(ph)
    N = c.a / np.sqrt(1.0 - c.e * c.e * sp * sp)
    E = dlam * sp
    cot = np.cos(ph) / sp
    x = N * cot * np.sin(E)
    y = _merid_arc(ph, c.a, c.e) - c.m0 + N * cot * (1.0 - np.cos(E))
    # exact equator limit (the substitute is continuous but carries the
    # floored phi's ~0.6 mm of meridian arc): x = a*dlam, y = -m0
    x = np.where(small, c.a * dlam, x)
    y = np.where(small, -c.m0, y)
    return x, y


def poly_forward(lon: np.ndarray, lat: np.ndarray, c: _PolyConsts):
    dlam = np.radians(_wrap_dlon(np.asarray(lon, np.float64) - c.lon0))
    phi = np.radians(np.asarray(lat, np.float64))
    x, y = _poly_forward_rad(dlam, phi, c)
    return c.fe + x, c.fn + y


def poly_inverse(x: np.ndarray, y: np.ndarray, c: _PolyConsts):
    """Vectorized damped-free 2D Newton on the forward with a
    finite-difference Jacobian — the polyconic has no closed inverse
    and Snyder's scalar iteration is singular on the equator, which
    Brazil's domain crosses; Newton on the smooth forward converges
    everywhere in the working zone (|dlam| < ~60 deg) and the fixed
    point is exact regardless of the Jacobian's FD error."""
    X = np.asarray(x, np.float64) - c.fe
    Y = np.asarray(y, np.float64) - c.fn
    A = (c.m0 + Y) / c.a
    phi = np.clip(A, -1.55, 1.55)
    lam = X / (c.a * np.maximum(np.cos(phi), 0.3))
    h = 1e-7
    for _ in range(30):
        fx, fy = _poly_forward_rad(lam, phi, c)
        rx = fx - X
        ry = fy - Y
        # all points converged (sub-micrometre) -> stop; Newton needs
        # ~5 rounds here, so the cap of 30 is a stall guard, not the
        # typical cost (each round is 3 vectorized forward evals)
        with np.errstate(invalid="ignore"):
            live = (np.abs(rx) > 1e-6) | (np.abs(ry) > 1e-6)
        if not np.any(live):
            break
        fx1, fy1 = _poly_forward_rad(lam + h, phi, c)
        fx2, fy2 = _poly_forward_rad(lam, phi + h, c)
        j11 = (fx1 - fx) / h
        j12 = (fx2 - fx) / h
        j21 = (fy1 - fy) / h
        j22 = (fy2 - fy) / h
        det = j11 * j22 - j12 * j21
        # sign-preserving floor: overwriting a small NEGATIVE det with
        # +1e-12 would flip the step direction
        det = np.where(np.abs(det) < 1e-12,
                       np.where(det < 0, -1e-12, 1e-12), det)
        lam = lam - (j22 * rx - j12 * ry) / det
        phi = phi - (-j21 * rx + j11 * ry) / det
    # a non-finite input coordinate poisons BOTH outputs (a NaN x with a
    # finite y would otherwise return the finite footpoint latitude of
    # the never-updated initial guess — closed-form kernels mix x and y
    # so both naturally go NaN; match that contract here)
    bad = ~(np.isfinite(X) & np.isfinite(Y))
    if np.any(bad):
        lam = np.where(bad, np.nan, lam)
        phi = np.where(bad, np.nan, phi)
    return (_wrap_dlon(c.lon0 + np.degrees(lam)), np.degrees(phi))


@dataclass(frozen=True)
class _LAEAConsts:
    a: float
    e: float
    qp: float
    beta1: float
    Rq: float
    D: float
    lon0: float
    fe: float
    fn: float


def make_laea(a: float, f: float, lat0: float, lon0: float,
              fe: float, fn: float) -> _LAEAConsts:
    e = math.sqrt(f * (2 - f))
    qp = float(_snyder_q(np.array([math.pi / 2.0]), e)[0])
    q1 = float(_snyder_q(np.array([math.radians(lat0)]), e)[0])
    beta1 = math.asin(q1 / qp)
    Rq = a * math.sqrt(qp / 2.0)
    m1 = float(_snyder_m(np.array([math.radians(lat0)]), e)[0])
    D = a * m1 / (Rq * math.cos(beta1))
    return _LAEAConsts(a=a, e=e, qp=qp, beta1=beta1, Rq=Rq, D=D,
                       lon0=lon0, fe=fe, fn=fn)


def laea_forward(lon: np.ndarray, lat: np.ndarray, c: _LAEAConsts):
    q = _snyder_q(np.radians(lat), c.e)
    beta = np.arcsin(np.clip(q / c.qp, -1.0, 1.0))
    dlam = np.radians(lon - c.lon0)
    sb1, cb1 = math.sin(c.beta1), math.cos(c.beta1)
    B = c.Rq * np.sqrt(2.0 / (1.0 + sb1 * np.sin(beta)
                              + cb1 * np.cos(beta) * np.cos(dlam)))
    x = c.fe + B * c.D * np.cos(beta) * np.sin(dlam)
    y = c.fn + (B / c.D) * (cb1 * np.sin(beta) - sb1 * np.cos(beta) * np.cos(dlam))
    return x, y


def laea_inverse(x: np.ndarray, y: np.ndarray, c: _LAEAConsts):
    dx = (x - c.fe) / c.D
    dy = c.D * (y - c.fn)
    rho = np.hypot(dx, dy)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * c.Rq), -1.0, 1.0))
    sb1, cb1 = math.sin(c.beta1), math.cos(c.beta1)
    with np.errstate(invalid="ignore"):
        beta = np.where(
            rho == 0.0, c.beta1,
            np.arcsin(np.clip(np.cos(ce) * sb1 + (dy * np.sin(ce) * cb1 /
                                                  np.where(rho == 0, 1.0, rho)),
                              -1.0, 1.0)))
        dlam = np.arctan2(dx * np.sin(ce),
                          rho * cb1 * np.cos(ce) - dy * sb1 * np.sin(ce))
    lon = c.lon0 + np.degrees(dlam)
    # geodetic lat from authalic lat beta (Snyder eq. 3-18), iterate on q
    q = c.qp * np.sin(beta)
    return lon, np.degrees(_phi_from_q(q, c.e))


# ---------------------------------------------------------------------------
# Polar Stereographic variant B (Snyder pp. 160-162, EPSG method 9829)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _PSConsts:
    a: float
    e: float
    pole: int      # +1 north, -1 south
    mc: float      # scale function at the standard parallel
    tc: float      # t at the standard parallel
    lon0: float
    fe: float
    fn: float


def _ps_t(phi: np.ndarray, e: float, pole: int) -> np.ndarray:
    s = pole * np.sin(phi)
    return (np.tan(math.pi / 4.0 - pole * phi / 2.0)
            * ((1.0 + e * s) / (1.0 - e * s)) ** (e / 2.0))


def make_polar_stereo(a: float, f: float, lat_ts: float, lon0: float,
                      fe: float, fn: float,
                      k0: float | None = None) -> _PSConsts:
    """Variant B (lat_ts, the NSIDC/Antarctic grids) or — when lat_ts is
    exactly the pole — variant A (k0 at the pole, EPSG method 9810: the
    UPS grids).  Variant A bakes into the same (mc, tc) constants the
    forward/inverse/SQL mirrors already use: rho = 2 a k0 t /
    sqrt((1+e)^(1+e) (1-e)^(1-e))  ==  a * mc * t / tc  with tc = 1."""
    e = math.sqrt(f * (2 - f))
    pole = 1 if lat_ts >= 0 else -1
    if abs(lat_ts) == 90.0:
        if k0 is None:
            raise ValueError(
                "pole-tangent polar stereographic needs k0 (variant A); "
                "pass lat_ts < 90 for variant B")
        mc = 2.0 * k0 / math.sqrt((1.0 + e) ** (1.0 + e)
                                  * (1.0 - e) ** (1.0 - e))
        return _PSConsts(a=a, e=e, pole=pole, mc=mc, tc=1.0,
                         lon0=lon0, fe=fe, fn=fn)
    ts = math.radians(lat_ts)
    mc = math.cos(ts) / math.sqrt(1.0 - e * e * math.sin(ts) ** 2)
    tc = float(_ps_t(np.array([ts]), e, pole)[0])
    return _PSConsts(a=a, e=e, pole=pole, mc=mc, tc=tc, lon0=lon0, fe=fe, fn=fn)


def ps_forward(lon: np.ndarray, lat: np.ndarray, c: _PSConsts):
    t = _ps_t(np.radians(lat), c.e, c.pole)
    rho = c.a * c.mc * t / c.tc
    dlam = np.radians(lon - c.lon0)
    x = c.fe + rho * np.sin(dlam)
    y = c.fn - c.pole * rho * np.cos(dlam)
    return x, y


def ps_inverse(x: np.ndarray, y: np.ndarray, c: _PSConsts):
    dx, dy = x - c.fe, y - c.fn
    rho = np.hypot(dx, dy)
    t = rho * c.tc / (c.a * c.mc)
    # iterate geodetic latitude in the north frame (Snyder 7-9)
    phi_n = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = c.e * np.sin(phi_n)
        phi_n = math.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (c.e / 2.0))
    lat = np.degrees(c.pole * phi_n)
    dlam = np.arctan2(dx, -c.pole * dy)
    lon = c.lon0 + np.degrees(dlam)
    # polar charts cover all longitudes: wrap to [-180, 180)
    lon = np.mod(lon + 180.0, 360.0) - 180.0
    # the pole itself (rho == 0) has arbitrary longitude; pin to lon0
    lon = np.where(rho == 0.0, c.lon0, lon)
    return lon, lat


# ---------------------------------------------------------------------------
# EPSG registry (parameters from the public EPSG dataset)
# ---------------------------------------------------------------------------

# Data-driven table for single-code projected CRSs on WGS84-coincident
# datums: code -> (family, ellipsoid, kernel params).  Wiring a new code
# is one row; the kernels are the general families above.  Parameter
# sanity is property-tested (tests/test_projections_epsg.py): the false
# origin must map exactly to (FE, FN), TM scale at the central meridian
# must equal k0, and LCC/Albers scale must be 1 on both standard
# parallels — a mis-entered row cannot pass.  Datum-shifted codes
# (OSGB, Swiss, Krovak, BD72) stay procedural below because they
# compose a Helmert chain.
EPSG_TABLE: dict[int, tuple] = {
    # family, ellipsoid, params                      # EPSG name
    3794: ("tm", GRS80, dict(lat0=0.0, lon0=15.0, k0=0.9999,
                             fe=500000.0, fn=-5000000.0)),   # D96/TM Slovenia
    2180: ("tm", GRS80, dict(lat0=0.0, lon0=19.0, k0=0.9993,
                             fe=500000.0, fn=-5300000.0)),   # ETRS89/Poland CS92
    3006: ("tm", GRS80, dict(lat0=0.0, lon0=15.0, k0=0.9996,
                             fe=500000.0, fn=0.0)),          # SWEREF99 TM
    3067: ("tm", GRS80, dict(lat0=0.0, lon0=27.0, k0=0.9996,
                             fe=500000.0, fn=0.0)),          # ETRS89/TM35FIN
    3346: ("tm", GRS80, dict(lat0=0.0, lon0=24.0, k0=0.9998,
                             fe=500000.0, fn=0.0)),          # LKS94 Lithuania
    3765: ("tm", GRS80, dict(lat0=0.0, lon0=16.5, k0=0.9999,
                             fe=500000.0, fn=0.0)),          # HTRS96 Croatia TM
    2157: ("tm", GRS80, dict(lat0=53.5, lon0=-8.0, k0=0.99982,
                             fe=600000.0, fn=750000.0)),     # IRENET95/Irish TM
    2193: ("tm", GRS80, dict(lat0=0.0, lon0=173.0, k0=0.9996,
                             fe=1600000.0, fn=10000000.0)),  # NZGD2000/NZTM2000
    3826: ("tm", GRS80, dict(lat0=0.0, lon0=121.0, k0=0.9999,
                             fe=250000.0, fn=0.0)),          # TWD97/TM2 Taiwan
    2154: ("lcc", GRS80, dict(lat1=44.0, lat2=49.0, lat0=46.5, lon0=3.0,
                              fe=700000.0, fn=6600000.0)),   # RGF93/Lambert-93
    # EPSG registry: 3082 is Texas CENTRIC Lambert Conformal; 32139 is
    # the Texas CENTRAL SPCS83 zone (they were mis-keyed onto each other
    # once — coordinates came out hundreds of km off)
    3082: ("lcc", GRS80, dict(lat1=27.5, lat2=35.0, lat0=18.0, lon0=-100.0,
                              fe=1500000.0, fn=5000000.0)),  # Texas Centric LC
    32139: ("lcc", GRS80, dict(lat1=30.0 + 7.0 / 60.0,
                               lat2=31.0 + 53.0 / 60.0,
                               lat0=29.0 + 40.0 / 60.0,
                               lon0=-(100.0 + 20.0 / 60.0),
                               fe=700000.0, fn=3000000.0)),  # Texas Central SPCS
    3978: ("lcc", GRS80, dict(lat1=49.0, lat2=77.0, lat0=49.0, lon0=-95.0,
                              fe=0.0, fn=0.0)),              # Canada Atlas Lambert
    3112: ("lcc", GRS80, dict(lat1=-18.0, lat2=-36.0, lat0=0.0, lon0=134.0,
                              fe=0.0, fn=0.0)),              # GDA94/GA Lambert
    3416: ("lcc", GRS80, dict(lat1=49.0, lat2=46.0, lat0=47.5,
                              lon0=13.0 + 20.0 / 60.0,
                              fe=400000.0, fn=400000.0)),    # ETRS89/Austria Lambert
    26985: ("lcc", GRS80, dict(lat1=38.3, lat2=39.45, lat0=37.0 + 40.0 / 60.0,
                               lon0=-77.0, fe=400000.0, fn=0.0)),  # NAD83/Maryland (m)
    32118: ("lcc", GRS80, dict(lat1=40.0 + 40.0 / 60.0, lat2=41.0 + 2.0 / 60.0,
                               lat0=40.0 + 10.0 / 60.0, lon0=-74.0,
                               fe=300000.0, fn=0.0)),        # NAD83/NY Long Island (m)
    5070: ("albers", GRS80, dict(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0,
                                 fe=0.0, fn=0.0)),           # NAD83/Conus Albers
    3310: ("albers", GRS80, dict(lat1=34.0, lat2=40.5, lat0=0.0, lon0=-120.0,
                                 fe=0.0, fn=-4000000.0)),    # NAD83/California Albers
    3086: ("albers", GRS80, dict(lat1=24.0, lat2=31.5, lat0=24.0, lon0=-84.0,
                                 fe=400000.0, fn=0.0)),      # NAD83/Florida GDL Albers
    3577: ("albers", GRS80, dict(lat1=-18.0, lat2=-36.0, lat0=0.0, lon0=132.0,
                                 fe=0.0, fn=0.0)),           # GDA94/Australian Albers
    3035: ("laea", GRS80, dict(lat0=52.0, lon0=10.0,
                               fe=4321000.0, fn=3210000.0)),  # ETRS89/LAEA Europe
    3413: ("ps", WGS84, dict(lat_ts=70.0, lon0=-45.0,
                             fe=0.0, fn=0.0)),               # NSIDC PS North
    3031: ("ps", WGS84, dict(lat_ts=-71.0, lon0=0.0,
                             fe=0.0, fn=0.0)),               # Antarctic PS
    # --- round-4 additions -------------------------------------------------
    26986: ("lcc", GRS80, dict(lat1=41.0 + 43.0 / 60.0,
                               lat2=42.0 + 41.0 / 60.0, lat0=41.0,
                               lon0=-71.5, fe=200000.0, fn=750000.0)),
    # NAD83/Massachusetts Mainland (m)
    2991: ("lcc", GRS80, dict(lat1=43.0, lat2=45.5, lat0=41.75,
                              lon0=-120.5, fe=400000.0, fn=0.0)),
    # NAD83/Oregon Lambert (m)
    2451: ("tm", GRS80, dict(lat0=36.0, lon0=139.0 + 50.0 / 60.0,
                             k0=0.9999, fe=0.0, fn=0.0)),
    # JGD2000/Japan Plane Rectangular CS IX (Tokyo)
    4547: ("tm", GRS80, dict(lat0=0.0, lon0=114.0, k0=1.0,
                             fe=500000.0, fn=0.0)),
    # CGCS2000/3-degree Gauss-Kruger CM 114E
    5186: ("tm", GRS80, dict(lat0=38.0, lon0=127.0, k0=1.0,
                             fe=200000.0, fn=600000.0)),
    # KGD2002 (Korea 2000)/Central Belt 2010
    5179: ("tm", GRS80, dict(lat0=38.0, lon0=127.5, k0=0.9996,
                             fe=1000000.0, fn=2000000.0)),
    # Korea 2000/Unified CS (the nationwide single-zone grid Korean
    # web services ship)
    5880: ("poly", GRS80, dict(lat0=0.0, lon0=-54.0,
                               fe=5000000.0, fn=10000000.0)),
    # SIRGAS 2000/Brazil Polyconic (the national small-scale grid;
    # SAD69 twin 29101 is the datum-shifted legacy row)
    3763: ("tm", GRS80, dict(lat0=39.0 + 40.0 / 60.0 + 5.73 / 3600.0,
                             lon0=-(8.0 + 7.0 / 60.0 + 59.19 / 3600.0),
                             k0=1.0, fe=0.0, fn=0.0)),
    # ETRS89/Portugal TM06
    3414: ("tm", WGS84, dict(lat0=1.0 + 22.0 / 60.0,
                             lon0=103.0 + 50.0 / 60.0, k0=1.0,
                             fe=28001.642, fn=38744.572)),
    # SVY21/Singapore TM
    6933: ("cea", WGS84, dict(lat_ts=30.0, lon0=0.0, fe=0.0, fn=0.0)),
    # WGS84/NSIDC EASE-Grid 2.0 Global
    # --- round-7 additions --------------------------------------------------
    3034: ("lcc", GRS80, dict(lat1=35.0, lat2=65.0, lat0=52.0, lon0=10.0,
                              fe=4000000.0, fn=2800000.0)),
    # ETRS89-extended / LCC Europe
    3111: ("lcc", GRS80, dict(lat1=-36.0, lat2=-38.0, lat0=-37.0, lon0=145.0,
                              fe=2500000.0, fn=2500000.0)),
    # GDA94 / Vicgrid
    3979: ("lcc", GRS80, dict(lat1=49.0, lat2=77.0, lat0=49.0, lon0=-95.0,
                              fe=0.0, fn=0.0)),
    # NAD83(CSRS) / Canada Atlas Lambert (frame realization of 3978)
    6350: ("albers", GRS80, dict(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0,
                                 fe=0.0, fn=0.0)),
    # NAD83(2011) / Conus Albers (realization of 5070)
    2163: ("laea", (6370997.0, 0.0), dict(lat0=45.0, lon0=-100.0,
                                          fe=0.0, fn=0.0)),
    # US National Atlas Equal Area (authalic sphere)
    3995: ("ps", WGS84, dict(lat_ts=71.0, lon0=0.0, fe=0.0, fn=0.0)),
    # WGS 84 / Arctic Polar Stereographic
    3976: ("ps", WGS84, dict(lat_ts=-70.0, lon0=0.0, fe=0.0, fn=0.0)),
    # WGS 84 / NSIDC Sea Ice Polar Stereographic South
    # --- round-9 additions (ETRS89-family national grids + GDA2020) --------
    3059: ("tm", GRS80, dict(lat0=0.0, lon0=24.0, k0=0.9996,
                             fe=500000.0, fn=-6000000.0)),
    # LKS-92 / Latvia TM (ETRS89 realization)
    3301: ("lcc", GRS80, dict(lat1=59.0 + 20.0 / 60.0, lat2=58.0,
                              lat0=57.0 + 31.0 / 60.0 + 3.19415 / 3600.0,
                              lon0=24.0, fe=500000.0, fn=6375000.0)),
    # Estonian Coordinate System of 1997 (ETRS89 LCC)
    3812: ("lcc", GRS80, dict(lat1=49.0 + 50.0 / 60.0,
                              lat2=51.0 + 10.0 / 60.0,
                              lat0=50.0 + 47.0 / 60.0 + 52.134 / 3600.0,
                              lon0=4.0 + 21.0 / 60.0 + 33.177 / 3600.0,
                              fe=649328.0, fn=665262.0)),
    # ETRS89 / Belgian Lambert 2008 (NOT the BD72 Lambert 72 — that one
    # is datum-shifted and stays procedural at 31370)
    7845: ("lcc", GRS80, dict(lat1=-18.0, lat2=-36.0, lat0=0.0, lon0=134.0,
                              fe=0.0, fn=0.0)),
    # GDA2020 / GA LCC (GDA2020 treated WGS84-coincident like the MGA range)
    # --- round-9b additions (polar UPS, Americas nationals) -----------------
    32661: ("ps", WGS84, dict(lat_ts=90.0, k0=0.994, lon0=0.0,
                              fe=2000000.0, fn=2000000.0)),
    # WGS 84 / UPS North — variant A, tangent at the pole
    32761: ("ps", WGS84, dict(lat_ts=-90.0, k0=0.994, lon0=0.0,
                              fe=2000000.0, fn=2000000.0)),
    # WGS 84 / UPS South
    5041: ("ps", WGS84, dict(lat_ts=90.0, k0=0.994, lon0=0.0,
                             fe=2000000.0, fn=2000000.0)),
    # WGS 84 / UPS North (E,N) — same projection, modern code
    5042: ("ps", WGS84, dict(lat_ts=-90.0, k0=0.994, lon0=0.0,
                             fe=2000000.0, fn=2000000.0)),
    # WGS 84 / UPS South (E,N)
    9311: ("laea", (6370997.0, 0.0), dict(lat0=45.0, lon0=-100.0,
                                          fe=0.0, fn=0.0)),
    # NAD27 / US National Atlas Equal Area — the non-deprecated
    # successor to 2163 (identical authalic-sphere parameters)
    3347: ("lcc", GRS80, dict(lat1=49.0, lat2=77.0,
                              lat0=63.0 + 23.0 / 60.0 + 26.43 / 3600.0,
                              lon0=-(91.0 + 52.0 / 60.0),
                              fe=6200000.0, fn=3000000.0)),
    # NAD83 / Statistics Canada Lambert
    # r11: ETRS89 / UTM zone 32N zE-N (German INSPIRE delivery variant:
    # the zone number rides the false easting, 32,500,000 = "32" + the
    # plain zone's 500,000, so x = x_25832 + 32,000,000 exactly)
    4647: ("tm", GRS80, dict(lat0=0.0, lon0=9.0, k0=0.9996,
                             fe=32500000.0, fn=0.0)),
}


# Formulaic national series, generated rather than hand-keyed: zone
# parameters follow the published arithmetic of each series, so a
# mis-entry cannot hit a single zone (the r6 32139 lesson — the failure
# mode of hand-keyed rows is one-off transposition, which generation
# removes).  All parameters from the public EPSG dataset.
_JP_ZONES = [
    # Japan Plane Rectangular CS I..XIX: (lat0_deg, lon0_deg, lon0_min)
    (33, 129, 30), (33, 131, 0), (36, 132, 10), (33, 133, 30),
    (36, 134, 20), (36, 136, 0), (36, 137, 10), (36, 138, 30),
    (36, 139, 50), (40, 140, 50), (44, 140, 15), (44, 142, 15),
    (44, 144, 15), (26, 142, 0), (26, 127, 30), (26, 124, 0),
    (26, 131, 0), (20, 136, 0), (26, 154, 0),
]


def _generated_epsg_rows() -> dict[int, tuple]:
    rows: dict[int, tuple] = {}
    # CGCS2000 / 3-degree Gauss-Kruger CM 75E..135E = 4534..4554
    for i in range(21):
        rows[4534 + i] = ("tm", GRS80, dict(
            lat0=0.0, lon0=75.0 + 3.0 * i, k0=1.0, fe=500000.0, fn=0.0))
    # CGCS2000 / 3-degree GK zone-prefixed variants: zones 25-45 =
    # 4513..4533 (same belts as above, easting prefixed with the zone)
    for i in range(21):
        rows[4513 + i] = ("tm", GRS80, dict(
            lat0=0.0, lon0=75.0 + 3.0 * i, k0=1.0,
            fe=(25 + i) * 1_000_000.0 + 500_000.0, fn=0.0))
    # CGCS2000 / 6-degree Gauss-Kruger: zones 13-23 = 4491..4501
    # (zone-prefixed easting), CM 75E..135E = 4502..4512 (plain 500 km)
    for i in range(11):
        lon0 = 75.0 + 6.0 * i
        rows[4491 + i] = ("tm", GRS80, dict(
            lat0=0.0, lon0=lon0, k0=1.0,
            fe=(13 + i) * 1_000_000.0 + 500_000.0, fn=0.0))
        rows[4502 + i] = ("tm", GRS80, dict(
            lat0=0.0, lon0=lon0, k0=1.0, fe=500000.0, fn=0.0))
    # Japan Plane Rectangular CS I..XIX: JGD2000 = 2443.., JGD2011 = 6669..
    for i, (lat0, lond, lonm) in enumerate(_JP_ZONES):
        p = dict(lat0=float(lat0), lon0=lond + lonm / 60.0, k0=0.9999,
                 fe=0.0, fn=0.0)
        rows[2443 + i] = ("tm", GRS80, dict(p))
        rows[6669 + i] = ("tm", GRS80, dict(p))
    # Korea 2000 / West..East Sea Belt 2010 = 5185..5188 (125/127/129/131E)
    for i in range(4):
        rows[5185 + i] = ("tm", GRS80, dict(
            lat0=38.0, lon0=125.0 + 2.0 * i, k0=1.0,
            fe=200000.0, fn=600000.0))
    # RGF93 v1 / CC42..CC50 = 3942..3950 (one conic band per degree:
    # parallels lat0 -/+ 0.75, northing steps 1,000 km per band)
    for i in range(9):
        lat0 = 42.0 + i
        rows[3942 + i] = ("lcc", GRS80, dict(
            lat1=lat0 - 0.75, lat2=lat0 + 0.75, lat0=lat0, lon0=3.0,
            fe=1700000.0, fn=1200000.0 + 1000000.0 * i))
    # --- round-8 series ------------------------------------------------------
    # ETRS89 / Poland CS2000 zones 5-8 = 2176..2179 (3-degree GK belts:
    # CM 15/18/21/24E, k0 = 0.999923, easting prefixed with zone number)
    for i in range(4):
        rows[2176 + i] = ("tm", GRS80, dict(
            lat0=0.0, lon0=15.0 + 3.0 * i, k0=0.999923,
            fe=(5 + i) * 1_000_000.0 + 500_000.0, fn=0.0))
    # ETRS89 / NTM zones 5-30 = 5105..5130 (Norway Transverse Mercator:
    # 1-degree belts, CM = zone + 0.5 deg, k0 = 1, FE 100 km, FN 1000 km
    # from 58N)
    for z in range(5, 31):
        rows[5100 + z] = ("tm", GRS80, dict(
            lat0=58.0, lon0=z + 0.5, k0=1.0, fe=100000.0, fn=1000000.0))
    # --- round-9 series ------------------------------------------------------
    # SWEREF99 local zones = 3007..3018 (k0 = 1, FE 150 km; the EPSG
    # code order lists the 1.5-degree "dd mm" belts 12 00..18 00 first,
    # then the in-between 14 15..23 15 belts)
    for i, cm in enumerate([12.0, 13.5, 15.0, 16.5, 18.0,
                            14.25, 15.75, 17.25, 18.75, 20.25,
                            21.75, 23.25]):
        rows[3007 + i] = ("tm", GRS80, dict(
            lat0=0.0, lon0=cm, k0=1.0, fe=150000.0, fn=0.0))
    # ETRS89 / DKTM1-4 = 4093..4096 (Denmark: k0 = 0.99998,
    # FE = zone * 200 km, FN = -5,000 km)
    for i, cm in enumerate([9.0, 10.0, 11.75, 15.0]):
        rows[4093 + i] = ("tm", GRS80, dict(
            lat0=0.0, lon0=cm, k0=0.99998,
            fe=200000.0 * (i + 1), fn=-5000000.0))
    # --- round-9b series -----------------------------------------------------
    # SIRGAS 2000 / UTM (Brazil + neighbours; SIRGAS treated WGS84-
    # coincident like ETRS89/NAD83): zones 11N-22N = 31965..31976,
    # zones 17S-25S = 31977..31985
    for i in range(12):
        z = 11 + i
        rows[31965 + i] = ("tm", GRS80, dict(
            lat0=0.0, lon0=6.0 * z - 183.0, k0=0.9996,
            fe=500000.0, fn=0.0))
    for i in range(9):
        z = 17 + i
        rows[31977 + i] = ("tm", GRS80, dict(
            lat0=0.0, lon0=6.0 * z - 183.0, k0=0.9996,
            fe=500000.0, fn=10000000.0))
    # POSGAR 2007 / Argentina fajas 1-7 = 5343..5349 (Gauss-Kruger from
    # the SOUTH POLE: lat0 = -90, CM -72..-54 in 3-degree steps,
    # FE = faja * 1,000 km + 500 km)
    for i in range(7):
        rows[5343 + i] = ("tm", GRS80, dict(
            lat0=-90.0, lon0=-72.0 + 3.0 * i, k0=1.0,
            fe=(i + 1) * 1_000_000.0 + 500_000.0, fn=0.0))
    # MAGNA-SIRGAS / Colombia zones = 3114..3118 (TM from the Bogota
    # origin 4deg35'46.3215"N, CMs in 3-degree steps around
    # 74deg04'39.0285"W, FE = FN = 1,000 km)
    _co_lat0 = 4.0 + 35.0 / 60.0 + 46.3215 / 3600.0
    _co_bog = -(74.0 + 4.0 / 60.0 + 39.0285 / 3600.0)
    for i in range(5):
        rows[3114 + i] = ("tm", GRS80, dict(
            lat0=_co_lat0, lon0=_co_bog + 3.0 * (i - 2), k0=1.0,
            fe=1000000.0, fn=1000000.0))
    rows.update(_spcs83_rows())
    return rows


def _spcs83_rows() -> dict[int, tuple]:
    """NAD83 State Plane (meter codes).  Zone parameters are irreducible
    data (each state legislates its own parallels), so unlike the belt
    series above these come from a compact per-state spec table — but
    shared constants (false origins, the SPCS k0 ladder 1 - 1/N) are
    still factored, so a transposition can only hit a zone's parallels,
    which the published-range sanity test brackets.  Parameters from the
    public EPSG dataset; NAD83 is treated as WGS84-coincident like the
    26901+ UTM range above.  ftUS-axis variants (the 22xx block) are
    intentionally absent: this registry emits meters only."""
    rows: dict[int, tuple] = {}

    def lcc(code, lat1, lat2, lat0, lon0, fe, fn=0.0):
        rows[code] = ("lcc", GRS80, dict(
            lat1=lat1, lat2=lat2, lat0=lat0, lon0=lon0, fe=fe, fn=fn))

    def tm(code, lat0, lon0, k0, fe, fn=0.0):
        rows[code] = ("tm", GRS80, dict(
            lat0=lat0, lon0=lon0, k0=k0, fe=fe, fn=fn))

    mn = lambda d, m: math.copysign(abs(d) + m / 60.0, d)
    # California zones 1-6 = 26941..26946 (LCC, FE 2,000 km / FN 500 km)
    for i, (lat1, lat2, lat0, lon0) in enumerate([
        (40.0, mn(41, 40), mn(39, 20), -122.0),
        (mn(38, 20), mn(39, 50), mn(37, 40), -122.0),
        (mn(37, 4), mn(38, 26), 36.5, -120.5),
        (36.0, mn(37, 15), mn(35, 20), -119.0),
        (mn(34, 2), mn(35, 28), 33.5, -118.0),
        (mn(32, 47), mn(33, 53), mn(32, 10), -116.25),
    ]):
        lcc(26941 + i, lat1, lat2, lat0, lon0, 2000000.0, 500000.0)
    # Arizona East/Central/West = 26948..26950 (TM, lat0 31N,
    # FE 213,360 m = 700,000 international ft)
    tm(26948, 31.0, -mn(110, 10), 0.9999, 213360.0)
    tm(26949, 31.0, -mn(111, 55), 0.9999, 213360.0)
    tm(26950, 31.0, -mn(113, 45), 1.0 - 1.0 / 15000.0, 213360.0)
    # Florida East/West (TM) + North (LCC) = 26958..26960
    tm(26958, mn(24, 20), -81.0, 1.0 - 1.0 / 17000.0, 200000.0)
    tm(26959, mn(24, 20), -82.0, 1.0 - 1.0 / 17000.0, 200000.0)
    lcc(26960, mn(29, 35), mn(30, 45), 29.0, -84.5, 600000.0)
    # Illinois East/West = 26971/26972 (TM)
    tm(26971, mn(36, 40), -mn(88, 20), 1.0 - 1.0 / 40000.0, 300000.0)
    tm(26972, mn(36, 40), -mn(90, 10), 1.0 - 1.0 / 17000.0, 700000.0)
    # New York East/Central/West = 32115..32117 (TM; Long Island 32118
    # is a hand-keyed LCC row above)
    tm(32115, mn(38, 50), -74.5, 0.9999, 150000.0)
    tm(32116, 40.0, -mn(76, 35), 1.0 - 1.0 / 16000.0, 250000.0)
    tm(32117, 40.0, -mn(78, 35), 1.0 - 1.0 / 16000.0, 350000.0)
    # North Carolina = 32119 (LCC, FE 609,601.22 m = 2,000,000 ftUS)
    lcc(32119, mn(34, 20), mn(36, 10), 33.75, -79.0, 609601.22)
    # Pennsylvania North/South = 32128/32129 (LCC)
    lcc(32128, mn(40, 53), mn(41, 57), mn(40, 10), -77.75, 600000.0)
    lcc(32129, mn(39, 56), mn(40, 58), mn(39, 20), -77.75, 600000.0)
    # Texas ladder = 32137..32141 (LCC; FE steps down 100 km per zone
    # south of North, FN steps up 1,000 km; Central is the hand-keyed
    # 32139 row above with the same ladder values)
    lcc(32137, mn(34, 39), mn(36, 11), 34.0, -101.5, 200000.0, 1000000.0)
    lcc(32140, mn(28, 23), mn(30, 17), mn(27, 50), -99.0, 600000.0,
        4000000.0)
    lcc(32141, mn(26, 10), mn(27, 50), mn(25, 40), -98.5, 300000.0,
        5000000.0)
    # Washington North/South = 32148/32149 (LCC)
    lcc(32148, 47.5, mn(48, 44), 47.0, -mn(120, 50), 500000.0)
    lcc(32149, mn(45, 50), mn(47, 20), mn(45, 20), -120.5, 500000.0)
    # Colorado North/Central/South = 26953..26955 (LCC; the false
    # origin is the ftUS-native 3,000,000 / 1,000,000 ftUS expressed
    # in meters — Colorado legislated the foot grid, the meter twin
    # carries the conversion)
    lcc(26953, mn(39, 43), mn(40, 47), mn(39, 20), -105.5,
        914401.8289, 304800.6096)
    lcc(26954, mn(38, 27), mn(39, 45), mn(37, 50), -105.5,
        914401.8289, 304800.6096)
    lcc(26955, mn(37, 14), mn(38, 26), mn(36, 40), -105.5,
        914401.8289, 304800.6096)
    # Georgia East/West = 26966/26967 (TM)
    tm(26966, 30.0, -mn(82, 10), 0.9999, 200000.0)
    tm(26967, 30.0, -mn(84, 10), 0.9999, 700000.0)
    # Michigan North/Central/South = 26988..26990 (LCC; FE 8/6/4
    # MILLION meters — Michigan's grids are deliberately huge so the
    # international-foot twins stay positive statewide).  NOT
    # 26981..26983: the 269xx block runs ...Kansas 26977/8, Kentucky
    # N/S 26979/80, LOUISIANA N/S 26981/2, MAINE E/W 26983/4, Maryland
    # 26985, Massachusetts 26986/7, THEN Michigan (r12 review fix —
    # the first r12 tranche housed Michigan's parameters at
    # Louisiana/Maine's codes).
    lcc(26988, mn(45, 29), mn(47, 5), mn(44, 47), -87.0, 8000000.0)
    lcc(26989, mn(44, 11), mn(45, 42), mn(43, 19), -mn(84, 22), 6000000.0)
    lcc(26990, mn(42, 6), mn(43, 40), 41.5, -mn(84, 22), 4000000.0)
    # Louisiana North/South = 26981/26982 (LCC, FE 1,000 km)
    lcc(26981, mn(31, 10), mn(32, 40), 30.5, -92.5, 1000000.0)
    lcc(26982, mn(29, 18), mn(30, 42), 28.5, -mn(91, 20), 1000000.0)
    # Maine East/West = 26983/26984 (TM)
    tm(26983, mn(43, 40), -68.5, 0.9999, 300000.0)
    tm(26984, mn(42, 50), -mn(70, 10), 1.0 - 1.0 / 30000.0, 900000.0)
    # --- r12b tranche: every remaining state (the 269xx/321xx blocks
    # are now complete except Alaska zone 1, whose rotated Hotine
    # oblique Mercator variant is params-escape-hatch-only) ------------
    # Alabama East/West = 26929/26930 (TM)
    tm(26929, 30.5, -mn(85, 50), 1.0 - 1.0 / 25000.0, 200000.0)
    tm(26930, 30.0, -87.5, 1.0 - 1.0 / 15000.0, 600000.0)
    # Alaska zones 2-9 = 26932..26939 (TM ladder: CM -142 .. -170
    # stepping 4 degrees west, lat0 54, k0 0.9999, FE 500 km)
    for z in range(2, 10):
        tm(26930 + z, 54.0, -142.0 - 4.0 * (z - 2), 0.9999, 500000.0)
    # Alaska zone 10 = 26940 (Aleutians LCC, FE 1,000 km)
    lcc(26940, mn(51, 50), mn(53, 50), 51.0, -176.0, 1000000.0)
    # Arkansas North/South = 26951/26952
    lcc(26951, mn(34, 56), mn(36, 14), mn(34, 20), -92.0, 400000.0)
    lcc(26952, mn(33, 18), mn(34, 46), mn(32, 40), -92.0,
        400000.0, 400000.0)
    # Connecticut = 26956 (the meter expression of the ftUS-native
    # 1,000,000 / 500,000 ftUS false origin)
    lcc(26956, mn(41, 12), mn(41, 52), mn(40, 50), -72.75,
        304800.6096, 152400.3048)
    # Delaware = 26957 (the loosest SPCS TM: k0 1 - 1/200,000)
    tm(26957, 38.0, -mn(75, 25), 1.0 - 1.0 / 200000.0, 200000.0)
    # Hawaii zones 1-5 = 26961..26965 (TM; zone 5 is exactly k0 = 1)
    tm(26961, mn(18, 50), -155.5, 1.0 - 1.0 / 30000.0, 500000.0)
    tm(26962, mn(20, 20), -mn(156, 40), 1.0 - 1.0 / 30000.0, 500000.0)
    tm(26963, mn(21, 10), -158.0, 1.0 - 1.0 / 100000.0, 500000.0)
    tm(26964, mn(21, 50), -159.5, 1.0 - 1.0 / 100000.0, 500000.0)
    tm(26965, mn(21, 40), -mn(160, 10), 1.0, 500000.0)
    # Idaho East/Central/West = 26968..26970
    tm(26968, mn(41, 40), -mn(112, 10), 1.0 - 1.0 / 19000.0, 200000.0)
    tm(26969, mn(41, 40), -114.0, 1.0 - 1.0 / 19000.0, 500000.0)
    tm(26970, mn(41, 40), -mn(115, 45), 1.0 - 1.0 / 15000.0, 800000.0)
    # Indiana East/West = 26973/26974 (the only TM states with FN 250 km)
    tm(26973, 37.5, -mn(85, 40), 1.0 - 1.0 / 30000.0, 100000.0, 250000.0)
    tm(26974, 37.5, -mn(87, 5), 1.0 - 1.0 / 30000.0, 900000.0, 250000.0)
    # Iowa North/South = 26975/26976
    lcc(26975, mn(42, 4), mn(43, 16), 41.5, -93.5, 1500000.0, 1000000.0)
    lcc(26976, mn(40, 37), mn(41, 47), 40.0, -93.5, 500000.0)
    # Kansas North/South = 26977/26978
    lcc(26977, mn(38, 43), mn(39, 47), mn(38, 20), -98.0, 400000.0)
    lcc(26978, mn(37, 16), mn(38, 34), mn(36, 40), -98.5,
        400000.0, 400000.0)
    # Kentucky North/South = 26979/26980 (two-zone system; the
    # statewide Single Zone is 3088)
    lcc(26979, mn(37, 58), mn(38, 58), 37.5, -84.25, 500000.0)
    lcc(26980, mn(36, 44), mn(37, 56), mn(36, 20), -85.75,
        500000.0, 500000.0)
    lcc(3088, mn(37, 5), mn(38, 40), mn(36, 20), -85.75,
        1500000.0, 1000000.0)
    # Minnesota North/Central/South = 26991..26993 (FE 800 / FN 100 km)
    lcc(26991, mn(47, 2), mn(48, 38), 46.5, -mn(93, 6),
        800000.0, 100000.0)
    lcc(26992, mn(45, 37), mn(47, 3), 45.0, -mn(94, 15),
        800000.0, 100000.0)
    lcc(26993, mn(43, 47), mn(45, 13), 43.0, -94.0, 800000.0, 100000.0)
    # Mississippi East/West = 26994/26995
    tm(26994, 29.5, -mn(88, 50), 1.0 - 1.0 / 20000.0, 300000.0)
    tm(26995, 29.5, -mn(90, 20), 1.0 - 1.0 / 20000.0, 700000.0)
    # Missouri East/Central/West = 26996..26998
    tm(26996, mn(35, 50), -90.5, 1.0 - 1.0 / 15000.0, 250000.0)
    tm(26997, mn(35, 50), -92.5, 1.0 - 1.0 / 15000.0, 500000.0)
    tm(26998, mn(36, 10), -94.5, 1.0 - 1.0 / 17000.0, 850000.0)
    # Montana = 32100 and Nebraska = 32104 (statewide LCC)
    lcc(32100, 45.0, 49.0, 44.25, -109.5, 600000.0)
    lcc(32104, 40.0, 43.0, mn(39, 50), -100.0, 500000.0)
    # Nevada East/Central/West = 32107..32109 (the 8/6/4-million-m FN
    # ladder keeps northings positive and zone-distinct statewide)
    tm(32107, 34.75, -mn(115, 35), 0.9999, 200000.0, 8000000.0)
    tm(32108, 34.75, -mn(116, 40), 0.9999, 500000.0, 6000000.0)
    tm(32109, 34.75, -mn(118, 35), 0.9999, 800000.0, 4000000.0)
    # New Hampshire = 32110, New Jersey = 32111
    tm(32110, 42.5, -mn(71, 40), 1.0 - 1.0 / 30000.0, 300000.0)
    tm(32111, mn(38, 50), -74.5, 0.9999, 150000.0)
    # New Mexico East/Central/West = 32112..32114
    tm(32112, 31.0, -mn(104, 20), 1.0 - 1.0 / 11000.0, 165000.0)
    tm(32113, 31.0, -106.25, 0.9999, 500000.0)
    tm(32114, 31.0, -mn(107, 50), 1.0 - 1.0 / 12000.0, 830000.0)
    # North Dakota North/South = 32120/32121
    lcc(32120, mn(47, 26), mn(48, 44), 47.0, -100.5, 600000.0)
    lcc(32121, mn(46, 11), mn(47, 29), mn(45, 40), -100.5, 600000.0)
    # Ohio North/South = 32122/32123 (meter twins of the r11 3734/3735
    # ftUS rows)
    lcc(32122, mn(40, 26), mn(41, 42), mn(39, 40), -82.5, 600000.0)
    lcc(32123, mn(38, 44), mn(40, 2), 38.0, -82.5, 600000.0)
    # Oklahoma North/South = 32124/32125
    lcc(32124, mn(35, 34), mn(36, 46), 35.0, -98.0, 600000.0)
    lcc(32125, mn(33, 56), mn(35, 14), mn(33, 20), -98.0, 600000.0)
    # Oregon North/South = 32126/32127 (FE 2,500 / 1,500 km — an
    # international-foot state, twins 2269/2270)
    lcc(32126, mn(44, 20), 46.0, mn(43, 40), -120.5, 2500000.0)
    lcc(32127, mn(42, 20), 44.0, mn(41, 40), -120.5, 1500000.0)
    # Rhode Island = 32130 (the tightest SPCS k0: 1 - 1/160,000)
    tm(32130, mn(41, 5), -71.5, 1.0 - 1.0 / 160000.0, 100000.0)
    # South Carolina = 32133 (single zone; FE 609,600 m = 2,000,000
    # INTERNATIONAL feet exactly, twin 2273)
    lcc(32133, 32.5, mn(34, 50), mn(31, 50), -81.0, 609600.0)
    # South Dakota North/South = 32134/32135
    lcc(32134, mn(44, 25), mn(45, 41), mn(43, 50), -100.0, 600000.0)
    lcc(32135, mn(42, 50), mn(44, 24), mn(42, 20), -mn(100, 20),
        600000.0)
    # Tennessee = 32136 (single zone)
    lcc(32136, mn(35, 15), mn(36, 25), mn(34, 20), -86.0, 600000.0)
    # Texas North Central = 32138 (completes the 32137..32141 ladder)
    lcc(32138, mn(32, 8), mn(33, 58), mn(31, 40), -98.5,
        600000.0, 2000000.0)
    # Utah North/Central/South = 32142..32144 (FN 1/2/3 million m)
    lcc(32142, mn(40, 43), mn(41, 47), mn(40, 20), -111.5,
        500000.0, 1000000.0)
    lcc(32143, mn(39, 1), mn(40, 39), mn(38, 20), -111.5,
        500000.0, 2000000.0)
    lcc(32144, mn(37, 13), mn(38, 21), mn(36, 40), -111.5,
        500000.0, 3000000.0)
    # Vermont = 32145
    tm(32145, 42.5, -72.5, 1.0 - 1.0 / 28000.0, 500000.0)
    # Virginia North/South = 32146/32147 (FE 3,500 km)
    lcc(32146, mn(38, 2), mn(39, 12), mn(37, 40), -78.5,
        3500000.0, 2000000.0)
    lcc(32147, mn(36, 46), mn(37, 58), mn(36, 20), -78.5,
        3500000.0, 1000000.0)
    # West Virginia North/South = 32150/32151
    lcc(32150, 39.0, mn(40, 15), 38.5, -79.5, 600000.0)
    lcc(32151, mn(37, 29), mn(38, 53), 37.0, -81.0, 600000.0)
    # Wisconsin North/Central/South = 32152..32154
    lcc(32152, mn(45, 34), mn(46, 46), mn(45, 10), -90.0, 600000.0)
    lcc(32153, mn(44, 15), mn(45, 30), mn(43, 50), -90.0, 600000.0)
    lcc(32154, mn(42, 44), mn(44, 4), 42.0, -90.0, 600000.0)
    # Wyoming East/East Central/West Central/West = 32155..32158
    # (k0 1 - 1/16,000 for all four; EC and W carry FN 100 km)
    tm(32155, 40.5, -mn(105, 10), 1.0 - 1.0 / 16000.0, 200000.0)
    tm(32156, 40.5, -mn(107, 20), 1.0 - 1.0 / 16000.0,
       400000.0, 100000.0)
    tm(32157, 40.5, -108.75, 1.0 - 1.0 / 16000.0, 600000.0)
    tm(32158, 40.5, -mn(110, 5), 1.0 - 1.0 / 16000.0,
       800000.0, 100000.0)
    return rows


# generated rows never override hand-keyed ones (2451/4547/5186 overlap
# the series with identical parameters; the literal row wins)
for _c, _ent in _generated_epsg_rows().items():
    EPSG_TABLE.setdefault(_c, _ent)


#: EPSG 9003 US survey foot / EPSG 9002 international foot — the axis
#: units of the SPCS83 foot-grid codes below
FT_US = 1200.0 / 3937.0
FT_INTL = 0.3048


def _spcs83_ftus_rows() -> dict[int, tuple]:
    """NAD83 State Plane FOOT-axis codes (r11): the grids US municipal
    data actually ships in.  Entries are (family, ellipsoid, params,
    to_meter) with ``fe``/``fn`` in the NATIVE unit exactly as EPSG
    publishes them (e.g. California's 6,561,666.667 ftUS is the
    published value, 0.1 mm off the meter twin's round 2,000,000 m —
    the foot grid is its own CRS, not a rescaled meter grid).  The
    projection math runs in meters; only the false origin and the axis
    unit differ from the meter twins validated in _spcs83_rows.
    Reference resolves these via PROJ (core/reproject.py:94-160)."""
    rows: dict[int, tuple] = {}
    mn = lambda d, m: math.copysign(abs(d) + m / 60.0, d)

    def lcc(code, lat1, lat2, lat0, lon0, fe, fn=0.0, unit=FT_US):
        rows[code] = ("lcc", GRS80, dict(
            lat1=lat1, lat2=lat2, lat0=lat0, lon0=lon0, fe=fe, fn=fn), unit)

    def tm(code, lat0, lon0, k0, fe, fn=0.0, unit=FT_US):
        rows[code] = ("tm", GRS80, dict(
            lat0=lat0, lon0=lon0, k0=k0, fe=fe, fn=fn), unit)

    # California zones 1-6 = 2225..2230 (ftUS; FE 6,561,666.667 /
    # FN 1,640,416.667 ftUS = 2,000,000 / 500,000 m nominal) — same
    # parallels as the 26941..26946 meter rows
    for i, (lat1, lat2, lat0, lon0) in enumerate([
        (40.0, mn(41, 40), mn(39, 20), -122.0),
        (mn(38, 20), mn(39, 50), mn(37, 40), -122.0),
        (mn(37, 4), mn(38, 26), 36.5, -120.5),
        (36.0, mn(37, 15), mn(35, 20), -119.0),
        (mn(34, 2), mn(35, 28), 33.5, -118.0),
        (mn(32, 47), mn(33, 53), mn(32, 10), -116.25),
    ]):
        lcc(2225 + i, lat1, lat2, lat0, lon0, 6561666.667, 1640416.667)
    # Arizona East/Central/West = 2222..2224 (INTERNATIONAL feet:
    # Arizona legislated ift, not ftUS; FE 700,000 ift = 213,360 m
    # exactly) — parameters mirror the 26948..26950 meter rows
    tm(2222, 31.0, -mn(110, 10), 0.9999, 700000.0, unit=FT_INTL)
    tm(2223, 31.0, -mn(111, 55), 0.9999, 700000.0, unit=FT_INTL)
    tm(2224, 31.0, -mn(113, 45), 1.0 - 1.0 / 15000.0, 700000.0,
       unit=FT_INTL)
    # Maryland = 2248 (ftUS; meter twin 26985): FE 1,312,333.333 ftUS
    lcc(2248, 38.3, 39.45, mn(37, 40), -77.0, 1312333.333)
    # New York Long Island = 2263, and its NAD83(2011) twin 6539
    # (meter twin 32118): FE 984,250 ftUS = 300,000 m exactly
    lcc(2263, mn(40, 40), mn(41, 2), mn(40, 10), -74.0, 984250.0)
    lcc(6539, mn(40, 40), mn(41, 2), mn(40, 10), -74.0, 984250.0)
    # Ohio North/South = 3734/3735 (ftUS; FE 1,968,500 ftUS = 600,000 m)
    lcc(3734, mn(40, 26), mn(41, 42), mn(39, 40), -82.5, 1968500.0)
    lcc(3735, mn(38, 44), mn(40, 2), 38.0, -82.5, 1968500.0)
    # Texas ladder = 2275..2279 (ftUS; the same FE-down/FN-up ladder as
    # the 32137..32141 meter rows, published in ftUS)
    lcc(2275, mn(34, 39), mn(36, 11), 34.0, -101.5,
        656166.667, 3280833.333)
    lcc(2276, mn(32, 8), mn(33, 58), mn(31, 40), -98.5,
        1968500.0, 6561666.667)
    lcc(2277, mn(30, 7), mn(31, 53), mn(29, 40), -mn(100, 20),
        2296666.667, 9842500.0)
    lcc(2278, mn(28, 23), mn(30, 17), mn(27, 50), -99.0,
        1968500.0, 13123333.333)
    lcc(2279, mn(26, 10), mn(27, 50), mn(25, 40), -98.5,
        984250.0, 16404166.667)
    # --- r12 tranche: the remaining high-traffic state foot grids ---
    # Pennsylvania North/South = 2271/2272 (ftUS; meter twins
    # 32128/32129): FE 1,968,500 ftUS = 600,000 m EXACTLY
    lcc(2271, mn(40, 53), mn(41, 57), mn(40, 10), -77.75, 1968500.0)
    lcc(2272, mn(39, 56), mn(40, 58), mn(39, 20), -77.75, 1968500.0)
    # Illinois East/West = 3435/3436 (ftUS; meter twins 26971/26972):
    # East FE 984,250 ftUS = 300,000 m exactly; West FE 2,296,583.333
    # ftUS is the published mm-rounding of 700,000 m
    tm(3435, mn(36, 40), -mn(88, 20), 1.0 - 1.0 / 40000.0, 984250.0)
    tm(3436, mn(36, 40), -mn(90, 10), 1.0 - 1.0 / 17000.0, 2296583.333)
    # Florida East/West (TM) + North (LCC) = 2236..2238 (ftUS; meter
    # twins 26958..26960): TM FE 656,166.667 ftUS ~ 200,000 m (mm-
    # rounded); North FE 1,968,500 ftUS = 600,000 m exactly
    tm(2236, mn(24, 20), -81.0, 1.0 - 1.0 / 17000.0, 656166.667)
    tm(2237, mn(24, 20), -82.0, 1.0 - 1.0 / 17000.0, 656166.667)
    lcc(2238, mn(29, 35), mn(30, 45), 29.0, -84.5, 1968500.0)
    # Washington North/South = 2285/2286 (ftUS; meter twins
    # 32148/32149): FE 1,640,416.667 ftUS ~ 500,000 m (mm-rounded)
    lcc(2285, 47.5, mn(48, 44), 47.0, -mn(120, 50), 1640416.667)
    lcc(2286, mn(45, 50), mn(47, 20), mn(45, 20), -120.5, 1640416.667)
    # Colorado North/Central/South = 2231..2233 (ftUS; meter twins
    # 26953..26955): Colorado's native FE/FN 3,000,000 / 1,000,000 ftUS
    lcc(2231, mn(39, 43), mn(40, 47), mn(39, 20), -105.5,
        3000000.0, 1000000.0)
    lcc(2232, mn(38, 27), mn(39, 45), mn(37, 50), -105.5,
        3000000.0, 1000000.0)
    lcc(2233, mn(37, 14), mn(38, 26), mn(36, 40), -105.5,
        3000000.0, 1000000.0)
    # Georgia East/West = 2239/2240 (ftUS; meter twins 26966/26967)
    tm(2239, 30.0, -mn(82, 10), 0.9999, 656166.667)
    tm(2240, 30.0, -mn(84, 10), 0.9999, 2296583.333)
    # Michigan North/Central/South = 2251..2253 (INTERNATIONAL feet,
    # like Arizona; meter twins 26988..26990): FE 8/6/4 million meters
    # published as 26,246,719.16 / 19,685,039.37 / 13,123,359.58 ift
    lcc(2251, mn(45, 29), mn(47, 5), mn(44, 47), -87.0,
        26246719.16, unit=FT_INTL)
    lcc(2252, mn(44, 11), mn(45, 42), mn(43, 19), -mn(84, 22),
        19685039.37, unit=FT_INTL)
    lcc(2253, mn(42, 6), mn(43, 40), 41.5, -mn(84, 22),
        13123359.58, unit=FT_INTL)
    # --- r12b tranche: foot twins for the remaining-state meter rows --
    # Connecticut = 2234 (ftUS-NATIVE grid: FE/FN 1,000,000 / 500,000
    # ftUS are the legislated values; the meter twin carries the
    # conversion)
    lcc(2234, mn(41, 12), mn(41, 52), mn(40, 50), -72.75,
        1000000.0, 500000.0)
    # Delaware = 2235 (ftUS; 656,166.667 ftUS ~ 200,000 m mm-rounded)
    tm(2235, 38.0, -mn(75, 25), 1.0 - 1.0 / 200000.0, 656166.667)
    # Kentucky North/South = 2246/2247 + statewide Single Zone = 3089
    lcc(2246, mn(37, 58), mn(38, 58), 37.5, -84.25, 1640416.667)
    lcc(2247, mn(36, 44), mn(37, 56), mn(36, 20), -85.75,
        1640416.667, 1640416.667)
    lcc(3089, mn(37, 5), mn(38, 40), mn(36, 20), -85.75,
        4921250.0, 3280833.333)
    # Mississippi East/West = 2254/2255 (ftUS)
    tm(2254, 29.5, -mn(88, 50), 1.0 - 1.0 / 20000.0, 984250.0)
    tm(2255, 29.5, -mn(90, 20), 1.0 - 1.0 / 20000.0, 2296583.333)
    # Oregon North/South = 2269/2270 (INTERNATIONAL feet — Oregon
    # legislated ift like Arizona/Michigan; FE 8,202,099.738 /
    # 4,921,259.843 ift are the published mm-roundings of 2,500,000 /
    # 1,500,000 m)
    lcc(2269, mn(44, 20), 46.0, mn(43, 40), -120.5,
        8202099.738, unit=FT_INTL)
    lcc(2270, mn(42, 20), 44.0, mn(41, 40), -120.5,
        4921259.843, unit=FT_INTL)
    # South Carolina = 2273 (INTERNATIONAL feet; FE 2,000,000 ift =
    # 609,600 m EXACTLY)
    lcc(2273, 32.5, mn(34, 50), mn(31, 50), -81.0,
        2000000.0, unit=FT_INTL)
    # Tennessee = 2274 (ftUS; 1,968,500 ftUS = 600,000 m exactly)
    lcc(2274, mn(35, 15), mn(36, 25), mn(34, 20), -86.0, 1968500.0)
    # Virginia North/South = 2283/2284 (ftUS; FE 11,482,916.667 ftUS
    # ~ 3,500,000 m)
    lcc(2283, mn(38, 2), mn(39, 12), mn(37, 40), -78.5,
        11482916.667, 6561666.667)
    lcc(2284, mn(36, 46), mn(37, 58), mn(36, 20), -78.5,
        11482916.667, 3280833.333)
    # Wisconsin North/Central/South = 2287..2289 (ftUS; 600 km exact)
    lcc(2287, mn(45, 34), mn(46, 46), mn(45, 10), -90.0, 1968500.0)
    lcc(2288, mn(44, 15), mn(45, 30), mn(43, 50), -90.0, 1968500.0)
    lcc(2289, mn(42, 44), mn(44, 4), 42.0, -90.0, 1968500.0)
    # New Jersey = 3424 (ftUS; 492,125 ftUS = 150,000 m exactly)
    tm(3424, mn(38, 50), -74.5, 0.9999, 492125.0)
    # Indiana East/West = 2965/2966 (ftUS; FN 820,208.333 ~ 250,000 m)
    tm(2965, 37.5, -mn(85, 40), 1.0 - 1.0 / 30000.0,
       328083.333, 820208.333)
    tm(2966, 37.5, -mn(87, 5), 1.0 - 1.0 / 30000.0,
       2952750.0, 820208.333)
    return rows


#: code -> (family, ellipsoid, params-in-native-unit, to_meter)
UNIT_EPSG_TABLE: dict[int, tuple] = _spcs83_ftus_rows()


def _family_kernels():
    return {
        "tm": (make_tm, tm_forward, tm_inverse),
        "lcc": (make_lcc, lcc_forward, lcc_inverse),
        "albers": (make_albers, albers_forward, albers_inverse),
        "laea": (make_laea, laea_forward, laea_inverse),
        "ps": (make_polar_stereo, ps_forward, ps_inverse),
        "cea": (make_cea, cea_forward, cea_inverse),
        "poly": (make_polyconic, poly_forward, poly_inverse),
    }


#: name -> (a, f) for user-facing parameterized specs
ELLIPSOIDS: dict[str, tuple[float, float]] = {}     # filled after defs below


def proj_from_params(spec: dict):
    """(forward, inverse) numpy transforms from a PARAMETER DICT — the
    escape hatch for any CRS not in the built-in EPSG registry.  The
    reference covers arbitrary "AUTH:CODE" through PROJ
    (core/reproject.py:94-160); this engine's kernels are already fully
    parameterized, so an unlisted code needs only its public EPSG
    registry parameters:

        {"family": "lcc", "ellps": "GRS80",
         "lat1": 44.0, "lat2": 49.0, "lat0": 46.5, "lon0": 3.0,
         "fe": 700000.0, "fn": 6600000.0}

    Keys:
      family  — one of tm / lcc / albers / laea / ps / cea / swiss /
                krovak / obst (oblique stereographic, EPSG 9809) /
                moll (Mollweide) — the same kernels the registry
                codes use;
      ellps   — ellipsoid name (WGS84, GRS80, AIRY1830, BESSEL1841,
                INTL1924) or {"a": ..., "rf": ...} (inverse flattening;
                rf=0 for a sphere);
      towgs84 — optional 3- or 7-parameter Helmert to WGS84
                (tx ty tz [rx ry rz s_ppm], arc-seconds / ppm) when the
                CRS's datum is not WGS84-coincident;
      ...     — the family's projection parameters, exactly as the
                kernel constructors take them (tm: lat0 lon0 k0 fe fn;
                lcc/albers: lat1 lat2 lat0 lon0 fe fn; laea: lat0 lon0
                fe fn; ps/cea: lat_ts lon0 fe fn; swiss: lat0 lon0 e0
                n0; krovak: latc lon0 alphac latp kp).
    """
    spec = dict(spec)
    spec.pop("crs", None)        # optional metadata label, not a kernel arg
    fam = spec.pop("family", None)
    kernels = dict(_family_kernels())
    kernels["swiss"] = (make_swiss, swiss_forward, swiss_inverse)
    kernels["krovak"] = (make_krovak, krovak_forward, krovak_inverse)
    kernels["obst"] = (make_oblique_stereo, oblique_stereo_forward,
                       oblique_stereo_inverse)
    kernels["moll"] = (make_mollweide, moll_forward, moll_inverse)
    if fam not in kernels:
        raise ValueError(
            f"unknown projection family {fam!r}; supported: "
            f"{sorted(kernels)}")
    ell = spec.pop("ellps", "WGS84")
    if isinstance(ell, str):
        key = ell.upper().replace(" ", "")
        if key not in ELLIPSOIDS:
            raise ValueError(
                f"unknown ellipsoid {ell!r}; supported names: "
                f"{sorted(ELLIPSOIDS)} or pass {{'a': ..., 'rf': ...}}")
        a, f = ELLIPSOIDS[key]
    elif isinstance(ell, dict):
        a = float(ell["a"])
        rf = float(ell.get("rf", 0.0))
        f = 1.0 / rf if rf else 0.0
    else:
        a, f = float(ell[0]), float(ell[1])
    towgs84 = spec.pop("towgs84", None)
    mk, fwd, inv = kernels[fam]
    try:
        c = mk(a, f, **spec)
    except TypeError as exc:
        raise ValueError(
            f"bad parameters for family {fam!r}: {exc}") from None
    proj_fwd = lambda lo, la: fwd(lo, la, c)       # noqa: E731
    proj_inv = lambda x, y: inv(x, y, c)           # noqa: E731
    if towgs84 is None:
        return proj_fwd, proj_inv
    p = tuple(float(v) for v in towgs84)
    if len(p) == 3:
        p = p + (0.0, 0.0, 0.0, 0.0)
    if len(p) != 7:
        raise ValueError("towgs84 must have 3 or 7 parameters")
    return _with_datum(proj_fwd, proj_inv, (a, f), p)


def _proj_for_epsg(code: int):
    """(forward, inverse) numpy transforms for a supported EPSG code."""
    ent = EPSG_TABLE.get(code)
    if ent is not None:
        fam, ell, params = ent
        mk, fwd, inv = _family_kernels()[fam]
        c = mk(*ell, **params)
        return (lambda lo, la: fwd(lo, la, c),
                lambda x, y: inv(x, y, c))
    uent = UNIT_EPSG_TABLE.get(code)
    if uent is not None:
        # foot-axis grid: run the meter kernel with the false origin
        # scaled in, divide the outputs back to the native unit (the
        # unit is a pure axis rescale — the conformal math is unitless)
        fam, ell, params, u = uent
        p = dict(params)
        p["fe"] = p.get("fe", 0.0) * u
        p["fn"] = p.get("fn", 0.0) * u
        mk, fwd, inv = _family_kernels()[fam]
        c = mk(*ell, **p)

        def _ufwd(lo, la, _fwd=fwd, _c=c, _u=u):
            x, y = _fwd(lo, la, _c)
            return x / _u, y / _u

        def _uinv(x, y, _inv=inv, _c=c, _u=u):
            return _inv(np.asarray(x, dtype=np.float64) * _u,
                        np.asarray(y, dtype=np.float64) * _u, _c)

        return _ufwd, _uinv
    # WGS84 UTM: 32601-32660 north, 32701-32760 south
    if 32601 <= code <= 32660:
        zone = code - 32600
        c = make_tm(*WGS84, lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                    fe=500000.0, fn=0.0)
        return (lambda lo, la: tm_forward(lo, la, c),
                lambda x, y: tm_inverse(x, y, c))
    if 32701 <= code <= 32760:
        zone = code - 32700
        c = make_tm(*WGS84, lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                    fe=500000.0, fn=10000000.0)
        return (lambda lo, la: tm_forward(lo, la, c),
                lambda x, y: tm_inverse(x, y, c))
    # ETRS89 UTM zones 28-38 (GRS80)
    if 25828 <= code <= 25838:
        zone = code - 25800
        c = make_tm(*GRS80, lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                    fe=500000.0, fn=0.0)
        return (lambda lo, la: tm_forward(lo, la, c),
                lambda x, y: tm_inverse(x, y, c))
    # NAD83 UTM zones 1-23 north (GRS80; NAD83 treated as WGS84-coincident)
    if 26901 <= code <= 26923:
        zone = code - 26900
        c = make_tm(*GRS80, lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                    fe=500000.0, fn=0.0)
        return (lambda lo, la: tm_forward(lo, la, c),
                lambda x, y: tm_inverse(x, y, c))
    # GDA94 / MGA zones 48-58 (GRS80 UTM south; GDA94 ~ WGS84)
    if 28348 <= code <= 28358:
        zone = code - 28300
        c = make_tm(*GRS80, lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                    fe=500000.0, fn=10000000.0)
        return (lambda lo, la: tm_forward(lo, la, c),
                lambda x, y: tm_inverse(x, y, c))
    # GDA2020 / MGA zones 46-58 (same UTM-south recipe on GRS80; the
    # GDA94->GDA2020 plate-motion shift is ~1.8 m, below this
    # registry's WGS84-coincidence treatment of both frames)
    if 7846 <= code <= 7858:
        zone = code - 7800
        c = make_tm(*GRS80, lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                    fe=500000.0, fn=10000000.0)
        return (lambda lo, la: tm_forward(lo, la, c),
                lambda x, y: tm_inverse(x, y, c))
    # SIRGAS 2000 UTM (GRS80; SIRGAS2000 ~ WGS84): zones 11N-22N are
    # 31965-31976 (code = 31954 + zone), zones 17S-25S are 31977-31985
    # (code = 31960 + zone)
    if 31965 <= code <= 31976:
        zone = code - 31954
        c = make_tm(*GRS80, lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                    fe=500000.0, fn=0.0)
        return (lambda lo, la: tm_forward(lo, la, c),
                lambda x, y: tm_inverse(x, y, c))
    if 31977 <= code <= 31985:
        zone = code - 31960
        c = make_tm(*GRS80, lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                    fe=500000.0, fn=10000000.0)
        return (lambda lo, la: tm_forward(lo, la, c),
                lambda x, y: tm_inverse(x, y, c))
    if code == 27700:  # OSGB36 / British National Grid (Airy 1830 + Helmert)
        c = make_tm(*AIRY1830, lat0=49.0, lon0=-2.0, k0=0.9996012717,
                    fe=400000.0, fn=-100000.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           AIRY1830, _DATUM_OSGB36)
    if code == 2056:  # CH1903+ / LV95 (Swiss oblique Mercator, Bessel)
        c = make_swiss(*BESSEL1841,
                       lat0=46.0 + 57.0 / 60.0 + 8.66 / 3600.0,
                       lon0=7.0 + 26.0 / 60.0 + 22.50 / 3600.0,
                       e0=2600000.0, n0=1200000.0)
        return _with_datum(lambda lo, la: swiss_forward(lo, la, c),
                           lambda x, y: swiss_inverse(x, y, c),
                           BESSEL1841, _DATUM_CH1903P)
    if code == 21781:  # CH1903 / LV03 (same projection, legacy offsets)
        c = make_swiss(*BESSEL1841,
                       lat0=46.0 + 57.0 / 60.0 + 8.66 / 3600.0,
                       lon0=7.0 + 26.0 / 60.0 + 22.50 / 3600.0,
                       e0=600000.0, n0=200000.0)
        return _with_datum(lambda lo, la: swiss_forward(lo, la, c),
                           lambda x, y: swiss_inverse(x, y, c),
                           BESSEL1841, _DATUM_CH1903P)
    if code == 31370:  # BD72 / Belgian Lambert 72 (Intl 1924 + Helmert)
        c = make_lcc(*INTL1924,
                     lat1=49.0 + 50.0 / 60.0 + 0.00204 / 3600.0,
                     lat2=51.0 + 10.0 / 60.0 + 0.00204 / 3600.0,
                     lat0=90.0, lon0=4.0 + 22.0 / 60.0 + 2.952 / 3600.0,
                     fe=150000.013, fn=5400088.438)
        return _with_datum(lambda lo, la: lcc_forward(lo, la, c),
                           lambda x, y: lcc_inverse(x, y, c),
                           INTL1924, _DATUM_BD72)
    if code == 2039:  # Israel 1993 / Israeli TM Grid (GRS80 + Helmert)
        # Israel 1993 is GPS-derived on GRS80 but offset from WGS84 by
        # ~90 m (EPSG transformation 1073: geocentric translation
        # -48, 55, 52) — too large for the coincidence treatment, so it
        # composes the Helmert chain like OSGB/Swiss/BD72
        c = make_tm(*GRS80,
                    lat0=31.0 + 44.0 / 60.0 + 3.817 / 3600.0,
                    lon0=35.0 + 12.0 / 60.0 + 16.261 / 3600.0,
                    k0=1.0000067, fe=219529.584, fn=626907.39)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           GRS80, _DATUM_ISR93)
    if code == 5514:  # S-JTSK / Krovak East North (Bessel + Helmert)
        c = make_krovak(*BESSEL1841, latc=49.5,
                        lon0=24.0 + 50.0 / 60.0,
                        alphac=30.0 + 17.0 / 60.0 + 17.3031 / 3600.0,
                        latp=78.5, kp=0.9999)
        return _with_datum(lambda lo, la: krovak_forward(lo, la, c),
                           lambda x, y: krovak_inverse(x, y, c),
                           BESSEL1841, _DATUM_SJTSK)
    if code == 28992:  # Amersfoort / RD New (oblique stereographic, Bessel)
        # EPSG projection 19914; method 9809 (double stereographic) —
        # kernel validated against the GN7-2 worked example
        c = make_oblique_stereo(*BESSEL1841,
                                lat0=52.0 + 9.0 / 60.0 + 22.178 / 3600.0,
                                lon0=5.0 + 23.0 / 60.0 + 15.500 / 3600.0,
                                k0=0.9999079, fe=155000.0, fn=463000.0)
        return _with_datum(lambda lo, la: oblique_stereo_forward(lo, la, c),
                           lambda x, y: oblique_stereo_inverse(x, y, c),
                           BESSEL1841, _DATUM_AMERSFOORT)
    if code in (27571, 27572, 27573, 27574):
        # NTF (Paris) / Lambert zones I-IV (carto FN = zone MILLION +
        # the 200 km zone FN; zone IV Corsica has its famous FE
        # 234.358 m).  True EPSG method 9801 LCC-1SP from the published
        # (lat0 in grads -> degrees, k0) pairs — exact by construction
        # (r12b replaced the r11 2SP-equivalent-parallel table, whose
        # zone I upper parallel was 0.45 arcsec off = ~3.5 mm of scale
        # drift).  The Paris prime meridian is folded into lon0 =
        # 2deg20'14.025" Greenwich.  The huge installed base of
        # pre-RGF93 French data ships in zone II.
        zone = code - 27570
        lat0, k0, fe, fn = {
            1: (49.5, 0.999877341, 600000.0, 1_200_000.0),
            2: (46.8, 0.99987742, 600000.0, 2_200_000.0),
            3: (44.1, 0.999877499, 600000.0, 3_200_000.0),
            4: (42.165, 0.99994471, 234.358, 4_185_861.369),
        }[zone]
        c = make_lcc1sp(*CLARKE1880IGN, lat0=lat0, k0=k0,
                        lon0=2.0 + 20.0 / 60.0 + 14.025 / 3600.0,
                        fe=fe, fn=fn)
        return _with_datum(lambda lo, la: lcc_forward(lo, la, c),
                           lambda x, y: lcc_inverse(x, y, c),
                           CLARKE1880IGN, _DATUM_NTF)
    if code == 29902:  # TM65 / Irish Grid (Airy Modified + 1975 Helmert)
        c = make_tm(*AIRY_MOD, lat0=53.5, lon0=-8.0, k0=1.000035,
                    fe=200000.0, fn=250000.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           AIRY_MOD, _DATUM_TM65)
    # AGD66 / AMG zones 48-58 (Australian National Spheroid UTM south +
    # the national 7-param Helmert): the legacy twin of the MGA ranges
    if 20348 <= code <= 20358:
        zone = code - 20300
        c = make_tm(*ANS, lat0=0.0, lon0=6.0 * zone - 183.0, k0=0.9996,
                    fe=500000.0, fn=10000000.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           ANS, _DATUM_AGD66)
    if 31466 <= code <= 31469:  # DHDN / 3-degree Gauss-Krueger zones 2-5
        # The German legacy installed base (cadastre, utilities): Bessel
        # 1841 TM with k0 = 1, FE = zone * 1e6 + 500 km, central
        # meridian 3 * zone; datum via the national EPSG 1777 Helmert.
        zone = code - 31464
        c = make_tm(*BESSEL1841, lat0=0.0, lon0=3.0 * zone, k0=1.0,
                    fe=zone * 1_000_000.0 + 500_000.0, fn=0.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           BESSEL1841, _DATUM_DHDN)
    if 28402 <= code <= 28432:  # Pulkovo 1942 / 6-degree GK zones 2-32
        # Krassowsky 1940 TM, k0 = 1, FE = zone * 1e6 + 500 km, central
        # meridian 6 * zone - 3 (zone 7 = 39E covers Moscow); datum via
        # the EPSG 1254 geocentric translation.
        zone = code - 28400
        c = make_tm(*KRASSOWSKY, lat0=0.0, lon0=6.0 * zone - 3.0, k0=1.0,
                    fe=zone * 1_000_000.0 + 500_000.0, fn=0.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           KRASSOWSKY, _DATUM_PULKOVO42)
    if 21896 <= code <= 21899:  # Bogota 1975 / Colombia zones W..E
        # International 1924 TM, k0 = 1, FE = FN = 1,000,000 m; zone
        # meridians step 3 degrees off the Bogota observatory meridian
        # 74deg04'51.30"W; lat0 = 4deg35'56.57"N for every zone.
        lon0 = -(74.0 + 4.0 / 60.0 + 51.30 / 3600.0) \
            + 3.0 * (code - 21897)
        c = make_tm(*INTL1924,
                    lat0=4.0 + 35.0 / 60.0 + 56.57 / 3600.0,
                    lon0=lon0, k0=1.0, fe=1_000_000.0, fn=1_000_000.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           INTL1924, _DATUM_BOGOTA)
    if 23028 <= code <= 23038:  # ED50 / UTM zones 28N-38N
        # The pre-ETRS89 European installed base (North Sea energy,
        # legacy national maps): International 1924 UTM + the EPSG 1133
        # mean translation (~5 m; pass a national set via the params
        # escape hatch for survey-grade work).
        zone = code - 23000
        c = make_tm(*INTL1924, lat0=0.0, lon0=6.0 * zone - 183.0,
                    k0=0.9996, fe=500_000.0, fn=0.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           INTL1924, _DATUM_ED50)
    if code == 2100:  # GGRS87 / Greek Grid
        # GRS80 TM (lon0 24E, k0 0.9996) but the GGRS87 datum sits
        # ~200 m off WGS84 (EPSG 1272) — NOT coincidence-treatable.
        c = make_tm(*GRS80, lat0=0.0, lon0=24.0, k0=0.9996,
                    fe=500_000.0, fn=0.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           GRS80, _DATUM_GGRS87)
    if code == 31700:  # Dealul Piscului 1970 / Stereo 70 (Romania)
        # Krassowsky double stereographic (EPSG method 9809, same
        # kernel as RD New), k0 0.99975 at (46N, 25E); Pulkovo-derived
        # datum via EPSG 15861.
        c = make_oblique_stereo(*KRASSOWSKY, lat0=46.0, lon0=25.0,
                                k0=0.99975, fe=500_000.0, fn=500_000.0)
        return _with_datum(lambda lo, la: oblique_stereo_forward(lo, la, c),
                           lambda x, y: oblique_stereo_inverse(x, y, c),
                           KRASSOWSKY, _DATUM_DEALUL70)
    if 20934 <= code <= 20936:  # Arc 1950 / UTM zones 34S-36S
        # Southern-Africa legacy (Clarke 1880 Arc): UTM south
        # (FN 10,000,000) + the EPSG 1130 mean translation.
        zone = code - 20900
        c = make_tm(*CLARKE1880ARC, lat0=0.0, lon0=6.0 * zone - 183.0,
                    k0=0.9996, fe=500_000.0, fn=10_000_000.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           CLARKE1880ARC, _DATUM_ARC1950)
    if 22181 <= code <= 22187:  # Campo Inchauspe / Argentina fajas 1-7
        # The legacy Argentine Gauss-Krueger ladder: International
        # 1924, k0 = 1, NORTHING FROM THE SOUTH POLE (lat0 -90), FE =
        # faja * 1e6 + 500 km, meridians -72 to -54 stepping 3 degrees;
        # datum via EPSG 1127.  (POSGAR successors are the 22171+ /
        # 5343+ coincident rows.)
        faja = code - 22180
        c = make_tm(*INTL1924, lat0=-90.0, lon0=-75.0 + 3.0 * faja,
                    k0=1.0, fe=faja * 1_000_000.0 + 500_000.0, fn=0.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           INTL1924, _DATUM_CAMPO)
    if code == 29101:  # SAD69 / Brazil Polyconic
        # The legacy Brazilian national grid (IBGE small-scale series):
        # American Polyconic on the GRS67(SAD69) ellipsoid (same a/f
        # as the ANS tuple) + the EPSG 1864 Brazil-mean translation;
        # the modern SIRGAS twin is the coincident 5880 registry row.
        c = make_polyconic(*ANS, lat0=0.0, lon0=-54.0,
                           fe=5_000_000.0, fn=10_000_000.0)
        return _with_datum(lambda lo, la: poly_forward(lo, la, c),
                           lambda x, y: poly_inverse(x, y, c),
                           ANS, _DATUM_SAD69)
    if code == 4267:  # NAD27 geographic (datum shift only)
        # The pre-NAD83 family: lon/lat on Clarke 1866 via the grid-free
        # EPSG 1173 Helmert (~10 m CONUS; see _DATUM_NAD27's bound note).
        ident = lambda lo, la: (lo, la)      # noqa: E731
        return _with_datum(ident, ident, CLARKE1866, _DATUM_NAD27)
    if 26703 <= code <= 26722:  # NAD27 / UTM zones 3N-22N
        zone = code - 26700
        c = make_tm(*CLARKE1866, lat0=0.0, lon0=6.0 * zone - 183.0,
                    k0=0.9996, fe=500_000.0, fn=0.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           CLARKE1866, _DATUM_NAD27)
    if code == 31287 or 31284 <= code <= 31286 or 31254 <= code <= 31256:
        # MGI (Austria): Bessel 1841 + the EPSG 1618 position-vector
        # Helmert (the same constants the 31287 params-path oracle
        # validates against DuckDB).  Three grid conventions share the
        # datum: the national Lambert (31287, FE/FN 400 km), the M28/
        # M31/M34 meridian strips (31284-31286: TM k0 = 1, FE 150/450/
        # 750 km, FN 0), and GK West/Central/East (31254-31256: same
        # meridians, FE 0, FN -5,000,000 m).
        if code == 31287:
            c = make_lcc(*BESSEL1841, lat1=49.0, lat2=46.0, lat0=47.5,
                         lon0=13.0 + 20.0 / 60.0, fe=400000.0, fn=400000.0)
            return _with_datum(lambda lo, la: lcc_forward(lo, la, c),
                               lambda x, y: lcc_inverse(x, y, c),
                               BESSEL1841, _DATUM_MGI)
        i = (code - 31284) if code >= 31284 else (code - 31254)
        lon0 = 10.0 + 20.0 / 60.0 + 3.0 * i
        fe = (150000.0 + 300000.0 * i) if code >= 31284 else 0.0
        fn = 0.0 if code >= 31284 else -5_000_000.0
        c = make_tm(*BESSEL1841, lat0=0.0, lon0=lon0, k0=1.0, fe=fe, fn=fn)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           BESSEL1841, _DATUM_MGI)
    if 2391 <= code <= 2394:  # KKJ / Finland zones 1-4
        # The pre-EUREF-FIN Finnish installed base: International 1924
        # Gauss-Krueger strips (k0 = 1, CM 21/24/27/30E, FE = zone
        # MILLION + 500 km; zone 3 = 2393 is the nationwide "Uniform
        # Coordinate System" most legacy data ships in) + the published
        # national position-vector set.
        zone = code - 2390
        c = make_tm(*INTL1924, lat0=0.0, lon0=18.0 + 3.0 * zone, k0=1.0,
                    fe=zone * 1_000_000.0 + 500_000.0, fn=0.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           INTL1924, _DATUM_KKJ)
    if code in (3003, 3004):  # Monte Mario / Italy zones 1-2 (Gauss-Boaga)
        # International 1924 TM, k0 0.9996, FE 1,500,000 (west) /
        # 2,520,000 (east); datum via the published national
        # position-vector set (continental Italy).
        zone = code - 3002
        c = make_tm(*INTL1924, lat0=0.0, lon0=9.0 + 6.0 * (zone - 1),
                    k0=0.9996,
                    fe=1_500_000.0 if zone == 1 else 2_520_000.0, fn=0.0)
        return _with_datum(lambda lo, la: tm_forward(lo, la, c),
                           lambda x, y: tm_inverse(x, y, c),
                           INTL1924, _DATUM_MONTEMARIO)
    if code == 23700:  # HD72 / EOV Hungary (GRS67)
        # EPSG projection 19931: Hotine Oblique Mercator variant B with
        # azimuth = rectified angle = 90 degrees, which reduces to the
        # Gauss-sphere oblique Mercator (PROJ maps it onto `somerc`)
        # with kc = 0.99993 scaling the sphere radius
        c = make_swiss(*GRS67,
                       lat0=47.0 + 8.0 / 60.0 + 39.8174 / 3600.0,
                       lon0=19.0 + 2.0 / 60.0 + 54.8584 / 3600.0,
                       e0=650000.0, n0=200000.0, k0=0.99993)
        return _with_datum(lambda lo, la: swiss_forward(lo, la, c),
                           lambda x, y: swiss_inverse(x, y, c),
                           GRS67, _DATUM_HD72)
    return None


def _proj_for_esri(code: int):
    """(forward, inverse) for supported ESRI:xxxxx codes — the world
    projections ESRI publishes for global zonal statistics (the
    reference reaches them through PROJ's authority table; this
    registry pins the ones users actually write)."""
    if code == 54009:   # World Mollweide (spherical on WGS84 semi-major)
        c = make_mollweide(WGS84[0])
        return (lambda lo, la: moll_forward(lo, la, c),
                lambda x, y: moll_inverse(x, y, c))
    return None


# ---------------------------------------------------------------------------
# additional ellipsoids + 7-parameter datum (Helmert) transforms
# ---------------------------------------------------------------------------

AIRY1830 = (6377563.396, 1.0 / 299.3249646)
AIRY_MOD = (6377340.189, 1.0 / 299.3249646)     # Airy Modified (Ireland)
BESSEL1841 = (6377397.155, 1.0 / 299.1528128)
INTL1924 = (6378388.0, 1.0 / 297.0)
GRS67 = (6378160.0, 1.0 / 298.247167427)
# Clarke 1880 (IGN): defined by a and b = 6356515.0 exactly
CLARKE1880IGN = (6378249.2, (6378249.2 - 6356515.0) / 6378249.2)
ANS = (6378160.0, 1.0 / 298.25)                 # Australian National Spheroid
KRASSOWSKY = (6378245.0, 1.0 / 298.3)           # Krassowsky 1940 (Pulkovo)
# Clarke 1866: defined by a and b = 6356583.8 exactly (NAD27)
CLARKE1866 = (6378206.4, (6378206.4 - 6356583.8) / 6378206.4)
CLARKE1880ARC = (6378249.145, 1.0 / 293.4663077)  # Clarke 1880 (Arc)

ELLIPSOIDS.update({
    "WGS84": WGS84, "GRS80": GRS80, "AIRY1830": AIRY1830,
    "AIRY_MOD": AIRY_MOD, "BESSEL1841": BESSEL1841, "INTL1924": INTL1924,
    "GRS67": GRS67, "CLARKE1880IGN": CLARKE1880IGN, "ANS": ANS,
    "KRASSOWSKY": KRASSOWSKY, "CLARKE1866": CLARKE1866,
    "CLARKE1880ARC": CLARKE1880ARC,
})

_ARCSEC = math.pi / (180.0 * 3600.0)


def _geodetic_to_ecef(lon, lat, a, f):
    """Degrees -> geocentric XYZ (h = 0 on the given ellipsoid)."""
    e2 = 2.0 * f - f * f
    la = np.radians(lat)
    lo = np.radians(lon)
    sl = np.sin(la)
    N = a / np.sqrt(1.0 - e2 * sl * sl)
    cl = np.cos(la)
    return (N * cl * np.cos(lo), N * cl * np.sin(lo), N * (1.0 - e2) * sl)


def _ecef_to_geodetic(X, Y, Z, a, f):
    """Geocentric XYZ -> degrees lon/lat on the given ellipsoid (height
    discarded — projections only need the surface coordinates)."""
    e2 = 2.0 * f - f * f
    lon = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    lat = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(5):
        sl = np.sin(lat)
        N = a / np.sqrt(1.0 - e2 * sl * sl)
        h = p / np.cos(lat) - N
        lat = np.arctan2(Z, p * (1.0 - e2 * N / (N + h)))
    return np.degrees(lon), np.degrees(lat)


def _helmert_apply(X, Y, Z, p, inverse: bool):
    """Position-vector 7-parameter transform (EPSG method 9606):
    X' = (1 + s*1e-6) * R * X + t, rotations in arcseconds.  The inverse
    negates the (small) parameters — exact to well below the quoted
    accuracy of any catalogue transform."""
    tx, ty, tz, rx, ry, rz, s = p
    if inverse:
        tx, ty, tz, rx, ry, rz, s = -tx, -ty, -tz, -rx, -ry, -rz, -s
    m = 1.0 + s * 1e-6
    rx *= _ARCSEC
    ry *= _ARCSEC
    rz *= _ARCSEC
    Xn = m * (X - rz * Y + ry * Z) + tx
    Yn = m * (rz * X + Y - rx * Z) + ty
    Zn = m * (-ry * X + rx * Y + Z) + tz
    return Xn, Yn, Zn


def _with_datum(proj_fwd, proj_inv, ell, to_wgs84):
    """Wrap a local-datum projection pair so it consumes/produces WGS84
    lon/lat.  ``to_wgs84``: position-vector params local -> WGS84, or
    None for GRS80-family datums treated as coincident."""
    if to_wgs84 is None:
        return proj_fwd, proj_inv
    a, f = ell

    def fwd(lon, lat):
        X, Y, Z = _geodetic_to_ecef(np.asarray(lon, dtype=np.float64),
                                    np.asarray(lat, dtype=np.float64),
                                    *WGS84)
        X, Y, Z = _helmert_apply(X, Y, Z, to_wgs84, inverse=True)
        lo, la = _ecef_to_geodetic(X, Y, Z, a, f)
        return proj_fwd(lo, la)

    def inv(x, y):
        lo, la = proj_inv(x, y)
        X, Y, Z = _geodetic_to_ecef(lo, la, a, f)
        X, Y, Z = _helmert_apply(X, Y, Z, to_wgs84, inverse=False)
        return _ecef_to_geodetic(X, Y, Z, *WGS84)

    return fwd, inv


# local datum -> WGS84, position-vector (tx, ty, tz [m], rx, ry, rz ["], s [ppm])
# OSGB36: the OS guide's published ETRS89<->OSGB36 Helmert (~2 m vs OSTN15);
# CH1903+: swisstopo's exact GRS80 translation; S-JTSK: the common ~1 m
# national translation; BD72: the NGI national 7-parameter set (~1 m).
_DATUM_OSGB36 = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
_DATUM_CH1903P = (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)
_DATUM_SJTSK = (589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0)
_DATUM_ISR93 = (-48.0, 55.0, 52.0, 0.0, 0.0, 0.0, 0.0)
_DATUM_BD72 = (-106.8686, 52.2978, -103.7239, 0.3366, -0.457, 1.8422, -1.2747)
# Amersfoort -> WGS 84: EPSG transformation 15934 (position vector, the
# parameters PROJ ships for EPSG:28992); HD72 -> WGS 84: EPSG 1448
_DATUM_AMERSFOORT = (565.417, 50.3319, 465.552,
                     -0.398957, 0.343988, -1.8774, 4.0725)
_DATUM_HD72 = (52.684, -71.194, -13.975, -0.312, -0.1063, -0.3729, 1.0191)
# NTF -> WGS84 (EPSG tfm 1193: geocentric translation only)
_DATUM_NTF = (-168.0, -60.0, 320.0, 0.0, 0.0, 0.0, 0.0)
# TM65 -> WGS84 (OSi/OSNI 1975 adjustment, EPSG tfm 1641:
# position-vector 7-param, rotations arcsec, scale ppm)
_DATUM_TM65 = (482.5, -130.6, 564.557, -1.042, -0.214, -0.631, 8.15)
# AGD66 -> GDA94 (national 7-param from the GDA technical manual, EPSG
# tfm 15786; GDA94 treated WGS84-coincident like the MGA rows)
_DATUM_AGD66 = (-117.808, -51.536, 137.784, 0.303, 0.446, 0.234, -0.29)
# DHDN -> WGS84 (EPSG tfm 1777: the national position-vector set for
# all of West Germany, ~3 m; the authoritative path is the BeTA2007
# NTv2 grid — same approximation class as the other national sets here)
_DATUM_DHDN = (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)
# MGI (Austria) -> WGS84 (EPSG tfm 1618 position-vector; the same
# constants queries_crs validates via the 31287 params-path oracle)
_DATUM_MGI = (577.326, 90.129, 463.919, 5.137, 1.474, 5.297, 2.4232)
# Monte Mario -> WGS84 (the published national position-vector set for
# continental Italy, ~4 m)
_DATUM_MONTEMARIO = (-104.1, -49.1, -9.9, 0.971, -2.917, 0.714, -11.68)
# KKJ -> WGS84 (the published Finnish national position-vector set)
_DATUM_KKJ = (-96.062, -82.428, -121.753, 4.801, 0.345, -1.376, 1.496)
# Pulkovo 1942 -> WGS84 (EPSG tfm 1254: geocentric translation, USSR)
_DATUM_PULKOVO42 = (28.0, -130.0, -95.0, 0.0, 0.0, 0.0, 0.0)
# Bogota 1975 -> WGS84 (EPSG tfm 1125: geocentric translation)
_DATUM_BOGOTA = (307.0, 304.0, -318.0, 0.0, 0.0, 0.0, 0.0)
# ED50 -> WGS84 (EPSG tfm 1133: the European mean translation, ~5 m;
# national sets refine it — the escape hatch takes those)
_DATUM_ED50 = (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)
# GGRS87 -> WGS84 (EPSG tfm 1272)
_DATUM_GGRS87 = (-199.87, 74.79, 246.62, 0.0, 0.0, 0.0, 0.0)
# Dealul Piscului 1970 (Romania, Pulkovo-derived) -> WGS84 (EPSG 15861)
_DATUM_DEALUL70 = (28.0, -121.0, -77.0, 0.0, 0.0, 0.0, 0.0)
# Arc 1950 (southern Africa) -> WGS84 (EPSG tfm 1130, mean)
_DATUM_ARC1950 = (-143.0, -90.0, -294.0, 0.0, 0.0, 0.0, 0.0)
# Campo Inchauspe (Argentina) -> WGS84 (EPSG tfm 1127)
_DATUM_CAMPO = (-148.0, 136.0, 90.0, 0.0, 0.0, 0.0, 0.0)
# SAD69 (South America) -> WGS84 (EPSG tfm 1864, Brazil mean)
_DATUM_SAD69 = (-57.0, 1.0, -41.0, 0.0, 0.0, 0.0, 0.0)
# NAD27 -> WGS84 (EPSG tfm 1173: the CONUS geocentric translation).
# DOCUMENTED BOUND: the authoritative NAD27 path is the NADCON grid;
# this grid-free Helmert is EPSG-stated at ~10 m accuracy in CONUS
# (worse in Alaska) — right for analytics joins/aggregations over
# legacy data, NOT for survey-grade work.  Pinned by a unit test that
# brackets the NAD27-vs-NAD83 shift magnitude.
_DATUM_NAD27 = (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0)


# ---------------------------------------------------------------------------
# Swiss oblique Mercator (swisstopo "double projection", EPSG method 9815
# as used by CH1903+/LV95) — published swisstopo formulas, validated by the
# Rigi worked example to < 2 cm.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _SwissConsts:
    a: float
    e: float
    alpha: float
    R: float
    b0: float
    K: float
    lam0: float
    e0: float
    n0: float


def make_swiss(a: float, f: float, lat0: float, lon0: float,
               e0: float, n0: float, k0: float = 1.0) -> _SwissConsts:
    """``k0`` scales the Gauss sphere radius — PROJ's ``somerc`` scale
    factor.  The Swiss grids use k0=1; HD72/EOV (EPSG:23700, projection
    19931: Hotine Oblique Mercator variant B with azimuth = rectified
    angle = 90°, which PROJ maps onto somerc) uses kc=0.99993."""
    e2 = 2.0 * f - f * f
    e = math.sqrt(e2)
    phi0 = math.radians(lat0)
    alpha = math.sqrt(1.0 + e2 / (1.0 - e2) * math.cos(phi0) ** 4)
    R = k0 * a * math.sqrt(1.0 - e2) / (1.0 - e2 * math.sin(phi0) ** 2)
    b0 = math.asin(math.sin(phi0) / alpha)
    K = (math.log(math.tan(math.pi / 4.0 + b0 / 2.0))
         - alpha * math.log(math.tan(math.pi / 4.0 + phi0 / 2.0))
         + alpha * e / 2.0
         * math.log((1.0 + e * math.sin(phi0)) / (1.0 - e * math.sin(phi0))))
    return _SwissConsts(a, e, alpha, R, b0, K, math.radians(lon0), e0, n0)


def swiss_forward(lon, lat, c: _SwissConsts):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    e = c.e
    S = (c.alpha * np.log(np.tan(np.pi / 4.0 + phi / 2.0))
         - c.alpha * e / 2.0
         * np.log((1.0 + e * np.sin(phi)) / (1.0 - e * np.sin(phi))) + c.K)
    b = 2.0 * (np.arctan(np.exp(S)) - np.pi / 4.0)
    l = c.alpha * (lam - c.lam0)
    lbar = np.arctan2(np.sin(l),
                      np.sin(c.b0) * np.tan(b) + np.cos(c.b0) * np.cos(l))
    bbar = np.arcsin(np.cos(c.b0) * np.sin(b)
                     - np.sin(c.b0) * np.cos(b) * np.cos(l))
    return (c.R * lbar + c.e0,
            c.R / 2.0 * np.log((1.0 + np.sin(bbar)) / (1.0 - np.sin(bbar)))
            + c.n0)


def swiss_inverse(x, y, c: _SwissConsts):
    lbar = (np.asarray(x, dtype=np.float64) - c.e0) / c.R
    bbar = 2.0 * (np.arctan(np.exp((np.asarray(y, dtype=np.float64) - c.n0)
                                   / c.R)) - np.pi / 4.0)
    b = np.arcsin(np.cos(c.b0) * np.sin(bbar)
                  + np.sin(c.b0) * np.cos(bbar) * np.cos(lbar))
    l = np.arctan2(np.sin(lbar),
                   np.cos(c.b0) * np.cos(lbar) - np.sin(c.b0) * np.tan(bbar))
    lam = c.lam0 + l / c.alpha
    e = c.e
    phi = b.copy()
    for _ in range(8):
        S = (np.log(np.tan(np.pi / 4.0 + b / 2.0)) - c.K) / c.alpha \
            + e / 2.0 * np.log((1.0 + e * np.sin(phi))
                               / (1.0 - e * np.sin(phi)))
        phi = 2.0 * (np.arctan(np.exp(S)) - np.pi / 4.0)
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Krovak oblique conformal conic (EPSG method 9819, S-JTSK) — public EPSG
# Guidance Note 7-2 formulas, validated by its worked example to < 2 cm.
# EPSG:5514 axes are east/north with negative values (E = -Y_west,
# N = -X_south).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _KrovakConsts:
    a: float
    e: float
    B: float
    gamma0: float
    t0: float
    n: float
    r0: float
    alphac: float
    phip: float
    lam0: float


def make_krovak(a: float, f: float, latc: float, lon0: float,
                alphac: float, latp: float, kp: float) -> _KrovakConsts:
    e2 = 2.0 * f - f * f
    e = math.sqrt(e2)
    phic = math.radians(latc)
    B = math.sqrt(1.0 + e2 * math.cos(phic) ** 4 / (1.0 - e2))
    A_ = a * math.sqrt(1.0 - e2) / (1.0 - e2 * math.sin(phic) ** 2)
    gamma0 = math.asin(math.sin(phic) / B)
    t0 = (math.tan(math.pi / 4.0 + gamma0 / 2.0)
          * ((1.0 + e * math.sin(phic)) / (1.0 - e * math.sin(phic)))
          ** (e * B / 2.0)
          / math.tan(math.pi / 4.0 + phic / 2.0) ** B)
    phip = math.radians(latp)
    n = math.sin(phip)
    r0 = kp * A_ / math.tan(phip)
    return _KrovakConsts(a, e, B, gamma0, t0, n, r0,
                         math.radians(alphac), phip, math.radians(lon0))


def krovak_forward(lon, lat, c: _KrovakConsts):
    """Returns EPSG:5514 east/north (negative in Czechia/Slovakia)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    e = c.e
    U = 2.0 * (np.arctan(
        c.t0 * np.tan(np.pi / 4.0 + phi / 2.0) ** c.B
        / ((1.0 + e * np.sin(phi)) / (1.0 - e * np.sin(phi)))
        ** (e * c.B / 2.0)) - np.pi / 4.0)
    V = c.B * (c.lam0 - lam)
    T = np.arcsin(np.cos(c.alphac) * np.sin(U)
                  + np.sin(c.alphac) * np.cos(U) * np.cos(V))
    D = np.arcsin(np.cos(U) * np.sin(V) / np.cos(T))
    theta = c.n * D
    r = c.r0 * np.tan(np.pi / 4.0 + c.phip / 2.0) ** c.n \
        / np.tan(np.pi / 4.0 + T / 2.0) ** c.n
    x_south = r * np.cos(theta)
    y_west = r * np.sin(theta)
    return -y_west, -x_south


def krovak_inverse(x, y, c: _KrovakConsts):
    y_west = -np.asarray(x, dtype=np.float64)
    x_south = -np.asarray(y, dtype=np.float64)
    r = np.hypot(x_south, y_west)
    theta = np.arctan2(y_west, x_south)
    D = theta / c.n
    T = 2.0 * (np.arctan((c.r0 / r) ** (1.0 / c.n)
                         * np.tan(np.pi / 4.0 + c.phip / 2.0)) - np.pi / 4.0)
    U = np.arcsin(np.cos(c.alphac) * np.sin(T)
                  - np.sin(c.alphac) * np.cos(T) * np.cos(D))
    V = np.arcsin(np.cos(T) * np.sin(D) / np.cos(U))
    lam = c.lam0 - V / c.B
    e = c.e
    phi = U.copy()
    for _ in range(8):
        phi = 2.0 * (np.arctan(
            c.t0 ** (-1.0 / c.B)
            * np.tan(np.pi / 4.0 + U / 2.0) ** (1.0 / c.B)
            * ((1.0 + e * np.sin(phi)) / (1.0 - e * np.sin(phi)))
            ** (e / 2.0)) - np.pi / 4.0)
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Oblique ("double") Stereographic (EPSG method 9809) — RD New / Amersfoort
# (EPSG:28992, all Dutch national data).  Public EPSG Guidance Note 7-2
# formulas: conformal-sphere substitution then spherical oblique
# stereographic; validated by the GN7-2 Amersfoort worked example
# (53N 6E -> E 196105.283, N 557057.739) to < 2 cm in the tests.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _ObStConsts:
    a: float
    e: float
    R: float        # conformal sphere radius
    n: float
    c: float
    chi0: float     # conformal latitude of origin
    lam0: float
    k0: float
    fe: float
    fn: float


def make_oblique_stereo(a: float, f: float, lat0: float, lon0: float,
                        k0: float, fe: float, fn: float) -> _ObStConsts:
    e2 = 2.0 * f - f * f
    e = math.sqrt(e2)
    phi0 = math.radians(lat0)
    s0 = math.sin(phi0)
    rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
    nu0 = a / math.sqrt(1.0 - e2 * s0 * s0)
    R = math.sqrt(rho0 * nu0)
    n = math.sqrt(1.0 + e2 * math.cos(phi0) ** 4 / (1.0 - e2))
    S1 = (1.0 + s0) / (1.0 - s0)
    S2 = (1.0 - e * s0) / (1.0 + e * s0)
    w1 = (S1 * S2 ** e) ** n
    sin_chi0 = (w1 - 1.0) / (w1 + 1.0)
    c = ((n + s0) * (1.0 - sin_chi0)) / ((n - s0) * (1.0 + sin_chi0))
    w2 = c * w1
    chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
    return _ObStConsts(a, e, R, n, c, chi0, math.radians(lon0), k0, fe, fn)


def oblique_stereo_forward(lon, lat, c: _ObStConsts):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    e = c.e
    sp = np.sin(phi)
    # conformal longitude difference: Lambda - Lambda0 = n (lam - lam0)
    dL = c.n * np.radians(_wrap_dlon(np.degrees(lam - c.lam0)))
    Sa = (1.0 + sp) / (1.0 - sp)
    Sb = (1.0 - e * sp) / (1.0 + e * sp)
    w = c.c * (Sa * Sb ** e) ** c.n
    chi = np.arcsin((w - 1.0) / (w + 1.0))
    B = 1.0 + np.sin(chi) * math.sin(c.chi0) \
        + np.cos(chi) * math.cos(c.chi0) * np.cos(dL)
    E = c.fe + 2.0 * c.R * c.k0 * np.cos(chi) * np.sin(dL) / B
    N = c.fn + 2.0 * c.R * c.k0 * (np.sin(chi) * math.cos(c.chi0)
                                   - np.cos(chi) * math.sin(c.chi0)
                                   * np.cos(dL)) / B
    return E, N


def oblique_stereo_inverse(x, y, c: _ObStConsts):
    Ep = np.asarray(x, dtype=np.float64) - c.fe
    Np = np.asarray(y, dtype=np.float64) - c.fn
    e = c.e
    g = 2.0 * c.R * c.k0 * math.tan(math.pi / 4.0 - c.chi0 / 2.0)
    h = 4.0 * c.R * c.k0 * math.tan(c.chi0) + g
    i_ = np.arctan2(Ep, h + Np)
    j_ = np.arctan2(Ep, g - Np) - i_
    chi = c.chi0 + 2.0 * np.arctan((Np - Ep * np.tan(j_ / 2.0))
                                   / (2.0 * c.R * c.k0))
    dL = j_ + 2.0 * i_                      # Lambda - Lambda0
    lam = dL / c.n + c.lam0
    # isometric latitude on the ellipsoid from the conformal latitude
    psi = 0.5 * np.log((1.0 + np.sin(chi))
                       / (c.c * (1.0 - np.sin(chi)))) / c.n
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(6):
        sp = np.sin(phi)
        psi_i = np.log(np.tan(phi / 2.0 + np.pi / 4.0)
                       * ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))
        phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - e * e * sp * sp) \
            / (1.0 - e * e)
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Mollweide (pseudocylindrical equal-area, spherical — PROJ `moll`,
# ESRI:54009 "World Mollweide" with R = WGS84 semi-major).  Snyder's
# published formulas; theta by Newton iteration.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _MollConsts:
    R: float
    lam0: float
    fe: float
    fn: float


def make_mollweide(a: float, f: float = 0.0, lon0: float = 0.0,
                   fe: float = 0.0, fn: float = 0.0) -> _MollConsts:
    # spherical projection: the ellipsoid's semi-major is the sphere
    # radius (PROJ `moll` behaves the same — es is zeroed)
    return _MollConsts(a, math.radians(lon0), fe, fn)


_MOLL_SQRT2 = math.sqrt(2.0)
_MOLL_CX = 2.0 * math.sqrt(2.0) / math.pi


def _moll_theta(phi: np.ndarray) -> np.ndarray:
    """Solve 2*theta + sin(2*theta) = pi * sin(phi) by Newton (exact at
    the poles where the derivative vanishes)."""
    target = np.pi * np.sin(phi)
    theta = phi.copy()
    for _ in range(12):
        f_ = 2.0 * theta + np.sin(2.0 * theta) - target
        d = 2.0 + 2.0 * np.cos(2.0 * theta)
        step = np.where(np.abs(d) > 1e-14, f_ / np.where(d == 0, 1.0, d), 0.0)
        theta = theta - step
    # poles: theta = +-pi/2 exactly
    return np.where(np.abs(phi) >= np.pi / 2.0 - 1e-12,
                    np.sign(phi) * np.pi / 2.0, theta)


def moll_forward(lon, lat, c: _MollConsts):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(_wrap_dlon(np.asarray(lon, dtype=np.float64)
                                 - math.degrees(c.lam0)))
    theta = _moll_theta(phi)
    x = c.fe + _MOLL_CX * c.R * dlam * np.cos(theta)
    y = c.fn + _MOLL_SQRT2 * c.R * np.sin(theta)
    return x, y


def moll_inverse(x, y, c: _MollConsts):
    xs = np.asarray(x, dtype=np.float64) - c.fe
    ys = np.asarray(y, dtype=np.float64) - c.fn
    st = np.clip(ys / (_MOLL_SQRT2 * c.R), -1.0, 1.0)
    theta = np.arcsin(st)
    phi = np.arcsin(np.clip((2.0 * theta + np.sin(2.0 * theta)) / np.pi,
                            -1.0, 1.0))
    ct = np.cos(theta)
    dlam = np.where(ct > 1e-12, xs / (_MOLL_CX * c.R * np.where(ct == 0, 1.0, ct)), 0.0)
    return np.degrees(dlam + c.lam0), np.degrees(phi)
