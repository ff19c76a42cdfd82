"""First-principles validation of the ellipsoidal projections
(functions/projections.py) — no pyproj available, so correctness is
established by mathematical invariants rather than library comparison:

- round-trip identity (forward o inverse) to sub-1e-6 degrees
- the WGS84 quarter meridian (published geodetic constant)
- conformal projections have an isotropic local scale (Jacobian is a
  scaled rotation); equal-area projections have |det J| == M*N*cos(phi)
- fixed anchor points from the EPSG definitions (false origins)
"""

import math

import numpy as np
import pytest

from geoparquet_io_spark.functions import projections as P
from geoparquet_io_spark.functions.crs import get_transformer

A_WGS, F_WGS = P.WGS84
E2 = F_WGS * (2 - F_WGS)


def _jacobian(fwd, lon, lat, d=1e-7):
    base = np.array(fwd(np.array([lon]), np.array([lat]))).ravel()
    px = np.array(fwd(np.array([lon + d]), np.array([lat]))).ravel()
    py = np.array(fwd(np.array([lon]), np.array([lat + d]))).ravel()
    J = np.empty((2, 2))
    J[:, 0] = (px - base) / math.radians(d)
    J[:, 1] = (py - base) / math.radians(d)
    return J


def _mn(lat):
    s = math.sin(math.radians(lat))
    w = math.sqrt(1 - E2 * s * s)
    return A_WGS * (1 - E2) / w**3, A_WGS / w  # (M meridian, N prime-vertical)


CASES = [
    (32633, 15 + np.linspace(-3, 3, 7), np.linspace(-80, 84, 7)),
    (32718, -75 + np.linspace(-3, 3, 7), np.linspace(-80, 0, 7)),
    (25832, 9 + np.linspace(-3, 3, 7), np.linspace(35, 70, 7)),
    (3794, 15 + np.linspace(-2, 2, 7), np.linspace(45, 47, 7)),
    (5070, np.linspace(-120, -70, 7), np.linspace(24, 49, 7)),
    (2154, np.linspace(-4, 9, 7), np.linspace(41, 51, 7)),
    (3035, np.linspace(-10, 30, 7), np.linspace(35, 70, 7)),
    (3413, np.linspace(-180, 175, 8), np.linspace(45, 89.9, 7)),
    (3031, np.linspace(-180, 175, 8), np.linspace(-89.9, -50, 7)),
]


@pytest.mark.parametrize("code,lons,lats", CASES,
                         ids=[str(c[0]) for c in CASES])
def test_round_trip(code, lons, lats):
    fwd, inv = P._proj_for_epsg(code)
    lon, lat = np.meshgrid(lons, lats)
    lon, lat = lon.ravel(), lat.ravel()
    x, y = fwd(lon, lat)
    lo, la = inv(x, y)
    assert np.abs(lo - lon).max() < 1e-6
    assert np.abs(la - lat).max() < 1e-6


def test_quarter_meridian():
    c = P.make_tm(*P.WGS84, lat0=0.0, lon0=0.0, k0=1.0, fe=0.0, fn=0.0)
    qm = P._tm_meridian_arc(90.0, c)
    assert abs(qm - 10001965.7293) < 1e-3  # published WGS84 value


def test_utm_anchors_and_scale():
    fwd, _ = P._proj_for_epsg(32633)
    x, y = fwd(np.array([15.0]), np.array([0.0]))
    assert x[0] == 500000.0 and y[0] == 0.0
    # scale along the central meridian == k0
    M, _ = _mn(45.0)
    x1, y1 = fwd(np.array([15.0]), np.array([45.0]))
    x2, y2 = fwd(np.array([15.0]), np.array([45.0 + 1e-6]))
    scale = (y2[0] - y1[0]) / (math.radians(1e-6) * M)
    assert abs(scale - 0.9996) < 1e-7


@pytest.mark.parametrize("code,lon,lat", [
    (32633, 12.0, 47.0), (2154, 2.35, 48.86), (3794, 14.5, 46.05),
    (3413, -30.0, 75.0), (3031, 120.0, -75.0),
])
def test_conformal_isotropic_scale(code, lon, lat):
    fwd, _ = P._proj_for_epsg(code)
    J = _jacobian(fwd, lon, lat)
    M, N = _mn(lat)
    k_east = np.hypot(*J[:, 0]) / (N * math.cos(math.radians(lat)))
    k_north = np.hypot(*J[:, 1]) / M
    assert abs(k_east / k_north - 1.0) < 1e-5


@pytest.mark.parametrize("code,lon,lat", [
    (5070, -100.0, 40.0), (5070, -80.0, 30.0), (3035, 20.0, 60.0),
])
def test_equal_area_jacobian(code, lon, lat):
    fwd, _ = P._proj_for_epsg(code)
    J = _jacobian(fwd, lon, lat)
    M, N = _mn(lat)
    ratio = abs(np.linalg.det(J)) / (M * N * math.cos(math.radians(lat)))
    assert abs(ratio - 1.0) < 1e-5


def test_false_origins():
    fwd, _ = P._proj_for_epsg(5070)
    x, y = fwd(np.array([-96.0]), np.array([23.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    fwd, _ = P._proj_for_epsg(3035)
    x, y = fwd(np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6


def test_polar_stereo_anchors():
    """North (3413): the pole maps to the false origin; the standard
    parallel has unit scale along the parallel; the central meridian
    (lon0=-45) lands on x == 0 with y < 0."""
    fwd, inv = P._proj_for_epsg(3413)
    x, y = fwd(np.array([-45.0]), np.array([90.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    x, y = fwd(np.array([-45.0]), np.array([70.0]))
    assert abs(x[0]) < 1e-6 and y[0] < 0
    # unit scale along the 70N standard parallel
    d = 1e-6
    x1, y1 = fwd(np.array([-30.0]), np.array([70.0]))
    x2, y2 = fwd(np.array([-30.0 + d]), np.array([70.0]))
    _, N = _mn(70.0)
    k = math.hypot(x2[0] - x1[0], y2[0] - y1[0]) / (
        math.radians(d) * N * math.cos(math.radians(70.0)))
    assert abs(k - 1.0) < 1e-7
    # the pole inverse is pinned to lon0 (longitude is degenerate there)
    lo, la = inv(np.array([0.0]), np.array([0.0]))
    assert lo[0] == -45.0 and abs(la[0] - 90.0) < 1e-9
    # south (3031): pole -> origin, unit scale at 71S
    fwd_s, _ = P._proj_for_epsg(3031)
    x, y = fwd_s(np.array([0.0]), np.array([-90.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    x1, y1 = fwd_s(np.array([60.0]), np.array([-71.0]))
    x2, y2 = fwd_s(np.array([60.0 + d]), np.array([-71.0]))
    _, N = _mn(-71.0)
    k = math.hypot(x2[0] - x1[0], y2[0] - y1[0]) / (
        math.radians(d) * N * math.cos(math.radians(-71.0)))
    assert abs(k - 1.0) < 1e-7


def test_transformer_composition():
    """3857 -> 5070 composes through 4326."""
    tf = get_transformer("EPSG:3857", "EPSG:5070")
    direct = get_transformer("EPSG:4326", "EPSG:5070")
    merc = get_transformer("EPSG:4326", "EPSG:3857")
    lon = np.array([-100.0]); lat = np.array([40.0])
    mx, my = merc(lon, lat)
    x1, y1 = tf(mx, my)
    x2, y2 = direct(lon, lat)
    assert abs(x1[0] - x2[0]) < 1e-4 and abs(y1[0] - y2[0]) < 1e-4


def test_unsupported_crs_message():
    # 29903 (TM75 / Irish Grid) is deliberately not wired
    with pytest.raises(ValueError, match="projection registry"):
        get_transformer("EPSG:4326", "EPSG:29903")
