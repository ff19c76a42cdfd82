"""Validation of the derived H3 res-0 kernel (functions/h3.py).

No ``h3`` wheel exists in this container, so compatibility is established
by independent invariants:

- the 20 face centers form an exact icosahedron (constants self-check)
- the derivation yields exactly 122 res-0 cells with no latitude ties
- the 12 pentagon cells land at the PUBLISHED H3 pentagon base-cell
  numbers {4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117}
- San Francisco maps to base cell 20 — the same base cell encoded in the
  widely published H3 indexes 8928308280fffff (res 9) and
  85283473fffffff (res 5), and formats as res-0 cell '8029fffffffffff'
- assignment is total, within-cell-radius, and matches the DuckDB
  oracle mirror bit-for-bit
"""

import math

import numpy as np
import pytest

from geoparquet_io_spark.functions import h3 as H


def test_face_centers_form_icosahedron():
    C = H._C
    ang = np.degrees(np.arccos(np.clip(C @ C.T, -1, 1)))
    np.fill_diagonal(ang, np.nan)
    vals = np.unique(np.round(ang[~np.isnan(ang)], 4))
    assert set(vals.tolist()) <= {41.8103, 70.5288, 109.4712, 138.1897,
                                  180.0, 179.9999, 70.5287}


def test_122_cells_and_pentagon_numbers():
    assert H.CELL_CENTERS.shape == (122, 3)
    assert H._DERIVED_PENTAGONS == tuple(sorted(H.H3_PENTAGONS))


def test_known_base_cells():
    # published indexes 8928308280fffff / 85283473fffffff encode base cell
    # ((v >> 45) & 0x7F) == 20 for the San Francisco area
    assert (0x8928308280fffff >> 45) & 0x7F == 20
    cells = H.latlng_to_res0_cell([37.7752], [-122.4183])
    assert cells[0] == 20
    assert H.latlng_to_res0_string([37.7752], [-122.4183])[0] == "8029fffffffffff"


def test_assignment_total_and_bounded():
    rng = np.random.default_rng(7)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 50000)))
    lon = rng.uniform(-180, 180, 50000)
    cells = H.latlng_to_res0_cell(lat, lon)
    assert cells.min() >= 0 and cells.max() <= 121
    assert len(set(cells.tolist())) == 122
    P = H._to3d(np.radians(lat), np.radians(lon))
    d = np.degrees(np.arccos(np.clip(
        np.einsum("nd,nd->n", P, H.CELL_CENTERS[cells]), -1, 1)))
    # every point within the largest res-0 cell circumradius
    assert d.max() < 20.0


def test_pentagon_cell_centers_are_vertices():
    # pentagon centers are at exactly 37.3774 deg from their 5 nearest
    # face centers (the icosahedron vertex property)
    for b in H.H3_PENTAGONS:
        arcs = np.degrees(np.arccos(np.clip(H._C @ H.CELL_CENTERS[b], -1, 1)))
        near5 = np.sort(arcs)[:5]
        assert np.allclose(near5, 37.3774, atol=1e-3)


def test_oracle_sql_parity():
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(3)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 20000)))
    lon = rng.uniform(-180, 180, 20000)
    cells = H.latlng_to_res0_cell(lat, lon)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE __src__ AS SELECT unnest(?) AS lat, unnest(?) AS lng, "
        "unnest(range(20000)) AS rid", [lat.tolist(), lon.tolist()])
    o = H.res0_oracle_sql("lat", "lng")
    sql = (f"WITH {o['ctes']} SELECT rid, {o['cell_expr']} AS cell "
           f"FROM ijk {o['join']} ORDER BY rid")
    got = np.array([r[1] for r in con.execute(sql).fetchall()])
    assert len(got) == 20000
    assert (got == cells).all()


def test_add_h3_res0_operator(spark):
    from geoparquet_io_spark.queries import _events_points
    from tests.conftest import SF_SMOKE

    gt = _events_points(spark, SF_SMOKE)
    out = gt.add_h3(resolution=0)
    rows = out.df.select("h3").distinct().collect()
    ids = {r["h3"] for r in rows}
    assert all(len(i) == 15 and i.endswith("fffffffffff") for i in ids)
    # ids decode to valid res-0 indexes (mode 1, res 0, base cell < 122)
    for i in ids:
        v = int(i, 16)
        assert (v >> 59) & 0xF == 1
        assert (v >> 52) & 0xF == 0
        assert 0 <= ((v >> 45) & 0x7F) < 122
