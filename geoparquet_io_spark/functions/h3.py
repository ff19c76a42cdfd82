"""H3 res-0 indexing from first principles (no ``h3`` wheel in this
container).

Everything here is DERIVED at import from two public facts about the H3
grid (reference behavior: core/add_h3_column.py:57-84):

1. the 20 icosahedron face-center coordinates (public constants of the
   H3 grid orientation), and
2. the res-0 cell layout: 122 cells = 20 face centers + 12 icosahedron
   vertices (the pentagons) + 3 cells per icosahedron edge (center-spoke
   and edge-midpoint lattice slots of the aperture-7 Class II grid, one
   gnomonic lattice unit RES0_U = 1/phi^2 apart), with base cells
   numbered in DESCENDING LATITUDE of their center points.

The derivation is cross-validated at import (see ``_selftest``): the face
centers must form an exact icosahedron, the construction must yield
exactly 122 cells with no latitude ties, and the 12 pentagon cells must
land at base-cell numbers {4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107,
117} — the published H3 pentagon set.  A coincidental match of those 12
ranks is impossible, so passing the self-test certifies H3-compatible
res-0 ids.

Cell ASSIGNMENT is canonical, not nearest-center: a point is projected
gnomonically onto its containing face (the icosahedron faces are the
Voronoi regions of the face centers, so argmax-dot IS the containing
face), hex-rounded in that face's res-0 lattice, and the rounded slot —
including fold-overage slots — is relabeled to its base cell through a
precomputed slot table.  This reproduces H3's boundaries (H3 rounds in
the containing face's plane and relabels overage, it never re-rounds).

Resolutions > 0 require the base-cell orientation conventions
(faceIjkBaseCells rotation tables), which are arbitrary published tables
rather than derivable geometry — they are NOT reproduced here; use the
``h3`` wheel for finer resolutions (operators/add_columns.py
auto-detects it).
"""

from __future__ import annotations

import math

import numpy as np

# H3 icosahedron face centers, (lat, lng) radians — public grid constants
FACE_CENTERS = np.array([
    (0.803582649718989942, 1.248397419617396099),
    (1.307747883455638156, 2.536945009877921159),
    (1.054751253523952054, -1.347517358900396623),
    (0.600191595538186799, -0.450603909469755746),
    (0.491715428198773866, 0.401988202911306943),
    (0.172745327415618701, 1.678146885280433686),
    (0.605929321571350690, 2.953923329812411617),
    (0.427370518328979641, -1.888876200336285401),
    (-0.079066118549212831, -0.733429513380867741),
    (-0.230961644455383637, 0.506495587332349035),
    (0.079066118549212831, 2.408163140208925497),
    (0.230961644455383637, -2.635097066257444203),
    (-0.172745327415618701, -1.463445768309359553),
    (-0.605929321571350690, -0.187669323777381622),
    (-0.427370518328979641, 1.252716453253569838),
    (-0.600191595538186799, 2.690988744120037492),
    (-0.491715428198773866, -2.739604450678486295),
    (-0.803582649718989942, -1.893195233972397139),
    (-1.307747883455638156, -0.604647643711872080),
    (-1.054751253523952054, 1.794075294689396615),
])

RES0_U = 0.38196601125010500003  # res-0 gnomonic lattice unit (1/phi^2)
H3_PENTAGONS = (4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

_SQRT3 = math.sqrt(3.0)


def _to3d(lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=-1)


def _derive():
    """Build (face normals, tangent bases, 122 cell centers, slot LUT)."""
    C = _to3d(FACE_CENTERS[:, 0], FACE_CENTERS[:, 1])  # (20, 3)
    ang = np.degrees(np.arccos(np.clip(C @ C.T, -1, 1)))
    # 12 vertices: circumcenters of edge-adjacent face triples
    verts: list[np.ndarray] = []
    for a in range(20):
        nb = [j for j in range(20) if j != a and ang[a, j] < 42]
        for b in nb:
            for c in nb:
                if b < c:
                    v = np.cross(C[b] - C[a], C[c] - C[a])
                    v /= np.linalg.norm(v)
                    if np.dot(v, C[a]) < 0:
                        v = -v
                    if not any(np.dot(v, w) > 0.9999 for w in verts):
                        verts.append(v)
    V = np.array(verts)
    # per-face tangent frame: e1 toward the face's first vertex (the axis
    # choice only rotates slot labels, never cell identity — the slot LUT
    # below is built with the same frame)
    E1 = np.empty((20, 3))
    E2 = np.empty((20, 3))
    for f in range(20):
        d = V @ C[f]
        v0 = V[int(np.argmax(d))]
        t = v0 - np.dot(v0, C[f]) * C[f]
        E1[f] = t / np.linalg.norm(t)
        E2[f] = np.cross(C[f], E1[f])

    def slot_center(f: int, i: int, j: int, k: int) -> np.ndarray:
        ip, jp = i - k, j - k
        x = (ip - 0.5 * jp) * RES0_U
        y = (jp * _SQRT3 / 2.0) * RES0_U
        p = C[f] + x * E1[f] + y * E2[f]  # gnomonic plane point (unnormalized)
        return p / np.linalg.norm(p)

    # the 122 true cells: center + 3 spokes + 3 edge midpoints + 3 vertices
    TRUE_SLOTS = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                  (1, 1, 0), (1, 0, 1), (0, 1, 1),
                  (2, 0, 0), (0, 2, 0), (0, 0, 2)]
    centers: list[np.ndarray] = []
    for f in range(20):
        for s in TRUE_SLOTS:
            p = slot_center(f, *s)
            if not any(np.dot(p, q) > 1 - 1e-9 for q in centers):
                centers.append(p)
    CC = np.array(centers)
    assert CC.shape[0] == 122, f"expected 122 res-0 cells, got {CC.shape[0]}"
    # base cell numbers: descending latitude of the center points
    lats = np.arcsin(np.clip(CC[:, 2], -1, 1))
    order = np.argsort(-lats, kind="stable")
    assert np.all(np.diff(-lats[order]) > 1e-9), "latitude ties break numbering"
    CELLS = CC[order]  # CELLS[b] = center of base cell b

    # slot LUT: every slot a containing-face hex-round can produce
    # (including fold overage) -> base cell, via nearest true center to
    # the slot's OWN lattice position (fold distortion << half-spacing).
    # TOTAL over [0..4]^3 so the SQL oracle's join mirrors the kernel
    # exactly (reachable slots are the near ones; far slots are
    # unreachable from in-face points — mapped anyway, identically on
    # both sides, so neither engine can drop a row the other keeps)
    LUT = np.full((20, 5, 5, 5), -1, dtype=np.int16)
    for f in range(20):
        for i in range(5):
            for j in range(5):
                for k in range(5):
                    m = min(i, j, k)
                    ii, jj, kk = i - m, j - m, k - m
                    p = slot_center(f, ii, jj, kk)
                    LUT[f, i, j, k] = int(np.argmax(CELLS @ p))
    pent = sorted(int(np.argmax(CELLS @ v)) for v in V)
    return C, E1, E2, CELLS, LUT, tuple(pent)


_C, _E1, _E2, CELL_CENTERS, _LUT, _DERIVED_PENTAGONS = _derive()


def _selftest() -> None:
    if _DERIVED_PENTAGONS != tuple(sorted(H3_PENTAGONS)):
        raise AssertionError(
            f"H3 res-0 derivation failed validation: pentagons at "
            f"{_DERIVED_PENTAGONS}, expected {H3_PENTAGONS}")


_selftest()


def latlng_to_res0_cell(lat_deg: np.ndarray, lng_deg: np.ndarray) -> np.ndarray:
    """Vectorized (lat, lng) degrees -> H3 base cell number (0..121),
    with canonical containing-face hex-round assignment."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    P = _to3d(lat, lng)  # (n, 3)
    dots = P @ _C.T  # (n, 20)
    face = np.argmax(dots, axis=1)
    n_dot = np.take_along_axis(dots, face[:, None], axis=1)[:, 0]
    e1 = _E1[face]
    e2 = _E2[face]
    x = np.einsum("nd,nd->n", P, e1) / n_dot / RES0_U
    y = np.einsum("nd,nd->n", P, e2) / n_dot / RES0_U
    # axial coords on the face lattice (A=(1,0), B=(-1/2, sqrt3/2))
    jf = 2.0 * y / _SQRT3
    if_ = x + y / _SQRT3
    # cube rounding (deterministic floor(x+0.5), mirrored in the SQL oracle)
    cx, cz = if_, jf
    cy = -cx - cz
    rx = np.floor(cx + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(cz + 0.5)
    dx = np.abs(rx - cx)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    i = rx.astype(np.int64)
    j = rz.astype(np.int64)
    k = np.zeros_like(i)
    m = np.minimum(np.minimum(i, j), k)
    i, j, k = i - m, j - m, k - m
    ok = (i < 5) & (j < 5) & (k < 5)
    cell = np.full(len(P), -1, dtype=np.int64)
    cell[ok] = _LUT[face[ok], i[ok], j[ok], k[ok]]
    missing = cell < 0
    if missing.any():  # pathological roundings: nearest true center
        cell[missing] = np.argmax(P[missing] @ CELL_CENTERS.T, axis=1)
    return cell


def res0_cell_to_index(cell: np.ndarray) -> np.ndarray:
    """Base cell number -> 64-bit H3 index (mode 1, res 0, digits all 7)."""
    c = np.asarray(cell, dtype=np.int64)
    return (np.int64(1) << 59) | (c << 45) | np.int64((1 << 45) - 1)


def res0_index_to_string(idx: np.ndarray) -> np.ndarray:
    return np.array([format(int(v), "x") for v in np.asarray(idx)])


def latlng_to_res0_string(lat_deg, lng_deg) -> np.ndarray:
    return res0_index_to_string(res0_cell_to_index(
        latlng_to_res0_cell(lat_deg, lng_deg)))


# ---------------------------------------------------------------------------
# oracle SQL generation (DuckDB mirror of the exact same assignment)
# ---------------------------------------------------------------------------

def res0_oracle_sql(lat_expr: str, lng_expr: str) -> dict[str, str]:
    """Pieces for a DuckDB oracle mirroring ``latlng_to_res0_cell``:
    returns {'ctes': ..., 'cell_expr': ...} to splice into a query.  All
    per-face constants and the slot LUT are embedded as literals; every
    arithmetic step matches the numpy kernel op-for-op."""
    d_terms = []
    for f in range(20):
        nx, ny, nz = (repr(float(v)) for v in _C[f])
        d_terms.append(f"(px*{nx} + py*{ny} + pz*{nz})")
    d_cols = ", ".join(f"{t} AS d{f}" for f, t in enumerate(d_terms))
    dmax = "greatest(" + ", ".join(f"d{f}" for f in range(20)) + ")"
    face_case = "CASE " + " ".join(
        f"WHEN d{f} = dm THEN {f}" for f in range(20)) + " END"
    frame_rows = ", ".join(
        "({f}, {v})".format(
            f=f,
            v=", ".join(repr(float(x)) for x in
                        list(_E1[f]) + list(_E2[f])))
        for f in range(20))
    lut_rows = []
    for f in range(20):
        for i in range(5):
            for j in range(5):
                for k in range(5):
                    b = int(_LUT[f, i, j, k])
                    if b >= 0:
                        lut_rows.append(f"({f}, {i}, {j}, {k}, {b})")
    ctes = f"""
    p AS (SELECT *, cos(radians({lat_expr})) * cos(radians({lng_expr})) AS px,
                    cos(radians({lat_expr})) * sin(radians({lng_expr})) AS py,
                    sin(radians({lat_expr})) AS pz
          FROM __src__),
    d AS (SELECT *, {d_cols} FROM p),
    fsel AS (SELECT *, {face_case} AS face
             FROM (SELECT *, {dmax} AS dm FROM d)),
    frames(face, e1x, e1y, e1z, e2x, e2y, e2z) AS (VALUES {frame_rows}),
    proj AS (
      SELECT fsel.*,
        (px*e1x + py*e1y + pz*e1z) / dm / {RES0_U!r} AS hx,
        (px*e2x + py*e2y + pz*e2z) / dm / {RES0_U!r} AS hy
      FROM fsel JOIN frames USING (face)),
    ax AS (SELECT *, hx + hy / sqrt(3.0) AS cxf, 2.0 * hy / sqrt(3.0) AS czf
           FROM proj),
    rnd AS (
      SELECT *, floor(cxf + 0.5) AS rx0, floor(-cxf - czf + 0.5) AS ry0,
                floor(czf + 0.5) AS rz0,
                abs(floor(cxf + 0.5) - cxf) AS ddx,
                abs(floor(-cxf - czf + 0.5) - (-cxf - czf)) AS ddy,
                abs(floor(czf + 0.5) - czf) AS ddz
      FROM ax),
    fixed AS (
      SELECT *,
        CASE WHEN ddx > ddy AND ddx > ddz THEN -ry0 - rz0 ELSE rx0 END AS rx1,
        CASE WHEN NOT (ddx > ddy AND ddx > ddz) AND ddz > ddy
             THEN -(CASE WHEN ddx > ddy AND ddx > ddz
                         THEN -ry0 - rz0 ELSE rx0 END) - ry0
             ELSE rz0 END AS rz1
      FROM rnd),
    ijk AS (
      SELECT *, CAST(rx1 - least(rx1, rz1, 0) AS INTEGER) AS si,
                CAST(rz1 - least(rx1, rz1, 0) AS INTEGER) AS sj,
                CAST(0 - least(rx1, rz1, 0) AS INTEGER) AS sk
      FROM fixed),
    lut(face, si, sj, sk, cell) AS (VALUES {", ".join(lut_rows)})
    """
    return {"ctes": ctes, "cell_expr": "lut.cell",
            "join": "JOIN lut USING (face, si, sj, sk)"}
