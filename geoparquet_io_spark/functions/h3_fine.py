"""Full H3 indexing at resolutions 1-15 with CANONICAL h3lib cell ids,
from first principles plus the published Apache-2.0 H3 grid constants
(reference behavior: core/add_h3_column.py:57-84).

Builds on the derivation-validated res-0 kernel in ``functions/h3.py``
(122 base cells, pentagon-set certified).  What res>0 adds is the
aperture-7 subdivision pipeline:

  gnomonic projection onto the containing icosahedron face
  -> hex-plane coords scaled by sqrt(7)^res, rotated by -asin(sqrt(3/28))
     for Class III (odd) resolutions
  -> nearest-hex rounding to IJK coords at the target resolution
  -> digit extraction by repeated aperture-7 up-aggregation
     (upAp7 for Class III child resolutions, upAp7r for Class II —
     the public H3 lattice algebra)
  -> canonical base-cell anchoring (vendored home faces + calibrated
     per-slot digit rotations, pentagon deleted-k handling per the
     published ``cwOffsetPent`` convention)
  -> 64-bit H3 index packing (mode 1).

ORIENTATION PROVENANCE (important): the non-derivable inputs are all
published Apache-2.0 constants of the H3 grid, validated geometrically
at import so a mis-transcription cannot pass:

* the 20 per-face "+i axis" azimuths (``AXIS_AZ`` below — h3lib
  ``faceAxesAzRadsCII`` column 0): each must coincide with the derived
  azimuth of one of that face's icosahedron vertices to < 1e-9 rad
  (``_derive_frames``);
* the 122-row base-cell anchoring table (``functions/h3_cells.py``
  ``BASE_CELL_DATA`` — h3lib ``baseCellData``: canonical home face +
  res-0 FaceIJK per base cell, pentagon ``cwOffsetPent`` faces): each
  row's (face, ijk) must project exactly onto the derived base-cell
  center (``h3_cells.validate_base_cell_data``).

Everything else is re-derived: the inter-face lattice isometries
(h3lib ``faceNeighbors``) come from exact two-shared-vertex fits and
are asserted against the published face-0 row; hex-slot digit rotations
are measured tangent-frame angles; pentagon-slot rotations are
calibrated at import against the canonical INVERSE path (the h3lib
``_h3ToFaceIjk`` algorithm: home-plane digit descent + Class II overage
adjustment), which is itself driven only by the validated tables.  The
full pipeline must reproduce the canonical published SF test vector
bit-for-bit and its published cell center to < 1e-9 degrees:

    latlng_to_cell(37.7752702151959257, -122.418307270836983, 9)
        == 0x8928308280fffff
    cell_to_latlng(0x8928308280fffff)
        == (37.77670234943567, -122.41845932318311)

With the vendored anchoring table, ids agree with canonical h3lib on
EVERY base cell — face-interior, icosahedron-edge-anchored (30), and
pentagon (12) alike (pre-r4 builds used a self-consistent but
non-canonical glue for the latter two classes; see tests/test_h3_fine.py
canonical regression vectors).
"""

from __future__ import annotations

import math

import numpy as np

from geoparquet_io_spark.functions import h3 as _r0
from geoparquet_io_spark.functions import h3_cells as _bcd

_C = _r0._C                      # (20,3) face-center unit vectors
_CELLS = _r0.CELL_CENTERS        # (122,3) base-cell center unit vectors
_U = _r0.RES0_U                  # res-0 gnomonic lattice unit
_PENT = np.zeros(122, dtype=bool)
_PENT[list(_r0.H3_PENTAGONS)] = True

_SQRT3 = math.sqrt(3.0)
_SQRT7 = math.sqrt(7.0)
_ALPHA = math.asin(math.sqrt(3.0 / 28.0))   # Class III inter-res rotation

# Published H3 face-axis azimuths (radians, clockwise-from-north bearing of
# the +i axis from each face center) — h3lib faceAxesAzRadsCII[f][0],
# Apache-2.0 public constants.  Validated against derived geometry in
# _derive_frames(); see module docstring.
AXIS_AZ = (
    5.619958268523939882, 5.760339081714187279, 0.780213654393430055,
    0.430469363979999913, 6.130269123335111400, 2.692877706530642877,
    2.982963003477243874, 3.532912002790141181, 3.494305004259568154,
    3.003214169499538391, 5.930472956509811562, 0.138378484090254847,
    0.448714947059150361, 0.158629650112549365, 5.891865957979238535,
    2.711123289609793325, 3.294508837434268316, 3.804819692245439833,
    3.664438879055192436, 2.361378999196363184,
)

# ccw digit rotation: direction angle +60 degrees
# digits: 0 center, 1 k, 2 j, 3 jk, 4 i, 5 ik, 6 ij
_CCW = np.array([0, 5, 3, 1, 6, 4, 2], dtype=np.int8)
_CW = np.array([0, 3, 6, 2, 5, 1, 4], dtype=np.int8)  # inverse of _CCW


def _derive_frames():
    """Per-face orthonormal tangent frames with +x toward the published
    +i axis azimuth.  Azimuths are validated against the derived vertex
    directions (the true axes point at icosahedron vertices)."""
    north = np.array([0.0, 0.0, 1.0])
    verts = _CELLS[list(_r0.H3_PENTAGONS)]   # the 12 vertices
    E1 = np.empty((20, 3))
    E2 = np.empty((20, 3))
    worst = 0.0
    for f in range(20):
        n = _C[f]
        nt = north - np.dot(north, n) * n
        nt /= np.linalg.norm(nt)
        east = np.cross(nt, n)
        d = verts @ n
        cand = verts[np.argsort(-d)[:3]]
        best = None
        for v in cand:
            t = v - np.dot(v, n) * n
            t /= np.linalg.norm(t)
            az = math.atan2(float(np.dot(t, east)), float(np.dot(t, nt)))
            az %= 2.0 * math.pi
            err = abs(az - AXIS_AZ[f])
            err = min(err, 2.0 * math.pi - err)
            if best is None or err < best[0]:
                best = (err, t)
        worst = max(worst, best[0])
        if best[0] > 1e-9:
            raise AssertionError(
                f"face {f}: published axis azimuth {AXIS_AZ[f]} does not "
                f"match any derived vertex azimuth (err {best[0]:.2e}) — "
                "refusing to run with an unvalidated orientation table")
        E1[f] = best[1]
        E2[f] = np.cross(n, E1[f])
    return E1, E2, worst


_E1, _E2, _AZ_WORST_ERR = _derive_frames()


def _slot_pos(f: int, i: int, j: int, k: int) -> np.ndarray:
    a, b = i - k, j - k
    x = (a - 0.5 * b) * _U
    y = (b * _SQRT3 / 2.0) * _U
    p = _C[f] + x * _E1[f] + y * _E2[f]
    return p / np.linalg.norm(p)


def _tangent_angle(frm: np.ndarray, to: np.ndarray, at: np.ndarray) -> float:
    """Signed ccw angle (outward normal ``at``) from direction ``frm`` to
    ``to``, both projected onto the tangent plane at ``at``."""
    tf = frm - np.dot(frm, at) * at
    tf /= np.linalg.norm(tf)
    tt = to - np.dot(to, at) * at
    tt /= np.linalg.norm(tt)
    return math.atan2(float(np.dot(np.cross(tf, tt), at)),
                      float(np.dot(tf, tt)))


# canonical home anchoring (vendored, geometrically validated at import)
_bcd.validate_base_cell_data(_slot_pos, _CELLS, _C, _PENT)
_HOME_FACE = np.array([r[0] for r in _bcd.BASE_CELL_DATA], dtype=np.int16)
_HOME_SLOT = np.array([r[1] for r in _bcd.BASE_CELL_DATA], dtype=np.int16)
# cw-offset faces per pentagon (h3lib cwOffsetPent): leading-k children
# re-label CLOCKWISE when anchored on these faces, ccw elsewhere
_CW_OFFSET = np.zeros((122, 20), dtype=bool)
for _b, (_f, _ijk, _isp, _cwo) in enumerate(_bcd.BASE_CELL_DATA):
    if _isp:
        for _cf in _cwo:
            if _cf >= 0:
                _CW_OFFSET[_b, _cf] = True

# inter-face lattice isometries (h3lib faceNeighbors), derived exactly;
# direction index 0=IJ (k==0), 1=KI (k>0, j==0), 2=JK (k>0, j>0)
_FN_FACE, _FN_ROT, _FN_TRANS = _bcd.derive_face_neighbors(_slot_pos)


def _slot_tables():
    """Physical slot->base-cell map per face over [0..4]^3 (matches the
    res-0 kernel's domain) plus the digit-rotation count translating
    digits measured in face f's frame into the cell's CANONICAL
    home-face digit system.

    For hex cells: a fixed tangent direction w at the cell center has
    frame angle phi_f = phi_home - delta where delta is the signed ccw
    angle of f's +x axis measured in the home frame, so
    digit_home = ccw^n(digit_f) with n = round(delta / 60deg) mod 6
    (gnomonic fold distortion << 30 deg at hex-cell centers, asserted).
    Pentagon (vertex) slots are later OVERWRITTEN by
    ``_calibrate_pentagon_slots`` with rotation counts calibrated
    against the canonical inverse path (for pentagons the stored count
    means applications of the pentagon ccw rotation, which skips the
    deleted k subsequence)."""
    slot_cell = np.full((20, 5, 5, 5), -1, dtype=np.int16)
    slot_rot = np.zeros((20, 5, 5, 5), dtype=np.int8)
    for f in range(20):
        for i in range(5):
            for j in range(5):
                for k in range(5):
                    p = _slot_pos(f, i, j, k)
                    b = int(np.argmax(_CELLS @ p))
                    slot_cell[f, i, j, k] = b
                    h = int(_HOME_FACE[b])
                    if h != f:
                        c = _CELLS[b]
                        delta = _tangent_angle(_E1[h], _E1[f], c)
                        n = round(delta / (math.pi / 3.0))
                        near = max(i, j, k) - min(i, j, k) <= 2
                        if near and not _PENT[b] and \
                                abs(delta - n * math.pi / 3.0) > \
                                math.radians(25):
                            raise AssertionError(
                                f"face {f} slot {(i, j, k)}: frame rotation "
                                f"{math.degrees(delta):.1f} deg not near a "
                                "multiple of 60")
                        slot_rot[f, i, j, k] = n % 6
    for b in range(122):
        hs = tuple(int(v) for v in _HOME_SLOT[b])
        if slot_cell[(int(_HOME_FACE[b]),) + hs] != b:
            raise AssertionError(
                f"base cell {b}: vendored home slot {hs} on face "
                f"{int(_HOME_FACE[b])} maps to a different cell")
    return slot_cell, slot_rot


_SLOT_CELL, _SLOT_ROT = _slot_tables()

# ccw-permutation powers for vectorized digit rotation
_CCW_POW = np.empty((6, 7), dtype=np.int8)
_CCW_POW[0] = np.arange(7)
for _n in range(1, 6):
    _CCW_POW[_n] = _CCW[_CCW_POW[_n - 1]]


def _norm_ijk(i, j, k):
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def _up_ap7(i, j, k):
    a, b = i - k, j - k
    ni = np.floor((3 * a - b) / 7.0 + 0.5).astype(np.int64)
    nj = np.floor((a + 2 * b) / 7.0 + 0.5).astype(np.int64)
    return _norm_ijk(ni, nj, np.zeros_like(ni))


def _up_ap7r(i, j, k):
    a, b = i - k, j - k
    ni = np.floor((2 * a + b) / 7.0 + 0.5).astype(np.int64)
    nj = np.floor((3 * b - a) / 7.0 + 0.5).astype(np.int64)
    return _norm_ijk(ni, nj, np.zeros_like(ni))


def _down_ap7(i, j, k):
    return _norm_ijk(3 * i + j, 3 * j + k, i + 3 * k)


def _down_ap7r(i, j, k):
    return _norm_ijk(3 * i + k, i + 3 * j, j + 3 * k)


def _hex2d_to_ijk(x, y):
    """Nearest-hex rounding: axial -> cube -> round (identical math to
    the res-0 kernel; exact-tie inputs cannot occur for float data)."""
    jf = 2.0 * y / _SQRT3
    if_ = x + y / _SQRT3
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
    return _norm_ijk(i, j, np.zeros_like(i))


def _ijk_on_face(P, face, res: int):
    """3D unit points -> res-`res` lattice IJK on the given faces."""
    nd = np.einsum("nd,nd->n", P, _C[face])
    scale = _SQRT7 ** res / _U
    x = np.einsum("nd,nd->n", P, _E1[face]) / nd * scale
    y = np.einsum("nd,nd->n", P, _E2[face]) / nd * scale
    if res % 2 == 1:
        ca, sa = math.cos(_ALPHA), math.sin(_ALPHA)
        x, y = x * ca + y * sa, -x * sa + y * ca
    return _hex2d_to_ijk(x, y)


def _plane_from_ijk(face, i, j, k, res: int):
    """res-`res` lattice IJK on the given faces -> 3D unit points."""
    a, b = i - k, j - k
    x = (a - 0.5 * b).astype(np.float64)
    y = (b * _SQRT3 / 2.0).astype(np.float64)
    if res % 2 == 1:
        ca, sa = math.cos(_ALPHA), math.sin(_ALPHA)
        x, y = x * ca - y * sa, x * sa + y * ca
    x *= _U / _SQRT7 ** res
    y *= _U / _SQRT7 ** res
    P = _C[face] + x[:, None] * _E1[face] + y[:, None] * _E2[face]
    return P / np.linalg.norm(P, axis=1, keepdims=True)


def _leading_digit(digits):
    """digits: (n, res) int array -> leading nonzero digit per row (0 if
    all zero)."""
    if digits.shape[1] == 0:
        return np.zeros(len(digits), dtype=digits.dtype)
    nz = digits != 0
    first = np.argmax(nz, axis=1)
    has = nz.any(axis=1)
    lead = digits[np.arange(len(digits)), first]
    return np.where(has, lead, 0)


def _rotate_pent60ccw(digits):
    """One canonical pentagon ccw rotation (h3lib _h3RotatePent60ccw):
    rotate every digit ccw; if the leading nonzero digit lands on the
    deleted k axis, rotate once more."""
    digits = _CCW[digits]
    lk = _leading_digit(digits) == 1
    if lk.any():
        digits[lk] = _CCW[digits[lk]]
    return digits


def _fwd_raw(lat_deg, lng_deg, res: int):
    """Forward pipeline up to (face, res-0 slot coords, digits in the
    face's own frame) — shared by :func:`latlng_to_cell` and the
    pentagon-slot calibration."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cl = np.cos(lat)
    P = np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=-1)
    face = np.argmax(P @ _C.T, axis=1)
    i, j, k = _ijk_on_face(P, face, res)
    n = len(i)
    digits = np.zeros((n, res), dtype=np.int8)
    for r in range(res, 0, -1):
        up = _up_ap7 if r % 2 == 1 else _up_ap7r
        down = _down_ap7 if r % 2 == 1 else _down_ap7r
        pi, pj, pk = up(i, j, k)
        ci, cj, ck = down(pi, pj, pk)
        di, dj, dk = _norm_ijk(i - ci, j - cj, k - ck)
        digits[:, r - 1] = (4 * di + 2 * dj + dk).astype(np.int8)
        i, j, k = pi, pj, pk
    return face, i, j, k, digits


def latlng_to_cell(lat_deg, lng_deg, res: int) -> np.ndarray:
    """Vectorized (lat, lng) degrees -> canonical 64-bit H3 index at
    ``res``."""
    if not (0 <= res <= 15):
        raise ValueError("res must be in [0,15]")
    face, i, j, k, digits = _fwd_raw(lat_deg, lng_deg, res)
    ok = (i >= 0) & (i <= 4) & (j >= 0) & (j <= 4) & (k >= 0) & (k <= 4)
    i = np.clip(i, 0, 4)
    j = np.clip(j, 0, 4)
    k = np.clip(k, 0, 4)
    bc = _SLOT_CELL[face, i, j, k].astype(np.int64)
    nrot = _SLOT_ROT[face, i, j, k].astype(np.int64)
    pent = _PENT[bc]
    if res > 0:
        # hex cells: plain frame rotation into the home digit system
        rot = ~pent & (nrot > 0)
        if rot.any():
            digits[rot] = np.take_along_axis(
                _CCW_POW[nrot[rot]], digits[rot].astype(np.intp), axis=1)
        if pent.any():
            # canonical pentagon order (h3lib _faceIjkToH3): FIRST the
            # deleted-k fixup decided by the anchoring face (cw on the
            # published cwOffsetPent faces, ccw elsewhere), THEN the
            # slot's rotation count applied as pentagon ccw rotations
            lead_k = pent & (_leading_digit(digits) == 1)
            cw = _CW_OFFSET[bc, face]
            fx_cw = lead_k & cw
            if fx_cw.any():
                digits[fx_cw] = _CW[digits[fx_cw]]
            fx_ccw = lead_k & ~cw
            if fx_ccw.any():
                digits[fx_ccw] = _CCW[digits[fx_ccw]]
            nrot_p = np.where(pent, nrot, 0)
            for step in range(1, 6):
                m = nrot_p >= step
                if not m.any():
                    break
                digits[m] = _rotate_pent60ccw(digits[m])
    idx = (np.int64(1) << 59) | (np.int64(res) << 52) | (bc << 45)
    for r in range(1, 16):
        if r <= res:
            idx |= digits[:, r - 1].astype(np.int64) << (45 - 3 * r)
        else:
            idx |= np.int64(7) << (45 - 3 * r)
    return np.where(ok, idx, np.int64(0))


def _h3_to_faceijk(bc, digits, res: int):
    """Canonical inverse (vectorized h3lib ``_h3ToFaceIjk``): base cell
    + digits -> (face, i, j, k) at resolution ``res``.

    Home-plane digit descent from the vendored home FaceIJK, then
    Class II overage adjustment across folds via the derived
    ``faceNeighbors`` isometries (Class III resolutions drop to the
    res+1 Class II substrate grid and lift back).  Pentagon handling
    per the published algorithm: leading-5 sequences pre-rotate cw,
    leading-4 sequences rotate about the pentagon center when crossing
    a KI fold, and secondary overages re-adjust until settled."""
    n = len(bc)
    pent = _PENT[bc]
    digits = digits.copy()
    l5 = pent & (_leading_digit(digits) == 5)
    if l5.any():
        digits[l5] = _CW[digits[l5]]
    face = _HOME_FACE[bc].astype(np.int64)
    i = _HOME_SLOT[bc, 0].astype(np.int64)
    j = _HOME_SLOT[bc, 1].astype(np.int64)
    k = _HOME_SLOT[bc, 2].astype(np.int64)
    for r in range(1, res + 1):
        down = _down_ap7 if r % 2 == 1 else _down_ap7r
        i, j, k = down(i, j, k)
        d = digits[:, r - 1]
        i = i + (d >= 4)
        j = j + ((d == 2) | (d == 3) | (d == 6))
        k = k + ((d == 1) | (d == 3) | (d == 5))
        i, j, k = _norm_ijk(i, j, k)
    if res == 0:
        return face, i, j, k
    # overage adjustment happens on the Class II grid
    if res % 2 == 1:
        si, sj, sk = _down_ap7r(i, j, k)
        res_eff = res + 1
    else:
        si, sj, sk = i.copy(), j.copy(), k.copy()
        res_eff = res
    us = 7 ** (res_eff // 2)
    maxdim = 2 * us
    pl4 = pent & (_leading_digit(digits) == 4)
    moved = np.zeros(n, dtype=bool)
    cur = np.where((si + sj + sk) > maxdim)[0]
    first = True
    while len(cur):
        moved[cur] = True
        ic, jc, kc = si[cur], sj[cur], sk[cur]
        dirs = np.where(kc > 0, np.where(jc > 0, 2, 1), 0)
        if first:
            # pentagon leading-4: rotate cw about the pentagon center
            # (maxdim, 0, 0) before crossing the KI fold
            m4 = (dirs == 1) & pl4[cur]
            if m4.any():
                ti = ic[m4] - maxdim
                tj = jc[m4]
                tk = kc[m4]
                ic[m4] = ti + tj + maxdim   # raw cw: i->ij, j->jk, k->ik
                jc[m4] = tj + tk
                kc[m4] = ti + tk
        g = _FN_FACE[face[cur], dirs]
        nr = _FN_ROT[face[cur], dirs]
        t = _FN_TRANS[face[cur], dirs]
        for step in range(1, 6):
            m = nr >= step
            if not m.any():
                break
            ri = ic[m] + kc[m]          # raw ccw: i->ij? no: (i+k, i+j, j+k)
            rj = ic[m] + jc[m]
            rk = jc[m] + kc[m]
            ic[m], jc[m], kc[m] = ri, rj, rk
        ic = ic + t[:, 0] * us
        jc = jc + t[:, 1] * us
        kc = kc + t[:, 2] * us
        ic, jc, kc = _norm_ijk(ic, jc, kc)
        si[cur], sj[cur], sk[cur] = ic, jc, kc
        face[cur] = g
        # secondary overages occur only for pentagon base cells
        still = (si[cur] + sj[cur] + sk[cur] > maxdim) & pent[cur]
        cur = cur[still]
        first = False
    if res % 2 == 1:
        mi, mj, mk = _up_ap7r(si, sj, sk)
        i = np.where(moved, mi, i)
        j = np.where(moved, mj, j)
        k = np.where(moved, mk, k)
    else:
        i, j, k = si, sj, sk
    return face, i, j, k


def cell_to_latlng(idx) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 64-bit H3 index -> (lat, lng) degrees of the cell
    center, via the canonical inverse path."""
    idx = np.asarray(idx, dtype=np.int64)
    resv = (idx >> 52) & 0xF
    res = int(resv[0]) if len(idx) else 0
    if not np.all(resv == res):
        raise ValueError("cell_to_latlng batch must share one resolution")
    bc = ((idx >> 45) & 0x7F).astype(np.int64)
    if res:
        digits = np.stack([((idx >> (45 - 3 * r)) & 7).astype(np.int8)
                           for r in range(1, res + 1)], axis=1)
    else:
        digits = np.zeros((len(idx), 0), dtype=np.int8)
    face, i, j, k = _h3_to_faceijk(bc, digits, res)
    P = _plane_from_ijk(face, i, j, k, res)
    lat = np.degrees(np.arcsin(np.clip(P[:, 2], -1, 1)))
    lng = np.degrees(np.arctan2(P[:, 1], P[:, 0]))
    return lat, lng


def _calibrate_pentagon_slots() -> None:
    """Calibrate the 60 pentagon vertex-slot rotation counts against the
    canonical inverse: every res-3 descendant of every pentagon (286
    valid digit paths each: 7^3 minus the 57 leading-k paths) is
    rendered through the inverse, pushed back
    through the raw forward pipeline, and the unique rotation count that
    reproduces the canonical digits at each (face, slot) is stored.
    The pentagon rotation is a 5-cycle on the non-deleted subtrees, so
    counts are unique mod 5 (the minimal representative is stored).
    Raises if any slot is unconstrained or inconsistent."""
    import itertools

    pent_cells = np.where(_PENT)[0]
    digs_all = np.array(
        [d for d in itertools.product(range(7), repeat=3)
         if next((x for x in d if x), 0) != 1], dtype=np.int8)
    n_per = len(digs_all)                       # 286
    bc = np.repeat(pent_cells, n_per).astype(np.int64)
    digits = np.tile(digs_all, (len(pent_cells), 1))
    face, i, j, k = _h3_to_faceijk(bc, digits, 3)
    P = _plane_from_ijk(face, i, j, k, 3)
    lat = np.degrees(np.arcsin(np.clip(P[:, 2], -1, 1)))
    lng = np.degrees(np.arctan2(P[:, 1], P[:, 0]))
    f2, i2, j2, k2, fdigs = _fwd_raw(lat, lng, 3)
    slot_bc = _SLOT_CELL[f2, i2, j2, k2].astype(np.int64)
    if (slot_bc != bc).any():
        raise AssertionError("pentagon calibration: a canonical center "
                             "round-trips to a different base cell")
    keys = (f2 * 125 + i2 * 25 + j2 * 5 + k2).astype(np.int64)
    done = set()
    for key in np.unique(keys):
        rows = np.where(keys == key)[0]
        f = int(key // 125)
        rem = int(key % 125)
        s = (rem // 25, (rem % 25) // 5, rem % 5)
        b = int(bc[rows[0]])
        want = digits[rows]
        got = fdigs[rows].copy()
        # canonical forward order: leading-k fixup, then n pentagon rots
        lead_k = _leading_digit(got) == 1
        if lead_k.any():
            tab = _CW if _CW_OFFSET[b, f] else _CCW
            got[lead_k] = tab[got[lead_k]]
        sol = None
        for cand in range(6):
            if (got == want).all():
                sol = cand
                break
            got = _rotate_pent60ccw(got)
        if sol is None:
            raise AssertionError(
                f"pentagon calibration: no rotation count fits face {f} "
                f"slot {s} (base cell {b})")
        _SLOT_ROT[(f,) + s] = sol
        done.add((f, s))
    if len(done) != 60:
        raise AssertionError(
            f"pentagon calibration covered {len(done)} slots, expected 60 "
            "(3 vertex slots on each of 20 faces)")


_calibrate_pentagon_slots()


def cell_to_string(idx) -> np.ndarray:
    return np.array([format(int(v), "x") for v in np.asarray(idx)])


def string_to_cell(s) -> np.ndarray:
    return np.array([int(v, 16) for v in np.asarray(s)], dtype=np.int64)


def latlng_to_cell_string(lat_deg, lng_deg, res: int) -> np.ndarray:
    return cell_to_string(latlng_to_cell(lat_deg, lng_deg, res))


def parent(idx, parent_res: int) -> np.ndarray:
    """Digit-truncation parent (exact H3 algebra)."""
    idx = np.asarray(idx, dtype=np.int64)
    res = (idx >> 52) & 0xF
    if np.any(parent_res > res):
        raise ValueError("parent_res must be <= cell res")
    out = (idx & ~(np.int64(0xF) << 52)) | (np.int64(parent_res) << 52)
    for r in range(parent_res + 1, 16):
        out |= np.int64(7) << (45 - 3 * r)
    return out


# ---------------------------------------------------------------------------
# scalar mirror (independent arithmetic path for oracle literals)
# ---------------------------------------------------------------------------

def latlng_to_cell_scalar(lat_deg: float, lng_deg: float, res: int) -> int:
    """Pure-scalar re-implementation of ``latlng_to_cell`` (shared
    orientation tables, independent arithmetic) used to generate DuckDB
    oracle literals and to cross-check the vectorized kernel."""
    la, lo = math.radians(lat_deg), math.radians(lng_deg)
    P = (math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo),
         math.sin(la))
    best, f = -2.0, -1
    for ff in range(20):
        d = P[0] * _C[ff][0] + P[1] * _C[ff][1] + P[2] * _C[ff][2]
        if d > best:
            best, f = d, ff
    scale = _SQRT7 ** res / _U
    x = (P[0] * _E1[f][0] + P[1] * _E1[f][1] + P[2] * _E1[f][2]) / best * scale
    y = (P[0] * _E2[f][0] + P[1] * _E2[f][1] + P[2] * _E2[f][2]) / best * scale
    if res % 2 == 1:
        ca, sa = math.cos(_ALPHA), math.sin(_ALPHA)
        x, y = x * ca + y * sa, -x * sa + y * ca
    jf = 2.0 * y / _SQRT3
    if_ = x + y / _SQRT3
    cx, cz = if_, jf
    cy = -cx - cz
    rx, ry, rz = math.floor(cx + 0.5), math.floor(cy + 0.5), math.floor(cz + 0.5)
    dx, dy, dz = abs(rx - cx), abs(ry - cy), abs(rz - cz)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dz > dy:
        rz = -rx - ry
    m = min(rx, rz, 0)
    i, j, k = int(rx - m), int(rz - m), int(0 - m)
    digits = [0] * (res + 1)
    for r in range(res, 0, -1):
        a, b = i - k, j - k
        if r % 2 == 1:
            pi = round((3 * a - b) / 7.0)
            pj = round((a + 2 * b) / 7.0)
        else:
            pi = round((2 * a + b) / 7.0)
            pj = round((3 * b - a) / 7.0)
        mm = min(pi, pj, 0)
        pi, pj, pk = pi - mm, pj - mm, 0 - mm
        if r % 2 == 1:
            ci, cj, ck = 3 * pi + pj, 3 * pj + pk, pi + 3 * pk
        else:
            ci, cj, ck = 3 * pi + pk, pi + 3 * pj, pj + 3 * pk
        mm = min(ci, cj, ck)
        ci, cj, ck = ci - mm, cj - mm, ck - mm
        di, dj, dk = i - ci, j - cj, k - ck
        mm = min(di, dj, dk)
        di, dj, dk = di - mm, dj - mm, dk - mm
        digits[r] = 4 * di + 2 * dj + dk
        i, j, k = pi, pj, pk
    if not (0 <= i <= 4 and 0 <= j <= 4 and 0 <= k <= 4):
        return 0
    bc = int(_SLOT_CELL[f, i, j, k])
    nrot = int(_SLOT_ROT[f, i, j, k])
    ds = digits[1:res + 1]

    def lead(dd):
        for v in dd:
            if v:
                return v
        return 0

    if _PENT[bc]:
        if res > 0 and lead(ds) == 1:
            tab = _CW if _CW_OFFSET[bc, f] else _CCW
            ds = [int(tab[v]) for v in ds]
        for _ in range(nrot):
            ds = [int(_CCW[v]) for v in ds]
            if lead(ds) == 1:
                ds = [int(_CCW[v]) for v in ds]
    else:
        for _ in range(nrot):
            ds = [int(_CCW[v]) for v in ds]
    idx = (1 << 59) | (res << 52) | (bc << 45)
    for r in range(1, 16):
        idx |= (ds[r - 1] if r <= res else 7) << (45 - 3 * r)
    return idx


# ---------------------------------------------------------------------------
# import-time validation
# ---------------------------------------------------------------------------

_SF_VECTOR = (37.7752702151959257, -122.418307270836983, 9, 0x8928308280FFFFF)
_SF_CENTER = (37.77670234943567, -122.41845932318311)


def _selftest() -> None:
    lat, lng, res, want = _SF_VECTOR
    got = int(latlng_to_cell(np.array([lat]), np.array([lng]), res)[0])
    if got != want:
        raise AssertionError(
            f"H3 pipeline failed the published SF vector: got {got:#x}, "
            f"want {want:#x}")
    if latlng_to_cell_scalar(lat, lng, res) != want:
        raise AssertionError("scalar H3 mirror disagrees with the SF vector")
    clat, clng = cell_to_latlng(np.array([want], dtype=np.int64))
    if abs(float(clat[0]) - _SF_CENTER[0]) > 1e-9 or \
            abs(float(clng[0]) - _SF_CENTER[1]) > 1e-9:
        raise AssertionError(
            f"cell_to_latlng failed the published SF center: got "
            f"({float(clat[0])}, {float(clng[0])}), want {_SF_CENTER}")
    # canonical pentagon invariant: the all-zero-digit descendant of
    # every pentagon base cell is centered exactly on its icosahedron
    # vertex at every resolution class
    pents = np.where(_PENT)[0].astype(np.int64)
    for res_p in (1, 2):
        ids = (np.int64(1) << 59) | (np.int64(res_p) << 52) | (pents << 45)
        for r in range(res_p + 1, 16):
            ids |= np.int64(7) << (45 - 3 * r)
        pl, pg = cell_to_latlng(ids)
        cl = np.cos(np.radians(pl))
        PP = np.stack([cl * np.cos(np.radians(pg)),
                       cl * np.sin(np.radians(pg)),
                       np.sin(np.radians(pl))], axis=-1)
        dots = np.einsum("nd,nd->n", PP, _CELLS[pents])
        if dots.min() < 1 - 1e-9:
            raise AssertionError(
                f"pentagon center drifted off its icosahedron vertex at "
                f"res {res_p}")


_selftest()
