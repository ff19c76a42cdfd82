"""Full H3 indexing at resolutions 1-15, from first principles plus the
20 published face-axis azimuths (reference behavior: core/add_h3_column.py:57-84).

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
  -> base-cell anchoring with geometrically-derived inter-face digit
     rotations and pentagon wedge glue (deleted k-axis subsequence)
  -> 64-bit H3 index packing (mode 1).

ORIENTATION PROVENANCE (important):  the only non-derivable inputs are
the 20 per-face "+i axis" azimuths (``AXIS_AZ`` below) — published
Apache-2.0 constants of the H3 grid (the first column of h3lib's
``faceAxesAzRadsCII``).  They are NOT trusted blindly: at import,
``_derive_frames`` checks each azimuth coincides with the geometrically
derived azimuth of one of that face's three icosahedron vertices to
< 1e-9 rad (they match to ~1e-13; the true axes point at face vertices,
so a mis-transcribed constant cannot pass), and ``_selftest`` requires
the full pipeline to reproduce the canonical published SF test vector
bit-for-bit and its published cell center to < 1e-9 degrees:

    latlng_to_cell(37.7752702151959257, -122.418307270836983, 9)
        == 0x8928308280fffff
    cell_to_latlng(0x8928308280fffff)
        == (37.77670234943567, -122.41845932318311)

Known residual convention gaps (documented; they affect LABELS of a
bounded cell subset, never cell GEOMETRY):

* pentagon base cells (12): canonical H3 resolves the five 72-degree
  wedges onto five 60-degree index sectors via the published
  ``faceIjkBaseCells`` rotations and two "cw offset" faces per pentagon
  (``baseCellData.cwOffsetPent``); this implementation derives an
  equivalent self-consistent glue geometrically (ccw wedge order from
  the home face, skipping the deleted k sector), which may differ from
  canonical h3lib ids by a fixed digit rotation per wedge;
* base cells centered on icosahedron edges (30): the anchor ("home")
  face of such a cell is a published convention; ours is the
  lowest-index containing face, so children of an edge cell whose
  canonical home is the other face differ by that edge's fixed digit
  rotation.

Everything else — cell boundaries at every resolution, base cells,
resolution/bit layout, parent-child digit algebra, and all ids on
face-interior base cells (the bulk of the sphere) — follows the
canonical construction, bit-validated where published vectors exist.
"""

from __future__ import annotations

import math

import numpy as np

from geoparquet_io_spark.functions import h3 as _r0

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
# direction angle of each digit in its frame (degrees; center -> -1)
_DIGIT_ANGLE = {1: 240, 2: 120, 3: 180, 4: 0, 5: 300, 6: 60}


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


def _slot_tables():
    """Physical slot->base-cell map per face over [0..4]^3 (matches the
    res-0 kernel's domain) plus the digit-rotation count translating
    digits measured in face f's frame into the cell's home-face digit
    system.

    For hex cells: a fixed tangent direction w at the cell center has
    frame angle phi_f = phi_home - delta where delta is the signed ccw
    angle of f's +x axis measured in the home frame, so
    digit_home = ccw^n(digit_f) with n = round(delta / 60deg) mod 6
    (gnomonic fold distortion << 30 deg at hex-cell centers, asserted).
    Pentagon (vertex) slots get their rotations from the wedge glue in
    ``_pentagon_glue``."""
    slot_cell = np.full((20, 5, 5, 5), -1, dtype=np.int16)
    slot_rot = np.zeros((20, 5, 5, 5), dtype=np.int8)
    home_face = np.full(122, -1, dtype=np.int16)
    home_slot = np.zeros((122, 3), dtype=np.int16)
    # home face: containing face of the cell center (ties -> lowest index,
    # our deterministic convention; see module docstring)
    for b in range(122):
        dots = _C @ _CELLS[b]
        home_face[b] = int(np.argmax(np.round(dots, 9)))
    for f in range(20):
        for i in range(5):
            for j in range(5):
                for k in range(5):
                    p = _slot_pos(f, i, j, k)
                    b = int(np.argmax(_CELLS @ p))
                    slot_cell[f, i, j, k] = b
                    if home_face[b] == f and np.dot(p, _CELLS[b]) > 1 - 1e-9:
                        home_slot[b] = (i, j, k)
                    h = int(home_face[b])
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
    if (home_face < 0).any():
        raise AssertionError("base cell without a home face")
    return slot_cell, slot_rot, home_face, home_slot


_SLOT_CELL, _SLOT_ROT, _HOME_FACE, _HOME_SLOT = _slot_tables()

_VERTEX_SLOTS = ((2, 0, 0), (0, 2, 0), (0, 0, 2))
_VERTEX_AXIS_ANGLE = {(2, 0, 0): 0, (0, 2, 0): 120, (0, 0, 2): 240}


def _edge_rotations():
    """n_edge[f, g]: digit rotation when re-anchoring a lattice point
    from face f's frame to adjacent face g's (digit_g = ccw^n(digit_f)),
    measured at the shared-edge midpoint where fold distortion is
    symmetric and small."""
    n_edge = np.full((20, 20), -1, dtype=np.int8)
    ang = np.degrees(np.arccos(np.clip(_C @ _C.T, -1, 1)))
    for f in range(20):
        for g in range(20):
            if f == g or ang[f, g] > 42:
                continue
            mid = _C[f] + _C[g]
            mid /= np.linalg.norm(mid)
            delta = _tangent_angle(_E1[g], _E1[f], mid)
            n = round(delta / (math.pi / 3.0))
            if abs(delta - n * math.pi / 3.0) > math.radians(25):
                raise AssertionError(f"edge {f}-{g}: rotation "
                                     f"{math.degrees(delta):.1f}")
            n_edge[f, g] = n % 6
    return n_edge


_N_EDGE = _edge_rotations()

# +1: leading-K spill rotates ccw; -1: cw (set per pentagon vertex slot)
_SLOT_KFIX = np.ones((20, 5, 5, 5), dtype=np.int8)


def _pentagon_glue():
    """Rotation counts for pentagon vertex slots.

    At an icosahedron vertex five faces meet: 72 deg of sphere per wedge
    but exactly 60 deg of each face's (flat, gnomonic) lattice — the
    five wedges tile 300 deg of digit space and one 60-deg sector (the
    k axis, 240 deg in the home digit frame) is deleted: the published
    H3 "pentagon deleted subsequence".

    The consistent glue is forced by the measured fold continuations:
    walking the faces ccw (f_0 = home .. f_4), a shared direction read on
    consecutive faces satisfies digit_{m+1} = ccw^{e_m}(digit_m) with
    e_m = n_edge[f_m, f_{m+1}], so label coherence across each fold
    needs g_{m+1} = g_m - e_m (mod 6) — except at exactly ONE fold,
    where the icosahedron's 60-degree angular deficit forces a +1 jump
    (that fold's k-axis spill is re-labelled by the leading-K ccw fixup
    in the forward path).  The absorbing fold is uniquely determined by
    requiring no wedge window to sit on the deleted 240-degree sector.
    digit_home = ccw^{g_m}(digit_{f_m}); overwrites ``_SLOT_ROT`` for
    vertex slots and returns per-pentagon wedge lists for the inverse."""
    wedges: dict[int, list[tuple[int, tuple[int, int, int], int]]] = {}
    for b in range(122):
        if not _PENT[b]:
            continue
        c = _CELLS[b]
        dots = np.round(_C @ c, 9)
        faces = [f for f in range(20) if dots[f] == dots.max()]
        if len(faces) != 5:
            raise AssertionError(f"pentagon {b}: {len(faces)} faces")
        h = int(_HOME_FACE[b])
        slot_of = {}
        wsec = {}
        for f in faces:
            for s in _VERTEX_SLOTS:
                if np.dot(_slot_pos(f, *s), c) > 1 - 1e-9:
                    slot_of[f] = s
                    wsec[f] = (_VERTEX_AXIS_ANGLE[s] + 180) % 360
                    break
            else:
                raise AssertionError(f"pentagon {b}: no vertex slot on {f}")
        ref = _C[h]
        order = sorted(
            faces,
            key=lambda f: _tangent_angle(ref, _C[f], c) % (2 * math.pi)
            if f != h else 0.0)
        e = [int(_N_EDGE[order[m], order[(m + 1) % 5]]) for m in range(5)]
        base = [0]
        for m in range(4):
            base.append((base[m] - e[m]) % 6)
        # closing defect must be the 60-degree deficit
        defect = (0 - (base[4] - e[4])) % 6
        if defect != 1:
            raise AssertionError(
                f"pentagon {b}: closing defect {defect}, expected 1")
        chosen = None
        for p in range(5):
            g = [(base[m] + (1 if m > p else 0)) % 6 for m in range(5)]
            secs = [(wsec[order[m]] + 60 * g[m]) % 360 for m in range(5)]
            if 240 not in secs and len(set(secs)) == 5:
                if chosen is not None:
                    raise AssertionError(
                        f"pentagon {b}: ambiguous deleted-fold choice")
                chosen = g
        if chosen is None:
            raise AssertionError(f"pentagon {b}: no consistent glue")
        # the absorbing fold p (residual-1 fold): wedge p's k-axis spill
        # re-labels ccw (into the ik subtree), wedge p+1's spill re-labels
        # cw (into the jk subtree) — the fold becomes the cell boundary
        # there, exactly the role of h3lib's cwOffsetPent faces
        p_abs = None
        for m in range(5):
            resid = (chosen[(m + 1) % 5] - (chosen[m] - e[m])) % 6
            if resid == 1:
                if p_abs is not None:
                    raise AssertionError(f"pentagon {b}: two absorbing folds")
                p_abs = m
            elif resid != 0:
                raise AssertionError(f"pentagon {b}: fold residual {resid}")
        if p_abs is None:
            raise AssertionError(f"pentagon {b}: no absorbing fold")
        lst = []
        for m, f in enumerate(order):
            s = slot_of[f]
            _SLOT_ROT[f, s[0], s[1], s[2]] = chosen[m]
            kfix = -1 if m == (p_abs + 1) % 5 else 1
            _SLOT_KFIX[f, s[0], s[1], s[2]] = kfix
            lst.append((f, s, chosen[m]))
        wedges[b] = lst
    return wedges


_PENT_WEDGES = _pentagon_glue()

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


def latlng_to_cell(lat_deg, lng_deg, res: int) -> np.ndarray:
    """Vectorized (lat, lng) degrees -> 64-bit H3 index at ``res``."""
    if not (0 <= res <= 15):
        raise ValueError("res must be in [0,15]")
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
    ok = (i >= 0) & (i <= 4) & (j >= 0) & (j <= 4) & (k >= 0) & (k <= 4)
    i = np.clip(i, 0, 4)
    j = np.clip(j, 0, 4)
    k = np.clip(k, 0, 4)
    bc = _SLOT_CELL[face, i, j, k].astype(np.int64)
    nrot = _SLOT_ROT[face, i, j, k].astype(np.int64)
    pent = _PENT[bc]
    if res > 0:
        # frame rotation into the home-face digit system
        rot = nrot > 0
        if rot.any():
            digits[rot] = np.take_along_axis(
                _CCW_POW[nrot[rot]], digits[rot].astype(np.intp), axis=1)
        # pentagon deleted-k subsequence: the k-axis spill re-labels into
        # the adjacent subtree — ccw or cw depending on which side of the
        # absorbing fold this face is (see _pentagon_glue)
        kfix = _SLOT_KFIX[face, i, j, k].astype(np.int64)
        lead_k = _leading_digit(digits) == 1
        fx_ccw = pent & lead_k & (kfix > 0)
        if fx_ccw.any():
            digits[fx_ccw] = _CCW_POW[1][digits[fx_ccw]]
        fx_cw = pent & lead_k & (kfix < 0)
        if fx_cw.any():
            digits[fx_cw] = _CW[digits[fx_cw]]
    idx = (np.int64(1) << 59) | (np.int64(res) << 52) | (bc << 45)
    for r in range(1, 16):
        if r <= res:
            idx |= digits[:, r - 1].astype(np.int64) << (45 - 3 * r)
        else:
            idx |= np.int64(7) << (45 - 3 * r)
    return np.where(ok, idx, np.int64(0))


def _descend(face0, i0, j0, k0, digits, rot0, res: int,
             reanchor: bool = True):
    """Stepwise digit descent, optionally with fold re-anchoring.

    face0/i0/j0/k0: anchor slots (res-0 coords, arrays).  digits: (n,res)
    in the anchor's digit frame modulo rot0 initial rotation.  Returns
    3D center points.  ``reanchor=False`` descends entirely in the anchor
    face's plane (flat continuation) — matching the forward path's
    single-plane rounding, which is what defines the preimages of cells
    whose digit path pokes beyond a fold."""
    face = face0.copy()
    i, j, k = i0.astype(np.int64), j0.astype(np.int64), k0.astype(np.int64)
    rot = rot0.astype(np.int64) % 6
    for r in range(1, res + 1):
        down = _down_ap7 if r % 2 == 1 else _down_ap7r
        i, j, k = down(i, j, k)
        d = np.take_along_axis(
            _CCW_POW[rot], digits[:, r - 1:r].astype(np.intp), axis=1)[:, 0]
        ui = (d >= 4).astype(np.int64)
        uj = ((d == 2) | (d == 3) | (d == 6)).astype(np.int64)
        uk = ((d == 1) | (d == 3) | (d == 5)).astype(np.int64)
        i, j, k = _norm_ijk(i + ui, j + uj, k + uk)
        if not reanchor:
            continue
        # re-anchor rows whose current point left the anchor face
        P = _plane_from_ijk(face, i, j, k, r)
        g = np.argmax(P @ _C.T, axis=1)
        # re-anchor only across true folds; a jump to a NON-adjacent face
        # can only happen for pentagon-wedge children descending in the
        # home plane (72->60 deg squeeze) — those rows are recomputed by
        # the per-wedge candidates in cell_to_latlng, so leave them be
        move = (g != face) & (_N_EDGE[face, g] >= 0)
        if move.any():
            ne = _N_EDGE[face[move], g[move]].astype(np.int64)
            im, jm, km = _ijk_on_face(P[move], g[move], r)
            i[move], j[move], k[move] = im, jm, km
            rot[move] = (rot[move] + ne) % 6
            face = np.where(move, g, face)
    return _plane_from_ijk(face, i, j, k, res)


def cell_to_latlng(idx) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 64-bit H3 index -> (lat, lng) degrees of the cell
    center.  Pentagon cells resolve their wedge by candidate descent."""
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
    face = _HOME_FACE[bc].astype(np.int64)
    i = _HOME_SLOT[bc, 0].astype(np.int64)
    j = _HOME_SLOT[bc, 1].astype(np.int64)
    k = _HOME_SLOT[bc, 2].astype(np.int64)
    P = _descend(face, i, j, k, digits,
                 np.zeros(len(idx), dtype=np.int64), res)
    pent = _PENT[bc] & (res > 0)
    if pent.any():
        # try each wedge: digits are in home digit space; candidate wedge
        # (f, slot, n) holds children whose digits translate by cw^n.
        # pre = 0: wedge-interior children; pre = +/-1: children whose
        # forward path took a leading-K spill rotation (ccw or cw).
        rows = np.where(pent)[0]
        sub_idx = idx[rows]
        resolved = np.zeros(len(rows), dtype=bool)
        stash: list[tuple[np.ndarray, np.ndarray]] = []
        for b, lst in _PENT_WEDGES.items():
            sel = np.where((bc[rows] == b) & ~resolved)[0]
            if not len(sel):
                continue
            for pre in (0, 1, -1):
                for (f, s, n) in lst:
                    for flat in (False, True):
                        todo = sel[~resolved[sel]]
                        if not len(todo):
                            break
                        dd = digits[rows[todo]]
                        dd = np.take_along_axis(
                            _CCW_POW[(-(n + pre)) % 6][None, :]
                            .repeat(len(dd), 0),
                            dd.astype(np.intp), axis=1)
                        fa = np.full(len(todo), f, dtype=np.int64)
                        Pc = _descend(fa,
                                      np.full(len(todo), s[0], dtype=np.int64),
                                      np.full(len(todo), s[1], dtype=np.int64),
                                      np.full(len(todo), s[2], dtype=np.int64),
                                      dd, np.zeros(len(todo), dtype=np.int64),
                                      res, reanchor=not flat)
                        la = np.degrees(np.arcsin(np.clip(Pc[:, 2], -1, 1)))
                        lo = np.degrees(np.arctan2(Pc[:, 1], Pc[:, 0]))
                        back = latlng_to_cell(la, lo, res)
                        okm = back == sub_idx[todo]
                        if okm.any():
                            P[rows[todo[okm]]] = Pc[okm]
                            resolved[todo[okm]] = True
                        if (~okm).any():
                            stash.append((todo[~okm], Pc[~okm]))
        # ragged-preimage fallback: cells straddling a pentagon's
        # absorbing fold have label-defined (preimage) shapes whose
        # nominal lattice center can fall just outside; ring-search each
        # failed candidate's center for a nearby interior representative
        # (the role canonical H3's overage machinery plays for these
        # cells' centers)
        if not resolved.all():
            rad = 0.7 / _SQRT7 ** res
            for todo, Pc in stash:
                live = ~resolved[todo]
                if not live.any():
                    continue
                todo, Pc = todo[live], Pc[live]
                for frac in (0.35, 0.7, 1.05):
                    for ang in range(0, 360, 30):
                        un = ~resolved[todo]
                        if not un.any():
                            break
                        tt, base = todo[un], Pc[un]
                        north = np.zeros_like(base)
                        north[:, 2] = 1.0
                        t1 = north - base * base[:, 2:3]
                        t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
                        t2 = np.cross(base, t1)
                        a = math.radians(ang)
                        Pn = base + frac * rad * (math.cos(a) * t1 +
                                                  math.sin(a) * t2)
                        Pn /= np.linalg.norm(Pn, axis=1, keepdims=True)
                        la = np.degrees(np.arcsin(np.clip(Pn[:, 2], -1, 1)))
                        lo = np.degrees(np.arctan2(Pn[:, 1], Pn[:, 0]))
                        back = latlng_to_cell(la, lo, res)
                        okm = back == sub_idx[tt]
                        if okm.any():
                            P[rows[tt[okm]]] = Pn[okm]
                            resolved[tt[okm]] = True
    lat = np.degrees(np.arcsin(np.clip(P[:, 2], -1, 1)))
    lng = np.degrees(np.arctan2(P[:, 1], P[:, 0]))
    return lat, lng


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
    for _ in range(nrot):
        ds = [int(_CCW[v]) for v in ds]

    def lead(dd):
        for v in dd:
            if v:
                return v
        return 0

    if res > 0 and _PENT[bc] and lead(ds) == 1:
        tab = _CCW if int(_SLOT_KFIX[f, i, j, k]) > 0 else _CW
        ds = [int(tab[v]) for v in ds]
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


_selftest()
