"""Vendored canonical H3 base-cell anchoring data + derived inter-face
lattice maps.

``BASE_CELL_DATA`` transcribes the PUBLIC Apache-2.0 constants of the H3
grid system (h3lib ``baseCells.c`` ``baseCellData``): for each of the
122 base cells, its canonical HOME face, its res-0 FaceIJK coordinates
on that face, the pentagon flag, and — for pentagons — the two
"clockwise offset" faces (``cwOffsetPent``) that re-label a leading
k-axis digit clockwise instead of counter-clockwise.  These constants
are exactly what the reference engine gets transitively through the
DuckDB h3 extension (reference: core/add_h3_column.py:57-84).

They are NOT trusted blindly (same policy as ``AXIS_AZ`` in
functions/h3_fine.py): :func:`validate_base_cell_data` re-derives each
row geometrically at import — the claimed (face, ijk) must project onto
the derivation-certified center of exactly that base cell to < 1e-9,
the pentagon flags must match the certified pentagon set, and each
``cwOffsetPent`` face must be one of the five faces meeting at that
pentagon's icosahedron vertex.  A mis-transcribed row cannot pass.

``derive_face_neighbors`` computes h3lib's ``faceNeighbors`` table
(adjacent face, ccw 60-degree rotation count, and lattice translation
per overage direction) EXACTLY from icosahedron geometry: the affine
lattice isometry across each fold is pinned by the two shared vertices.
The derived face-0 row is asserted against the published h3lib row as a
transcription-free cross-check of all conventions.
"""

from __future__ import annotations

import numpy as np

# (home_face, (i, j, k), is_pentagon, (cw_offset_0, cw_offset_1))
# per base cell 0..121 — h3lib baseCellData, Apache-2.0 public constants.
BASE_CELL_DATA = (
    (1, (1, 0, 0), 0, (0, 0)), (2, (1, 1, 0), 0, (0, 0)),
    (1, (0, 0, 0), 0, (0, 0)), (2, (1, 0, 0), 0, (0, 0)),
    (0, (2, 0, 0), 1, (-1, -1)), (1, (1, 1, 0), 0, (0, 0)),
    (1, (0, 0, 1), 0, (0, 0)), (2, (0, 0, 0), 0, (0, 0)),
    (0, (1, 0, 0), 0, (0, 0)), (2, (0, 1, 0), 0, (0, 0)),
    (1, (0, 1, 0), 0, (0, 0)), (1, (0, 1, 1), 0, (0, 0)),
    (3, (1, 0, 0), 0, (0, 0)), (3, (1, 1, 0), 0, (0, 0)),
    (11, (2, 0, 0), 1, (2, 6)), (4, (1, 0, 0), 0, (0, 0)),
    (0, (0, 0, 0), 0, (0, 0)), (6, (0, 1, 0), 0, (0, 0)),
    (0, (0, 0, 1), 0, (0, 0)), (2, (0, 1, 1), 0, (0, 0)),
    (7, (0, 0, 1), 0, (0, 0)), (2, (0, 0, 1), 0, (0, 0)),
    (0, (1, 1, 0), 0, (0, 0)), (6, (0, 0, 1), 0, (0, 0)),
    (10, (2, 0, 0), 1, (1, 5)), (6, (0, 0, 0), 0, (0, 0)),
    (3, (0, 0, 0), 0, (0, 0)), (11, (1, 0, 0), 0, (0, 0)),
    (4, (1, 1, 0), 0, (0, 0)), (3, (0, 1, 0), 0, (0, 0)),
    (0, (0, 1, 1), 0, (0, 0)), (4, (0, 0, 0), 0, (0, 0)),
    (5, (0, 1, 0), 0, (0, 0)), (0, (0, 1, 0), 0, (0, 0)),
    (7, (0, 1, 0), 0, (0, 0)), (11, (1, 1, 0), 0, (0, 0)),
    (7, (0, 0, 0), 0, (0, 0)), (10, (1, 0, 0), 0, (0, 0)),
    (12, (2, 0, 0), 1, (3, 7)), (6, (1, 0, 1), 0, (0, 0)),
    (7, (1, 0, 1), 0, (0, 0)), (4, (0, 0, 1), 0, (0, 0)),
    (3, (0, 0, 1), 0, (0, 0)), (3, (0, 1, 1), 0, (0, 0)),
    (4, (0, 1, 0), 0, (0, 0)), (6, (1, 0, 0), 0, (0, 0)),
    (11, (0, 0, 0), 0, (0, 0)), (8, (0, 0, 1), 0, (0, 0)),
    (5, (0, 0, 1), 0, (0, 0)), (14, (2, 0, 0), 1, (0, 9)),
    (5, (0, 0, 0), 0, (0, 0)), (12, (1, 0, 0), 0, (0, 0)),
    (10, (1, 1, 0), 0, (0, 0)), (4, (0, 1, 1), 0, (0, 0)),
    (12, (1, 1, 0), 0, (0, 0)), (7, (1, 0, 0), 0, (0, 0)),
    (11, (0, 1, 0), 0, (0, 0)), (10, (0, 0, 0), 0, (0, 0)),
    (13, (2, 0, 0), 1, (4, 8)), (10, (0, 0, 1), 0, (0, 0)),
    (11, (0, 0, 1), 0, (0, 0)), (9, (0, 1, 0), 0, (0, 0)),
    (8, (0, 1, 0), 0, (0, 0)), (6, (2, 0, 0), 1, (11, 15)),
    (8, (0, 0, 0), 0, (0, 0)), (9, (0, 0, 1), 0, (0, 0)),
    (14, (1, 0, 0), 0, (0, 0)), (5, (1, 0, 1), 0, (0, 0)),
    (16, (0, 1, 1), 0, (0, 0)), (8, (1, 0, 1), 0, (0, 0)),
    (5, (1, 0, 0), 0, (0, 0)), (12, (0, 0, 0), 0, (0, 0)),
    (7, (2, 0, 0), 1, (12, 16)), (12, (0, 1, 0), 0, (0, 0)),
    (10, (0, 1, 0), 0, (0, 0)), (9, (0, 0, 0), 0, (0, 0)),
    (13, (1, 0, 0), 0, (0, 0)), (16, (0, 0, 1), 0, (0, 0)),
    (15, (0, 1, 1), 0, (0, 0)), (15, (0, 1, 0), 0, (0, 0)),
    (16, (0, 1, 0), 0, (0, 0)), (14, (1, 1, 0), 0, (0, 0)),
    (13, (1, 1, 0), 0, (0, 0)), (5, (2, 0, 0), 1, (10, 19)),
    (8, (1, 0, 0), 0, (0, 0)), (14, (0, 0, 0), 0, (0, 0)),
    (9, (1, 0, 1), 0, (0, 0)), (14, (0, 0, 1), 0, (0, 0)),
    (17, (0, 0, 1), 0, (0, 0)), (12, (0, 0, 1), 0, (0, 0)),
    (16, (0, 0, 0), 0, (0, 0)), (17, (0, 1, 1), 0, (0, 0)),
    (15, (0, 0, 1), 0, (0, 0)), (16, (1, 0, 1), 0, (0, 0)),
    (9, (1, 0, 0), 0, (0, 0)), (15, (0, 0, 0), 0, (0, 0)),
    (13, (0, 0, 0), 0, (0, 0)), (8, (2, 0, 0), 1, (13, 17)),
    (13, (0, 1, 0), 0, (0, 0)), (17, (1, 0, 1), 0, (0, 0)),
    (19, (0, 1, 0), 0, (0, 0)), (14, (0, 1, 0), 0, (0, 0)),
    (19, (0, 1, 1), 0, (0, 0)), (17, (0, 1, 0), 0, (0, 0)),
    (13, (0, 0, 1), 0, (0, 0)), (17, (0, 0, 0), 0, (0, 0)),
    (16, (1, 0, 0), 0, (0, 0)), (9, (2, 0, 0), 1, (14, 18)),
    (15, (1, 0, 1), 0, (0, 0)), (15, (1, 0, 0), 0, (0, 0)),
    (18, (0, 1, 1), 0, (0, 0)), (18, (0, 0, 1), 0, (0, 0)),
    (19, (0, 0, 1), 0, (0, 0)), (17, (1, 0, 0), 0, (0, 0)),
    (19, (0, 0, 0), 0, (0, 0)), (18, (0, 1, 0), 0, (0, 0)),
    (18, (1, 0, 1), 0, (0, 0)), (19, (2, 0, 0), 1, (-1, -1)),
    (19, (1, 0, 0), 0, (0, 0)), (18, (0, 0, 0), 0, (0, 0)),
    (19, (1, 0, 1), 0, (0, 0)), (18, (1, 0, 0), 0, (0, 0)),
)

_VERTEX_SLOTS = ((2, 0, 0), (0, 2, 0), (0, 0, 2))


def _ijk_norm(v):
    m = min(v)
    return (v[0] - m, v[1] - m, v[2] - m)


def _ijk_rot60ccw(v):
    # h3lib _ijkRotate60ccw: i->ij, j->jk, k->ik (unit-vector images)
    i, j, k = v
    return _ijk_norm((i + k, i + j, j + k))


def validate_base_cell_data(slot_pos, cells, face_centers, pent_mask) -> None:
    """Geometric re-derivation of every vendored row (raises on any
    mismatch).  ``slot_pos(face, i, j, k)`` must be the unit 3D point of
    a res-0 lattice slot; ``cells`` the (122, 3) certified base-cell
    centers; ``face_centers`` the (20, 3) face centers; ``pent_mask``
    the certified 122-bool pentagon mask."""
    if len(BASE_CELL_DATA) != 122:
        raise AssertionError("BASE_CELL_DATA must have 122 rows")
    for b, (f, ijk, isp, cwo) in enumerate(BASE_CELL_DATA):
        p = slot_pos(f, *ijk)
        if float(np.dot(p, cells[b])) < 1 - 1e-9:
            raise AssertionError(
                f"base cell {b}: vendored home FaceIJK (face {f}, {ijk}) "
                f"does not project onto the derived cell center — "
                f"refusing to run with a mis-transcribed anchoring table")
        if bool(isp) != bool(pent_mask[b]):
            raise AssertionError(f"base cell {b}: pentagon flag mismatch")
        if isp and cwo != (-1, -1):
            dots = np.round(face_centers @ cells[b], 9)
            faces5 = {int(x) for x in np.where(dots == dots.max())[0]}
            if not set(cwo) <= faces5:
                raise AssertionError(
                    f"pentagon {b}: cwOffsetPent {cwo} not among its "
                    f"vertex faces {sorted(faces5)}")


def derive_face_neighbors(slot_pos):
    """h3lib ``faceNeighbors``, re-derived exactly from geometry.

    For each face and overage direction (IJ: k==0; KI: k>0, j==0;
    JK: k>0, j>0) the lattice map onto the adjacent face is the unique
    orientation-preserving isometry ``x -> ccw^n(x) + t`` sending the
    two shared icosahedron vertices of the fold to their slots on the
    neighbour face — integer-exact, no fitting tolerance.  Returns
    (face, rot, trans) int arrays shaped (20, 3[dir]) / (20, 3, 3);
    direction index 0=IJ, 1=KI, 2=JK.  The derived face-0 row is
    asserted against the published h3lib row ({4,(2,0,2),1} /
    {1,(2,2,0),5} / {5,(0,2,2),3}) as a conventions cross-check."""
    dir_edges = (((2, 0, 0), (0, 2, 0)),   # IJ
                 ((0, 0, 2), (2, 0, 0)),   # KI
                 ((0, 2, 0), (0, 0, 2)))   # JK
    fn_face = np.full((20, 3), -1, dtype=np.int64)
    fn_rot = np.full((20, 3), -1, dtype=np.int64)
    fn_trans = np.zeros((20, 3, 3), dtype=np.int64)

    def vert(f, s):
        return slot_pos(f, *s)

    for f in range(20):
        for d, (sa, sb) in enumerate(dir_edges):
            va, vb = vert(f, sa), vert(f, sb)
            g = None
            for gg in range(20):
                if gg == f:
                    continue
                if max(np.dot(vert(gg, s), va) for s in _VERTEX_SLOTS) \
                        > 1 - 1e-9 and \
                        max(np.dot(vert(gg, s), vb) for s in _VERTEX_SLOTS) \
                        > 1 - 1e-9:
                    g = gg
                    break
            if g is None:
                raise AssertionError(f"face {f} dir {d}: no neighbour face")
            ga = next(s for s in _VERTEX_SLOTS
                      if np.dot(vert(g, s), va) > 1 - 1e-9)
            gb = next(s for s in _VERTEX_SLOTS
                      if np.dot(vert(g, s), vb) > 1 - 1e-9)
            hits = []
            for n in range(6):
                ra, rb = sa, sb
                for _ in range(n):
                    ra, rb = _ijk_rot60ccw(ra), _ijk_rot60ccw(rb)
                t1 = _ijk_norm(tuple(ga[x] - ra[x] for x in range(3)))
                t2 = _ijk_norm(tuple(gb[x] - rb[x] for x in range(3)))
                if t1 == t2:
                    hits.append((n, t1))
            if len(hits) != 1:
                raise AssertionError(
                    f"face {f} dir {d}: fold isometry not unique: {hits}")
            fn_face[f, d] = g
            fn_rot[f, d] = hits[0][0]
            fn_trans[f, d] = hits[0][1]
    want0 = ((4, 1, (2, 0, 2)), (1, 5, (2, 2, 0)), (5, 3, (0, 2, 2)))
    for d, (wf, wn, wt) in enumerate(want0):
        if fn_face[0, d] != wf or fn_rot[0, d] != wn \
                or tuple(fn_trans[0, d]) != wt:
            raise AssertionError(
                "derived faceNeighbors row for face 0 does not match the "
                "published h3lib row — orientation conventions broken")
    return fn_face, fn_rot, fn_trans
