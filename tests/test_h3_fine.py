"""Full-resolution H3 kernel (functions/h3_fine.py): published-vector
bit-exactness, scalar/vector agreement, round-trip stability, partition
sanity, and the Spark operator integration."""

import math

import numpy as np
import pytest

from geoparquet_io_spark.functions import h3_fine as hf


def test_published_sf_vector_bit_exact():
    """The canonical h3-py README vector must reproduce bit-for-bit."""
    idx = hf.latlng_to_cell(
        np.array([37.7752702151959257]), np.array([-122.418307270836983]), 9)
    assert int(idx[0]) == 0x8928308280FFFFF
    assert hf.cell_to_string(idx)[0] == "8928308280fffff"


def test_published_sf_center_machine_exact():
    """cell_to_latlng of the published cell must match its published
    center to < 1e-9 degrees (ours agrees to ~1e-14)."""
    lat, lng = hf.cell_to_latlng(np.array([0x8928308280FFFFF], dtype=np.int64))
    assert abs(float(lat[0]) - 37.77670234943567) < 1e-9
    assert abs(float(lng[0]) - (-122.41845932318311)) < 1e-9


def test_res0_agrees_with_res0_kernel():
    """Base-cell bits at any res must equal the independently-derived
    res-0 kernel's assignment."""
    from geoparquet_io_spark.functions import h3 as r0

    rng = np.random.default_rng(5)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 3000)))
    lngs = rng.uniform(-180, 180, 3000)
    idx = hf.latlng_to_cell(lats, lngs, 7)
    bc_fine = ((idx >> 45) & 0x7F).astype(np.int64)
    bc_r0 = r0.latlng_to_res0_cell(lats, lngs)
    # the algebraic res-0 ancestor of a fine cell is a fractal Gosper
    # island, not the nearest-center hexagon — canonical H3 behaves the
    # same way (~30% of points sit in the boundary zigzag), so assert:
    # mostly equal, and every disagreement is a physically ADJACENT base
    # cell (never a far one)
    agree = (bc_fine == bc_r0).mean()
    assert agree > 0.6
    diff = bc_fine != bc_r0
    ca = hf._CELLS[bc_fine[diff]]
    cb = hf._CELLS[bc_r0[diff]]
    ang = np.arccos(np.clip(np.einsum("nd,nd->n", ca, cb), -1, 1))
    assert ang.max() < 2.2 * 0.38  # within ~one res-0 lattice spacing


def test_scalar_mirror_matches_vectorized():
    rng = np.random.default_rng(6)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 500)))
    lngs = rng.uniform(-180, 180, 500)
    for res in (1, 5, 9):
        vec = hf.latlng_to_cell(lats, lngs, res)
        for la, lo, v in zip(lats, lngs, vec):
            assert hf.latlng_to_cell_scalar(float(la), float(lo), res) == int(v)


def test_roundtrip_all_resolutions():
    """forward(inverse(idx)) == idx everywhere, pentagons included."""
    rng = np.random.default_rng(11)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 8000)))
    lngs = rng.uniform(-180, 180, 8000)
    for res in (1, 2, 5, 9, 15):
        idx = hf.latlng_to_cell(lats, lngs, res)
        assert (idx != 0).all()
        clat, clng = hf.cell_to_latlng(idx)
        idx2 = hf.latlng_to_cell(clat, clng, res)
        assert int((idx != idx2).sum()) == 0, f"roundtrip failed at res {res}"


def test_no_id_collisions():
    """No id may label two disjoint patches (the failure mode of a wrong
    pentagon glue): per-id point spread stays within cell size."""
    rng = np.random.default_rng(3)
    n = 200000
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lngs = rng.uniform(-180, 180, n)
    idx = hf.latlng_to_cell(lats, lngs, 3)
    cl = np.cos(np.radians(lats))
    P = np.stack([cl * np.cos(np.radians(lngs)),
                  cl * np.sin(np.radians(lngs)),
                  np.sin(np.radians(lats))], axis=-1)
    order = np.argsort(idx)
    si, sP = idx[order], P[order]
    uniq, starts = np.unique(si, return_index=True)
    ends = np.append(starts[1:], len(si))
    typ = 0.44 / 7 ** 1.5
    for a, b in zip(starts, ends):
        if b - a < 3:
            continue
        pts = sP[a:b]
        m = pts.mean(0)
        m /= np.linalg.norm(m)
        assert np.arccos(np.clip(pts @ m, -1, 1)).max() < 2.5 * typ


def test_pentagon_no_leading_k():
    """H3 invariant: indexes under pentagon base cells never lead with
    the deleted k digit."""
    rng = np.random.default_rng(7)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 30000)))
    lngs = rng.uniform(-180, 180, 30000)
    idx = hf.latlng_to_cell(lats, lngs, 6)
    bc = (idx >> 45) & 0x7F
    pent = hf._PENT[bc]
    lead = np.zeros(len(idx), dtype=np.int64)
    for r in range(1, 7):
        d = (idx >> (45 - 3 * r)) & 7
        lead = np.where(lead == 0, d, lead)
    assert int((pent & (lead == 1)).sum()) == 0


def test_parent_algebra_and_containment():
    rng = np.random.default_rng(9)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 5000)))
    lngs = rng.uniform(-180, 180, 5000)
    i9 = hf.latlng_to_cell(lats, lngs, 9)
    i8 = hf.latlng_to_cell(lats, lngs, 8)
    p = hf.parent(i9, 8)
    # digit-truncation parenthood holds for the majority; the remainder
    # are aperture-7 child-overhang points (both directions of the
    # boundary band — canonical H3 behaves identically); the hard
    # invariant is the bounded distance below
    rate = (p == i8).mean()
    assert rate > 0.55
    # and every parent is at most one cell away from the direct cell
    pl, pg = hf.cell_to_latlng(p)
    dl, dg = hf.cell_to_latlng(i8)
    d = np.hypot(pl - dl, (pg - dg) * np.cos(np.radians(pl)))
    # wrap-safe: ignore antimeridian rows in the distance check
    near = d[np.abs(pg - dg) < 180]
    assert np.quantile(near, 0.99) < 3 * math.degrees(0.44 / 7 ** 4)


def test_cell_center_is_inside_cell():
    """Center distance from the generating point stays below the max
    cell circumradius at that resolution."""
    rng = np.random.default_rng(13)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 5000)))
    lngs = rng.uniform(-180, 180, 5000)
    for res in (2, 6):
        idx = hf.latlng_to_cell(lats, lngs, res)
        clat, clng = hf.cell_to_latlng(idx)
        dlng = np.abs(lngs - clng)
        ok = dlng < 180  # skip antimeridian wrap rows in the plain metric
        d = np.radians(np.hypot(lats[ok] - clat[ok],
                                dlng[ok] * np.cos(np.radians(lats[ok]))))
        assert d.max() < 1.3 * 0.44 / 7 ** (res / 2)


def test_string_roundtrip():
    rng = np.random.default_rng(15)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 200)))
    lngs = rng.uniform(-180, 180, 200)
    idx = hf.latlng_to_cell(lats, lngs, 8)
    s = hf.cell_to_string(idx)
    assert (hf.string_to_cell(s) == idx).all()
    assert all(len(v) == 15 for v in s)


def test_add_h3_spark_res9(spark):
    """Spark operator: pandas-UDF path produces the kernel's ids."""
    from geoparquet_io_spark.operators.add_columns import add_h3
    from geoparquet_io_spark.queries import _events_points
    from tests.conftest import SF_SMOKE

    gt = _events_points(spark, SF_SMOKE)
    sub = gt.df.filter("event_id % 100 = 0")
    out = add_h3(sub, bbox_column="bbox", resolution=9)
    rows = out.select("event_id", "h3").collect()
    assert rows
    import pyspark.sql.functions as F

    pts = {r["event_id"]: (r["lat"], r["lon"]) for r in sub.select(
        "event_id",
        ((F.col("bbox")["ymin"] + F.col("bbox")["ymax"]) / 2).alias("lat"),
        ((F.col("bbox")["xmin"] + F.col("bbox")["xmax"]) / 2).alias("lon"),
    ).collect()}
    for r in rows:
        la, lo = pts[r["event_id"]]
        want = format(hf.latlng_to_cell_scalar(float(la), float(lo), 9), "x")
        assert r["h3"] == want


def test_canonical_pentagon_and_edge_cell_children():
    """Canonical-label regression anchors for the two base-cell classes
    whose ids depend on the vendored h3lib anchoring table
    (functions/h3_cells.py BASE_CELL_DATA): children of pentagon base
    cell 4 (the Norwegian Sea pentagon, home face 0) and of
    edge-anchored base cell 1 (faces 1|2, canonical home face 2) at
    res 8-9.  These ids are produced by the calibrated canonical
    pipeline (vendored home faces + cwOffsetPent + derived
    faceNeighbors) and pin the labeling against regressions."""
    vectors = [
        # (lat, lng, res, id) — pentagon base cell 4 children
        (65.000000, 10.736199, 8, 0x880800A2E1FFFFF),
        (65.000000, 10.736199, 9, 0x890800A2E0FFFFF),
        (64.450000, 10.936199, 8, 0x8808004E05FFFFF),
        (64.450000, 10.936199, 9, 0x8908004E62FFFFF),
        (64.800000, 10.036199, 8, 0x8808008A89FFFFF),
        (64.800000, 10.036199, 9, 0x8908008AC2FFFFF),
        # edge-anchored base cell 1 children (canonical home face 2)
        (79.420986, -107.129202, 8, 0x88020012C9FFFFF),
        (79.420986, -107.129202, 9, 0x89020012C93FFFF),
        (78.820986, -107.629202, 8, 0x8802006745FFFFF),
        (78.820986, -107.629202, 9, 0x890200676B3FFFF),
    ]
    for la, lo, res, want in vectors:
        got = int(hf.latlng_to_cell(np.array([la]), np.array([lo]), res)[0])
        assert got == want, f"({la}, {lo}, {res}): {got:#x} != {want:#x}"
        assert hf.latlng_to_cell_scalar(la, lo, res) == want
        # and the canonical inverse must land back inside the same cell
        clat, clng = hf.cell_to_latlng(np.array([want], dtype=np.int64))
        back = int(hf.latlng_to_cell(clat, clng, res)[0])
        assert back == want


def test_exhaustive_inverse_forward_res2():
    """EVERY res-2 cell of every base cell (pentagons and edge cells
    included) must round-trip inverse -> forward bit-exactly — full
    coverage of the pentagon deleted-subsequence and fold-overage
    machinery."""
    import itertools

    bcs, digs = [], []
    for bc in range(122):
        for d in itertools.product(range(7), repeat=2):
            if hf._PENT[bc] and next((x for x in d if x), 0) == 1:
                continue
            bcs.append(bc)
            digs.append(d)
    bcs = np.array(bcs, dtype=np.int64)
    digs = np.array(digs, dtype=np.int8)
    ids = (np.int64(1) << 59) | (np.int64(2) << 52) | (bcs << 45)
    for r in range(1, 16):
        if r <= 2:
            ids |= digs[:, r - 1].astype(np.int64) << (45 - 3 * r)
        else:
            ids |= np.int64(7) << (45 - 3 * r)
    la, lo = hf.cell_to_latlng(ids)
    back = hf.latlng_to_cell(la, lo, 2)
    assert int((back != ids).sum()) == 0


def test_vendored_base_cell_table_validates():
    """The import-time geometric validation of the vendored h3lib
    anchoring table must reject a corrupted row."""
    import pytest

    from geoparquet_io_spark.functions import h3_cells as bcd

    good = bcd.BASE_CELL_DATA
    corrupted = (((2,) + good[0][1:]),) + good[1:]  # wrong home face
    try:
        bcd.BASE_CELL_DATA = corrupted
        with pytest.raises(AssertionError, match="mis-transcribed"):
            bcd.validate_base_cell_data(
                hf._slot_pos, hf._CELLS, hf._C, hf._PENT)
    finally:
        bcd.BASE_CELL_DATA = good


# --- polyfill (operators/add_columns.py:h3_polyfill) -----------------------

def test_h3_polyfill_exactness_properties(spark):
    """Polyfill semantics pinned by two exhaustive properties:
    soundness (every returned cell's center is inside the polygon) and
    completeness (the cell of ANY interior point whose center is
    inside must be in the set) — together they define center-
    containment polyfill exactly."""
    import numpy as np

    from geoparquet_io_spark.functions import wkb as _wkb
    from geoparquet_io_spark.functions.h3_fine import (cell_to_latlng,
                                                       latlng_to_cell)
    from geoparquet_io_spark.operators.add_columns import h3_polyfill
    from geoparquet_io_spark.operators.raster import _points_in_polygon_bulk

    # lon/lat triangle over central Europe, res 5
    ring = np.array([[8.0, 47.0], [12.0, 47.5], [9.0, 50.0], [8.0, 47.0]])
    tri = _wkb.encode_polygon([ring])
    df = spark.createDataFrame([(1, bytearray(tri))], ["pid", "geometry"])
    cells = np.array(
        h3_polyfill(df, 5).collect()[0]["h3_cells"], dtype=np.uint64)
    assert len(cells) > 50

    poly = _wkb.parse(tri)
    la, ln = cell_to_latlng(cells)
    # soundness: every returned center inside
    assert _points_in_polygon_bulk(ln, la, poly).all()

    # completeness: random interior points -> their cells (when the
    # cell center is inside) are all present
    rng = np.random.default_rng(5)
    pts = []
    while len(pts) < 400:
        x = rng.uniform(8.0, 12.0, 1000)
        y = rng.uniform(47.0, 50.0, 1000)
        m = _points_in_polygon_bulk(x, y, poly)
        pts.extend(zip(x[m], y[m]))
    pts = np.array(pts[:400])
    pc = latlng_to_cell(pts[:, 1], pts[:, 0], 5)
    pla, pln = cell_to_latlng(np.unique(pc))
    center_inside = _points_in_polygon_bulk(pln, pla, poly)
    want = set(np.unique(pc)[center_inside].tolist())
    assert want <= set(cells.tolist())

    # refinement sanity: res 6 count ~ 7x res 5 count
    c6 = h3_polyfill(df, 6).collect()[0]["h3_cells"]
    assert 4.5 < len(c6) / len(cells) < 9.5
