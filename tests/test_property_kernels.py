"""Hypothesis property tests for the numeric kernels: projections
(round-trip + conformality), H3 (round-trip + determinism), geokeys.
Pure-numpy — no Spark session needed."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geoparquet_io_spark.functions import crs as C
from geoparquet_io_spark.functions import h3_fine as hf
from geoparquet_io_spark.functions import projections as P

_lat = st.floats(min_value=-84.0, max_value=84.0, allow_nan=False)
_lng = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lat=_lat, lng=_lng, res=st.integers(min_value=1, max_value=15))
def test_h3_roundtrip_property(lat, lng, res):
    idx = hf.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    assert int(idx[0]) != 0
    clat, clng = hf.cell_to_latlng(idx)
    back = hf.latlng_to_cell(clat, clng, res)
    assert int(back[0]) == int(idx[0])


@settings(max_examples=200, deadline=None)
@given(lat=_lat, lng=_lng, res=st.integers(min_value=1, max_value=12))
def test_h3_scalar_equals_vector_property(lat, lng, res):
    vec = int(hf.latlng_to_cell(np.array([lat]), np.array([lng]), res)[0])
    assert hf.latlng_to_cell_scalar(lat, lng, res) == vec


@settings(max_examples=150, deadline=None)
@given(lat=st.floats(min_value=-80.0, max_value=80.0, allow_nan=False),
       lng=_lng,
       zone=st.integers(min_value=1, max_value=60))
def test_utm_roundtrip_property(lat, lng, zone):
    # confine to the zone's valid band (+-3 deg of its central meridian)
    cm = 6.0 * zone - 183.0
    lng = cm + (lng / 180.0) * 3.0
    code = 32600 + zone if lat >= 0 else 32700 + zone
    fwd = C.get_transformer("EPSG:4326", f"EPSG:{code}")
    inv = C.get_transformer(f"EPSG:{code}", "EPSG:4326")
    x, y = fwd(np.array([lng]), np.array([lat]))
    lo, la = inv(x, y)
    assert abs(float(lo[0]) - lng) < 1e-9
    assert abs(float(la[0]) - lat) < 1e-9


@settings(max_examples=100, deadline=None)
@given(lat=st.floats(min_value=49.5, max_value=60.5, allow_nan=False),
       lng=st.floats(min_value=-7.0, max_value=1.7, allow_nan=False))
def test_osgb_conformality_property(lat, lng):
    """TM is conformal: tiny east and north steps must map to
    near-orthogonal, near-equal-length grid vectors."""
    f_ell = P.AIRY1830[1]
    fwd = C.get_transformer("EPSG:4326", "EPSG:27700")
    # ~11 m steps: big enough that double-precision cancellation in the
    # 1e5-1e6 m projected coords stays ~1e-5 relative
    d = 1e-4
    x0, y0 = fwd(np.array([lng]), np.array([lat]))
    xe, ye = fwd(np.array([lng + d / math.cos(math.radians(lat))]),
                 np.array([lat]))
    xn, yn = fwd(np.array([lng]), np.array([lat + d]))
    ve = np.array([float(xe[0] - x0[0]), float(ye[0] - y0[0])])
    vn = np.array([float(xn[0] - x0[0]), float(yn[0] - y0[0])])
    ratio = np.linalg.norm(ve) / np.linalg.norm(vn)
    cosang = abs(np.dot(ve, vn)) / (np.linalg.norm(ve) * np.linalg.norm(vn))
    # equal ANGULAR steps produce arcs of N(lat) east vs M(lat) north on
    # an ellipsoid; conformal scale is isotropic on GROUND lengths, so
    # the grid ratio must equal N/M exactly
    e2 = 2 * f_ell - f_ell * f_ell
    s2 = math.sin(math.radians(lat)) ** 2
    nm = (1.0 - e2 * s2) / (1.0 - e2)  # N/M = prime-vertical / meridional
    assert abs(ratio - nm) < 3e-4
    assert cosang < 3e-4


@settings(max_examples=100, deadline=None)
@given(lat=st.floats(min_value=26.5, max_value=36.0, allow_nan=False),
       lng=st.floats(min_value=-105.5, max_value=-94.5, allow_nan=False))
def test_texas_lcc_conformality_property(lat, lng):
    f_ell = P.GRS80[1]
    fwd = C.get_transformer("EPSG:4326", "EPSG:32139")
    # ~11 m steps: big enough that double-precision cancellation in the
    # 1e5-1e6 m projected coords stays ~1e-5 relative
    d = 1e-4
    x0, y0 = fwd(np.array([lng]), np.array([lat]))
    xe, ye = fwd(np.array([lng + d / math.cos(math.radians(lat))]),
                 np.array([lat]))
    xn, yn = fwd(np.array([lng]), np.array([lat + d]))
    ve = np.array([float(xe[0] - x0[0]), float(ye[0] - y0[0])])
    vn = np.array([float(xn[0] - x0[0]), float(yn[0] - y0[0])])
    ratio = np.linalg.norm(ve) / np.linalg.norm(vn)
    cosang = abs(np.dot(ve, vn)) / (np.linalg.norm(ve) * np.linalg.norm(vn))
    # equal ANGULAR steps produce arcs of N(lat) east vs M(lat) north on
    # an ellipsoid; conformal scale is isotropic on GROUND lengths, so
    # the grid ratio must equal N/M exactly
    e2 = 2 * f_ell - f_ell * f_ell
    s2 = math.sin(math.radians(lat)) ** 2
    nm = (1.0 - e2 * s2) / (1.0 - e2)  # N/M = prime-vertical / meridional
    assert abs(ratio - nm) < 3e-4
    assert cosang < 3e-4


@settings(max_examples=150, deadline=None)
@given(lat=st.floats(min_value=45.9, max_value=47.8, allow_nan=False),
       lng=st.floats(min_value=6.0, max_value=10.4, allow_nan=False))
def test_swiss_krovak_domain_sanity(lat, lng):
    """LV95 coordinates of any Swiss point stay inside the national
    range (E 2.4-2.9M, N 1.0-1.4M) — catches datum/offset regressions."""
    fwd = C.get_transformer("EPSG:4326", "EPSG:2056")
    x, y = fwd(np.array([lng]), np.array([lat]))
    assert 2_400_000 < float(x[0]) < 2_900_000
    assert 1_000_000 < float(y[0]) < 1_400_000


@settings(max_examples=100, deadline=None)
@given(lat=_lat, lng=_lng)
def test_h3_parent_is_coarser_containing_region(lat, lng):
    """parent(res 9 -> res 5) center within a res-5 circumradius*2 of
    the point (truncation stays local)."""
    i9 = hf.latlng_to_cell(np.array([lat]), np.array([lng]), 9)
    p5 = hf.parent(i9, 5)
    plat, plng = hf.cell_to_latlng(p5)
    dlng = abs(float(plng[0]) - lng)
    if dlng > 180:
        return  # antimeridian wrap; skip plain-metric check
    d = math.radians(math.hypot(float(plat[0]) - lat,
                                dlng * math.cos(math.radians(lat))))
    assert d < 2.2 * 0.44 / 7 ** 2.5


# --------------------------------------------------------------------------
# convex hull / simplify / area (pure-kernel properties)
# --------------------------------------------------------------------------

@given(st.lists(
    st.tuples(st.floats(-1e3, 1e3, allow_nan=False),
              st.floats(-1e3, 1e3, allow_nan=False)),
    min_size=3, max_size=40))
def test_convex_hull_contains_all_points(pts):
    import numpy as np

    from geoparquet_io_spark.functions import wkb as W

    line = W.encode_linestring(np.array(pts, dtype="f8"))
    hull = W.parse(W.convex_hull(line))
    if hull.gtype != W.POLYGON:
        return   # collinear/degenerate input
    ring = hull.parts[0]
    # every input point lies inside or on the hull: all cross products
    # against each CCW edge must be >= -eps
    scale = max(1.0, float(np.abs(ring).max())) ** 2
    for px, py in pts:
        for i in range(len(ring) - 1):
            ax, ay = ring[i]
            bx, by = ring[i + 1]
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            assert cross >= -1e-9 * scale


@given(st.lists(
    st.tuples(st.floats(-100, 100, allow_nan=False),
              st.floats(-100, 100, allow_nan=False)),
    min_size=2, max_size=30),
    st.floats(0.0, 10.0, allow_nan=False))
def test_simplify_keeps_subset_and_endpoints(pts, tol):
    import numpy as np

    from geoparquet_io_spark.functions import wkb as W

    arr = np.array(pts, dtype="f8")
    out = W.parse(W.simplify(W.encode_linestring(arr), tol)).parts[0]
    src = {tuple(p) for p in arr}
    assert all(tuple(p) in src for p in out)           # vertices are a subset
    assert tuple(out[0]) == tuple(arr[0])              # endpoints preserved
    assert tuple(out[-1]) == tuple(arr[-1])
    assert 2 <= len(out) <= len(arr)


def test_with_hilbert_key_matches_numpy_kernel(spark):
    """The native bit-parallel Hilbert expressions (with_hilbert_key)
    must be bit-identical to the numpy loop kernel — random coverage +
    grid corners + NaN/null handling."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from geoparquet_io_spark.functions.geom import with_hilbert_key
    from geoparquet_io_spark.functions.hilbert import hilbert_key

    rng = np.random.RandomState(42)
    n = 20000
    xs = rng.uniform(-170, 170, n)
    ys = rng.uniform(-80, 80, n)
    xs[:4] = [-170.0, 170.0, -170.0, 170.0]     # exact corners
    ys[:4] = [-80.0, -80.0, 80.0, 80.0]
    xs[5::911] = np.nan
    bounds = (-170.0, -80.0, 170.0, 80.0)
    df = spark.createDataFrame(
        pd.DataFrame({"i": np.arange(n), "x": xs, "y": ys}))
    out = with_hilbert_key(df, F.col("x"), F.col("y"), bounds, "k")
    got = {r["i"]: r["k"] for r in out.select("i", "k").collect()}
    exp = hilbert_key(np.nan_to_num(xs), np.nan_to_num(ys), *bounds)
    assert all(got[i] == int(exp[i]) for i in range(n))
    # stays native: no Python eval anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # temp columns are cleaned up
    assert out.columns == ["i", "x", "y", "k"]


def test_st_box_and_buffer_null_inputs_yield_null(spark):
    """Spark delivers NULL doubles to pandas UDFs as NaN; the old
    `is None` masks never fired and emitted NaN-coordinate polygons."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.functions import geom as G

    df = spark.createDataFrame(
        [(1, 1.0, 2.0, 3.0, 4.0), (2, None, 2.0, 3.0, 4.0)],
        "id int, xmin double, ymin double, xmax double, ymax double")
    rows = {r["id"]: r["b"] for r in df.select(
        "id", G.st_box("xmin", "ymin", "xmax", "ymax").alias("b")).collect()}
    assert rows[1] is not None
    assert rows[2] is None

    rows = {r["id"]: r["b"] for r in df.select(
        "id", G.st_buffer_point(F.col("xmin"), F.col("ymin"),
                                F.col("xmax")).alias("b")).collect()}
    assert rows[1] is not None
    assert rows[2] is None
    # NULL radius column too
    df2 = spark.createDataFrame([(1.0, 1.0, None)],
                                "x double, y double, r double")
    assert df2.select(G.st_buffer_point(
        F.col("x"), F.col("y"), F.col("r")).alias("b")).first()["b"] is None


def test_with_hilbert_key_preserves_conflicting_columns(spark):
    """Pre-existing __hb_* columns must survive key computation (the
    temp prefix is rotated, not clobbered)."""
    from pyspark.sql import functions as F

    from geoparquet_io_spark.functions.geom import with_hilbert_key

    df = spark.createDataFrame(
        [(1.0, 2.0, "keepme")], "x double, y double, __hb_x string")
    out = with_hilbert_key(df, F.col("x"), F.col("y"),
                           (0.0, 0.0, 10.0, 10.0), "k")
    assert "__hb_x" in out.columns
    row = out.first()
    assert row["__hb_x"] == "keepme"
    assert row["k"] is not None


# --- r9: boundary properties for the r8 scale caps ---------------------------

def _pair_components(pairs, all_ids):
    """Union-find components over (id_a, id_b) rows -> frozenset of
    frozensets (singletons included)."""
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        parent[find(r["id_a"])] = find(r["id_b"])
    comps = {}
    for i in all_ids:
        comps.setdefault(find(i), set()).add(i)
    return frozenset(frozenset(c) for c in comps.values())


def test_simhash_cap_components_equal_literal_across_seeds(spark):
    """Seeded adversarial-corpus property (r8 verdict #6): connected
    components of the CAPPED candidate-pair graph must equal the
    literal max_bucket_size=None graph's components — the guarantee the
    signature-granular hot path (hamming-0 chains + min-id
    representative pairs) claims.  Corpora mix identical boilerplate
    masses (hot buckets), perturbed near-dups (cross-signature edges
    inside hot buckets — the r8-review recall-collapse shape), and
    diverse fillers, with ids assigned in an interleaved order so
    same-signature members are never id-adjacent."""
    import random

    from geoparquet_io_spark.operators.dedup import simhash_candidate_pairs

    for seed in (1, 7, 23):
        rng = random.Random(seed)
        texts = []
        for t in range(rng.randint(2, 4)):           # boilerplate masses
            base = f"mass {t} boilerplate body " + "lorem ipsum " * 4
            for _ in range(rng.randint(8, 20)):
                texts.append(base)
            for _ in range(rng.randint(2, 5)):       # near-dup perturbations
                texts.append(base + " tail" + str(rng.randint(0, 1)))
        for i in range(rng.randint(20, 40)):         # diverse fillers
            texts.append(f"filler {seed}-{i} " + " ".join(
                str(rng.randint(0, 999)) for _ in range(8)))
        rng.shuffle(texts)
        # interleaved, gappy ids: chain order never matches mass order
        rows = [(i * 37 + (i % 3) * 1000, s) for i, s in enumerate(texts)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        ids = [r[0] for r in rows]
        literal = simhash_candidate_pairs(
            df, "doc_id", max_bucket_size=None).collect()
        capped = simhash_candidate_pairs(
            df, "doc_id", max_bucket_size=4).collect()
        assert _pair_components(capped, ids) == \
            _pair_components(literal, ids), f"seed {seed}"
        # and the capped pair count is never above the literal one
        assert len(capped) <= len(literal)


def test_simhash_default_cap_exact_boundary_512_513(spark):
    """The default max_bucket_size=512 at its literal boundary: a
    512-member identical mass stays on the small-bucket all-pairs path
    (m(m-1)/2 pairs), 513 flips to the hot path (m-1 chain edges) —
    off-by-one here either reopens the quadratic or drops a bucket."""
    from geoparquet_io_spark.operators.dedup import simhash_candidate_pairs

    text = "identical boilerplate mass body text for the cap boundary"
    at_cap = spark.createDataFrame(
        [(i, text) for i in range(512)], ["doc_id", "text"])
    assert simhash_candidate_pairs(at_cap, "doc_id").count() \
        == 512 * 511 // 2
    past_cap = spark.createDataFrame(
        [(i, text) for i in range(513)], ["doc_id", "text"])
    assert simhash_candidate_pairs(past_cap, "doc_id").count() == 512


def test_brute_topk_invariant_to_score_cells(spark):
    """The r8 chunking knob must be a pure performance parameter: for a
    fixed corpus the emitted top-k is IDENTICAL at every score_cells
    value — including the 64-row floor, an off-boundary prime, a value
    that makes chunks exactly divide the partition, and the default.
    Quantized embeddings (round_digits=1) put ties on every chunk
    boundary, the adversarial case for the running-threshold prune."""
    import numpy as np
    from pyspark.sql import functions as F

    from geoparquet_io_spark.operators import similarity as S

    rng = np.random.default_rng(9)
    n, dim, k = 240, 3, 4
    vecs = rng.integers(-2, 3, size=(n, dim)).astype(float)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>").repartition(2)
    q = df.filter(F.col("vec_id") % 31 == 0)
    n_q = q.count()
    results = []
    # 64 = floor; 101 = prime (ragged chunks); n_q*120 = chunks divide
    # the 120-row partitions exactly; default = one chunk per task
    for cells in (64, 101, n_q * 120, S._SCORE_CELLS):
        got = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
            for r in S.brute_force_topk(df, q, k=k, round_digits=1,
                                        dim=dim,
                                        score_cells=cells).collect())
        results.append((cells, got))
    base = results[0][1]
    assert len(base) == n_q * k
    for cells, got in results[1:]:
        assert got == base, f"score_cells={cells} diverged"


# --- r10: generative NaN/NULL kernel-contract sweep ---------------------------
# The r9 round's biggest theme — NaN cells -> NULL fields, NaN gates in
# quadkey/morton/geohash, NaN-aware sort envelopes, footer bounds that
# survive NULL geometries — was pinned by example-based regressions.
# This sweep drives RANDOM mixes of NULL / NaN / half-NaN / EMPTY /
# valid geometries through the full extract -> add_bbox -> add_quadkey
# -> hilbert-sort -> write pipeline and asserts the contract globally:
# no NaN ever reaches a key, a bound, a covering cell, or a footer.

def _dirty_geometry_table(spark, seed: int, n: int = 120):
    import math

    from geoparquet_io_spark.functions import wkt as WT
    from geoparquet_io_spark.functions import wkb as W
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

    rng = np.random.default_rng(seed)
    rows, kinds = [], []
    for i in range(n):
        kind = int(rng.integers(0, 8))
        lon = float(rng.uniform(-179.0, 179.0))
        lat = float(rng.uniform(-85.0, 85.0))
        if kind == 0:
            g = None
        elif kind == 1:
            g = W.encode_point(math.nan, math.nan)
        elif kind == 2:
            g = W.encode_point(lon, math.nan)       # half-NaN
        elif kind == 3:
            g = W.encode_point(math.nan, lat)
        elif kind == 4:
            g = WT.from_wkt("POINT EMPTY")
        elif kind == 5:
            g = WT.from_wkt("POLYGON EMPTY")
        else:
            g = W.encode_point(lon, lat)            # valid (2 kinds' weight)
        rows.append((i, g))
        kinds.append(kind)
    df = spark.createDataFrame(rows, "id long, geometry binary")
    geo = GeoMeta(primary_column="geometry",
                  columns={"geometry": GeoColumnMeta(crs="OGC:CRS84")})
    valid_ids = {i for i, k in zip(range(n), kinds) if k >= 6}
    return GeoTable(df, geo), valid_ids


def test_dirty_geometry_pipeline_never_leaks_nan(spark, tmp_path):
    import math

    from pyspark.sql import functions as F

    from geoparquet_io_spark.sources import geoparquet as GP

    for seed in (0, 1, 2):
        gt, valid_ids = _dirty_geometry_table(spark, seed)
        total = gt.df.count()
        # extract (bbox slow path over the dirty geometries) must keep
        # every valid row and never crash on the dirty ones
        ex = gt.extract(bbox=(-180.0, -90.0, 180.0, 90.0))
        kept = {r["id"] for r in ex.df.select("id").collect()}
        assert valid_ids <= kept
        # the exact WKT geometry filter must also survive dirty rows:
        # every valid point is inside the global polygon, every dirty
        # row is droppable but must never crash the predicate
        gx = gt.extract(geometry="POLYGON((-180 -90, 180 -90, 180 90, "
                                 "-180 90, -180 -90))")
        kept_g = {r["id"] for r in gx.df.select("id").collect()}
        assert valid_ids <= kept_g
        # add_bbox: covering struct fields are NULL-or-finite, never NaN
        wb = gt.add_bbox()
        bb = wb.df.select(
            "id",
            F.col("bbox.xmin").alias("x0"), F.col("bbox.ymin").alias("y0"),
            F.col("bbox.xmax").alias("x1"), F.col("bbox.ymax").alias("y1"),
        ).collect()
        for r in bb:
            for f in ("x0", "y0", "x1", "y1"):
                v = r[f]
                assert v is None or math.isfinite(v), (seed, r["id"], f, v)
            if r["id"] in valid_ids:
                assert r["x0"] is not None
        # add_quadkey: NULL for every dirty row, non-NULL for every
        # valid row, and never a NaN-fabricated constant key
        qk = wb.add_quadkey(zoom=6)
        for r in qk.df.select("id", "quadkey").collect():
            if r["id"] in valid_ids:
                assert r["quadkey"] is not None
            else:
                assert r["quadkey"] is None, (seed, r["id"], r["quadkey"])
        # bounds: finite, never NaN, and exactly the valid rows' envelope
        x0, y0, x1, y1 = qk.bounds()
        for v in (x0, y0, x1, y1):
            assert v is not None and math.isfinite(v), (seed, v)
        # hilbert sort: row-preserving (dirty rows must not uncluster or
        # vanish), and the key column is not leaked
        hs = qk.sort_hilbert()
        assert hs.df.count() == total
        # write: footer bbox finite; roundtrip preserves the valid rows
        out = str(tmp_path / f"dirty_{seed}.parquet")
        hs.write(out)
        geo = GP.read_footer_geo(out)
        fb = geo.primary.bbox
        assert fb is not None
        assert all(math.isfinite(v) for v in fb), (seed, fb)
        assert fb[0] <= x0 and fb[2] >= x1 and fb[1] <= y0 and fb[3] >= y1
        back = GP.read(spark, out)
        assert back.df.count() == total
        got_valid = {r["id"] for r in back.df
                     .filter(F.col("quadkey").isNotNull())
                     .select("id").collect()}
        assert got_valid == valid_ids
