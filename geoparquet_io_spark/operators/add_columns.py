"""Computed-column operators (reference section "add", SURVEY.md 2.9).

add_bbox            -> core/add_bbox_column.py:24-139
add_quadkey         -> core/add_quadkey_column.py (CRS gate :78-130)
add_h3              -> core/add_h3_column.py:57-84  (import-try h3)
add_kdtree          -> core/add_kdtree_column.py:61-207 (2-phase sampled)
reproject           -> core/reproject.py:94-160
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geoparquet_io_spark.functions import crs as _crs
from geoparquet_io_spark.functions import geom as G
from geoparquet_io_spark.functions import quadkey as _qk


def add_bbox(df: DataFrame, geometry_column: str, bbox_column: str = "bbox",
             force: bool = False) -> DataFrame:
    """Per-row bbox struct (reference: core/add_bbox_column.py:24-31,122-139)."""
    if geometry_column is None:
        raise ValueError(
            "add_bbox requires a geometry column; this table has none "
            "(read a GeoParquet file, or build one with st_point / st_box)"
        )
    if bbox_column in df.columns:
        if not force:
            raise ValueError(
                f"column {bbox_column!r} already exists (use force=True to replace)"
            )
        df = df.drop(bbox_column)
    env = G.st_envelope_struct(F.col(geometry_column))
    return df.withColumn(bbox_column, env)


def _centroid_lonlat(df: DataFrame, geometry_column: str | None,
                     bbox_column: str | None) -> tuple[Column, Column]:
    """Point for cell indexing: bbox midpoint if covering column exists,
    else geometry centroid (reference: core/add_quadkey_column.py:171-174)."""
    if bbox_column and bbox_column in df.columns:
        b = F.col(bbox_column)
        return (b["xmin"] + b["xmax"]) / 2, (b["ymin"] + b["ymax"]) / 2
    if geometry_column is None:
        raise ValueError("need geometry or bbox column")
    c = G.st_centroid_xy(F.col(geometry_column))
    return c["x"], c["y"]


def _require_geographic(crs, op: str) -> None:
    """Hard error on projected CRS (reference: core/add_quadkey_column.py:118-127)."""
    if crs is not None and not _crs.is_geographic(crs):
        raise ValueError(
            f"{op} requires geographic coordinates (lat/lon); file CRS is "
            f"{_crs.normalize_crs(crs)!r} — reproject to EPSG:4326 first"
        )


def add_quadkey(df: DataFrame, geometry_column: str | None = None,
                bbox_column: str | None = None, zoom: int = 13,
                column: str = "quadkey", crs=None) -> DataFrame:
    _require_geographic(crs, "add_quadkey")
    lon, lat = _centroid_lonlat(df, geometry_column, bbox_column)
    return df.withColumn(column, _qk.quadkey(lon, lat, zoom))


def add_h3(df: DataFrame, geometry_column: str | None = None,
           bbox_column: str | None = None, resolution: int = 8,
           column: str = "h3", crs=None) -> DataFrame:
    """H3 cell id of the centroid (reference: core/add_h3_column.py:57-84).

    Resolution ladder without the ``h3`` wheel:
    - ``h3`` importable -> true cells at any resolution (preferred: the
      compiled library is faster and canonical on pentagons);
    - resolution 0     -> true H3 base cells from the derivation-validated
      kernel in functions/h3.py (H3-compatible ids like
      '8029fffffffffff', exchangeable with other H3 tooling);
    - resolution 1-15  -> the full aperture-7 kernel in
      functions/h3_fine.py: published-vector-validated H3 indexes
      (bit-exact vs h3lib on vector-validated faces; exact H3 cell
      geometry everywhere; see that module's docstring for the pentagon
      label caveat).
    """
    if not (0 <= resolution <= 15):
        raise ValueError(f"h3 resolution must be in [0,15], got {resolution}")
    _require_geographic(crs, "add_h3")
    lon, lat = _centroid_lonlat(df, geometry_column, bbox_column)
    try:
        import h3  # noqa: F401
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(__import__("pyspark.sql.types", fromlist=["StringType"]).StringType())
        def _h3(lats: "pd.Series", lons: "pd.Series") -> "pd.Series":
            import h3 as _h3mod

            # pd.isna, not `is None`: Spark hands null doubles to
            # pandas UDFs as NaN, and latlng_to_cell(nan, nan) raises
            return pd.Series(
                [
                    None if (pd.isna(la) or pd.isna(lo))
                    else _h3mod.latlng_to_cell(float(la), float(lo), resolution)
                    for la, lo in zip(lats, lons)
                ]
            )

        return df.withColumn(column, _h3(lat, lon))
    except ImportError:
        if resolution == 0:
            import pandas as pd
            from pyspark.sql.functions import pandas_udf
            from pyspark.sql.types import StringType

            # no hints: future-annotations stringification breaks inference
            @pandas_udf(StringType())
            def _h3_res0(lats, lons):
                import numpy as np

                from geoparquet_io_spark.functions import h3 as _hk

                la = lats.to_numpy(dtype=np.float64, na_value=np.nan)
                lo = lons.to_numpy(dtype=np.float64, na_value=np.nan)
                ok = ~(np.isnan(la) | np.isnan(lo))
                out = np.full(len(la), None, dtype=object)
                if ok.any():
                    out[ok] = _hk.latlng_to_res0_string(la[ok], lo[ok])
                return pd.Series(out)

            return df.withColumn(column, _h3_res0(lat, lon))
        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        # no hints: future-annotations stringification breaks inference
        @pandas_udf(StringType())
        def _h3_fine(lats, lons):
            import numpy as np
            import pandas as pd

            from geoparquet_io_spark.functions import h3_fine as _hk

            la = lats.to_numpy(dtype=np.float64, na_value=np.nan)
            lo = lons.to_numpy(dtype=np.float64, na_value=np.nan)
            ok = ~(np.isnan(la) | np.isnan(lo))
            out = np.full(len(la), None, dtype=object)
            if ok.any():
                out[ok] = _hk.latlng_to_cell_string(la[ok], lo[ok], resolution)
            return pd.Series(out)

        return df.withColumn(column, _h3_fine(lat, lon))


def add_kdtree(
    df: DataFrame,
    geometry_column: str | None = None,
    bbox_column: str | None = None,
    x_column: str | None = None,
    y_column: str | None = None,
    iterations: int | None = 4,
    column: str = "kdtree_cell",
    sample_rows: int = 100_000,
    exact: bool = False,
    target_rows_per_cell: int = 100_000,
) -> DataFrame:
    """Balanced KD-tree cell ids as a binary string of length ``iterations``.

    Two-phase like the reference (core/add_kdtree_column.py:61-207):
    (1) learn split boundaries on a sample with per-cell medians,
    (2) apply the boundary tree to the full data in one pass.
    Phase 2 is a nested native CASE cascade — no UDF, no extra shuffle.
    At 100 TB the sample is a tiny fraction and phase 2 is map-only.
    """
    if x_column and y_column:
        x, y = F.col(x_column), F.col(y_column)
    else:
        x, y = _centroid_lonlat(df, geometry_column, bbox_column)
    work = df.withColumn("__kd_x", x).withColumn("__kd_y", y)

    # phase 1: boundaries from sample (exact median per cell at each level)
    total = work.count()
    if iterations is None:
        # auto: halvings until cells hold ~target_rows_per_cell
        # (reference: core/add_kdtree_column.py:36-58)
        import math

        iterations = max(1, math.ceil(math.log2(max(total / target_rows_per_cell, 2))))
    if not (1 <= iterations <= 20):
        raise ValueError("iterations must be in [1,20]")
    if exact or total <= sample_rows:
        sample = work.select("__kd_x", "__kd_y")
        bounded = total <= sample_rows
    else:
        sample = work.select("__kd_x", "__kd_y").sample(
            fraction=min(1.0, sample_rows / max(total, 1)), seed=42
        )
        bounded = True
    boundaries: dict[str, float] = {}
    if bounded:
        # the median input is bounded (<= ~sample_rows rows x 2 doubles):
        # ONE collect, then the whole boundary recursion runs driver-side
        # in numpy — phase 1 collapses from (1 + iterations) Spark jobs
        # (each a groupBy-percentile action over the pinned sample) to a
        # single bounded job.  At 100 TB the sample is still the same
        # size, so this stays driver-safe.  Semantics replicate the
        # distributed loop bit-for-bit: NULLs are excluded from the
        # median and split to "1" (NULL < m is NULL -> otherwise branch),
        # NaN sorts above every value (Spark's double ordering) so it
        # participates in the median as the largest element and splits
        # to "1" (NaN < m is false), and medians interpolate linearly
        # like percentile(dim, 0.5).
        import numpy as np

        rows = sample.collect()
        n_rows = len(rows)
        vals = np.empty((n_rows, 2)); nulls = np.zeros((n_rows, 2), bool)
        for i, r in enumerate(rows):
            for j in (0, 1):
                v = r[j]
                if v is None:
                    vals[i, j] = np.nan; nulls[i, j] = True
                else:
                    vals[i, j] = v

        def _interp_median(a: "np.ndarray"):
            if a.size == 0:
                return None
            a = np.sort(a)            # NaN sorts last, like Spark
            pos = (a.size - 1) * 0.5
            lo = int(pos)
            if pos == lo:
                return float(a[lo])
            return float(a[lo] + (a[lo + 1] - a[lo]) * (pos - lo))

        cells = {"": np.arange(n_rows)}
        for level in range(iterations):
            j = 0 if level % 2 == 0 else 1
            meds = {}
            for prefix, idx in cells.items():
                m = _interp_median(vals[idx[~nulls[idx, j]], j])
                if m is not None:     # all-null cells carry no median
                    meds[prefix] = m
            if not meds:
                break                  # empty / all-null input: no tree
            boundaries.update(meds)
            nxt = {}
            for prefix, idx in cells.items():
                m = meds.get(prefix)
                if m is None:          # no median: NULL lookup -> bit "1"
                    nxt[prefix + "1"] = idx
                    continue
                if np.isnan(m):
                    # Spark orders NaN above every double, so in phase 2
                    # `x < lit(NaN)` is TRUE for every finite x (-> "0")
                    # and false/NULL for NaN/NULL rows (-> "1").  Plain
                    # numpy `vals < NaN` is all-False — the one place
                    # IEEE and Spark comparison semantics diverge.
                    is_left = ~np.isnan(vals[idx, j])
                else:
                    is_left = vals[idx, j] < m  # NaN/NULL-coded: false
                nxt[prefix + "0"] = idx[is_left]
                nxt[prefix + "1"] = idx[~is_left]
            cells = {p: ix for p, ix in nxt.items() if ix.size}
    else:
        # exact=True beyond the driver bound: per-level DISTRIBUTED exact
        # medians.  Pin the input: each per-level median collect below is
        # an ACTION, and without this every iteration re-scanned the full
        # input and re-ran the centroid UDF — the dominant cost at scale.
        sample = sample.withColumn("__cell", F.lit("")) \
            .localCheckpoint(eager=False)
        for level in range(iterations):
            dim = "__kd_x" if level % 2 == 0 else "__kd_y"
            med = [r for r in (
                sample.groupBy("__cell")
                .agg(F.expr(f"percentile({dim}, 0.5)").alias("m"))
                .collect()
            ) if r["m"] is not None]   # all-null cells carry no median
            if not med:
                break                  # empty / all-null input: no tree
            for r in med:
                boundaries[r["__cell"]] = float(r["m"])
            mcol = F.create_map(
                *[x for r in med
                  for x in (F.lit(r["__cell"]), F.lit(float(r["m"])))]
            )
            sample = sample.withColumn(
                "__cell",
                F.concat(
                    F.col("__cell"),
                    F.when(F.col(dim) < mcol[F.col("__cell")],
                           F.lit("0")).otherwise(F.lit("1")),
                ),
            )

    # phase 2: apply boundary tree as a chained native expression
    if not boundaries:
        # empty or all-null-coordinate input: one root cell
        return work.withColumn(column, F.lit("")).drop("__kd_x", "__kd_y")
    cell = F.lit("")
    for level in range(iterations):
        dim = F.col("__kd_x") if level % 2 == 0 else F.col("__kd_y")
        prefixes = [p for p in boundaries if len(p) == level]
        if not prefixes:
            break                  # sampling stopped deeper splits
        expr = None
        for p in sorted(prefixes):
            branch = F.when(dim < F.lit(boundaries[p]), F.lit("0")).otherwise(F.lit("1"))
            if level == 0:
                # single root prefix "" — emitting `'' == ''` would be a
                # trivially-true literal compare (Spark WARNs); no branch
                # dispatch is needed at the root
                expr = branch
            else:
                cond = cell == F.lit(p)
                expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
        if level > 0:
            # full-data rows whose prefix never appeared in the SAMPLE
            # need a deterministic fallback: without an otherwise() the
            # CASE yields NULL and concat nulls the whole cell id
            expr = expr.otherwise(F.lit("0"))
        cell = F.concat(cell, expr)
    out = work.withColumn(column, cell).drop("__kd_x", "__kd_y")
    return out


def reproject(df: DataFrame, geometry_column: str, src, dst,
              transformer=None) -> DataFrame:
    """ST_Transform the geometry column (reference: core/reproject.py:94-160).
    CRS metadata update happens in the GeoTable wrapper."""
    if geometry_column is None:
        raise ValueError(
            "reproject requires a geometry column; this table has none "
            "(read a GeoParquet file, or build one with st_point / st_box)"
        )
    return df.withColumn(
        geometry_column, G.st_transform(F.col(geometry_column), src, dst, transformer)
    )


def h3_polyfill(
    df: DataFrame,
    res: int,
    geometry_column: str = "geometry",
    cell_column: str = "h3_cells",
    max_cells: int = 200_000,
) -> DataFrame:
    """Polygon -> covering H3 cells at ``res`` (canonical polyfill
    semantics: a cell belongs to the polygon iff its CENTER is inside),
    using the first-principles kernel (functions/h3_fine.py).

    Algorithm (self-calibrating — no tabulated cell-size constants):
    a coarse probe of the polygon's bbox measures the local
    center-to-center cell spacing empirically, then a sample grid at
    0.35x that spacing (finer than any cell's incircle, pentagon
    distortion included) guarantees every candidate cell shows up;
    candidates' exact centers (kernel inverse) are point-in-polygon
    tested.  Map-only per polygon; ``max_cells`` guards the explosion
    the way the partition writers' preflights do.

    Output: one array<long> column of sorted cell ids per row.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from geoparquet_io_spark.functions import wkb as _wkb
    from geoparquet_io_spark.functions.h3_fine import (cell_to_latlng,
                                                       latlng_to_cell)
    from geoparquet_io_spark.operators.raster import _points_in_polygon_bulk

    if not 1 <= res <= 15:
        raise ValueError(f"res must be in [1, 15], got {res}")

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(cell_column, T.ArrayType(T.LongType()), True)]
    )
    idx = df.columns.index(geometry_column)

    def fill_one(buf: bytes) -> list[int]:
        geom = _wkb.parse(buf)

        # recurse to LEAF polygons: a GEOMETRYCOLLECTION child can
        # itself be a MULTIPOLYGON whose .parts is empty (its polygons
        # live one level deeper) — the flat children list made the
        # point-in-polygon test all-False and the row silently got an
        # empty cell array
        def _leaf_polys(g):
            if g.children:
                for c in g.children:
                    yield from _leaf_polys(c)
            elif g.gtype == _wkb.POLYGON:
                yield g

        polys = list(_leaf_polys(geom)) or [geom]
        xmin, ymin, xmax, ymax = _wkb.envelope(buf)
        # 1) probe: measure local cell spacing empirically
        gx = np.linspace(xmin, xmax, 12)
        gy = np.linspace(ymin, ymax, 12)
        PX, PY = np.meshgrid(gx, gy)
        cells = np.unique(latlng_to_cell(PY.ravel(), PX.ravel(), res))
        clat, clng = cell_to_latlng(cells)
        if len(cells) > 1:
            # min pairwise center distance in degrees (lon scaled)
            co = np.cos(np.radians(np.clip(clat.mean(), -89.0, 89.0)))
            dx = (clng[:, None] - clng[None, :]) * co
            dy = clat[:, None] - clat[None, :]
            dist = np.sqrt(dx * dx + dy * dy)
            np.fill_diagonal(dist, np.inf)
            spacing = float(dist.min())
        else:
            # bbox smaller than one cell: spacing bounded by bbox size
            spacing = max(xmax - xmin, ymax - ymin, 1e-9) * 2.0
        s = spacing * 0.35
        margin = spacing * 1.5
        nx = int((xmax - xmin + 2 * margin) / s) + 2
        ny = int((ymax - ymin + 2 * margin) / s) + 2
        if nx * ny > 25 * max_cells:
            raise ValueError(
                f"polyfill at res {res} would sample {nx * ny} points "
                f"(> 25 * max_cells={max_cells}); lower res or raise "
                f"max_cells")
        sx = np.linspace(xmin - margin, xmax + margin, nx)
        sy = np.linspace(ymin - margin, ymax + margin, ny)
        SX, SY = np.meshgrid(sx, sy)
        cand = np.unique(latlng_to_cell(SY.ravel(), SX.ravel(), res))
        la, ln = cell_to_latlng(cand)
        inside = np.zeros(len(cand), dtype=bool)
        for p in polys:
            inside |= _points_in_polygon_bulk(ln, la, p)
        out = np.sort(cand[inside]).astype(np.int64)
        if len(out) > max_cells:
            raise ValueError(
                f"polyfill produced {len(out)} cells > max_cells")
        return [int(v) for v in out]

    def run(batches):
        for pdf in batches:
            vals = []
            for buf in pdf.iloc[:, idx]:
                vals.append(None if buf is None else fill_one(bytes(buf)))
            pdf[cell_column] = vals
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
