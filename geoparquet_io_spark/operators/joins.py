"""Join operators (SURVEY.md 2.4).

add_admin_divisions -> spatial enrichment LEFT JOIN
  (reference: _build_spatial_join_query, core/add_admin_divisions_multi.py:72-108;
   extent pre-filter _add_extent_filter :111-150)

Scale design: admin tables are small (countries ~200 rows), so the right
side is extent-pruned, COLLECTED, and shipped in a ``mapInPandas`` closure
— the join is a map-only pass over the big side (bbox candidate prefilter
via vectorized numpy compares, then the exact intersects kernel), with
true LEFT semantics and zero shuffle.  Spark cannot express this plan
declaratively (python UDFs are banned in outer-join ON clauses), and a
broadcast-hash-join + post-filter loses unmatched rows; this is the same
"broadcast the dimension" strategy, one level lower.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoparquet_io_spark.functions import geom as G
from geoparquet_io_spark.functions import wkb as _wkb

# right side larger than this is routed to the shuffle-based grid join
# instead of the closure broadcast (the closure ships parsed geometries to
# every task — ~50k admin polygons is the most that stays cheap)
MAX_BROADCAST_ROWS = 50_000

# ... and a BYTE gate beside the row gate (r6 verdict): 50k rows of fat
# coastline polygons can be gigabytes of WKB while 500k points fit fine —
# row count alone mis-routes both ways.  128 MiB of WKB parses to roughly
# 2-4x that in python geometry objects per executor, the practical ceiling
# for "rides in a broadcast".
MAX_BROADCAST_BYTES = 128 * 2**20


def spatial_join(
    left: DataFrame,
    left_geometry: str,
    left_bbox: str | None,
    right: DataFrame,
    right_geometry: str | None,
    right_bbox: str | None,
    right_columns: list[str],
    how: str = "left",
    prune_right_by_extent: bool = True,
    broadcast_threshold: int = MAX_BROADCAST_ROWS,
    broadcast_bytes_threshold: int = MAX_BROADCAST_BYTES,
    grid_cell_size: float = 1.0,
    left_id: str | None = None,
) -> DataFrame:
    """bbox-prefiltered exact-intersects join.

    Right sides up to ``broadcast_threshold`` rows AND
    ``broadcast_bytes_threshold`` WKB bytes are broadcast via closure
    (map-only, zero shuffle — the admin-table case); right sides failing
    either gate auto-route to :func:`grid_spatial_join` (both sides
    shuffled once on a grid key — the big-big case), so the operator
    works at any right size or fatness.
    ``grid_cell_size`` is in COORDINATE UNITS (default 1.0 = ~1 degree for
    lon/lat data) — set it to a sensible cell size (e.g. 10_000 for
    meter-based projected CRS) when the routed path can trigger, or each
    geometry replicates to every tiny cell its envelope overlaps.
    ``left_id``: a naturally-unique left column; when provided, the
    routed LEFT join uses it directly instead of synthesizing ids (which
    requires materializing the left side once via localCheckpoint —
    avoid that at 100 TB by passing your key).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if right_geometry is None:
        raise ValueError("spatial_join needs a right geometry column")
    clash = [c for c in right_columns if c in left.columns]
    if clash:
        # a duplicate output name would make mapInPandas' schema and the
        # pandas batch disagree (the batch assignment overwrites the
        # left column) — fail loudly instead of corrupting data; the
        # grid-routed path would collide identically
        raise ValueError(
            f"right_columns {clash} already exist on the left side; "
            "rename or drop them before the spatial join")

    # bounded LENGTHS-ONLY probe decides the strategy: LIMIT threshold+1
    # stops the scan as soon as "too many rows" is known (a full count()
    # would pay a whole extra pass over a huge right side), and shipping
    # only F.length() means a right side of fat polygons is byte-gated
    # WITHOUT ever collecting gigabytes of WKB to the driver.  Routing on
    # row count alone mis-routed both ways (r6 verdict #4): 50k coastline
    # polygons overflow the closure while 500k points fit.
    # Trade-off: the small-side path now evaluates the right lineage
    # twice (probe job + payload collect) — the price of never shipping
    # an unbounded payload to the driver; callers with an expensive
    # right lineage should persist it before joining.
    probe = (right.select(
        F.coalesce(F.length(F.col(right_geometry)), F.lit(0)).alias("__sz"))
        .limit(broadcast_threshold + 1)
        .agg(F.count("*").alias("n"), F.sum("__sz").alias("b"))
        .collect()[0])
    if (probe["n"] > broadcast_threshold
            or (probe["b"] or 0) > broadcast_bytes_threshold):
        return _route_to_grid_join(
            left, left_geometry, left_bbox, right, right_geometry,
            right_columns, how, grid_cell_size, left_id,
            right_bbox=right_bbox,
        )
    # right side fits both gates: NOW collect the payload (the probe saw
    # every row, so this limit returns the complete set)
    r_local = (right.select(right_geometry, *right_columns)
               .limit(broadcast_threshold + 1).collect())

    # re-guard AFTER the collect: the probe and the payload are two
    # separate jobs, so a non-deterministic right lineage (.sample(),
    # rand()) or a source that grew in between can hand this collect
    # MORE than the probe saw — proceeding would silently truncate the
    # broadcast index and drop join matches.  Route to the grid join
    # instead, which never needs the payload on the driver.
    payload_bytes = sum(
        len(row[right_geometry]) for row in r_local
        if row[right_geometry] is not None)
    if (len(r_local) > broadcast_threshold
            or payload_bytes > broadcast_bytes_threshold):
        return _route_to_grid_join(
            left, left_geometry, left_bbox, right, right_geometry,
            right_columns, how, grid_cell_size, left_id,
            right_bbox=right_bbox,
        )

    # driver-side candidate index: right envelopes as numpy arrays.
    # NULL right geometries can never match — drop them here, matching
    # the slow path's per-row guard and the grid path's explode drop
    r_local = [row for row in r_local if row[right_geometry] is not None]
    r_geoms = [bytes(row[right_geometry]) for row in r_local]
    r_envs = np.array([_wkb.envelope(g) for g in r_geoms]) if r_geoms else np.zeros((0, 4))
    r_attrs = [[row[c] for c in right_columns] for row in r_local]

    # extent pruning (reference: core/add_admin_divisions_multi.py:111-150)
    # ONLY pays when the collected right side is big enough that shipping it
    # matters — for small admin tables the extra full pass over the left
    # side to compute bounds costs more than it saves.
    if prune_right_by_extent and len(r_local) > 10_000:
        from geoparquet_io_spark.operators.stats import bounds as _bounds

        ext = _bounds(left, geometry_column=left_geometry, bbox_column=left_bbox)
        if ext is None or any(v is None for v in ext):
            # empty / all-NULL-geometry left: no extent exists (the
            # None fields crashed the numpy comparisons below); nothing
            # can match, so pruning is moot — keep the right side as-is
            ext = None
    else:
        ext = None
    if ext is not None:
        keep = [
            i for i in range(len(r_geoms))
            if not (r_envs[i, 0] > ext[2] or r_envs[i, 2] < ext[0]
                    or r_envs[i, 1] > ext[3] or r_envs[i, 3] < ext[1])
        ]
        r_geoms = [r_geoms[i] for i in keep]
        r_envs = r_envs[keep] if keep else np.zeros((0, 4))
        r_attrs = [r_attrs[i] for i in keep]
    right_schema = [right.schema[c] for c in right_columns]

    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(f.name, f.dataType, True) for f in right_schema]
    )
    n_right_cols = len(right_columns)
    left_cols = [f.name for f in left.schema.fields]
    geom_idx = left_cols.index(left_geometry)

    # ship the collected right side as an explicit Spark BROADCAST
    # variable, not closure capture: the closure is re-serialized into
    # every task's command, while a broadcast transfers once per executor
    # and the task pickle carries only the handle (at the 50k-row
    # threshold with polygon WKB that's the difference between KBs and
    # tens of MBs per task)
    bc = left.sparkSession.sparkContext.broadcast(
        (r_geoms, np.asarray(r_envs), r_attrs))

    def join_batches(batches):
        from geoparquet_io_spark.functions.geom import _try_bulk_point_decode

        r_geoms, r_envs, r_attrs = bc.value
        parsed_right = [_wkb.parse(g) for g in r_geoms]
        # flattened simple parts per right geometry: MultiPolygon admin
        # boundaries must match in the point fast path, and _point_vs only
        # understands simple POINT/LINESTRING/POLYGON
        flat_right = [list(_wkb._flatten(g)) for g in parsed_right]
        for pdf in batches:
            geoms = pdf.iloc[:, geom_idx]
            n = len(geoms)
            match_rows: list[int] = []
            match_attrs: list[list] = []
            fast = _try_bulk_point_decode(geoms) if len(r_geoms) else None
            if fast is not None:
                # fully vectorized point path: for each of the FEW right
                # rows, one envelope compare over the whole batch, then
                # one points x ring-segments broadcast for the exact
                # polygon test (bit-identical to the scalar kernel —
                # _points_in_polygon_bulk).  The former per-point python
                # loop (~30 us per _point_in_polygon call) dominated the
                # whole spatial join at bench scale.
                xs, ys, nulls = fast
                valid = ~nulls
                matched = np.zeros(n, dtype=bool)
                pair_i: list[np.ndarray] = []
                pair_j: list[np.ndarray] = []
                for j in range(len(r_geoms)):
                    e = r_envs[j]
                    ci = np.nonzero(
                        valid & (xs >= e[0]) & (xs <= e[2])
                        & (ys >= e[1]) & (ys <= e[3])
                    )[0]
                    if not len(ci):
                        continue
                    hit = np.zeros(len(ci), dtype=bool)
                    for s in flat_right[j]:
                        rest = np.nonzero(~hit)[0]
                        if not len(rest):
                            break
                        if s.gtype == _wkb.POLYGON:
                            hit[rest] = _wkb._points_in_polygon_bulk(
                                xs[ci[rest]], ys[ci[rest]], s)
                        else:
                            for t in rest:
                                i = ci[t]
                                if _wkb._point_vs(
                                        np.array([xs[i], ys[i]]), s):
                                    hit[t] = True
                    mi = ci[hit]
                    if len(mi):
                        pair_i.append(mi)
                        pair_j.append(np.full(len(mi), j, dtype=np.int64))
                        matched[mi] = True
                if pair_i:
                    ii = np.concatenate(pair_i)
                    jj = np.concatenate(pair_j)
                    order = np.lexsort((jj, ii))   # (i asc, j asc): the
                    ii, jj = ii[order], jj[order]  # scalar loop's order
                else:
                    ii = np.empty(0, dtype=np.int64)
                    jj = np.empty(0, dtype=np.int64)
                if how == "left":
                    fi = np.nonzero(~matched)[0]
                    all_i = np.concatenate([ii, fi])
                    all_j = np.concatenate(
                        [jj, np.full(len(fi), -1, dtype=np.int64)])
                    # stable: each i is either matched or a filler, never
                    # both, so one argsort restores the interleaved order
                    o2 = np.argsort(all_i, kind="stable")
                    all_i, all_j = all_i[o2], all_j[o2]
                else:
                    all_i, all_j = ii, jj
                match_rows = all_i.tolist()
                # guaranteed-1-D object arrays: np.array(list, object)
                # builds a 2-D array when a right column holds
                # equal-length sequences (ArrayType lists, StructType
                # Rows), and the masked assignment below then raises
                def _obj_1d(kk: int) -> np.ndarray:
                    arr = np.empty(len(r_attrs), dtype=object)
                    arr[:] = [a[kk] for a in r_attrs]
                    return arr

                attr_np = [_obj_1d(kk) for kk in range(n_right_cols)] \
                    if len(r_attrs) else [np.empty(0, dtype=object)
                                          for _ in range(n_right_cols)]
                out = pdf.iloc[match_rows].reset_index(drop=True)
                jmask = all_j >= 0
                for k, c in enumerate(right_columns):
                    col = np.full(len(all_j), None, dtype=object)
                    if jmask.any():
                        col[jmask] = attr_np[k][all_j[jmask]]
                    out[c] = pd.Series(col, dtype="object")
                yield out
                continue
            else:
                for i, gb in enumerate(geoms):
                    emitted = False
                    if gb is not None and len(r_geoms):
                        e = _wkb.envelope(bytes(gb))
                        cand = np.nonzero(
                            (r_envs[:, 0] <= e[2]) & (r_envs[:, 2] >= e[0])
                            & (r_envs[:, 1] <= e[3]) & (r_envs[:, 3] >= e[1])
                        )[0]
                        if len(cand):
                            gp = _wkb.parse(bytes(gb))
                            for j in cand:
                                if _wkb._geom_intersects(gp, parsed_right[j]):
                                    match_rows.append(i)
                                    match_attrs.append(r_attrs[j])
                                    emitted = True
                    if not emitted and how == "left":
                        match_rows.append(i)
                        match_attrs.append([None] * n_right_cols)
            out = pdf.iloc[match_rows].reset_index(drop=True)
            for k, c in enumerate(right_columns):
                out[c] = pd.Series([a[k] for a in match_attrs], dtype="object")
            yield out

    return left.mapInPandas(join_batches, schema=out_schema)


def _route_to_grid_join(
    left: DataFrame,
    left_geometry: str,
    left_bbox: str | None,
    right: DataFrame,
    right_geometry: str,
    right_columns: list[str],
    how: str,
    cell_size: float,
    left_id: str | None = None,
    right_bbox: str | None = None,
) -> DataFrame:
    """Big right side: same join via grid partitioning.

    ``grid_spatial_join(how='left')`` needs a unique left id for the
    anti-join restore; synthesize one and localCheckpoint so the id
    column is MATERIALIZED before both branches read it
    (monotonically_increasing_id is nondeterministic — a lazy persist
    could be evicted and recomputed with different ids per branch,
    duplicating or dropping unmatched rows).
    """
    if how == "inner":
        return grid_spatial_join(
            left, left_geometry, right, right_geometry, right_columns,
            how="inner", left_bbox=left_bbox, right_bbox=right_bbox,
            cell_size=cell_size,
        )
    if left_id is not None:
        # natural unique key: no synthesized ids, no materialization
        return grid_spatial_join(
            left, left_geometry, right, right_geometry, right_columns,
            how="left", left_id=left_id, left_bbox=left_bbox,
            right_bbox=right_bbox, cell_size=cell_size,
        )
    tagged = left.withColumn(
        "__sj_id", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    return grid_spatial_join(
        tagged, left_geometry, right, right_geometry, right_columns,
        how="left", left_id="__sj_id", left_bbox=left_bbox,
        right_bbox=right_bbox, cell_size=cell_size,
    ).drop("__sj_id")


def add_admin_divisions(
    df: DataFrame,
    geometry_column: str,
    bbox_column: str | None,
    admin: DataFrame,
    admin_geometry: str | None,
    admin_bbox: str | None,
    levels: list[str],
    prefix: str = "admin:",
) -> DataFrame:
    """Enrich with admin columns named ``{prefix}{level}``
    (reference: core/add_admin_divisions_multi.py, core/add_country_codes.py)."""
    out = spatial_join(
        df, geometry_column, bbox_column,
        admin, admin_geometry, admin_bbox,
        right_columns=levels, how="left",
    )
    for lv in levels:
        out = out.withColumnRenamed(lv, f"{prefix}{lv}")
    return out


def match_rate(df: DataFrame, column: str) -> dict:
    """COUNT(*) vs COUNT(matched) (reference: partition_admin_hierarchical.py:247-262)."""
    row = df.agg(
        F.count("*").alias("total"),
        F.count(F.when(F.col(column).isNotNull(), 1)).alias("matched"),
    ).collect()[0]
    total, matched = row["total"], row["matched"]
    return {"total": total, "matched": matched,
            "rate": (matched / total) if total else 0.0}


# ---------------------------------------------------------------------------
# Grid-partitioned spatial join (big-big case)
# ---------------------------------------------------------------------------

def _grid_cells(env: Column, cell_size: float) -> Column:
    """All grid cells an envelope overlaps, as packed long ids
    (cx * 2^21 + cy with offset — native exprs only)."""
    c = float(cell_size)
    cx0 = F.floor(env["xmin"] / c).cast("long")
    cx1 = F.floor(env["xmax"] / c).cast("long")
    cy0 = F.floor(env["ymin"] / c).cast("long")
    cy1 = F.floor(env["ymax"] / c).cast("long")
    xs = F.sequence(cx0, cx1)
    ys = F.sequence(cy0, cy1)
    return F.flatten(
        F.transform(xs, lambda cx: F.transform(ys, lambda cy: _pack_cell(cx, cy)))
    )


def _pack_cell(cx: Column, cy: Column) -> Column:
    # +2^30 offset keeps both positive; 31 bits per axis (62 total,
    # inside int64) supports cell indices to ~1e9 — metric CRS
    # northings at metre-scale cells included.  The old 21-bit pack
    # silently COLLIDED past |index| ~1e6, emitting duplicate join rows
    # through spurious reference-cell matches; indices past +-2^30 now
    # raise (two comparisons per row) instead of re-admitting that bug
    # — the message names the fix (a larger cell_size).
    lim = F.lit(1 << 30)

    def _ck(v: Column, axis: str) -> Column:
        return F.when((v >= -lim) & (v < lim), v).otherwise(
            F.raise_error(F.concat(
                F.lit(f"grid cell {axis}-index "), v.cast("string"),
                F.lit(" exceeds +-2^30 — raise cell_size (projected-"
                      "CRS coordinates at this cell size overflow the "
                      "62-bit cell pack)"))).cast("long"))

    return ((_ck(cx, "x") + F.lit(1 << 30)) * F.lit(1 << 31)
            + (_ck(cy, "y") + F.lit(1 << 30)))


def grid_spatial_join(
    left: DataFrame,
    left_geometry: str,
    right: DataFrame,
    right_geometry: str,
    right_columns: list[str],
    cell_size: float = 1.0,
    how: str = "inner",
    left_id: str | None = None,
    left_bbox: str | None = None,
    right_bbox: str | None = None,
) -> DataFrame:
    """Spatial join for two LARGE sides (neither broadcastable): PBSM-style
    grid partitioning.

    Each geometry replicates to every grid cell its envelope overlaps; the
    join is a plain equi-join on the cell key (shuffle both sides once,
    co-partitioned); duplicate candidate pairs are eliminated with the
    REFERENCE-POINT rule (a pair is emitted only from the cell containing
    the top-left corner of the envelope intersection) — no distinct needed.
    Exact ST_Intersects runs after the cheap envelope test.

    ``how='left'`` needs ``left_id`` (unique) to restore unmatched rows
    via an anti join.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if how == "left" and not left_id:
        raise ValueError("left outer grid join needs left_id")
    c = float(cell_size)

    def with_env(df: DataFrame, geom: str, bbox: str | None, prefix: str) -> DataFrame:
        env = F.col(bbox) if bbox and bbox in df.columns else G.st_envelope_struct(F.col(geom))
        return df.withColumn(f"{prefix}env", env)

    l = with_env(left, left_geometry, left_bbox, "l_")
    r = with_env(right, right_geometry, right_bbox, "r_")
    l = l.withColumn("__cell", F.explode(_grid_cells(F.col("l_env"), c)))
    r_sel = r.select(
        F.col(right_geometry).alias("__rgeom"),
        F.col("r_env"),
        F.explode(_grid_cells(F.col("r_env"), c)).alias("__cell"),
        *[F.col(col).alias(f"__r_{col}") for col in right_columns],
    )
    joined = l.join(r_sel, "__cell")
    le, re_ = F.col("l_env"), F.col("r_env")
    env_overlap = (
        (le["xmax"] >= re_["xmin"]) & (le["xmin"] <= re_["xmax"])
        & (le["ymax"] >= re_["ymin"]) & (le["ymin"] <= re_["ymax"])
    )
    ref_cell = _pack_cell(
        F.floor(F.greatest(le["xmin"], re_["xmin"]) / c).cast("long"),
        F.floor(F.greatest(le["ymin"], re_["ymin"]) / c).cast("long"),
    )
    joined = joined.filter(env_overlap & (F.col("__cell") == ref_cell))
    joined = joined.filter(
        G.st_intersects(F.col(left_geometry), F.col("__rgeom"))
    )
    out_cols = [F.col(col) for col in left.columns] + [
        F.col(f"__r_{col}").alias(col) for col in right_columns
    ]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    # the left route consumes `matched` TWICE (union + anti-join): pin
    # it so the double-explode + shuffle + st_intersects filter — the
    # operator's dominant cost — evaluates once
    matched = matched.localCheckpoint(eager=False)
    missing = left.join(matched.select(left_id), left_id, "left_anti")
    for col in right_columns:
        missing = missing.withColumn(col, F.lit(None))
    return matched.unionByName(missing)


def distance_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_x: str = "lon", left_y: str = "lat",
    right_x: str = "lon", right_y: str = "lat",
    distance_column: str = "distance",
) -> DataFrame:
    """All (left, right) pairs within planar ``radius`` — the ST_DWithin
    join, gridded so the cross product never materializes (PBSM, same
    family as the bbox grid join above).

    Grid cells of side ``radius``: any within-radius partner of a point
    lies in its 3x3 cell neighborhood.  The RIGHT side lands in exactly
    one cell; the LEFT side explodes its 9 neighbor cells — so each
    qualifying pair meets exactly once (no reference-point dedup needed)
    — then one equi-join on the cell key and an exact distance filter.
    Both sides shuffle once on the cell key; skewed cells are AQE's
    problem (skew-join on).  Returns all left+right columns plus the
    exact distance.

    Distance is ``sqrt(dx*dx + dy*dy)`` written out (not hypot) so a SQL
    oracle can mirror the identical IEEE ops.

    Right-side columns whose names collide with the left (the defaults
    themselves: lon/lat on both sides) appear in the OUTPUT as
    ``right_<name>`` — previously the join emitted DUPLICATE column
    names, so any select on them raised AMBIGUOUS_REFERENCE and a
    parquet write failed outright.
    """
    if radius <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    r = float(radius)
    clash = [c for c in right.columns if c in left.columns]
    if clash:
        mapping = {c: f"right_{c}" for c in clash}
        taken = set(left.columns) | set(right.columns)
        bad = [v for v in mapping.values() if v in taken]
        if bad:
            raise ValueError(
                f"cannot auto-rename colliding right columns: {bad} "
                "already exist; rename the inputs explicitly")
        right = right.select(*[
            F.col(c).alias(mapping.get(c, c)) for c in right.columns])
        right_x = mapping.get(right_x, right_x)
        right_y = mapping.get(right_y, right_y)
    lcx = F.floor(F.col(left_x) / r).cast("long")
    lcy = F.floor(F.col(left_y) / r).cast("long")
    rcx = F.floor(F.col(right_x) / r).cast("long")
    rcy = F.floor(F.col(right_y) / r).cast("long")

    neighbors = F.array(*[
        F.struct((lcx + dx).alias("cx"), (lcy + dy).alias("cy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    l = left.withColumn("__cell", F.explode(neighbors)) \
        .withColumn("__cx", F.col("__cell.cx")) \
        .withColumn("__cy", F.col("__cell.cy")).drop("__cell")
    rt = right.withColumn("__cx", rcx).withColumn("__cy", rcy)

    joined = l.join(rt, ["__cx", "__cy"])
    ldx = F.col(left_x) - F.col(right_x)
    ldy = F.col(left_y) - F.col(right_y)
    dist = F.sqrt(ldx * ldx + ldy * ldy)
    return (joined.withColumn(distance_column, dist)
            .filter(F.col(distance_column) <= r)
            .drop("__cx", "__cy"))


# per-brute-pass bound on the straggler reduce's pandas state, in CELLS
# (rows x output columns): the knn straggler brute chunks its collected
# queries so each mapInPandas pass's running per-partition best frame
# stays ~this size regardless of how many stragglers the 500k collect
# cap admitted.
_BRUTE_STATE_CELLS = 8_000_000


def _brute_chunk_size(k: int, n_out_cols: int) -> int:
    """Stragglers per brute pass: state cells / (k best x output width),
    floored so tiny tails never pay a second right-side scan.  Separate
    function so tests can force multi-chunk."""
    return max(2000, _BRUTE_STATE_CELLS // max(k * n_out_cols, 1))


def _knn_brute_pairs(rows, lid_type, right: DataFrame, k: int,
                     right_x: str, right_y: str,
                     distance_column: str,
                     left_xy_fields=None) -> DataFrame:
    """Vectorized bounded brute for kNN stragglers: the (collected,
    driver-bounded) straggler positions broadcast in a closure, ONE
    mapInPandas pass over the right side computes the distance matrix
    in numpy chunks and emits each straggler's k best PER ARROW BATCH
    (a superset of the true top-k, <= batches * |stragglers| * k rows);
    the caller's ranking window finishes the job.

    Replaces the JVM BroadcastNestedLoopJoin brute: at the 100x
    clustered receipt, 2k stragglers x 1.5M right = 3G pairs took
    minutes through the nested loop and seconds through numpy."""
    import pandas as pd
    from typing import Iterator

    lids = [r[0] for r in rows]
    sx = np.array([float(r[1]) for r in rows])
    sy = np.array([float(r[2]) for r in rows])
    n_s = len(rows)
    # slim-left mode: the query coordinates ride along in the output
    # (left_xy_fields = the pending schema's (x, y) StructFields)
    out_fields = [T.StructField("__lid", lid_type)] + \
        (list(left_xy_fields) if left_xy_fields else []) + \
        [right.schema[c] for c in right.columns] + \
        [T.StructField(distance_column, T.DoubleType())]
    schema = T.StructType(out_fields)
    rcols = list(right.columns)

    def fetch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        lid_arr = pd.Series(lids)

        def _cut(cat: "pd.DataFrame") -> "pd.DataFrame":
            # keep each straggler's k best INCLUDING every row tied at
            # the k-th distance: the caller's window tie-breaks on right
            # columns, so dropping an equal-distance candidate here
            # could change the final deterministic ranking
            rnk = cat.groupby("__lid", sort=False)[distance_column] \
                .rank(method="min")
            return cat[rnk <= k]

        best = None
        for pdf in batches:
            if not len(pdf):
                continue
            rx = pdf[right_x].to_numpy(dtype=np.float64)
            ry = pdf[right_y].to_numpy(dtype=np.float64)
            kk = min(k, len(pdf))
            outs = []
            # straggler chunks bound the distance-matrix temp to
            # ~len(batch) x 512 doubles (~40 MB at 10k-row batches)
            for lo in range(0, n_s, 512):
                hi = min(lo + 512, n_s)
                dx = rx[None, :] - sx[lo:hi, None]
                dy = ry[None, :] - sy[lo:hi, None]
                d2 = dx * dx + dy * dy
                if kk < d2.shape[1]:
                    kth = np.partition(d2, kk - 1, axis=1)[:, kk - 1]
                    s_idx, r_idx = np.nonzero(d2 <= kth[:, None])
                else:
                    s_idx = np.repeat(np.arange(hi - lo), d2.shape[1])
                    r_idx = np.tile(np.arange(d2.shape[1]), hi - lo)
                sel = pdf.iloc[r_idx].reset_index(drop=True)
                out = pd.DataFrame({"__lid": lid_arr.iloc[lo + s_idx]
                                    .reset_index(drop=True)})
                if left_xy_fields:
                    out[left_xy_fields[0].name] = sx[lo + s_idx]
                    out[left_xy_fields[1].name] = sy[lo + s_idx]
                for c in rcols:
                    out[c] = sel[c]
                out[distance_column] = np.sqrt(d2[s_idx, r_idx])
                outs.append(out)
            if not outs:
                continue
            batch_best = _cut(pd.concat(outs, ignore_index=True))
            # running per-PARTITION reduce: memory and output stay
            # ~|stragglers| * k rows instead of batches * |stragglers| * k
            best = batch_best if best is None else _cut(
                pd.concat([best, batch_best], ignore_index=True))
        if best is not None and len(best):
            yield best.reset_index(drop=True)

    return right.mapInPandas(fetch, schema=schema)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    initial_radius: float,
    left_id: str = "lid",
    left_x: str = "lon", left_y: str = "lat",
    right_x: str = "lon", right_y: str = "lat",
    max_rounds: int = 4,
    distance_column: str = "distance",
    tie_columns: list[str] | None = None,
    radius_tiers: bool = False,
    oversample: float = 2.0,
) -> DataFrame:
    """Exact k-nearest-neighbor spatial join without a cross product.

    Expanding-ring grid search: round ``i`` runs :func:`distance_join`
    at radius ``initial_radius * 2**i`` for the still-unresolved left
    points.  A left point is RESOLVED once >= k partners fall inside the
    radius — then its true k nearest are all inside it (the grid finds
    every partner within the radius, and any unexamined point is
    farther).  Unresolved points (sparse neighborhoods) retry at double
    the radius; after ``max_rounds`` the (by then few) stragglers
    broadcast against the full right side — bounded fallback, never a
    full cross product.

    ``radius_tiers=True`` makes the expanding ring DENSITY-ADAPTIVE —
    the clustered-data guard (r10, rebuilt r11).  With a single global
    start radius, non-uniform data forces a dilemma: a radius sized for
    the dense clump sends every sparse query through the full doubling
    ladder, while an average-density radius makes every clump query
    pull the whole clump through the 9-cell explode (quadratic in
    clump size).  The tiered path breaks it with four pieces:

    1. SITE PRUNING: one window keeps each distinct right position's
       k first-by-tie-order rows — later duplicates are dominated by k
       same-site rows in every query's ranking, so the cut is
       result-identical while collapsing candidate volume on snapped /
       duplicated coordinates.
    2. A DENSITY LADDER grids the right side at log-many resolutions
       (one row-level aggregate + one cell-table aggregate) carrying
       per-cell point AND distinct-site counts; each query point gets
       an entry tier ``t`` (start radius ``initial_radius * 2**t``)
       from a duplication-aware disc that reaches ``ceil(need/dup)``
       occupied sites of its local site density — for continuous data
       this reduces exactly to the uniform point-density disc.
    3. Every round runs each tier's pending points at its own radius —
       all tiers in ONE union job, not one job per radius.
    4. Stragglers route to a VECTORIZED BRUTE (one mapInPandas numpy
       pass over the right side, per-partition running top-k keeping
       k-th-distance ties) as soon as ``|pending| x |right|`` fits a
       4e11-pair budget — a straggler's expanding disc eventually
       overlaps a dense region, where the grid join degenerates into a
       shuffled near-cross-product.

    Tier assignment is an ESTIMATE and cannot affect the answer:
    resolution still requires >= k partners inside the radius actually
    searched, and the brute is exact by construction — a mis-estimated
    tier costs extra candidates or an extra round, never a wrong
    neighbor.

    Deterministic tie-break: ranking orders by (distance, *tie_columns)
    — pass a UNIQUE right-side column (its id) in ``tie_columns``;
    the default (right_x, right_y) is only deterministic when right
    coordinates are unique.

    Right-side columns whose names collide with the left (the defaults
    themselves: lon/lat both sides) appear in the OUTPUT as
    ``right_<name>``; non-finite (NULL/NaN/±Inf) coordinate rows are
    dropped on BOTH sides — a right one can never be a nearest
    neighbor, and a left one has no position to search from (it
    previously fell through every grid round into the brute fallback
    and emitted k arbitrary partners with NULL/NaN distance).

    ``left_id`` must be UNIQUE per left row (same contract as
    grid_spatial_join): duplicate ids pool the per-point count and
    ranking window, so both points resolve on their POOLED partner
    count and split k ranks between them — short/wrong neighbor lists
    with no error.

    Per-round cost: one cell-key equi-join over the unresolved subset.
    Pick ``initial_radius`` near the expected k-neighbor distance (e.g.
    from sampled density) so most points resolve in round one.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if initial_radius <= 0:
        raise ValueError(f"initial_radius must be > 0, got {initial_radius}")
    from pyspark.sql import Window

    # the defaults advertise lon/lat on BOTH sides — auto-disambiguate
    # colliding right columns as right_<name> so the tie-break window
    # and the brute path's distance expression can resolve (duplicate
    # output names raise AMBIGUOUS_REFERENCE downstream otherwise)
    clash = [c for c in right.columns if c in left.columns]
    if clash:
        mapping = {c: f"right_{c}" for c in clash}
        taken = set(left.columns) | set(right.columns)
        bad = [v for v in mapping.values() if v in taken]
        if bad:
            raise ValueError(
                f"cannot auto-rename colliding right columns: {bad} "
                "already exist; rename the inputs explicitly")
        right = right.select(*[
            F.col(c).alias(mapping.get(c, c)) for c in right.columns])
        right_x = mapping.get(right_x, right_x)
        right_y = mapping.get(right_y, right_y)
        if tie_columns is not None:
            tie_columns = [mapping.get(c, c) for c in tie_columns]
    # non-finite-coordinate rows are dropped on BOTH sides: a NULL/NaN/
    # Inf right row can never be a true nearest neighbor, and a left one
    # has no position to search from.  The grid rounds already drop
    # NULLs (null cell key), but NaN rows fell through every round into
    # the brute fallback and emitted k arbitrary partners with NaN
    # distance (NaN <= r is false in the grid filter, yet row_number
    # still ranks NaN distances in the fallback window).
    def _finite(name: str):
        col = F.col(name)
        return (col.isNotNull() & ~F.isnan(col)
                & (F.abs(col) != F.lit(float("inf"))))

    right = right.filter(_finite(right_x) & _finite(right_y))
    left = left.filter(_finite(left_x) & _finite(left_y))

    ties = tie_columns if tie_columns is not None else [right_x, right_y]
    w = Window.partitionBy("__lid").orderBy(
        F.col(distance_column).asc_nulls_last(),
        *[F.col(c).asc() for c in ties])
    wall = Window.partitionBy("__lid")

    def topk(pairs: DataFrame) -> DataFrame:
        return (pairs.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= k)
                .withColumnRenamed("__rn", "knn_rank"))

    def resolved_topk(pairs: DataFrame) -> DataFrame:
        """One window pass computes BOTH round answers: the per-query
        candidate count (resolution test: >= k partners inside the
        searched radius) and the rank — same partitioning, so Catalyst
        fuses them into a single WindowExec on one shuffle.  Only the
        RESOLVED queries' top-k rows survive."""
        return (pairs
                .withColumn("__cnt", F.count("*").over(wall))
                .withColumn("__rn", F.row_number().over(w))
                .filter((F.col("__cnt") >= k) & (F.col("__rn") <= k))
                .drop("__cnt")
                .withColumnRenamed("__rn", "knn_rank"))

    # BOTH paths run NARROW: drop the left payload from pending up
    # front so every per-round grid join, anti-join, cache, and window
    # carries 3 columns + right columns, not the full row — the payload
    # rejoins ONCE after the rank filter cut the volume to <= k *
    # |left|.  (r11: the classic path was wide with a per-round eager
    # checkpoint to free its caches, which A/B-measured 1.305 vs the
    # pin; narrow + one exit checkpoint is faster than either wide
    # variant and frees the caches too.)
    pending = left.withColumn("__lid", F.col(left_id)) \
        .select("__lid", left_x, left_y)
    r0 = float(initial_radius)
    right_count = None
    if radius_tiers:
        # SITE PRUNING: right rows at the SAME exact position share the
        # same distance to every query, so a site can only ever
        # contribute its k first-by-tie-order points to any top-k —
        # every later duplicate is dominated by k same-site rows in
        # every comparison.  One window shuffle up front; on heavily
        # duplicated data (snapped addresses, lattice-derived
        # coordinates) this collapses the candidate volume — the 100x
        # clustered receipt holds ~900 duplicates per clump site, and
        # round 0 dragged all of them through the grid join per query
        # (137s) before this cut.  Result-identical by dominance; for
        # duplicate-free data it is a no-op (costing one narrow
        # shuffle, amortized against the rounds' repeated right scans).
        wsite = Window.partitionBy(right_x, right_y).orderBy(
            *[F.col(c).asc() for c in ties])
        right = right.withColumn("__srn", F.row_number().over(wsite)) \
            .filter(F.col("__srn") <= k).drop("__srn")
        import math

        # per-point entry tier from a density LADDER over the right
        # side.  Tier capped at the domain diameter (beyond that the
        # brute fallback is correct and cheaper).
        row = right.agg(
            F.count("*").alias("n"),
            F.min(right_x).alias("x0"), F.max(right_x).alias("x1"),
            F.min(right_y).alias("y0"), F.max(right_y).alias("y1"),
        ).collect()[0]
        n = row["n"] or 0
        right_count = n
        if n:
            w_ = max(float(row["x1"] - row["x0"]), 1e-12)
            h_ = max(float(row["y1"] - row["y0"]), 1e-12)
            c = max(math.sqrt(oversample * k * w_ * h_ / (math.pi * n)), r0)
            diam = math.hypot(w_, h_)
            tier_cap = max(0, math.ceil(math.log2(max(diam / r0, 1.0))))
            need = float(oversample * k)
            # DENSITY LADDER (r11): a single-level map gave every
            # empty-cell query the same blind 2c entry radius, so the
            # sparse tail still walked sequential doubling rounds (the
            # r10 receipt's 28.7 us/row constant).  Levels l = 0..L-1
            # grid the right side at cell side c * 2**l; each level
            # aggregates the PREVIOUS level's cell table (4x smaller per
            # step — never the data rows), so the whole ladder costs one
            # row-level aggregate plus log-many cell-table aggregates.
            n_levels = max(1, min(24,
                                  math.ceil(math.log2(max(diam / c, 1.0)))
                                  + 1))
            levels_arr = F.array(*[F.lit(li) for li in range(n_levels)])
            # per-cell POINT count and DISTINCT-SITE count: heavily
            # duplicated coordinates (snapped addresses, lattice-derived
            # data) make point density meaningless — a cell can hold 54k
            # points on 50 sites, and a disc sized for "6 points of
            # uniform density" reaches no site at all (measured: 271 of
            # 50k clump queries resolved in round 0 at the 100x receipt
            # before this).  Sites are summable up the ladder (each site
            # lives in exactly one cell per level).
            cells0 = right.select(
                F.floor(F.col(right_x) / c).cast("long").alias("__cx0"),
                F.floor(F.col(right_y) / c).cast("long").alias("__cy0"),
                F.col(right_x).alias("__rx"), F.col(right_y).alias("__ry"),
            ).groupBy("__cx0", "__cy0").agg(
                F.count("*").alias("__n0"),
                F.approx_count_distinct(
                    F.struct(F.col("__rx"), F.col("__ry"))).alias("__t0"))
            # all levels in ONE pass over the level-0 CELL table (an
            # explode of cells, never rows): floor(cx0 / 2**l) coarsens
            # exactly like iterated halving (floor-of-floor identity),
            # so the whole ladder costs one row-level aggregate plus one
            # cell-level aggregate — a per-level chain of groupBys
            # re-evaluated each level's prefix and paid ~L^2/2 shuffle
            # stages
            scale2 = F.pow(F.lit(2.0), F.col("__lvl"))
            ladder = cells0.withColumn("__lvl", F.explode(levels_arr)) \
                .groupBy(
                    "__lvl",
                    F.floor(F.col("__cx0") / scale2).cast("long")
                    .alias("__dcx"),
                    F.floor(F.col("__cy0") / scale2).cast("long")
                    .alias("__dcy"),
                ).agg(F.sum("__n0").alias("__dcnt"),
                      F.sum("__t0").alias("__dsit"))
            # probe every level's key per query point (a log-factor
            # explode of the narrow id+xy projection), join the ladder
            # once, and pick per point: the FINEST level holding >= need
            # points, else the COARSEST occupied level (its density
            # still sizes the radius, now > cell scale), else tier_cap.
            probe = pending.select(
                "__lid", F.col(left_x).alias("__px"),
                F.col(left_y).alias("__py")) \
                .withColumn("__lvl", F.explode(levels_arr)) \
                .withColumn("__s", F.lit(float(c))
                            * F.pow(F.lit(2.0), F.col("__lvl"))) \
                .withColumn("__dcx",
                            F.floor(F.col("__px") / F.col("__s"))
                            .cast("long")) \
                .withColumn("__dcy",
                            F.floor(F.col("__py") / F.col("__s"))
                            .cast("long")) \
                .join(ladder, ["__lvl", "__dcx", "__dcy"])
            pick = F.when(F.col("__dcnt") >= F.lit(need), F.col("__lvl")) \
                .otherwise(F.lit(2 * n_levels) - F.col("__lvl"))
            best = probe.groupBy("__lid").agg(F.min(F.struct(
                pick.alias("k"), F.col("__s").alias("s"),
                F.col("__dcnt").alias("n"),
                F.col("__dsit").alias("sn"))).alias("__b"))
            # duplication-aware radius: to see `need` POINTS the disc
            # must cover m = ceil(need / dup-per-site) occupied SITES of
            # the cell's site density — for continuous data (dup ~ 1)
            # this reduces exactly to the uniform point-density disc;
            # for duplicated coordinates it reaches the nearest sites
            # instead of a point-dense-but-siteless vacuum
            sn = F.greatest(F.col("__b.sn").cast("double"), F.lit(1.0))
            dbar = F.col("__b.n") / sn
            m_sites = F.greatest(
                F.lit(1.0), F.ceil(F.lit(need) / dbar).cast("double"))
            r_i = F.col("__b.s") * F.sqrt(
                m_sites / (F.lit(math.pi) * sn))
            tier = F.ceil(F.log2(F.greatest(r_i / F.lit(r0), F.lit(1.0)))) \
                .cast("int")
            tiers_df = best.select(
                "__lid", F.least(tier, F.lit(tier_cap)).alias("__tier"))
            pending = pending.join(tiers_df, "__lid", "left") \
                .withColumn("__tier",
                            F.coalesce(F.col("__tier"), F.lit(tier_cap))) \
                .localCheckpoint()
            # eager checkpoint: the ladder-probe plan above would
            # otherwise RE-EXECUTE for every action the round loop
            # takes against pending (tier collect, per-tier filters,
            # anti-join, emptiness probe) — measured 8x re-evaluation
            # in round 0 alone
        else:
            pending = pending.withColumn("__tier", F.lit(0))
    else:
        pending = pending.withColumn("__tier", F.lit(0))
    # candidate volume is linear in the right side but its CONSTANT can
    # be huge on clustered data (a query whose search disc covers a
    # dense clump pulls the whole clump as candidates), so everything
    # windowed below is the NARROW projection (__lid, distance, right
    # columns) — a wide candidate checkpoint measured 5-10x fatter and
    # OOMed an 8 GB heap at the 100x clustered receipt.
    # slim left (= exactly id + coordinates, the common spatial shape):
    # the coordinates ride along in the candidates (+16 B/row) and the
    # exit rejoin — a second full left scan — disappears entirely.
    slim_left = set(left.columns) == {left_id, left_x, left_y}
    narrow_cols = ["__lid", *([left_x, left_y] if slim_left else []),
                   *right.columns, distance_column]
    resolved_parts = []
    # early-brute gate: the vectorized brute costs ~|right| * |pending|
    # numpy ops in one pass over the right side — a 5e10-pair budget is
    # seconds on 32 cores, so the gate scales inversely with |right|
    # (right_count is set by the tiered branch's bounds aggregate)
    brute_cap = 2000
    if radius_tiers and right_count:
        brute_cap = int(min(500_000, max(2000, 4e11 // right_count)))
    leftover = False
    for rnd in range(max_rounds):
        if radius_tiers:
            tiers = sorted(r["__tier"] for r in
                           pending.select("__tier").distinct().collect())
            if not tiers:
                # empty pending (empty left side, or every coordinate
                # NULL/NaN): nothing to search — return empty like the
                # classic path instead of indexing into zero parts
                break
        else:
            # non-tiered pending is all at tier == rnd by construction
            # (every survivor's tier incremented once per round) — no
            # extra collect on the classic path
            tiers = [rnd]
        # one UNION job across tiers, each tier gridded at its own
        # radius; persist: `pairs` feeds BOTH the resolution count and
        # the top-k ranking — without it each grid join runs twice
        parts = [
            distance_join(pending.filter(F.col("__tier") == t)
                          .select("__lid", left_x, left_y),
                          right, r0 * (2.0 ** t),
                          left_x, left_y, right_x, right_y,
                          distance_column=distance_column)
            .select(*narrow_cols)
            for t in tiers
        ]
        pairs = parts[0]
        for p in parts[1:]:
            pairs = pairs.unionByName(p)
        # ONE evaluation of the round's grid joins: the fused
        # count+rank window (resolved_topk) answers resolution AND
        # ranking in a single pass, and the checkpoint pins only the
        # OUTPUT-SIZED resolved rows (<= k per resolved query,
        # narrow) — no candidate cache exists to leak or to OOM (the
        # r10 receipt OOMed on exactly that cache when it was wide;
        # its r10 fix still pinned candidates for the app lifetime).
        # LAZY (r12): the round-control count below forces full
        # materialization anyway — its anti-join build side is
        # resolved.distinct(), an all-partitions aggregate that no
        # limit can short-circuit — so eager's separate job cycle
        # (schedule + a second full read of the checkpoint) bought
        # nothing; one-evaluation still holds, now inside that job
        resolved = resolved_topk(pairs).localCheckpoint(eager=False)
        resolved_parts.append(resolved)
        pending = pending.join(
            resolved.select("__lid").distinct(), "__lid", "left_anti") \
            .withColumn("__tier", F.col("__tier") + 1) \
            .localCheckpoint(eager=False)
        # ONE bounded job answers both round-control questions: is
        # pending empty, and is it small enough to early-brute —
        # cheap: it reads the round's checkpoint, not the grid joins
        n_pending = pending.limit(brute_cap + 1).count()
        if n_pending == 0:
            leftover = False
            break
        if n_pending <= brute_cap:
            # anything still pending after round 0 is a straggler: its
            # expanding disc may overlap a dense region, where the grid
            # join degenerates into a shuffled near-cross-product
            # (measured 82s/180s mid rounds at the 100x clustered
            # receipt) — and even on uniform data each further round is
            # a sequential job cycle for a sub-percent tail.  When
            # |stragglers| x |right| fits the numpy budget, ONE
            # vectorized brute pass beats any number of further rounds.
            leftover = True
            break
    else:
        leftover = True
    if leftover:
        # stragglers after max_rounds (or the early-brute route above):
        # positions collect driver-side (bounded), ONE vectorized
        # mapInPandas pass over the right side emits each straggler's
        # per-batch k best, and the ranking window finishes.  NOT
        # always collectable though: with k >= |right| (or a hopeless
        # radius ladder) NOBODY resolves and pending is the whole left
        # side — bounded probes pick the strategy; when nothing fits,
        # fail LOUDLY with the remedy instead of dying in a broadcast.
        cap = 500_000
        rows = pending.select("__lid", left_x, left_y) \
            .limit(cap + 1).collect()
        if not rows:
            pass
        elif len(rows) <= 64:
            # micro tail: a driver-built broadcast + JVM cross join
            # beats the numpy pass here — mapInPandas pays Python-worker
            # startup that dwarfs 64 x |right| JVM pairs
            sch = T.StructType([pending.schema["__lid"],
                                pending.schema[left_x],
                                pending.schema[left_y]])
            pn = F.broadcast(right.sparkSession.createDataFrame(rows, sch))
            ddx = F.col(left_x) - F.col(right_x)
            ddy = F.col(left_y) - F.col(right_y)
            brute = pn.crossJoin(right) \
                .withColumn(distance_column,
                            F.sqrt(ddx * ddx + ddy * ddy)) \
                .select(*narrow_cols)
            resolved_parts.append(topk(brute))
        elif len(rows) <= cap:
            # the brute's per-partition running reduce holds
            # ~|stragglers| * k rows x |out cols| of pandas state (plus
            # right payload); at the 500k cap that is a multi-GB Python
            # worker.  Chunk stragglers so each pass's state stays
            # bounded (~8M cells) — each extra chunk costs one more
            # scan of the right side, which the early-brute gate
            # already priced as cheaper than more grid rounds.  Chunks
            # cover disjoint queries, so per-chunk top-k is exact.
            chunk = _brute_chunk_size(k, len(narrow_cols))
            for lo in range(0, len(rows), chunk):
                pairs_b = _knn_brute_pairs(
                    rows[lo:lo + chunk], pending.schema["__lid"].dataType,
                    right, k, right_x, right_y, distance_column,
                    left_xy_fields=(pending.schema[left_x],
                                    pending.schema[left_y])
                    if slim_left else None)
                resolved_parts.append(topk(pairs_b))
        elif right.limit(cap + 1).count() <= cap:
            ddx = F.col(left_x) - F.col(right_x)
            ddy = F.col(left_y) - F.col(right_y)
            pn = pending.select("__lid", left_x, left_y)
            brute = pn.crossJoin(F.broadcast(right)) \
                .withColumn(distance_column,
                            F.sqrt(ddx * ddx + ddy * ddy)) \
                .select(*narrow_cols)
            resolved_parts.append(topk(brute))
        else:
            raise ValueError(
                f"knn_join: more than {cap} left rows still unresolved "
                f"after max_rounds={max_rounds} and the right side is "
                f"over {cap} rows too — the brute fallback would be a "
                "full cross product.  Raise max_rounds (doubling rounds "
                "are cheap), pass a larger initial_radius, or use "
                "radius_tiers=True so each point starts near its own "
                "density's radius.")

    if not resolved_parts:
        # every round resolved nothing AND pending emptied (empty left /
        # all-NULL coordinates in the tiered path): synthesize an empty
        # result with the correct schema from a zero-row grid join
        empty = distance_join(
            pending.select("__lid", left_x, left_y),
            right, r0, left_x, left_y, right_x, right_y,
            distance_column=distance_column).select(*narrow_cols)
        resolved_parts.append(topk(empty))
    ranked = resolved_parts[0]
    for p in resolved_parts[1:]:
        ranked = ranked.unionByName(p)
    if slim_left:
        # the coordinates rode along — reconstruct the left columns in
        # their original order straight from ranked, no rejoin (and no
        # second scan of the left side)
        return ranked.select(
            *[(F.col("__lid").alias(c) if c == left_id else F.col(c))
              for c in left.columns],
            *right.columns, distance_column, "knn_rank")
    # left payload rejoins the (<= k * |left|)-row ranked set — column
    # order preserved vs the pre-narrowing contract (left + right +
    # distance + rank).  Round results are already checkpointed
    # output-sized; only the (lazy) brute part, if any, computes here.
    out = left.withColumn("__lid", F.col(left_id)).join(ranked, "__lid")
    return out.select(*left.columns, *right.columns,
                      distance_column, "knn_rank")


def estimate_knn_radius(right: DataFrame, k: int,
                        right_x: str = "lon", right_y: str = "lat",
                        oversample: float = 2.0,
                        density_quantile: float | None = None) -> float:
    """Pick ``initial_radius`` for :func:`knn_join` from the right side's
    density: a disc holding ``oversample * k`` expected points under a
    uniform model — ``r = sqrt(oversample * k * area / (pi * n))``.
    One bounded aggregate (count + bounds); clustered data resolves the
    dense regions in round one and the sparse tail in the doubling
    rounds, which is exactly what the expanding search is for.

    ``density_quantile`` (e.g. 0.99) sizes the radius from the DENSEST
    populated region instead of the average: grid the right side at the
    uniform-model radius and solve the same disc equation against the
    local density at that quantile.  The quantile is POINT-weighted, not
    cell-weighted — over the cells nearly all of a clustered dataset's
    populated cells are sparse singletons, so a per-cell quantile puts
    even p99 at occupancy ~1 and returns the uniform radius right back
    (measured: a 90%-in-one-cell clump sat above p99.9 of CELLS while
    holding p10..p100 of POINTS).  "The occupancy of the cell holding
    the q-th point" is computed exactly from a tiny occupancy histogram
    (groupBy cell -> count, groupBy count -> #cells, driver-side scan).
    This is the clustered-data guard — an average-density radius makes
    every clumped query point pull the whole clump through the 9-cell
    candidate explode (candidate volume quadratic in clump size); the
    dense-quantile radius keeps round-1 candidates near
    ``oversample * k`` everywhere, and sparse-region queries just take
    more doubling rounds (or, with ``knn_join(radius_tiers=True)``,
    enter directly at their own density's radius)."""
    import math

    row = right.agg(
        F.count("*").alias("n"),
        F.min(right_x).alias("x0"), F.max(right_x).alias("x1"),
        F.min(right_y).alias("y0"), F.max(right_y).alias("y1"),
    ).collect()[0]
    n = row["n"] or 0
    if n == 0:
        raise ValueError("cannot estimate a radius from an empty right side")
    area = max((row["x1"] - row["x0"]) * (row["y1"] - row["y0"]), 1e-12)
    r_uniform = math.sqrt(oversample * k * area / (math.pi * n))
    if density_quantile is None:
        return r_uniform
    if not 0.0 < density_quantile <= 1.0:
        raise ValueError(
            f"density_quantile must be in (0, 1], got {density_quantile}")
    cell = max(r_uniform, 1e-12)
    hist = right.select(
        F.floor(F.col(right_x) / cell).alias("__cx"),
        F.floor(F.col(right_y) / cell).alias("__cy"),
    ).groupBy("__cx", "__cy").count() \
        .groupBy("count").agg(F.count("*").alias("cells")).collect()
    occ = sorted((r["count"], r["cells"]) for r in hist)
    total = sum(c * m for c, m in occ)
    if total <= 0:
        return r_uniform
    target = density_quantile * total
    acc, q = 0, occ[-1][0]
    for c, m in occ:
        acc += c * m
        if acc >= target:
            q = c
            break
    if q <= 0:
        return r_uniform
    dense = q / (cell * cell)           # points per unit area, quantile cell
    return min(r_uniform,
               math.sqrt(oversample * k / (math.pi * dense)))
