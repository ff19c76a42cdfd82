"""Second wave of oracle-backed queries: remaining SURVEY section-2 rows
(bounds agg, geometry-type agg, match-rate, union-by-name, sampled
cross-join distance, h3-cell fallback grid, quadkey-prefix partition
preview, head/tail slicing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoparquet_io_spark.queries import register, _events_points, _customer_points
from geoparquet_io_spark.testsupport.tables import (
    load_table,
    nation_boxes,
    EVENT_LON_SQL,
    EVENT_LAT_SQL,
    CUSTOMER_LON_SQL,
    CUSTOMER_LAT_SQL,
    NATION_BOX_SQL,
)

_EVT = f"SELECT event_id, {EVENT_LON_SQL} AS lon, {EVENT_LAT_SQL} AS lat FROM events"
_CUST = f"SELECT c_custkey, {CUSTOMER_LON_SQL} AS lon, {CUSTOMER_LAT_SQL} AS lat FROM customer"


@register(
    "geo_bounds",
    f"""
    WITH pts AS ({_EVT})
    SELECT MIN(lon) AS xmin, MIN(lat) AS ymin, MAX(lon) AS xmax, MAX(lat) AS ymax
    FROM pts
    """,
)
def q_bounds(spark, sf_dir):
    gt = _events_points(spark, sf_dir)
    xmin, ymin, xmax, ymax = gt.bounds()
    return spark.createDataFrame(
        [(xmin, ymin, xmax, ymax)], "xmin double, ymin double, xmax double, ymax double"
    )


@register(
    "geo_geometry_types",
    """
    SELECT 'POINT' AS gtype, COUNT(*) AS n FROM events
    """,
)
def q_geometry_types(spark, sf_dir):
    """DISTINCT ST_GeometryType agg (reference: core/common.py:1989-2042)."""
    from geoparquet_io_spark.functions import geom as G

    gt = _events_points(spark, sf_dir)
    return gt.df.groupBy(
        G.st_geometrytype(F.col("geometry")).alias("gtype")
    ).agg(F.count("*").alias("n"))


@register(
    "geo_join_match_rate",
    f"""
    WITH pts AS ({_CUST}),
    boxes AS (
      SELECT {NATION_BOX_SQL['xmin']} AS xmin, {NATION_BOX_SQL['ymin']} AS ymin,
             {NATION_BOX_SQL['xmax']} AS xmax, {NATION_BOX_SQL['ymax']} AS ymax,
             n_name
      FROM nation
    ),
    j AS (
      SELECT p.c_custkey, b.n_name
      FROM pts p LEFT JOIN boxes b
        ON p.lon >= b.xmin AND p.lon <= b.xmax AND p.lat >= b.ymin AND p.lat <= b.ymax
    )
    SELECT COUNT(*) AS total, COUNT(n_name) AS matched,
           ROUND(COUNT(n_name) * 1.0 / COUNT(*), 6) AS rate
    FROM j
    """,
)
def q_match_rate(spark, sf_dir):
    from geoparquet_io_spark.functions import geom as G
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.operators.joins import match_rate

    pts = _customer_points(spark, sf_dir)
    n = nation_boxes(load_table(spark, sf_dir, "nation"))
    n = n.withColumn("geometry", G.st_box("xmin", "ymin", "xmax", "ymax"))
    n = n.withColumn("bbox", G.bbox_struct(
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))) \
        .select("n_name", "geometry", "bbox")
    joined = pts.add_admin_divisions(GeoTable(n, pts.geo), levels=("n_name",))
    r = match_rate(joined.df, "admin:n_name")
    return spark.createDataFrame(
        [(r["total"], r["matched"], round(r["rate"], 6))],
        "total long, matched long, rate double",
    )


@register(
    "setop_union_by_name",
    """
    WITH a AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
               WHERE o_orderkey % 2 = 0),
    b AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 1)
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM a
    UNION ALL
    SELECT o_orderkey, NULL AS o_totalprice, o_orderstatus FROM b
    """,
)
def q_union_by_name(spark, sf_dir):
    """union_by_name schema merge (reference: core/partition_reader.py:69-71)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    b = o.filter(F.col("o_orderkey") % 2 == 1).select("o_orderkey", "o_orderstatus")
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "geo_sample_cross_distance",
    f"""
    WITH pts AS ({_EVT}),
    s AS (SELECT * FROM pts WHERE event_id % 50 = 0)
    SELECT ROUND(AVG(sqrt((a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat))), 4)
             AS avg_rand_dist,
           COUNT(*) AS n_pairs
    FROM s a, s b WHERE a.event_id != b.event_id
    """,
)
def q_sample_cross_distance(spark, sf_dir):
    """Random-pair average distance (check_spatial denominator,
    core/check_spatial_order.py:32-51) — deterministic every-kth sample."""
    from geoparquet_io_spark.functions import geom as G

    gt = _events_points(spark, sf_dir)
    s = gt.df.filter(F.col("event_id") % 50 == 0).select("event_id", "geometry")
    a = s.select(F.col("event_id").alias("ida"), F.col("geometry").alias("ga"))
    b = s.select(F.col("event_id").alias("idb"), F.col("geometry").alias("gb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("ida") != F.col("idb"))
    d = pairs.select(G.st_distance(F.col("ga"), F.col("gb")).alias("d"))
    return d.agg(F.round(F.avg("d"), 4).alias("avg_rand_dist"),
                 F.count("*").alias("n_pairs"))


_H3_ORACLE_SF = "/root/testdata/sf0.01"   # the driver's oracle scale
_H3_MODULUS = 20


def _h3_real_oracle(res: int, agg: bool) -> str | None:
    """VALUES-literal oracle for real H3 ids: expected cells computed by
    the INDEPENDENT scalar mirror (functions/h3_fine.latlng_to_cell_scalar
    — same published orientation tables, separate arithmetic path) over
    the exact integer lat/lon formulas of the synthetic events table at
    the driver's oracle scale.  Joined back to the events view so the
    oracle still proves the ids belong to real table rows.  Returns None
    (rows-only check) when the oracle-scale testdata is absent."""
    try:
        import pyarrow.parquet as pq

        from geoparquet_io_spark.functions import h3_fine as hf

        t = pq.read_table(f"{_H3_ORACLE_SF}/events.parquet",
                          columns=["event_id", "user_id"])
        rows = []
        for e, u in zip(t["event_id"].to_pylist(), t["user_id"].to_pylist()):
            if e % _H3_MODULUS:
                continue
            lon = ((u * 37 + e) % 3400) / 10.0 - 170.0
            lat = ((u * 53 + e * 7) % 1600) / 10.0 - 80.0
            cell = hf.latlng_to_cell_scalar(lat, lon, res)
            rows.append(f"({e}, '{format(cell, 'x')}')")
        vals = ", ".join(rows)
        body = f"""
    WITH exp(event_id, h3) AS (VALUES {vals}),
    tied AS (SELECT exp.event_id, exp.h3
             FROM events JOIN exp ON events.event_id = exp.event_id)
    """
        if agg:
            return body + "SELECT h3, COUNT(*) AS n FROM tied GROUP BY 1"
        return body + "SELECT event_id, h3 FROM tied"
    except Exception:
        return None


@register("geo_h3_cells", _h3_real_oracle(5, agg=True))
def q_h3_cells(spark, sf_dir):
    """Real H3 res-5 cell counts over a deterministic event subset
    (reference: core/add_h3_column.py:57-84).  The ids come from the
    first-principles aperture-7 kernel (functions/h3_fine.py,
    published-vector-validated); the oracle embeds per-event expected
    cells from the independent scalar mirror as literals."""
    gt = _events_points(spark, sf_dir)
    sub = gt.df.filter(F.col("event_id") % _H3_MODULUS == 0)
    from geoparquet_io_spark.operators.add_columns import add_h3

    out = add_h3(sub, bbox_column="bbox", resolution=5)
    return out.groupBy("h3").agg(F.count("*").alias("n"))


@register("geo_h3_res9", _h3_real_oracle(9, agg=False))
def q_h3_res9(spark, sf_dir):
    """Per-event real H3 ids at working resolution 9 — the resolution a
    user exchanging cells with other H3 tooling actually runs at."""
    gt = _events_points(spark, sf_dir)
    sub = gt.df.filter(F.col("event_id") % _H3_MODULUS == 0)
    from geoparquet_io_spark.operators.add_columns import add_h3

    out = add_h3(sub, bbox_column="bbox", resolution=9)
    return out.select("event_id", "h3")


def _quadkey_prefix_oracle() -> str:
    from geoparquet_io_spark.functions.quadkey import tile_xy_sql

    tx, ty = tile_xy_sql("lon", "lat", 6)
    digits = "||".join(
        f"CAST((((ty >> {6 - 1 - i}) & 1) * 2 + ((tx >> {6 - 1 - i}) & 1)) AS VARCHAR)"
        for i in range(6)
    )
    return f"""
    WITH pts AS ({_EVT}),
    tiles AS (SELECT event_id, {tx} AS tx, {ty} AS ty FROM pts),
    qk AS (SELECT event_id, {digits} AS quadkey FROM tiles)
    SELECT substr(quadkey, 1, 3) AS qk_prefix, COUNT(*) AS n
    FROM qk GROUP BY 1
    """


@register("partition_quadkey_prefix", _quadkey_prefix_oracle())
def q_quadkey_prefix(spark, sf_dir):
    """Quadkey-prefix partition key distribution (the groupBy that
    partition_by_quadkey's preflight runs; core/partition_by_quadkey.py:123)."""
    gt = _events_points(spark, sf_dir).add_quadkey(zoom=6)
    return gt.df.groupBy(
        F.substring("quadkey", 1, 3).alias("qk_prefix")
    ).agg(F.count("*").alias("n"))


@register(
    "slice_head",
    """
    SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 20
    """,
)
def q_head(spark, sf_dir):
    """head slicing (reference: api/table.py:1426-1471) — made deterministic
    by pre-sorting on the key."""
    from geoparquet_io_spark.geotable import GeoTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return GeoTable(c, None).sort_column("c_custkey").head(20).df


@register(
    "geoparquet_roundtrip",
    f"""
    WITH pts AS ({_EVT})
    SELECT COUNT(*) AS n,
           ROUND(SUM(lon), 3) AS sum_x,
           ROUND(SUM(lat), 3) AS sum_y
    FROM pts
    WHERE lon >= -100 AND lon <= 100
    """,
)
def q_roundtrip(spark, sf_dir):
    """Write GeoParquet (executor-side footer writers) -> read back ->
    aggregate: puts the IO path itself inside the correctness gate."""
    import tempfile

    from geoparquet_io_spark.functions import geom as G
    import geoparquet_io_spark as gps

    gt = _events_points(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="gpq_rt_") + "/rt.parquet"
    gt.write(out)
    back = gps.read(spark, out)
    sub = back.extract(bbox=(-100, -1000, 100, 1000))
    return sub.df.select(
        G.st_x(F.col("geometry")).alias("x"),
        G.st_y(F.col("geometry")).alias("y"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("x"), 3).alias("sum_x"),
        F.round(F.sum("y"), 3).alias("sum_y"),
    )


@register(
    "tpch_q6_discount_band_low",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.02 AND l_discount <= 0.04
      AND l_quantity < 24
    """,
)
def q6(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo_share",
    """
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_share"))
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def q4(spark, sf_dir):
    """Semi join (EXISTS) — Spark left_semi."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate"))
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "anti_join_customers_without_orders",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    """,
)
def q_anti(spark, sf_dir):
    """Anti join (NOT EXISTS) — Spark left_anti."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "events_json_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_json_extract(spark, sf_dir):
    """Semi-structured column handling: JSON field extraction + agg
    (native get_json_object — no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


@register(
    "geo_grid_join",
    f"""
    WITH pts AS ({_CUST}),
    boxes AS (
      SELECT n_name,
             {NATION_BOX_SQL['xmin']} AS xmin, {NATION_BOX_SQL['ymin']} AS ymin,
             {NATION_BOX_SQL['xmax']} AS xmax, {NATION_BOX_SQL['ymax']} AS ymax
      FROM nation
    )
    SELECT p.c_custkey, b.n_name AS nation_name
    FROM pts p JOIN boxes b
      ON p.lon >= b.xmin AND p.lon <= b.xmax AND p.lat >= b.ymin AND p.lat <= b.ymax
    """,
)
def q_grid_join(spark, sf_dir):
    """The big-big PBSM grid join strategy over the same data as
    geo_spatial_join (inner form)."""
    from geoparquet_io_spark.functions import geom as G
    from geoparquet_io_spark.operators.joins import grid_spatial_join

    pts = _customer_points(spark, sf_dir)
    n = nation_boxes(load_table(spark, sf_dir, "nation"))
    n = n.withColumn("geometry", G.st_box("xmin", "ymin", "xmax", "ymax"))
    n = n.withColumn("rbox", G.bbox_struct(
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))) \
        .select("n_name", "geometry", "rbox")
    out = grid_spatial_join(
        pts.df, "geometry", n, "geometry", ["n_name"],
        cell_size=25.0, how="inner", left_bbox="bbox", right_bbox="rbox",
    )
    return out.select("c_custkey", F.col("n_name").alias("nation_name"))


@register(
    "geo_polygon_intersects",
    f"""
    WITH quads AS (
      SELECT c_custkey,
             {CUSTOMER_LON_SQL} - 0.05 AS xmin, {CUSTOMER_LAT_SQL} - 0.05 AS ymin,
             {CUSTOMER_LON_SQL} + 0.05 AS xmax, {CUSTOMER_LAT_SQL} + 0.05 AS ymax
      FROM customer
    )
    SELECT c_custkey FROM quads
    WHERE xmax >= -60 AND xmin <= 40 AND ymax >= -40 AND ymin <= 60
    """,
)
def q_polygon_intersects(spark, sf_dir):
    """Polygon-vs-polygon exact intersects (quads against an envelope) —
    exercises the segment/containment kernel, not just points."""
    from geoparquet_io_spark.functions import geom as G
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.testsupport.tables import customer_lonlat

    c = customer_lonlat(load_table(spark, sf_dir, "customer"))
    df = c.withColumn(
        "geometry",
        G.st_box(F.col("lon") - 0.05, F.col("lat") - 0.05,
                 F.col("lon") + 0.05, F.col("lat") + 0.05),
    )
    gt = GeoTable(df, GeoMeta(columns={"geometry": GeoColumnMeta()}))
    # no bbox column -> slow path: exact ST_Intersects against the envelope
    out = gt.extract(bbox=(-60, -40, 40, 60))
    return out.df.select("c_custkey")


@register(
    "sql_correlated_max",
    """
    SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders o
    WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_orderpriority = o.o_orderpriority)
    """,
)
def q_correlated(spark, sf_dir):
    """Correlated scalar subquery through spark.sql (the raw SQL surface
    the engine also exposes; Catalyst rewrites it to an aggregate join)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS total
        FROM orders_v o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders_v o2
                              WHERE o2.o_orderpriority = o.o_orderpriority)
    """)


def _morton_oracle(order: int = 16) -> str:
    """Morton key oracle: same envelope, same grid scaling as the Hilbert
    oracle, then the IDENTICAL magic-mask spread steps as
    functions/geokeys.morton_key."""
    from geoparquet_io_spark.functions.geokeys import morton_key_sql_ctes

    n = (1 << order) - 1
    gx = (f"LEAST({n}, GREATEST(0, CAST(floor((lon - bxmin) / (bxmax - bxmin)"
          f" * {n} + 0.5) AS BIGINT)))")
    gy = (f"LEAST({n}, GREATEST(0, CAST(floor((lat - bymin) / (bymax - bymin)"
          f" * {n} + 0.5) AS BIGINT)))")
    ctes = morton_key_sql_ctes(gx, gy, "pts, b", "event_id")
    return (
        f"WITH pts AS ({_EVT}), "
        "b AS (SELECT MIN(lon) AS bxmin, MIN(lat) AS bymin, MAX(lon) AS bxmax,"
        " MAX(lat) AS bymax FROM pts), "
        f"{ctes} SELECT event_id, mkey AS zkey FROM mfinal"
    )


@register("geo_zorder_key", _morton_oracle())
def q_zorder(spark, sf_dir):
    gt = _events_points(spark, sf_dir)
    out = gt.sort_zorder(keep_key=True)
    return out.df.select("event_id", F.col("__zorder").alias("zkey"))


def _geohash_oracle(precision: int = 7) -> str:
    from geoparquet_io_spark.functions.geokeys import geohash_sql_ctes

    ctes = geohash_sql_ctes("lon", "lat", "pts", "event_id", precision)
    return (f"WITH pts AS ({_EVT}), {ctes} "
            "SELECT event_id, geohash FROM gh")


@register("geo_geohash", _geohash_oracle())
def q_geohash(spark, sf_dir):
    from geoparquet_io_spark.functions.geokeys import geohash
    from geoparquet_io_spark.testsupport.tables import event_lonlat

    ev = event_lonlat(load_table(spark, sf_dir, "events"))
    return ev.select("event_id", geohash(F.col("lon"), F.col("lat"), 7).alias("geohash"))


def _h3_rollup_oracle(child_res: int = 9, parent_res: int = 5) -> str | None:
    """Literal res-`child_res` ids (independent scalar mirror) + the SAME
    native bit arithmetic the Spark side uses: parent = set the res
    field, force every digit below parent_res to 7.  Pure integer ops on
    both engines."""
    try:
        import pyarrow.parquet as pq

        from geoparquet_io_spark.functions import h3_fine as hf

        t = pq.read_table(f"{_H3_ORACLE_SF}/events.parquet",
                          columns=["event_id", "user_id"])
        rows = []
        for e, u in zip(t["event_id"].to_pylist(), t["user_id"].to_pylist()):
            if e % _H3_MODULUS:
                continue
            lon = ((u * 37 + e) % 3400) / 10.0 - 170.0
            lat = ((u * 53 + e * 7) % 1600) / 10.0 - 80.0
            rows.append(f"({e}, {hf.latlng_to_cell_scalar(lat, lon, child_res)})")
        vals = ", ".join(rows)
        fill = 0
        for r in range(parent_res + 1, 16):
            fill |= 7 << (45 - 3 * r)
        res_clear = ~(15 << 52) & ((1 << 63) - 1)
        return f"""
    WITH exp(event_id, h3) AS (VALUES {vals}),
    tied AS (SELECT exp.event_id, exp.h3
             FROM events JOIN exp ON events.event_id = exp.event_id),
    up AS (SELECT ((h3 & {res_clear}) | {parent_res << 52} | {fill})
                  AS h3_parent FROM tied)
    SELECT h3_parent, COUNT(*) AS n FROM up GROUP BY 1
    """
    except Exception:
        return None


@register("geo_h3_rollup", _h3_rollup_oracle())
def q_h3_rollup(spark, sf_dir):
    """Hierarchical H3 rollup: res-9 cells aggregated to their res-5
    parents with PURE native bit arithmetic (digit truncation is the H3
    parent relation) — the aggregation key never leaves whole-stage
    codegen; only the initial indexing is an Arrow-batched kernel."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    gt = _events_points(spark, sf_dir)
    sub = gt.df.filter(F.col("event_id") % _H3_MODULUS == 0)

    @pandas_udf(LongType())
    def _h3_long(lats, lons):
        import numpy as np

        from geoparquet_io_spark.functions import h3_fine as _hk

        la = lats.to_numpy(dtype=np.float64)
        lo = lons.to_numpy(dtype=np.float64)
        return pd.Series(_hk.latlng_to_cell(la, lo, 9))

    child_res, parent_res = 9, 5
    fill = 0
    for r in range(parent_res + 1, 16):
        fill |= 7 << (45 - 3 * r)
    res_clear = ~(15 << 52) & ((1 << 63) - 1)
    b = F.col("bbox")
    lat = (b["ymin"] + b["ymax"]) / 2
    lon = (b["xmin"] + b["xmax"]) / 2
    idx = _h3_long(lat, lon)
    parent = (
        idx.bitwiseAND(F.lit(res_clear).cast("long"))
        .bitwiseOR(F.lit(parent_res << 52).cast("long"))
        .bitwiseOR(F.lit(fill).cast("long"))
    )
    return (sub.select(parent.alias("h3_parent"))
            .groupBy("h3_parent").agg(F.count("*").alias("n")))


def _h3_full_agg_oracle(res: int = 9) -> str | None:
    """Aggregate oracle over ALL events: the distinct-cell count is
    computed at oracle-build time by the scalar mirror (one pass over the
    oracle-scale keys) and embedded as a literal, cross-tied to the live
    COUNT(*) of the events view."""
    try:
        import pyarrow.parquet as pq

        from geoparquet_io_spark.functions import h3_fine as hf

        t = pq.read_table(f"{_H3_ORACLE_SF}/events.parquet",
                          columns=["event_id", "user_id"])
        cells = set()
        n = 0
        for e, u in zip(t["event_id"].to_pylist(), t["user_id"].to_pylist()):
            lon = ((u * 37 + e) % 3400) / 10.0 - 170.0
            lat = ((u * 53 + e * 7) % 1600) / 10.0 - 80.0
            cells.add(hf.latlng_to_cell_scalar(lat, lon, res))
            n += 1
        return f"""
    SELECT CAST({len(cells)} AS BIGINT) AS distinct_cells,
           COUNT(*) AS n_points
    FROM events
    """
    except Exception:
        return None


@register("geo_h3_res9_full", _h3_full_agg_oracle())
def q_h3_res9_full(spark, sf_dir):
    """Full-table res-9 indexing (every event row through the aperture-7
    kernel) + distinct-cell aggregate — the bench-scale H3 measurement."""
    gt = _events_points(spark, sf_dir)
    from geoparquet_io_spark.operators.add_columns import add_h3

    out = add_h3(gt.df, bbox_column="bbox", resolution=9)
    return out.agg(
        F.countDistinct("h3").alias("distinct_cells"),
        F.count("*").alias("n_points"),
    )


@register(
    "geo_pruned_read",
    f"""
    WITH pts AS ({_EVT})
    SELECT COUNT(*) AS n,
           ROUND(SUM(lon), 3) AS sum_x,
           ROUND(SUM(lat), 3) AS sum_y
    FROM pts
    WHERE lon >= -170 AND lon <= -10 AND lat >= 5 AND lat <= 80
    """,
)
def q_pruned_read(spark, sf_dir):
    """Manifest-based file skipping inside the correctness gate
    (operators/maintenance.py): quadkey-partitioned write -> distributed
    footer manifest -> prune files by bbox -> exact filter.  The pruned
    scan must agree with a full scan (and the report must show real
    skipping — asserted in tests/test_maintenance.py)."""
    import tempfile

    from geoparquet_io_spark.functions import geom as G
    from geoparquet_io_spark.operators.maintenance import (build_manifest,
                                                           read_pruned)

    gt = _events_points(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="gpq_prune_") + "/qk"
    gt.partition_by_quadkey(out, partition_resolution=2)
    bbox = (-170.0, 5.0, -10.0, 80.0)
    pruned, _report = read_pruned(spark, out, bbox,
                                  manifest=build_manifest(spark, out))
    sub = pruned.extract(bbox=bbox)
    return sub.df.select(
        G.st_x(F.col("geometry")).alias("x"),
        G.st_y(F.col("geometry")).alias("y"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("x"), 3).alias("sum_x"),
        F.round(F.sum("y"), 3).alias("sum_y"),
    )


@register(
    "geo_area_perimeter_simplify",
    """
    SELECT n_nationkey,
           ROUND(CAST(n_nationkey + 1 AS DOUBLE)
                 * CAST(n_nationkey + 2 AS DOUBLE), 6) AS area,
           ROUND(2.0 * (CAST(n_nationkey + 1 AS DOUBLE)
                        + CAST(n_nationkey + 2 AS DOUBLE)), 6) AS perimeter,
           9 AS npts_before, 5 AS npts_after
    FROM nation
    """,
)
def q_area_perimeter_simplify(spark, sf_dir):
    """ST_Area / ST_Length / ST_NPoints / ST_Simplify over per-nation
    rectangles that carry redundant collinear edge midpoints: Douglas-
    Peucker drops exactly the 4 midpoints (9 -> 5 vertices) while area
    and perimeter are invariant — all checked against the analytic
    oracle.  Functions: functions/wkb.py:area,length,simplify,npoints
    (reference surface: DuckDB spatial ST_* — SURVEY §2.11)."""
    from geoparquet_io_spark.functions import geom as G

    n = load_table(spark, sf_dir, "nation")
    w = (F.col("n_nationkey") + 1).cast("double")
    h = (F.col("n_nationkey") + 2).cast("double")
    s = lambda c: c.cast("string")  # noqa: E731
    wkt = F.concat(
        F.lit("POLYGON((0 0, "), s(w / 2), F.lit(" 0, "),
        s(w), F.lit(" 0, "), s(w), F.lit(" "), s(h / 2), F.lit(", "),
        s(w), F.lit(" "), s(h), F.lit(", "), s(w / 2), F.lit(" "), s(h),
        F.lit(", 0 "), s(h), F.lit(", 0 "), s(h / 2), F.lit(", 0 0))"),
    )
    g = n.select("n_nationkey", G.st_geomfromtext(wkt).alias("geom"))
    simp = g.withColumn("geom_s", G.st_simplify(F.col("geom"), 0.01))
    return simp.select(
        "n_nationkey",
        F.round(G.st_area(F.col("geom_s")), 6).alias("area"),
        F.round(G.st_length(F.col("geom_s")), 6).alias("perimeter"),
        G.st_npoints(F.col("geom")).alias("npts_before"),
        G.st_npoints(F.col("geom_s")).alias("npts_after"),
    )


@register(
    "geo_hull_buffer",
    """
    SELECT n_nationkey,
           5 AS hull_npts,
           ROUND(CAST(n_nationkey + 1 AS DOUBLE)
                 * CAST(n_nationkey + 2 AS DOUBLE), 6) AS hull_area,
           ROUND(2.0 * (CAST(n_nationkey + 1 AS DOUBLE)
                        + CAST(n_nationkey + 2 AS DOUBLE)), 6) AS hull_perim,
           ROUND(0.5 * 32 * CAST(n_nationkey + 1 AS DOUBLE)
                 * CAST(n_nationkey + 1 AS DOUBLE) * sin(2 * pi() / 32), 6)
             AS buf_area,
           ROUND(2.0 * 32 * CAST(n_nationkey + 1 AS DOUBLE)
                 * sin(pi() / 32), 6) AS buf_perim
    FROM nation
    """,
)
def q_hull_buffer(spark, sf_dir):
    """ST_ConvexHull + ST_Buffer(point): the hull of the midpoint-laden
    rectangle collapses to its 4 corners (5 vertices with closure, exact
    area w*h); the n-gon point buffer's area/perimeter match the regular-
    polygon closed forms 0.5*n*r^2*sin(2pi/n) / 2*n*r*sin(pi/n) to 1e-6
    (functions/wkb.py:convex_hull,buffer_point)."""
    from geoparquet_io_spark.functions import geom as G

    n = load_table(spark, sf_dir, "nation")
    w = (F.col("n_nationkey") + 1).cast("double")
    h = (F.col("n_nationkey") + 2).cast("double")
    s = lambda c: c.cast("string")  # noqa: E731
    wkt = F.concat(
        F.lit("POLYGON((0 0, "), s(w / 2), F.lit(" 0, "),
        s(w), F.lit(" 0, "), s(w), F.lit(" "), s(h / 2), F.lit(", "),
        s(w), F.lit(" "), s(h), F.lit(", "), s(w / 2), F.lit(" "), s(h),
        F.lit(", 0 "), s(h), F.lit(", 0 "), s(h / 2), F.lit(", 0 0))"),
    )
    g = n.select(
        "n_nationkey",
        G.st_convexhull(G.st_geomfromtext(wkt)).alias("hull"),
        G.st_buffer_point(w / 2, h / 2, w, segments=32).alias("buf"),
    )
    return g.select(
        "n_nationkey",
        G.st_npoints(F.col("hull")).alias("hull_npts"),
        F.round(G.st_area(F.col("hull")), 6).alias("hull_area"),
        F.round(G.st_length(F.col("hull")), 6).alias("hull_perim"),
        F.round(G.st_area(F.col("buf")), 6).alias("buf_area"),
        F.round(G.st_length(F.col("buf")), 6).alias("buf_perim"),
    )


@register(
    "geo_dissolve_hull",
    """
    SELECT c_nationkey, 4 AS n_hull_points,
           ROUND(CAST(c_nationkey + 1 AS DOUBLE)
                 * CAST(c_nationkey + 2 AS DOUBLE), 6) AS hull_area
    FROM (SELECT DISTINCT c_nationkey FROM customer)
    """,
)
def q_dissolve_hull(spark, sf_dir):
    """Group-wise dissolve (operators/dissolve.py:dissolve_hull): one
    convex hull per nation via map-side PARTIAL hulls merged per group
    (the shuffle moves hull vertices, never raw point sets — hulls
    compose).  Synthetic layout: per nation, customers sit on the four
    corners of a (n+1) x (n+2) rectangle plus its center (c_custkey % 5
    picks the slot); the hull must drop the center and report exactly 4
    vertices with the analytic area."""
    from geoparquet_io_spark.functions import geom as G
    from geoparquet_io_spark.operators.dissolve import dissolve_hull

    c = load_table(spark, sf_dir, "customer")
    w = (F.col("c_nationkey") + 1).cast("double")
    h = (F.col("c_nationkey") + 2).cast("double")
    m = F.col("c_custkey") % 5
    x = (F.when(m.isin(1, 2), w).when(m == 4, w / 2).otherwise(F.lit(0.0)))
    y = (F.when(m.isin(2, 3), h).when(m == 4, h / 2).otherwise(F.lit(0.0)))
    pts = c.select("c_nationkey", G.st_point(x, y).alias("geometry"))
    out = dissolve_hull(pts, "c_nationkey")
    return out.select("c_nationkey", "n_hull_points",
                      F.round("hull_area", 6).alias("hull_area"))


@register(
    "sql_geo_surface",
    f"""
    WITH pts AS ({_EVT})
    SELECT 'POINT' AS gtype, COUNT(*) AS n,
           ROUND(SUM(lon), 3) AS sum_x,
           ROUND(SUM(abs(lat)), 3) AS sum_abs_y
    FROM pts
    """,
)
def q_sql_surface(spark, sf_dir):
    """The SQL path (functions/sqlreg.py:register_sql_functions): the
    same Arrow-batched ST_* UDFs, invoked through plain spark.sql over a
    temp view — exactly the plan the fluent API builds, proving SQL and
    column APIs share one execution surface."""
    from geoparquet_io_spark.functions.sqlreg import register_sql_functions

    register_sql_functions(spark)
    gt = _events_points(spark, sf_dir)
    gt.df.createOrReplaceTempView("sql_geo_events")
    return spark.sql("""
        SELECT st_geometrytype(geometry) AS gtype, COUNT(*) AS n,
               ROUND(SUM(st_x(geometry)), 3) AS sum_x,
               ROUND(SUM(abs(st_y(geometry))), 3) AS sum_abs_y
        FROM sql_geo_events
        GROUP BY st_geometrytype(geometry)
    """)


def _grid_cluster_oracle(cell: float = 5.0, min_pts: int = 8) -> str:
    from geoparquet_io_spark.operators.clustering import cell_id_sql

    cs = repr(float(cell))
    cid = cell_id_sql("cx", "cy")
    return f"""
    WITH RECURSIVE pts AS (SELECT event_id, {EVENT_LON_SQL} AS lon,
                                  {EVENT_LAT_SQL} AS lat FROM events),
    cells AS (SELECT CAST(floor(lon / {cs}) AS BIGINT) AS cx,
                     CAST(floor(lat / {cs}) AS BIGINT) AS cy,
                     count(*) AS n
              FROM pts GROUP BY 1, 2),
    dense AS (SELECT cx, cy, {cid} AS cell FROM cells WHERE n >= {min_pts}),
    edges AS (SELECT a.cell AS src, b.cell AS dst
              FROM dense a JOIN dense b
                ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node),
    comp AS (SELECT node AS cell, MIN(r) AS cluster FROM reach GROUP BY node),
    lab AS (SELECT p.lon, p.lat, d.cell, c.cluster
            FROM pts p
            JOIN dense d ON d.cx = CAST(floor(p.lon / {cs}) AS BIGINT)
                        AND d.cy = CAST(floor(p.lat / {cs}) AS BIGINT)
            JOIN comp c ON c.cell = d.cell)
    SELECT cluster, CAST(count(*) AS BIGINT) AS n_points,
           CAST(count(DISTINCT cell) AS BIGINT) AS n_cells,
           MIN(lon) AS xmin, MIN(lat) AS ymin,
           MAX(lon) AS xmax, MAX(lat) AS ymax
    FROM lab GROUP BY cluster
    """


@register("geo_grid_density_clusters", _grid_cluster_oracle())
def q_grid_density_clusters(spark, sf_dir):
    """DBSCAN-style grid-density clustering
    (operators/clustering.py:grid_density_clusters): rows shuffle once
    (cell count groupBy); clusters are connected components over
    adjacent dense CELLS — graph size bounded by occupied cells, never
    rows.  Oracle recomputes the fixpoint as a recursive CTE."""
    from geoparquet_io_spark.operators.clustering import (
        cluster_summary, grid_density_clusters)
    from geoparquet_io_spark.testsupport.tables import event_lonlat

    ev = event_lonlat(load_table(spark, sf_dir, "events"))
    labeled = grid_density_clusters(ev, cell_size=5.0, min_pts=8)
    return cluster_summary(labeled)
