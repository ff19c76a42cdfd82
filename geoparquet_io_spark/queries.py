"""Driver-contract query registry: every implemented operator gets
(a) a Spark implementation through this engine's own operator layer and
(b) an equivalent ANSI-SQL oracle string for DuckDB.

Determinism rules (both sides MUST follow):
- float aggregates rounded to >=4 decimals (sum order differs between engines)
- per-row arithmetic left exact (identical IEEE double expressions)
- every computed column aliased identically in Spark and SQL
- timestamps compared as formatted strings / epoch numbers
- no LIMIT without a total deterministic ORDER BY + tiebreak
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_io_spark.geotable import GeoTable
from geoparquet_io_spark.meta import GeoMeta, GeoColumnMeta
from geoparquet_io_spark.functions import geom as G
from geoparquet_io_spark.testsupport.tables import (
    load_table,
    event_lonlat,
    customer_lonlat,
    nation_boxes,
    EVENT_LON_SQL,
    EVENT_LAT_SQL,
    CUSTOMER_LON_SQL,
    CUSTOMER_LAT_SQL,
    NATION_BOX_SQL,
)

# registry: name -> (spark_fn, oracle_sql | None)
REGISTRY: dict[str, tuple] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(already registered; pick a distinct name)")
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _points_table(df, geo_types=("Point",)) -> GeoTable:
    """lon/lat table -> GeoTable with WKB geometry + bbox covering column.
    The bbox is built NATIVELY from the known lon/lat (a point's envelope
    is itself) — one less UDF pass than add_bbox() re-deriving it from the
    WKB; add_bbox proper is exercised by the polygon queries/tests.

    NOTE on parallelism: the testdata files are single-row-group, so this
    scan is one partition.  A blanket spread() here was MEASURED NET
    NEGATIVE at sf0.1 (shuffle+task overhead ~0.3-0.9s exceeds the
    single-core UDF cost for 100k-row inputs); spread() is applied only
    in operators whose per-row/per-pair compute dominates
    (operators/skew.py:spread)."""
    df = df.withColumn("geometry", G.st_point(F.col("lon"), F.col("lat")))
    df = df.withColumn(
        "bbox",
        G.bbox_struct(F.col("lon"), F.col("lat"), F.col("lon"), F.col("lat")),
    )
    geo = GeoMeta(columns={"geometry": GeoColumnMeta(geometry_types=list(geo_types),
                                                     crs="EPSG:4326")})
    geo.set_covering("bbox")
    return GeoTable(df, geo)


def _events_points(spark: SparkSession, sf_dir: str) -> GeoTable:
    """events -> GeoTable of WKB points with bbox covering column."""
    return _points_table(event_lonlat(load_table(spark, sf_dir, "events")))


def _customer_points(spark: SparkSession, sf_dir: str) -> GeoTable:
    return _points_table(customer_lonlat(load_table(spark, sf_dir, "customer")))


# ===========================================================================
# Relational core (scan / filter / project / agg / join / window / sort)
# ===========================================================================

@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT o_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
    return (
        F.broadcast(c).join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .withColumn("orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .select("o_orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_region_revenue",
    """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
)
def q5(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    dim = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    )
    return (
        li.join(dim, li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "extract_where_columns",
    """
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 45 AND l_discount < 0.02 AND l_returnflag = 'N'
    """,
)
def q_extract(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    gt = GeoTable(li, None)
    out = gt.extract(
        columns=["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"],
        where="l_quantity >= 45 AND l_discount < 0.02 AND l_returnflag = 'N'",
    )
    return out.df


@register(
    "sort_column_roworder",
    """
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    WHERE o_orderstatus = 'F'
    QUALIFY rn <= 500
    """,
)
def q_sort_column(spark, sf_dir):
    """Top-500 by (price desc, key): orderBy().limit(500) runs as a
    distributed TakeOrderedAndProject (per-partition top-500, tiny merge)
    — the global ROW_NUMBER window over the full table would funnel every
    row through ONE reducer; renumbering only the surviving 500 gives the
    identical result with no full-table single-partition pass (plan
    asserted in tests/test_plans.py)."""
    from geoparquet_io_spark.operators.sorts import sort_column

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    top = sort_column(o.select("o_orderkey", "o_totalprice"),
                      ["o_totalprice", "o_orderkey"], [True, False]).limit(500)
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.withColumn("rn", F.row_number().over(w))


@register(
    "stats_customer",
    """
    SELECT 'c_custkey' AS column_name,
           (SELECT COUNT(*) FILTER (WHERE c_custkey IS NULL) FROM customer) AS nulls,
           (SELECT CAST(MIN(c_custkey) AS VARCHAR) FROM customer) AS min_value,
           (SELECT CAST(MAX(c_custkey) AS VARCHAR) FROM customer) AS max_value,
           (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS distinct_count
    UNION ALL
    SELECT 'c_mktsegment',
           (SELECT COUNT(*) FILTER (WHERE c_mktsegment IS NULL) FROM customer),
           (SELECT MIN(c_mktsegment) FROM customer),
           (SELECT MAX(c_mktsegment) FROM customer),
           (SELECT COUNT(DISTINCT c_mktsegment) FROM customer)
    UNION ALL
    SELECT 'c_nationkey',
           (SELECT COUNT(*) FILTER (WHERE c_nationkey IS NULL) FROM customer),
           (SELECT CAST(MIN(c_nationkey) AS VARCHAR) FROM customer),
           (SELECT CAST(MAX(c_nationkey) AS VARCHAR) FROM customer),
           (SELECT COUNT(DISTINCT c_nationkey) FROM customer)
    """,
)
def q_stats(spark, sf_dir):
    from geoparquet_io_spark.operators.stats import stats

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_nationkey")
    s = stats(c, approx=False)
    return s.select(
        F.col("column").alias("column_name"),
        F.col("nulls"),
        F.col("min").alias("min_value"),
        F.col("max").alias("max_value"),
        F.col("distinct").alias("distinct_count"),
    )


@register(
    "partition_analysis_orders",
    """
    WITH counts AS (
      SELECT o_orderpriority AS k, COUNT(*) AS c FROM orders GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS num_partitions,
           CAST(SUM(c) AS BIGINT) AS total_rows,
           CAST(MIN(c) AS BIGINT) AS min_rows, CAST(MAX(c) AS BIGINT) AS max_rows,
           CAST(ROUND(AVG(c), 4) AS DOUBLE) AS avg_rows,
           CAST(ROUND(CAST(median(c) AS DOUBLE), 4) AS DOUBLE) AS median_rows
    FROM counts
    """,
)
def q_partition_analysis(spark, sf_dir):
    from geoparquet_io_spark.operators.stats import analyze_partition_strategy

    o = load_table(spark, sf_dir, "orders")
    a = analyze_partition_strategy(o, "o_orderpriority")
    return spark.createDataFrame(
        [(a.num_partitions, a.total_rows, a.min_rows, a.max_rows,
          round(a.avg_rows, 4), round(a.median_rows, 4))],
        "num_partitions long, total_rows long, min_rows long, max_rows long,"
        " avg_rows double, median_rows double",
    )


@register(
    "partition_preview_events",
    """
    SELECT event_type AS value, COUNT(*) AS count
    FROM events GROUP BY 1
    ORDER BY count DESC, value LIMIT 5
    """,
)
def q_partition_preview(spark, sf_dir):
    from geoparquet_io_spark.operators.stats import preview_partition

    ev = load_table(spark, sf_dir, "events")
    return preview_partition(ev, "event_type", 5)


# ===========================================================================
# Geometry pipeline (WKB roundtrip, bbox paths, intersects, join, transforms)
# ===========================================================================

_EVT_PTS_SQL = f"""
  SELECT event_id, {EVENT_LON_SQL} AS lon, {EVENT_LAT_SQL} AS lat FROM events
"""

_CUST_PTS_SQL = f"""
  SELECT c_custkey, {CUSTOMER_LON_SQL} AS lon, {CUSTOMER_LAT_SQL} AS lat FROM customer
"""


@register(
    "geo_bbox_fast_path",
    f"""
    WITH pts AS ({_EVT_PTS_SQL})
    SELECT event_id, lon AS x, lat AS y FROM pts
    WHERE lon <= 40 AND lon >= -60 AND lat <= 60 AND lat >= -40
    """,
)
def q_bbox_fast(spark, sf_dir):
    gt = _events_points(spark, sf_dir)
    out = gt.extract(bbox=(-60, -40, 40, 60))
    # x/y read back THROUGH the WKB column (one fused UDF call) — proves
    # the binary roundtrip
    c = G.st_centroid_xy(F.col("geometry"))
    return out.df.select("event_id", c["x"].alias("x"), c["y"].alias("y"))


@register(
    "geo_bbox_slow_path",
    f"""
    WITH pts AS ({_EVT_PTS_SQL})
    SELECT event_id, lon AS x, lat AS y FROM pts
    WHERE lon <= 40 AND lon >= -60 AND lat <= 60 AND lat >= -40
    """,
)
def q_bbox_slow(spark, sf_dir):
    gt = _events_points(spark, sf_dir)
    no_bbox = GeoTable(gt.df.drop("bbox"), gt.geo)  # force exact-intersects path
    out = no_bbox.extract(bbox=(-60, -40, 40, 60))
    c = G.st_centroid_xy(F.col("geometry"))
    return out.df.select("event_id", c["x"].alias("x"), c["y"].alias("y"))


@register(
    "geo_triangle_filter",
    f"""
    WITH pts AS ({_EVT_PTS_SQL})
    SELECT event_id FROM pts
    WHERE ((120*(lat+60) >= 0 AND (-60*(lat+60) - 120*(lon-60)) >= 0
            AND (-60*(lat-60) + 120*lon) >= 0)
        OR (120*(lat+60) <= 0 AND (-60*(lat+60) - 120*(lon-60)) <= 0
            AND (-60*(lat-60) + 120*lon) <= 0))
    """,
)
def q_triangle(spark, sf_dir):
    gt = _events_points(spark, sf_dir)
    out = gt.extract(geometry="POLYGON ((-60 -60, 60 -60, 0 60, -60 -60))")
    return out.df.select("event_id")


@register(
    "geo_add_bbox_quads",
    f"""
    WITH pts AS ({_CUST_PTS_SQL})
    SELECT c_custkey,
           lon - 0.05 AS xmin, lat - 0.05 AS ymin,
           lon + 0.05 AS xmax, lat + 0.05 AS ymax
    FROM pts
    """,
)
def q_add_bbox(spark, sf_dir):
    """Box polygons through WKB -> add_bbox -> read struct fields back."""
    c = customer_lonlat(load_table(spark, sf_dir, "customer"))
    df = c.withColumn(
        "geometry",
        G.st_box(F.col("lon") - 0.05, F.col("lat") - 0.05,
                 F.col("lon") + 0.05, F.col("lat") + 0.05),
    )
    gt = GeoTable(df, GeoMeta(columns={"geometry": GeoColumnMeta()})).add_bbox()
    b = F.col("bbox")
    return gt.df.select(
        "c_custkey",
        b["xmin"].alias("xmin"), b["ymin"].alias("ymin"),
        b["xmax"].alias("xmax"), b["ymax"].alias("ymax"),
    )


@register(
    "geo_spatial_join",
    f"""
    WITH pts AS ({_CUST_PTS_SQL}),
    boxes AS (
      SELECT n_nationkey, n_name,
             {NATION_BOX_SQL['xmin']} AS xmin, {NATION_BOX_SQL['ymin']} AS ymin,
             {NATION_BOX_SQL['xmax']} AS xmax, {NATION_BOX_SQL['ymax']} AS ymax
      FROM nation
    )
    SELECT p.c_custkey, b.n_name AS nation_name
    FROM pts p LEFT JOIN boxes b
      ON p.lon >= b.xmin AND p.lon <= b.xmax AND p.lat >= b.ymin AND p.lat <= b.ymax
    """,
)
def q_spatial_join(spark, sf_dir):
    """Broadcast bbox-prefilter + exact-intersects left join
    (points vs disjoint nation rectangles)."""
    from geoparquet_io_spark.operators.joins import spatial_join

    pts = _customer_points(spark, sf_dir)
    n = nation_boxes(load_table(spark, sf_dir, "nation"))
    n = n.withColumn("geometry", G.st_box("xmin", "ymin", "xmax", "ymax"))
    n = n.withColumn(
        "bbox",
        G.bbox_struct(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")),
    ).select("n_nationkey", "n_name", "geometry", "bbox")
    out = spatial_join(
        pts.df, "geometry", "bbox", n, "geometry", "bbox",
        right_columns=["n_name"], how="left",
    )
    return out.select("c_custkey", F.col("n_name").alias("nation_name"))


@register(
    "geo_quadkey_z6",
    None,  # filled in below with generated SQL
)
def q_quadkey(spark, sf_dir):
    gt = _events_points(spark, sf_dir)
    out = gt.add_quadkey(zoom=6)
    return out.df.select("event_id", "quadkey")


def _quadkey_oracle() -> str:
    from geoparquet_io_spark.functions.quadkey import tile_xy_sql

    tx, ty = tile_xy_sql("lon", "lat", 6)
    digits = "||".join(
        f"CAST((((ty >> {6 - 1 - i}) & 1) * 2 + ((tx >> {6 - 1 - i}) & 1)) AS VARCHAR)"
        for i in range(6)
    )
    return f"""
    WITH pts AS ({_EVT_PTS_SQL}),
    tiles AS (SELECT event_id, {tx} AS tx, {ty} AS ty FROM pts)
    SELECT event_id, {digits} AS quadkey FROM tiles
    """


REGISTRY["geo_quadkey_z6"] = (REGISTRY["geo_quadkey_z6"][0], _quadkey_oracle())


@register("geo_hilbert_key", None)  # oracle generated below
def q_hilbert(spark, sf_dir):
    gt = _events_points(spark, sf_dir)
    sorted_gt = gt.sort_hilbert(keep_key=True)
    return sorted_gt.df.select("event_id", F.col("__hilbert").alias("hkey"))


def _hilbert_oracle(order: int = 16) -> str:
    """Unrolled Hilbert xy->d as chained CTEs — a true SQL oracle for the
    numpy kernel (same algorithm, same integer ops)."""
    n = (1 << order) - 1
    # grid scaling identical to hilbert.scale_to_grid: floor((v-lo)/span*n + 0.5)
    gx = (f"LEAST({n}, GREATEST(0, CAST(floor((lon - bxmin) / (bxmax - bxmin) * {n} + 0.5) AS BIGINT)))")
    gy = (f"LEAST({n}, GREATEST(0, CAST(floor((lat - bymin) / (bymax - bymin) * {n} + 0.5) AS BIGINT)))")
    ctes = [
        f"pts AS ({_EVT_PTS_SQL})",
        "b AS (SELECT MIN(lon) AS bxmin, MIN(lat) AS bymin, MAX(lon) AS bxmax, MAX(lat) AS bymax FROM pts)",
        f"h0 AS (SELECT event_id, {gx} AS x, {gy} AS y, CAST(0 AS BIGINT) AS d FROM pts, b)",
    ]
    lvl = 0
    for i in range(order):
        s = 1 << (order - 1 - i)
        rx = f"(CASE WHEN (x & {s}) != 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) != 0 THEN 1 ELSE 0 END)"
        quad = (f"(CASE WHEN {rx}=0 AND {ry}=0 THEN 0 WHEN {rx}=0 AND {ry}=1 THEN 1 "
                f"WHEN {rx}=1 AND {ry}=1 THEN 2 ELSE 3 END)")
        new_x = f"(CASE WHEN {ry}=1 THEN x WHEN {rx}=1 THEN {s}-1-y ELSE y END)"
        new_y = f"(CASE WHEN {ry}=1 THEN y WHEN {rx}=1 THEN {s}-1-x ELSE x END)"
        ctes.append(
            f"h{lvl+1} AS (SELECT event_id, {new_x} AS x, {new_y} AS y, "
            f"d + CAST({s} AS BIGINT)*{s}*{quad} AS d FROM h{lvl})"
        )
        lvl += 1
    return "WITH " + ",\n".join(ctes) + f"\nSELECT event_id, d AS hkey FROM h{lvl}"


REGISTRY["geo_hilbert_key"] = (REGISTRY["geo_hilbert_key"][0], _hilbert_oracle())


@register(
    "geo_reproject_mercator",
    f"""
    WITH pts AS ({_EVT_PTS_SQL})
    SELECT event_id,
           ROUND(lon * 20037508.342789244 / 180.0, 4) + 0.0 AS mx,
           ROUND(ln(tan((90.0 + LEAST(GREATEST(lat, -89.9999), 89.9999)) * pi() / 360.0)) * 6378137.0, 4) + 0.0 AS my
    FROM pts
    """,
)
def q_reproject(spark, sf_dir):
    # + 0.0 on both sides normalizes IEEE signed zero: at lat=0 the mercator-y
    # rounds to -0.0 in DuckDB but +0.0 in Spark; they compare equal as floats
    # but hash differently as bytes.
    gt = _events_points(spark, sf_dir)
    out = gt.reproject("EPSG:3857")
    return out.df.select(
        "event_id",
        (F.round(G.st_x(F.col("geometry")), 4) + F.lit(0.0)).alias("mx"),
        (F.round(G.st_y(F.col("geometry")), 4) + F.lit(0.0)).alias("my"),
    )


@register(
    "geo_consecutive_distance",
    f"""
    WITH pts AS ({_EVT_PTS_SQL}),
    seq AS (
      SELECT lon, lat,
             LAG(lon) OVER (ORDER BY event_id) AS plon,
             LAG(lat) OVER (ORDER BY event_id) AS plat
      FROM pts
    )
    SELECT ROUND(AVG(sqrt((lon-plon)*(lon-plon) + (lat-plat)*(lat-plat))), 4) AS avg_consec_dist,
           COUNT(*) AS n_pairs
    FROM seq WHERE plon IS NOT NULL
    """,
)
def q_consec_dist(spark, sf_dir):
    """check_spatial's consecutive-pair self-join, via window lag + the
    exact ST_Distance UDF on WKB points (reference: check_spatial_order.py:13-29)."""
    gt = _events_points(spark, sf_dir)
    w = Window.orderBy("event_id")
    df = gt.df.withColumn("prev_geom", F.lag("geometry").over(w)).filter(
        F.col("prev_geom").isNotNull()
    )
    d = df.select(G.st_distance(F.col("geometry"), F.col("prev_geom")).alias("d"))
    return d.agg(
        F.round(F.avg("d"), 4).alias("avg_consec_dist"),
        F.count("*").alias("n_pairs"),
    )


@register(
    "geo_kdtree_cells",
    f"""
    WITH pts AS ({_EVT_PTS_SQL}),
    m1 AS (SELECT median(lon) AS mx FROM pts),
    l1 AS (SELECT p.*, CASE WHEN lon < mx THEN '0' ELSE '1' END AS b1 FROM pts p, m1),
    m2 AS (SELECT b1, median(lat) AS my FROM l1 GROUP BY b1),
    l2 AS (SELECT l1.*, CASE WHEN lat < my THEN '0' ELSE '1' END AS b2
           FROM l1 JOIN m2 USING (b1))
    SELECT b1 || b2 AS cell, COUNT(*) AS n FROM l2 GROUP BY 1
    """,
)
def q_kdtree(spark, sf_dir):
    from geoparquet_io_spark.operators.add_columns import add_kdtree

    ev = event_lonlat(load_table(spark, sf_dir, "events"))
    out = add_kdtree(ev, x_column="lon", y_column="lat", iterations=2, exact=True)
    return out.groupBy(F.col("kdtree_cell").alias("cell")).agg(F.count("*").alias("n"))


def all_queries():
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def all_oracles():
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}


# training-data operator queries register themselves on import (kept in a
# separate module for size; shares this REGISTRY)
from geoparquet_io_spark import queries_data  # noqa: E402,F401
from geoparquet_io_spark import queries_geo2  # noqa: E402,F401
from geoparquet_io_spark import queries_ann  # noqa: E402,F401
from geoparquet_io_spark import queries_crs  # noqa: E402,F401
from geoparquet_io_spark import queries_tpch  # noqa: E402,F401
from geoparquet_io_spark import queries_curate  # noqa: E402,F401
from geoparquet_io_spark import queries_ts  # noqa: E402,F401
from geoparquet_io_spark import queries_nlp  # noqa: E402,F401
from geoparquet_io_spark import queries_formats  # noqa: E402,F401
