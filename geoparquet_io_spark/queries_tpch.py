"""Additional TPC-H-shaped relational queries over the synthetic star
schema — widens the SQL surface the engine demonstrably gets right
(semi/anti joins, disjunctive predicate pushdown, double aggregation,
scalar-max join-back), each with a DuckDB oracle.

The synthetic tables lack l_commitdate / l_shipmode / p_container, so
q4/q19 are adapted to the available columns while keeping the original
query's operator shape (marked "adapted").  Shared determinism rules in
queries.py apply.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geoparquet_io_spark.queries import register
from geoparquet_io_spark.testsupport.tables import load_table


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark, sf_dir):
    """Pure scan-aggregate: all four predicates reach the parquet scan
    (PushedFilters), the sum is a map-side partial — the minimal
    one-stage TPC-H query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"))
    )


@register(
    "tpch_q4_priority_semijoin",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4(spark, sf_dir):
    """q4 adapted (no l_commitdate in the synthetic schema): EXISTS
    becomes a LEFT SEMI join whose condition references both sides —
    orders with any lineitem shipped >60 days after the order date."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q13_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13(spark, sf_dir):
    """Customer order-count histogram: LEFT OUTER join (customers with
    zero orders must survive as c_count=0) + two-level aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15(spark, sf_dir):
    """Top supplier by quarterly revenue: the scalar MAX is re-joined as
    a broadcast single-row aggregate (no collect, no second scan of
    lineitem — rev is reused for both sides).  Revenue is rounded BEFORE
    the max compare so both engines rank identical values."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("total_revenue"))
    top = rev.join(F.broadcast(mx), "total_revenue")
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(top, s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q18_large_volume",
    """
    SELECT c_custkey, c_name, o_orderkey,
           ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(sum_qty, 2) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    ) t
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18(spark, sf_dir):
    """Large-volume orders: aggregate-then-filter (HAVING) feeding two
    equi-joins; the aggregated side is small after the HAVING, so both
    joins broadcast it."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


@register(
    "tpch_q19_disjunctive_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19(spark, sf_dir):
    """q19 adapted (no p_container / l_shipmode): OR-of-ANDs across both
    join sides — Catalyst extracts the common single-side conjuncts for
    pushdown while the cross-side disjunction evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1) & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi)
    )
    return (
        j.filter(arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20)
                 | arm("Brand#3", 35, 20, 30))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


@register(
    "tpch_void_orders_antijoin",
    """
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey)
    GROUP BY o_orderstatus
    """,
)
def q_void_orders(spark, sf_dir):
    """Referential-integrity audit via LEFT ANTI join: orders with no
    lineitems (the q22 NOT EXISTS shape on columns this schema has)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark, sf_dir):
    """TPC-H q7 (volume shipping between two nations): a 5-way star join
    where both nation dimensions broadcast; the disjunctive nation pair
    filter evaluates post-join on the two broadcast-joined name columns.
    The only shuffles are the lineitem->orders->customer equi-joins plus
    the final small groupBy."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           ROUND(ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END), 2)
                 / ROUND(SUM(volume), 2), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8(spark, sf_dir):
    """TPC-H q8 (market share of one supplier nation inside a region's
    market): 8-way join — small dimensions (part, supplier, nation,
    region) broadcast, orders/customer shuffle-joined; numerator and
    denominator sums are rounded independently BEFORE the division so
    both engines divide identical doubles (sum order differs across
    engines, a quotient of raw sums would wobble in the last ulp)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        j.select(F.year("o_orderdate").alias("o_year"),
                 vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(F.sum(F.when(F.col("nation") == "NATION_3",
                                 F.col("volume")).otherwise(0.0)), 2).alias("num"),
            F.round(F.sum("volume"), 2).alias("den"),
        )
    )
    return agg.select(
        "o_year", F.round(F.col("num") / F.col("den"), 6).alias("mkt_share"))


@register(
    "tpch_q9_product_profit",
    """
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9(spark, sf_dir):
    """TPC-H q9 adapted (no partsupp table in the synthetic schema):
    supply cost is modeled as 0.6 * p_retailprice per unit, keeping the
    original shape — LIKE filter on part, 5-way join, profit expression
    spanning three tables, two-key aggregate.  Per-row arithmetic is left
    exact; only the final SUM is rounded."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        j.select(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"),
                 amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@register(
    "tpch_q12_late_shipments",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12(spark, sf_dir):
    """TPC-H q12 adapted (no l_shipmode/l_commitdate): "late" lineitems
    are those shipped >90 days after the order date — the cross-table
    date predicate evaluates post-join; the single-side shipdate range
    still reaches the parquet scan.  Conditional counts are the classic
    pivoting SUM(CASE...) pair."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q17_small_quantity",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS t_partkey,
                 0.2 * AVG(l_quantity) AS qty_threshold
          FROM lineitem GROUP BY l_partkey) t
      ON t_partkey = p_partkey
    WHERE p_brand = 'Brand#23' AND p_size < 15
      AND l_quantity < qty_threshold
    """,
)
def q17(spark, sf_dir):
    """TPC-H q17 (small-quantity-order revenue): the correlated scalar
    AVG subquery becomes a per-part aggregate broadcast-joined back to
    lineitem.  The aggregate is computed only over lineitems of the
    FILTERED part set (identical per-part averages, since grouping is per
    partkey) — so the broadcast side is bounded by the part-filter
    selectivity, not all of lineitem's distinct partkeys, and stays
    driver-safe at any SF.  Quantities are integral doubles, so the
    per-part sums are exact in IEEE double regardless of summation order
    — the 0.2*avg threshold compare is deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15))
    li_p = li.join(F.broadcast(p.select("p_partkey")),
                   F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    thr = li_p.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(thr), F.col("t_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q21_waiting_supplier",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21(spark, sf_dir):
    """TPC-H q21 adapted (no l_receiptdate/l_commitdate — "kept waiting"
    is modeled as the returned flag): the classic EXISTS + NOT-EXISTS
    pair over the same fact table becomes a LEFT SEMI then LEFT ANTI
    join, both with a non-equi second condition on suppkey.  Both probe
    sides join on l_orderkey, so AQE can reuse the exchange."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k1"), F.col("l_suppkey").alias("sk1"))
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3"))
    )
    base = (
        l1.join(o, F.col("k1") == F.col("o_orderkey"))
        .join(l2, (F.col("k2") == F.col("k1")) & (F.col("sk2") != F.col("sk1")),
              "left_semi")
        .join(l3, (F.col("k3") == F.col("k1")) & (F.col("sk3") != F.col("sk1")),
              "left_anti")
    )
    agg = (
        base.join(F.broadcast(s), F.col("s_suppkey") == F.col("sk1"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
    return agg.orderBy(F.desc("numwait"), F.asc("s_name")).limit(20)


@register(
    "tpch_q22_global_sales",
    """
    WITH pool AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ), avg_bal AS (
      SELECT ROUND(AVG(c_acctbal), 2) AS threshold FROM pool WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM pool, avg_bal
    WHERE c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q22(spark, sf_dir):
    """TPC-H q22 adapted (no c_phone — country code is c_nationkey):
    scalar AVG subquery (rounded to 2dp BEFORE the compare so both
    engines use the identical threshold double) broadcast to the pool,
    then a LEFT ANTI join against orders for "no urgent orders" (every
    synthetic customer has at least one order, so the original "never
    ordered" predicate is vacuous at these SFs)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("threshold"))
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
    )


# --- the last four TPC-H shapes (q2 / q11 / q16 / q20) ----------------------
# The synthetic schema has no partsupp table; the distinct
# (l_partkey, l_suppkey) pairs of lineitem play its role, with
# min(l_extendedprice) as the supply cost — the operator SHAPES
# (correlated min subquery, group-vs-global HAVING fraction, grouped
# distinct counts with exclusion, nested EXISTS chain) are the originals.

_PS = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice) AS ps_supplycost
    FROM lineitem GROUP BY 1, 2
"""


@register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH ps AS ({_PS}),
    costed AS (
      SELECT p_partkey, p_type, s_name, s_acctbal, n_name, ps_supplycost
      FROM part
      JOIN ps ON ps_partkey = p_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size = 15 AND r_name = 'EUROPE'
    ),
    best AS (SELECT p_partkey AS b_key, MIN(ps_supplycost) AS min_cost
             FROM costed GROUP BY 1)
    SELECT s_name, n_name, p_partkey,
           ROUND(s_acctbal, 2) AS s_acctbal, ROUND(min_cost, 2) AS cost
    FROM costed JOIN best ON p_partkey = b_key AND ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2(spark, sf_dir):
    """TPC-H q2 (min-cost supplier, adapted): the correlated
    MIN(ps_supplycost) subquery becomes a per-part aggregate joined back
    on (partkey, cost) — dimensions broadcast, one partial-agg shuffle
    on partkey, top-100 via TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    costed = (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    best = costed.groupBy(F.col("p_partkey").alias("b_key")).agg(
        F.min("ps_supplycost").alias("min_cost"))
    return (
        costed.join(best, (F.col("p_partkey") == F.col("b_key"))
                    & (F.col("ps_supplycost") == F.col("min_cost")))
        .select("s_name", "n_name", "p_partkey",
                F.round("s_acctbal", 2).alias("s_acctbal"),
                F.round("min_cost", 2).alias("cost"))
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11_important_stock",
    f"""
    WITH ps AS ({_PS}),
    natps AS (
      SELECT ps_partkey, ps_supplycost
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    ),
    tot AS (SELECT SUM(ps_supplycost) AS total FROM natps)
    SELECT ps_partkey, ROUND(SUM(ps_supplycost), 2) AS value
    FROM natps, tot
    GROUP BY ps_partkey, tot.total
    HAVING SUM(ps_supplycost) > tot.total * 0.0005
    ORDER BY value DESC, ps_partkey
    LIMIT 100
    """,
)
def q11(spark, sf_dir):
    """TPC-H q11 (important stock, adapted): per-part value vs a scalar
    global-total fraction — the scalar comes from a one-row broadcast
    cross join, the HAVING runs after the partial-agg shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    natps = (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", "ps_supplycost")
    )
    tot = natps.agg(F.sum("ps_supplycost").alias("total"))
    return (
        natps.join(F.broadcast(tot))
        .groupBy("ps_partkey", "total")
        .agg(F.sum("ps_supplycost").alias("raw_value"))
        .filter(F.col("raw_value") > F.col("total") * 0.0005)
        .select("ps_partkey", F.round("raw_value", 2).alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
        .limit(100)
    )


@register(
    "tpch_q16_supplier_part_count",
    f"""
    WITH ps AS ({_PS}),
    excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT)
             AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#45' AND p_size IN (9, 14, 19, 23, 36, 45, 49, 3)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM excl)
    GROUP BY p_brand, p_size
    """,
)
def q16(spark, sf_dir):
    """TPC-H q16 (supplier-part counts, adapted): NOT IN becomes a LEFT
    ANTI join against the excluded-supplier set, then a grouped
    COUNT(DISTINCT) (two-stage distinct aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(F.col("l_partkey").alias("ps_partkey"),
                   F.col("l_suppkey").alias("ps_suppkey")).distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(9, 14, 19, 23, 36, 45, 49, 3))
    excl = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(excl),
                F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_potential_promotion",
    """
    WITH qty AS (
      SELECT l_partkey AS q_partkey, l_suppkey AS q_suppkey,
             0.5 * SUM(l_quantity) AS half_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    forest AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
    bigsup AS (
      SELECT DISTINCT q_suppkey
      FROM qty JOIN forest ON q_partkey = p_partkey
      WHERE half_qty > 25
    )
    SELECT s_name, s_nationkey
    FROM supplier JOIN bigsup ON s_suppkey = q_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    ORDER BY s_name
    """,
)
def q20(spark, sf_dir):
    """TPC-H q20 (potential promotion, adapted to the synthetic part
    names): the nested EXISTS chain becomes per-(part,supplier) shipped
    quantity -> threshold filter -> DISTINCT supplier semi-set -> join
    to the nation-filtered supplier dimension."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    qty = li.groupBy(
        F.col("l_partkey").alias("q_partkey"),
        F.col("l_suppkey").alias("q_suppkey"),
    ).agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    forest = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")).select("p_partkey")
    bigsup = (
        qty.join(F.broadcast(forest), F.col("q_partkey") == F.col("p_partkey"))
        .filter(F.col("half_qty") > 25)
        .select("q_suppkey").distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(bigsup, F.col("s_suppkey") == F.col("q_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_nationkey")
        .orderBy("s_name")
    )
