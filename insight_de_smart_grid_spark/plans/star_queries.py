"""Star-schema relational queries (SURVEY §2.3-§2.6 + §7.2 step 5).

These exercise the general relational surface the engine adds beyond the
reference's single lookup join: multi-way joins with broadcast dims,
semi/anti/outer joins, distinct + count-distinct, cube/rollup grouping,
SQL window functions, set ops, pivot — each with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators.relational import (
    running_total,
    top_k_per_group,
    with_lag,
)
from insight_de_smart_grid_spark.plans.registry import register
from insight_de_smart_grid_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation (TPC-H Q1 shape: multi-agg groupBy; SURVEY A1/A3/A5 generalized)
# ---------------------------------------------------------------------------

@register("star_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("sum_disc_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (§2.3 generalized: inner multi-way, broadcast dims, semi, anti, left)
# ---------------------------------------------------------------------------

@register("star_top_revenue_orders", """
SELECT o.o_orderkey, o.o_orderdate,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1, 2
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""")
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact sort-merge join + dim filter + exact top-K."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register("star_region_revenue", """
SELECT r.r_name AS region, n.n_name AS nation,
       sum(o.o_totalprice) AS total_price,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""")
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dim chain — all dims broadcast, fact never shuffles for the
    joins (only for the final group-by)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("total_price"),
             F.count(F.lit(1)).alias("n_orders"))
    )


@register("star_orders_with_lineitems_semi", """
SELECT o_orderstatus, count(*) AS n
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_quantity > 45)
GROUP BY 1
""")
def q_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    )


@register("star_customers_without_orders_anti", """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
""")
def q_customers_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register("star_customer_order_counts_left", """
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY 1
""")
def q_customer_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (count of NULL
    key = 0, matching SQL COUNT(col) semantics)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Distinct / count-distinct (§2.4 extension — absent in reference, noted §2.4)
# ---------------------------------------------------------------------------

@register("star_supplier_part_distinct", """
SELECT l_suppkey,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY 1
""")
def q_supplier_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube (§2.4 extension)
# ---------------------------------------------------------------------------

@register("star_cube_quantity", """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def q_cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
    )


@register("star_rollup_orderpriority", """
SELECT o_orderpriority, o_orderstatus,
       sum(o_totalprice) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""")
def q_rollup_orderpriority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.sum("o_totalprice").alias("total_price"))
    )


# ---------------------------------------------------------------------------
# SQL window functions (§2.5 — engine extension, none in reference)
# ---------------------------------------------------------------------------

@register("star_top3_parts_per_supplier", """
SELECT l_suppkey, l_partkey, l_extendedprice, rn
FROM (
  SELECT l_suppkey, l_partkey, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         ) AS rn
  FROM lineitem
)
WHERE rn <= 3
""")
def q_top3_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = top_k_per_group(
        li, ["l_suppkey"],
        [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        k=3)
    return out.select("l_suppkey", "l_partkey", "l_extendedprice", "rn")


@register("star_running_quantity", """
SELECT l_suppkey, l_orderkey, l_linenumber,
       sum(l_quantity) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS running_qty
FROM lineitem
WHERE l_suppkey <= 3
""")
def q_running_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix sum. Summed over l_quantity (integer-valued) because engines
    associate double additions differently inside window frames (DuckDB uses
    a segment tree, Spark a sequential accumulator) — integer-valued doubles
    are exact under any association, keeping the oracle hash stable."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    out = running_total(
        li, ["l_suppkey"],
        [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        F.col("l_quantity"), "running_qty")
    return out.select("l_suppkey", "l_orderkey", "l_linenumber",
                      "running_qty")


@register("star_order_gap_lag", """
SELECT o_custkey, o_orderkey,
       lag(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
       ) AS prev_orderdate
FROM orders
""")
def q_order_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    out = with_lag(o, ["o_custkey"], [F.asc("o_orderdate"), F.asc("o_orderkey")],
                   "o_orderdate", "prev_orderdate")
    return out.select("o_custkey", "o_orderkey", "prev_orderdate")


# ---------------------------------------------------------------------------
# Set operations (§2 extension)
# ---------------------------------------------------------------------------

@register("star_setops", """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
""")
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets; UNION/EXCEPT are the same
    Spark API family (union/exceptAll/intersect)."""
    c = (_t(spark, sf_dir, "customer")
         .filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "O")
         .select(F.col("o_custkey").alias("c_custkey")))
    return c.intersect(o)


@register("star_setops_except", """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
""")
def q_setops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


# ---------------------------------------------------------------------------
# Pivot (§2 extension)
# ---------------------------------------------------------------------------

@register("star_pivot_linestatus", """
SELECT l_returnflag,
       sum(l_quantity) FILTER (WHERE l_linestatus = 'O') AS qty_o,
       sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f
FROM lineitem
GROUP BY 1
""")
def q_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


# ---------------------------------------------------------------------------
# Multi-way join pipelines (TPC-H Q3 / Q7 shapes): fact-to-fact join plus
# dimension hops — the deepest join trees in the library, exercising join
# reordering + AQE strategy selection
# ---------------------------------------------------------------------------

@register("star_shipping_priority", """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""")
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two equi-join hops into the
    fact -> grouped revenue -> top-10. Both date filters sit directly on
    their scans (predicate pushdown), the customer side shrinks before the
    join, and AQE picks broadcast for it at small SFs / shuffle join at
    scale — nothing in the query pins a strategy."""
    cust = (_t(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate")
                      < F.lit("1998-01-01").cast("timestamp"))
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register("star_nation_volume", """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier   ON l_suppkey  = s_suppkey
JOIN nation sn  ON s_nationkey = sn.n_nationkey
JOIN orders     ON l_orderkey = o_orderkey
JOIN customer   ON o_custkey  = c_custkey
JOIN nation cn  ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2
""")
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: five-way join — fact -> two dimension chains (supplier
    nation, customer nation via orders). The nation/supplier/customer dims
    broadcast (explicitly — they are bounded catalogs at any SF); the single
    wide shuffle is lineitem⨝orders on orderkey, then a 600-group agg."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sn = nat.select(F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"))
    cn = nat.select(F.col("n_nationkey").alias("cn_key"),
                    F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 6).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


@register("star_setops_all", """
SELECT 'inter' AS op, c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'except' AS op, c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
)
""")
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set operations — INTERSECT ALL keeps min(multiplicity),
    EXCEPT ALL the count difference — tagged and unioned into one result.
    Both plan as aggregate-count + generate (no join): a single shuffle on
    the value column each, scale-identical to a grouped count."""
    o = _t(spark, sf_dir, "orders")
    a = (o.filter(F.col("o_orderstatus") == "O")
         .select(F.col("o_custkey").alias("c_custkey")))
    b = (o.filter(F.col("o_orderstatus") == "F")
         .select(F.col("o_custkey").alias("c_custkey")))
    inter = a.intersectAll(b).select(F.lit("inter").alias("op"), "c_custkey")
    exc = a.exceptAll(b).select(F.lit("except").alias("op"), "c_custkey")
    return inter.unionAll(exc)
