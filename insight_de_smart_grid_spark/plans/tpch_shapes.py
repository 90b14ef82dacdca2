"""Remaining TPC-H-shaped join/aggregation patterns not yet in the surface.

The reference's own query set (SURVEY §2) is narrow — dashboard aggregates
plus one lookup join — but a user replacing it with this engine immediately
points general analytics at the star schema. star_queries / analytic_queries
already cover Q1/Q3/Q4/Q7/Q8/Q14/Q18 shapes; this module closes the remaining
canonical join patterns: the dual-condition regional join (Q5), returned-item
top-K (Q10), outer-join count distribution (Q13), argmax-on-aggregate join
(Q15), NOT-IN + COUNT DISTINCT (Q16), correlated per-group average threshold
(Q17), disjunctive pushdown predicates (Q19), single-blamed-supplier
multi-EXISTS (Q21), and anti-join + scalar-average composition (Q22).

Scale notes (100 TB): every dim that is small at any realistic scale factor
(region, nation, supplier, part at dashboard cardinalities) is broadcast
explicitly; fact-to-fact joins (lineitem⋈orders) shuffle on the join key and
rely on AQE for skew splitting. Per-group thresholds (Q17) are computed as a
separate aggregate and joined back — the aggregate output is ~|part| rows,
orders of magnitude smaller than the fact, so AQE picks a broadcast when it
fits and a shuffle join when it doesn't; nothing ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.plans.registry import register
from insight_de_smart_grid_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q5 shape — local supplier volume: six-way join with the *dual* nation
# condition (customer nation == supplier nation), the classic test that a
# planner keeps the fact table flowing through without materializing a
# cross-nation blowup.
# ---------------------------------------------------------------------------

@register("star_local_supplier_volume", """
SELECT n.n_name AS nation,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""")
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5. Join order: filter orders by date first (pushdown to scan),
    shuffle-join lineitem⋈orders⋈customer on their keys, then broadcast
    supplier/nation/region. The c_nationkey = s_nationkey condition rides on
    the supplier broadcast join, so the fact stream is filtered in place —
    no extra shuffle for the second condition."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s),
              (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_rev()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q10 shape — returned-item reporting: revenue lost to returns, top 20
# customers. Adds the filtered-fact → enriched top-K pattern.
# ---------------------------------------------------------------------------

@register("star_returned_items", """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10. The returnflag filter reaches the parquet scan; the final
    top-20 is a TakeOrderedAndProject over the grouped result (no global
    sort materialization). c_custkey tie-break keeps the cut deterministic
    cross-engine."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13 shape — customer order-count distribution: LEFT OUTER join with an
# extra join-side predicate, then an aggregation OF an aggregation.
# ---------------------------------------------------------------------------

@register("star_order_count_distribution", """
SELECT c_count, count(*) AS n_customers
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
) per_cust
GROUP BY 1
""")
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13. The priority predicate lives ON the join (not WHERE), so
    customers whose only orders are low-priority still appear with count 0 —
    the distinguishing outer-join semantics this shape exists to test. Second
    aggregation is over |customer| rows — cheap everywhere."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, (c.c_custkey == o.o_custkey)
               & (o.o_orderpriority != "5-LOW"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_customers"))


# ---------------------------------------------------------------------------
# Q15 shape — top supplier: aggregate once, join the aggregate back against
# its own max (argmax-on-aggregate without a window sort).
# ---------------------------------------------------------------------------

@register("star_top_supplier", """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           sum(l_extendedprice * (1 - l_discount)) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15. The revenue CTE aggregates the fact down to |supplier|
    rows; the max is a single-row broadcast crossJoin against that small
    aggregate (never against the fact). Cross-engine the same supplier wins
    because both engines compare the same double values."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev),
                     F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 shape — parts/supplier relationship: NOT IN subquery (anti join) plus
# multi-key COUNT DISTINCT.
# ---------------------------------------------------------------------------

@register("star_parts_supplier_counts", """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""")
def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16. The NOT IN becomes a broadcast LEFT ANTI join (the
    excluded-supplier list is tiny at any scale); part predicates push to the
    part scan before the broadcast. COUNT DISTINCT over the 3-key group is
    one Expand-free aggregation since there is a single distinct column."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    bad_supp = _t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp),
                li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 shape — small-quantity-order revenue: per-group average threshold
# (correlated scalar subquery) applied back to the same fact.
# ---------------------------------------------------------------------------

@register("star_small_qty_revenue", """
SELECT sum(l.l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13' AND p.p_size < 10
  AND l.l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""")
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17. De-correlated by hand: aggregate per-part 0.2*avg(qty)
    once (output ≈ |part| rows), then join it back. Spark's own subquery
    decorrelation produces the same plan from SQL; the DF form makes the
    two-scan shape explicit. The threshold aggregate is computed only over
    parts passing the brand/size filter — semi-join pushdown done manually
    so the big scan for thresholds reads only matching parts' rows."""
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    filtered = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    thresholds = (
        filtered.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        filtered.join(thresholds, filtered.l_partkey == thresholds.t_partkey)
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive predicates: OR of conjunct groups spanning both
# join sides; tests that the planner extracts the common part filter and
# pushes the per-branch bounds down.
# ---------------------------------------------------------------------------

@register("star_disjunctive_revenue", """
SELECT sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""")
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19. Catalyst factors `p_brand IN (12,24,3)` out of the OR and
    pushes it into the (broadcast) part scan; the mixed lineitem/part
    disjunction evaluates post-join inside codegen. One broadcast join, one
    partial+final agg — no shuffle of the fact at all."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.where(branch).agg(F.sum(_rev()).alias("revenue"))


# ---------------------------------------------------------------------------
# Q21 shape — suppliers who kept orders waiting: the "only member with the
# flag" pattern (EXISTS another supplier, NOT EXISTS another late supplier),
# expressed as one grouped pass instead of two correlated self-joins.
# ---------------------------------------------------------------------------

@register("star_late_sole_supplier", """
WITH flags AS (
    SELECT l.l_orderkey, l.l_suppkey,
           max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END) AS is_late
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1, 2
), per_order AS (
    SELECT l_orderkey,
           count(*) AS n_supp,
           sum(is_late) AS n_late,
           max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
    FROM flags
    GROUP BY 1
)
SELECT s.s_name, count(*) AS numwait
FROM per_order po
JOIN supplier s ON po.late_supp = s.s_suppkey
WHERE po.n_supp > 1 AND po.n_late = 1
GROUP BY 1
""")
def q_late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 rephrased scale-first: the textbook EXISTS/NOT-EXISTS pair
    is two extra shuffles of lineitem; the grouped formulation computes
    (suppliers per order, late suppliers per order) in one pass and blames
    the sole late supplier when exactly one exists — identical result set.
    The explicit ``repartition(l_orderkey)`` makes BOTH aggregations run on
    one partitioning: hash(okey) clusters (okey, skey) too, so Spark inserts
    no further exchange between them (plan-asserted in test_tpch_shapes) —
    without it each groupBy would shuffle separately, since
    hash(okey, skey) does not satisfy hash(okey)."""
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    s = _t(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit(1)).otherwise(F.lit(0))
    flags = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = (
        flags.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_supp"),
             F.sum("is_late").alias("n_late"),
             F.max(F.when(F.col("is_late") == 1,
                          F.col("l_suppkey"))).alias("late_supp"))
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.join(F.broadcast(s),
                       per_order.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q6 shape — forecast revenue change: the pure scan-filter-aggregate probe.
# No join at all; exists to prove every predicate reaches the parquet scan.
# ---------------------------------------------------------------------------

@register("star_forecast_revenue", """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6. All four predicates are scan-pushable (shipdate range prunes
    row groups via parquet min/max stats); the aggregate is partial+final
    with a single-row shuffle. At 100 TB this runs at I/O speed — the
    benchmark's floor for scan throughput."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount"))
             .alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q22 shape — global sales opportunity: scalar-average threshold composed
# with an anti join, grouped report.
# ---------------------------------------------------------------------------

@register("star_sales_opportunity", """
SELECT c.c_mktsegment AS segment,
       count(*) AS numcust,
       sum(c.c_acctbal) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
""")
def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (mktsegment standing in for the phone country code). The
    scalar average is a single-row broadcast; the NOT EXISTS is a left anti
    join on the orders key projection — at scale the anti join shuffles
    customer (small side of the pair) while orders only ships its key
    column."""
    c = _t(spark, sf_dir, "customer")
    o_keys = _t(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("numcust"),
             F.sum("c_acctbal").alias("totacctbal"))
    )
