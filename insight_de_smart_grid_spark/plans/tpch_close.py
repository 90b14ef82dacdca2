"""The last five canonical TPC-H join shapes: Q2, Q9, Q11, Q12, Q20.

With these, every one of the 22 TPC-H query patterns has a shape-preserving
analog in the registry (Q1/Q3/Q4/Q7/Q8/Q14/Q18 in star/analytic_queries,
Q5/Q6/Q10/Q13/Q15/Q16/Q17/Q19/Q21/Q22 in tpch_shapes, Q2/Q9/Q11/Q12/Q20
here). The test schema has no ``partsupp`` table and no
shipmode/commitdate/receiptdate columns, so — exactly as tpch_shapes did for
Q21/Q22 — each query keeps the *pattern* (the join topology, subquery
decorrelation, and aggregate threshold structure the planner must handle)
while deriving the missing relation from what exists:

- the part-supplier "supply" relation is ``SELECT l_partkey, l_suppkey,
  min(l_extendedprice / l_quantity)`` over lineitem (unit price as the
  supply-cost stand-in);
- Q12's shipmode classifier becomes the line status, and "late receipt"
  becomes shipping more than 60 days after the order date.

Scale notes (100 TB): the derived supply relation is an aggregate of the
fact down to |part|x|supplier-per-part| rows — at TPC-H ratios that is ~200x
smaller than lineitem, so every join-back against it lets AQE choose a
broadcast. The argmin join-back (Q2), per-part threshold (Q20), and scalar
total (Q11) all follow the aggregate-then-join pattern: nothing correlates
row-at-a-time, nothing collects to the driver, and the only wide shuffles
are the fact-side aggregations on uniform keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.plans.registry import register
from insight_de_smart_grid_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived part-supplier supply relation (partsupp stand-in): the
    cheapest observed unit price per (part, supplier). min() is exact (no
    summation-order jitter), so the value is bit-identical cross-engine and
    safe to equi-join on."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
             .alias("unit_cost"))
    )


_SUPPLY_CTE = """
supply AS (
    SELECT l_partkey, l_suppkey,
           min(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY 1, 2
)
"""


# ---------------------------------------------------------------------------
# Q2 shape — minimum-cost supplier: the correlated-min subquery, decorrelated
# into an argmin-per-part aggregate joined back on (part, min cost).
# ---------------------------------------------------------------------------

@register("star_min_cost_supplier", f"""
WITH {_SUPPLY_CTE},
europe AS (
    SELECT ps.l_partkey, ps.l_suppkey, ps.unit_cost,
           s.s_acctbal, s.s_name, n.n_name
    FROM supply ps
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
)
SELECT e.s_acctbal, e.s_name, e.n_name AS nation,
       p.p_partkey, p.p_name, e.unit_cost
FROM part p
JOIN europe e ON e.l_partkey = p.p_partkey
WHERE p.p_size BETWEEN 10 AND 20
  AND p.p_type = 'STANDARD'
  AND e.unit_cost = (
        SELECT min(e2.unit_cost) FROM europe e2
        WHERE e2.l_partkey = p.p_partkey)
ORDER BY e.s_acctbal DESC, p.p_partkey, e.l_suppkey
LIMIT 100
""")
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2. The correlated ``MIN(unit_cost) WHERE partkey = p_partkey``
    is decorrelated by hand: aggregate the regional supply relation to
    per-part minima (~|part| rows), then equi-join back on
    (partkey, unit_cost) — ties return every tied supplier, as in the spec.
    Supplier/nation/region are broadcast; the supply relation itself is the
    only shuffled aggregate. The double equality join is safe because min()
    propagates one of the original values bit-for-bit."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD"))

    europe = (
        _supply(spark, sf_dir)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "l_suppkey", "unit_cost",
                "s_acctbal", "s_name", "n_name")
    )
    min_cost = europe.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("min_cost"))
    return (
        europe.join(min_cost,
                    (europe.l_partkey == min_cost.l_partkey)
                    & (europe.unit_cost == min_cost.min_cost))
        .drop(min_cost.l_partkey)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(F.col("s_acctbal"), F.col("s_name"),
                F.col("n_name").alias("nation"),
                F.col("p_partkey"), F.col("p_name"), F.col("unit_cost"),
                F.col("l_suppkey"))
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "l_suppkey")
        .limit(100)
        .drop("l_suppkey")
    )


# ---------------------------------------------------------------------------
# Q9 shape — product-type profit: five-way join with a LIKE filter on part
# and profit grouped by supplier nation and order year.
# ---------------------------------------------------------------------------

@register("star_product_profit", """
SELECT n.n_name AS nation,
       EXTRACT(year FROM o.o_orderdate) AS o_year,
       sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                       - 0.6 * p.p_retailprice * l.l_quantity) * 100)
                AS BIGINT)) AS profit_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY 1, 2
""")
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (0.6 * p_retailprice * quantity stands in for
    ps_supplycost * quantity — partsupp does not exist in this schema).
    part/supplier/nation broadcast; the single wide shuffle is
    lineitem⋈orders on the uniform orderkey. The LIKE '%bolt%' filter
    shrinks the part broadcast before the join, and the group key space is
    bounded (|nation| x |years|), so the final aggregation's shuffle is
    tiny at any scale.

    Per-line profit is truncated to integer cents BEFORE summing (in both
    engines): the raw expression subtracts two similar-magnitude sums, so
    cancellation amplifies summation-order jitter past the oracle's
    9-significant-digit tolerance, and round() can't fix it — the synthetic
    prices make exact .xx5 ties where Spark (HALF_UP on the decimal
    expansion) and DuckDB (scaled-multiply) disagree. floor(expr * 100) is
    pure IEEE arithmetic on identical doubles — bit-identical cross-engine —
    and the BIGINT sum is exact in any order."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    profit_cents = F.floor(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
         - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity"))
        * F.lit(100)).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit_cents).alias("profit_cents"))
    )


# ---------------------------------------------------------------------------
# Q11 shape — important stock: grouped value filtered against a scalar
# fraction of the global total (scalar subquery over the same aggregate).
# ---------------------------------------------------------------------------

@register("star_important_stock", f"""
WITH {_SUPPLY_CTE},
national AS (
    SELECT ps.l_partkey, sum(ps.unit_cost) AS value
    FROM supply ps
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_7')
    GROUP BY 1
)
SELECT l_partkey AS p_partkey, value
FROM national
WHERE value > (SELECT 0.001 * sum(value) FROM national)
""")
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11. The scalar HAVING threshold (0.1% of national total) is a
    one-row aggregate broadcast against the per-part values — the grouped
    relation is computed once and reused for both sides (Spark materializes
    the shuffle output and reads it twice; no driver round-trip). At scale
    the per-part aggregate is |part|-sized, and the threshold join is a
    broadcast of literally one row."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7"))
    national = (
        _supply(spark, sf_dir)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum("unit_cost").alias("value"))
    )
    threshold = national.agg(
        (F.lit(0.001) * F.sum("value")).alias("threshold"))
    return (
        national.join(F.broadcast(threshold))
        .where(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


# ---------------------------------------------------------------------------
# Q12 shape — shipping-mode priority classification: fact join with dual
# conditional counts over a priority split.
# ---------------------------------------------------------------------------

@register("star_late_shipment_priority", """
SELECT l.l_linestatus AS linestatus,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""")
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (l_linestatus stands in for l_shipmode; "shipped more than
    60 days after ordering" stands in for the commit/receipt-date lag —
    neither column exists in this schema). The shipdate range predicate is
    scan-pushable; the cross-table lag predicate rides on the join. The
    output key space is |linestatus|, so the final aggregate is a handful
    of rows regardless of scale."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
    )


# ---------------------------------------------------------------------------
# Q20 shape — excess-share suppliers: nested IN subqueries decorrelated into
# an aggregate threshold join plus a semi-join chain up to supplier.
# ---------------------------------------------------------------------------

@register("star_excess_share_suppliers", """
WITH shipped AS (
    SELECT l.l_partkey, l.l_suppkey, sum(l.l_quantity) AS qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
),
part_total AS (
    SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY 1
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_suppkey IN (
        SELECT sh.l_suppkey
        FROM shipped sh
        JOIN part_total pt ON sh.l_partkey = pt.l_partkey
        WHERE sh.qty > 0.5 * pt.total_qty)
ORDER BY s.s_name
""")
def q_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 ("supplied more than half of a red part's 1997 volume"
    stands in for the availqty-vs-half-of-shipped threshold — no partsupp).
    The nested-IN chain decorrelates into: per-(part,supplier) aggregate →
    per-part total join-back (AQE-broadcastable, |part|-sized) → threshold
    filter → LEFT SEMI join into supplier. Quantities are integral, so the
    0.5x threshold comparison is exact cross-engine. The semi join ships
    only supplier keys; supplier/nation/region themselves broadcast."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = shipped.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty"))
    excess = (
        shipped.join(part_total.withColumnRenamed("l_partkey", "pt_partkey"),
                     F.col("l_partkey") == F.col("pt_partkey"))
        .where(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
