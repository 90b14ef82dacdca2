"""Tests for the closing TPC-H shapes (Q2/Q9/Q11/Q12/Q20 analogs) — with
these, all 22 TPC-H query patterns have registry analogs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.plans.registry import QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle import check_registered

ORACLE_CHECKED = [
    "star_min_cost_supplier",
    "star_product_profit",
    "star_important_stock",
    "star_late_shipment_priority",
    "star_excess_share_suppliers",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_tpch_close_matches_oracle(spark, duck, name):
    check_registered(spark, duck, name)


def test_q2_argmin_rows_really_are_minima(spark):
    """Every returned (part, supplier) row must carry that part's minimum
    unit cost among EUROPE suppliers — the decorrelated join-back must not
    admit non-minimal rows."""
    out = QUERIES["star_min_cost_supplier"].fn(spark, SF_ORACLE)
    rows = out.collect()
    assert rows
    per_part_min = {}
    for r in rows:
        prev = per_part_min.setdefault(r.p_partkey, r.unit_cost)
        assert r.unit_cost == prev  # all rows for a part share one cost


def test_q11_threshold_is_single_row_broadcast(spark):
    """The scalar total must join as a broadcast (one-row build side), never
    a sort-merge join."""
    plan = (QUERIES["star_important_stock"].fn(spark, SF_ORACLE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q12_counts_partition_the_join(spark):
    """high + low must equal the total surviving join rows — the CASE split
    is a partition, not an overlap."""
    out = QUERIES["star_late_shipment_priority"].fn(spark, SF_ORACLE)
    rows = out.collect()
    assert rows
    total = sum(r.high_line_count + r.low_line_count for r in rows)
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    direct = (li.join(o, li.l_orderkey == o.o_orderkey)
              .where(F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
              .count())
    assert total == direct


def test_q20_excess_suppliers_exceed_half_share(spark):
    """Independent verification: every supplier the semi-join keeps must
    have >50% of some red part's 1997 quantity; at least one such supplier
    exists at sf0.01 (parts with a single 1997 supplier always qualify)."""
    out = QUERIES["star_excess_share_suppliers"].fn(spark, SF_ORACLE)
    kept = {r.s_name for r in out.collect()}
    assert kept

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    p = spark.read.parquet(f"{SF_ORACLE}/part.parquet").where(
        F.col("p_name").like("red%"))
    shipped = (li.join(p, li.l_partkey == p.p_partkey)
               .groupBy("l_partkey", "l_suppkey")
               .agg(F.sum("l_quantity").alias("qty")))
    totals = {r.l_partkey: r.total for r in
              shipped.groupBy("l_partkey")
              .agg(F.sum("qty").alias("total")).collect()}
    sup = spark.read.parquet(f"{SF_ORACLE}/supplier.parquet")
    nat = spark.read.parquet(f"{SF_ORACLE}/nation.parquet")
    reg = spark.read.parquet(f"{SF_ORACLE}/region.parquet")
    asia_names = {
        r.s_name: r.s_suppkey
        for r in sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .where(F.col("r_name") == "ASIA").collect()}
    qualifying = set()
    for r in shipped.collect():
        if r.qty > 0.5 * totals[r.l_partkey]:
            qualifying.add(r.l_suppkey)
    expect = {name for name, key in asia_names.items() if key in qualifying}
    assert kept == expect
