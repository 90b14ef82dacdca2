"""Tests for sessionization, as-of join, stats/approx aggregates, scalar
batteries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators.sessionize import (
    session_agg_builtin,
    session_aggregates,
)
from insight_de_smart_grid_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import check_registered

ORACLE_CHECKED = [
    "sessionize_events",
    "asof_purchase_click",
    "star_stats_agg",
    "scalar_battery",
    "scalar_dates",
    "text_bpe_tokens",
    "array_battery",
    "salted_agg",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_advanced_matches_oracle(spark, duck, name):
    check_registered(spark, duck, name)


def test_builtin_session_window_agrees_with_lag_cumsum(spark):
    """Two independent sessionization formulations (window-function recipe vs
    native session_window) must produce identical session boundaries."""
    ev = load_table(spark, SF_ORACLE, "events")
    manual = {(r.user_id, r.session_start, r.n_events, round(r.sum_value, 6))
              for r in session_aggregates(ev, gap="30 minutes").collect()}
    builtin = {(r.user_id, r.session_start, r.n_events, round(r.sum_value, 6))
               for r in session_agg_builtin(ev, gap="30 minutes").collect()}
    assert manual == builtin


def test_approx_agg_within_tolerance_of_exact(spark):
    exact = {
        r.l_returnflag: (r.n, float(r.m)) for r in
        load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"),
             F.percentile(F.col("l_extendedprice"), F.lit(0.5)).alias("m"))
        .collect()
    }
    from insight_de_smart_grid_spark.plans.registry import QUERIES
    approx = QUERIES["star_approx_agg"].fn(spark, SF_ORACLE).collect()
    for r in approx:
        n_exact, m_exact = exact[r.l_returnflag]
        assert abs(r.approx_parts - n_exact) / n_exact < 0.05
        assert abs(r.approx_median_price - m_exact) / m_exact < 0.05


def test_ivf_recall_against_exact_topk(spark):
    """IVF with nprobe=4/16 must recover a majority of the exact top-10."""
    from insight_de_smart_grid_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
    )
    emb = load_table(spark, SF_ORACLE, "embeddings")
    exact = {r.vec_id for r in cosine_topk(emb, 0, k=10).collect()}
    approx = {r.vec_id for r in ivf_ann_topk(emb, 0, k=10).collect()}
    assert len(exact & approx) >= 5


def test_ewma_stream_equals_batch(spark):
    """The applyInPandasWithState EWMA must equal the batch applyInPandas
    run over the same input (state carried across micro-batches)."""
    from insight_de_smart_grid_spark.plans.registry import QUERIES
    from insight_de_smart_grid_spark.sources.tables import readings_view
    from insight_de_smart_grid_spark.streaming.stateful import ewma_batch

    batch = {(r.house_id, r.appliance_id, r.ts, round(r.ewma, 9))
             for r in ewma_batch(readings_view(spark, SF_ORACLE)).collect()}
    stream = {(r.house_id, r.appliance_id, r.ts, round(r.ewma, 9))
              for r in QUERIES["streaming_ewma"].fn(spark, SF_ORACLE).collect()}
    assert batch == stream


def test_streaming_sessions_match_batch_finalized(spark):
    """session_window under readStream (append mode) must agree with the
    batch session_window on every session the watermark finalized."""
    from pyspark.sql import functions as F2

    from insight_de_smart_grid_spark.plans.registry import QUERIES
    from insight_de_smart_grid_spark.sources.tables import load_table as lt

    ev = lt(spark, SF_ORACLE, "events")
    batch = (
        ev.groupBy(F2.session_window(F2.col("ts"), "30 minutes").alias("sw"),
                   "user_id")
        .agg(F2.count(F2.lit(1)).alias("n_events"),
             F2.sum("value").alias("sum_value"))
        .select("user_id", F2.col("sw.start").alias("session_start"),
                F2.col("sw.end").alias("session_end"), "n_events",
                "sum_value"))
    max_ts = ev.agg(F2.max("ts")).collect()[0][0]
    b_rows = {(r.user_id, r.session_start, r.session_end, r.n_events,
               round(r.sum_value, 6))
              for r in batch.collect()
              if (max_ts - r.session_end).total_seconds() >= 60}
    s_rows = {(r.user_id, r.session_start, r.session_end, r.n_events,
               round(r.sum_value, 6))
              for r in QUERIES["streaming_sessions"].fn(spark, SF_ORACLE)
              .collect()}
    assert s_rows == b_rows
    assert len(s_rows) > 0
