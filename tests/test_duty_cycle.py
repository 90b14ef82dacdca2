from __future__ import annotations

from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators.duty_cycle import duty_cycle
from insight_de_smart_grid_spark.sources.tables import readings_view
from tests.oracle import check_registered
from tests.conftest import SF_ORACLE


def test_duty_cycle_matches_oracle(spark, duck):
    check_registered(spark, duck, "duty_cycle_10m")


def test_duty_cycle_threshold_is_strict(spark):
    # reference uses strict `>` (duty_cycle_avro.py:77): power == 5.0 is idle
    df = spark.createDataFrame(
        [("2024-01-01 00:00:01", "h1", "a1", 5.0),
         ("2024-01-01 00:00:02", "h1", "a1", 5.01),
         ("2024-01-01 00:00:03", "h1", "a1", 4.99)],
        "ts string, house_id string, appliance_id string, power double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = duty_cycle(df, window="1 minute").collect()
    assert len(out) == 1
    assert abs(out[0].duty_cycle - 1 / 3) < 1e-12


def test_duty_cycle_sliding_covers_each_row_w_over_s_times(spark):
    # sliding window (W=10m, S=2m): each reading lands in 5 windows
    readings = readings_view(spark, SF_ORACLE).limit(100)
    tumbling = duty_cycle(readings, window="10 minutes")
    sliding = duty_cycle(readings, window="10 minutes", slide="2 minutes")
    n_rows = readings.count()
    total_tumbling = tumbling.count()
    assert sliding.count() >= total_tumbling
    # sum of c_all over sliding windows == 5 x number of readings
    sl = duty_cycle(readings, window="10 minutes", slide="2 minutes")
    # recompute with counts retained
    from pyspark.sql import functions as F2
    agg = (readings.groupBy(F2.window("ts", "10 minutes", "2 minutes"))
           .agg(F2.count("power").alias("c")))
    assert agg.agg(F2.sum("c")).collect()[0][0] == 5 * n_rows
    assert sl is not None


def test_duty_cycle_pane_decomposition_is_invariant(spark):
    """The pane form (tumbling slide-width pre-aggregate -> pane explode
    -> combine) must be row-identical to Spark's window-explode form:
    same (window, keys) groups including all-null-power windows (c_all=0
    -> NULL ratio in both), same long counts, hence the same IEEE
    quotient."""
    readings = readings_view(spark, SF_ORACLE)
    explode_form = duty_cycle(readings, window="10 minutes",
                              slide="2 minutes", panes=False)
    pane_form = duty_cycle(readings, window="10 minutes",
                           slide="2 minutes", panes=True)
    assert sorted(map(tuple, explode_form.collect())) == \
        sorted(map(tuple, pane_form.collect()))
    # W not divisible by S -> the pane path must decline, not misalign
    odd = duty_cycle(readings, window="10 minutes", slide="3 minutes",
                     panes=True)
    odd_ref = duty_cycle(readings, window="10 minutes", slide="3 minutes",
                         panes=False)
    assert sorted(map(tuple, odd.collect())) == \
        sorted(map(tuple, odd_ref.collect()))


def _is_pane_plan(df) -> bool:
    """The pane plan (and only it) synthesizes window ends with
    make_interval arithmetic over exploded pane indices; the explode form
    plans a single window() generator. Marker read from the ANALYZED
    plan — the optimizer constant-folds the literal make_interval away."""
    return "make_interval" in df._jdf.queryExecution().analyzed().toString()


def test_duty_cycle_auto_probe_picks_by_density(spark):
    """panes="auto" (round-7): the probe must pick the EXPLODE plan on
    the sparse fixture (~1 event per (key, pane) — the pre-agg collapses
    nothing) and the PANE plan on a dense corpus (many events per pane),
    and both choices must return rows identical to the fixed forms."""
    from insight_de_smart_grid_spark.operators.duty_cycle import (
        PANE_DENSITY_CROSSOVER,
        pane_density,
    )

    readings = readings_view(spark, SF_ORACLE)
    assert pane_density(readings, 120) < PANE_DENSITY_CROSSOVER
    auto_sparse = duty_cycle(readings, window="10 minutes",
                             slide="2 minutes", panes="auto")
    assert not _is_pane_plan(auto_sparse)
    assert sorted(map(tuple, auto_sparse.collect())) == sorted(map(
        tuple, duty_cycle(readings, window="10 minutes",
                          slide="2 minutes", panes=False).collect()))

    # dense corpus: every key emits ~1 Hz within one 10-minute stretch
    dense = spark.range(600).selectExpr(
        "timestamp_seconds(1704067200 + id) AS ts",
        "cast(id % 2 as string) AS house_id",
        "concat(cast(id % 2 as string), '_m') AS appliance_id",
        "cast(id % 7 as double) AS power")
    assert pane_density(dense, 120) >= PANE_DENSITY_CROSSOVER
    auto_dense = duty_cycle(dense, window="10 minutes",
                            slide="2 minutes", panes="auto")
    assert _is_pane_plan(auto_dense)
    assert sorted(map(tuple, auto_dense.collect())) == sorted(map(
        tuple, duty_cycle(dense, window="10 minutes", slide="2 minutes",
                          panes=True).collect()))

    # non-decomposable shape: auto must fall back to explode, not raise
    odd_auto = duty_cycle(dense, window="10 minutes", slide="3 minutes",
                          panes="auto")
    assert not _is_pane_plan(odd_auto)
