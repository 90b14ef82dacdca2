"""Streaming duty-cycle: the reference's continuous query under Structured
Streaming (SURVEY §3.1; ``stream_processing/duty_cycle_avro.py``).

Operator coverage:
- ST1 event-time watermark (`withWatermark`, drops rows later than the bound
  — reference uses 2 s, ``duty_cycle_avro.py:75``);
- ST2 sliding event-time window (10 min / 2 min logical,
  ``duty_cycle_avro.py:58-59,76``);
- ST3 stateful windowed aggregation across micro-batches;
- ST4 append output mode (window emitted only once finalized);
- ST5 scheduled cadence via ``trigger(availableNow=True)`` — replaces the
  reference's Airflow DAG (``batch/airflow_DAG.py``) with a Spark-native
  incremental batch.

The same logical plan builder is shared with the batch operator
(`operators/duty_cycle.py`), which is what makes the batch≡stream contract
testable: one definition, two execution modes.

Scale notes: state is keyed by (window, house, appliance); the watermark
bounds state size to (window/slide + late-bound) generations per key. For a
100 TB keyspace use the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) and a checkpoint dir on
shared storage — both plain configs, no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators.duty_cycle import DEFAULT_THRESHOLD
from insight_de_smart_grid_spark.streaming.replay import replay_parquet_stream


def duty_cycle_stream_plan(stream: DataFrame,
                           window: str = "10 minutes",
                           slide: str | None = "2 minutes",
                           watermark: str = "2 seconds",
                           threshold: float = DEFAULT_THRESHOLD,
                           time_col: str = "ts",
                           keys: tuple[str, ...] = ("house_id",
                                                    "appliance_id"),
                           power_col: str = "power") -> DataFrame:
    """Streaming logical plan: watermark -> sliding window group ->
    count/count-if -> ratio (duty_cycle_avro.py:75-79)."""
    win = (F.window(F.col(time_col), window, slide) if slide
           else F.window(F.col(time_col), window))
    agg = (
        stream
        .withWatermark(time_col, watermark)
        .groupBy(win.alias("window"), *[F.col(k) for k in keys])
        .agg(F.count(F.col(power_col)).alias("c_all"),
             F.count(F.when(F.col(power_col) > F.lit(threshold), True))
             .alias("c_duty"))
    )
    return (
        agg.withColumn("duty_cycle", F.col("c_duty") / F.col("c_all"))
        .select(F.col("window.end").alias("time_end"), *keys, "duty_cycle")
    )


def duty_cycle_stream_panes_plan(stream: DataFrame,
                                 window: str = "10 minutes",
                                 slide: str = "2 minutes",
                                 watermark: str = "2 seconds",
                                 threshold: float = DEFAULT_THRESHOLD,
                                 time_col: str = "ts",
                                 keys: tuple[str, ...] = ("house_id",
                                                          "appliance_id"),
                                 power_col: str = "power") -> DataFrame:
    """Pane-decomposed STREAMING sliding duty cycle — the scale twin of
    ``duty_cycle_stream_plan`` (round-6 batch twin:
    ``operators/duty_cycle.py`` ``panes=True``), now in the execution mode
    the reference actually runs (duty_cycle_avro.py:75-89 is a continuous
    query over 1 Hz meters).

    WHY: Spark's sliding ``window()`` explodes every event into
    window/slide copies BEFORE the stateful aggregation, so the state
    store ingests 5x the stream for the reference's 10min/2min shape —
    at 1 Hz meter density that is ~5x state-store writes, checkpoint
    bytes, and shuffle volume, all pure overhead because both counts are
    sums and therefore pane-decomposable ("No pane, no gain", Li et al.
    SIGMOD Record '05).

    HOW: two CHAINED stateful aggregations in append mode (multiple
    stateful operators, Spark 3.4+ / SPARK-40925):

    1. tumbling slide-width PANE aggregate — the state store ingests
       each event exactly ONCE (keyed (pane, house, appliance));
    2. sliding window over the pane's window column — Spark assigns the
       pane's event-time (``window_time`` = pane end - 1 microsecond) to
       the window/slide containing sliding windows, exactly the
       epoch-aligned window set the explode form assigns each event, and
       sums the pane partials. Its state input is bounded by #keys x
       #panes — aggregated cardinality, not event cardinality.

    Append-mode flush cascades through both operators in the final
    no-data micro-batch: stage 1 emits every pane whose end <= final
    watermark, stage 2 consumes them in the same batch and emits every
    window whose end <= that watermark; a window's panes all end at or
    before the window end, so a finalized window always has its full
    pane set — the emitted rows are identical to the explode form's
    (pinned by ``test_streaming_panes_equal_explode_stream`` and the
    ``streaming_duty_cycle_panes`` oracle row, same SQL as
    ``streaming_duty_cycle``)."""
    pane = (
        stream
        .withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), slide).alias("pane"),
                 *[F.col(k) for k in keys])
        .agg(F.count(F.col(power_col)).alias("p_all"),
             F.count(F.when(F.col(power_col) > F.lit(threshold), True))
             .alias("p_duty"))
    )
    agg = (
        pane
        .groupBy(F.window(F.col("pane"), window, slide).alias("window"),
                 *[F.col(k) for k in keys])
        .agg(F.sum("p_all").alias("c_all"),
             F.sum("p_duty").alias("c_duty"))
    )
    return (
        agg.withColumn("duty_cycle", F.col("c_duty") / F.col("c_all"))
        .select(F.col("window.end").alias("time_end"), *keys, "duty_cycle")
    )


def run_stream_over_parquet(spark: SparkSession, parquet_path: str,
                            to_readings, query_name: str = "duty_stream",
                            checkpoint_dir: str | None = None,
                            out_dir: str | None = None,
                            state_partitions: int | None = 8,
                            flush_sentinel: bool = False,
                            panes: "bool | str" = False,
                            progress_out: "list | None" = None,
                            **plan_kwargs) -> DataFrame:
    """Replay a parquet table through the streaming plan with
    ``availableNow`` + memory sink; returns the finalized (append-mode)
    result as a batch DataFrame.

    ``to_readings`` maps the raw stream frame to readings shape (the
    streaming twin of ``sources.tables.readings_view``). In production the
    source would be ``readStream.format("kafka")`` (S1) and the sink Kafka or
    partitioned Parquet (S4/S9); file-in/memory-out keeps the identical plan
    testable without brokers.

    ``state_partitions`` sizes the stateful shuffle; see
    ``streaming.replay.replay_parquet_stream`` (the shared runner).
    ``panes=True`` routes through the pane-decomposed chained-stateful
    plan (``duty_cycle_stream_panes_plan``); ``panes="auto"`` runs the
    batch density probe (``operators.duty_cycle.pane_density``) over the
    SAME parquet input before starting the stream — an unbounded live
    stream can't be probed, but this runner is the ST5 scheduled
    micro-batch mode (availableNow over a bounded replay source), where
    the input is exactly the history the probe should read; a live
    deployment would probe yesterday's table the same way.
    ``progress_out`` collects the drained query's progress objects
    (state-operator metrics)."""
    if panes == "auto":
        from insight_de_smart_grid_spark.operators.duty_cycle import (
            PANE_DENSITY_CROSSOVER,
            PROBE_SAMPLE_FRACTION,
            _interval_seconds,
            pane_density,
            probe_kwargs,
        )
        # fallbacks come from the pane plan's OWN signature defaults, so a
        # changed plan default can never desynchronize the probe (advisory)
        pk = probe_kwargs(duty_cycle_stream_panes_plan, plan_kwargs)
        w_s = _interval_seconds(pk["window"])
        s_s = _interval_seconds(pk["slide"]) if pk["slide"] else None
        panes = bool(pk["slide"] and w_s and s_s and w_s % s_s == 0
                     and w_s != s_s)
        if panes:
            from insight_de_smart_grid_spark.sources.pq import read_parquet

            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            readings = to_readings(read_parquet(spark, parquet_path))
            panes = (pane_density(
                readings, s_s, time_col=pk["time_col"], keys=pk["keys"],
                sample_fraction=PROBE_SAMPLE_FRACTION)
                >= PANE_DENSITY_CROSSOVER)
    plan = duty_cycle_stream_panes_plan if panes else duty_cycle_stream_plan
    return replay_parquet_stream(
        spark, parquet_path,
        lambda stream: plan(to_readings(stream), **plan_kwargs),
        query_name=query_name, checkpoint_dir=checkpoint_dir,
        out_dir=out_dir, state_partitions=state_partitions,
        flush_sentinel=flush_sentinel, progress_out=progress_out)
