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


def run_stream_over_parquet(spark: SparkSession, parquet_path: str,
                            to_readings, query_name: str = "duty_stream",
                            checkpoint_dir: str | None = None,
                            out_dir: str | None = None,
                            state_partitions: int | None = 8,
                            flush_sentinel: bool = False,
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
    """
    return replay_parquet_stream(
        spark, parquet_path,
        lambda stream: duty_cycle_stream_plan(to_readings(stream),
                                              **plan_kwargs),
        query_name=query_name, checkpoint_dir=checkpoint_dir,
        out_dir=out_dir, state_partitions=state_partitions,
        flush_sentinel=flush_sentinel)
