"""Duty-cycle: fraction of readings above an active-power threshold per
(time window, house, appliance).

The reference's flagship computation (``stream_processing/duty_cycle_avro.py:75-79``):

    groupBy(window(time, W, S), house_id, appliance_id)
      .agg(count(power) AS c_all, count(when(power > thres, True)) AS c_duty)
      .withColumn(duty_cycle, c_duty / c_all)
      .select(window.end AS time_end, house_id, appliance_id, duty_cycle)

SURVEY operators covered: A1 (grouped count), A2 (conditional count), P3
(conditional expression), P4 (derived ratio), P5 (column prune), P6
(struct-field extraction), ST2 (window; tumbling = slide==width special case).

Scale notes: one shuffle on (window, house_id, appliance_id); Catalyst plans
partial+final HashAggregate so the map side combines before the exchange. The
grouping key includes the window, so cardinality is bounded by
(#appliances x #windows) — at 100 TB this is the per-second rollup cardinality,
well distributed because house_id dominates the hash. No UDFs; everything stays
in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_THRESHOLD = 5.0  # watts — reference `example config/config.ini:8`


def duty_cycle(readings: DataFrame,
               window: str = "10 minutes",
               slide: str | None = None,
               threshold: float = DEFAULT_THRESHOLD,
               time_col: str = "ts",
               keys: tuple[str, ...] = ("house_id", "appliance_id"),
               power_col: str = "power") -> DataFrame:
    """Batch duty-cycle over a readings-shaped frame.

    ``slide=None`` -> tumbling (the oracle-checkable variant); pass a slide for
    the reference's sliding 10min/2min semantics (``duty_cycle_avro.py:58-59``).
    """
    win: Column = (F.window(F.col(time_col), window, slide) if slide
                   else F.window(F.col(time_col), window))
    agg = (
        readings
        .groupBy(win.alias("window"), *[F.col(k) for k in keys])
        .agg(
            F.count(F.col(power_col)).alias("c_all"),
            # count-if: count(when(cond, True)) — reference duty_cycle_avro.py:77
            F.count(F.when(F.col(power_col) > F.lit(threshold), True)).alias("c_duty"),
        )
    )
    return (
        agg
        .withColumn("duty_cycle", F.col("c_duty") / F.col("c_all"))
        .select(
            F.col("window.end").alias("time_end"),
            *keys,
            "duty_cycle",
        )
    )


def duty_cycle_oracle_sql(readings_cte: str,
                          window_seconds: int = 600,
                          threshold: float = DEFAULT_THRESHOLD) -> str:
    """DuckDB twin of the tumbling variant.

    ``time_bucket``'s origin (2000-01-03) is a whole multiple of every bucket
    width we use, so it agrees with Spark's epoch-aligned ``window()``.
    """
    return f"""
WITH readings AS ({readings_cte})
SELECT time_bucket(INTERVAL '{window_seconds} seconds', ts)
         + INTERVAL '{window_seconds} seconds' AS time_end,
       house_id,
       appliance_id,
       CAST(count(*) FILTER (WHERE power > {threshold}) AS DOUBLE)
         / count(power) AS duty_cycle
FROM readings
GROUP BY 1, 2, 3
"""
