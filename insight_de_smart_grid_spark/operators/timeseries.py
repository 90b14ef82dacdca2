"""Telemetry time-series repair: gap filling (regular grid + forward fill)
and counter-delta extraction — the two cleanups every metering pipeline
(the reference's domain) runs before analytics.

Reference context: REDD/GREEND channel files arrive with dropped intervals
and meter restarts (`database/data_download.sh` sources; SURVEY §1.1's
readings stream). Druid tolerates gaps by storing sparse rows; consumers
then see missing buckets. This engine makes the repair explicit and
distributed.

Scale notes: both operators partition by the entity key — one hash(key)
shuffle each, windows sort per key only. Gap filling generates the time
grid with ``sequence()`` per key (JVM, no driver loop); grid size is
bounded by each key's own observed span, so a short-lived meter doesn't
inflate to the corpus timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(events: DataFrame, key_col: str = "user_id",
             ts_col: str = "ts", value_col: str = "value",
             bucket: str = "hour") -> DataFrame:
    """Regularize each key's series to one row per ``bucket``, carrying the
    last observed aggregate forward across gaps.

    Output: (key, bucket_ts, value, is_observed) where ``value`` is the
    bucket's mean when observed, else the most recent earlier bucket's mean.
    The leading edge (before a key's first observation) cannot be filled
    and does not exist in the grid — each key's grid spans its own
    [first, last] observed bucket.
    """
    observed = (
        events.groupBy(F.col(key_col).alias("key"),
                       F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"))
        .agg(F.round(F.avg(value_col), 6).alias("obs_value"))
    )
    spans = observed.groupBy("key").agg(
        F.min("bucket_ts").alias("first_ts"),
        F.max("bucket_ts").alias("last_ts"))
    grid = spans.select(
        "key",
        F.explode(F.sequence(
            F.col("first_ts"), F.col("last_ts"),
            F.expr(f"INTERVAL 1 {bucket}"))).alias("bucket_ts"))
    w = (Window.partitionBy("key").orderBy("bucket_ts")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        grid.join(observed, ["key", "bucket_ts"], "left")
        .select(
            "key", "bucket_ts",
            F.last("obs_value", ignorenulls=True).over(w).alias("value"),
            F.col("obs_value").isNotNull().alias("is_observed"))
    )


def gap_fill_oracle_sql(bucket: str = "hour") -> str:
    return f"""
WITH observed AS (
  SELECT user_id AS key, date_trunc('{bucket}', ts) AS bucket_ts,
         round(avg(value), 6) AS obs_value
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT key, min(bucket_ts) AS first_ts, max(bucket_ts) AS last_ts
  FROM observed GROUP BY 1
), grid AS (
  SELECT key, unnest(generate_series(first_ts, last_ts,
                                     INTERVAL 1 {bucket})) AS bucket_ts
  FROM spans
)
SELECT g.key, CAST(g.bucket_ts AS TIMESTAMP) AS bucket_ts,
       last_value(o.obs_value IGNORE NULLS)
           OVER (PARTITION BY g.key ORDER BY g.bucket_ts
                 ROWS UNBOUNDED PRECEDING) AS value,
       o.obs_value IS NOT NULL AS is_observed
FROM grid g LEFT JOIN observed o
  ON g.key = o.key AND g.bucket_ts = o.bucket_ts
"""


def interpolate_gaps(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     bucket: str = "hour") -> DataFrame:
    """Like :func:`gap_fill` but gaps interpolate LINEARLY between the
    surrounding observed buckets instead of carrying the last value forward —
    the repair of choice for slowly-varying physical signals (temperature,
    battery level) where a step function distorts downstream aggregates.

    Each key's grid spans its own [first, last] observed bucket, so every
    unobserved grid row has both a previous and a next observation; the
    fill is prev + (next - prev) * elapsed/span on epoch seconds. Same
    single hash(key) shuffle as gap_fill; the two directional window passes
    share one sort."""
    observed = (
        events.groupBy(F.col(key_col).alias("key"),
                       F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"))
        .agg(F.round(F.avg(value_col), 6).alias("obs_value"))
    )
    spans = observed.groupBy("key").agg(
        F.min("bucket_ts").alias("first_ts"),
        F.max("bucket_ts").alias("last_ts"))
    grid = spans.select(
        "key",
        F.explode(F.sequence(
            F.col("first_ts"), F.col("last_ts"),
            F.expr(f"INTERVAL 1 {bucket}"))).alias("bucket_ts"))
    wb = (Window.partitionBy("key").orderBy("bucket_ts")
          .rowsBetween(Window.unboundedPreceding, 0))
    # the forward walls come from a REVERSE-ordered running frame: Spark
    # evaluates unboundedFollowing frames by rescanning current..end for
    # every row (O(n^2) per key — measured 18s vs 1s at sf0.1); a running
    # unboundedPreceding frame over the reversed sort is the same value in
    # O(n), at the cost of one extra in-partition sort
    wr = (Window.partitionBy("key").orderBy(F.desc("bucket_ts"))
          .rowsBetween(Window.unboundedPreceding, 0))
    obs_ts = F.when(F.col("obs_value").isNotNull(), F.col("bucket_ts"))
    prev_v = F.last("obs_value", ignorenulls=True).over(wb)
    prev_t = F.last(obs_ts, ignorenulls=True).over(wb)
    next_v = F.last("obs_value", ignorenulls=True).over(wr)
    next_t = F.last(obs_ts, ignorenulls=True).over(wr)
    frac = ((F.unix_timestamp(F.col("bucket_ts"))
             - F.unix_timestamp(prev_t)).cast("double")
            / (F.unix_timestamp(next_t)
               - F.unix_timestamp(prev_t)).cast("double"))
    return (
        grid.join(observed, ["key", "bucket_ts"], "left")
        .select(
            "key", "bucket_ts",
            # Truncate the fill (floor on the scaled double) instead of
            # round(): interpolation of 6-decimal walls creates EXACT .xxxxxx5
            # ties (frac=1/2 is a binary fraction) where Spark's HALF_UP and
            # DuckDB's rounding disagree; floor of identical doubles cannot.
            F.when(F.col("obs_value").isNotNull(), F.col("obs_value"))
            .otherwise(F.floor((prev_v + (next_v - prev_v) * frac)
                               * F.lit(1000000.0)) / F.lit(1000000.0))
            .alias("value"),
            F.col("obs_value").isNotNull().alias("is_observed"))
    )


def interpolate_gaps_oracle_sql(bucket: str = "hour") -> str:
    return f"""
WITH observed AS (
  SELECT user_id AS key, date_trunc('{bucket}', ts) AS bucket_ts,
         round(avg(value), 6) AS obs_value
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT key, min(bucket_ts) AS first_ts, max(bucket_ts) AS last_ts
  FROM observed GROUP BY 1
), grid AS (
  SELECT key, unnest(generate_series(first_ts, last_ts,
                                     INTERVAL 1 {bucket})) AS bucket_ts
  FROM spans
), joined AS (
  SELECT g.key, g.bucket_ts, o.obs_value,
         CASE WHEN o.obs_value IS NOT NULL THEN g.bucket_ts END AS obs_ts
  FROM grid g LEFT JOIN observed o
    ON g.key = o.key AND g.bucket_ts = o.bucket_ts
), walls AS (
  SELECT key, bucket_ts, obs_value,
         last_value(obs_value IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bucket_ts
                   ROWS UNBOUNDED PRECEDING) AS prev_v,
         last_value(obs_ts IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bucket_ts
                   ROWS UNBOUNDED PRECEDING) AS prev_t,
         first_value(obs_value IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bucket_ts
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS next_v,
         first_value(obs_ts IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bucket_ts
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS next_t
  FROM joined
)
SELECT key, CAST(bucket_ts AS TIMESTAMP) AS bucket_ts,
       CASE WHEN obs_value IS NOT NULL THEN obs_value
            ELSE floor((prev_v + (next_v - prev_v)
                        * (CAST(epoch(bucket_ts) - epoch(prev_t) AS DOUBLE)
                           / CAST(epoch(next_t) - epoch(prev_t) AS DOUBLE)))
                       * 1000000.0) / 1000000.0
       END AS value,
       obs_value IS NOT NULL AS is_observed
FROM walls
"""


def counter_deltas(events: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Per-reading consumption deltas from a (possibly resetting) counter:
    delta vs previous reading, a reset flag when the counter went backward,
    and the non-negative consumption contribution (reset rows contribute
    the post-reset absolute value, the standard meter-restart convention).
    First reading per key has no predecessor and drops (inner semantics).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(value_col).over(w)
    delta = F.round(F.col(value_col) - prev, 6)
    return (events
            .select(key_col, ts_col, value_col,
                    delta.alias("delta"),
                    (delta < 0).alias("is_reset"),
                    F.round(F.when(delta < 0, F.col(value_col))
                            .otherwise(delta), 6).alias("consumed"))
            .where(F.col("delta").isNotNull()))


def counter_deltas_oracle_sql() -> str:
    return """
WITH seq AS (
  SELECT user_id, ts, value,
         round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts), 6)
             AS delta
  FROM events
)
SELECT user_id, ts, value, delta,
       delta < 0 AS is_reset,
       round(CASE WHEN delta < 0 THEN value ELSE delta END, 6) AS consumed
FROM seq WHERE delta IS NOT NULL
"""


def time_weighted_avg(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", value_col: str = "value",
                      bucket: str = "day") -> DataFrame:
    """Time-weighted average per (key, bucket) for IRREGULARLY sampled
    series — the metering aggregate plain avg() gets wrong: a reading held
    for 50 minutes must weigh 10x one held for 5. Each reading weighs its
    duration-until-next-reading (lead window, clipped at the bucket edge;
    a key's last reading in a bucket carries to the bucket edge). Weights
    are integer MICROseconds (unix_micros — second-granularity truncation
    differs between engines when timestamps carry sub-second parts), so
    the weighted sum is sum(value * int) — one
    hash(key) shuffle for the lead window, then a grouped aggregation on
    (key, bucket): identical scale shape to counter_deltas."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    bucket_start = F.date_trunc(bucket, F.col(ts_col))
    bucket_end = bucket_start + F.expr(f"INTERVAL 1 {bucket}")
    next_ts = F.coalesce(
        F.least(F.lead(ts_col).over(w), bucket_end), bucket_end)
    dt = F.unix_micros(next_ts) - F.unix_micros(F.col(ts_col))
    return (events
            .select(F.col(key_col).alias("key"),
                    bucket_start.alias("bucket_ts"),
                    F.col(value_col).alias("v"), dt.alias("dt"))
            .where(F.col("dt") > 0)
            .groupBy("key", "bucket_ts")
            .agg((F.sum(F.col("v") * F.col("dt"))
                  / F.sum("dt")).alias("twa"),
                 F.sum("dt").alias("covered_us"),
                 F.count(F.lit(1)).alias("n_readings")))


def time_weighted_avg_oracle_sql(bucket: str = "day") -> str:
    return f"""
WITH seq AS (
  SELECT user_id AS key,
         CAST(date_trunc('{bucket}', ts) AS TIMESTAMP) AS bucket_ts,
         value AS v,
         epoch_us(coalesce(
             least(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
                   date_trunc('{bucket}', ts) + INTERVAL 1 {bucket}),
             date_trunc('{bucket}', ts) + INTERVAL 1 {bucket}))
              - epoch_us(ts) AS dt
  FROM events
)
SELECT key, bucket_ts,
       sum(v * dt) / sum(dt) AS twa,
       CAST(sum(dt) AS BIGINT) AS covered_us,
       count(*) AS n_readings
FROM seq WHERE dt > 0
GROUP BY 1, 2
"""
