"""Sessionization: gap-based session assignment and session aggregates.

Two equivalent formulations, cross-validated against each other and DuckDB:
- ``sessionize``: the classic batch recipe — lag(ts) per key, flag gaps >
  threshold, running sum of flags = session ordinal (pure window functions,
  oracle-expressible);
- ``session_agg_builtin``: Spark's native ``session_window`` (merge-on-gap),
  the same operator Structured Streaming uses for stateful sessionization
  (SURVEY §2.7 notes session windows as the Spark 3.2+ extension the
  reference lacked).

Scale notes: one shuffle on the session key; windows and session_window both
keep per-key state linear in events-per-key. Skewed keys (one chatty user)
are the risk at 100 TB — AQE skew handling covers joins, and for the window
path a two-level sessionize (date-salted then merge boundary sessions) is the
escape hatch; not needed at driver scales.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap: str = "30 minutes",
               key: str = "user_id", time_col: str = "ts",
               order_tiebreak: str | None = "event_id") -> DataFrame:
    """Append session_id = (key, ordinal) using the lag/cumsum recipe."""
    order = [F.col(time_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_flag = (
        F.when(F.col("__prev_ts").isNull(), 1)
        .when(F.col(time_col) > F.col("__prev_ts") + gap_expr, 1)
        .otherwise(0)
    )
    return (
        events
        .withColumn("__prev_ts", F.lag(time_col).over(w))
        .withColumn("__new_session", new_flag)
        .withColumn("session_seq",
                    F.sum("__new_session").over(
                        w.rowsBetween(Window.unboundedPreceding, 0)))
        .drop("__prev_ts", "__new_session")
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes",
                       key: str = "user_id", time_col: str = "ts",
                       value_col: str = "value") -> DataFrame:
    """Per-session rollup: bounds, event count, value sum."""
    return (
        sessionize(events, gap, key, time_col)
        .groupBy(key, "session_seq")
        .agg(F.min(time_col).alias("session_start"),
             F.max(time_col).alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.sum(value_col).alias("sum_value"))
    )


def session_agg_builtin(events: DataFrame, gap: str = "30 minutes",
                        key: str = "user_id", time_col: str = "ts",
                        value_col: str = "value") -> DataFrame:
    """Same aggregate via the built-in session_window (works in batch and
    under readStream with watermark — the streaming-capable form)."""
    return (
        events
        .groupBy(F.session_window(F.col(time_col), gap).alias("sw"),
                 F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(value_col).alias("sum_value"))
        .select(F.col(key), F.col("sw.start").alias("session_start"),
                "n_events", "sum_value")
    )


def session_stream_plan(events_stream: DataFrame, gap: str = "30 minutes",
                        watermark: str = "1 minute", key: str = "user_id",
                        time_col: str = "ts",
                        value_col: str = "value") -> DataFrame:
    """Streaming sessionization: the same ``session_window`` aggregate under
    a watermark (Spark's stateful merge-on-gap operator — SURVEY §2.7 notes
    session windows as the extension the reference lacked). Append mode emits
    a session once the watermark passes its end (last event + gap).

    State per key is one open session struct; the watermark bounds it. For
    100 TB keyspaces use the RocksDB state store provider."""
    return (
        events_stream
        .withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap).alias("sw"),
                 F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(value_col).alias("sum_value"))
        .select(F.col(key), F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"),
                "n_events", "sum_value")
    )


def sessionize_oracle_sql(gap_minutes: int = 30) -> str:
    """DuckDB twin of session_aggregates over `events`."""
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN ts > lag(ts) OVER w + INTERVAL {gap_minutes} MINUTE THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, sum(value) AS sum_value
FROM sessions
GROUP BY 1, 2
"""


def sessionize_dynamic_gap(events: DataFrame,
                           gap_expr_minutes=None,
                           key: str = "user_id", time_col: str = "ts",
                           order_tiebreak: str = "event_id") -> DataFrame:
    """Per-event-type session gaps (Spark's ``session_window(ts, gap_col)``
    semantics in the batch lag/cumsum formulation): the session stays open
    for the PREVIOUS event's gap — a purchase keeps its session alive longer
    than a click. ``gap_expr_minutes`` is a Column of minutes evaluated per
    row; default maps purchase->60, signup->45, everything else->15.

    Same single hash(key) shuffle as the static form; only the comparison
    constant becomes a per-row expression (still whole-stage codegen).
    """
    if gap_expr_minutes is None:
        gap_expr_minutes = (
            F.when(F.col("event_type") == "purchase", 60)
            .when(F.col("event_type") == "signup", 45)
            .otherwise(15))
    w = Window.partitionBy(key).orderBy(
        F.col(time_col).asc(), F.col(order_tiebreak).asc())
    prev_ts = F.lag(time_col).over(w)
    prev_gap_min = F.lag(gap_expr_minutes).over(w)
    new_flag = (
        F.when(prev_ts.isNull(), 1)
        .when(F.col(time_col) >
              prev_ts + prev_gap_min * F.expr("INTERVAL 1 MINUTE"), 1)
        .otherwise(0))
    return (events
            .withColumn("__new_session", new_flag)
            .withColumn("session_seq", F.sum("__new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("__new_session"))


def sessionize_dynamic_gap_oracle_sql() -> str:
    return """
WITH g AS (
  SELECT user_id, ts, event_id, value, event_type,
         CASE WHEN event_type = 'purchase' THEN 60
              WHEN event_type = 'signup' THEN 45
              ELSE 15 END AS gap_min
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN ts > lag(ts) OVER w
                   + to_minutes(CAST(lag(gap_min) OVER w AS BIGINT)) THEN 1
              ELSE 0 END AS new_session
  FROM g
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq,
       ts, event_id
FROM flagged
"""
