"""Interval (range) join: all right rows within a bounded time window
before each left row.

The reference has no range join (its one join is the positional label lookup,
SURVEY §2.3 J1); this is the event-correlation primitive a training-data /
clickstream pipeline needs ("every click in the N hours before a purchase"),
and the all-matches complement of the as-of join (`operators/asof.py`, which
keeps only the latest match).

Scale shape: the join condition carries an **equi key** (`on`) next to the
range predicate, so Catalyst plans a shuffled hash / sort-merge join on the
key with the range as a join filter — one shuffle per side, no cartesian
blowup. Never write the range-only form (`ts BETWEEN ...` without an equi
key): that degrades to BroadcastNestedLoopJoin. A plan-shape test pins this
(tests/test_plans.py).

Stream-stream twin: `streaming/stream_ops.py::purchase_click_stream_plan`
runs the same logical join under Structured Streaming with watermarks on both
sides (the time bounds in the condition are what lets Spark evict buffered
state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, on: str,
                  left_ts: str, right_ts: str,
                  lookback: str = "4 hours",
                  how: str = "inner") -> DataFrame:
    """Join each left row to every right row of the same ``on`` key with
    ``right_ts`` in ``(left_ts - lookback, left_ts]``.

    ``left_ts`` / ``right_ts`` must be distinct column names (rename before
    calling); all other columns must not collide except ``on``.
    """
    # alias both sides: when left/right derive from the same source frame
    # (self-join), bare df[col] references collapse to a trivially-true
    # predicate instead of an equi key
    l, r = left.alias("__ij_l"), right.alias("__ij_r")
    lc = lambda c: F.col(f"__ij_l.{c}")  # noqa: E731
    rc = lambda c: F.col(f"__ij_r.{c}")  # noqa: E731
    cond = (
        (lc(on) == rc(on))
        & (rc(right_ts) > lc(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (rc(right_ts) <= lc(left_ts))
    )
    return l.join(r, cond, how).drop(rc(on))


def clicks_before_purchases(events: DataFrame,
                            lookback: str = "4 hours") -> DataFrame:
    """Per purchase: how many clicks the same user made in the preceding
    ``lookback``, and when the last one was. Inner semantics (purchases with
    no prior click drop), matching the DuckDB oracle."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    pairs = interval_join(purchases, clicks, on="user_id",
                          left_ts="purchase_ts", right_ts="click_ts",
                          lookback=lookback)
    return (pairs.groupBy("user_id", "purchase_id")
            .agg(F.count("*").alias("n_clicks"),
                 F.max("click_ts").alias("last_click_ts")))


def clicks_before_purchases_oracle_sql(lookback_sql: str = "4 HOUR") -> str:
    return f"""
SELECT e.user_id,
       e.event_id AS purchase_id,
       count(*) AS n_clicks,
       max(c.ts) AS last_click_ts
FROM events e
JOIN events c
  ON c.user_id = e.user_id
 AND c.event_type = 'click'
 AND c.ts > e.ts - INTERVAL {lookback_sql}
 AND c.ts <= e.ts
WHERE e.event_type = 'purchase'
GROUP BY 1, 2
"""
