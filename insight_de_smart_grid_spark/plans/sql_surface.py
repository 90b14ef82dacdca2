"""Spark SQL entry point: the same engine semantics as ANSI SQL text over
registered temp views (SURVEY §7.1 — every operator family available both as
DataFrame functions and as `spark.sql` text).

`create_views` registers the star schema + the canonical `readings` mapping;
`SQL_QUERIES` holds one representative Spark-SQL text per operator family.
`tests/test_sql_surface.py` proves each SQL text returns exactly what its
DataFrame twin returns, so the two surfaces can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from insight_de_smart_grid_spark.sources.tables import (
    TABLES,
    load_table,
    readings_view,
)


def create_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every base table and the readings mapping as temp views."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    readings_view(spark, sf_dir).createOrReplaceTempView("readings")


# name -> (spark-sql text, DataFrame-twin query name in the registry)
SQL_QUERIES: dict[str, tuple[str, str]] = {
    "sql_duty_cycle": ("""
        SELECT window(ts, '10 minutes').end AS time_end,
               house_id, appliance_id,
               count(if(power > 5.0D, true, NULL)) / count(power) AS duty_cycle
        FROM readings
        GROUP BY window(ts, '10 minutes'), house_id, appliance_id
    """, "duty_cycle_10m"),
    "sql_rollup_reagg": ("""
        WITH rollup_1s AS (
          SELECT window(ts, '1 second').start AS window_start,
                 house_id, appliance_id,
                 count(1) AS cnt,
                 sum(CAST(power AS DOUBLE)) AS sum_power
          FROM readings
          GROUP BY window(ts, '1 second'), house_id, appliance_id
        )
        SELECT house_id, appliance_id,
               sum(cnt) AS cnt, sum(sum_power) AS sum_power,
               sum(sum_power) / sum(cnt) AS avg_power
        FROM rollup_1s
        GROUP BY house_id, appliance_id
    """, "rollup_reagg"),
    "sql_top10_appliance": ("""
        SELECT appliance_name, sum(CAST(power AS DOUBLE)) AS sum_power
        FROM readings
        GROUP BY appliance_name
        ORDER BY sum_power DESC, appliance_name ASC
        LIMIT 10
    """, "dash_top10_appliance"),
    "sql_sessionize": ("""
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL THEN 1
                      WHEN ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1
                      ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sessions AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts ASC, event_id ASC
                                        ROWS UNBOUNDED PRECEDING)
                   AS session_seq
          FROM flagged
        )
        SELECT user_id, session_seq,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, sum(value) AS sum_value
        FROM sessions
        GROUP BY user_id, session_seq
    """, "sessionize_events"),
    "sql_dedup_exact": ("""
        SELECT md5(regexp_replace(lower(trim(text)), '\\\\s+', ' ')) AS fp,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """, "dedup_exact"),
}


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    create_views(spark, sf_dir)
    return spark.sql(SQL_QUERIES[name][0])
