"""Dashboard-tier query library (SURVEY §2.4 A7-A9, §2.6 T1-T2, §2.2 P8-P9).

Each function re-expresses one Imply-Pivot tile from
``frontend/dashboard-iGridDemo.json`` as a DataFrame op over either raw
readings or the rollup cube. Where the tile ran Druid topN (approximate), we
ship exact orderBy+limit with a deterministic tie-break — a documented
semantic upgrade (SURVEY §2.6 T1).

Scale notes: totals/top-K over the rollup cube touch only pre-aggregated rows;
top-K compiles to ``TakeOrderedAndProject`` (per-partition heap of K, then a
single K-row merge at the driver — no full sort, no full shuffle). Time-series
tiles shuffle on (bucket, dims) only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def total_power(rollup: DataFrame) -> DataFrame:
    """'Current Total Power' tile (dashboard-iGridDemo.json:20-41, A7):
    global sum, no grouping."""
    return rollup.agg(F.sum("sum_power").alias("total_power"))


def top_k_by_measure(df: DataFrame, dim: str, measure_col: str = "power",
                     k: int = 10, out: str = "sum_power") -> DataFrame:
    """'Top 10 <dim>' tiles (dashboard-iGridDemo.json:42-136, T1).

    Exact top-K: groupBy dim -> sum -> orderBy desc with dim tie-break ->
    limit. Catalyst plans TakeOrderedAndProject (O(K) per partition).
    """
    return (
        df.groupBy(dim)
        .agg(F.sum(F.col(measure_col).cast("double")).alias(out))
        .orderBy(F.desc(out), F.asc(dim))
        .limit(k)
    )


def time_series(df: DataFrame, bucket: str = "5 seconds",
                time_col: str = "ts", measure_col: str = "power",
                extra_dims: tuple[str, ...] = ()) -> DataFrame:
    """Time-bucketed sum series (A8: PT5S/PT1S tiles,
    dashboard-iGridDemo.json:208-218,369-378); with ``extra_dims`` it is the
    two-level time x dimension split (A9, :330-394)."""
    return (
        df.groupBy(F.window(F.col(time_col), bucket).alias("window"),
                   *[F.col(d) for d in extra_dims])
        .agg(F.sum(F.col(measure_col).cast("double")).alias("sum_power"))
        .select(F.col("window.start").alias("bucket_start"),
                *extra_dims, "sum_power")
    )


def relative_time_filter(df: DataFrame, time_col: str = "ts",
                         last: str = "5 minutes",
                         anchor: Column | None = None) -> DataFrame:
    """P9: 'last PT5M from now'. For deterministic replay the anchor is the
    dataset's max event time (broadcast scalar join — no driver round trip,
    no collect), matching the dashboard's moving 'now' frozen at data edge."""
    anchor_df = df.agg(F.max(time_col).alias("__anchor"))
    return (
        df.join(F.broadcast(anchor_df))
        .filter(F.col(time_col) >
                F.col("__anchor") - F.expr(f"INTERVAL {last}"))
        .drop("__anchor")
    )


def filtered_split(readings: DataFrame, house_ids: list[str],
                   last: str = "5 minutes") -> DataFrame:
    """Per-house filtered table tile (P8 IN-list + P9 relative time + T2 sort
    by measure, dashboard-iGridDemo.json:138-193): appliances of selected
    houses, summed power within the recent window."""
    recent = relative_time_filter(readings, last=last)
    return (
        recent
        .filter(F.col("house_id").isin(house_ids))
        .groupBy("house_id", "appliance_id")
        .agg(F.sum(F.col("power").cast("double")).alias("sum_power"),
             F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Oracle twins (DuckDB)
# ---------------------------------------------------------------------------

def total_power_oracle_sql(readings_cte: str) -> str:
    return f"""
WITH readings AS ({readings_cte})
SELECT sum(power) AS total_power FROM readings
"""


def top_k_oracle_sql(readings_cte: str, dim: str, k: int = 10) -> str:
    return f"""
WITH readings AS ({readings_cte})
SELECT {dim}, sum(power) AS sum_power
FROM readings
GROUP BY {dim}
ORDER BY sum_power DESC, {dim} ASC
LIMIT {k}
"""


def time_series_oracle_sql(readings_cte: str, seconds: int,
                           extra_dims: tuple[str, ...] = ()) -> str:
    dims = "".join(f", {d}" for d in extra_dims)
    group = ", ".join(str(i + 1) for i in range(1 + len(extra_dims)))
    return f"""
WITH readings AS ({readings_cte})
SELECT time_bucket(INTERVAL '{seconds} seconds', ts) AS bucket_start{dims},
       sum(power) AS sum_power
FROM readings
GROUP BY {group}
"""


def filtered_split_oracle_sql(readings_cte: str, house_ids: list[str],
                              minutes: int = 5) -> str:
    inlist = ", ".join(f"'{h}'" for h in house_ids)
    return f"""
WITH readings AS ({readings_cte}),
anchor AS (SELECT max(ts) AS a FROM readings)
SELECT house_id, appliance_id,
       sum(power) AS sum_power,
       count(*) AS cnt
FROM readings, anchor
WHERE ts > a - INTERVAL {minutes} MINUTE
  AND house_id IN ({inlist})
GROUP BY 1, 2
"""


def m4_downsample(readings: DataFrame, bucket: str = "1 minute",
                  keys: tuple[str, str] = ("house_id", "appliance_id"),
                  ts_col: str = "ts", value_col: str = "power") -> DataFrame:
    """M4 time-series decimation (Jugel et al. VLDB'14): per (series,
    bucket), keep only the rows realizing min/max VALUE and first/last
    TIME — the 4 points that make a line rendering pixel-identical to the
    full series at the bucket's horizontal resolution. The standard
    dashboard-serving downsample; unlike LTTB it has no sequential
    dependency between buckets, so it parallelizes per bucket — the
    100 TB-first choice.

    All four rankings share the (series, bucket) partitioning = ONE
    shuffle, four window functions over the same sort buffer. Ties order
    by (value, ts) / (ts, value), so every selected row's content is
    deterministic cross-engine even when row identity is not. A row can
    hold several roles (flags, not duplicate rows).
    """
    from pyspark.sql import Window

    b = F.window(F.col(ts_col), bucket)["start"].alias("bucket_start")
    base = readings.select(*keys, b, F.col(ts_col), F.col(value_col))
    part = Window.partitionBy(*keys, "bucket_start")
    rn = {
        "is_min": part.orderBy(F.asc(value_col), F.asc(ts_col)),
        "is_max": part.orderBy(F.desc(value_col), F.asc(ts_col)),
        "is_first": part.orderBy(F.asc(ts_col), F.asc(value_col)),
        "is_last": part.orderBy(F.desc(ts_col), F.asc(value_col)),
    }
    for flag, w in rn.items():
        base = base.withColumn(flag, F.row_number().over(w) == 1)
    return (base.filter("is_min OR is_max OR is_first OR is_last")
            .select(*keys, "bucket_start", ts_col, value_col,
                    "is_min", "is_max", "is_first", "is_last"))


def m4_downsample_oracle_sql(readings_cte: str,
                             bucket_seconds: int = 60) -> str:
    # time_bucket returns plain TIMESTAMP in DuckDB, matching Spark's
    # window().start; to_timestamp returns TIMESTAMPTZ and trips the
    # driver's schema comparison (round-2 verdict item 1).
    tb = f"time_bucket(INTERVAL '{bucket_seconds} seconds', ts)"
    return f"""
WITH readings AS ({readings_cte}),
ranked AS (
  SELECT house_id, appliance_id, {tb} AS bucket_start, ts, power,
         row_number() OVER (PARTITION BY house_id, appliance_id, {tb}
                            ORDER BY power ASC, ts ASC) AS r_min,
         row_number() OVER (PARTITION BY house_id, appliance_id, {tb}
                            ORDER BY power DESC, ts ASC) AS r_max,
         row_number() OVER (PARTITION BY house_id, appliance_id, {tb}
                            ORDER BY ts ASC, power ASC) AS r_first,
         row_number() OVER (PARTITION BY house_id, appliance_id, {tb}
                            ORDER BY ts DESC, power ASC) AS r_last
  FROM readings
)
SELECT house_id, appliance_id, bucket_start, ts, power,
       r_min = 1 AS is_min, r_max = 1 AS is_max,
       r_first = 1 AS is_first, r_last = 1 AS is_last
FROM ranked
WHERE r_min = 1 OR r_max = 1 OR r_first = 1 OR r_last = 1
"""
