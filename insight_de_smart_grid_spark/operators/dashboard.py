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
