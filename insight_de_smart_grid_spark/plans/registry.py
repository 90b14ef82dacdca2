"""Registry of named queries: Spark callable + DuckDB oracle twin.

Each entry is ``name -> Query(fn, sql)`` where ``fn(spark, sf_dir) ->
DataFrame`` and ``sql`` is ANSI SQL DuckDB runs over the same parquet views
(``region nation customer supplier part orders lineitem events documents
embeddings``). ``sql=None`` marks genuinely non-SQL-expressible ops (the
driver then records a rows-only check).

Column names are part of the contract: the driver sorts columns by name and
hash-compares values, so every computed column is aliased identically on both
sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from insight_de_smart_grid_spark.sources.tables import (
    READINGS_SQL_VIEW,
    readings_view,
)
from insight_de_smart_grid_spark.operators import duty_cycle as dc


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None


QUERIES: dict[str, Query] = {}


def register(name: str, sql: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(fn, sql)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}


# --------------------------------------------------------------------------
# Reference-parity queries over `events` (as the readings stream)
# --------------------------------------------------------------------------

@register("duty_cycle_10m", dc.duty_cycle_oracle_sql(READINGS_SQL_VIEW, 600))
def q_duty_cycle_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: tumbling 10-minute duty cycle per (house, appliance).

    Reference: stream_processing/duty_cycle_avro.py:75-79 (SURVEY A1 A2 P3 P4
    P5 P6 ST2-tumbling).
    """
    return dc.duty_cycle(readings_view(spark, sf_dir), window="10 minutes")


# Import side-effect modules that register further queries.
from insight_de_smart_grid_spark.plans import query_library  # noqa: E402,F401
from insight_de_smart_grid_spark.plans import star_queries  # noqa: E402,F401
from insight_de_smart_grid_spark.plans import extension_queries  # noqa: E402,F401
from insight_de_smart_grid_spark.plans import advanced_queries  # noqa: E402,F401
from insight_de_smart_grid_spark.plans import analytic_queries  # noqa: E402,F401
from insight_de_smart_grid_spark.plans import tpch_shapes  # noqa: E402,F401
from insight_de_smart_grid_spark.plans import tpch_close  # noqa: E402,F401
from insight_de_smart_grid_spark.plans import sketch_queries  # noqa: E402,F401
