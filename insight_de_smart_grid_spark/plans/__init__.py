"""Named-query registry (driver contract lives in __spark_entry__.py)."""

from insight_de_smart_grid_spark.plans.registry import QUERIES, queries, oracle_sql

__all__ = ["QUERIES", "queries", "oracle_sql"]
