"""General relational surface (SURVEY §2.3-§2.6 extensions, §7.2 step 5).

The reference needed only one join (J1); the engine generalizes to the full
relational surface over the driver's star schema so any query a reference
user writes against the cube model has a home. Thin, well-named wrappers —
Catalyst/AQE do the physical work (broadcast-vs-sort-merge choice, shuffle
coalescing, skew splitting).

Scale notes per wrapper are in the docstrings; the shared principles:
- dimension joins broadcast (no fact shuffle);
- fact-fact joins sort-merge on the join key, AQE handles skew;
- top-K compiles to TakeOrderedAndProject (never a global sort);
- window functions shuffle once on partitionBy keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, partition_by: list[str],
                    order_by: list[Column], k: int,
                    rank_col: str = "rn") -> DataFrame:
    """row_number-based top-K within each group (generalizes the dashboard's
    global top-K, SURVEY §2.5). One shuffle on ``partition_by``; rows beyond
    K are dropped before any further stage."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


def running_total(df: DataFrame, partition_by: list[str],
                  order_by: list[Column], value: Column,
                  out: str) -> DataFrame:
    """Prefix sum per group (rows unbounded-preceding..current)."""
    w = (Window.partitionBy(*partition_by).orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out, F.sum(value).over(w))


def with_lag(df: DataFrame, partition_by: list[str], order_by: list[Column],
             col: str, out: str, offset: int = 1) -> DataFrame:
    """lag() — previous row's value within the group ordering."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out, F.lag(col, offset).over(w))
