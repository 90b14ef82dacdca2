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


def salted_sum(df: DataFrame, keys: list[str], value_col: str,
               salt_from: str, n_salts: int = 8) -> DataFrame:
    """Skew-resistant grouped sum: two-stage aggregation through a salt.

    A single hot key (one chatty house, one viral document) makes one reducer
    the straggler at 100 TB. Salting splits each key's rows across
    ``n_salts`` partial groups (stage 1 shuffles on (key, salt) — uniform by
    construction), then the tiny partial table re-aggregates on the key
    alone. AQE's skew handling covers joins; this is the aggregation-side
    equivalent, worth it only for additive aggregates on known-skewed keys —
    for uniform keys Spark's map-side partial aggregation already does this.

    ``salt_from`` is a row-level column hashed into the salt, keeping the
    operator fully deterministic (no rand()). Output: keys + sum_<value_col>
    + n_rows.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)))
    partial = (salted.groupBy(*keys, "__salt")
               .agg(F.sum(F.col(value_col).cast("double")).alias("__psum"),
                    F.count(F.lit(1)).alias("__pcnt")))
    return (partial.groupBy(*keys)
            .agg(F.round(F.sum("__psum"), 6).alias(f"sum_{value_col}"),
                 F.sum("__pcnt").alias("n_rows")))
