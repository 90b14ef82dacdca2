"""Higher-order array functions over embedding columns.

The reference's data model has no arrays (SURVEY §1.2); the driver's
``embeddings`` table (``array<float>``) exercises the array surface a
training-data pipeline needs: elementwise transform, predicate filter,
fold/aggregate, zip_with, sort, and element access — all JVM-side built-ins
(``pyspark.sql.functions`` higher-order functions), no Python in the row
path.

Precision contract with the oracle: every float element is cast to double
*before* arithmetic, and folds run sequentially left-to-right in both
engines (Spark ``aggregate`` and DuckDB ``list_sum``/``list_inner_product``),
so results agree bit-for-bit before the final 6-decimal rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dbl(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def l2_norm(arr: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(arr), F.lit(0.0),
                              lambda acc, x: acc + x * x))


def array_mean(arr: Column) -> Column:
    return (F.aggregate(_dbl(arr), F.lit(0.0), lambda acc, x: acc + x)
            / F.size(arr))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product via zip_with + aggregate."""
    return F.aggregate(F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def array_battery(embeddings: DataFrame,
                  vec_col: str = "embedding") -> DataFrame:
    """One projection exercising the full higher-order-function surface."""
    e = F.col(vec_col)
    return embeddings.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.round(l2_norm(e), 6).alias("l2_norm"),
        F.round(F.array_max(e).cast("double"), 6).alias("max_val"),
        F.round(F.element_at(e, 1).cast("double"), 6).alias("first_val"),
        F.round(array_mean(e), 6).alias("mean_val"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.round(dot(e, F.reverse(e)), 6).alias("dot_rev"),
        F.round(F.element_at(F.array_sort(e), 3).cast("double"), 6)
        .alias("third_smallest"),
    )


ARRAY_BATTERY_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
             / len(embedding), 6) AS mean_val,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       round(list_inner_product(CAST(embedding AS DOUBLE[]),
             list_reverse(CAST(embedding AS DOUBLE[]))), 6) AS dot_rev,
       round(CAST(list_sort(embedding)[3] AS DOUBLE), 6) AS third_smallest
FROM embeddings
"""
