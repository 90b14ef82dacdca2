"""Small driver-side row lists -> DataFrames without Python-RDD tasks
(optimization round 11, guide §4 "the Python boundary").

``spark.createDataFrame(list_of_rows, schema)`` parallelizes the rows
into ``defaultParallelism`` PYTHON-RDD partitions: every downstream
action pays one Python-worker roundtrip per partition (~0.15 s each on
this host), and a ``coalesce(1)`` write — the staged-segment shape the
index families use for their k-row centroid/plane/id tables — folds all
32 into ONE task that pays them SEQUENTIALLY (measured: 5.5-6.7 s to
write 8 centroid rows; the dominant cost of the whole trained-IVF
lifecycle queries).

The pandas/Arrow construction instead serializes the rows to the JVM
once at creation (``_serialize_to_jvm`` — the executed plan scans
JVM-held Arrow batches, no Python workers at all): the same 8-row
coalesce(1) write is ~0.2 s. This helper is that construction with the
row-list call shape, falling back to the plain path on anything Arrow
cannot map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _as_struct(spark: SparkSession, schema) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(schema)


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for SMALL driver-side row
    lists, built through one Arrow batch so no Python-RDD partitions
    exist in the plan. Value-identical to the plain path (same schema,
    same rows; floats are float64 in both constructions). Falls back to
    the plain ``createDataFrame`` on any conversion surprise."""
    rows = list(rows)
    try:
        struct = _as_struct(spark, schema)
        import pandas as pd

        pdf = pd.DataFrame.from_records(
            rows, columns=[f.name for f in struct.fields])
        return spark.createDataFrame(pdf, schema=struct)
    except Exception:
        return spark.createDataFrame(rows, schema)
