"""Streaming state-store introspection (Spark 4 State Data Source).

A long-running 100 TB streaming job's health questions — how many keys am I
holding, is state skewed across stores, which operator owns the growth —
are answerable OFFLINE from the checkpoint, without touching the running
query: ``spark.read.format("statestore")`` materializes the committed state
rows of any stateful operator, and ``format("state-metadata")`` lists the
operators and their store names.

The reference stack answers the same questions with Druid's segment
metadata endpoints; here the state checkpoint IS the queryable artifact.
These helpers are ops tooling (they read a runtime-local checkpoint path),
so they ship as a module + tests rather than a registered driver query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator inventory of a checkpoint: (operatorId, operatorName,
    stateStoreName, numPartitions, min/max batch id) — the map you need
    before pointing ``read_state`` at anything."""
    return (spark.read.format("state-metadata").load(checkpoint_dir))


def read_state(spark: SparkSession, checkpoint_dir: str,
               operator_id: int = 0, store_name: str | None = None,
               batch_id: int | None = None,
               join_side: str | None = None) -> DataFrame:
    """Committed state rows of one stateful operator as a batch DataFrame
    (columns ``key`` struct, ``value`` struct, ``partition_id``). Reads the
    LAST committed batch unless ``batch_id`` pins an earlier one; stream-
    stream joins address their four internal stores via ``join_side``
    ('left'/'right') instead of ``store_name``."""
    reader = (spark.read.format("statestore")
              .option("operatorId", operator_id))
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if join_side is not None:
        reader = reader.option("joinSide", join_side)
    return reader.load(checkpoint_dir)


def state_skew_report(spark: SparkSession, checkpoint_dir: str,
                      operator_id: int = 0) -> DataFrame:
    """Rows per state-store partition plus each partition's share of the
    total — the skew audit that decides whether the state shuffle key needs
    salting before the store grows into it. One row per NON-EMPTY
    partition: (partition_id, n_keys, share)."""
    st = read_state(spark, checkpoint_dir, operator_id)
    per = st.groupBy("partition_id").agg(F.count(F.lit(1)).alias("n_keys"))
    total = per.agg(F.sum("n_keys").alias("t"))
    return (per.join(F.broadcast(total))
            .select("partition_id", "n_keys",
                    F.round(F.col("n_keys") / F.col("t"), 6).alias("share"))
            .orderBy(F.desc("n_keys"), F.asc("partition_id")))
