"""Generic file-source stream replay: run any streaming plan over a parquet
table with ``availableNow`` and collect the finalized result.

In production the source is ``readStream.format("kafka")`` (SURVEY S1) and
the sink Kafka or partitioned Parquet (S4/S9); file-in/memory-out runs the
identical logical plan without brokers, which is what makes streaming
operators driver-checkable and batch≡stream testable.
"""

from __future__ import annotations

import tempfile
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def parquet_stream_source(spark: SparkSession, parquet_path: str) -> DataFrame:
    """Schema-pinned streaming file source over a parquet table. The file
    source requires a directory, so a single parquet file is staged behind a
    symlink dir; nanos-precision timestamps surface as longs (same policy as
    ``sources.tables.load_table``) for the plan's projection to convert."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p = Path(parquet_path)
    if p.is_file():
        staged = Path(tempfile.mkdtemp(prefix="stream_src_"))
        (staged / p.name).symlink_to(p)
        parquet_path = str(staged)
    schema = spark.read.parquet(parquet_path).schema
    return (spark.readStream.schema(schema).format("parquet")
            .load(parquet_path))


def replay_parquet_stream(spark: SparkSession, parquet_path: str,
                          plan_fn: Callable[[DataFrame], DataFrame],
                          query_name: str,
                          checkpoint_dir: str | None = None,
                          out_dir: str | None = None,
                          state_partitions: int | None = 8) -> DataFrame:
    """Build ``plan_fn(stream)`` over a parquet file source and drain it with
    ``trigger(availableNow=True)``; returns the sink contents as a batch
    DataFrame (memory sink by default, fault-tolerant parquet sink when
    ``out_dir`` is given).

    ``state_partitions`` sizes the stateful shuffle (= number of state store
    instances, fixed at first start). Per-store open/commit overhead dominates
    when state is small, so default low; on a cluster size it to the key
    cardinality. Scoped to this query — the session conf is restored after.
    """
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    plan = plan_fn(parquet_stream_source(spark, parquet_path))
    try:
        if out_dir:
            writer = (plan.writeStream.outputMode("append")
                      .format("parquet").option("path", out_dir)
                      .trigger(availableNow=True))
            if checkpoint_dir:
                writer = writer.option("checkpointLocation", checkpoint_dir)
            q = writer.start()
            q.awaitTermination()
            return spark.read.parquet(out_dir)
        writer = (plan.writeStream.outputMode("append")
                  .format("memory").queryName(query_name)
                  .trigger(availableNow=True))
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        q = writer.start()
        q.awaitTermination()
        return spark.table(query_name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
