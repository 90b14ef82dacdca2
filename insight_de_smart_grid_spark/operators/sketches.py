"""Mergeable-sketch rollup: HyperLogLog count-distinct stored IN the rollup
table and re-aggregated at query time.

Reference parity: Druid's rollup ingestion stores approximate distinct-count
sketches (HLL / theta) alongside additive metrics so COUNT(DISTINCT dim) at
dashboard time is a sketch union, never a re-scan of raw data
(reference: batch_processing/druid_batch.py ingestion spec's metricsSpec —
the Druid-native analog of this module; SURVEY §2 S8/A4). Spark 3.5+ exposes
the same Apache DataSketches HLL family: ``hll_sketch_agg`` (build),
``hll_union_agg`` (merge), ``hll_sketch_estimate`` (read).

Scale notes (100 TB): this is THE pattern that makes count-distinct viable at
scale — the raw fact is touched once at ingest, each rollup cell stores a
few-KB binary sketch, and any coarser re-aggregation (hour→day→month,
per-appliance→per-house) unions sketches: associative, commutative, and
map-side combinable, so the shuffle carries sketches, not user-id sets.
Exact ``countDistinct`` at the same granularity forces an Expand + full
shuffle of every distinct key — linear in raw cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_rollup(events: DataFrame, key: Column | str, ts_col: str = "ts",
               bucket: str = "hour", lg_k: int = 12,
               dims: tuple[str, ...] = ()) -> DataFrame:
    """Ingest-time rollup: one row per (time bucket, *dims) holding a binary
    HLL sketch of distinct ``key`` values plus the additive row count.

    The sketch column is opaque binary — storable in parquet next to the
    additive metrics exactly like Druid's metricsSpec columns.
    """
    k = F.col(key) if isinstance(key, str) else key
    bucket_col = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    return (
        events.groupBy(bucket_col, *dims)
        .agg(F.hll_sketch_agg(k, F.lit(lg_k)).alias("key_hll"),
             F.count(F.lit(1)).alias("cnt"))
    )


def hll_reaggregate(rollup: DataFrame, bucket: str = "day",
                    dims: tuple[str, ...] = ()) -> DataFrame:
    """Query-time re-aggregation: union the stored sketches up to a coarser
    bucket and read the distinct-count estimate. Never touches raw data."""
    bucket_col = F.date_trunc(bucket, F.col("bucket_ts")).alias("bucket_ts")
    return (
        rollup.groupBy(bucket_col, *dims)
        .agg(F.hll_sketch_estimate(
                F.hll_union_agg(F.col("key_hll"))).alias("approx_distinct"),
             F.sum("cnt").alias("cnt"))
    )
