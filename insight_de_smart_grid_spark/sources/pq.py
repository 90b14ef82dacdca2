"""Cached-schema parquet reads (optimization round 11, guide §1/§6).

Measured on this host: ``spark.read.parquet(path)`` spends ~80-105 ms per
call on driver-side schema inference (footer sniff + partition
discovery), while ``spark.read.schema(s).parquet(path)`` takes ~14 ms —
and the bench pays that inference on EVERY plan build of EVERY query
(one per table per run: 263 queries x 4 runs x 1-3 tables). The paths
involved are immutable once visible (the test-data tables are fixtures;
index segments are immutable after their manifest commit — the commit
protocol's whole point), so the schema is a pure function of
``(path, mtime)`` and caching it is metadata reuse, not result caching:
every query still scans the parquet data itself.

This is also the right 100 TB shape: a production table's schema comes
from catalog/manifest metadata (Hive metastore, Iceberg/Delta manifests),
never from re-sniffing file footers per query — the cache stands in for
that catalog locally.

The cache key includes the ``nanosAsLong`` session conf because it
changes what type a TIMESTAMP(NANOS) column surfaces as.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SCHEMA_CACHE: "dict[tuple, StructType]" = {}


def _key(spark: SparkSession, path: str) -> "tuple | None":
    try:
        st = os.stat(path)
    except OSError:
        return None
    nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    return (os.path.abspath(path), st.st_mtime_ns, nanos)


def parquet_schema(spark: SparkSession, path: str) -> StructType:
    """The path's parquet schema, inferred once per (path, mtime) and
    cached for the process lifetime. A rewritten path (new mtime) misses
    and re-infers; committed index segments and test fixtures are
    immutable so they hit."""
    key = _key(spark, path)
    if key is None:
        return spark.read.parquet(path).schema
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    return schema


def read_parquet(spark: SparkSession, path: str,
                 schema: "StructType | None" = None) -> DataFrame:
    """``spark.read.parquet`` with the footer sniff skipped via the
    schema cache, and the analyzed base relation itself reused per
    session. Plan-identical to the plain read (same relation, same
    pushdown/pruning); DataFrames are immutable lazy plans, so handing
    the same base relation to many queries shares no computed results —
    every action still scans the parquet data. The relation cache lives
    ON the session object (dies with it) and keys on (path, mtime), so
    a rewritten path gets a fresh relation.

    ``schema`` (round-12): schema-by-example for callers that KNOW the
    path's schema from a sibling (an index table's segments share one
    frozen schema by construction) — skips the footer sniff entirely for
    paths the schema cache has never seen. The caller owns the claim's
    correctness; the scan itself still validates columns against the
    files."""
    key = _key(spark, path)
    if key is None:
        return spark.read.schema(
            schema or parquet_schema(spark, path)).parquet(path)
    try:
        cache = spark._pq_df_cache
    except AttributeError:
        cache = spark._pq_df_cache = {}
    df = cache.get(key)
    if df is None:
        df = spark.read.schema(
            schema or parquet_schema(spark, path)).parquet(path)
        cache[key] = df
    return df
