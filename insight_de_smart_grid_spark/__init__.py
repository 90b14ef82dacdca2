"""insight_de_smart_grid_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference smart-grid lambda pipeline (Kafka -> Spark Streaming -> Druid ->
dashboard), re-expressed Spark-first: one storage layer (partitioned Parquet),
one operator library (pure DataFrame -> DataFrame functions), two execution
modes (batch for oracle parity, Structured Streaming for stream parity).

Modules
-------
- ``session``    SparkSession factory tuned for both local test and cluster.
- ``sources``    scans/sources/sinks (SURVEY §2.1 S1-S10).
- ``functions``  scalar expression helpers (SURVEY §2.2, §2.8).
- ``operators``  relational + domain operators (SURVEY §2.2-§2.6, §7).
- ``streaming``  Structured Streaming parity layer (SURVEY §2.7).
- ``plans``      the named-query registry exposed through __spark_entry__.
"""

__version__ = "0.1.0"
