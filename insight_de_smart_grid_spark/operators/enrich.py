"""Dimension-enrichment lookup join (SURVEY §2.3 J1).

The reference's only join: attach ``appliance_name`` to readings from a tiny
labels dim (``producer_REDD_avro.py:92-97,171``; ``producer_GREEND_avro.py:
64-67,196-200``), with 'unknown' for misses. Spark-first this is a broadcast
hash left join — the dim ships to every executor, no shuffle of the fact side,
which is the only join shape that survives a 100 TB fact table with a KB-size
dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators.cleanse import default_label


def enrich_with_labels(facts: DataFrame, labels: DataFrame,
                       on: list[str], label_col: str = "label",
                       default: str = "unknown") -> DataFrame:
    """Broadcast left join + unknown-default (J1 + P12)."""
    joined = facts.join(F.broadcast(labels), on=on, how="left")
    return joined.withColumn(label_col, default_label(label_col, default))
