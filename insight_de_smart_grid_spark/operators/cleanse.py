"""Ingest-time data cleansing (SURVEY P10-P12, §2.8 JSON extraction).

The reference cleans at the producer: non-numeric strings coerce to 0.0
(``producer_GREEND_avro.py:138-146``), embedded repeated CSV headers are
skipped (``:207-208``), missing labels default to 'unknown' (``:199``), and
keys are synthesized by string concat (``producer_REDD_avro.py:170-171``).
Here each rule is a declarative Column expression — JVM-side, codegen'd, no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def try_double(col: Column | str, default: float = 0.0) -> Column:
    """P11: tolerant numeric parse — non-numeric -> ``default`` (matches
    ``is_number`` fallback, producer_GREEND_avro.py:138-146)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("double"), F.lit(default))


def default_label(col: Column | str, default: str = "unknown") -> Column:
    """P12: missing dimension value -> 'unknown' (producer_GREEND_avro.py:199)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def synth_key(*cols: Column | str, sep: str = "_") -> Column:
    """P10: composite key synthesis (producer_REDD_avro.py:170-171)."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c
                              for c in cols])


def skip_embedded_headers(df: DataFrame, col: str, header_value: str) -> DataFrame:
    """Drop rows that are repeated CSV headers inside the data
    (producer_GREEND_avro.py:207-208)."""
    return df.filter(F.col(col) != F.lit(header_value))


def extract_json_double(df: DataFrame, json_col: str, path: str,
                        out: str, default: float = 0.0) -> DataFrame:
    """§2.8 extension: JSON-path extraction + tolerant cast over the
    ``events.props`` column."""
    return df.withColumn(
        out, F.coalesce(F.get_json_object(F.col(json_col), path)
                        .try_cast("double"), F.lit(default)))


def winsorize(df: DataFrame, value_col: str, group_cols: list[str],
              lo: float = 0.01, hi: float = 0.99,
              out: str | None = None) -> DataFrame:
    """Per-group percentile capping (winsorization) — the robust-stats
    cleaning step before a value column feeds model features: values below
    the group's ``lo`` quantile clamp up to it, above ``hi`` clamp down.

    The caps table is one row per group (exact linear-interpolation
    percentiles, the cross-engine-proven aggregate) and BROADCASTS back —
    the fact table shuffles once for the caps aggregation and never again;
    at cluster scale the caps join is a map-side hash probe."""
    out = out or f"{value_col}_w"
    caps = (df.groupBy(*group_cols)
            .agg(F.percentile(value_col,
                              F.array(F.lit(lo), F.lit(hi))).alias("q"))
            .select(*group_cols, F.col("q")[0].alias("__lo"),
                    F.col("q")[1].alias("__hi")))
    return (df.join(F.broadcast(caps), group_cols)
            .withColumn(out, F.least(F.greatest(F.col(value_col),
                                                F.col("__lo")),
                                     F.col("__hi")))
            .drop("__lo", "__hi"))
