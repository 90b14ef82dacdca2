"""JSONL corpus interchange: the de-facto exchange format for LLM training
corpora (one JSON document per line, optionally gzip'd per file).

The reference ingests metering files (sources/files.py); a training-data
user of this engine ingests and exports document corpora. Same design
rules as the metering scans: explicit schema (never inferSchema — schema
inference reads the data twice and locks in whatever the first sample
implied), PERMISSIVE parse with quarantined corrupt rows rather than a
job abort, and scale-aware file sizing on the way out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def read_jsonl_corpus(spark: SparkSession, path: str,
                      schema: T.StructType = CORPUS_SCHEMA,
                      ) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus -> (clean, quarantine).

    Clean rows satisfy the schema; malformed lines and rows missing the
    required id/text land in the quarantine frame with their raw line
    preserved (``_corrupt_record``) for triage — a crawl export always has
    a tail of truncated/mis-encoded lines, and dropping them silently is
    how corpora drift. Both frames come off ONE scan (PERMISSIVE mode);
    gzip/zstd files decode transparently by extension."""
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType())])
    raw = (spark.read.schema(full)
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", "_corrupt_record")
           .json(path)
           .cache())  # one scan serves both outputs
    bad = (F.col("_corrupt_record").isNotNull()
           | F.col("doc_id").isNull() | F.col("text").isNull())
    clean = raw.where(~bad).drop("_corrupt_record")
    quarantine = raw.where(bad)
    return clean, quarantine


def write_jsonl_corpus(docs: DataFrame, path: str,
                       compression: str = "gzip",
                       target_rows_per_file: int | None = None) -> None:
    """Write a corpus as (optionally compressed) JSONL. With
    ``target_rows_per_file`` the writer uses ``maxRecordsPerFile`` — a
    per-task cap that needs NO repartition (no shuffle) — to bound file
    sizes for downstream loaders that stream one file per worker."""
    w = docs.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if target_rows_per_file:
        w = w.option("maxRecordsPerFile", target_rows_per_file)
    w.json(path)
