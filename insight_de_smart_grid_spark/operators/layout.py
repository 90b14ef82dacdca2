"""Storage-layout management: size-targeted compaction and pruning-friendly
sorted writes.

At 100 TB the dominant cost of every query in this engine is the parquet
scan, and the scan cost is set by layout decisions made at write time:

- **File sizing.** Streaming micro-batches and fine-grained partitions leave
  thousands of KB-scale files; each costs a task + a footer read. Compaction
  rewrites a dataset into ~target-sized files (Druid analog: compaction
  tasks on historical segments; reference stores segments per
  `segmentGranularity` in its ingestion specs).
- **Sort-within-partition.** Parquet row-group min/max stats only prune when
  values are clustered. Writing each partition sorted by the hot filter keys
  turns point/range predicates into row-group skips — the single cheapest
  "index" a data lake has.
- **Range-partitioned write.** `repartitionByRange` assigns contiguous key
  ranges to files so a range predicate touches few *files*, composing with
  the row-group pruning inside each.

All three are expressed through the DataFrame writer — no custom file
management, fully parallel, and safe under speculative execution because
parquet task outputs commit atomically.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact(df: DataFrame, target_rows_per_file: int,
            sort_cols: tuple[str, ...] = ()) -> DataFrame:
    """Return ``df`` re-arranged to land in ``ceil(n / target)`` files when
    written, optionally clustered by ``sort_cols`` for stats pruning.

    Uses a count to size the job — one cheap extra pass (count-star over
    parquet reads only footers/metadata) traded for deterministic output
    sizing. With sort columns the repartition is range-based, so file k holds
    a contiguous slice of the key space; without, round-robin for even sizes.
    """
    n = df.count()
    files = max(1, math.ceil(n / target_rows_per_file))
    if sort_cols:
        out = df.repartitionByRange(files, *[F.col(c) for c in sort_cols])
        return out.sortWithinPartitions(*sort_cols)
    return df.repartition(files)


def write_compacted(df: DataFrame, path: str, target_rows_per_file: int,
                    sort_cols: tuple[str, ...] = (),
                    partition_cols: tuple[str, ...] = (),
                    mode: str = "overwrite") -> None:
    """Compact + write in one step. ``partition_cols`` become hive-style
    directory partitions (pruned by Catalyst before any file is opened);
    ``sort_cols`` cluster rows inside each file for row-group pruning.

    ``maxRecordsPerFile`` caps stragglers so one skewed range partition
    cannot produce an oversized file.
    """
    out = df
    if partition_cols:
        # one directory partition per task partition, sorted inside
        cols = [F.col(c) for c in partition_cols + sort_cols]
        out = out.repartition(*[F.col(c) for c in partition_cols])
        out = out.sortWithinPartitions(*cols)
    elif sort_cols or target_rows_per_file:
        out = compact(out, target_rows_per_file, sort_cols)
    writer = (
        out.write.mode(mode)
        .option("maxRecordsPerFile", target_rows_per_file)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
