"""Pluggable Spark data source for the reference's REDD channel-file layout
(Spark 4 Python DataSource API).

The reference ingests REDD by looping files in a producer process
(``ingestion/producer_REDD_avro.py:66-98,161-184``). Here the same format is
a first-class source: ``spark.read.format("redd").load(dir)`` scans every
``house_*/channel_*.dat`` in parallel (one input partition per file — file-
level parallelism is the natural unit; a 1000-executor cluster reads 1000
files at once), and ``spark.readStream.format("redd")`` replays the same
files incrementally with checkpointable offsets (pending files drain per
micro-batch — the event-time replay source, SURVEY ST6, as a real source
instead of a harness helper).

Dirty-data policy matches the producer exactly (non-numeric power -> 0.0,
``producer_REDD_avro.py`` / ``producer_GREEND_avro.py:138-146``).

Python-source rows cross the Python<->JVM boundary through Arrow batches;
for the hot path the built-in CSV reader (``files.read_redd_channels``)
stays available — this source exists for API parity (a user can plug any
bespoke format the same way) and for the offset-tracked streaming replay.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

REDD_SOURCE_SCHEMA = StructType([
    StructField("ts", TimestampType()),
    StructField("power", DoubleType()),
    StructField("house_id", StringType()),
    StructField("channel_idx", IntegerType()),
])


def _list_channel_files(root: str) -> list[str]:
    return sorted(str(p) for p in Path(root).glob("house_*/channel_*.dat"))


def _parse_file(path: str):
    """Yield (ts, power, house_id, channel_idx) rows from one channel file.
    Runs on an executor; never loads the whole file into memory."""
    import re
    from datetime import datetime, timezone

    m_house = re.search(r"house_(\d+)", path)
    m_chan = re.search(r"channel_(\d+)", path)
    house = m_house.group(1) if m_house else "unknown"
    chan = int(m_chan.group(1)) if m_chan else -1
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) < 2:
                continue
            try:
                ts_s = float(parts[0])
            except ValueError:
                continue  # embedded header / corrupt line
            try:
                power = float(parts[1])
            except ValueError:
                power = 0.0  # producer's non-numeric policy
            ts = datetime.fromtimestamp(ts_s, tz=timezone.utc) \
                .replace(tzinfo=None)
            yield ts, power, house, chan


class _ReddFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ReddBatchReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("redd source requires a path")

    def partitions(self):
        return [_ReddFilePartition(p) for p in _list_channel_files(self.root)]

    def read(self, partition):
        yield from _parse_file(partition.path)


class ReddStreamReader(SimpleDataSourceStreamReader):
    """Incremental replay: offset = number of channel files fully consumed
    (files are a stable sorted list; each ``read`` drains every file not yet
    committed, so late-arriving files are picked up next trigger). The
    offset is a plain dict, so checkpoints restart exactly where they
    stopped."""

    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("redd source requires a path")

    def initialOffset(self):
        return {"files_done": 0}

    def read(self, start):
        # materialized list, not a generator: the prefetch cache copies the
        # returned iterator (copy.copy) for checkpoint replay
        files = _list_channel_files(self.root)
        i = start["files_done"]
        if i >= len(files):
            return [], start
        rows = [r for p in files[i:] for r in _parse_file(p)]
        return rows, {"files_done": len(files)}

    def readBetweenOffsets(self, start, end):
        files = _list_channel_files(self.root)
        for p in files[start["files_done"]:end["files_done"]]:
            yield from _parse_file(p)


class ReddDataSource(DataSource):
    @classmethod
    def name(cls):
        return "redd"

    def schema(self):
        return REDD_SOURCE_SCHEMA

    def reader(self, schema):
        return ReddBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return ReddStreamReader(self.options)
