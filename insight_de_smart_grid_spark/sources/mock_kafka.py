"""Simulated Kafka source: a Python DataSource producing the EXACT schema
and payload bytes the spark-sql-kafka connector would deliver, backed by the
events table instead of a broker.

Purpose: the container has no Kafka broker, so the live S1/S4 path cannot be
integration-tested. This source closes the gap from the schema side — every
downstream stage (binary Avro ``value`` decode, key-by-house ordering,
envelope columns ``topic/partition/offset/timestamp``) runs against a frame
indistinguishable from a real Kafka scan, so the composed reference pipeline
(kafka → from_avro → duty-cycle window → JSON sink;
``stream_processing/duty_cycle_avro.py:63-89``) executes end-to-end minus
only the socket. Swapping in the real connector is a one-line
``format("mockkafka") -> format("kafka")`` change with identical schema.

Fidelity choices mirroring the producer (``ingestion/producer_REDD_avro.py``):
- ``value``: raw Avro datum bytes of schema.avsc (same pure-Python codec the
  roundtrip query proves against the spec).
- ``key``: house_id bytes; messages assigned to partitions by
  ``hash(house_id) % n`` — Kafka's keyed-produce contract (SURVEY ST7), so
  per-house ordering holds within a partition.
- ``offset``: contiguous per-partition, in source row order per partition.
- ``timestamp``: the event time (epoch millis, like the producer sets).

Each Spark input partition maps to one simulated Kafka partition; rows are
read from the events parquet with pyarrow inside the partition (no driver
materialization, no JVM round-trip).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KAFKA_SOURCE_SCHEMA = StructType([
    StructField("key", BinaryType()),
    StructField("value", BinaryType()),
    StructField("topic", StringType()),
    StructField("partition", IntegerType()),
    StructField("offset", LongType()),
    StructField("timestamp", TimestampType()),
    StructField("timestampType", IntegerType()),
])


class MockKafkaPartition(InputPartition):
    def __init__(self, idx: int):
        self.idx = idx


class MockKafkaReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.topic = options.get("topic", "power-raw")
        self.n_partitions = int(options.get("partitions", "4"))

    def partitions(self):
        return [MockKafkaPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):
        import hashlib
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq

        from insight_de_smart_grid_spark.sources.avro_codec import (
            encode_record,
            parse_flat_record_schema,
        )
        from insight_de_smart_grid_spark.sources.files import (
            REFERENCE_AVRO_SCHEMA,
        )

        fields = parse_flat_record_schema(REFERENCE_AVRO_SCHEMA)
        tbl = pq.read_table(self.path,
                            columns=["ts", "user_id", "event_type", "value"])
        ts_t = tbl.schema.field("ts").type
        raw = tbl.column("ts").cast(pa.int64()).to_pylist()
        unit = ts_t.unit if pa.types.is_timestamp(ts_t) else "ns"
        # fold to micros with integer division (matches
        # tables.normalize_event_ts's `ts DIV 1000` for nanos), then to ms
        # via the double recipe every oracle uses (floor(epoch * 1000)) so
        # both engines round identically
        to_us = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[unit]
        uid = tbl.column("user_id").to_pylist()
        etype = tbl.column("event_type").to_pylist()
        val = tbl.column("value").to_pylist()

        offset = 0
        for i in range(len(uid)):
            house = str(uid[i])
            # deterministic keyed produce (Python's builtin hash() is
            # per-process randomized — never use it for partitioning)
            h = int(hashlib.md5(house.encode()).hexdigest()[:8], 16)
            if h % self.n_partitions != partition.idx:
                continue
            us = raw[i] // 1000 if to_us is None else raw[i] * to_us
            ms = math.floor(us / 1e6 * 1000)
            record = {
                "house_id": house,
                "appliance_name": etype[i],
                "appliance_id": f"{house}_{etype[i]}",
                "timestamp": ms,
                "power": float(val[i]),
            }
            yield (house.encode(), encode_record(record, fields),
                   self.topic, partition.idx, offset,
                   datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc),
                   0)
            offset += 1


class MockKafkaWriter(DataSourceWriter):
    """Batch-produce capture: accepts the exact frame shape the real
    connector's batch sink takes (``key`` string/binary optional, ``value``
    string/binary required — the `kafka_payload` contract) and lands each
    Spark partition as one parquet file of (key, value, topic, partition)
    envelope rows under ``capture_dir``. This is the S5 counterpart of the
    read-side mock: swap ``format("mockkafka")`` for ``format("kafka")``
    and the same writer call hits a broker (druid_batch.py:110-116's
    producer loop, distributed). Commit is rename-free (files are written
    once, task retries overwrite by task id), matching Kafka's
    at-least-once batch produce semantics."""

    def __init__(self, options, schema):
        if "value" not in schema.fieldNames():
            raise ValueError(
                "kafka batch produce requires a 'value' column "
                f"(got {schema.fieldNames()})")
        self.capture_dir = options["capture_dir"]
        self.topic = options.get("topic", "power-raw")
        self.has_key = "key" in schema.fieldNames()

    def write(self, iterator):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        keys, vals = [], []
        for row in iterator:
            k = row["key"] if self.has_key else None
            v = row["value"]
            keys.append(k.encode() if isinstance(k, str) else k)
            vals.append(v.encode() if isinstance(v, str) else v)
        os.makedirs(self.capture_dir, exist_ok=True)
        tbl = pa.table({
            "key": pa.array(keys, pa.binary()),
            "value": pa.array(vals, pa.binary()),
            "topic": pa.array([self.topic] * len(vals), pa.string()),
            "partition": pa.array([pid] * len(vals), pa.int32()),
        })
        pq.write_table(tbl, os.path.join(self.capture_dir,
                                         f"produce-{pid:05d}.parquet"))
        return WriterCommitMessage()


class MockKafkaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mockkafka"

    def schema(self):
        return KAFKA_SOURCE_SCHEMA

    def reader(self, schema):
        return MockKafkaReader(self.options)

    def writer(self, schema, overwrite):
        return MockKafkaWriter(self.options, schema)

    def simpleStreamReader(self, schema):
        return MockKafkaStreamReader(self.options)


def register_mock_kafka(spark) -> None:
    spark.dataSource.register(MockKafkaDataSource)


# session-lifetime cache of encoded backlogs, keyed by (path, topic,
# partitions, fixture content hash) — see MockKafkaStreamReader._rows
_ENCODED_BACKLOGS: dict[tuple, list] = {}


def _private_cache_dir() -> "str | None":
    """Per-user 0700 cache dir for the encoded backlog, or None (caller
    skips disk caching) when a safe one can't be guaranteed: the dir must
    be OWNED by this uid with no group/other access, else another local
    user could pre-plant or read cache entries."""
    import stat
    import tempfile

    uid = os.getuid() if hasattr(os, "getuid") else None
    if uid is None:
        return None
    d = os.path.join(tempfile.gettempdir(), f"mockkafka-{uid}")
    try:
        os.makedirs(d, mode=0o700, exist_ok=True)
        st = os.stat(d)
        if (st.st_uid != uid or not stat.S_ISDIR(st.st_mode)
                or (st.st_mode & 0o077)):
            return None
        return d
    except OSError:
        return None


def _write_backlog_parquet(rows: list, path: str) -> None:
    """Persist the encoded backlog as plain-data parquet (bytes/str/int
    columns only — unlike pickle, loading it can't execute anything)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "key": pa.array([r[0] for r in rows], pa.binary()),
        "value": pa.array([r[1] for r in rows], pa.binary()),
        "topic": pa.array([r[2] for r in rows], pa.string()),
        "partition": pa.array([r[3] for r in rows], pa.int32()),
        "offset": pa.array([r[4] for r in rows], pa.int64()),
        # whole-ms epoch: reconstructed with the same fromtimestamp(ms /
        # 1000.0) expression the batch reader uses, so the tuples are
        # value-identical either way
        "ts_ms": pa.array([round(r[5].timestamp() * 1000) for r in rows],
                          pa.int64()),
        "ts_type": pa.array([r[6] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, path)


def _read_backlog_parquet(path: str) -> list:
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    cols = [t.column(c).to_pylist() for c in
            ("key", "value", "topic", "partition", "offset", "ts_ms",
             "ts_type")]
    return [(k, v, tp, p, o,
             datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc), tt)
            for k, v, tp, p, o, ms, tt in zip(*cols)]


class MockKafkaStreamReader(SimpleDataSourceStreamReader):
    """Streaming form (SimpleDataSourceStreamReader): Kafka-style positional
    offsets, checkpoint-restartable. By default one micro-batch delivers the
    whole backlog (the events fixture is not time-ordered; chunked delivery
    would race the watermark exactly like a real unordered topic) followed,
    when ``flush_sentinel=true``, by one far-future sentinel message that
    advances the watermark so every real window finalizes — the same
    replay convention as ``streaming/replay.py``. The sentinel carries
    house_id "-1"; consumers filter it from RESULTS (never before the
    watermark, or the flush never happens).

    Runs on the driver by API contract (simulation feed, like the REDD
    stream reader); the batch reader is the parallel path.
    """

    def __init__(self, options):
        self.options = options
        self._cache: list | None = None

    def _rows(self) -> list:
        if self._cache is None:
            # The encoded backlog is deterministic in (fixture content,
            # topic, partition count); cache it across stream starts so
            # each invocation pays the pure-Python avro encode once per
            # fixture — a real broker already holds the produced
            # messages, so re-encoding per query start measured harness,
            # not engine (latestOffset 1.77 s -> ~0.15 s on the sf0.1
            # fixture). Spark 4 runs this reader in a fresh Python worker
            # process per query, so the cache must live on DISK (an
            # in-process dict never survives to the next invocation).
            #
            # Trust boundary: the cache dir is USER-PRIVATE (0700, owner-
            # checked — a world-writable shared path would let another
            # local user pre-plant the cache), the on-disk format is
            # parquet (pure data — never unpickle from a shared tmpfs),
            # and the key is a CONTENT hash of the fixture bytes (an
            # in-place rewrite with preserved mtime still misses).
            key = self._cache_key()
            if key not in _ENCODED_BACKLOGS:
                cache_dir = _private_cache_dir()
                cache = (os.path.join(cache_dir, f"backlog_{key}.parquet")
                         if cache_dir else None)
                if cache and os.path.exists(cache):
                    _ENCODED_BACKLOGS[key] = _read_backlog_parquet(cache)
                else:
                    batch = MockKafkaReader(self.options)
                    rows = []
                    for p in batch.partitions():
                        rows.extend(batch.read(p))
                    _ENCODED_BACKLOGS[key] = rows
                    if cache:
                        tmp = cache + f".tmp{os.getpid()}"
                        _write_backlog_parquet(rows, tmp)
                        os.replace(tmp, cache)  # atomic vs concurrent
            self._cache = _ENCODED_BACKLOGS[key]
        return self._cache

    def _cache_key(self) -> str:
        import hashlib

        path = self.options["path"]
        h = hashlib.md5()
        if os.path.isfile(path):
            with open(path, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
        elif os.path.isdir(path):
            # Directory-shaped parquet datasets (Spark-written) get a
            # freshness component too (round-7 advisory): fold every
            # entry's (relpath, size, mtime_ns) so a rewritten fixture at
            # the same path misses the stale cache. Content-hashing the
            # files would be exact but costs a full re-read per session;
            # size+mtime_ns is the same contract filesystems/rsync use.
            # determinism comes from sorting the fully-exhausted walk list
            # (mutating `dirs` after sorted() has drained the generator
            # cannot reorder anything — round-8 advisory removed it); the
            # NUL terminator makes the fold injective even for pathological
            # filenames containing '|'
            for root, dirs, files in sorted(os.walk(path)):
                for name in sorted(files):
                    fp = os.path.join(root, name)
                    try:
                        st = os.stat(fp)
                        h.update(f"{os.path.relpath(fp, path)}|{st.st_size}"
                                 f"|{st.st_mtime_ns}".encode() + b"\x00")
                    except OSError:
                        continue
        key_src = "|".join((
            path, self.options.get("topic", "power-raw"),
            self.options.get("partitions", "4"), h.hexdigest(),
        ))
        return hashlib.md5(key_src.encode()).hexdigest()

    def _sentinel_row(self):
        from insight_de_smart_grid_spark.sources.avro_codec import (
            encode_record,
            parse_flat_record_schema,
        )
        from insight_de_smart_grid_spark.sources.files import (
            REFERENCE_AVRO_SCHEMA,
        )

        rows = self._rows()
        max_ms = max((int(r[5].timestamp() * 1000) for r in rows),
                     default=0)
        ms = max_ms + 86_400_000  # one day beyond the last real event
        fields = parse_flat_record_schema(REFERENCE_AVRO_SCHEMA)
        record = {"house_id": "-1", "appliance_name": "__flush",
                  "appliance_id": "-1___flush", "timestamp": ms,
                  "power": 0.0}
        return (b"-1", encode_record(record, fields),
                self.options.get("topic", "power-raw"), 0, -1,
                datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc), 0)

    def initialOffset(self):
        return {"pos": 0, "sentinel": False}

    def read(self, start):
        rows = self._rows()
        i = int(start["pos"])
        if i < len(rows):
            # data batches return LISTS: the prefetch cache copy.copy()s
            # the value for checkpoint replay (generator state can't copy)
            return rows[i:], {"pos": len(rows), "sentinel": False}
        want_sentinel = (self.options.get("flush_sentinel", "false").lower()
                         == "true")
        if want_sentinel and not start.get("sentinel"):
            return [self._sentinel_row()], {"pos": i, "sentinel": True}
        # the idle branch must be an ITERATOR: with no offset advance the
        # wrapper probes emptiness via next(), which a list doesn't support
        return iter(()), start

    def readBetweenOffsets(self, start, end):
        rows = self._rows()[int(start["pos"]):int(end["pos"])]
        if end.get("sentinel") and not start.get("sentinel"):
            rows = rows + [self._sentinel_row()]
        return rows
