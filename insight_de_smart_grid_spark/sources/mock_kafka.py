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

from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
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


class MockKafkaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mockkafka"

    def schema(self):
        return KAFKA_SOURCE_SCHEMA

    def reader(self, schema):
        return MockKafkaReader(self.options)


def register_mock_kafka(spark) -> None:
    spark.dataSource.register(MockKafkaDataSource)
