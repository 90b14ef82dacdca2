"""LIVE-broker integration for the Kafka connector paths — env-gated.

The mock source/sink (``sources/mock_kafka.py``) proves every frame shape
and option spelling without a socket; this module closes the last gap by
running the SAME frames through the real ``format("kafka")`` connector
when a broker is reachable. In the default sandbox (no broker) every test
skips cleanly.

Opt-in, from a machine with a broker::

    # 1. broker one-liner (auto-creates topics):
    docker run -d --name=redpanda -p 9092:9092 redpandadata/redpanda \
        redpanda start --overprovisioned --smp 1 --memory 512M
    # 2. connector jars must be on the session classpath BEFORE the
    #    session starts (version must match the installed pyspark):
    export PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:$(python -c 'import pyspark; print(pyspark.__version__)') pyspark-shell"
    # 3. run just this module:
    SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092 \
        python -m pytest tests/test_kafka_live.py -v

Reference behavior matched: the producer's keyed produce/flush loop
(``ingestion/producer_REDD_avro.py:173,184``) and the consumer's read +
checkpointed write (``stream_processing/duty_cycle_avro.py:63-89``).
"""
from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.sources import files as fs
from insight_de_smart_grid_spark.sources.mock_kafka import (
    register_mock_kafka,
)
from tests.conftest import SF_SMOKE

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="live-broker test: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092 "
           "(see module docstring for the redpanda + --packages one-liner)")


def _mock_frames(spark):
    """The exact producer envelope the mock emits for the smoke fixture:
    (key = house_id bytes, value = Avro datum bytes) — byte-identical to
    what ``producer_REDD_avro.py`` would put on the wire."""
    register_mock_kafka(spark)
    return (spark.read.format("mockkafka")
            .option("path", f"{SF_SMOKE}/events.parquet")
            .option("topic", "unused").option("partitions", "4")
            .load().select("key", "value"))


def test_live_batch_produce_then_read_roundtrip(spark):
    """S5 (batch produce) -> S1 (batch read): the Avro frames written
    through the real connector come back byte-identical."""
    topic = f"graft-it-{uuid.uuid4().hex[:8]}"
    frames = _mock_frames(spark).localCheckpoint()
    n = frames.count()
    assert n > 0

    (frames.write.format("kafka")
     .options(**fs.kafka_sink_options(BOOTSTRAP, topic)).save())

    back = (spark.read.format("kafka")
            .options(**fs.kafka_source_options(
                BOOTSTRAP, topic, starting_offsets="earliest"))
            .load())
    got = sorted((bytes(r.key), bytes(r.value))
                 for r in back.select("key", "value").collect())
    want = sorted((bytes(r.key), bytes(r.value))
                  for r in frames.collect())
    assert got == want


def test_live_streaming_pipeline_s1_s4(spark, tmp_path):
    """The composed reference deployment (duty_cycle_avro.py:63-89) against
    a real broker: keyed Avro produce -> streaming Kafka source ->
    from_avro decode -> watermarked sliding duty cycle -> JSON-serialized
    checkpointed Kafka sink -> batch read-back of the output topic. A
    far-future flush sentinel (the ``streaming/replay.py`` convention)
    closes every real window before availableNow drains."""
    from insight_de_smart_grid_spark.sources.avro_codec import (
        encode_record,
        parse_flat_record_schema,
    )

    in_topic = f"graft-in-{uuid.uuid4().hex[:8]}"
    out_topic = f"graft-out-{uuid.uuid4().hex[:8]}"

    frames = _mock_frames(spark).localCheckpoint()
    (frames.write.format("kafka")
     .options(**fs.kafka_sink_options(BOOTSTRAP, in_topic)).save())
    # flush sentinel: one message a day past the fixture horizon
    fields = parse_flat_record_schema(fs.REFERENCE_AVRO_SCHEMA)
    sentinel = encode_record(
        {"house_id": "-1", "appliance_name": "__flush",
         "appliance_id": "-1___flush",
         "timestamp": 4_102_444_800_000, "power": 0.0}, fields)
    (spark.createDataFrame([(b"-1", sentinel)], "key binary, value binary")
     .write.format("kafka")
     .options(**fs.kafka_sink_options(BOOTSTRAP, in_topic)).save())

    writer = fs.duty_cycle_kafka_pipeline(
        spark, BOOTSTRAP, in_topic, out_topic,
        checkpoint_dir=str(tmp_path / "ckpt"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(180)

    out = (spark.read.format("kafka")
           .options(**fs.kafka_source_options(
               BOOTSTRAP, out_topic, starting_offsets="earliest"))
           .load()
           .select(F.get_json_object(F.col("value").cast("string"),
                                     "$.house_id").alias("house_id")))
    rows = out.collect()
    assert len(rows) > 0
    assert any(r.house_id not in (None, "-1") for r in rows)
