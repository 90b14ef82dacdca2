"""Validate Kafka connector option spelling against the documented surface.

The sandbox has no broker, so the one failure mode a mock can't catch is a
typo'd option key silently ignored by the real connector (Spark does not
error on unknown kafka options).  This test pins every key our builders emit
to the option names documented for the spark-sql-kafka-0-10 connector
(https://spark.apache.org/docs/latest/structured-streaming-kafka-integration.html)
plus the DataStreamWriter's own ``checkpointLocation``.

Pure-dict test: no SparkSession, no jar, no broker.
"""

from __future__ import annotations

import pytest

from insight_de_smart_grid_spark.sources.files import (
    kafka_sink_options,
    kafka_source_options,
)

# Documented source options (structured-streaming-kafka-integration docs,
# Spark 3.x/4.x).  Keys are case-sensitive in the connector's option parser
# for the camelCase set; kafka.* passthroughs must match librdkafka/Java
# client config names.
DOCUMENTED_SOURCE_OPTIONS = {
    "assign",
    "subscribe",
    "subscribePattern",
    "kafka.bootstrap.servers",
    "startingTimestamp",
    "startingOffsetsByTimestamp",
    "startingOffsets",
    "endingTimestamp",
    "endingOffsetsByTimestamp",
    "endingOffsets",
    "failOnDataLoss",
    "kafkaConsumer.pollTimeoutMs",
    "fetchOffset.numRetries",
    "fetchOffset.retryIntervalMs",
    "maxOffsetsPerTrigger",
    "minOffsetsPerTrigger",
    "maxTriggerDelay",
    "minPartitions",
    "groupIdPrefix",
    "kafka.group.id",
    "includeHeaders",
    "startingOffsetsByTimestampStrategy",
}

DOCUMENTED_SINK_OPTIONS = {
    "kafka.bootstrap.servers",
    "topic",
    "includeHeaders",
    # DataStreamWriter option, not a kafka.* one, but set via .options():
    "checkpointLocation",
}


def test_source_option_keys_are_documented():
    opts = kafka_source_options(
        "broker:9092", "readings",
        starting_offsets="earliest",
        fail_on_data_loss=True,
        max_offsets_per_trigger=50_000,
    )
    unknown = set(opts) - DOCUMENTED_SOURCE_OPTIONS
    assert not unknown, f"undocumented source option keys: {unknown}"


def test_source_option_values_are_strings():
    opts = kafka_source_options(
        "broker:9092", "readings",
        starting_offsets="earliest",
        fail_on_data_loss=False,
        max_offsets_per_trigger=1,
    )
    assert all(isinstance(v, str) for v in opts.values()), opts
    # the connector parses these as lowercase literals
    assert opts["failOnDataLoss"] in {"true", "false"}
    assert opts["startingOffsets"] in {"earliest", "latest"} or \
        opts["startingOffsets"].startswith("{")


def test_sink_option_keys_are_documented():
    opts = kafka_sink_options("broker:9092", "out", "/tmp/ckpt")
    unknown = set(opts) - DOCUMENTED_SINK_OPTIONS
    assert not unknown, f"undocumented sink option keys: {unknown}"


@pytest.mark.parametrize("bad_key", ["failondataloss", "Subscribe",
                                     "starting_offsets", "maxOffsetsPerTriger"])
def test_allowlist_rejects_typos(bad_key):
    """The allowlist itself must be able to catch the typo class."""
    assert bad_key not in DOCUMENTED_SOURCE_OPTIONS


def test_streaming_sink_requires_checkpoint_dir(spark):
    """S4's exactly-once ledger is not forgettable (round-6 advisory):
    building a STREAMING kafka sink without checkpoint_dir raises at
    construction, not at .start() — and never silently inherits a
    session-wide checkpointLocation. The batch produce path (S5) keeps
    accepting None."""
    from insight_de_smart_grid_spark.sources.files import kafka_sink
    from insight_de_smart_grid_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    df = (load_table(spark, SF_SMOKE, "events")
          .selectExpr("cast(user_id as string) as house_id", "value"))
    with pytest.raises(ValueError, match="checkpoint_dir"):
        kafka_sink(df, "broker:9092", "out", streaming=True)
    # batch form builds without one (the writer is just composed here)
    kafka_sink(df, "broker:9092", "out", streaming=False)


def test_default_driver_mem_caps_to_available():
    """get_spark's driver-heap default (round-6 advisory): 16g on a big
    host, capped at ~70% of MemAvailable on a small one, floored at 1g.
    The cap rule is asserted exactly via the injected sample (round-7
    advisory: re-reading /proc/meminfo after the fact flaked when
    available memory moved between the two reads); the live read only
    gets the structural bounds."""
    from insight_de_smart_grid_spark.session import default_driver_mem

    # exact rule on injected samples — deterministic, no meminfo race
    assert default_driver_mem(avail_mb=256 * 1024) == f"{16 * 1024}m"
    assert default_driver_mem(avail_mb=8 * 1024) == f"{8 * 1024 * 7 // 10}m"
    assert default_driver_mem(avail_mb=100) == "1024m"  # floor
    # live path: only the loose structural invariants
    got = default_driver_mem()
    assert got.endswith("m")
    assert 1024 <= int(got[:-1]) <= 16 * 1024
