"""Tests for the file-source surface (S6/S7) with reference-shaped fixtures
written on the fly (dirty rows, embedded headers, positional labels)."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

from insight_de_smart_grid_spark.sources import files as fs


def test_read_redd_channels_recovers_house_and_channel(spark):
    root = Path(tempfile.mkdtemp(prefix="redd_"))
    try:
        d = root / "house_3"
        d.mkdir()
        (d / "channel_1.dat").write_text("1303132929 222.3\n1303132932 221.9\n")
        (d / "channel_2.dat").write_text("1303132929 4.0\nnotanumber bad\n")
        out = fs.read_redd_channels(spark, str(root / "*" / "*.dat"))
        rows = {(r.house_id, r.channel_idx, r.power) for r in out.collect()}
        assert ("3", 1, 222.3) in rows and ("3", 1, 221.9) in rows
        assert ("3", 2, 4.0) in rows
        # dirty row coerced to 0.0 with epoch 0 ts (producer parity)
        assert ("3", 2, 0.0) in rows
        assert out.count() == 4
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_read_greend_skips_embedded_headers_and_coerces(spark):
    root = Path(tempfile.mkdtemp(prefix="greend_"))
    try:
        d = root / "building0"
        d.mkdir()
        (d / "dataset_2014.csv").write_text(
            "timestamp,c0,c1,c2,c3,c4,c5,c6,c7,c8\n"
            "1388530800,1.5,2.5,,bad,5.0,6,7,8,9\n"
            "timestamp,c0,c1,c2,c3,c4,c5,c6,c7,c8\n"  # embedded header
            "1388530801,10,20,30,40,50,60,70,80,90\n")
        out = fs.read_greend_csv(spark, str(root / "*" / "*.csv"))
        rows = out.collect()
        # 2 data rows x 9 channels; the embedded header row is dropped
        assert len(rows) == 18
        by_key = {(r.ts.isoformat(), r.channel_idx): r.power for r in rows}
        assert by_key[("2013-12-31T23:00:00", 0)] == 1.5
        assert by_key[("2013-12-31T23:00:00", 2)] == 0.0  # empty -> 0.0
        assert by_key[("2013-12-31T23:00:00", 3)] == 0.0  # 'bad' -> 0.0
        assert by_key[("2013-12-31T23:00:01", 8)] == 90.0
        assert rows[0].building == "building0"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_read_labels_json_positional_dim(spark):
    root = Path(tempfile.mkdtemp(prefix="labels_"))
    try:
        p = root / "labels.json"
        p.write_text(json.dumps({
            "0": ["fridge", "dishwasher", "kettle"],
            "1": ["tv", "radio"],
        }))
        dim = fs.read_labels_json(spark, str(p))
        rows = {(r.house_id, r.channel_idx, r.appliance_name)
                for r in dim.collect()}
        assert rows == {("0", 0, "fridge"), ("0", 1, "dishwasher"),
                        ("0", 2, "kettle"), ("1", 0, "tv"), ("1", 1, "radio")}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_avro_roundtrip_over_reference_schema(spark):
    """S2 hard gate: with the spark-avro jar present, a to_avro/from_avro
    round trip over the reference wire schema (schema.avsc:1-27) must
    reproduce the records exactly; without the jar the test xfails — it can
    no longer pass vacuously."""
    import pytest

    from pyspark.sql import functions as F

    if not fs.avro_available(spark):
        pytest.xfail("no spark-avro jar on the classpath")

    from pyspark.sql.avro.functions import to_avro

    rows = [("h1", "fridge", "h1_fridge", 1_600_000_000_123, 42.5),
            ("h2", "kettle", "h2_kettle", 1_600_000_000_456, 0.0)]
    df = spark.createDataFrame(
        rows, "house_id string, appliance_name string, appliance_id string, "
              "timestamp long, power float")
    envelope = df.select(
        to_avro(F.struct(*df.columns), fs.REFERENCE_AVRO_SCHEMA)
        .alias("value"))
    decoded = fs.decode_avro_stream(envelope, fs.REFERENCE_AVRO_SCHEMA)
    assert sorted(tuple(r) for r in decoded.collect()) == sorted(rows)


def test_avro_decode_gate_raises_clear_error_when_missing(spark):
    """Without the jar the decode must fail with actionable guidance, not a
    raw analysis error (and with the jar this test is covered by the
    round-trip above)."""
    import pytest

    from pyspark.sql import functions as F

    if fs.avro_available(spark):
        pytest.skip("spark-avro present; gate error path not reachable")
    envelope = spark.range(1).select(F.lit(b"x").alias("value"))
    with pytest.raises(RuntimeError, match="spark-avro"):
        fs.decode_avro_stream(envelope, fs.REFERENCE_AVRO_SCHEMA)


def test_kafka_option_specs():
    """S1/S4/ST8 spec builders are pure and exact — this is what the live
    reader/sink submit to the connector."""
    assert fs.kafka_source_options(
        "b1:9092,b2:9092", "power_raw", starting_offsets="earliest",
        fail_on_data_loss=False, max_offsets_per_trigger=100_000) == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "power_raw",
        "failOnDataLoss": "false",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "100000",
    }
    assert fs.kafka_sink_options("b1:9092", "duty_out", "/ck/duty") == {
        "kafka.bootstrap.servers": "b1:9092",
        "topic": "duty_out",
        "checkpointLocation": "/ck/duty",
    }


def test_duty_cycle_kafka_pipeline_composes(spark):
    """The reference's full Kafka->avro->window->Kafka shape
    (duty_cycle_avro.py:63-89) must compose; only the two known environment
    gaps (connector jar, avro jar) may stop it, and then as an xfail. Any
    Python-level wiring break (bad kwargs, renamed column, broken builder)
    raises a different error and fails the test."""
    import tempfile

    import pytest
    from pyspark.errors.exceptions.base import AnalysisException

    try:
        writer = fs.duty_cycle_kafka_pipeline(
            spark, "localhost:9092", "power_raw", "duty_out",
            tempfile.mkdtemp(prefix="kck_"))
    except AnalysisException as exc:
        assert "kafka" in str(exc).lower()
        pytest.xfail("no spark-sql-kafka connector jar on the classpath")
    except RuntimeError as exc:
        assert "spark-avro" in str(exc)
        pytest.xfail("no spark-avro jar on the classpath")
    # jars present: the composed unstarted writer must carry the sink spec
    assert writer is not None


# ---------------------------------------------------------------------------
# Pluggable Python DataSource (Spark 4 API): batch + incremental stream
# ---------------------------------------------------------------------------

def _write_redd_fixture(root):
    import os

    rows = {
        ("1", 1): [(1303132929, 4.15), (1303132930, 7.0), (1303132931, "bad")],
        ("1", 2): [(1303132929, 191.3), (1303132930, 192.0)],
        ("2", 1): [(1303132929, 55.0)],
    }
    for (house, chan), data in rows.items():
        d = os.path.join(root, f"house_{house}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"channel_{chan}.dat"), "w") as fh:
            for ts, p in data:
                fh.write(f"{ts} {p}\n")
    return rows


def test_redd_datasource_batch(spark, tmp_path):
    from insight_de_smart_grid_spark.sources.redd_source import ReddDataSource

    _write_redd_fixture(str(tmp_path))
    spark.dataSource.register(ReddDataSource)
    df = spark.read.format("redd").load(str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6
    by_key = {(r.house_id, r.channel_idx): r for r in rows}
    assert by_key[("2", 1)].power == 55.0
    # producer's dirty-data policy: non-numeric power -> 0.0
    bad = [r for r in rows if r.house_id == "1" and r.channel_idx == 1
           and r.power == 0.0]
    assert len(bad) == 1
    # one input partition per file -> parallel scan units
    assert df.rdd.getNumPartitions() == 3


def test_redd_datasource_stream_replays_incrementally(spark, tmp_path):
    import uuid

    from insight_de_smart_grid_spark.sources.redd_source import ReddDataSource

    _write_redd_fixture(str(tmp_path))
    spark.dataSource.register(ReddDataSource)
    name = f"redd_{uuid.uuid4().hex[:8]}"
    q = (spark.readStream.format("redd").load(str(tmp_path))
         .writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table(name).collect()
    batch = spark.read.format("redd").load(str(tmp_path)).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in batch}
    assert len(got) == 6
    # a restart from the checkpointed offset re-reads nothing
    q2 = (spark.readStream.format("redd").load(str(tmp_path))
          .writeStream.format("memory").queryName(name + "_b")
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    assert spark.table(name + "_b").count() in (0, 6)


def test_redd_datasource_matches_csv_reader_on_dirty_file(spark, tmp_path):
    """The pluggable source and the CSV path are row-for-row
    interchangeable, INCLUDING the dirty-data policy: embedded headers and
    non-numeric cells coerce to 0.0 on both surfaces."""
    import os

    from insight_de_smart_grid_spark.sources.files import read_redd_channels
    from insight_de_smart_grid_spark.sources.redd_source import ReddDataSource

    d = tmp_path / "house_9"
    d.mkdir()
    (d / "channel_3.dat").write_text(
        "1303132929 4.15\n"
        "timestamp power\n"        # embedded header -> epoch-0, 0.0
        "1303132930 notanum\n"     # bad power -> 0.0
        "1303132931 7.5\n")
    spark.dataSource.register(ReddDataSource)
    via_source = {tuple(r) for r in
                  spark.read.format("redd").load(str(tmp_path)).collect()}
    via_csv = {tuple(r) for r in
               read_redd_channels(
                   spark, str(tmp_path / "*" / "*.dat"))
               .select("ts", "power", "house_id", "channel_idx").collect()}
    assert via_source == via_csv
    assert len(via_source) == 4


def test_merge_schema_reads_evolved_partitions(spark, tmp_path):
    """Schema evolution on the lake: an old partition lacking a column added
    later must read back null-filled when mergeSchema is on, with the
    unioned schema — the append-only evolution contract a long-lived 100 TB
    table relies on."""
    from pyspark.sql import functions as F

    v1 = spark.range(3).select(
        F.col("id"), F.lit("a").alias("source"))
    v2 = spark.range(3, 6).select(
        F.col("id"), F.lit("b").alias("source"),
        (F.col("id") * 10).alias("quality"))
    v1.write.parquet(str(tmp_path / "t" / "batch=1"))
    v2.write.parquet(str(tmp_path / "t" / "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "t"))
    assert set(merged.columns) == {"id", "source", "quality", "batch"}
    old = merged.where("batch = 1")
    assert old.where(F.col("quality").isNull()).count() == 3
    assert merged.where("quality = 40").count() == 1


def test_ignore_corrupt_files_skips_garbage(spark, tmp_path):
    """Lake resilience: with ignoreCorruptFiles a truncated/garbage parquet
    part must be skipped, not fail the whole scan — and without the option
    the scan fails loudly (no silent default)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    spark.range(10).write.parquet(str(tmp_path / "t"))
    (tmp_path / "t" / "part-corrupt.parquet").write_bytes(
        b"PAR1 this is not a parquet file")

    with _pytest.raises(Exception):
        spark.read.parquet(str(tmp_path / "t")).count()

    ok = (spark.read.option("ignoreCorruptFiles", "true")
          .parquet(str(tmp_path / "t")))
    assert ok.agg(F.sum("id")).first()[0] == 45


def test_jsonl_manifest_sink_commit_protocol(spark, tmp_path):
    """The manifest IS the dataset: task files round-trip exactly, a planted
    orphan file (the debris a failed-then-retried task leaves) is invisible
    to readers, and the manifest's row accounting matches."""
    import json as _json

    from insight_de_smart_grid_spark.sources.jsonl_sink import (
        MANIFEST,
        register_jsonl_sink,
    )
    from insight_de_smart_grid_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    register_jsonl_sink(spark)
    docs = load_table(spark, SF_ORACLE, "documents")
    out = str(tmp_path / "jl")
    (docs.repartition(4).write.format("jsonl_manifest")
     .option("path", out).mode("append").save())

    man = _json.loads((tmp_path / "jl" / MANIFEST).read_text())
    assert man["n_rows"] == docs.count()
    assert len(man["files"]) == 4

    (tmp_path / "jl" / "part-orphan.jsonl").write_text(
        '{"doc_id": 999999, "text": "x", "lang": "xx", '
        '"source": "zz", "n_chars": 1}\n')
    back = (spark.read.format("jsonl_manifest").schema(docs.schema)
            .option("path", out).load())
    assert back.filter("doc_id = 999999").count() == 0
    assert ({tuple(r) for r in back.collect()}
            == {tuple(r) for r in docs.collect()})


def test_jsonl_manifest_abort_removes_task_files(tmp_path):
    """abort() must delete the files its tasks wrote (no debris committed)."""
    from insight_de_smart_grid_spark.sources.jsonl_sink import (
        JsonlCommit,
        JsonlWriter,
    )

    w = JsonlWriter({"path": str(tmp_path)})
    f1 = tmp_path / "part-aaa.jsonl"
    f1.write_text("{}\n")
    w.abort([JsonlCommit(file_name="part-aaa.jsonl", n_rows=1), None])
    assert not f1.exists()


def test_kafka_batch_sink_option_spec():
    """S5: batch produce has no checkpoint ledger — the option dict must
    NOT carry checkpointLocation (the spelling the live connector gets)."""
    assert fs.kafka_sink_options("b1:9092", "power_agg") == {
        "kafka.bootstrap.servers": "b1:9092",
        "topic": "power_agg",
    }


def test_kafka_batch_produce_roundtrip_via_mock(spark, tmp_path):
    """S5 end-to-end against the mock envelope: the reference's batch
    producer loop (druid_batch.py:110-116 — pydruid reagg export, per-row
    JSON value with the batch timestamp spliced in, constant key) as a
    distributed batch produce. The payload frame is byte-for-byte what
    `kafka_sink(streaming=False)` submits to the real connector; the mock
    writer captures (key, value, topic) per partition."""
    import pytest
    from pyspark.sql import functions as F

    from insight_de_smart_grid_spark.operators import rollup as ru
    from insight_de_smart_grid_spark.sources.mock_kafka import (
        register_mock_kafka,
    )
    from insight_de_smart_grid_spark.sources.tables import readings_view
    from tests.conftest import SF_SMOKE

    register_mock_kafka(spark)
    cube = ru.rollup_time(readings_view(spark, SF_SMOKE), "1 second",
                          dims=("house_id", "appliance_id"))
    reagg = ru.reaggregate(cube, ("house_id", "appliance_id"),
                           avg_col="avg_power")
    # druid_batch splices {"timestamp": utc_timestamp} into each row's JSON
    stamped = reagg.withColumn(
        "timestamp", F.lit("2024-01-01T00:00:00+00:00"))
    out = (fs.kafka_payload(stamped, key_col=None)
           .withColumn("key", F.lit("key")))  # constant key, like acked loop
    cap = str(tmp_path / "cap")
    (out.write.format("mockkafka")
     .option("capture_dir", cap).option("topic", "power_agg")
     .mode("append").save())

    captured = spark.read.parquet(cap).collect()
    assert len(captured) == reagg.count() > 0
    assert all(r.topic == "power_agg" for r in captured)
    assert all(bytes(r.key) == b"key" for r in captured)
    got = sorted(
        (d["house_id"], d["appliance_id"], round(d["avg_power"], 9),
         d["timestamp"])
        for d in (json.loads(bytes(r.value).decode()) for r in captured))
    want = sorted(
        (r.house_id, r.appliance_id, round(r.avg_power, 9),
         "2024-01-01T00:00:00+00:00")
        for r in reagg.collect())
    assert got == want

    # wire-shape contract: a frame without `value` is rejected up front
    with pytest.raises(Exception, match="value"):
        (reagg.write.format("mockkafka")
         .option("capture_dir", cap).mode("append").save())


def test_mockkafka_backlog_cache_is_private_and_non_executable(tmp_path,
                                                               monkeypatch):
    """The stream reader's disk cache contract (round-6 advisory): the
    cache dir is per-user 0700 and OWNERSHIP-checked (a pre-planted dir
    owned by another uid, or one with group/other access, disables disk
    caching entirely rather than trusting it), the format is parquet
    (pure data — loading it cannot execute anything, unlike pickle), and
    the roundtrip preserves the envelope tuples exactly, including the
    whole-ms UTC timestamps."""
    import os
    import stat
    from datetime import datetime, timezone

    from insight_de_smart_grid_spark.sources import mock_kafka as mk

    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    d = mk._private_cache_dir()
    assert d is not None and d.startswith(str(tmp_path))
    st = os.stat(d)
    assert stat.S_ISDIR(st.st_mode)
    assert st.st_uid == os.getuid()
    assert st.st_mode & 0o077 == 0  # no group/other access

    # loosened permissions must disable disk caching, not be trusted
    os.chmod(d, 0o755)
    assert mk._private_cache_dir() is None
    os.chmod(d, 0o700)
    assert mk._private_cache_dir() == d

    rows = [
        (b"1", b"\x02abc", "power-raw", 0, 0,
         datetime.fromtimestamp(1_700_000_000_123 / 1000.0,
                                tz=timezone.utc), 0),
        (b"2", b"", "power-raw", 3, 17,
         datetime.fromtimestamp(1 / 1000.0, tz=timezone.utc), 0),
    ]
    p = os.path.join(d, "roundtrip.parquet")
    mk._write_backlog_parquet(rows, p)
    assert mk._read_backlog_parquet(p) == rows


def test_mockkafka_cache_key_tracks_fixture_content(tmp_path):
    """The cache key hashes fixture CONTENT: rewriting the file in place
    (even with a preserved mtime) changes the key; topic/partition options
    are part of the key too."""
    import os

    from insight_de_smart_grid_spark.sources.mock_kafka import (
        MockKafkaStreamReader,
    )

    f = tmp_path / "events.parquet"
    f.write_bytes(b"one")
    st = os.stat(f)

    def key(**over):
        opts = {"path": str(f), "topic": "t", "partitions": "4", **over}
        return MockKafkaStreamReader(opts)._cache_key()

    k1 = key()
    assert k1 == key()  # deterministic
    f.write_bytes(b"two")
    os.utime(f, (st.st_atime, st.st_mtime))  # preserve mtime
    assert key() != k1
    assert key(topic="other") != key()
    assert key(partitions="8") != key()


def test_mockkafka_cache_key_tracks_directory_fixtures(tmp_path):
    """Round-7 advisory: directory-shaped parquet datasets (Spark-written)
    must carry a freshness component too — a rewritten fixture at the
    same path must MISS the cached backlog. The key folds every entry's
    (relpath, size, mtime_ns), so adding a part-file, changing bytes
    (size), or a same-size rewrite (mtime_ns) all change the key."""
    import os

    from insight_de_smart_grid_spark.sources.mock_kafka import (
        MockKafkaStreamReader,
    )

    d = tmp_path / "events.parquet"
    d.mkdir()
    part = d / "part-00000.parquet"
    part.write_bytes(b"aaaa")

    def key():
        opts = {"path": str(d), "topic": "t", "partitions": "4"}
        return MockKafkaStreamReader(opts)._cache_key()

    k1 = key()
    assert k1 == key()  # deterministic on an unchanged directory
    (d / "part-00001.parquet").write_bytes(b"bb")  # new part-file
    k2 = key()
    assert k2 != k1
    part.write_bytes(b"aaaaaa")  # size change
    k3 = key()
    assert k3 != k2
    # same-size rewrite: Spark's overwrite always creates fresh files, so
    # mtime_ns moves even when bytes/size collide
    part.write_bytes(b"cccccc")
    os.utime(part, ns=(os.stat(part).st_atime_ns,
                       os.stat(part).st_mtime_ns + 1))
    assert key() != k3
