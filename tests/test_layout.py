"""Tests for storage-layout management (compaction + pruning-friendly
writes): file counts hit the target, sorted layout actually prunes."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators.layout import (
    compact,
    write_compacted,
)
from insight_de_smart_grid_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def _parquet_files(path: str) -> list[Path]:
    return [p for p in Path(path).rglob("*.parquet") if p.is_file()]


def test_compact_hits_target_file_count(spark, tmp_path):
    events = load_table(spark, SF_ORACLE, "events")  # 10k rows
    out = str(tmp_path / "compacted")
    write_compacted(events, out, target_rows_per_file=2500)
    files = _parquet_files(out)
    assert len(files) == 4
    assert spark.read.parquet(out).count() == events.count()


def test_small_file_compaction_round_trip(spark, tmp_path):
    """Start from a pathological many-files layout, compact to one file,
    contents unchanged."""
    events = load_table(spark, SF_ORACLE, "events")
    shattered = str(tmp_path / "shattered")
    events.repartition(64).write.parquet(shattered)
    assert len(_parquet_files(shattered)) == 64
    out = str(tmp_path / "fixed")
    write_compacted(spark.read.parquet(shattered), out,
                    target_rows_per_file=1_000_000)
    assert len(_parquet_files(out)) == 1
    # exact-integer checksum: float sums vary with reduction order
    assert (spark.read.parquet(out).agg(F.sum("event_id")).first()[0]
            == events.agg(F.sum("event_id")).first()[0])


def test_range_layout_prunes_files_for_key_predicate(spark, tmp_path):
    """Range-partitioned layout: a point predicate on the sort key should
    read a small fraction of files. Verified via the scan's actual input
    file list (inputFiles after filter pushdown prunes nothing at file level
    for unsorted data — compare the row-group stats effect instead via
    selected file bytes)."""
    events = load_table(spark, SF_ORACLE, "events")
    out = str(tmp_path / "ranged")
    write_compacted(events, out, target_rows_per_file=1250,
                    sort_cols=("user_id",))
    files = _parquet_files(out)
    # range partitioning samples, so sizes are approximate; maxRecordsPerFile
    # may split an oversized range into extra (still contiguous) files
    assert 8 <= len(files) <= 16
    # each file holds a contiguous user_id slice: per-file min/max ranges
    # must be (near-)disjoint — count total overlap pairs
    ranges = []
    for f in files:
        mm = spark.read.parquet(str(f)).agg(
            F.min("user_id"), F.max("user_id")).first()
        ranges.append((mm[0], mm[1]))
    ranges.sort()
    overlaps = sum(1 for a, b in zip(ranges, ranges[1:]) if a[1] > b[0])
    assert overlaps == 0, ranges


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """Hive-style date partitions: a day predicate must reduce the scanned
    files to that day's directory only (partition pruning, checked through
    the file-source scan's partition count)."""
    events = load_table(spark, SF_ORACLE, "events").withColumn(
        "day", F.to_date("ts"))
    out = str(tmp_path / "by_day")
    write_compacted(events, out, target_rows_per_file=1_000_000,
                    partition_cols=("day",))
    df = spark.read.parquet(out).where(F.col("day") == "2024-01-03")
    # inputFiles() ignores pruning; the executed scan node reports the
    # partition filter and the post-pruning partition count
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    expected = events.where(F.to_date("ts") == "2024-01-03").count()
    assert df.count() == expected > 0
    one_day = [ln for ln in plan.splitlines() if "partition count" in ln]
    if one_day:  # metric line present in this Spark build
        assert "partition count: 1" in one_day[0], one_day


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered layout bounds per-file ranges in BOTH columns: the average
    per-file fraction of each dimension's domain must be far below 1 (a
    single-column sort gives ~1.0 for the other column)."""
    from insight_de_smart_grid_spark.operators.layout import write_zordered

    events = load_table(spark, SF_ORACLE, "events").withColumn(
        "uid", F.col("user_id").cast("int")).withColumn(
        "eid", (F.col("event_id") % 1024).cast("int"))
    out = str(tmp_path / "zorder")
    write_zordered(events, out, "uid", "eid", target_rows_per_file=650,
                   bits=10)
    files = _parquet_files(out)
    assert len(files) >= 12

    def avg_span(col, domain):
        spans = []
        for f in files:
            mm = spark.read.parquet(str(f)).agg(
                F.min(col), F.max(col)).first()
            spans.append((mm[1] - mm[0]) / domain)
        return sum(spans) / len(spans)

    uid_dom = events.agg(F.max("uid") - F.min("uid")).first()[0]
    eid_dom = events.agg(F.max("eid") - F.min("eid")).first()[0]
    span_uid, span_eid = avg_span("uid", uid_dom), avg_span("eid", eid_dom)
    # both dimensions clustered: no file covers anywhere near a full domain
    assert span_uid < 0.6, span_uid
    assert span_eid < 0.6, span_eid


def test_backfill_rewrites_only_target_partitions(spark, tmp_path):
    """Dynamic partition overwrite: backfilling one day's slice must leave
    every other day's files byte-identical (same paths, same mtimes) and
    replace only the target partitions."""
    from insight_de_smart_grid_spark.operators.rollup import (
        backfill_rollup,
        rollup_time,
        write_rollup,
    )
    from insight_de_smart_grid_spark.sources.tables import (
        events_to_readings,
        load_table,
    )

    readings = events_to_readings(load_table(spark, SF_ORACLE, "events"))
    cube = rollup_time(readings, granularity="1 hour")
    path = str(tmp_path / "cube")
    write_rollup(cube, path)

    def snapshot(exclude_day=None):
        return {
            str(p): p.stat().st_mtime
            for p in Path(path).rglob("*.parquet")
            if exclude_day is None or f"date={exclude_day}" not in str(p)
        }

    target = "2024-01-05"
    before_others = snapshot(exclude_day=target)
    before_target = {p for p in snapshot() if f"date={target}" in p}
    assert before_target, "target day must exist in the fixture"

    # correction slice: that day only, values doubled
    slice_ = cube.where(F.to_date("window_start") == target).withColumn(
        "sum_power", F.col("sum_power") * 2)
    backfill_rollup(slice_, path)

    after_others = snapshot(exclude_day=target)
    assert after_others == before_others  # untouched, not rewritten
    after_target = {p for p in snapshot() if f"date={target}" in p}
    assert after_target and after_target != before_target
    # and the table reads back with the correction applied, same row count
    assert spark.read.parquet(path).count() == cube.count()
