"""Shared index lifecycle core (operators/index_base.py): the zero-job
auto-mode pick and the conflict-retrying compaction skeleton — the
round-10 contracts every family inherits."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, functions as F

from insight_de_smart_grid_spark.operators import dedup_index as di
from insight_de_smart_grid_spark.operators import index_base as ib
from tests.conftest import SF_ORACLE


def test_pick_join_mode_zero_job_on_statistics(spark, monkeypatch):
    """VERDICT r9 item 5: an ``auto`` probe on a statistics-bearing
    delta must launch NO job — proven by making count() explode. The
    explicit-threshold path keeps exact count semantics (the families'
    test lever)."""
    files = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    local = spark.range(5)   # Range relation: exact rowCount estimate

    def boom(self):
        raise AssertionError("count() ran in the zero-job path")

    monkeypatch.setattr(DataFrame, "count", boom)
    assert ib.pick_join_mode(files) == "broadcast"    # sizeInBytes gate
    assert ib.pick_join_mode(local) == "broadcast"    # rowCount gate
    monkeypatch.setattr(ib, "BROADCAST_DELTA_MAX_BYTES", 10)
    assert ib.pick_join_mode(files) == "shuffle"      # still zero jobs
    assert ib.pick_join_mode(local, default_rows=2) == "shuffle"
    monkeypatch.undo()
    # explicit threshold = the legacy exact row count
    assert ib.pick_join_mode(files, row_threshold=1) == "shuffle"
    assert ib.pick_join_mode(local, row_threshold=5) == "broadcast"


def test_compaction_racing_append_retries_and_absorbs(
        spark, tmp_path, monkeypatch):
    """VERDICT r9 item 8: an append that commits between a compaction's
    snapshot and its replace must NOT be dropped — the stale rewrite
    conflicts (ManifestConflict), retries from the fresh live set, and
    the final compacted index contains the racing append's docs."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "idx")
    di.build_dedup_index(base, path)
    di.append_dedup_index(docs.limit(0), path)  # a second live segment
    n_base = di._read_table(spark, path, "docs").count()

    state = {"raced": False}
    real_read = ib.read_table

    def racing_read(sp, p, t):
        if not state["raced"]:
            state["raced"] = True
            di.append_dedup_index(delta, p)   # lands mid-compaction
        return real_read(sp, p, t)

    monkeypatch.setattr(ib, "read_table", racing_read)
    di.compact_dedup_index(spark, path)
    monkeypatch.undo()

    assert state["raced"]
    got = di._read_table(spark, path, "docs").count()
    assert got == n_base + delta.count()      # the append was absorbed
    # fully compacted: one live segment per table, orphans GC'd
    from insight_de_smart_grid_spark.operators.index_manifest import (
        live_segments,
    )
    assert len(live_segments(path, "docs")) == 1
    assert len(live_segments(path, "bands")) == 1
    # pairs equal a clean full rebuild — nothing lost, nothing doubled
    def pairs(p):
        return sorted((r.doc_a, r.doc_b, r.jaccard) for r in
                      di.index_near_dup_pairs(spark, p).collect())
    clean = str(tmp_path / "clean")
    di.build_dedup_index(docs, clean)
    assert pairs(path) == pairs(clean)


def test_compaction_gives_up_after_max_attempts(spark, tmp_path,
                                                monkeypatch):
    """A compaction that loses the race every time must fail loudly,
    not spin forever or silently drop writes."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(50)
    path = str(tmp_path / "idx")
    di.build_dedup_index(docs, path)
    real_read = ib.read_table

    def always_racing(sp, p, t):
        di.append_dedup_index(docs.limit(1), p)
        return real_read(sp, p, t)

    monkeypatch.setattr(ib, "read_table", always_racing)
    with pytest.raises(ib.ManifestConflict, match="lost the commit race"):
        ib.compact_tables(spark, path, {
            "docs": lambda df, seg:
                df.write.mode("overwrite").parquet(seg)}, max_attempts=2)


def test_adaptive_n_buckets_sizes_by_bytes_not_cores(spark):
    """Round-12 (VERDICT r11 item 1): the bucketed-layout default bucket
    count derives from the corpus size estimate — clamped, env-overridable
    — and is frozen in the built index's meta."""
    import os

    from insight_de_smart_grid_spark.operators import index_base as ib
    from insight_de_smart_grid_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    n = ib.adaptive_n_buckets(docs)
    assert 4 <= n <= 1024
    # a tiny frame clamps to the floor, a huge target to the floor too
    assert ib.adaptive_n_buckets(docs, target_bytes=1 << 40) == 4
    # env override wins (the A/B lever)
    os.environ["SPARK_GRAFT_N_BUCKETS"] = "32"
    try:
        assert ib.adaptive_n_buckets(docs) == 32
    finally:
        del os.environ["SPARK_GRAFT_N_BUCKETS"]
