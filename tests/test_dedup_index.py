"""Persisted MinHash-LSH dedup index (operators/dedup_index.py): the
maintenance contracts the registered oracle rows can't see — rebuild ==
append equivalence at the pair level, delta-only append plans, compaction
invariance, broadcast shape of the incremental probe, and geometry
freezing."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators import dedup as dd
from insight_de_smart_grid_spark.operators import dedup_index as di
from tests.conftest import SF_ORACLE


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


def _pairs(df):
    return sorted((r.doc_a, r.doc_b, round(r.jaccard, 9))
                  for r in df.collect())


def test_append_equals_rebuild_and_inline(spark, docs, tmp_path):
    """(index built on 80% + two appended deltas) produces the same
    verified near-dup pairs as a from-scratch index AND as the inline
    ``minhash_lsh_near_dups`` pipeline, before and after compaction;
    compaction reduces the file count (each append adds a file set per
    band partition) without changing a row."""
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    b = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), 100)
    di.build_dedup_index(docs.filter(b < 80), inc)
    di.append_dedup_index(docs.filter((b >= 80) & (b < 90)), inc)
    di.append_dedup_index(docs.filter(b >= 90), inc)
    di.build_dedup_index(docs, full)

    want = _pairs(dd.minhash_lsh_near_dups(docs, threshold=0.5))
    assert want, "fixture has no near-dup pairs — test is vacuous"
    assert _pairs(di.index_near_dup_pairs(spark, full)) == want
    files_before = sum(1 for s in ("docs", "bands")
                       for _ in Path(inc, s).rglob("*.parquet"))
    assert _pairs(di.index_near_dup_pairs(spark, inc)) == want
    files_after = di.compact_dedup_index(spark, inc)
    assert files_after < files_before
    assert _pairs(di.index_near_dup_pairs(spark, inc)) == want
    # row multisets survive compaction exactly
    for sub in ("docs", "bands"):
        assert (spark.read.parquet(f"{inc}/{sub}").count()
                == spark.read.parquet(f"{full}/{sub}").count())


def test_incremental_probe_matches_spanning_pairs(spark, docs, tmp_path):
    """delta-vs-index == the base/delta-spanning subset of the inline
    full-corpus pipeline: nothing invented, nothing missed, normalized to
    the same (doc_a < doc_b) convention."""
    path = str(tmp_path / "idx")
    b = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), 100)
    base, delta = docs.filter(b < 70), docs.filter(b >= 70)
    di.build_dedup_index(base, path)
    got = _pairs(di.dedup_new_against_index(spark, path, delta))

    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    want = [(a, bb, j) for a, bb, j in
            _pairs(dd.minhash_lsh_near_dups(docs, threshold=0.5))
            if (a in base_ids) != (bb in base_ids)]
    assert want, "fixture has no spanning pairs — test is vacuous"
    assert got == want


def test_append_plan_reads_only_the_delta(spark, docs, tmp_path):
    """The append job's input is the delta frame alone: the signature pass
    it executes scans no file under the index path (geometry comes from
    meta.json, never a re-derivation over history)."""
    path = str(tmp_path / "idx")
    b = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), 100)
    meta = di.build_dedup_index(docs.filter(b < 80), path)
    delta = docs.filter(b >= 80)
    sig = dd.signature_shingle_sets(delta, meta["n_hashes"], meta["ngram"],
                                    meta["text_col"], meta["id_col"])
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert path not in plan                 # never reads the index
    assert plan.count("Scan parquet") == 1  # exactly the delta's scan

    n_docs = spark.read.parquet(f"{path}/docs").count()
    di.append_dedup_index(delta, path)
    n_delta = sig.count()
    assert spark.read.parquet(f"{path}/docs").count() == n_docs + n_delta
    assert (spark.read.parquet(f"{path}/bands").count()
            == (n_docs + n_delta) * meta["bands"])


def test_incremental_probe_broadcasts_the_delta(spark, docs, tmp_path):
    """The candidate join broadcasts the DELTA side: the big persisted
    band table is a pruned scan streamed through BroadcastHashJoins —
    no index-side shuffle anywhere in the probe (the only Exchanges are
    over candidate-bounded intermediates, downstream of the index scan's
    broadcast join)."""
    path = str(tmp_path / "idx")
    b = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), 100)
    di.build_dedup_index(docs.filter(b < 80), path)
    out = di.dedup_new_against_index(spark, path, docs.filter(b >= 80))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert out.count() >= 0  # executes


def test_scheduled_ingest_loop_is_exactly_the_full_pair_set(
        spark, docs, tmp_path):
    """The scheduled-ingest loop's committed pairs == the inline
    full-corpus pipeline, for two different batchings (3 and 4 slices):
    incremental ingest neither loses a cross-batch pair nor duplicates
    one (a spanning pair is found exactly once — when its later doc
    arrives), independent of how the corpus is sliced."""
    want = _pairs(dd.minhash_lsh_near_dups(docs, threshold=0.5))
    assert want
    for n in (3, 4):
        got = di.scheduled_ingest_dedup(
            spark, docs, str(tmp_path / f"loop{n}"), n_batches=n)
        assert _pairs(got) == want, f"n_batches={n}"
    # mid-loop compaction is result-invariant: same pairs, fewer files
    got_c = di.scheduled_ingest_dedup(
        spark, docs, str(tmp_path / "loopc"), n_batches=4,
        compact_every=2)
    assert _pairs(got_c) == want
    files = lambda d: sum(1 for s in ("docs", "bands")  # noqa: E731
                          for _ in Path(tmp_path, d, "index", s)
                          .rglob("*.parquet"))
    assert files("loopc") < files("loop4")
    # the loop leaves a complete, usable index behind: its standing state
    # answers the one-shot pair query identically
    assert _pairs(di.index_near_dup_pairs(
        spark, str(tmp_path / "loop4" / "index"))) == want
    # the REAL Structured-Streaming drive (foreachBatch over a one-file-
    # per-micro-batch availableNow source) commits the same pair set,
    # and ITS standing index is equivalent too
    got_s = di.streaming_ingest_dedup(
        spark, docs, str(tmp_path / "stream"), n_files=3)
    assert _pairs(got_s) == want
    assert _pairs(di.index_near_dup_pairs(
        spark, str(tmp_path / "stream" / "index"))) == want


def test_geometry_is_frozen_at_creation(spark, docs, tmp_path):
    """meta.json freezes the banding geometry; appends reuse it verbatim
    (buckets from different geometries never collide, so a drifting
    append would silently lose recall — the meta is the contract)."""
    path = str(tmp_path / "idx")
    b = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), 100)
    meta = di.build_dedup_index(docs.filter(b < 50), path,
                                n_hashes=16, bands=4, ngram=2)
    assert (meta["n_hashes"], meta["bands"], meta["ngram"]) == (16, 4, 2)
    assert meta["n_packed"] == 2  # 4 rows/band -> two packed 62-bit keys
    di.append_dedup_index(docs.filter(b >= 50), path)
    assert json.loads(Path(path, "meta.json").read_text()) == meta
    # appended rows live in the creation geometry's band space
    mx = (spark.read.parquet(f"{path}/bands")
          .agg(F.max("band_idx")).head()[0])
    assert mx == 3
