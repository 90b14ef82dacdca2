"""Incremental ANN signature index (operators/ann_index.py): the
maintenance contracts the registered ``sim_ann_index_append`` oracle row
can't see — creation-time depth freeze, delta-only append plans,
compaction invariance, and probe pushdown shape."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators import ann_index as ai
from tests.conftest import SF_ORACLE


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def _topk(spark, path, emb, qid=0, k=10):
    qv = emb.filter(F.col("vec_id") == qid).select("embedding").head()[0]
    return sorted((r.vec_id, r.cos_sim) for r in
                  ai.query_index_topk(spark, path, qv, k=k,
                                      exclude_id=qid).collect())


def test_append_equals_rebuild_and_compaction_invariant(
        spark, emb, tmp_path):
    """(index built on 80% + two appended deltas) answers queries
    identically to a from-scratch index over the full corpus, before AND
    after compaction; compaction reduces the file count (each append adds
    a file set) back to one sorted set per LSH table."""
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    b = F.pmod(F.xxhash64(F.col("vec_id").cast("string")), 100)
    ai.build_signature_index(emb.filter(b < 80), inc,
                             n_tables=4, n_planes=6)
    ai.append_signatures(emb.filter((b >= 80) & (b < 90)), inc)
    ai.append_signatures(emb.filter(b >= 90), inc)
    ai.build_signature_index(emb, full, n_tables=4, n_planes=6)

    want = _topk(spark, full, emb)
    files_before = sum(1 for _ in Path(inc, "signatures")
                       .rglob("*.parquet"))
    assert _topk(spark, inc, emb) == want
    files_after = ai.compact_signature_index(spark, inc)
    assert files_after < files_before
    assert _topk(spark, inc, emb) == want
    # row multiset survives compaction exactly
    n_full = spark.read.parquet(f"{full}/signatures").count()
    assert spark.read.parquet(f"{inc}/signatures").count() == n_full


def test_auto_depth_freezes_at_creation(spark, emb, tmp_path):
    """An auto-depth index resolves n_planes from the CREATION corpus and
    never re-derives on append: the deltas here grow the corpus past the
    next power-of-two occupancy boundary (auto over the grown corpus
    WOULD pick a deeper geometry), but the meta — and therefore every
    appended signature's bucket space — stays at the creation depth.
    Mixing depths would make buckets incompatible; re-deriving is what
    rebuild is for."""
    from insight_de_smart_grid_spark.operators.similarity import (
        auto_n_planes,
    )

    path = str(tmp_path / "frozen")
    b = F.pmod(F.xxhash64(F.col("vec_id").cast("string")), 100)
    creation = emb.filter(b < 40)
    n_created, n_total = creation.count(), emb.count()
    occ = 4
    d_created = auto_n_planes(n_created, target_occupancy=occ)
    d_grown = auto_n_planes(n_total, target_occupancy=occ)
    assert d_grown > d_created  # the fixture really crosses a boundary

    meta = ai.build_signature_index(creation, path, n_tables=4,
                                    n_planes="auto", auto_occupancy=occ)
    assert meta["n_planes"] == d_created and meta["depth_mode"] == "auto"
    ai.append_signatures(emb.filter(b >= 40), path)
    meta2 = json.loads(Path(path, "meta.json").read_text())
    assert meta2["n_planes"] == d_created
    # appended buckets live in the creation-depth bucket space
    mx = (spark.read.parquet(f"{path}/signatures")
          .agg(F.max("bucket")).head()[0])
    assert mx < 2 ** d_created


def test_append_plan_reads_only_the_delta(spark, emb, tmp_path):
    """The append job's input is the delta frame alone: its physical plan
    scans no file under the index path and runs no count() over history
    (the depth comes from meta.json). Asserted on the very plan
    append_signatures executes, reconstructed via the same builder."""
    from insight_de_smart_grid_spark.operators.similarity import (
        hyperplane_signatures,
    )

    path = str(tmp_path / "idx")
    b = F.pmod(F.xxhash64(F.col("vec_id").cast("string")), 100)
    meta = ai.build_signature_index(emb.filter(b < 80), path,
                                    n_tables=4, n_planes=6)
    delta = emb.filter(b >= 80)
    sig = hyperplane_signatures(delta, meta["n_tables"], meta["n_planes"],
                                meta["dim"])
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert path not in plan            # never reads the index
    assert plan.count("Scan parquet") == 1  # exactly the delta's scan
    assert "Exchange" not in plan      # signature compute is shuffle-free

    n_before = spark.read.parquet(f"{path}/signatures").count()
    ai.append_signatures(delta, path)
    n_after = spark.read.parquet(f"{path}/signatures").count()
    assert n_after == n_before + delta.count() * meta["n_tables"]


def test_multiprobe_through_persisted_index(spark, emb, tmp_path):
    """probe_radius=r against the persisted index == the inline
    ``lsh_multiprobe_topk`` at the same geometry (round-7 lever x round-8
    index); radius 1 candidates strictly contain radius 0's (mask-set
    inclusion), and the probe stays a join-free pushed-down filter."""
    from insight_de_smart_grid_spark.operators.similarity import (
        lsh_multiprobe_topk,
    )

    path = str(tmp_path / "idx")
    ai.build_signature_index(emb, path, n_tables=4, n_planes=8)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]

    got = ai.query_index_topk(spark, path, qv, k=10, exclude_id=0,
                              probe_radius=1)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and plan.count("Scan parquet") == 1
    want = lsh_multiprobe_topk(emb, query_vec_id=0, k=10, n_tables=4,
                               n_planes=8, probe_radius=1)
    assert (sorted((r.vec_id, r.cos_sim) for r in got.collect())
            == sorted((r.vec_id, r.cos_sim) for r in want.collect()))

    # candidate growth is monotone in the radius
    def n_cands(r):
        probes = ai.query_buckets(qv, 4, 8, 64, probe_radius=r)
        from functools import reduce
        pred = reduce(lambda a, b: a | b,
                      [(F.col("table") == t) & (F.col("bucket").isin(bs))
                       for t, bs in probes])
        return (spark.read.parquet(f"{path}/signatures").filter(pred)
                .select("vec_id").distinct().count())

    assert n_cands(0) <= n_cands(1) <= n_cands(2)
    assert n_cands(1) > n_cands(0)  # the fixture really expands reach


def test_probe_is_pushed_down(spark, emb, tmp_path):
    """The query probe is a filter over the partitioned signature table —
    no join to build candidates, partition pruning on the LSH table dirs
    (PartitionFilters carries the table terms of the disjunction)."""
    path = str(tmp_path / "idx")
    ai.build_signature_index(emb, path, n_tables=4, n_planes=6)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = ai.query_index_topk(spark, path, qv, k=5, exclude_id=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert "PartitionFilters: [" in plan and "table" in plan.split(
        "PartitionFilters:")[1][:200]
    assert out.count() > 0
