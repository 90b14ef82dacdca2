"""Cache-lifecycle contract for lazy-localCheckpoint staging operators.

The staged-subplan operators (shingle inversion, LSH blocking, kNN edge
lists, PassJoin segment index) pin RDD blocks via ``localCheckpoint``.
These tests pin the two escape hatches ``operators/staging.py`` documents:

- ``materialize=False`` runs the same plan with pure lineage — NOTHING is
  pinned, and results are identical;
- ``checkpoint_scope`` releases every block pinned inside it, so a
  long-lived session invoking a staging operator N times shows BOUNDED
  persistent-RDD growth (the round-4 verdict's leak scenario).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators import dedup, similarity
from insight_de_smart_grid_spark.operators.staging import (
    checkpoint_scope, pinned_rdd_ids)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_materialize_false_pins_nothing(spark):
    before = pinned_rdd_ids(spark)
    n = dedup.ngram_jaccard_pairs(_docs(spark), materialize=False).count()
    assert n >= 0
    assert pinned_rdd_ids(spark) <= before


def test_materialize_false_same_result(spark):
    docs = _docs(spark)
    with checkpoint_scope(spark):
        staged = sorted(map(tuple,
                            dedup.ngram_jaccard_pairs(docs).collect()))
    pure = sorted(map(tuple,
                      dedup.ngram_jaccard_pairs(
                          docs, materialize=False).collect()))
    assert staged == pure


def test_checkpoint_scope_releases_sweep_pins(spark):
    """The verdict's leak scenario: repeated `jaccard_threshold_sweep`
    calls in one session. Inside the scope blocks pin (staging works);
    after N scoped invocations the persistent-RDD registry is back to its
    baseline — growth is bounded at zero, not linear in N."""
    docs = _docs(spark)
    baseline = pinned_rdd_ids(spark)
    for _ in range(3):
        with checkpoint_scope(spark):
            rows = dedup.jaccard_threshold_sweep(docs).collect()
            assert len(rows) >= 1
    assert pinned_rdd_ids(spark) <= baseline


def test_checkpoint_scope_releases_eager_iteration_pins(spark):
    """Eager-checkpoint iterators (blast radius BFS) release too."""
    docs = _docs(spark).limit(200)
    baseline = pinned_rdd_ids(spark)
    with checkpoint_scope(spark):
        dedup.near_dup_blast_radius(docs, max_hops=2).collect()
        assert len(pinned_rdd_ids(spark)) >= len(baseline)
    assert pinned_rdd_ids(spark) <= baseline


def test_similarity_materialize_false_matches(spark):
    emb = _emb(spark).limit(300)
    with checkpoint_scope(spark):
        staged = sorted(map(tuple, similarity.knn_graph(emb).collect()))
    pure = sorted(map(tuple,
                      similarity.knn_graph(emb,
                                           materialize=False).collect()))
    assert staged == pure
    assert len(staged) > 0


def test_pagerank_scope_bounded(spark):
    emb = _emb(spark).limit(200)
    baseline = pinned_rdd_ids(spark)
    for _ in range(2):
        with checkpoint_scope(spark):
            similarity.pagerank_knn(emb, iters=2).collect()
    assert pinned_rdd_ids(spark) <= baseline


def test_nested_scopes_release_only_inner(spark):
    docs = _docs(spark).limit(100)
    baseline = pinned_rdd_ids(spark)
    with checkpoint_scope(spark):
        outer = dedup.ngram_jaccard_pairs(docs)
        outer_n = outer.count()          # pins outer's shingle table
        outer_pinned = pinned_rdd_ids(spark)
        with checkpoint_scope(spark):
            dedup.containment_pairs(docs).collect()
        # inner's pins gone, outer's survive — and stay readable
        assert pinned_rdd_ids(spark) <= outer_pinned
        assert outer.count() == outer_n
    assert pinned_rdd_ids(spark) <= baseline
