"""Cache-lifecycle helpers for operators that stage a shared subplan.

Several operators materialize a shared intermediate — the hashed shingle
table (``dedup.ngram_jaccard_pairs``), the LSH signature table
(``similarity.cosine_pairs_blocked`` / ``knn_graph``), the kNN edge list
(``label_propagation`` / ``pagerank_knn``), the segment index sides
(``relational.passjoin_fuzzy_match``) — with ``localCheckpoint`` so
multiple downstream consumers read it from block storage instead of
recomputing the whole lineage per consumer. ``localCheckpoint`` TRUNCATES
lineage and PINS the RDD blocks; Spark's ContextCleaner only releases them
when the JVM-side plan is garbage collected, so a long-lived session that
invokes these operators repeatedly (a threshold sweep, a dashboard
refresh loop) accumulates pinned blocks.

Two escape hatches, composable:

- every staging operator takes ``materialize: bool = True``. Pass
  ``False`` to keep pure lineage — no pinned blocks, at the cost of
  recomputing the shared subplan per consumer. Right when the caller
  stages its own shared input once, or calls the operator in a tight
  loop where staging cost exceeds reuse benefit.
- ``checkpoint_scope(spark)`` releases, on exit, every RDD block newly
  pinned inside the scope — the consume-then-release contract for
  multi-call drivers. The caller must FULLY consume results (collect /
  write) before the scope closes: lineage was truncated, so once the
  blocks are dropped the checkpointed frames cannot be recomputed.

``tests/test_staging.py`` pins both contracts (bounded
``getPersistentRDDs`` growth under repeated invocation; identical results
with ``materialize=False``).
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Set

from pyspark.sql import DataFrame, SparkSession


def stage(df: DataFrame, materialize: bool = True,
          eager: bool = False) -> DataFrame:
    """Stage a shared subplan: ``localCheckpoint`` when ``materialize``
    (lineage truncated, blocks pinned until released), identity otherwise.

    ``eager=False`` (default) defers the materializing job to the first
    action — the extra job is only paid if a consumer actually runs.
    Iterative operators that re-read the frame every round want
    ``eager=True`` so the cut happens before the loop fans out.
    """
    return df.localCheckpoint(eager=eager) if materialize else df


def pinned_rdd_ids(spark: SparkSession) -> Set[int]:
    """Ids of every RDD currently registered persistent on the context —
    localCheckpoint pins land here. Synchronous with persist/unpersist
    (unlike ``getRDDStorageInfo``, whose block counts update async)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {e.getKey() for e in jmap.entrySet().toArray()}


@contextmanager
def checkpoint_scope(spark: SparkSession) -> Iterator[None]:
    """Release every RDD pinned inside the scope on exit.

    Usage::

        with checkpoint_scope(spark):
            rows = jaccard_threshold_sweep(docs).collect()  # consume HERE
        # all shingle-table / pair-graph blocks released

    Non-blocking unpersist: the persistent-RDD registry drops the entries
    synchronously (what ``pinned_rdd_ids`` reads); block eviction proceeds
    in the background. Safe to nest — inner scopes release only their own
    pins.
    """
    before = pinned_rdd_ids(spark)
    try:
        yield
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for e in jmap.entrySet().toArray():
            if e.getKey() not in before:
                e.getValue().unpersist(False)
