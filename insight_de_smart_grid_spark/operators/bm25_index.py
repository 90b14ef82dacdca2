"""Persisted BM25 posting-list index — the FOURTH index family (round-11,
VERDICT r10 item 7), and the proof of the round-10 lifecycle-core claim:
a new family is its segment WRITERS plus registration, nothing else.
Everything lifecycle-shaped — manifest commits, idempotent staging,
conflict-retrying compaction, tombstone deletes, GC, snapshot pins —
comes verbatim from ``operators/index_base.py`` / ``index_manifest.py``.

The repo's inline ``text.bm25_topk`` tokenizes the whole corpus per
query; at 100 TB ranked retrieval runs off a PERSISTED inverted index
(the Lucene/ES posting-list design — public): one tokenize pass at
ingest, then every query reads only its terms' postings.

- ``postings/`` — ``(term, doc_id, tf)`` for EVERY term, repartitioned
  by term (all of one term's postings co-locate in one file) and sorted
  by ``(term, doc_id)`` within files, so a query's ``term IN (...)``
  predicate prunes via parquet row-group min/max stats: the probe reads
  the query terms' row groups, not the corpus.
- ``doclens/`` — ``(doc_id, dl)``: the length-normalization table. The
  corpus stats BM25 needs (N, avgdl) are a one-row aggregate over this
  narrow table computed at query time — recomputing keeps them exact
  under appends AND deletes (a takedown changes N/avgdl/df, and frozen
  stats would silently mis-score every query; the tombstone anti-join
  runs BEFORE the stats aggregate for exactly that reason).

``query_bm25_index`` over a maintained index is row-identical to the
inline ``bm25_topk`` over the same corpus, so the registered query
shares ``text.bm25_oracle_sql`` verbatim — and the delete twin shares
it over the survivor corpus, value-checking that deletes reshape the
global statistics, not just the candidate set.

The reference has no IR surface at all (SURVEY text-analysis extension
block); this extends the round-8/9/10 index story to term postings.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators import index_base
from insight_de_smart_grid_spark.operators.index_base import (
    live_file_count,
    next_tag,
    read_table,
    write_meta,
)
from insight_de_smart_grid_spark.operators.index_manifest import (
    commit,
    stage_segment,
)
from insight_de_smart_grid_spark.operators.text import (
    BM25_B,
    BM25_K1,
    tokens,
)

_POSTINGS = "postings"
_DOCLENS = "doclens"

_read_meta = index_base.read_meta
_read_table = read_table


def _tokenized(docs: DataFrame, meta: dict) -> DataFrame:
    """One tokenize pass -> (id, tokens) — the only text-touching step;
    both tables derive from it (the dedup family's shingle-once shape)."""
    toks = F.filter(tokens(meta["text_col"]), lambda t: t != "")
    return docs.select(F.col(meta["id_col"]), toks.alias("t"))


def _stage_tables(base: DataFrame, path: str, meta: dict, tag: str) -> dict:
    """The family's entire bespoke surface: two segment writers.
    ``postings``: term-repartitioned + (term, id)-sorted for row-group
    pruning on the probe's term filter; ``doclens``: id-sorted."""
    id_col = meta["id_col"]
    seg_p = stage_segment(f"{path}/{_POSTINGS}", tag)
    seg_d = stage_segment(f"{path}/{_DOCLENS}", tag)

    def w_postings() -> None:
        (base.select(F.col(id_col), F.explode("t").alias("term"))
         .groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
         .repartition("term")
         .sortWithinPartitions("term", id_col)
         .write.mode("overwrite").parquet(seg_p))

    def w_doclens() -> None:
        (base.select(id_col, F.size("t").alias("dl"))
         .sortWithinPartitions(id_col)
         .write.mode("overwrite").parquet(seg_d))

    # both tables derive from the one tokenize pass and share no other
    # lineage — overlap the two write jobs (round-11, guide §2.6)
    index_base.stage_concurrently(w_postings, w_doclens)
    return {_POSTINGS: [seg_p], _DOCLENS: [seg_d]}


def build_bm25_index(docs: DataFrame, path: str, text_col: str = "text",
                     id_col: str = "doc_id") -> dict:
    """Create the index: one corpus tokenize pass -> postings + doclens,
    visible in one atomic manifest bump."""
    meta = {"text_col": text_col, "id_col": id_col,
            "k1": BM25_K1, "b": BM25_B}
    Path(path).mkdir(parents=True, exist_ok=True)
    staged = _stage_tables(_tokenized(docs, meta), path, meta, "base")
    write_meta(path, meta)   # mirror; the manifest copy is authoritative
    commit(path, replaces=staged, meta=meta)
    index_base.gc_unreferenced(path)
    return meta


def append_bm25_index(new_docs: DataFrame, path: str,
                      tag: "str | None" = None) -> dict:
    """Tokenize ONLY the delta and commit its postings/doclens segments
    in one bump — append cost tracks delta size (the index is never
    read). Per-(term, doc) tf rows from different segments never
    collide because a doc lives in exactly one delta. ``tag``: the
    concurrent-appender lever (ADVICE r10) — distinct explicit tags for
    concurrent writers, deterministic default for a single writer."""
    from insight_de_smart_grid_spark.operators.index_manifest import (
        ManifestConflict,
    )

    for _ in range(5):
        meta, guard = index_base.snapshot_meta(path)
        t = tag or next_tag(path, "a")
        staged = _stage_tables(_tokenized(new_docs, meta), path, meta, t)
        try:
            commit(path, adds=staged, expect_meta=guard)
        except ManifestConflict:
            continue
        return meta
    raise ManifestConflict(
        f"append to {path} lost the geometry race 5 times")


def compact_bm25_index(spark: SparkSession, path: str) -> int:
    """Shared skeleton: rewrite both tables to one sorted segment each,
    physically dropping tombstoned docs and clearing the tombstones in
    the same atomic replace; conflict-retry absorbs racing appends."""
    meta = _read_meta(path)
    id_col = meta["id_col"]

    def rw_postings(df: DataFrame, seg: str) -> None:
        (df.repartition("term").sortWithinPartitions("term", id_col)
         .write.mode("overwrite").parquet(seg))

    def rw_doclens(df: DataFrame, seg: str) -> None:
        (df.sortWithinPartitions(id_col)
         .write.mode("overwrite").parquet(seg))

    index_base.compact_tables(
        spark, path, {_POSTINGS: rw_postings, _DOCLENS: rw_doclens},
        tombstone_col=id_col)
    return live_file_count(path, (_POSTINGS, _DOCLENS))


def delete_from_bm25_index(spark: SparkSession, path: str, ids,
                           tag: "str | None" = None) -> dict:
    """Tombstone documents: one tiny id segment, one bump. Queries
    exclude the docs immediately AND recompute N/avgdl/df without them —
    BM25's global statistics must shrink with the corpus, which is the
    part a candidate-only mask would get wrong."""
    return index_base.delete_ids(spark, path, ids,
                                 _read_meta(path)["id_col"], tag)


def query_bm25_index(spark: SparkSession, path: str,
                     query_terms: tuple = ("spark", "window", "join"),
                     k: int = 15,
                     pin_id: "str | None" = None) -> DataFrame:
    """Okapi BM25 top-k off the persisted postings — row-identical to
    the inline ``text.bm25_topk`` over the same corpus (shares its
    oracle verbatim), but the per-query work is the TERMS' row groups:
    the ``term IN (...)`` filter pushes into the sorted postings scan
    (row-group min/max pruning), doclens is a narrow id->dl scan, and
    the one-row (N, avgdl) aggregate broadcasts. No corpus re-tokenize,
    no index-side shuffle beyond the candidate-bounded df window."""
    meta = _read_meta(path, pin_id)
    id_col = meta["id_col"]
    dl = index_base.subtract_tombstoned(
        spark, path, _read_table(spark, path, _DOCLENS, pin_id),
        [id_col], pin_id)
    # stats AFTER the tombstone subtraction: deletes shrink N and move
    # avgdl — frozen or pre-delete stats would mis-score every query
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    cand = index_base.subtract_tombstoned(
        spark, path,
        _read_table(spark, path, _POSTINGS, pin_id)
        .filter(F.col("term").isin(list(query_terms))),
        [id_col], pin_id)
    w_term = Window.partitionBy("term")
    scored = (cand.withColumn("df", F.count(F.lit(1)).over(w_term))
              .join(dl, id_col).join(F.broadcast(stats))
              .withColumn("idf", F.log(
                  1 + (F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5)))
              .withColumn("s", F.col("idf") * F.col("tf")
                          * (meta["k1"] + 1)
                          / (F.col("tf") + meta["k1"]
                             * (1 - meta["b"]
                                + meta["b"] * F.col("dl")
                                / F.col("avgdl")))))
    return (scored.groupBy(id_col)
            .agg(F.round(F.sum("s"), 6).alias("bm25"),
                 F.count(F.lit(1)).cast("int").alias("n_terms_hit"))
            .orderBy(F.desc("bm25"), F.asc(id_col))
            .limit(k))
