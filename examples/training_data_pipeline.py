"""End-to-end training-data curation walkthrough: the LLM-pipeline surface
of this engine, composed the way a 100 TB pretraining run would use it.

Each stage is a declarative DataFrame plan over the `documents` /
`embeddings` tables (the same operators the registry exposes as oracled
queries), so Catalyst fuses the scoring projections into the scan and each
blocked dedup stage shuffles only narrow (id, hash) rows:

  1. profile          per-source token budget (the data-mixture table)
  2. score + gate     lang-id, quality, fingerprints at scan speed
     2b. train + score  distributed trainer fits the quality classifier
                      (integer-micro GD), then the model scores the corpus
  3. lexical dedup    exact drop + MinHash-LSH near-dup clusters,
                      quality-ranked keeper per cluster
  4. semantic dedup   SemDeDup-style embedding-space collapse
  5. decontaminate    n-gram overlap vs a holdout slice (anti-join keep)
  6. pack + shard     fixed-capacity sequence packing, size-balanced shards

Usage:
    python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators import dedup as dd
from insight_de_smart_grid_spark.operators import pipeline as pl
from insight_de_smart_grid_spark.operators import text as tx
from insight_de_smart_grid_spark.operators.similarity import semantic_dedup
from insight_de_smart_grid_spark.operators.staging import checkpoint_scope
from insight_de_smart_grid_spark.session import get_spark
from insight_de_smart_grid_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="training_data_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # self-contained stages release their staged localCheckpoint blocks
    # (operators/staging.py) as soon as their output is consumed; stages
    # 3a->6 form one dependency chain (lex_kept/clean are re-read
    # downstream), so they share a single scope — releasing mid-chain
    # would drop blocks a truncated lineage can no longer recompute
    with checkpoint_scope(spark):
        print("== 1. corpus profile: per-source token budget ==")
        pl.token_budget_report(docs).orderBy(F.desc("tokens")).show()

    with checkpoint_scope(spark):
        print("== 2. curation gate: lang-id -> quality -> fingerprint "
              "dedup ==")
        tx.curate_corpus(docs).orderBy("source").show()

    with checkpoint_scope(spark):
        print("== 2b. train the quality classifier, then score the "
              "corpus ==")
        trained = tx.train_quality_classifier(docs, epochs=3).collect()[0]
        print(f"   weights (micro-units): bias={trained.w_bias} "
              f"len={trained.w_len} stop={trained.w_stop} "
              f"punct={trained.w_punct} wordlen={trained.w_wordlen}; "
              f"train acc {trained.n_correct}/{trained.n_docs}")
        tx.model_quality_score(docs).orderBy(F.desc("prob")).show(5)

    with checkpoint_scope(spark):
        print("== 3a. exact dedup ==")
        exact_kept = dd.drop_exact_dups(docs)
        print(f"   {docs.count()} -> {exact_kept.count()} docs")

        print("== 3b. near-dup clusters (MinHash-LSH), quality-ranked "
              "keeper ==")
        pairs = dd.minhash_lsh_near_dups(exact_kept, threshold=0.5)
        marked = dd.keep_best_per_cluster(exact_kept, pairs)
        marked.orderBy("cluster_id", F.desc("keep")).show(10)
        lex_kept = (exact_kept.join(
            marked.filter("keep = 0").select("doc_id"), "doc_id",
            "left_anti"))
        print(f"   {exact_kept.count()} -> {lex_kept.count()} docs")

        print("== 4. semantic dedup (SemDeDup over the embedding "
              "table) ==")
        sem = semantic_dedup(emb, threshold=0.95)
        sem.filter("NOT keep").show(10)
        print(f"   semantic drops: {sem.filter('NOT keep').count()}")

        print("== 5. decontamination vs the holdout slice ==")
        contaminated = pl.decontaminate(lex_kept)
        clean = lex_kept.join(contaminated.select("doc_id"), "doc_id",
                              "left_anti")
        print(f"   {lex_kept.count()} -> {clean.count()} docs "
              f"({contaminated.count()} flagged)")

        print("== 6. sequence packing into size-balanced shards ==")
        packed = pl.pack_sequences(clean, capacity=512, n_shards=8)
        (packed.groupBy("shard")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("n_tokens").alias("tokens"),
              F.max("seq_idx").alias("max_seq"))
         .orderBy("shard").show())

    print("pipeline complete.")


if __name__ == "__main__":
    main()
