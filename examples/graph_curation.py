"""Graph-analytics curation walkthrough: the kNN-graph operator family
composed as a corpus-understanding pass — build the similarity graph once,
then read three curation signals off it:

  1. kNN graph            LSH-blocked candidates, exact cosine verify
                          (the persisted index at cluster scale)
  2. PageRank             integer micro-unit centrality — canonical-doc /
                          outlier signal (high rank = representative)
  3. label propagation    clamped seeds + majority votes — spread a small
                          labeled set across the unlabeled corpus
  4. cross-modal keeper   SemDeDup clusters (embedding side) with the
                          quality-ranked survivor (text side)

All four are the same operators the registry exposes as oracled queries
(`sim_knn_graph`, `sim_pagerank`, `sim_label_propagation`,
`dedup_semantic_keep_best`).

Usage:
    python examples/graph_curation.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators import similarity as sim
from insight_de_smart_grid_spark.operators.staging import checkpoint_scope
from insight_de_smart_grid_spark.session import get_spark
from insight_de_smart_grid_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="graph_curation")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # every stage fully consumes its result (show/count) inside a
    # checkpoint_scope, releasing the localCheckpoint blocks the graph
    # operators stage (signature tables, edge lists) before the next
    # stage runs — the consume-then-release contract from
    # operators/staging.py for long-lived driver sessions
    with checkpoint_scope(spark):
        print("== 1. kNN similarity graph (persisted index shape) ==")
        edges = sim.knn_graph(emb, k=3)
        edges.orderBy("anchor_id", "rnk").show(6)

    with checkpoint_scope(spark):
        print("== 2. PageRank centrality (integer micro-units) ==")
        ranks = sim.pagerank_knn(emb)
        print("most central (canonical candidates):")
        ranks.orderBy(F.desc("rank_micro"), "vec_id").show(5)
        print("least central (outlier candidates):")
        ranks.orderBy("rank_micro", "vec_id").show(5)

    with checkpoint_scope(spark):
        print("== 3. Label propagation (20% seeds -> full corpus) ==")
        labels = sim.label_propagation(emb)
        labels.groupBy("origin").count().orderBy("origin").show()

    with checkpoint_scope(spark):
        print("== 4. Cross-modal keeper (semantic cluster + text "
              "quality) ==")
        keepers = sim.semantic_keep_best(docs, emb)
        keepers.groupBy("keep").agg(
            F.count(F.lit(1)).alias("n_docs")).orderBy("keep").show()
        kept = keepers.filter("keep").count()
        total = keepers.count()
        print(f"kept {kept}/{total} docs "
              f"({total - kept} collapsed into semantic clusters)")


if __name__ == "__main__":
    main()
