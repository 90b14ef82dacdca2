"""Persisted, incrementally-maintainable IVF index (round-9).

Third persisted index family, beside the MinHash dedup index
(``operators/dedup_index.py``) and the hyperplane ANN index
(``operators/ann_index.py``): the inverted-file layout every production
vector store ships (FAISS IVF — public design) expressed as parquet +
partition pruning.

- ``build_ivf_index``: freeze the coarse quantizer at creation — the
  deterministic ``ivf_portable_topk`` quantizer (centroids = the first
  ``n_centroids`` corpus vectors by id; quantizer QUALITY is irrelevant
  to the maintenance/pruning contracts exercised here, and determinism
  is what lets the index share the inline query's DuckDB twin verbatim)
  — then write two tables under the manifest protocol
  (``operators/index_manifest.py``):

  * ``centroids/`` — the ``n_centroids`` frozen (c_id, cv) rows. This
    IS the geometry (the meta.json analog, k rows of it): appends read
    it and nothing else.
  * ``lists/`` — the inverted lists ``(id, v)`` PARTITIONED BY
    ``cluster``: each vector stored once, in its one assigned list —
    IVF is naturally a single-copy index.

- ``append_ivf_index``: assign ONLY the delta against the frozen
  centroid broadcast (never re-derives centroids — re-deriving is what
  a rebuild is for; a drifted quantizer would strand existing vectors
  in stale lists) and commit the delta's list segments with one atomic
  manifest bump.
- ``compact_ivf_index``: rewrite accumulated segments to one sorted
  segment, manifest replace, GC — same lifecycle as the other families.
- ``query_ivf_topk``: rank the ``n_centroids`` frozen centroids against
  the query (one k-row job), collect the ``nprobe`` winning cluster ids
  (driver-bounded: nprobe ints — the ``query_buckets`` pattern), and
  push ``cluster IN (...)`` into the lists scan: PartitionFilters prune
  the directory tree to nprobe/n_centroids of the corpus — the IVF
  scale contract, visible in the physical plan (plan-asserted). Exact
  cosine re-rank inside the probed lists only. Built on the same
  corpus, rows equal the inline ``ivf_portable_topk`` — which is what
  lets the registered maintenance query share
  ``ivf_portable_topk_oracle_sql`` verbatim.

The reference has no vector surface at all; this extends the round-8/9
index story to the quantizer-based family (SURVEY's similarity-search
extension block).
"""

from __future__ import annotations

import json
from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators.index_manifest import (
    commit,
    data_bearing,
    gc_unreferenced,
    live_segments,
    read_manifest,
    stage_segment,
)
from insight_de_smart_grid_spark.operators.similarity import _dot, _norm

_META = "meta.json"
_CENTS = "centroids"
_LISTS = "lists"


def _read_meta(path: str) -> dict:
    return json.loads(Path(path, _META).read_text())


def _read_table(spark: SparkSession, path: str, table: str) -> DataFrame:
    segs = data_bearing(live_segments(path, table))
    if not segs:
        raise FileNotFoundError(f"index table {table} has no live "
                                f"segments under {path}")
    return reduce(DataFrame.unionByName,
                  [spark.read.parquet(s) for s in segs])


def _nonzero(embeddings: DataFrame, vec_col: str,
             id_col: str) -> DataFrame:
    """Zero-norm vectors have no cosine direction (0/0 scores differ per
    engine) — excluded outright, mirrored in the shared oracle."""
    return (embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .filter(_norm(F.col("v")) > 0))


def _assign(emb: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest frozen centroid per vector: broadcast the k-row centroid
    table, rounded cosine + c_id tie-break (deterministic cross-engine —
    the exact ``ivf_portable_topk`` assignment)."""
    scored = (emb.join(F.broadcast(cents))
              .withColumn("c_sim",
                          F.round(_dot(F.col("v"), F.col("cv"))
                                  / (_norm(F.col("v"))
                                     * _norm(F.col("cv"))), 6)))
    w = Window.partitionBy(id_col).orderBy(F.desc("c_sim"), F.asc("c_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("c_id").alias("cluster"), id_col, "v"))


def _stage_lists(assigned: DataFrame, path: str, id_col: str,
                 tag: str) -> dict:
    seg = stage_segment(f"{path}/{_LISTS}", tag)
    (assigned.repartition("cluster")
     .sortWithinPartitions("cluster", id_col)
     .write.mode("overwrite").partitionBy("cluster").parquet(seg))
    return {_LISTS: [seg]}


def build_ivf_index(embeddings: DataFrame, path: str,
                    n_centroids: int = 16, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> dict:
    """Create the index at ``path``; the centroid set is frozen for the
    index's lifetime (stored as the ``centroids/`` table — the geometry
    appends read, and the only thing they read)."""
    emb = _nonzero(embeddings, vec_col, id_col)
    cents = (emb.filter(F.col(id_col) < n_centroids)
             .select(F.col(id_col).alias("c_id"), F.col("v").alias("cv")))
    Path(path).mkdir(parents=True, exist_ok=True)
    seg_c = stage_segment(f"{path}/{_CENTS}", "base")
    cents.coalesce(1).write.mode("overwrite").parquet(seg_c)
    staged = _stage_lists(_assign(emb, cents, id_col), path, id_col,
                          "base")
    meta = {"n_centroids": n_centroids, "vec_col": vec_col,
            "id_col": id_col}
    Path(path, _META).write_text(json.dumps(meta, indent=1) + "\n")
    commit(path, replaces={**staged, _CENTS: [seg_c]})
    gc_unreferenced(path)
    return meta


def append_ivf_index(new_vectors: DataFrame, path: str) -> dict:
    """Assign a delta against the FROZEN centroids and commit its list
    segments in one manifest bump. The job reads the delta plus the
    k-row centroid table — never the inverted lists (plan-asserted), so
    append cost tracks delta size."""
    meta = _read_meta(path)
    spark = new_vectors.sparkSession
    man = read_manifest(path)
    tag = f"a{(man['version'] if man else 0) + 1:06d}"
    emb = _nonzero(new_vectors, meta["vec_col"], meta["id_col"])
    cents = _read_table(spark, path, _CENTS)
    staged = _stage_lists(_assign(emb, cents, meta["id_col"]), path,
                          meta["id_col"], tag)
    commit(path, adds=staged)
    return meta


def compact_ivf_index(spark: SparkSession, path: str) -> int:
    """Rewrite the accumulated list segments to one sorted segment per
    cluster partition; manifest replace + GC. Centroids are immutable
    (one k-row segment for the index's lifetime)."""
    meta = _read_meta(path)
    man = read_manifest(path)
    tag = f"c{(man['version'] if man else 0) + 1:06d}"
    seg = stage_segment(f"{path}/{_LISTS}", tag)
    (_read_table(spark, path, _LISTS)
     .repartition("cluster")
     .sortWithinPartitions("cluster", meta["id_col"])
     .write.mode("overwrite").partitionBy("cluster").parquet(seg))
    commit(path, replaces={_LISTS: [seg]})
    gc_unreferenced(path, [_LISTS])
    return sum(1 for t in (_CENTS, _LISTS)
               for s in live_segments(path, t)
               for _ in Path(s).rglob("*.parquet"))


def query_ivf_topk(spark: SparkSession, path: str, query_vec,
                   k: int = 10, nprobe: int = 4,
                   exclude_id: "int | None" = None) -> DataFrame:
    """Top-k by exact cosine inside the ``nprobe`` nearest inverted
    lists. Probe selection runs over the k-row centroid table (same
    rounded-cosine + c_id ordering as the oracle) and collects nprobe
    ints to the driver — bounded, the ``query_buckets`` pattern — so the
    lists scan carries a static ``cluster IN (...)`` predicate and
    PartitionFilters prune the directory tree to nprobe/n_centroids of
    the corpus (plan-asserted). Rows equal ``ivf_portable_topk`` over
    the creation corpus at the same (n_centroids, nprobe)."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = _read_table(spark, path, _CENTS)
    probes = [r.c_id for r in
              (cents.withColumn(
                  "q_sim", F.round(_dot(qv, F.col("cv"))
                                   / (_norm(qv) * _norm(F.col("cv"))), 6))
               .orderBy(F.desc("q_sim"), F.asc("c_id")).limit(nprobe)
               .select("c_id").collect())]
    meta = _read_meta(path)
    id_col = meta["id_col"]
    lists = (_read_table(spark, path, _LISTS)
             .filter(F.col("cluster").isin(probes)))
    if exclude_id is not None:
        lists = lists.filter(F.col(id_col) != exclude_id)
    return (lists.select(
        F.col(id_col),
        F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * _norm(qv)),
                6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k))


# Same driver-OOM sizing as the other families' batched probes.
BROADCAST_QUERY_MAX_ROWS = 1_000_000


def query_ivf_batch_topk(spark: SparkSession, path: str,
                         queries: DataFrame, k: int = 10,
                         nprobe: int = 4, exclude_self: bool = True,
                         mode: str = "auto",
                         broadcast_threshold: int =
                         BROADCAST_QUERY_MAX_ROWS) -> DataFrame:
    """Top-k for a WHOLE DELTA of query vectors in one job — the IVF
    analog of ``ann_index.query_index_batch_topk``. Each query's nprobe
    probe list comes from the frozen k-row centroid broadcast (same
    rounded-cosine + c_id ordering as the single-query probe and the
    oracle); the UNION of probed cluster ids — bounded by n_centroids
    regardless of Q — is collected and pushed into the lists scan as a
    static ``cluster IN (...)`` (PartitionFilters prune the directory
    tree), and the per-query probe set joins the pruned lists for the
    exact cosine re-rank, ``row_number``-ranked per query. ``mode``
    picks broadcast vs SHUFFLE_HASH for the probe-set join by the delta
    row count (the dedup probe's lever). Per query id, rows equal
    ``query_ivf_topk`` at the same (n_centroids, nprobe) — pinned in
    tests and by the registered ``sim_ivf_index_batch_probe`` oracle.

    Output: (query_id, <id_col>, cos_sim), k rows per query."""
    meta = _read_meta(path)
    id_col = meta["id_col"]
    if mode == "auto":
        mode = ("broadcast"
                if queries.count() <= broadcast_threshold else "shuffle")
    small = F.broadcast if mode == "broadcast" \
        else (lambda df: df.hint("SHUFFLE_HASH"))
    emb_q = (_nonzero(queries, meta["vec_col"], id_col)
             .select(F.col(id_col).alias("query_id"),
                     F.col("v").alias("qv")))
    cents = _read_table(spark, path, _CENTS)
    wq = Window.partitionBy("query_id").orderBy(F.desc("q_sim"),
                                                F.asc("c_id"))
    probe = (emb_q.join(F.broadcast(cents))
             .withColumn("q_sim",
                         F.round(_dot(F.col("qv"), F.col("cv"))
                                 / (_norm(F.col("qv"))
                                    * _norm(F.col("cv"))), 6))
             .withColumn("rn", F.row_number().over(wq))
             .filter(F.col("rn") <= nprobe)
             .select("query_id", "qv", F.col("c_id").alias("cluster")))
    # the probed-cluster union is bounded by n_centroids however large
    # the delta is — a driver-safe collect that buys PartitionFilters
    clusters = [r.cluster for r in
                probe.select("cluster").distinct().collect()]
    lists = (_read_table(spark, path, _LISTS)
             .filter(F.col("cluster").isin(clusters)))
    cand = lists.join(small(probe), "cluster")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col(id_col))
    scored = cand.select(
        "query_id", id_col,
        F.round(_dot(F.col("v"), F.col("qv"))
                / (_norm(F.col("v")) * _norm(F.col("qv"))),
                6).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                               F.asc(id_col))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))
