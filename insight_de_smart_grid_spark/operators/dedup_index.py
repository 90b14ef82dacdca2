"""Persisted, incrementally-maintainable MinHash-LSH dedup index (round-8).

The repo's near-dup family (``operators/dedup.py``) computes MinHash band
signatures inline per query — correct, but at 100 TB the band table is a
PERSISTED index: a continuously-curated corpus appends new documents daily
and must near-dup-check each delta against everything already ingested
without re-shingling the corpus. This module gives the MinHash side the
same lifecycle round-8 gave the ANN side (``operators/ann_index.py``):

- ``build_dedup_index``: one corpus pass (the shared
  ``signature_shingle_sets`` aggregation — one shuffle, two outputs) ->
  two parquet tables under ``path``:

  * ``bands/`` — long-format band buckets ``(band_idx, p0..p{w-1},
    doc_id)`` from the SAME ``banded_signatures`` packing the inline
    candidate join uses, partitioned by ``band_idx`` (directory pruning)
    and sorted by the packed keys within each file (parquet row-group
    min/max stats prune bucket probes);
  * ``docs/`` — ``(doc_id, shingles, n_sh)``: each doc's distinct 60-bit
    shingle-hash set, so the candidate-bounded exact-Jaccard verify runs
    entirely index-side — the raw corpus text is never re-read.

  ``meta.json`` freezes the geometry (n_hashes/bands/ngram and the
  packed-key width): appended signatures must band identically or buckets
  from different geometries would silently never collide.
- ``append_dedup_index``: shingle + sign ONLY the delta and append its
  file sets under the same layout — the job's input is the delta frame,
  the index is never read (plan-asserted in tests), so append cost tracks
  delta size, not corpus size.
- ``compact_dedup_index``: rewrite the accumulated small file sets (one
  per append) back to one sorted set per band partition, swapping
  directories only after the rewrite commits.
- ``index_near_dup_pairs``: the full verified near-dup pair query over
  the persisted tables — row-identical to ``minhash_lsh_near_dups`` over
  the same corpus at the same geometry, which is what lets the registered
  append query share ``minhash_lsh_oracle_sql`` verbatim.
- ``dedup_new_against_index``: the incremental-ingest query — a small
  delta's band buckets BROADCAST against the big persisted band table
  (the index side is a pruned scan + stream-side of a broadcast hash
  join: no index shuffle), verified with exact Jaccard from the delta's
  own shingles and the index's stored ``docs/`` sets.

The reference has no index maintenance at all (its analog is Druid
segment rebuild, ``batch_processing/druid_batch.py``); this is an
extension beyond parity, same as the rest of the dedup surface.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from insight_de_smart_grid_spark.operators.dedup import (
    banded_signatures,
    packed_band_width,
    signature_shingle_sets,
)

_META = "meta.json"
_BANDS = "bands"
_DOCS = "docs"


def _read_meta(path: str) -> dict:
    return json.loads(Path(path, _META).read_text())


def _p_cols(meta: dict) -> list[str]:
    return [f"p{j}" for j in range(meta["n_packed"])]


def _write_tables(sig: DataFrame, path: str, meta: dict, mode: str) -> None:
    """Write both index tables from one (persisted) signature frame.

    ``bands/``: one sorted file set per band partition — ``band_idx``
    directory pruning for probes, packed keys sorted within each file so
    parquet row-group min/max stats skip non-matching buckets.
    ``docs/``: the verify sets, sorted by doc_id for row-group pruning on
    the candidate join."""
    id_col = meta["id_col"]
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        (sig.select(F.col(id_col), F.col("shingles"),
                    F.size("shingles").alias("n_sh"))
         .sortWithinPartitions(id_col)
         .write.mode(mode).parquet(f"{path}/{_DOCS}"))
        (banded_signatures(sig, meta["n_hashes"], meta["bands"], id_col)
         .repartition("band_idx")
         .sortWithinPartitions("band_idx", *_p_cols(meta))
         .write.mode(mode).partitionBy("band_idx")
         .parquet(f"{path}/{_BANDS}"))
    finally:
        sig.unpersist()


def build_dedup_index(docs: DataFrame, path: str, n_hashes: int = 32,
                      bands: int = 8, ngram: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> dict:
    """Create the index at ``path`` from the corpus; returns the frozen
    meta. The geometry (and therefore the band/bucket space) is fixed for
    the index's lifetime — changing it is a rebuild."""
    meta = {"n_hashes": n_hashes, "bands": bands, "ngram": ngram,
            "text_col": text_col, "id_col": id_col,
            "n_packed": packed_band_width(n_hashes, bands)}
    sig = signature_shingle_sets(docs, n_hashes, ngram, text_col, id_col)
    Path(path).mkdir(parents=True, exist_ok=True)
    _write_tables(sig, path, meta, "overwrite")
    Path(path, _META).write_text(json.dumps(meta, indent=1) + "\n")
    return meta


def append_dedup_index(new_docs: DataFrame, path: str) -> dict:
    """Append a delta's signatures + verify sets under the creation-time
    geometry. The job reads ONLY ``new_docs`` — never the existing index
    and never the historical corpus — so append cost tracks delta size.
    Callers de-duplicating on ingest run ``dedup_new_against_index``
    BEFORE appending (the delta is checked against the index as-of its
    arrival, then becomes part of the index for the next delta)."""
    meta = _read_meta(path)
    sig = signature_shingle_sets(new_docs, meta["n_hashes"], meta["ngram"],
                                 meta["text_col"], meta["id_col"])
    _write_tables(sig, path, meta, "append")
    return meta


def compact_dedup_index(spark: SparkSession, path: str) -> int:
    """Rewrite both tables (creation file sets + one per append) back to
    one sorted file set per band partition / docs table; returns the
    parquet file count after compaction. Each rewrite lands in a sibling
    directory and swaps in only after the write commits, so a reader
    never sees a partial index."""
    meta = _read_meta(path)
    for sub, writer in (
        (_DOCS, lambda df, dest: (df.sortWithinPartitions(meta["id_col"])
                                  .write.mode("overwrite").parquet(dest))),
        (_BANDS, lambda df, dest: (df.repartition("band_idx")
                                   .sortWithinPartitions("band_idx",
                                                         *_p_cols(meta))
                                   .write.mode("overwrite")
                                   .partitionBy("band_idx").parquet(dest))),
    ):
        cur = f"{path}/{sub}"
        tmp, old = f"{cur}__compacting", f"{cur}__old"
        writer(spark.read.parquet(cur), tmp)
        os.rename(cur, old)
        os.rename(tmp, cur)
        shutil.rmtree(old)
    return sum(1 for sub in (_DOCS, _BANDS)
               for _ in Path(path, sub).rglob("*.parquet"))


def scheduled_ingest_dedup(spark: SparkSession, docs: DataFrame,
                           base_dir: str, n_batches: int = 4,
                           threshold: float = 0.5,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           compact_every: "int | None" = None) -> DataFrame:
    """The index's whole lifecycle as one scheduled-ingest loop — the
    reference's Airflow-triggered micro-batch mode
    (``airflow_schedule/`` DAGs; SURVEY ST5) recast as corpus curation.
    The corpus arrives as ``n_batches`` deterministic hash slices,
    replayed in order; each batch is near-dup-checked (a) WITHIN itself
    via the inline MinHash pipeline and (b) against the index of
    everything ingested before it, then appended to the index for the
    next batch. Each batch's pairs are materialized to a parquet sink
    when the batch runs (a real scheduled job commits its output — and
    lazy probes would otherwise re-read the index AFTER later appends,
    double-counting cross-batch pairs).

    The union over batches is EXACTLY the full-corpus pair set — a pair
    within one slice comes from (a), a pair spanning two slices from (b)
    when the later slice arrives — so the loop registers against the same
    DuckDB oracle as the inline full-corpus pipeline: nothing is lost or
    duplicated by incremental ingest.

    ``compact_every=k`` folds maintenance into the schedule: after every
    k-th batch the accumulated per-append file sets are rewritten to one
    sorted set per band partition (atomic swap) — results are invariant
    (pinned in tests), only the file count changes, which is the policy a
    real daily-ingest job runs so probe-side file listings stay flat."""
    from insight_de_smart_grid_spark.operators.dedup import (
        minhash_pairs_from_sigs,
    )
    from insight_de_smart_grid_spark.operators.pipeline import _hash_bucket

    idx_path = f"{base_dir}/index"
    pairs_dir = f"{base_dir}/pairs"
    bucket = _hash_bucket(F.col(id_col).cast("string"))
    meta = {"n_hashes": 32, "bands": 8, "ngram": 3,
            "text_col": text_col, "id_col": id_col,
            "n_packed": packed_band_width(32, 8)}
    step = 100 // n_batches
    for i in range(n_batches):
        lo, hi = i * step, (i + 1) * step if i < n_batches - 1 else 100
        batch = docs.filter((bucket >= lo) & (bucket < hi))
        # ONE shingle pass per batch serves all three consumers: the
        # in-batch pair check, the probe against the standing index, and
        # the batch's own append
        sig = signature_shingle_sets(batch, meta["n_hashes"],
                                     meta["ngram"], text_col, id_col)
        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            (minhash_pairs_from_sigs(sig, meta["n_hashes"], meta["bands"],
                                     threshold, id_col)
             .write.mode("append").parquet(pairs_dir))
            if i:
                (_probe_with_sigs(spark, idx_path, sig, threshold, meta)
                 .write.mode("append").parquet(pairs_dir))
            _write_tables(sig, idx_path, meta,
                          "append" if i else "overwrite")
            if i == 0:
                Path(idx_path, _META).write_text(
                    json.dumps(meta, indent=1) + "\n")
        finally:
            sig.unpersist()
        if compact_every and (i + 1) % compact_every == 0:
            compact_dedup_index(spark, idx_path)
    return spark.read.parquet(pairs_dir)


def streaming_ingest_dedup(spark: SparkSession, docs: DataFrame,
                           base_dir: str, n_files: int = 4,
                           threshold: float = 0.5,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """``scheduled_ingest_dedup`` driven by REAL Structured Streaming
    micro-batches: the corpus is staged as ``n_files`` parquet files, a
    file-source stream with ``maxFilesPerTrigger=1`` delivers one file
    per micro-batch under ``availableNow``, and ``foreachBatch`` runs the
    same single-shingle-pass batch body (in-batch pairs, probe against
    the standing index, append). The first non-empty batch creates the
    index.

    Correctness does NOT depend on which docs land in which micro-batch:
    the committed union is the full-corpus pair set for ANY disjoint
    slicing (the two-batchings contract pinned in tests), which is what
    makes a file-source's unspecified file->batch assignment safe to
    register against the same DuckDB oracle as the inline pipeline.
    Per-batch pair output lands in its own ``b{batch_id}`` directory with
    overwrite, so a replayed pairs write is idempotent; a crash BETWEEN
    the pairs write and the index append is the one non-idempotent window
    — on a real deployment the index append is a transactional MERGE
    (Delta/Iceberg), same as the ``upsert_compaction_stream`` note."""
    from insight_de_smart_grid_spark.operators.dedup import (
        minhash_pairs_from_sigs,
    )

    staging = f"{base_dir}/staged"
    idx_path = f"{base_dir}/index"
    pairs_dir = f"{base_dir}/pairs"
    docs.repartition(n_files).write.mode("overwrite").parquet(staging)
    meta = {"n_hashes": 32, "bands": 8, "ngram": 3,
            "text_col": text_col, "id_col": id_col,
            "n_packed": packed_band_width(32, 8)}

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sig = signature_shingle_sets(batch_df, meta["n_hashes"],
                                     meta["ngram"], text_col, id_col)
        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            batch_pairs = minhash_pairs_from_sigs(
                sig, meta["n_hashes"], meta["bands"], threshold, id_col)
            first = not Path(idx_path, _META).exists()
            if not first:
                batch_pairs = batch_pairs.unionByName(
                    _probe_with_sigs(spark, idx_path, sig, threshold,
                                     meta))
            (batch_pairs.write.mode("overwrite")
             .parquet(f"{pairs_dir}/b{batch_id}"))
            _write_tables(sig, idx_path, meta,
                          "overwrite" if first else "append")
            if first:
                Path(idx_path, _META).write_text(
                    json.dumps(meta, indent=1) + "\n")
        finally:
            sig.unpersist()

    schema = spark.read.parquet(staging).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("maxFilesPerTrigger", "1").load(staging))
    q = (stream.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", f"{base_dir}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(f"{pairs_dir}/b*")


def _verify_pairs(cand: DataFrame, docs_a: DataFrame, docs_b: DataFrame,
                  threshold: float, id_col: str) -> DataFrame:
    """Exact-Jaccard verify of candidate (doc_a, doc_b) pairs from the
    two sides' stored shingle sets — cost bounded by the candidate count,
    the property that makes the LSH family the 100 TB path."""
    sa = docs_a.select(F.col(id_col).alias("doc_a"),
                       F.col("shingles").alias("sh_a"))
    sb = docs_b.select(F.col(id_col).alias("doc_b"),
                       F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", inter.cast("double") / union)
            .filter(F.col("jaccard") >= F.lit(threshold))
            .select("doc_a", "doc_b", "jaccard"))


def index_near_dup_pairs(spark: SparkSession, path: str,
                         threshold: float = 0.5) -> DataFrame:
    """Verified near-dup pairs over the whole persisted index: band-bucket
    self-join on the packed keys (same candidacy as
    ``lsh_candidate_pairs``), exact-Jaccard verify from the stored
    ``docs/`` sets. Row-identical to ``minhash_lsh_near_dups`` over the
    same corpus at the same geometry."""
    meta = _read_meta(path)
    id_col = meta["id_col"]
    bands_tbl = spark.read.parquet(f"{path}/{_BANDS}")
    a, b = bands_tbl.alias("a"), bands_tbl.alias("b")
    cond = (F.col("a.band_idx") == F.col("b.band_idx")) \
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for p in _p_cols(meta):
        cond = cond & (F.col(f"a.{p}") == F.col(f"b.{p}"))
    cand = (a.join(b, cond)
            .select(F.col(f"a.{id_col}").alias("doc_a"),
                    F.col(f"b.{id_col}").alias("doc_b"))
            .distinct())
    docs_tbl = spark.read.parquet(f"{path}/{_DOCS}")
    return _verify_pairs(cand, docs_tbl, docs_tbl, threshold, id_col)


def dedup_new_against_index(spark: SparkSession, path: str,
                            new_docs: DataFrame,
                            threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs between an incoming delta and the persisted index —
    the incremental-ingest query. The delta's band buckets and shingle
    sets are computed once (never touching the index); the candidate join
    BROADCASTS the small delta against the big band table, so the index
    side is a pruned scan streamed through a broadcast hash join — no
    index-side shuffle — and the verify joins broadcast the
    candidate-bounded small sides into the ``docs/`` scan. Pairs are
    returned (least, greatest)-normalized so the output matches the
    inline pipeline's ``doc_a < doc_b`` convention."""
    meta = _read_meta(path)
    # lazily recomputed for the bands and the verify sets (two uses), like
    # the inline pipeline's sig_sets — the function stays pure-lazy so the
    # caller decides whether the delta pass is worth persisting
    sig = signature_shingle_sets(new_docs, meta["n_hashes"], meta["ngram"],
                                 meta["text_col"], meta["id_col"])
    return _probe_with_sigs(spark, path, sig, threshold, meta)


def _probe_with_sigs(spark: SparkSession, path: str, sig: DataFrame,
                     threshold: float, meta: dict) -> DataFrame:
    """The probe body over a precomputed delta ``(id, shingles, mh..)``
    frame — shared by the one-shot probe and the scheduled-ingest loop
    (which pays the delta's shingle pass once for probe + append)."""
    id_col = meta["id_col"]
    delta_bands = (banded_signatures(sig, meta["n_hashes"], meta["bands"],
                                     id_col)
                   .withColumnRenamed(id_col, "new_id"))
    idx_bands = spark.read.parquet(f"{path}/{_BANDS}")
    cand = (idx_bands.join(F.broadcast(delta_bands),
                           ["band_idx", *_p_cols(meta)])
            .filter(F.col(id_col) != F.col("new_id"))
            .select(F.least(id_col, "new_id").alias("doc_a"),
                    F.greatest(id_col, "new_id").alias("doc_b"),
                    F.col(id_col).alias("idx_id"),
                    F.col("new_id"))
            .distinct())
    delta_docs = sig.select(F.col(id_col).alias("new_id"),
                            F.col("shingles").alias("sh_new"))
    idx_docs = spark.read.parquet(f"{path}/{_DOCS}")
    sh_idx = idx_docs.select(F.col(id_col).alias("idx_id"),
                             F.col("shingles").alias("sh_idx"))
    inter = F.size(F.array_intersect("sh_new", "sh_idx"))
    union = F.size("sh_new") + F.size("sh_idx") - inter
    return (sh_idx.join(F.broadcast(cand.join(delta_docs, "new_id")),
                        "idx_id")
            .withColumn("jaccard", inter.cast("double") / union)
            .filter(F.col("jaccard") >= F.lit(threshold))
            .select("doc_a", "doc_b", "jaccard")
            .distinct())
