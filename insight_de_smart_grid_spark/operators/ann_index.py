"""Persisted, incrementally-maintainable ANN signature index.

The repo's hyperplane-LSH family (``operators/similarity.py``) computes
signatures inline per query — correct, but at 100 TB the signature table
is a PERSISTED index. Round 8 added the lifecycle (build / delta-only
append / compact / pushed-down probe); round 9 restructures it around the
two gaps VERDICT r8 ranked highest:

- **One copy of every vector.** The round-8 layout persisted
  ``hyperplane_signatures``' long format ``(id, v, table, bucket)``
  verbatim, so a 16-table index stored 16 copies of every embedding —
  ~16x the corpus on disk at scale. The index is now the same two-table
  split the dedup index uses (``operators/dedup_index.py``):

  * ``bands/`` — ``(bucket, id)`` partitioned by LSH ``table``
    (directory pruning on the probe) and sorted by ``bucket`` within
    each file (parquet row-group min/max stats prune buckets);
  * ``vectors/`` — ``(id, v)`` ONCE, sorted by id (row-group pruning on
    the candidate fetch).

  A probe prunes ``bands/`` down to the k-bounded candidate ids, then
  BROADCASTS that candidate list into the ``vectors/`` scan for the
  exact cosine re-rank — the index side streams through a
  BroadcastHashJoin, never a shuffle (plan-asserted in tests). At
  cluster scale AQE's runtime bloom filter / storage-side Bloom indexes
  prune the vectors scan further; the candidate list is bounded by
  n_tables x bucket occupancy x probe count, driver-safe by the same
  occupancy argument as ``auto_n_planes``.

- **Manifest-pointer commits** (``operators/index_manifest.py``): data
  lands in immutable ``seg-*`` directories; ``MANIFEST.json`` names the
  live set; appends and compactions commit by one atomic manifest
  replace instead of the round-8 ``os.rename`` swap (whose two-rename
  window left the table directory briefly absent, and which object
  stores cannot do atomically at all). A reader sees only the old or
  only the new segment set, never a mix; interrupted maintenance leaves
  only unreferenced orphans that the next ``gc_unreferenced`` removes.

- **Batched multi-query probe** (``query_index_batch_topk``): an ingest
  pipeline ANN-checking a delta of Q vectors runs ONE job — signature
  the delta with the frozen geometry, broadcast its (table, bucket)
  probe set against the pruned bands scan, exact re-rank per query id —
  instead of Q driver-side ``query_index_topk`` loops (the ANN analog of
  ``dedup_new_against_index``).

The reference has no index maintenance at all (its analog is Druid
segment rebuild + metadata store, ``batch_processing/druid_batch.py``);
this is an extension beyond parity, same as the rest of the ANN surface.
"""

from __future__ import annotations

from functools import reduce
from pathlib import Path

import numpy as np
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
    ManifestConflict,
    commit,
    has_mark,
    live_segments,
    stage_segment,
)
from insight_de_smart_grid_spark.operators.similarity import (
    _dot,
    _norm,
    _portable_planes,
    auto_n_planes,
    hyperplane_signatures,
)

_META = index_base.META
_BANDS = "bands"
_VECS = "vectors"
_PROBES = "probes"

# shared lifecycle core (round-10, VERDICT r9 item 6) — the private names
# are kept as the family's API surface (tests and plans read through them)
_read_meta = index_base.read_meta
_read_table = read_table


def _bucket_spec(meta: dict, table: str) -> "dict | None":
    """The bucket layout of ``table`` under a ``layout="bucketed"``
    index, or None for the default partitioned layout: bands bucket on
    the (table, bucket) probe keys, vectors on the id the candidate
    fetch joins — the two joins whose index-side shuffle the layout
    removes in shuffle mode (round-10, VERDICT r9 item 3)."""
    if meta.get("layout") != "bucketed":
        return None
    if table == _BANDS:
        return {"n_buckets": meta["n_buckets"], "keys": ["table", "bucket"]}
    return {"n_buckets": meta["n_buckets"], "keys": [meta["id_col"]]}


def _stage_tables(sig: DataFrame, vectors: DataFrame, path: str,
                  id_col: str, tag: str,
                  meta: "dict | None" = None) -> dict:
    """Write one bands segment + one vectors segment (overwrite mode: a
    retry after a crash-before-commit replaces the orphan) and return the
    staged paths, NOT yet visible to readers."""
    meta = meta or {}
    seg_b = stage_segment(f"{path}/{_BANDS}", tag)
    seg_v = stage_segment(f"{path}/{_VECS}", tag)
    bands_frame = sig.select(F.col(id_col), F.col("table"),
                             F.col("bucket"))
    if meta.get("layout") == "bucketed":
        def w_bands() -> None:
            index_base.write_bucketed_segment(
                bands_frame, seg_b, **_bucket_spec(meta, _BANDS))

        def w_vecs() -> None:
            index_base.write_bucketed_segment(
                vectors, seg_v, **_bucket_spec(meta, _VECS))
    else:
        def w_bands() -> None:
            (bands_frame
             .repartition("table")
             .sortWithinPartitions("table", "bucket")
             .write.mode("overwrite").partitionBy("table").parquet(seg_b))

        # sorted by CONTENT hash, not id: the candidate fetch is a
        # broadcast join (id order buys no pruning there), while content
        # order packs identical/duplicate vectors into adjacent rows where
        # parquet's page compression collapses them — on a duplicate-heavy
        # corpus the id-sorted form measured LARGER than the bucket-sorted
        # round-8 layout, whose sort incidentally adjacency-grouped
        # duplicates
        def w_vecs() -> None:
            (vectors.sortWithinPartitions(F.xxhash64("v"), F.col(id_col))
             .write.mode("overwrite").parquet(seg_v))
    # the two segments share no lineage beyond the batch scan — overlap
    # the fixed-overhead-dominated write jobs (round-11, guide §2.6)
    index_base.stage_concurrently(w_bands, w_vecs)
    return {_BANDS: [seg_b], _VECS: [seg_v]}


def _vectors_frame(embeddings: DataFrame, vec_col: str,
                   id_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))


def build_signature_index(embeddings: DataFrame, path: str,
                          n_tables: int = 16, n_planes: "int | str" = 4,
                          dim: int = 64, vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          auto_occupancy: int = 32,
                          marks: "list[str] | None" = None,
                          layout: str = "partitioned",
                          n_buckets: "int | None" = None) -> dict:
    """Create the index at ``path`` from the full corpus; returns the
    frozen meta. ``n_planes="auto"`` resolves the depth from THIS corpus
    (``auto_n_planes``) and freezes it for the index's lifetime — appends
    reuse the creation-time depth (buckets from different depths are
    incompatible); re-deriving depth is exactly what a REBUILD is for,
    and the meta records ``auto`` so an operator can tell a frozen auto
    index from a hand-pinned one.

    ``layout`` is frozen too: ``"partitioned"`` (default) is the round-9
    directory-partitioned layout (best pruning for single-query and
    broadcast probes); ``"bucketed"`` (round-10, VERDICT r9 item 3)
    bucket-writes bands on (table, bucket) and vectors on the id so a
    ``mode="shuffle"`` batch probe — the multi-GB-delta deployment
    path — shuffles only the delta, never the index side."""
    resolved = n_planes
    if n_planes == "auto":
        resolved = auto_n_planes(embeddings.count(),
                                 target_occupancy=auto_occupancy)
    sig = hyperplane_signatures(embeddings, n_tables, resolved, dim,
                                vec_col=vec_col, id_col=id_col)
    Path(path).mkdir(parents=True, exist_ok=True)
    meta = {"n_tables": n_tables, "n_planes": int(resolved), "dim": dim,
            "vec_col": vec_col, "id_col": id_col,
            "depth_mode": "auto" if n_planes == "auto" else "pinned",
            "layout": layout,
            # bumped by every geometry change (rebuild) so an append's
            # expect_meta guard conflicts even when the swapped-in
            # geometry has identical PARAMETERS (same-depth rebuild:
            # same meta dict, different band contents)
            "geom_epoch": 0}
    if layout == "bucketed":
        # default derives from the corpus size estimate (round-12,
        # VERDICT r11 item 1): buckets sized by bytes, not core count —
        # frozen in meta with the rest of the geometry
        meta["n_buckets"] = (n_buckets if n_buckets is not None
                             else index_base.adaptive_n_buckets(embeddings))
    staged = _stage_tables(sig, _vectors_frame(embeddings, vec_col, id_col),
                           path, id_col, "base", meta)
    write_meta(path, meta)   # human-readable mirror; manifest is authoritative
    # marks and meta ride the SAME bump so a first-batch ingest is atomic
    # with its idempotence record and the geometry is atomic with the
    # segments that encode it
    commit(path, replaces=staged, marks=marks, meta=meta)
    index_base.gc_unreferenced(path)
    return meta


def append_signatures(new_vectors: DataFrame, path: str,
                      tag: "str | None" = None) -> dict:
    """Append a delta under the creation-time geometry. The job reads
    ONLY ``new_vectors`` — never the existing index and never the
    historical corpus (no count(), no auto re-derivation: a frozen auto
    depth stays frozen; rebuild to re-derive). The delta's bands +
    vectors segments are staged under a deterministic per-version tag,
    then made visible by ONE manifest bump — a crash before the bump
    leaves the index unchanged and the retry overwrites the orphan.

    ``tag`` (round-11, ADVICE r10): CONCURRENT appenders must pass
    distinct explicit tags — the version-derived default would stage two
    same-snapshot writers into the same segment directory, silently
    losing one delta. Single writers (and their crash-retries) keep the
    deterministic default.

    The commit carries an ``expect_meta`` guard (round-11): a
    rebuild swapping the LSH geometry between this append's signature
    pass and its commit would leave the delta's bands keyed at the OLD
    depth — silently unfindable under the new one. On conflict the
    append re-reads the geometry and re-signatures."""
    for _ in range(5):
        meta, guard = index_base.snapshot_meta(path)
        t = tag or next_tag(path, "a")
        sig = hyperplane_signatures(new_vectors, meta["n_tables"],
                                    meta["n_planes"], meta["dim"],
                                    vec_col=meta["vec_col"],
                                    id_col=meta["id_col"])
        staged = _stage_tables(
            sig, _vectors_frame(new_vectors, meta["vec_col"],
                                meta["id_col"]),
            path, meta["id_col"], t, meta)
        try:
            commit(path, adds=staged, expect_meta=guard)
        except ManifestConflict:
            continue
        return meta
    raise ManifestConflict(
        f"append to {path} lost the geometry race 5 times")


def compact_signature_index(spark: SparkSession, path: str) -> int:
    """Rewrite the accumulated segments (creation set + one per append)
    back to ONE sorted segment per table; returns the live parquet file
    count after compaction. The rewrite stages a new segment pair, one
    manifest replace makes it live (readers see the old set or the new
    set, never a mix, and the table is never absent — the round-8
    two-rename window is gone), then the superseded segments are GC'd."""
    meta = _read_meta(path)
    id_col = meta["id_col"]

    if meta.get("layout") == "bucketed":
        def rw_bands(df: DataFrame, seg: str) -> None:
            index_base.write_bucketed_segment(
                df, seg, **_bucket_spec(meta, _BANDS))

        def rw_vecs(df: DataFrame, seg: str) -> None:
            index_base.write_bucketed_segment(
                df, seg, **_bucket_spec(meta, _VECS))
    else:
        def rw_bands(df: DataFrame, seg: str) -> None:
            (df.repartition("table")
             .sortWithinPartitions("table", "bucket")
             .write.mode("overwrite").partitionBy("table").parquet(seg))

        def rw_vecs(df: DataFrame, seg: str) -> None:
            (df.sortWithinPartitions(F.xxhash64("v"), F.col(id_col))
             .write.mode("overwrite").parquet(seg))

    index_base.compact_tables(spark, path,
                              {_BANDS: rw_bands, _VECS: rw_vecs},
                              tombstone_col=id_col)
    return live_file_count(path, (_BANDS, _VECS))


def delete_from_signature_index(spark: SparkSession, path: str, ids,
                                tag: "str | None" = None) -> dict:
    """Tombstone vectors (round-11): one tiny id-list segment, one
    manifest bump. Probes anti-join the live tombstones immediately;
    ``compact_signature_index`` physically drops the band rows AND the
    single-copy vectors, clearing the tombstones in the same atomic
    replace — delete + compact equals a rebuild without the deleted
    vectors (the ``sim_ann_index_deleted`` oracle)."""
    return index_base.delete_ids(spark, path, ids,
                                 _read_meta(path)["id_col"], tag)


def index_bytes(path: str) -> int:
    """Total on-disk bytes of the LIVE index (manifest-referenced
    segments only) — the footprint the round-9 size contract asserts on:
    ~1/n_tables of the round-8 layout, because vectors are stored once."""
    return sum(f.stat().st_size
               for t in (_BANDS, _VECS) for seg in live_segments(path, t)
               for f in Path(seg).rglob("*.parquet"))


def query_buckets(query_vec, n_tables: int, n_planes: int,
                  dim: int, probe_radius: int = 0
                  ) -> list[tuple[int, list[int]]]:
    """The (table, [buckets]) probe list for one query — driver-side numpy
    over the same md5-derived plane matrix the index was built with (a
    single matvec; no corpus job just to hash one vector).
    ``probe_radius`` expands each table's bucket to its Hamming-<=r flip
    neighborhood (the multiprobe lever, ``similarity._probe_masks``):
    extra probes buy the recall extra TABLES would, at the same persisted
    index footprint."""
    from insight_de_smart_grid_spark.operators.similarity import (
        _probe_masks,
    )

    planes = _portable_planes(n_tables, n_planes, dim)
    qv = np.asarray(query_vec, dtype=np.float64)
    bits = (planes @ qv > 0).reshape(n_tables, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    masks = _probe_masks(n_planes, probe_radius)
    return [(t, [int(b) ^ m for m in masks])
            for t, b in enumerate((bits * weights).sum(axis=1))]


def query_index_topk(spark: SparkSession, path: str, query_vec,
                     k: int = 10, exclude_id: "int | None" = None,
                     probe_radius: int = 0,
                     pin_id: "str | None" = None) -> DataFrame:
    """Top-k by exact cosine over the index's candidates for one query
    vector. The probe is a pushed-down disjunction of n_tables
    (table = t AND bucket IN (...)) terms over ``bands/`` — partition
    pruning picks the table directories, row-group stats skip
    non-matching buckets — and the resulting k-bounded candidate-id list
    is BROADCAST into the ``vectors/`` scan for the exact re-rank: the
    corpus-sized side of both steps is a pruned scan or the streamed
    side of a broadcast hash join, never shuffled. ``probe_radius=0`` is
    row-identical to ``lsh_ann_topk`` at the same geometry;
    ``probe_radius=r`` probes each table's Hamming-<=r flip neighborhood
    and is row-identical to ``lsh_multiprobe_topk``."""
    meta = _read_meta(path, pin_id)
    id_col = meta["id_col"]
    probes = query_buckets(query_vec, meta["n_tables"], meta["n_planes"],
                           meta["dim"], probe_radius)
    pred = reduce(lambda a, b: a | b,
                  [(F.col("table") == t) & (F.col("bucket").isin(bs))
                   for t, bs in probes])
    cand_ids = (_read_table(spark, path, _BANDS, pin_id)
                .filter(pred).select(id_col).distinct())
    if exclude_id is not None:
        cand_ids = cand_ids.filter(F.col(id_col) != exclude_id)
    # tombstoned ids (round-11) leave the candidate set before the
    # re-rank fetch — applied to the k-bounded id list, the cheapest spot
    cand_ids = index_base.subtract_tombstoned(spark, path, cand_ids,
                                              [id_col], pin_id)
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        _read_table(spark, path, _VECS, pin_id)
        .join(F.broadcast(cand_ids), id_col)
        .select(
            F.col(id_col),
            F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * _norm(qv)),
                    6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _ann_ingest_batch(spark: SparkSession, batch: DataFrame, path: str,
                      meta: dict, k: int, probe_radius: int,
                      tag: str, first: bool) -> None:
    """One ANN ingest step, committed atomically (the dedup loop's
    ``_ingest_batch`` shape): probe the arriving slice against the
    STANDING index with one batched job, stage the probe output AND the
    slice's own bands/vectors segments, publish all three in a single
    manifest bump. A crash anywhere before the bump leaves index and
    probe log unchanged; a replay overwrites the same ``seg-{tag}``
    names and commits once.

    The bump records an idempotence mark for the tag (round-10, ADVICE
    r9): a micro-batch replayed because the crash hit AFTER the commit
    but BEFORE the streaming checkpoint committed is detected and
    skipped outright — without the mark the replay would probe an index
    that already contains the batch itself (rewriting a probe segment
    that differs from the batching contract) and overwrite a live,
    manifest-referenced ``seg-{tag}`` in place."""
    mark = f"ingested-{tag}"
    if has_mark(path, mark):
        return
    if first:
        build_signature_index(batch, path, meta["n_tables"],
                              meta["n_planes"], meta["dim"],
                              vec_col=meta["vec_col"],
                              id_col=meta["id_col"], marks=[mark])
        return
    # signature and stage with the index's FROZEN manifest meta, not the
    # caller's (round-11, ADVICE r10): resuming ingest on a bucketed or
    # differently-parameterized existing index must not mix layouts or
    # geometries — the IVF twin already read the frozen meta
    meta = _read_meta(path)
    probe = query_index_batch_topk(spark, path, batch, k=k,
                                   probe_radius=probe_radius)
    seg_p = stage_segment(f"{path}/{_PROBES}", tag)
    sig = hyperplane_signatures(batch, meta["n_tables"], meta["n_planes"],
                                meta["dim"], vec_col=meta["vec_col"],
                                id_col=meta["id_col"])
    # the probe write reads the index AS-OF now (the staged segments are
    # invisible until the commit below) — overlap it with the batch's
    # own table staging (round-11, guide §2.6)
    _, staged = index_base.stage_concurrently(
        lambda: probe.write.mode("overwrite").parquet(seg_p),
        lambda: _stage_tables(
            sig, _vectors_frame(batch, meta["vec_col"], meta["id_col"]),
            path, meta["id_col"], tag, meta))
    commit(path, adds={**staged, _PROBES: [seg_p]}, marks=[mark])


def ingest_ann_index(spark: SparkSession, embeddings: DataFrame,
                     path: str, n_batches: int = 4, k: int = 5,
                     n_tables: int = 16, n_planes: int = 4, dim: int = 64,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     probe_radius: int = 0) -> DataFrame:
    """The ANN index's whole lifecycle as one scheduled-ingest loop — the
    reference's Airflow micro-batch mode (SURVEY ST5) recast as
    embedding-corpus curation, and the ANN twin of
    ``dedup_index.scheduled_ingest_dedup``. The corpus arrives as
    ``n_batches`` deterministic slices (slice = ``id % n_batches``),
    replayed in slice order; slice 0 creates the index, every later
    slice is ANN-checked against the index of everything ingested BEFORE
    it (one ``query_index_batch_topk`` job — never a per-vector driver
    loop) and then appended, probe output and index segments committed
    in one manifest bump.

    Unlike the dedup loop's pair set, the probe log is batching-
    DEPENDENT by design (each query ranks only earlier arrivals), which
    is why the slices are a static function of the id: the whole loop
    registers against a DuckDB twin that reproduces "earlier slice"
    as ``cand.id % n < query.id % n`` (``ann_index_ingest_oracle_sql``).
    Returns the committed probe log (query_id, id, cos_sim)."""
    Path(path).mkdir(parents=True, exist_ok=True)
    meta = {"n_tables": n_tables, "n_planes": n_planes, "dim": dim,
            "vec_col": vec_col, "id_col": id_col}
    for i in range(n_batches):
        batch = embeddings.filter(
            F.pmod(F.col(id_col), F.lit(n_batches)) == i)
        _ann_ingest_batch(spark, batch, path, meta, k, probe_radius,
                          tag=f"b{i}", first=(i == 0))
    return _read_table(spark, path, _PROBES)


def streaming_ingest_ann(spark: SparkSession, embeddings: DataFrame,
                         base_dir: str, n_batches: int = 4, k: int = 5,
                         n_tables: int = 16, n_planes: int = 4,
                         dim: int = 64, vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         probe_radius: int = 0) -> DataFrame:
    """``ingest_ann_index`` driven by REAL Structured Streaming
    micro-batches: each slice is staged as its own parquet file with
    strictly increasing mtimes (the file source orders batches by
    modification time), a ``maxFilesPerTrigger=1`` stream under
    ``availableNow`` delivers one slice per micro-batch, and
    ``foreachBatch`` runs the same probe-then-append body. Because the
    probe log is batching-dependent, slice order is part of the
    contract — the mtime staging pins it, and the committed log equals
    the scheduled loop's (and the static oracle) exactly."""
    staging = f"{base_dir}/staged"
    idx_path = f"{base_dir}/index"
    Path(idx_path).mkdir(parents=True, exist_ok=True)
    meta = {"n_tables": n_tables, "n_planes": n_planes, "dim": dim,
            "vec_col": vec_col, "id_col": id_col}
    index_base.stage_id_slices(embeddings, staging, n_batches, id_col)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # "first" = no manifest COMMITTED yet (meta alone can predate a
        # crashed build's commit; see dedup_index's streaming twin)
        first = index_base.read_manifest(idx_path) is None
        _ann_ingest_batch(spark, batch_df, idx_path, meta, k,
                          probe_radius, tag=f"b{batch_id}", first=first)

    index_base.run_slice_stream(spark, staging, f"{base_dir}/ck", ingest)
    return _read_table(spark, idx_path, _PROBES)


def index_cosine_pairs(spark: SparkSession, path: str,
                       threshold: float = 0.9,
                       pin_id: "str | None" = None) -> DataFrame:
    """All verified cosine->=threshold pairs over the whole persisted
    index — the ANN twin of ``dedup_index.index_near_dup_pairs`` and the
    index-resident form of ``similarity.cosine_pairs_blocked``: bucket
    self-join over the NARROW bands table per (table, bucket), candidate
    dedup, exact cosine verify from the single-copy ``vectors/`` table
    (the per-bucket pair explosion never carries the vectors — the same
    16-bytes-vs-1-KB-per-row argument as the inline form, now with the
    signatures read from the maintained index instead of recomputed).
    Row-identical to ``cosine_pairs_blocked`` at the creation geometry,
    which is what lets the registered query share
    ``cosine_pairs_oracle_sql`` verbatim."""
    meta = _read_meta(path, pin_id)
    id_col = meta["id_col"]
    bands = _read_table(spark, path, _BANDS, pin_id)
    cands = (bands.alias("sa")
             .join(bands.alias("sb"), ["table", "bucket"])
             .filter(F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}"))
             .select(F.col(f"sa.{id_col}").alias("vec_a"),
                     F.col(f"sb.{id_col}").alias("vec_b"))
             .dropDuplicates(["vec_a", "vec_b"]))
    cands = index_base.subtract_tombstoned(spark, path, cands,
                                           ["vec_a", "vec_b"], pin_id)
    vecs = _read_table(spark, path, _VECS, pin_id)
    ea = vecs.select(F.col(id_col).alias("vec_a"), F.col("v").alias("va"))
    eb = vecs.select(F.col(id_col).alias("vec_b"), F.col("v").alias("vb"))
    raw = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va"))
                                            * _norm(F.col("vb")))
    return (cands.join(ea, "vec_a").join(eb, "vec_b")
            .withColumn("raw_sim", raw)
            .filter(F.col("raw_sim") >= F.lit(threshold))
            .select("vec_a", "vec_b",
                    F.round(F.col("raw_sim"), 6).alias("cos_sim")))


# Above this many query-delta rows the batched probe stops broadcasting
# the delta and switches to SHUFFLE_HASH joins — the same driver-OOM
# argument (and default sizing) as dedup_index.BROADCAST_DELTA_MAX_ROWS.
BROADCAST_QUERY_MAX_ROWS = 1_000_000


def query_index_batch_topk(spark: SparkSession, path: str,
                           queries: DataFrame, k: int = 10,
                           probe_radius: int = 0,
                           exclude_self: bool = True,
                           mode: str = "auto",
                           broadcast_threshold: "int | None" = None,
                           pin_id: "str | None" = None) -> DataFrame:
    """Top-k for a WHOLE DELTA of query vectors in one job — the ANN
    analog of ``dedup_new_against_index`` (VERDICT r8 item 3: an ingest
    pipeline ANN-checking Q vectors must not loop Q driver-side probes).

    ``queries`` carries the index's id/vector columns (meta's ``id_col``
    / ``vec_col``). The delta is signatured with the FROZEN creation
    geometry (never re-derived), each signature expanded to its
    Hamming-<=r probe masks, and the (table, bucket) probe set — delta-
    bounded, like the dedup probe's delta bands — is BROADCAST against
    the bands scan; the matched (query, candidate) pairs then broadcast
    into the ``vectors/`` scan for the exact cosine re-rank, ranked per
    query by ``row_number``. No index-side shuffle in either step
    (plan-asserted); the only Exchanges sit over candidate-bounded
    intermediates. Per query id, rows equal ``query_index_topk`` with
    the same radius (and therefore inline ``lsh_ann_topk`` /
    ``lsh_multiprobe_topk``) — pinned in tests and by the registered
    ``sim_ann_index_batch_probe`` oracle row.

    ``mode`` (round-9, the dedup probe's lever applied here): the
    broadcast shape assumes the QUERY delta is small; a multi-GB delta
    would OOM the driver. ``"shuffle"`` pins SHUFFLE_HASH joins for that
    case (on the default partitioned layout the index side then shuffles
    on the probe keys; a ``layout="bucketed"`` index keeps it
    exchange-free in shuffle mode too — round-10, VERDICT r9 item 3);
    ``"auto"`` picks by Catalyst's zero-job size estimate
    (``index_base.pick_join_mode``; round-10 — the pick used to pay a
    count() scan of the delta per probe, once per micro-batch at
    deployment cadence), falling back to a count against the row bound
    only when no estimate exists or the caller pins an explicit
    ``broadcast_threshold``.

    Output: (query_id, <id_col>, cos_sim), k rows per query."""
    from insight_de_smart_grid_spark.operators.similarity import (
        _probe_masks,
    )

    meta = _read_meta(path, pin_id)
    id_col = meta["id_col"]
    if mode == "auto":
        mode = index_base.pick_join_mode(queries, broadcast_threshold,
                                         BROADCAST_QUERY_MAX_ROWS)
    small = F.broadcast if mode == "broadcast" \
        else (lambda df: df.hint("SHUFFLE_HASH"))
    qsig = hyperplane_signatures(queries, meta["n_tables"],
                                 meta["n_planes"], meta["dim"],
                                 vec_col=meta["vec_col"], id_col=id_col)
    masks = _probe_masks(meta["n_planes"], probe_radius)
    # the probe set and the candidate pairs carry query_id ONLY — the
    # query vector would multiply every shuffled/broadcast byte by the
    # embedding width (Q x candidates x ~0.5-1 KB; VERDICT r9 item 4);
    # it joins back from the Q-row delta just before the re-rank
    probe = (qsig.select(F.col(id_col).alias("query_id"),
                         "table", "bucket")
             .withColumn("m", F.explode(F.array(
                 *[F.lit(int(m)) for m in masks])))
             .withColumn("bucket", F.col("bucket").bitwiseXOR(F.col("m")))
             .drop("m"))
    # on a bucketed index (round-10) the shuffle path joins the hinted
    # delta against each bucketed segment scan separately — the index
    # side sits in the join's hash space already, zero Exchange over it
    spec_b = _bucket_spec(meta, _BANDS) if mode == "shuffle" else None
    spec_v = _bucket_spec(meta, _VECS) if mode == "shuffle" else None
    cand = (index_base.join_each_segment(
                spark, path, _BANDS, small(probe), ["table", "bucket"],
                spec_b, pin_id=pin_id)
            .select("query_id", id_col)
            .dropDuplicates(["query_id", id_col]))
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col(id_col))
    cand = index_base.subtract_tombstoned(spark, path, cand, [id_col],
                                          pin_id)
    qvecs = (_vectors_frame(queries, meta["vec_col"], id_col)
             .select(F.col(id_col).alias("query_id"),
                     F.col("v").alias("qv")))
    scored = (index_base.join_each_segment(
                  spark, path, _VECS, small(cand), [id_col], spec_v,
                  pin_id=pin_id)
              .join(small(qvecs), "query_id")
              .select(
                  "query_id", id_col,
                  F.round(_dot(F.col("v"), F.col("qv"))
                          / (_norm(F.col("v")) * _norm(F.col("qv"))),
                          6).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                               F.asc(id_col))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def rebuild_signature_index(spark: SparkSession, path: str,
                            n_tables: "int | None" = None,
                            n_planes: "int | str" = "auto",
                            auto_occupancy: int = 32,
                            max_attempts: int = 5) -> dict:
    """Re-derive the LSH geometry from the index's OWN single-copy
    vectors table — the rebuild the depth-freeze contract defers to
    (an auto depth frozen at creation goes stale as the corpus grows;
    re-deriving mid-life would make appended buckets incompatible, so
    the ONLY correct path is an atomic whole-index re-signature). Only
    ``bands/`` is rewritten — the vectors table IS the corpus and stays
    untouched — and the new geometry meta rides the same manifest bump
    as the new bands segment (round-10 manifest meta): a crash anywhere
    leaves the old depth fully consistent with the old bands. Probes
    after a rebuild answer exactly like a fresh build at the new
    geometry over the ingested corpus (pinned in tests).

    The replace carries ``expect_version`` from the pre-read snapshot
    (round-11, ADVICE r10): an append landing between reading the live
    vectors and this commit would otherwise keep its vectors live while
    its BANDS vanished from the stale replace list — silently unfindable
    vectors. On ``ManifestConflict`` the whole re-signature retries from
    the fresh live set, absorbing the append (the ``compact_tables``
    contract applied to geometry changes)."""
    for _ in range(max_attempts):
        man = index_base.read_manifest(path)
        version = man["version"] if man else 0
        meta = dict(_read_meta(path))
        id_col = meta["id_col"]
        want_tables = n_tables or meta["n_tables"]
        vecs = _read_table(spark, path, _VECS)
        resolved = n_planes
        if n_planes == "auto":
            resolved = auto_n_planes(vecs.count(),
                                     target_occupancy=auto_occupancy)
        sig = hyperplane_signatures(vecs, want_tables, resolved,
                                    meta["dim"], vec_col="v",
                                    id_col=id_col)
        tag = next_tag(path, "r")
        seg_b = stage_segment(f"{path}/{_BANDS}", tag)
        bands_frame = sig.select(F.col(id_col), F.col("table"),
                                 F.col("bucket"))
        if meta.get("layout") == "bucketed":
            index_base.write_bucketed_segment(
                bands_frame, seg_b, **_bucket_spec(meta, _BANDS))
        else:
            (bands_frame.repartition("table")
             .sortWithinPartitions("table", "bucket")
             .write.mode("overwrite").partitionBy("table").parquet(seg_b))
        meta.update({"n_tables": want_tables, "n_planes": int(resolved),
                     "depth_mode": ("auto" if n_planes == "auto"
                                    else "pinned"),
                     "geom_epoch": meta.get("geom_epoch", 0) + 1})
        write_meta(path, meta)   # mirror; the manifest copy is authoritative
        try:
            commit(path, replaces={_BANDS: [seg_b]}, meta=meta,
                   expect_version=version)
        except ManifestConflict:
            continue
        index_base.gc_unreferenced(path, [_BANDS])
        return meta
    raise ManifestConflict(
        f"rebuild of {path} lost the commit race {max_attempts} times")
