"""Generic file-source stream replay: run any streaming plan over a parquet
table with ``availableNow`` and collect the finalized result.

In production the source is ``readStream.format("kafka")`` (SURVEY S1) and
the sink Kafka or partitioned Parquet (S4/S9); file-in/memory-out runs the
identical logical plan without brokers, which is what makes streaming
operators driver-checkable and batch≡stream testable.
"""

from __future__ import annotations

import tempfile
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def resolve_state_partitions(requested: "int | None") -> "int | None":
    """Stateful-shuffle width with an env override
    (``SPARK_GRAFT_STATE_PARTITIONS``) for A/B measurement and cluster
    sizing. ``None`` stays ``None`` (the caller opted out of touching the
    shuffle width); an unset or unparsable env returns ``requested``
    unchanged. The width = the number of state-store instances a stateful
    query opens/commits per micro-batch, fixed at first start — per-store
    overhead dominates when state is small (local replays), key
    cardinality when it is not (cluster), which is why it is a parameter
    and not a constant."""
    if requested is None:
        return None
    import os
    v = os.environ.get("SPARK_GRAFT_STATE_PARTITIONS")
    if v:
        try:
            return max(1, int(v))
        except ValueError:
            pass
    return requested


def parquet_stream_source(spark: SparkSession, parquet_path: str,
                          flush_sentinel: bool = False,
                          sentinel_margin_s: int = 3600,
                          sentinel_count: int = 1,
                          max_files_per_trigger: int | None = None,
                          sentinel_all_types: bool = False
                          ) -> DataFrame:
    """Schema-pinned streaming file source over a parquet table. The file
    source requires a directory, so a single parquet file is staged behind a
    symlink dir; nanos-precision timestamps surface as longs (same policy as
    ``sources.tables.load_table``) for the plan's projection to convert.

    ``flush_sentinel`` additionally stages a one-row file whose ``ts`` lies
    ``sentinel_margin_s`` past the real maximum and whose ``user_id`` is -1:
    once the stream drains, the final watermark sits past every real window
    end, so append mode emits the COMPLETE window set (identical to the batch
    aggregation) instead of holding back the tail windows. The sentinel's own
    windows end after the watermark and are never emitted — the marker key is
    only a belt-and-braces filter for callers. This is the standard
    end-of-replay flush for finite sources; a live deployment doesn't need it
    (the next real event plays the same role).

    ``sentinel_count`` > 1 (with ``max_files_per_trigger=1`` so each
    sentinel lands in its OWN micro-batch) forces an extra DATA batch
    after the watermark advance. It is normally unnecessary: a watermark
    update takes effect in the NEXT batch, and availableNow finishes with
    a no-data micro-batch (``noDataMicroBatches``, on by default) where
    the advanced watermark evicts state and emits watermark-gated output
    (outer-join rows, closed windows) — regression-tested for both outer
    joins in tests/test_sketch_topn.py. Keep the knob for engines/configs
    without no-data batches, but note ``max_files_per_trigger=1`` also
    puts every REAL file in its own stateful micro-batch — measured 2x
    slower on the outer joins at sf0.1."""
    from insight_de_smart_grid_spark.sources.pq import parquet_schema

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # resolve the schema from the ORIGINAL path (round-11 optimization):
    # the staged dir is symlinks to the same files plus sentinels built
    # from them, so the schema is identical — and the original path is
    # immutable, so the footer sniff is paid once per process instead of
    # once per replay invocation (fresh tmp dirs can never cache-hit)
    schema = parquet_schema(spark, parquet_path)
    p = Path(parquet_path)
    if p.is_file() or flush_sentinel:
        # always stage when adding a sentinel: the source dir may be
        # read-only and must never be mutated
        staged = Path(tempfile.mkdtemp(prefix="stream_src_"))
        for src in ([p] if p.is_file() else sorted(p.iterdir())):
            (staged / src.name).symlink_to(src)
        parquet_path = str(staged)
    if flush_sentinel:
        for i in range(sentinel_count):
            parquet_path = _stage_flush_sentinel(
                spark, parquet_path, sentinel_margin_s * (i + 1), seq=i,
                all_types=sentinel_all_types, schema=schema)
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.load(parquet_path)


def _stage_flush_sentinel(spark: SparkSession, staged_dir: str,
                          margin_s: int, seq: int = 0,
                          all_types: bool = False,
                          schema=None) -> str:
    """Write the watermark-flush sentinel row beside the staged source files.

    ``ts`` at this layer is whatever the parquet surfaces: a nanos-since-epoch
    long (legacy reader) gets the margin added in integer nanos; a timestamp
    (NTZ or LTZ) gets an INTERVAL added — either way the sentinel keeps the
    source schema bit-identical. It copies the latest real row and lands in a
    file written AFTER the real data so mtime-ordered micro-batching can never
    process it first.

    Round-11 optimization (guide §1.2 "remove passes"/§6): the max-ts row
    is located from parquet ROW-GROUP STATISTICS and read back as one
    bounded row-group Arrow read in the driver — replacing a full-scan
    TakeOrdered Spark job plus a one-row write job per replay with
    metadata work. That is also the scale-correct algorithm: footer
    min/max stats bound the work by one row group however large the
    table. Any surprise (missing stats, nested ts, unexpected type)
    falls back to the original Spark path; ``SPARK_GRAFT_SPARK_SENTINEL``
    forces the fallback for A/B."""
    import os as _os

    if not _os.environ.get("SPARK_GRAFT_SPARK_SENTINEL"):
        try:
            return _stage_flush_sentinel_arrow(staged_dir, margin_s, seq,
                                               all_types)
        except Exception:
            pass  # fall through to the Spark path
    from pyspark.sql import functions as F

    batch = (spark.read.schema(schema).parquet(staged_dir) if schema
             else spark.read.parquet(staged_dir))
    ts_type = batch.schema["ts"].dataType.typeName()
    if ts_type in ("long", "bigint"):
        bumped = (F.col("ts") + F.lit(margin_s * 1_000_000_000)).cast("long")
    else:
        bumped = (F.col("ts")
                  + F.expr(f"INTERVAL {margin_s} SECONDS")).cast(ts_type)
    sentinel = (batch.orderBy(F.desc("ts")).limit(1)
                .withColumn("ts", bumped)
                .withColumn("user_id", F.lit(-1)
                            .cast(batch.schema["user_id"].dataType)))
    if "value" in batch.columns:
        # the sentinel exists only to advance the watermark and is
        # excluded from every output by the user_id != -1 convention —
        # but if the copied max-ts row happened to carry a NULL value, a
        # plan's pre-watermark `value IS NOT NULL` filter would silently
        # drop the sentinel, stall the watermark at the real maximum, and
        # lose tail windows (round-8 ADVICE). Coalesce to a constant so
        # no NULL filter can eat it.
        sentinel = sentinel.withColumn(
            "value", F.coalesce(
                F.col("value"),
                F.lit(0).cast(batch.schema["value"].dataType)))
    if all_types and "event_type" in batch.columns:
        # one sentinel row PER event type: queries that split the stream by
        # type (stream-stream joins) collect their event-time stats on the
        # POST-filter branches, so a single-type sentinel advances only the
        # branch whose filter it passes — the other side's watermark stalls
        # at its own real maximum and tail outer rows never flush
        types = batch.select("event_type").distinct()
        sentinel = sentinel.drop("event_type").crossJoin(types)
    tmp = tempfile.mkdtemp(prefix="sentinel_")
    sentinel.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(Path(tmp).glob("part-*.parquet"))
    dest = Path(staged_dir) / f"zz_flush_sentinel_{seq}.parquet"
    part.rename(dest)
    # strictly increasing mtimes: the file source orders batches by
    # modification time, and sentinel N must process after sentinel N-1
    import os
    now = os.stat(staged_dir).st_mtime + 10 * (seq + 1)
    os.utime(dest, (now, now))
    return staged_dir


def _stage_flush_sentinel_arrow(staged_dir: str, margin_s: int,
                                seq: int = 0,
                                all_types: bool = False) -> str:
    """Driver-side sentinel staging via parquet footer statistics (see
    ``_stage_flush_sentinel``). Semantics are identical to the Spark
    path: copy the max-``ts`` row, bump ``ts`` by ``margin_s``, mark
    ``user_id`` -1, coalesce a NULL ``value`` to 0, optionally fan out
    one row per distinct ``event_type``; write after the real files with
    a strictly increasing mtime. Raises on anything unexpected — the
    caller falls back to the Spark path."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = sorted(p for p in Path(staged_dir).iterdir()
                   if p.suffix == ".parquet" and p.stat().st_size > 0)
    if not files:
        raise ValueError("no parquet files staged")
    # 1. locate the row group holding the global max ts (metadata only)
    best = None  # (max_stat, file, rg_index)
    for f in files:
        pf = pq.ParquetFile(f)
        md = pf.metadata
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            col = next((rgm.column(ci) for ci in range(rgm.num_columns)
                        if rgm.column(ci).path_in_schema == "ts"), None)
            if col is None:
                raise ValueError("no flat ts column")
            st = col.statistics
            if st is None or not st.has_min_max:
                raise ValueError("ts statistics missing")
            if best is None or st.max > best[0]:
                best = (st.max, f, rg)
    _, src, rg = best
    tbl = pq.ParquetFile(src).read_row_group(rg)
    names = tbl.schema.names
    if "user_id" not in names:
        raise ValueError("no user_id column")
    # 2. one-row slice at the max ts (ties: any max row, same contract as
    #    the Spark orderBy-desc-limit-1)
    i = pc.sort_indices(
        tbl.select(["ts"]), sort_keys=[("ts", "descending")])[0].as_py()
    one = tbl.slice(i, 1)

    def put(t: pa.Table, name: str, arr) -> pa.Table:
        idx = t.schema.get_field_index(name)
        return t.set_column(idx, t.schema.field(idx), arr)

    # 3. bump ts (duration add for timestamps, integer nanos for the
    #    legacy nanos-as-long long form), mark user_id, patch value
    ts_type = one.schema.field("ts").type
    if pa.types.is_timestamp(ts_type):
        mult = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
        bump = pa.scalar(margin_s * mult, pa.duration(ts_type.unit))
    elif pa.types.is_integer(ts_type):
        bump = pa.scalar(margin_s * 1_000_000_000, ts_type)
    else:
        raise ValueError(f"unexpected ts type {ts_type}")
    one = put(one, "ts", pc.add(one.column("ts"), bump).cast(ts_type))
    one = put(one, "user_id",
              pa.array([-1], type=one.schema.field("user_id").type))
    if "value" in names:
        vt = one.schema.field("value").type
        one = put(one, "value",
                  pc.coalesce(one.column("value"), pa.scalar(0).cast(vt)))
    if all_types and "event_type" in names:
        et = one.schema.field("event_type").type
        vals = set()
        has_null = False
        for f in files:
            col = pq.read_table(f, columns=["event_type"]).column(0)
            vals.update(v for v in col.to_pylist() if v is not None)
            has_null = has_null or col.null_count > 0
        types = sorted(vals) + ([None] if has_null else [])
        one = pa.concat_tables(
            [put(one, "event_type", pa.array([v], type=et)) for v in types])
    # 4. land it after the real data with a strictly increasing mtime
    dest = Path(staged_dir) / f"zz_flush_sentinel_{seq}.parquet"
    pq.write_table(one, dest, version="2.6")
    now = os.stat(staged_dir).st_mtime + 10 * (seq + 1)
    os.utime(dest, (now, now))
    return staged_dir


def replay_parquet_stream(spark: SparkSession, parquet_path: str,
                          plan_fn: Callable[[DataFrame], DataFrame],
                          query_name: str,
                          checkpoint_dir: str | None = None,
                          out_dir: str | None = None,
                          state_partitions: int | None = 8,
                          flush_sentinel: bool = False,
                          sentinel_margin_s: int = 3600,
                          sentinel_count: int = 1,
                          max_files_per_trigger: int | None = None,
                          sentinel_all_types: bool = False,
                          progress_out: "list | None" = None
                          ) -> DataFrame:
    """Build ``plan_fn(stream)`` over a parquet file source and drain it with
    ``trigger(availableNow=True)``; returns the sink contents as a batch
    DataFrame (memory sink by default, fault-tolerant parquet sink when
    ``out_dir`` is given).

    ``progress_out``: a caller-supplied list that receives the drained
    query's ``recentProgress`` dicts — the per-micro-batch state-operator
    metrics (numRowsUpdated, numRowsTotal, operator name) that let tests
    assert HOW MUCH the state store ingested, not just what came out
    (the pane-vs-explode state-input contract).

    ``state_partitions`` sizes the stateful shuffle (= number of state store
    instances, fixed at first start). Per-store open/commit overhead dominates
    when state is small, so default low; on a cluster size it to the key
    cardinality. Scoped to this query — the session conf is restored after.
    """
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    state_partitions = resolve_state_partitions(state_partitions)
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    plan = plan_fn(parquet_stream_source(
        spark, parquet_path, flush_sentinel=flush_sentinel,
        sentinel_margin_s=sentinel_margin_s,
        sentinel_count=sentinel_count,
        max_files_per_trigger=max_files_per_trigger,
        sentinel_all_types=sentinel_all_types))
    try:
        if out_dir:
            writer = (plan.writeStream.outputMode("append")
                      .format("parquet").option("path", out_dir)
                      .trigger(availableNow=True))
            if checkpoint_dir:
                writer = writer.option("checkpointLocation", checkpoint_dir)
            q = writer.start()
            q.awaitTermination()
            if progress_out is not None:
                progress_out.extend(p for p in q.recentProgress if p)
            return spark.read.parquet(out_dir)
        writer = (plan.writeStream.outputMode("append")
                  .format("memory").queryName(query_name)
                  .trigger(availableNow=True))
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        q = writer.start()
        q.awaitTermination()
        if progress_out is not None:
            progress_out.extend(p for p in q.recentProgress if p)
        return spark.table(query_name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
