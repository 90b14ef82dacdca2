"""Training-data pipeline utilities (north-star extension): deterministic
dataset splits, stratified sampling, TF-IDF keyword extraction, per-label
embedding centroids, and CDC-style latest-record compaction.

Every operator here is a pure DataFrame composition with a DuckDB oracle
twin. Randomness is replaced by portable md5-derived hashing (same recipe as
operators/dedup.py::portable_hash60): reproducible across engines, runs, and
cluster sizes — at 100 TB a split must not depend on partitioning or RNG
state, or re-runs re-shuffle examples between train and test.

Scale notes per operator are on the functions; none collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators.text import tokens


def _hash_bucket(col, buckets: int = 100):
    """Portable hash bucket in [0, buckets): first 4 md5 hex chars mod n.
    16 bits of hash is plenty for split/sample decisions and keeps the
    parse cheap."""
    return (F.conv(F.substring(F.md5(col), 1, 4), 16, 10)
            .cast("int") % buckets)


def _hash_bucket_sql(expr: str, buckets: int = 100) -> str:
    return (f"CAST(concat('0x', substring(md5({expr}), 1, 4)) AS INT) "
            f"% {buckets}")


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

def dataset_split(docs: DataFrame, train: int = 80, val: int = 10,
                  id_col: str = "doc_id") -> DataFrame:
    """Assign each doc to train/val/test by hashing its id: stateless
    per-row projection — no shuffle, no RNG, no driver state. The split is
    stable under re-partitioning, incremental loads, and engine changes,
    which is the property a 100 TB corpus refresh needs (sampling by
    rand() re-splits every run; zipWithIndex serializes)."""
    b = _hash_bucket(F.col(id_col).cast("string"))
    return docs.select(
        id_col,
        F.when(b < train, F.lit("train"))
         .when(b < train + val, F.lit("val"))
         .otherwise(F.lit("test")).alias("split"))


def dataset_split_oracle_sql(train: int = 80, val: int = 10) -> str:
    b = _hash_bucket_sql("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id,
       CASE WHEN {b} < {train} THEN 'train'
            WHEN {b} < {train + val} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# ---------------------------------------------------------------------------
# Stratified deterministic sampling
# ---------------------------------------------------------------------------

def stratified_sample(docs: DataFrame, pct: int = 25,
                      stratum_col: str = "source",
                      id_col: str = "doc_id") -> DataFrame:
    """Keep ~pct% of each stratum, chosen by hashing (stratum, id) — an
    independent hash from the split hash so sampling composes with
    splitting without correlation. Per-row filter, no shuffle; the
    downstream count-by-stratum is the only aggregation."""
    key = F.concat_ws("|", F.col(stratum_col),
                      F.col(id_col).cast("string"))
    return (docs.filter(_hash_bucket(key) < pct)
            .select(id_col, stratum_col))


def stratified_sample_oracle_sql(pct: int = 25,
                                 stratum_col: str = "source") -> str:
    b = _hash_bucket_sql(f"{stratum_col} || '|' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, {stratum_col}
FROM documents
WHERE {b} < {pct}
"""


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (top terms per document)
# ---------------------------------------------------------------------------

def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k terms per doc by smoothed TF-IDF, ties broken by term. Two
    shuffles total: one groupBy over (doc, term) — its output also feeds
    the document-frequency agg, which Spark reuses — and the per-doc
    window. The window's partition key is the doc id (uniform), so no key
    skews even when one term dominates the corpus; a WindowGroupLimit
    keeps only k rows per doc ahead of the final sort."""
    from pyspark.sql import Window

    tok = docs.select(F.col(id_col),
                      F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(df_, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn(
                  "tfidf",
                  F.round(F.col("tf") * F.log((F.col("n_docs") + F.lit(1.0))
                                              / (F.col("df") + F.lit(1.0))),
                          6)))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "term", "tfidf", "rank"))


def tfidf_oracle_sql(k: int = 3) -> str:
    return rf"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Per-label embedding centroids (vector-column profiling)
# ---------------------------------------------------------------------------

def label_centroids(emb: DataFrame, vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Mean vector per label, in exploded (label, dim_idx, centroid) form.
    posexplode + groupBy is the scale formulation: the shuffle key
    (label, dim) is perfectly uniform, partial aggregation combines
    map-side, and no executor ever holds more than a running (sum, count)
    per key — an array-typed avg would instead buffer whole vectors."""
    return (emb.select(label_col,
                       F.posexplode(vec_col).alias("dim_idx", "v"))
            .groupBy(label_col, "dim_idx")
            .agg(F.round(F.avg("v"), 6).alias("centroid")))


def label_centroids_oracle_sql() -> str:
    return """
SELECT label, i - 1 AS dim_idx, round(avg(embedding[i]), 6) AS centroid
FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# CDC-style latest-record compaction
# ---------------------------------------------------------------------------

def latest_compaction(events: DataFrame,
                      keys: tuple[str, ...] = ("user_id", "event_type"),
                      ts_col: str = "ts") -> DataFrame:
    """Newest record per business key — the compaction step of an
    upsert/CDC feed. row_number over (key ORDER BY ts DESC) shuffles once
    on the key and Spark rewrites the rank<=1 filter into a
    WindowGroupLimit (per-partition top-1 before the exchange), so the
    shuffle carries one row per key per map partition, not the full
    history."""
    from pyspark.sql import Window

    # value DESC tie-break: two records with identical (key, ts) would
    # otherwise leave the survivor to partition order — nondeterministic
    # across runs and engines
    w = Window.partitionBy(*keys).orderBy(F.desc(ts_col), F.desc("value"))
    return (events.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(*keys, ts_col, "value"))


def latest_compaction_oracle_sql() -> str:
    return """
SELECT user_id, event_type, ts, value
FROM (SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, value DESC) AS rn
      FROM events)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Corpus length histogram
# ---------------------------------------------------------------------------

def length_histogram(docs: DataFrame, width: int = 50) -> DataFrame:
    """Fixed-width histogram over n_chars — the profile view a curation
    run checks before and after filtering. Single partial-aggregated
    groupBy on a small key space."""
    bucket = (F.floor(F.col("n_chars") / width) * width).cast("long")
    return (docs.groupBy(bucket.alias("bucket_lo"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars")))


def length_histogram_oracle_sql(width: int = 50) -> str:
    return f"""
SELECT CAST(floor(n_chars / {width}) * {width} AS BIGINT) AS bucket_lo,
       count(*) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Decontamination: n-gram overlap against a holdout/benchmark set
# ---------------------------------------------------------------------------

def decontaminate(docs: DataFrame, n: int = 5, holdout_pct: int = 5,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Training docs that share at least one n-token gram with the holdout
    set, with the shared-gram count — the audit view of test-set
    decontamination (the keep-set is the anti-join of this). The holdout is
    a deterministic hash slice of the corpus (stand-in for a benchmark
    table; swap in a real one by replacing the ``hold`` flag with a join).

    Same shingle-inversion shape as n-gram Jaccard: pairs of (train doc,
    holdout gram) only materialize on actual overlap, never a cross join.
    Grams travel as 64-bit xxhash64, not strings, halving shuffle width. In
    production the holdout side is a benchmark suite (MBs) — AQE broadcasts
    it; here it is 5% of the corpus, so the equi-join shuffles both sides
    on the uniformly distributed gram hash."""
    from insight_de_smart_grid_spark.operators.dedup import word_ngrams

    g = word_ngrams(docs, n, text_col, id_col).select(
        F.col(id_col), F.xxhash64("g").alias("g"),
        (_hash_bucket(F.col(id_col).cast("string")) < holdout_pct)
        .alias("hold"))
    hold_grams = g.filter("hold").select("g").distinct()
    return (g.filter(~F.col("hold"))
            .join(hold_grams, "g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shared_grams")))


def decontaminate_oracle_sql(n: int = 5, holdout_pct: int = 5) -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    b = _hash_bucket_sql("CAST(doc_id AS VARCHAR)")
    return rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, {gram} AS g
  FROM toks, UNNEST(generate_series(1, len(t) - {n - 1})) AS u(i)
  WHERE len(t) >= {n}
),
flagged AS (SELECT *, {b} < {holdout_pct} AS hold FROM sh),
hg AS (SELECT DISTINCT g FROM flagged WHERE hold)
SELECT doc_id, count(*) AS n_shared_grams
FROM flagged JOIN hg USING (g)
WHERE NOT hold
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Weighted corpus mixing
# ---------------------------------------------------------------------------

MIX_WEIGHTS = {"en": 100, "de": 60, "fr": 60, "es": 60, "zh": 30}


def weighted_mix(docs: DataFrame, weights: dict[str, int] | None = None,
                 lang_col: str = "lang", id_col: str = "doc_id") -> DataFrame:
    """Downsample each language to its mixture weight (pct kept) — the
    corpus-mixing step of a pretraining data recipe. The weights live in a
    broadcast dim table (the realistic shape: mixture configs are rows, not
    code), the keep decision is the same portable hash as the other
    sampling ops with an independent (lang|id) key, and unknown languages
    default to 0 (dropped). Per-row filter after a broadcast join — no
    shuffle of the fact table."""
    weights = MIX_WEIGHTS if weights is None else weights
    from insight_de_smart_grid_spark.sources.local_rows import local_rows_df

    wdf = local_rows_df(docs.sparkSession, sorted(weights.items()),
                        f"{lang_col} string, keep_pct int")
    key = F.concat_ws("|", F.col(lang_col), F.col(id_col).cast("string"))
    return (docs.join(F.broadcast(wdf), lang_col, "left")
            .filter(_hash_bucket(key) < F.coalesce("keep_pct", F.lit(0)))
            .select(id_col, lang_col, "source"))


def weighted_mix_oracle_sql(weights: dict[str, int] | None = None) -> str:
    weights = MIX_WEIGHTS if weights is None else weights
    b = _hash_bucket_sql("lang || '|' || CAST(doc_id AS VARCHAR)")
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(weights.items()))
    return f"""
SELECT doc_id, lang, source
FROM documents
WHERE {b} < CASE lang {cases} ELSE 0 END
"""


# ---------------------------------------------------------------------------
# Sequence packing (token-budget binning)
# ---------------------------------------------------------------------------

def pack_sequences(docs: DataFrame, capacity: int = 512, n_shards: int = 8,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Assign each doc a (shard, seq_idx) slot so concatenating docs in
    doc_id order within a shard fills fixed ``capacity``-token training
    sequences; a doc whose tokens straddle a boundary spans two sequences
    (token-level packing, the standard pretraining scheme — seq_idx is
    where the doc STARTS). Sharding by portable hash makes the running sum
    a per-shard window, so packing parallelizes across shards instead of
    serializing on one global prefix sum; determinism comes from the hash
    and the doc_id order, not from partition layout."""
    from pyspark.sql import Window

    d = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        _hash_bucket(F.col(id_col).cast("string"), n_shards).alias("shard"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    return (d.withColumn("cum", F.sum("n_tokens").over(w))
            .select(id_col, "shard", "n_tokens",
                    F.floor((F.col("cum") - F.col("n_tokens")) / capacity)
                    .cast("int").alias("seq_idx")))


def pack_sequences_oracle_sql(capacity: int = 512, n_shards: int = 8) -> str:
    b = _hash_bucket_sql("CAST(doc_id AS VARCHAR)", n_shards)
    return rf"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         {b} AS shard
  FROM documents
)
SELECT doc_id, shard, n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                   - n_tokens) / {capacity}) AS INT) AS seq_idx
FROM d
"""


# ---------------------------------------------------------------------------
# Corpus snapshot diff
# ---------------------------------------------------------------------------

def corpus_diff(old: DataFrame, new: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, status) across two corpus snapshots: added / removed /
    changed / unchanged — the audit a versioned-dataset release needs
    before shipping snapshot N+1 (how much churned, what to re-embed,
    what to re-dedup).

    Full-outer equi-join of two fingerprint projections on the uniformly
    distributed doc id: one shuffle each side, content compare is a
    32-byte md5 equality, never the text. At 100 TB both sides prune to
    (id, fp) at the scan."""
    from insight_de_smart_grid_spark.operators.text import fingerprint

    o = old.select(F.col(id_col), fingerprint(text_col).alias("fp_old"))
    n = new.select(F.col(id_col), fingerprint(text_col).alias("fp_new"))
    return (o.join(n, id_col, "full_outer")
            .select(F.col(id_col),
                    F.when(F.col("fp_old").isNull(), F.lit("added"))
                     .when(F.col("fp_new").isNull(), F.lit("removed"))
                     .when(F.col("fp_old") != F.col("fp_new"),
                           F.lit("changed"))
                     .otherwise(F.lit("unchanged")).alias("status")))


def snapshot_views(docs: DataFrame, drop_new_below: int = 5,
                   add_from: int = 90, edit_below: int = 10,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Deterministic old/new snapshot twins of one documents table (the
    registered query's stand-in for two real snapshot paths): old = ids
    hashed below ``add_from``; new = ids hashed at/above ``drop_new_below``
    with an independent hash slice of texts 'edited' (suffix appended)."""
    b = _hash_bucket(F.col(id_col).cast("string"))
    eb = _hash_bucket(F.concat_ws("|", F.lit("edit"),
                                  F.col(id_col).cast("string")))
    old = docs.filter(b < add_from)
    new = (docs.filter(b >= drop_new_below)
           .withColumn(text_col,
                       F.when(eb < edit_below,
                              F.concat(F.col(text_col), F.lit(" rev2")))
                        .otherwise(F.col(text_col))))
    return old, new


def corpus_diff_oracle_sql(drop_new_below: int = 5, add_from: int = 90,
                           edit_below: int = 10) -> str:
    b = _hash_bucket_sql("CAST(doc_id AS VARCHAR)")
    eb = _hash_bucket_sql("'edit|' || CAST(doc_id AS VARCHAR)")
    fp = r"md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"
    fp_edit = (r"md5(regexp_replace(lower(trim(CASE WHEN " + eb +
               f" < {edit_below} THEN text || ' rev2' ELSE text END)), "
               r"'\s+', ' ', 'g'))")
    return f"""
WITH old AS (
  SELECT doc_id, {fp} AS fp_old FROM documents WHERE {b} < {add_from}
),
new AS (
  SELECT doc_id, {fp_edit} AS fp_new
  FROM documents WHERE {b} >= {drop_new_below}
)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old != fp_new THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
"""


# ---------------------------------------------------------------------------
# Per-stratum quantile filtering
# ---------------------------------------------------------------------------

def quantile_filter(docs: DataFrame, tiles: int = 10,
                    drop_below: int = 2) -> DataFrame:
    """Drop the bottom decile of each source by n_chars (short-doc quality
    cut, per stratum so one verbose source can't crowd out another). ntile
    with a doc_id tiebreak is exact and engine-portable; the shuffle key is
    the source. At 100 TB with few giant sources the exact sort-per-source
    skews — the sketch path is a broadcast of approx_percentile thresholds
    per source (same shape as star_approx_agg) traded against exactness at
    the tile boundary."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (docs.select("doc_id", "source", "n_chars",
                        F.ntile(tiles).over(w).cast("int").alias("tile"))
            .filter(F.col("tile") >= drop_below))


def quantile_filter_threshold(docs: DataFrame, q: float = 0.1) -> DataFrame:
    """The scale path `quantile_filter` promises: per-source exact
    percentile thresholds (a tiny agg — one row per source) broadcast back
    onto the corpus, keeping docs strictly above their source's q-quantile
    of n_chars. No per-source full sort of the fact table — the ntile
    variant ranks every row; this one reduces to thresholds and a per-row
    comparison, which is the only shape that survives a source with 10^10
    rows (swap `percentile` for `approx_percentile` to drop the reduce's
    sort memory; exact here so the oracle can match it).

    Spark's `percentile` and DuckDB's `quantile_cont` both interpolate at
    rank q*(n-1) over the same integers, so the thresholds agree to the
    double; integer n_chars vs threshold comparison only flips on an exact
    integer threshold, where both engines produce the identical double."""
    thr = (docs.groupBy("source")
           .agg(F.percentile("n_chars", F.lit(q)).alias("thr")))
    return (docs.join(F.broadcast(thr), "source")
            .filter(F.col("n_chars") > F.col("thr"))
            .select("doc_id", "source", "n_chars",
                    F.round("thr", 6).alias("thr")))


def quantile_filter_threshold_oracle_sql(q: float = 0.1) -> str:
    return f"""
WITH thr AS (
  SELECT source, quantile_cont(n_chars, {q}) AS thr
  FROM documents GROUP BY source
)
SELECT doc_id, d.source, n_chars, round(thr.thr, 6) AS thr
FROM documents d JOIN thr USING (source)
WHERE n_chars > thr.thr
"""


def quantile_filter_oracle_sql(tiles: int = 10, drop_below: int = 2) -> str:
    return f"""
SELECT doc_id, source, n_chars, CAST(tile AS INT) AS tile
FROM (SELECT doc_id, source, n_chars,
             ntile({tiles}) OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS tile
      FROM documents)
WHERE tile >= {drop_below}
"""


def chunk_documents(docs: DataFrame, width: int = 256, stride: int = 192,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Overlapping fixed-width chunking (the RAG / context-window prep op):
    chunk i covers chars [1 + i*stride, ...+width); the last chunk keeps the
    remainder. Pure ``sequence``/``substr`` expressions — a per-row fan-out
    at scan speed, no shuffle at all; downstream embedding/indexing stages
    see (doc_id, chunk_idx) keys that remain uniformly distributed."""
    c = F.col(text_col)
    n_chunks = F.greatest(
        F.ceil((F.length(c) - F.lit(width))
               / F.lit(stride)).cast("int") + 1, F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            c.substr(i * stride + 1, F.lit(width)).alias("chunk")))
    return (docs.select(F.col(id_col), F.explode(chunks).alias("ch"))
            .select(id_col,
                    F.col("ch.chunk_idx").alias("chunk_idx"),
                    F.col("ch.chunk").alias("chunk"),
                    F.length("ch.chunk").alias("n_chunk_chars")))


def chunk_documents_oracle_sql(width: int = 256, stride: int = 192) -> str:
    return f"""
WITH n AS (
  SELECT doc_id, text,
         greatest(CAST(ceil((length(text) - {width})
                            / CAST({stride} AS DOUBLE)) AS INT) + 1, 1)
         AS n_chunks
  FROM documents
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       substring(text, CAST(i AS INT) * {stride} + 1, {width}) AS chunk,
       length(substring(text, CAST(i AS INT) * {stride} + 1, {width}))
       AS n_chunk_chars
FROM n, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
"""


# ---------------------------------------------------------------------------
# Deterministic global shuffle (training-order randomization)
# ---------------------------------------------------------------------------

def global_shuffle(docs: DataFrame, seed: str = "ep0", n_shards: int = 8,
                   id_col: str = "doc_id") -> DataFrame:
    """Assign every doc a shard and an in-shard position from a seeded hash:
    the distributed form of "shuffle the training set each epoch".

    One shuffle on the (uniform) shard key; each shard orders its own rows
    by the hash via a per-shard window — no global sort, no single-partition
    bottleneck, and a new ``seed`` reshuffles without touching the data.
    Consumers read shards in index order and rows in ``pos`` order.
    """
    from pyspark.sql import Window
    key = F.md5(F.concat(F.lit(seed), F.lit(":"),
                         F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(key, 1, 4), 16, 10).cast("int")
             % n_shards)
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        docs.select(id_col, key.alias("shuffle_key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
    )


def global_shuffle_oracle_sql(seed: str = "ep0", n_shards: int = 8) -> str:
    key = f"md5(concat('{seed}', ':', CAST(doc_id AS VARCHAR)))"
    shard = (f"CAST(concat('0x', substring({key}, 1, 4)) AS INT) "
             f"% {n_shards}")
    return f"""
SELECT doc_id, {key} AS shuffle_key, {shard} AS shard,
       CAST(row_number() OVER (PARTITION BY {shard}
                               ORDER BY {key}, doc_id) AS BIGINT) AS pos
FROM documents
"""


# ---------------------------------------------------------------------------
# SCD2 dimension build (validity intervals from a change stream)
# ---------------------------------------------------------------------------

def scd2_intervals(events: DataFrame, key_col: str = "user_id",
                   state_col: str = "event_type",
                   ts_col: str = "ts") -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse each key's event
    sequence into (state, valid_from, valid_to, is_current) rows, merging
    consecutive duplicates — the standard warehouse dimension-history shape
    (Kimball SCD2), derived from a raw change stream.

    One shuffle total: every window partitions by ``key_col``, so the
    lag-detect, running change-id, interval group, and lead(valid_to) all
    share a single hash(key) exchange; per-key sequences sort once in each
    window/aggregation stage but never re-shuffle.
    """
    from pyspark.sql import Window

    # (ts, state) ordering: equal-timestamp events process in a
    # deterministic order in every engine AND in the streaming twin
    w = Window.partitionBy(key_col).orderBy(ts_col, state_col)
    changed = F.when(
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col)), 1).otherwise(0)
    runs = (events
            .select(key_col, ts_col, state_col)
            .withColumn("__chg", changed)
            .withColumn("__run", F.sum("__chg").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    intervals = (runs.groupBy(key_col, "__run")
                 .agg(F.min(ts_col).alias("valid_from"),
                      F.first(state_col).alias("state"),
                      F.count(F.lit(1)).alias("n_events")))
    w_run = Window.partitionBy(key_col).orderBy("valid_from",
                                               "state")
    return (intervals
            .withColumn("valid_to", F.lead("valid_from").over(w_run))
            .withColumn("is_current", F.col("valid_to").isNull())
            .drop("__run"))


def scd2_intervals_oracle_sql() -> str:
    return """
WITH runs AS (
  SELECT user_id, ts, event_type,
         sum(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_type
                   ROWS UNBOUNDED PRECEDING) AS run_id
  FROM (
    SELECT user_id, ts, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_type) AS prev
    FROM events)
), intervals AS (
  SELECT user_id, run_id,
         min(ts) AS valid_from,
         min_by(event_type, ts) AS state,
         count(*) AS n_events
  FROM runs GROUP BY 1, 2
)
SELECT user_id, valid_from, state, n_events,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, state) AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, state)
           IS NULL AS is_current
FROM intervals
"""


def balanced_shards(docs: DataFrame, n_shards: int = 16,
                    n_tiles: int = 10) -> DataFrame:
    """Assign documents to ``n_shards`` output shards with near-equal TOTAL
    length — the writer-side balancing step before materializing training
    shards, where hash sharding (see ``global_shuffle``) equalizes counts
    but lets a few giant documents skew shard bytes.

    Two-phase, no global sort: (1) one tiny aggregate computes corpus-level
    length deciles, broadcast back as an array; (2) within each size tile,
    docs rank by (n_chars desc, doc_id) — a per-tile window, distributed
    across tiles — and deal SERPENTINE to shards (left-to-right, then
    right-to-left each round: plain round-robin over a descending order
    hands shard 0 every tile's largest member, a systematic bias the
    direction flip cancels). Every shard receives the same count (+-1)
    from every size tile, so totals equalize to within one document's
    length without any stage seeing more than a per-tile sort. At 100 TB
    swap the exact percentile for approx_percentile (exact here so the
    oracle matches)."""
    from pyspark.sql import Window

    qs = [i / n_tiles for i in range(1, n_tiles)]
    thr = docs.agg(F.percentile("n_chars", F.lit(qs)).alias("thr"))
    tiled = (docs.join(F.broadcast(thr))
             .select("doc_id", "n_chars",
                     F.size(F.filter(
                         F.col("thr"),
                         lambda t: F.col("n_chars").cast("double") > t))
                     .alias("tile")))
    w = Window.partitionBy("tile").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    pos = F.pmod(F.col("rn") - 1, F.lit(n_shards))
    rnd = F.floor((F.col("rn") - 1) / F.lit(n_shards))
    serp = F.when(F.pmod(rnd, F.lit(2)) == 0, pos) \
            .otherwise(F.lit(n_shards - 1) - pos)
    # rotate the deal start by tile so each tile's short final round lands
    # on DIFFERENT shards — without this every tile's remainder piles onto
    # the same one or two shards
    shard = F.pmod(serp + F.col("tile"), F.lit(n_shards))
    return (tiled.withColumn("rn", F.row_number().over(w))
            .select("doc_id", "n_chars", "tile",
                    shard.cast("int").alias("shard")))


def balanced_shards_oracle_sql(n_shards: int = 16, n_tiles: int = 10) -> str:
    qs = ", ".join(str(i / n_tiles) for i in range(1, n_tiles))
    return f"""
WITH thr AS (
  SELECT quantile_cont(n_chars, [{qs}]) AS thr FROM documents
),
tiled AS (
  SELECT doc_id, n_chars,
         len(list_filter(thr, t -> CAST(n_chars AS DOUBLE) > t)) AS tile
  FROM documents, thr
)
SELECT doc_id, n_chars, tile,
       CAST((CASE WHEN ((rn - 1) // {n_shards}) % 2 = 0
                  THEN (rn - 1) % {n_shards}
                  ELSE {n_shards - 1} - ((rn - 1) % {n_shards})
             END + tile) % {n_shards} AS INT) AS shard
FROM (SELECT doc_id, n_chars, tile,
             row_number() OVER (PARTITION BY tile
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM tiled)
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis exponential race)
# ---------------------------------------------------------------------------

def weighted_sample(docs: DataFrame, k: int = 20, seed: str = "ws0",
                    id_col: str = "doc_id",
                    weight_col: str = "n_chars") -> DataFrame:
    """Draw k docs WITHOUT replacement with probability proportional to
    ``weight_col`` (Efraimidis & Spirakis 2006): each row races with key
    ``-ln(u) / w`` for a per-row uniform u, and the k SMALLEST keys win —
    an order statistic, so the whole draw is one TakeOrderedAndProject over
    a projection: no shuffle, no driver state, reweighting = new ``seed``.

    u is md5-derived (first 8 hex chars -> (0,1), same portable-hash recipe
    as ``global_shuffle``) so engine and oracle draw the identical sample;
    the race key rounds to 12 decimals to absorb last-ulp ln() differences
    between engines (keys sit around 1e-3-1e-6 where 1e-12 is ~1e6 ulps of
    headroom).
    """
    key = F.md5(F.concat(F.lit(seed), F.lit(":"),
                         F.col(id_col).cast("string")))
    u = ((F.conv(F.substring(key, 1, 8), 16, 10).cast("double") + F.lit(0.5))
         / F.lit(4294967296.0))
    race = F.round(-F.log(u) / F.col(weight_col).cast("double"), 12)
    return (docs
            .select(F.col(id_col),
                    F.col(weight_col).cast("bigint").alias("weight"),
                    race.alias("race_key"))
            .orderBy(F.asc("race_key"), F.asc(id_col))
            .limit(k))


def weighted_sample_oracle_sql(k: int = 20, seed: str = "ws0") -> str:
    key = f"md5(concat('{seed}', ':', CAST(doc_id AS VARCHAR)))"
    u = (f"(CAST(concat('0x', substring({key}, 1, 8)) AS BIGINT) + 0.5)"
         f" / 4294967296.0")
    return f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       round(-ln({u}) / CAST(n_chars AS DOUBLE), 12) AS race_key
FROM documents
ORDER BY race_key ASC, doc_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Temporal train/test split and group-aware k-fold assignment
# ---------------------------------------------------------------------------

def time_split_summary(events: DataFrame, frac_train: float = 0.8,
                       ts_col: str = "ts") -> DataFrame:
    """Time-based train/test split at the ``frac_train`` quantile of event
    time — the leakage-safe split for forecasting-style models (random
    splits leak the future into training). Returns one summary row per
    split: (split, n, min/max epoch seconds) — max(train) <= cutoff <=
    min(test) by construction, asserted in tests.

    The cutoff is a one-row broadcast (same shape as the scalar-subquery
    filter); the summary is a two-group aggregation. Epoch seconds (not
    timestamps) keep the comparison and the output engine-portable."""
    ep = F.col(ts_col).cast("double")
    cutoff = events.agg(F.percentile(ep, F.lit(frac_train)).alias("c"))
    return (events.select(ep.alias("ep"))
            .join(F.broadcast(cutoff))
            .select(F.when(F.col("ep") < F.col("c"), "train")
                    .otherwise("test").alias("split"), "ep")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("ep"), 6).alias("min_ep"),
                 F.round(F.max("ep"), 6).alias("max_ep")))


def time_split_oracle_sql(frac_train: float = 0.8) -> str:
    return f"""
WITH c AS (SELECT quantile_cont(epoch(ts), {frac_train}) AS c FROM events)
SELECT CASE WHEN epoch(ts) < c.c THEN 'train' ELSE 'test' END AS split,
       count(*) AS n,
       round(min(epoch(ts)), 6) AS min_ep,
       round(max(epoch(ts)), 6) AS max_ep
FROM events, c
GROUP BY 1
"""


def group_kfold(events: DataFrame, k: int = 5, group_col: str = "user_id",
                seed: str = "gkf0") -> DataFrame:
    """Group-aware k-fold assignment: the fold is a function of the GROUP
    key (portable md5 bucket), so every row of a group lands in the same
    fold — the split that prevents a user's history from leaking across
    train/validation folds. Returns per-fold row and group counts.

    No shuffle beyond the count aggregation: the fold is a projection of
    the group key, computable at scan time on every executor."""
    fold = _hash_bucket(F.concat(F.lit(seed), F.lit(":"),
                                 F.col(group_col).cast("string")), k)
    return (events.select(fold.alias("fold"), group_col)
            .groupBy("fold")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct(group_col).alias("n_groups"))
            .withColumn("fold", F.col("fold").cast("int")))


def group_kfold_oracle_sql(k: int = 5, seed: str = "gkf0") -> str:
    b = _hash_bucket_sql(f"concat('{seed}', ':', CAST(user_id AS VARCHAR))",
                         k)
    return f"""
SELECT CAST({b} AS INT) AS fold, count(*) AS n_rows,
       count(DISTINCT user_id) AS n_groups
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Token-budget report (what's actually in the training mix)
# ---------------------------------------------------------------------------

def token_budget_report(docs: DataFrame,
                        source_col: str = "source") -> DataFrame:
    """Per-source token accounting: document count, whitespace-token total,
    share of the corpus, and the cumulative share in descending-token order
    — the table every data-mixture decision starts from.

    One shuffle to the per-source aggregate; the share/cumulative windows
    run over the AGGREGATED rows (|sources| of them — bounded at any corpus
    size), so the unpartitioned window is a few rows on one reducer, not a
    scale hazard."""
    from pyspark.sql import Window

    from insight_de_smart_grid_spark.operators.text import token_count

    # Empty/whitespace-only docs count 0 tokens (split('') yields [''],
    # so the raw size() would be 1) — mirrors the oracle's CASE guard.
    guarded = (F.when(F.trim(F.col("text")) == "", F.lit(0))
               .otherwise(token_count("text")))
    per = (docs.groupBy(source_col)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(guarded).alias("tokens")))
    w_all = Window.partitionBy()
    w_cum = (Window.partitionBy()
             .orderBy(F.desc("tokens"), F.asc(source_col))
             .rowsBetween(Window.unboundedPreceding, 0))
    return (per
            .withColumn("share",
                        F.round(F.col("tokens") / F.sum("tokens").over(w_all),
                                6))
            .withColumn("cum_share",
                        F.round(F.sum("tokens").over(w_cum)
                                / F.sum("tokens").over(w_all), 6)))


def token_budget_oracle_sql() -> str:
    return r"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END)
           AS tokens
  FROM documents GROUP BY 1
)
SELECT source, n_docs, tokens,
       round(tokens / sum(tokens) OVER (), 6) AS share,
       round(sum(tokens) OVER (ORDER BY tokens DESC, source ASC
                               ROWS UNBOUNDED PRECEDING)
             / sum(tokens) OVER (), 6) AS cum_share
FROM per
"""
