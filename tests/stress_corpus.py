"""Power-law stress corpus: a ~mult× replica of the driver testdata with
the skew hazards a 100 TB crawl actually has, written DISTRIBUTED (no
driver materialization) to a scratch dir with the same <table>.parquet
layout the registered queries read — so any `queries()` entry runs
against it unmodified.

Planted skew (all derived from the BASE doc id so every copy of a base
row gets the same treatment — copies stay near-identical near-dups):

- documents:
  * mult near-dup copies of every doc (copy marker token appended), so
    every base doc becomes a mult-member near-dup cluster — LSH buckets
    and verify joins carry real duplicate mass;
  * a shared 24-word boilerplate phrase on ~half the docs — every one of
    its word 3-gram shingles has document frequency ~n_docs/2 (the
    stop-shingle hazard for inverted-index joins);
  * a 220-char single-character run on ~20% of docs — ALL its char
    k-grams are ONE mega-hot key (the window-by-gram skew hazard
    `duplicate_spans(skew_safe=)` exists for);
  * Zipf source: ~70% of rows collapse into one hot `source` value
    (skewed groupBy/distinct keys).
- embeddings: mult copies; ~2% of rows replaced by ONE fixed vector —
  a hot LSH bucket in every hyperplane table (candidate-join skew);
  ~1% of base vectors (vec_id % PROBE_MOD == PROBE_RES) get PERTURBED
  copies instead of identical ones (per-copy ±0.5%*copy component
  scaling -> cos ~0.989..0.99999 to the base, far above the ~0.75
  max cross-cos of unrelated 64-dim vectors) — planted KNOWN-NEAREST
  pairs whose recall the ANN levers are asserted against (round-7):
  identical copies would make bucket collision free, perturbed ones
  exercise the real p^planes geometry.
- events: mult copies at the SAME timestamps; ~30% of rows re-keyed to
  one hot user — a hot (house, window) key through every rollup,
  window, and stateful-streaming path.
- supplier: mult near-identical name variants per supplier — the shared
  "Supplier#0000..." prefix is PassJoin's hot-segment hazard, and the
  copies multiply the near-dup name mass through the segment inverted
  index (fuzzy-match family).

Scale knob: mult=10 on sf0.1 gives 50k docs / 20k vectors / 1M events —
small enough for CI, big enough that a quadratic blowup or single-task
skew collapse is visible as a wall-clock cliff.
"""
from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

BIG = 10_000_000
HOT_PHRASE = " ".join(f"boiler{i}" for i in range(24))
HOT_RUN = "z" * 220
HOT_SOURCE = "web-hot"
HOT_USER = 1
EMB_DIM = 64
# planted ANN ground truth: base vectors with vec_id % PROBE_MOD ==
# PROBE_RES get perturbed (not identical) copies — see module docstring.
# A second band (PROBE_RES2) perturbs HARDER — delta = 0.046*min(copy,10),
# cos ~ 1/sqrt(1+delta^2) spanning ~0.999 down to ~0.90 — so the recall
# contract also binds at the cos-0.9 DESIGN POINT the auto probe radius
# and its binomial model are derived for, not just the near-1 regime.
PROBE_MOD = 101
PROBE_RES = 7
PROBE_RES2 = 13


def build_stress_corpus(spark: SparkSession, out_dir: str,
                        base_sf: str = "/root/testdata/sf0.1",
                        mult: int = 10,
                        hot_phrase: bool = True,
                        hot_run: bool = True,
                        hot_run_chars: int = 220,
                        hot_run_mod: int = 5) -> str:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    copies = F.broadcast(
        spark.range(mult).select(F.col("id").alias("copy")))

    docs = spark.read.parquet(f"{base_sf}/documents.parquet")
    text = F.concat(
        F.col("text"),
        F.when(F.col("copy") > 0,
               F.concat(F.lit(" v"), F.col("copy"))).otherwise(F.lit("")),
        F.when(F.lit(hot_phrase) & (F.col("doc_id") % 2 == 0),
               F.lit(" " + HOT_PHRASE)).otherwise(F.lit("")),
        F.when(F.lit(hot_run) & (F.col("doc_id") % hot_run_mod == 0),
               F.lit(" " + "z" * hot_run_chars)).otherwise(F.lit("")),
    )
    (docs.crossJoin(copies)
     .select((F.col("doc_id") + F.col("copy") * BIG).alias("doc_id"),
             text.alias("text"),
             F.col("lang"),
             F.when(F.pmod(F.xxhash64("doc_id", "copy"), 10) < 7,
                    F.lit(HOT_SOURCE))
             .otherwise(F.col("source")).alias("source"))
     .withColumn("n_chars", F.length("text").cast("long"))
     .write.mode("overwrite").parquet(str(out / "documents.parquet")))

    emb = spark.read.parquet(f"{base_sf}/embeddings.parquet")
    hot_vec = F.array(
        *[F.lit(1.0 if i % 2 == 0 else -1.0).cast("float")
          for i in range(EMB_DIM)])
    # perturbed copy for the planted ANN probes: scale component i by
    # (1 +- 0.005*copy), sign alternating by dimension — cosine to the
    # base ~ 1 - delta^2/2 (the ± cross terms cancel), i.e. 0.99999 at
    # copy 1 down to ~0.989 at copy 30; deterministic, no RNG
    def perturb(delta):
        return F.transform(
            "embedding",
            lambda x, i: (x * (F.lit(1.0) + delta
                               * F.when(i % 2 == 0, F.lit(1.0))
                               .otherwise(F.lit(-1.0)))).cast("float"))
    probe = (F.col("vec_id") % PROBE_MOD == PROBE_RES) & (F.col("copy") > 0)
    probe2 = ((F.col("vec_id") % PROBE_MOD == PROBE_RES2)
              & (F.col("copy") > 0))
    (emb.crossJoin(copies)
     .select((F.col("vec_id") + F.col("copy") * BIG).alias("vec_id"),
             F.when(F.pmod(F.xxhash64("vec_id", "copy"), 50) == 0, hot_vec)
             .when(probe, perturb(F.lit(0.005) * F.col("copy")))
             .when(probe2, perturb(F.lit(0.046)
                                   * F.least(F.col("copy"), F.lit(10))))
             .otherwise(F.col("embedding")).alias("embedding"),
             F.col("label"))
     .write.mode("overwrite").parquet(str(out / "embeddings.parquet")))

    sup = spark.read.parquet(f"{base_sf}/supplier.parquet")
    # mult near-identical name variants per supplier ("Supplier#x v3"):
    # the TPC-H shared "Supplier#0000..." prefix is already PassJoin's
    # hot-segment hazard; the copies multiply the near-dup name mass so
    # the segment inverted index carries mult x rows per hot segment
    (sup.crossJoin(copies)
     .select((F.col("s_suppkey") + F.col("copy") * BIG).alias("s_suppkey"),
             F.when(F.col("copy") > 0,
                    F.concat(F.col("s_name"), F.lit(" v"), F.col("copy")))
             .otherwise(F.col("s_name")).alias("s_name"),
             F.col("s_nationkey"), F.col("s_acctbal"))
     .write.mode("overwrite").parquet(str(out / "supplier.parquet")))

    ev = spark.read.parquet(f"{base_sf}/events.parquet")
    (ev.crossJoin(copies)
     .select((F.col("event_id") + F.col("copy") * BIG).alias("event_id"),
             F.col("ts"),
             F.when(F.pmod(F.xxhash64("event_id", "copy"), 10) < 3,
                    F.lit(HOT_USER).cast("long"))
             .otherwise(F.col("user_id")).alias("user_id"),
             F.col("event_type"), F.col("value"), F.col("props"))
     .write.mode("overwrite").parquet(str(out / "events.parquet")))
    return str(out)
