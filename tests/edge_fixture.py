"""Adversarial edge-corpus fixture: a second tiny scale-factor directory
whose rows are chosen to break operators, written with EXACTLY the real
tables' parquet schemas so every registered query (and its DuckDB oracle)
runs unmodified against it.

Planted hazards:
- documents: empty text, single word, pure whitespace, unicode/emoji,
  an identical duplicate pair, a high-overlap near-dup pair (feeds the
  jaccard/minhash/cluster/blast-radius family), a pathological repeated
  word, a very long doc, zero n_chars.
- embeddings: a ZERO vector (cosine 0/0), duplicate vectors, near-axis
  unit vectors, >=17 rows so the IVF portable quantizer (centroids =
  vec_id < 16) still has a corpus.
- events: duplicate timestamps with different values (window tie-break),
  exact duplicate rows (dedup), null/garbage props JSON, a single-event
  user, zero/negative/huge values, a counter that resets.
- star schema: a valid mini-TPC-H with one orphan lineitem, one childless
  customer, AND NULL-key rows in orders/lineitem (pk-null audit, NOT-IN vs
  anti-join orphan semantics, null-safe checksums) so semi/anti/audit
  queries exercise both branches; the NULL-key rows carry otherwise-unique
  attributes so no ORDER-BY tie-break ever reaches a NULL key (Spark and
  DuckDB disagree on default NULL sort order).

Usage: build_edge_sf(dir_path) writes <table>.parquet FILES (not dirs) so
DuckDB's read_parquet sees them exactly like the driver's testdata.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def build_edge_sf(out_dir: str) -> str:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write(name: str, schema: pa.Schema, cols: dict) -> None:
        pq.write_table(pa.table(cols, schema=schema),
                       out / f"{name}.parquet")

    write("region",
          pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
          {"r_regionkey": [0, 1], "r_name": ["AMERICA", "EUROPE"]})
    write("nation",
          pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                     ("n_regionkey", pa.int32())]),
          {"n_nationkey": [0, 1, 2],
           "n_name": ["BRAZIL", "FRANCE", "GERMANY"],
           "n_regionkey": [0, 1, 1]})
    write("customer",
          pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                     ("c_nationkey", pa.int32()),
                     ("c_acctbal", pa.float64()),
                     ("c_mktsegment", pa.string())]),
          {"c_custkey": [1, 2, 3],
           "c_name": ["Customer#1", "Customer#2", "Customer#3-childless"],
           "c_nationkey": [0, 1, 2],
           "c_acctbal": [0.0, -12.5, 9999.99],
           "c_mktsegment": ["BUILDING", "MACHINERY", "BUILDING"]})
    write("supplier",
          pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                     ("s_nationkey", pa.int32()),
                     ("s_acctbal", pa.float64())]),
          {"s_suppkey": [1, 2, 3],
           "s_name": ["Supplier#000000001", "Supplier#000000002",
                      "Supplier#000000011"],
           "s_nationkey": [0, 1, 2],
           "s_acctbal": [10.0, 20.0, 30.0]})
    write("part",
          pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                     ("p_brand", pa.string()), ("p_type", pa.string()),
                     ("p_size", pa.int32()),
                     ("p_retailprice", pa.float64())]),
          {"p_partkey": [1, 2],
           "p_name": ["green metallic thing", "PROMO shiny widget"],
           "p_brand": ["Brand#1", "Brand#2"],
           "p_type": ["PROMO BRUSHED", "STANDARD POLISHED"],
           "p_size": [1, 50],
           "p_retailprice": [1.0, 1000.0]})
    write("orders",
          pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                     ("o_orderstatus", pa.string()),
                     ("o_totalprice", pa.float64()),
                     ("o_orderdate", pa.timestamp("us")),
                     ("o_orderpriority", pa.string())]),
          # the 4th row's keys are NULL (pk audit + NOT-IN-vs-anti-join
          # orphan semantics); its other attributes are UNIQUE so no
          # ORDER-BY tie ever reaches the NULL key (Spark sorts NULLS
          # FIRST, DuckDB NULLS LAST — the queries use keys only as
          # tie-breakers, so uniqueness keeps both engines deterministic)
          {"o_orderkey": [10, 11, 12, None],
           "o_custkey": [1, 1, 2, None],
           "o_orderstatus": ["F", "O", "F", "P"],
           "o_totalprice": [100.0, 100.0, 0.01, 55.5],  # tie on price
           "o_orderdate": [_ts(-60 * 24 * 40), _ts(-60 * 24 * 10),
                           _ts(-60 * 24 * 10), _ts(-60 * 24 * 25)],
           "o_orderpriority": ["1-URGENT", "5-LOW", "1-URGENT",
                               "3-MEDIUM"]})
    write("lineitem",
          pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                     ("l_suppkey", pa.int64()),
                     ("l_linenumber", pa.int32()),
                     ("l_quantity", pa.float64()),
                     ("l_extendedprice", pa.float64()),
                     ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                     ("l_returnflag", pa.string()),
                     ("l_linestatus", pa.string()),
                     ("l_shipdate", pa.timestamp("us"))]),
          # 999 = dangling orphan; the NULL l_orderkey row is an orphan
          # under anti-join semantics but invisible to a NOT IN oracle —
          # the divergence the integrity audit's NOT EXISTS rewrite guards.
          # Its non-key attributes are unique (see orders note).
          {"l_orderkey": [10, 10, 11, 999, None],
           "l_partkey": [1, 2, 1, 2, 1],
           "l_suppkey": [1, 2, 3, 1, 2],
           "l_linenumber": [1, 2, 1, 1, 9],
           "l_quantity": [1.0, 50.0, 0.0, 5.0, 2.0],  # zero quantity
           "l_extendedprice": [10.0, 5000.0, 0.0, 50.0, 77.0],
           "l_discount": [0.0, 0.05, 1.0, 0.07, 0.01],  # 100% discount
           "l_tax": [0.0, 0.08, 0.0, 0.02, 0.0],
           "l_returnflag": ["N", "R", "A", "N", "N"],
           "l_linestatus": ["O", "F", "F", "O", "O"],
           "l_shipdate": [_ts(-60 * 24 * 39), _ts(-60 * 24 * 35),
                          _ts(-60 * 24 * 5), _ts(-60 * 24 * 2),
                          _ts(-60 * 24 * 21)]})
    ev_rows = [
        # (minutes, user, type, value, props)
        (0.0, 1, "click", 1.0, '{"power": 7.5, "room": "kitchen"}'),
        (0.0, 1, "click", 2.0, '{"power": 0.0}'),      # same ts, diff value
        (0.0, 1, "click", 1.0, '{"power": 7.5, "room": "kitchen"}'),  # dup
        (1.0, 1, "view", 0.0, None),                    # null props
        (2.0, 1, "purchase", 1e12, "not json at all"),  # garbage props
        (3.0, 2, "click", -5.0, "{}"),
        (90.0, 2, "purchase", 3.5, '{"power": 1}'),     # gap > 1 bucket
        (120.0, 3, "click", 100.0, "{}"),               # single-event user
        (121.0, 4, "meter", 10.0, "{}"),                # counter...
        (122.0, 4, "meter", 20.0, "{}"),
        (123.0, 4, "meter", 5.0, "{}"),                 # ...resets
        (250.5, 5, "view", 0.0, "{}"),
        # a second day so day-granular watermarks can close day one
        (60 * 24 + 30.0, 1, "click", 2.5, "{}"),
        (60 * 24 + 95.0, 2, "view", 1.5, "{}"),
    ]
    write("events",
          pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                     ("user_id", pa.int64()), ("event_type", pa.string()),
                     ("value", pa.float64()), ("props", pa.string())]),
          {"event_id": list(range(1, len(ev_rows) + 1)),
           "ts": [_ts(m) for m, *_ in ev_rows],
           "user_id": [u for _, u, *_ in ev_rows],
           "event_type": [t for _, _, t, *_ in ev_rows],
           "value": [v for _, _, _, v, _ in ev_rows],
           "props": [p for *_, p in ev_rows]})
    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat sleeps by the warm fire and dreams of fish")
    docs = [
        (1, base, "en", "web"),
        (2, base, "en", "books"),                       # exact duplicate
        (3, base + " tonight", "en", "web"),            # near-dup of 1/2
        (4, "", "en", "web"),                           # empty
        (5, "word", "en", "books"),                     # single token
        (6, "   ", "xx", "web"),                        # whitespace only
        (7, "café naïve résumé 東京 🚀 emoji mix über",  "fr", "web"),
        (8, "spam spam spam spam spam spam spam spam spam spam",
         "en", "crawl"),                                # repetition
        (9, " ".join(f"w{i % 7} t{i % 11}" for i in range(400)),
         "de", "crawl"),                                # long periodic doc
        (10, "completely different content about solar panels and "
             "battery storage economics in modern power grids",
         "en", "books"),
    ]
    write("documents",
          pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("lang", pa.string()), ("source", pa.string()),
                     ("n_chars", pa.int64())]),
          {"doc_id": [d[0] for d in docs],
           "text": [d[1] for d in docs],
           "lang": [d[2] for d in docs],
           "source": [d[3] for d in docs],
           "n_chars": [len(d[1]) for d in docs]})
    dim = 64
    vecs, labels = [], []
    for i in range(20):
        if i == 17:
            v = [0.0] * dim                             # zero vector
        elif i == 18:
            v = vecs[0][:]                              # duplicate of vec 0
        else:
            v = [0.0] * dim
            v[i % dim] = 1.0
            v[(i * 7 + 1) % dim] = 0.5 + (i % 3) * 0.1
        vecs.append(v)
        labels.append(i % 4)
    write("embeddings",
          pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())]),
          {"vec_id": list(range(20)),
           "embedding": [[float(x) for x in v] for v in vecs],
           "label": labels})
    return str(out)


if __name__ == "__main__":
    import sys

    print(build_edge_sf(sys.argv[1] if len(sys.argv) > 1
                        else "/tmp/edge_sf"))
