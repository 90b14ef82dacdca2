"""Custom stateful streaming operator: per-appliance EWMA smoothing via
``applyInPandasWithState``.

The reference has no custom stateful operator (its only state is the built-in
windowed aggregation, SURVEY §2.7 ST3); this is the extension shape for
operators Spark's built-ins can't express — a *recursive* per-key computation
(EWMA depends on the previous row's output) has no window-function or
streaming-agg form, so it runs as an Arrow-batched stateful map with explicit
GroupState.

Batch twin (``ewma_batch``, ``applyInPandas``) and streaming form
(``ewma_stream``) share the same per-group pandas kernel, which makes the
batch≡stream contract testable exactly like the duty-cycle query.

Scale notes: state per key is two scalars (last ewma, last ts) — KBs per
million keys; one shuffle on the key, Arrow both ways, NumPy inside. Use the
RocksDB state store provider for 100 TB keyspaces.

Ordering contract: EWMA is order-sensitive; rows are sorted by event time
*within* each micro-batch, but a row arriving in a later batch with an
earlier timestamp is smoothed out of order (the operator has no retraction).
Feed it a per-key-ordered stream — Kafka keyed by house_id gives exactly
that (SURVEY ST7) — or widen micro-batches until order holds.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KEYS = ("house_id", "appliance_id")
OUT_SCHEMA = ("house_id string, appliance_id string, ts timestamp, "
              "power double, ewma double")
STATE_SCHEMA = "last_ewma double"


def _ewma_kernel(pdf: pd.DataFrame, alpha: float,
                 prev: float | None) -> tuple[pd.DataFrame, float]:
    """Sequential EWMA over ts-sorted rows, seeded with carried state."""
    pdf = pdf.sort_values("ts")
    out, cur = [], prev
    for p in pdf["power"]:
        cur = float(p) if cur is None else alpha * float(p) + (1 - alpha) * cur
        out.append(cur)
    pdf = pdf.assign(ewma=out)
    return pdf, cur


def ewma_batch(readings: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Batch form: one applyInPandas per key group."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        smoothed, _ = _ewma_kernel(pdf, alpha, None)
        return smoothed[list(KEYS) + ["ts", "power", "ewma"]]

    prepared = readings.selectExpr(
        *KEYS, "ts", "cast(power as double) as power")
    return prepared.groupBy(*KEYS).applyInPandas(fn, OUT_SCHEMA)


def ewma_stream(readings_stream: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming form: the same kernel under applyInPandasWithState; the
    carried EWMA seeds each micro-batch so the stream equals the batch run
    over the concatenated input."""
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        prev = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs))
        smoothed, cur = _ewma_kernel(pdf, alpha, prev)
        state.update((cur,))
        yield smoothed[list(KEYS) + ["ts", "power", "ewma"]]

    prepared = readings_stream.selectExpr(
        *KEYS, "ts", "cast(power as double) as power")
    return prepared.groupBy(*KEYS).applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
