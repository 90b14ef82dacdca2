"""Streaming gap fill: the batch forward-fill repair
(`operators/timeseries.py::gap_fill`) as a live stateful operator.

Semantics — CLOSED buckets only: a bucket finalizes (and any gap buckets
before it back-fill) when a later-bucket observation for the same key
arrives; each key's newest bucket stays open in state, because its mean
could still change. The streamed output therefore equals the batch gap
fill minus each key's final bucket — exactly what the oracle states, so
the state machine is value-checked, not just row-counted.

State per key is four scalars (open bucket, running sum/count, last filled
value) — O(keys) total regardless of volume, the applyInPandasWithState
shape that survives any input size. Out-of-order ACROSS micro-batches
(an observation older than the open bucket) is dropped like a
watermark-expired row; within a batch order doesn't matter (buckets are
aggregated then walked in order).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("key long, bucket_ts timestamp, value double, "
              "is_observed boolean")
STATE_SCHEMA = ("open_bucket long, open_sum double, open_cnt long, "
                "last_value double, has_last boolean")


def gap_fill_stream(events_stream: DataFrame,
                    bucket_seconds: int = 3600) -> DataFrame:
    """Watermark-free stateful gap fill; see module docstring for the
    closed-bucket contract."""

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        rows = [p for p in pdfs if not p.empty]
        if not rows:
            return
        pdf = pd.concat(rows, ignore_index=True)
        uid = key[0]
        epoch_s = pdf["ts"].astype("int64") // 10**9
        buckets = (epoch_s // bucket_seconds) * bucket_seconds
        agg = (pd.DataFrame({"b": buckets, "v": pdf["value"]})
               .groupby("b")["v"].agg(["sum", "count"]).sort_index())

        if state.exists:
            ob, osum, ocnt, lastv, haslast = state.get
        else:
            ob, osum, ocnt, lastv, haslast = -1, 0.0, 0, 0.0, False

        out: list[tuple] = []
        for b, row in agg.iterrows():
            b = int(b)
            if ob == -1:
                ob, osum, ocnt = b, float(row["sum"]), int(row["count"])
                continue
            if b == ob:
                osum += float(row["sum"])
                ocnt += int(row["count"])
                continue
            if b < ob:  # late across batches: expired, dropped
                continue
            val = round(osum / ocnt, 6)
            out.append((uid, ob, val, True))
            lastv, haslast = val, True
            g = ob + bucket_seconds
            while g < b:
                out.append((uid, g, lastv, False))
                g += bucket_seconds
            ob, osum, ocnt = b, float(row["sum"]), int(row["count"])

        state.update((int(ob), float(osum), int(ocnt),
                      float(lastv), bool(haslast)))
        if out:
            res = pd.DataFrame(
                out, columns=["key", "bucket_ts", "value", "is_observed"])
            res["bucket_ts"] = pd.to_datetime(res["bucket_ts"], unit="s")
            yield res

    prepared = events_stream.select(
        events_stream["user_id"].alias("key"), "ts", "value")
    return prepared.groupBy("key").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout)


def gap_fill_stream_oracle_sql(bucket: str = "hour") -> str:
    """Batch gap fill minus each key's final (still-open) bucket."""
    return f"""
WITH observed AS (
  SELECT user_id AS key, date_trunc('{bucket}', ts) AS bucket_ts,
         round(avg(value), 6) AS obs_value
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT key, min(bucket_ts) AS first_ts, max(bucket_ts) AS last_ts
  FROM observed GROUP BY 1
), grid AS (
  SELECT key, unnest(generate_series(first_ts, last_ts,
                                     INTERVAL 1 {bucket})) AS bucket_ts
  FROM spans
), filled AS (
  SELECT g.key, CAST(g.bucket_ts AS TIMESTAMP) AS bucket_ts,
         last_value(o.obs_value IGNORE NULLS)
             OVER (PARTITION BY g.key ORDER BY g.bucket_ts
                   ROWS UNBOUNDED PRECEDING) AS value,
         o.obs_value IS NOT NULL AS is_observed
  FROM grid g LEFT JOIN observed o
    ON g.key = o.key AND g.bucket_ts = o.bucket_ts
)
SELECT f.* FROM filled f
JOIN spans s ON f.key = s.key
WHERE f.bucket_ts < s.last_ts
"""


DELTA_OUT_SCHEMA = ("key long, ts timestamp, value double, delta double, "
                    "is_reset boolean, consumed double")
DELTA_STATE_SCHEMA = "last_ts long, last_value double, has_prev boolean"


def counter_deltas_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/timeseries.py::counter_deltas``: per
    reading, consumption delta vs the previous reading with meter-restart
    detection. State is (last ts, last value) per key; a key's first-ever
    reading seeds state and emits nothing (inner semantics, like batch).
    Readings older than the carried state are expired duplicates/laggards
    and drop."""

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        rows = [p for p in pdfs if not p.empty]
        if not rows:
            return
        pdf = (pd.concat(rows, ignore_index=True)
               .sort_values("ts").reset_index(drop=True))
        uid = key[0]
        if state.exists:
            last_us, last_v, has = state.get
        else:
            last_us, last_v, has = 0, 0.0, False

        out: list[tuple] = []
        for ts, v in zip(pdf["ts"], pdf["value"]):
            us = ts.value // 1000  # pandas ns -> micros
            if has and us < last_us:
                continue  # late arrival behind the carried state
            if has:
                delta = round(float(v) - last_v, 6)
                consumed = round(float(v) if delta < 0 else delta, 6)
                out.append((uid, ts, float(v), delta, delta < 0, consumed))
            last_us, last_v, has = us, float(v), True
        state.update((int(last_us), float(last_v), bool(has)))
        if out:
            yield pd.DataFrame(out, columns=[
                "key", "ts", "value", "delta", "is_reset", "consumed"])

    prepared = events_stream.select(
        events_stream["user_id"].alias("key"), "ts", "value")
    return prepared.groupBy("key").applyInPandasWithState(
        fn, DELTA_OUT_SCHEMA, DELTA_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


SCD2_OUT_SCHEMA = ("key long, state string, valid_from timestamp, "
                   "valid_to timestamp, n_events long")
SCD2_STATE_SCHEMA = ("cur_state string, valid_from_us long, n_events long, "
                     "last_us long, has_open boolean")


def scd2_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/pipeline.py::scd2_intervals``: live
    Type-2 dimension maintenance. State holds each key's OPEN interval
    (current state, its start, its event count); when an event with a
    different state arrives, the open interval closes — emitted with
    valid_to = the new interval's start — and the new one opens. The open
    interval itself is never emitted (its count can still grow), so the
    streamed output equals the batch SCD2 history minus each key's current
    row: the oracle states exactly that. Events strictly BEFORE the carried
    last timestamp drop (late data); equal-timestamp events process in
    (ts, state) order — the same deterministic tie order the batch
    operator and oracle use — so same-instant bursts count identically."""

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        rows = [p for p in pdfs if not p.empty]
        if not rows:
            return
        pdf = (pd.concat(rows, ignore_index=True)
               .sort_values(["ts", "event_type"]).reset_index(drop=True))
        uid = key[0]
        if state.exists:
            cur, vf_us, n, last_us, has = state.get
        else:
            cur, vf_us, n, last_us, has = "", 0, 0, -1, False

        out: list[tuple] = []
        for ts, st in zip(pdf["ts"], pdf["event_type"]):
            us = ts.value // 1000
            if has and us < last_us:
                continue
            if not has:
                cur, vf_us, n, has = st, us, 1, True
            elif st == cur:
                n += 1
            else:
                out.append((uid, cur,
                            pd.Timestamp(vf_us * 1000),
                            pd.Timestamp(us * 1000), int(n)))
                cur, vf_us, n = st, us, 1
            last_us = us
        state.update((str(cur), int(vf_us), int(n), int(last_us), True))
        if out:
            yield pd.DataFrame(out, columns=[
                "key", "state", "valid_from", "valid_to", "n_events"])

    prepared = events_stream.select(
        events_stream["user_id"].alias("key"), "ts", "event_type")
    return prepared.groupBy("key").applyInPandasWithState(
        fn, SCD2_OUT_SCHEMA, SCD2_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


INTERP_OUT_SCHEMA = ("key long, bucket_ts timestamp, value double, "
                     "is_observed boolean")
INTERP_STATE_SCHEMA = ("open_bucket long, open_sum double, open_cnt long, "
                       "prev_bucket long, prev_value double")


def interpolate_stream(events_stream: DataFrame,
                       bucket_seconds: int = 3600) -> DataFrame:
    """Streaming twin of ``operators/timeseries.py::interpolate_gaps``
    (linear fill). Interpolation needs the NEXT observed value, so a gap
    run can only emit when the observed bucket that CLOSES it finalizes:
    when bucket c closes (a later bucket arrived), the operator emits the
    gaps between the previously-closed observed bucket and c — lerped
    between their means — then c itself. Each key's newest bucket stays
    open, and the gaps ahead of it stay unemitted (their right wall isn't
    final). Streamed output therefore equals the batch interpolation cut at
    each key's second-largest observed bucket — exactly what the oracle
    states, value-checking the deferred-emission state machine.

    State per key is five scalars; fills truncate (floor on the scaled
    double) exactly like batch — see interpolate_gaps on engine round()
    tie divergence."""
    import math

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        rows = [p for p in pdfs if not p.empty]
        if not rows:
            return
        pdf = pd.concat(rows, ignore_index=True)
        uid = key[0]
        epoch_s = pdf["ts"].astype("int64") // 10**9
        buckets = (epoch_s // bucket_seconds) * bucket_seconds
        agg = (pd.DataFrame({"b": buckets, "v": pdf["value"]})
               .groupby("b")["v"].agg(["sum", "count"]).sort_index())

        if state.exists:
            ob, osum, ocnt, prevb, prevv = state.get
        else:
            ob, osum, ocnt, prevb, prevv = -1, 0.0, 0, -1, 0.0

        out: list[tuple] = []
        for b, row in agg.iterrows():
            b = int(b)
            if ob == -1:
                ob, osum, ocnt = b, float(row["sum"]), int(row["count"])
                continue
            if b == ob:
                osum += float(row["sum"])
                ocnt += int(row["count"])
                continue
            if b < ob:  # late across batches: expired, dropped
                continue
            vc = round(osum / ocnt, 6)
            if prevb != -1:
                span = ob - prevb
                g = prevb + bucket_seconds
                while g < ob:
                    frac = (g - prevb) / span
                    fill = math.floor(
                        (prevv + (vc - prevv) * frac) * 1e6) / 1e6
                    out.append((uid, g, fill, False))
                    g += bucket_seconds
            out.append((uid, ob, vc, True))
            prevb, prevv = ob, vc
            ob, osum, ocnt = b, float(row["sum"]), int(row["count"])

        state.update((int(ob), float(osum), int(ocnt),
                      int(prevb), float(prevv)))
        if out:
            res = pd.DataFrame(
                out, columns=["key", "bucket_ts", "value", "is_observed"])
            res["bucket_ts"] = pd.to_datetime(res["bucket_ts"], unit="s")
            res = res.sort_values(["bucket_ts"]).reset_index(drop=True)
            yield res

    prepared = events_stream.select(
        events_stream["user_id"].alias("key"), "ts", "value")
    return prepared.groupBy("key").applyInPandasWithState(
        fn, INTERP_OUT_SCHEMA, INTERP_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


def interpolate_stream_oracle_sql(bucket: str = "hour") -> str:
    """Batch linear interpolation cut at each key's second-largest observed
    bucket (the last one the stream can close)."""
    return f"""
WITH observed AS (
  SELECT user_id AS key, date_trunc('{bucket}', ts) AS bucket_ts,
         round(avg(value), 6) AS obs_value
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT key, min(bucket_ts) AS first_ts, max(bucket_ts) AS last_ts
  FROM observed GROUP BY 1
), cutoff AS (
  SELECT key, max(bucket_ts) AS second_last
  FROM observed o
  WHERE bucket_ts < (SELECT max(bucket_ts) FROM observed o2
                     WHERE o2.key = o.key)
  GROUP BY 1
), grid AS (
  SELECT key, unnest(generate_series(first_ts, last_ts,
                                     INTERVAL 1 {bucket})) AS bucket_ts
  FROM spans
), joined AS (
  SELECT g.key, g.bucket_ts, o.obs_value,
         CASE WHEN o.obs_value IS NOT NULL THEN g.bucket_ts END AS obs_ts
  FROM grid g LEFT JOIN observed o
    ON g.key = o.key AND g.bucket_ts = o.bucket_ts
), walls AS (
  SELECT key, bucket_ts, obs_value,
         last_value(obs_value IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bucket_ts
                   ROWS UNBOUNDED PRECEDING) AS prev_v,
         last_value(obs_ts IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bucket_ts
                   ROWS UNBOUNDED PRECEDING) AS prev_t,
         first_value(obs_value IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bucket_ts
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS next_v,
         first_value(obs_ts IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bucket_ts
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS next_t
  FROM joined
)
SELECT w.key, CAST(w.bucket_ts AS TIMESTAMP) AS bucket_ts,
       CASE WHEN obs_value IS NOT NULL THEN obs_value
            ELSE floor((prev_v + (next_v - prev_v)
                        * (CAST(epoch(w.bucket_ts) - epoch(prev_t) AS DOUBLE)
                           / CAST(epoch(next_t) - epoch(prev_t) AS DOUBLE)))
                       * 1000000.0) / 1000000.0
       END AS value,
       obs_value IS NOT NULL AS is_observed
FROM walls w
JOIN cutoff c ON w.key = c.key
WHERE w.bucket_ts <= c.second_last
"""
