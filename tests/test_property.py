"""Property-based tests: randomized inputs vs an independent in-memory
reference (pandas / plain Python), complementing the fixed-fixture DuckDB
oracles. Targets the operators with the trickiest edge semantics: as-of
join (ties, duplicates, unmatched rows) and interval join (boundary
inclusion)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from insight_de_smart_grid_spark.operators.asof import asof_join
from insight_de_smart_grid_spark.operators.interval_join import interval_join

# small domains force key collisions and timestamp ties
_key = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=20)

_left_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=25)
_right_rows = st.lists(st.tuples(_key, _ts, st.integers(0, 99)),
                       min_size=1, max_size=25)


def _ref_asof(left, right):
    """Reference: for each left row, the right row with max ts <= left.ts of
    the same key; among right ties on ts, the later payload in sort order
    (matches last_value over ts, is_right ordering — right dup at same ts:
    the one latest in (ts, payload) sort is NOT deterministic, so dedupe
    right to max payload per (key, ts) first)."""
    best = {}
    for k, ts, v in right:
        best[(k, ts)] = max(v, best.get((k, ts), -1))
    out = []
    for k, lts in left:
        cands = [(ts, v) for (kk, ts), v in best.items()
                 if kk == k and ts <= lts]
        if cands:
            mts = max(ts for ts, _ in cands)
            out.append((k, lts, mts, dict(cands)[mts]))
    return sorted(out)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(left=_left_rows, right=_right_rows)
def test_asof_join_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, float(t)) for k, t in left], "k long, ts double"
    ).selectExpr("k", "timestamp_seconds(ts) AS ts")
    # dedupe right to one payload per (key, ts): as-of among exact dup
    # timestamps is reference-ambiguous, the operator contract requires
    # unique (key, ts) on the right (enforced upstream by compaction)
    rbest = {}
    for k, t, v in right:
        rbest[(k, t)] = max(v, rbest.get((k, t), -1))
    rdf = spark.createDataFrame(
        [(k, float(t), v) for (k, t), v in rbest.items()],
        "k long, ts double, payload long"
    ).selectExpr("k", "timestamp_seconds(ts) AS ts", "payload")

    got = sorted(
        (r.k, r.ts.timestamp(), r.asof_ts.timestamp(), r.asof_payload)
        for r in asof_join(ldf, rdf, on="k",
                           payload_cols=("payload",)).collect())
    want = [(k, float(lt), float(mt), v)
            for k, lt, mt, v in _ref_asof(left, list(right))]
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(purchases=_left_rows, clicks=st.lists(
    st.tuples(_key, _ts), min_size=1, max_size=25))
def test_interval_join_matches_reference(spark, purchases, clicks):
    """Every (purchase, click) pair with click ts in (p.ts - 5s, p.ts] —
    the operator's documented bounds (exclusive lower, inclusive upper)."""
    p = spark.createDataFrame(
        [(i, k, float(t)) for i, (k, t) in enumerate(purchases)],
        "pid long, k long, pts double"
    ).selectExpr("pid", "k", "timestamp_seconds(pts) AS pts")
    c = spark.createDataFrame(
        [(i, k, float(t)) for i, (k, t) in enumerate(clicks)],
        "cid long, k long, cts double"
    ).selectExpr("cid", "k", "timestamp_seconds(cts) AS cts")

    got = sorted((r.pid, r.cid) for r in interval_join(
        p, c, on="k", left_ts="pts", right_ts="cts",
        lookback="5 seconds").collect())
    want = sorted(
        (pi, ci)
        for pi, (pk, pt) in enumerate(purchases)
        for ci, (ck, ct) in enumerate(clicks)
        if pk == ck and pt - 5 < ct <= pt)
    assert got == want


# --- sliding duty cycle: explode ≡ panes ≡ independent reference ----------

_duty_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=40),       # ts seconds
              st.integers(min_value=0, max_value=2),        # house key
              st.one_of(st.none(),                          # null power
                        st.integers(min_value=0, max_value=10))),
    min_size=1, max_size=30)


def _ref_duty(events, w_s, s_s, thr):
    """Independent reference: each event joins the W/S epoch-aligned
    sliding windows containing it; duty = count(power>thr)/count(power)
    with NULL powers excluded from both counts (c_all=0 -> None)."""
    agg: dict = {}
    for t, h, p in events:
        pane = (t // s_s) * s_s
        for k in range(w_s // s_s):
            ws = pane - k * s_s
            a = agg.setdefault((ws + w_s, str(h)), [0, 0])
            if p is not None:
                a[0] += 1
                if p > thr:
                    a[1] += 1
    return sorted(
        (te, h, (d / a) if a else None)
        for (te, h), (a, d) in agg.items())


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(events=_duty_rows)
def test_duty_cycle_pane_forms_match_reference(spark, events):
    """The round-7 flagship invariance, property-based: for random event
    sets (timestamp ties, pane boundaries, empty panes, all-NULL-power
    windows), Spark's explode form, the pane decomposition, AND an
    independent Python reference agree row-for-row — including the NULL
    ratio of zero-count windows and the exact IEEE quotient (same long
    counts divide on all three paths)."""
    from insight_de_smart_grid_spark.operators.duty_cycle import duty_cycle

    df = spark.createDataFrame(
        [(float(t), str(h), None if p is None else float(p))
         for t, h, p in events],
        "tsec double, house_id string, power double"
    ).selectExpr("timestamp_seconds(tsec) AS ts", "house_id", "power")

    def run(panes):
        return sorted(
            (int(r.time_end.timestamp()), r.house_id, r.duty_cycle)
            for r in duty_cycle(df, window="10 seconds",
                                slide="2 seconds", threshold=5.0,
                                keys=("house_id",),
                                panes=panes).collect())

    explode_form = run(False)
    assert explode_form == run(True)
    assert explode_form == _ref_duty(events, 10, 2, 5.0)
