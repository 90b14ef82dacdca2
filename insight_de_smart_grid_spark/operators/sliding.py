"""Generic sliding-window aggregation with optional pane decomposition —
the duty-cycle flagship's scale trick (operators/duty_cycle.py, reference
``stream_processing/duty_cycle_avro.py:75-79``) generalized to ANY
algebraic aggregate.

Spark's sliding ``window()`` explodes every event into window/slide
copies before the partial aggregate. Any aggregate that is a semigroup
fold (sum, count, min, max — and avg as sum/count) decomposes over
epoch-aligned slide-width PANES ("No pane, no gain", Li et al. SIGMOD
Record '05): one tumbling pane aggregate touches each event once, then
the explode runs over the aggregated pane cardinality (bounded by
#keys x #panes) and a tiny combine folds window/slide pane partials per
window. Pane [b, b+S) lies wholly inside each of its windows, so
min-of-pane-mins IS the window min, sum-of-pane-sums the window sum —
row-identical to the explode form (floating-point sums are combined in a
different order, which is why the registered queries round like every
other double aggregate in this repo).

``panes="auto"`` reuses the duty-cycle density probe
(``duty_cycle.pane_density``): pane form above the measured crossover,
explode below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insight_de_smart_grid_spark.operators.duty_cycle import (
    PANE_DENSITY_CROSSOVER,
    _interval_seconds,
    pane_density,
)

# fn name -> (pane partial builder, final combiner over partials)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def sliding_agg(df: DataFrame,
                window: str = "10 minutes",
                slide: str = "2 minutes",
                aggs: tuple = (("sum_value", "sum", "value"),),
                keys: tuple = ("user_id",),
                time_col: str = "ts",
                panes: "bool | str" = False) -> DataFrame:
    """Sliding aggregation over ``aggs`` = ((out_name, fn, col), ...) with
    fn in {sum, count, min, max, avg}. Returns (time_end, *keys, *outs);
    ``avg`` is derived as exact sum/count of the SAME pane partials (never
    an average of averages)."""
    w_s = _interval_seconds(window)
    s_s = _interval_seconds(slide) if slide else None
    decomposable = (slide is not None and w_s and s_s
                    and w_s % s_s == 0 and w_s != s_s)
    if panes == "auto":
        panes = bool(decomposable) and (
            pane_density(df, s_s, time_col, keys)
            >= PANE_DENSITY_CROSSOVER)
    for name, fn, col in aggs:
        if fn not in _ALGEBRAIC and fn != "avg":
            raise ValueError(f"unsupported aggregate {fn!r} for {name!r} — "
                             "pane decomposition needs an algebraic fold "
                             "(sum/count/min/max/avg)")

    def finals(partial_of):
        """Final-combine expressions given partial_of(kind, col) -> Column."""
        out = []
        for name, fn, col in aggs:
            if fn == "avg":
                out.append((partial_of("sum", col)
                            / partial_of("count", col)).alias(name))
            else:
                out.append(partial_of(fn, col).alias(name))
        return out

    if panes and decomposable:
        # pane partials: one entry per distinct (kind, col) an output needs
        needed = set()
        for name, fn, col in aggs:
            needed.update({("sum", col), ("count", col)} if fn == "avg"
                          else {(fn, col)})
        partials = [(f"__p_{fn}_{col}", fn, col) for fn, col in sorted(needed)]
        pane = (df.groupBy(F.window(F.col(time_col), slide).alias("pane"),
                           *[F.col(k) for k in keys])
                .agg(*[_ALGEBRAIC[fn][0](F.col(col)).alias(p)
                       for p, fn, col in partials]))
        n_panes = w_s // s_s
        exploded = (pane
                    .select(F.col("pane.start").alias("pane_start"), *keys,
                            *[p for p, _, _ in partials],
                            F.explode(F.sequence(
                                F.lit(0), F.lit(n_panes - 1))).alias("k"))
                    .select((F.col("pane_start")
                             + F.expr(f"make_interval(0,0,0,0,0,0, {w_s})")
                             - F.col("k")
                             * F.expr(f"make_interval(0,0,0,0,0,0, {s_s})"))
                            .alias("time_end"),
                            *keys, *[p for p, _, _ in partials]))
        combined = {(fn, col): _ALGEBRAIC[fn][1](F.col(f"__p_{fn}_{col}"))
                    for _, fn, col in partials}
        agg = (exploded.groupBy("time_end", *[F.col(k) for k in keys])
               .agg(*[c.alias(f"__c_{fn}_{col}")
                      for (fn, col), c in combined.items()]))
        return agg.select(
            "time_end", *keys,
            *finals(lambda fn, col: F.col(f"__c_{fn}_{col}")))

    win = (F.window(F.col(time_col), window, slide) if slide
           else F.window(F.col(time_col), window))
    direct = {fn: _ALGEBRAIC[fn][0] for fn in ("sum", "count", "min", "max")}
    needed = set()
    for name, fn, col in aggs:
        needed.update({("sum", col), ("count", col)} if fn == "avg"
                      else {(fn, col)})
    agg = (df.groupBy(win.alias("window"), *[F.col(k) for k in keys])
           .agg(*[direct[fn](F.col(col)).alias(f"__c_{fn}_{col}")
                  for fn, col in sorted(needed)]))
    return agg.select(
        F.col("window.end").alias("time_end"), *keys,
        *finals(lambda fn, col: F.col(f"__c_{fn}_{col}")))


def sliding_stats_oracle_sql(window_seconds: int = 600,
                             slide_seconds: int = 120) -> str:
    """DuckDB twin of the registered events sliding-stats query: the
    generate_series window-starts join (the ``_SLIDING_ORACLE`` pattern),
    with doubles rounded to 6 like every double aggregate in this repo
    (pane and explode forms fold float sums in different orders)."""
    return f"""
WITH bounds AS (
  SELECT time_bucket(INTERVAL '{slide_seconds} seconds', min(ts))
           - INTERVAL '{window_seconds} seconds' AS lo,
         max(ts) AS hi
  FROM events
),
starts AS (
  SELECT unnest(generate_series(lo, hi,
                INTERVAL '{slide_seconds} seconds')) AS ws
  FROM bounds
)
SELECT s.ws + INTERVAL '{window_seconds} seconds' AS time_end,
       e.user_id,
       round(sum(e.value), 6) AS sum_value,
       count(e.value) AS n_vals,
       round(min(e.value), 6) AS min_value,
       round(max(e.value), 6) AS max_value,
       round(sum(e.value) / count(e.value), 6) AS avg_value
FROM events e
JOIN starts s ON e.ts >= s.ws
             AND e.ts < s.ws + INTERVAL '{window_seconds} seconds'
GROUP BY 1, 2
"""
