"""As-of join — Spark has no native one; composed from union + window
(the shuffle-efficient recipe: one shuffle on the key, no range-join blowup).

``asof_join(left, right)``: for each left row, the latest right row of the
same key with ``right.ts <= left.ts`` (inner semantics — unmatched left rows
drop, like DuckDB's ASOF JOIN which serves as the oracle).

How: tag both inputs, union, and take ``last_value(payload) IGNORE NULLS``
over (key ORDER BY ts, right-before-left) — right rows carry payload, left
rows carry null, so the running last_value at each left row is exactly the
as-of match. This scales as one window over one shuffle; the alternative
(range join) rewrites into O(n*m) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload_cols: tuple[str, ...] = (),
              prefix: str = "asof_") -> DataFrame:
    """Inner as-of join: left rows + most recent right payload at/before
    their timestamp. ``payload_cols`` are the right-side columns carried over
    (renamed ``{prefix}{col}``); the right timestamp arrives as
    ``{prefix}ts``."""
    carry = list(payload_cols) + [right_ts]

    l_tag = left.select(
        F.col(on), F.col(left_ts).alias("__t"), F.lit(0).alias("__is_right"),
        F.struct(*[F.lit(None).alias("__x")]).alias("__dummy"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(
            right.select(F.struct(*carry).alias("s")).schema["s"].dataType
        ).alias("__payload"),
    ).drop("__dummy")
    r_tag = right.select(
        F.col(on), F.col(right_ts).alias("__t"), F.lit(1).alias("__is_right"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__left"),
        F.struct(*carry).alias("__payload"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts -> `>=` as-of semantics
    w = (Window.partitionBy(on)
         .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = (
        unioned
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter((F.col("__is_right") == 0) & F.col("__match").isNotNull())
    )
    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__match.{c}").alias(f"{prefix}{c}")
                 for c in payload_cols]
    out_cols.append(F.col(f"__match.{right_ts}").alias(f"{prefix}ts"))
    return matched.select(*out_cols)
