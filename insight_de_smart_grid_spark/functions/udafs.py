"""Python UDAF surface (SURVEY §2.9): the aggregate-function extension point.

The reference defines no UDAF; this module is the worked, tested example of
the Arrow grouped-aggregate API (``pandas_udf`` GROUPED_AGG) for the one
case built-in aggregates genuinely cannot express: order-statistic-of-
derived-values aggregates like the median absolute deviation, where the
derived values depend on a statistic of the same group.

Scale notes: a GROUPED_AGG pandas UDF materializes each GROUP as one Arrow
batch in Python — per-group memory is O(group size), fine for bounded
groups (per-meter readings), wrong for power-law groups. The plan is a
normal hash-partition on the group key (ObjectHashAggregate), so the
shuffle story matches any exact per-group order statistic; at 100 TB
prefer the sketch path (percentile_approx of |x - approx_median|) and keep
this as the exact verify twin — the same exact/approx pairing the engine
uses for count-distinct and quantiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def mad_udaf(v: pd.Series) -> float:
    """Median absolute deviation, interpolating medians (numpy default for
    even counts — matching DuckDB's ``mad()``), truncated to 1e-6 (floor on
    the scaled double — identical IEEE ops cross-engine; round() tie-breaks
    differ between engines on exact .xxxxxx5 values)."""
    a = v.to_numpy(dtype="float64")
    med = np.median(a)
    mad = np.median(np.abs(a - med))
    return float(np.floor(mad * 1e6) / 1e6)
