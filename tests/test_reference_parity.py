"""Oracle-parity tests for every reference-shape query (SURVEY §2)."""

from __future__ import annotations

import pytest

from tests.oracle import check_registered

PARITY_QUERIES = [
    "rollup_1s",
    "rollup_reagg",
    "dash_total_power",
    "dash_top10_appliance",
    "dash_top10_house",
    "dash_timeseries_5s",
    "dash_two_level_split",
    "dash_filtered_split",
    "history_lookback",
    "duty_cycle_sliding",
    "events_json_extract",
    "enrich_labels",
    "synth_keys",
    # flush-sentinel streaming replays: complete append-mode window sets,
    # value-checked against the same oracles as their batch twins
    "streaming_duty_cycle",
    "streaming_rollup",
    "streaming_sessions",
    "streaming_interval_join",
    "streaming_topk",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    check_registered(spark, duck, name)
