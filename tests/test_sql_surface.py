"""The Spark-SQL surface must return exactly what its DataFrame twin
returns — same engine, two entry points (SURVEY §7.1)."""

from __future__ import annotations

import pytest

from insight_de_smart_grid_spark.plans.registry import QUERIES
from insight_de_smart_grid_spark.plans.sql_surface import SQL_QUERIES, run_sql
from tests.conftest import SF_ORACLE


def _canon(df):
    cols = sorted(df.columns)
    rows = {tuple(repr(r[c]) for c in cols) for r in df.collect()}
    return rows


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_sql_text_matches_dataframe_twin(spark, name):
    twin = SQL_QUERIES[name][1]
    sql_df = run_sql(spark, SF_ORACLE, name)
    df_df = QUERIES[twin].fn(spark, SF_ORACLE)
    assert _canon(sql_df) == _canon(df_df), name
