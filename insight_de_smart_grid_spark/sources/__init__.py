"""Sources and sinks (SURVEY §2.1)."""

from insight_de_smart_grid_spark.sources.tables import (
    TABLES,
    load_table,
    readings_view,
    READINGS_SQL_VIEW,
)

__all__ = ["TABLES", "load_table", "readings_view", "READINGS_SQL_VIEW"]
