from streams_spark.sources.tables import load_table, register_views
from streams_spark.sources.event_log import event_log, EVENT_LOG_CTE

__all__ = ["load_table", "register_views", "event_log", "EVENT_LOG_CTE"]
