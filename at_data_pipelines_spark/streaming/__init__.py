from .ingest import (  # noqa: F401
    ann_index_maintenance_stream,
    create_ingest_tables,
    near_dup_ingest_stream,
)
from .events import (  # noqa: F401
    SESSION_TABLE_SCHEMA,
    dedup_stream,
    enrich_stream,
    purchase_attribution_stream,
    read_events_stream,
    repair_sessions,
    run_sessions_daily,
    running_user_stats,
    sessionize_stream,
    sessionize_to_lakehouse,
    stream_to_lakehouse,
    windowed_aggregation,
    windowed_distinct_users,
)
