"""Data sources: driver parquet tables + canonical metrics adapters."""

from remote_storage_adapter_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
)
from remote_storage_adapter_spark.sources.events import (  # noqa: F401
    metrics_from_events,
)
