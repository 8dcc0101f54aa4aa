"""events → canonical metrics adapter.

The driver's ``events`` table (event_id, ts, user_id, event_type,
value, props) plays the Prometheus sample stream (FIXTURES.md §6):
``event_type`` is the metric name, ``user_id`` a label, ``value`` the
sample value. This adapter produces the canonical at-rest shape
(schema.METRICS_SCHEMA) deterministically (``updated`` = ``ts`` so the
oracle can reproduce it; real ingest stamps ``current_timestamp`` —
operators/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from remote_storage_adapter_spark.functions.codecs import tags_from_labels
from remote_storage_adapter_spark.sources.tables import load_table


def metrics_from_events(events: DataFrame, keep=()) -> DataFrame:
    labels = F.map_from_arrays(
        F.array(F.lit("__name__"), F.lit("user_id")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return events.select(
        *[F.col(c) for c in keep],
        F.to_date("ts").alias("date"),
        F.col("event_type").alias("name"),
        tags_from_labels(labels).alias("tags"),
        labels.alias("labels"),
        F.col("value").alias("val"),
        F.col("ts").alias("ts"),
        F.col("ts").alias("updated"),
    )


def load_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics_from_events(load_table(spark, sf_dir, "events"))
