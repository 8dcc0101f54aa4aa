"""Scalar function surface: label⇄tag codecs and backend wire codecs."""

from remote_storage_adapter_spark.functions.codecs import (  # noqa: F401
    labels_from_tags,
    metric_name,
    tags_from_labels,
)
