"""remote_storage_adapter_spark — a PySpark-native time-series engine.

A from-scratch reimplementation of the *capabilities* of
``weetime/remote_storage_adapter`` (a Prometheus remote-write/remote-read
bridge whose query engine is ClickHouse), re-expressed Spark-first:

- ingest: Structured Streaming / batch pipeline flattening Prometheus
  remote-write samples into a date-partitioned columnar table
  (reference: ``main.go:377-394``, ``clickhouse/client.go:120-157``)
- query: a Python planner compiling Prometheus label matchers + time
  range into a Catalyst expression tree with dynamic time-bucket
  downsampling and quantile aggregation
  (reference: ``clickhouse/query.go:32-127``)
- rollup: config-driven tiered retention jobs with last-write-wins
  versioning (reference: GraphiteMergeTree ``graphite_rollup``,
  ``README.md:66-86``)
- extensions: large-scale training-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal columns) that the
  100 TB design target calls for.

No code is copied from the reference; file:line citations in
docstrings point at the behavior being reproduced.
"""

__version__ = "0.1.0"
