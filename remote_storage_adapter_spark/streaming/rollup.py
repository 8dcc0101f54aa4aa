"""Incremental (streaming) tier rollup — watermarked window aggregation.

The batch jobs in plans/rollup.py reproduce GraphiteMergeTree's tiered
retention (README.md:66-86) as scheduled passes. This module is the
Structured-Streaming variant (SURVEY §2.9 T5 / §4.3): new raw files are
picked up as they land, bucketed into ``precision_s`` tumbling windows,
and finalized windows are appended to the tier table once the event-time
watermark passes them.

Semantics vs the batch tier job:

- late data within ``watermark`` is folded into its window before the
  window finalizes — same result as the batch job over the same rows;
- data later than the watermark is DROPPED by the streaming engine
  (the batch job would still absorb it on its next pass) — the
  watermark is the staleness bound an operator chooses;
- LWW versioning: the reference keeps the max-``updated`` row per
  (name, tags, ts) before averaging. A full streaming LWW needs
  per-key state; the streaming tier instead folds ``updated`` into
  ``max`` per window, which matches the batch output whenever ingest
  does not rewrite the same (name, tags, ts) with different values
  across micro-batches (the common case — rewrites are handled by the
  periodic batch tier pass, which is authoritative).

At 100 TB: the state store holds only open windows per series (bounded
by watermark ÷ precision per series); the shuffle is the same
groupBy(name, tags, window) the batch job pays, but only over each
micro-batch's new rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from remote_storage_adapter_spark.schema import METRICS_SCHEMA


def stream_rollup(
    spark: SparkSession,
    raw_path: str,
    out_path: str,
    checkpoint_dir: str,
    *,
    precision_s: int = 30,
    watermark: str = "10 minutes",
    agg: str = "avg",
    available_now: bool = False,
    max_files_per_trigger: int = 64,
):
    """Start the incremental rollup stream; returns the StreamingQuery."""
    raw = (
        spark.readStream.schema(METRICS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(raw_path)
    )
    agg_fn = getattr(F, agg)
    rolled = (
        raw.withWatermark("ts", watermark)
        .groupBy(
            F.window(F.col("ts"), f"{precision_s} seconds").alias("w"),
            F.col("name"),
            F.col("tags"),
        )
        .agg(
            agg_fn(F.col("val")).alias("val"),
            F.max(F.col("updated")).alias("updated"),
            F.first(F.col("labels")).alias("labels"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("date"),
            "name", "tags", "labels", "val",
            F.col("w.start").alias("ts"),
            "updated",
        )
    )
    writer = (
        rolled.writeStream.format("parquet")
        .outputMode("append")  # only watermark-finalized windows
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
