"""Incremental sketch maintenance — streaming HLL register merge.

The batch sketches in ``operators/sketch.py`` are mergeable by
construction: an HLL register table combines by ``max(max_rho)`` per
(group, register) cell, so per-micro-batch sketches fold into a
maintained register table without ever touching previously-seen raw
data. This module wires that property into Structured Streaming via
``foreachBatch``: each micro-batch is sketched (bounded ``2**p`` rows
per group) and merged into the at-rest register table; re-delivered
batches are absorbed because ``max`` is idempotent, so the maintained
sketch is exactly-once under at-least-once delivery.

At 100 TB: the stream state is the register table itself —
``groups × 2**p`` rows regardless of ingest volume — and each merge
shuffles only that bounded table plus one micro-batch's sketch. The
estimate read from the maintained table equals the batch estimate over
the union of all micro-batches (asserted e2e in
tests/test_streaming_ops.py), because register merge is associative
and commutative.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.utils import AnalysisException

from remote_storage_adapter_spark.operators.sketch import hll_registers


def merge_hll_state(batch_df, state_path: str, key_col: str,
                    group_cols: Sequence[str] = (), *,
                    p: int = 12) -> None:
    """Fold one batch of raw rows into the register table at
    ``state_path`` (creating it on first use). Idempotent: replaying
    a batch cannot raise any register (``max`` merge)."""
    spark = batch_df.sparkSession
    new = hll_registers(batch_df, key_col, group_cols, p=p)
    try:
        cur = spark.read.parquet(state_path)
        merged = (
            cur.unionByName(new)
            .groupBy(*group_cols, "register")
            .agg(F.max("max_rho").alias("max_rho"))
        )
    except AnalysisException:  # first batch: no state yet
        merged = new
    # cut lineage before overwriting the path the plan reads from;
    # the materialized sketch is tiny (≤ groups × 2**p rows) so the
    # local checkpoint is bounded regardless of batch size
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        state_path)


def stream_hll_maintain(
    spark: SparkSession,
    raw_path: str,
    state_path: str,
    checkpoint_dir: str,
    *,
    schema: StructType,
    key_col: str,
    group_cols: Sequence[str] = (),
    p: int = 12,
    available_now: bool = False,
    max_files_per_trigger: int = 64,
):
    """Maintain an HLL register table over a landing directory; returns
    the StreamingQuery. Read the estimate at any time with
    ``hll_estimate(spark.read.parquet(state_path), group_cols, p=p)``.
    """
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(raw_path)
    )
    writer = (
        raw.writeStream
        .foreachBatch(lambda df, _id: merge_hll_state(
            df, state_path, key_col, group_cols, p=p))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
