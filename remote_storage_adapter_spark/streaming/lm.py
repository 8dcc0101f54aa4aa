"""Streaming reference-LM maintenance: fold landed document batches
into the accumulated unigram count table (operators.text.lm_table
shape) so quality filtering always scores against a current reference
(text.lm_score_against) — each document is counted exactly once, on
arrival.

The count merge is a plain ``sum`` — NOT replay-idempotent — so the
maintainer rides ``streaming.sketch._merge_into_once``: the
applied-batch ledger lives inside the state directory and commits
atomically with the merged counts in one swap rename. A batch re-fed
after a swap-then-crash-before-checkpoint-commit is skipped; state is
only ever the exact union of distinct applied batches.

At 100 TB: the state is the vocabulary table — sublinear in corpus
size — and each merge shuffles one micro-batch's counts plus that
table. Reading the maintained LM any time with
``spark.read.parquet(state_path)`` gives exactly the
``lm_table(union of applied batches)`` counts (asserted e2e in
tests/test_streaming_ops.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from remote_storage_adapter_spark.streaming.sketch import (
    _merge_into,
    _merge_into_once,
)


def merge_lm_state(batch_df, state_path: str, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   batch_id: int | None = None) -> bool:
    """Fold one document batch's unigram counts into the LM state at
    ``state_path`` (creating it on first use). Pass ``batch_id`` (the
    stream maintainer does) for exactly-once replay via the in-state
    ledger; without it a replayed batch double-counts. Returns True
    if this call merged the batch (False = ledger skip)."""
    from remote_storage_adapter_spark.operators.text import lm_table

    new = lm_table(batch_df, id_col=id_col, text_col=text_col)

    def merge(cur):
        return (
            cur.unionByName(new)
            .groupBy("term")
            .agg(F.sum("c").cast("long").alias("c"))
        )

    if batch_id is None:
        _merge_into(state_path, new, merge)
        return True
    return _merge_into_once(state_path, batch_id, new, merge)


def stream_lm_maintain(
    spark: SparkSession,
    landing_dir: str,
    state_path: str,
    checkpoint_dir: str,
    *,
    schema: StructType,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = False,
    max_files_per_trigger: int = 64,
):
    """Maintain the reference unigram LM over a parquet landing
    directory of documents; returns the StreamingQuery. Score any
    frame against the maintained state with
    ``text.lm_score_against(docs, spark.read.parquet(state_path))``.

    Replay ledgers key on the MICRO-BATCH ID, which is stable only
    under deterministic re-batching: a fresh-checkpoint reprocess must
    feed the same files in the same batch groups (``availableNow``
    with unchanged ``max_files_per_trigger`` over an unchanged landing
    directory — the tested shape). Restarting with a new checkpoint
    AFTER new files landed regroups batches under already-committed
    ids and silently skips them — resume the original checkpoint
    (normal operation) or start a fresh state/index path."""
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    writer = (
        raw.writeStream
        .foreachBatch(lambda df, bid: merge_lm_state(
            df, state_path, id_col=id_col, text_col=text_col,
            batch_id=bid))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
