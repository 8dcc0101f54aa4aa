"""Streaming reference-index maintenance: fold landed document
batches into a materialized MinHash-LSH index
(operators.dedup.minhash_index / minhash_index_append) so
cross-corpus dedup joins always run against a current reference
corpus — the corpus is signed incrementally, batch by batch, never
re-signed.

Replay semantics: index appends are NOT idempotent (a re-appended
batch duplicates its postings, which fans out the signature join-back
into duplicate pairs), so each applied batch id is recorded in a
``{prefix}_applied`` ledger table AFTER its appends land, and
replayed batches are skipped — the same ledger pattern as the
exactly-once ingest sink (operators.ingest.write_metrics_exactly_once).
The ledger rides the index (a catalog table), not the stream
checkpoint, so even a fresh-checkpoint reprocess of the same landing
files skips already-applied batches (deterministic re-batching:
``availableNow`` + ``maxFilesPerTrigger=1`` feeds files in order).
Residual window: a crash BETWEEN the two table appends leaves a
half-applied batch that a replay would double — ``saveAsTable``
appends span two tables and are not atomic together; Delta's
multi-table transactions are the upgrade when available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from remote_storage_adapter_spark.operators.dedup import (
    cache_scope,
    minhash_index,
    minhash_index_append,
)


def apply_index_batch(batch_df: DataFrame, batch_id: int,
                      table_prefix: str, **index_kwargs) -> bool:
    """Apply one document batch to the index exactly once: bootstrap
    the index on first use, append otherwise, skip if the ledger
    shows this batch already applied. Returns True if applied."""
    spark = batch_df.sparkSession
    ledger = f"{table_prefix}_applied"
    bootstrapped = spark.catalog.tableExists(f"{table_prefix}_banded")
    if bootstrapped and spark.catalog.tableExists(ledger):
        from pyspark.sql import functions as F

        seen = (spark.table(ledger)
                .filter(F.col("batch_id") == batch_id).count())
        if seen:
            return False
    with cache_scope():
        if bootstrapped:
            minhash_index_append(batch_df, table_prefix,
                                 **index_kwargs)
        else:
            minhash_index(batch_df, table_prefix, **index_kwargs)
    spark.createDataFrame([(int(batch_id),)], "batch_id long") \
        .write.mode("append").saveAsTable(ledger)
    return True


def stream_minhash_index_maintain(
    spark: SparkSession,
    landing_dir: str,
    table_prefix: str,
    checkpoint_dir: str,
    *,
    schema: StructType,
    available_now: bool = False,
    max_files_per_trigger: int = 64,
    **index_kwargs,
):
    """Maintain a MinHash index over a parquet landing directory of
    documents; returns the StreamingQuery. ``index_kwargs`` =
    num_hashes/bands/shingle_n/mode/id_col/text_col/buckets, and must
    stay constant across the index's lifetime. Query the maintained
    index any time with minhash_lsh_join_indexed."""
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    writer = (
        raw.writeStream
        .foreachBatch(lambda df, bid: apply_index_batch(
            df, bid, table_prefix, **index_kwargs))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
