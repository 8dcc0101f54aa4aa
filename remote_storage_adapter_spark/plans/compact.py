"""Partition compaction — the background-merge half of MergeTree.

The reference's storage engine continuously merges small insert parts
into large sorted parts (ClickHouse MergeTree background merges; the
rollup config rides on those merges). Our ingest equivalent: every
micro-batch appends one or more small parquet files per date partition;
this job rewrites a partition's small files into ``target_files``
sorted files (SURVEY §4.3.3 — operational, not a query rewrite).

Idempotent and partition-atomic: the rewrite stages into a temp
directory and swaps, so readers never observe a half-compacted
partition; re-running on an already-compacted partition is a no-op
rewrite. At 100 TB this runs per-partition (independent, trivially
schedulable in parallel) and only on partitions whose file count
exceeds the threshold.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from remote_storage_adapter_spark.schema import PARTITION_COLUMN, SORT_COLUMNS


def partition_file_counts(table_path: str, *,
                          partition_col: str = PARTITION_COLUMN) -> dict:
    """{partition_dirname: parquet file count} for a local table path.

    ``partition_col`` defaults to the metrics table's date column;
    pass ``"cell"`` / ``"bucket"`` to audit the ANN index layouts
    (similarity.ivf_write_index / lsh_index), whose append paths
    create one file per touched partition per batch."""
    out = {}
    for d in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, d)
        if d.startswith(f"{partition_col}=") and os.path.isdir(full):
            out[d] = sum(1 for f in os.listdir(full)
                         if f.endswith(".parquet"))
    return out


def _uncommitted_batch_ids(table_path: str, part_dir: str) -> set:
    """Batch ids with ``b<id>-`` prefixed files in ``part_dir`` but no
    commit marker in any ``_*ledger*`` directory at the table root —
    the residue of an exactly-once publish attempt that crashed
    mid-protocol and has not replayed yet. Empty when the table has no
    ledger directory (plain append tables: nothing to protect)."""
    import re

    ledgers = [
        os.path.join(table_path, d) for d in os.listdir(table_path)
        if d.startswith("_") and "ledger" in d
        and os.path.isdir(os.path.join(table_path, d))
    ]
    if not ledgers:
        return set()
    staged = set()
    for f in os.listdir(part_dir):
        m = re.match(r"b(\d{12})-", f)
        if m:
            staged.add(int(m.group(1)))
    committed = set()
    for ledger in ledgers:
        for f in os.listdir(ledger):
            m = re.match(r"batch-(\d{12})$", f)
            if m:
                committed.add(int(m.group(1)))
    return staged - committed


def compact_partition(spark: SparkSession, table_path: str,
                      partition_value: str, *,
                      target_files: int = 1,
                      min_files: int = 2,
                      partition_col: str = PARTITION_COLUMN,
                      sort_cols: tuple = SORT_COLUMNS) -> Optional[int]:
    """Rewrite one partition into ``target_files`` sorted files.

    Defaults compact the metrics table (date partitions, (name, ts)
    file sort); pass ``partition_col="cell", sort_cols=("vec_id",)``
    to compact an appended ANN index's cell directories (the
    ivf_append/lsh_append docstrings' maintenance step — appends add
    one file per touched partition per batch, and probe latency
    degrades with file count until compaction merges them).

    Refuses to compact a partition holding an UNCOMMITTED
    exactly-once batch (``b<id>-*`` files with no ledger marker): the
    rewrite would fold the crashed attempt's partial rows into
    anonymous part files, and the batch's eventual replay — whose
    recovery sweep finds partials by that filename prefix — would
    then double-publish them. Replay (or abandon) the batch first;
    committed batches compact freely (the ledger, not the file name,
    is the commit record — locked in test_ingest).

    Returns the new file count, or None if below ``min_files`` (no-op).
    """
    part_dir = os.path.join(table_path,
                            f"{partition_col}={partition_value}")
    n_files = sum(1 for f in os.listdir(part_dir)
                  if f.endswith(".parquet"))
    if n_files < min_files:
        return None
    pending = _uncommitted_batch_ids(table_path, part_dir)
    if pending:
        raise RuntimeError(
            f"compact_partition: partition {partition_col}="
            f"{partition_value} holds uncommitted exactly-once "
            f"batch(es) {sorted(pending)} — replay them to completion "
            f"before compacting (merging their partial files would "
            f"break the replay's recovery sweep)")
    df = (
        spark.read.parquet(part_dir)
        .repartition(target_files)
    )
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    tmp_dir = part_dir + "._compact_tmp"
    df.write.mode("overwrite").parquet(tmp_dir)
    # atomic-ish local swap (object stores: write-new + repoint manifest;
    # Delta's OPTIMIZE does this transactionally — same semantics)
    old_dir = part_dir + "._compact_old"
    os.rename(part_dir, old_dir)
    os.rename(tmp_dir, part_dir)
    shutil.rmtree(old_dir)
    return sum(1 for f in os.listdir(part_dir) if f.endswith(".parquet"))


def compact_table(spark: SparkSession, table_path: str, *,
                  target_files: int = 1, min_files: int = 2,
                  partition_col: str = PARTITION_COLUMN,
                  sort_cols: tuple = SORT_COLUMNS) -> dict:
    """Compact every eligible partition; returns {partition: new_count}."""
    results = {}
    for part, n in partition_file_counts(
            table_path, partition_col=partition_col).items():
        if n >= min_files:
            value = part.split("=", 1)[1]
            results[part] = compact_partition(
                spark, table_path, value,
                target_files=target_files, min_files=min_files,
                partition_col=partition_col, sort_cols=sort_cols,
            )
    return results
