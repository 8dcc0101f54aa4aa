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


def partition_file_counts(table_path: str) -> dict:
    """{partition_dirname: parquet file count} for a local table path."""
    out = {}
    for d in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, d)
        if d.startswith(f"{PARTITION_COLUMN}=") and os.path.isdir(full):
            out[d] = sum(1 for f in os.listdir(full)
                         if f.endswith(".parquet"))
    return out


def compact_partition(spark: SparkSession, table_path: str,
                      partition_value: str, *,
                      target_files: int = 1,
                      min_files: int = 2) -> Optional[int]:
    """Rewrite one date partition into ``target_files`` sorted files.

    Returns the new file count, or None if below ``min_files`` (no-op).
    """
    part_dir = os.path.join(table_path,
                            f"{PARTITION_COLUMN}={partition_value}")
    n_files = sum(1 for f in os.listdir(part_dir)
                  if f.endswith(".parquet"))
    if n_files < min_files:
        return None
    df = (
        spark.read.parquet(part_dir)
        .repartition(target_files)
        .sortWithinPartitions(*SORT_COLUMNS)
    )
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
                  target_files: int = 1, min_files: int = 2) -> dict:
    """Compact every eligible partition; returns {partition: new_count}."""
    results = {}
    for part, n in partition_file_counts(table_path).items():
        if n >= min_files:
            value = part.split("=", 1)[1]
            results[part] = compact_partition(
                spark, table_path, value,
                target_files=target_files, min_files=min_files,
            )
    return results
