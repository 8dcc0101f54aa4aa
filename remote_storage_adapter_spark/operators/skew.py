"""Skew-mitigation helpers for hot series / heavy-hitter keys.

At 100 TB a handful of metric series can dominate (one noisy target
emitting at 1 ms cadence): any operator that materializes a whole
series in one task — ``collect_list`` assembly (A5), exact percentiles
— turns that key into a straggler. Algebraic aggregates (count/avg/
min/max/approx-percentile) are immune: Spark's partial aggregation
already combines map-side. For the holistic ones, these helpers salt
the hot key into ``n_salts`` sub-keys, aggregate the salted chunks in
parallel, then merge the (much smaller) per-chunk results.

Join skew is handled separately by AQE (``skewJoin.enabled`` is on in
session.tune); this module covers aggregation skew, which AQE does not
re-plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_min_tasks(df: DataFrame, min_tasks: int | None) -> DataFrame:
    """Parallelism floor for file-layout-bound Python stages: a
    mapInPandas source inherits the INPUT file layout (a 2-file
    landing directory ⇒ 2 tasks, 30 idle cores), so callers that are
    about to pay per-row Python (archive walks, media decode) can ask
    for at least ``min_tasks`` partitions. ``None`` (the default
    everywhere) respects the input layout — partition-preserving, no
    shuffle; a value only repartitions when the input has FEWER
    partitions, and that one bounded round-robin shuffle of
    (id, payload) is the explicit price of fair fan-out. At 100 TB a
    landing layout has thousands of files and this is a no-op."""
    if min_tasks is None:
        return df
    if min_tasks <= 0:
        raise ValueError(f"min_tasks must be positive, got {min_tasks}")
    if df.rdd.getNumPartitions() >= min_tasks:
        return df
    return df.repartition(min_tasks)


def salted(df: DataFrame, n_salts: int = 32,
           salt_col: str = "_salt") -> DataFrame:
    """Add a uniform deterministic salt derived from the row content.

    Hash-based (not ``rand()``) so retried tasks salt identically —
    required for exactly-once sinks and reproducible tests.
    """
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
               F.lit(n_salts)).cast("int"),
    )


def assemble_series_salted(flat: DataFrame, n_salts: int = 32) -> DataFrame:
    """Skew-proof A5 series assembly (same result as
    plans.read.assemble_series).

    Phase 1 groups by (name, tags, salt) and collects per-chunk sample
    arrays — a hot series spreads over ``n_salts`` tasks. Phase 2
    groups by (name, tags), flattens the ≤``n_salts`` chunk arrays and
    sorts once. The phase-2 rows carry pre-aggregated arrays, so the
    second shuffle moves the same data volume but never concentrates
    *work* (sorting chunk arrays is O(total log total) in one task —
    acceptable because the output row itself must hold the whole
    series; callers needing bounded rows use the step cap, O3).
    """
    chunked = (
        salted(flat.select("name", "tags", "t", "value"), n_salts)
        .groupBy("name", "tags", "_salt")
        .agg(
            F.collect_list(F.struct(F.col("t"), F.col("value")))
            .alias("chunk")
        )
    )
    return (
        chunked.groupBy("name", "tags")
        .agg(
            F.sort_array(
                F.flatten(F.collect_list(F.col("chunk")))
            ).alias("samples")
        )
    )


def heavy_hitters(df: DataFrame, keys: Sequence[str],
                  min_count: int = 1_000_000) -> DataFrame:
    """Keys whose row count exceeds ``min_count`` — the monitoring query
    an operator runs to decide what needs salting/isolation."""
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc())
    )
