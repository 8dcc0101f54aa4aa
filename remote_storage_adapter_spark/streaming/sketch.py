"""Incremental sketch maintenance — streaming merges of the mergeable
sketch family.

The batch sketches in ``operators/sketch.py`` are mergeable by
construction — HLL registers combine by ``max(max_rho)`` per cell, CMS
counters by ``sum(cnt)``, Bloom bit sets by distinct union (bitwise
OR) — so per-micro-batch sketches fold into a maintained at-rest table
without ever touching previously-seen raw data. This module wires that
property into Structured Streaming via ``foreachBatch``: each
micro-batch is sketched (bounded rows however large the batch) and
merged into the state table. HLL and Bloom merges are idempotent
(max / set-union), so re-delivered batches are absorbed exactly-once
under at-least-once delivery; CMS ``sum`` is NOT replay-idempotent —
its exactly-once story is the checkpointed source offsets (a batch id
is only re-fed after a crash BEFORE the checkpoint commit, the
standard foreachBatch contract).

At 100 TB: the stream state is the sketch table itself — bounded by
the sketch parameters regardless of ingest volume — and each merge
shuffles only that bounded table plus one micro-batch's sketch. The
estimate read from the maintained table equals the batch estimate over
the union of all micro-batches (asserted e2e in
tests/test_streaming_ops.py), because every merge is associative and
commutative.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.utils import AnalysisException

from remote_storage_adapter_spark.operators.sketch import (
    bloom_sketch,
    cms_sketch,
    hll_registers,
)


def _merge_into(state_path: str, new, merge) -> None:
    """Read current state (if any), combine via ``merge``, overwrite.
    The lineage is cut (localCheckpoint) before overwriting the path
    the plan reads from; the materialized sketch is bounded by the
    sketch parameters, so the checkpoint is small regardless of batch
    size."""
    try:  # read.parquet resolves eagerly — missing path raises here
        cur = new.sparkSession.read.parquet(state_path)
        merged = merge(cur)
    except AnalysisException:  # first batch: no state yet
        merged = new
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        state_path)


def merge_hll_state(batch_df, state_path: str, key_col: str,
                    group_cols: Sequence[str] = (), *,
                    p: int = 12) -> None:
    """Fold one batch of raw rows into the register table at
    ``state_path`` (creating it on first use). Idempotent: replaying
    a batch cannot raise any register (``max`` merge)."""
    new = hll_registers(batch_df, key_col, group_cols, p=p)
    _merge_into(state_path, new, lambda cur: (
        cur.unionByName(new)
        .groupBy(*group_cols, "register")
        .agg(F.max("max_rho").alias("max_rho"))
    ))


def merge_cms_state(batch_df, state_path: str, key_col: str, *,
                    depth: int = 4, width: int = 1024) -> None:
    """Fold one batch into a count-min sketch table: cells sum."""
    new = cms_sketch(batch_df, key_col, depth=depth, width=width)
    _merge_into(state_path, new, lambda cur: (
        cur.unionByName(new)
        .groupBy("sketch_row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    ))


def merge_bloom_state(batch_df, state_path: str, key_col: str, *,
                      m_bits: int = 1 << 16, k: int = 4) -> None:
    """Fold one batch into a Bloom bit-set table: bitwise OR, spelled
    as distinct union of the sparse set-bit rows. Idempotent."""
    new = bloom_sketch(batch_df, key_col, m_bits=m_bits, k=k)
    _merge_into(state_path, new, lambda cur: (
        cur.unionByName(new).dropDuplicates(["bit"])
    ))


#: kind → (merge_fn, accepted kwargs) for stream_sketch_maintain
_MERGERS = {
    "hll": (merge_hll_state, ("group_cols", "p")),
    "cms": (merge_cms_state, ("depth", "width")),
    "bloom": (merge_bloom_state, ("m_bits", "k")),
}


def stream_sketch_maintain(
    spark: SparkSession,
    raw_path: str,
    state_path: str,
    checkpoint_dir: str,
    *,
    kind: str,
    schema: StructType,
    key_col: str,
    available_now: bool = False,
    max_files_per_trigger: int = 64,
    **sketch_kwargs,
):
    """Maintain a sketch table of the given ``kind`` ('hll' | 'cms' |
    'bloom') over a parquet landing directory; returns the
    StreamingQuery. Read the maintained table any time with the batch
    estimators (``hll_estimate`` / ``cms_estimate`` /
    ``bloom_contains``) — the at-rest shape is identical to the batch
    sketch's."""
    merge_fn, allowed = _MERGERS[kind]
    bad = set(sketch_kwargs) - set(allowed)
    if bad:
        raise TypeError(f"{kind} sketch takes {allowed}, got {sorted(bad)}")
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(raw_path)
    )
    writer = (
        raw.writeStream
        .foreachBatch(lambda df, _id: merge_fn(
            df, state_path, key_col, **sketch_kwargs))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
    return stream_sketch_maintain(
        spark, raw_path, state_path, checkpoint_dir, kind="hll",
        schema=schema, key_col=key_col, available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        group_cols=group_cols, p=p,
    )
