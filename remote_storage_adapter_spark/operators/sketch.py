"""Cardinality sketches (training-pipeline extension): a portable
HyperLogLog distinct-count estimator.

Why not ``approx_count_distinct``: Spark's built-in HLL++ is great in
production but its register hashing is engine-private, so nothing else
can verify it. This implementation derives registers from md5
(:func:`portable_hash64`) so ANY engine reproduces the estimate
bit-for-bit — the oracle checks the actual estimator output, not just
row counts.

Scale story (the reason HLL exists): the shuffle carries at most
``m = 2**p`` (register, max-rho) rows **per group** regardless of input
size — counting distinct over 100 TB moves kilobytes. The register
table is the sketch: partial aggregates merge by ``max`` per register,
so per-day/per-partition sketches union and re-aggregate without
touching the raw data (Flajolet et al. 2007, AofA — public algorithm).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remote_storage_adapter_spark.operators.dedup import portable_hash64

#: hash width in bits (15 md5 nibbles — see portable_hash64)
HASH_BITS = 60


def hll_registers(df: DataFrame, key_col: str,
                  group_cols: Sequence[str] = (), *,
                  p: int = 12) -> DataFrame:
    """The mergeable sketch: per (group, register) max rank.

    ``register`` = low ``p`` hash bits; ``rho`` = 1 + leading-zero
    count of the remaining ``60 - p`` bits, computed exactly in integer
    arithmetic via the binary-digit length (``conv(x, 10, 2)`` —
    DuckDB twin ``bin(x)``), never floating ``log2``.
    """
    m = 1 << p
    rest_bits = HASH_BITS - p
    h = portable_hash64(F.col(key_col).cast("string"))
    rest = F.shiftright(h, p)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.conv(rest.cast("string"), 10, 2))
    )
    keyed = df.select(
        *group_cols,
        (h % m).alias("register"),
        rho.cast("int").alias("rho"),
    )
    return keyed.groupBy(*group_cols, "register").agg(
        F.max("rho").alias("max_rho")
    )


def hll_estimate(registers: DataFrame,
                 group_cols: Sequence[str] = (), *,
                 p: int = 12) -> DataFrame:
    """Collapse a register sketch to a cardinality estimate.

    The harmonic sum is kept EXACT as a 64-bit integer — each register
    contributes ``2**(B+1-max_rho)`` scaled units (B = 60 - p), empty
    registers ``2**(B+1)`` — so engines cannot diverge by summation
    order; only the final one-expression division and the small-range
    ``ln`` correction touch doubles, and the output is rounded to 4 dp.
    """
    m = 1 << p
    rest_bits = HASH_BITS - p
    scale = rest_bits + 1  # max_rho ≤ rest_bits + 1 → terms stay ≥ 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    term = F.pow(F.lit(2.0), F.lit(scale) - F.col("max_rho")).cast("long")
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("used"),
        F.coalesce(F.sum(term), F.lit(0)).alias("sum_used"),  # empty → 0
    )
    zeros = F.lit(m) - F.col("used")
    sum_scaled = F.col("sum_used") + zeros * F.lit(2 ** scale).cast("long")
    raw = (
        F.lit(alpha * m * m * float(2 ** scale)) / sum_scaled.cast("double")
    )
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("used").cast("long").alias("hll_registers_used"),
        F.round(est, 4).alias("hll_estimate"),
    )


def hll_distinct(df: DataFrame, key_col: str,
                 group_cols: Sequence[str] = (), *,
                 p: int = 12) -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group in one pass.

    Standard error ≈ 1.04 / sqrt(2**p) (~1.6 % at p=12). The
    intermediate :func:`hll_registers` output is the persistable /
    unionable sketch for incremental pipelines.
    """
    return hll_estimate(hll_registers(df, key_col, group_cols, p=p),
                        group_cols, p=p)
