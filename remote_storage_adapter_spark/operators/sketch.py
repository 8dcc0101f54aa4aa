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

from pyspark.sql import DataFrame, Window
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


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005, J. Algorithms — public)
# ---------------------------------------------------------------------------

def _cms_cell(key, j: int, width: int):
    """Row-``j`` cell index for a key: salted portable hash mod width
    (DuckDB twin: ``('0x'||substr(md5(key || '#j'),1,15))::BIGINT %
    width``)."""
    return portable_hash64(F.concat(key.cast("string"),
                                    F.lit(f"#{j}"))) % width


def cms_sketch(df: DataFrame, key_col: str, *,
               depth: int = 4, width: int = 1024) -> DataFrame:
    """Build a count-min frequency sketch: ``depth × width`` counters,
    returned as (sketch_row, cell, cnt) rows.

    One explode(depth) + one hash aggregate; the sketch is at most
    ``depth * width`` rows TOTAL however large the input — the
    fixed-size summary you persist per day/partition and merge by
    summing cells. Estimates are one-sided: est ≥ true count, and
    est ≤ true + εN with probability 1−δ (ε = e/width, δ = e^−depth).
    """
    rows = df.select(
        *[
            _cms_cell(F.col(key_col), j, width).alias(f"c{j}")
            for j in range(depth)
        ]
    )
    exploded = rows.select(
        F.posexplode(F.array(*[F.col(f"c{j}") for j in range(depth)]))
        .alias("sketch_row", "cell")
    )
    return exploded.groupBy("sketch_row", "cell").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str, *,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate frequencies for a candidate key set: min over the
    ``depth`` salted cells. ``keys`` is expected to be small (heavy-
    hitter candidates), so the probe side broadcasts; a key whose cell
    was never touched estimates 0.
    """
    probes = keys.select(
        F.col(key_col),
        F.posexplode(F.array(*[
            _cms_cell(F.col(key_col), j, width).alias(f"c{j}")
            for j in range(depth)
        ])).alias("sketch_row", "cell"),
    )
    joined = probes.join(sketch, ["sketch_row", "cell"], "left") \
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    return joined.groupBy(key_col).agg(
        F.min("cnt").cast("long").alias("cms_est")
    )


# ---------------------------------------------------------------------------
# fixed-boundary histogram quantile sketch
# ---------------------------------------------------------------------------

def hist_sketch(df: DataFrame, value_col: str,
                group_cols: Sequence[str] = (), *,
                lo: float, hi: float, bins: int = 128) -> DataFrame:
    """Equi-width histogram sketch: (group, bin, cnt) counters over
    fixed ``[lo, hi)`` boundaries; out-of-range values clamp into the
    edge bins (documented bias — pick bounds that cover the domain).

    Mergeable by summing per-bin counts, so per-partition/per-day
    histograms union into one; at most ``bins`` rows shuffle per group
    however large the input — the same scale contract as the HLL and
    CMS sketches. Unlike ``approx_percentile``'s private buffers the
    sketch is a plain table any engine reproduces.
    """
    x = F.col(value_col).cast("double")
    width = (hi - lo) / bins
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("long")
    bin_ = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)).cast("int")
    return (
        df.where(x.isNotNull() & ~F.isnan(x))
        .select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin").agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(hist: DataFrame, qs: Sequence[float],
                   group_cols: Sequence[str] = (), *,
                   lo: float, hi: float, bins: int = 128) -> DataFrame:
    """Quantile estimates from a histogram sketch: per group and per
    ``q``, find the bin where the running count crosses ``q·N`` and
    interpolate linearly inside it (the classic histogram_quantile —
    max error = one bin width).

    The ranking window here is NOT a scale concern: it runs over the
    already-collapsed sketch (≤ ``bins`` rows per group), not the
    data. All boundary arithmetic is plain doubles on integer counts,
    identical in any engine.
    """
    width = (hi - lo) / bins
    wcum = (
        Window.partitionBy(*group_cols).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    base = hist.select(
        *group_cols, "bin", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("n"),
    )
    exploded = base.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    tgt = F.col("q") * F.col("n")
    sel = exploded.where(
        (F.col("cum") >= tgt) & ((F.col("cum") - F.col("cnt")) < tgt)
    )
    val = (
        F.lit(float(lo)) + F.lit(width) * F.col("bin")
        + F.lit(width) * (tgt - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    )
    return sel.select(*group_cols, "q", F.round(val, 6).alias("hist_q"))


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970, CACM — public)
# ---------------------------------------------------------------------------

def bloom_sketch(df: DataFrame, key_col: str, *,
                 m_bits: int = 1 << 16, k: int = 4) -> DataFrame:
    """Set-membership sketch: the DISTINCT set bit positions of a
    ``m_bits``-wide Bloom filter with ``k`` salted hash functions —
    stored sparse as (bit) rows, at most ``m_bits`` however large the
    input. Merge two filters by unioning their bit sets (bitwise OR).

    Guarantees: NO false negatives ever; false-positive rate
    ≈ (1 − e^(−k·n/m))^k. Spark's own ``bloom_filter_agg`` is
    engine-private; salted md5 bits reproduce anywhere, so membership
    answers are oracle-checkable like the rest of the sketch family.
    """
    bits = F.array(*[
        _cms_cell(F.col(key_col), j, m_bits).alias(f"b{j}")
        for j in range(k)
    ])
    return (
        df.select(F.explode(bits).alias("bit"))
        .dropDuplicates(["bit"])
    )


def bloom_contains(sketch: DataFrame, keys: DataFrame, key_col: str, *,
                   m_bits: int = 1 << 16, k: int = 4) -> DataFrame:
    """Probe a Bloom sketch: ``bloom_hit = 1`` iff all ``k`` bits of
    the key are set. The sketch side is bounded (≤ ``m_bits`` rows) so
    it broadcasts; the probe is a map-side semi-join + one count
    aggregate per key — no full-table shuffle of the probed corpus.
    """
    from pyspark.sql.functions import broadcast

    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[
            _cms_cell(F.col(key_col), j, m_bits) for j in range(k)
        ])).alias("bit"),
    )
    hits = (
        probes.join(broadcast(sketch), "bit", "left_semi")
        .groupBy(key_col).agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
        keys.select(key_col).dropDuplicates([key_col])
        .join(hits, key_col, "left")
        .select(
            key_col,
            F.when(F.coalesce("_hits", F.lit(0)) == k, F.lit(1))
            .otherwise(F.lit(0)).alias("bloom_hit"),
        )
    )
