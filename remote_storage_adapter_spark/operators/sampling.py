"""Deterministic sampling and dataset-split operators (training-data
pipelines, task brief: large-scale pipeline operations).

Everything here is hash-deterministic and window-free: membership is a
pure function of (salt, key), so re-runs, retries, and incremental
appends assign identically with NO shuffle, NO global sort, and no RNG
state to coordinate across executors — the only split/sample mechanism
that stays stable when the corpus is rewritten partition by partition
at 100 TB. The hash is the md5-derived 60-bit integer shared with the
dedup family (`operators/dedup.portable_hash64`), so any engine with
md5 reproduces the exact membership (the DuckDB oracles do).

- :func:`uniform_unit` — deterministic U[0,1) per key.
- :func:`hash_split` — train/val/test assignment by cumulative weight
  boundaries. Pass the duplicate-cluster representative as the key
  (``dedup_clusters`` output) to make the split leakage-safe: every
  member of a near-dup cluster lands in the SAME split, so the
  holdout can't be contaminated by a paraphrase of a training doc.
- :func:`stratified_sample` — per-stratum Bernoulli sampling with
  per-group rates (a dict) or one global rate; window-free (no
  per-group ranking), so it scales as a pure map.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from remote_storage_adapter_spark.operators.dedup import portable_hash64

#: 2^60 — portable_hash64's exclusive upper bound.
_HASH_SPAN = float(1 << 60)


def uniform_unit(key: Column, salt: str) -> Column:
    """Deterministic uniform draw in [0, 1) from (salt, key).

    ``portable_hash64(salt || '#' || key) / 2^60`` — pure double
    arithmetic on a 60-bit hash, bit-identical in any engine with md5
    and IEEE doubles (DuckDB twin:
    ``(('0x'||substr(md5(s),1,15))::BIGINT) / 1152921504606846976.0``).
    """
    return (
        portable_hash64(
            F.concat(F.lit(f"{salt}#"), key.cast("string"))
        ).cast("double") / F.lit(_HASH_SPAN)
    )


def hash_split(df: DataFrame, weights: Sequence[tuple],
               *, key: Union[str, Column], salt: str = "split",
               out_col: str = "split") -> DataFrame:
    """Assign every row to a named split by hashing ``key``.

    ``weights`` is an ordered sequence of ``(name, weight)``; weights
    are normalized, boundaries are cumulative, and the final split
    absorbs the remainder so float rounding can never leave a row
    unassigned. Rows with equal keys get equal splits — passing the
    dedup-cluster representative (``coalesce(cluster, id)``) as the
    key is the leakage-safe form.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(w for _, w in weights))
    if total <= 0:
        raise ValueError("weights must sum > 0")
    key_col = F.col(key) if isinstance(key, str) else key
    u = uniform_unit(key_col, salt)
    expr = F.lit(weights[-1][0])  # remainder → last split
    cum = 0.0
    conds = []
    for name, w in weights[:-1]:
        cum += w / total
        conds.append((name, cum))
    for name, bound in reversed(conds):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame,
                      fractions: Union[float, Mapping[str, float]],
                      *, strata_col: str, key: Union[str, Column],
                      salt: str = "sample",
                      default_fraction: float = 0.0) -> DataFrame:
    """Keep each row iff its deterministic draw falls under its
    stratum's rate — per-group downsampling (e.g. rebalance languages
    or sources) as a pure map: no shuffle, no per-group ranking
    window, stable under re-runs and appends.

    ``fractions``: one global float, or {stratum value: fraction} with
    ``default_fraction`` for unlisted strata.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    u = uniform_unit(key_col, salt)
    if isinstance(fractions, Mapping):
        rate = F.lit(float(default_fraction))
        for val, fr in sorted(fractions.items()):
            rate = F.when(F.col(strata_col) == F.lit(val),
                          F.lit(float(fr))).otherwise(rate)
    else:
        rate = F.lit(float(fractions))
    return df.filter(u < rate)
