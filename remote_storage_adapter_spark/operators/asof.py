"""As-of join — the canonical time-series operator Spark lacks.

``asof_join(left, right)``: each left row is matched with the single
right row having the greatest ``right.ts <= left.ts`` within the same
key group (optionally within ``tolerance_ms``). The classic uses:
enrich trades with the prevailing quote; attach the latest metric
sample to an event.

Distributed strategy (no per-key loops, no range cross-join blowup):
tag both inputs, union them, and run ONE window pass per key ordered
by (ts, side) — ``last(value, ignorenulls=True)`` over the preceding
frame carries the latest right payload forward onto every left row.
Cost: a single shuffle on the key (same as any join), then a linear
in-partition sort-scan; skew behaves like any keyed window (salt the
hot key if needed — operators/skew.py).

Right rows tied on (key, ts) are pre-aggregated (max payload) so the
match is deterministic; right-at-equal-ts sorts BEFORE left, so an
exactly-simultaneous right row matches ("at or before").
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame, *,
               ts: str = "ts", start: str = "start", end: str = "end",
               bucket_s: int = 86400) -> DataFrame:
    """Interval-containment join without the naive theta-join blowup.

    Both sides are mapped to fixed time buckets — each interval explodes
    to the buckets it covers (typically a handful), each point to
    exactly one — so the physical join is an EQUI join on the bucket id
    (hash join, shuffle on a compact long), and the exact
    ``start <= ts <= end`` predicate filters afterwards. A point falls
    in one bucket, so no dedup is needed. Pick ``bucket_s`` near the
    median interval length: too small explodes intervals, too large
    degrades to per-bucket cross products.

    Returns points ⋈ intervals rows (inner); outer accounting is a
    join-back on the interval key at the caller.
    """
    pb = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts)) / bucket_s).cast("long")
    )
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / bucket_s)
                .cast("long"),
                F.floor(F.unix_timestamp(F.col(end)) / bucket_s)
                .cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, "_b")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_b")
    )


def asof_join(left: DataFrame, right: DataFrame, *,
              on: str = "ts",
              by: Sequence[str] = ("name",),
              value_cols: Optional[Sequence[str]] = None,
              tolerance_ms: Optional[int] = None,
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join. Output = all left columns + for each value col
    ``<col><suffix>`` (+ ``ts<suffix>``), null when no right row
    qualifies (or the match is older than ``tolerance_ms``)."""
    by = list(by)
    value_cols = list(value_cols or
                      [c for c in right.columns
                       if c not in by and c != on])
    # deterministic: one right row per (key, ts)
    r = (
        right.groupBy(*by, on)
        .agg(*[F.max(c).alias(c) for c in value_cols])
        .select(
            *by,
            F.col(on).alias("_ts"),
            F.lit(0).alias("_side"),
            F.struct(F.col(on).alias("_rts"), *value_cols).alias("_rpay"),
            *[F.lit(None).alias(f"_l_{c}")
              for c in left.columns if c not in by],
        )
    )
    l = left.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}")
          for c in left.columns if c not in by],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r.select(*l.columns))
        .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    m = F.col("_m")
    if tolerance_ms is not None:
        fresh = (
            (F.unix_millis(F.col("_ts")) - F.unix_millis(m["_rts"]))
            <= F.lit(tolerance_ms)
        )
        m = F.when(fresh, F.col("_m"))
    out_cols = (
        [F.col(b) for b in by]
        + [F.col(f"_l_{c}").alias(c)
           for c in left.columns if c not in by]
        + [m["_rts"].alias(f"{on}{suffix}")]
        + [m[c].alias(f"{c}{suffix}") for c in value_cols]
    )
    return matched.select(*out_cols)
