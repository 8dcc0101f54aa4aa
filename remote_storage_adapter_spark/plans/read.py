"""Read-path planner: dynamic downsample + quantile agg + assembly.

Reproduces the reference's generated ClickHouse query
(clickhouse/query.go:17)::

    SELECT COUNT() AS cnt, (intDiv(toUInt32(ts), %d) * %d) * 1000 AS t,
           name, tags, quantile(0.75)(val) AS value
    FROM %s.%s WHERE date >= toDate(%d) AND ts >= toDateTime(%d)
                 AND ts <= toDateTime(%d) [AND matchers...]
    GROUP BY t, name, tags ORDER BY t

as a Catalyst plan: filter (partition-pruned, parquet-pushed) →
hash-aggregate (partial+final, map-side combine for count; quantile via
``percentile``/``percentile_approx``) → sort by bucket.

Step computation (clickhouse/query.go:13-15,48-58): ``step =
max((end-start)/8192, 10)`` seconds. The reference inverts the
subtraction (SURVEY §4.5.1) so its step is stuck at 10 s; we implement
the intended formula (``parity_mode`` reproduces the bug).

Series assembly (A5, clickhouse/client.go:183-223): grouped rows →
one row per series with a t-sorted samples array.

Multi-query union (M1, clickhouse/client.go:167-210): results of all
queries in a request are merged into a single result set.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remote_storage_adapter_spark.plans import matchers as M

MAX_SAMPLES = 8192  # clickhouse/query.go:13
MIN_STEP_S = 10     # clickhouse/query.go:14 (`period`)
QUANTILE = 0.75     # clickhouse/query.go:15


def compute_step_s(start_ms: int, end_ms: int,
                   max_samples: int = MAX_SAMPLES,
                   min_step_s: int = MIN_STEP_S,
                   parity_mode: bool = False) -> int:
    """Bucket width in seconds so ≤ ``max_samples`` buckets are returned."""
    start_s, end_s = start_ms // 1000, end_ms // 1000
    div = (start_s - end_s) if parity_mode else (end_s - start_s)
    return max(div // max_samples, min_step_s)


def bucket_ms(ts, step_s: int):
    """``(intDiv(toUInt32(ts), step) * step) * 1000`` — bucket start, ms."""
    epoch_s = ts.cast("long")
    return ((epoch_s - (epoch_s % F.lit(step_s))) * 1000).cast("long")


def read_query(df: DataFrame, q: "M.PromQuery", *,
               quantile: float = QUANTILE,
               exact_quantile: bool = False,
               parity_mode: bool = False) -> DataFrame:
    """Compile one PromQuery against the canonical metrics frame.

    Returns the flat shape ``(cnt, t, name, tags, value)``
    (clickhouse/query.go:17). ``exact_quantile`` switches
    ``percentile_approx`` (scale path, mergeable sketch ≙ ClickHouse's
    approximate ``quantile()``) to exact ``percentile`` (oracle path).
    """
    step = q.step_s or compute_step_s(q.start_ms, q.end_ms,
                                      parity_mode=parity_mode)
    filtered = M.apply(df, q, parity_mode=parity_mode)
    qfn = F.percentile if exact_quantile else F.percentile_approx
    return (
        filtered
        .groupBy(
            bucket_ms(F.col("ts"), step).alias("t"),
            F.col("name"),
            F.col("tags"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            qfn(F.col("val"), F.lit(quantile)).alias("value"),
        )
        .select("cnt", "t", "name", "tags", "value")
        .orderBy("t")
    )


def read_request(df: DataFrame, queries: Sequence["M.PromQuery"],
                 **kw) -> DataFrame:
    """M1: union all per-query results into one result set
    (clickhouse/client.go:212-223 collapses into Results[0]); distinct
    guards against overlapping query ranges double-reporting a bucket."""
    parts = [read_query(df, q, **kw) for q in queries]
    return reduce(DataFrame.unionByName, parts).dropDuplicates(
        ["t", "name", "tags"]
    )


def assemble_series(flat: DataFrame) -> DataFrame:
    """A5: flat buckets → one row per series with t-sorted samples.

    ``sort_array`` on an array of structs orders by the first field
    (``t``), reproducing the scan-order append at
    clickhouse/client.go:205-208 without a per-group sort shuffle.
    """
    return (
        flat.groupBy("name", "tags")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("t"), F.col("value")))
            ).alias("samples")
        )
    )


def to_read_response(assembled: DataFrame) -> dict:
    """§3.3 step 4 (clickhouse/client.go:212-223): assembled series →
    the remote-read response shape, all series collapsed into
    ``results[0]`` exactly as the reference does (its deliberate
    deviation from one-QueryResult-per-Query; SURVEY §4.5.7).

    Driver-side by design: this is the last hop before the protocol
    gateway protobuf-encodes, and the step cap (O3) bounds what
    ``collect`` can return (≤8192 samples/series).
    """
    series = []
    for row in assembled.collect():
        labels = [
            {"name": t.split("=", 2)[0], "value": t.split("=", 2)[1]}
            for t in row["tags"]
            if "=" in t and t.split("=", 2)[1] != ""
        ]
        series.append(
            {
                "labels": labels,
                "samples": [
                    {"timestamp": s["t"], "value": s["value"]}
                    for s in row["samples"]
                ],
            }
        )
    series.sort(key=lambda s: tuple(
        (l["name"], l["value"]) for l in s["labels"]
    ))
    return {"results": [{"timeseries": series}]}


def merge_sorted_dedup(a: DataFrame, b: DataFrame,
                       keys: Optional[Sequence[str]] = None) -> DataFrame:
    """M2: union two result sets, first-input-wins on duplicate
    timestamps (influxdb/client.go:287-308 ``mergeSamples``).

    The reference walks two sorted lists and keeps list-a's sample on
    equal timestamps; distributed form: tag each side with a priority
    and keep the min-priority row per (series, t) — deterministic,
    unlike a bare ``dropDuplicates``.
    """
    keys = list(keys or ["name", "tags", "t"])
    tagged = a.withColumn("_prio", F.lit(0)).unionByName(
        b.withColumn("_prio", F.lit(1))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col("_prio"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )
