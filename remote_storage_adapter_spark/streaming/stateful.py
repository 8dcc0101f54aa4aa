"""Custom stateful streaming operator: per-series running aggregates.

The reference keeps no cross-request state (every remote-write request
is stateless, main.go:286-320); the serving layer it delegates to
(Prometheus itself) tracks per-series last-value/staleness. This
operator provides that capability Spark-side — a per-(name, series)
state machine maintained across micro-batches with
``applyInPandasWithState`` (Arrow-batched, grouped state API):

- ``n_samples``: cumulative sample count for the series,
- ``last_ts_ms`` / ``last_val``: the latest sample by event time,
  carried across batches (out-of-order samples within or across
  batches never regress it),
- ``sum_val``: running sum (mean = sum / n).

Emits one row per series per micro-batch that touched it (update
semantics). State size is O(#active series) — at 100 TB cardinality the
state store shards by the group key across executors, exactly how the
shuffle already distributes the groups.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from remote_storage_adapter_spark.functions.codecs import tags_from_labels

OUTPUT_SCHEMA = (
    "name string, series string, n_samples long, "
    "sum_val double, last_ts_ms long, last_val double"
)
STATE_SCHEMA = "n long, s double, lt long, lv double"


def _track(
    key: Tuple[str, str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, s, lt, lv = state.get
    else:
        n, s, lt, lv = 0, 0.0, None, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        s += float(pdf["val"].sum())
        imax = pdf["ts_ms"].idxmax()
        ts_max = int(pdf["ts_ms"].loc[imax])
        if lt is None or ts_max >= lt:
            lt = ts_max
            lv = float(pdf["val"].loc[imax])
    state.update((n, s, lt, lv))
    yield pd.DataFrame(
        {
            "name": [key[0]],
            "series": [key[1]],
            "n_samples": [n],
            "sum_val": [s],
            "last_ts_ms": [lt],
            "last_val": [lv],
        }
    )


def series_state(samples: DataFrame) -> DataFrame:
    """samples stream (ts_ms, name, labels, val) → per-series running
    state rows. ``series`` is the sorted-tags join (the reference's
    series identity, clickhouse/client.go:197)."""
    keyed = samples.select(
        "ts_ms", "name", "val",
        F.array_join(tags_from_labels(F.col("labels")), ",").alias("series"),
    )
    return keyed.groupBy("name", "series").applyInPandasWithState(
        _track,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
