"""InfluxDB line-protocol write shape (SURVEY W9/K3 capability parity).

Reference behavior (influxdb/client.go:71-112): measurement = metric
name, tags = labels minus ``__name__``, single field ``value``; NaN/Inf
rows are dropped before building points. The golden body fixture
(influxdb/client_test.go:70-72) is::

    testmetric,test_label=test_label_value1 value=1.23 123456789123

(timestamp in ms precision, tags sorted by key — influx client library
sorts tag keys when serializing).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ESC = str.maketrans({",": r"\,", " ": r"\ ", "=": r"\="})


def _escape_tag(s: str) -> str:
    return s.translate(_ESC)


def line(labels: Dict[str, str], value: float, ts_ms: int) -> str:
    """Pure-Python line builder (golden-tested)."""
    name = labels.get("__name__", "")
    tags = ",".join(
        "%s=%s" % (_escape_tag(k), _escape_tag(v))
        for k, v in sorted(labels.items())
        if k != "__name__"
    )
    head = name if not tags else "%s,%s" % (name, tags)
    # %g-style float rendering to match influx client's shortest-repr
    return "%s value=%s %d" % (head, repr(value), ts_ms)


def influx_lines(df: DataFrame) -> DataFrame:
    """Distributed line build over a samples frame (name, labels, val,
    ts_ms) — JVM-side except nothing: concat over sorted map entries."""
    tags = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(
                    F.map_filter(F.col("labels"), lambda k, _: k != "__name__")
                ),
                lambda e: F.concat_ws("=", e["key"], e["value"]),
            )
        ),
        ",",
    )
    head = F.when(tags == "", F.col("name")).otherwise(
        F.concat_ws(",", F.col("name"), tags)
    )
    return df.select(
        F.concat(
            head, F.lit(" value="), F.col("val").cast("string"),
            F.lit(" "), F.col("ts_ms").cast("string"),
        ).alias("line")
    )
