"""labels ⇄ tags codecs as pure Catalyst expressions (no Python UDFs).

Reference behavior:

- ``tagsFromMetric`` (clickhouse/tagvalue.go:22-30): emit ``"k=v"`` for
  **every** label *including* ``__name__``, sorted lexicographically.
- ``makeLabels`` (clickhouse/tagvalue.go:32-49): split each tag on the
  first ``=``; skip malformed tags (no ``=``) and tags with an **empty
  value**.
- ``metricName`` (clickhouse/tagvalue.go:14-19): the ``__name__`` label.
- Influx variant (influxdb/client.go:71-79): tags *exclude* ``__name__``.

Everything here stays JVM-side (whole-stage codegen) — these run per
ingested row at 100 TB scale, so a Python UDF is not acceptable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

METRIC_NAME_LABEL = "__name__"


def metric_name(labels: Column) -> Column:
    """``__name__`` from a labels map (clickhouse/tagvalue.go:14-19)."""
    return F.element_at(labels, METRIC_NAME_LABEL)


def tags_from_labels(labels: Column, include_name: bool = True) -> Column:
    """labels map → sorted ``array<string>`` of ``"k=v"``.

    Mirrors clickhouse/tagvalue.go:22-30 (``include_name=True``) and the
    Influx variant influxdb/client.go:71-79 (``include_name=False``).
    """
    if not include_name:
        labels = F.map_filter(labels, lambda k, _: k != METRIC_NAME_LABEL)
    entries = F.map_entries(labels)
    return F.array_sort(
        F.transform(entries, lambda e: F.concat_ws("=", e["key"], e["value"]))
    )


def labels_from_tags(tags: Column) -> Column:
    """sorted tags array → labels map, dropping malformed / empty-value
    tags (clickhouse/tagvalue.go:32-49)."""
    # SplitN(tag, "=", 2) semantics: split on the FIRST '=' only.
    # F.get (not getItem) → NULL on missing index under ANSI mode, which
    # is exactly the makeLabels skip-malformed behavior.
    structs = F.transform(
        tags,
        lambda t: F.struct(
            F.get(F.split(t, "=", 2), 0).alias("key"),
            F.get(F.split(t, "=", 2), 1).alias("value"),
        ),
    )
    valid = F.filter(
        structs,
        lambda s: s["value"].isNotNull() & (s["value"] != F.lit("")),
    )
    return F.map_from_entries(valid)


def series_key(tags: Column, sep: str = "ÿ") -> Column:
    """Deterministic per-series string key: tags joined on 0xff
    (clickhouse/client.go:197, influxdb/client.go:217-226)."""
    return F.array_join(tags, sep)
