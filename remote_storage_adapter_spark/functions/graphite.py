"""Graphite path encoding (SURVEY W10/W11).

Behavioral spec from the reference (clean-room reimplementation):

- ``escape`` (graphite/escape.go:82-103): scan the UTF-8 bytes of the
  value; bytes ``. % / =`` → ``%XX`` (uppercase hex); bytes in
  ``(){},'"\\`` → prepend a backslash; other printable ASCII
  (0x21..0x7E) → copied; everything else (spaces, controls, non-ASCII)
  → ``%XX``.
- ``pathFromMetric`` (graphite/client.go:53-80): ``prefix`` +
  ``escape(name)`` then for each non-``__name__`` label in sorted
  order, ``.<label>.<escape(value)>``.
- line format (graphite/client.go:99): ``"<path> <value:%f> <time:%f>\\n"``
  with time = float seconds.

The byte-wise hex encoding cannot be expressed with Spark string
builtins, so the core is pure Python (golden-tested against the
reference's own fixtures) wrapped in an Arrow-batched pandas UDF for
the distributed path.
"""

from __future__ import annotations

from typing import Dict

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PERCENT_BYTES = frozenset(b".%/=")
_BACKSLASH_BYTES = frozenset(b"(){},'\"\\")


def escape(value: str) -> str:
    """Percent/backslash-escape a label value into Graphite-legal runes."""
    out = []
    for b in value.encode("utf-8"):
        if b in _PERCENT_BYTES:
            out.append("%%%02X" % b)
        elif b in _BACKSLASH_BYTES:
            out.append("\\" + chr(b))
        elif 0x21 <= b <= 0x7E:
            out.append(chr(b))
        else:
            out.append("%%%02X" % b)
    return "".join(out)


def path_from_metric(labels: Dict[str, str], prefix: str = "") -> str:
    """Sorted-label Graphite path: ``prefix + name + .label.value...``"""
    name = labels.get("__name__", "")
    parts = [prefix, escape(name)]
    for key in sorted(k for k in labels if k and k != "__name__"):
        parts.append(".%s.%s" % (key, escape(labels[key])))
    return "".join(parts)


def line(path: str, value: float, ts_ms: int) -> str:
    """Plaintext protocol line (graphite/client.go:99)."""
    return "%s %f %f\n" % (path, value, ts_ms / 1000.0)


@F.pandas_udf(T.StringType())
def escape_udf(values: pd.Series) -> pd.Series:
    return values.map(lambda v: escape(v) if v is not None else None)


def graphite_path(labels: Column, prefix: str = "") -> Column:
    """Column form of ``path_from_metric`` over a labels map column."""

    @F.pandas_udf(T.StringType())
    def _path(labels_s: pd.Series) -> pd.Series:
        return labels_s.map(
            lambda m: path_from_metric(m, prefix) if m is not None else None
        )

    return _path(labels)


def graphite_line(path: Column, val: Column, ts: Column) -> Column:
    """``format_string('%s %f %f\\n', ...)`` — JVM-side, W14."""
    return F.format_string(
        "%s %f %f\n", path, val, F.unix_timestamp(ts).cast("double")
    )
