"""OpenTSDB-safe string codec + /api/put request build (SURVEY W12/W13).

Behavioral spec (clean-room, from opentsdb/tagvalue.go:65-158):

- marshal: scan UTF-8 bytes; ``-./0-9A-Za-z`` copied; ``_`` → ``__``;
  ``:`` → ``_.``; anything else → ``_XX`` (uppercase hex).
- unmarshal: exact inverse (``__``→``_``, ``_.``→``:``, ``_XX``→byte).
- request (opentsdb/client.go:57-91): JSON
  ``{"metric": enc(name), "timestamp": unix_seconds, "value": v,
  "tags": {k: enc(v)}}`` with ``__name__`` excluded from tags.
"""

from __future__ import annotations

from typing import Dict

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def marshal(value: str) -> str:
    out = []
    for b in value.encode("utf-8"):
        c = chr(b)
        if ("-" <= c <= "9") or ("A" <= c <= "Z") or ("a" <= c <= "z"):
            out.append(c)
        elif c == "_":
            out.append("__")
        elif c == ":":
            out.append("_.")
        else:
            out.append("_%02X" % b)
    return "".join(out)


def unmarshal(encoded: str) -> str:
    """Inverse of :func:`marshal`; raises ValueError on bad escapes."""
    out = bytearray()
    i = 0
    data = encoded
    n = len(data)
    while i < n:
        c = data[i]
        if c != "_":
            out.extend(c.encode("utf-8"))
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("dangling escape at byte %d" % i)
        nxt = data[i + 1]
        if nxt == "_":
            out.append(ord("_"))
            i += 2
        elif nxt == ".":
            out.append(ord(":"))
            i += 2
        elif nxt in "0123456789ABCDEF":
            if i + 2 >= n or data[i + 2] not in "0123456789ABCDEF":
                raise ValueError("illegal escape sequence at byte %d" % (i + 1))
            out.append(int(data[i + 1 : i + 3], 16))
            i += 3
        else:
            raise ValueError("illegal escape sequence at byte %d" % (i + 1))
    return out.decode("utf-8")


def store_request(labels: Dict[str, str], value: float, ts_ms: int) -> dict:
    """Python-side /api/put body (dict; serialize with json.dumps)."""
    return {
        "metric": marshal(labels.get("__name__", "")),
        "timestamp": ts_ms // 1000,
        "value": value,
        "tags": {
            k: marshal(v) for k, v in labels.items() if k != "__name__"
        },
    }


@F.pandas_udf(T.StringType())
def marshal_udf(values: pd.Series) -> pd.Series:
    return values.map(lambda v: marshal(v) if v is not None else None)


@F.pandas_udf(T.StringType())
def unmarshal_udf(values: pd.Series) -> pd.Series:
    return values.map(lambda v: unmarshal(v) if v is not None else None)


def opentsdb_request(labels: Column, val: Column, ts: Column) -> Column:
    """Column form: JSON request body per sample (W13).

    Tag *keys* pass through unencoded (reference encodes only values —
    ``map[string]TagValue`` at opentsdb/client.go:66-74); values are
    marshalled. Output is a JSON string built JVM-side from a struct of
    pre-encoded pieces.
    """

    @F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def _enc_tags(labels_s: pd.Series) -> pd.Series:
        return labels_s.map(
            lambda m: {k: marshal(v) for k, v in m.items() if k != "__name__"}
            if m is not None
            else None
        )

    return F.to_json(
        F.struct(
            marshal_udf(F.element_at(labels, "__name__")).alias("metric"),
            (F.unix_timestamp(ts)).alias("timestamp"),
            val.alias("value"),
            _enc_tags(labels).alias("tags"),
        )
    )
