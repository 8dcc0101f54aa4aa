"""WARC record source (ISO 28500 / WARC 1.1) — the container format
of web-crawl corpora (CommonCrawl ships response archives this way):
each archive is a sequence of records, each a ``WARC/x.y`` version
line + CRLF header block + ``Content-Length`` payload block; HTTP
``response`` records carry a full HTTP message as the block. The
CommonCrawl convention compresses each record as its own gzip MEMBER
so archives stay seekable — ``zlib`` (stdlib) decodes that directly.

:func:`warc_records` explodes a binary column of archives into typed
record rows via Arrow-batched ``mapInPandas`` — partition-preserving
(no shuffle; each archive parses where it landed), per-ARCHIVE ``err``
quarantine (a hostile blob yields one error row, never a stage
abort — the same contract as ``multimodal.decode_media``). Reference
parity: the reference engine has no crawl surface (``main.go`` is a
metrics adapter); this is part of the task brief's
training-data-pipeline extension, the ingestion step in front of
``web.html_to_text`` → ``documents``.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: decompressed-size cap per archive — a gzip bomb must quarantine,
#: not OOM the worker (the r7 zlib-bomb lesson).
MAX_ARCHIVE_BYTES = 1 << 28


def _gunzip_members(p: bytes, max_bytes: int) -> bytes:
    """Concatenate ALL gzip members (CC writes one per record)."""
    out = bytearray()
    while p:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(p, max_bytes + 1 - len(out))
        if len(out) > max_bytes or d.unconsumed_tail:
            raise ValueError("WARC: decompressed archive exceeds cap")
        out += d.flush()
        if not d.eof:
            # a truncated/corrupt member returns partial bytes with
            # EMPTY unused_data — without this check the tail records
            # silently vanish instead of quarantining the archive
            raise ValueError("WARC: truncated gzip member")
        p = d.unused_data
    return bytes(out)


def _parse_warc(p: bytes, max_bytes: int = MAX_ARCHIVE_BYTES):
    """(headers-dict, block-bytes) per record. Raises ValueError on
    structurally lying bytes — the operator quarantines per archive."""
    if p[:2] == b"\x1f\x8b":
        p = _gunzip_members(p, max_bytes)
    recs = []
    i = 0
    while i < len(p):
        while p[i:i + 2] == b"\r\n":  # inter-record separators
            i += 2
        if i >= len(p):
            break
        eol = p.find(b"\r\n", i)
        if eol < 0:
            raise ValueError("WARC: truncated version line")
        if not p[i:eol].startswith(b"WARC/"):
            raise ValueError("WARC: bad version line")
        i = eol + 2
        hdrs = {}
        last_key = None
        while True:
            eol = p.find(b"\r\n", i)
            if eol < 0:
                raise ValueError("WARC: truncated header block")
            line = p[i:eol]
            i = eol + 2
            if line == b"":
                break
            if line[:1] in (b" ", b"\t") and last_key is not None:
                # folded continuation line (leading SP/HT — legal in
                # WARC 1.0, present in legacy crawls): extends the
                # previous header's value, there is no colon to split
                hdrs[last_key] += b" " + line.strip()
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError("WARC: malformed header line")
            last_key = k.strip().lower()
            hdrs[last_key] = v.strip()
        try:
            clen = int(hdrs[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC: missing/bad Content-Length")
        if clen < 0 or i + clen > len(p):
            raise ValueError("WARC: lying Content-Length")
        recs.append((hdrs, p[i:i + clen]))
        i += clen
    return recs


def _split_http(block: bytes):
    """(status, content-type, body) of an HTTP message block; (None,
    None, block) when it isn't one (e.g. a warcinfo block)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    sep = block.find(b"\r\n\r\n")
    head, body = (block, b"") if sep < 0 else (block[:sep],
                                               block[sep + 4:])
    lines = head.split(b"\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def _s(hdrs, key):
    v = hdrs.get(key)
    return v.decode("latin-1") if v is not None else None


WARC_SCHEMA = T.StructType(
    [
        T.StructField("src_id", T.LongType(), True),
        T.StructField("rec_idx", T.IntegerType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("err", T.StringType(), True),
    ]
)


def warc_records(df: DataFrame, *, id_col: str = "src_id",
                 payload_col: str = "payload",
                 max_bytes: int = MAX_ARCHIVE_BYTES,
                 min_tasks: int | None = None) -> DataFrame:
    """Explode WARC archives (plain or per-member gzip) into typed
    record rows: WARC type/URI/date/content-type plus, for HTTP
    ``response`` records, the status / Content-Type / body of the
    contained HTTP message. One quarantine row (``err`` set, ``body``
    NULL) per unparsable archive. Output is record-proportional; the
    archive bytes never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["src_id", "rec_idx", "warc_type", "target_uri",
                "warc_date", "content_type", "http_status",
                "http_content_type", "body", "err"]
        for pdf in batches:
            rows = []
            # NB: the select below aliased the id column to src_id
            for sid, p in zip(pdf["src_id"], pdf[payload_col]):
                try:
                    # a NULL id (pandas NaN) must quarantine its row,
                    # not abort the stage
                    sid = int(sid)
                except (TypeError, ValueError):
                    sid = None
                try:
                    if p is None:
                        raise ValueError("NULL payload")
                    for idx, (hdrs, block) in enumerate(
                            _parse_warc(bytes(p), max_bytes)):
                        status, hct, body = _split_http(block)
                        rows.append((
                            sid, idx, _s(hdrs, b"warc-type"),
                            _s(hdrs, b"warc-target-uri"),
                            _s(hdrs, b"warc-date"),
                            _s(hdrs, b"content-type"),
                            status, hct, body, None))
                except Exception as e:  # noqa: BLE001 — quarantine
                    # is the contract (same argument as decode_media)
                    rows.append((sid, None, None, None, None, None,
                                 None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=cols)

    from remote_storage_adapter_spark.operators.skew import (
        ensure_min_tasks,
    )

    return ensure_min_tasks(
        df.select(F.col(id_col).alias("src_id"), F.col(payload_col)),
        min_tasks, payload_col=payload_col,
    ).mapInPandas(run, schema=WARC_SCHEMA)
