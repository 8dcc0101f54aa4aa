"""WARC record source (sources/warc.py). Ground truth archives are
hand-assembled byte literals straight from the ISO 28500 layout —
not built with the parser's own helpers."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from remote_storage_adapter_spark.sources import warc as WR


def _rec(wtype: str, block: bytes, extra: str = "") -> bytes:
    hdr = (f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
           f"WARC-Date: 2024-05-06T07:08:09Z\r\n{extra}"
           f"Content-Length: {len(block)}\r\n\r\n")
    return hdr.encode() + block + b"\r\n\r\n"


_HTTP = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
         b"\r\nServer: x\r\n\r\n<html><body>Hi</body></html>")
_ARCHIVE = (
    _rec("warcinfo", b"software: test\r\n",
         "Content-Type: application/warc-fields\r\n")
    + _rec("response", _HTTP,
           "WARC-Target-URI: https://example.com/a\r\n")
    + _rec("request", b"GET /a HTTP/1.1\r\n\r\n",
           "WARC-Target-URI: https://example.com/a\r\n")
)


def _df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p) if p is not None else None)
         for i, p in enumerate(payloads)],
        "src_id long, payload binary")


def _rows(spark, payloads, **kw):
    return sorted(
        (tuple(r) for r in
         WR.warc_records(_df(spark, payloads), **kw).collect()),
        key=lambda t: (t[0], t[1] if t[1] is not None else -1))


def test_warc_records_plain_and_gzip_members(spark):
    gz = b"".join(gzip.compress(m) for m in (
        _rec("warcinfo", b"software: test\r\n",
             "Content-Type: application/warc-fields\r\n"),
        _rec("response", _HTTP,
             "WARC-Target-URI: https://example.com/a\r\n"),
        _rec("request", b"GET /a HTTP/1.1\r\n\r\n",
             "WARC-Target-URI: https://example.com/a\r\n"),
    ))
    plain = _rows(spark, [_ARCHIVE])
    gzipped = _rows(spark, [gz])
    # identical records modulo src (gzip member boundaries invisible)
    assert [r[1:] for r in plain] == [r[1:] for r in gzipped]
    by_idx = {r[1]: r for r in plain}
    assert len(plain) == 3
    info = by_idx[0]
    assert info[2] == "warcinfo" and info[3] is None
    assert info[5] == "application/warc-fields"
    resp = by_idx[1]
    assert resp[2] == "response"
    assert resp[3] == "https://example.com/a"
    assert resp[4] == "2024-05-06T07:08:09Z"
    assert resp[6] == 200
    assert resp[7] == "text/html; charset=utf-8"
    assert bytes(resp[8]) == b"<html><body>Hi</body></html>"
    req = by_idx[2]
    assert req[2] == "request" and req[6] is None
    assert bytes(req[8]) == b"GET /a HTTP/1.1\r\n\r\n"
    assert all(r[9] is None for r in plain)


def test_warc_quarantine_per_archive(spark):
    lying = _ARCHIVE.replace(b"Content-Length: 16",
                             b"Content-Length: 9999", 1)
    bomb = gzip.compress(bytes(1 << 16))
    rows = _rows(spark, [_ARCHIVE, b"not warc at all", lying,
                         None, bomb], max_bytes=1 << 12)
    good = [r for r in rows if r[9] is None]
    bad = {r[0]: r[9] for r in rows if r[9] is not None}
    assert len(good) == 3 and {r[0] for r in good} == {0}
    assert "version line" in bad[1]
    assert "lying Content-Length" in bad[2]
    assert "NULL payload" in bad[3]
    assert "exceeds cap" in bad[4]


def test_warc_truncated_gzip_member_quarantines(spark):
    """A corrupt trailing gzip member must quarantine the ARCHIVE,
    not silently drop its tail records (pre-fix: decompress of the
    truncated member returned partial bytes with empty unused_data
    and the archive parsed to fewer records with no error)."""
    good = gzip.compress(_rec("warcinfo", b"software: t\r\n"))
    cut = good + gzip.compress(
        _rec("response", _HTTP,
             "WARC-Target-URI: https://example.com/a\r\n"))[:10]
    rows = _rows(spark, [cut])
    assert len(rows) == 1
    assert "truncated gzip member" in rows[0][9]


def test_warc_empty_and_separator_tolerance(spark):
    # leading/trailing extra CRLFs and an empty archive
    padded = b"\r\n\r\n" + _ARCHIVE + b"\r\n\r\n\r\n"
    assert len(_rows(spark, [padded])) == 3
    assert _rows(spark, [b""]) == []


def test_warc_folded_header_continuation(spark):
    """Folded continuation lines (leading SP/HT — legal WARC 1.0,
    present in legacy crawls) extend the previous header value
    instead of quarantining the whole archive on the missing colon."""
    body = b"<html>x</html>"
    folded = ("WARC/1.0\r\nWARC-Type: response\r\n"
              "WARC-Target-URI: https://example.com/very\r\n"
              " /long/path\r\n"          # SP continuation
              "WARC-Date: 2024-05-06T07:08:09Z\r\n"
              f"Content-Length: {len(body)}\r\n\r\n"
              ).encode() + body + b"\r\n\r\n"
    rows = _rows(spark, [folded])
    assert len(rows) == 1 and rows[0][9] is None
    assert rows[0][3] == "https://example.com/very /long/path"
    # a continuation BEFORE any header is still malformed
    bad = folded.replace(b"WARC-Type", b" fold-first\r\nWARC-Type", 1)
    rows = _rows(spark, [bad])
    assert len(rows) == 1 and "malformed header" in rows[0][9]


def test_warc_http_status_and_fallthrough():
    s, ct, body = WR._split_http(
        b"HTTP/1.1 404 Not Found\r\nContent-Type: a/b\r\n\r\nxyz")
    assert (s, ct, body) == (404, "a/b", b"xyz")
    s, ct, body = WR._split_http(b"software: x\r\n")
    assert (s, ct) == (None, None)
    # malformed status line: record survives with NULL status
    s, _ct, _b = WR._split_http(b"HTTP/1.1\r\n\r\n")
    assert s is None
