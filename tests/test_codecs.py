"""Golden tests ported 1:1 from the reference's own unit tests
(SURVEY §5): Graphite escape/path, OpenTSDB marshal/unmarshal,
Influx line protocol, tags⇄labels codecs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from remote_storage_adapter_spark.functions import graphite, influx, opentsdb
from remote_storage_adapter_spark.functions.codecs import (
    labels_from_tags,
    tags_from_labels,
)


# --- Graphite escape: graphite/client_test.go:30-46 golden pairs ---

def test_graphite_escape_passthrough():
    assert graphite.escape("abzABZ019-+:!?") == "abzABZ019-+:!?"


def test_graphite_escape_symbols_backslashed():
    # symbols (){},'"\ get backslash-escaped
    assert graphite.escape("(){},'\"\\") == "\\(\\)\\{\\}\\,\\'\\\"\\\\"


def test_graphite_escape_percent_encoded():
    # . % / = and non-printables/non-ASCII percent-encode (uppercase hex)
    assert graphite.escape("%") == "%25"
    assert graphite.escape(".") == "%2E"
    assert graphite.escape("/") == "%2F"
    assert graphite.escape("=") == "%3D"
    assert graphite.escape(" ") == "%20"
    assert graphite.escape("日") == "%E6%97%A5"


def test_graphite_escape_control_char_zero_padded():
    # SURVEY §4.5.8: bytes < 0x10 get the two-digit %02X form (the
    # reference emits unpadded %X, graphite/escape.go:90,99, which its
    # own two-hex-digit unmarshal could never round-trip)
    assert graphite.escape("\x05") == "%05"
    assert graphite.escape("a\tb") == "a%09b"
    assert graphite.escape("\x0f\x10") == "%0F%10"


def test_opentsdb_marshal_control_char_round_trips():
    # SURVEY §4.5.8: _%02X keeps unmarshal an exact inverse for
    # control bytes (the reference's unpadded _%X cannot round-trip:
    # opentsdb/tagvalue.go:82 vs :111-158)
    assert opentsdb.marshal("\x05") == "_05"
    assert opentsdb.unmarshal("_05") == "\x05"
    s = "a\x01b\x0fc"
    assert opentsdb.unmarshal(opentsdb.marshal(s)) == s


def test_graphite_escape_doc_examples():
    # examples from graphite/escape.go doc comment
    assert graphite.escape("foo-bar-42") == "foo-bar-42"
    assert graphite.escape("foo_bar%42") == "foo_bar%2542"
    assert graphite.escape("http://example.org:8080") == "http:%2F%2Fexample%2Eorg:8080"
    # (escape.go's doc-comment example predates the code: the code
    # copies '@' / backslash-escapes "'" / percent-encodes '.')
    assert (
        graphite.escape("Björn's email: bjoern@soundcloud.com")
        == "Bj%C3%B6rn\\'s%20email:%20bjoern@soundcloud%2Ecom"
    )


def test_graphite_path_sorted_labels():
    # graphite/client_test.go:48-57 shape: prefix + name + sorted labels
    labels = {
        "__name__": "test:metric",
        "testlabel": "test:value",
        "b": "2",
        "a": "1",
    }
    path = graphite.path_from_metric(labels, prefix="prefix.")
    assert path == "prefix.test:metric.a.1.b.2.testlabel.test:value"


def test_graphite_line_format():
    assert graphite.line("p.m", 1.5, 123456789123) == "p.m 1.500000 123456789.123000\n"


# --- OpenTSDB codec: opentsdb/tagvalue_test.go:22-64 golden table ---

OPENTSDB_GOLDEN = [
    ("foo-bar-42", "foo-bar-42"),
    ("foo_bar_42", "foo__bar__42"),
    ("http://example.org:8080", "http_.//example.org_.8080"),
    ("日", "_E6_97_A5"),
    (
        "Björn's email: bjoern@soundcloud.com",
        "Bj_C3_B6rn_27s_20email_._20bjoern_40soundcloud.com",
    ),
]


@pytest.mark.parametrize("raw,encoded", OPENTSDB_GOLDEN)
def test_opentsdb_marshal(raw, encoded):
    assert opentsdb.marshal(raw) == encoded


@pytest.mark.parametrize("raw,encoded", OPENTSDB_GOLDEN)
def test_opentsdb_unmarshal_roundtrip(raw, encoded):
    assert opentsdb.unmarshal(encoded) == raw


def test_opentsdb_unmarshal_rejects_bad_escape():
    with pytest.raises(ValueError):
        opentsdb.unmarshal("_zz")


def test_opentsdb_store_request():
    # opentsdb/client_test.go:44-62: name encoded, __name__ excluded
    req = opentsdb.store_request(
        {"__name__": "test:metric", "test_label": "test:value"},
        1.23, 123456789123,
    )
    assert req == {
        "metric": "test_.metric",
        "timestamp": 123456789,
        "value": 1.23,
        "tags": {"test_label": "test_.value"},
    }


# --- Influx line protocol: influxdb/client_test.go:70-72 golden body ---

def test_influx_line_golden():
    line = influx.line(
        {"__name__": "testmetric", "test_label": "test_label_value1"},
        1.23, 123456789123,
    )
    assert line == "testmetric,test_label=test_label_value1 value=1.23 123456789123"


# --- tags⇄labels Catalyst codecs (clickhouse/tagvalue.go) ---

def test_tags_roundtrip(spark):
    df = spark.createDataFrame(
        [({"__name__": "m", "b": "2", "a": "1", "empty": ""},)],
        "labels map<string,string>",
    )
    out = df.select(
        tags_from_labels(F.col("labels")).alias("tags")
    ).select(
        F.col("tags"),
        labels_from_tags(F.col("tags")).alias("back"),
    ).first()
    # sorted, includes __name__ (tagvalue.go:22-30)
    assert out["tags"] == ["__name__=m", "a=1", "b=2", "empty="]
    # inverse drops empty values (tagvalue.go:32-49)
    assert out["back"] == {"__name__": "m", "a": "1", "b": "2"}


def test_tags_exclude_name_influx_variant(spark):
    df = spark.createDataFrame(
        [({"__name__": "m", "a": "1"},)], "labels map<string,string>"
    )
    out = df.select(
        tags_from_labels(F.col("labels"), include_name=False).alias("tags")
    ).first()
    assert out["tags"] == ["a=1"]


def test_labels_from_tags_skips_malformed(spark):
    df = spark.createDataFrame(
        [(["a=1", "malformed", "b=", "c=x=y"],)], "tags array<string>"
    )
    out = df.select(labels_from_tags(F.col("tags")).alias("l")).first()
    # malformed (no '=') and empty-value dropped; split on FIRST '=' only
    assert out["l"] == {"a": "1", "c": "x=y"}


def test_udf_forms_match_python(spark):
    values = ["foo_bar_42", "http://x:8080", "日", "a.b%c/d=e"]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = df.select(
        opentsdb.marshal_udf(F.col("v")).alias("o"),
        graphite.escape_udf(F.col("v")).alias("g"),
    ).collect()
    for row, v in zip(got, values):
        assert row["o"] == opentsdb.marshal(v)
        assert row["g"] == graphite.escape(v)


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_opentsdb_marshal_roundtrip_fuzz(s):
    # property: unmarshal ∘ marshal = identity for ANY unicode string
    from remote_storage_adapter_spark.functions.opentsdb import (
        marshal,
        unmarshal,
    )

    assert unmarshal(marshal(s)) == s


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_graphite_escape_output_is_graphite_safe(s):
    # property: escaped output never contains raw separators/controls
    from remote_storage_adapter_spark.functions.graphite import escape

    out = escape(s)
    assert "." not in out.replace("%2E", "")
    assert all(0x21 <= ord(c) <= 0x7E for c in out)
