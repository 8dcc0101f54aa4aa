"""Chat-template rendering + loss-mask spans (operators/sft.py).
Ground truth strings/spans are hand-computed from the documented
template, not derived from the expressions under test."""

from __future__ import annotations

from pyspark.sql import functions as F

from remote_storage_adapter_spark.operators import sft as S


def _render(spark, turns, **kw):
    df = spark.createDataFrame(
        [(turns,)],
        "turns array<struct<role string, content string>>")
    r = df.select(S.render_chat(F.col("turns"), **kw).alias("r"),
                  S.assistant_spans(
                      S.render_chat(F.col("turns"), **kw)).alias("a"))
    row = r.collect()[0]
    return (row["r"]["text"],
            [tuple(s) for s in row["r"]["spans"]],
            [tuple(s) for s in row["a"]])


def test_render_chat_text_and_spans(spark):
    text, spans, asst = _render(spark, [
        ("system", "be terse"),
        ("user", "hi"),
        ("assistant", "hello!"),
        ("user", "bye"),
        ("assistant", "ok"),
    ])
    expected = ("<|system|>be terse<|end|>"
                "<|user|>hi<|end|>"
                "<|assistant|>hello!<|end|>"
                "<|user|>bye<|end|>"
                "<|assistant|>ok<|end|>")
    assert text == expected
    # every span slices back to exactly its content
    contents = ["be terse", "hi", "hello!", "bye", "ok"]
    for (role, s, e), want in zip(spans, contents):
        assert text[s:e] == want, (role, s, e)
    assert [text[s:e] for _r, s, e in asst] == ["hello!", "ok"]
    assert all(r == "assistant" for r, _s, _e in asst)


def test_render_chat_edges(spark):
    # empty content, NULL content, unknown role marker
    text, spans, _ = _render(spark, [
        ("user", ""),
        ("assistant", None),
        ("tool", "x=1"),
    ])
    assert text == "<|user|><|end|><|assistant|><|end|><|tool|>x=1<|end|>"
    assert spans[0] == ("user", 8, 8)
    assert spans[1] == ("assistant", 28, 28)
    assert text[spans[2][1]:spans[2][2]] == "x=1"
    # empty conversation
    text0, spans0, asst0 = _render(spark, [])
    assert (text0, spans0, asst0) == ("", [], [])


def test_render_chat_custom_markers(spark):
    mk = {"system": "[S]", "user": "[U]", "assistant": "[A]",
          "eot": "\n"}
    text, spans, _ = _render(spark, [("user", "q"),
                                     ("assistant", "a")],
                             markers=mk)
    assert text == "[U]q\n[A]a\n"
    assert [text[s:e] for _r, s, e in spans] == ["q", "a"]


def test_render_chat_null_role_does_not_abort(spark):
    """A dirty row (NULL role / NULL turn struct) must render with
    the fallback marker, not NPE the executor (review regression)."""
    text, spans, _ = _render(spark, [
        ("user", "hi"), (None, "stray"), ("assistant", "ok")])
    assert text == "<|user|>hi<|end|><||>stray<|end|><|assistant|>ok<|end|>"
    assert text[spans[1][1]:spans[1][2]] == "stray"
