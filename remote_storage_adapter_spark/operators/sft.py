"""SFT (instruction-tuning) data preparation: chat-template
rendering with loss-mask spans — the step between a cleaned
conversation corpus and a tokenizer: each (role, content) turn list
becomes ONE rendered training string plus the character spans of
every turn's content, so the trainer can mask loss to assistant
spans without re-parsing the template.

Pure Column expressions (``aggregate`` over the turns array — a
left fold building the rendered text and the running offsets in one
pass, JVM-side, no UDFs), so a SQL oracle can state the expected
output in closed form. Reference parity: the reference engine has no
SFT surface (``main.go`` is a metrics adapter); this extends the
task brief's training-data-pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default template markers — a neutral ChatML-like shape; every
#: marker is a parameter because real templates differ per model.
DEFAULT_MARKERS = {"system": "<|system|>", "user": "<|user|>",
                   "assistant": "<|assistant|>", "eot": "<|end|>"}

_SPAN_T = "array<struct<role:string,start:int,end:int>>"


def render_chat(turns: Column, *, markers: dict = DEFAULT_MARKERS,
                ) -> Column:
    """Render a ``array<struct<role string, content string>>`` turn
    list into a struct of

    - ``text``: ``{role marker}{content}{eot}`` per turn, concatenated
      in order;
    - ``spans``: one ``(role, start, end)`` per turn — the CONTENT
      character span (0-based, end-exclusive) inside ``text``, i.e.
      exactly the bytes a loss mask keeps for assistant turns.

    One ``aggregate`` fold over the array: text and offsets build in
    the same pass, so the spans are correct by construction for ANY
    role sequence and content (including empty turns; NULL content
    AND NULL role render as ``''`` per the text-operator contract —
    a dirty conversation row must not NPE a corpus render). Unknown
    roles use the role name itself as marker (``<|{role}|>``)."""
    eot = F.lit(markers["eot"])

    def prefix(role):
        p = F.lit(None).cast("string")
        for r, m in markers.items():
            if r == "eot":
                continue
            p = F.when(role == r, F.lit(m)).otherwise(p)
        return F.coalesce(p, F.concat(F.lit("<|"), role, F.lit("|>")))

    init = F.struct(
        F.lit("").alias("text"),
        F.array().cast(_SPAN_T).alias("spans"))

    def step(acc, t):
        role = F.coalesce(t.getField("role"), F.lit(""))
        content = F.coalesce(t.getField("content"), F.lit(""))
        pre = prefix(role)
        start = (F.length(acc.getField("text"))
                 + F.length(pre)).cast("int")
        end = (start + F.length(content)).cast("int")
        return F.struct(
            F.concat(acc.getField("text"), pre, content,
                     eot).alias("text"),
            F.concat(acc.getField("spans"), F.array(F.struct(
                role.alias("role"), start.alias("start"),
                end.alias("end")))).alias("spans"))

    return F.aggregate(turns, init, step)


def assistant_spans(rendered: Column) -> Column:
    """The loss-mask spans: only the assistant turns' content
    ranges, from a :func:`render_chat` struct."""
    return F.filter(rendered.getField("spans"),
                    lambda s: s.getField("role") == "assistant")
