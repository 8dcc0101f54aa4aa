"""Byte-pair-encoding tokenizer: distributed counting, real merges.

The token-counting surface elsewhere in this engine approximates a
subword tokenizer (`text.bpe_ish_tokens` is a regex pre-tokenizer);
this module is the real thing — BPE per Sennrich et al. 2016
(arXiv:1508.07909), the algorithm behind the GPT-2/RoBERTa vocabularies:

- :func:`bpe_train` — learn a merge table from the corpus. The
  distributed part is the word-TYPE frequency table (one map-side-
  combined hash aggregate, vocabulary-bounded output); training then
  runs driver-side over the top ``max_word_types`` (type, count)
  pairs exactly like the reference implementation — the merge loop is
  inherently sequential (each merge depends on the last), and the
  model it produces is ``vocab_size`` string pairs, i.e. driver state
  of the same order as the IVF centroids or LR weights. 100 TB
  posture: the corpus is touched ONCE for counts; cap the collect
  with ``max_word_types`` (frequency top-k via TakeOrderedAndProject,
  never a global sort).
- :func:`bpe_segment` — distributed apply: per-token greedy
  lowest-rank merging inside an Arrow-batched ``mapInPandas`` with a
  per-batch memo over distinct tokens (Zipf makes the memo hit rate
  enormous), merges shipped in the task closure (``vocab_size``
  pairs). Partition-preserving, no shuffle; returns per-doc subword
  arrays + real token counts.

Training is iterative and the apply is a loop — neither is
SQL-expressible, so this family is pytest-locked (equality against an
independently-written in-test reference on the same corpus, plus the
reconstruction/determinism properties) rather than DuckDB-oracled,
per the SURVEY §8 contract for non-SQL operators.

Reference parity: the reference repo has no tokenizer surface — this
is training-data-pipeline extension work from the public paper above.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import nonempty_tokens

#: end-of-word sentinel (the Sennrich convention) — lets a merge
#: distinguish word-final from word-internal pairs and makes the
#: segmentation reversible.
EOW = "</w>"


def word_type_counts(docs: DataFrame, *, text_col: str = "text",
                     max_word_types: int = 50_000) -> list:
    """Corpus word-type frequency table, bounded: the ``max_word_types``
    most frequent (word, count) pairs (count-desc, word tie-break so
    the cut is deterministic), via one hash aggregate + top-k. This is
    the ONLY corpus-wide pass BPE training makes."""
    wc = (docs.select(F.explode(
        nonempty_tokens(F.col(text_col))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    rows = (wc.orderBy(F.desc("c"), F.col("w"))
            .limit(int(max_word_types)).collect())
    return [(r["w"], r["c"]) for r in rows]


def _pair_counts(types: dict) -> dict:
    counts: dict = {}
    for syms, c in types.items():
        for pair in zip(syms, syms[1:]):
            counts[pair] = counts.get(pair, 0) + c
    return counts


def _merge_word(syms: tuple, pair: tuple, joined: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(docs: DataFrame, *, num_merges: int = 1000,
              text_col: str = "text",
              max_word_types: int = 50_000) -> list:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge table ``[(left, right), ...]`` (rank = position) —
    feed it to :func:`bpe_segment`. Stops early when no pair occurs
    twice. Deterministic: ties on pair frequency break on the pair
    itself (lexicographic), matching the in-test reference."""
    wt = word_type_counts(docs, text_col=text_col,
                          max_word_types=max_word_types)
    types = {tuple(w) + (EOW,): c for w, c in wt}
    # incremental pair statistics (r8 review): rewriting every word
    # type and recounting every pair per merge is O(merges × total
    # symbols); instead only the types CONTAINING the merged pair are
    # rewritten, with their old pair contributions subtracted and the
    # new ones added — identical totals (exact integer arithmetic),
    # identical tie-breaks, a small Zipf fraction of the work.
    pc = _pair_counts(types)
    merges: list = []
    for _ in range(int(num_merges)):
        if not pc:
            break
        pair, cnt = max(pc.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break
        joined = pair[0] + pair[1]
        changed = [s for s in types
                   if pair in zip(s, s[1:])]
        for s in changed:
            c = types.pop(s)
            for pr in zip(s, s[1:]):
                pc[pr] -= c
                if pc[pr] <= 0:
                    del pc[pr]
            ns = _merge_word(s, pair, joined)
            types[ns] = types.get(ns, 0) + c
            for pr in zip(ns, ns[1:]):
                pc[pr] = pc.get(pr, 0) + c
        merges.append(pair)
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """One word → its BPE subwords under a trained merge table
    (greedy lowest-rank-first, the standard decode-time algorithm).
    Exposed for reuse and for the in-test reference comparison."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


BPE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("subwords", T.ArrayType(T.StringType()), False),
    T.StructField("n_bpe_tokens", T.LongType(), False),
])


def bpe_segment(docs: DataFrame, merges: Sequence, *,
                id_col: str = "doc_id", text_col: str = "text"
                ) -> DataFrame:
    """Distributed BPE apply: (id, text) → (id, subword array, real
    token count). Arrow-batched ``mapInPandas`` with a per-batch memo
    over distinct words (Zipf: most tokens repeat); the merge table
    rides the task closure. Partition-preserving, no shuffle;
    empty/NULL docs keep a row with an empty array (full-coverage
    contract)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        nonempty_tokens(F.col(text_col)).alias("toks"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            subs, ns = [], []
            for toks in pdf["toks"]:
                out = []
                for w in toks:
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        memo[w] = enc
                    out.extend(enc)
                subs.append(out)
                ns.append(len(out))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "subwords": subs, "n_bpe_tokens": ns})

    return base.mapInPandas(run, schema=BPE_SCHEMA)


def bpe_vocab(merges: Sequence) -> list:
    """The subword vocabulary a merge table induces: every merge's
    joined string, in rank order (base characters are implicit)."""
    return [a + b for a, b in merges]
