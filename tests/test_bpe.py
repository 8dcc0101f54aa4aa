"""BPE tokenizer (operators/bpe.py) — pytest-locked (non-SQL family).

Ground truth discipline: the reference trainer/encoder below is
written independently in the Sennrich et al. 2016 paper's own shape —
Counter-based pair statistics and APPLY-MERGES-IN-RANK-ORDER encoding
(the engine uses greedy lowest-rank-first; the two are equivalent for
a consistent merge table, so agreement cross-checks both).
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from remote_storage_adapter_spark.operators import bpe as B


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new newer"),
    (3, "wide wider widest low new"),
    (4, "the lowest of the low the lower"),
    (5, ""),
    (6, None),
]


def _ref_train(texts, num_merges):
    """Independent reference: Counter over word types, merge by regex-
    free tuple rewrite, SAME tie rule (count desc, pair max)."""
    words = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            if w:
                words[tuple(w) + (B.EOW,)] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best, cnt = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break
        joined = best[0] + best[1]
        new_words = Counter()
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
        merges.append(best)
    return merges


def _ref_encode(word, merges):
    """Reference apply: merges in RANK ORDER, each applied everywhere
    (the paper's apply_bpe shape — different algorithm, same result)."""
    syms = list(word) + [B.EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_train_matches_independent_reference(spark):
    docs = _docs(spark, CORPUS)
    got = B.bpe_train(docs, num_merges=30)
    exp = _ref_train([t for _i, t in CORPUS], 30)
    assert got == exp
    assert len(got) > 5  # the corpus genuinely supports merges


def test_train_deterministic(spark):
    docs = _docs(spark, CORPUS)
    assert B.bpe_train(docs, num_merges=12) == \
        B.bpe_train(docs, num_merges=12)


def test_segment_matches_reference_and_reconstructs(spark):
    docs = _docs(spark, CORPUS)
    merges = B.bpe_train(docs, num_merges=20)
    rows = {r["doc_id"]: r for r in B.bpe_segment(docs, merges).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}  # full coverage
    for did, text in CORPUS:
        words = [w for w in (text or "").lower().split() if w]
        exp = []
        for w in words:
            exp.extend(_ref_encode(w, merges))
        assert rows[did]["subwords"] == exp, did
        assert rows[did]["n_bpe_tokens"] == len(exp)
        # reconstruction: concatenating subwords restores the words
        assert "".join(exp) == "".join(w + B.EOW for w in words)


def test_greedy_equals_rank_order_on_adversarial_words():
    """The two apply algorithms must agree even on words with
    overlapping merge opportunities."""
    merges = [("a", "b"), ("b", "c"), ("ab", "c"), ("c", B.EOW)]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["abc", "abcabc", "aabbcc", "cab", "bca", "abab"]:
        assert B.encode_word(w, ranks) == _ref_encode(w, merges), w


def test_unseen_characters_stay_single_symbols(spark):
    merges = B.bpe_train(_docs(spark, CORPUS), num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    out = B.encode_word("zzqx", ranks)
    assert "".join(out) == "zzqx" + B.EOW
    # nothing merged: no trained merge covers these chars (except
    # possibly EOW attachment if some (x, EOW) pair was learned)
    assert all(len(s) <= max(len(a + b) for a, b in merges)
               for s in out)


def test_word_type_cap_is_frequency_topk(spark):
    docs = _docs(spark, [(1, "aa aa aa bb bb cc")])
    wt = B.word_type_counts(docs, max_word_types=2)
    assert wt == [("aa", 3), ("bb", 2)]


def test_vocab_in_rank_order(spark):
    merges = B.bpe_train(_docs(spark, CORPUS), num_merges=8)
    assert B.bpe_vocab(merges) == [a + b for a, b in merges]
