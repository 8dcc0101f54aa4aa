"""DSIR importance resampling (operators/dsir.py).

Locks: planted target/junk separation, an independent numpy replay of
the full weight pipeline, the full-coverage contract for empty/NULL
docs, selection determinism + the temperature knob, and the plan
shape (broadcast λ join, bounded corpus-count output).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from remote_storage_adapter_spark.operators import dsir as DS
from remote_storage_adapter_spark.operators.dedup import portable_hash64_py


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TARGETY = "quantum gravity loop amplitude tensor network entangle"
JUNKY = "click here buy cheap pills now win free prize casino"


@pytest.fixture(scope="module")
def corpora(spark):
    target = _docs(spark, [
        (1000 + i, f"{TARGETY} paper {i}") for i in range(8)])
    raw = _docs(
        spark,
        [(i, f"{TARGETY} draft {i}") for i in range(10)]
        + [(100 + i, f"{JUNKY} spam {i}") for i in range(10)]
        + [(200, ""), (201, None)],
    )
    return target, raw


def test_weights_separate_target_like_from_junk(corpora):
    target, raw = corpora
    tc = DS.hashed_ngram_counts(target, dim=512)
    rc = DS.hashed_ngram_counts(raw, dim=512)
    lam = DS.dsir_log_ratios(tc, rc, dim=512)
    w = {r["doc_id"]: r["logw"]
         for r in DS.dsir_doc_weights(raw, lam, dim=512).collect()}
    # full coverage: every raw doc has a weight, empty/NULL weigh 0
    assert len(w) == 22
    assert w[200] == 0.0 and w[201] == 0.0
    t_scores = [w[i] for i in range(10)]
    j_scores = [w[100 + i] for i in range(10)]
    assert min(t_scores) > max(j_scores)


def test_weights_match_numpy_replay(spark):
    """Independent replay: recompute bucket counts, smoothed log
    ratios, and per-doc weights with plain Python/numpy over the same
    portable hash — the distributed pipeline must agree to 1e-6."""
    dim = 64
    target = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta")])
    raw = _docs(spark, [(10, "alpha junk"), (11, "junk junk beta")])

    def grams(text):
        toks = [t for t in text.lower().split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def counts(docs):
        c = np.zeros(dim)
        for _i, t in docs:
            for g in grams(t):
                c[portable_hash64_py(g) % dim] += 1
        return c

    ct = counts([(1, "alpha beta gamma"), (2, "alpha beta")])
    cr = counts([(10, "alpha junk"), (11, "junk junk beta")])
    lam = np.round(
        np.log((ct + 1.0) / (ct.sum() + dim))
        - np.log((cr + 1.0) / (cr.sum() + dim)), 9)
    exp = {}
    for i, t in [(10, "alpha junk"), (11, "junk junk beta")]:
        dot = 0.0
        bc = np.zeros(dim)
        for g in grams(t):
            bc[portable_hash64_py(g) % dim] += 1
        for b in range(dim):
            if bc[b]:
                dot += round(bc[b] * lam[b], 9)
        exp[i] = round(dot, 6)  # 6-dp output, coarser than the terms

    tc = DS.hashed_ngram_counts(target, dim=dim)
    rc = DS.hashed_ngram_counts(raw, dim=dim)
    got = {r["doc_id"]: r["logw"] for r in DS.dsir_doc_weights(
        raw, DS.dsir_log_ratios(tc, rc, dim=dim), dim=dim).collect()}
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=1e-6), i


def test_select_deterministic_and_temperature(corpora):
    target, raw = corpora
    a = [r["doc_id"] for r in
         DS.dsir_select(raw, target, 5, dim=512, salt="s1").collect()]
    b = [r["doc_id"] for r in
         DS.dsir_select(raw, target, 5, dim=512, salt="s1").collect()]
    assert a == b  # replay-stable
    # cold temperature → effectively top-n by weight: junk (strongly
    # negative logw) must never appear; the ratio-neutral empty docs
    # (logw 0) legitimately can (see the dsir_select docstring)
    cold = DS.dsir_select(raw, target, 8, dim=512,
                          temperature=1e-6).collect()
    assert all(not (100 <= r["doc_id"] < 200) for r in cold)
    # and everything selected is far above the junk weight band
    assert all(r["logw"] >= -10 for r in cold)
    # keys are finite and sorted descending
    keys = [r["key"] for r in cold]
    assert all(map(math.isfinite, keys)) and keys == sorted(keys,
                                                            reverse=True)


def test_select_reuse_counts_modes_agree(corpora):
    """reuse_counts=True (pinned single scan) and False (two plain
    scans) are execution strategies, not semantics — identical
    selection."""
    from remote_storage_adapter_spark.operators.dedup import (
        unpersist_pinned,
    )

    target, raw = corpora
    a = DS.dsir_select(raw, target, 6, dim=256).collect()
    unpersist_pinned(blocking=True)
    b = DS.dsir_select(raw, target, 6, dim=256,
                       reuse_counts=False).collect()
    assert a == b


def test_select_validates_inputs(corpora):
    target, raw = corpora
    with pytest.raises(ValueError, match="n must be positive"):
        DS.dsir_select(raw, target, 0)
    with pytest.raises(ValueError, match="temperature"):
        DS.dsir_select(raw, target, 1, temperature=0.0)
    with pytest.raises(ValueError, match="alpha"):
        DS.dsir_log_ratios(DS.hashed_ngram_counts(raw, dim=8),
                           DS.hashed_ngram_counts(raw, dim=8),
                           dim=8, alpha=0.0)


def test_corpus_counts_bounded_and_plan_shape(corpora):
    target, raw = corpora
    rc = DS.hashed_ngram_counts(raw, dim=32)
    assert rc.count() <= 32
    lam = DS.dsir_log_ratios(DS.hashed_ngram_counts(target, dim=32),
                             rc, dim=32)
    plan = DS.dsir_doc_weights(raw, lam, dim=32) \
        ._jdf.queryExecution().executedPlan().toString()
    # the dim-row λ side must broadcast; the doc side must never
    # sort-merge against it (hash-narrow rows only)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_unigram_only_mode(spark):
    """bigrams=False hashes only unigrams — a doc repeating one token
    lands all mass in one bucket."""
    docs = _docs(spark, [(1, "zzz zzz zzz")])
    c = DS.hashed_ngram_counts(docs, dim=16, bigrams=False).collect()
    assert len(c) == 1 and c[0]["c"] == 3
