"""Hashed-linear quality classifier (operators/classify.py): the
featurizer against a hand-computed bucket map, batch-gradient
training on separable planted data (loss decreases, high accuracy),
and the two scoring paths (featurized expression vs explode+join
deployment path) agreeing."""

from __future__ import annotations

import math

import numpy as np
import pytest

from remote_storage_adapter_spark.operators import classify as CL
from remote_storage_adapter_spark.operators.dedup import portable_hash64_py

DIM = 64

#: planted vocabulary: "good" docs draw from English-ish words,
#: "junk" docs from gibberish tokens — linearly separable by hashed
#: bag-of-words by construction.
GOOD = ["the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine and more",
        "to be or not to be that is the question",
        "all that glitters is not gold my friend",
        "better late than never but never late is better"]
JUNK = ["zzqx wvvk jjpq xxrr qqzz ppvv",
        "kkxw qzzv rrjj ppxx wwqq zvzv",
        "xjqk zwpv qrxz jkpw vvxq zzzz",
        "qpw zxj kvv rqz jxp wqk",
        "vxz qjw pkk zrq xwj qqv"]


def _training_docs(spark, copies: int = 6):
    rows = []
    i = 0
    for c in range(copies):
        for t in GOOD:
            rows.append((i, f"{t} variant {c}", 1))
            i += 1
        for t in JUNK:
            rows.append((i, f"{t} zq{c}", 0))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_hashed_features_match_hand_computation(spark):
    docs = spark.createDataFrame([(7, "aa bb aa")],
                                 "doc_id long, text string")
    row = CL.hashed_features(docs, dim=DIM).collect()[0]
    exp = np.zeros(DIM)
    exp[portable_hash64_py("aa") % DIM] = math.log1p(2)
    exp[portable_hash64_py("bb") % DIM] = math.log1p(1)
    assert np.allclose(row["features"], exp)
    # l2 flag: unit norm; empty/NULL text: zero vector, row kept
    unit = CL.hashed_features(docs, dim=DIM, l2=True).collect()[0]
    assert abs(np.linalg.norm(unit["features"]) - 1.0) < 1e-12
    empties = CL.hashed_features(
        spark.createDataFrame([(1, ""), (2, None)],
                              "doc_id long, text string"),
        dim=DIM).collect()
    assert len(empties) == 2
    assert all(sum(r["features"]) == 0.0 for r in empties)


def test_lr_train_separates_planted_corpus(spark):
    docs = _training_docs(spark)
    feats = CL.hashed_features(docs.select("doc_id", "text"), dim=DIM) \
        .join(docs.select("doc_id", "label"), "doc_id").cache()
    try:
        w, b, losses = CL.lr_train(feats, dim=DIM, iters=25, lr=2.0)
        # loss decreases monotonically (batch GD on a convex loss with
        # a sane step) and ends far below the ln(2) start
        assert losses[0] == pytest.approx(math.log(2), abs=1e-6)
        assert all(l2 <= l1 + 1e-9 for l1, l2 in zip(losses, losses[1:]))
        assert losses[-1] < 0.15
        scored = CL.margin_scores(feats, w, b).collect()
        acc = sum((r["score"] >= 0.5) == (r["label"] == 1)
                  for r in scored) / len(scored)
        assert acc >= 0.95
    finally:
        feats.unpersist()


def test_scoring_paths_agree(spark):
    """margin_scores over featurized vectors == lr_score's
    explode+broadcast-join deployment path (same math, two routes)."""
    docs = _training_docs(spark, copies=2).select("doc_id", "text")
    w = CL.frozen_weights(DIM)
    via_feats = {r["doc_id"]: r["score"] for r in CL.margin_scores(
        CL.hashed_features(docs, dim=DIM), w, 0.05).collect()}
    via_sql = {r["doc_id"]: r["score"] for r in
               CL.lr_score(docs, w, 0.05, dim=DIM).collect()}
    assert via_feats.keys() == via_sql.keys()
    for k in via_feats:
        assert via_feats[k] == pytest.approx(via_sql[k], abs=1e-9)


def test_lr_score_tokenless_doc_gets_bias(spark):
    docs = spark.createDataFrame([(1, ""), (2, None), (3, "hello")],
                                 "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in
           CL.lr_score(docs, CL.frozen_weights(DIM), -0.3,
                       dim=DIM).collect()}
    assert got[1] == pytest.approx(CL.sigmoid(-0.3), abs=1e-12)
    assert got[2] == pytest.approx(CL.sigmoid(-0.3), abs=1e-12)
    assert got[3] != pytest.approx(CL.sigmoid(-0.3), abs=1e-6)


def test_lr_train_rejects_empty(spark):
    import pyspark.sql.functions as F
    feats = CL.hashed_features(
        spark.createDataFrame([], "doc_id long, text string"), dim=DIM
    ).withColumn("label", F.lit(1))
    with pytest.raises(ValueError, match="empty"):
        CL.lr_train(feats, dim=DIM, iters=1)


def test_lr_train_rejects_dim_mismatch(spark):
    """r7 ADVICE: a frame featurized at a different dim would NULL-pad
    zip_with margins and silently train garbage — lr_train validates
    every row's feature length in the same pass that counts the
    frame, mirroring lr_score's weight-count guard."""
    import pyspark.sql.functions as F
    docs = _training_docs(spark, copies=1)
    feats = CL.hashed_features(docs.select("doc_id", "text"), dim=32) \
        .join(docs.select("doc_id", "label"), "doc_id")
    with pytest.raises(ValueError, match="features length"):
        CL.lr_train(feats, dim=DIM, iters=1)
    # a single stray short row among good ones is caught too
    mixed = CL.hashed_features(docs.select("doc_id", "text"), dim=DIM) \
        .join(docs.select("doc_id", "label"), "doc_id") \
        .withColumn("features", F.when(
            F.col("doc_id") == 0, F.slice("features", 1, DIM - 1)
        ).otherwise(F.col("features")))
    with pytest.raises(ValueError, match="1 of"):
        CL.lr_train(mixed, dim=DIM, iters=1)


def test_lr_train_on_sample_reaches_accuracy(spark):
    """r7 verdict #3: train-on-a-sample is a parameter, not a
    docstring. The deterministic hash half-sample of the planted
    corpus is still separable; weights trained on it reach the
    accuracy bar scored over ALL docs, and max_rows trains on an
    exactly-bounded frame."""
    docs = _training_docs(spark)  # 60 docs
    feats = CL.hashed_features(docs.select("doc_id", "text"), dim=DIM) \
        .join(docs.select("doc_id", "label"), "doc_id")

    def acc_of(w, b):
        scored = CL.margin_scores(feats, w, b).collect()
        return sum((r["score"] >= 0.5) == (r["label"] == 1)
                   for r in scored) / len(scored)

    w, b, losses = CL.lr_train(feats, dim=DIM, iters=25, lr=2.0,
                               sample_frac=0.5)
    assert all(l2 <= l1 + 1e-9 for l1, l2 in zip(losses, losses[1:]))
    # 0.9 bar (not the full-corpus 0.95): tokens unseen by the
    # half-sample carry zero weight and dim=64 hash collisions can
    # tip a handful of held-out docs — inherent to sampled training,
    # not a regression
    assert acc_of(w, b) >= 0.9
    # exactly-n: 20 training rows still separate the planted vocab
    w2, b2, _ = CL.lr_train(feats, dim=DIM, iters=25, lr=2.0,
                            max_rows=20)
    assert acc_of(w2, b2) >= 0.9
