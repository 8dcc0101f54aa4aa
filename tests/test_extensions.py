"""Extension-operator tests: dedup family, similarity search, text
analysis, multimodal plumbing — with planted ground truth."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from remote_storage_adapter_spark.operators import (
    dedup as D,
    multimodal as MM,
    similarity as S,
    text as TX,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [
        (0, base.strip()),
        (1, base.strip()),                        # exact dup of 0
        (2, (base + "extra tail words here").strip()),  # near dup of 0
        (3, "completely different content about spark engines and parquet"),
        (4, "THE  Quick   Brown fox Jumps over the lazy dog " * 5),  # case/ws dup
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    out = {r["fp"]: r for r in D.exact_dedup(docs).collect()}
    groups = sorted((r["n_copies"], r["keep_id"]) for r in out.values())
    # 0,1,4 collapse (case/whitespace-normalized); 2,3,5 unique
    assert groups == [(1, 2), (1, 3), (1, 5), (3, 0)]


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5
    assert (0, 3) not in pairs


def test_minhash_lsh_recalls_exact_dups(docs):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0
    assert (0, 2) in pairs  # near-dup lands in a shared band
    assert (0, 3) not in pairs


def test_simhash_hamming(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 4)] == 0
    assert (0, 3) not in pairs


def test_minhash_oph_recalls_and_densifies(docs):
    # OPH mode: exact dups agree on every position (densification is
    # content-derived), near-dups recalled, unrelated docs excluded
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in D.minhash_lsh_pairs(docs, threshold=0.5,
                                          mode="oph").collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0
    assert (0, 3) not in pairs
    # doc 5 ("short") has ONE shingle → 63 empty buckets; signature
    # must still be fully dense (no nulls)
    sig = {r["id"]: r["sig"]
           for r in D.minhash_signatures_oph(docs).collect()}
    assert all(v is not None for v in sig[5])
    assert len(sig[5]) == 64


def test_shingle_hash_rows_matches_word_shingles(docs):
    """The codegen'd explode/window shingle path must produce exactly
    the distinct shingle-hash set of the array-lambda reference form."""
    fast = {
        (r["id"], r["h"])
        for r in D.shingle_hash_rows(docs, n=3).distinct().collect()
    }
    ref = {
        (r["doc_id"], r["h"])
        for r in docs.select(
            "doc_id",
            F.explode(
                F.transform(
                    D.word_shingles(F.col("text"), 3),
                    lambda s: F.xxhash64(s),
                )
            ).alias("h"),
        ).collect()
    }
    assert fast == ref


def test_simhash_fingerprints_match_expression(docs):
    """Grouped bit-vote SimHash == array-lambda SimHash, per doc."""
    fast = {r["id"]: r["fp"]
            for r in D.simhash_fingerprints(docs).collect()}
    ref = {r["doc_id"]: r["fp"]
           for r in docs.select(
               "doc_id", D.simhash(F.col("text")).alias("fp")).collect()}
    assert fast == ref


def test_simhash_deterministic(spark, docs):
    a = docs.select(D.simhash(F.col("text")).alias("h")).collect()
    b = docs.select(D.simhash(F.col("text")).alias("h")).collect()
    assert [r["h"] for r in a] == [r["h"] for r in b]


@pytest.fixture(scope="module")
def embs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0, 0.0], 0),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0], 0),    # orthogonal
        (3, [1.0, 0.01, 0.0, 0.0], 1),   # near 0 but other block
        (4, [-1.0, 0.0, 0.0, 0.0], 0),   # opposite
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_embedding_near_dup_blocked(embs):
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in D.embedding_near_dup_pairs(embs, threshold=0.9).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (0, 3) not in pairs  # different block: never compared
    assert (0, 2) not in pairs and (0, 4) not in pairs


def test_brute_force_topk_exact(embs):
    top = S.brute_force_topk(embs, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["id"] for r in top] == [0, 3, 1]
    assert top[0]["cosine"] == pytest.approx(1.0)
    assert top[-1]["cosine"] < 1.0


def test_lsh_topk_same_bucket_recall(embs):
    # the query IS vector 0; its bucket must contain it
    got = S.lsh_topk(embs, [1.0, 0.0, 0.0, 0.0], k=5, n_planes=4).collect()
    ids = [r["id"] for r in got]
    assert 0 in ids
    assert all(r["cosine"] <= 1.0 + 1e-9 for r in got)


def test_ivf_index_and_probe(embs):
    indexed = S.ivf_index(embs, n_cells=2)
    assert set(indexed.columns) >= {"vec_id", "cell"}
    cells = {r["vec_id"]: r["cell"] for r in indexed.collect()}
    # probing the cell of vec 0 finds its near neighbor 1
    got = S.ivf_topk(indexed, [cells[0]], [1.0, 0.0, 0.0, 0.0], k=2)
    assert 0 in [r["id"] for r in got.collect()]


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat with a hat"),
         (1, "!!! ??? ### $$$ %%%")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TX.quality_features(df).collect()}
    good, bad = out[0], out[1]
    assert good["q_n_tokens"] == 9
    assert good["q_stopword_ratio"] > 0.3
    assert good["q_score"] == 1.0
    assert bad["q_punct_ratio"] > 0.5
    assert bad["q_score"] <= 0.5  # fails punct + stopword rules


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog is happy"),
         (1, "der hund ist nicht da und die katze"),
         (2, "le chat et les oiseaux est la"),
         (3, "日本語のテキスト"),
         (4, "zzz qqq xxx")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", TX.lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {0: "en", 1: "de", 2: "fr", 3: "zh", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "hello world, it's 42 degrees")],
                               "doc_id long, text string")
    r = df.select(
        TX.token_count(F.col("text")).alias("ws"),
        F.size(TX.bpe_ish_tokens(F.col("text"))).alias("bpe"),
    ).first()
    assert r["ws"] == 5
    # hello | world | , | it | ' | s | 42 | degrees
    assert r["bpe"] == 8


def test_winnow_shared_passage_guarantee(spark):
    shared = "the quick brown fox jumps over the extremely lazy dog again"
    rows = [
        (1, "intro text here. " + shared + " and some trailing words"),
        (2, "completely different opening... " + shared),
        (3, "nothing in common with either document at all, zebra qux"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = TX.winnow_fingerprints(docs, k=8, window=16)
    by_doc = {
        i: {r["fingerprint"] for r in fps.filter(F.col("id") == i).collect()}
        for i in (1, 2, 3)
    }
    # winnowing guarantee: a shared passage ≥ window+k-1 chars ⇒ shared
    # fingerprint
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_doc_fingerprints(docs):
    fps = {r["doc_id"]: r for r in TX.doc_fingerprints(docs).collect()}
    assert fps[0]["fp"] == fps[1]["fp"] == fps[4]["fp"]
    assert fps[0]["fp"] != fps[3]["fp"]
    assert fps[0]["min_shingle_hash"] == fps[1]["min_shingle_hash"]


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(0, "abc", 3), (1, "defgh", 5)],
        "doc_id long, text string, n_chars long",
    )
    media = MM.media_from_documents(docs)
    assert [f.name for f in media.schema["meta"].dataType.fields] == [
        "media_type", "format", "width", "height", "duration_ms",
    ]
    feats = {r["media_id"]: r for r in
             MM.extract_features(media, dim=4).collect()}
    assert feats[0]["byte_len"] == 3 and feats[1]["byte_len"] == 5
    assert len(feats[0]["feature"]) == 4
    assert all(0.0 <= x <= 1.0 for x in feats[0]["feature"])
    # deterministic stub
    again = {r["media_id"]: r for r in
             MM.extract_features(media, dim=4).collect()}
    assert feats[0]["feature"] == again[0]["feature"]


def test_multimodal_real_decode_raises(spark):
    docs = spark.createDataFrame([(0, "abc", 3)],
                                 "doc_id long, text string, n_chars long")
    media = MM.media_from_documents(docs)
    with pytest.raises(Exception):
        MM.extract_features(media, decode_stub=False).collect()


def test_resize_stub_shapes(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string"
    ).withColumn("n_chars", F.length("text"))
    media = MM.media_from_documents(docs)
    out = {r["media_id"]: r for r in
           MM.resize(media, width=8, height=4).collect()}
    for r in out.values():
        assert len(r["payload"]) == 32          # exactly w*h bytes
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
        assert r["meta"]["media_type"] == "image"  # rest of meta kept
    # deterministic: same input → same resized payload
    again = {r["media_id"]: r["payload"] for r in
             MM.resize(media, width=8, height=4).collect()}
    assert {k: v["payload"] for k, v in out.items()} == again


def test_frame_sample_expansion(spark):
    media = spark.createDataFrame(
        [(0, bytearray(b"x"), ("video", "mp4", None, None, 3000))],
        MM.MEDIA_SCHEMA,
    )
    frames = MM.frame_sample(media, every_ms=1000).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000]


def test_embedding_pandas_matches_expression(embs):
    plain = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in D.embedding_near_dup_pairs(
                 embs, threshold=0.3).collect()}
    fast = {(r["id_a"], r["id_b"]): r["cosine"]
            for r in D.embedding_near_dup_pairs_pandas(
                embs, threshold=0.3).collect()}
    assert set(plain) == set(fast)
    for k in plain:
        assert abs(plain[k] - fast[k]) < 1e-9


def test_asof_join_semantics(spark):
    from remote_storage_adapter_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, 5000, 10.0), (1, 10000, 20.0), (2, 7000, 70.0)],
        "k long, ts_ms long, v double",
    ).select("k", F.timestamp_millis("ts_ms").alias("ts"), "v")
    left = spark.createDataFrame(
        [(1, 1000), (1, 5000), (1, 7000), (1, 20000), (2, 6000), (3, 9000)],
        "k long, ts_ms long",
    ).select("k", F.timestamp_millis("ts_ms").alias("ts"))
    out = {(r["k"], r["ts"].second): (
        r["ts_asof"].second if r["ts_asof"] else None, r["v_asof"])
        for r in asof_join(left, right, by=("k",)).collect()}
    assert out[(1, 1)] == (None, None)      # nothing at or before
    assert out[(1, 5)] == (5, 10.0)         # equal ts matches
    assert out[(1, 7)] == (5, 10.0)         # latest at-or-before
    assert out[(1, 20)] == (10, 20.0)       # carries forward
    assert out[(2, 6)] == (None, None)      # right k=2 is later
    assert out[(3, 9)] == (None, None)      # key absent from right


def test_asof_join_tolerance(spark):
    from remote_storage_adapter_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, 5000, 10.0)], "k long, ts_ms long, v double",
    ).select("k", F.timestamp_millis("ts_ms").alias("ts"), "v")
    left = spark.createDataFrame(
        [(1, 6000), (1, 60000)], "k long, ts_ms long",
    ).select("k", F.timestamp_millis("ts_ms").alias("ts"))
    out = {r["ts"].second if r["ts"].second else 0: r["v_asof"]
           for r in asof_join(left, right, by=("k",),
                              tolerance_ms=10_000).collect()}
    assert out[6] == 10.0     # within 10 s
    assert out[0] is None     # 55 s stale → nulled by tolerance


def test_range_join_bucket_spanning(spark):
    from remote_storage_adapter_spark.operators.asof import range_join

    H = 3600_000
    iv = spark.createDataFrame(
        [(1, 0, 5 * H), (2, 10 * H, 11 * H)], "iid long, s long, e long"
    ).select("iid", F.timestamp_millis("s").alias("start"),
             F.timestamp_millis("e").alias("end"))
    pts = spark.createDataFrame(
        [(100, 3 * H), (101, 5 * H), (102, 6 * H), (103, 10 * H)],
        "pid long, t long",
    ).select("pid", F.timestamp_millis("t").alias("ts"))
    # bucket (1h) much smaller than interval 1 → spans 6 buckets
    got = sorted((r["pid"], r["iid"]) for r in
                 range_join(pts, iv, bucket_s=3600).collect())
    assert got == [(100, 1), (101, 1), (103, 2)]  # ends inclusive; 102 outside


def test_ivf_train_improves_quantization(spark):
    from remote_storage_adapter_spark.operators import similarity as S
    from remote_storage_adapter_spark.sources.tables import load_table

    embs = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def mean_sim(assigned, centroids):
        cmap = {cid: vec for cid, vec in centroids}
        # mean cosine of each vector to its assigned centroid
        rows = assigned.select("cell", "embedding").collect()
        import math

        tot = 0.0
        for r in rows:
            v = [float(x) for x in r["embedding"]]
            c = cmap[r["cell"]]
            dot = sum(a * b for a, b in zip(v, c))
            nv = math.sqrt(sum(a * a for a in v)) or 1.0
            nc = math.sqrt(sum(a * a for a in c)) or 1.0
            tot += dot / (nv * nc)
        return tot / len(rows)

    a0, c0 = S.ivf_train(embs, n_cells=8, iters=0)
    a3, c3 = S.ivf_train(embs, n_cells=8, iters=3)
    q0, q3 = mean_sim(a0, c0), mean_sim(a3, c3)
    assert q3 >= q0 - 1e-9  # Lloyd never degrades the objective
    # deterministic: same inputs → identical centroids
    _, c3b = S.ivf_train(embs, n_cells=8, iters=3)
    assert c3 == c3b


def test_lsh_multiprobe_superset_recall(embs):
    q = [1.0, 0.0, 0.0, 0.0]
    single = {r["id"] for r in
              S.lsh_topk(embs, q, k=5, n_planes=4).collect()}
    multi = {r["id"] for r in
             S.lsh_topk(embs, q, k=5, n_planes=4,
                        multi_probe=True).collect()}
    assert single <= multi       # probing more buckets never loses
    assert 0 in multi
