"""Interleaved A/B: eager-stats (r13 code) vs lazy-fold (r14) BM25
search paths, one session, alternating reps — the BENCH_NOTES
within-session-pair methodology.

OLD arm reconstructs the r13 eager `.first()` stats pass inline and
passes scalars; NEW arm is the shipped fold. Also asserts sorted-row
equality between arms every rep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import load_table  # noqa: E402
from remote_storage_adapter_spark.operators import dedup as D  # noqa: E402
from remote_storage_adapter_spark.operators import text as TX  # noqa: E402
from remote_storage_adapter_spark.queries import SEARCH_QUERY  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402


def old_bm25_search(docs, query, *, k=10, k1=1.2, b=0.75,
                    id_col="doc_id", text_col="text"):
    qterms = TX.query_terms(query)
    base = docs.select(
        F.col(id_col).alias("id"),
        TX.tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("toks"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("toks")).alias("tot")).first()
    n_docs = stats["n"]
    avgdl = stats["tot"] / n_docs
    tf = D._pin(
        base.select(
            "id", F.size("toks").alias("dl"),
            F.explode("toks").alias("term"))
        .filter(F.col("term").isin(qterms))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return TX._bm25_score_hits(tf, n_docs=n_docs, avgdl=avgdl,
                               k=k, k1=k1, b=b) \
        .withColumnRenamed("id", id_col)


def old_bm25_search_batch(docs, queries, *, k=5, k1=1.2, b=0.75,
                          id_col="doc_id", text_col="text"):
    qt = (
        queries.select(
            F.col("q_id"),
            F.explode(TX.tokens(F.coalesce(F.col("q_text"), F.lit(""))))
            .alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    terms = qt.select("term").distinct()
    base = docs.select(
        F.col(id_col).alias("id"),
        TX.tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("toks"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("toks")).alias("tot")).first()
    n_docs = stats["n"]
    avgdl = stats["tot"] / n_docs
    tf = D._pin(
        base.select(
            "id", F.size("toks").alias("dl"),
            F.explode("toks").alias("term"))
        .join(F.broadcast(terms), "term", "left_semi")
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return TX._bm25_score_batch(tf, qt, n_docs=n_docs, avgdl=avgdl,
                                k=k, k1=k1, b=b) \
        .withColumnRenamed("id", id_col)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark("ab-bm25-fold")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, sf_dir, "events").count()

    docs = load_table(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 250 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(TX.tokens(F.col("text")), 1, 5), " ")
        .alias("q_text"))

    arms = {
        "search_old": lambda: old_bm25_search(docs, SEARCH_QUERY, k=10),
        "search_new": lambda: TX.bm25_search(docs, SEARCH_QUERY, k=10),
        "batch_old": lambda: old_bm25_search_batch(docs, queries, k=5),
        "batch_new": lambda: TX.bm25_search_batch(docs, queries, k=5),
    }
    rows = {}
    walls = {a: [] for a in arms}
    # warm each arm once
    for a, fn in arms.items():
        fn().count()
        D.unpersist_pinned(blocking=True)
    for rep in range(reps):
        for a, fn in arms.items():
            t0 = time.time()
            got = sorted(map(tuple, fn().collect()))
            walls[a].append(time.time() - t0)
            D.unpersist_pinned(blocking=True)
            key = a.rsplit("_", 1)[0]
            if key in rows:
                assert rows[key] == got, f"arm outputs differ: {a}"
            rows[key] = got
    for a in arms:
        ws = sorted(walls[a])
        print(f"{a:12s} median={ws[len(ws)//2]:.3f}s  runs="
              + " ".join(f"{w:.3f}" for w in walls[a]))
    print("outputs equal across arms: OK")
    spark.stop()


if __name__ == "__main__":
    main()
