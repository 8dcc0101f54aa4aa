"""Interleaved A/B: bm25_search_batch's per-query top-k — r14 ranking
window (``row_number() over (partition by q_id order by score desc,
id asc)``) vs the r15 aggregate top-k (collect (−score, id) structs,
``array_sort``, slice k — the `_topk_terms` idiom; VERDICT r14 next
#6, guide §2.3).

Both arms share everything up to the scored (q_id, id, score,
n_terms_matched) frame; the only delta is the ranking tail. Output
equality (sorted rows) is asserted up front. A third arm measures a
one-exchange variant (repartition(q_id) before the (q_id, id)
aggregate so aggregate + window share one exchange).

r15 RESULT (measured, closed as a NEGATIVE): the window arm WON —
window 2.149/2.205 s vs agg_topk 2.720/2.336 s medians across two
5-rep runs (outputs equal); the one-exchange arm was a wash (mins
1.55-1.69 vs window's 1.75-1.98 under bursts, medians 2.76 vs 2.21
on the busier run). Per-query match groups are corpus-sized, so the
interpreted array_sort loses to the codegen'd window sort here. The
operator keeps the window; see _bm25_score_batch's docstring.

Usage: python tools/ab_batch_topk.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import load_table  # noqa: E402
from remote_storage_adapter_spark.operators import text as TX  # noqa: E402
from remote_storage_adapter_spark.operators.dedup import (  # noqa: E402
    unpersist_pinned,
)


def batch_with_tail(docs, queries, tail, *, k=5, one_exchange=False):
    """bm25_search_batch body with the ranking tail injectable —
    mirrors operators/text.py r15 HEAD up to ``scored``."""
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
        F.col("doc_id").alias("id"),
        TX.tokens(F.coalesce(F.col("text"), F.lit(""))).alias("toks"))
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        (F.sum(F.size("toks")).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("_avgdl"))
    tf = TX._pin(
        base.select(
            "id", F.size("toks").alias("dl"),
            F.explode("toks").alias("term"))
        .join(F.broadcast(terms), "term", "left_semi")
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    _n, _avgdl = F.col("_n"), F.col("_avgdl")
    k1, b = 1.2, 0.75
    idf = F.log(1.0 + (_n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / _avgdl))
    pre = (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .select("id", "term", F.round(idf * tf_part, 9).alias("contrib"))
        .join(F.broadcast(qt), "term")
    )
    if one_exchange:
        # hash(q_id) satisfies the (q_id, id) aggregate's clustered
        # distribution AND the window's partitioning: one exchange
        import os as _os
        p = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
        pre = pre.repartition(p, F.col("q_id"))
    scored = (
        pre.groupBy("q_id", "id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"),
             F.count(F.lit(1)).cast("long").alias("n_terms_matched"))
    )
    return tail(scored, k)


def tail_window(scored, k):
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("id").asc())
    return (scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .select("q_id", "id", "score", "n_terms_matched"))


def tail_agg(scored, k):
    packed = scored.groupBy("q_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct(
                (-F.col("score")).alias("neg"), "id", "n_terms_matched"))),
            1, k).alias("top"))
    return (packed.select("q_id", F.explode("top").alias("t"))
            .select("q_id", F.col("t.id").alias("id"),
                    (-F.col("t.neg")).alias("score"),
                    F.col("t.n_terms_matched").alias("n_terms_matched")))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab-batch-topk")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    queries = docs.filter(F.col("doc_id") % 250 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(TX.tokens(F.col("text")), 1, 5), " ")
        .alias("q_text"))

    def run(tail, collect=False):
        out = batch_with_tail(docs, queries, tail)
        res = (sorted(map(tuple, out.collect())) if collect else None)
        if not collect:
            out.write.format("noop").mode("overwrite").save()
        unpersist_pinned(blocking=True)
        return res

    a = run(tail_window, collect=True)
    b = run(tail_agg, collect=True)
    assert a == b, "batch top-k output mismatch"
    print(f"# outputs equal: {len(a)} rows")

    def run1x(tail, collect=False):
        out = batch_with_tail(docs, queries, tail, one_exchange=True)
        res = (sorted(map(tuple, out.collect())) if collect else None)
        if not collect:
            out.write.format("noop").mode("overwrite").save()
        unpersist_pinned(blocking=True)
        return res

    c = run1x(tail_window, collect=True)
    assert a == c, "one-exchange output mismatch"
    print("# one-exchange arm outputs equal")

    run(tail_window)
    run(tail_agg)
    run1x(tail_window)
    walls = {"window": [], "agg_topk": [], "win_1x": []}
    for rep in range(reps):
        for tag, tail in (("window", tail_window), ("agg_topk", tail_agg),
                          ("win_1x", None)):
            if tag == "win_1x":
                t0 = time.time()
                run1x(tail_window)
                walls[tag].append(time.time() - t0)
                print(f"rep{rep} {tag}: {walls[tag][-1]:.3f}s")
                continue
            t0 = time.time()
            run(tail)
            walls[tag].append(time.time() - t0)
            print(f"rep{rep} {tag}: {walls[tag][-1]:.3f}s")
    for tag, ws in walls.items():
        ws = sorted(ws)
        print(f"{tag}: median {ws[len(ws) // 2]:.3f}s  all "
              f"{[round(w, 3) for w in ws]}")
    spark.stop()


if __name__ == "__main__":
    main()
