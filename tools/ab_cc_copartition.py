"""Interleaved A/B: r13 CC loop (edges re-exchanged every round) vs
r14 (edges cached hash-partitioned by src), same memoized pair input
as bench_dedup_clusters, label equality asserted."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import load_table  # noqa: E402
from remote_storage_adapter_spark.operators import dedup as D  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402


def old_cc(pairs, max_iters=25):
    both = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    base = both.dropDuplicates(["src", "dst"]).persist()
    base.count()
    nodes = base.select(F.col("src").alias("id")).dropDuplicates(["id"])
    edges = (
        base.unionByName(
            nodes.select(F.col("id").alias("src"),
                         F.col("id").alias("dst"))
        )
        .persist()
    )
    labels = nodes.withColumn("lbl", F.col("id")).persist()
    prev_sum = None
    spark = pairs.sparkSession
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(max_iters):
            new_labels = (
                edges.join(labels, edges["src"] == labels["id"])
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("lbl").alias("lbl"))
                .persist()
            )
            s = new_labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)"))
            ).first()[0]
            labels.unpersist()
            labels = new_labels
            if s == prev_sum:
                break
            prev_sum = s
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        edges.unpersist()
        base.unpersist()
    D._PINNED.append(labels)
    return labels.select("id", F.col("lbl").alias("cluster"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark("ab-cc")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, sf_dir, "events").count()
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.2).persist()
    pairs.count()

    arms = {"cc_old": lambda: old_cc(pairs),
            "cc_new": lambda: D.dedup_clusters(pairs)}
    walls = {a: [] for a in arms}
    ref = None
    for a, fn in arms.items():
        fn().count()
        D.unpersist_pinned(blocking=True)
    for rep in range(reps):
        for a, fn in arms.items():
            t0 = time.time()
            got = sorted(map(tuple, fn().collect()))
            walls[a].append(time.time() - t0)
            D.unpersist_pinned(blocking=True)
            if ref is None:
                ref = got
            assert got == ref, f"labels differ: {a} rep {rep}"
    for a in arms:
        ws = sorted(walls[a])
        print(f"{a:8s} median={ws[len(ws)//2]:.3f}s  runs="
              + " ".join(f"{w:.3f}" for w in walls[a]))
    print("outputs equal across arms: OK")
    spark.stop()


if __name__ == "__main__":
    main()
