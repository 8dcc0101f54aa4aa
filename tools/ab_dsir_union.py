"""Interleaved A/B: two sequential collects (r13) vs one tagged-union
collect (r14) in dsir_select's plan-build, one session, alternating
reps, selection-output equality asserted."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import load_table  # noqa: E402
from remote_storage_adapter_spark.operators import dedup as D  # noqa: E402
from remote_storage_adapter_spark.operators import dsir as DS  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402


def old_select(spark, raw_docs, target_docs, n, *, dim, alpha=1.0,
               temperature=1.0, salt="dsir"):
    from remote_storage_adapter_spark.operators.sampling import uniform_unit
    counts = DS.doc_bucket_counts(raw_docs, dim=dim)
    counts = D._pin(counts)
    cnt_schema = "bucket int, c long"
    rc_local = spark.createDataFrame(
        [(r["bucket"], r["c"]) for r in
         DS.corpus_counts_from_doc_counts(counts).collect()], cnt_schema)
    tc_local = spark.createDataFrame(
        [(r["bucket"], r["c"]) for r in
         DS.hashed_ngram_counts(target_docs, dim=dim).collect()],
        cnt_schema)
    lam = DS.dsir_log_ratios(tc_local, rc_local, dim=dim, alpha=alpha)
    w = DS._weights_from_counts(counts, lam, "doc_id", "logw")
    u = uniform_unit(F.col("doc_id"), salt)
    g = F.round(-F.log(-F.log(F.greatest(u, F.lit(1e-12)))), 9)
    key = F.round(F.col("logw") / F.lit(float(temperature)) + g, 6)
    return (w.select("doc_id", "logw", key.alias("key"))
            .orderBy(F.desc("key"), F.col("doc_id"))
            .limit(n))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark("ab-dsir-union")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, sf_dir, "events").count()
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 7 == 0)

    arms = {
        "dsir_old": lambda: old_select(spark, docs, target, 1000,
                                       dim=4096),
        "dsir_new": lambda: DS.dsir_select(docs, target, 1000, dim=4096),
    }
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
            assert got == ref, f"selection differs: {a} rep {rep}"
    for a in arms:
        ws = sorted(walls[a])
        print(f"{a:10s} median={ws[len(ws)//2]:.3f}s  runs="
              + " ".join(f"{w:.3f}" for w in walls[a]))
    print("outputs equal across arms: OK")
    spark.stop()


if __name__ == "__main__":
    main()
