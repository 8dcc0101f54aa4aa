"""Print the executed plan shape for the capped vs uncapped probe at
the bench cell, plus per-job timing via the status store."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.operators import dedup as D  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("diag-probe-plan")
    spark.sparkContext.setLogLevel("ERROR")
    import bench as B
    fn = B.BENCH_QUERIES["dedup_cross_join_indexed"]
    fn(spark, sf_dir).count()  # build index
    D.unpersist_pinned(blocking=True)

    docs = B.load_table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 10 == 1)
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    prefix = f"bench_mh_idx_{tag}"
    sigs = D._pin(D._SIG_FNS["oph"](incoming, num_hashes=64,
                                    shingle_n=3, id_col="doc_id",
                                    text_col="text"))
    sigs.count()

    sc = spark.sparkContext
    for cap in (1000, None):
        df = D.minhash_lsh_join_indexed(spark, prefix, incoming,
                                        num_hashes=64, bands=16,
                                        threshold=0.2, sigs=sigs,
                                        max_bucket_size=cap)
        tracker = sc.statusTracker()
        before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        df.count()
        wall = time.time() - t0
        after = set(tracker.getJobIdsForGroup(None) or [])
        print(f"=== cap={cap} wall={wall:.3f} new_jobs={len(after-before)}")
        plan = df._jdf.queryExecution().executedPlan().toString()
        import re
        for pat in ("SortMergeJoin", "BroadcastHashJoin",
                    "BroadcastNestedLoop", "Exchange", "Scan parquet",
                    "InMemoryTableScan"):
            print(f"  {pat}: {len(re.findall(pat, plan))}")
        D.unpersist_pinned(blocking=True)
        sigs = D._pin(D._SIG_FNS["oph"](incoming, num_hashes=64,
                                        shingle_n=3, id_col="doc_id",
                                        text_col="text"))
        sigs.count()


if __name__ == "__main__":
    main()
