"""Phase/variant diagnosis for the dedup_cross_join_indexed cell.

Per rep, times: (a) sign-only, (b) probe with pre-signed sigs cap=1000,
(c) probe pre-signed cap=None, (d) full call (sign inside) cap=1000.
Watches for in-session degradation (walls per rep printed in run order).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.operators import dedup as D  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("diag-probe-cell")
    spark.sparkContext.setLogLevel("ERROR")
    import bench as B
    B.load_table(spark, sf_dir, "events").count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long").count()
    fn = B.BENCH_QUERIES["dedup_cross_join_indexed"]
    fn(spark, sf_dir).count()  # warm-up + index build
    D.unpersist_pinned(blocking=True)

    docs = B.load_table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 10 == 1)
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    prefix = f"bench_mh_idx_{tag}"

    spark.sparkContext._jvm.System.gc()
    out = {k: [] for k in ("sign", "probe_cap", "probe_nocap", "full")}
    for _ in range(reps):
        t0 = time.time()
        sigs = D._pin(D._SIG_FNS["oph"](incoming, num_hashes=64,
                                        shingle_n=3, id_col="doc_id",
                                        text_col="text"))
        sigs.count()
        out["sign"].append(round(time.time() - t0, 3))

        t0 = time.time()
        D.minhash_lsh_join_indexed(spark, prefix, incoming,
                                   num_hashes=64, bands=16,
                                   threshold=0.2, sigs=sigs).count()
        out["probe_cap"].append(round(time.time() - t0, 3))

        t0 = time.time()
        D.minhash_lsh_join_indexed(spark, prefix, incoming,
                                   num_hashes=64, bands=16,
                                   threshold=0.2, sigs=sigs,
                                   max_bucket_size=None).count()
        out["probe_nocap"].append(round(time.time() - t0, 3))
        D.unpersist_pinned(blocking=True)

        t0 = time.time()
        D.minhash_lsh_join_indexed(spark, prefix, incoming,
                                   num_hashes=64, bands=16,
                                   threshold=0.2).count()
        out["full"].append(round(time.time() - t0, 3))
        D.unpersist_pinned(blocking=True)
    for k, v in out.items():
        print(k, v)


if __name__ == "__main__":
    main()
