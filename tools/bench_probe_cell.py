"""One-row micro-bench: the dedup_cross_join_indexed bench cell in
isolation, same harness discipline as bench.py (untimed warm-up,
per-rep pin release, blocking unpersist, System.gc between rows).

Usage::

    python tools/bench_probe_cell.py [reps]

Prints per-rep walls + median. For diagnosing the r11→r12
crossover-region watch item (VERDICT r11 finding #1 / next #1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.operators import dedup as D  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-probe-cell")
    spark.sparkContext.setLogLevel("ERROR")
    import bench as B
    B.load_table(spark, sf_dir, "events").count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long").count()

    fn = B.BENCH_QUERIES["dedup_cross_join_indexed"]
    fn(spark, sf_dir).count()          # warm-up (also builds index)
    D.unpersist_pinned(blocking=True)
    spark.sparkContext._jvm.System.gc()
    runs = []
    for _ in range(reps):
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        runs.append(time.time() - t0)
        D.unpersist_pinned(blocking=True)
    runs.sort()
    print({"rows": n, "reps": reps,
           "runs": [round(r, 3) for r in runs],
           "median": round(runs[len(runs) // 2], 3)})


if __name__ == "__main__":
    main()
