"""Shuffle/IO codec + scan-split A/B at sf10 (VERDICT r14 next #7,
guide §2.3/§6) — run where shuffles actually hit disk, not at sf0.1
where they are memory-resident.

One invocation = ONE arm in its own JVM (``spark.io.compression.codec``
is read from the frozen SparkConf by the shuffle block writers, so it
cannot be flipped at runtime); interleave arms by alternating
invocations:

    for i in 1 2; do
      python tools/ab_codec_sf10.py lz4  scratch/sf10 2
      python tools/ab_codec_sf10.py zstd scratch/sf10 2
    done

The flow is passage_dedup (fast profile) — the most shuffle-heavy
bench-adjacent flow (exploded occurrence frame → SortAggregate) —
timed with the same full-computation aggregate bench_scale.py uses.
The tool also reports the flow's shuffle bytes (StatusTracker stage
metrics are not exposed to PySpark, so it reports wall only; compare
walls across arms at matched canaries).

A ``--split`` mode sweeps ``spark.sql.files.maxPartitionBytes``
(runtime-settable) in-session instead: at sf10 the scan split size is
bound by the defaultParallelism floor (maxSplitBytes =
min(maxPartitionBytes, max(openCost, bytes/defaultParallelism))), so
this records the expected no-op with numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import load_table  # noqa: E402
from remote_storage_adapter_spark.operators import text as TX  # noqa: E402
from remote_storage_adapter_spark.operators.dedup import (  # noqa: E402
    unpersist_pinned,
)


def flow(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return TX.passage_dedup(docs, window=10, hash_mode="fast").agg(
        F.sum("n_removed_tokens").alias("rm"),
        F.sum("n_dup_windows").alias("dups"),
        F.sum(F.length("dedup_text")).alias("chars"))


def _job_ref(spark):
    import time as _t
    ts = []
    for _ in range(5):
        t0 = _t.perf_counter()
        spark.range(1).count()
        ts.append(_t.perf_counter() - t0)
    return round(1000 * sorted(ts)[2], 1)


def main():
    if sys.argv[1:2] == ["--split"]:
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "scratch/sf10"
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        spark = get_spark("ab-split-sf10")
        spark.sparkContext.setLogLevel("ERROR")
        flow(spark, sf_dir).collect()
        unpersist_pinned(blocking=True)
        for mpb in ("128m", "512m", "1g"):
            spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
            n_parts = load_table(spark, sf_dir, "documents") \
                .rdd.getNumPartitions()
            walls = []
            for _ in range(reps):
                t0 = time.time()
                flow(spark, sf_dir).collect()
                walls.append(round(time.time() - t0, 2))
                unpersist_pinned(blocking=True)
            print(json.dumps({"maxPartitionBytes": mpb,
                              "scan_partitions": n_parts,
                              "walls": walls}), flush=True)
        spark.stop()
        return

    codec = sys.argv[1] if len(sys.argv) > 1 else "lz4"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "scratch/sf10"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(f"ab-codec-{codec}",
                      extra_conf={"spark.io.compression.codec": codec})
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.sparkContext.getConf().get(
        "spark.io.compression.codec") == codec
    flow(spark, sf_dir).collect()          # untimed warm rep
    unpersist_pinned(blocking=True)
    walls = []
    for _ in range(reps):
        ref = _job_ref(spark)
        t0 = time.time()
        flow(spark, sf_dir).collect()
        walls.append({"wall_s": round(time.time() - t0, 2),
                      "job_ref_ms": ref})
        unpersist_pinned(blocking=True)
    print(json.dumps({"codec": codec, "sf_dir": sf_dir,
                      "reps": walls}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
