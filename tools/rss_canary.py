"""Peak Python-worker RSS across a scale decade (VERDICT r14 next #8).

Verifies the r14 closure "engine-bounded Arrow batches" for the media
decode paths: Spark 4.1.2 bounds mapInPandas batch volume
(``spark.sql.execution.arrow.maxRecordsPerBatch`` = 10k rows AND the
worker-side ``maxBytesPerBatch`` slicing), so per-task Python memory
for multimodal_jpeg / image_near_dup must stay FLAT as the corpus
grows 10x. This tool measures it instead of citing it:

- runs the flow at each sf_dir (default sf1 then sf10),
- then probes every REUSED Python worker (``spark.python.worker.reuse``
  is on) with a trivial mapInPandas that reads its own ``VmHWM``
  (peak RSS high-water, kernel-tracked) from /proc/self/status,
- prints per-sf max / median worker VmHWM.

Flat max VmHWM across the decade = the bound binds per batch, not per
corpus. Usage: python tools/rss_canary.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import load_table  # noqa: E402
from remote_storage_adapter_spark.operators import (  # noqa: E402
    multimodal as MM,
)
from remote_storage_adapter_spark import queries as Q  # noqa: E402


def _worker_hwm(spark, n=256):
    """(pid, VmHWM kB) from every live (reused) Python worker: a wide
    no-op mapInPandas so each worker serves >=1 task and reports its
    own high-water mark."""
    import pandas as pd  # noqa: F401

    def probe(batches):
        import os as _os
        import pandas as _pd
        hwm = 0
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    hwm = int(line.split()[1])
                    break
        for _ in batches:
            pass
        yield _pd.DataFrame({"pid": [_os.getpid()], "hwm_kb": [hwm]})

    rows = (spark.range(n).repartition(64)
            .mapInPandas(probe, "pid long, hwm_kb long").collect())
    per_pid = {}
    for r in rows:
        per_pid[r["pid"]] = max(per_pid.get(r["pid"], 0), r["hwm_kb"])
    return per_pid


def flow_jpeg(spark, sf_dir):
    return Q.q_multimodal_jpeg(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n")).collect()


def flow_near_dup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        Q._dhash_planted_png(docs).alias("payload"))
    return MM.image_hash(media, algo="dhash", min_tasks=32).agg(
        F.count(F.lit(1)).alias("n")).collect()


FLOWS = {"multimodal_jpeg": flow_jpeg, "image_near_dup": flow_near_dup}


def main():
    sf_dirs = sys.argv[1:] or ["scratch/sf1", "scratch/sf10"]
    spark = get_spark("rss-canary")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the worker pool so the same reused workers serve the flows
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long").count()
    base = _worker_hwm(spark)
    print(json.dumps({"baseline_workers": len(base),
                      "baseline_max_hwm_mb": round(max(base.values()) / 1024, 1)}))
    for flow, fn in FLOWS.items():
        for sf_dir in sf_dirs:
            if not os.path.exists(os.path.join(sf_dir,
                                               "documents.parquet")):
                continue
            fn(spark, sf_dir)
            hwm = _worker_hwm(spark)
            vals = sorted(hwm.values())
            print(json.dumps({
                "flow": flow, "sf_dir": sf_dir, "workers": len(vals),
                "max_hwm_mb": round(vals[-1] / 1024, 1),
                "med_hwm_mb": round(vals[len(vals) // 2] / 1024, 1),
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
