"""Whole-ROW interleaved A/B for the bench row dedup_minhash_lsh:
r14 OPH densification vs the r15 run-length form, both arms running
the FULL minhash_lsh_pairs row (sign, eager-materialize, band, cap,
candidate join, join-backs) via the ``sigs=`` thread-through — the
only delta is the densification expression inside the signature
pipeline. Pair outputs are asserted equal up front.

Usage: python tools/ab_minhash_row.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import load_table  # noqa: E402
from remote_storage_adapter_spark.operators import dedup as D  # noqa: E402

from ab_oph_densify import oph_r14  # noqa: E402


def run_row(docs, sig_fn, *, collect=False):
    sigs = D._pin(sig_fn(docs, num_hashes=64, shingle_n=3))
    out = D.minhash_lsh_pairs(docs, num_hashes=64, bands=16,
                              threshold=0.2, sigs=sigs)
    if collect:
        res = sorted(map(tuple, out.collect()))
    else:
        out.write.format("noop").mode("overwrite").save()
        res = None
    D.unpersist_pinned(blocking=True)
    return res


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab-minhash-row")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    a = run_row(docs, oph_r14, collect=True)
    b = run_row(docs, D.minhash_signatures_oph, collect=True)
    assert a == b, "pair output mismatch"
    print(f"# outputs equal: {len(a)} pairs")

    run_row(docs, oph_r14)
    run_row(docs, D.minhash_signatures_oph)
    walls = {"r14_filter_scan": [], "r15_run_length": []}
    for rep in range(reps):
        for tag, fn in (("r14_filter_scan", oph_r14),
                        ("r15_run_length", D.minhash_signatures_oph)):
            t0 = time.time()
            run_row(docs, fn)
            walls[tag].append(time.time() - t0)
            print(f"rep{rep} {tag}: {walls[tag][-1]:.3f}s")
    for tag, ws in walls.items():
        ws = sorted(ws)
        print(f"{tag}: median {ws[len(ws) // 2]:.3f}s  all "
              f"{[round(w, 3) for w in ws]}")
    spark.stop()


if __name__ == "__main__":
    main()
