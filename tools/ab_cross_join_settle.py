"""Whole-row interleaved A/B: dedup_cross_join's r14 union
materialization vs the r13 sequential two-count form (VERDICT r14
next #3 — the one touched row the stalled driver run could not
exonerate).

Both arms run the FULL bench row (sign both corpus halves, band, cap,
candidate join, join-backs) with fresh pins per rep; the only delta is
how the two pinned signature frames are materialized:

- r13 arm: ``ls.count(); rs.count()`` (two sequential driver actions)
- r14 arm: ``ls.unionByName(rs).count()`` (one action, both signature
  pipelines scheduled concurrently)

Output equality (sorted pair rows) is asserted once up front.

Usage: python tools/ab_cross_join_settle.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import load_table  # noqa: E402
from remote_storage_adapter_spark.operators import dedup as D  # noqa: E402


def lsh_join(left, right, *, materialize, num_hashes=64, bands=16,
             shingle_n=3, threshold=0.2, mode="oph",
             max_bucket_size=1000):
    """minhash_lsh_join with the materialization step injectable —
    body mirrors operators/dedup.py's minhash_lsh_join (r15 HEAD)."""
    rows_per_band = num_hashes // bands
    sig_fn = D._SIG_FNS[mode]
    ls = D._pin(sig_fn(left, num_hashes=num_hashes, shingle_n=shingle_n,
                       id_col="doc_id", text_col="text"))
    rs = D._pin(sig_fn(right, num_hashes=num_hashes, shingle_n=shingle_n,
                       id_col="doc_id", text_col="text"))
    materialize(ls, rs)
    lb = D._band_frame(ls, bands=bands, rows_per_band=rows_per_band,
                       mode=mode)
    rb = D._band_frame(rs, bands=bands, rows_per_band=rows_per_band,
                       mode=mode)
    if max_bucket_size is not None:
        for side, frame in (("left", lb), ("right", rb)):
            counts = frame.groupBy("band", "bucket").agg(
                F.count(F.lit(1)).alias("_n"))
            pruned = frame.join(
                counts.filter(F.col("_n") > max_bucket_size)
                .select("band", "bucket"),
                ["band", "bucket"], "left_anti")
            if side == "left":
                lb = pruned
            else:
                rb = pruned
    cand = (
        lb.alias("a").join(
            rb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")))
        .select(F.col("a.id").alias("id_l"), F.col("b.id").alias("id_r"))
        .dropDuplicates(["id_l", "id_r"]))
    sig_l = ls.select(F.col("id").alias("id_l"), F.col("sig").alias("sig_l"))
    sig_r = rs.select(F.col("id").alias("id_r"), F.col("sig").alias("sig_r"))
    paired = cand.join(sig_l, "id_l").join(sig_r, "id_r")
    agree = F.size(F.filter(
        F.zip_with(F.col("sig_l"), F.col("sig_r"), lambda x, y: x == y),
        lambda eq: eq))
    est = agree.cast("double") / F.lit(float(num_hashes))
    return (paired.withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select("id_l", "id_r", "est_jaccard"))


def mat_r13(ls, rs):
    ls.count()
    rs.count()


def mat_r14(ls, rs):
    ls.unionByName(rs).count()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab-cross-join-settle")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    reference = docs.filter(F.col("doc_id") % 2 == 0)

    def run(mat):
        out = lsh_join(incoming, reference, materialize=mat)
        n = out.count()
        D.unpersist_pinned(blocking=True)
        return n

    # equality gate (row counts + sorted rows once)
    a = sorted(map(tuple, lsh_join(incoming, reference,
                                   materialize=mat_r13).collect()))
    D.unpersist_pinned(blocking=True)
    b = sorted(map(tuple, lsh_join(incoming, reference,
                                   materialize=mat_r14).collect()))
    D.unpersist_pinned(blocking=True)
    assert a == b, "pair output mismatch"
    print(f"# outputs equal: {len(a)} pairs")

    # warm-up
    run(mat_r13)
    run(mat_r14)
    walls = {"r13_two_counts": [], "r14_union": []}
    for rep in range(reps):
        for tag, mat in (("r13_two_counts", mat_r13),
                         ("r14_union", mat_r14)):
            t0 = time.time()
            run(mat)
            walls[tag].append(time.time() - t0)
            print(f"rep{rep} {tag}: {walls[tag][-1]:.3f}s")
    for tag, ws in walls.items():
        ws = sorted(ws)
        print(f"{tag}: median {ws[len(ws) // 2]:.3f}s  all "
              f"{[round(w, 3) for w in ws]}")
    spark.stop()


if __name__ == "__main__":
    main()
