"""Interleaved A/B: OPH densification — per-position O(k·m) filter
scan vs O(k) run-length expansion over the sorted non-empty buckets.

The r14 OPH signature (`minhash_signatures_oph`) densifies empty
buckets with, per signature position i, `array_min(filter(filled,
b >= i))` — an interpreted higher-order filter scan of the non-empty
bucket list per position: O(k·m) lambda evaluations and one filtered
array allocation per position per doc (k=64, m up to 64 → ~4k
interpreted ops/doc). The candidate computes the identical array by
expanding each non-empty bucket's run of covered positions once:
sort the (bucket, min) entries, give bucket f_j the positions
(f_{j-1}, f_j], and the positions after the last non-empty bucket
wrap to the first — O(m) zip_with + one flatten.

Usage: python tools/ab_oph_densify.py [reps] [sf_dir]
Asserts bit-identical signatures up front, prints paired walls.
r15 NOTE: the run-length form WON (median 2.580 -> 1.991 s, every
sorted pair faster, signatures bit-identical) and now lives in
operators/dedup.py `minhash_signatures_oph`; the old arm here is the
r14 form reconstructed inline so the comparison stays reproducible.
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


def oph_r14(docs, *, num_hashes=64, shingle_n=3,
            id_col="doc_id", text_col="text"):
    """The r14 arm: per-position O(k*m) filter-scan densification
    (reconstructed inline; HEAD now carries the run-length form)."""
    k = num_hashes
    exploded = D.shingle_hash_rows(
        docs, n=shingle_n, id_col=id_col, text_col=text_col
    )
    bucketed = (
        exploded.groupBy("id", F.pmod(F.col("h"), F.lit(k)).alias("b"))
        .agg(F.min("h").alias("mh"))
    )
    per_doc = bucketed.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("b").cast("int"), F.col("mh")))
        ).alias("m")
    )
    filled = F.array_sort(F.map_keys(F.col("m")))
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.try_element_at(
            F.col("m"),
            F.coalesce(
                F.array_min(F.filter(filled, lambda b: b >= i.cast("int"))),
                F.element_at(filled, 1),
            ),
        ),
    )
    return per_doc.select("id", arr.alias("sig"))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab-oph-densify")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    old_fn = oph_r14
    new_fn = D.minhash_signatures_oph

    # equality gate first: bit-identical signatures, every doc
    a = {r["id"]: r["sig"] for r in old_fn(docs).collect()}
    b = {r["id"]: r["sig"] for r in new_fn(docs).collect()}
    assert a == b, "signature mismatch"
    print(f"# signatures bit-identical over {len(a)} docs")

    walls = {"old": [], "new": []}
    for rep in range(reps):
        for tag, fn in (("old", old_fn), ("new", new_fn)):
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            walls[tag].append(time.time() - t0)
            print(f"rep{rep} {tag}: {walls[tag][-1]:.3f}s")
    for tag, ws in walls.items():
        ws = sorted(ws)
        print(f"{tag}: median {ws[len(ws) // 2]:.3f}s  all "
              f"{[round(w, 3) for w in ws]}")
    spark.stop()


if __name__ == "__main__":
    main()
