"""MinHash index APPEND-side counts-maintenance cost vs corpus size.

r8 made the counts table delta-maintained: ``minhash_index_append``
appends the BATCH's per-bucket counts tagged with a batch key
(consumers SUM per bucket) instead of re-aggregating and rewriting
the whole banded table per batch — the one reference-index
maintenance step whose cost grew with the corpus. This tool measures
that claim directly: it appends the same fixed 500-doc batch to
reference indexes of three sizes and times the whole append under
(a) the delta schema and (b) the legacy no-``batch_id`` schema (which
still takes the old full-recount-and-overwrite path), after one
untimed warmup append per index (the process' first append pays
JIT/codegen). Signing, banded-append, and sigs-append work is
identical across all cells, so the spread isolates counts
maintenance.

Cells: the sf0.1 documents table (5k docs), ``scratch/sf1`` (50k
docs; run ``tools/gen_sf.py 10 scratch/sf1`` first, cell skipped if
absent), and a synthesized 5M-doc-scale index (80M banded postings,
1M buckets) — the append never inspects how the index tables were
produced, so the large cell fabricates banded/sigs directly instead
of signing 5M documents.

Usage: ``python tools/bench_counts_append.py``  (~3 min; prints one
dict per cell and a final RESULT line).
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from remote_storage_adapter_spark.operators import dedup as D  # noqa: E402
from remote_storage_adapter_spark.session import get_spark  # noqa: E402

BATCH_N = 500


def _clean(spark, *tables):
    D.reset_managed_tables(spark, *tables)
    wh = spark.conf.get("spark.sql.warehouse.dir",
                        "file:/root/repo/spark-warehouse")
    wh = wh.removeprefix("file:")
    for t in tables:  # orphan dirs from a killed prior run
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)


def _shift(batch):
    return batch.withColumn("doc_id", F.col("doc_id") + 10_000_000)


def _timed_append(batch, prefix, key):
    with D.cache_scope():
        t0 = time.monotonic()
        D.minhash_index_append(batch, prefix, counts_batch_key=key)
        return time.monotonic() - t0


def _flip_to_legacy(spark, prefix):
    """Rewrite the counts table in the pre-delta schema (no batch_id)
    so the next append exercises the legacy full-refresh path."""
    ctab = f"{prefix}_counts"
    (spark.table(ctab).groupBy("band", "bucket")
     .agg(F.sum("_n").alias("_n"))
     .write.mode("overwrite").saveAsTable(f"{ctab}_tmp"))
    spark.sql(f"DROP TABLE {ctab}")
    spark.sql(f"ALTER TABLE {ctab}_tmp RENAME TO {ctab}")


def measure_real(spark, tag, path, results):
    docs = spark.read.parquet(path).select("doc_id", "text")
    n = docs.count()
    batch = spark.createDataFrame(
        docs.orderBy("doc_id").limit(BATCH_N)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .collect(), "doc_id long, text string")
    prefix = f"cac_{tag}"
    tables = [f"{prefix}_{t}"
              for t in ("banded", "sigs", "counts", "counts_tmp")]
    _clean(spark, *tables)
    with D.cache_scope():
        t0 = time.monotonic()
        D.minhash_index(docs, prefix)
        build_s = time.monotonic() - t0
    _timed_append(batch, prefix, 99)  # warmup
    batch = _shift(batch)
    delta_s = _timed_append(batch, prefix, 1)
    _flip_to_legacy(spark, prefix)
    batch = _shift(batch)
    legacy_s = _timed_append(batch, prefix, 2)
    results[tag] = dict(corpus_rows=n, build_s=round(build_s, 2),
                        delta_append_s=round(delta_s, 2),
                        legacy_append_s=round(legacy_s, 2))
    print(tag, results[tag], flush=True)
    _clean(spark, *tables)


def measure_synthetic(spark, results, *, n_docs=5_000_000, bands=16,
                      n_buckets=1_000_000):
    prefix = "cac_synth_5m"
    tables = ([f"{prefix}_{t}"
               for t in ("banded", "sigs", "counts", "counts_tmp")]
              + [f"{prefix}_seed_{t}"
                 for t in ("banded", "sigs", "counts")])
    _clean(spark, *tables)
    n_rows = n_docs * bands
    synth = (spark.range(n_rows)
             .select((F.col("id") % n_docs).alias("id"),
                     (F.col("id") % bands).cast("int").alias("band"),
                     F.pmod(F.hash(F.col("id")), F.lit(n_buckets))
                     .cast("long").alias("bucket")))
    t0 = time.monotonic()
    (synth.write.mode("overwrite").bucketBy(32, "band", "bucket")
     .sortBy("band", "bucket").saveAsTable(f"{prefix}_banded"))
    synth_build_s = time.monotonic() - t0
    docs01 = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
              .select("doc_id", "text"))
    seed = docs01.orderBy("doc_id").limit(BATCH_N)
    D.minhash_index(seed, f"{prefix}_seed")  # real sigs schema to copy
    (spark.table(f"{prefix}_seed_sigs").limit(0).write.mode("overwrite")
     .bucketBy(32, "id").sortBy("id").saveAsTable(f"{prefix}_sigs"))
    (spark.table(f"{prefix}_banded").groupBy("band", "bucket")
     .agg(F.count(F.lit(1)).alias("_n"))
     .withColumn("batch_id", F.lit(-1).cast("long"))
     .write.mode("overwrite").saveAsTable(f"{prefix}_counts"))
    batch = spark.createDataFrame(
        seed.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                    "text").collect(), "doc_id long, text string")
    _timed_append(batch, prefix, 99)  # warmup
    batch = _shift(batch)
    delta_s = _timed_append(batch, prefix, 1)
    _flip_to_legacy(spark, prefix)
    batch = _shift(batch)
    legacy_s = _timed_append(batch, prefix, 2)
    results["synth-5M"] = dict(
        corpus_rows=n_docs, banded_rows=n_rows,
        synth_build_s=round(synth_build_s, 2),
        delta_append_s=round(delta_s, 2),
        legacy_append_s=round(legacy_s, 2))
    print("synth-5M", results["synth-5M"], flush=True)
    _clean(spark, *tables)


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    measure_real(spark, "sf01_5k",
                 "/root/testdata/sf0.1/documents.parquet", results)
    sf1 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scratch", "sf1",
        "documents.parquet")
    if os.path.exists(sf1):
        measure_real(spark, "sf1_50k", sf1, results)
    else:
        print("sf1 cell skipped (run tools/gen_sf.py 10 scratch/sf1)",
              flush=True)
    measure_synthetic(spark, results)
    print("RESULT", results)


if __name__ == "__main__":
    main()
