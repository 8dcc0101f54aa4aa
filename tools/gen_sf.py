"""Synthesize a larger scale factor from the driver's sf0.1 tables.

The driver provides sf{0.001,0.01,0.1}; the scale-linearity smoke
(BENCH_SF1.md) needs ~10x more. Each output table is the sf0.1 table
replicated ``factor`` times with ids remapped into disjoint ranges and
content deterministically perturbed so the REPLICAS DO NOT COLLIDE:

- ``documents.text``: word-rotated by a per-replica offset — rotation
  rewrites nearly every shingle, so replica k of a doc is NOT a
  near-duplicate of replica j (appending a salt token would make every
  cross-replica pair a near-dup and blow pair counts quadratically,
  changing the workload's shape instead of its size). Within a
  replica, docs that were near-dups stay near-dups: their shared
  windows rotate by the same offset.
- ``embeddings.embedding``: per-replica deterministic unit rotation in
  one hash-chosen coordinate plane — cosine structure within a replica
  is preserved exactly (rotations are isometries); cross-replica
  vectors decorrelate.
- ``events``: user_id/event_id offset per replica (cardinalities grow
  10x), ts jittered by k seconds so bucket populations grow ~10x
  without landing on identical rows.

Usage::

    python tools/gen_sf.py [factor] [out_dir]   # default 10, scratch/sf1
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import (  # noqa: E402
    TABLES, load_table,
)

SRC = "/root/testdata/sf0.1"


def _replicate(df, factor: int):
    reps = df.sparkSession.range(factor).select(
        F.col("id").cast("int").alias("_rep"))
    return df.crossJoin(F.broadcast(reps))


def scale_documents(docs, factor: int):
    out = _replicate(docs, factor)
    words = F.split(F.col("text"), r"\s+")
    n = F.greatest(F.size(words), F.lit(1))
    # rotate the word sequence by a replica-dependent offset
    off = (F.col("_rep") * 7 + 3) % n
    rotated = F.concat(F.slice(words, off + 1, n), F.slice(words, 1, off))
    return out.select(
        (F.col("doc_id") * factor + F.col("_rep")).alias("doc_id"),
        F.array_join(rotated, " ").alias("text"),
        "lang", "source",
        F.length(F.array_join(rotated, " ")).alias("n_chars"),
    )


def scale_embeddings(embs, factor: int):
    out = _replicate(embs, factor)
    dim = F.size(F.col("embedding"))
    # rotate in the coordinate plane (i, j) chosen per replica; angle
    # depends on the replica only, so within-replica geometry is
    # exactly preserved (isometry) and cross-replica cosines decay
    i = (F.col("_rep") * 2) % dim
    j = (F.col("_rep") * 2 + 1) % dim
    theta = F.col("_rep").cast("double") * float(math.pi / 5)
    c, s = F.cos(theta), F.sin(theta)
    e = F.col("embedding")
    xi, xj = F.element_at(e, i + 1), F.element_at(e, j + 1)
    rotated = F.transform(
        e,
        lambda v, k: F.when(k == i, (c * xi - s * xj).cast("float"))
        .when(k == j, (s * xi + c * xj).cast("float"))
        .otherwise(v),
    )
    return out.select(
        (F.col("vec_id") * factor + F.col("_rep")).alias("vec_id"),
        rotated.alias("embedding"),
        "label",
    )


def scale_events(ev, factor: int):
    out = _replicate(ev, factor)
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    n_ids = ev.agg(F.max("event_id")).first()[0] + 1
    return out.select(
        (F.col("event_id") + F.col("_rep") * F.lit(n_ids)).alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("_rep"))).alias("ts"),
        (F.col("user_id") + F.col("_rep") * F.lit(n_users)).alias("user_id"),
        "event_type", "value", "props",
    )


def scale_generic(df, factor: int, key: str):
    out = _replicate(df, factor)
    return out.select(
        (F.col(key) * factor + F.col("_rep")).alias(key),
        *[c for c in df.columns if c != key],
    )


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scratch/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gen-sf")
    spark.sparkContext.setLogLevel("ERROR")
    special = {
        "documents": scale_documents,
        "embeddings": scale_embeddings,
        "events": scale_events,
    }
    keys = {"customer": "c_custkey", "supplier": "s_suppkey",
            "part": "p_partkey", "orders": "o_orderkey",
            "lineitem": "l_orderkey"}
    for t in TABLES:
        src = load_table(spark, SRC, t)
        if t in special:
            scaled = special[t](src, factor)
        elif t in keys:
            scaled = scale_generic(src, factor, keys[t])
        else:  # region/nation: tiny dims stay as-is
            scaled = src
        scaled.coalesce(8).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet"))
        print(f"{t}: {spark.read.parquet(os.path.join(out_dir, t + '.parquet')).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
