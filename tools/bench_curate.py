"""Composed curation-capstone throughput (VERDICT r7 next #1).

Every gate of the curation-on-ingest pipeline is benched in isolation
by bench.py; the PRODUCT is the composed flow. This tool feeds the
documents table through ``streaming.curate.apply_curate_batch`` in
order — the exact per-batch body ``stream_curate_maintain`` runs under
``foreachBatch`` — across a ladder of gate configurations, so both
the end-to-end docs/s and the MARGINAL cost of each gate are
measured:

  quality    exact-dup + rule-quality gates, seen-state maintenance
  +model     … + trained-classifier gate (frozen 64-dim weights)
  +dsir      … + DSIR importance gate (frozen 64-bucket λ table)
  +lm        … + reference-LM perplexity gate + LM-state maintenance
  +neardup   … + MinHash near-dup gate + MinHash-index maintenance
  +bm25      … + BM25 inverted-index maintenance (the full flow)

Each config starts from clean state (fresh dirs, dropped catalog
tables). The full-config run ends with the curated-table status
histogram and two invariants: statuses partition the corpus exactly,
and a FULL REPLAY of every batch is a no-op (the exactly-once ledgers
absorb it) that leaves the histogram byte-identical.

Usage::

    python tools/bench_curate.py [sf_dir] [n_batches]
    # defaults: /root/testdata/sf0.1, 5 batches

Env knobs (r11, the composed-probe evidence run):

- ``SPARK_GRAFT_CURATE_CONFIGS``: comma-list subset of the ladder
  (e.g. ``+lm,+neardup`` — the near-dup MARGINAL pair), so the
  multi-minute sf100 cells don't pay for the whole ladder. The
  replay-no-op invariant runs only when the subset ends at the full
  config.
- ``SPARK_GRAFT_MINHASH_PRUNE``: ``1``/``0`` forces ``prune`` in the
  gate's ``minhash_kwargs`` (the r11 forwarding knob); unset = the
  auto floor heuristic.
- ``SPARK_GRAFT_CURATE_SEED_DOCS`` (r12, VERDICT r11 next #2): seed
  the near-dup gate's index with a FABRICATED n-doc reference corpus
  before batch 1 (the bench_probe_scale fabrication trick: synthetic
  buckets live in ``[0, n)`` and synthetic ids far outside doc-id
  space, so gate DECISIONS are untouched at 2^-64 collision odds —
  only the index SIZE the auto-prune heuristic sees changes). With
  ``8000000`` the banded table starts ≈ 7× past the 160 MiB floor:
  the one composed configuration a 100 TB deployment actually runs —
  AUTO-engaged pruning inside the gate under ``prune=None`` — then
  executes end-to-end, and ``minhash_probe.prune_engaged`` machine-
  checks it against the executed plan.

Prints one JSON line per config:
``{"config", "sf_dir", "docs", "batches", "wall_s", "docs_per_s",
"batch_walls", "histogram"}``; near-dup configs additionally carry
``minhash_probe`` — banded-table MiB, whether the PRUNED probe plan
engaged for the accumulated index under the gate's exact kwargs, and
whether the executed plan string shows the pk PartitionFilters (the
"verifiably engaged" evidence the r10 verdict asked for).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from remote_storage_adapter_spark.operators.classify import (  # noqa: E402
    frozen_weights,
)
from remote_storage_adapter_spark.operators.dedup import (  # noqa: E402
    reset_managed_tables,
    unpersist_pinned,
)
from remote_storage_adapter_spark.session import get_spark  # noqa: E402
from remote_storage_adapter_spark.sources.tables import load_table  # noqa: E402
from remote_storage_adapter_spark.streaming.curate import (  # noqa: E402
    apply_curate_batch,
    curation_report,
)

#: gate ladder — each entry extends the previous with one component
CONFIGS = ["quality", "+model", "+dsir", "+lm", "+neardup", "+bm25"]

#: frozen DSIR λ (the stream-leg seed — decorrelated from the model
#: weights) and a threshold that genuinely drops docs, so the gate's
#: marginal cost includes its full weight computation
DSIR_LAM = frozen_weights(64, seed=48271)

MINHASH_KW = dict(num_hashes=64, bands=16, shingle_n=3)
_prune_env = os.environ.get("SPARK_GRAFT_MINHASH_PRUNE")
if _prune_env is not None:
    MINHASH_KW["prune"] = _prune_env == "1"

SEED_DOCS = int(os.environ.get("SPARK_GRAFT_CURATE_SEED_DOCS", "0"))


def seed_index(spark, prefix: str, n_docs: int) -> float:
    """Fabricate an ``n_docs``-reference index at the gate's prefix
    (see the env-knob doc above). Synthetic ids are offset by 2^40 so
    the sigs verify join-back can never pick up a synthetic sig row
    for a REAL candidate id; synthetic buckets are ``pmod(xxhash64,
    n_docs)`` — disjoint from real xxhash64 bucket values except at
    2^-64 rates, so no synthetic row ever becomes a candidate.
    Returns the fabrication wall (excluded from gate timings)."""
    from remote_storage_adapter_spark.operators.dedup import (
        write_minhash_index_tables,
    )

    bands, nh = MINHASH_KW["bands"], MINHASH_KW["num_hashes"]
    off = 1 << 40
    t0 = time.time()
    banded = (
        spark.range(n_docs * bands)
        .select(((F.col("id") / bands).cast("long") + off).alias("id"),
                (F.col("id") % bands).cast("int").alias("band"))
        .withColumn("bucket", F.pmod(F.xxhash64("id", "band"),
                                     F.lit(n_docs))))
    sigs = (
        spark.range(n_docs)
        .select((F.col("id") + off).alias("id"),
                F.expr(f"transform(sequence(0, {nh - 1}), "
                       f"i -> xxhash64(id, i))").alias("sig")))
    write_minhash_index_tables(banded, sigs, prefix, num_hashes=nh,
                               bands=bands,
                               shingle_n=MINHASH_KW["shingle_n"])
    # mark the seed applied (batch_id -1, no real batch collides):
    # the maintainer's exactly-once protocol treats an index WITHOUT
    # a ledger as a crashed bootstrap and rebuilds in overwrite mode
    # — which would wipe the seed on batch 0 (observed in the r12
    # smoke: banded_mib 0.7 after the ladder). With the ledger row
    # the first real batch takes the append path, exactly the
    # standing-deployment posture this evidence cell represents.
    spark.createDataFrame(
        [(-1, t) for t in ("banded", "sigs", "counts")],
        "batch_id long, tbl string",
    ).coalesce(1).write.mode("append").saveAsTable(f"{prefix}_applied")
    return time.time() - t0


def probe_evidence(spark, docs, prefix: str) -> dict:
    """Post-ladder evidence that the gate's cross-index probe runs
    (or correctly declines) the partition-pruned plan against the
    ACCUMULATED index, under the gate's exact kwargs: banded bytes vs
    the auto floor, and the executed-plan PartitionFilters check."""
    from remote_storage_adapter_spark.operators import dedup as D

    banded = D._mh_table_bytes(spark, f"{prefix}_banded")
    sample = docs.orderBy("doc_id").limit(100)
    with D.cache_scope():
        probe = D.minhash_lsh_join_indexed(
            spark, prefix, sample, threshold=0.2, **MINHASH_KW)
        plan = probe._jdf.queryExecution().executedPlan().toString()
    forced = MINHASH_KW.get("prune")
    engaged = (forced if forced is not None
               else banded is None
               or banded >= D.MH_AUTO_PRUNE_FLOOR_BYTES)
    pk_pruned = "PartitionFilters: [pk" in plan
    assert pk_pruned == engaged, (pk_pruned, engaged, banded)
    return {"banded_mib": (None if banded is None
                           else round(banded / 2**20, 1)),
            "floor_mib": D.MH_AUTO_PRUNE_FLOOR_BYTES >> 20,
            "prune_forced": forced, "prune_engaged": engaged,
            "plan_partition_filters_pk": pk_pruned}


def run_config(spark, docs, cfg: str, base: str, n_batches: int):
    """Apply every batch under ``cfg``'s gate set from clean state;
    returns (wall_s, [batch walls], histogram dict)."""
    shutil.rmtree(base, ignore_errors=True)
    out, seen, lm = f"{base}/curated", f"{base}/seen", f"{base}/lm"
    idx = f"{base}/bm25"
    prefix = "bench_curate_mh"
    level = CONFIGS.index(cfg)
    # adaptive=False: the maintainer's measured micro-batch profile
    # (stream_curate_maintain's default; apply_curate_batch itself
    # now defaults to inherit — ADVICE r9)
    kwargs: dict = dict(min_q_score=0.5, buckets=16,
                        index_buckets=16, adaptive=False)
    if level >= 1:
        kwargs.update(model=(frozen_weights(64), 0.05),
                      min_model_score=0.5, model_dim=64)
    if level >= 2:
        kwargs.update(dsir=(DSIR_LAM, 0.0))
    if level >= 3:
        kwargs.update(lm_state=lm, max_ppl=5000.0)
    if level >= 4:
        reset_managed_tables(
            spark, *[f"{prefix}_{t}"
                     for t in ("banded", "sigs", "counts", "meta",
                               "applied")])
        if SEED_DOCS:
            s = seed_index(spark, prefix, SEED_DOCS)
            print(f"# seeded {SEED_DOCS}-doc index at {prefix} "
                  f"in {s:.1f}s (untimed)", file=sys.stderr)
        kwargs.update(minhash_prefix=prefix, near_dup_threshold=0.2,
                      minhash_kwargs=MINHASH_KW)
    if level >= 5:
        kwargs.update(index_path=idx)

    batch_walls = []
    t0 = time.time()
    for b in range(n_batches):
        bt = time.time()
        batch = docs.filter(
            F.pmod(F.col("doc_id"), F.lit(n_batches)) == b)
        apply_curate_batch(batch, b, out_dir=out, seen_state=seen,
                           **kwargs)
        unpersist_pinned(blocking=True)
        batch_walls.append(round(time.time() - bt, 3))
    wall = time.time() - t0
    hist = {r["status"]: r["n_docs"]
            for r in curation_report(spark, out).collect()}
    return wall, batch_walls, hist


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("bench_curate")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join("scratch", f"curate_bench_{tag}")

    configs = CONFIGS
    subset = os.environ.get("SPARK_GRAFT_CURATE_CONFIGS")
    if subset:
        configs = [c for c in CONFIGS if c in
                   {s.strip() for s in subset.split(",")}]
    full_hist = None
    for cfg in configs:
        base = os.path.join(root, cfg.lstrip("+"))
        wall, walls, hist = run_config(spark, docs, cfg, base, n_batches)
        full_hist = hist  # last iteration == the full config
        line = {
            "config": cfg, "sf_dir": sf_dir, "docs": n_docs,
            "batches": n_batches, "wall_s": round(wall, 2),
            "docs_per_s": round(n_docs / wall, 1),
            "batch_walls": walls,
            "histogram": dict(sorted(hist.items())),
        }
        if CONFIGS.index(cfg) >= 4:  # near-dup gate in play
            if SEED_DOCS:
                line["seed_docs"] = SEED_DOCS
            line["minhash_probe"] = probe_evidence(
                spark, docs, "bench_curate_mh")
        print(json.dumps(line))
        sys.stdout.flush()

    # statuses partition the corpus at every ladder stop
    assert sum(full_hist.values()) == n_docs, (full_hist, n_docs)
    if configs[-1] != CONFIGS[-1]:
        spark.stop()
        return
    # invariants on the full-config run: a complete replay is a
    # no-op with an identical histogram
    base = os.path.join(root, CONFIGS[-1].lstrip("+"))
    t0 = time.time()
    hist2 = run_replay(spark, docs, base, n_batches)
    assert hist2 == full_hist, (hist2, full_hist)
    print(json.dumps({"config": "replay_noop", "sf_dir": sf_dir,
                      "wall_s": round(time.time() - t0, 2),
                      "histogram_stable": True}))
    spark.stop()


def run_replay(spark, docs, base: str, n_batches: int) -> dict:
    """Re-apply every batch of the FULL config over committed state —
    must be ledger-absorbed (did_work False per batch). Returns the
    post-replay histogram."""
    out, seen, lm = f"{base}/curated", f"{base}/seen", f"{base}/lm"
    kwargs = dict(min_q_score=0.5, buckets=16, index_buckets=16,
                  adaptive=False,
                  model=(frozen_weights(64), 0.05), min_model_score=0.5,
                  model_dim=64, dsir=(DSIR_LAM, 0.0),
                  lm_state=lm, max_ppl=5000.0,
                  minhash_prefix="bench_curate_mh",
                  near_dup_threshold=0.2, minhash_kwargs=MINHASH_KW,
                  index_path=f"{base}/bm25")
    for b in range(n_batches):
        batch = docs.filter(
            F.pmod(F.col("doc_id"), F.lit(n_batches)) == b)
        did = apply_curate_batch(batch, b, out_dir=out, seen_state=seen,
                                 **kwargs)
        unpersist_pinned(blocking=True)
        assert not did, f"replay of batch {b} did work"
    return {r["status"]: r["n_docs"]
            for r in curation_report(spark, out).collect()}


if __name__ == "__main__":
    main()
