"""SparkSession construction / tuning helpers.

All timestamps in the engine are UTC (the reference stores ClickHouse
``DateTime`` which is timezone-naive wall-seconds; we pin the session to
UTC so ``to_date``/``unix_timestamp`` are deterministic and match the
DuckDB oracle, which treats naive timestamps as UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to *any* session we are handed
#: (the driver owns session creation for `queries()` callables).
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # the driver's events.parquet carries TIMESTAMP(NANOS) which the
    # parquet reader rejects by default; read as long (ns) + convert.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # round-5 testdata switched events.ts to tz-naive TIMESTAMP(MICROS),
    # which Spark 4 infers as TIMESTAMP_NTZ by default — NTZ forbids the
    # epoch casts the read path is built on. Read naive parquet
    # timestamps as LTZ; with the session pinned to UTC this is exactly
    # DuckDB's naive-as-UTC semantics.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # r10: index probes push small literal In-filters (≤~1000
    # bucket/id values) into parquet so key-sorted reference files
    # skip row groups/pages; above this threshold Spark degrades the
    # push to a min/max range, which over hash-valued keys prunes
    # nothing. Deliberately NOT higher: parquet-mr evaluates a pushed
    # In as an O(depth) recursive OR tree — ~2000 values overflows
    # default task stacks (measured), which is also why the probes
    # cap their push sizes (minhash_lsh_join_indexed push limits)
    # instead of raising this.
    #
    # SESSION-WIDE by necessity, not preference (ADVICE r10): the
    # conf is read at ACTION time, and every probe returns a lazy
    # frame the caller executes later, so a set/restore scope around
    # the probe function cannot cover the scan (unlike
    # dedup_clusters' AQE toggle, whose loop runs its own actions).
    # Why 11-1200-literal In lists are safe for THIS engine's other
    # scans (inventory, r11): every parquet-scan isin() in that range
    # targets a key-SORTED index table where page-skipping is the
    # point — BM25 posting scans push query terms over term-sorted
    # posting files (operators/text.py), ANN probes push bucket/cell
    # ids over key-partitioned index tables (operators/similarity.py)
    # — the same pattern this threshold was raised FOR. The remaining
    # isin() sites are either expressions over DERIVED columns
    # (web.py suffix match, text.py array lambdas — never pushed to
    # parquet) or user matcher alternations (plans/matchers.py),
    # which are regex-alternation-sized (a handful of label values).
    # The measured 3×-slower-than-unpushed regime needed ~500 pushed
    # values over UNSORTED files — no engine scan constructs that
    # shape. External code sharing the session inherits the
    # tradeoff; tune() is the documented place to override.
    "spark.sql.parquet.pushdown.inFilterThreshold": "1200",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by owner
            pass
    return spark


def get_spark(app_name: str = "remote-storage-adapter-spark",
              extra_conf: dict | None = None) -> SparkSession:
    """Build a local session shaped like the test/bench environment.

    ``local[N]`` here stands in for a multi-executor cluster: everything
    downstream relies only on partitioning, never on single-JVM locality.

    ``extra_conf`` lets measurement harnesses (tools/ab_codec_sf10.py)
    override STARTUP confs (e.g. ``spark.io.compression.codec``, which
    the shuffle block writers read from the frozen SparkConf) while
    keeping every other knob identical to the production session —
    the A/B then isolates exactly the overridden conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # r11: Python workers talk to the JVM over UNIX DOMAIN
        # sockets, not loopback TCP (startup-time conf, so set here
        # rather than in _RUNTIME_CONF). Motive: a 30-minute
        # mapInPandas wedge observed at sf100 — the worker blocked
        # writing output, the JVM's advertised receive window stuck
        # at ZERO with an empty Recv-Q, the JVM→worker direction in
        # RTO backoff 22 with retransmits lost ON LOOPBACK (ss
        # showed rwnd_limited 99.9%, 21 MB unread input) — i.e. a
        # kernel TCP flow-control wedge under heavy bidirectional
        # Arrow traffic, not an application deadlock. UDS has no
        # windows, no congestion control, no retransmission: the
        # whole failure class vanishes, and same-host framing is
        # cheaper. ``SPARK_GRAFT_UDS=0`` restores TCP (the conf
        # only applies to local/classic mode, which is where we
        # run; a real cluster's executors set their own transport).
        .config("spark.python.unix.domain.socket.enabled",
                os.environ.get("SPARK_GRAFT_UDS", "1") != "0")
        # r14: ContextCleaner reclaims shuffle/broadcast state only
        # when the DRIVER GCs, and a large heap (the sf100 recipe
        # runs 48 GiB) full-GCs rarely — an r14 session that ran 6
        # sf10 executions then sf100 reps in one JVM OOM'd in a
        # shuffle-heavy aggregate around rep 3 while the identical
        # fresh-JVM run completed clean. Halving the periodic-GC
        # interval (30 min default) bounds cross-execution
        # accumulation in long-lived sessions; a forced full GC on
        # an idle driver every 5 min is noise, one during a busy
        # window is far cheaper than the allocation stall it
        # prevents. Startup conf: ContextCleaner reads it once.
        .config("spark.cleaner.periodicGC.interval",
                os.environ.get("SPARK_GRAFT_PERIODIC_GC", "5min"))
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
