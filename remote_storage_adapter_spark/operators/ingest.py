"""Write-path ingest pipeline (SURVEY W1-W8 + F1 + K1).

Reference flow (main.go:286-320 → clickhouse/client.go:120-157):
HTTP body → snappy → protobuf ``WriteRequest`` → flatten
series×samples to rows → per-row codecs → NaN/Inf gate → batched
INSERT in a transaction.

Spark-first flow: the protocol gateway (outside Spark, exactly as the
reference sits outside ClickHouse) lands decoded requests as
JSON/parquet; here we take the nested shape and produce the canonical
table with pure Catalyst expressions:

- W2 flatten: two ``explode``s (series, then samples).
- W1/W3/W4: labels map, ``__name__`` extraction, sorted tags array.
- W6/W7: ms→timestamp, ``date`` partition column.
- W8: ``updated`` ingest stamp (LWW version).
- F1: NaN/±Inf rejected, with drop counts surfaced via
  ``df.observe`` (the reference counts drops per writer,
  clickhouse/client.go:137-141).
- K1: date-partitioned append, sorted within partitions on
  (name, ts) to approximate the MergeTree sort key for row-group
  skipping.

Everything is JVM-side; at 100 TB ingest this pipeline is a single
narrow stage per micro-batch (explode+project+filter), followed by ONE
fan-out shuffle on (date, hash(name) % k) so even a single-day
micro-batch — the normal ingest case — writes from k parallel tasks
instead of collapsing onto one, then the partitioned write.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from remote_storage_adapter_spark.functions.codecs import (
    metric_name,
    tags_from_labels,
)
from remote_storage_adapter_spark.schema import PARTITION_COLUMN, SORT_COLUMNS


def flatten_write_requests(requests: DataFrame) -> DataFrame:
    """W2 (main.go:377-394): nested WriteRequest → one row per sample.

    Input schema: schema.WRITE_REQUEST_SCHEMA. Output: samples shape
    (ts_ms, name, labels, val).
    """
    series = requests.select(
        F.explode("timeseries").alias("series")
    )
    samples = series.select(
        F.map_from_entries(
            F.transform(
                F.col("series.labels"),
                lambda l: F.struct(l["name"].alias("key"),
                                   l["value"].alias("value")),
            )
        ).alias("labels"),
        F.explode(F.col("series.samples")).alias("sample"),
    )
    return samples.select(
        F.col("sample.timestamp").alias("ts_ms"),
        metric_name(F.col("labels")).alias("name"),
        F.col("labels"),
        F.col("sample.value").alias("val"),
    )


def finite_filter(df: DataFrame, val: str = "val") -> DataFrame:
    """F1 (clickhouse/client.go:137-141): drop NaN/±Inf values."""
    c = F.col(val)
    return df.filter(
        (~F.isnan(c)) & (c > float("-inf")) & (c < float("inf"))
    )


def to_metrics(samples: DataFrame,
               updated: Optional[object] = None) -> DataFrame:
    """samples (ts_ms, name, labels, val) → canonical metrics rows.

    ``updated`` defaults to the ingest wall-clock (W8); pass a Column
    for deterministic tests/oracles.
    """
    upd = updated if updated is not None else F.current_timestamp()
    ts = F.timestamp_millis(F.col("ts_ms"))
    out = samples.select(
        F.to_date(ts).alias("date"),
        F.col("name"),
        tags_from_labels(F.col("labels")).alias("tags"),
        F.col("labels"),
        F.col("val"),
        ts.alias("ts"),
        upd.alias("updated") if not isinstance(upd, str) else F.col(upd).alias("updated"),
    )
    return finite_filter(out)


def ingest_batch(requests: DataFrame, **kw) -> DataFrame:
    """Full W1-W8+F1 pipeline from the nested wire shape."""
    return to_metrics(flatten_write_requests(requests), **kw)


def observed_ingest(samples: DataFrame):
    """F1 with drop accounting via the observation API (A9 telemetry:
    receivedSamples/sentSamples counters, main.go:77-113).

    Returns (df, observation); after an action, ``observation.get``
    yields {'received': n, 'sent': m} — drops = received - sent.
    """
    obs = Observation("ingest")
    c = F.col("val")
    finite = (~F.isnan(c)) & (c > float("-inf")) & (c < float("inf"))
    observed = samples.observe(
        obs,
        F.count(F.lit(1)).alias("received"),
        F.sum(finite.cast("long")).alias("sent"),
    )
    return observed.filter(finite), obs


def write_metrics(df: DataFrame, path: str, mode: str = "append", *,
                  format: str = "parquet",
                  files_per_date: int = 8) -> None:
    """K1: date-partitioned columnar append, MergeTree-like layout.

    ``sortWithinPartitions(name, ts)`` ≈ primary key ``(name, tags,
    ts)`` (0001-create-table.sql:12) → parquet row-group min/max
    skipping on name/ts at read time.

    The pre-write exchange distributes on ``(date, xxhash64(name) %
    files_per_date)`` — NOT date alone. A micro-batch usually covers a
    single day, and hash-partitioning on just ``date`` would collapse
    that day onto one task (one sorter, one file, one core at 100
    TB/day). Salting by the series name keeps each series' rows in a
    single file (so per-file (name, ts) sort still gives contiguous
    row groups per series for min/max skipping) while fanning the
    day's write across up to ``files_per_date`` tasks. The sort is
    prefixed with ``date`` so that when salt-hash collisions co-locate
    two dates in one task, rows are already clustered by the partition
    column and Spark's dynamic-partition writer skips its own
    (non-stable) re-sort — per-file (name, ts) order survives.

    ``format="delta"`` upgrades the sink to an ACID table — the
    production posture behind the at-least-once → effectively-once
    story: a retried micro-batch's append is atomic (no partial
    files), and readers never see an in-flight commit. Requires the
    ``delta-spark`` package plus a session built with the Delta SQL
    extension and catalog (``delta.configure_spark_with_delta_pip``);
    raises ``ImportError`` with that guidance when absent. The default
    stays parquet so the library has zero hard dependencies beyond
    Spark (this container ships no delta-spark — the delta path is
    exercised by a skip-if-absent test).
    """
    if format == "delta":
        try:
            import delta  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "write_metrics(format='delta') needs the delta-spark "
                "package and a Delta-enabled SparkSession (see "
                "delta.configure_spark_with_delta_pip)"
            ) from e
    salt = F.pmod(F.xxhash64(F.col("name")), F.lit(files_per_date))
    # Explicit partition count: with a bare repartition(cols) AQE's
    # partition coalescing would merge a small batch's salted splits
    # back into one task, silently undoing the fan-out guarantee. The
    # count itself stays bounded: distinct (date, salt) pairs cap live
    # output files at n_dates × files_per_date regardless of N.
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    writer = (
        df.repartition(n_parts, F.col(PARTITION_COLUMN), salt)
        .sortWithinPartitions(PARTITION_COLUMN, *SORT_COLUMNS)
        .write.mode(mode)
        .partitionBy(PARTITION_COLUMN)
    )
    if format == "delta":
        writer.format("delta").save(path)
    else:
        writer.parquet(path)


def _publish_file(fs, src, dst) -> None:
    """Single-file atomic publish (rename). Module-level seam so
    crash-consistency tests can inject a failure mid-publish."""
    fs.rename(src, dst)


def _mark_committed(fs, marker) -> None:
    """Atomic ledger commit (createNewFile). Module-level seam so
    crash-consistency tests can inject a failure before the commit."""
    fs.createNewFile(marker)


def batch_committed(spark, path: str, batch_id: int, *,
                    ledger_dir: str = "_ingest_ledger") -> bool:
    """True iff the ledger shows ``batch_id`` fully published into the
    table at ``path`` (step 1 of the exactly-once protocol)."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    marker = hpath(f"{path}/{ledger_dir}/batch-{batch_id:012d}")
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(marker))


def publish_staged_batch(spark, path: str, staging: str,
                         batch_id: int, partition_col: str, *,
                         ledger_dir: str = "_ingest_ledger") -> None:
    """Steps 3-5 of the exactly-once replay protocol, shared by every
    path-based partitioned sink (the metrics table on ``date``, the
    semantic embedding index on ``cell``): sweep a crashed attempt's
    partially-published ``b<id>-*`` files, rename each staged file
    into its live partition under the batch-id prefix, delete the
    staging directory, atomically create the ledger marker. See
    :func:`write_metrics_exactly_once` for the full protocol and the
    crash→recovery case analysis — this helper keeps the
    ``_publish_file`` / ``_mark_committed`` seams so crash-injection
    tests cover any caller."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    root = hpath(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    marker = hpath(f"{path}/{ledger_dir}/batch-{batch_id:012d}")
    for st in fs.globStatus(
            hpath(f"{path}/{partition_col}=*/b{batch_id:012d}-*")):
        fs.delete(st.getPath(), False)
    for st in fs.globStatus(
            hpath(f"{staging}/{partition_col}=*/*.parquet")):
        src = st.getPath()
        part = src.getParent().getName()  # <partition_col>=<value>
        live_dir = hpath(f"{path}/{part}")
        fs.mkdirs(live_dir)
        _publish_file(
            fs, src,
            hpath(f"{path}/{part}/b{batch_id:012d}-{src.getName()}"))
    fs.delete(hpath(staging), True)
    fs.mkdirs(marker.getParent())
    _mark_committed(fs, marker)


def write_metrics_exactly_once(df: DataFrame, path: str,
                               batch_id: int, *,
                               files_per_date: int = 8) -> bool:
    """K1 with an effectively-once replay contract on plain parquet —
    the no-Delta answer to 'a retried micro-batch must not duplicate
    or half-write rows' (the reference simply DROPS failed batches,
    main.go:396-406; Spark's checkpoint replays them, so the sink must
    be idempotent).

    Protocol (per table path, per micro-batch):

    1. ledger check: ``<path>/_ingest_ledger/batch-<id>`` exists ⇒ a
       previous attempt fully published this batch — skip (returns
       False).
    2. stage: write the batch via :func:`write_metrics` into
       ``<path>/_staging/batch-<id>`` in overwrite mode (clobbers any
       partial staging a crashed attempt left).
    3. clean: delete live files matching ``date=*/b<id>-*`` — the
       visible residue of a crashed attempt that died mid-publish.
    4. publish: rename each staged file into its live date partition
       as ``b<id>-<name>`` (one atomic rename per file).
    5. commit: atomically create the ledger marker.

    A crash anywhere replays into the matching recovery: before any
    publish ⇒ restage; mid-publish ⇒ step 3 removes the partial batch
    and step 4 republishes; after publish but before commit ⇒ same;
    after commit ⇒ step 1 skips. The batch-id prefix on every filename
    is what makes a failed attempt's output identifiable — without it
    a replay cannot distinguish its own partial rows from other
    batches' (exactly the reason vanilla parquet append is only
    at-least-once). ``_ingest_ledger`` and ``_staging`` live inside
    the table path but start with '_', so parquet readers ignore them.

    Readers see the batch's files appear one rename at a time — the
    same mid-append visibility plain parquet always has; Delta's
    all-or-nothing snapshot remains the opt-in upgrade
    (:func:`write_metrics` ``format='delta'``).

    Returns True if this call published the batch, False if the
    ledger showed it already committed.
    """
    spark = df.sparkSession
    if batch_committed(spark, path, batch_id):
        return False
    staging = f"{path}/_staging/batch-{batch_id:012d}"
    write_metrics(df, staging, mode="overwrite",
                  files_per_date=files_per_date)
    publish_staged_batch(spark, path, staging, batch_id,
                         PARTITION_COLUMN)
    return True


def write_metrics_table(df: DataFrame, table_name: str, *,
                        buckets: int = 32, mode: str = "append",
                        fanout: int = 1) -> None:
    """K1 catalog variant: date-partitioned AND bucketed by metric name.

    Bucketing hash-places every series' files deterministically, so
    downstream ``groupBy(name, ...)`` aggregations and self-joins on
    the series key read co-located buckets and skip the shuffle
    entirely (the physical plan has no Exchange — asserted in
    tests/test_scale.py). This is the at-rest layout for query-heavy
    deployments; the path-based writer stays for pure archive tables.

    The pre-write repartition clusters rows by (date, bucket-of-name)
    — ``F.hash`` is the same Murmur3 the bucket spec uses — so each
    append lands one file per (date, bucket) pair instead of one per
    (task, date, bucket): unaligned, a 32-task append over a 30-day
    window writes up to 30k ~tiny files and every later bucketed scan
    pays the listing (r9 — the same disease measured on the MinHash
    index tables). ``fanout`` is the skew escape hatch (the
    ``write_metrics`` ``files_per_date`` precedent): one writer per
    (date, bucket) serializes a hot series' whole day, so ``fanout``
    > 1 salt-splits each pair across that many writers — files per
    append grow to dates×buckets×fanout, per-task volume caps at
    1/fanout. The salt derives from the ``ts`` column (every wire
    row has one and it is near-unique within a hot series), so
    ``fanout > 1`` requires ``ts`` — validated here at the call site
    rather than failing deep inside the write job (ADVICE r9).
    """
    if fanout > 1 and "ts" not in df.columns:
        raise ValueError(
            f"write_metrics_table(fanout={fanout}): the fan-out salt "
            f"derives from a 'ts' column, which this frame lacks "
            f"(columns: {df.columns}) — fan-out splits a hot "
            f"(date, bucket) pair by timestamp")
    salt = (F.pmod(F.xxhash64("ts"), F.lit(fanout)) if fanout > 1
            else F.lit(0))
    (
        df.repartition(F.col(PARTITION_COLUMN),
                       F.pmod(F.hash(F.col("name")), F.lit(buckets)),
                       salt)
        .write.mode(mode)
        .format("parquet")
        .partitionBy(PARTITION_COLUMN)
        .bucketBy(buckets, "name")
        .sortBy(*SORT_COLUMNS)
        .saveAsTable(table_name)
    )
