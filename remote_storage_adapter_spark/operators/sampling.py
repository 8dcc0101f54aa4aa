"""Deterministic sampling and dataset-split operators (training-data
pipelines, task brief: large-scale pipeline operations).

Everything here is hash-deterministic and window-free: membership is a
pure function of (salt, key), so re-runs, retries, and incremental
appends assign identically with NO shuffle, NO global sort, and no RNG
state to coordinate across executors — the only split/sample mechanism
that stays stable when the corpus is rewritten partition by partition
at 100 TB. The hash is the md5-derived 60-bit integer shared with the
dedup family (`operators/dedup.portable_hash64`), so any engine with
md5 reproduces the exact membership (the DuckDB oracles do).

- :func:`uniform_unit` — deterministic U[0,1) per key.
- :func:`hash_split` — train/val/test assignment by cumulative weight
  boundaries. Pass the duplicate-cluster representative as the key
  (``dedup_clusters`` output) to make the split leakage-safe: every
  member of a near-dup cluster lands in the SAME split, so the
  holdout can't be contaminated by a paraphrase of a training doc.
- :func:`stratified_sample` — per-stratum Bernoulli sampling with
  per-group rates (a dict) or one global rate; window-free (no
  per-group ranking), so it scales as a pure map.
- :func:`pack_shards` — sequential token-budget shard assignment via
  a distributed two-pass prefix sum (never a single-reducer global
  window).
- :func:`quota_topk` — per-group retention quotas (keep the best N
  documents per language/domain/source).
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from remote_storage_adapter_spark.operators.dedup import portable_hash64

#: 2^60 — portable_hash64's exclusive upper bound.
_HASH_SPAN = float(1 << 60)


def uniform_unit(key: Column, salt: str) -> Column:
    """Deterministic uniform draw in [0, 1) from (salt, key).

    ``portable_hash64(salt || '#' || key) / 2^60`` — pure double
    arithmetic on a 60-bit hash, bit-identical in any engine with md5
    and IEEE doubles (DuckDB twin:
    ``(('0x'||substr(md5(s),1,15))::BIGINT) / 1152921504606846976.0``).
    """
    return (
        portable_hash64(
            F.concat(F.lit(f"{salt}#"), key.cast("string"))
        ).cast("double") / F.lit(_HASH_SPAN)
    )


def hash_split(df: DataFrame, weights: Sequence[tuple],
               *, key: Union[str, Column], salt: str = "split",
               out_col: str = "split") -> DataFrame:
    """Assign every row to a named split by hashing ``key``.

    ``weights`` is an ordered sequence of ``(name, weight)``; weights
    are normalized, boundaries are cumulative, and the final split
    absorbs the remainder so float rounding can never leave a row
    unassigned. Rows with equal keys get equal splits — passing the
    dedup-cluster representative (``coalesce(cluster, id)``) as the
    key is the leakage-safe form.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(w for _, w in weights))
    if total <= 0:
        raise ValueError("weights must sum > 0")
    key_col = F.col(key) if isinstance(key, str) else key
    u = uniform_unit(key_col, salt)
    expr = F.lit(weights[-1][0])  # remainder → last split
    cum = 0.0
    conds = []
    for name, w in weights[:-1]:
        cum += w / total
        conds.append((name, cum))
    for name, bound in reversed(conds):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame,
                      fractions: Union[float, Mapping[str, float]],
                      *, strata_col: str, key: Union[str, Column],
                      salt: str = "sample",
                      default_fraction: float = 0.0) -> DataFrame:
    """Keep each row iff its deterministic draw falls under its
    stratum's rate — per-group downsampling (e.g. rebalance languages
    or sources) as a pure map: no shuffle, no per-group ranking
    window, stable under re-runs and appends.

    ``fractions``: one global float, or {stratum value: fraction} with
    ``default_fraction`` for unlisted strata.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    u = uniform_unit(key_col, salt)
    if isinstance(fractions, Mapping):
        rate = F.lit(float(default_fraction))
        for val, fr in sorted(fractions.items()):
            rate = F.when(F.col(strata_col) == F.lit(val),
                          F.lit(float(fr))).otherwise(rate)
    else:
        rate = F.lit(float(fractions))
    return df.filter(u < rate)


def pack_shards(df: DataFrame, *, budget: int,
                order_col: str, weight_col: str,
                out_col: str = "shard",
                num_buckets: int = 32) -> DataFrame:
    """Assign rows to contiguous output shards by cumulative weight in
    ``order_col`` order: ``shard = exclusive-prefix-sum(weight) div
    budget`` — the step that packs documents into fixed-token-budget
    training files.

    A naive formulation is one global window (a single reducer sorting
    the whole corpus — the canonical 100 TB scale-killer). This is the
    classic distributed prefix sum instead:

    1. ``num_buckets - 1`` quantile boundaries of ``order_col`` are
       collected once (driver-tiny), making the bucket id a PURE
       function of the order key — unlike ``spark_partition_id`` after
       a range shuffle, a recompute or cache eviction can't re-draw
       the boundaries out from under pass 2.
    2. per-bucket weight subtotals → driver (``num_buckets`` rows),
       exclusive-prefix offsets folded back in as a literal map.
    3. one window PARTITIONED BY bucket (parallel over buckets, each a
       bounded slice) adds the within-bucket running sum.

    The result is the exact global running sum for ANY boundary
    placement, so correctness never depends on the quantile sketch.
    Shard ids are integer division of a long cumsum — no float
    anywhere, bit-identical in any engine. ``order_col`` must be
    unique (it is the total order); ``weight_col`` must be a
    non-negative integer column.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    return (
        _exclusive_prefix_sum(df, order_col=order_col,
                              weight_col=weight_col,
                              num_buckets=num_buckets)
        .withColumn(out_col, F.expr(f"_cum div {int(budget)}"))
        .drop("_cum")
    )


def _exclusive_prefix_sum(df: DataFrame, *, order_col: str,
                          weight_col: str,
                          num_buckets: int = 32) -> DataFrame:
    """Distributed two-pass EXCLUSIVE prefix sum of ``weight_col`` in
    ``order_col`` order, added as a ``_cum`` long column (caller
    renames/drops). The shared core of :func:`pack_shards` and
    :func:`pack_sequences` — see pack_shards' docstring for why this
    is a bucketed two-pass plan and not one global window.

    Negative weights fail fast (distributed ``raise_error`` map): a
    corrupted count would otherwise shift every later row's offset —
    silently corrupting shard/sequence geometry — while the bad row
    itself may be filtered out of the caller's output."""
    w_raw = F.col(weight_col).cast("long")
    df = df.withColumn("_w", F.when(
        w_raw < 0,
        F.raise_error(F.concat(
            F.lit(f"negative {weight_col} ("), w_raw.cast("string"),
            F.lit(") at "), F.col(order_col).cast("string"),
        )).cast("long"),
    ).otherwise(w_raw))
    weight_col = "_w"
    bounds = df.approxQuantile(
        order_col,
        [i / num_buckets for i in range(1, num_buckets)], 0.001,
    ) if num_buckets > 1 else []
    bucket = F.lit(0)
    for b in bounds:  # sorted ascending; duplicates just void a bucket
        bucket = bucket + F.when(F.col(order_col) > F.lit(b),
                                 F.lit(1)).otherwise(F.lit(0))
    d = df.withColumn("_bkt", bucket)
    totals = sorted(
        d.groupBy("_bkt").agg(F.sum(weight_col).alias("_tot")).collect(),
        key=lambda r: r["_bkt"],
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["_bkt"]] = acc
        acc += int(r["_tot"] or 0)
    if offsets:
        off_map = F.create_map(*[
            lit for b in sorted(offsets)
            for lit in (F.lit(b), F.lit(offsets[b]))
        ])
        off = F.coalesce(off_map[F.col("_bkt")], F.lit(0))
    else:  # empty input: zero-arg create_map is VOID-typed
        off = F.lit(0)
    w = Window.partitionBy("_bkt").orderBy(order_col)
    cum_excl = (
        F.sum(F.col(weight_col).cast("long")).over(w)
        - F.col(weight_col).cast("long")
        + off.cast("long")
    )
    return d.withColumn("_cum", cum_excl).drop("_bkt", "_w")


def pack_sequences(df: DataFrame, *, seq_len: int,
                   order_col: str, weight_col: str,
                   num_buckets: int = 32) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT/Pile training-data
    layout): documents form one global token stream in ``order_col``
    order, cut into fixed ``seq_len``-token sequences; a document may
    span a cut. Returns the packing MANIFEST — one row per
    (document × sequence it overlaps):

    - ``seq_id``: the training sequence,
    - ``doc_off``: first token of the slice within the document,
    - ``seq_off``: where the slice starts inside the sequence,
    - ``len``: slice length in tokens.

    Per sequence, slices tile [0, seq_len) exactly (asserted in
    tests); zero-token documents contribute no tokens and are absent
    from the manifest. Deterministic and engine-replayable: the
    global offset is the same integer two-pass prefix sum as
    :func:`pack_shards`, and every slice column is pure long
    arithmetic on it.

    Scale shape: prefix sum = bucketed windows + a ``num_buckets``-row
    driver fold; the explode emits at most ``weight/seq_len + 1`` rows
    per document — output-proportional, no global sort anywhere."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    ln = int(seq_len)
    w = F.col(weight_col).cast("long")
    d = (
        _exclusive_prefix_sum(df, order_col=order_col,
                              weight_col=weight_col,
                              num_buckets=num_buckets)
        .withColumnRenamed("_cum", "_start")
        .withColumn("_end", F.col("_start") + w)
        .filter(w > 0)
        .withColumn("seq_id", F.explode(F.sequence(
            F.expr(f"_start div {ln}"), F.expr(f"(_end - 1) div {ln}"))))
    )
    cut = F.greatest(F.col("_start"), F.col("seq_id") * ln)
    return (
        d.withColumn("doc_off", cut - F.col("_start"))
        .withColumn("seq_off", cut - F.col("seq_id") * ln)
        .withColumn("len",
                    F.least(F.col("_end"), (F.col("seq_id") + 1) * ln)
                    - cut)
        .drop("_start", "_end")
    )


def quota_topk(df: DataFrame, *, group_col: str, score: Column,
               n: int, id_col: str = "doc_id") -> DataFrame:
    """Per-group retention quota: keep the ``n`` highest-``score``
    rows of each group (ties broken by lowest id — unique,
    engine-independent winners), e.g. cap every language/domain/source
    at its best N documents when rebalancing a scraped corpus.

    Shape: one rank window PARTITIONED BY the group (parallel across
    groups; ``row_number`` evaluates streamingly over each sorted run,
    so a group is never materialized whole). The shuffle moves each
    group to one task — a pathologically hot group serializes its own
    sort; pre-filter such groups with a score threshold (a cheap
    per-group ``approx_percentile``) before ranking if a single group
    approaches executor-partition size. Prefer integer scores: float
    near-ties can rank differently across engines.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    w = Window.partitionBy(group_col).orderBy(
        score.desc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def temperature_mix(df: DataFrame, *, group_col: str,
                    temperature: float, target_frac: float,
                    key: Union[str, Column], salt: str = "mix",
                    rate_col: str = "rate") -> DataFrame:
    """Temperature-reweighted mixture sampling: downsample dominant
    groups / upweight rare ones so group g's share of the OUTPUT is
    proportional to ``share_g ** (1/T)`` (T=1 keeps natural
    proportions, T→∞ approaches uniform across groups) — the standard
    dataset-mixing step when assembling a multi-source/multi-lingual
    training corpus.

    Per-group keep rate: ``min(1, target_frac * N * m_g / n_g)`` where
    ``m_g`` is the renormalized tempered share; membership is the same
    hash-deterministic Bernoulli as :func:`stratified_sample` (pure
    map, re-run/append stable). Rates are rounded to 6 dp BEFORE the
    comparison: ``pow`` may differ by an ulp across engines, and the
    rounding makes the u < rate cut engine-independent.

    100 TB shape: one hash aggregate to count groups (output =
    |groups| rows), two scalar aggregates over that tiny frame, a
    broadcast join of the rates, then a shuffle-free filter. The data
    itself is scanned once and never shuffled.
    """
    if temperature <= 0:
        raise ValueError(
            f"temperature must be > 0, got {temperature} (T=1 keeps "
            "natural proportions; T>1 flattens toward uniform)")
    if not 0 < target_frac <= 1:
        raise ValueError(
            f"target_frac must be in (0, 1], got {target_frac}")
    kc = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("grp_n"))
    # the unpartitioned windows run over the COUNTS frame only —
    # |groups| rows (languages/sources: dozens, not billions), so the
    # single reducer is a non-issue at any data scale; the raw data
    # itself never sees a window
    every = Window.partitionBy()
    rates = (
        counts
        .withColumn("tot", F.sum("grp_n").over(every))
        .withColumn(
            "wt", F.pow(F.col("grp_n") / F.col("tot"), 1.0 / temperature))
        .withColumn("wsum", F.sum("wt").over(every))
        .select(
            group_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(target_frac) * F.col("tot")
                    * (F.col("wt") / F.col("wsum")) / F.col("grp_n"),
                ),
                6,
            ).alias(rate_col),
        )
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(uniform_unit(kc, salt) < F.col(rate_col))
    )


def sample_exact_n(df: DataFrame, n: int, *,
                   key: Union[str, Column], salt: str = "exactn") -> DataFrame:
    """Exactly ``min(n, |df|)`` rows, deterministically: the ``n``
    smallest hash draws win. The fixed-size complement of the
    Bernoulli samplers — "give me exactly 100k eval docs", not "give
    me ~1%% of them" — with the same replay stability: membership
    depends only on (salt, key) and the OTHER keys present, never on
    partitioning or visit order.

    100 TB shape: ``orderBy(u).limit(n)`` compiles to
    ``TakeOrderedAndProject`` — each task keeps a local size-``n``
    heap over its partition and the driver merges ``P x n`` candidate
    rows; no global sort, no shuffle of the losers. Driver memory is
    O(n x row-width), so keep ``n`` in the "fits on the driver" range
    (the same contract as any collect-the-sample API); for
    billion-row samples use :func:`stratified_sample` with a computed
    rate instead.

    Ties: distinct keys collide on the 60-bit draw with probability
    ~|df|^2 / 2^61, and ``key`` breaks even those — the selected set
    is a pure function of the corpus, bit-identical in any engine
    with md5 and IEEE doubles (DuckDB oracle: ``ORDER BY u, key
    LIMIT n``).

    NULL keys are excluded before ordering (non-null key contract):
    a NULL key draws a NULL ``u``, which Spark's ascending sort puts
    FIRST (always sampled) while DuckDB's puts last (never sampled) —
    filtering is the only engine-independent semantics on dirty keys.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if "_u" in df.columns:
        raise ValueError("df already has a column named '_u' "
                         "(reserved as this sampler's draw column)")
    key_col = F.col(key) if isinstance(key, str) else key
    u = uniform_unit(key_col, salt)
    return (
        df.filter(key_col.isNotNull())
        .withColumn("_u", u)
        .orderBy(F.col("_u").asc(), key_col.asc())
        .limit(n)
        .drop("_u")
    )


def weighted_sample_n(df: DataFrame, n: int, *,
                      key: Union[str, Column], weight_col: str,
                      salt: str = "wsample") -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly ``min(n, |df|)``
    rows: Efraimidis-Spirakis A-ES (Inf. Process. Lett. 97(5), 2006 —
    public formulation). Each row draws ``k = u ** (1/w)`` and the
    ``n`` LARGEST keys win; inclusion probability is proportional to
    ``w`` without replacement, in ONE pass, with no RNG state to
    coordinate — the draw is the same deterministic (salt, key) hash
    as every sampler here, so retries and re-runs select the same
    set. Canonical uses: length-weighted eval subsets
    (``weight_col="n_chars"``), quality-weighted curation.

    Rows with ``w <= 0`` (or NULL) are excluded — zero weight means
    zero inclusion probability, and A-ES keys are undefined there.

    The A-ES key is rounded to 12 dp before ranking: ``pow`` may
    differ in the last ulp across engines (JVM Math.pow vs libm), and
    rounding + the ``key`` tie-break makes the selected set
    engine-independent while perturbing true inclusion odds by
    ~1e-12. Same ``TakeOrderedAndProject`` shape, driver-size
    contract, and non-null key contract as :func:`sample_exact_n`
    (NULL keys are excluded before ordering — NULL-first vs
    NULL-last sorts diverge between engines).
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if "_k" in df.columns:
        raise ValueError("df already has a column named '_k' "
                         "(reserved as this sampler's draw column)")
    key_col = F.col(key) if isinstance(key, str) else key
    u = uniform_unit(key_col, salt)
    w = F.col(weight_col).cast("double")
    aes = F.round(F.pow(u, F.lit(1.0) / w), 12)
    return (
        df.filter(w > 0)
        .filter(key_col.isNotNull())
        .withColumn("_k", aes)
        .orderBy(F.col("_k").desc(), key_col.asc())
        .limit(n)
        .drop("_k")
    )
