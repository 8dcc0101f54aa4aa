"""DSIR-style importance resampling for training-data selection.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) selects raw-corpus documents that look like a small
target corpus WITHOUT training a classifier: fit two bag-of-hashed-
n-gram unigram models — target p and raw q — and resample raw docs
with importance weight ``log w(x) = Σ_b c_b(x)·(log p̂_b − log q̂_b)``
over hashed n-gram buckets. It is the published, cheaper alternative
to the CCNet/GPT-3 classifier gate (`operators/classify.py`) and
composes with the same curation machinery.

Spark-first shape, every stage bounded:

- :func:`hashed_ngram_counts` — corpus-level bucket counts. Tokens +
  MAP-SIDE bigram arrays (the `lm2_doc_scores` recipe — no window, no
  self-join) explode into `portable_hash64 % dim` buckets; the hash
  aggregate partial-combines map-side, so only ``dim`` rows per
  partition cross the wire and the output is a ``dim``-row table no
  matter the corpus size.
- :func:`dsir_log_ratios` — the per-bucket log-likelihood-ratio
  table λ_b from the two count tables (add-``alpha`` smoothing over
  the shared ``dim``-bucket space, so unseen buckets are defined on
  both sides). Two ``dim``-row inputs, one ``dim``-row output;
  9-dp-rounded per the oracle discipline.
- :func:`dsir_doc_weights` — per-doc ``log w``: explode → bucket →
  per-(doc, bucket) count → broadcast-join the ``dim``-row λ table →
  per-doc sum. Shuffles only hash-narrow (id, bucket, count) rows —
  never the text, never the doc table; token-free docs keep a row
  with weight 0 (full-coverage contract, the `lr_score` LEFT-join
  pattern).
- :func:`dsir_select` — sample ``n`` docs without replacement with
  probability ∝ ``w^(1/temperature)`` via the Gumbel top-k trick:
  ``key = logw/T + g``, ``g = −ln(−ln(u))`` with a hash-deterministic
  uniform per doc (replay-stable, partitioning-independent — the
  `weighted_sample_n` discipline), ranked by the 6-dp-rounded key
  with an id tie-break through ``TakeOrderedAndProject`` — never a
  global sort.

100 TB posture: the target corpus is small by construction (a
reference set); the raw corpus is the big side and is touched ONCE
when :func:`dsir_select` pins the narrow (id, bucket, count) frame
(``reuse_counts=True``), or by two plain scans with zero cache
pressure (``reuse_counts=False`` — right when caching the counts is
itself a storage event). All other state is O(dim) rows, collected
once and re-shipped as local relations so no corpus pipeline is ever
embedded in a broadcast subtree.

Reference parity: the reference repo (`/root/reference`, a Prometheus
remote-storage bridge) has no data-selection surface — this is part
of the training-data-pipeline extension, built from the public paper
cited above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64
from .text import nonempty_tokens


def _ngram_buckets(toks: Column, dim: int, bigrams: bool) -> Column:
    """Hashed n-gram bucket array over a MATERIALIZED token-array
    column: unigrams plus (optionally) space-joined adjacent bigrams
    via ``zip_with`` over shifted slices, each mapped through
    ``portable_hash64 % dim``. ``toks`` must be a projected column
    reference, not an inline split expression — array element access
    re-evaluates its operand, so an inline split goes quadratic per
    document (the lm2 bigram discipline; measured 4× on the sf0.1
    explode)."""
    grams = toks
    if bigrams:
        n1 = F.greatest(F.size(toks) - 1, F.lit(0))
        bi = F.zip_with(
            F.slice(toks, 1, n1), F.slice(toks, 2, n1),
            lambda a, b: F.concat(a, F.lit(" "), b))
        grams = F.concat(toks, bi)
    return F.transform(
        grams, lambda g: (portable_hash64(g) % dim).cast("int"))


def hashed_ngram_counts(docs: DataFrame, *, dim: int = 1024,
                        bigrams: bool = True, text_col: str = "text"
                        ) -> DataFrame:
    """Corpus-level hashed n-gram counts: a ``(bucket int, c long)``
    table with at most ``dim`` rows. One scan; the bucket hash
    aggregate partial-combines map-side so the shuffle moves ≤ dim
    rows per input partition regardless of corpus size."""
    base = docs.select(nonempty_tokens(F.col(text_col)).alias("toks"))
    return (base.select(F.explode(
        _ngram_buckets(F.col("toks"), dim, bigrams)).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("c")))


def dsir_log_ratios(target_counts: DataFrame, raw_counts: DataFrame,
                    *, dim: int, alpha: float = 1.0) -> DataFrame:
    """Per-bucket log-likelihood ratio ``λ_b = ln p̂_b − ln q̂_b`` with
    add-``alpha`` smoothing over the full ``dim``-bucket space
    (``p̂_b = (c_b + α)/(T + α·dim)``), as a ``dim``-row
    ``(bucket, lam)`` table. λ is 9-dp-rounded so downstream sums are
    engine-reproducible (oracle discipline). Buckets unseen in BOTH
    corpora still get a row (λ from pure smoothing — typically ≠ 0
    when corpus totals differ), so the doc-side join never drops
    token mass."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    spark = target_counts.sparkSession
    full = spark.range(dim).select(F.col("id").cast("int").alias("bucket"))
    t = target_counts.withColumnRenamed("c", "ct")
    r = raw_counts.withColumnRenamed("c", "cr")
    # coalesce: an empty (or fully token-free) corpus must yield
    # total 0 → pure-smoothing λ, not NULL λ everywhere (r8 review)
    tt = target_counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("Tt"))
    tr = raw_counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("Tr"))
    ad = F.lit(float(alpha) * dim)
    lam = F.round(
        F.log((F.col("ct") + F.lit(float(alpha)))
              / (F.col("Tt").cast("double") + ad))
        - F.log((F.col("cr") + F.lit(float(alpha)))
                / (F.col("Tr").cast("double") + ad)), 9)
    # every side is ≤ dim rows — broadcast them all so the λ build
    # never sorts or shuffles (it lives inside the doc-side join's
    # broadcast subtree)
    return (full.join(F.broadcast(t), "bucket", "left")
            .join(F.broadcast(r), "bucket", "left")
            .select("bucket",
                    F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
                    F.coalesce(F.col("cr"), F.lit(0)).alias("cr"))
            .crossJoin(F.broadcast(tt)).crossJoin(F.broadcast(tr))
            .select("bucket", lam.alias("lam")))


def doc_bucket_counts(raw_docs: DataFrame, *, dim: int,
                      bigrams: bool = True, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Per-(doc, bucket) hashed n-gram counts — the one heavy pass
    over the raw corpus. Token-free/NULL docs keep a NULL-bucket
    placeholder row (``explode_outer``) so downstream coverage never
    needs a doc-table back-join. Both the corpus-level q̂ counts and
    the per-doc weights derive from THIS frame: built twice in one
    action, the two branches share a byte-identical (id, bucket)
    exchange subtree and Spark's ReuseExchange executes it once —
    the 100 TB side is scanned once per action."""
    base = raw_docs.select(F.col(id_col),
                           nonempty_tokens(F.col(text_col)).alias("toks"))
    buckets = base.select(
        F.col(id_col),
        F.explode_outer(
            _ngram_buckets(F.col("toks"), dim, bigrams)).alias("bucket"))
    return buckets.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("c"))


def corpus_counts_from_doc_counts(counts: DataFrame) -> DataFrame:
    """(id, bucket, c) → corpus-level (bucket, c), excluding the
    NULL-bucket placeholder rows of token-free docs. Integer-exact
    equal to :func:`hashed_ngram_counts` on the same corpus."""
    return (counts.where(F.col("bucket").isNotNull())
            .groupBy("bucket").agg(F.sum("c").alias("c")))


def _weights_from_counts(counts: DataFrame, ratios: DataFrame,
                         id_col: str, out_col: str) -> DataFrame:
    contrib = F.round(F.col("c") * F.col("lam"), 9)
    # final round COARSER (6 dp) than the 9-dp contributions so
    # cross-engine summation-order ulp drift can't flip the rounded
    # value (oracle discipline; r8 review)
    return (counts.join(F.broadcast(ratios), "bucket", "left")
            .groupBy(id_col)
            .agg(F.round(F.coalesce(F.sum(contrib), F.lit(0.0)), 6)
                 .alias(out_col)))


def dsir_doc_weights(raw_docs: DataFrame, ratios: DataFrame, *,
                     dim: int, bigrams: bool = True,
                     id_col: str = "doc_id", text_col: str = "text",
                     out_col: str = "logw") -> DataFrame:
    """Per-document log importance weight ``Σ_b c_b·λ_b`` — explode →
    bucket → per-(doc, bucket) count → broadcast ``dim``-row λ join →
    per-doc sum of 9-dp-rounded contributions, 6-dp output. Token-free/NULL docs
    keep a row with weight 0.0 (full coverage, no doc-table
    back-join — the `lr_score` explode_outer/LEFT pattern)."""
    counts = doc_bucket_counts(raw_docs, dim=dim, bigrams=bigrams,
                               id_col=id_col, text_col=text_col)
    return _weights_from_counts(counts, ratios, id_col, out_col)


def dsir_select(raw_docs: DataFrame, target_docs: DataFrame, n: int, *,
                dim: int = 1024, bigrams: bool = True,
                alpha: float = 1.0, temperature: float = 1.0,
                salt: str = "dsir", id_col: str = "doc_id",
                text_col: str = "text",
                reuse_counts: bool = True) -> DataFrame:
    """Select ``n`` raw docs via Gumbel top-k importance resampling
    against the target corpus: sampling without replacement with
    ``P(pick) ∝ w^(1/temperature)`` where ``log w`` is the DSIR
    weight. ``temperature → 0`` degenerates to deterministic top-n by
    weight; 1.0 is the paper's sampling regime. The Gumbel noise is
    hash-deterministic per doc id (replay-stable), the rank key is
    6-dp-rounded (over 9-dp-rounded Gumbel terms) with an id
    tie-break, and the top-n runs as ``TakeOrderedAndProject`` —
    never a global sort.

    Weights are RELATIVE log-ratios: a doc with no n-grams scores a
    ratio-neutral ``logw = 0``, which can outrank in-domain docs whose
    extra tokens pull them negative — run the quality/hygiene gates
    first (the capstone order) so token-free docs never reach
    selection.

    Returns (id_col, logw, key) for the selected docs."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    from .sampling import uniform_unit

    from .dedup import _pin

    spark = raw_docs.sparkSession
    # The (id, bucket, c) frame feeds BOTH q̂ and the per-doc weights.
    # reuse_counts=True pins it (released via dedup.unpersist_pinned /
    # cache_scope, the module-wide cache lifecycle) so the raw corpus
    # is scanned ONCE — right whenever the narrow count frame fits
    # cluster memory+disk. At corpus scales where caching it is
    # itself a storage event, reuse_counts=False re-derives it, i.e.
    # two plain corpus scans and zero cache pressure. Either way the
    # dim-row count tables are collected (bounded — the IVF-centroid/
    # LR-weights pattern) and re-created as LOCAL relations, so the
    # λ build runs the exact same Spark expressions over dim rows
    # with zero corpus scans in its subtree — without this, the
    # broadcast λ subtree re-embedded the corpus pipelines twice more
    # (counts + totals) per action.
    counts = doc_bucket_counts(raw_docs, dim=dim, bigrams=bigrams,
                               id_col=id_col, text_col=text_col)
    if reuse_counts:
        counts = _pin(counts)
    cnt_schema = "bucket int, c long"
    # ONE tagged-union collect for both dim-row count tables (r14):
    # collected sequentially, the raw-corpus pass and the target pass
    # ran as two driver round-trips with the second scan idling the
    # cluster until the first returned; unioned, both branches
    # schedule inside one job (the q̂ branch also materializes the
    # pinned counts frame exactly as the old first collect did), and
    # the round-trip constant is paid once. Row sets per side are
    # unchanged — the local relations feed bucket-keyed joins, so
    # collect order is immaterial.
    both = (
        corpus_counts_from_doc_counts(counts)
        .select(F.lit(0).alias("side"), "bucket", "c")
        .unionByName(
            hashed_ngram_counts(target_docs, dim=dim, bigrams=bigrams,
                                text_col=text_col)
            .select(F.lit(1).alias("side"), "bucket", "c"))
    ).collect()
    rc_local = spark.createDataFrame(
        [(r["bucket"], r["c"]) for r in both if r["side"] == 0],
        cnt_schema)
    tc_local = spark.createDataFrame(
        [(r["bucket"], r["c"]) for r in both if r["side"] == 1],
        cnt_schema)
    lam = dsir_log_ratios(tc_local, rc_local, dim=dim, alpha=alpha)
    w = _weights_from_counts(counts, lam, id_col, "logw")
    # u ∈ [0, 1) is bit-identical across engines (pure hash→double
    # arithmetic); the Gumbel draw −ln(−ln u) is 9-dp-rounded BEFORE
    # the sum so libm differences can't flip ranks (the
    # weighted_sample_n rounded-key discipline)
    u = uniform_unit(F.col(id_col), salt)
    g = F.round(-F.log(-F.log(F.greatest(u, F.lit(1e-12)))), 9)
    # 6-dp key for the same coarser-than-terms reason as logw
    key = F.round(F.col("logw") / F.lit(float(temperature)) + g, 6)
    return (w.select(id_col, "logw", key.alias("key"))
            .orderBy(F.desc("key"), F.col(id_col))
            .limit(n))
