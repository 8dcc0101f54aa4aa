"""Web-crawl curation operators: URL canonicalization, host /
registrable-domain extraction, and URL-level dedup — the provenance
axis of a crawl corpus, where the same page is fetched under many
textually-different URLs (scheme/host case, default ports, tracking
parameters, fragments, param order) and per-domain quotas/blocklists
are the first curation gate.

Everything here is a PURE COLUMN EXPRESSION (regexp + array
built-ins): the whole pass stays inside whole-stage codegen — zero
Python, zero UDFs, zero shuffles until the caller aggregates — and a
SQL oracle can replay it verbatim. Reference parity: the reference
engine has no web surface (its namespace is metric label matching,
``main.go``); this extends the task brief's training-data-pipeline
operators the same way the text/dedup families do.

Normalization semantics (documented contract, oracle-locked):

- scheme and authority lowercased; path/query case preserved
  (case-significant per RFC 3986);
- userinfo (``user:pw@``) dropped — it is PII and never part of the
  resource identity;
- default ports stripped (``:80`` for http, ``:443`` for https);
  other ports kept;
- fragment dropped;
- empty path becomes ``/``;
- query parameters: tracking params (:data:`TRACKING_PARAMS`) and
  empty fragments from ``&&`` dropped, the rest byte-sorted and
  re-joined — param ORDER never splits a dedup group; an
  all-tracking query drops the ``?`` entirely;
- duplicate slashes in the path are KEPT (``//x`` is a different
  resource per RFC; collapse upstream if your crawler says so);
- a string with no ``scheme://`` is not a URL → NULL (triage).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters that identify the CLICK, not the resource —
#: dropped by :func:`url_normalize`. The usual analytics/affiliate
#: suspects; extend per-corpus via the ``tracking`` argument.
TRACKING_PARAMS = ("utm_[^=&]*", "fbclid", "gclid", "msclkid",
                   "igshid", "mc_eid", "_ga", "ref_src")

#: two-level public suffixes for :func:`registrable_domain` — the
#: common subset of the Mozilla Public Suffix List (public data);
#: production callers pass their full PSL snapshot instead. A host
#: whose last two labels are here registers at the third label.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.in", "net.in", "org.in", "co.kr", "or.kr",
    "com.br", "net.br", "org.br", "com.mx", "com.ar",
    "com.cn", "net.cn", "org.cn", "gov.cn", "com.tw", "com.hk",
    "com.sg", "com.my", "co.za", "com.tr", "co.il", "com.pl",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _parts(url: Column):
    """(scheme, host, port, path, query) Columns of a trimmed,
    fragment-free URL. Internal — each part is an anchored
    single-match regexp so a SQL oracle replays it without global
    flags."""
    u = F.regexp_replace(F.trim(url), r"#[\s\S]*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    auth = F.lower(
        F.regexp_replace(  # userinfo is PII, never resource identity
            F.regexp_extract(rest, r"^([^/?]*)", 1), r"^[^/?]*@", ""))
    # absolute DNS names ('example.com.') are the same host — the
    # trailing dot would otherwise split dedup groups and collapse
    # registrable_domain to the bare suffix
    host = F.regexp_replace(
        F.regexp_replace(auth, r":[0-9]*$", ""), r"\.$", "")
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    tail = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.when(tail.contains("?"),
                   F.regexp_replace(tail, r"^[^?]*\?", "")
                   ).otherwise(F.lit(""))
    return scheme, host, port, path, query


def url_normalize(url: Column,
                  tracking: Sequence[str] = TRACKING_PARAMS) -> Column:
    """Canonical form of a URL per the module contract — the key to
    group on for URL-level exact dedup. NULL for non-URLs."""
    scheme, host, port, path, query = _parts(url)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    track_re = "^(" + "|".join(tracking) + ")(=|$)"
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(track_re)))
    qs = F.array_join(params, "&")
    norm = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        F.when(path == "", "/").otherwise(path),
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(""))
    return F.when(scheme != "", norm)


def host_of(url: Column) -> Column:
    """Lowercased host of a URL — no userinfo, no port; NULL for
    non-URLs."""
    scheme, host, _port, _path, _query = _parts(url)
    return F.when(scheme != "", host)


def registrable_domain(host: Column,
                       two_level: Sequence[str] = TWO_LEVEL_SUFFIXES,
                       ) -> Column:
    """Registrable domain of a host: the public suffix plus one
    label — ``a.b.example.com`` → ``example.com``,
    ``www.example.co.uk`` → ``example.co.uk`` — the unit crawl
    quotas, blocklists, and per-site stats key on. ``two_level``
    lists the suffixes that are themselves two labels (PSL-derived);
    hosts with fewer labels pass through unchanged.

    Scale note: ``isin`` embeds the suffix list as plan literals —
    fine for this default (~40) and for a few hundred entries; with
    a FULL PSL snapshot (~9k multi-label suffixes, incl. 3-label
    ones this signature can't express) prefer a broadcast left join
    against a suffix table keyed on the candidate last-2/last-3
    labels instead of growing this list."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3),
                        F.element_at(labels, -2),
                        F.element_at(labels, -1))
    return (F.when((n >= 3) & last2.isin(*two_level), last3)
            .when(n >= 2, last2).otherwise(host))


def robots_filter(df: DataFrame, rules: DataFrame, *, url_col: str,
                  id_col: str,
                  broadcast_rules: bool | None = None,
                  fail_closed: bool = False) -> DataFrame:
    """Crawl-compliance gate: adds an ``allowed`` boolean per row by
    checking each URL against its host's robots rules (a
    :func:`..sources.robots.robots_rules` frame). Precedence is the
    public convention: among matching rules the LONGEST pattern
    wins, allow beats disallow on ties; a host with no rules (or no
    robots.txt) is fully allowed. Matching covers path+query, per
    RFC 9309.

    Scale shape: one join keyed on host, one regexp match per
    (url, candidate-rule) pair (JVM ``regexp_like`` with the
    precompiled-per-rule pattern column), one max-struct
    aggregation, one join back on ``id_col``. No Python, no windows.

    ``broadcast_rules`` is the repo's tri-state stats-side
    convention (see ``text._stats_side``): ``None`` (default)
    attaches no hint — Catalyst's ``autoBroadcastJoinThreshold`` +
    AQE decide at runtime (mapInPandas output has no stats, so the
    pre-AQE plan is a shuffle join); ``True`` forces a broadcast
    (right for the usual rule table: rule-count rows, not corpus
    rows); ``False`` forces the skew-safe shuffle join (right for a
    web-scale host census that would OOM the driver).

    ``fail_closed`` picks the posture for hosts whose robots.txt
    could not be fully parsed (an ``err`` row: unreadable payload or
    a ``RulesTruncated`` marker from the MAX_RULES bound). The
    default ``False`` treats them as fully allowed (the de-facto
    crawler convention for a broken robots.txt); ``True`` denies
    every URL on such a host — the conservative compliance gate."""
    for reserved in ("allowed", "_rb_host", "_rb_t", "_rb_d",
                     "_rb_bad"):
        if reserved in df.columns:
            raise ValueError(
                f"robots_filter: input already has a '{reserved}' "
                f"column (reserved by this operator) — rename it or "
                f"drop it first")
    u = F.col(url_col)
    scheme, host, _port, path, query = _parts(u)
    target = F.concat(
        F.when(path == "", "/").otherwise(path),
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(""))
    with_t = df.withColumn("_rb_host", host).withColumn("_rb_t", target)
    rule_side = rules.filter(F.col("err").isNull()).select(
        F.col("host").alias("_rb_host"), "allow", "pattern",
        "pattern_re")
    if broadcast_rules is True:
        rule_side = F.broadcast(rule_side)
    elif broadcast_rules is False:
        rule_side = rule_side.hint("merge")
    # decisions key on (id, host, target), NOT id alone: an id shared
    # by several rows (e.g. every record of one WARC archive carries
    # the same src_id) must not merge verdicts across its URLs — and
    # the HOST must be part of the key too, or the same path on two
    # different hosts (path '/' collides constantly) would pool both
    # hosts' rules into one max-struct and cross-apply verdicts
    cand = with_t.select(id_col, "_rb_host", "_rb_t").join(
        rule_side, "_rb_host")
    dec = (cand.filter(F.regexp_like(F.col("_rb_t"),
                                     F.col("pattern_re")))
           .groupBy(id_col, "_rb_host", "_rb_t")
           .agg(F.max(F.struct(
               F.length("pattern").alias("l"),
               F.col("allow"))).alias("_rb_d")))
    out = (with_t.join(dec, [id_col, "_rb_host", "_rb_t"], "left")
           .withColumn("allowed",
                       F.coalesce(F.col("_rb_d.allow"), F.lit(True))))
    if fail_closed:
        # hosts whose robots.txt quarantined (err row: unreadable
        # payload, or a RulesTruncated marker meaning the policy was
        # only partially parsed) are DENIED instead of silently
        # allowed — the conservative compliance posture. The bad-host
        # frame follows the same tri-state as the rule side: err
        # hosts are usually a sliver (broadcast-sized), but a caller
        # who chose broadcast_rules=False to protect the driver from
        # a web-scale census gets the shuffle join here too.
        bad = rules.filter(F.col("err").isNotNull()).select(
            F.col("host").alias("_rb_host")).distinct() \
            .withColumn("_rb_bad", F.lit(True))
        if broadcast_rules is True:
            bad = F.broadcast(bad)
        elif broadcast_rules is False:
            bad = bad.hint("merge")
        out = (out.join(bad, "_rb_host", "left")
               .withColumn("allowed",
                           F.when(F.col("_rb_bad"), F.lit(False))
                           .otherwise(F.col("allowed")))
               .drop("_rb_bad"))
    return out.drop("_rb_host", "_rb_t", "_rb_d")


#: the minimal named-entity set :func:`html_to_text` decodes —
#: ``&amp;`` LAST so entity-escaped entities (``&amp;lt;``) decode
#: exactly one level, like a real HTML parser. Numeric entities
#: beyond ``&#39;`` are left as-is (a full decoder needs the HTML5
#: entity table; this is the C4-style curation extractor, not a
#: browser).
_HTML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                  ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML document — the C4/CCNet-style
    extraction step between a crawl's HTTP body and the ``documents``
    table: drop script/style/noscript blocks and comments, strip
    tags, decode the common entities, collapse whitespace. Pure
    Column expressions (global Java-regex replaces with inline
    ``(?is)`` flags — every pattern is RE2-compatible so a SQL
    oracle replays it with the ``'isg'`` options string; no ``\\s``,
    explicit ASCII classes per the cross-engine rule). NULL → ``''``
    (the text-operator contract). This is deliberately the simple
    whole-document extractor; boilerplate/main-content splitting
    (trafilatura-style DOM scoring) needs a real parser and is out
    of scope."""
    h = F.coalesce(html, F.lit(""))
    for tag in ("script", "style", "noscript"):
        h = F.regexp_replace(h, f"(?is)<{tag}[^>]*>.*?</{tag}>", " ")
    h = F.regexp_replace(h, r"(?is)<!--.*?-->", " ")
    h = F.regexp_replace(h, r"(?is)<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        h = F.replace(h, F.lit(ent), F.lit(ch))
    # explicit ASCII whitespace class, spelled \x0B NOT \v: in JAVA
    # regex \v is the vertical-whitespace CLASS (adds U+0085/U+2028/
    # U+2029) while in RE2/Python it is only \x0B — text._WS_CLASS
    # can say \v because it runs under Python re; this one runs JVM-
    # side and the oracle replays the literal pattern in RE2
    return F.trim(F.regexp_replace(h, r"[ \t\n\r\f\x0B]+", " "))


def domain_rollup(df: DataFrame, *, url_col: str,
                  two_level: Sequence[str] = TWO_LEVEL_SUFFIXES,
                  approx: bool = False,
                  rsd: float = 0.02) -> DataFrame:
    """Per-registrable-domain crawl census: one row per domain with
    ``n_rows`` (fetches), ``n_urls`` (distinct normalized URLs) and
    ``n_hosts`` (distinct hosts) — the frame crawl quotas and
    blocklist audits read.

    ``approx=False`` (oracle mode) uses exact ``count_distinct``:
    at scale that is an expand + second shuffle PER distinct column
    — the plan triples its exchanged rows, fine at sf1, the
    dominant cost at 100 TB. ``approx=True`` switches both distincts
    to JVM HyperLogLog++ (``approx_count_distinct``, relative error
    ``rsd``): one pass, one shuffle of fixed-size sketch buffers, no
    expand — the 100 TB posture. (For PERSISTED mergeable sketches
    across batches use ``operators.sketch.hll_sketch`` instead; this
    is the one-shot census.)"""
    if "_dr_host" in df.columns:
        raise ValueError(
            "domain_rollup: input already has a '_dr_host' column "
            "(reserved as this operator's working column) — rename "
            "it or drop it first")
    host = host_of(F.col(url_col))
    cd = ((lambda c: F.approx_count_distinct(c, rsd)) if approx
          else F.count_distinct)
    return (df.withColumn("_dr_host", host)
            .groupBy(registrable_domain(F.col("_dr_host"),
                                        two_level).alias("domain"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 cd(url_normalize(F.col(url_col))).alias("n_urls"),
                 cd(F.col("_dr_host")).alias("n_hosts")))


def url_dedup(df: DataFrame, *, url_col: str, id_col: str,
              tracking: Sequence[str] = TRACKING_PARAMS) -> DataFrame:
    """URL-level exact dedup: adds ``norm_url`` and ``canon_id`` (the
    smallest ``id_col`` sharing the normalized URL — deterministic,
    engine-independent winners; rows with un-normalizable URLs keep
    their own id). Keep-one is ``filter(col(id) == col("canon_id"))``.

    Scale shape: one hash aggregation + one shuffle join, both keyed
    on ``norm_url`` — the same plan as ``dedup.exact_pairs``; no
    windows, no driver collect."""
    for reserved in ("norm_url", "canon_id"):
        if reserved in df.columns:
            raise ValueError(
                f"url_dedup: input already has a '{reserved}' column "
                f"(reserved as this operator's output) — rename it or "
                f"drop it first")
    norm = url_normalize(F.col(url_col), tracking)
    with_norm = df.withColumn("norm_url", norm)
    canon = (with_norm.filter(F.col("norm_url").isNotNull())
             .groupBy("norm_url")
             .agg(F.min(id_col).alias("canon_id")))
    return (with_norm.join(canon, "norm_url", "left")
            .withColumn("canon_id",
                        F.coalesce("canon_id", F.col(id_col))))
