"""URL canonicalization / host / registrable-domain / URL dedup
(operators/web.py). Ground truth is hand-written expected strings
straight from the module's documented contract — not derived from
the expressions under test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remote_storage_adapter_spark.operators import web as W


def _norm_map(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    rows = df.select("i", W.url_normalize(F.col("url")).alias("n"),
                     W.host_of(F.col("url")).alias("h")).collect()
    return ({r["i"]: r["n"] for r in rows},
            {r["i"]: r["h"] for r in rows})


def test_url_normalize_contract(spark):
    cases = [
        # scheme/host case, userinfo, default port, tracking params,
        # param sort, fragment — all at once
        ("HTTP://User:pw@WWW.Example.COM:80/A/b?utm_source=x&b=2&a=1#f",
         "http://www.example.com/A/b?a=1&b=2"),
        # https default port; duplicate slashes KEPT (documented)
        ("https://example.co.uk:443//x", "https://example.co.uk//x"),
        # empty path -> '/'
        ("https://example.com", "https://example.com/"),
        # non-default port kept; non-http(s) scheme ports untouched
        ("https://example.com:8080/p", "https://example.com:8080/p"),
        ("ftp://Example.com:21/f", "ftp://example.com:21/f"),
        # an all-tracking query drops the '?'
        ("https://e.com/p?utm_source=a&fbclid=b", "https://e.com/p"),
        # '&&' empties dropped; '=' -less param kept and sorted
        ("https://e.com/?b&&a=1", "https://e.com/?a=1&b"),
        # ':80' only strips with the colon (lookalike port kept)
        ("http://e.com:980/", "http://e.com:980/"),
        # path/query case preserved
        ("https://e.com/CaseSig?Q=Vv", "https://e.com/CaseSig?Q=Vv"),
        # absolute DNS name: trailing dot is the same host
        ("https://example.com./p", "https://example.com/p"),
        ("https://example.co.uk.:8443/p", "https://example.co.uk:8443/p"),
        # not a URL
        ("hello world", None),
        ("", None),
    ]
    norms, hosts = _norm_map(spark, [u for u, _ in cases])
    for i, (u, want) in enumerate(cases):
        assert norms[i] == want, (u, norms[i], want)
    assert hosts[0] == "www.example.com"
    assert hosts[3] == "example.com"        # port stripped from host
    assert hosts[9] == "example.com"        # trailing dot stripped
    assert hosts[11] is None


def test_url_normalize_idempotent(spark):
    urls = ["HTTP://User@B.Com:80/x?b=2&utm_source=t&a=1#z",
            "https://e.com", "https://e.com:8443/p?x"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [r[0] for r in
            df.select(W.url_normalize(F.col("url"))).collect()]
    twice = [r[0] for r in spark.createDataFrame(
        [(u,) for u in once], "url string")
        .select(W.url_normalize(F.col("url"))).collect()]
    assert once == twice


def test_registrable_domain(spark):
    cases = [
        ("a.b.example.com", "example.com"),
        ("www.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("com.au", "com.au"),               # bare suffix: unchanged
        ("deep.sub.x.com.au", "x.com.au"),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in
                                enumerate(cases)], "i long, h string")
    got = {r["i"]: r["d"] for r in df.select(
        "i", W.registrable_domain(F.col("h")).alias("d")).collect()}
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, (h, got[i], want)


def test_url_dedup_canonical_ids(spark):
    rows = [
        (0, "https://E.com/p?b=1&a=2"),
        (1, "https://e.com:443/p?a=2&b=1#frag"),   # same resource
        (2, "HTTPS://e.com/p?a=2&b=1&utm_source=x"),
        (3, "https://e.com/q"),
        (4, "not a url"),
        (5, "also not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r["canon_id"]
           for r in W.url_dedup(df, url_col="url",
                                id_col="doc_id").collect()}
    assert out[0] == out[1] == out[2] == 0
    assert out[3] == 3
    assert out[4] == 4 and out[5] == 5      # non-URLs keep their id
    kept = W.url_dedup(df, url_col="url", id_col="doc_id") \
        .filter(F.col("doc_id") == F.col("canon_id"))
    assert kept.count() == 4


def test_html_to_text_contract(spark):
    cases = [
        ("<html><head><title>T</title><script>var x='<p>';</script>"
         "<style>.c{color:red}</style></head>"
         "<body><h1>Head</h1>\n<p>A &amp; B &lt;ok&gt;</p>"
         "<!-- hidden --></body></html>",
         "T Head A & B <ok>"),
        # entity-escaped entity decodes exactly one level
        ("a &amp;lt; b", "a &lt; b"),
        # case-insensitive tags, attributes with '>' inside quotes
        # are OUT of scope (documented simple extractor): plain attrs
        ("<DIV class='x'>hi<BR>there</DIV>", "hi there"),
        ("&quot;q&quot; &#39;s&#39; n&nbsp;b", '"q" \'s\' n b'),
        ("<noscript>enable js</noscript>visible", "visible"),
        ("", ""),
        (None, ""),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)],
        "i long, html string")
    got = {r["i"]: r["t"] for r in df.select(
        "i", W.html_to_text(F.col("html")).alias("t")).collect()}
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, (h, got[i], want)


def test_url_dedup_reserved_columns_guard(spark):
    df = spark.createDataFrame([(0, "https://e.com", 9)],
                               "doc_id long, url string, canon_id long")
    with pytest.raises(ValueError, match="canon_id"):
        W.url_dedup(df, url_col="url", id_col="doc_id")


def test_url_ops_plan_is_pure_expression(spark):
    """The whole pass must stay inside whole-stage codegen: no
    Exchange, no Python (BatchEvalPython/ArrowEvalPython) before the
    caller aggregates."""
    df = spark.range(100).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7),
                 F.lit(".example.com/p?x="), F.col("id")).alias("url"))
    plan = df.select(
        W.url_normalize(F.col("url")).alias("n"),
        W.registrable_domain(W.host_of(F.col("url"))).alias("d"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    # NB: the array filter() lambda keeps the Project out of
    # whole-stage codegen, but it is still a JVM expression — the
    # two asserts above are the scale contract (no shuffle, no
    # Python worker)


def test_robots_rules_group_selection_and_filter(spark):
    from remote_storage_adapter_spark.sources import robots as RB

    robots = (
        "# policy\n"
        "User-agent: evilbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: trainingbot\n"
        "DISALLOW: /private*   # key case-insensitive\n"
        "Allow: /private/ok$\n"
        "Disallow: /tmp/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /all\n"
    )
    hosts = spark.createDataFrame(
        [("h.com", robots), ("open.com", None),
         ("empty.com", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string")
    rules = RB.robots_rules(hosts, agent="TrainingBot-2.1")
    assert {(r["allow"], r["pattern"]) for r in rules.collect()} == {
        (False, "/private*"), (True, "/private/ok$"),
        (False, "/tmp/")}
    # unknown agent falls back to the * group
    star = RB.robots_rules(hosts, agent="otherbot")
    assert {r["pattern"] for r in star.collect()} == {"/all"}

    urls = [(0, "https://h.com/private/x"),
            (1, "https://h.com/private/ok"),
            (2, "https://h.com/private/okx"),   # $ rule must NOT match
            (3, "https://h.com/tmp/f"),
            (4, "https://h.com/fine"),
            (5, "https://h.com/private"),
            (6, "https://h.com"),               # empty path -> '/'
            (9, "https://open.com/private/x"),  # no robots: allowed
            (10, "https://empty.com/anything")]  # empty Disallow:
    df = spark.createDataFrame(urls, "doc_id long, url string")
    out = {r["doc_id"]: r["allowed"]
           for r in W.robots_filter(df, rules, url_col="url",
                                    id_col="doc_id").collect()}
    assert out == {0: False, 1: True, 2: False, 3: False, 4: True,
                   5: False, 6: True, 9: True, 10: True}
    with pytest.raises(ValueError, match="allowed"):
        W.robots_filter(df.withColumn("allowed", F.lit(True)), rules,
                        url_col="url", id_col="doc_id")


def test_robots_pattern_regex_translation():
    import re

    from remote_storage_adapter_spark.sources.robots import (
        _pattern_regex,
    )

    r = _pattern_regex("/a*b$")
    assert r == "^/a.*b$"
    assert re.search(r, "/axxb") and not re.search(r, "/axxbc")
    # regex metacharacters in the path are literal
    r2 = _pattern_regex("/p?x=*")
    assert re.search(r2, "/p?x=anything")
    assert not re.search(r2, "/pax=anything")
    # no $: prefix match anywhere after start
    r3 = _pattern_regex("/pre")
    assert re.search(r3, "/prefix/more") and not re.search(r3, "/a/pre")


def test_robots_parse_edges():
    from remote_storage_adapter_spark.sources.robots import (
        _parse_robots,
    )

    # rules before any user-agent line belong to '*'
    assert _parse_robots("Disallow: /x\n", "any") == ([(False, "/x")], 0)
    # two groups for the same agent merge
    txt = ("User-agent: a\nDisallow: /1\n\n"
           "User-agent: a\nAllow: /2\n")
    assert _parse_robots(txt, "a") == ([(False, "/1"), (True, "/2")], 0)
    # longest agent prefix wins
    txt2 = ("User-agent: bot\nDisallow: /b\n\n"
            "User-agent: botx\nDisallow: /bx\n")
    assert _parse_robots(txt2, "botxtra") == ([(False, "/bx")], 0)
    # a user-agent line after rules starts a NEW group
    txt3 = ("User-agent: a\nDisallow: /1\nUser-agent: b\n"
            "Disallow: /2\n")
    assert _parse_robots(txt3, "a") == ([(False, "/1")], 0)
    assert _parse_robots(txt3, "b") == ([(False, "/2")], 0)


def test_robots_filter_broadcast_tristate(spark):
    """broadcast_rules follows the repo's stats-side convention:
    True -> BroadcastHashJoin on the host join, False -> the
    skew-safe merge join, None -> no hint (AQE decides)."""
    from remote_storage_adapter_spark.sources import robots as RB

    hosts = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string")
    rules = RB.robots_rules(hosts)
    df = spark.createDataFrame([(0, "https://h.com/x")],
                               "doc_id long, url string")

    def plan(br):
        return W.robots_filter(
            df, rules, url_col="url", id_col="doc_id",
            broadcast_rules=br,
        )._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan(True)
    assert "SortMergeJoin" in plan(False)
    out = {b: sorted(
        (r["doc_id"], r["allowed"]) for r in W.robots_filter(
            df, rules, url_col="url", id_col="doc_id",
            broadcast_rules=b).collect()) for b in (None, True, False)}
    assert out[None] == out[True] == out[False] == [(0, False)]


def test_robots_filter_shared_ids_keep_per_url_verdicts(spark):
    """Rows sharing an id (every record of one WARC archive carries
    the same src_id) must be judged per URL, not merged into one
    verdict per id."""
    from remote_storage_adapter_spark.sources import robots as RB

    hosts = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /private*\n")],
        "host string, robots_txt string")
    rules = RB.robots_rules(hosts)
    df = spark.createDataFrame(
        [(7, "https://h.com/private/x"), (7, "https://h.com/ok"),
         (8, "https://h.com/ok"), (8, "https://h.com/private/y")],
        "src_id long, url string")
    out = sorted((r["src_id"], r["url"], r["allowed"])
                 for r in W.robots_filter(df, rules, url_col="url",
                                          id_col="src_id").collect())
    assert out == [(7, "https://h.com/ok", True),
                   (7, "https://h.com/private/x", False),
                   (8, "https://h.com/ok", True),
                   (8, "https://h.com/private/y", False)]


def test_robots_empty_user_agent_line_is_ignored():
    from remote_storage_adapter_spark.sources.robots import (
        _parse_robots,
    )

    txt = ("User-agent:\nDisallow: /secret\n\n"
           "User-agent: *\nDisallow: /star\n")
    # the malformed empty token must not shadow the * fallback;
    # its rules attach to '*' (rules with no valid UA line above)
    assert _parse_robots(txt, "anybot") == ([(False, "/secret"),
                                             (False, "/star")], 0)


def test_robots_filter_same_path_on_two_hosts_not_pooled(spark):
    """One id carrying the SAME path on two hosts with conflicting
    rules (the WARC-archive case: every record shares src_id, and
    path '/' collides constantly) must get per-host verdicts — host
    A's disallow must not block host B, and a longer allow pattern
    on one host must not override the other host's disallow."""
    from remote_storage_adapter_spark.sources import robots as RB

    hosts = spark.createDataFrame(
        [("deny.com", "User-agent: *\nDisallow: /page\n"),
         # longer (winning-length) ALLOW on the other host: if the
         # two hosts' rules pool, this overrides deny.com's disallow
         ("ok.com", "User-agent: *\nAllow: /page*\n")],
        "host string, robots_txt string")
    rules = RB.robots_rules(hosts)
    df = spark.createDataFrame(
        [(1, "https://deny.com/page"), (1, "https://ok.com/page")],
        "src_id long, url string")
    out = sorted((r["url"], r["allowed"])
                 for r in W.robots_filter(df, rules, url_col="url",
                                          id_col="src_id").collect())
    assert out == [("https://deny.com/page", False),
                   ("https://ok.com/page", True)]


def test_robots_rules_truncation_marker_and_fail_closed(spark):
    """A robots.txt beyond MAX_RULES emits a RulesTruncated err row
    (the drop is visible, not silent); robots_filter default stays
    fail-open on err hosts, fail_closed=True denies them."""
    from remote_storage_adapter_spark.sources import robots as RB

    big = "User-agent: *\n" + "".join(
        f"Disallow: /r{i}\n" for i in range(RB.MAX_RULES + 5))
    hosts = spark.createDataFrame(
        [("big.com", big),
         ("broken.com", None),          # no robots.txt: no rows
         ("ok.com", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string")
    rules = RB.robots_rules(hosts).cache()
    try:
        marks = rules.filter(F.col("err").isNotNull()).collect()
        assert [m["host"] for m in marks] == ["big.com"]
        assert "RulesTruncated" in marks[0]["err"]
        assert "dropped 5" in marks[0]["err"]
        assert rules.filter(
            (F.col("host") == "big.com") & F.col("err").isNull()
        ).count() == RB.MAX_RULES

        df = spark.createDataFrame(
            [(0, "https://big.com/r0"), (1, "https://big.com/zzz"),
             (2, "https://ok.com/x"), (3, "https://ok.com/y")],
            "doc_id long, url string")
        by_id = lambda rows: {r["doc_id"]: r["allowed"] for r in rows}
        dflt = by_id(W.robots_filter(
            df, rules, url_col="url", id_col="doc_id").collect())
        # fail-open default: kept rules still apply on the err host
        assert dflt == {0: False, 1: True, 2: False, 3: True}
        closed = by_id(W.robots_filter(
            df, rules, url_col="url", id_col="doc_id",
            fail_closed=True).collect())
        # fail-closed: EVERY url on the truncated host is denied;
        # clean hosts unchanged
        assert closed == {0: False, 1: False, 2: False, 3: True}
    finally:
        rules.unpersist()


def test_html_to_text_java_vs_re2_whitespace_class(spark):
    """The collapse class must be \\x0B, not \\v: Java's \\v is the
    vertical-whitespace CLASS (U+0085/U+2028/U+2029 included) while
    the RE2 oracle's \\v is only \\x0B — real doc text containing
    NEL/LS/PS would hash-mismatch. Locked: those codepoints must
    SURVIVE the JVM-side collapse (both engines agree they are not
    ASCII whitespace), while \\x0B itself collapses."""
    src = "a" + chr(0x85) + "b" + chr(0x2028) + "c \x0b d"
    df = spark.createDataFrame([(src,)], "html string")
    out = df.select(W.html_to_text(F.col("html")).alias("t")) \
        .collect()[0]["t"]
    assert out == "a" + chr(0x85) + "b" + chr(0x2028) + "c d"


def test_domain_rollup_exact_and_approx(spark):
    """domain_rollup: exact mode gives the true per-domain census;
    approx mode (HLL, the 100 TB posture) lands within tolerance of
    exact on every row — and the approx PLAN carries no Expand node
    (the exact-distinct rewrite that dominates at scale)."""
    rows = [(i, f"https://h{i % 7}.site{i % 3}.com/p/{i % 5}"
             f"?utm_source=x&q={i % 2}") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    exact = {r["domain"]: r for r in W.domain_rollup(
        df, url_col="url").collect()}
    assert set(exact) == {"site0.com", "site1.com", "site2.com"}
    assert exact["site0.com"]["n_rows"] == 200
    assert exact["site0.com"]["n_hosts"] == 7
    # 7 hosts x 5 paths x 2 kept-query values per domain
    assert exact["site0.com"]["n_urls"] == 70
    approx = {r["domain"]: r for r in W.domain_rollup(
        df, url_col="url", approx=True, rsd=0.02).collect()}
    assert set(approx) == set(exact)
    for dom, e in exact.items():
        a = approx[dom]
        assert a["n_rows"] == e["n_rows"]  # plain count stays exact
        for c in ("n_urls", "n_hosts"):
            assert abs(a[c] - e[c]) <= max(1, 0.1 * e[c]), (dom, c)
    plans = {m: W.domain_rollup(df, url_col="url", approx=(m == "a"))
             ._jdf.queryExecution().executedPlan().toString()
             for m in ("a", "e")}
    assert "Expand" in plans["e"] and "Expand" not in plans["a"]
