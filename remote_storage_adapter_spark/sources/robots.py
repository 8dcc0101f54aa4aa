"""robots.txt parsing (RFC 9309, the Robots Exclusion Protocol) —
the crawl-compliance half of the web front-end: a curation pass over
crawled data re-checks URLs against each host's robots policy before
training on them.

:func:`robots_rules` parses a (host, robots_txt) table into flat
allow/disallow rule rows for one user-agent via Arrow-batched
``mapInPandas`` (partition-preserving; per-host ``err`` quarantine).
Group selection follows RFC 9309 §2.2.1: the group whose user-agent
line is the LONGEST match for the product token wins; ``*`` groups
apply only when no specific group matches. Path patterns support the
de-facto ``*`` (any run) and trailing ``$`` (end anchor) wildcards;
each rule is emitted both as the raw pattern and as an anchored
RE2-compatible regex so the match side stays JVM/SQL-expressible.

The match side lives in :func:`..operators.web.robots_filter`:
longest-pattern-wins precedence (allow on ties, the public
convention), unlisted hosts and rule-less groups default to allowed.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("rule_idx", T.IntegerType(), True),
        T.StructField("allow", T.BooleanType(), True),
        T.StructField("pattern", T.StringType(), True),
        T.StructField("pattern_re", T.StringType(), True),
        T.StructField("err", T.StringType(), True),
    ]
)

#: bounds a hostile robots.txt: rules beyond this per host are
#: dropped, and the host gets a ``RulesTruncated`` err marker row so
#: the drop is visible (a later Allow/Disallow override may have been
#: lost — ``robots_filter(fail_closed=True)`` denies such hosts).
MAX_RULES = 1000


def _pattern_regex(pat: str) -> str:
    """Anchored RE2-compatible regex for a robots path pattern:
    ``*`` → ``.*``, trailing ``$`` → end anchor, everything else
    literal. The SAME translation must never be inlined elsewhere —
    the match side and any SQL oracle consume this column."""
    anchor_end = pat.endswith("$")
    body = pat[:-1] if anchor_end else pat
    out = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    return out + "$" if anchor_end else out


def _parse_robots(text: str, agent: str):
    """(allow, pattern) rules of the group governing ``agent``.
    RFC 9309: groups are runs of user-agent lines followed by rules;
    the longest user-agent token that prefixes ``agent`` wins, ``*``
    only as fallback; multiple groups with the same token merge."""
    agent = agent.lower()
    groups: dict = {}
    cur_agents: list = []
    collecting = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not val:
                # RFC 9309: invalid lines are ignored — an empty
                # token would otherwise prefix-match EVERY agent and
                # permanently shadow the '*' fallback group
                continue
            if collecting:      # a rule ended the previous group
                cur_agents = []
                collecting = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            collecting = True
            for a in cur_agents or ["*"]:
                if val:         # empty Disallow: = allow everything,
                    # i.e. no rule (RFC 9309 §2.2.2)
                    groups.setdefault(a, []).append(
                        (key == "allow", val))
                else:
                    groups.setdefault(a, [])
        # sitemap/crawl-delay etc.: not part of the access policy
    best = None
    for a in groups:
        if a != "*" and agent.startswith(a) \
                and (best is None or len(a) > len(best)):
            best = a
    rules = groups.get(best if best is not None else "*", [])
    return rules[:MAX_RULES], max(0, len(rules) - MAX_RULES)


def robots_rules(df: DataFrame, *, agent: str = "*",
                 host_col: str = "host",
                 payload_col: str = "robots_txt") -> DataFrame:
    """Flatten a per-host robots.txt table into rule rows for
    ``agent``: (host, rule_idx, allow, pattern, pattern_re, err). A
    host whose robots.txt parses to NO rules (or a missing/empty
    file) emits zero rows — :func:`..operators.web.robots_filter`
    treats ruleless hosts as fully allowed. Unreadable payloads
    quarantine per host."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["host", "rule_idx", "allow", "pattern", "pattern_re",
                "err"]
        for pdf in batches:
            rows = []
            # NB: the select below aliased the host column to 'host'
            for host, txt in zip(pdf["host"], pdf[payload_col]):
                try:
                    if txt is None:
                        continue        # no robots.txt = no rules
                    rules, dropped = _parse_robots(str(txt), agent)
                    for i, (allow, pat) in enumerate(rules):
                        rows.append((host, i, allow, pat,
                                     _pattern_regex(pat), None))
                    if dropped:
                        # a trimmed policy may have lost an override
                        # that would flip verdicts — record it as an
                        # err marker row (kept rules still apply;
                        # fail_closed consumers deny the host)
                        rows.append((host, None, None, None, None,
                                     f"RulesTruncated: kept "
                                     f"{MAX_RULES}, dropped {dropped}"))
                except Exception as e:  # noqa: BLE001 — quarantine
                    rows.append((host, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(
        F.col(host_col).alias("host"), F.col(payload_col)
    ).mapInPandas(run, schema=ROBOTS_SCHEMA)
