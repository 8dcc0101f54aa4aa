"""Cross-engine fuzzing: random matcher+range queries, Spark vs DuckDB.

Property: for ANY PromQuery in the supported matcher language (over the
events-derived metrics view), the full read path (matcher compile →
time filter → dynamic-step bucket → exact-quantile agg) agrees with an
independently compiled DuckDB query. This is the coverage SURVEY §5
says the reference never had on its read path — generated, not
hand-picked.

Regexes are drawn from the RE2∩Java-safe subset (SURVEY §4.5.5).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from remote_storage_adapter_spark.plans.matchers import LabelMatcher, PromQuery
from remote_storage_adapter_spark.plans.read import compute_step_s, read_query
from remote_storage_adapter_spark.sources.events import load_metrics

SF_DIR = "/root/testdata/sf0.001"
JAN1 = 1704067200000
JAN31 = 1706659200000

NAMES = ["click", "view", "purchase", "error", "signup", "nosuch"]
USERS = ["3", "7", "11", "3|7", "7|11|13", "999", ""]
REGEXES = ["^pu", "clic", "^(click|view)$", "e", "^si.*up$", "^x"]
USER_RE = ["^1", "^3$", "1[0-9]", "^([0-9])$", "^4"]

matcher_st = st.one_of(
    st.tuples(st.sampled_from(["EQ", "NEQ"]), st.just("__name__"),
              st.sampled_from(NAMES)),
    st.tuples(st.sampled_from(["RE", "NRE"]), st.just("__name__"),
              st.sampled_from(REGEXES)),
    st.tuples(st.sampled_from(["EQ", "NEQ"]), st.just("user_id"),
              st.sampled_from(USERS)),
    st.tuples(st.sampled_from(["RE", "NRE"]), st.just("user_id"),
              st.sampled_from(USER_RE)),
)


def sql_for(m: LabelMatcher, parity_mode: bool = False) -> str:
    """Independently compile one matcher to DuckDB SQL over the m view
    (name, user_id columns) — mirrors the documented semantics, not the
    Spark code. ``parity_mode`` reproduces the reference's §4.5.3
    bug-compatibility: a label RE/NRE whose value lacks a ``^`` anchor
    degrades to a label-presence test."""
    col = "name" if m.name == "__name__" else "user_id"
    v = m.value.replace("'", "''")
    if m.name == "__name__":
        if m.type == "EQ":
            return f"name = '{v}'"
        if m.type == "NEQ":
            return f"name != '{v}'"
        neg = "NOT " if m.type == "NRE" else ""
        return f"{neg}regexp_matches(name, '{v}')"
    # label matcher: EQ splits on '|'; absent label can't happen here
    if m.type in ("EQ", "NEQ"):
        alts = ",".join(f"'{a}'" for a in v.split("|"))
        base = f"{col} IN ({alts})"
        return base if m.type == "EQ" else f"NOT ({base})"
    if parity_mode and not m.value.startswith("^"):
        base = f"{col} IS NOT NULL"
        return base if m.type == "RE" else f"NOT ({base})"
    anchored = m.value if m.value.startswith("^") else "^(?:%s)" % m.value
    anchored = anchored.replace("'", "''")
    base = f"regexp_matches({col}, '{anchored}')"
    return base if m.type == "RE" else f"NOT ({base})"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"""
        CREATE VIEW m AS SELECT event_type AS name,
               CAST(user_id AS VARCHAR) AS user_id,
               '__name__=' || event_type || ',user_id=' || user_id AS series,
               value AS val, ts,
               CAST(floor(epoch(ts)) AS BIGINT) AS es
        FROM read_parquet('{SF_DIR}/events.parquet')
    """)
    return con


@pytest.fixture(scope="module")
def metrics(spark):
    return load_metrics(spark, SF_DIR).persist()


@given(
    ms=st.lists(matcher_st, min_size=0, max_size=3),
    t0=st.integers(0, 29), t1=st.integers(0, 29),
)
@settings(max_examples=25, deadline=None)
def test_random_query_matches_duckdb(metrics, duck, ms, t0, t1):
    lo, hi = sorted((t0, t1))
    start = JAN1 + lo * 86400000
    end = JAN1 + (hi + 1) * 86400000
    q = PromQuery(start, end,
                  tuple(LabelMatcher(t, n, v) for t, n, v in ms))
    step = compute_step_s(start, end)
    where = " AND ".join(
        ["1=1"] + [sql_for(m) for m in q.matchers]
    )
    oracle = duck.execute(f"""
        SELECT count(*) AS cnt, (es // {step}) * {step} * 1000 AS t,
               name, series, round(quantile_cont(val, 0.75), 6) AS value
        FROM m
        WHERE ts >= make_timestamp({start * 1000})
          AND ts <= make_timestamp({end * 1000}) AND {where}
        GROUP BY 2, 3, 4 ORDER BY 2, 3, 4
    """).fetchall()
    got = sorted(
        (r["cnt"], r["t"], r["name"], ",".join(r["tags"]),
         round(r["value"], 6))
        for r in read_query(metrics, q, exact_quantile=True).collect()
    )
    assert got == sorted(tuple(r) for r in oracle)


@given(
    ms=st.lists(matcher_st, min_size=0, max_size=3),
    t0=st.integers(0, 29), t1=st.integers(0, 29),
    parity=st.booleans(),
    step_s=st.sampled_from([None, 7, 60, 3600]),
)
@settings(max_examples=25, deadline=None)
def test_random_query_matches_duckdb_all_modes(metrics, duck, ms, t0, t1,
                                               parity, step_s):
    """VERDICT r2 #5: the same property over BOTH semantics modes and
    explicit step overrides. parity_mode=True reproduces the
    reference's bugs (§4.5.1 step stuck at the 10 s floor, §4.5.3
    unanchored label-RE degrading to presence) against a DuckDB twin
    that independently reproduces them too; explicit ``step_s``
    bypasses the dynamic-step formula in both engines."""
    lo, hi = sorted((t0, t1))
    start = JAN1 + lo * 86400000
    end = JAN1 + (hi + 1) * 86400000
    q = PromQuery(start, end,
                  tuple(LabelMatcher(t, n, v) for t, n, v in ms),
                  step_s=step_s)
    step = step_s or compute_step_s(start, end, parity_mode=parity)
    if parity and step_s is None:
        assert step == 10  # §4.5.1: inverted subtraction floors the step
    where = " AND ".join(
        ["1=1"] + [sql_for(m, parity_mode=parity) for m in q.matchers]
    )
    oracle = duck.execute(f"""
        SELECT count(*) AS cnt, (es // {step}) * {step} * 1000 AS t,
               name, series, round(quantile_cont(val, 0.75), 6) AS value
        FROM m
        WHERE ts >= make_timestamp({start * 1000})
          AND ts <= make_timestamp({end * 1000}) AND {where}
        GROUP BY 2, 3, 4 ORDER BY 2, 3, 4
    """).fetchall()
    got = sorted(
        (r["cnt"], r["t"], r["name"], ",".join(r["tags"]),
         round(r["value"], 6))
        for r in read_query(metrics, q, exact_quantile=True,
                            parity_mode=parity).collect()
    )
    assert got == sorted(tuple(r) for r in oracle)
