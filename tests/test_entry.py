"""Driver-contract smoke tests: entry(), registry shape, and a fast
oracle-parity spot check (full gate: tools/parity.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from tools.parity import compare, duck_con  # noqa: E402


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["cnt", "t", "name", "series", "value"]


def test_registry_shapes():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 25
    # every oracle has a query; since round 2 EVERY registry query
    # carries a DuckDB oracle (portable-hash modes closed the gap)
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == set()


def test_parity_spot_check(spark, sf_dir):
    con = duck_con(sf_dir)
    for name in ("read_downsample_q75", "tpch_q1", "text_fingerprint"):
        assert compare(name, spark, con, sf_dir, verbose=False), name
