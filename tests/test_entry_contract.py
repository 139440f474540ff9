"""The harness contract itself (`__spark_entry__.py`): key alignment
between queries() and oracle_sql(), and the entry() smoke the driver
runs first."""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    # Every key is a clean snake_case identifier (the driver uses them
    # as JSON keys and file fragments).
    for name in qs:
        assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0
    # Stable schema: same columns on a second invocation.
    assert entry_mod.entry(spark).columns == df.columns


def test_queries_callable_signature(spark, sf_dir):
    fn = entry_mod.queries()["q1_pricing_summary"]
    assert fn(spark, sf_dir).count() > 0
