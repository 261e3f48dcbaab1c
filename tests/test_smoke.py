"""Driver-contract smoke: entry() returns rows with a stable schema."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"sum_qty", "avg_price", "count_order"} <= set(df.columns)


def test_registries_consistent():
    qs, os_ = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    missing = set(os_) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
