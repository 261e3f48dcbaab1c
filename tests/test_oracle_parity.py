"""Local replica of the driver's correctness gate.

For every oracle-backed query: run the Spark DataFrame version and the
DuckDB oracle SQL on the same sf0.001 parquet fixtures, then compare
row count, column names, and order-insensitive values (strict string
normalization -- if this passes, the driver's value hash should too).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dataingestionengineprocess_spark.catalog import TABLES, table_path
from dataingestionengineprocess_spark.oracle_compare import normalize_frame
from dataingestionengineprocess_spark.queries import all_oracles, all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF, t)}')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    return normalize_frame(df)


def _params():
    qs, os_ = all_queries(), all_oracles()
    return sorted(os_.keys() & qs.keys())


@pytest.mark.parametrize("name", _params())
def test_parity(name, spark, ddb):
    spark_df = all_queries()[name](spark, SF).toPandas()
    oracle_df = ddb.execute(all_oracles()[name]).df()

    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    s_rows, o_rows = normalize(spark_df), normalize(oracle_df)
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_rows)} rows differ; "
        f"first: spark={mismatches[0][0]} oracle={mismatches[0][1]}"
    )


def test_every_query_has_rows(spark):
    """Rows-only sanity for queries without oracles (driver's weak check)."""
    qs, os_ = all_queries(), all_oracles()
    for name in sorted(qs.keys() - os_.keys()):
        n = qs[name](spark, SF).count()
        assert n >= 0, name
