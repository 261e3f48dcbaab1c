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


def _assert_scalar_schema(name, df):
    """Driver output contract: no top-level array/map/struct columns.

    The driver's canonicalizer sorts results as a pandas frame and
    dies on unhashable numpy arrays (round-2 failures
    embedding_whitening / embedding_random_projection). Emit long
    format (one row per element) instead; this guard keeps the
    contract from regressing.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: top-level complex-typed output columns {complex_cols} "
        "violate the driver output contract -- posexplode to long format"
    )


@pytest.mark.parametrize("name", _params())
def test_parity(name, spark, ddb):
    sdf = all_queries()[name](spark, SF)
    _assert_scalar_schema(name, sdf)
    spark_df = sdf.toPandas()
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
        df = qs[name](spark, SF)
        _assert_scalar_schema(name, df)
        n = df.count()
        assert n >= 0, name
