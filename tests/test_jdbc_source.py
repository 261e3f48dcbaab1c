"""S5/J6: partition-correct JDBC option construction (no DB server in
the sandbox — the contract under test is the option map itself)."""

from __future__ import annotations

import pytest

from dataingestionengineprocess_spark.sources.jdbc import (
    JdbcConfig,
    jdbc_read_options,
)

URL = "jdbc:postgresql://db:5432/ops"


def test_partitioned_read_options_complete():
    cfg = JdbcConfig(
        url=URL, table="orders",
        partition_column="o_orderkey", lower_bound="1",
        upper_bound="6000000", num_partitions=64,
    )
    opts = jdbc_read_options(cfg)
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "64"
    assert opts["lowerBound"] == "1" and opts["upperBound"] == "6000000"
    # fetchsize must override the tiny driver default
    assert int(opts["fetchsize"]) >= 1000


def test_half_specified_partitioning_rejected():
    cfg = JdbcConfig(url=URL, table="orders", partition_column="o_orderkey")
    with pytest.raises(ValueError, match="ALL of"):
        jdbc_read_options(cfg)


def test_unpartitioned_dimension_read_ok():
    opts = jdbc_read_options(JdbcConfig(url=URL, table="nation"))
    assert "partitionColumn" not in opts
    assert opts["dbtable"] == "nation"
