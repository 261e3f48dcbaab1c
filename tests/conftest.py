"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestionengineprocess_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

#: Test-session parallelism. The suite runs on sf0.001 fixtures where
#: per-task data is tiny, so wall time is dominated by task-scheduling
#: and state-store constants that GROW with thread/partition count --
#: the same fixed-overhead profile that makes the 8-core bench sweep
#: beat 32-core at sf0.1 (VERDICT r10). 8 threads keeps every code
#: path multi-partition (spread_input, AQE coalescing, state stores
#: all still exercise >1 partition) while roughly halving suite wall
#: time, which is what keeps `pytest tests/` inside the CI budget.
#: Override with SPARK_GRAFT_TEST_CPUS to re-run wide.
TEST_CPUS = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", master=f"local[{TEST_CPUS}]",
                  extra_confs={
                      "spark.ui.enabled": "false",
                      "spark.sql.shuffle.partitions": TEST_CPUS,
                  })
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


def write_event_batch(spark, path: str, rows: list[tuple],
                      mtime: float,
                      schema: str = "event_id long, ts string, value double",
                      ) -> None:
    """Write one micro-batch parquet dir with a pinned mtime (the file
    stream source orders batches by modification time). `ts` arrives as
    a string column in `schema` and is converted to a real timestamp.
    Shared by the streaming tests -- keep the coalesce(1) + utime
    behavior in exactly one place."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))
