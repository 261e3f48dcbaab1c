"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestionengineprocess_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", extra_confs={"spark.ui.enabled": "false"})
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
