"""Regression: the driver regenerates fixtures between rounds and has
shipped events.ts as BOTH parquet TIMESTAMP(NANOS) and plain
timestamp[us]. catalog.load and read_events_stream must normalize
either encoding to the same session-TZ TIMESTAMP column."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataingestionengineprocess_spark.catalog import load
from dataingestionengineprocess_spark.streaming.analytics import (
    read_events_stream, run_to_table,
)

_EPOCH_US = [1_700_000_000_000_000, 1_700_000_123_456_789]


def _write_events(dir_path: str, unit: str) -> str:
    os.makedirs(dir_path, exist_ok=True)
    ts = pa.array(
        [v * 1000 for v in _EPOCH_US] if unit == "ns" else _EPOCH_US,
        type=pa.timestamp(unit),
    )
    table = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": ts,
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["a", "b"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["{}", "{}"]),
    })
    pq.write_table(table, os.path.join(dir_path, "events.parquet"))
    return dir_path


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_normalizes_ts(spark, tmp_path, unit):
    sf_dir = _write_events(str(tmp_path / unit), unit)
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    # UTC session: wall-clock values equal the epoch-micros input
    assert [int(t.timestamp() * 1_000_000) for t in got] == _EPOCH_US


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_stream_reader_normalizes_ts(spark, tmp_path, unit):
    sf_dir = _write_events(str(tmp_path / ("s" + unit)), unit)
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, sf_dir)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # run_to_table drains in complete mode, which needs an aggregation
    out = run_to_table(
        ev.groupBy("event_id").agg(F.max("ts").alias("ts")), spark
    )
    got = sorted(r.ts for r in out.collect())
    assert [int(t.timestamp() * 1_000_000) for t in got] == _EPOCH_US
