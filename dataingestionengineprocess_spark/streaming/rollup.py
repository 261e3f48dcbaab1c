"""Continuous rollup: a warehouse table of time-bucketed aggregates
maintained INCREMENTALLY by a stream (the hypertable / continuous-
aggregate pattern -- TimescaleDB's continuous aggregates, Druid's
rollup ingestion -- expressed with Structured Streaming primitives).

The batch alternative recomputes the whole rollup per run; here each
micro-batch emits only the windows it CHANGED (update output mode
over a watermarked tumbling aggregate) and a keyed MERGE folds them
into the standing table. At 100 TB of events the per-batch work is
proportional to the batch, not the history.

Exactness: window sums use the exact-cents representation
(sum of round(value*100) longs), so the incrementally-maintained
table converges bit-for-bit to the batch aggregate regardless of
micro-batch boundaries or merge order -- the convergence test
(tests/test_continuous_rollup.py) asserts exact equality.

Reference scope: the diagram's Redshift loader (Untitled
Diagram.drawio:79-87) generalized from append-only loads to
incrementally-maintained aggregate tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.warehouse import merge_upsert, write_warehouse
from .analytics import read_events_stream

ROLLUP_KEYS = ["win_start", "event_type"]


def rollup_aggregate(events: DataFrame, window: str = "1 hour",
                     watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling aggregate in the rollup's schema:
    (win_start, event_type, n, total_cents)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("total_cents"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type", "n", "total_cents",
        )
    )


def continuous_rollup(spark: SparkSession, sf_dir: str, warehouse_dir: str,
                      checkpoint_dir: str, table: str = "events_hourly",
                      window: str = "1 hour",
                      watermark: str = "30 minutes"):
    """Maintain ``table`` as the hourly rollup of the events stream.

    Update-mode emits each window's CURRENT aggregate whenever a batch
    touches it; the foreachBatch MERGE keys on (win_start, event_type)
    with the epoch as the recency column, so later refinements of the
    same window replace earlier ones and replayed epochs are no-ops
    (merge_upsert is idempotent per batch). Returns the started query;
    drain with ``availableNow`` semantics via ``awaitTermination``.
    """
    agg = rollup_aggregate(
        read_events_stream(spark, sf_dir), window, watermark
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        updates = batch_df.withColumn("__epoch", F.lit(int(epoch_id)))
        try:
            spark.read.parquet(f"{warehouse_dir}/{table}").limit(0).collect()
            exists = True
        except Exception:
            exists = False
        if not exists:
            write_warehouse(updates, warehouse_dir, table)
        else:
            merge_upsert(spark, warehouse_dir, table, updates,
                         keys=ROLLUP_KEYS, order_col="__epoch")

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, warehouse_dir: str,
                table: str = "events_hourly") -> DataFrame:
    """The maintained rollup in presentation form (cents -> value)."""
    return (
        spark.read.parquet(f"{warehouse_dir}/{table}")
        .select(
            "win_start", "event_type", "n",
            F.round(F.col("total_cents") / 100.0, 2).alias("total_value"),
        )
    )
