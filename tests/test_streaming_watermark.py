"""ST2: watermark semantics — events later than the watermark are
dropped; on-time events still aggregate.

Empirical Spark detail this test pins down: the watermark used to
FILTER late rows in micro-batch N is the one computed from data up to
batch N-2 (the progress log's `eventTime.watermark` for a batch is the
value committed at its start, which itself derives from the batch
before). So a late row is only guaranteed dropped once the
watermark-advancing data is >= 2 micro-batches old — hence the buffer
batch b2 below.

  batch b1: events 10:00 / 10:30   -> wm (eventually) 10:20
  batch b2: buffer event 10:40     -> wm 10:20 now active for filtering
  batch b3: late event 09:00 (dropped: 10:00 window end < 10:20)
            + on-time event 11:30
  batch b4: event 12:30 (closes earlier windows)

Update-mode memory sink records every emission; the [09:00,10:00)
window must never appear.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


from tests.conftest import write_event_batch as _write_batch


def test_late_events_dropped_beyond_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    now = time.time()
    _write_batch(
        spark, f"{src}/b1",
        [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 10:30:00", 1.0)],
        now - 400,
    )
    _write_batch(spark, f"{src}/b2",
                 [(6, "2024-01-01 10:40:00", 1.0)], now - 300)
    _write_batch(
        spark, f"{src}/b3",
        [(3, "2024-01-01 09:00:00", 99.0),   # late beyond watermark
         (4, "2024-01-01 11:30:00", 1.0)],
        now - 200,
    )
    _write_batch(spark, f"{src}/b4",
                 [(5, "2024-01-01 12:30:00", 1.0)], now - 100)

    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{src}/b[1234]")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory").queryName("wm_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.table("wm_test").toPandas()
    starts = out["win_start"].astype(str)
    # the late event's expired window never materializes
    assert not starts.str.startswith("2024-01-01 09:").any(), out
    # on-time windows aggregated normally (2 events + the buffer)
    assert out[starts.str.startswith("2024-01-01 10:")]["n"].max() == 3, out
    assert out[starts.str.startswith("2024-01-01 11:")]["n"].max() == 1, out


from tests.conftest import write_event_batch


def _write_typed_batch(spark, path, rows, mtime):
    write_event_batch(
        spark, path, rows, mtime,
        schema="event_id long, ts string, user_id long, event_type string",
    )


def test_stream_stream_left_outer_flushes_on_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: an unmatched left row is
    emitted with NULLs only once BOTH sides' watermarks pass the point
    where a match is provably impossible -- state stays bounded and the
    null verdict is never premature. Sentinel far-future events advance
    the watermark; a buffer batch absorbs the one-batch watermark lag
    (see module docstring)."""
    import time as _time

    src = str(tmp_path / "src")
    now = _time.time()
    # b1: P1 purchase with no click in its 30-minute lookback
    _write_typed_batch(
        spark, f"{src}/b1",
        [(1, "2024-01-01 10:00:00", 7, "purchase"),
         (2, "2024-01-01 08:30:00", 7, "click")],
        now - 400,
    )
    # b2/b3: far-future rows on BOTH sides push the global watermark
    # past P1 + interval; b3 buffers the watermark lag
    _write_typed_batch(
        spark, f"{src}/b2",
        [(3, "2024-01-02 12:00:00", 8, "purchase"),
         (4, "2024-01-02 12:00:00", 8, "click")],
        now - 300,
    )
    _write_typed_batch(
        spark, f"{src}/b3",
        [(5, "2024-01-02 14:00:00", 9, "purchase"),
         (6, "2024-01-02 14:00:00", 9, "click")],
        now - 200,
    )

    base = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{src}/b[123]")
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "10 minutes")
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("click_user"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts")
           >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select("purchase_id", "click_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory").queryName("ssoj_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["purchase_id"]: r["click_id"]
           for r in spark.table("ssoj_test").collect()}
    # P1 must be flushed as unmatched (null click) -- not dropped, not
    # held forever; the 8:30 click is outside its 30-minute lookback.
    assert got[1] is None
