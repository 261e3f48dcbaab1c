"""ST8: StreamingQueryListener telemetry — per-micro-batch progress
rows land in a queryable table after a drain."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionengineprocess_spark.streaming.analytics import (
    read_events_stream,
    tumbling_counts,
)
from dataingestionengineprocess_spark.streaming.telemetry import (
    RunTelemetryListener,
    read_progress,
)


def test_progress_rows_recorded(spark, sf_dir, tmp_path):
    listener = RunTelemetryListener()
    spark.streams.addListener(listener)
    try:
        ev = read_events_stream(spark, sf_dir)
        q = (
            tumbling_counts(ev).writeStream.outputMode("complete")
            .format("memory").queryName("telemetry_probe")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        qid = str(q.id)
        # listener callbacks arrive on the async event bus -- wait for
        # the progress event to land before flushing
        import time

        deadline = time.time() + 30
        while time.time() < deadline and not any(
            r[8] == "progress" and r[0] == qid for r in listener.rows
        ):
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    listener.flush(spark, str(tmp_path))
    prog = read_progress(spark, str(tmp_path)).filter(
        F.col("query_id") == qid
    )
    events = prog.select("event").toPandas()["event"].tolist()
    assert "started" in events
    assert "progress" in events
    # the drained batches together saw the whole fixture
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    seen = (
        prog.filter(F.col("event") == "progress")
        .agg(F.sum("num_input_rows")).collect()[0][0]
    )
    assert seen == n_events, (seen, n_events)
