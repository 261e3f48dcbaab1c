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


def test_observe_metrics_ride_along_with_action(spark, sf_dir):
    from pyspark.sql import Observation

    from dataingestionengineprocess_spark.catalog import load

    # Observation is the batch-side reader for observe() metrics.
    obs = Observation("ingest")
    df = load(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_keys"
        ),
    )
    n = df.filter(F.col("o_totalprice") > 0).count()  # one action
    got = obs.get
    assert got["rows_seen"] >= n and got["rows_seen"] > 0
    assert got["null_keys"] == 0


def test_with_ingest_metrics_wrapper_runs(spark, sf_dir):
    from dataingestionengineprocess_spark.catalog import load
    from dataingestionengineprocess_spark.streaming.telemetry import (
        with_ingest_metrics,
    )

    df = with_ingest_metrics(load(spark, sf_dir, "nation"))
    assert df.count() > 0  # plan executes with metrics attached


def test_second_exporter_receives_same_batch(spark, sf_dir, tmp_path):
    # The CloudWatch seam: a second MetricsExporter registered on the
    # listener must receive exactly the rows the parquet table gets,
    # and the run-status emit point must round-trip through the same
    # interface.
    import time

    from dataingestionengineprocess_spark.sinks.warehouse import (
        RunStatus,
        read_status,
    )
    from dataingestionengineprocess_spark.streaming.telemetry import (
        InMemoryMetricsExporter,
        ParquetMetricsExporter,
    )

    mem = InMemoryMetricsExporter()
    listener = RunTelemetryListener(exporters=[mem])
    spark.streams.addListener(listener)
    try:
        ev = read_events_stream(spark, sf_dir)
        q = (
            tumbling_counts(ev).writeStream.outputMode("complete")
            .format("memory").queryName("exporter_probe")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        qid = str(q.id)
        deadline = time.time() + 30
        while time.time() < deadline and not any(
            r[8] == "progress" and r[0] == qid for r in listener.rows
        ):
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    listener.flush(spark, str(tmp_path))
    table_rows = (read_progress(spark, str(tmp_path))
                  .filter(F.col("query_id") == qid).count())
    mem_rows = sum(1 for r in mem.progress if r[0] == qid)
    assert mem_rows == table_rows and mem_rows > 0
    # a second flush with an empty buffer exports nothing again
    before = len(mem.progress)
    listener.flush(spark, str(tmp_path))
    assert len(mem.progress) == before

    # run-status emit point: both backends accept the same RunStatus
    st = RunStatus(run_id="r-exp-1", feed="f", rows_read=3,
                   rows_loaded=3, rows_rejected=0, rows_quarantined=0,
                   started_at=1.0, finished_at=2.0)
    ParquetMetricsExporter(str(tmp_path)).export_run(spark, st)
    mem.export_run(spark, st)
    assert mem.runs == [st]
    got = read_status(spark, str(tmp_path)).filter(
        F.col("run_id") == "r-exp-1").collect()
    assert len(got) == 1 and got[0]["rows_loaded"] == 3


def test_run_status_reaches_sink_exporters_end_to_end(spark, tmp_path):
    # The S8 emit point: an exporter registered on SinkConfig must
    # receive every RunStatus the pipeline publishes -- no pipeline
    # change, exactly the module's CloudWatch-seam claim.
    from pyspark.sql import types as T

    from dataingestionengineprocess_spark.pipeline import (
        FeedConfig,
        SinkConfig,
        ingest_batch,
    )
    from dataingestionengineprocess_spark.streaming.telemetry import (
        InMemoryMetricsExporter,
    )

    schema = T.StructType([
        T.StructField("order_id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("updated_at", T.TimestampType()),
    ])
    src = tmp_path / "drop.csv"
    src.write_text("order_id,amount,updated_at\n"
                   "1,10.0,2024-01-01 10:00:00\n"
                   "2,20.0,2024-01-01 11:00:00\n")
    mem = InMemoryMetricsExporter()
    sinks = SinkConfig(warehouse_dir=str(tmp_path / "wh"),
                       oltp_dir=str(tmp_path / "oltp"),
                       exporters=[mem])
    feed = FeedConfig(name="exp_feed", schema=schema,
                      key_cols=["order_id"], order_col="updated_at")
    status = ingest_batch(spark, feed, str(src), sinks)
    assert [s.run_id for s in mem.runs] == [status.run_id]
    assert mem.runs[0].rows_loaded == 2


def test_flush_restores_buffer_when_backend_throws(spark, tmp_path):
    # A flaky backend must not starve the others, and a retry must not
    # duplicate the batch at backends that already landed it: delivery
    # is tracked per backend (ADVICE r5 -- the old whole-batch restore
    # re-appended the same rows to the append-only parquet table).
    from dataingestionengineprocess_spark.streaming.telemetry import (
        InMemoryMetricsExporter,
        MetricsExporter,
        read_progress,
    )

    class Flaky(MetricsExporter):
        def __init__(self):
            self.calls = 0

        def export_progress(self, spark, rows):
            self.calls += 1
            if self.calls == 1:
                raise IOError("transient")

    flaky, mem = Flaky(), InMemoryMetricsExporter()
    listener = RunTelemetryListener(exporters=[flaky, mem])
    row = ("q", "r", 1, "n", 5, 1.0, 1.0, 10, "progress", "t")
    listener.rows.append(row)
    import pytest as _pytest
    with _pytest.raises(IOError):
        listener.flush(spark, str(tmp_path))
    assert listener.rows == []           # buffer swapped, not restored
    assert listener._pending != []       # batch pending for flaky only
    assert mem.progress == [row]         # tail backend NOT starved
    listener.flush(spark, str(tmp_path))
    assert listener._pending == []
    assert flaky.calls == 2              # retried at the flaky backend
    assert mem.progress == [row]         # NOT redelivered where it landed
    # the append-only parquet table holds the batch exactly once
    assert read_progress(spark, str(tmp_path)).count() == 1


def test_flush_retry_interleaves_pending_and_new_rows(spark, tmp_path):
    # New rows buffered between the failing flush and the retry are
    # delivered everywhere; the pending batch only goes to the backend
    # that missed it.
    from dataingestionengineprocess_spark.streaming.telemetry import (
        InMemoryMetricsExporter,
        MetricsExporter,
        read_progress,
    )

    class Flaky(MetricsExporter):
        def __init__(self):
            self.calls = 0
            self.progress = []

        def export_progress(self, spark, rows):
            self.calls += 1
            if self.calls == 1:
                raise IOError("transient")
            self.progress.extend(rows)

    flaky, mem = Flaky(), InMemoryMetricsExporter()
    listener = RunTelemetryListener(exporters=[flaky, mem])
    r1 = ("q", "r", 1, "n", 5, 1.0, 1.0, 10, "progress", "t1")
    r2 = ("q", "r", 2, "n", 7, 1.0, 1.0, 10, "progress", "t2")
    listener.rows.append(r1)
    import pytest as _pytest
    with _pytest.raises(IOError):
        listener.flush(spark, str(tmp_path))
    listener.rows.append(r2)
    listener.flush(spark, str(tmp_path))
    assert sorted(flaky.progress) == [r1, r2]   # missed batch + new one
    assert sorted(mem.progress) == [r1, r2]     # each exactly once
    assert read_progress(spark, str(tmp_path)).count() == 2
