"""Run telemetry (SURVEY.md §2.8 ST8 / §2.1 S8): the reference's
"completion status to CloudWatch" signal (Untitled
Diagram.drawio:147-148) as a StreamingQueryListener that records one
row per micro-batch progress event into a queryable parquet table.

The listener only BUFFERS on the callback thread (Spark invokes
listeners on its event bus; running jobs from inside a callback risks
deadlock) -- `flush` writes the buffered rows after the query drains.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_TABLE = "_stream_progress"

_SCHEMA = (
    "query_id string, run_id string, batch_id long, name string, "
    "num_input_rows long, input_rows_per_second double, "
    "process_rows_per_second double, batch_duration_ms long, "
    "event string, timestamp string"
)


class RunTelemetryListener(StreamingQueryListener):
    """Buffers start/progress/termination events for one session."""

    def __init__(self) -> None:
        self.rows: list[tuple] = []

    def onQueryStarted(self, event) -> None:
        self.rows.append((
            str(event.id), str(event.runId), -1, event.name,
            0, 0.0, 0.0, 0, "started", event.timestamp,
        ))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.rows.append((
            str(p.id), str(p.runId), p.batchId, p.name,
            int(p.numInputRows),
            float(p.inputRowsPerSecond or 0.0),
            float(p.processedRowsPerSecond or 0.0),
            int(p.durationMs.get("triggerExecution", 0)),
            "progress", p.timestamp,
        ))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        self.rows.append((
            str(event.id), str(event.runId), -1, None,
            0, 0.0, 0.0, 0,
            "failed" if event.exception else "terminated", "",
        ))

    def flush(self, spark: SparkSession, warehouse_dir: str) -> str:
        """Append buffered events to the progress table; returns path."""
        path = os.path.join(warehouse_dir, PROGRESS_TABLE)
        if self.rows:
            df = spark.createDataFrame(self.rows, _SCHEMA)
            df.coalesce(1).write.mode("append").parquet(path)
            self.rows = []
        return path


def read_progress(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(warehouse_dir, PROGRESS_TABLE))
