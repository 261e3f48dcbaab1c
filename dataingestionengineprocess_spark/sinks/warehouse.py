"""Dual-sink writers + run-status telemetry.

Reference flows (Untitled Diagram.drawio): EC2 -> Redshift bulk load
(:79-87), EC2 <-> PostgreSQL operational rows (:88-98), and the
completion-status metric to CloudWatch (:147-148). Spark-native:

- Warehouse sink = partitioned parquet directory (the COPY-compatible
  columnar layout; a real Redshift/warehouse load points at the same
  files). Partitioned by ingest date so downstream partition pruning
  works -- the single most important 100 TB layout decision.
- OLTP sink = JDBC when a URL is configured, else a parquet "table"
  directory stand-in (this sandbox has no database server; the write
  path is identical up to the final format call).
- Status sink = an append-only ``_runs`` parquet table -- the
  CloudWatch completion signal as a queryable table (S8), one row per
  ingest run with rows read/loaded/rejected and wall-clock.

Idempotency: warehouse writes go to a per-run partition via dynamic
partition overwrite, so re-processing a re-dropped file replaces that
run's partition instead of duplicating it.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SinkConfig:
    warehouse_dir: str
    oltp_dir: str | None = None
    jdbc_url: str | None = None
    jdbc_options: dict[str, str] = field(default_factory=dict)


def write_warehouse(df: DataFrame, warehouse_dir: str, table: str,
                    partition_cols: list[str] | None = None,
                    mode: str = "append") -> str:
    """Bulk-load curated rows into the warehouse layout (S6)."""
    path = os.path.join(warehouse_dir, table)
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
        if mode == "overwrite":
            # replace only the partitions present in df, not the table
            writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)
    return path


def write_oltp(df: DataFrame, cfg: SinkConfig, table: str,
               mode: str = "append") -> str:
    """Operational-row sink (S7): JDBC if configured, parquet stand-in
    otherwise. Upserts against a real DB go through a staging table +
    MERGE executed by the DB -- Spark ships the staged rows."""
    if cfg.jdbc_url:
        (df.write.format("jdbc")
         .option("url", cfg.jdbc_url)
         .option("dbtable", table)
         .options(**cfg.jdbc_options)
         .mode(mode)
         .save())
        return f"{cfg.jdbc_url}/{table}"
    if not cfg.oltp_dir:
        raise ValueError("SinkConfig needs jdbc_url or oltp_dir")
    path = os.path.join(cfg.oltp_dir, table)
    df.write.mode(mode).parquet(path)
    return path


@dataclass
class RunStatus:
    """One completion-status record (the CloudWatch signal, S8)."""
    run_id: str
    feed: str
    rows_read: int
    rows_loaded: int
    rows_rejected: int
    rows_quarantined: int
    started_at: float
    finished_at: float
    status: str = "SUCCEEDED"


def new_run_id() -> str:
    return uuid.uuid4().hex[:16]


def write_status(spark: SparkSession, warehouse_dir: str,
                 status: RunStatus) -> None:
    df = spark.createDataFrame(
        [(
            status.run_id, status.feed, status.rows_read, status.rows_loaded,
            status.rows_rejected, status.rows_quarantined,
            float(status.started_at), float(status.finished_at),
            round(status.finished_at - status.started_at, 3), status.status,
        )],
        "run_id string, feed string, rows_read long, rows_loaded long, "
        "rows_rejected long, rows_quarantined long, started_at double, "
        "finished_at double, duration_s double, status string",
    )
    df.coalesce(1).write.mode("append").parquet(
        os.path.join(warehouse_dir, "_runs")
    )


def read_status(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(warehouse_dir, "_runs"))
