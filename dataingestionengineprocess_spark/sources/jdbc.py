"""JDBC source (SURVEY.md §2.1 S5, §2.3 J6): partitioned reads from an
operational database — the reference's PostgreSQL round-trip
(Untitled Diagram.drawio:88-98) as a Spark source.

The sandbox has no database server, so nothing here is exercised
against a live endpoint; the value is the scale-correct option
construction, which unit tests assert directly:

- Small dimension tables read unpartitioned (one connection) and are
  broadcast into fact joins (see pipeline.Enrichment).
- Large tables MUST read partitioned (`partitionColumn` + bounds +
  `numPartitions`), else the whole table funnels through a single
  connection on one executor — the classic JDBC-at-scale failure.
- `fetchsize` defaults well above the JDBC driver's typical 10-50 row
  default, which would round-trip per-50-rows at 100 TB.
- Pushdown: Spark pushes filters/column pruning into the generated
  SQL for `dbtable`; arbitrary server-side SQL goes through `query`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcConfig:
    url: str                      # jdbc:postgresql://host:5432/db
    table: str                    # table name or "(subquery) alias"
    properties: dict[str, str] = field(default_factory=dict)
    partition_column: str | None = None   # numeric/date/timestamp column
    lower_bound: str | None = None
    upper_bound: str | None = None
    num_partitions: int | None = None
    fetchsize: int = 10_000


def jdbc_read_options(cfg: JdbcConfig) -> dict[str, str]:
    """Resolve the option map a partition-correct JDBC read needs.

    Raises if partitioning is half-specified — a silently
    unpartitioned read of a big table is the failure mode this
    source exists to prevent.
    """
    opts: dict[str, str] = {
        "url": cfg.url,
        "dbtable": cfg.table,
        "fetchsize": str(cfg.fetchsize),
        **cfg.properties,
    }
    part_fields = (cfg.partition_column, cfg.lower_bound,
                   cfg.upper_bound, cfg.num_partitions)
    if any(f is not None for f in part_fields):
        if any(f is None for f in part_fields):
            raise ValueError(
                "partitioned JDBC read needs ALL of partition_column, "
                "lower_bound, upper_bound, num_partitions"
            )
        opts.update(
            partitionColumn=str(cfg.partition_column),
            lowerBound=str(cfg.lower_bound),
            upperBound=str(cfg.upper_bound),
            numPartitions=str(cfg.num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, cfg: JdbcConfig) -> DataFrame:
    """Build the JDBC read. With partition bounds set, Spark issues
    `numPartitions` range-predicate queries in parallel, one per task."""
    return spark.read.format("jdbc").options(**jdbc_read_options(cfg)).load()
