"""Fixture catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings, one parquet file/dir each under
a scale-factor directory. Reads are plain `spark.read.parquet`, so
Catalyst gets full predicate pushdown + column pruning on every query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune_session

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Dimension tables small enough to broadcast at ANY scale factor --
#: TPC-H dims grow sublinearly (region/nation are constant-size).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def scratch_path(tag: str, *parts: str) -> str:
    """Resolve the stable per-(tag, parts) scratch location WITHOUT
    touching it -- the one path-derivation rule, shared by
    `scratch_dir` (which wipes) and by tests that need to inspect
    what a query left behind (re-deriving the rule in a test would
    break obscurely if the naming scheme ever changed)."""
    import hashlib
    import tempfile

    suffix = hashlib.md5("|".join(parts).encode()).hexdigest()[:8]
    return os.path.join(
        tempfile.gettempdir(), f"engine_scratch_{tag}_{suffix}"
    )


def scratch_dir(tag: str, *parts: str) -> str:
    """Stable per-(tag, parts) scratch path for queries that must
    materialize intermediate tables (versioned-table demos, index
    builds). Unlike ``tempfile.mkdtemp``, repeat invocations REUSE the
    same location and wipe it first, so a driver or bench loop that
    calls a query N times holds one copy on disk, not N leaked ones.
    """
    import shutil

    path = scratch_path(tag, *parts)
    shutil.rmtree(path, ignore_errors=True)
    return path


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    ``events.ts`` arrives however the fixture generator wrote it --
    TIMESTAMP(NANOS) footers surface as raw nanos longs (see
    session.ENGINE_CONFS) and are rebuilt at microsecond precision;
    plain timestamp[us] footers surface as TIMESTAMP_NTZ and are cast
    to the session-timezone TIMESTAMP type (UTC session -> identical
    wall-clock values). Either way every query downstream sees one
    canonical TIMESTAMP column, matching DuckDB's read of the same
    file, so oracle parity holds.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune_session(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for spark.sql queries."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
