"""SparkSession construction tuned for this engine.

Defaults follow the 100 TB design brief: AQE on (runtime shuffle
coalescing, skew-join splitting, dynamic broadcast), Arrow for any
pandas exchange, UTC session timezone so timestamp semantics match the
DuckDB oracle, and shuffle partitions sized to cores in local mode
(on a real cluster you'd size to ~2-3x total executor cores, or leave
AQE's coalescing to shrink the default).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs applied to every session this engine builds. Each one is a
#: conscious scale decision, not a magic number:
#:  - adaptive.*: re-plan at runtime from real shuffle stats -- at 100 TB
#:    static planning always mis-sizes something.
#:  - autoBroadcastJoinThreshold stays default (10 MB); dims like
#:    region/nation/supplier broadcast automatically, and AQE upgrades
#:    sort-merge to broadcast when runtime stats allow.
#:  - arrow enabled: any pandas_udf / applyInPandas path is Arrow-batched.
#:  - session timezone UTC: deterministic timestamp<->string semantics.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # parallelismFirst stays at its default (true): size-only
    # coalescing (false) was measured ~5% faster on the sub-second
    # tail but squeezed BYTE-LIGHT, COMPUTE-HEAVY reduce stages
    # (per-character gram explodes, percentile sketches) into 1-2
    # tasks and regressed them 2x -- shuffle BYTES are the wrong
    # proxy for those stages' work, at any scale
    # (OPTIMIZATION_r11.md §tail).
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let the planner pick shuffled-hash over sort-merge when one side
    # is provably much smaller than the other and fits a per-partition
    # hash map (guide §3.1/§9): skips both sorts. Giant-vs-giant joins
    # keep sort-merge (the size conditions fail), so the spill-safe
    # path still covers the cases that need it.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": str(os.cpu_count() or 8),
    # Parquet scans: keep splits near the default 128 MB so a 100 TB
    # table yields ~800k well-sized tasks rather than millions of tiny
    # ones; local fixtures are single files so this is inert locally.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # The events fixture stores ts as parquet TIMESTAMP(NANOS), which
    # Spark rejects outright; read it as raw nanos and let the catalog
    # rebuild a (microsecond) timestamp column.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "dataingestionengineprocess-spark",
              master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults."""
    builder = SparkSession.builder.appName(app_name)
    env_master = os.environ.get("SPARK_MASTER")
    if master:
        builder = builder.master(master)
    elif env_master:
        # honor the env var's VALUE (e.g. spark://host:7077), not just
        # its presence -- treating it as a flag would leave the builder
        # with no master at all
        builder = builder.master(env_master)
    else:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        builder = builder.master(f"local[{cpus}]")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's *runtime-settable* confs to an existing session.

    The driver harness may hand us a session it built itself; every
    query entrypoint calls this so oracle-sensitive semantics (UTC
    timezone, AQE, Arrow) hold regardless of who built the session.
    Static confs (shuffle partitions pre-AQE) are left alone.
    """
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.join.preferSortMergeJoin",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
    ):
        spark.conf.set(key, ENGINE_CONFS[key])
    return spark


def release_persistent_rdds(spark: SparkSession) -> None:
    """Unpersist every persistent RDD in the context -- the
    localCheckpoint blocks a query leaves behind. Multi-query sweep
    tools (bench.py, tools/driver_replica.py) call this between
    queries so each query's memory profile is its own, not the sum of
    all before it: ~300 queries of accumulated MEMORY_AND_DISK blocks
    pin a default-1g heap until task execution memory starves
    (BASELINE.md round-9 robustness note). Single-query use never
    needs it -- blocks die with the session."""
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
