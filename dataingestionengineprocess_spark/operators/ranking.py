"""Distributed global ordering primitives.

A corpus-wide ``row_number() OVER (ORDER BY ...)`` or running sum
funnels every row through ONE task -- the exact shape that dies first
at 100 TB. The standard fix is the two-pass range-partition prefix
(the same layout `operators/sampling.systematic_weighted_sample`
proved for the weighted draw, factored here for rank consumers):

1. range-partition by the order columns and PIN the layout
   (localCheckpoint) so both passes see identical partitions;
2. per-partition totals -> driver (one value per partition, bounded
   by the partition count, never by the data) -> exclusive prefix
   gives each partition's starting offset;
3. partition-LOCAL window + broadcast offset = the exact global
   value, with no single-task global window anywhere.

The order columns MUST form a total order (include a unique key):
with duplicate keys, range boundaries and within-partition frame
order are engine/run-dependent and the result stops being
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_offsets(df: DataFrame, order_cols: list[str],
                  weight) -> DataFrame:
    """Range-partition ``df`` by ``order_cols``, attach ``__pid`` and
    the partition's exclusive starting offset ``__off`` of ``weight``."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["__pid"]: r["t"]
        for r in parted.groupBy("__pid").agg(F.sum(weight).alias("t"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in range(max(totals) + 1 if totals else 0):
        offsets.append((pid, acc))
        acc += int(totals.get(pid, 0) or 0)
    off = spark.createDataFrame(offsets or [(0, 0)],
                                "__pid int, __off long")
    return parted.join(F.broadcast(off), "__pid")


def global_rank(df: DataFrame, order_cols: list[str],
                rank_col: str = "gr") -> DataFrame:
    """``df`` plus an exact 1-based global ordinal rank over the total
    order ``order_cols`` -- distributed (per-partition row_number +
    broadcast offsets), no global window."""
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        _with_offsets(df, order_cols, F.lit(1))
        .withColumn(rank_col,
                    (F.row_number().over(w) + F.col("__off"))
                    .cast("long"))
        .drop("__pid", "__off")
    )


def distributed_prefix_sums(df: DataFrame, order_cols: list[str],
                            weights: dict[str, str]) -> DataFrame:
    """``df`` plus one exact INCLUSIVE running sum per entry of
    ``weights`` ({cum_col: weight_col}) over the total order
    ``order_cols`` -- ONE range-partition pass (one checkpoint, one
    bounded driver collect) shared by every weight, instead of
    re-partitioning per cumulative."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["__pid"]: r
        for r in parted.groupBy("__pid").agg(
            *[F.sum(F.col(wc).cast("long")).alias(cc)
              for cc, wc in weights.items()]).collect()
    }
    offsets, acc = [], {cc: 0 for cc in weights}
    for pid in range(max(totals) + 1 if totals else 0):
        offsets.append((pid, *[acc[cc] for cc in weights]))
        row = totals.get(pid)
        for cc in weights:
            acc[cc] += int((row[cc] if row is not None else 0) or 0)
    off_schema = "__pid int, " + ", ".join(
        f"__off_{cc} long" for cc in weights)
    off = spark.createDataFrame(
        offsets or [tuple([0] + [0] * len(weights))], off_schema)
    w = Window.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0)
    out = parted.join(F.broadcast(off), "__pid")
    for cc, wc in weights.items():
        out = out.withColumn(
            cc, (F.sum(F.col(wc).cast("long")).over(w)
                 + F.col(f"__off_{cc}")).cast("long"))
    return out.drop("__pid", *[f"__off_{cc}" for cc in weights])


def distributed_prefix_sum(df: DataFrame, order_cols: list[str],
                           weight_col: str,
                           cum_col: str = "cum") -> DataFrame:
    """``df`` plus the exact INCLUSIVE running sum of ``weight_col``
    (cast to long) over the total order ``order_cols`` -- same
    two-pass layout, arbitrary integer weights."""
    return distributed_prefix_sums(df, order_cols, {cum_col: weight_col})
