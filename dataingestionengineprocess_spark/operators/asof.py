"""As-of (nearest-event backward) join -- SURVEY.md §2.3 J7.

Spark SQL has no native ASOF JOIN. Implementation: the union-and-fill
trick, which is one shuffle + one in-partition sort:

  1. tag right rows (the quote/snapshot side) and left rows (probes);
  2. union them on the join key with a common timestamp axis;
  3. window by key ordered by (ts, right-first) and carry the last
     non-null right payload forward (`last(ignorenulls=True)`);
  4. keep left rows; each now holds the latest right row at-or-before
     its timestamp.

Scale: identical cost profile to a single window function over the
combined stream -- no per-row lookups, no broadcast of the big side,
skew only if one key dominates (AQE handles). This beats the
per-group `pd.merge_asof` pattern (no Python boundary, no per-group
memory requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, on: str,
                       left_ts: str, right_ts: str,
                       payload_cols: list[str],
                       how: str = "inner") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key.

    ``right`` must be unique per (on, right_ts) -- pre-aggregate it
    otherwise, or the carried payload is nondeterministic.
    """
    l_tag = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__axis_ts", F.col(left_ts)
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__axis_ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    ).withColumn("__is_left", F.lit(0))

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows sort before left rows at the same timestamp, so an
    # exact-tie snapshot is visible to the probe (<= semantics).
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__axis_ts"), F.col("__is_left"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "__matched", F.last("__payload", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("__matched").isNotNull())
    for c in payload_cols:
        out = out.withColumn(c, F.col("__matched")[c])
    return out.drop("__is_left", "__axis_ts", "__payload", "__matched")


def asof_join_forward(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str,
                      payload_cols: list[str],
                      how: str = "inner") -> DataFrame:
    """For each left row, attach the right row with the SMALLEST
    ``right_ts >= left_ts`` within the same ``on`` key (the mirror of
    `asof_join_backward`; same union-and-fill shape, with the carry
    running over the FOLLOWING frame).

    ``right`` must be unique per (on, right_ts), as for backward.
    """
    l_tag = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__axis_ts", F.col(left_ts)
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__axis_ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    ).withColumn("__is_left", F.lit(0))

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # LEFT rows sort before right rows at the same timestamp, so an
    # exact-tie snapshot is inside the probe's following frame
    # (>= semantics).
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__axis_ts"), F.col("__is_left").desc())
        .rowsBetween(0, W.unboundedFollowing)
    )
    filled = unioned.withColumn(
        "__matched", F.first("__payload", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("__matched").isNotNull())
    for c in payload_cols:
        out = out.withColumn(c, F.col("__matched")[c])
    return out.drop("__is_left", "__axis_ts", "__payload", "__matched")
