"""As-of (nearest-event) joins, backward and forward -- SURVEY.md §2.3 J7.

Spark SQL has no native ASOF JOIN. Implementation: the union-and-fill
trick, which is one shuffle + one in-partition sort:

  1. tag right rows (the quote/snapshot side) and left rows (probes);
  2. union them on the join key with a common timestamp axis;
  3. window by key over the axis and carry the last non-null right
     payload along a RUNNING [unbounded preceding, current row] frame
     (backward walks time ascending, forward walks it DESCENDING --
     same linear incremental frame either way, never the shrinking
     [current, unbounded following] frame Spark re-scans per row);
  4. keep left rows; each now holds the nearest right row on its side.

Scale: identical cost profile to a single window function over the
combined stream -- no per-row lookups, no broadcast of the big side,
skew only if one key dominates (AQE handles). This beats the
per-group `pd.merge_asof` pattern (no Python boundary, no per-group
memory requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _asof_union_fill(left: DataFrame, right: DataFrame, on: str,
                     left_ts: str, right_ts: str,
                     payload_cols: list[str], how: str,
                     direction: str) -> DataFrame:
    l_tag = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__axis_ts", F.col(left_ts)
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__axis_ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    ).withColumn("__is_left", F.lit(0))

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # Both directions carry over the RUNNING preceding frame (linear,
    # incremental); the axis direction decides the semantics. Right
    # rows order before left rows at an equal timestamp either way, so
    # exact ties are visible to the probe (<= / >= inclusive).
    if direction == "backward":
        order = [F.col("__axis_ts").asc(), F.col("__is_left").asc()]
    else:
        order = [F.col("__axis_ts").desc(), F.col("__is_left").asc()]
    w = (
        W.partitionBy(on)
        .orderBy(*order)
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


def asof_join_backward(left: DataFrame, right: DataFrame, on: str,
                       left_ts: str, right_ts: str,
                       payload_cols: list[str],
                       how: str = "inner") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key.

    ``right`` must be unique per (on, right_ts) -- pre-aggregate it
    otherwise, or the carried payload is nondeterministic.
    """
    return _asof_union_fill(left, right, on, left_ts, right_ts,
                            payload_cols, how, "backward")


def asof_join_forward(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str,
                      payload_cols: list[str],
                      how: str = "inner") -> DataFrame:
    """For each left row, attach the right row with the SMALLEST
    ``right_ts >= left_ts`` within the same ``on`` key (the mirror of
    `asof_join_backward`; the carry walks the time axis descending,
    so the frame stays the linear running one).

    ``right`` must be unique per (on, right_ts), as for backward.
    """
    return _asof_union_fill(left, right, on, left_ts, right_ts,
                            payload_cols, how, "forward")
