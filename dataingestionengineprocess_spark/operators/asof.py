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


def asof_join_nearest(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str,
                      payload_cols: list[str],
                      tolerance_seconds: int | None = None,
                      how: str = "inner") -> DataFrame:
    """For each left row, attach the right row whose ``right_ts`` is
    NEAREST to ``left_ts`` within the same ``on`` key, on either side
    of it -- pandas `merge_asof(direction="nearest")`, distributed.
    Ties (equidistant before/after) resolve to the BACKWARD candidate.
    ``tolerance_seconds`` drops matches farther than the bound (the
    standard guard against joining across session gaps).

    Plan: ONE union + one shuffle on ``on`` + two in-partition sorts
    (ascending carry for the backward candidate, descending for the
    forward one -- the second window reuses the exchange, it only
    re-sorts). Still no per-row lookups and no broadcast of either
    side; the delta arithmetic is integer microseconds, so the
    nearest/tolerance decisions are exact and engine-portable.

    ``right`` must be unique per (on, right_ts), as for the other
    directions. Adds ``__delta_us`` (signed: negative when the match
    is before the probe... positive = match after) to the output.
    """
    l_tag = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__axis_ts", F.col(left_ts)
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__axis_ts"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in payload_cols],
        ).alias("__payload"),
    ).withColumn("__is_left", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w_back = (
        W.partitionBy(on)
        .orderBy(F.col("__axis_ts").asc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_fwd = (
        W.partitionBy(on)
        .orderBy(F.col("__axis_ts").desc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    r_only = F.when(F.col("__is_left") == 0, F.col("__payload"))
    filled = unioned.withColumn(
        "__back", F.last(r_only, ignorenulls=True).over(w_back)
    ).withColumn(
        "__fwd", F.last(r_only, ignorenulls=True).over(w_fwd)
    ).filter(F.col("__is_left") == 1)

    # Timestamp axes measure in exact integer microseconds (tolerance
    # given in seconds); any other orderable numeric axis measures in
    # its own units (tolerance given in axis units) -- same contract
    # as backward/forward, which are axis-type-agnostic.
    is_ts = str(left.schema[left_ts].dataType).startswith("Timestamp")
    if is_ts:
        def axis(c):
            return F.unix_micros(c)
        tol_mult = 1_000_000
    else:
        def axis(c):
            return c.cast("long")
        tol_mult = 1
    lus = axis(F.col(left_ts))
    d_back = lus - axis(F.col("__back")["__rts"])   # >= 0
    d_fwd = axis(F.col("__fwd")["__rts"]) - lus     # >= 0
    if tolerance_seconds is not None:
        tol_us = F.lit(int(tolerance_seconds) * tol_mult)
        back_ok = F.col("__back").isNotNull() & (d_back <= tol_us)
        fwd_ok = F.col("__fwd").isNotNull() & (d_fwd <= tol_us)
    else:
        back_ok = F.col("__back").isNotNull()
        fwd_ok = F.col("__fwd").isNotNull()

    take_back = back_ok & (~fwd_ok | (d_back <= d_fwd))
    take_fwd = fwd_ok & ~take_back
    chosen = F.when(take_back, F.col("__back")).when(
        take_fwd, F.col("__fwd")
    )
    delta = F.when(take_back, -d_back).when(take_fwd, d_fwd)

    out = filled.withColumn("__chosen", chosen).withColumn(
        "__delta_us", delta
    )
    if how == "inner":
        out = out.filter(F.col("__chosen").isNotNull())
    for c in payload_cols:
        out = out.withColumn(c, F.col("__chosen")[c])
    return out.drop("__is_left", "__axis_ts", "__payload",
                    "__back", "__fwd", "__chosen")
