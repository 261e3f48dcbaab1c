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
from pyspark.sql.types import (ByteType, IntegerType, LongType, ShortType,
                               TimestampNTZType, TimestampType)


def _tag_union(left: DataFrame, right: DataFrame, on: str,
               left_ts: str, right_ts: str, payload_cols: list[str],
               with_axis: bool = False) -> DataFrame:
    """Tag + union scaffolding shared by every direction: left rows
    carry ``__is_left=1`` and their probe axis; right rows collapse to
    (key, axis, payload-struct). ``with_axis`` additionally embeds the
    right timestamp in the payload (the nearest direction needs it for
    the delta arithmetic). One place so the tie-ordering / null-carry
    rules can never drift between backward/forward and nearest."""
    fields = [F.col(c) for c in payload_cols]
    if with_axis:
        fields = [F.col(right_ts).alias("__rts")] + fields
    l_tag = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__axis_ts", F.col(left_ts)
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__axis_ts"),
        F.struct(*fields).alias("__payload"),
    ).withColumn("__is_left", F.lit(0))
    return l_tag.unionByName(r_tag, allowMissingColumns=True)


def _carry_window(on: str, direction: str):
    """RUNNING [unbounded preceding, current] frame over the axis.
    Right rows order before left rows at an equal timestamp either
    way, so exact ties are visible to the probe (<= / >= inclusive)."""
    axis = (F.col("__axis_ts").asc() if direction == "backward"
            else F.col("__axis_ts").desc())
    return (
        W.partitionBy(on)
        .orderBy(axis, F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )


def _unpack(out: DataFrame, src: str, payload_cols: list[str],
            how: str) -> DataFrame:
    if how == "inner":
        out = out.filter(F.col(src).isNotNull())
    for c in payload_cols:
        out = out.withColumn(c, F.col(src)[c])
    return out


def _asof_union_fill(left: DataFrame, right: DataFrame, on: str,
                     left_ts: str, right_ts: str,
                     payload_cols: list[str], how: str,
                     direction: str) -> DataFrame:
    unioned = _tag_union(left, right, on, left_ts, right_ts, payload_cols)
    filled = unioned.withColumn(
        "__matched",
        F.last("__payload", ignorenulls=True).over(_carry_window(on, direction)),
    )
    out = filled.filter(F.col("__is_left") == 1)
    out = _unpack(out, "__matched", payload_cols, how)
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
                      tolerance_seconds: float | None = None,
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
    side. Delta arithmetic by axis type: timestamps measure in exact
    integer microseconds (tolerance given in seconds), integral axes
    in their own exact integer units, and fractional numeric axes
    (float/double/decimal) in IEEE doubles -- never silently
    truncated to integers, so a probe at 1.6 correctly prefers a
    snapshot at 2.1 over one at 1.0.

    ``right`` must be unique per (on, right_ts), as for the other
    directions. Adds ``__delta_us`` (signed: negative when the match
    is before the probe... positive = match after; integer micros /
    axis units for timestamp / integral axes, double axis units for
    fractional ones) to the output.
    """
    unioned = _tag_union(left, right, on, left_ts, right_ts,
                         payload_cols, with_axis=True)
    filled = unioned.withColumn(
        "__back",
        F.last("__payload", ignorenulls=True).over(_carry_window(on, "backward")),
    ).withColumn(
        "__fwd",
        F.last("__payload", ignorenulls=True).over(_carry_window(on, "forward")),
    ).filter(F.col("__is_left") == 1)

    dtype = left.schema[left_ts].dataType
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        def axis(c):
            return F.unix_micros(c)
        tol_expr = (None if tolerance_seconds is None
                    else F.lit(int(round(tolerance_seconds * 1_000_000))))
    elif isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
        # exact integer deltas; the tolerance may still be fractional
        # (long <= double compares exactly for the magnitudes here)
        def axis(c):
            return c.cast("long")
        tol_expr = (None if tolerance_seconds is None
                    else F.lit(tolerance_seconds))
    else:
        def axis(c):
            return c.cast("double")
        tol_expr = (None if tolerance_seconds is None
                    else F.lit(float(tolerance_seconds)))
    lus = axis(F.col(left_ts))
    d_back = lus - axis(F.col("__back")["__rts"])   # >= 0
    d_fwd = axis(F.col("__fwd")["__rts"]) - lus     # >= 0
    if tol_expr is not None:
        back_ok = F.col("__back").isNotNull() & (d_back <= tol_expr)
        fwd_ok = F.col("__fwd").isNotNull() & (d_fwd <= tol_expr)
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
    out = _unpack(out, "__chosen", payload_cols, how)
    return out.drop("__is_left", "__axis_ts", "__payload",
                    "__back", "__fwd", "__chosen")
