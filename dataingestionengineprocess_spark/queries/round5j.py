"""Round-4 (continued) additions: seasonal-naive forecast backtest
and the Laspeyres/Paasche/Fisher price index.

- `events_snaive_backtest` -- the forecasting baseline every volume
  monitor needs beaten: predict day d's count with day d-7's (a
  calendar-day self-join, NOT a 7-row lag -- sparse series would
  otherwise pair the wrong days), then
  score the final week of the fixture with exact-integer MAE and a
  snapped MAPE (zero-actual days drop out of MAPE identically in
  both engines via the nullif guard). One bounded day-axis self-join
  over the checkpointed per-type daily rollup.
- `part_price_index` -- the economic price-level readout between the
  two half-month periods from exact cents and integer quantities:
  Laspeyres (base-period basket), Paasche (current basket), and
  Fisher (geometric mean, sqrt is IEEE-exact) over the parts traded
  in BOTH periods. All four basket sums are int64-exact before the
  two divisions snap.

Reference parity: diagram-only reference (SURVEY.md §0); both extend
the [C] monitoring / analytics mandate (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import (US_PER_DAY as _US_PER_DAY,
                               epoch_day as _epoch_day, snap6 as _snap6)
from . import register

# ---------------------------------------------------------------------------
# Seasonal-naive backtest. Daily counts per type; forecast(d) =
# y(d-7) via a calendar-day self-join on the bounded type x day
# table; scored days = the last 7 with a forecast available. MAE in
# exact counts; MAPE per-day terms quantized before the mean.
# ---------------------------------------------------------------------------

_SNAIVE_ORACLE = f"""
WITH counts AS (
  SELECT event_type,
         CAST(CAST(epoch_us(ts) AS BIGINT) // {_US_PER_DAY} AS BIGINT)
           AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT c.event_type, c.day, c.y, p.y AS f
  FROM counts c
  LEFT JOIN counts p ON p.event_type = c.event_type
                    AND p.day = c.day - 7
),
span AS (SELECT CAST(max(day) AS BIGINT) AS dmax FROM counts),
scored AS (
  SELECT l.event_type, l.day, l.y, l.f,
         abs(l.y - l.f) AS ae,
         CASE WHEN l.y > 0 THEN
           CAST(floor(CAST(abs(l.y - l.f) AS DOUBLE) / l.y * 1e6 + 0.5)
                AS BIGINT)
         END AS ape_q
  FROM lagged l CROSS JOIN span s
  WHERE l.f IS NOT NULL AND l.day > s.dmax - 7
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(ae) AS BIGINT) AS total_abs_err,
       floor(CAST(sum(ae) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
         AS mae_s,
       floor(CAST(sum(ape_q) AS DOUBLE) / 1e6
             / nullif(count(ape_q), 0) * 1e6 + 0.5) / 1e6 AS mape_s
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


@register("events_snaive_backtest", oracle=_SNAIVE_ORACLE)
def events_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (lag-7) forecast backtest over the final week:
    exact MAE and quantized-term MAPE per event type."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y")) \
     .localCheckpoint(eager=True)  # bounded type x day, two legs
    # lag by 7 CALENDAR days (a self-join on day - 7), not 7 rows:
    # a type with zero-event days would otherwise pair day d with an
    # older observation and silently score the wrong seasonal twin
    prev = counts.select(
        F.col("event_type").alias("et2"),
        (F.col("day") + 7).alias("day2"), F.col("y").alias("f"))
    lagged = counts.join(
        prev, (counts.event_type == prev.et2)
        & (counts.day == prev.day2), "left"
    ).select("event_type", "day", "y", "f")
    span = counts.agg(F.max("day").cast("long").alias("dmax"))
    ae = F.abs(F.col("y") - F.col("f"))
    ape_q = F.when(
        F.col("y") > 0,
        F.floor(ae.cast("double") / F.col("y") * 1e6 + 0.5).cast("long"))
    scored = (
        lagged.crossJoin(F.broadcast(span))
        .where(F.col("f").isNotNull()
               & (F.col("day") > F.col("dmax") - 7))
        .select("event_type", ae.alias("ae"), ape_q.alias("ape_q"))
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("ae").cast("long").alias("total_abs_err"),
            _snap6(F.sum("ae").cast("double") / F.count(F.lit(1)))
            .alias("mae_s"),
            _snap6(F.sum("ape_q").cast("double") / 1e6
                   / F.nullif(F.count("ape_q"), F.lit(0)))
            .alias("mape_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Price index. Per part per period: quantity units (integer) and the
# quantity-weighted mean price in cents is avoided entirely -- the
# basket sums use sum(price_cents * qty_units) directly, so the four
# cross sums are exact int64. Parts must trade in BOTH periods (the
# matched-basket convention); indices snap once.
# ---------------------------------------------------------------------------

from ..functions.exact import FIXTURE_SPLIT_DAY as _PRICE_SPLIT_DAY  # noqa: E402

_PRICE_INDEX_ORACLE = f"""
WITH li AS (
  SELECT l_partkey AS pk,
         CASE WHEN date_diff('day', DATE '1970-01-01',
                             CAST(l_shipdate AS DATE))
                   < {_PRICE_SPLIT_DAY} THEN 1 ELSE 2 END AS period,
         CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)
           AS unit_cents,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
  FROM lineitem WHERE l_quantity > 0
),
pp AS (
  SELECT pk, period,
         CAST(sum(unit_cents * qty) AS BIGINT) AS spend,
         CAST(sum(qty) AS BIGINT) AS q
  FROM li GROUP BY pk, period
),
matched AS (
  SELECT a.pk,
         a.spend AS spend1, a.q AS q1,
         b.spend AS spend2, b.q AS q2
  FROM pp a JOIN pp b ON b.pk = a.pk AND a.period = 1 AND b.period = 2
),
px AS (
  SELECT pk,
         CAST(floor(CAST(spend1 AS DOUBLE) / q1 + 0.5) AS BIGINT) AS p1,
         CAST(floor(CAST(spend2 AS DOUBLE) / q2 + 0.5) AS BIGINT) AS p2,
         q1, q2
  FROM matched
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n_parts,
         CAST(sum(p2 * q1) AS BIGINT) AS s21,
         CAST(sum(p1 * q1) AS BIGINT) AS s11,
         CAST(sum(p2 * q2) AS BIGINT) AS s22,
         CAST(sum(p1 * q2) AS BIGINT) AS s12
  FROM px
)
SELECT n_parts,
       floor(CAST(s21 AS DOUBLE) / nullif(s11, 0) * 1e6 + 0.5) / 1e6
         AS laspeyres_s,
       floor(CAST(s22 AS DOUBLE) / nullif(s12, 0) * 1e6 + 0.5) / 1e6
         AS paasche_s,
       floor(sqrt((CAST(s21 AS DOUBLE) / nullif(s11, 0))
                  * (CAST(s22 AS DOUBLE) / nullif(s12, 0)))
             * 1e6 + 0.5) / 1e6 AS fisher_s
FROM sums
"""


@register("part_price_index", oracle=_PRICE_INDEX_ORACLE)
def part_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices between the two
    half-month periods over the matched part basket, exact cents."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") > 0).select(
        F.col("l_partkey").alias("pk"),
        F.when(_epoch_day("l_shipdate") < _PRICE_SPLIT_DAY, 1)
        .otherwise(2).alias("period"),
        F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100
                + 0.5).cast("long").alias("unit_cents"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
    )
    pp = li.groupBy("pk", "period").agg(
        F.sum(F.col("unit_cents") * F.col("qty")).cast("long")
        .alias("spend"),
        F.sum("qty").cast("long").alias("q"),
    )
    a = pp.where(F.col("period") == 1).select(
        "pk", F.col("spend").alias("spend1"), F.col("q").alias("q1"))
    b = pp.where(F.col("period") == 2).select(
        "pk", F.col("spend").alias("spend2"), F.col("q").alias("q2"))
    px = a.join(b, "pk").select(
        "pk",
        F.floor(F.col("spend1").cast("double") / F.col("q1") + 0.5)
        .cast("long").alias("p1"),
        F.floor(F.col("spend2").cast("double") / F.col("q2") + 0.5)
        .cast("long").alias("p2"),
        "q1", "q2",
    )
    sums = px.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("p2") * F.col("q1")).cast("long").alias("s21"),
        F.sum(F.col("p1") * F.col("q1")).cast("long").alias("s11"),
        F.sum(F.col("p2") * F.col("q2")).cast("long").alias("s22"),
        F.sum(F.col("p1") * F.col("q2")).cast("long").alias("s12"),
    )
    las = F.col("s21").cast("double") / F.nullif(F.col("s11"), F.lit(0))
    paa = F.col("s22").cast("double") / F.nullif(F.col("s12"), F.lit(0))
    return sums.select(
        "n_parts",
        _snap6(las).alias("laspeyres_s"),
        _snap6(paa).alias("paasche_s"),
        _snap6(F.sqrt(las * paa)).alias("fisher_s"),
    )
