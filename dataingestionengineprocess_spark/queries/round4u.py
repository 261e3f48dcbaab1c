"""Round-4 (continued) additions: conversion-lag distribution,
ABC revenue classes, largest-remainder quota allocation.

- `events_time_to_convert` -- per signup-week cohort: how many users
  converted (first purchase after first signup) and the EXACT median
  and p90 conversion lag in seconds, via the cumulative-rank-crossing
  idiom (smallest lag whose rank reaches ceil(q*n)) -- no
  percentile_cont interpolation ambiguity, hash-stable.
- `orders_abc_classes` -- ABC revenue classification of parts:
  cumulative-revenue class boundaries (A <= 80%, B <= 95%) evaluated
  as PURE INTEGER comparisons on exact cents, so no float ever
  enters the hash.
- `agg_largest_remainder_quota` -- apportion a fixed budget of 1000
  sample slots across (lang, source) document strata by the
  largest-remainder (Hamilton) method: floor quotas + ranked
  remainders, all in exact integer arithmetic. The quota table a
  stratified corpus sampler consumes.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[S] engagement-analytics and [C] curation/sampling families
(BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from . import register

# ---------------------------------------------------------------------------
# Time to convert. start = first signup; convert = first purchase
# strictly after start. Cohort = ISO-agnostic week index from the
# fixture anchor. Median/p90 use inclusive rank crossing over exact
# integer seconds -- the agg_weighted_median idiom with unit weights.
# ---------------------------------------------------------------------------

_TTC_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
  FROM events GROUP BY user_id
),
conv AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(t0 AS DATE)) // 7
              AS BIGINT) AS week,
         CAST((epoch_us(tp) - epoch_us(t0)) // 1000000 AS BIGINT)
           AS lag_sec
  FROM per_user
  WHERE t0 IS NOT NULL AND tp IS NOT NULL AND tp > t0
    AND CAST(t0 AS DATE) >= DATE '2024-01-01'
),
cohort_n AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(t0 AS DATE)) // 7
              AS BIGINT) AS week,
         CAST(count(*) AS BIGINT) AS n_users
  FROM per_user
  WHERE t0 IS NOT NULL AND CAST(t0 AS DATE) >= DATE '2024-01-01'
  GROUP BY 1
),
ranked AS (
  SELECT week, lag_sec,
         row_number() OVER (PARTITION BY week
                            ORDER BY lag_sec, user_id) AS rn,
         count(*) OVER (PARTITION BY week) AS n
  FROM conv
),
q AS (
  SELECT week,
         CAST(max(n) AS BIGINT) AS n_converted,
         CAST(min(CASE WHEN rn >= ceil(n * 0.5) THEN lag_sec END)
              AS BIGINT) AS median_lag_sec,
         CAST(min(CASE WHEN rn >= ceil(n * 0.9) THEN lag_sec END)
              AS BIGINT) AS p90_lag_sec
  FROM ranked GROUP BY week
)
SELECT c.week, c.n_users,
       COALESCE(q.n_converted, 0) AS n_converted,
       q.median_lag_sec, q.p90_lag_sec
FROM cohort_n c LEFT JOIN q ON q.week = c.week
ORDER BY c.week
"""


@register("events_time_to_convert", oracle=_TTC_ORACLE)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase lag per signup-week cohort with exact
    rank-crossing median and p90."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
        .alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("tp"),
    ).localCheckpoint(eager=True)  # feeds conv AND cohort_n: scan once
    # Cohorts are guarded to t0 >= the 2024-01-01 fixture anchor: for
    # earlier rows the truncating `/7 -> long` here and the flooring
    # `// 7` in the oracle would disagree on negative week indexes
    # (ADVICE r4). With the guard datediff >= 0, where both floor.
    anchored = F.to_date("t0") >= F.lit("2024-01-01")
    week = (F.datediff(F.to_date("t0"), F.to_date(F.lit("2024-01-01")))
            / 7).cast("long")
    conv = (
        per_user
        .where(F.col("t0").isNotNull() & F.col("tp").isNotNull()
               & (F.col("tp") > F.col("t0")) & anchored)
        .select(
            "user_id", week.alias("week"),
            ((F.unix_micros("tp") - F.unix_micros("t0")) / 1000000)
            .cast("long").alias("lag_sec"),
        )
    )
    cohort_n = (
        per_user.where(F.col("t0").isNotNull() & anchored)
        .groupBy(week.alias("week"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    # Per-cohort rank WITHOUT a per-week window: a hot signup week
    # would funnel its whole cohort through one task's sort. The group
    # key is signup WEEK, which grows with the data's time horizon --
    # since round 7 `grouped_rank` itself counts the groups and
    # auto-switches its offsets join from broadcast to shuffle above
    # GROUPED_RANK_BROADCAST_MAX, so a finer time key (hour/minute)
    # over years of data can no longer force an unbounded broadcast.
    from ..operators.ranking import grouped_rank

    ranked = grouped_rank(conv, ["week"], ["lag_sec", "user_id"],
                          "rn", count_col="n").select(
        "week", "lag_sec", "rn", "n")
    q = ranked.groupBy("week").agg(
        F.max("n").cast("long").alias("n_converted"),
        F.min(F.when(F.col("rn") >= F.ceil(F.col("n") * 0.5),
                     F.col("lag_sec"))).cast("long")
        .alias("median_lag_sec"),
        F.min(F.when(F.col("rn") >= F.ceil(F.col("n") * 0.9),
                     F.col("lag_sec"))).cast("long")
        .alias("p90_lag_sec"),
    )
    return (
        cohort_n.join(q, "week", "left")
        .select(
            "week", "n_users",
            F.coalesce(F.col("n_converted"), F.lit(0)).cast("long")
            .alias("n_converted"),
            "median_lag_sec", "p90_lag_sec",
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# ABC classification. Parts ranked by revenue; class boundaries are
# PURE INTEGER comparisons on cumulative cents (cum * 100 <= 80 *
# total for A, <= 95 for B), so no float enters the hash at all.
# The per-part rollup shrinks the facts before the ranking window;
# the class rollup is three bounded rows.
# ---------------------------------------------------------------------------

_ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, cents,
         CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_cents,
         CAST(sum(cents) OVER () AS BIGINT) AS total_cents
  FROM rev
),
classed AS (
  SELECT *,
         CASE WHEN cum_cents * 100 <= 80 * total_cents THEN 'A'
              WHEN cum_cents * 100 <= 95 * total_cents THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(min(cum_cents) AS BIGINT) AS first_cum_cents,
       CAST(max(cum_cents) AS BIGINT) AS last_cum_cents
FROM classed
GROUP BY abc
ORDER BY abc
"""


@register("orders_abc_classes", oracle=_ABC_ORACLE)
def orders_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC revenue classification of parts: cumulative-share class
    boundaries as pure integer comparisons on exact cents."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(F.floor(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")) * 100 + 0.5))
             .cast("long").alias("cents"))
    )
    # The part universe scales with the data, so the global cumulative
    # this used before round 5 was a single-task sort of the whole
    # rollup; distributed_prefix_sum gives the same inclusive cumsum
    # over the (revenue desc, partkey) total order, and the grand
    # total is one bounded aggregate off the checkpointed frame.
    from ..operators.ranking import distributed_prefix_sum

    cum = distributed_prefix_sum(
        rev.withColumn("__neg", -F.col("cents")),
        ["__neg", "l_partkey"], "cents", "cum_cents").drop("__neg")
    tot = cum.agg(F.sum("cents").cast("long").alias("total_cents"))
    ranked = (
        cum.crossJoin(F.broadcast(tot))
        .select("l_partkey", "cents", "cum_cents", "total_cents")
    )
    abc = (
        F.when(F.col("cum_cents") * 100 <= 80 * F.col("total_cents"), "A")
        .when(F.col("cum_cents") * 100 <= 95 * F.col("total_cents"), "B")
        .otherwise("C")
    )
    return (
        ranked.withColumn("abc", abc)
        .groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("revenue_cents"),
            F.min("cum_cents").cast("long").alias("first_cum_cents"),
            F.max("cum_cents").cast("long").alias("last_cum_cents"),
        )
        .orderBy("abc")
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) apportionment of 1000 slots across
# (lang, source) strata. Exact: ideal share scaled by 1e6 in int64,
# floor quota, remainders ranked (desc, then stratum key) and the
# leftover slots distributed +1 down the ranking. Window over the
# bounded strata table only.
# ---------------------------------------------------------------------------

_QUOTA_K = 1000

_QUOTA_ORACLE = f"""
WITH strata AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang, source
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM strata),
base AS (
  SELECT s.lang, s.source, s.n_docs,
         CAST(({_QUOTA_K} * s.n_docs) // t.n AS BIGINT) AS floor_q,
         CAST(({_QUOTA_K} * s.n_docs) % t.n AS BIGINT) AS rem
  FROM strata s CROSS JOIN tot t
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, lang, source) AS rk,
         CAST({_QUOTA_K} AS BIGINT)
           - CAST(sum(floor_q) OVER () AS BIGINT) AS leftover
  FROM base
)
SELECT lang, source, n_docs, floor_q, rem,
       CAST(floor_q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM ranked
ORDER BY lang, source
"""


@register("agg_largest_remainder_quota", oracle=_QUOTA_ORACLE)
def agg_largest_remainder_quota(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Hamilton-method apportionment of 1000 sample slots across
    (lang, source) strata in exact integer arithmetic."""
    from ..operators.sampling import hamilton_quota

    strata = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return hamilton_quota(strata, _QUOTA_K).orderBy("lang", "source")
