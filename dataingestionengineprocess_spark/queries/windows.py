"""Window-function surface: ranking, analytic, framed aggregates.

SURVEY.md §2.5 (W1-W4) plus the keep-latest dedup idiom (P3) and
per-group top-k (O2). Every ORDER BY inside a window carries a unique
tiebreak column so results are total-ordered and engine-independent.

Scale note: window functions shuffle once on the partition key and
sort within partitions -- the same cost profile as a groupBy on that
key. Skewed partition keys (one user with millions of events) are the
hazard at 100 TB; the partition keys here (custkey, user_id) are
near-uniform in the fixtures, and AQE skew handling covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from . import register

# ---------------------------------------------------------------------------
# W1 + P3: keep-latest dedup -- the reference's re-delivered-file idiom
# (a partner re-drops a CSV; only the newest row per key survives).
# ---------------------------------------------------------------------------

_LATEST_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate, round(o_totalprice, 2) AS total_price
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


@register("window_keep_latest", oracle=_LATEST_ORACLE)
def window_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate",
                F.round("o_totalprice", 2).alias("total_price"))
    )


# ---------------------------------------------------------------------------
# O2 per-group top-k: top 3 orders per customer by price.
# ---------------------------------------------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


@register("topk_per_group", oracle=_TOPK_GROUP_ORACLE)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("total_price"), "rnk")
    )


# ---------------------------------------------------------------------------
# W1: rank / dense_rank / ntile within brand by retail price.
# ---------------------------------------------------------------------------

_RANK_ORACLE = """
SELECT p_brand, p_partkey, round(p_retailprice, 2) AS retail_price,
       rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk,
       dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS drnk,
       ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS quartile
FROM part
"""


@register("window_rank_ntile", oracle=_RANK_ORACLE)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_brand", "p_partkey",
            F.round("p_retailprice", 2).alias("retail_price"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
    )


# ---------------------------------------------------------------------------
# W2: lag/lead -- days since a customer's previous order.
# ---------------------------------------------------------------------------

_LAG_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS days_since_prev,
       lead(o_orderkey) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders
"""


@register("window_lag_lead", oracle=_LAG_ORACLE)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_orderdate",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).cast("long").alias("days_since_prev"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
        )
    )


# ---------------------------------------------------------------------------
# W3: framed running aggregate -- cumulative spend per customer in order-date
# order (ROWS frame; unique tiebreak makes the prefix sums deterministic).
# ---------------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       round(avg(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
FROM orders
"""


@register("window_running_sum", oracle=_RUNNING_ORACLE)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_orderdate",
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
            ).alias("running_spend"),
            F.round(
                F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4
            ).alias("moving_avg_3"),
        )
    )


# ---------------------------------------------------------------------------
# W4: RANGE frame over event time -- per user, number of events in the
# trailing 10 minutes (range on epoch seconds, not row counts).
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT event_id, user_id, ts,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                      RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_last_10m
FROM events
"""


@register("window_range_trailing", oracle=_RANGE_ORACLE)
def window_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # Epoch with fractional seconds so sub-second event spacing matches
    # DuckDB's epoch() (which returns fractional seconds for timestamps).
    epoch = F.col("ts").cast("double")
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "event_id", "user_id", "ts",
        F.count("*").over(w).alias("n_last_10m"),
    )


# ---------------------------------------------------------------------------
# W1 extended: percent_rank / cume_dist -- the distribution-position
# analytics (customer balance percentile within market segment).
# ---------------------------------------------------------------------------

_PCTRANK_ORACLE = """
SELECT c_mktsegment, c_custkey,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal NULLS FIRST, c_custkey)
"""
# NULLS FIRST pins the engine-side ASC NULLS FIRST ordering of
# operators/ranking (ADVICE r5): DuckDB's ASC default is NULLS LAST,
# so a nullable value column would silently shift every pct/cume.


@register("window_percent_rank", oracle=_PCTRANK_ORACLE)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c_mktsegment has 5 values: a per-segment window would funnel a
    fifth of the customer universe through one task's sort. The
    distribution pair derives from `grouped_percent_cume` (checkpointed
    global_rank layout + bounded broadcast segment offsets) instead."""
    from ..operators.ranking import grouped_percent_cume

    cust = load(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal")
    # c_mktsegment is a fixed generator enum (5 values at every sf):
    # the bound skips grouped_rank's strategy-probe job (VERDICT r10
    # #5); any value <= broadcast_max picks the same broadcast join.
    out = grouped_percent_cume(cust, ["c_mktsegment"], "c_acctbal",
                               "c_custkey", "__pct", "__cume",
                               known_group_count=8)
    return out.select(
        "c_mktsegment", "c_custkey",
        F.round(F.col("__pct"), 6).alias("pct_rank"),
        F.round(F.col("__cume"), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Native batch session_window (ST4's batch cousin): the built-in gap
# sessionizer run relationally. The oracle derives the same sessions
# with the lag/cumulative-flag idiom -- two independent formulations of
# "30-minute inactivity closes a session" that must agree row for row.
# ---------------------------------------------------------------------------

# Reuses the STREAMING session oracle verbatim (queries/streaming.py):
# one hand-maintained formulation of "a >30-minute gap closes the
# session" -- Spark's session_window merges events exactly gap-distance
# apart, so the new-session condition is strictly `> 1800`, and both
# window orderings carry the event_id tiebreak.
from .streaming import _SESSION_ORACLE as _SESSION_BATCH_ORACLE


@register("window_session_batch", oracle=_SESSION_BATCH_ORACLE)
def window_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select("user_id", "session_start", "n_events", "session_value")
    )


# ---------------------------------------------------------------------------
# nth_value: the "third touch" attribution idiom -- per user, the value
# of the 3rd event in timeline order, alongside first/last for context.
# ---------------------------------------------------------------------------

_NTH_ORACLE = """
SELECT user_id, event_id,
       round(nth_value(value, 3) OVER w, 2)  AS third_value,
       round(first_value(value) OVER w, 2)   AS first_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("window_nth_value", oracle=_NTH_ORACLE)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id", "event_id",
        F.round(F.nth_value("value", 3).over(w), 2).alias("third_value"),
        F.round(F.first("value").over(w), 2).alias("first_value"),
    )
