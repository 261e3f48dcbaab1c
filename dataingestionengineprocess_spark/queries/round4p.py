"""Round-4 (continued) additions: the bot-traffic screen and the
order-backlog time series.

- `quality_bot_user_screen` -- per-user behavioral heuristics (event
  rate per active minute, inter-event gap regularity, action
  diversity) rolled into deterministic bot flags: the traffic-
  cleaning screen that runs BEFORE any engagement analytics, since
  a handful of scripted users poison every funnel and retention
  number downstream.
- `orders_backlog_timeseries` -- the open-order backlog by day:
  cumulative orders placed minus order-lines fully shipped, from the
  daily in/out flows full-outer-joined onto one day axis -- the
  operational inventory read (placed-vs-shipped net flow).

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[C] quality and [S] analytics families (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from . import register

# ---------------------------------------------------------------------------
# Bot screen. Three exact per-user signals from one pass over the
# ordered stream: events per active minute (n / span, span >= 1 s),
# the population-std of inter-event gaps from EXACT integer
# microsecond sums (scripted traffic is metronomic: std ~ 0) -- the
# sum of squared gaps rides DECIMAL(38)/HUGEINT because day-scale
# gaps square past int64 -- and distinct action types. Flags: rate > 2/min with >= 20 events; gap std < 1 s with
# >= 10 events; single-action users with >= 20 events. The flags are
# exact-integer comparisons, so the whole screen hash-checks.
#
# Scale: one lag window keyed by user + one groupBy -- the same cost
# class as sessionization; nothing corpus-wide.
# ---------------------------------------------------------------------------

_BOT_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS us,
         CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
              PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT)
           AS gap_us
  FROM events
),
u AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(max(us) - min(us) AS BIGINT) AS span_us,
         CAST(count(gap_us) AS BIGINT) AS n_gaps,
         CAST(sum(gap_us) AS BIGINT) AS sum_gap,
         CAST(sum(CAST(gap_us AS HUGEINT) * gap_us) AS DOUBLE)
           AS sum_gap2
  FROM seq GROUP BY user_id
),
sig AS (
  SELECT user_id, n_events, n_types,
         floor(CAST(n_events AS DOUBLE)
               / greatest(span_us / 6e7, 1.0 / 60.0) * 1e6 + 0.5) / 1e6
           AS rate_per_min_s,
         CASE WHEN n_gaps > 0 THEN
           floor(sqrt(greatest(
             (sum_gap2 - CAST(sum_gap AS DOUBLE) * sum_gap / n_gaps)
             / n_gaps, 0.0)) / 1e6 * 1e6 + 0.5) / 1e6
         END AS gap_std_sec_s
  FROM u
)
SELECT user_id, n_events, n_types, rate_per_min_s, gap_std_sec_s,
       CASE WHEN n_events >= 20 AND rate_per_min_s > 2.0 THEN 1 ELSE 0
         END AS flag_rate,
       CASE WHEN n_events >= 10 AND gap_std_sec_s < 1.0 THEN 1 ELSE 0
         END AS flag_metronome,
       CASE WHEN n_events >= 20 AND n_types = 1 THEN 1 ELSE 0
         END AS flag_monotype
FROM sig
ORDER BY user_id
"""


@register("quality_bot_user_screen", oracle=_BOT_ORACLE)
def quality_bot_user_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user bot heuristics (rate, gap regularity, action
    diversity) with deterministic integer-exact flags."""
    ev = load(spark, sf_dir, "events")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = (F.unix_micros("ts")).cast("long")
    seq = ev.select(
        "user_id", "event_type", us.alias("us"),
        (us - F.lag(us).over(wl)).cast("long").alias("gap_us"),
    )
    u = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        (F.max("us") - F.min("us")).cast("long").alias("span_us"),
        F.count("gap_us").cast("long").alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("sum_gap"),
        # exact decimal accumulation: day-scale gaps square past int64
        F.sum(F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us"))
        .cast("double").alias("sum_gap2"),
    )
    rate = _snap6(
        F.col("n_events").cast("double")
        / F.greatest(F.col("span_us") / 6e7, F.lit(1.0 / 60.0)))
    gap_std = F.when(
        F.col("n_gaps") > 0,
        _snap6(F.sqrt(F.greatest(
            (F.col("sum_gap2")
             - F.col("sum_gap").cast("double") * F.col("sum_gap")
             / F.col("n_gaps")) / F.col("n_gaps"), F.lit(0.0))) / 1e6),
    )
    sig = u.select("user_id", "n_events", "n_types",
                   rate.alias("rate_per_min_s"),
                   gap_std.alias("gap_std_sec_s"))
    return (
        sig.select(
            "user_id", "n_events", "n_types", "rate_per_min_s",
            "gap_std_sec_s",
            F.when((F.col("n_events") >= 20)
                   & (F.col("rate_per_min_s") > 2.0), 1).otherwise(0)
            .alias("flag_rate"),
            F.when((F.col("n_events") >= 10)
                   & (F.col("gap_std_sec_s") < 1.0), 1).otherwise(0)
            .alias("flag_metronome"),
            F.when((F.col("n_events") >= 20) & (F.col("n_types") == 1), 1)
            .otherwise(0).alias("flag_monotype"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Backlog time series. Inflow = orders placed per day; outflow = an
# order leaves the backlog on its LAST ship date (max over its
# lines). The two bounded daily flows full-outer-join onto one day
# axis and a cumulative window nets them -- the end-of-day open-order
# count. Orders with no lines at all never leave (they stay in the
# backlog tail, visible in the final row).
#
# Scale: one groupBy per flow (the per-order max is orderkey-keyed),
# then bounded-table arithmetic; no corpus-level window.
# ---------------------------------------------------------------------------

_BACKLOG_ORACLE = """
WITH placed AS (
  SELECT date_diff('day', DATE '2024-01-01', o_orderdate) AS day_num,
         CAST(count(*) AS BIGINT) AS n_in
  FROM orders GROUP BY 1
),
done AS (
  SELECT o_orderkey, max(l_shipdate) AS done_date
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_orderkey
),
shipped AS (
  SELECT date_diff('day', DATE '2024-01-01', done_date) AS day_num,
         CAST(count(*) AS BIGINT) AS n_out
  FROM done GROUP BY 1
),
axis AS (
  SELECT COALESCE(p.day_num, s.day_num) AS day_num,
         COALESCE(p.n_in, 0) AS n_in, COALESCE(s.n_out, 0) AS n_out
  FROM placed p FULL OUTER JOIN shipped s ON p.day_num = s.day_num
)
SELECT day_num, n_in, n_out,
       CAST(sum(n_in - n_out) OVER (ORDER BY day_num
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS backlog
FROM axis
ORDER BY day_num
"""


@register("orders_backlog_timeseries", oracle=_BACKLOG_ORACLE)
def orders_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-day open-order backlog: cumulative placed minus
    fully-shipped flows on one day axis."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    day_o = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("2024-01-01")))
    placed = (orders.groupBy(day_o.alias("day_num"))
              .agg(F.count(F.lit(1)).cast("long").alias("n_in")))
    done = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.max("l_shipdate").alias("done_date"))
    )
    day_s = F.datediff(F.col("done_date"), F.to_date(F.lit("2024-01-01")))
    shipped = (done.groupBy(day_s.alias("day_num"))
               .agg(F.count(F.lit(1)).cast("long").alias("n_out")))
    axis = (
        placed.join(shipped, "day_num", "full_outer")
        .select(
            "day_num",
            F.coalesce(F.col("n_in"), F.lit(0)).alias("n_in"),
            F.coalesce(F.col("n_out"), F.lit(0)).alias("n_out"),
        )
    )
    w = W.orderBy("day_num").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        axis.withColumn(
            "backlog",
            F.sum(F.col("n_in") - F.col("n_out")).over(w).cast("long"))
        .orderBy("day_num")
    )
