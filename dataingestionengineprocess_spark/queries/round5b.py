"""Round-4 (continued) additions: subject-access report, Spearman
rank correlation, and the rolling regression slope window.

- `gov_subject_access_report` -- the DSAR inventory every governed
  store must produce: one row per data subject (customer) listing
  everything held about them -- order count, line count, exact spend
  cents, first/last activity days -- with LEFT joins so a subject
  with stored identity but no activity still appears (that is the
  point of the report). Pure key-partitioned aggregates; the
  complement of `gov_erasure_impact`.
- `stat_spearman_corr` -- rank correlation between the first two
  embedding components with tie-AVERAGED ranks kept exact as
  2x-scaled integers (the Mann-Whitney algebra, applied twice via
  `distributed_prefix_sum`); all power sums ride DECIMAL(38) (rank
  squares cube past int64 at corpus scale), rho snapped once.
- `window_rolling_slope` -- trailing 7-observation OLS slope of the
  daily event count per type: every frame sum is an exact integer
  (day numbers x counts), slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
  snapped, NULL where the frame is degenerate (single observation).
  The frame rides the per-type partition -- the same cost class as
  any framed window aggregate.

Reference parity: diagram-only reference (SURVEY.md §0); the report
extends the [R] warehouse/OLTP stage's governance duties, the other
two the [C] statistics mandate (BASELINE.json:6).

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
# Subject access report. Everything is keyed on the subject: two
# LEFT-joined per-customer aggregates (orders; lines via orders), a
# broadcast nation name, zeros for inactivity. No window anywhere.
# ---------------------------------------------------------------------------

_SAR_ORACLE = f"""
WITH po AS (
  SELECT o_custkey AS ck,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
           AS spend_cents,
         CAST(min(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE))) AS BIGINT)
           AS first_day,
         CAST(max(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE))) AS BIGINT)
           AS last_day
  FROM orders GROUP BY o_custkey
),
pl AS (
  SELECT o.o_custkey AS ck, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_custkey
)
SELECT c.c_custkey,
       n.n_name,
       COALESCE(po.n_orders, 0) AS n_orders,
       COALESCE(pl.n_lines, 0) AS n_lines,
       COALESCE(po.spend_cents, 0) AS spend_cents,
       po.first_day, po.last_day
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
LEFT JOIN po ON po.ck = c.c_custkey
LEFT JOIN pl ON pl.ck = c.c_custkey
ORDER BY c.c_custkey
"""


@register("gov_subject_access_report", oracle=_SAR_ORACLE)
def gov_subject_access_report(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-subject data inventory: order/line counts, exact spend
    cents, first/last activity days; inactive subjects included."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    day = _epoch_day("o_orderdate")
    po = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).cast("long")
        .alias("spend_cents"),
        F.min(day).cast("long").alias("first_day"),
        F.max(day).cast("long").alias("last_day"),
    )
    pl = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
    )
    return (
        cust.join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
        .join(po, cust.c_custkey == po.ck, "left")
        .join(pl, cust.c_custkey == pl.ck, "left")
        .select(
            "c_custkey", "n_name",
            F.coalesce("n_orders", F.lit(0)).cast("long")
            .alias("n_orders"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("spend_cents", F.lit(0)).cast("long")
            .alias("spend_cents"),
            "first_day", "last_day",
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Spearman. For each axis: value groups -> prefix -> tie-averaged
# rank x2 -> join back on the snapped value (an equi-join, shuffle on
# the value key). Pearson on the 2x ranks: the doubling cancels in
# rho, so the formula uses the scaled sums directly. DECIMAL(38)
# everywhere a square or product of ranks appears.
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH scored AS (
  SELECT floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS s1,
         floor(CAST(embedding[2] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS s2
  FROM embeddings
),
g1 AS (
  SELECT s1, CAST(count(*) AS BIGINT) AS c,
         CAST(2 * (sum(count(*)) OVER (ORDER BY s1
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - count(*)) + count(*) + 1 AS BIGINT) AS ar2
  FROM scored GROUP BY s1
),
g2 AS (
  SELECT s2, CAST(count(*) AS BIGINT) AS c,
         CAST(2 * (sum(count(*)) OVER (ORDER BY s2
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - count(*)) + count(*) + 1 AS BIGINT) AS ar2
  FROM scored GROUP BY s2
),
ranked AS (
  SELECT g1.ar2 AS a, g2.ar2 AS b
  FROM scored s JOIN g1 ON g1.s1 = s.s1 JOIN g2 ON g2.s2 = s.s2
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(a AS HUGEINT)) AS sa,
         sum(CAST(b AS HUGEINT)) AS sb,
         sum(CAST(a AS HUGEINT) * b) AS sab,
         sum(CAST(a AS HUGEINT) * a) AS saa,
         sum(CAST(b AS HUGEINT) * b) AS sbb
  FROM ranked
)
SELECT n,
       floor(
         (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
          - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
         / nullif(sqrt(
             (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 0)
         * 1e6 + 0.5) / 1e6 AS rho_s
FROM sums
"""


@register("stat_spearman_corr", oracle=_SPEARMAN_ORACLE)
def stat_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation of the first two
    embedding components, exact 2x-scaled integer rank algebra."""
    from ..operators.ranking import distributed_prefix_sum

    scored = load(spark, sf_dir, "embeddings").select(
        _snap6(F.element_at("embedding", 1).cast("double")).alias("s1"),
        _snap6(F.element_at("embedding", 2).cast("double")).alias("s2"),
    ).localCheckpoint(eager=True)  # feeds both rank legs + the join

    def rank_leg(col: str) -> DataFrame:
        grp = scored.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("c"))
        cum = distributed_prefix_sum(grp, [col], "c", cum_col="cum_incl")
        return cum.select(
            col,
            (2 * (F.col("cum_incl") - F.col("c")) + F.col("c") + 1)
            .cast("long").alias(f"ar2_{col}"),
        )

    ranked = (
        scored.join(rank_leg("s1"), "s1").join(rank_leg("s2"), "s2")
        .select(F.col("ar2_s1").alias("a"), F.col("ar2_s2").alias("b"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("a"))).alias("sa"),
        F.sum(dec(F.col("b"))).alias("sb"),
        F.sum(dec(F.col("a")) * F.col("b")).alias("sab"),
        F.sum(dec(F.col("a")) * F.col("a")).alias("saa"),
        F.sum(dec(F.col("b")) * F.col("b")).alias("sbb"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sab").cast("double") \
        - F.col("sa").cast("double") * F.col("sb").cast("double")
    den = F.sqrt(
        (n * F.col("saa").cast("double")
         - F.col("sa").cast("double") * F.col("sa").cast("double"))
        * (n * F.col("sbb").cast("double")
           - F.col("sb").cast("double") * F.col("sb").cast("double")))
    return sums.select(
        "n", _snap6(num / F.nullif(den, F.lit(0.0))).alias("rho_s"))


# ---------------------------------------------------------------------------
# Rolling slope. x = day number, y = daily count -- both exact ints;
# the five frame sums are exact, the slope divides once and snaps.
# Frames are ROWS-based over OBSERVED days (gaps simply stretch x),
# deterministic because (event_type, day) rows are unique.
# ---------------------------------------------------------------------------

_SLOPE_ORACLE = f"""
WITH counts AS (
  SELECT event_type,
         CAST(CAST(epoch_us(ts) AS BIGINT) // {_US_PER_DAY} AS BIGINT)
           AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
framed AS (
  SELECT event_type, day, y,
         CAST(count(*) OVER w AS BIGINT) AS n,
         CAST(sum(day) OVER w AS BIGINT) AS sx,
         CAST(sum(y) OVER w AS BIGINT) AS sy,
         CAST(sum(day * y) OVER w AS BIGINT) AS sxy,
         CAST(sum(day * day) OVER w AS BIGINT) AS sxx
  FROM counts
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, y, n,
       floor(
         CAST(n * sxy - sx * sy AS DOUBLE)
         / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0)
         * 1e6 + 0.5) / 1e6 AS slope_s
FROM framed
ORDER BY event_type, day
"""


@register("window_rolling_slope", oracle=_SLOPE_ORACLE)
def window_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-observation OLS slope of daily counts per event
    type, exact integer frame sums."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    framed = counts.select(
        "event_type", "day", "y",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("day").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("day") * F.col("y")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("day") * F.col("day")).over(w).cast("long")
        .alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        .cast("double")
    return (
        framed.select(
            "event_type", "day", "y", "n",
            _snap6(num / F.nullif(den, F.lit(0.0))).alias("slope_s"),
        )
        .orderBy("event_type", "day")
    )
