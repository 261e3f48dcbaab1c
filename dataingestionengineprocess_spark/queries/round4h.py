"""Round-4 (continued) additions: lifecycle / concentration /
distinctiveness analytics -- the survival, affinity, inequality,
vocabulary, and seasonality reads a data platform runs over its event
and document tables. All under the hash-checked gate.

- `events_kaplan_meier` -- Kaplan-Meier survival of user engagement
  lifetimes (days between first and last event), with users still
  active on the final observed day treated as right-censored: the
  product-limit estimator from exact at-risk/death counts.
- `basket_brand_lift` -- market-basket association over order
  baskets at the brand level: support / confidence / lift for brand
  pairs from exact order counts (the cross-sell affinity read).
- `sales_gini_by_region` -- Gini coefficient of customer revenue
  concentration per region via the exact rank formula over integer
  cents (how unequal is the customer base?).
- `text_distinctive_terms` -- per-source distinctive vocabulary by
  Monroe-style Dirichlet-smoothed log-odds z-scores over the global
  top-200 tokens (which words mark a source vs the rest?).
- `events_seasonal_decompose` -- additive seasonal decomposition of
  the daily event count: day-of-week seasonal index, centered 7-day
  moving-average trend, residual.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[C]/[S] analytics families (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import window as W

from ..catalog import load
from ..functions.text import tokens
from ..operators.skew import spread_input
from . import register
from ..functions.exact import snap6 as _snap6, q6 as _q6


_EPOCH = "2024-01-01"  # day-number origin; only relative math uses it


# ---------------------------------------------------------------------------
# Kaplan-Meier survival of engagement lifetimes. Per user: duration =
# last event day - first event day; a user whose last day IS the
# final observed day is right-censored (their true lifetime is only
# known to exceed the window). The product-limit curve multiplies
# (1 - d_t / n_t) over event times; the product rides the established
# quantized-ln route (per-step ln snapped to int64, cumulative sum
# over the bounded duration table, exp snapped at the end), with a
# running d = n flag pinning survival to exactly 0 past a step that
# kills everyone (ln(0) never evaluated).
#
# Scale: one per-user groupBy (map-side combinable) collapses the
# corpus; everything after runs on the <= max-duration-days table.
# ---------------------------------------------------------------------------

_KM_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         min(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))) AS fd,
         max(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))) AS ld
  FROM events GROUP BY user_id
),
mx AS (SELECT max(ld) AS max_day FROM u),
durs AS (
  SELECT CAST(ld - fd AS BIGINT) AS dur,
         CAST(sum(CASE WHEN ld < max_day THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN ld = max_day THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM u, mx GROUP BY 1
),
risk AS (
  SELECT dur, d, c,
         CAST(sum(d + c) OVER (ORDER BY dur DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_risk
  FROM durs
),
steps AS (
  SELECT dur, n_risk, d, c,
         CASE WHEN d < n_risk THEN CAST(floor(
             ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1e6 + 0.5) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS ln_q,
         CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS kill
  FROM risk
)
SELECT dur, n_risk, d, c,
       CAST(sum(ln_q) OVER w AS DOUBLE) / 1e6 AS logs_s,
       CASE WHEN max(kill) OVER w = 1 THEN 0.0
            ELSE floor(exp(CAST(sum(ln_q) OVER w AS DOUBLE) / 1e6)
                       * 1e6 + 0.5) / 1e6 END AS surv_s
FROM steps
WINDOW w AS (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY dur
"""


@register("events_kaplan_meier", oracle=_KM_ORACLE)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-limit survival curve of user engagement durations with
    final-day right-censoring, via the quantized-ln product."""
    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(_EPOCH)))
    # one corpus scan: the per-user table feeds both the max-day agg
    # and the duration rollup
    u = (ev.groupBy("user_id")
         .agg(F.min(day).alias("fd"), F.max(day).alias("ld"))
         .localCheckpoint(eager=True))
    mx = u.agg(F.max("ld").alias("max_day"))
    durs = (
        u.crossJoin(F.broadcast(mx))
        .groupBy((F.col("ld") - F.col("fd")).cast("long").alias("dur"))
        .agg(
            F.sum(F.when(F.col("ld") < F.col("max_day"), 1).otherwise(0))
            .cast("long").alias("d"),
            F.sum(F.when(F.col("ld") == F.col("max_day"), 1).otherwise(0))
            .cast("long").alias("c"),
        )
    )
    # bounded table (<= observation-window days): single-partition
    # windows here are over model state, not the corpus
    w_desc = W.Window.orderBy(F.col("dur").desc()).rowsBetween(
        W.Window.unboundedPreceding, W.Window.currentRow)
    w_asc = W.Window.orderBy("dur").rowsBetween(
        W.Window.unboundedPreceding, W.Window.currentRow)
    risk = durs.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(w_desc).cast("long"))
    steps = risk.select(
        "dur", "n_risk", "d", "c",
        F.when(F.col("d") < F.col("n_risk"),
               _q6(F.log(F.lit(1.0) - F.col("d").cast("double")
                         / F.col("n_risk"))))
        .otherwise(F.lit(0).cast("long")).alias("ln_q"),
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0).alias("kill"),
    )
    logs = F.sum("ln_q").over(w_asc).cast("double") / 1e6
    return (
        steps.select(
            "dur", "n_risk", "d", "c",
            logs.alias("logs_s"),
            F.when(F.max("kill").over(w_asc) == 1, F.lit(0.0))
            .otherwise(_snap6(F.exp(logs))).alias("surv_s"),
        )
        .orderBy("dur")
    )


# ---------------------------------------------------------------------------
# Market-basket association at the brand level. Baskets are DISTINCT
# (order, brand) -- the part dim broadcasts onto lineitem -- and the
# pair fan-out is a self-equi-join on the order key, bounded by the
# per-order basket size, never a global cross join. Support /
# confidence / lift come from exact integer order counts; the
# min-support cut is a FRACTION (0.1% of orders) so the query is
# scale-invariant. Top 20 by lift with a deterministic tiebreak.
#
# Scale: pair counts groupBy is map-side combinable over <= |brands|^2
# keys; brand marginals broadcast back onto the pair table.
# ---------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n_ord AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
          FROM baskets),
brand_n AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_b FROM baskets
            GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, n_ab,
       floor(CAST(n_ab AS DOUBLE) / n_ord.n * 1e6 + 0.5) / 1e6
         AS support_s,
       floor(CAST(n_ab AS DOUBLE) / na.n_b * 1e6 + 0.5) / 1e6
         AS confidence_s,
       floor(CAST(n_ab AS DOUBLE) * n_ord.n / (na.n_b * nb.n_b)
             * 1e6 + 0.5) / 1e6 AS lift_s
FROM pairs
JOIN brand_n na ON na.p_brand = brand_a
JOIN brand_n nb ON nb.p_brand = brand_b, n_ord
WHERE n_ab * 1000 >= n_ord.n
ORDER BY lift_s DESC, brand_a, brand_b
LIMIT 20
"""


@register("basket_brand_lift", oracle=_BASKET_ORACLE)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-pair support/confidence/lift over order baskets, top 20
    by lift above a fractional min-support cut."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=True)  # pair self-join + marginals reuse
    )
    n_ord = baskets.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n"))
    brand_n = baskets.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.p_brand") < F.col("b.p_brand")))
        .groupBy(F.col("a.p_brand").alias("brand_a"),
                 F.col("b.p_brand").alias("brand_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    na = brand_n.select(F.col("p_brand").alias("brand_a"),
                        F.col("n_b").alias("n_a"))
    nb = brand_n.select(F.col("p_brand").alias("brand_b"),
                        F.col("n_b").alias("n_b2"))
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n_ord))
        .filter(F.col("n_ab") * 1000 >= F.col("n"))
        .select(
            "brand_a", "brand_b", "n_ab",
            _snap6(F.col("n_ab").cast("double") / F.col("n"))
            .alias("support_s"),
            _snap6(F.col("n_ab").cast("double") / F.col("n_a"))
            .alias("confidence_s"),
            _snap6(F.col("n_ab").cast("double") * F.col("n")
                   / (F.col("n_a") * F.col("n_b2"))).alias("lift_s"),
        )
        .orderBy(F.col("lift_s").desc(), "brand_a", "brand_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Gini concentration of customer revenue per region. Revenue rides
# exact integer cents; customers without orders count as zeros (the
# left join), since dropping them understates inequality. The exact
# rank formula G = 2*sum(i*x_i) / (n*sum(x)) - (n+1)/n needs one
# row_number window per region -- ties in x contribute identically
# under any consistent tiebreak, so the custkey tiebreak is for
# determinism only, not a semantic choice. The per-term product
# i * x_i fits int64, but the SUM is bounded by n * sum(x) -- ~1e21
# per region at SF100 -- so it accumulates in DECIMAL(38,0) (exact,
# matching DuckDB's automatic HUGEINT promotion) and converts to
# double only inside the final snapped division.
#
# Scale: one join + one window, both keyed by region after the
# per-customer pre-agg; no global sort.
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH rev AS (
  SELECT r.r_name AS region, c.c_custkey,
         CAST(COALESCE(sum(CAST(floor(o.o_totalprice * 100 + 0.5)
                                AS BIGINT)), 0) AS BIGINT) AS cents
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT region, cents,
         row_number() OVER (PARTITION BY region
                            ORDER BY cents, c_custkey) AS i
  FROM rev
)
SELECT region,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       floor((2.0 * CAST(sum(i * cents) AS DOUBLE)
                / (count(*) * CAST(sum(cents) AS DOUBLE))
              - (count(*) + 1.0) / count(*)) * 1e6 + 0.5) / 1e6 AS gini_s
FROM ranked
GROUP BY region
ORDER BY region
"""


@register("sales_gini_by_region", oracle=_GINI_ORACLE)
def sales_gini_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of per-customer revenue inside each
    region, zeros included, integer-cents rank formula."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    rev = (
        cust.join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region),
              F.col("n_regionkey") == region.r_regionkey)
        .join(orders.select("o_custkey", cents.alias("o_cents")),
              cust.c_custkey == F.col("o_custkey"), "left")
        .groupBy(F.col("r_name").alias("region"), "c_custkey")
        .agg(F.coalesce(F.sum("o_cents"), F.lit(0)).cast("long")
             .alias("cents"))
    )
    # region has 5 values: a per-region rank window would funnel a
    # fifth of the customer universe through one task. grouped_rank
    # rides the checkpointed global_rank layout instead.
    from ..operators.ranking import grouped_rank

    # region: constant-size TPC-H dim (5 rows) -- skip the probe job.
    ranked = grouped_rank(rev, ["region"], ["cents", "c_custkey"], "i",
                          known_group_count=8)
    return (
        ranked.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum("cents").cast("long").alias("total_cents"),
            _snap6(
                2.0 * F.sum((F.col("i") * F.col("cents"))
                            .cast("decimal(38,0)")).cast("double")
                / (F.count(F.lit(1)) * F.sum("cents").cast("double"))
                - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1))
            ).alias("gini_s"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# Per-source distinctive vocabulary: Monroe et al.'s Dirichlet-
# smoothed log-odds-ratio z-score of each token in a source vs the
# rest of the corpus, restricted to the global top-200 tokens (the
# same vocabulary bound the Zipf fit uses) so every downstream table
# is model-state-sized. delta and the variance are single expressions
# over exact counts with the ln snapped once at the end; top 3 per
# source by z with a deterministic token tiebreak.
#
# Scale: one exploded (source, token) groupBy; the top-200 cut and
# the per-source rank are vocab-level windows, never corpus-level.
# ---------------------------------------------------------------------------

_ALPHA = 0.01

_DISTINCT_ORACLE = f"""
WITH st AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
cnt AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS y_st FROM st
  WHERE tok <> '' GROUP BY 1, 2
),
vocab AS (
  SELECT tok, CAST(sum(y_st) AS BIGINT) AS y_t,
         row_number() OVER (ORDER BY sum(y_st) DESC, tok) AS rnk
  FROM cnt GROUP BY tok
),
top_v AS (SELECT tok, y_t FROM vocab WHERE rnk <= 200),
src_n AS (SELECT source, CAST(sum(y_st) AS BIGINT) AS n_s FROM cnt
          GROUP BY source),
tot AS (SELECT CAST(sum(y_t) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS v FROM vocab),
z AS (
  SELECT c.source, c.tok, c.y_st, tv.y_t,
         floor((ln((c.y_st + {_ALPHA})
                   / (sn.n_s + {_ALPHA} * tot.v - c.y_st - {_ALPHA}))
                - ln((tv.y_t - c.y_st + {_ALPHA})
                     / (tot.n - sn.n_s + {_ALPHA} * tot.v
                        - (tv.y_t - c.y_st) - {_ALPHA})))
               / sqrt(1.0 / (c.y_st + {_ALPHA})
                      + 1.0 / (tv.y_t - c.y_st + {_ALPHA}))
               * 1e6 + 0.5) / 1e6 AS z_s
  FROM cnt c JOIN top_v tv ON c.tok = tv.tok
  JOIN src_n sn ON sn.source = c.source, tot
)
SELECT source, tok, y_st, y_t, z_s FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY z_s DESC, tok) AS r
  FROM z
) WHERE r <= 3
ORDER BY source, z_s DESC, tok
"""


@register("text_distinctive_terms", oracle=_DISTINCT_ORACLE)
def text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 source-distinctive tokens by Dirichlet-smoothed log-odds
    z-score over the global top-200 vocabulary."""
    docs = load(spark, sf_dir, "documents")
    cnt = (
        spread_input(docs)
        .select("source", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("y_st"))
        .localCheckpoint(eager=True)  # vocab cut + marginals + z reuse
    )
    vocab = cnt.groupBy("tok").agg(F.sum("y_st").cast("long").alias("y_t"))
    wv = W.Window.orderBy(F.col("y_t").desc(), "tok")
    top_v = (vocab.withColumn("rnk", F.row_number().over(wv))
             .filter(F.col("rnk") <= 200).drop("rnk"))
    src_n = cnt.groupBy("source").agg(
        F.sum("y_st").cast("long").alias("n_s"))
    tot = vocab.agg(F.sum("y_t").cast("long").alias("n"),
                    F.count(F.lit(1)).cast("long").alias("v"))
    a = F.lit(_ALPHA)
    y_st = F.col("y_st").cast("double")
    y_rest = F.col("y_t") - F.col("y_st")
    delta = (
        F.log((y_st + a) / (F.col("n_s") + a * F.col("v") - y_st - a))
        - F.log((y_rest + a)
                / (F.col("n") - F.col("n_s") + a * F.col("v")
                   - y_rest - a))
    )
    var = 1.0 / (y_st + a) + 1.0 / (y_rest + a)
    z = (
        cnt.join(F.broadcast(top_v), "tok")
        .join(F.broadcast(src_n), "source")
        .crossJoin(F.broadcast(tot))
        .select("source", "tok", "y_st", "y_t",
                _snap6(delta / F.sqrt(var)).alias("z_s"))
    )
    wr = W.Window.partitionBy("source").orderBy(F.col("z_s").desc(), "tok")
    return (
        z.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") <= 3)
        .drop("r")
        .orderBy("source", F.col("z_s").desc(), "tok")
    )


# ---------------------------------------------------------------------------
# Additive seasonal decomposition of the daily event count. The
# day-of-week index is day_number % 7 (calendar-locale-free in both
# engines); seasonal = dow mean - grand mean, trend = centered 7-day
# moving average (NULL at the edges where the window is partial),
# residual = n - seasonal - trend. Every mean is one snapped division
# of exact integer sums.
#
# Scale: one corpus groupBy to days; the decomposition runs on the
# bounded daily table.
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS day_num,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
m AS (SELECT floor(CAST(sum(n) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
             AS grand FROM daily),
dow_m AS (
  SELECT day_num % 7 AS dow,
         floor(CAST(sum(n) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
           AS dow_mean
  FROM daily GROUP BY 1
),
trend AS (
  SELECT day_num,
         CASE WHEN count(*) OVER w = 7 THEN
           floor(CAST(sum(n) OVER w AS DOUBLE) / 7 * 1e6 + 0.5) / 1e6
         END AS trend_s
  FROM daily
  WINDOW w AS (ORDER BY day_num ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT d.day_num, d.day_num % 7 AS dow, d.n,
       floor((dm.dow_mean - m.grand) * 1e6 + 0.5) / 1e6 AS seasonal_s,
       t.trend_s,
       CASE WHEN t.trend_s IS NOT NULL THEN
         floor((d.n - (dm.dow_mean - m.grand) - t.trend_s) * 1e6 + 0.5)
           / 1e6 END AS resid_s
FROM daily d
JOIN dow_m dm ON dm.dow = d.day_num % 7
JOIN trend t ON t.day_num = d.day_num, m
ORDER BY d.day_num
"""


@register("events_seasonal_decompose", oracle=_SEASONAL_ORACLE)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index + centered 7-day trend + residual
    for the daily event count."""
    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(_EPOCH)))
    daily = (
        ev.groupBy(day.alias("day_num"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)  # grand/dow/trend all reuse it
    )
    grand = daily.agg(
        _snap6(F.sum("n").cast("double") / F.count(F.lit(1)))
        .alias("grand"))
    dow_m = (
        daily.groupBy((F.col("day_num") % 7).alias("dow"))
        .agg(_snap6(F.sum("n").cast("double") / F.count(F.lit(1)))
             .alias("dow_mean"))
    )
    wt = W.Window.orderBy("day_num").rowsBetween(-3, 3)
    trend = daily.select(
        "day_num",
        F.when(F.count(F.lit(1)).over(wt) == 7,
               _snap6(F.sum("n").over(wt).cast("double") / 7))
        .alias("trend_s"),
    )
    seasonal = _snap6(F.col("dow_mean") - F.col("grand"))
    return (
        daily.withColumn("dow", F.col("day_num") % 7)
        .join(F.broadcast(dow_m), "dow")
        .join(F.broadcast(trend), "day_num")
        .crossJoin(F.broadcast(grand))
        .select(
            "day_num", "dow", "n",
            seasonal.alias("seasonal_s"),
            "trend_s",
            F.when(F.col("trend_s").isNotNull(),
                   _snap6(F.col("n") - seasonal - F.col("trend_s")))
            .alias("resid_s"),
        )
        .orderBy("day_num")
    )
