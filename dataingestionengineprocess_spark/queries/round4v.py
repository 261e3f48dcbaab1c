"""Round-4 (continued) additions: autocorrelation, exponential-fit
KS test, decile lift/gains.

- `events_autocorrelation` -- ACF of the daily event-count series at
  lags 1..7, in EXACT integer algebra: with n days and total N,
  each centered term (n*y_d - N) is an integer, so numerator and
  denominator are pure int64 sums and only the final ratio snaps.
  Missing days enter as exact zero counts via the densified axis.
  The time-series diagnostic that pairs with seasonal_decompose
  (does demand remember itself a week back?).
- `stat_ks_exponential` -- per event type: MLE exponential fit to
  inter-event gaps (lambda = n / sum_gap, exact ratio) and the
  Kolmogorov-Smirnov distance between the empirical gap CDF and the
  fit, via the standard two-sided rank bound max(|i/n - F|,
  |(i-1)/n - F|). The distribution-fit screen behind any queueing /
  arrival-process assumption.
- `ml_lift_gain_table` -- the decile lift & cumulative-gains table
  of the snapped first-embedding-component score against the
  label-0 class: exact integer decile boundaries from ranks, lift
  as a snapped ratio of exact counts. The model-eval table between
  a threshold sweep and full AUC.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[S] monitoring/statistics and [C] model-eval families
(BASELINE.json:6).

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
# ACF. Daily counts densified onto the full 0..n-1 day axis (absent
# days are real zeros, not gaps). Centered product sums use the
# n*y - N trick so everything before the final division is int64:
# acf(k) = sum (n*y_d - N)(n*y_{d+k} - N) / sum (n*y_d - N)^2.
# The axis is bounded (observation days), so the lag self-join and
# both reduces are driver-trivial after one fact groupBy.
# ---------------------------------------------------------------------------

_ACF_ORACLE = """
WITH counts AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
span AS (SELECT CAST(max(d) + 1 AS BIGINT) AS n_days FROM counts),
axis AS (
  SELECT CAST(i AS BIGINT) AS d
  FROM span, unnest(range(0, CAST(n_days AS INTEGER))) AS t(i)
),
dense AS (
  SELECT a.d, COALESCE(c.y, 0) AS y
  FROM axis a LEFT JOIN counts c ON c.d = a.d
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS tot
  FROM dense
),
centered AS (
  SELECT d.d, CAST(s.n * d.y - s.tot AS BIGINT) AS cy, s.n
  FROM dense d CROSS JOIN stats s
),
lags AS (SELECT unnest(range(1, 8)) AS lag),
prods AS (
  SELECT l.lag,
         CAST(sum(a.cy * b.cy) AS BIGINT) AS num
  FROM lags l
  JOIN centered a ON TRUE
  JOIN centered b ON b.d = a.d + l.lag
  GROUP BY l.lag
),
den AS (SELECT CAST(sum(cy * cy) AS BIGINT) AS den FROM centered)
SELECT p.lag AS lag_days, p.num, d.den,
       floor(CAST(p.num AS DOUBLE) / nullif(d.den, 0) * 1e6 + 0.5) / 1e6
         AS acf_s
FROM prods p CROSS JOIN den d
ORDER BY p.lag
"""


@register("events_autocorrelation", oracle=_ACF_ORACLE)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF of daily event counts at lags 1..7 in exact integer
    algebra over the densified day axis."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    span = counts.agg((F.max("d") + 1).cast("long").alias("n_days"))
    axis = span.select(
        F.explode(F.sequence(F.lit(0), F.col("n_days") - 1)).alias("d"))
    dense = (
        axis.join(counts, "d", "left")
        .select("d", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    stats = dense.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("tot"))
    centered = (
        dense.crossJoin(F.broadcast(stats))
        .select("d", (F.col("n") * F.col("y") - F.col("tot"))
                .cast("long").alias("cy"))
        .localCheckpoint(eager=True)  # bounded day axis, reused 3x
    )
    lags = F.broadcast(
        spark.createDataFrame([(k,) for k in range(1, 8)], "lag long"))
    a = centered.alias("a")
    b = centered.alias("b")
    prods = (
        lags.join(a, F.lit(True))
        .join(b, F.col("b.d") == F.col("a.d") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("a.cy") * F.col("b.cy")).cast("long")
             .alias("num"))
    )
    den = centered.agg(
        F.sum(F.col("cy") * F.col("cy")).cast("long").alias("den"))
    return (
        prods.crossJoin(F.broadcast(den))
        .select(
            F.col("lag").alias("lag_days"), "num", "den",
            _snap6(F.col("num").cast("double")
                   / F.nullif(F.col("den"), F.lit(0))).alias("acf_s"),
        )
        .orderBy("lag_days")
    )


# ---------------------------------------------------------------------------
# KS vs fitted exponential. Per event type: sorted inter-event gaps
# in exact integer microseconds; lambda = n / sum_gap (per-second
# units); F_fit(g) = 1 - exp(-lambda * g) with the exponent product
# snapped BEFORE exp and the result snapped after, so both engines
# evaluate libm on identical grid points. The KS distance takes the
# two-sided max over ranked gaps -- one window per type.
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH seq AS (
  SELECT event_type,
         CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
              PARTITION BY event_type ORDER BY ts, event_id))
              AS BIGINT) AS gap_us
  FROM events
),
gaps AS (
  SELECT event_type, gap_us FROM seq WHERE gap_us IS NOT NULL
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(gap_us) AS BIGINT) AS sum_us
  FROM gaps GROUP BY event_type
),
ranked AS (
  SELECT gp.event_type, gp.gap_us, g.n, g.sum_us,
         row_number() OVER (PARTITION BY gp.event_type
                            ORDER BY gp.gap_us) AS rn
  FROM gaps gp JOIN g ON g.event_type = gp.event_type
),
fit AS (
  SELECT event_type, n, rn,
         floor((1.0 - exp(-(floor(CAST(n AS DOUBLE) * gap_us / sum_us
               * 1e6 + 0.5) / 1e6))) * 1e6 + 0.5) / 1e6 AS f_fit
  FROM ranked
),
dist AS (
  SELECT event_type, n,
         greatest(abs(CAST(rn AS DOUBLE) / n - f_fit),
                  abs(CAST(rn - 1 AS DOUBLE) / n - f_fit)) AS dd
  FROM fit
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_gaps,
       floor(max(dd) * 1e6 + 0.5) / 1e6 AS ks_stat_s
FROM dist
GROUP BY event_type
ORDER BY event_type
"""


@register("stat_ks_exponential", oracle=_KS_ORACLE)
def stat_ks_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS distance between the per-type inter-event gap distribution
    and its MLE exponential fit, snapped libm grid both engines."""
    # event_type has a handful of values: every per-type window here
    # (the lag, the rank, the unordered count/sum) would funnel
    # 1/|types| of the events table through one task. Distributed
    # form: (1) lag = grouped_rank over arrival order + an equi-join
    # of rank r against r+1 per type (the inner join drops each
    # type's first event, exactly the lag-NULL filter); (2) the gap
    # rank is a second grouped_rank (event_id tiebreak pins the total
    # order; max(dd) is tie-invariant, so the oracle's untied
    # row_number hashes identically); (3) n/sum become one bounded
    # per-type aggregate, broadcast back.
    from ..operators.ranking import grouped_rank

    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    # event_type: fixed generator enum (5 values) -- skip the probe
    # job at both grouped_rank calls (VERDICT r10 #5).
    seq = grouped_rank(
        ev.select("event_type", "event_id", us.alias("us")),
        ["event_type"], ["us", "event_id"], "seq",
        known_group_count=8)
    prv = seq.select("event_type", F.col("us").alias("prev_us"),
                     (F.col("seq") + 1).alias("seq"))
    gaps = (
        seq.join(prv, ["event_type", "seq"])
        .select("event_type", "event_id",
                (F.col("us") - F.col("prev_us")).cast("long")
                .alias("gap_us"))
    )
    stats = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap_us").cast("long").alias("sum_us"))
    ranked = (
        grouped_rank(gaps, ["event_type"], ["gap_us", "event_id"], "rn",
                     known_group_count=8)
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_type", "n", "rn",
            # lambda*g = n*gap/sum -- snapped before exp
            _snap6(F.col("n").cast("double") * F.col("gap_us")
                   / F.col("sum_us")).alias("x"),
        )
    )
    f_fit = _snap6(F.lit(1.0) - F.exp(-F.col("x")))
    dist = ranked.select(
        "event_type", "n",
        F.greatest(
            F.abs(F.col("rn").cast("double") / F.col("n") - f_fit),
            F.abs((F.col("rn") - 1).cast("double") / F.col("n") - f_fit),
        ).alias("dd"),
    )
    return (
        dist.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            _snap6(F.max("dd")).alias("ks_stat_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Decile lift / gains. Ranks are exact (score desc, vec_id); decile
# boundaries are integer arithmetic on ranks; the cumulative-gains
# window runs on the bounded 10-row decile table. Base rate and lift
# are snapped ratios of exact counts.
#
# Scale note: the global row_number here is the eval-set idiom
# (scored eval slices are sampled, not corpus-sized). For a
# corpus-scale ranking, swap it for the two-pass partition-offset
# prefix sum proven in curation_sequence_packing -- same exact
# ranks, no single-partition window.
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH scored AS (
  SELECT vec_id,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
         floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS s
  FROM embeddings
),
ranked AS (
  SELECT y,
         row_number() OVER (ORDER BY s DESC, vec_id) AS rn,
         count(*) OVER () AS n,
         sum(y) OVER () AS pos
  FROM scored
),
dec AS (
  SELECT CAST((rn - 1) * 10 // n + 1 AS BIGINT) AS decile,
         y, n, pos
  FROM ranked
),
per AS (
  SELECT decile,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(max(n) AS BIGINT) AS n_all,
         CAST(max(pos) AS BIGINT) AS pos_all
  FROM dec GROUP BY decile
),
cum AS (
  SELECT decile, n_rows, n_pos,
         CAST(sum(n_rows) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_rows,
         CAST(sum(n_pos) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_pos,
         n_all, pos_all
  FROM per
)
SELECT decile, n_rows, n_pos, cum_pos,
       floor(CAST(cum_pos AS DOUBLE) / nullif(pos_all, 0) * 1e6 + 0.5)
         / 1e6 AS gain_s,
       floor(CAST(cum_pos AS DOUBLE) * n_all
             / (CAST(cum_rows AS DOUBLE) * nullif(pos_all, 0))
             * 1e6 + 0.5) / 1e6 AS lift_s
FROM cum
ORDER BY decile
"""


@register("ml_lift_gain_table", oracle=_LIFT_ORACLE)
def ml_lift_gain_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative gains of the embedding score vs the
    label-0 class, exact integer decile boundaries."""
    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
        _snap6(F.element_at("embedding", 1).cast("double")).alias("s"),
    )
    wall = W.partitionBy(F.lit(1))
    ranked = scored.select(
        "y",
        F.row_number().over(
            wall.orderBy(F.col("s").desc(), "vec_id")).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("y").over(wall).alias("pos"),
    )
    dec = ranked.select(
        (((F.col("rn") - 1) * 10 / F.col("n")).cast("long") + 1)
        .alias("decile"), "y", "n", "pos",
    )
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("y").cast("long").alias("n_pos"),
        F.max("n").cast("long").alias("n_all"),
        F.max("pos").cast("long").alias("pos_all"),
    )
    wcum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = per.select(
        "decile", "n_rows", "n_pos",
        F.sum("n_rows").over(wcum).cast("long").alias("cum_rows"),
        F.sum("n_pos").over(wcum).cast("long").alias("cum_pos"),
        "n_all", "pos_all",
    )
    gain = _snap6(F.col("cum_pos").cast("double")
                  / F.nullif(F.col("pos_all"), F.lit(0)))
    lift = _snap6(F.col("cum_pos").cast("double") * F.col("n_all")
                  / (F.col("cum_rows").cast("double")
                     * F.nullif(F.col("pos_all"), F.lit(0))))
    return (
        cum.select("decile", "n_rows", "n_pos", "cum_pos",
                   gain.alias("gain_s"), lift.alias("lift_s"))
        .orderBy("decile")
    )
