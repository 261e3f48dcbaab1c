"""Round-4 (continued) additions: experimentation / monitoring /
model-evaluation continuations -- the A/B readout, the drift alarm,
and the two curve metrics a platform runs beside ROC-AUC. All under
the hash-checked gate.

- `events_ab_test_analysis` -- deterministic md5 variant assignment
  per user, purchase-conversion rates per arm with Wilson 95%
  intervals, pooled two-proportion z statistic, and relative uplift:
  the experiment readout as one exact-count query.
- `events_cusum_changepoint` -- CUSUM level-shift detection over the
  daily event count: exact integer cumulative deviations from the
  mean, standardized peak statistic, earliest-argmax changepoint
  flag.
- `ml_auprc_exact` -- exact area under the precision-recall curve
  (average precision, step interpolation) via the same grouped
  distinct-score machinery as `ml_auc_exact` -- the imbalanced-label
  companion metric.
- `ml_expected_calibration_error` -- 10-bin reliability table
  (confidence vs accuracy per bin) + ECE for a logistic score of
  document length predicting the 'en' label: the calibration gate
  for any score used as a probability.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[C] model-prep/quality families (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import md5_bucket
from . import register
from ..functions.exact import snap6 as _snap6, q6 as _q6


# ---------------------------------------------------------------------------
# A/B test readout. The variant is the md5 coin on the user id (the
# same engine-portable bucket arithmetic the split/mix queries use),
# conversion = "first purchase within 2 days of the user's first
# activity" (a plain any-purchase flag saturates on a dense event
# fixture and degenerates pp to 1). Wilson intervals
# (which stay inside [0, 1] at small n, unlike Wald) and the pooled
# two-proportion z ride exact integer counts with one snapped
# division each; z_crit = 1.96 is a shared literal.
#
# Scale: one per-user agg (map-side combinable) then a 2-row arm
# table; every statistic is arm-table arithmetic.
# ---------------------------------------------------------------------------

_ZC = 1.96

_AB_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
                                  1, 6) AS BIGINT) % 2 AS BIGINT) AS arm,
         CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END)
                   IS NOT NULL
              AND date_diff('day', CAST(min(ts) AS DATE),
                    CAST(min(CASE WHEN event_type = 'purchase' THEN ts
                             END) AS DATE)) <= 2
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(conv) AS BIGINT) AS c
  FROM u GROUP BY arm
),
wide AS (
  SELECT
    max(CASE WHEN arm = 0 THEN n END) AS n0,
    max(CASE WHEN arm = 0 THEN c END) AS c0,
    max(CASE WHEN arm = 1 THEN n END) AS n1,
    max(CASE WHEN arm = 1 THEN c END) AS c1
  FROM arms
),
rates AS (
  SELECT n0, c0, n1, c1,
         CAST(c0 AS DOUBLE) / n0 AS p0, CAST(c1 AS DOUBLE) / n1 AS p1,
         CAST(c0 + c1 AS DOUBLE) / (n0 + n1) AS pp
  FROM wide
)
SELECT n0, c0, floor(p0 * 1e6 + 0.5) / 1e6 AS rate0_s,
       n1, c1, floor(p1 * 1e6 + 0.5) / 1e6 AS rate1_s,
       floor((p0 + {_ZC} * {_ZC} / (2 * n0)
              - {_ZC} * sqrt(p0 * (1 - p0) / n0
                             + {_ZC} * {_ZC} / (4.0 * n0 * n0)))
             / (1 + {_ZC} * {_ZC} / n0) * 1e6 + 0.5) / 1e6 AS lo0_s,
       floor((p0 + {_ZC} * {_ZC} / (2 * n0)
              + {_ZC} * sqrt(p0 * (1 - p0) / n0
                             + {_ZC} * {_ZC} / (4.0 * n0 * n0)))
             / (1 + {_ZC} * {_ZC} / n0) * 1e6 + 0.5) / 1e6 AS hi0_s,
       floor((p1 + {_ZC} * {_ZC} / (2 * n1)
              - {_ZC} * sqrt(p1 * (1 - p1) / n1
                             + {_ZC} * {_ZC} / (4.0 * n1 * n1)))
             / (1 + {_ZC} * {_ZC} / n1) * 1e6 + 0.5) / 1e6 AS lo1_s,
       floor((p1 + {_ZC} * {_ZC} / (2 * n1)
              + {_ZC} * sqrt(p1 * (1 - p1) / n1
                             + {_ZC} * {_ZC} / (4.0 * n1 * n1)))
             / (1 + {_ZC} * {_ZC} / n1) * 1e6 + 0.5) / 1e6 AS hi1_s,
       floor((p1 - p0) / nullif(p0, 0) * 1e6 + 0.5) / 1e6 AS uplift_s,
       floor((p1 - p0)
             / nullif(sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1)), 0)
             * 1e6 + 0.5) / 1e6 AS z_s
FROM rates
"""


@register("events_ab_test_analysis", oracle=_AB_ORACLE)
def events_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm conversion readout: md5-assigned variants, Wilson 95%
    intervals, pooled two-proportion z, relative uplift."""
    ev = load(spark, sf_dir, "events")
    fp = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    u = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), fp.alias("first_purchase"))
        .select(
            md5_bucket(F.concat(F.col("user_id").cast("string"),
                                F.lit(":ab")), 2).alias("arm"),
            F.when(
                F.col("first_purchase").isNotNull()
                & (F.datediff(F.to_date("first_purchase"),
                              F.to_date("first_ts")) <= 2),
                1).otherwise(0).alias("conv"),
        )
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("c"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("c"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0")
                                                       + F.col("n1"))
    zc = F.lit(_ZC)

    def wilson(p, n, sign):
        half = zc * zc / (2 * n)
        rad = zc * F.sqrt(p * (1 - p) / n + zc * zc / (4.0 * n * n))
        return _snap6((p + half + sign * rad) / (1 + zc * zc / n))

    n0, n1 = F.col("n0"), F.col("n1")
    return wide.select(
        "n0", "c0", _snap6(p0).alias("rate0_s"),
        "n1", "c1", _snap6(p1).alias("rate1_s"),
        wilson(p0, n0, -1).alias("lo0_s"),
        wilson(p0, n0, 1).alias("hi0_s"),
        wilson(p1, n1, -1).alias("lo1_s"),
        wilson(p1, n1, 1).alias("hi1_s"),
        _snap6((p1 - p0) / F.nullif(p0, F.lit(0.0))).alias("uplift_s"),
        _snap6((p1 - p0)
               / F.nullif(F.sqrt(pp * (1 - pp)
                                 * (1.0 / n0 + 1.0 / n1)), F.lit(0.0)))
        .alias("z_s"),
    )


# ---------------------------------------------------------------------------
# CUSUM level-shift detection over daily counts. Deviations from the
# mean stay EXACT integers in 1e-6 units (x*1e6 - mean_q), so the
# cumulative sum is order-safe int64 arithmetic; only the final
# standardization divides by the snapped population std. The
# changepoint is the earliest day attaining the max |CUSUM| (a
# deterministic argmax via a rank window over the bounded daily
# table).
#
# Scale: one corpus groupBy to days; everything after is bounded.
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(floor(CAST(sum(n) AS DOUBLE) / count(*) * 1e6 + 0.5)
              AS BIGINT) AS mean_q,
         floor(sqrt((sum(CAST(n AS DOUBLE) * n)
                     - CAST(sum(n) AS DOUBLE) * sum(n) / count(*))
                    / count(*)) * 1e6 + 0.5) / 1e6 AS std_s,
         CAST(count(*) AS BIGINT) AS days
  FROM daily
),
cus AS (
  SELECT day_num, n,
         CAST(sum(n * 1000000 - mean_q) OVER (
           ORDER BY day_num
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cusum_q
  FROM daily, m
)
SELECT day_num, n,
       CAST(cusum_q AS DOUBLE) / 1e6 AS cusum_s,
       floor(abs(CAST(cusum_q AS DOUBLE) / 1e6)
             / nullif(m.std_s * sqrt(CAST(m.days AS DOUBLE)), 0)
             * 1e6 + 0.5) / 1e6 AS stat_s,
       CASE WHEN row_number() OVER (ORDER BY abs(cusum_q) DESC, day_num)
                 = 1 THEN 1 ELSE 0 END AS is_changepoint
FROM cus, m
ORDER BY day_num
"""


@register("events_cusum_changepoint", oracle=_CUSUM_ORACLE)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count CUSUM curve with standardized statistic and the
    earliest-argmax changepoint flag."""
    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
    daily = (
        ev.groupBy(day.alias("day_num"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)  # mean/std + cusum reuse
    )
    m = daily.agg(
        F.floor(F.sum("n").cast("double") / F.count(F.lit(1)) * 1e6
                + F.lit(0.5)).cast("long").alias("mean_q"),
        _snap6(F.sqrt(
            (F.sum(F.col("n").cast("double") * F.col("n"))
             - F.sum("n").cast("double") * F.sum("n") / F.count(F.lit(1)))
            / F.count(F.lit(1)))).alias("std_s"),
        F.count(F.lit(1)).cast("long").alias("days"),
    )
    w_cum = W.orderBy("day_num").rowsBetween(W.unboundedPreceding,
                                             W.currentRow)
    cus = (
        daily.crossJoin(F.broadcast(m))
        .withColumn(
            "cusum_q",
            F.sum(F.col("n") * 1000000 - F.col("mean_q")).over(w_cum)
            .cast("long"),
        )
    )
    w_rank = W.orderBy(F.abs(F.col("cusum_q")).desc(), "day_num")
    return (
        cus.select(
            "day_num", "n",
            (F.col("cusum_q").cast("double") / 1e6).alias("cusum_s"),
            _snap6(F.abs(F.col("cusum_q").cast("double") / 1e6)
                   / F.nullif(F.col("std_s")
                              * F.sqrt(F.col("days").cast("double")),
                              F.lit(0.0)))
            .alias("stat_s"),
            F.when(F.row_number().over(w_rank) == 1, 1).otherwise(0)
            .alias("is_changepoint"),
        )
        .orderBy("day_num")
    )


# ---------------------------------------------------------------------------
# Exact average precision (area under the PR curve, step
# interpolation -- sklearn's average_precision_score): group by
# distinct score, descending cumulative TP/FP over the bounded
# distinct-score table, AP = sum over score groups of
# (p_s / P) * precision_at(s). Per-group terms are quantized to
# int64 before the sum so the reduce is order-independent.
# ---------------------------------------------------------------------------

_AUPRC_ORACLE = """
WITH by_score AS (
  SELECT n_chars AS score,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS p_s,
         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
           AS n_s
  FROM documents GROUP BY n_chars
),
cum AS (
  SELECT p_s, n_s,
         CAST(sum(p_s) OVER w AS BIGINT) AS tp,
         CAST(sum(n_s) OVER w AS BIGINT) AS fp
  FROM by_score
  WINDOW w AS (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (SELECT CAST(sum(p_s) AS BIGINT) AS pos,
               CAST(sum(n_s) AS BIGINT) AS neg FROM by_score),
terms AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(p_s AS DOUBLE) / tot.pos)
           * (CAST(tp AS DOUBLE) / (tp + fp)) * 1e9 + 0.5)
         AS BIGINT)) AS BIGINT) AS ap_q
  FROM cum, tot WHERE p_s > 0
)
SELECT tot.pos AS n_pos, tot.neg AS n_neg,
       floor(CAST(terms.ap_q AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6
         AS auprc_s,
       floor(CAST(tot.pos AS DOUBLE) / (tot.pos + tot.neg) * 1e6 + 0.5)
         / 1e6 AS baseline_s,
       floor((CAST(terms.ap_q AS DOUBLE) / 1e9)
             / (CAST(tot.pos AS DOUBLE) / (tot.pos + tot.neg))
             * 1e6 + 0.5) / 1e6 AS lift_s
FROM terms, tot
"""


@register("ml_auprc_exact", oracle=_AUPRC_ORACLE)
def ml_auprc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision of document length predicting 'en',
    via the grouped descending-cumulative pass."""
    docs = load(spark, sf_dir, "documents")
    by_score = (
        docs.select(
            F.col("n_chars").alias("score"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        )
        .groupBy("score")
        .agg(
            F.sum("y").cast("long").alias("p_s"),
            (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_s"),
        )
        .localCheckpoint(eager=True)  # cum pass + totals reuse
    )
    w = W.orderBy(F.col("score").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow)
    cum = by_score.select(
        "p_s", "n_s",
        F.sum("p_s").over(w).cast("long").alias("tp"),
        F.sum("n_s").over(w).cast("long").alias("fp"),
    )
    tot = by_score.agg(F.sum("p_s").cast("long").alias("pos"),
                       F.sum("n_s").cast("long").alias("neg"))
    # 1e-9 quantum: per-term products of two sub-1 ratios need the
    # extra headroom before the final 1e-6 snap
    terms = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("p_s") > 0)
        .agg(F.sum(
            F.floor((F.col("p_s").cast("double") / F.col("pos"))
                    * (F.col("tp").cast("double")
                       / (F.col("tp") + F.col("fp"))) * 1e9 + F.lit(0.5))
            .cast("long")).cast("long").alias("ap_q"))
    )
    ap = F.col("ap_q").cast("double") / 1e9
    base = F.col("pos").cast("double") / (F.col("pos") + F.col("neg"))
    return (
        tot.crossJoin(F.broadcast(terms))
        .select(
            F.col("pos").alias("n_pos"), F.col("neg").alias("n_neg"),
            _snap6(ap).alias("auprc_s"),
            _snap6(base).alias("baseline_s"),
            _snap6(ap / base).alias("lift_s"),
        )
    )


# ---------------------------------------------------------------------------
# Expected calibration error. The probability is a logistic score of
# the standardized document length (mean/std from exact integer sums,
# sigmoid snapped BEFORE binning -- the FIXTURES.md transcendental
# rule); 10 equal-width bins on the snapped probability; per bin the
# confidence is the mean snapped p (int64 1e-6 units), the accuracy
# the exact label mean; ECE = sum n_b/N * |acc - conf| over the
# 10-row bin table.
#
# Scale: two corpus passes (moment agg, then score+bin agg) -- the
# standardization constants broadcast back; bins are model state.
# ---------------------------------------------------------------------------

_ECE_ORACLE = """
WITH m AS (
  SELECT CAST(floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 1e6 + 0.5)
              AS BIGINT) AS mean_q,
         floor(sqrt((sum(CAST(n_chars AS DOUBLE) * n_chars)
                     - CAST(sum(n_chars) AS DOUBLE) * sum(n_chars)
                       / count(*)) / count(*)) * 1e6 + 0.5) / 1e6 AS std_s
  FROM documents
),
scored AS (
  SELECT CAST(floor(1.0 / (1.0 + exp(-((n_chars - mean_q / 1e6)
                                       / std_s))) * 1e6 + 0.5) AS BIGINT)
           AS p_q,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents, m
),
bins AS (
  SELECT least(CAST(floor(p_q / 100000.0) AS BIGINT), 9) AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(p_q) AS BIGINT) AS sum_pq,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM scored GROUP BY 1
),
tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n FROM bins),
rel AS (
  SELECT bin, n_b, n_pos,
         floor(CAST(sum_pq AS DOUBLE) / n_b + 0.5) / 1e6 AS conf_s,
         floor(CAST(n_pos AS DOUBLE) / n_b * 1e6 + 0.5) / 1e6 AS acc_s
  FROM bins
),
ece AS (
  SELECT floor(CAST(sum(CAST(floor(n_b * abs(acc_s - conf_s) * 1e6 + 0.5)
                            AS BIGINT)) AS BIGINT) / 1e6
               / tot.n * 1e6 + 0.5) / 1e6 AS ece_s
  FROM rel, tot GROUP BY tot.n
)
SELECT bin, n_b, n_pos, conf_s, acc_s,
       floor(abs(acc_s - conf_s) * 1e6 + 0.5) / 1e6 AS gap_s,
       ece.ece_s
FROM rel, ece
ORDER BY bin
"""


@register("ml_expected_calibration_error", oracle=_ECE_ORACLE)
def ml_expected_calibration_error(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """10-bin reliability table + ECE for the logistic length score
    predicting 'en'."""
    docs = load(spark, sf_dir, "documents")
    m = docs.agg(
        F.floor(F.sum("n_chars").cast("double") / F.count(F.lit(1)) * 1e6
                + F.lit(0.5)).cast("long").alias("mean_q"),
        _snap6(F.sqrt(
            (F.sum(F.col("n_chars").cast("double") * F.col("n_chars"))
             - F.sum("n_chars").cast("double") * F.sum("n_chars")
               / F.count(F.lit(1))) / F.count(F.lit(1)))).alias("std_s"),
    )
    z = (F.col("n_chars") - F.col("mean_q") / 1e6) / F.col("std_s")
    p_q = F.floor(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) * 1e6
                  + F.lit(0.5)).cast("long")
    scored = (
        docs.crossJoin(F.broadcast(m))
        .select(
            p_q.alias("p_q"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        )
    )
    bins = (
        scored.groupBy(F.least(F.floor(F.col("p_q") / 100000), F.lit(9))
                       .cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("p_q").cast("long").alias("sum_pq"),
            F.sum("y").cast("long").alias("n_pos"),
        )
        .localCheckpoint(eager=True)  # reliability rows + ECE reuse
    )
    tot = bins.agg(F.sum("n_b").cast("long").alias("n"))
    rel = bins.select(
        "bin", "n_b", "n_pos",
        (F.floor(F.col("sum_pq").cast("double") / F.col("n_b")
                 + F.lit(0.5)) / 1e6).alias("conf_s"),
        _snap6(F.col("n_pos").cast("double") / F.col("n_b"))
        .alias("acc_s"),
    )
    # per-term int64 quantization before the sum: the 10-row reduce
    # must be order-independent like every other portable reduce here
    ece = (
        rel.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(F.sum(_q6(F.col("n_b")
                       * F.abs(F.col("acc_s") - F.col("conf_s"))))
             .cast("long").alias("gap_q"))
        .select(_snap6(F.col("gap_q").cast("double") / 1e6 / F.col("n"))
                .alias("ece_s"))
    )
    return (
        rel.crossJoin(F.broadcast(ece))
        .select("bin", "n_b", "n_pos", "conf_s", "acc_s",
                _snap6(F.abs(F.col("acc_s") - F.col("conf_s")))
                .alias("gap_s"),
                "ece_s")
        .orderBy("bin")
    )
