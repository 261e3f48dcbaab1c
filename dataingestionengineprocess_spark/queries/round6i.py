"""Round-6i queries: distributional drift and variance-homogeneity
certificates.

- ``quality_wasserstein_drift``: exact 1-D Wasserstein-1 distance
  (earth mover's) AND the Kolmogorov-Smirnov statistic between the
  purchase- and click-event value distributions, from ONE cents-
  quantized distribution table: W1 = sum |F_A - F_B| * gap over the
  sorted distinct values, KS = max |F_A - F_B|. The CDFs ride
  `distributed_prefix_sums` (one range-partition pass, both
  cumulative counts together) -- no global window anywhere. The
  integral-form drift metric that PSI's fixed binning misses.
- ``stat_brown_forsythe``: the Brown-Forsythe variance-homogeneity
  test (Levene with MEDIAN centers -- the robust form): per-type
  exact median via grouped_rank, |x - med| deviations, one-way
  ANOVA F on the deviations. The gate statistic for "did the spread
  change", complementing the mean-shift z-tests.

Exactness: distribution counts, rank crossings, and deviation sums
are int64; each W1 term quantizes as floor(|dF| * gap_cents * 1e4)
so the reduce is order-free; the F statistic is a ratio of two
quantized sums snapped at emission. Reference parity: diagram-only
reference (SURVEY.md §0); extends the [C] quality/drift family.

Registered LAST (queries/__init__._load_all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import q6, snap6
from . import register

# ---------------------------------------------------------------------------
# Wasserstein-1 + KS. Work in cents: vq = floor(v*100 + 0.5). The
# distribution table has one row per distinct cents value with both
# samples' counts; inclusive cumulative counts come from ONE
# distributed prefix pass; the neighbor gap is a rank+1 equi-join on
# the same layout (no lead() window over the full table).
# ---------------------------------------------------------------------------

_W1_ORACLE = """
WITH v AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
),
d AS (
  SELECT vq, CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
  FROM v GROUP BY vq
),
c AS (
  SELECT vq,
         CAST(sum(na) OVER w AS BIGINT) AS ca,
         CAST(sum(nb) OVER w AS BIGINT) AS cb,
         lead(vq) OVER (ORDER BY vq) AS nxt
  FROM d
  WINDOW w AS (ORDER BY vq ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
tot AS (
  SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
  FROM d
),
terms AS (
  SELECT abs(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb) AS df,
         CAST(nxt - vq AS BIGINT) AS gapc
  FROM c CROSS JOIN tot WHERE nxt IS NOT NULL
)
SELECT t.ta AS n_a, t.tb AS n_b,
       CAST(sum(CAST(floor(df * gapc * 1e4 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1e6 AS w1_s,
       floor(max(df) * 1e6 + 0.5) / 1e6 AS ks_s
FROM terms CROSS JOIN tot t GROUP BY t.ta, t.tb
"""


@register("quality_wasserstein_drift", oracle=_W1_ORACLE)
def quality_wasserstein_drift(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Exact W1 + KS between the purchase and click value
    distributions; CDFs via one distributed prefix pass."""
    from ..operators.ranking import distributed_prefix_sums, global_rank

    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click"))
    vq = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    d = (
        ev.select(vq.alias("vq"),
                  F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0).alias("a"),
                  F.when(F.col("event_type") == "click", 1)
                  .otherwise(0).alias("b"))
        .groupBy("vq")
        .agg(F.sum("a").cast("long").alias("na"),
             F.sum("b").cast("long").alias("nb"))
    )
    c = distributed_prefix_sums(d, ["vq"], {"ca": "na", "cb": "nb"})
    c = global_rank(c, ["vq"], "rn").localCheckpoint(eager=True)
    tot = d.agg(F.sum("na").cast("long").alias("ta"),
                F.sum("nb").cast("long").alias("tb"))
    nxt = c.select(F.col("vq").alias("nxt_vq"),
                   (F.col("rn") - 1).alias("rn"))
    terms = (
        c.join(nxt, "rn")
        .crossJoin(F.broadcast(tot))
        .select(
            (F.abs(F.col("ca").cast("double") / F.col("ta")
                   - F.col("cb").cast("double") / F.col("tb")))
            .alias("df"),
            (F.col("nxt_vq") - F.col("vq")).cast("long").alias("gapc"))
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .groupBy("ta", "tb")
        .agg((F.sum(F.floor(F.col("df") * F.col("gapc") * 1e4
                            + F.lit(0.5)).cast("long"))
              .cast("double") / 1e6).alias("w1_s"),
             (F.floor(F.max("df") * 1e6 + F.lit(0.5)) / 1e6)
             .alias("ks_s"))
        .select(F.col("ta").alias("n_a"), F.col("tb").alias("n_b"),
                "w1_s", "ks_s")
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe. Median centers come from the exact rank crossing
# over (event_type; value, event_id) via grouped_rank (bounded type
# universe); the deviations then take the standard one-way ANOVA F,
# with all sums int64-quantized before the ratio.
# ---------------------------------------------------------------------------

_BF_ORACLE = """
WITH v AS (
  SELECT event_type, event_id, value FROM events
  WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
med AS (
  SELECT event_type,
         (min(CASE WHEN rn = (n + 1) // 2 THEN value END)
          + min(CASE WHEN rn = (n + 2) // 2 THEN value END)) / 2.0
           AS m
  FROM ranked GROUP BY event_type
),
z AS (
  SELECT v.event_type,
         CAST(floor(abs(v.value - med.m) * 1e6 + 0.5) AS BIGINT) AS zq
  FROM v JOIN med ON med.event_type = v.event_type
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(zq) AS BIGINT) AS s_g,
         CAST(sum(CAST(floor((zq / 1e6) * (zq / 1e6) * 1e4 + 0.5)
           AS BIGINT)) AS BIGINT) AS ss_g
  FROM z GROUP BY event_type
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(s_g) AS BIGINT) AS s,
         sum(CAST(s_g AS DOUBLE) * s_g / n_g) AS sq_between,
         CAST(sum(ss_g) AS BIGINT) AS ss,
         sum(CAST(ss_g AS DOUBLE) / 1e4
             - CAST(s_g AS DOUBLE) * s_g / n_g / 1e12) AS sse
  FROM g
)
SELECT k AS k_groups, n AS n_rows,
       floor(((sq_between / 1e12 - CAST(s AS DOUBLE) * s / n / 1e12)
              / (k - 1)) / (sse / (n - k)) * 1e6 + 0.5) / 1e6
         AS f_stat_s
FROM t
"""


@register("stat_brown_forsythe", oracle=_BF_ORACLE)
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe spread-homogeneity F over per-type median
    deviations; exact medians via grouped_rank, quantized ANOVA."""
    from ..operators.ranking import grouped_rank

    v = load(spark, sf_dir, "events").where(F.col("value").isNotNull()) \
        .select("event_type", "event_id", "value")
    # event_type: fixed generator enum (5 values) -- skip the probe.
    ranked = grouped_rank(v, ["event_type"], ["value", "event_id"],
                          "rn", count_col="n", known_group_count=8)
    # Integer `div` keeps the median ranks exact at any n (the
    # double-divide-then-floor path drifts past ~2^53; ADVICE r6).
    lo = F.min(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                      F.col("value")))
    hi = F.min(F.when(F.col("rn") == F.expr("(n + 2) div 2"),
                      F.col("value")))
    med = ranked.groupBy("event_type").agg(((lo + hi) / 2.0).alias("m"))
    z = (
        v.join(F.broadcast(med), "event_type")
        .select("event_type",
                q6(F.abs(F.col("value") - F.col("m"))).alias("zq"))
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("zq").cast("long").alias("s_g"),
        F.sum(F.floor((F.col("zq") / 1e6) * (F.col("zq") / 1e6) * 1e4
                      + F.lit(0.5)).cast("long")).cast("long")
        .alias("ss_g"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum(F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g"))
        .alias("sq_between"),
        F.sum(F.col("ss_g").cast("double") / 1e4
              - F.col("s_g").cast("double") * F.col("s_g")
              / F.col("n_g") / 1e12).alias("sse"),
    )
    f = (((F.col("sq_between") / 1e12
           - F.col("s").cast("double") * F.col("s") / F.col("n") / 1e12)
          / (F.col("k") - 1))
         / (F.col("sse") / (F.col("n") - F.col("k"))))
    return t.select(F.col("k").alias("k_groups"),
                    F.col("n").alias("n_rows"),
                    snap6(f).alias("f_stat_s"))
