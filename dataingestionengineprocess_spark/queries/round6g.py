"""Round-6g queries: survival hazard, embedding-space alignment,
survey allocation, and recursive-CTE smoothing.

- ``events_nelson_aalen``: the Nelson-Aalen cumulative-hazard
  estimator H(t) = sum d_i/n_i over engagement lifetimes -- the
  additive companion to `events_kaplan_meier` (same duration/censor
  table, cumulative SUM of quantized hazard steps instead of the
  product-limit's summed logs).
- ``embedding_procrustes_2d``: orthogonal Procrustes alignment of
  the (dim3, dim4) embedding plane onto (dim1, dim2): the optimal
  2-D rotation has the closed form theta* = atan2(sum cross, sum
  dot), and both the angle and the SSE before/after fall out of
  FOUR int64-quantized moment sums -- one scan, no per-row second
  pass.
- ``sample_neyman_allocation``: Neyman optimal allocation of a
  100-draw budget across market segments (n_h proportional to
  N_h * S_h), the stratified-sampling design rule; the integerized
  weights ride the SHARED `operators/sampling.hamilton_quota`
  apportionment so quotas sum to exactly 100.
- ``events_holt_linear``: Holt double exponential smoothing
  (level + trend) over the monthly event-count series, expressed as
  a RECURSIVE CTE run by BOTH engines (Spark 4 WITH RECURSIVE --
  the `sql_recursive_cte` precedent), so the sequential recurrence
  distributes as planned iterations with no driver-side loop and no
  fixed unroll depth.

Exactness: hazard steps, moment sums, and weights are int64; the
Holt recurrence is an identical scalar double chain on both engines
(no reduce-order freedom), snapped at emission; atan2/cos/sin ride
the same libm-parity precedent as exp (ml_logreg_portable).
Reference parity: diagram-only reference (SURVEY.md §0).

Registered LAST (queries/__init__._load_all): new unverified queries
append BEHIND the already pre-flighted driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import q6, snap6
from . import register

_EPOCH = "2024-01-01"

# ---------------------------------------------------------------------------
# Nelson-Aalen. Same duration/right-censoring table as Kaplan-Meier
# (one per-user groupBy collapses the corpus; everything after runs
# on the <= observation-window-days table); the hazard increment
# d/n_risk quantizes per step, the cumulative hazard is an int64
# running sum.
# ---------------------------------------------------------------------------

_NA_ORACLE = f"""
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
         CAST(floor(CAST(d AS DOUBLE) / n_risk * 1e6 + 0.5) AS BIGINT)
           AS hz_q
  FROM risk
)
SELECT dur, n_risk, d, c,
       CAST(sum(hz_q) OVER (ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / 1e6 AS cum_hazard_s
FROM steps ORDER BY dur
"""


@register("events_nelson_aalen", oracle=_NA_ORACLE)
def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of engagement lifetimes with
    final-day right-censoring; int64 hazard-step running sum."""
    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(_EPOCH)))
    u = (ev.groupBy("user_id")
         .agg(F.min(day).alias("fd"), F.max(day).alias("ld"))
         .localCheckpoint(eager=True))
    mx = u.agg(F.max("ld").alias("max_day"))
    durs = (
        u.crossJoin(F.broadcast(mx))
        .groupBy((F.col("ld") - F.col("fd")).cast("long").alias("dur"))
        .agg(F.sum(F.when(F.col("ld") < F.col("max_day"), 1).otherwise(0))
             .cast("long").alias("d"),
             F.sum(F.when(F.col("ld") == F.col("max_day"), 1).otherwise(0))
             .cast("long").alias("c"))
    )
    # bounded (<= window days) model table: single-partition windows
    # here run over model state, not the corpus (the KM precedent)
    w_desc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    w_asc = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    risk = durs.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(w_desc).cast("long"))
    steps = risk.withColumn(
        "hz_q",
        F.floor(F.col("d").cast("double") / F.col("n_risk") * 1e6
                + F.lit(0.5)).cast("long"))
    return steps.select(
        "dur", "n_risk", "d", "c",
        (F.sum("hz_q").over(w_asc).cast("double") / 1e6)
        .alias("cum_hazard_s"),
    ).orderBy("dur")


# ---------------------------------------------------------------------------
# 2-D orthogonal Procrustes. With A = (e1, e2) and B = (e3, e4) per
# vector, the rotation minimizing sum |a - R b|^2 is
# theta* = atan2(sum (ax*by - ay*bx), sum (ax*bx + ay*by)); the
# aligned SSE is sum(|a|^2 + |b|^2) - 2*(cos t * Sdot + sin t *
# Scross). Four quantized sums -> one row.
# ---------------------------------------------------------------------------

_PROC_ORACLE = """
WITH e AS (
  SELECT (embedding::DOUBLE[])[1] AS ax, (embedding::DOUBLE[])[2] AS ay,
         (embedding::DOUBLE[])[3] AS bx, (embedding::DOUBLE[])[4] AS by
  FROM embeddings
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(floor((ax * bx + ay * by) * 1e6 + 0.5) AS BIGINT))
      AS BIGINT) AS sdot,
    CAST(sum(CAST(floor((ax * by - ay * bx) * 1e6 + 0.5) AS BIGINT))
      AS BIGINT) AS scross,
    CAST(sum(CAST(floor((ax * ax + ay * ay + bx * bx + by * by) * 1e6
      + 0.5) AS BIGINT)) AS BIGINT) AS snorm
  FROM e
),
t AS (
  SELECT n, sdot / 1e6 AS sd, scross / 1e6 AS sc, snorm / 1e6 AS sn,
         atan2(scross / 1e6, sdot / 1e6) AS theta
  FROM s
)
SELECT n AS n_rows,
       floor(theta * 1e6 + 0.5) / 1e6 AS theta_s,
       floor((sn - 2.0 * sd) * 1e6 + 0.5) / 1e6 AS sse_before_s,
       floor((sn - 2.0 * (cos(theta) * sd + sin(theta) * sc)) * 1e6
             + 0.5) / 1e6 AS sse_after_s
FROM t
"""


@register("embedding_procrustes_2d", oracle=_PROC_ORACLE)
def embedding_procrustes_2d(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Closed-form 2-D orthogonal Procrustes: rotation angle + SSE
    before/after from four quantized moment sums, one scan."""
    from ..functions.vectors import as_double

    e = load(spark, sf_dir, "embeddings").select(
        as_double("embedding").alias("v"))
    ax, ay = F.element_at("v", 1), F.element_at("v", 2)
    bx, by = F.element_at("v", 3), F.element_at("v", 4)

    def iq(expr):
        return F.sum(F.floor(expr * 1e6 + F.lit(0.5)).cast("long")) \
            .cast("long")

    s = e.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        iq(ax * bx + ay * by).alias("sdot"),
        iq(ax * by - ay * bx).alias("scross"),
        iq(ax * ax + ay * ay + bx * bx + by * by).alias("snorm"),
    )
    theta = F.atan2(F.col("scross") / 1e6, F.col("sdot") / 1e6)
    sd, sc, sn = (F.col("sdot") / 1e6, F.col("scross") / 1e6,
                  F.col("snorm") / 1e6)
    return s.select(
        F.col("n").alias("n_rows"),
        snap6(theta).alias("theta_s"),
        snap6(sn - 2.0 * sd).alias("sse_before_s"),
        snap6(sn - 2.0 * (F.cos(theta) * sd + F.sin(theta) * sc))
        .alias("sse_after_s"),
    )


# ---------------------------------------------------------------------------
# Neyman allocation. n_h ~ N_h * S_h (population size x within-
# stratum std dev): the variance-minimizing split of a fixed draw
# budget. Weights integerize at 1e-2 (cents of weight) and ride the
# shared hamilton_quota apportionment, so the quotas sum to exactly
# the budget with the same remainder algebra the corpus samplers use.
# ---------------------------------------------------------------------------

_NEYMAN_K = 100

_NEYMAN_ORACLE = f"""
WITH s AS (
  SELECT c_mktsegment,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS sx,
         CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
           * CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sxx
  FROM customer GROUP BY c_mktsegment
),
w AS (
  SELECT c_mktsegment, n_h,
         sqrt((sxx - CAST(sx AS DOUBLE) * sx / n_h) / (n_h - 1))
           / 100.0 AS sd,
         CAST(floor(n_h * (sqrt((sxx - CAST(sx AS DOUBLE) * sx / n_h)
           / (n_h - 1)) / 100.0) * 100 + 0.5) AS BIGINT) AS wq
  FROM s
),
tot AS (SELECT CAST(sum(wq) AS BIGINT) AS n FROM w),
base AS (
  SELECT w.c_mktsegment, w.n_h, w.sd, w.wq,
         CAST(({_NEYMAN_K} * w.wq) // t.n AS BIGINT) AS floor_q,
         CAST(({_NEYMAN_K} * w.wq) % t.n AS BIGINT) AS rem
  FROM w CROSS JOIN tot t
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, c_mktsegment) AS rk,
         CAST({_NEYMAN_K} AS BIGINT)
           - CAST(sum(floor_q) OVER () AS BIGINT) AS leftover
  FROM base
)
SELECT c_mktsegment, n_h,
       floor(sd * 1e6 + 0.5) / 1e6 AS sd_s,
       CAST(floor_q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS n_alloc
FROM ranked ORDER BY c_mktsegment
"""


@register("sample_neyman_allocation", oracle=_NEYMAN_ORACLE)
def sample_neyman_allocation(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Neyman optimal stratified allocation of a 100-draw budget
    across market segments via the shared Hamilton apportionment."""
    from ..operators.sampling import hamilton_quota

    cust = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    s = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum(cents).cast("long").alias("sx"),
        F.sum(cents * cents).cast("long").alias("sxx"),
    )
    sd = (F.sqrt((F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
                  / F.col("n_h")) / (F.col("n_h") - 1)) / 100.0)
    w = s.select(
        "c_mktsegment", "n_h", sd.alias("sd"),
        F.floor(F.col("n_h") * sd * 100 + F.lit(0.5)).cast("long")
        .alias("wq"))
    quota = hamilton_quota(w.select("c_mktsegment", "wq"), _NEYMAN_K,
                           n_col="wq", key_cols=("c_mktsegment",))
    return (
        w.join(quota.select("c_mktsegment",
                            F.col("quota").alias("n_alloc")),
               "c_mktsegment")
        .select("c_mktsegment", "n_h", snap6(F.col("sd")).alias("sd_s"),
                F.col("n_alloc").cast("long").alias("n_alloc"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Holt double exponential smoothing over DAILY event counts (the
# fixture window is one month, so the day series is the bounded
# ~30-step model table), as a recursive CTE both engines execute
# natively. Level/trend update:
#   l_t = a*y_t + (1-a)*(l + b);  b_t = g*(l_t - l) + (1-g)*b
# init l = y_0, b = y_1 - y_0. The recursion is one planned join per
# step on BOTH engines (no driver loop, no fixed unroll depth).
# ---------------------------------------------------------------------------

_HOLT_A = 0.5
_HOLT_G = 0.3

# The recursive step joins on idx = h.idx + 1, so a GAP in the day
# series would silently truncate every later day (identically on both
# engines -- the parity gate can't see it). Densify: left-join the raw
# daily counts onto a generated contiguous [0, max_idx] series with
# zero-filled counts, so the recursion walks every day.
#
# The recursion SQL is SHARED verbatim; only the densified `days`
# source differs. DuckDB materializes the CTE chain once, so it keeps
# the inline form. Spark RE-EVALUATES non-recursive CTEs referenced
# from inside a recursion at every step -- the inline densify join ran
# 30 times and doubled the query's wall (22 s vs the 9.8 s baseline) --
# so the Spark side materializes the ~30-row day table once
# (localCheckpoint) and recurses over the checkpointed view.

_HOLT_DAYS_ORACLE = f"""
raw AS (
  SELECT CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE))
              AS BIGINT) AS idx,
         CAST(count(*) AS DOUBLE) AS y
  FROM {{src}}
  WHERE CAST(ts AS DATE) >= DATE '{_EPOCH}'
  GROUP BY 1
),
series AS (
  SELECT unnest(generate_series(CAST(0 AS BIGINT),
                                (SELECT max(idx) FROM raw))) AS idx
),
days AS (
  SELECT s.idx, COALESCE(r.y, 0.0) AS y
  FROM series s LEFT JOIN raw r ON r.idx = s.idx
),
"""

_HOLT_RECURSION = f"""
holt AS (
  SELECT m0.idx, m0.y, m0.y AS l, m1.y - m0.y AS b
  FROM days m0 JOIN days m1 ON m0.idx = 0 AND m1.idx = 1
  UNION ALL
  SELECT m.idx, m.y,
         {_HOLT_A} * m.y + {1 - _HOLT_A} * (h.l + h.b) AS l,
         {_HOLT_G} * (({_HOLT_A} * m.y + {1 - _HOLT_A} * (h.l + h.b))
                      - h.l) + {1 - _HOLT_G} * h.b AS b
  FROM holt h JOIN days m ON m.idx = h.idx + 1
)
SELECT idx AS day_idx, CAST(y AS BIGINT) AS n_events,
       floor(l * 1e6 + 0.5) / 1e6 AS level_s,
       floor(b * 1e6 + 0.5) / 1e6 AS trend_s,
       floor((l + b) * 1e6 + 0.5) / 1e6 AS forecast_next_s
FROM holt ORDER BY idx
"""

_HOLT_ORACLE = ("WITH RECURSIVE " + _HOLT_DAYS_ORACLE.strip()
                + _HOLT_RECURSION).format(src="events")

_HOLT_SPARK_BODY = ("WITH RECURSIVE days AS "
                    "(SELECT idx, y FROM __holt_days),"
                    + _HOLT_RECURSION)


@register("events_holt_linear", oracle=_HOLT_ORACLE)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level+trend smoothing of daily event counts via a
    recursive CTE over the densified (gap-zero-filled) day series;
    the recursion SQL is shared verbatim with the oracle."""
    ev = load(spark, sf_dir, "events")
    raw = (
        ev.where(F.to_date("ts") >= F.lit(_EPOCH))
        .groupBy(F.datediff(F.to_date("ts"), F.to_date(F.lit(_EPOCH)))
                 .cast("long").alias("idx"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    mx = raw.agg(F.max("idx")).collect()[0][0]  # bounded: one scalar
    if mx is None:
        days = raw  # no qualifying days: empty on both engines
    else:
        series = spark.range(0, int(mx) + 1).select(
            F.col("id").cast("long").alias("idx"))
        days = (
            series.join(raw, "idx", "left")
            .select("idx", F.coalesce("y", F.lit(0.0)).alias("y"))
        )
    # ONE partition for the day table: every recursion step re-scans
    # it (joined against the single-row previous step), so its
    # partition count multiplies into ~N_steps x N_partitions
    # near-empty tasks -- measured 164 jobs x 16 tasks of pure
    # scheduling at sf0.1. The series is a bounded model table
    # (one row per day) at any scale, so width 1 is the right size
    # everywhere, same rationale as FIXTURE_STATE_PARTITIONS. The
    # scoped pin keeps the per-step aggregate exchanges equally
    # narrow, and the eager checkpoint executes the recursion inside
    # the scope (shuffle width is read at execution time).
    days.coalesce(1).localCheckpoint(eager=True) \
        .createOrReplaceTempView("__holt_days")
    from ..streaming.analytics import scoped_shuffle_partitions

    with scoped_shuffle_partitions(spark, 1):
        return spark.sql(_HOLT_SPARK_BODY).localCheckpoint(eager=True)
