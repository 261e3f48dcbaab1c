"""Round-4 (continued) additions: exact isotonic calibration and the
Murphy Brier decomposition.

- `ml_isotonic_calibration` -- the calibration MAP, not just the
  reliability curve: per-score-bin positive rates fitted to the best
  monotone (isotonic) sequence via the closed-form minimax formula
  iso(i) = max_{a<=i} min_{b>=i} pooledRate(a..b). PAV's sequential
  pooling is hostile to SQL; the minimax form is pure bounded-table
  algebra -- one scan collapses to <= 20 nonempty bins, prefix sums
  give every pooled rate, and a triangular (a, b) x i join (<= 4200
  bounded rows) realizes the max-min. Pooled rates snap once, so the
  fit is hash-exact in both engines.
- `ml_brier_decomposition` -- Murphy's decomposition of the Brier
  score over the same bins: reliability - resolution + uncertainty,
  plus the raw per-row Brier and the within-bin forecast variance
  that reconciles the two (brier_raw = rel - res + unc + wbv up to
  the 1e-6 grid). Forecast p = sigmoid of the snapped score (exp is
  libm-matched between engines, per the snap conventions); every
  squared term quantizes to integer units before any sum.

Reference parity: diagram-only reference (SURVEY.md §0); both extend
the [C] model-evaluation mandate next to ECE/AUC (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from . import register

_CAL_BINS = 20

_P_SQL = ("floor(1.0 / (1.0 + exp(-(floor(CAST(embedding[1] AS DOUBLE)"
          " * 1e6 + 0.5) / 1e6))) * 1e6 + 0.5) / 1e6")


def _p_col():
    s = _snap6(F.element_at("embedding", 1).cast("double"))
    return _snap6(F.lit(1.0) / (F.lit(1.0) + F.exp(-s)))


# ---------------------------------------------------------------------------
# Isotonic. Nonempty bins re-indexed 1..m (m <= 20); exclusive prefix
# sums; pooled rate over [a, b] snapped; iso(i) = max_a<=i min_b>=i.
# Everything after the first aggregate lives on bounded tables.
# ---------------------------------------------------------------------------

_ISO_ORACLE = f"""
WITH scored AS (
  SELECT {_P_SQL} AS p, CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
  FROM embeddings
),
binned AS (
  SELECT least(CAST(floor(p * {_CAL_BINS}) AS BIGINT),
               {_CAL_BINS - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY 1
),
idx AS (
  SELECT bin, n, pos,
         CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS i,
         CAST(sum(n) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumn,
         CAST(sum(pos) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumpos
  FROM binned
),
pairs AS (
  SELECT a.i AS ai, b.i AS bi,
         floor(CAST(b.cumpos - (a.cumpos - a.pos) AS DOUBLE)
               / (b.cumn - (a.cumn - a.n)) * 1e6 + 0.5) / 1e6 AS r
  FROM idx a JOIN idx b ON a.i <= b.i
),
minb AS (
  SELECT x.i, p.ai, min(p.r) AS mn
  FROM idx x JOIN pairs p ON p.ai <= x.i AND p.bi >= x.i
  GROUP BY x.i, p.ai
),
iso AS (SELECT i, max(mn) AS iso_s FROM minb GROUP BY i)
SELECT x.bin, x.n, x.pos,
       floor(CAST(x.pos AS DOUBLE) / x.n * 1e6 + 0.5) / 1e6 AS rate_s,
       iso.iso_s
FROM idx x JOIN iso ON iso.i = x.i
ORDER BY x.bin
"""


@register("ml_isotonic_calibration", oracle=_ISO_ORACLE)
def ml_isotonic_calibration(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Isotonic (monotone) calibration map over 20 sigmoid-score bins
    via the closed-form minimax pooling on bounded tables."""
    scored = load(spark, sf_dir, "embeddings").select(
        _p_col().alias("p"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
    )
    binned = scored.groupBy(
        F.least(F.floor(F.col("p") * _CAL_BINS).cast("long"),
                F.lit(_CAL_BINS - 1)).alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"),
          F.sum("y").cast("long").alias("pos"))
    w_ord = W.orderBy("bin")
    w_run = w_ord.rowsBetween(W.unboundedPreceding, 0)
    idx = binned.select(
        "bin", "n", "pos",
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.sum("n").over(w_run).cast("long").alias("cumn"),
        F.sum("pos").over(w_run).cast("long").alias("cumpos"),
    ).localCheckpoint(eager=True)  # <= 20 rows, feeds three legs
    a = idx.select(F.col("i").alias("ai"),
                   (F.col("cumn") - F.col("n")).alias("n0"),
                   (F.col("cumpos") - F.col("pos")).alias("p0"))
    b = idx.select(F.col("i").alias("bi"),
                   F.col("cumn").alias("n1"), F.col("cumpos").alias("p1"))
    pairs = (
        a.join(b, a.ai <= b.bi)
        .select("ai", "bi",
                _snap6((F.col("p1") - F.col("p0")).cast("double")
                       / (F.col("n1") - F.col("n0"))).alias("r"))
    )
    minb = (
        idx.select("i").join(
            pairs, (pairs.ai <= F.col("i")) & (pairs.bi >= F.col("i")))
        .groupBy("i", "ai").agg(F.min("r").alias("mn"))
    )
    iso = minb.groupBy("i").agg(F.max("mn").alias("iso_s"))
    return (
        idx.join(iso, "i")
        .select("bin", "n", "pos",
                _snap6(F.col("pos").cast("double") / F.col("n"))
                .alias("rate_s"),
                "iso_s")
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Brier decomposition. Per-row squared error in exact 1e-12 units
# ((p_q - y*1e6)^2, DECIMAL(38) accumulator); per-bin terms quantized
# to int64 before the <= 20-term sums; identity emitted, not assumed.
# ---------------------------------------------------------------------------

_BRIER_ORACLE = f"""
WITH scored AS (
  SELECT {_P_SQL} AS p, CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
  FROM embeddings
),
q AS (
  SELECT CAST(floor(p * 1e6 + 0.5) AS BIGINT) AS pq, y,
         least(CAST(floor(p * {_CAL_BINS}) AS BIGINT),
               {_CAL_BINS - 1}) AS bin
  FROM scored
),
raw AS (
  SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(y) AS BIGINT) AS np,
         sum(CAST((pq - y * 1000000) AS HUGEINT)
             * (pq - y * 1000000)) AS se
  FROM q
),
bins AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT)
           AS pos,
         sum(CAST(pq AS HUGEINT)) AS spq
  FROM q GROUP BY bin
),
terms AS (
  SELECT b.bin, b.n,
         CAST(floor(b.n * (CAST(b.spq AS DOUBLE) / b.n / 1e6
                           - CAST(b.pos AS DOUBLE) / b.n)
                    * (CAST(b.spq AS DOUBLE) / b.n / 1e6
                       - CAST(b.pos AS DOUBLE) / b.n) * 1e6 + 0.5)
              AS BIGINT) AS rel_q,
         CAST(floor(b.n * (CAST(b.pos AS DOUBLE) / b.n
                           - CAST(r.np AS DOUBLE) / r.nn)
                    * (CAST(b.pos AS DOUBLE) / b.n
                       - CAST(r.np AS DOUBLE) / r.nn) * 1e6 + 0.5)
              AS BIGINT) AS res_q
  FROM bins b CROSS JOIN raw r
)
SELECT r.nn AS n_rows,
       floor(sum(t.rel_q) / 1e6 / r.nn * 1e6 + 0.5) / 1e6 AS rel_s,
       floor(sum(t.res_q) / 1e6 / r.nn * 1e6 + 0.5) / 1e6 AS res_s,
       floor((CAST(r.np AS DOUBLE) / r.nn)
             * (1 - CAST(r.np AS DOUBLE) / r.nn) * 1e6 + 0.5) / 1e6
         AS unc_s,
       floor(CAST(r.se AS DOUBLE) / 1e12 / r.nn * 1e6 + 0.5) / 1e6
         AS brier_raw_s
FROM terms t CROSS JOIN raw r
GROUP BY r.nn, r.np, r.se
"""


@register("ml_brier_decomposition", oracle=_BRIER_ORACLE)
def ml_brier_decomposition(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (reliability,
    resolution, uncertainty) plus the raw Brier, exact units."""
    q = load(spark, sf_dir, "embeddings").select(
        F.floor(_p_col() * 1e6 + 0.5).cast("long").alias("pq"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
        F.least(F.floor(_p_col() * _CAL_BINS).cast("long"),
                F.lit(_CAL_BINS - 1)).alias("bin"),
    ).localCheckpoint(eager=True)  # feeds raw + bins legs
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    raw = q.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("y").cast("long").alias("np"),
        F.sum(dec(F.col("pq") - F.col("y") * 1000000)
              * (F.col("pq") - F.col("y") * 1000000)).alias("se"),
    )
    bins = q.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
        F.sum(dec(F.col("pq"))).alias("spq"),
    )
    fb = F.col("spq").cast("double") / F.col("n") / 1e6
    ob = F.col("pos").cast("double") / F.col("n")
    obar = F.col("np").cast("double") / F.col("nn")
    terms = bins.crossJoin(F.broadcast(raw)).select(
        F.floor(F.col("n") * (fb - ob) * (fb - ob) * 1e6 + 0.5)
        .cast("long").alias("rel_q"),
        F.floor(F.col("n") * (ob - obar) * (ob - obar) * 1e6 + 0.5)
        .cast("long").alias("res_q"),
        "nn", "np", "se",
    )
    return (
        terms.groupBy("nn", "np", "se")
        .agg(
            _snap6(F.sum("rel_q") / 1e6 / F.col("nn")).alias("rel_s"),
            _snap6(F.sum("res_q") / 1e6 / F.col("nn")).alias("res_s"),
        )
        .select(
            F.col("nn").alias("n_rows"), "rel_s", "res_s",
            _snap6(obar * (1 - obar)).alias("unc_s"),
            _snap6(F.col("se").cast("double") / 1e12 / F.col("nn"))
            .alias("brier_raw_s"),
        )
    )
