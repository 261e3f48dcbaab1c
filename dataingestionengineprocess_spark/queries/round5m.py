"""Round-4 (continued) additions: temperature-scaled mixture weights
and the deterministic permutation test.

- `curation_temperature_mix` -- the multilingual-sampling staple:
  raise each language's corpus share to the power alpha = 0.3
  (temperature up-weighting of low-resource classes), renormalize,
  and apportion a 10,000-slot budget with the shared
  `hamilton_quota`. The fractional power rides exp(alpha * ln(p))
  with BOTH transcendentals snapped (the exp/ln libm pair is
  verified matched between engines across this repo; pow() is not,
  so it is never used). Output carries raw share, tempered weight,
  and the exact integer quota per language.
- `stat_permutation_test` -- resampling inference without
  randomness: the group labels of the class-0-vs-rest score
  comparison are reassigned by md5(vec_id || ':' || b) coins for
  B = 20 deterministic permutations (the md5-coin idiom every
  sampler here uses), and the p-value is the share of permutations
  whose |mean difference| meets or beats the observed one. All mean
  differences are computed from exact quantized sums; only the
  final comparison snaps. Complements `stat_poisson_bootstrap`
  (error bars) with a significance test.

Reference parity: diagram-only reference (SURVEY.md §0); both extend
the [C] curation / statistics mandate (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from . import register

_MIX_ALPHA = 0.3
_MIX_K = 10_000

# ---------------------------------------------------------------------------
# Temperature mix. p = n/N snapped; w_raw = exp(alpha * ln(p))
# snapped at each transcendental; weight = w_raw / sum(w_raw) with
# the sum over int64-quantized terms (order-free); quotas via the
# shared Hamilton apportionment on the quantized weights.
# ---------------------------------------------------------------------------

_TEMP_MIX_ORACLE = f"""
WITH cls AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM cls),
w AS (
  SELECT c.lang, c.n_docs,
         floor(CAST(c.n_docs AS DOUBLE) / t.n * 1e6 + 0.5) / 1e6 AS p_s,
         CAST(floor(exp({_MIX_ALPHA}
                        * (floor(ln(CAST(c.n_docs AS DOUBLE) / t.n)
                                 * 1e6 + 0.5) / 1e6))
                    * 1e6 + 0.5) AS BIGINT) AS wq
  FROM cls c CROSS JOIN tot t
),
wtot AS (SELECT CAST(sum(wq) AS BIGINT) AS wt FROM w),
base AS (
  SELECT w.lang, w.n_docs, w.p_s, w.wq,
         CAST(({_MIX_K} * w.wq) // t.wt AS BIGINT) AS floor_q,
         CAST(({_MIX_K} * w.wq) % t.wt AS BIGINT) AS rem
  FROM w CROSS JOIN wtot t
),
quota AS (
  SELECT lang, n_docs, p_s, wq, floor_q,
         CAST(floor_q + CASE WHEN
              row_number() OVER (ORDER BY rem DESC, lang)
              <= {_MIX_K} - (SELECT sum(floor_q) FROM base)
              THEN 1 ELSE 0 END AS BIGINT) AS quota
  FROM base
)
SELECT lang, n_docs, p_s,
       floor(CAST(wq AS DOUBLE) / (SELECT wt FROM wtot) * 1e6 + 0.5)
         / 1e6 AS weight_s,
       quota
FROM quota
ORDER BY lang
"""


@register("curation_temperature_mix", oracle=_TEMP_MIX_ORACLE)
def curation_temperature_mix(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha = 0.3) language mixture weights and
    the exact 10,000-slot Hamilton quota per language."""
    from ..operators.sampling import hamilton_quota

    cls = load(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    tot = cls.agg(F.sum("n_docs").cast("long").alias("n"))
    w = cls.crossJoin(F.broadcast(tot)).select(
        "lang", "n_docs",
        _snap6(F.col("n_docs").cast("double") / F.col("n")).alias("p_s"),
        F.floor(
            F.exp(_MIX_ALPHA
                  * _snap6(F.log(F.col("n_docs").cast("double")
                                 / F.col("n"))))
            * 1e6 + 0.5).cast("long").alias("wq"),
    )
    # Hamilton on the integer tempered weights: proportional to wq
    quotas = hamilton_quota(
        w.select("lang", F.col("wq").alias("n_docs")),
        _MIX_K, n_col="n_docs", key_cols=("lang",),
    ).select("lang", F.col("quota"))
    wtot = w.agg(F.sum("wq").cast("long").alias("wt"))
    return (
        w.join(quotas, "lang")
        .crossJoin(F.broadcast(wtot))
        .select(
            "lang", "n_docs", "p_s",
            _snap6(F.col("wq").cast("double") / F.col("wt"))
            .alias("weight_s"),
            "quota",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Permutation test. Observed diff and B permuted diffs from ONE
# fan-out: each row explodes into b = 0..B (b = 0 keeps the real
# label; b >= 1 assigns by the md5 coin with the permutation index
# salted in). Group sums are exact; diffs compare as |d_q| on a
# common denominator (n1*n2 cross-multiplied to avoid division) --
# fully integer until the final p-value snap.
# ---------------------------------------------------------------------------

_PERM_B = 20

_PERM_ORACLE = f"""
WITH scored AS (
  SELECT vec_id,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS xq,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS g
  FROM embeddings
),
fan AS (
  SELECT s.vec_id, s.xq,
         CAST(b.b AS BIGINT) AS b,
         CASE WHEN b.b = 0 THEN s.g
              WHEN CAST(('0x' || substr(md5(CAST(s.vec_id AS VARCHAR)
                   || ':' || CAST(b.b AS VARCHAR)), 1, 6)) AS BIGINT)
                   % 10 = 0 THEN 1 ELSE 0 END AS g
  FROM scored s
  CROSS JOIN (SELECT unnest(range(0, {_PERM_B + 1})) AS b) b
),
sums AS (
  SELECT b,
         CAST(sum(CASE WHEN g = 1 THEN xq ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN g = 0 THEN xq ELSE 0 END) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM fan GROUP BY b
),
d AS (
  SELECT b,
         CASE WHEN n1 > 0 AND n2 > 0 THEN
           abs(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
         END AS ad
  FROM sums
),
obs AS (SELECT ad AS obs_ad FROM d WHERE b = 0)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d
        WHERE b > 0 AND ad IS NOT NULL) AS n_perms,
       floor(o.obs_ad + 0.5) / 1e6 AS obs_diff_s,
       floor(CAST((SELECT count(*) FROM d, obs
                   WHERE d.b > 0 AND d.ad IS NOT NULL
                     AND d.ad >= obs.obs_ad) AS DOUBLE)
             / nullif((SELECT count(*) FROM d
                       WHERE b > 0 AND ad IS NOT NULL), 0)
             * 1e6 + 0.5) / 1e6 AS p_value_s
FROM obs o
"""


@register("stat_permutation_test", oracle=_PERM_ORACLE)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-coin permutation test of the class-0-vs-rest
    mean score difference (B = 20 label reassignments)."""
    scored = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6 + 0.5)
        .cast("long").alias("xq"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("g"),
    )
    from ..functions.text import md5_bucket

    # THE shared 6-hex bucket coin (functions/text.py) -- identical
    # arithmetic, one source, like every other sampler surface
    coin = md5_bucket(
        F.concat(F.col("vec_id").cast("string"), F.lit(":"),
                 F.col("b").cast("string")).cast("binary"), 10)

    fan = (
        scored.crossJoin(F.broadcast(
            spark.range(_PERM_B + 1).select(
                F.col("id").cast("long").alias("b"))))
        .select(
            "vec_id", "xq", "b",
            F.when(F.col("b") == 0, F.col("g"))
            .otherwise(F.when(coin == 0, 1).otherwise(0)).alias("g"),
        )
    )
    sums = fan.groupBy("b").agg(
        F.sum(F.when(F.col("g") == 1, F.col("xq")).otherwise(0))
        .cast("long").alias("s1"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("g") == 0, F.col("xq")).otherwise(0))
        .cast("long").alias("s2"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long")
        .alias("n2"),
    )
    ad = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        F.abs(F.col("s1").cast("double") / F.col("n1")
              - F.col("s2").cast("double") / F.col("n2")))
    d = sums.select("b", ad.alias("ad")).localCheckpoint(eager=True)
    obs = d.where(F.col("b") == 0).select(
        F.col("ad").alias("obs_ad"))
    perms = d.where(F.col("b") > 0).where(F.col("ad").isNotNull())
    hits = (
        perms.crossJoin(F.broadcast(obs))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_perms"),
            F.sum(F.when(F.col("ad") >= F.col("obs_ad"), 1).otherwise(0))
            .cast("long").alias("n_hits"),
        )
    )
    return (
        hits.crossJoin(F.broadcast(obs))
        .select(
            "n_perms",
            (F.floor(F.col("obs_ad") + 0.5) / 1e6).alias("obs_diff_s"),
            _snap6(F.col("n_hits").cast("double")
                   / F.nullif(F.col("n_perms"), F.lit(0)))
            .alias("p_value_s"),
        )
    )
