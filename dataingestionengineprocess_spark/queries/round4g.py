"""Round-4 (continued) additions: statistical-dependence and
data-governance diagnostics -- the release checks a training-data
platform runs on a candidate table. All under the hash-checked gate.

- `stat_chi2_independence` -- chi-squared test of lang x source
  independence + Cramer's V from exact integer observed counts (is
  the language mix uniform across sources, or is a source skewed?).
- `ml_mutual_information` -- mutual information (+ entropies and
  normalized MI) between the document length band and the language:
  the model-free feature-dependence number behind feature selection.
- `text_source_ngram_overlap` -- pairwise cross-source 3-gram
  contamination matrix (Jaccard + containment per source pair): the
  "which sources copy from each other" diagnostic that decides
  whether per-source dedup is enough.
- `gov_l_diversity_audit` -- l-diversity complement to the
  k-anonymity audit: per equivalence class the count of DISTINCT
  sensitive values; homogeneous classes (l = 1) are attribute-
  disclosure risks even when k is large.
- `gov_dp_noisy_counts` -- Laplace-mechanism release of per-source
  counts with a DETERMINISTIC portable noise draw (md5-uniform
  through the inverse CDF), so the DP release shape is testable
  bit-for-bit in both engines.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[C] quality/governance families (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import md5_bucket, shingles
from ..operators.skew import spread_input
from . import register
from ..functions.exact import snap6 as _snap6, q6 as _q6


# ---------------------------------------------------------------------------
# Chi-squared independence of lang x source. Observed counts are the
# checkpointed contingency table (<= |langs| x |sources| rows --
# bounded model state); the cell grid is DENSIFIED to the full
# langs x sources cross product so observed-zero cells (whose
# contribution is exactly their expectation e) are counted -- a
# sparse groupBy alone undercounts chi2 for strongly-associated
# tables. Expected cells e = row_tot * col_tot / n ride doubles built
# by the identical division order in both engines; the chi2 sum is
# int64-quantized per cell. Cramer's V normalizes by min(r-1, c-1) so
# the strength is comparable across table shapes.
#
# Scale: ONE corpus groupBy (map-side combinable); everything after
# runs on the bounded margin tables (the dense grid is r x c rows,
# built from the broadcast margins, never from the corpus).
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cm AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
),
rows_m AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r_tot FROM cm
           GROUP BY lang),
cols_m AS (SELECT source, CAST(sum(o) AS BIGINT) AS c_tot FROM cm
           GROUP BY source),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(count(DISTINCT lang) AS BIGINT) AS r,
               CAST(count(DISTINCT source) AS BIGINT) AS c
        FROM cm),
grid AS (
  SELECT rm.lang, cm_c.source, rm.r_tot, cm_c.c_tot,
         COALESCE(cm.o, 0) AS o
  FROM rows_m rm CROSS JOIN cols_m cm_c
  LEFT JOIN cm ON cm.lang = rm.lang AND cm.source = cm_c.source
),
cells AS (
  SELECT CAST(floor(
           (CAST(g.o AS DOUBLE)
              - CAST(g.r_tot AS DOUBLE) * g.c_tot / tot.n)
           * (CAST(g.o AS DOUBLE)
              - CAST(g.r_tot AS DOUBLE) * g.c_tot / tot.n)
           / (CAST(g.r_tot AS DOUBLE) * g.c_tot / tot.n)
           * 1e6 + 0.5) AS BIGINT) AS cell_q
  FROM grid g, tot
)
SELECT tot.n,
       (tot.r - 1) * (tot.c - 1) AS dof,
       CAST(sum(cell_q) AS DOUBLE) / 1e6 AS chi2_s,
       floor(sqrt((CAST(sum(cell_q) AS DOUBLE) / 1e6)
                  / (tot.n * least(tot.r - 1, tot.c - 1)))
             * 1e6 + 0.5) / 1e6 AS cramers_v_s
FROM cells, tot
GROUP BY tot.n, tot.r, tot.c
"""


@register("stat_chi2_independence", oracle=_CHI2_ORACLE)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared statistic + Cramer's V for lang x source, from the
    checkpointed exact contingency table."""
    docs = load(spark, sf_dir, "documents")
    cm = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .localCheckpoint(eager=True)
    )
    rows_m = cm.groupBy("lang").agg(F.sum("o").cast("long").alias("r_tot"))
    cols_m = cm.groupBy("source").agg(F.sum("o").cast("long").alias("c_tot"))
    tot = cm.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("lang").cast("long").alias("r"),
        F.countDistinct("source").cast("long").alias("c"),
    )
    e = F.col("r_tot").cast("double") * F.col("c_tot") / F.col("n")
    grid = (
        rows_m.crossJoin(cols_m)
        .join(F.broadcast(cm), ["lang", "source"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    cells = (
        grid.crossJoin(F.broadcast(tot))
        .select(
            "n", "r", "c",
            _q6((F.col("o").cast("double") - e)
                * (F.col("o").cast("double") - e) / e).alias("cell_q"),
        )
    )
    chi2 = F.sum("cell_q").cast("double") / 1e6
    return (
        cells.groupBy("n", "r", "c")
        .agg(chi2.alias("chi2_raw"))
        .select(
            "n",
            ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
            F.col("chi2_raw").alias("chi2_s"),
            _snap6(F.sqrt(F.col("chi2_raw")
                          / (F.col("n")
                             * F.least(F.col("r") - 1, F.col("c") - 1))))
            .alias("cramers_v_s"),
        )
    )


# ---------------------------------------------------------------------------
# Mutual information between the 100-char length band and the
# language:  I(X;Y) = sum p_xy ln(p_xy / (p_x p_y)), plus marginal
# entropies and the normalized MI  I / sqrt(H_x H_y). Same quantized-
# reduce recipe as the KL query; the joint table is checkpointed
# bounded model state (|bands| x |langs|).
# ---------------------------------------------------------------------------

_MI_ORACLE = """
WITH j AS (
  SELECT CAST(floor(n_chars / 100.0) AS BIGINT) AS x, lang AS y,
         CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM j GROUP BY x),
my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM j GROUP BY y),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
mi AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(j.c AS DOUBLE) / tot.n)
           * ln((CAST(j.c AS DOUBLE) / tot.n)
                / ((CAST(mx.cx AS DOUBLE) / tot.n)
                   * (CAST(my.cy AS DOUBLE) / tot.n)))
           * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS mi_q
  FROM j JOIN mx USING (x) JOIN my USING (y), tot
),
hx AS (
  SELECT CAST(sum(CAST(floor(
           -(CAST(cx AS DOUBLE) / tot.n) * ln(CAST(cx AS DOUBLE) / tot.n)
           * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS hx_q
  FROM mx, tot
),
hy AS (
  SELECT CAST(sum(CAST(floor(
           -(CAST(cy AS DOUBLE) / tot.n) * ln(CAST(cy AS DOUBLE) / tot.n)
           * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS hy_q
  FROM my, tot
)
SELECT tot.n,
       CAST(mi.mi_q AS DOUBLE) / 1e6 AS mi_s,
       CAST(hx.hx_q AS DOUBLE) / 1e6 AS h_band_s,
       CAST(hy.hy_q AS DOUBLE) / 1e6 AS h_lang_s,
       floor((CAST(mi.mi_q AS DOUBLE) / 1e6)
             / sqrt((CAST(hx.hx_q AS DOUBLE) / 1e6)
                    * (CAST(hy.hy_q AS DOUBLE) / 1e6))
             * 1e6 + 0.5) / 1e6 AS nmi_s
FROM mi, hx, hy, tot
"""


@register("ml_mutual_information", oracle=_MI_ORACLE)
def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI, marginal entropies, and normalized MI between the length
    band and the language, via quantized exact-count reduces."""
    docs = load(spark, sf_dir, "documents")
    j = (
        docs.select(
            F.floor(F.col("n_chars") / 100.0).cast("long").alias("x"),
            F.col("lang").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    mx = j.groupBy("x").agg(F.sum("c").cast("long").alias("cx"))
    my = j.groupBy("y").agg(F.sum("c").cast("long").alias("cy"))
    tot = j.agg(F.sum("c").cast("long").alias("n"))

    p_xy = F.col("c").cast("double") / F.col("n")
    p_x = F.col("cx").cast("double") / F.col("n")
    p_y = F.col("cy").cast("double") / F.col("n")
    mi = (
        j.join(F.broadcast(mx), "x").join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(_q6(p_xy * F.log(p_xy / (p_x * p_y))))
             .cast("long").alias("mi_q"))
    )
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .agg(F.sum(_q6(-p_x * F.log(p_x))).cast("long").alias("hx_q"))
    )
    hy = (
        my.crossJoin(F.broadcast(tot))
        .agg(F.sum(_q6(-p_y * F.log(p_y))).cast("long").alias("hy_q"))
    )
    mi_s = F.col("mi_q").cast("double") / 1e6
    hx_s = F.col("hx_q").cast("double") / 1e6
    hy_s = F.col("hy_q").cast("double") / 1e6
    return (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            mi_s.alias("mi_s"),
            hx_s.alias("h_band_s"),
            hy_s.alias("h_lang_s"),
            _snap6(mi_s / F.sqrt(hx_s * hy_s)).alias("nmi_s"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source 3-gram contamination matrix. The per-source gram SETS
# (distinct) shrink first; the pair fan-out is an equi-join on the
# gram -- the same candidate machinery as the dedup family, never an
# all-pairs document comparison. Jaccard says "how much do the two
# corpora overlap"; containment (of the smaller side) says "is one a
# subset of the other" -- the two numbers that decide whether global
# (not per-source) dedup is required.
#
# Scale: distinct (source, gram) is one shuffle; the gram join's
# fan-out is bounded by |sources| per gram after the distinct, and
# the output groupBy has <= |sources|^2 keys.
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH sg AS (
  SELECT DISTINCT source,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in range(1, len(t) - 1)])) AS g
  FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_g FROM sg
          GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.n_common,
       floor(CAST(i.n_common AS DOUBLE)
             / (sa.n_g + sb.n_g - i.n_common) * 1e6 + 0.5) / 1e6
         AS jaccard_s,
       floor(CAST(i.n_common AS DOUBLE) / least(sa.n_g, sb.n_g)
             * 1e6 + 0.5) / 1e6 AS containment_s
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b
ORDER BY src_a, src_b
"""


@register("text_source_ngram_overlap", oracle=_OVERLAP_ORACLE)
def text_source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source 3-gram Jaccard + smaller-side containment --
    the cross-source contamination matrix."""
    docs = load(spark, sf_dir, "documents")
    # Checkpoint the distinct gram set: a/b self-join sides and both
    # size lookups would otherwise each re-run the shingle explode +
    # distinct (4 corpus scans; one suffices).
    sg = (
        spread_input(docs)
        .select("source", F.explode(shingles("text", 3)).alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sg.groupBy("source").agg(F.count(F.lit(1)).cast("long")
                                     .alias("n_g"))
    a = sg.alias("a")
    b = sg.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"),
                 F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"),
                      F.col("n_g").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"),
                      F.col("n_g").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_common",
            _snap6(F.col("n_common").cast("double")
                   / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
            .alias("jaccard_s"),
            _snap6(F.col("n_common").cast("double")
                   / F.least("n_a", "n_b")).alias("containment_s"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# l-diversity audit: same equivalence classes as the k-anonymity
# audit's quasi-identifier, but the risk measure is the DISTINCT
# count of the sensitive attribute (market segment) inside each
# class -- a class with l = 1 leaks the sensitive value for every
# member no matter how large k is. QI here = (nation, balance band).
#
# Scale: distinct (QI, sensitive) then two class-level aggs -- all
# map-side combinable, no joins.
# ---------------------------------------------------------------------------

_LDIV_K = 2

_LDIV_ORACLE = f"""
WITH cls AS (
  SELECT c_nationkey, bal_band,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l,
         CAST(count(*) AS BIGINT) AS k
  FROM (SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               c_mktsegment
        FROM customer)
  GROUP BY c_nationkey, bal_band
)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(l) AS BIGINT) AS min_l,
       CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_homogeneous,
       CAST(sum(CASE WHEN l < {_LDIV_K} THEN k ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       CAST(sum(k) AS BIGINT) AS n_rows
FROM cls
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("gov_l_diversity_audit", oracle=_LDIV_ORACLE)
def gov_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation l-diversity report over (nation, balance-band)
    classes with market segment as the sensitive attribute."""
    cust = load(spark, sf_dir, "customer")
    cls = (
        cust.select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long")
            .alias("bal_band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.countDistinct("c_mktsegment").cast("long").alias("l"),
            F.count(F.lit(1)).cast("long").alias("k"),
        )
    )
    return (
        cls.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("l").alias("min_l"),
            F.sum(F.when(F.col("l") == 1, 1).otherwise(0)).cast("long")
            .alias("n_homogeneous"),
            F.sum(F.when(F.col("l") < _LDIV_K, F.col("k")).otherwise(0))
            .cast("long").alias("rows_at_risk"),
            F.sum("k").cast("long").alias("n_rows"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Laplace-mechanism noisy counts (per-source document counts,
# sensitivity 1, epsilon = 1). The noise draw is the md5 coin pushed
# through the inverse CDF:
#     u ~ Uniform(-1/2, 1/2)  (6 md5 hex digits mod 999999, shifted)
#     noise = -b * sign(u) * ln(1 - 2|u|),   b = 1/eps
# with ln's argument built identically in both engines and the noise
# snapped to 1e-6 before the add -- a bit-reproducible stand-in for a
# production RNG (swap the coin, keep the plan). u = 0 maps to zero
# noise. The modulus is 999999 (odd), NOT 1e6: m in [0, 999998]
# centers to u in [-0.499999, 0.499999], so 1 - 2|u| >= 2e-6 and ln
# never sees 0 -- a mod-1e6 coin reaches u = -0.5 exactly and
# ln(0) hard-errors the oracle.
#
# Scale: one count groupBy; the noise is a per-group scalar map.
# ---------------------------------------------------------------------------

_DP_EPS = 1.0

_DP_ORACLE = f"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS true_n FROM documents
  GROUP BY source
),
u AS (
  SELECT source, true_n,
         (CAST(CAST('0x' || substr(md5(source || ':dp'), 1, 6) AS BIGINT)
               % 999999 AS DOUBLE) - 499999.0) / 1000000.0 AS u
  FROM c
)
SELECT source, true_n,
       floor((CASE WHEN u = 0 THEN 0.0
                   WHEN u > 0 THEN -(1.0 / {_DP_EPS}) * ln(1.0 - 2.0 * u)
                   ELSE (1.0 / {_DP_EPS}) * ln(1.0 + 2.0 * u)
              END) * 1e6 + 0.5) / 1e6 AS noise_s,
       true_n + floor((CASE WHEN u = 0 THEN 0.0
                   WHEN u > 0 THEN -(1.0 / {_DP_EPS}) * ln(1.0 - 2.0 * u)
                   ELSE (1.0 / {_DP_EPS}) * ln(1.0 + 2.0 * u)
              END) * 1e6 + 0.5) / 1e6 AS noisy_n_s
FROM u
ORDER BY source
"""


@register("gov_dp_noisy_counts", oracle=_DP_ORACLE)
def gov_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism per-source counts with a deterministic
    md5-derived noise draw (portable inverse-CDF)."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("true_n"))
    u = (
        (md5_bucket(F.concat(F.col("source"), F.lit(":dp")), 999999)
         .cast("double") - 499999.0) / 1000000.0
    )
    b = 1.0 / _DP_EPS
    noise = F.when(u == 0, F.lit(0.0)).when(
        u > 0, -b * F.log(1.0 - 2.0 * u)
    ).otherwise(b * F.log(1.0 + 2.0 * u))
    noise_s = _snap6(noise)
    return c.select(
        "source", "true_n",
        noise_s.alias("noise_s"),
        (F.col("true_n") + noise_s).alias("noisy_n_s"),
    ).orderBy("source")
