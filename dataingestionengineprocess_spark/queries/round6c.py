"""Round-6c queries: binary-quantized ANN, MMR diversification, and
four portable statistics/ML certificates.

- ``embedding_binary_quantize``: 1-bit (sign) embedding quantization
  packed into two 32-bit words, Hamming-distance candidate gen via
  ``bit_count(xor)``, exact-cosine re-rank -- the modern memory-32x
  ANN compression path (e.g. binary MRL / BQ in vector stores).
- ``knn_mmr_diversify``: maximal marginal relevance (Carbonell &
  Goldstein 1998) top-3 selection, lambda = 0.7, greedily unrolled as
  three join+argmax stages in PURE INT64 arithmetic (7*rel_q -
  3*sim_q) -- zero float drift across engines.
- ``ml_gmm_em_portable``: one exact EM step of a two-component
  equal-variance 1-D Gaussian mixture; the one engine-sensitive step
  (exp in the responsibility) snaps to the 1e-6 grid BEFORE the
  weighted reduce, the `ml_logreg_portable` idiom.
- ``ml_ols_normal_equations``: two-feature OLS fit in closed form --
  the normal equations' 3x3 system solved by Cramer's rule over
  int64-quantized moment sums. ONE scan, no iteration.
- ``stat_kendall_tau``: Kendall tau-b per nation over within-group
  pairs (concordant/discordant/tie counting, all integers).
- ``stat_benjamini_hochberg``: BH step-up FDR control over per-event-
  type z-tests, with the Abramowitz--Stegun 26.2.17 normal-CDF
  polynomial implemented identically on both engines.

Exactness: every cross-engine reduce is an int64 sum of quantized
per-row terms; transcendentals (exp) snap to 1e-6 before any reduce;
final doubles are single divisions of identical integers or
snap6-gridded. Reference parity: diagram-only reference (SURVEY.md
§0); these extend the [C] LLM-pipeline / analytics surface.

Registered LAST (queries/__init__._load_all): new unverified queries
append BEHIND the already pre-flighted driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import q6, snap6
from . import register

# ---------------------------------------------------------------------------
# Binary quantization + Hamming candidate generation + exact re-rank.
#
# Scale: the sign-bit packing is one narrow projection (64 floats ->
# 2 longs, 32x smaller); Hamming against the broadcast query words is
# two xors + two popcounts per row, whole-stage codegen; only the
# top-32 Hamming survivors per query pay the exact-cosine re-rank.
# At 100 TB the packed table is the only full scan and the re-rank is
# O(32 * n_queries).
# ---------------------------------------------------------------------------

_BQ_NQ = 5         # query vectors: vec_id < 5
_BQ_CAND = 32      # Hamming candidates per query
_BQ_TOPK = 5       # re-ranked output per query

_BQ_WORDS_SQL = """
bits AS (
  SELECT vec_id, j,
         CASE WHEN (embedding::DOUBLE[])[j + 1] > 0 THEN 1 ELSE 0 END
           AS b
  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS j)
),
words AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN j < 32 THEN b * power(2, j) ELSE 0 END)
              AS BIGINT) AS w1,
         CAST(sum(CASE WHEN j >= 32 THEN b * power(2, j - 32) ELSE 0 END)
              AS BIGINT) AS w2
  FROM bits GROUP BY vec_id
)
"""

_BQ_ORACLE = f"""
WITH {_BQ_WORDS_SQL},
ham AS (
  SELECT q.vec_id AS qid, c.vec_id AS nid,
         bit_count(xor(q.w1, c.w1)) + bit_count(xor(q.w2, c.w2))
           AS hamming
  FROM words q JOIN words c ON q.vec_id < {_BQ_NQ}
                            AND c.vec_id <> q.vec_id
),
cand AS (
  SELECT qid, nid, hamming,
         row_number() OVER (PARTITION BY qid
                            ORDER BY hamming, nid) AS hr
  FROM ham
),
rer AS (
  SELECT c.qid, c.nid, c.hamming,
         CAST(floor(list_dot_product(qe.embedding::DOUBLE[],
                                     ce.embedding::DOUBLE[])
              / (sqrt(list_dot_product(qe.embedding::DOUBLE[],
                                       qe.embedding::DOUBLE[]))
                 * sqrt(list_dot_product(ce.embedding::DOUBLE[],
                                         ce.embedding::DOUBLE[])))
              * 1e6 + 0.5) AS BIGINT) AS cosq
  FROM cand c
  JOIN embeddings qe ON qe.vec_id = c.qid
  JOIN embeddings ce ON ce.vec_id = c.nid
  WHERE c.hr <= {_BQ_CAND}
),
final AS (
  SELECT qid, nid, CAST(hamming AS BIGINT) AS hamming,
         cosq / 1e6 AS cos_s,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosq DESC, nid) AS rr
  FROM rer
)
SELECT qid, nid, hamming, cos_s
FROM final WHERE rr <= {_BQ_TOPK} ORDER BY qid, cos_s DESC, nid
"""


def _sign_words(emb: DataFrame) -> DataFrame:
    """(vec_id, w1, w2): the 64 sign bits packed into two 32-bit
    words -- posexplode + one groupBy, never a per-row UDF."""
    from ..functions.vectors import as_double

    bit = (F.col("val") > 0).cast("long")
    return (
        emb.select("vec_id",
                   F.posexplode(as_double("embedding"))
                   .alias("j", "val"))
        .groupBy("vec_id")
        .agg(F.sum(F.when(F.col("j") < 32,
                          bit * F.pow(F.lit(2.0), F.col("j")))
                   .otherwise(0.0)).cast("long").alias("w1"),
             F.sum(F.when(F.col("j") >= 32,
                          bit * F.pow(F.lit(2.0), F.col("j") - 32))
                   .otherwise(0.0)).cast("long").alias("w2"))
    )


@register("embedding_binary_quantize", oracle=_BQ_ORACLE)
def embedding_binary_quantize(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Sign-bit binary quantization ANN: Hamming top-32 candidates
    (bit_count(xor) over two packed words) re-ranked by exact cosine
    to top-5 per query. grouped_rank for both per-query ranks (query
    universe = {_BQ_NQ}, bounded)."""
    from ..functions.vectors import as_double, dot, l2_norm
    from ..operators.ranking import grouped_rank

    emb = load(spark, sf_dir, "embeddings")
    words = _sign_words(emb).localCheckpoint(eager=True)
    qw = words.where(F.col("vec_id") < _BQ_NQ).select(
        F.col("vec_id").alias("qid"), F.col("w1").alias("qw1"),
        F.col("w2").alias("qw2"))
    ham = (
        words.crossJoin(F.broadcast(qw))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nid"),
                (F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
                 + F.bit_count(F.col("w2").bitwiseXOR(F.col("qw2"))))
                .cast("long").alias("hamming"))
    )
    cand = grouped_rank(ham, ["qid"], ["hamming", "nid"], "hr",
                        known_group_count=_BQ_NQ) \
        .where(F.col("hr") <= _BQ_CAND)
    # norms computed once per side, not re-folded per candidate pair
    # (same fold/sqrt/division as cosine() -- bit-identical q6 values)
    vecs = emb.select("vec_id", as_double("embedding").alias("v")) \
        .withColumn("n", l2_norm(F.col("v")))
    qv = vecs.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                     F.col("n").alias("qn"))
    cv = vecs.select(F.col("vec_id").alias("nid"), F.col("v").alias("cv"),
                     F.col("n").alias("cn"))
    rer = (
        cand.join(F.broadcast(qv), "qid").join(cv, "nid")
        .select("qid", "nid", "hamming",
                q6(dot(F.col("qv"), F.col("cv"))
                   / (F.col("qn") * F.col("cn"))).alias("cosq"))
        # derive, don't re-fold: the 64-dim cosine aggregate doesn't
        # codegen, so repeating it would compute the fold twice
        .withColumn("ncosq", -F.col("cosq"))
    )
    top = grouped_rank(rer, ["qid"], ["ncosq", "nid"], "rr",
                       known_group_count=_BQ_NQ) \
        .where(F.col("rr") <= _BQ_TOPK)
    return (
        top.select("qid", "nid", "hamming",
                   (F.col("cosq") / 1e6).alias("cos_s"))
        .orderBy("qid", F.desc("cos_s"), "nid")
    )


# ---------------------------------------------------------------------------
# Maximal marginal relevance, unrolled greedy k = 3 over a top-8
# candidate pool per query. Objective in 1e-7-unit integers:
# obj = 7 * rel_q - 3 * max_sim_q (rel_q, sim_q are q6 cosines), so
# the argmax chain is exact integer comparison -- no float drift can
# flip a selection. Tie rule: (obj desc, nid asc).
#
# Scale: the pool build is the bucketed-ANN contract (here exact
# top-8 per query); the greedy steps touch only |pool|^2 pairs per
# query -- constant work per query regardless of corpus size.
# ---------------------------------------------------------------------------

_MMR_NQ = 3    # queries: vec_id in (0, 1, 2)
_MMR_POOL = 8

_MMR_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_MMR_NQ}
),
c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
rel AS (
  SELECT qid, nid,
         CAST(floor(list_dot_product(qv, cv)
              / (sqrt(list_dot_product(qv, qv))
                 * sqrt(list_dot_product(cv, cv))) * 1e6 + 0.5)
           AS BIGINT) AS rel_q
  FROM q JOIN c ON nid <> qid
),
pool AS (
  SELECT qid, nid, rel_q FROM (
    SELECT qid, nid, rel_q,
           row_number() OVER (PARTITION BY qid
                              ORDER BY rel_q DESC, nid) AS rn
    FROM rel
  ) WHERE rn <= {_MMR_POOL}
),
sims AS (
  SELECT a.qid, a.nid AS na, b.nid AS nb,
         CAST(floor(list_dot_product(ea.embedding::DOUBLE[],
                                     eb.embedding::DOUBLE[])
              / (sqrt(list_dot_product(ea.embedding::DOUBLE[],
                                       ea.embedding::DOUBLE[]))
                 * sqrt(list_dot_product(eb.embedding::DOUBLE[],
                                         eb.embedding::DOUBLE[])))
              * 1e6 + 0.5) AS BIGINT) AS sim_q
  FROM pool a
  JOIN pool b ON b.qid = a.qid AND b.nid <> a.nid
  JOIN embeddings ea ON ea.vec_id = a.nid
  JOIN embeddings eb ON eb.vec_id = b.nid
),
s1 AS (
  SELECT p.qid, min(p.nid) AS nid, max(p.rel_q * 7) AS obj
  FROM pool p
  JOIN (SELECT qid, max(rel_q) AS mx FROM pool GROUP BY qid) m
    ON m.qid = p.qid AND p.rel_q = m.mx
  GROUP BY p.qid
),
o2 AS (
  SELECT p.qid, p.nid, 7 * p.rel_q - 3 * s.sim_q AS obj
  FROM pool p
  JOIN s1 ON s1.qid = p.qid AND p.nid <> s1.nid
  JOIN sims s ON s.qid = p.qid AND s.na = p.nid AND s.nb = s1.nid
),
s2 AS (
  SELECT o.qid, min(o.nid) AS nid, max(o.obj) AS obj
  FROM o2 o
  JOIN (SELECT qid, max(obj) AS mx FROM o2 GROUP BY qid) m
    ON m.qid = o.qid AND o.obj = m.mx
  GROUP BY o.qid
),
o3 AS (
  SELECT p.qid, p.nid,
         7 * p.rel_q - 3 * greatest(sa.sim_q, sb.sim_q) AS obj
  FROM pool p
  JOIN s1 ON s1.qid = p.qid AND p.nid <> s1.nid
  JOIN s2 ON s2.qid = p.qid AND p.nid <> s2.nid
  JOIN sims sa ON sa.qid = p.qid AND sa.na = p.nid AND sa.nb = s1.nid
  JOIN sims sb ON sb.qid = p.qid AND sb.na = p.nid AND sb.nb = s2.nid
),
s3 AS (
  SELECT o.qid, min(o.nid) AS nid, max(o.obj) AS obj
  FROM o3 o
  JOIN (SELECT qid, max(obj) AS mx FROM o3 GROUP BY qid) m
    ON m.qid = o.qid AND o.obj = m.mx
  GROUP BY o.qid
)
SELECT qid, CAST(step AS BIGINT) AS step, nid, obj / 1e7 AS obj_s
FROM (SELECT qid, 1 AS step, nid, obj FROM s1
      UNION ALL SELECT qid, 2, nid, obj FROM s2
      UNION ALL SELECT qid, 3, nid, obj FROM s3)
ORDER BY qid, step
"""


@register("knn_mmr_diversify", oracle=_MMR_ORACLE)
def knn_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR top-3 (lambda = 0.7) over exact top-8 cosine pools, greedy
    steps unrolled as integer argmax joins."""
    from ..functions.vectors import as_double, dot, l2_norm
    from ..operators.ranking import grouped_rank

    emb = load(spark, sf_dir, "embeddings")
    # norms once per vector, reused by the relevance scan AND both
    # sides of the pool-pair similarity scan below (cosine() would
    # re-fold them per pair; dot/(n*n) is the same fold/sqrt/division,
    # bit-identical q6 values)
    vecs = emb.select("vec_id", as_double("embedding").alias("v")) \
        .withColumn("n", l2_norm(F.col("v")))
    qv = vecs.where(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("n").alias("qn"))
    rel = (
        vecs.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nid"),
                q6(dot("qv", "v") / (F.col("qn") * F.col("n")))
                .alias("rel_q"))
        .withColumn("nrel", -F.col("rel_q"))
    )
    pool = (
        grouped_rank(rel, ["qid"], ["nrel", "nid"], "rn",
                     known_group_count=_MMR_NQ)
        .where(F.col("rn") <= _MMR_POOL)
        .select("qid", "nid", "rel_q")
        .localCheckpoint(eager=True)  # feeds sims + all three steps
    )
    pv = vecs.select(F.col("vec_id").alias("pvid"), F.col("v"), F.col("n"))
    pa = pool.join(pv, pool["nid"] == F.col("pvid")) \
        .select("qid", F.col("nid").alias("na"), F.col("v").alias("va"),
                F.col("n").alias("nna"))
    pb = pool.join(pv, pool["nid"] == F.col("pvid")) \
        .select(F.col("qid").alias("qb"), F.col("nid").alias("nb"),
                F.col("v").alias("vb"), F.col("n").alias("nnb"))
    sims = (
        pa.join(pb, (F.col("qb") == F.col("qid"))
                & (F.col("nb") != F.col("na")))
        .select("qid", "na", "nb",
                q6(dot("va", "vb") / (F.col("nna") * F.col("nnb")))
                .alias("sim_q"))
        .localCheckpoint(eager=True)  # reused by steps 2 and 3
    )

    def argmax(objs: DataFrame) -> DataFrame:
        """Deterministic per-qid argmax: max obj, tie -> min nid."""
        mx = objs.groupBy("qid").agg(F.max("obj").alias("mx"))
        return (
            objs.join(F.broadcast(mx), "qid")
            .where(F.col("obj") == F.col("mx"))
            .groupBy("qid")
            .agg(F.min("nid").alias("nid"), F.max("obj").alias("obj"))
        )

    s1 = argmax(pool.select("qid", "nid",
                            (F.col("rel_q") * 7).alias("obj")))
    s1k = s1.select("qid", F.col("nid").alias("s1_nid"))
    o2 = (
        pool.join(F.broadcast(s1k), "qid")
        .where(F.col("nid") != F.col("s1_nid"))
        .join(sims, (sims["qid"] == pool["qid"])
              & (sims["na"] == pool["nid"])
              & (sims["nb"] == F.col("s1_nid")))
        .select(pool["qid"], pool["nid"],
                (7 * F.col("rel_q") - 3 * F.col("sim_q")).alias("obj"))
    )
    s2 = argmax(o2)
    s2k = s2.select("qid", F.col("nid").alias("s2_nid"))
    sa = sims.select("qid", "na", "nb", F.col("sim_q").alias("sim_a"))
    sb = sims.select(F.col("qid").alias("q2"), F.col("na").alias("na2"),
                     F.col("nb").alias("nb2"),
                     F.col("sim_q").alias("sim_b"))
    o3 = (
        pool.join(F.broadcast(s1k), "qid")
        .join(F.broadcast(s2k), "qid")
        .where((F.col("nid") != F.col("s1_nid"))
               & (F.col("nid") != F.col("s2_nid")))
        .join(sa, (sa["qid"] == pool["qid"]) & (sa["na"] == pool["nid"])
              & (sa["nb"] == F.col("s1_nid")))
        .join(sb, (F.col("q2") == pool["qid"])
              & (F.col("na2") == pool["nid"])
              & (F.col("nb2") == F.col("s2_nid")))
        .select(pool["qid"], pool["nid"],
                (7 * F.col("rel_q")
                 - 3 * F.greatest("sim_a", "sim_b")).alias("obj"))
    )
    s3 = argmax(o3)
    out = (
        s1.select("qid", F.lit(1).alias("step"), "nid", "obj")
        .unionByName(s2.select("qid", F.lit(2).alias("step"), "nid", "obj"))
        .unionByName(s3.select("qid", F.lit(3).alias("step"), "nid", "obj"))
    )
    return out.select("qid", F.col("step").cast("long").alias("step"),
                      "nid", (F.col("obj") / 1e7).alias("obj_s")) \
        .orderBy("qid", "step")


# ---------------------------------------------------------------------------
# One exact EM step of a 1-D two-component equal-variance GMM on
# o_totalprice. Responsibilities close over a sigmoid of the
# squared-distance gap; snapped to 1e-6 BEFORE the weighted M-step
# reduce (ml_logreg_portable's transcendental idiom). Cents-exact
# value sums; the new means are single int/int divisions.
# ---------------------------------------------------------------------------

_GMM_MU1 = 50_000.0
_GMM_MU2 = 200_000.0
_GMM_VAR = 5.0e9

_GMM_ORACLE = f"""
WITH d AS (
  SELECT o_totalprice AS x,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS xc
  FROM orders
),
r AS (
  SELECT xc,
         CAST(floor((1.0 / (1.0 + exp(
             ((x - {_GMM_MU2}) * (x - {_GMM_MU2})
              - (x - {_GMM_MU1}) * (x - {_GMM_MU1}))
             / (2.0 * {_GMM_VAR})))) * 1e6 + 0.5) AS BIGINT) AS r2q
  FROM d
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r2q) AS BIGINT) AS s2,
         CAST(sum(CAST(floor((r2q / 1e6) * xc + 0.5) AS BIGINT))
              AS BIGINT) AS num2,
         CAST(sum(CAST(floor(((1e6 - r2q) / 1e6) * xc + 0.5) AS BIGINT))
              AS BIGINT) AS num1
  FROM r
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS component, n AS n_rows,
         floor((n * 1e6 - s2) / CAST(n AS DOUBLE) / 1e6 * 1e6 + 0.5)
           / 1e6 AS w_new_s,
         floor(num1 * 1e4 / CAST(n * 1e6 - s2 AS DOUBLE) * 1e6 + 0.5)
           / 1e6 AS mu_new_s
  FROM s
  UNION ALL
  SELECT CAST(2 AS BIGINT), n,
         floor(s2 / CAST(n AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6,
         floor(num2 * 1e4 / CAST(s2 AS DOUBLE) * 1e6 + 0.5) / 1e6
  FROM s
) ORDER BY component
"""


@register("ml_gmm_em_portable", oracle=_GMM_ORACLE)
def ml_gmm_em_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM step of the 2-component 1-D GMM: grid-snapped
    responsibilities, int64 weighted sums, exact new (w, mu) per
    component. ONE scan + one bounded aggregate."""
    o = load(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    gap = ((x - _GMM_MU2) * (x - _GMM_MU2)
           - (x - _GMM_MU1) * (x - _GMM_MU1)) / (2.0 * _GMM_VAR)
    r2q = q6(1.0 / (1.0 + F.exp(gap)))
    xc = F.floor(x * 100 + F.lit(0.5)).cast("long")
    r = o.select(
        xc.alias("xc"), r2q.alias("r2q"),
    )
    s = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r2q").cast("long").alias("s2"),
        F.sum(F.floor((F.col("r2q") / 1e6) * F.col("xc") + F.lit(0.5))
              .cast("long")).cast("long").alias("num2"),
        F.sum(F.floor(((1e6 - F.col("r2q")) / 1e6) * F.col("xc")
                      + F.lit(0.5)).cast("long")).cast("long")
        .alias("num1"),
    ).localCheckpoint(eager=True)  # one-row model state: both
    # component projections read it, so the union plans ONE scan of
    # orders instead of recomputing the aggregate per branch.
    c1 = s.select(
        F.lit(1).cast("long").alias("component"),
        F.col("n").alias("n_rows"),
        snap6((F.col("n") * 1e6 - F.col("s2"))
              / F.col("n").cast("double") / 1e6).alias("w_new_s"),
        snap6(F.col("num1") * 1e4
              / (F.col("n") * 1e6 - F.col("s2")).cast("double"))
        .alias("mu_new_s"),
    )
    c2 = s.select(
        F.lit(2).cast("long").alias("component"),
        F.col("n").alias("n_rows"),
        snap6(F.col("s2") / F.col("n").cast("double") / 1e6)
        .alias("w_new_s"),
        snap6(F.col("num2") * 1e4 / F.col("s2").cast("double"))
        .alias("mu_new_s"),
    )
    return c1.unionByName(c2).orderBy("component")


# ---------------------------------------------------------------------------
# Two-feature OLS by the normal equations, Cramer's rule. All nine
# moment sums are int64 reduces of quantized per-row terms (q6 for
# the feature moments, cents for the y-moments); the 3x3 solve is
# pure double arithmetic over those identical integers, so both
# engines produce bit-identical betas. R^2 from the same sums.
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
WITH s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
      AS sx1,
    CAST(sum(CAST(floor(l_discount * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
      AS sx2,
    CAST(sum(CAST(floor(l_quantity * l_quantity * 1e6 + 0.5) AS BIGINT))
      AS BIGINT) AS s11,
    CAST(sum(CAST(floor(l_quantity * l_discount * 1e6 + 0.5) AS BIGINT))
      AS BIGINT) AS s12,
    CAST(sum(CAST(floor(l_discount * l_discount * 1e6 + 0.5) AS BIGINT))
      AS BIGINT) AS s22,
    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      AS BIGINT) AS sy,
    CAST(sum(CAST(floor(l_quantity * l_extendedprice * 100 + 0.5)
      AS BIGINT)) AS BIGINT) AS s1y,
    CAST(sum(CAST(floor(l_discount * l_extendedprice * 100 + 0.5)
      AS BIGINT)) AS BIGINT) AS s2y,
    CAST(sum(CAST(floor(l_extendedprice * l_extendedprice * 0.01 + 0.5)
      AS BIGINT)) AS BIGINT) AS syy
  FROM lineitem
),
m AS (
  SELECT CAST(n AS DOUBLE) AS a11, sx1 / 1e6 AS a12, sx2 / 1e6 AS a13,
         s11 / 1e6 AS a22, s12 / 1e6 AS a23, s22 / 1e6 AS a33,
         sy / 100.0 AS b1, s1y / 100.0 AS b2, s2y / 100.0 AS b3,
         syy * 100.0 AS yy, n
  FROM s
),
d AS (
  SELECT *,
    a11 * (a22 * a33 - a23 * a23)
      - a12 * (a12 * a33 - a23 * a13)
      + a13 * (a12 * a23 - a22 * a13) AS det
  FROM m
),
beta AS (
  SELECT n, yy, b1, b2, b3, a11,
    (b1 * (a22 * a33 - a23 * a23)
      - a12 * (b2 * a33 - a23 * b3)
      + a13 * (b2 * a23 - a22 * b3)) / det AS beta0,
    (a11 * (b2 * a33 - a23 * b3)
      - b1 * (a12 * a33 - a23 * a13)
      + a13 * (a12 * b3 - b2 * a13)) / det AS beta1,
    (a11 * (a22 * b3 - b2 * a23)
      - a12 * (a12 * b3 - b2 * a13)
      + b1 * (a12 * a23 - a22 * a13)) / det AS beta2
  FROM d
)
SELECT n AS n_rows,
       floor(beta0 * 1e6 + 0.5) / 1e6 AS beta0_s,
       floor(beta1 * 1e6 + 0.5) / 1e6 AS beta1_s,
       floor(beta2 * 1e6 + 0.5) / 1e6 AS beta2_s,
       floor((1.0 - (yy - beta0 * b1 - beta1 * b2 - beta2 * b3)
              / (yy - b1 * b1 / a11)) * 1e6 + 0.5) / 1e6 AS r2_s
FROM beta
"""


@register("ml_ols_normal_equations", oracle=_OLS_ORACLE)
def ml_ols_normal_equations(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Closed-form OLS (price ~ quantity + discount): one scan for
    the nine quantized moment sums, Cramer's-rule solve, R^2."""
    li = load(spark, sf_dir, "lineitem")
    qt, dc, pr = F.col("l_quantity"), F.col("l_discount"), \
        F.col("l_extendedprice")

    def iq(expr, scale):  # int64-quantized per-row term
        return F.sum(F.floor(expr * scale + F.lit(0.5)).cast("long")) \
            .cast("long")

    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        iq(qt, 1e6).alias("sx1"), iq(dc, 1e6).alias("sx2"),
        iq(qt * qt, 1e6).alias("s11"), iq(qt * dc, 1e6).alias("s12"),
        iq(dc * dc, 1e6).alias("s22"),
        iq(pr, 100).alias("sy"), iq(qt * pr, 100).alias("s1y"),
        iq(dc * pr, 100).alias("s2y"), iq(pr * pr, 0.01).alias("syy"),
    )
    m = s.select(
        "n", F.col("n").cast("double").alias("a11"),
        (F.col("sx1") / 1e6).alias("a12"), (F.col("sx2") / 1e6).alias("a13"),
        (F.col("s11") / 1e6).alias("a22"), (F.col("s12") / 1e6).alias("a23"),
        (F.col("s22") / 1e6).alias("a33"),
        (F.col("sy") / 100.0).alias("b1"), (F.col("s1y") / 100.0).alias("b2"),
        (F.col("s2y") / 100.0).alias("b3"),
        (F.col("syy") * 100.0).alias("yy"),
    )
    a11, a12, a13 = F.col("a11"), F.col("a12"), F.col("a13")
    a22, a23, a33 = F.col("a22"), F.col("a23"), F.col("a33")
    b1, b2, b3 = F.col("b1"), F.col("b2"), F.col("b3")
    det = (a11 * (a22 * a33 - a23 * a23)
           - a12 * (a12 * a33 - a23 * a13)
           + a13 * (a12 * a23 - a22 * a13))
    beta0 = (b1 * (a22 * a33 - a23 * a23)
             - a12 * (b2 * a33 - a23 * b3)
             + a13 * (b2 * a23 - a22 * b3)) / det
    beta1 = (a11 * (b2 * a33 - a23 * b3)
             - b1 * (a12 * a33 - a23 * a13)
             + a13 * (a12 * b3 - b2 * a13)) / det
    beta2 = (a11 * (a22 * b3 - b2 * a23)
             - a12 * (a12 * b3 - b2 * a13)
             + b1 * (a12 * a23 - a22 * a13)) / det
    sse = F.col("yy") - beta0 * b1 - beta1 * b2 - beta2 * b3
    sst = F.col("yy") - b1 * b1 / a11
    return m.select(
        F.col("n").alias("n_rows"),
        snap6(beta0).alias("beta0_s"), snap6(beta1).alias("beta1_s"),
        snap6(beta2).alias("beta2_s"),
        snap6(1.0 - sse / sst).alias("r2_s"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b per nation: x = account balance, y = order count.
# All-pairs WITHIN the nation (custkey_a < custkey_b): concordant /
# discordant / tie counts are exact integers; tau-b's denominator is
# one sqrt over those integers, snap6'd.
#
# Scale contract: pair count is quadratic IN THE GROUP, linear in the
# number of groups -- the bounded-group contract stat_permutation_test
# and dedup's cluster scans use. A deployment with million-member
# groups should pre-sample per group (sample_md5_stratified) or use
# the O(n log n) merge-count form; at the fixture group sizes
# (~60-600 customers/nation) the explicit pair join is the fastest
# plan and exactly matches the oracle.
# ---------------------------------------------------------------------------

_KENDALL_ORACLE = """
WITH cust AS (
  SELECT c.c_custkey AS ck, n.n_name, c.c_acctbal AS x,
         CAST(COALESCE(o.cnt, 0) AS BIGINT) AS y
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders
             GROUP BY o_custkey) o ON o.o_custkey = c.c_custkey
),
pairs AS (
  SELECT a.n_name,
         CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS con,
         CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS dis,
         CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
  FROM cust a JOIN cust b ON b.n_name = a.n_name AND a.ck < b.ck
),
agg AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n0,
         CAST(sum(con) AS BIGINT) AS concordant,
         CAST(sum(dis) AS BIGINT) AS discordant,
         CAST(sum(tx) AS BIGINT) AS ties_x,
         CAST(sum(ty) AS BIGINT) AS ties_y
  FROM pairs GROUP BY n_name
)
SELECT n_name, n0, concordant, discordant,
       floor((concordant - discordant)
             / sqrt(CAST(n0 - ties_x AS DOUBLE)
                    * CAST(n0 - ties_y AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS tau_b_s
FROM agg ORDER BY n_name
"""


@register("stat_kendall_tau", oracle=_KENDALL_ORACLE)
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (balance vs order count) per nation via exact
    within-group pair counting."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    cnt = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    base = (
        cust.join(F.broadcast(nat),
                  cust["c_nationkey"] == nat["n_nationkey"])
        .join(cnt, cust["c_custkey"] == cnt["o_custkey"], "left")
        .select(F.col("c_custkey").alias("ck"), "n_name",
                F.col("c_acctbal").alias("x"),
                F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("y"))
    )
    a = base.select("n_name", F.col("ck").alias("cka"),
                    F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = base.select(F.col("n_name").alias("nb"), F.col("ck").alias("ckb"),
                    F.col("x").alias("xb"), F.col("y").alias("yb"))
    prod = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    pairs = (
        a.join(b, (F.col("nb") == F.col("n_name"))
               & (F.col("cka") < F.col("ckb")))
        .select("n_name",
                F.when(prod > 0, 1).otherwise(0).alias("con"),
                F.when(prod < 0, 1).otherwise(0).alias("dis"),
                F.when(F.col("xa") == F.col("xb"), 1).otherwise(0)
                .alias("tx"),
                F.when(F.col("ya") == F.col("yb"), 1).otherwise(0)
                .alias("ty"))
    )
    agg = pairs.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("con").cast("long").alias("concordant"),
        F.sum("dis").cast("long").alias("discordant"),
        F.sum("tx").cast("long").alias("ties_x"),
        F.sum("ty").cast("long").alias("ties_y"),
    )
    tau = ((F.col("concordant") - F.col("discordant"))
           / F.sqrt((F.col("n0") - F.col("ties_x")).cast("double")
                    * (F.col("n0") - F.col("ties_y")).cast("double")))
    return agg.select("n_name", "n0", "concordant", "discordant",
                      snap6(tau).alias("tau_b_s")).orderBy("n_name")


# ---------------------------------------------------------------------------
# Benjamini-Hochberg step-up FDR over per-event-type mean z-tests.
# Phi(z) via the Abramowitz-Stegun 26.2.17 five-term polynomial --
# elementary arithmetic + one exp, implemented token-identically on
# both engines, then snapped. The BH pass runs on the ≤|event_type|
# aggregate table (bounded model state, the isotonic-calibration
# window precedent).
# ---------------------------------------------------------------------------

_BH_ALPHA = 0.05
# A&S 26.2.17 coefficients
_BH_P = 0.2316419
_BH_B = (0.319381530, -0.356563782, 1.781477937,
         -1.821255978, 1.330274429)

# ONE source for the polynomial: the SQL interpolates the same _BH_B
# tuple the Spark side folds over, so the copies cannot desync.
_BH_PHI_SQL = f"""
  floor((2.0 * ((exp(-za * za / 2.0) / sqrt(2.0 * pi()))
    * ((((({_BH_B[4]} * k + {_BH_B[3]}) * k + {_BH_B[2]}) * k
         + {_BH_B[1]}) * k + {_BH_B[0]}) * k))) * 1e6 + 0.5) / 1e6
"""

_BH_ORACLE = f"""
WITH v AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS s_g
  FROM v GROUP BY event_type
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(sum(CAST(floor(value * value * 1e4 + 0.5) AS BIGINT))
              AS BIGINT) AS ss
  FROM v
),
z AS (
  SELECT g.event_type, g.n_g,
         floor(((g.s_g / CAST(g.n_g AS DOUBLE) / 1e6
                 - t.s / CAST(t.n AS DOUBLE) / 1e6)
                / (sqrt(t.ss / CAST(t.n AS DOUBLE) / 1e4
                        - (t.s / CAST(t.n AS DOUBLE) / 1e6)
                          * (t.s / CAST(t.n AS DOUBLE) / 1e6))
                   / sqrt(CAST(g.n_g AS DOUBLE)))) * 1e6 + 0.5) / 1e6
           AS z_s
  FROM g CROSS JOIN tot t
),
p AS (
  SELECT event_type, n_g, z_s,
         {_BH_PHI_SQL} AS p_s
  FROM (SELECT *, abs(z_s) AS za, 1.0 / (1.0 + {_BH_P} * abs(z_s)) AS k
        FROM z)
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_s, event_type) AS bh_rank,
         count(*) OVER () AS m
  FROM p
),
kmax AS (
  SELECT max(CASE WHEN p_s <= bh_rank * {_BH_ALPHA} / m
                  THEN bh_rank END) AS kk
  FROM ranked
)
SELECT r.event_type, r.n_g, r.z_s, r.p_s,
       CAST(r.bh_rank AS BIGINT) AS bh_rank,
       floor(r.bh_rank * {_BH_ALPHA} / r.m * 1e6 + 0.5) / 1e6
         AS bh_threshold_s,
       COALESCE(r.bh_rank <= k.kk, FALSE) AS rejected
FROM ranked r CROSS JOIN kmax k
ORDER BY r.bh_rank
"""


@register("stat_benjamini_hochberg", oracle=_BH_ORACLE)
def stat_benjamini_hochberg(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """BH step-up FDR over per-event-type mean z-tests; the ranked
    pass runs over the bounded per-type aggregate (<= |event_type|
    rows -- bounded model state, single-partition window OK)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    vq = q6(F.col("value"))
    vq2 = F.floor(F.col("value") * F.col("value") * 1e4 + F.lit(0.5)) \
        .cast("long")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(vq).cast("long").alias("s_g"))
    tot = ev.agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(vq).cast("long").alias("s"),
                 F.sum(vq2).cast("long").alias("ss"))
    mean_all = F.col("s") / F.col("n").cast("double") / 1e6
    sd_all = F.sqrt(F.col("ss") / F.col("n").cast("double") / 1e4
                    - mean_all * mean_all)
    z = snap6(((F.col("s_g") / F.col("n_g").cast("double") / 1e6)
               - mean_all)
              / (sd_all / F.sqrt(F.col("n_g").cast("double"))))
    zt = g.crossJoin(F.broadcast(tot)).select(
        "event_type", "n_g", z.alias("z_s"))
    za = F.abs(F.col("z_s"))
    k = 1.0 / (1.0 + _BH_P * za)
    poly = ((((_BH_B[4] * k + _BH_B[3]) * k + _BH_B[2]) * k
             + _BH_B[1]) * k + _BH_B[0]) * k
    phi = F.exp(-za * za / 2.0) / F.sqrt(F.lit(2.0 * 3.141592653589793))
    p = zt.select("event_type", "n_g", "z_s",
                  snap6(2.0 * phi * poly).alias("p_s"))
    # The window below runs over the per-type aggregate: bounded by
    # the event_type universe, never by the data (ml_isotonic's
    # accepted single-partition-window-on-model-state pattern).
    w = Window.orderBy("p_s", "event_type")
    ranked = p.withColumn("bh_rank", F.row_number().over(w)) \
        .withColumn("m", F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))))
    kmax = ranked.agg(F.max(
        F.when(F.col("p_s") <= F.col("bh_rank") * _BH_ALPHA / F.col("m"),
               F.col("bh_rank"))).alias("kk"))
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select("event_type", "n_g", "z_s", "p_s",
                F.col("bh_rank").cast("long").alias("bh_rank"),
                snap6(F.col("bh_rank") * _BH_ALPHA / F.col("m"))
                .alias("bh_threshold_s"),
                F.coalesce(F.col("bh_rank") <= F.col("kk"), F.lit(False))
                .alias("rejected"))
        .orderBy("bh_rank")
    )
