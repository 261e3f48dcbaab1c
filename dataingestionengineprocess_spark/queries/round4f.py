"""Round-4 (continued) additions: the model-evaluation / mixture-
diagnostics tier -- the numbers a training-data platform reads off a
candidate corpus or a trained gate before shipping it. All six are
under the full hash-checked oracle gate.

- `ml_auc_exact` -- exact ROC-AUC of a score against a binary label
  via the grouped rank statistic (Mann-Whitney U): group by distinct
  score, one bounded cumulative pass, integer numerator. THE
  classifier-gate acceptance metric, computed without a global
  per-row sort.
- `quality_langid_confusion` -- confusion-matrix summary (per-class
  tp/fp/fn, precision/recall/F1) of the marker-lexicon language-ID
  against the labeled truth: the eval loop for any heuristic gate.
- `text_zipf_slope` -- OLS fit of ln(freq) on ln(rank) over the top
  of the vocabulary: the corpus-health diagnostic (natural text
  ~ -1; boilerplate/spam bends the tail).
- `text_kl_source_divergence` -- per-source KL(P_source || P_corpus)
  over unigram distributions: the domain-mix drift number.
- `ml_reward_group_normalize` -- GRPO-style group-relative reward
  normalization: z-score each event's value within its user group
  from integer-cents sums (the RL-from-preference data transform).
- `ml_effective_sample_size` -- importance-weight ESS per source,
  (sum w)^2 / sum w^2: how many "real" samples a weighted corpus is
  worth (the acceptance check after any importance resampling, e.g.
  `curation_dsir_weights`).

Reference parity: the reference is diagram-only (SURVEY.md §0); these
rows extend the [C] driver-contract model-prep/quality families
(BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import LANG_MARKERS, lang_id, tokens
from ..operators.skew import spread_input
from . import register
from ..functions.exact import snap6 as _snap6, q6 as _q6


# ---------------------------------------------------------------------------
# Exact ROC-AUC. Score = n_chars, label = (lang == 'en'): "does raw
# length predict English?" -- the values are stand-ins; the shape is
# the real contract (any int/quantized score column works).
#
# AUC = P(score_pos > score_neg) + P(equal)/2, computed WITHOUT a
# global per-row rank: group rows by distinct score (map-side
# combinable), then one ordered cumulative pass over the DISTINCT
# SCORE table (bounded: |distinct scores| << |rows| for any quantized
# score -- 313 here; a 1e-6-snapped score caps it at ~1e6 rows + the
# range). Numerator stays integral:
#     num2 = sum_s  p_s * (2 * cumneg_below(s) + n_s)
#     AUC  = num2 / (2 * P * N)
# so the only float op is the final division, snapped once.
# ---------------------------------------------------------------------------

_AUC_ORACLE = """
WITH scored AS (
  SELECT n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
by_score AS (
  SELECT score, CAST(sum(y) AS BIGINT) AS p_s,
         CAST(count(*) - sum(y) AS BIGINT) AS n_s
  FROM scored GROUP BY score
),
cum AS (
  SELECT p_s, n_s,
         CAST(coalesce(sum(n_s) OVER (
           ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS cumneg_below
  FROM by_score
),
tot AS (
  SELECT CAST(sum(p_s) AS BIGINT) AS pos,
         CAST(sum(n_s) AS BIGINT) AS neg,
         CAST(sum(p_s * (2 * cumneg_below + n_s)) AS BIGINT) AS num2
  FROM cum
)
SELECT pos AS n_pos, neg AS n_neg,
       floor(CAST(num2 AS DOUBLE) / (2.0 * pos * neg) * 1e6 + 0.5) / 1e6
         AS auc_s,
       floor((CAST(num2 AS DOUBLE) / (2.0 * pos * neg) * 2.0 - 1.0)
             * 1e6 + 0.5) / 1e6 AS gini_s
FROM tot
"""


@register("ml_auc_exact", oracle=_AUC_ORACLE)
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (+ Gini) of document length predicting the 'en'
    label, via the grouped integer rank statistic."""
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
    )
    # ordered cumulative over the DISTINCT-SCORE table only: a single
    # unpartitioned window, but over a bounded (quantized-score) row
    # count, never the corpus
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    cum = by_score.withColumn(
        "cumneg_below", F.coalesce(F.sum("n_s").over(w), F.lit(0)).cast("long")
    )
    tot = cum.agg(
        F.sum("p_s").cast("long").alias("pos"),
        F.sum("n_s").cast("long").alias("neg"),
        F.sum(F.col("p_s") * (2 * F.col("cumneg_below") + F.col("n_s")))
        .cast("long").alias("num2"),
    )
    auc = F.col("num2").cast("double") / (2.0 * F.col("pos") * F.col("neg"))
    return tot.select(
        F.col("pos").alias("n_pos"), F.col("neg").alias("n_neg"),
        _snap6(auc).alias("auc_s"),
        _snap6(auc * 2.0 - 1.0).alias("gini_s"),
    )


# ---------------------------------------------------------------------------
# Language-ID confusion summary. Reuses the EXACT lang_id lexicon
# (functions/text.LANG_MARKERS) -- the oracle regenerates the same
# argmax from the same dict, so predictor and eval cannot drift.
# Per class (union of truth and predicted codes): support, tp, fp,
# fn, precision/recall from integer counts, F1 = 2tp/(n_pred +
# n_true) computed directly from integers (never from the snapped
# P/R). Scale: one map pass + two tiny class-level aggregates.
# ---------------------------------------------------------------------------

_LEXICON_VALUES = ", ".join(
    "('{}', [{}])".format(code, ", ".join(f"'{w}'" for w in words))
    for code, words in sorted(LANG_MARKERS.items())
)

_CONFUSION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS dt
  FROM documents
),
scores AS (
  SELECT t.doc_id, t.lang, l.code,
         len(list_filter(t.dt, x -> list_contains(l.words, x))) AS hits
  FROM t, (VALUES {_LEXICON_VALUES}) AS l(code, words)
),
pred AS (
  SELECT doc_id, lang,
         CASE WHEN hits > 0 THEN code ELSE 'und' END AS lang_pred
  FROM (SELECT doc_id, lang, code, hits,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY hits DESC, code) AS rn
        FROM scores) WHERE rn = 1
),
by_truth AS (
  SELECT lang AS class,
         CAST(count(*) AS BIGINT) AS n_true,
         CAST(sum(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END) AS BIGINT)
           AS tp
  FROM pred GROUP BY lang
),
by_pred AS (
  SELECT lang_pred AS class, CAST(count(*) AS BIGINT) AS n_pred
  FROM pred GROUP BY lang_pred
)
SELECT coalesce(t.class, p.class) AS class,
       coalesce(t.n_true, 0) AS n_true,
       coalesce(p.n_pred, 0) AS n_pred,
       coalesce(t.tp, 0) AS tp,
       coalesce(p.n_pred, 0) - coalesce(t.tp, 0) AS fp,
       coalesce(t.n_true, 0) - coalesce(t.tp, 0) AS fn,
       CASE WHEN coalesce(p.n_pred, 0) = 0 THEN 0.0
            ELSE floor(CAST(t.tp AS DOUBLE) / p.n_pred * 1e6 + 0.5) / 1e6
       END AS precision_s,
       CASE WHEN coalesce(t.n_true, 0) = 0 THEN 0.0
            ELSE floor(CAST(t.tp AS DOUBLE) / t.n_true * 1e6 + 0.5) / 1e6
       END AS recall_s,
       CASE WHEN coalesce(p.n_pred, 0) + coalesce(t.n_true, 0) = 0 THEN 0.0
            ELSE floor(2.0 * coalesce(t.tp, 0)
                       / (coalesce(p.n_pred, 0) + coalesce(t.n_true, 0))
                       * 1e6 + 0.5) / 1e6
       END AS f1_s
FROM by_truth t FULL OUTER JOIN by_pred p ON p.class = t.class
ORDER BY class
"""


@register("quality_langid_confusion", oracle=_CONFUSION_ORACLE)
def quality_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the marker-lexicon language-ID
    against the labeled truth, from exact integer counts."""
    docs = load(spark, sf_dir, "documents")
    # ONE corpus pass: reduce to the (truth, pred) contingency table
    # (<= |classes|^2 rows -- bounded model state), checkpoint it, and
    # derive both margins from that; without the checkpoint the
    # by-truth and by-pred branches each rescan + re-score the corpus.
    cm = (
        spread_input(docs)
        .select(F.col("lang"), lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    by_truth = cm.groupBy(F.col("lang").alias("class")).agg(
        F.sum("n").cast("long").alias("n_true"),
        F.sum(F.when(F.col("lang_pred") == F.col("lang"), F.col("n"))
              .otherwise(0)).cast("long").alias("tp"),
    )
    by_pred = cm.groupBy(F.col("lang_pred").alias("class")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    j = by_truth.join(by_pred, "class", "full_outer")
    n_true = F.coalesce(F.col("n_true"), F.lit(0))
    n_pred = F.coalesce(F.col("n_pred"), F.lit(0))
    tp = F.coalesce(F.col("tp"), F.lit(0))
    return j.select(
        "class",
        n_true.alias("n_true"), n_pred.alias("n_pred"), tp.alias("tp"),
        (n_pred - tp).alias("fp"), (n_true - tp).alias("fn"),
        F.when(n_pred == 0, F.lit(0.0))
        .otherwise(_snap6(tp.cast("double") / n_pred)).alias("precision_s"),
        F.when(n_true == 0, F.lit(0.0))
        .otherwise(_snap6(tp.cast("double") / n_true)).alias("recall_s"),
        F.when(n_pred + n_true == 0, F.lit(0.0))
        .otherwise(_snap6(2.0 * tp / (n_pred + n_true))).alias("f1_s"),
    ).orderBy("class")


# ---------------------------------------------------------------------------
# Zipf slope: OLS of y = ln(count) on x = ln(rank) over the top-K
# vocabulary (K = 200). Ranks come from one row_number over the VOCAB
# table (Zipf-bounded, not the corpus); x and y are snapped to the
# 1e-6 grid, the four OLS sums ride int64-quantized per-term products
# (order-independent), and the slope/intercept are two closed-form
# double expressions both engines evaluate identically.
# ---------------------------------------------------------------------------

_ZIPF_K = 200

_ZIPF_ORACLE = f"""
WITH vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank
  FROM vocab
),
pts AS (
  SELECT floor(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS x,
         floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS y
  FROM ranked WHERE rank <= {_ZIPF_K}
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(floor(y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(floor(x * y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(sum(CAST(floor(x * x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sxx
  FROM pts
),
fit AS (
  SELECT k, sx, sy,
         floor((CAST(k * sxy AS DOUBLE) / 1e6
                - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
               / (CAST(k * sxx AS DOUBLE) / 1e6
                  - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))
               * 1e6 + 0.5) / 1e6 AS slope_s
  FROM sums
)
SELECT k, slope_s,
       floor((CAST(sy AS DOUBLE) / 1e6 / k
              - slope_s * (CAST(sx AS DOUBLE) / 1e6 / k))
             * 1e6 + 0.5) / 1e6 AS intercept_s
FROM fit
"""


@register("text_zipf_slope", oracle=_ZIPF_ORACLE)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS Zipf slope + intercept over the top-200 vocabulary,
    integer-quantized OLS sums, snapped closed forms."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        spread_input(docs)
        .select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ranked = vocab.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("c"), "tok"))
    ).filter(F.col("rank") <= _ZIPF_K)
    pts = ranked.select(
        _snap6(F.log(F.col("rank").cast("double"))).alias("x"),
        _snap6(F.log(F.col("c").cast("double"))).alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(_q6(F.col("x"))).cast("long").alias("sx"),
        F.sum(_q6(F.col("y"))).cast("long").alias("sy"),
        F.sum(_q6(F.col("x") * F.col("y"))).cast("long").alias("sxy"),
        F.sum(_q6(F.col("x") * F.col("x"))).cast("long").alias("sxx"),
    )
    k = F.col("k")
    sx = F.col("sx").cast("double") / 1e6
    sy = F.col("sy").cast("double") / 1e6
    sxy = (k * F.col("sxy")).cast("double") / 1e6
    sxx = (k * F.col("sxx")).cast("double") / 1e6
    slope_s = _snap6((sxy - sx * sy) / (sxx - sx * sx))
    return sums.select(
        "k",
        slope_s.alias("slope_s"),
        _snap6(sy / k - slope_s * (sx / k)).alias("intercept_s"),
    )


# ---------------------------------------------------------------------------
# Per-source unigram KL divergence vs the corpus distribution:
# KL(P_s || Q) = sum_t (c_st / T_s) * ln((c_st / T_s) / (c_t / T)).
# Every count is exact; each term's double product is int64-quantized
# before the per-source sum (order-independent); the log argument is
# built by the IDENTICAL division sequence in both engines. Zero
# terms never occur: every source token is in the corpus by
# construction.
#
# Scale: one (source, token) groupBy of the exploded corpus (the only
# corpus-wide shuffle); token totals REUSE that table (second tiny
# agg, no rescan); per-source totals broadcast back. The vocab join
# is an equi-join on token -- shuffle at real scale, broadcast here.
# ---------------------------------------------------------------------------

_KL_ORACLE = """
WITH st AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c_st
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY source, tok
),
vocab AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok),
per_src AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS t_s FROM st
            GROUP BY source),
tot AS (SELECT CAST(sum(c_st) AS BIGINT) AS t FROM st),
terms AS (
  SELECT st.source,
         CAST(floor(
           (CAST(st.c_st AS DOUBLE) / ps.t_s)
           * ln((CAST(st.c_st AS DOUBLE) / ps.t_s)
                / (CAST(v.c_t AS DOUBLE) / tot.t))
           * 1e6 + 0.5) AS BIGINT) AS term_q
  FROM st
  JOIN vocab v USING (tok)
  JOIN per_src ps USING (source), tot
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_terms,
       floor(CAST(sum(term_q) AS DOUBLE) + 0.5) / 1e6 AS kl_s
FROM terms
GROUP BY source
ORDER BY source
"""


@register("text_kl_source_divergence", oracle=_KL_ORACLE)
def text_kl_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source unigram || corpus unigram) per source, from exact
    counts and quantized per-term contributions."""
    docs = load(spark, sf_dir, "documents")
    # the (source, token) count table is consumed FOUR times (terms,
    # vocab, per-source totals, corpus total): checkpoint it so the
    # corpus is exploded exactly once. Size is |sources| x |vocab| --
    # Zipf-bounded, and distributed (localCheckpoint stores partitions
    # on executors, nothing driver-side).
    st = (
        spread_input(docs)
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
        .localCheckpoint(eager=True)
    )
    vocab = st.groupBy("tok").agg(F.sum("c_st").cast("long").alias("c_t"))
    per_src = st.groupBy("source").agg(
        F.sum("c_st").cast("long").alias("t_s"))
    tot = st.agg(F.sum("c_st").cast("long").alias("t"))
    p = F.col("c_st").cast("double") / F.col("t_s")
    q = F.col("c_t").cast("double") / F.col("t")
    terms = (
        st.join(vocab, "tok")
        .join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(tot))
        .select("source", _q6(p * F.log(p / q)).alias("term_q"))
    )
    return (
        terms.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            (F.floor(F.sum("term_q").cast("double") + F.lit(0.5)) / 1e6)
            .alias("kl_s"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# GRPO-style group-relative reward normalization: z-score each
# event's value within its user group, entirely from integer-cents
# sums:   z = (r*n - S) / sqrt(n*Q - S^2)   (population std), which
# is algebraically (r - mean)/std but touches floats exactly once.
# sqrt is IEEE-correctly-rounded, so both engines agree bit-for-bit.
# Degenerate groups (n = 1 or zero variance) emit z = 0.0.
#
# Scale: ONE exchange (the window partition on high-cardinality,
# uniform user_id); int64 bounds hold to ~1e4-row groups at 1e5-cent
# rewards (n*Q <= 1e4 * 1e4*1e10 = 1e18) -- beyond that, pre-aggregate
# per (user, salt) and combine, same as the packing prefix sums.
# ---------------------------------------------------------------------------

_GRPO_ORACLE = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS r
  FROM events
),
g AS (
  SELECT event_id, user_id, r,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         CAST(sum(r) OVER (PARTITION BY user_id) AS BIGINT) AS s,
         CAST(sum(r * r) OVER (PARTITION BY user_id) AS BIGINT) AS q
  FROM e
)
SELECT event_id, user_id,
       CASE WHEN n * q - s * s <= 0 THEN 0.0
            ELSE floor((CAST(r * n - s AS DOUBLE)
                        / sqrt(CAST(n * q - s * s AS DOUBLE)))
                       * 1e6 + 0.5) / 1e6
       END AS reward_z_s
FROM g
ORDER BY event_id
"""


@register("ml_reward_group_normalize", oracle=_GRPO_ORACLE)
def ml_reward_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative (per-user) reward z-scores from integer-cents
    sums; one window exchange, degenerate groups to 0.0."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("r"),
    )
    w = W.partitionBy("user_id")
    g = e.select(
        "event_id", "user_id", "r",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("r").over(w).cast("long").alias("s"),
        F.sum(F.col("r") * F.col("r")).over(w).cast("long").alias("q"),
    )
    var_num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    z = (F.col("r") * F.col("n") - F.col("s")).cast("double") / F.sqrt(
        var_num.cast("double"))
    return g.select(
        "event_id", "user_id",
        F.when(var_num <= 0, F.lit(0.0)).otherwise(_snap6(z))
        .alias("reward_z_s"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Importance-weight effective sample size per source, w = n_chars
# (stand-in for any per-document importance weight, e.g. the DSIR
# log-ratio weights):  ESS = (sum w)^2 / sum w^2,  ratio = ESS / n.
# sum w and sum w^2 are exact int64 (w <= ~1e4 keeps sum w^2 inside
# int64 to ~1e10 docs); the square of sum w is taken in DOUBLE so the
# numerator never overflows. One groupBy, map-side combinable.
# ---------------------------------------------------------------------------

_ESS_ORACLE = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_w,
       floor(CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE)
             / CAST(sum(n_chars * n_chars) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS ess_s,
       floor(CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE)
             / CAST(sum(n_chars * n_chars) AS DOUBLE) / count(*)
             * 1e6 + 0.5) / 1e6 AS ess_ratio_s
FROM documents
GROUP BY source
ORDER BY source
"""


@register("ml_effective_sample_size", oracle=_ESS_ORACLE)
def ml_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source importance-weight ESS and ESS/n from exact integer
    weight sums (weight = n_chars)."""
    docs = load(spark, sf_dir, "documents")
    sw = F.sum("n_chars").cast("long")
    swsq = F.sum(F.col("n_chars") * F.col("n_chars")).cast("long")
    ess = sw.cast("double") * sw.cast("double") / swsq.cast("double")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            sw.alias("sum_w"),
            _snap6(ess).alias("ess_s"),
            _snap6(ess / F.count(F.lit(1))).alias("ess_ratio_s"),
        )
        .orderBy("source")
    )
