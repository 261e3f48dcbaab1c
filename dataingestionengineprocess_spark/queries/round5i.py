"""Round-4 (continued) additions: two-sample KS class separation,
RFM segment migration, and the near-dup similarity histogram.

- `ml_ks_two_sample` -- the Kolmogorov-Smirnov separation statistic
  between the score distributions of class 0 and the rest: sup-CDF
  distance over exact value groups, both class cumulatives from ONE
  shared `distributed_prefix_sums` range-partition pass, the
  argmax value reported as the smallest score achieving the sup.
  Complements AUC (rank-based) with the distribution-distance view a
  model-discrimination report needs. Distinct from
  `stat_ks_exponential`, which fits a PARAMETRIC exponential.
- `events_rfm_migration` -- the retention deliverable on top of
  `events_rfm_segments`: spend-tercile segments computed per
  half-month period (deterministic ntile with user tiebreaks, the
  same accepted bounded-user-rollup shape), then the full transition
  matrix including NONE rows for users absent from either period.
- `curation_similarity_histogram` -- near-dup tuning data: the
  distribution of exact trigram-Jaccard pair similarities above 0.5
  in 0.025-wide buckets, with per-bucket pair counts and similarity
  bounds. The pair generation rides the same prefix-filtered
  operator the dedup family ships, so the histogram costs one more
  aggregate, not a new all-pairs pass.

Reference parity: diagram-only reference (SURVEY.md §0); KS and the
migration matrix extend [C] model-eval / behavioral analytics, the
histogram the [C] dedup family (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import epoch_day as _epoch_day, snap6 as _snap6
from . import register

# ---------------------------------------------------------------------------
# Two-sample KS. Value groups on the snapped score; cumulative class
# counts along the value axis; d = |F1 - F2| snapped; sup + its
# leftmost witness. The oracle's single global windows are the
# fixture-scale replica of the distributed prefix.
# ---------------------------------------------------------------------------

_KS2_ORACLE = """
WITH scored AS (
  SELECT floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS s,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS x
  FROM embeddings
),
grp AS (
  SELECT s, CAST(sum(x) AS BIGINT) AS c1,
         CAST(sum(1 - x) AS BIGINT) AS c2
  FROM scored GROUP BY s
),
cum AS (
  SELECT s,
         CAST(sum(c1) OVER w AS BIGINT) AS k1,
         CAST(sum(c2) OVER w AS BIGINT) AS k2
  FROM grp
  WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2 FROM grp),
d AS (
  SELECT c.s,
         floor(abs(CAST(c.k1 AS DOUBLE) / nullif(t.n1, 0)
                   - CAST(c.k2 AS DOUBLE) / nullif(t.n2, 0))
               * 1e6 + 0.5) / 1e6 AS d_s
  FROM cum c CROSS JOIN tot t
),
mx AS (SELECT max(d_s) AS ks FROM d)
SELECT t.n1, t.n2, mx.ks AS ks_s,
       (SELECT min(s) FROM d WHERE d.d_s = mx.ks) AS ks_at_s
FROM tot t CROSS JOIN mx
"""


@register("ml_ks_two_sample", oracle=_KS2_ORACLE)
def ml_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS separation of class-0 vs rest score
    distributions; sup-CDF distance plus its leftmost witness."""
    from ..operators.ranking import distributed_prefix_sums

    scored = load(spark, sf_dir, "embeddings").select(
        _snap6(F.element_at("embedding", 1).cast("double")).alias("s"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("x"),
    )
    grp = scored.groupBy("s").agg(
        F.sum("x").cast("long").alias("c1"),
        F.sum(1 - F.col("x")).cast("long").alias("c2"),
    ).localCheckpoint(eager=True)  # value-group table, three legs
    # BOTH class cumulatives from ONE range-partition pass
    cum = distributed_prefix_sums(grp, ["s"], {"k1": "c1", "k2": "c2"})
    tot = grp.agg(F.sum("c1").cast("long").alias("n1"),
                  F.sum("c2").cast("long").alias("n2"))
    d = cum.crossJoin(F.broadcast(tot)).select(
        "s", "n1", "n2",
        _snap6(F.abs(
            F.col("k1").cast("double") / F.nullif(F.col("n1"), F.lit(0))
            - F.col("k2").cast("double")
            / F.nullif(F.col("n2"), F.lit(0)))).alias("d_s"),
    )
    mx = d.agg(F.max("d_s").alias("ks"))
    at = (
        d.join(F.broadcast(mx), d.d_s == mx.ks)
        .agg(F.min("s").alias("ks_at_s"))
    )
    return (
        tot.crossJoin(mx).crossJoin(at)
        .select("n1", "n2", F.col("ks").alias("ks_s"), "ks_at_s")
    )


# ---------------------------------------------------------------------------
# RFM migration. Period = first 15 fixture days vs the rest; segment
# = spend tercile (T1 highest) by deterministic ntile over the
# bounded per-user rollup; NONE marks absence. Transition counts +
# the destination-period spend carried per cell.
# ---------------------------------------------------------------------------

from ..functions.exact import FIXTURE_SPLIT_DAY as _RFM_SPLIT_DAY  # noqa: E402

_MIGRATION_ORACLE = f"""
WITH p AS (
  SELECT user_id,
         CASE WHEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   < {_RFM_SPLIT_DAY} THEN 1 ELSE 2 END AS period,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
u AS (
  SELECT user_id, period, CAST(sum(cents) AS BIGINT) AS spend
  FROM p GROUP BY user_id, period
),
seg AS (
  SELECT user_id, period, spend,
         'T' || CAST(ntile(3) OVER (PARTITION BY period
                ORDER BY spend DESC, user_id) AS VARCHAR) AS seg
  FROM u
),
users AS (SELECT DISTINCT user_id FROM u),
mat AS (
  SELECT us.user_id,
         COALESCE(s1.seg, 'NONE') AS seg_from,
         COALESCE(s2.seg, 'NONE') AS seg_to,
         COALESCE(s2.spend, 0) AS spend_to
  FROM users us
  LEFT JOIN seg s1 ON s1.user_id = us.user_id AND s1.period = 1
  LEFT JOIN seg s2 ON s2.user_id = us.user_id AND s2.period = 2
)
SELECT seg_from, seg_to,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(spend_to) AS BIGINT) AS spend_to_cents
FROM mat GROUP BY seg_from, seg_to
ORDER BY seg_from, seg_to
"""


@register("events_rfm_migration", oracle=_MIGRATION_ORACLE)
def events_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-tercile segment transition matrix between the two
    half-month periods, NONE rows included."""
    ev = load(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.when(_epoch_day("ts") < _RFM_SPLIT_DAY, 1).otherwise(2)
        .alias("period"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    u = p.groupBy("user_id", "period").agg(
        F.sum("cents").cast("long").alias("spend")
    ).localCheckpoint(eager=True)  # user x period rollup
    # Terciles WITHOUT the per-period ntile window (two periods, so
    # the window form funnels half the user universe through one
    # task): ntile(k) is pure integer arithmetic over the per-period
    # rank and count -- the first (n mod k) buckets take ceil(n/k)
    # rows, the rest floor(n/k). Descending spend via negation
    # (grouped_rank orders ascending).
    from ..operators.ranking import grouped_rank, ntile_expr

    ranked = grouped_rank(
        u.withColumn("__neg", -F.col("spend")),
        ["period"], ["__neg", "user_id"], "__rn",
        # period is {1, 2} BY CONSTRUCTION (the when/otherwise above)
        # -- skip the probe job.
        count_col="__n", known_group_count=2).drop("__neg")
    seg = ranked.select(
        "user_id", "period", "spend",
        F.concat(F.lit("T"),
                 ntile_expr("__rn", "__n", 3).cast("string"))
        .alias("seg"),
    )
    users = u.select("user_id").distinct()
    s1 = seg.where(F.col("period") == 1).select(
        "user_id", F.col("seg").alias("seg_from"))
    s2 = seg.where(F.col("period") == 2).select(
        "user_id", F.col("seg").alias("seg_to"),
        F.col("spend").alias("spend_to"))
    mat = (
        users.join(s1, "user_id", "left").join(s2, "user_id", "left")
        .select(
            F.coalesce("seg_from", F.lit("NONE")).alias("seg_from"),
            F.coalesce("seg_to", F.lit("NONE")).alias("seg_to"),
            F.coalesce("spend_to", F.lit(0)).alias("spend_to"),
        )
    )
    return (
        mat.groupBy("seg_from", "seg_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
             F.sum("spend_to").cast("long").alias("spend_to_cents"))
        .orderBy("seg_from", "seg_to")
    )


# ---------------------------------------------------------------------------
# Similarity histogram. Pairs from the shared prefix-filtered exact
# Jaccard (>= 0.5); j rounds to 4 decimals inside the operator, so
# 0.025-wide buckets are exact; per-bucket counts and bounds.
# ---------------------------------------------------------------------------

_SIM_HIST_ORACLE = """
WITH sh AS (
  SELECT doc_id AS id,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in range(1, len(t) - 1)])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS j
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
)
SELECT least(CAST(floor(j * 40) AS BIGINT), 39) AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs,
       min(j) AS j_min, max(j) AS j_max
FROM pairs
GROUP BY 1 ORDER BY 1
"""


@register("curation_similarity_histogram", oracle=_SIM_HIST_ORACLE)
def curation_similarity_histogram(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Distribution of exact trigram-Jaccard pair similarities >= 0.5
    in 0.025-wide buckets (near-dup threshold tuning data)."""
    from ..operators.dedup import prefix_filter_jaccard_pairs

    pairs = prefix_filter_jaccard_pairs(
        load(spark, sf_dir, "documents"), n=3, threshold=0.5)
    return (
        pairs.groupBy(
            F.least(F.floor(F.col("jaccard") * 40).cast("long"),
                    F.lit(39)).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
             F.min("jaccard").alias("j_min"),
             F.max("jaccard").alias("j_max"))
        .orderBy("bucket")
    )
