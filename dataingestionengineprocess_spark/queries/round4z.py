"""Round-4 (continued) additions: session summary stats, leakage-safe
churn labels, and the MinHash recall/precision evaluation.

- `events_session_stats` -- the per-day session balance sheet: 30-min
  inactivity sessionization (per-user lag + conditional running sum,
  every window user-partitioned), then per-session rollups feed a
  bounded per-day summary with bounce rate, mean events, and mean
  duration. Days and gaps are pure integer microseconds
  (`unix_micros` / `epoch_us`), so the hash is exact.
- `ml_churn_labels` -- the label-construction primitive every churn
  model needs, built leakage-safe: features come ONLY from events
  strictly before the cutoff day, the label ONLY from the horizon
  window at-or-after it, and the population is users observed before
  the cutoff (a model can never score a user it has never seen). One
  scan, two window-disjoint aggregates.
- `dedup_minhash_recall_eval` -- the evaluation the dedup stack must
  publish: precision/recall of the PORTABLE banded-MinHash candidate
  pairs (est >= 0.5) against exact trigram-Jaccard ground truth
  (j >= 0.6), fully hash-checked -- the oracle composes the two
  already-proven SQL replicas (`_minhash_portable_oracle`,
  `_JACCARD_ORACLE`) as subqueries and recomputes TP/precision/recall
  itself. At 100 TB this runs on a fixture-sized audit sample; the
  point is that the measurement itself is exact and portable.

Reference parity: diagram-only reference (SURVEY.md §0); sessions /
churn extend [C] behavioral analytics and ml-prep, the recall eval
extends the [C] dedup family's quality evidence (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import US_PER_DAY as _US_PER_DAY, snap6 as _snap6
from . import register

_SESSION_GAP_US = 30 * 60 * 1_000_000

# ---------------------------------------------------------------------------
# Sessionization. new-session flag from a per-user lag, session id
# from a per-user conditional running sum -- both windows partitioned
# by user, so the scan parallelizes. Equal-microsecond ties share a
# session whatever their order (gap 0 <= threshold), and the
# (us, event_id) ordering pins the frame deterministically anyway.
# ---------------------------------------------------------------------------

_SESSION_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id)
                   > {_SESSION_GAP_US}
              OR lag(us) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM ev
),
tagged AS (
  SELECT user_id, us,
         CAST(sum(new_s) OVER (PARTITION BY user_id
              ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sid
  FROM flagged
),
sess AS (
  SELECT user_id, sid,
         CAST(count(*) AS BIGINT) AS n_ev,
         CAST(max(us) - min(us) AS BIGINT) AS dur_us,
         CAST(min(us) // {_US_PER_DAY} AS BIGINT) AS day_num
  FROM tagged GROUP BY user_id, sid
)
SELECT day_num,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       floor(CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 1e6 + 0.5) / 1e6 AS bounce_rate_s,
       floor(CAST(sum(n_ev) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
         AS avg_events_s,
       floor(CAST(sum(dur_us) AS DOUBLE) / 1e6 / count(*) * 1e6 + 0.5)
         / 1e6 AS avg_duration_sec_s
FROM sess
GROUP BY day_num
ORDER BY day_num
"""


@register("events_session_stats", oracle=_SESSION_ORACLE)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session summary (bounce rate, mean events, mean
    duration) from 30-min-gap sessionization, exact microseconds."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"))
    wl = W.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.select(
        "user_id", "event_id", "us",
        F.when(
            (F.col("us") - F.lag("us").over(wl) > _SESSION_GAP_US)
            | F.lag("us").over(wl).isNull(), 1).otherwise(0)
        .alias("new_s"),
    )
    # The running sum uses the SAME (us, event_id) total order as the
    # lag: an equal-us tie group whose first row opens a session would
    # otherwise split across session ids depending on engine tie
    # order -- the frame must be pinned, not just the flag.
    tagged = flagged.select(
        "user_id", "us",
        F.sum("new_s").over(wl.rowsBetween(W.unboundedPreceding, 0))
        .cast("long").alias("sid"),
    )
    sess = tagged.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        (F.max("us") - F.min("us")).cast("long").alias("dur_us"),
        F.expr(f"min(us) div {_US_PER_DAY}").cast("long").alias("day_num"),
    )
    n = F.count(F.lit(1))
    bounces = F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
    return (
        sess.groupBy("day_num")
        .agg(
            n.cast("long").alias("n_sessions"),
            bounces.cast("long").alias("n_bounces"),
            _snap6(bounces.cast("double") / n).alias("bounce_rate_s"),
            _snap6(F.sum("n_ev").cast("double") / n).alias("avg_events_s"),
            _snap6(F.sum("dur_us").cast("double") / 1e6 / n)
            .alias("avg_duration_sec_s"),
        )
        .orderBy("day_num")
    )


# ---------------------------------------------------------------------------
# Churn labels. day = us div us_per_day; cutoff/horizon are integer
# day literals inside the fixture's span. Observation features and
# horizon labels come from DISJOINT day ranges of one scan; the
# population is observation-window users (left join to the horizon
# set), so the construction cannot leak future activity into a
# feature or score unseen users.
# ---------------------------------------------------------------------------

_CHURN_CUTOFF_DAY = 19743  # 2024-01-21 (fixture spans 2024-01)
_CHURN_HORIZON_DAYS = 10

_CHURN_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(CAST(epoch_us(ts) AS BIGINT) // {_US_PER_DAY} AS BIGINT)
           AS day
  FROM events
),
obs AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events_obs,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases_obs,
         CAST({_CHURN_CUTOFF_DAY} - max(day) AS BIGINT)
           AS days_since_last
  FROM ev WHERE day < {_CHURN_CUTOFF_DAY}
  GROUP BY user_id
),
fut AS (
  SELECT DISTINCT user_id FROM ev
  WHERE day >= {_CHURN_CUTOFF_DAY}
    AND day < {_CHURN_CUTOFF_DAY} + {_CHURN_HORIZON_DAYS}
)
SELECT o.user_id, o.n_events_obs, o.n_purchases_obs, o.days_since_last,
       CAST(CASE WHEN f.user_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS churned
FROM obs o LEFT JOIN fut f ON f.user_id = o.user_id
ORDER BY o.user_id
"""


@register("ml_churn_labels", oracle=_CHURN_ORACLE)
def ml_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn label table: observation-window features,
    horizon-window label, disjoint day ranges of one scan."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").cast("long")
        .alias("day"),
    )
    obs = (
        ev.where(F.col("day") < _CHURN_CUTOFF_DAY)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events_obs"),
            F.sum(F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0)).cast("long").alias("n_purchases_obs"),
            (F.lit(_CHURN_CUTOFF_DAY) - F.max("day")).cast("long")
            .alias("days_since_last"),
        )
    )
    fut = (
        ev.where((F.col("day") >= _CHURN_CUTOFF_DAY)
                 & (F.col("day") < _CHURN_CUTOFF_DAY
                    + _CHURN_HORIZON_DAYS))
        .select("user_id").distinct()
        .withColumn("__seen", F.lit(1))
    )
    return (
        obs.join(fut, "user_id", "left")
        .select(
            "user_id", "n_events_obs", "n_purchases_obs",
            "days_since_last",
            F.when(F.col("__seen").isNull(), 1).otherwise(0).cast("long")
            .alias("churned"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# MinHash quality evaluation. Predicted = the portable banded-LSH
# candidates (est >= 0.5); truth = exact trigram Jaccard >= 0.6.
# The oracle recomputes BOTH sides from scratch by composing the two
# proven replicas as subqueries, then counts TP and snaps P/R --
# the measurement itself is inside the hash.
# ---------------------------------------------------------------------------


def _recall_eval_oracle() -> str:
    from .dedup import _JACCARD_ORACLE, _minhash_portable_oracle

    return f"""
WITH pred AS (SELECT id_a, id_b FROM ({_minhash_portable_oracle()})),
truth AS (SELECT id_a, id_b FROM ({_JACCARD_ORACLE})),
tp AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tp
  FROM pred p JOIN truth t ON t.id_a = p.id_a AND t.id_b = p.id_b
),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pred FROM pred),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
SELECT np.n_pred, nt.n_truth, tp.n_tp,
       floor(CAST(tp.n_tp AS DOUBLE) / nullif(np.n_pred, 0) * 1e6 + 0.5)
         / 1e6 AS precision_s,
       floor(CAST(tp.n_tp AS DOUBLE) / nullif(nt.n_truth, 0) * 1e6 + 0.5)
         / 1e6 AS recall_s
FROM np CROSS JOIN nt CROSS JOIN tp
"""


@register("dedup_minhash_recall_eval", oracle=_recall_eval_oracle())
def dedup_minhash_recall_eval(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Precision/recall of portable banded-MinHash candidates against
    exact trigram-Jaccard ground truth, hash-checked end to end."""
    from ..operators.dedup import minhash_neardup_pairs, ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    pred = minhash_neardup_pairs(
        docs, num_hashes=32, bands=16, est_threshold=0.5,
        repartition_to=spark.sparkContext.defaultParallelism,
        hash_fn="portable", est_round=None,
    ).select("id_a", "id_b")
    truth = ngram_jaccard_pairs(docs, n=3, threshold=0.6) \
        .select("id_a", "id_b")
    np_ = pred.agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    tp = pred.join(truth, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_tp"))
    return (
        np_.crossJoin(nt).crossJoin(tp)
        .select(
            "n_pred", "n_truth", "n_tp",
            _snap6(F.col("n_tp").cast("double")
                   / F.nullif(F.col("n_pred"), F.lit(0)))
            .alias("precision_s"),
            _snap6(F.col("n_tp").cast("double")
                   / F.nullif(F.col("n_truth"), F.lit(0)))
            .alias("recall_s"),
        )
    )
