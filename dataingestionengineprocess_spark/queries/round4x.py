"""Round-4 (continued) additions: id-sequence gap audit, grouped
k-fold assignment, Fano dispersion screen.

- `quality_id_sequence_gaps` -- the ingest-integrity primitive: find
  every missing RANGE in the order-key sequence (islands over
  distinct keys via the day_num - row_number idiom, then the holes
  between consecutive islands from a lead window over the bounded
  island table). A feed that silently drops rows shows up here
  before any downstream join notices.
- `ml_group_kfold_assign` -- leakage-safe k-fold: every USER (not
  event) lands in exactly one of 5 folds by md5, so no user
  straddles train/validation; the output is the per-fold balance
  sheet (users, events, purchases) a fold assignment must publish.
- `events_fano_burstiness` -- the Fano factor (variance/mean) of
  daily counts per event type from exact integer power sums:
  n*sum(y^2) - sum(y)^2 over n*sum(y), snapped once -- the over-/
  under-dispersion screen that separates bursty from Poisson-like
  and metronomic streams.

Reference parity: diagram-only reference (SURVEY.md §0); the gap
audit extends the [R] validation stage, the others [C] ml-prep /
monitoring (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from . import register

# ---------------------------------------------------------------------------
# Sequence gaps. Islands of consecutive keys collapse the corpus to
# a bounded island table; the holes are read off a lead window over
# it. Output: each gap's bounds and width, plus nothing at all for a
# gapless sequence.
#
# Scale shape: the classic key - row_number island idiom needs a
# GLOBAL dense rank -- a corpus-wide single-partition window. Instead
# the keys are bucketed by key div B, islands are found with
# PER-BUCKET windows (partitioned, parallel), and islands that touch
# across a bucket boundary are merged with one conditional-running-sum
# window over the island summary table only (bounded by
# n_gaps + n_keys/B rows -- ~366k at 1.5e9 keys with B=4096, vs 1.5e9
# through a single task for the global-rank form). The DuckDB oracle
# keeps the one-shot global idiom: same gaps either way.
# ---------------------------------------------------------------------------

_GAPS_ORACLE = """
WITH ks AS (SELECT DISTINCT o_orderkey AS k FROM orders),
runs AS (
  SELECT k, k - row_number() OVER (ORDER BY k) AS grp FROM ks
),
islands AS (
  SELECT CAST(min(k) AS BIGINT) AS lo, CAST(max(k) AS BIGINT) AS hi
  FROM runs GROUP BY grp
),
holes AS (
  SELECT hi + 1 AS gap_lo,
         lead(lo) OVER (ORDER BY lo) - 1 AS gap_hi
  FROM islands
)
SELECT CAST(gap_lo AS BIGINT) AS gap_lo,
       CAST(gap_hi AS BIGINT) AS gap_hi,
       CAST(gap_hi - gap_lo + 1 AS BIGINT) AS n_missing
FROM holes
WHERE gap_hi IS NOT NULL
ORDER BY gap_lo
"""


_GAP_BUCKET = 4096  # keys per island bucket; sf0.01 spans 4 buckets,
# so the driver gate exercises the cross-boundary merge


def sequence_islands(keys: DataFrame, key: str = "k",
                     bucket: int = _GAP_BUCKET) -> DataFrame:
    """Maximal runs of consecutive integers in ``keys`` as (lo, hi)
    islands, without a corpus-wide single-partition window: per-bucket
    key - row_number islands (parallel), then boundary-touching
    islands merged by a conditional running sum over the bounded
    island summary."""
    k = F.col(key)
    runs = keys.select(
        k.alias("k"), (k - (k % bucket)).alias("b")
    ).withColumn(
        "grp",
        F.col("k") - F.row_number().over(W.partitionBy("b").orderBy("k")),
    )
    local = runs.groupBy("b", "grp").agg(
        F.min("k").cast("long").alias("lo"),
        F.max("k").cast("long").alias("hi"),
    )
    w_ord = W.orderBy("lo")
    w_run = w_ord.rowsBetween(W.unboundedPreceding, 0)
    starts_new = F.when(
        F.col("lo") > F.lag("hi").over(w_ord) + 1, 1).otherwise(0)
    return (
        local.withColumn("mgrp", F.sum(starts_new).over(w_run))
        .groupBy("mgrp")
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
    )


@register("quality_id_sequence_gaps", oracle=_GAPS_ORACLE)
def quality_id_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every missing range in the order-key sequence: islands of
    consecutive keys, then the holes between them."""
    ks = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")).distinct()
    islands = sequence_islands(ks)
    holes = islands.select(
        (F.col("hi") + 1).alias("gap_lo"),
        (F.lead("lo").over(W.orderBy("lo")) - 1).alias("gap_hi"),
    )
    return (
        holes.where(F.col("gap_hi").isNotNull())
        .select(
            F.col("gap_lo").cast("long").alias("gap_lo"),
            F.col("gap_hi").cast("long").alias("gap_hi"),
            (F.col("gap_hi") - F.col("gap_lo") + 1).cast("long")
            .alias("n_missing"),
        )
        .orderBy("gap_lo")
    )


# ---------------------------------------------------------------------------
# Grouped k-fold. fold(user) = md5(user_id) mod 5 -- deterministic,
# uniform, and GROUP-level: all of a user's events share the fold,
# so no user leaks across the split. The balance sheet aggregates
# per fold; the user-integrity invariant (one fold per user) is
# structural (fold is a function of user_id alone) and the tests
# assert it anyway.
# ---------------------------------------------------------------------------

_KFOLD_ORACLE = """
WITH tagged AS (
  SELECT user_id, event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6))
              AS BIGINT) % 5 AS fold
  FROM events
)
SELECT fold,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
FROM tagged
GROUP BY fold
ORDER BY fold
"""


@register("ml_group_kfold_assign", oracle=_KFOLD_ORACLE)
def ml_group_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 5-fold assignment by user md5 with the per-fold
    balance sheet (users, events, purchases)."""
    from ..functions.text import md5_bucket

    ev = load(spark, sf_dir, "events")
    # THE shared bucket arithmetic (functions/text.py:md5_bucket) --
    # same 6-hex-digit fold coin as every other split/mix/resample
    # surface, so the fold assignment cannot drift from them.
    fold = md5_bucket(F.col("user_id").cast("string").cast("binary"), 5)
    return (
        ev.select(fold.alias("fold"), "user_id", "event_type")
        .groupBy("fold")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0)).cast("long").alias("n_purchases"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Fano factor. Daily counts per type on the densified day axis
# (zero days count); variance and mean from exact integer power
# sums: fano = (n*sum(y^2) - sum(y)^2) / (n * sum(y)), snapped once.
# (Population variance over mean; > 1 over-dispersed / bursty,
# < 1 under-dispersed / metronomic.)
# ---------------------------------------------------------------------------

_FANO_ORACLE = """
WITH counts AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT CAST(max(d) + 1 AS BIGINT) AS n_days FROM counts
),
axis AS (
  SELECT t.event_type, CAST(i.i AS BIGINT) AS d
  FROM (SELECT DISTINCT event_type FROM counts) t
  CROSS JOIN (SELECT unnest(range(0, (SELECT CAST(n_days AS INTEGER)
                                      FROM span))) AS i) i
),
dense AS (
  SELECT a.event_type, COALESCE(c.y, 0) AS y
  FROM axis a LEFT JOIN counts c
    ON c.event_type = a.event_type AND c.d = a.d
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(y) AS BIGINT) AS n_events,
       floor(CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE)
             / nullif(count(*) * sum(y), 0) * 1e6 + 0.5) / 1e6
         AS fano_s
FROM dense
GROUP BY event_type
ORDER BY event_type
"""


@register("events_fano_burstiness", oracle=_FANO_ORACLE)
def events_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (var/mean) of daily counts per event type from
    exact integer power sums over the densified day axis."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
        .alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y")) \
     .localCheckpoint(eager=True)  # bounded (type x day), feeds 3 legs
    span = counts.agg((F.max("d") + 1).cast("long").alias("n_days"))
    types = counts.select("event_type").distinct()
    axis = (
        types.crossJoin(F.broadcast(span))
        .select("event_type",
                F.explode(F.sequence(F.lit(0), F.col("n_days") - 1))
                .alias("d"))
    )
    dense = (
        axis.join(counts, ["event_type", "d"], "left")
        .select("event_type", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    n = F.count(F.lit(1))
    sy = F.sum("y")
    syy = F.sum(F.col("y") * F.col("y"))
    return (
        dense.groupBy("event_type")
        .agg(
            n.cast("long").alias("n_days"),
            sy.cast("long").alias("n_events"),
            _snap6((n * syy - sy * sy).cast("double")
                   / F.nullif(n * sy, F.lit(0))).alias("fano_s"),
        )
        .orderBy("event_type")
    )
