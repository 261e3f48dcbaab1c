"""Round-4 (continued) additions: winnowing fingerprints and
activity islands.

- `text_winnowing_fingerprints` -- the MOSS winnowing scheme
  (Schleimer, Wilkerson, Aiken, SIGMOD'03): character k-gram hashes,
  rightmost-minimum selection per sliding window of w hashes,
  deduplicated picks. The guarantee winnowing adds over plain
  rolling-hash fingerprints is POSITIONAL: any shared substring of
  length >= w + k - 1 between two documents yields at least one
  shared fingerprint, so the selected set is a provable near-dup
  detector, not a heuristic sample.
- `events_activity_islands` -- gaps-and-islands over each user's
  distinct active days (day_num - row_number grouping): islands of
  consecutive activity, per-user island count / longest streak /
  longest-streak start. The retention primitive that session windows
  (intra-day) do not cover.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[C] dedup/fingerprint and [S] engagement-analytics families
(BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from . import register

# ---------------------------------------------------------------------------
# Winnowing. k = 8 character grams, w = 8 hash window. Hash is the
# first 8 md5 hex digits as int64 (32-bit range) -- the portable twin
# of an xxhash64 deployment, same fold both engines.
#
# Selection follows the paper exactly: every FULL window of w
# consecutive gram hashes picks its minimum, rightmost occurrence on
# ties; picks dedupe to (doc, pos, fp). Docs with fewer than w grams
# (but >= 1) degrade to one window over all their grams, preserving
# the at-least-one-fingerprint guarantee for any doc of >= k chars.
#
# Shape: the O(n) part is one forward-frame min window per doc; the
# argmax-position resolution is an equi-join on (doc_id, h = wmin)
# restricted to the w-row band -- selective (only minima survive the
# hash equality), per-doc local, nothing corpus-wide. At 100 TB this
# parallelizes per document with no shuffle beyond the doc-keyed
# window sort.
# ---------------------------------------------------------------------------

_K = 8
_W = 8

_WINNOW_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         CAST(i AS BIGINT) AS pos,
         CAST('0x' || substr(md5(substring(text, CAST(i AS INTEGER),
                                           {_K})), 1, 8) AS BIGINT) AS h
  FROM documents,
       unnest(range(1, greatest(length(text) - {_K} + 2, 1))) AS t(i)
  WHERE length(text) >= {_K}
),
bounds AS (
  SELECT doc_id, max(pos) AS max_pos FROM grams GROUP BY doc_id
),
starts AS (
  SELECT g.doc_id, g.pos AS s_pos,
         min(g.h) OVER (PARTITION BY g.doc_id ORDER BY g.pos
                        ROWS BETWEEN CURRENT ROW
                        AND {_W - 1} FOLLOWING) AS wmin
  FROM grams g
),
full_starts AS (
  SELECT s.doc_id, s.s_pos, s.wmin
  FROM starts s JOIN bounds b ON s.doc_id = b.doc_id
  WHERE s.s_pos <= greatest(b.max_pos - {_W} + 1, 1)
),
picked AS (
  SELECT s.doc_id, s.s_pos, max(g.pos) AS pos, s.wmin AS fp
  FROM full_starts s
  JOIN grams g
    ON g.doc_id = s.doc_id AND g.h = s.wmin
   AND g.pos BETWEEN s.s_pos AND s.s_pos + {_W} - 1
  GROUP BY s.doc_id, s.s_pos, s.wmin
)
SELECT DISTINCT doc_id, pos, fp
FROM picked
ORDER BY doc_id, pos
"""


@register("text_winnowing_fingerprints", oracle=_WINNOW_ORACLE)
def text_winnowing_fingerprints(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """MOSS winnowing: rightmost-min of each w-window of character
    k-gram hashes, deduplicated -- positional near-dup fingerprints
    with the shared-substring detection guarantee. Core shared with
    operators/winnow.py (scale-probed at 1x/2x/4x)."""
    from ..operators.winnow import winnow_fingerprints

    docs = load(spark, sf_dir, "documents")
    return (winnow_fingerprints(docs, k=_K, w=_W)
            .orderBy("doc_id", "pos"))


# ---------------------------------------------------------------------------
# Activity islands. Distinct active days per user; the day_num -
# row_number difference is constant exactly along a run of
# consecutive days, so grouping by it yields the islands in one
# window + one groupBy. Longest streak tie-breaks on earliest start.
#
# Scale: everything is user-keyed -- the distinct, the window, both
# groupBys ride one hash partitioning on user_id; no corpus-wide
# state.
# ---------------------------------------------------------------------------

_ISLANDS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num
  FROM events
),
runs AS (
  SELECT user_id, day_num,
         day_num - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day_num) AS grp
  FROM days
),
islands AS (
  SELECT user_id, grp,
         CAST(min(day_num) AS BIGINT) AS start_day,
         CAST(count(*) AS BIGINT) AS len
  FROM runs GROUP BY user_id, grp
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(max(len) AS BIGINT) AS longest_len,
       CAST(min(CASE WHEN len = ml THEN start_day END) AS BIGINT)
         AS longest_start_day
FROM (SELECT *, max(len) OVER (PARTITION BY user_id) AS ml
      FROM islands) t
GROUP BY user_id
ORDER BY user_id
"""


@register("events_activity_islands", oracle=_ISLANDS_ORACLE)
def events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over distinct active days: per-user streak
    count, longest streak, and its start day."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
        .alias("day_num"),
    ).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day_num"))
    runs = days.withColumn("grp", F.col("day_num") - rn)
    islands = runs.groupBy("user_id", "grp").agg(
        F.min("day_num").cast("long").alias("start_day"),
        F.count(F.lit(1)).cast("long").alias("len"),
    )
    ml = F.max("len").over(W.partitionBy("user_id"))
    return (
        islands.withColumn("ml", ml)
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.max("len").cast("long").alias("longest_len"),
            F.min(F.when(F.col("len") == F.col("ml"),
                         F.col("start_day"))).cast("long")
            .alias("longest_start_day"),
        )
        .orderBy("user_id")
    )
