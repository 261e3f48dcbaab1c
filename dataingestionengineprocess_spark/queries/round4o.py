"""Round-4 (continued) additions: exact weighted quantiles and the
fill-in-the-middle transform.

- `agg_weighted_median` -- exact weighted median + weighted p90 of
  the extended price per return flag, weighted by quantity: the
  aggregate Spark has no native form of (percentile() weights rows
  equally), computed as the first value whose cumulative weight
  crosses the target -- one cum-weight window over each group.
- `curation_fim_transform` -- fill-in-the-middle: split each
  document at two md5-deterministic cut points into
  prefix/middle/suffix and emit the PSM re-ordering
  (prefix || suffix || middle with sentinel markers) plus span
  metadata -- the code-model pretraining transform (Bavarian et al.,
  2022, arXiv:2207.14255), as a map-only codegen pass.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[S] aggregate and [C] curation families (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import md5_bucket
from . import register

# ---------------------------------------------------------------------------
# Weighted quantiles. Definition (the standard inclusive form): the
# weighted q-quantile is the smallest value v such that the
# cumulative weight of rows with value <= v reaches q * W. Exact
# integer weights (quantity as int64 units) and integer cents keep
# the crossing test exact. Intra-tie order within equal cents is NOT
# pinned and doesn't need to be: the crossing test selects at
# tie-GROUP granularity -- every permutation of a tie group crosses
# q*W at the same value -- so the row stream can be pre-collapsed to
# one row per (flag, cents) without changing any crossing value.
#
# Scale: l_returnflag has cardinality 3, so a window PARTITION BY
# flag funnels ~a third of the table through one task. Instead:
# (1) distributive hash-agg to (flag, cents) -- a real shuffle over
# a high-cardinality composite key with map-side combine; (2) ONE
# `distributed_prefix_sum` over the (flag, cents) total order --
# range-partitioned local windows + broadcast offsets, never a
# whole-group sort; (3) per-flag cumulative = global cumulative minus
# the flag's exclusive base offset, where the base offsets come from
# the 3-row flag-total table (bounded model state). No stage sorts
# more than one range partition's rows.
# ---------------------------------------------------------------------------

_WMED_ORACLE = """
WITH w AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS wt
  FROM lineitem
),
cum AS (
  SELECT flag, cents, wt,
         CAST(sum(wt) OVER (PARTITION BY flag ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cw,
         CAST(sum(wt) OVER (PARTITION BY flag) AS BIGINT) AS tw
  FROM w
)
SELECT flag,
       CAST(max(tw) AS BIGINT) AS total_weight,
       CAST(min(CASE WHEN cw * 2 >= tw THEN cents END) AS BIGINT)
         AS wmedian_cents,
       CAST(min(CASE WHEN cw * 10 >= tw * 9 THEN cents END) AS BIGINT)
         AS wp90_cents
FROM cum
GROUP BY flag
ORDER BY flag
"""


@register("agg_weighted_median", oracle=_WMED_ORACLE)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median and p90 of extended price per
    return flag via the cumulative-weight crossing rule."""
    from ..operators.ranking import distributed_prefix_sum

    li = load(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("wt"),
    )
    # tie-group collapse: exact (crossing test is tie-group invariant)
    # and shrinks the ranked stream to |distinct (flag, cents)|
    g = w.groupBy("flag", "cents").agg(
        F.sum("wt").cast("long").alias("w"))
    # global inclusive cumsum over the (flag, cents) total order --
    # flags sort contiguously, so per-flag cum = global cum - base
    cum = distributed_prefix_sum(g, ["flag", "cents"], "w", "gcum")
    # 3-row bounded state off the checkpointed frame, declaratively:
    # each flag's exclusive base is the value of (global cum - own
    # weight) at its FIRST row, i.e. min(gcum - w) per flag -- one
    # distributive aggregate, no driver collect, no Python sort
    # (same idiom as curation._sharded_prev_cum's per-source base)
    offs = cum.groupBy("flag").agg(
        F.sum("w").cast("long").alias("tw"),
        F.min(F.col("gcum") - F.col("w")).cast("long").alias("base"))
    cw = (F.col("gcum") - F.col("base")).cast("long")
    return (
        cum.join(F.broadcast(offs), "flag")
        .groupBy("flag")
        .agg(
            F.max("tw").cast("long").alias("total_weight"),
            F.min(F.when(cw * 2 >= F.col("tw"), F.col("cents")))
            .cast("long").alias("wmedian_cents"),
            F.min(F.when(cw * 10 >= F.col("tw") * 9, F.col("cents")))
            .cast("long").alias("wp90_cents"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# FIM. Cut points derive from two md5 coins so both engines split
# identically: a = 1 + coin1 mod floor(n/3) keeps a non-empty
# prefix; b = a + 1 + coin2 mod floor(n/3) keeps a non-empty middle
# and suffix (docs shorter than 6 chars pass through unchanged,
# fim_applied = 0). Output is the PSM ordering with <PRE>/<SUF>/
# <MID> sentinels plus the span lengths, and a length-conservation
# column the oracle re-derives (built + sentinels == original + 15).
#
# Scale: map-only substring arithmetic inside codegen; no shuffle at
# all until the driver's own output ordering.
# ---------------------------------------------------------------------------

_FIM_ORACLE = """
WITH base AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':fim1'),
                                  1, 6) AS BIGINT) % 1000000 AS BIGINT)
           AS c1,
         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':fim2'),
                                  1, 6) AS BIGINT) % 1000000 AS BIGINT)
           AS c2
  FROM documents
),
cuts AS (
  SELECT doc_id, text, n,
         CASE WHEN n >= 6
              THEN 1 + c1 % CAST(floor(n / 3.0) AS BIGINT) END AS a,
         CASE WHEN n >= 6
              THEN (1 + c1 % CAST(floor(n / 3.0) AS BIGINT)) + 1
                   + c2 % CAST(floor(n / 3.0) AS BIGINT) END AS b
  FROM base
)
SELECT doc_id,
       CASE WHEN a IS NULL THEN 0 ELSE 1 END AS fim_applied,
       CASE WHEN a IS NULL THEN n ELSE a END AS len_prefix,
       CASE WHEN a IS NULL THEN 0 ELSE b - a END AS len_middle,
       CASE WHEN a IS NULL THEN 0 ELSE n - b END AS len_suffix,
       CASE WHEN a IS NULL THEN text
            ELSE '<PRE>' || substr(text, 1, CAST(a AS INTEGER))
                 || '<SUF>' || substr(text, CAST(b + 1 AS INTEGER))
                 || '<MID>'
                 || substr(text, CAST(a + 1 AS INTEGER),
                           CAST(b - a AS INTEGER))
       END AS fim_text,
       CASE WHEN a IS NULL THEN length(text) = n
            ELSE CAST(length('<PRE>' || substr(text, 1, CAST(a AS INTEGER))
                 || '<SUF>' || substr(text, CAST(b + 1 AS INTEGER))
                 || '<MID>'
                 || substr(text, CAST(a + 1 AS INTEGER),
                           CAST(b - a AS INTEGER))) AS BIGINT) = n + 15
       END AS length_conserved
FROM cuts
ORDER BY doc_id
"""


@register("curation_fim_transform", oracle=_FIM_ORACLE)
def curation_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSM fill-in-the-middle re-ordering with md5-deterministic cut
    points, span metadata, and a length-conservation check."""
    docs = load(spark, sf_dir, "documents")
    n = F.length("text").cast("long")
    third = F.floor(n / 3.0).cast("long")
    did = F.col("doc_id").cast("string")
    c1 = md5_bucket(F.concat(did, F.lit(":fim1")), 1000000)
    c2 = md5_bucket(F.concat(did, F.lit(":fim2")), 1000000)
    a = F.when(n >= 6, 1 + c1 % third)
    b = F.when(n >= 6, (1 + c1 % third) + 1 + c2 % third)
    base = docs.select("doc_id", "text", n.alias("n"),
                       a.alias("a"), b.alias("b"))
    aa, bb, nn = F.col("a"), F.col("b"), F.col("n")
    fim = F.concat(
        F.lit("<PRE>"), F.substring(F.col("text"), 1, aa.cast("int")),
        F.lit("<SUF>"),
        F.col("text").substr(bb.cast("int") + 1, nn.cast("int")),
        F.lit("<MID>"),
        F.col("text").substr(aa.cast("int") + 1, (bb - aa).cast("int")),
    )
    return (
        base.select(
            "doc_id",
            F.when(aa.isNull(), 0).otherwise(1).alias("fim_applied"),
            F.when(aa.isNull(), nn).otherwise(aa).cast("long")
            .alias("len_prefix"),
            F.when(aa.isNull(), 0).otherwise(bb - aa).cast("long")
            .alias("len_middle"),
            F.when(aa.isNull(), 0).otherwise(nn - bb).cast("long")
            .alias("len_suffix"),
            F.when(aa.isNull(), F.col("text")).otherwise(fim)
            .alias("fim_text"),
            F.when(aa.isNull(), F.length("text").cast("long") == nn)
            .otherwise(F.length(fim).cast("long") == nn + 15)
            .alias("length_conserved"),
        )
        .orderBy("doc_id")
    )
