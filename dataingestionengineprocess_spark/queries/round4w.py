"""Round-4 (continued) additions: Markov conditional entropy,
quota-applied stratified sampling, and the column profiler.

- `events_markov_entropy_rate` -- per-state conditional entropy of
  the user-journey transition chain: H(next | prev) for each prev
  action from exact bigram counts, ln snapped on exact ratios and
  per-term int64 quantization. The sequence-predictability
  diagnostic next to events_markov_stationary (which answers "where
  does the chain settle", not "how random is each step").
- `sample_quota_apply` -- the APPLY half of Hamilton apportionment:
  allocate 200 slots across (lang, source) strata (largest-remainder,
  same integer algebra as agg_largest_remainder_quota), then draw
  exactly min(quota, n_docs) md5-ranked documents per stratum and
  pin the selection with an md5 digest of the ordered ids -- the
  full stratified-sampling loop as one query.
- `quality_column_profile` -- the ingestion-side data profiler: one
  pass over orders producing per-column null count, exact distinct
  count, and min/max (normalized to strings on a fixed rendering),
  via a single wide aggregate unpivoted with stack(). The
  first-contact screen every feed gets before schema contracts are
  written.

Reference parity: diagram-only reference (SURVEY.md §0); profiling
extends the [R] quality/validation stage (the diagram's Python
process step); the other two extend [C] curation/analytics
(BASELINE.json:6).

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
# Conditional entropy per prev state. Transitions are user-ordered
# (ts, event_id) lags; H(next|prev=x) = -sum_y (c_xy/c_x) ln(c_xy/c_x)
# with the ln on the snapped exact ratio and each term quantized to
# int64 before the group sum (order-independent). p_x = c_x / N is a
# snapped exact ratio too, so the output also carries the mixture
# weight needed for the overall entropy rate.
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
bi AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS c_xy
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
uni AS (
  SELECT prev_type, CAST(sum(c_xy) AS BIGINT) AS c_x FROM bi
  GROUP BY prev_type
),
n AS (SELECT CAST(sum(c_x) AS BIGINT) AS n_total FROM uni),
ratio AS (
  SELECT b.prev_type, u.c_x,
         CAST(b.c_xy AS DOUBLE) / u.c_x AS r_raw,
         floor(CAST(b.c_xy AS DOUBLE) / u.c_x * 1e6 + 0.5) / 1e6 AS r_s
  FROM bi b JOIN uni u ON u.prev_type = b.prev_type
),
terms AS (
  SELECT prev_type, c_x,
         CASE WHEN r_s > 0 THEN
           CAST(floor(r_raw * (floor(ln(r_s) * 1e6 + 0.5) / 1e6)
                      * 1e6 + 0.5) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS term_q
  FROM ratio
)
SELECT t.prev_type,
       CAST(max(t.c_x) AS BIGINT) AS n_out,
       floor(CAST(max(t.c_x) AS DOUBLE) / max(n.n_total) * 1e6 + 0.5)
         / 1e6 AS p_prev_s,
       floor(-sum(t.term_q) / 1e6 * 1e6 + 0.5) / 1e6 AS h_cond_s
FROM terms t CROSS JOIN n
GROUP BY t.prev_type
ORDER BY t.prev_type
"""


@register("events_markov_entropy_rate", oracle=_ENTROPY_ORACLE)
def events_markov_entropy_rate(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Conditional entropy H(next|prev) per journey state from exact
    bigram counts, int64-quantized terms."""
    ev = load(spark, sf_dir, "events")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(wl).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    bi = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c_xy")
    ).localCheckpoint(eager=True)  # bounded state space, feeds 2 legs
    uni = bi.groupBy("prev_type").agg(
        F.sum("c_xy").cast("long").alias("c_x"))
    n = uni.agg(F.sum("c_x").cast("long").alias("n_total"))
    ratio_s = _snap6(F.col("c_xy").cast("double") / F.col("c_x"))
    # A transition rarer than 5e-7 of its prev state's traffic snaps to
    # a 0 ratio; p*ln(p) -> 0 there, so both engines drop the term
    # EXPLICITLY (Spark log(0)=NULL would silently null the term while
    # DuckDB ln(0) raises Out of Range).
    term_q = (
        F.when(
            ratio_s > 0,
            F.floor(
                (F.col("c_xy").cast("double") / F.col("c_x"))
                * _snap6(F.log(ratio_s)) * 1e6 + 0.5).cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )
    terms = (
        bi.join(F.broadcast(uni), "prev_type")
        .select("prev_type", "c_x", term_q.alias("term_q"))
    )
    return (
        terms.crossJoin(F.broadcast(n))
        .groupBy("prev_type")
        .agg(
            F.max("c_x").cast("long").alias("n_out"),
            _snap6(F.max("c_x").cast("double") / F.max("n_total"))
            .alias("p_prev_s"),
            _snap6(-F.sum("term_q") / 1e6).alias("h_cond_s"),
        )
        .orderBy("prev_type")
    )


# ---------------------------------------------------------------------------
# Quota-applied stratified sample. The apportionment algebra repeats
# agg_largest_remainder_quota at K = 200; the draw ranks documents
# inside each stratum by (md5(doc_id), doc_id) -- a deterministic
# uniform order -- and takes min(quota, n_docs). The md5 digest of
# the comma-joined ordered ids pins the exact selection without
# shipping it.
# ---------------------------------------------------------------------------

_APPLY_K = 200

_APPLY_ORACLE = f"""
WITH strata AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang, source
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM strata),
base AS (
  SELECT s.lang, s.source, s.n_docs,
         CAST(({_APPLY_K} * s.n_docs) // t.n AS BIGINT) AS floor_q,
         CAST(({_APPLY_K} * s.n_docs) % t.n AS BIGINT) AS rem
  FROM strata s CROSS JOIN tot t
),
quota AS (
  SELECT lang, source, n_docs,
         CAST(floor_q + CASE WHEN
              row_number() OVER (ORDER BY rem DESC, lang, source)
              <= {_APPLY_K} - (SELECT sum(floor_q) FROM base)
              THEN 1 ELSE 0 END AS BIGINT) AS quota
  FROM base
),
ranked AS (
  SELECT d.lang, d.source, d.doc_id,
         row_number() OVER (PARTITION BY d.lang, d.source
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                     d.doc_id) AS rk
  FROM documents d
),
drawn AS (
  SELECT r.lang, r.source, r.doc_id
  FROM ranked r JOIN quota q
    ON q.lang = r.lang AND q.source = r.source
  WHERE r.rk <= least(q.quota, q.n_docs)
)
SELECT q.lang, q.source, q.n_docs, q.quota,
       CAST(COALESCE(count(d.doc_id), 0) AS BIGINT) AS n_sampled,
       md5(COALESCE(string_agg(d.doc_id, ',' ORDER BY d.doc_id), ''))
         AS sample_md5
FROM quota q LEFT JOIN drawn d
  ON d.lang = q.lang AND d.source = q.source
GROUP BY q.lang, q.source, q.n_docs, q.quota
ORDER BY q.lang, q.source
"""


@register("sample_quota_apply", oracle=_APPLY_ORACLE)
def sample_quota_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton quotas at K=200 applied: md5-ranked draw per stratum,
    selection pinned by an md5 digest of the ordered ids."""
    from ..operators.sampling import hamilton_quota

    docs = load(spark, sf_dir, "documents")
    strata = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    # Shared apportionment algebra (operators/sampling.py) -- same
    # remainder ranking as agg_largest_remainder_quota, K=200.
    quota = hamilton_quota(strata, _APPLY_K).select(
        "lang", "source", "n_docs", "quota")
    ranked = docs.select(
        "lang", "source", "doc_id",
        F.row_number().over(
            W.partitionBy("lang", "source")
            .orderBy(F.md5(F.col("doc_id").cast("string").cast("binary")),
                     "doc_id")).alias("rk"),
    )
    drawn = (
        ranked.join(F.broadcast(quota), ["lang", "source"])
        .where(F.col("rk") <= F.least(F.col("quota"), F.col("n_docs")))
        .select("lang", "source", "doc_id")
    )
    digest = F.md5(
        F.coalesce(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("doc_id")),
                            lambda x: x.cast("string")), ","),
            F.lit("")).cast("binary"))
    agg = drawn.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        digest.alias("sample_md5"),
    )
    return (
        quota.join(agg, ["lang", "source"], "left")
        .select(
            "lang", "source", "n_docs", "quota",
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("long")
            .alias("n_sampled"),
            F.coalesce(F.col("sample_md5"),
                       F.md5(F.lit("").cast("binary"))).alias("sample_md5"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# Column profiler. One wide aggregate over a single scan (count,
# per-column nulls, exact distincts, min/max on a fixed string
# rendering: integer cents for money, day numbers for dates), then
# stack() unpivots the row into the per-column profile table. The
# fixed rendering keeps min/max comparable across engines without
# timestamp-format ambiguity.
# ---------------------------------------------------------------------------

_PROFILE_ORACLE = """
WITH t AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
         date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE))
           AS day_num,
         o_orderpriority
  FROM orders
)
SELECT 'o_custkey' AS col_name,
       CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(min(o_custkey) AS VARCHAR) AS min_s,
       CAST(max(o_custkey) AS VARCHAR) AS max_s
FROM t
UNION ALL
SELECT 'o_orderkey', CAST(count(*) - count(o_orderkey) AS BIGINT),
       CAST(count(DISTINCT o_orderkey) AS BIGINT),
       CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
FROM t
UNION ALL
SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       min(o_orderpriority), max(o_orderpriority)
FROM t
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       min(o_orderstatus), max(o_orderstatus)
FROM t
UNION ALL
SELECT 'orderdate_day', CAST(count(*) - count(day_num) AS BIGINT),
       CAST(count(DISTINCT day_num) AS BIGINT),
       CAST(min(day_num) AS VARCHAR), CAST(max(day_num) AS VARCHAR)
FROM t
UNION ALL
SELECT 'price_cents', CAST(count(*) - count(price_cents) AS BIGINT),
       CAST(count(DISTINCT price_cents) AS BIGINT),
       CAST(min(price_cents) AS VARCHAR), CAST(max(price_cents) AS VARCHAR)
FROM t
ORDER BY col_name
"""


@register("quality_column_profile", oracle=_PROFILE_ORACLE)
def quality_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null / distinct / min / max profile of orders from
    ONE wide aggregate, unpivoted with stack()."""
    from ..operators.skew import spread_input

    # spread: the 6 countDistincts rewrite through a 7-way Expand, and
    # a single-file source would run that blowup on one core
    t = spread_input(load(spark, sf_dir, "orders")).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        .alias("price_cents"),
        F.datediff(F.to_date("o_orderdate"),
                   F.to_date(F.lit("2024-01-01"))).alias("day_num"),
        "o_orderpriority",
    )
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "price_cents",
            "day_num", "o_orderpriority"]
    names = {"price_cents": "price_cents", "day_num": "orderdate_day"}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    wide = t.agg(*aggs)
    stack_args = ", ".join(
        f"'{names.get(c, c)}', _n - {c}__nn, {c}__nd, {c}__mn, {c}__mx"
        for c in cols
    )
    return (
        wide.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_s, max_s)")
        .select(
            "col_name",
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_s", "max_s",
        )
        .orderBy("col_name")
    )
