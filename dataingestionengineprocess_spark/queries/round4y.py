"""Round-4 (continued) additions: exact proportional allocation,
shipment-concurrency sweep-line, and the compaction planner.

- `orders_discount_allocation` -- the classic ETL allocation: spread
  each order's header total across its lines proportional to line
  price, in integer cents, with per-order largest-remainder top-up so
  every order's allocated lines sum EXACTLY to its header total (the
  invariant is emitted as a pair of equal columns and therefore
  hash-proven, not just asserted). The same Hamilton algebra as
  `operators/sampling.hamilton_quota`, but PER GROUP: every window is
  partitioned by the order key, so the computation parallelizes over
  orders with no global window anywhere.
- `supplier_shipment_concurrency` -- sweep-line interval analytics
  per supplier: each order line contributes an activity interval
  [least(orderdate, shipdate), greatest(...)]; +1/-1 boundary deltas
  are pre-aggregated per (supplier, day), a per-supplier running sum
  gives the exact concurrency step function, and from it the peak
  in-flight count and the total covered days (sum of positive
  segments). The fixture's independent synthetic dates make half the
  raw intervals inverted -- least/greatest normalization keeps every
  row and keeps the operator total.
- `warehouse_compaction_plan` -- the small-file operational primitive
  at 100 TB: given per-partition size stats (here the bounded
  (source, lang) strata of `documents`, the same summary a real
  deployment reads from the warehouse manifest), assign partitions to
  target-capacity compaction bins by virtual concatenation in
  size-descending order (bin = start-offset div capacity). The plan
  window runs over the bounded partition summary, never over rows.

Reference parity: diagram-only reference (SURVEY.md §0); allocation
and compaction extend the [R] warehouse/OLTP sink stage, the
sweep-line extends [C] operations analytics (BASELINE.json:6).

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
# Exact proportional allocation. floor(T*c/S) per line loses < 1 cent
# each; the per-order leftover (T - sum(floor)) is < n_lines and goes
# one cent each to the lines with the largest remainders (tiebreak:
# line number). All products bounded by max_T * max_c ~ 6e14 << 2^63.
# Output: per-priority rollup with BOTH the allocated total and the
# header total -- equal columns, so exactness is inside the hash.
# ---------------------------------------------------------------------------

_ALLOC_ORACLE = """
WITH lines AS (
  SELECT o.o_orderpriority AS pri, l.l_orderkey AS ok, l.l_linenumber AS ln,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS t
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
w1 AS (
  SELECT pri, ok, ln, c, t, t * c AS prod,
         CAST(sum(c) OVER (PARTITION BY ok) AS BIGINT) AS s
  FROM lines
),
w2 AS (
  SELECT pri, ok, t, prod // s AS fa, prod % s AS rem,
         row_number() OVER (PARTITION BY ok
                            ORDER BY prod % s DESC, ln) AS rk,
         CAST(t - sum(prod // s) OVER (PARTITION BY ok) AS BIGINT)
           AS leftover
  FROM w1
),
alloc AS (
  SELECT pri, ok, t,
         CAST(fa + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
           AS a
  FROM w2
),
per AS (
  SELECT pri, CAST(count(DISTINCT ok) AS BIGINT) AS n_orders,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(a) AS BIGINT) AS alloc_cents
  FROM alloc GROUP BY pri
),
ot AS (
  SELECT pri, CAST(sum(t) AS BIGINT) AS order_cents
  FROM (SELECT DISTINCT pri, ok, t FROM lines) GROUP BY pri
)
SELECT per.pri AS o_orderpriority, per.n_orders, per.n_lines,
       per.alloc_cents, ot.order_cents
FROM per JOIN ot ON ot.pri = per.pri
ORDER BY per.pri
"""


@register("orders_discount_allocation", oracle=_ALLOC_ORACLE)
def orders_discount_allocation(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Largest-remainder allocation of each order's header cents across
    its lines; per-priority rollup carries the exactness invariant."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        .alias("c"),
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("t"),
    )
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "pri", F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"), "c", "t",
    )
    wo = W.partitionBy("ok")
    w1 = lines.select(
        "pri", "ok", "ln", "c", "t",
        (F.col("t") * F.col("c")).alias("prod"),
        F.sum("c").over(wo).cast("long").alias("s"),
    )
    w2 = w1.select(
        "pri", "ok", "ln", "t",
        F.expr("prod div s").alias("fa"),
        (F.col("prod") % F.col("s")).alias("rem"),
    )
    w3 = w2.select(
        "pri", "ok", "t", "fa",
        F.row_number().over(wo.orderBy(F.col("rem").desc(), "ln"))
        .alias("rk"),
        (F.col("t") - F.sum("fa").over(wo)).cast("long").alias("leftover"),
    )
    alloc = w3.select(
        "pri", "ok", "t",
        (F.col("fa") + F.when(F.col("rk") <= F.col("leftover"), 1)
         .otherwise(0)).cast("long").alias("a"),
    )
    per = alloc.groupBy("pri").agg(
        F.countDistinct("ok").cast("long").alias("n_orders"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("a").cast("long").alias("alloc_cents"),
    )
    ot = (
        lines.select("pri", "ok", "t").distinct()
        .groupBy("pri").agg(F.sum("t").cast("long").alias("order_cents"))
    )
    return (
        per.join(ot, "pri")
        .select(F.col("pri").alias("o_orderpriority"), "n_orders",
                "n_lines", "alloc_cents", "order_cents")
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Sweep-line concurrency. Boundary deltas are PRE-AGGREGATED per
# (supplier, day) before the running sum, so within-day event order
# can never matter; the step function is exact integers end to end.
# covered_days sums the [d, next_d) segments where concurrency > 0;
# the final boundary always carries concurrency 0 (deltas sum to 0),
# and the guard is explicit in both engines anyway.
# ---------------------------------------------------------------------------

_CONCURRENCY_ORACLE = """
WITH iv AS (
  SELECT l.l_suppkey AS sk,
         date_diff('day', DATE '1970-01-01',
                   CAST(least(o.o_orderdate, l.l_shipdate) AS DATE)) AS lo,
         date_diff('day', DATE '1970-01-01',
                   CAST(greatest(o.o_orderdate, l.l_shipdate) AS DATE)) AS hi
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
ev AS (
  SELECT sk, lo AS d, CAST(count(*) AS BIGINT) AS delta
  FROM iv GROUP BY sk, lo
  UNION ALL
  SELECT sk, hi + 1 AS d, -CAST(count(*) AS BIGINT) AS delta
  FROM iv GROUP BY sk, hi
),
ev2 AS (SELECT sk, d, CAST(sum(delta) AS BIGINT) AS delta
        FROM ev GROUP BY sk, d),
sweep AS (
  SELECT sk, d,
         CAST(sum(delta) OVER (PARTITION BY sk ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS conc,
         lead(d) OVER (PARTITION BY sk ORDER BY d) AS nxt
  FROM ev2
),
stats AS (
  SELECT sk, CAST(max(conc) AS BIGINT) AS peak_inflight,
         CAST(sum(CASE WHEN conc > 0 AND nxt IS NOT NULL
                       THEN nxt - d ELSE 0 END) AS BIGINT) AS covered_days
  FROM sweep GROUP BY sk
),
base AS (
  SELECT sk, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(max(hi) - min(lo) + 1 AS BIGINT) AS span_days
  FROM iv GROUP BY sk
)
SELECT b.sk AS s_suppkey, b.n_lines, s.peak_inflight, s.covered_days,
       b.span_days
FROM base b JOIN stats s ON s.sk = b.sk
ORDER BY b.sk
"""

_EPOCH = "1970-01-01"


@register("supplier_shipment_concurrency", oracle=_CONCURRENCY_ORACLE)
def supplier_shipment_concurrency(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Peak in-flight line count and covered days per supplier from a
    per-supplier sweep-line over exact day-number intervals."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    epoch = F.to_date(F.lit(_EPOCH))
    iv = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("sk"),
            F.datediff(
                F.to_date(F.least("o_orderdate", "l_shipdate")), epoch)
            .alias("lo"),
            F.datediff(
                F.to_date(F.greatest("o_orderdate", "l_shipdate")), epoch)
            .alias("hi"),
        )
        .localCheckpoint(eager=True)  # feeds the sweep AND the base agg
    )
    opens = iv.groupBy("sk", F.col("lo").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("delta"))
    closes = iv.groupBy("sk", (F.col("hi") + 1).alias("d")).agg(
        (-F.count(F.lit(1))).cast("long").alias("delta"))
    ev2 = (
        opens.unionByName(closes)
        .groupBy("sk", "d").agg(F.sum("delta").cast("long").alias("delta"))
    )
    ws = W.partitionBy("sk").orderBy("d")
    sweep = ev2.select(
        "sk", "d",
        F.sum("delta").over(ws.rowsBetween(W.unboundedPreceding, 0))
        .cast("long").alias("conc"),
        F.lead("d").over(ws).alias("nxt"),
    )
    stats = sweep.groupBy("sk").agg(
        F.max("conc").cast("long").alias("peak_inflight"),
        F.sum(F.when((F.col("conc") > 0) & F.col("nxt").isNotNull(),
                     F.col("nxt") - F.col("d")).otherwise(0))
        .cast("long").alias("covered_days"),
    )
    base = iv.groupBy("sk").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        (F.max("hi") - F.min("lo") + 1).cast("long").alias("span_days"),
    )
    return (
        base.join(stats, "sk")
        .select(F.col("sk").alias("s_suppkey"), "n_lines",
                "peak_inflight", "covered_days", "span_days")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Compaction planner. The input is the bounded per-partition summary
# (at 100 TB: the warehouse manifest's per-partition byte stats; here
# the (source, lang) strata, same shape). Virtual concatenation in
# size-descending order: bin = start_offset div capacity -- one
# deterministic window over the SUMMARY, so the plan costs nothing at
# any corpus size. fill_s > 1 on a bin means it absorbed a partition
# bigger than the target (those should be split, which the plan makes
# visible rather than hiding).
# ---------------------------------------------------------------------------

_COMPACT_CAP = 16_000  # target chars per compaction bin (~10 bins on
# the ~150k-char documents fixture, so the plan shape is exercised)

_COMPACT_ORACLE = f"""
WITH parts AS (
  SELECT source, lang, CAST(sum(length(text)) AS BIGINT) AS sz,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source, lang
),
ordered AS (
  SELECT *, CAST(sum(sz) OVER (ORDER BY sz DESC, source, lang
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum
  FROM parts
),
binned AS (
  SELECT *, CAST((cum - sz) // {_COMPACT_CAP} AS BIGINT) AS bin
  FROM ordered
)
SELECT bin, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(sz) AS BIGINT) AS bin_chars,
       floor(CAST(sum(sz) AS DOUBLE) / {_COMPACT_CAP} * 1e6 + 0.5) / 1e6
         AS fill_s
FROM binned GROUP BY bin ORDER BY bin
"""


@register("warehouse_compaction_plan", oracle=_COMPACT_ORACLE)
def warehouse_compaction_plan(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Target-capacity compaction bins over the bounded partition
    summary by size-descending virtual concatenation."""
    parts = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.sum(F.length("text")).cast("long").alias("sz"),
             F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    wcum = W.orderBy(F.col("sz").desc(), "source", "lang") \
        .rowsBetween(W.unboundedPreceding, 0)
    ordered = parts.select(
        "*", F.sum("sz").over(wcum).cast("long").alias("cum"))
    binned = ordered.select(
        "*",
        F.expr(f"(cum - sz) div {_COMPACT_CAP}").cast("long").alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sz").cast("long").alias("bin_chars"),
            _snap6(F.sum("sz").cast("double") / _COMPACT_CAP)
            .alias("fill_s"),
        )
        .orderBy("bin")
    )
