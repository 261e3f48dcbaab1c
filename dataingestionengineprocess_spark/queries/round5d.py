"""Round-4 (continued) additions: WOE/IV encoding, duplicate-payment
screen, and Herfindahl concentration.

- `ml_woe_iv_encoding` -- the credit-scoring standard categorical
  encoder: per order priority, Weight of Evidence of the "order has a
  returned line" outcome, WOE = ln((good_i/good)/(bad_i/bad)) with
  0.5 Laplace smoothing (finite for one-sided categories, ln argument
  bounded away from 0 -- same guard family as the PSI gate), plus the
  per-category Information Value contribution and the IV TOTAL row.
- `orders_duplicate_payment_screen` -- the finance-audit classic:
  candidate duplicate charges = identical (customer, exact cents,
  order day) tuples appearing more than once; emitted per customer
  with the duplicated amount at stake. A feed replaying an upstream
  batch shows up here before reconciliation does.
- `supplier_herfindahl_index` -- market-concentration HHI per nation:
  squared revenue shares from exact cents (share snapped, square
  quantized to int64 terms so the group sum is order-independent),
  with the n-supplier count and top share alongside. Complements the
  Gini/ABC family with the antitrust-standard metric.

Reference parity: diagram-only reference (SURVEY.md §0); the screen
extends the [R] validation stage, WOE/IV and HHI the [C]
ml-prep/analytics mandate (BASELINE.json:6).

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
# WOE / IV. outcome: bad = order with >= 1 'R' line (semi join);
# counts per priority; smoothed rates; woe snapped from snapped
# rates' ratio; iv terms int64-quantized. TOTAL row carries the IV.
# ---------------------------------------------------------------------------

_WOE_ORACLE = """
WITH bad_orders AS (
  SELECT DISTINCT l_orderkey AS ok FROM lineitem WHERE l_returnflag = 'R'
),
tagged AS (
  SELECT o.o_orderpriority AS pri,
         CASE WHEN b.ok IS NULL THEN 0 ELSE 1 END AS bad
  FROM orders o LEFT JOIN bad_orders b ON b.ok = o.o_orderkey
),
cnt AS (
  SELECT pri,
         CAST(sum(1 - bad) AS BIGINT) AS n_good,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM tagged GROUP BY pri
),
tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS g,
               CAST(sum(n_bad) AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS k FROM cnt),
rates AS (
  SELECT c.pri, c.n_good, c.n_bad,
         floor((c.n_good + 0.5) / (t.g + t.k / 2.0) * 1e6 + 0.5) / 1e6
           AS pg,
         floor((c.n_bad + 0.5) / (t.b + t.k / 2.0) * 1e6 + 0.5) / 1e6
           AS pb
  FROM cnt c CROSS JOIN tot t
),
woe AS (
  SELECT pri, n_good, n_bad,
         floor(ln(pg / pb) * 1e6 + 0.5) / 1e6 AS woe_s,
         CAST(floor((pg - pb) * (floor(ln(pg / pb) * 1e6 + 0.5) / 1e6)
                    * 1e6 + 0.5) AS BIGINT) AS iv_q
  FROM rates
)
SELECT pri AS o_orderpriority, n_good, n_bad, woe_s,
       floor(iv_q / 1e6 * 1e6 + 0.5) / 1e6 AS iv_s
FROM woe
UNION ALL
SELECT 'TOTAL', CAST(sum(n_good) AS BIGINT), CAST(sum(n_bad) AS BIGINT),
       NULL, floor(sum(iv_q) / 1e6 * 1e6 + 0.5) / 1e6
FROM woe
ORDER BY o_orderpriority
"""


@register("ml_woe_iv_encoding", oracle=_WOE_ORACLE)
def ml_woe_iv_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence + Information Value of order priority vs the
    returned-line outcome, smoothed and int64-quantized."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("pri"))
    bad_orders = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("ok")).distinct()
        .withColumn("__bad", F.lit(1))
    )
    tagged = orders.join(
        bad_orders, orders.o_orderkey == bad_orders.ok, "left"
    ).select("pri", F.coalesce("__bad", F.lit(0)).alias("bad"))
    cnt = tagged.groupBy("pri").agg(
        F.sum(1 - F.col("bad")).cast("long").alias("n_good"),
        F.sum("bad").cast("long").alias("n_bad"),
    )
    tot = cnt.agg(
        F.sum("n_good").cast("long").alias("g"),
        F.sum("n_bad").cast("long").alias("b"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    rates = cnt.crossJoin(F.broadcast(tot)).select(
        "pri", "n_good", "n_bad",
        _snap6((F.col("n_good") + 0.5) / (F.col("g") + F.col("k") / 2.0))
        .alias("pg"),
        _snap6((F.col("n_bad") + 0.5) / (F.col("b") + F.col("k") / 2.0))
        .alias("pb"),
    )
    woe_s = _snap6(F.log(F.col("pg") / F.col("pb")))
    iv_q = F.floor((F.col("pg") - F.col("pb")) * woe_s * 1e6 + 0.5) \
        .cast("long")
    woe = rates.select(
        "pri", "n_good", "n_bad", woe_s.alias("woe_s"),
        iv_q.alias("iv_q"),
    ).localCheckpoint(eager=True)  # bounded category table, two legs
    per = woe.select(
        F.col("pri").alias("o_orderpriority"), "n_good", "n_bad",
        "woe_s", _snap6(F.col("iv_q") / 1e6).alias("iv_s"),
    )
    total = woe.agg(
        F.sum("n_good").cast("long").alias("n_good"),
        F.sum("n_bad").cast("long").alias("n_bad"),
        _snap6(F.sum("iv_q") / 1e6).alias("iv_s"),
    ).select(F.lit("TOTAL").alias("o_orderpriority"), "n_good", "n_bad",
             F.lit(None).cast("double").alias("woe_s"), "iv_s")
    return per.unionByName(total).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Duplicate payments. Exact-identity candidates only (cents + day) --
# the deterministic tier a fuzzy screen would sit on top of. One
# groupBy; per-customer rollup of money at stake (the duplicate
# copies beyond the first).
# ---------------------------------------------------------------------------

_DUP_PAY_ORACLE = """
WITH pay AS (
  SELECT o_custkey AS ck,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day
  FROM orders
),
grp AS (
  SELECT ck, cents, day, CAST(count(*) AS BIGINT) AS n
  FROM pay GROUP BY ck, cents, day
  HAVING count(*) > 1
)
SELECT ck AS o_custkey,
       CAST(count(*) AS BIGINT) AS n_dup_groups,
       CAST(sum(n) AS BIGINT) AS n_orders,
       CAST(sum((n - 1) * cents) AS BIGINT) AS cents_at_stake
FROM grp
GROUP BY ck
ORDER BY cents_at_stake DESC, o_custkey
"""


@register("orders_duplicate_payment_screen", oracle=_DUP_PAY_ORACLE)
def orders_duplicate_payment_screen(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Suspected duplicate charges: identical (customer, cents, day)
    tuples seen 2+ times, rolled up per customer with cents at stake."""
    pay = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        .alias("cents"),
        _epoch_day("o_orderdate").alias("day"),
    )
    grp = (
        pay.groupBy("ck", "cents", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") > 1)
    )
    return (
        grp.groupBy("ck")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_groups"),
            F.sum("n").cast("long").alias("n_orders"),
            F.sum((F.col("n") - 1) * F.col("cents")).cast("long")
            .alias("cents_at_stake"),
        )
        .select(F.col("ck").alias("o_custkey"), "n_dup_groups",
                "n_orders", "cents_at_stake")
        .orderBy(F.desc("cents_at_stake"), "o_custkey")
    )


# ---------------------------------------------------------------------------
# HHI. share = supplier cents / nation cents (snapped); term =
# share^2 quantized to int64; HHI = sum(term)/1e6 snapped (0..1
# scale; 1 = monopoly). Top share via max on the same snapped column.
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH rev AS (
  SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
         CAST(sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                        + 0.5)) AS BIGINT) AS cents
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
tot AS (SELECT nk, CAST(sum(cents) AS BIGINT) AS t FROM rev GROUP BY nk),
shares AS (
  SELECT r.nk,
         floor(CAST(r.cents AS DOUBLE) / t.t * 1e6 + 0.5) / 1e6 AS sh
  FROM rev r JOIN tot t ON t.nk = r.nk
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       max(sh) AS top_share_s,
       floor(sum(CAST(floor(sh * sh * 1e6 + 0.5) AS BIGINT)) / 1e6
             * 1e6 + 0.5) / 1e6 AS hhi_s
FROM shares s JOIN nation n ON n.n_nationkey = s.nk
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("supplier_herfindahl_index", oracle=_HHI_ORACLE)
def supplier_herfindahl_index(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue concentration per nation from
    exact cents shares, int64-quantized square terms."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                * 100 + 0.5).cast("long").alias("c"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nk"), "l_suppkey")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    tot = rev.groupBy("nk").agg(F.sum("cents").cast("long").alias("t"))
    shares = rev.join(F.broadcast(tot), "nk").select(
        "nk", _snap6(F.col("cents").cast("double") / F.col("t"))
        .alias("sh"))
    term_q = F.floor(F.col("sh") * F.col("sh") * 1e6 + 0.5).cast("long")
    return (
        shares.join(F.broadcast(nation),
                    shares.nk == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.max("sh").alias("top_share_s"),
            _snap6(F.sum(term_q) / 1e6).alias("hhi_s"),
        )
        .orderBy("n_name")
    )
