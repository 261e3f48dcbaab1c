"""TPC-H analog battery II: Q6/Q10/Q13/Q14/Q15/Q17/Q18/Q19/Q22 shapes.

SURVEY.md §2.2-2.6 (P2 predicates, J1-J4 joins, A1/A5 aggregation,
O1-O2 sort/limit) exercised through the classic TPC-H query shapes the
fixture schema supports. The fixtures lack ``partsupp``,
``l_shipmode/l_commitdate/l_receiptdate``, and ``c_phone``
(TESTDATA.md), so Q2/Q4/Q11/Q12/Q16/Q20/Q21 have no faithful analog;
the ones here are adapted to the available columns while keeping each
query's *plan shape* (the part that matters for the 100 TB story):

- Q6  = scan-only predicate battery -> single partial+final agg, no
  shuffle beyond the final 1-row reduce; every predicate pushed to
  parquet.
- Q10 = fact x fact join + broadcast dim chain + top-k.
- Q13 = left outer join + two-level aggregation (group twice).
- Q14 = conditional aggregation over a broadcast-joined dim.
- Q15 = window-max over an aggregated view (scalar-subquery shape).
- Q17 = correlated-aggregate decorrelated to a broadcast self-agg join.
- Q18 = group-filter (HAVING) semi-join back to facts + top-k.
- Q19 = disjunctive pushdown predicates over a broadcast join.
- Q22 = anti join + scalar aggregate filter (decorrelated).

Float sums follow the exact-cents rule (FIXTURES.md): sum
``round(expr*100)::long`` then divide, so Spark and DuckDB agree
bit-for-bit regardless of accumulation order.

Reference: the engine box (Untitled Diagram.drawio:153-154) is the
opaque "query capability" these make concrete; provenance [S].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from . import register


def _cents(expr):
    """Exact-cents accumulator: deterministic across engines/partition orders."""
    return F.sum(F.round(expr * 100).cast("long"))


# ---------------------------------------------------------------------------
# Q6: pure scan-side predicate battery. At 100 TB this is the best case --
# all three predicates are pushed into the parquet scan (min/max row-group
# skipping), zero shuffle, one global 2-phase agg.
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT round(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) / 100.0, 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(_cents(F.col("l_extendedprice") * F.col("l_discount")) / 100.0, 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q10: returned-item reporting. lineitem x orders is the big shuffle join
# (both sides partitioned on orderkey); customer->nation is a broadcast
# chain. Top-20 by revenue uses TakeOrderedAndProject, not a global sort.
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0, 2) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(_cents(rev) / 100.0, 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution. Two aggregation levels: the first
# groups the (left-outer) join by customer, the second groups the counts
# into a histogram. The second agg's input is tiny (one row per customer),
# so the cost is entirely in level one -- which co-partitions with the join.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_distribution", oracle=_Q13_ORACLE)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14: promo revenue share. Conditional aggregation -- one pass over the
# month's lineitems, part broadcast; the ratio is computed from two exact
# cents sums so the 4-decimal round is stable across engines.
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT round(
         100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                          ELSE 0 END)
         / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)),
       4) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q14_promo_revenue", oracle=_Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev_cents).otherwise(F.lit(0)))
                / F.sum(rev_cents),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue. The classic formulation is a
# scalar subquery (= max over a view); here the view is aggregated once and
# the max is a window over the whole (100-row) aggregate -- at scale the
# aggregate output is |suppliers|, tiny next to the fact scan it consumed.
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       round(r.total_cents / 100.0, 2) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_cents = (SELECT max(total_cents) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_cents"))
    )
    # Scalar-subquery max as a broadcast 1-row join (no single-partition
    # window; the agg output is |suppliers| rows, the max is 1 row).
    max_rev = revenue.agg(F.max("total_cents").alias("max_cents"))
    top = revenue.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_cents") == F.col("max_cents")
    )
    sup = load(spark, sf_dir, "supplier")
    return (
        sup.join(F.broadcast(top), sup.s_suppkey == top.supplier_no)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_cents") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue. The correlated per-part average is
# decorrelated into a self-aggregation joined back broadcast (the per-part
# agg output is |parts| rows -- broadcastable at any realistic scale since
# it's 2 columns, even when the fact table is 100 TB).
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
  FROM lineitem
  GROUP BY l_partkey
) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < t.qty_cut
"""


@register("q17_small_qty_revenue", oracle=_Q17_ORACLE)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    cuts = li.groupBy(F.col("l_partkey").alias("cut_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cuts), li.l_partkey == cuts.cut_partkey)
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(_cents(F.col("l_extendedprice")) / 100.0 / 7.0, 2).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers. HAVING over the per-order quantity sum
# produces a small key set; joining it back is a semi-join shape Spark
# plans as a broadcast once AQE sees the post-agg size.
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("q18_large_volume_customers", oracle=_Q18_ORACLE)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_sum"))
        .filter(F.col("qty_sum") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive predicates. The OR-of-ANDs stays a single join condition
# so Catalyst can extract the common l_partkey = p_partkey equi-part and
# push the per-branch residuals; the part side broadcasts.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0, 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))) / 100.0, 2).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q22: inactive high-balance customers. Two decorrelations: the scalar
# avg(acctbal) becomes a broadcast 1-row cross join; NOT EXISTS(orders)
# becomes a left-anti join. Grouped by nation (the fixture lacks c_phone,
# so nationkey stands in for the phone country code); "inactive" = no
# order since 2000-06-01 (every fixture customer has *some* order).
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
SELECT c.c_nationkey AS cntry, count(*) AS numcust,
       round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0, 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
GROUP BY c.c_nationkey
ORDER BY cntry
"""


@register("q22_inactive_customers", oracle=_Q22_ORACLE)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(_cents(F.col("c_acctbal")) / 100.0, 2).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


# ---------------------------------------------------------------------------
# Q8: national market share -- the supplier nation's share of a market
# region's revenue, by order year. The deepest analog join tree (5-way:
# fact + orders shuffle join, everything else broadcast); the share is
# a conditional-aggregation ratio of two exact-cents sums, so the
# 4-decimal round is engine-stable.
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(
         sum(CASE WHEN sn.n_name = 'NATION_6'
                  THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                  ELSE 0 END)
         / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)),
       4) AS mkt_share
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
JOIN region r    ON cn.n_regionkey = r.r_regionkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
JOIN part p      ON l.l_partkey = p.p_partkey
WHERE r.r_name = 'AMERICA'
  AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
ORDER BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # customers restricted to the market region (broadcast dim chain)
    cust_in_region = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey")
    )
    sup_nation = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"),
                                   F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_in_region), orders.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sup_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_6", cents).otherwise(F.lit(0)))
                / F.sum(cents),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )
