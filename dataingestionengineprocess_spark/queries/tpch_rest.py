"""TPC-H analog battery III: Q2/Q4/Q7/Q9/Q11/Q12/Q16/Q20/Q21 shapes.

Completes the 22-query analog set (I: relational.py q1/q3/q5;
II: tpch_more.py q6/q8/q10/q13-q15/q17-q19/q22). The fixtures lack
``partsupp``, ``l_shipmode``, ``l_commitdate/l_receiptdate`` and
``ps_supplycost/ps_availqty`` (TESTDATA.md), so each query here keeps
the ORIGINAL's plan shape -- the part that matters for the 100 TB
story -- against proxies derivable from the available columns:

- "partsupp" := distinct (l_partkey, l_suppkey) pairs from lineitem,
  with unit cost min(l_extendedprice / l_quantity) (Q2) or shipped
  volume (Q11/Q16/Q20).
- "late" := l_shipdate > o_orderdate + INTERVAL (commit/receipt dates
  don't exist; Q4/Q21).
- Q12's ship-mode class := l_returnflag.

Supplier-side filters use a REGION, not a nation: the supplier table
scales at 10 rows per sf0.001 across 25 nations, so a single-nation
filter would be empty at small SF while a region keeps ~1/5 of
suppliers at every SF.

Float sums follow the exact-cents rule (FIXTURES.md); quantity sums
cast to long (fixture quantities are integral doubles). Reference:
the engine box (Untitled Diagram.drawio:153-154); provenance [S].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from . import register


def _cents(expr):
    """Exact-cents accumulator: deterministic across engines/partition orders."""
    return F.sum(F.round(expr * 100).cast("long"))


def _region_suppliers(spark: SparkSession, sf_dir: str, r_name: str) -> DataFrame:
    """(s_suppkey, s_name, s_acctbal, n_name) for suppliers in a region.
    Three broadcast-joined dims -- never a shuffle."""
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == r_name)
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier. The correlated min-subquery decorrelates to a
# window-min over the per-(part, supplier) cost table; the region dim chain
# and the part filter are broadcasts. The only wide stages are the
# (partkey, suppkey) cost agg and the partkey window -- both uniform keys.
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
ranked AS (
  SELECT ps.l_partkey, ps.unit_cost, eu.s_name, eu.s_acctbal, eu.n_name,
         min(ps.unit_cost) OVER (PARTITION BY ps.l_partkey) AS min_cost
  FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey
)
SELECT r.s_acctbal, r.s_name, r.n_name, p.p_partkey, p.p_type,
       floor(r.unit_cost * 10000 + 0.5) / 10000 AS unit_cost
FROM ranked r JOIN part p ON r.l_partkey = p.p_partkey
WHERE p.p_type = 'LARGE' AND p.p_size <= 10 AND r.unit_cost = r.min_cost
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
             .alias("unit_cost"))
    )
    eu = _region_suppliers(spark, sf_dir, "EUROPE")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    w = W.partitionBy("l_partkey")
    return (
        ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            # floor-based rounding: Spark's round() re-rounds via the
            # SHORTEST decimal repr (BigDecimal.valueOf) while DuckDB
            # rounds the binary value, so a quotient sitting 1 ulp
            # below a .xxxx5 boundary rounds differently; floor(x*1e4
            # + 0.5)/1e4 is identical IEEE arithmetic in both engines.
            (F.floor(F.col("unit_cost") * 10000 + 0.5) / 10000)
            .alias("unit_cost"),
        )
    )


# ---------------------------------------------------------------------------
# Q4: order-priority checking. EXISTS(late line) decorrelates to a
# left-semi join carrying the lateness predicate alongside the orderkey
# equi-condition -- one shuffle on orderkey, then a tiny priority agg.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
"""


@register("q4_priority_late_orders", oracle=_Q4_ORACLE)
def q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate
               > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between two regions, by direction and ship year.
# The fact join (lineitem x orders) is the single big shuffle; both
# nation->region chains ride in as broadcasts on the supplier and
# customer keys.
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
WITH nr AS (
  SELECT n_nationkey, r_name
  FROM nation JOIN region ON n_regionkey = r_regionkey
)
SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0, 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nr cr      ON c.c_nationkey = cr.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nr sr      ON s.s_nationkey = sr.n_nationkey
WHERE ((sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA')
    OR (sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY sr.r_name, cr.r_name, 3
"""


@register("q7_region_volume", oracle=_Q7_ORACLE)
def q7_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    nr = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).select(
        "n_nationkey", "r_name"
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    pair = (
        ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
        | ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(pair)
        .groupBy(
            "supp_region", "cust_region",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                / 100.0, 2,
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by supplier nation and order year. The cost leg
# (ps_supplycost) becomes a retail-price proxy riding on the broadcast
# part dim, so profit stays a single-pass fact-side expression -- one
# fact-fact shuffle + broadcast dims, exactly the original's shape.
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                             - p.p_retailprice * l.l_quantity * 0.1) * 100) AS BIGINT)) / 100.0, 2) AS profit
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, 2
"""


@register("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(_cents(profit) / 100.0, 2).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q11: important parts by regional supplier value. The scalar total
# decorrelates to a broadcast 1-row cross join; both sides of the
# threshold are exact-cents longs so the comparison is engine-stable.
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH eu AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
per_part AS (
  SELECT l.l_partkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS value_cents
  FROM lineitem l JOIN eu ON l.l_suppkey = eu.s_suppkey
  GROUP BY l.l_partkey
)
SELECT l_partkey AS ps_partkey,
       round(value_cents / 100.0, 2) AS part_value
FROM per_part
WHERE value_cents > 0.001 * (SELECT sum(value_cents) FROM per_part)
"""


@register("q11_important_parts", oracle=_Q11_ORACLE)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    eu = _region_suppliers(spark, sf_dir, "EUROPE").select("s_suppkey")
    li = load(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(eu), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") > 0.001 * F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round(F.col("value_cents") / 100.0, 2).alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q12: priority counts by ship class (l_returnflag stands in for
# l_shipmode). One fact-fact shuffle; the two-level CASE aggregation is
# the original's signature conditional-agg shape, map-side combinable.
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
"""


@register("q12_priority_by_class", oracle=_Q12_ORACLE)
def q12_priority_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long")
            .alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q16: supplier-relationship counts per part descriptor. "partsupp" is
# the distinct (partkey, suppkey) projection of lineitem; the excluded
# suppliers ("complaints" := negative acctbal) are a broadcast anti
# join. count(DISTINCT suppkey) dedups inside the (brand,type,size) agg.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 19, 29, 39, 49)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q16_supplier_part_counts", oracle=_Q16_ORACLE)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 19, 29, 39, 49))
    )
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20: dominant suppliers of a part family. "excess availability"
# becomes a share test: a supplier ships > 2x the average per-supplier
# volume of that part in the window. Two aggs over the SAME filtered
# fact subset reuse one shuffle partitioning (partkey prefix), then a
# semi-join chain back to the region's suppliers.
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH boltlines AS (
  SELECT l.l_partkey, l.l_suppkey, CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%bolt%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
),
part_total AS (
  SELECT l_partkey, sum(qty) AS tot,
         count(DISTINCT l_suppkey) AS n_supp
  FROM boltlines GROUP BY l_partkey
),
supp_part AS (
  SELECT l_partkey, l_suppkey, sum(qty) AS sq
  FROM boltlines GROUP BY l_partkey, l_suppkey
),
dominant AS (
  SELECT DISTINCT sp.l_suppkey
  FROM supp_part sp JOIN part_total pt ON sp.l_partkey = pt.l_partkey
  WHERE sp.sq > 2.0 * pt.tot / pt.n_supp
)
SELECT s.s_name, s.s_acctbal, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
"""


@register("q20_dominant_suppliers", oracle=_Q20_ORACLE)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    bolt = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate")
             >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey,
              "left_semi")
        .select("l_partkey", "l_suppkey",
                F.col("l_quantity").cast("long").alias("qty"))
    )
    supp_part = bolt.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("sq")
    )
    part_total = bolt.groupBy("l_partkey").agg(
        F.sum("qty").alias("tot"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    dominant = (
        supp_part.join(part_total, "l_partkey")
        .filter(F.col("sq") > 2.0 * F.col("tot") / F.col("n_supp"))
        .select("l_suppkey").distinct()
    )
    return (
        _region_suppliers(spark, sf_dir, "EUROPE")
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .select("s_name", "s_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who kept multi-supplier orders waiting. Both EXISTS
# (another supplier on the order) and NOT EXISTS (another LATE supplier)
# decorrelate into per-order counts -- n_supp >= 2 and n_late_supp == 1
# with the candidate itself late. Three aggs keyed on orderkey share
# partitioning; the supplier/nation chain is broadcast.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
  GROUP BY l.l_orderkey, l.l_suppkey
),
allsup AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY l_orderkey
),
latec AS (SELECT l_orderkey, count(*) AS n_late FROM late GROUP BY l_orderkey)
SELECT s.s_name, count(*) AS numwait
FROM late
JOIN allsup ON late.l_orderkey = allsup.l_orderkey
JOIN latec  ON late.l_orderkey = latec.l_orderkey
JOIN supplier s ON late.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE allsup.n_supp >= 2 AND latec.n_late = 1 AND r.r_name = 'EUROPE'
GROUP BY s.s_name
"""


@register("q21_waiting_suppliers", oracle=_Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One fact-fact join, then ONE orderkey-keyed aggregation derives
    # everything: the supplier count, the late-supplier SET (bounded
    # by order size, ~7 lines in TPC-H shapes), and therefore the one
    # guilty supplier when that set is a singleton. The oracle's three
    # CTEs collapse into a single pass over the joined facts with no
    # second scan and no extra distinct shuffle.
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey", "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
            ).alias("__late"),
        )
    )
    # collect_set skips nulls, so only late suppliers land in the set.
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.collect_set(
            F.when(F.col("__late"), F.col("l_suppkey"))
        ).alias("late_set"),
    )
    guilty = (
        per_order.filter(
            (F.col("n_supp") >= 2) & (F.size("late_set") == 1)
        )
        .select(F.element_at("late_set", 1).alias("l_suppkey"))
    )
    eu = _region_suppliers(spark, sf_dir, "EUROPE")
    return (
        guilty.join(F.broadcast(eu), F.col("l_suppkey") == eu.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
