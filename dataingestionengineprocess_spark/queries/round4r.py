"""Round-4 (continued) additions: Pareto skyline, trimmed mean,
Theil inequality.

- `part_pareto_skyline` -- the skyline operator (Borzsony/Kossmann/
  Stocker, ICDE'01): parts not dominated on (minimize retail price,
  maximize size). The scale move is the distributive pre-prune: only
  the cheapest part at each size can survive, so a per-size min-price
  aggregate collapses the corpus to <= |distinct sizes| candidates
  BEFORE the (bounded) dominance window -- the classic
  local-skyline-then-merge shape expressed relationally.
- `agg_trimmed_mean` -- 10% rank-trimmed mean per return flag over
  exact integer cents, deterministic tie-break on line identity: the
  robust-location aggregate a mean/median pair does not give you.
- `agg_theil_inequality` -- the Theil-T index of customer spend
  concentration per nation: T = (1/n) sum (x/mu) ln(x/mu), with the
  ratio built from exact integer sums, ln snapped on the 1e-6 grid,
  and per-term int64 quantization so the reduce is order-independent.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[S] analytics family (BASELINE.json:6).

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
# Pareto skyline. Dominance: q beats p iff q.price <= p.price AND
# q.size >= p.size, strict in at least one. After the per-size
# min-price prune, candidate sizes are unique, so p survives iff its
# size equals the running max size over all candidates priced <= p
# (cheaper-or-equal with a LARGER size would dominate). The window
# runs on the pruned candidate set (bounded by |distinct sizes|);
# every part tied at a frontier (size, min-price) point is returned
# via a broadcast join back to the facts.
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH priced AS (
  SELECT p_partkey, p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part
),
cand AS (
  SELECT p_size, min(cents) AS cents FROM priced GROUP BY p_size
),
sky AS (
  SELECT p_size, cents,
         max(p_size) OVER (ORDER BY cents
                           RANGE BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS mx
  FROM cand
)
SELECT p.p_partkey, p.p_size, p.cents AS price_cents
FROM priced p JOIN sky s
  ON p.p_size = s.p_size AND p.cents = s.cents
WHERE s.p_size = s.mx
ORDER BY p.p_size, p.p_partkey
"""


@register("part_pareto_skyline", oracle=_SKYLINE_ORACLE)
def part_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of parts on (min price, max size): distributive
    per-size min-price prune, then a bounded dominance window."""
    priced = load(spark, sf_dir, "part").select(
        "p_partkey", "p_size",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long")
        .alias("cents"),
    )
    cand = priced.groupBy("p_size").agg(F.min("cents").alias("cents"))
    mx = F.max("p_size").over(
        W.orderBy("cents").rangeBetween(W.unboundedPreceding, 0))
    sky = (cand.withColumn("mx", mx)
           .where(F.col("p_size") == F.col("mx"))
           .select("p_size", "cents"))
    return (
        priced.join(F.broadcast(sky), ["p_size", "cents"])
        .select("p_partkey", "p_size", F.col("cents").alias("price_cents"))
        .orderBy("p_size", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Trimmed mean. Rank trimming drops the lowest and highest
# floor(n/10) rows per flag by (cents, orderkey, linenumber) -- the
# tie-break makes the kept SET deterministic, so the integer-cent sum
# hash-checks.
#
# Scale: l_returnflag has cardinality 3, so row_number PARTITION BY
# flag is a ~third-of-the-table single-task sort. Instead the rank
# comes from `operators/ranking.global_rank` over the total order
# (flag, cents, orderkey, linenumber): flags sort contiguously, so
# the per-flag rank is the global rank minus the flag's exclusive
# row-count base -- a 3-row broadcast table. Every sort is a range
# partition's local sort; no window sees more than one partition.
# ---------------------------------------------------------------------------

_TRIMMED_ORACLE = """
WITH c AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY floor(l_extendedprice * 100 + 0.5),
                                     l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       CAST(max(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_kept,
       floor(sum(cents) / 100.0 / count(*) * 1e6 + 0.5) / 1e6
         AS trimmed_mean_s
FROM c
WHERE rn > CAST(floor(n / 10) AS BIGINT)
  AND rn <= n - CAST(floor(n / 10) AS BIGINT)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_trimmed_mean", oracle=_TRIMMED_ORACLE)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% rank-trimmed mean of extended price per return flag over
    exact integer cents with a deterministic tie-break."""
    from ..operators.ranking import grouped_rank

    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    rows = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", cents.alias("cents"),
        "l_orderkey", "l_linenumber")
    # l_returnflag: fixed TPC-H enum (A/N/R) -- skip the probe job.
    c = grouped_rank(
        rows, ["l_returnflag"], ["cents", "l_orderkey", "l_linenumber"],
        "rn", count_col="n",
        known_group_count=4).drop("l_orderkey", "l_linenumber")
    lo = F.floor(F.col("n") / 10).cast("long")
    return (
        c.where((F.col("rn") > lo) & (F.col("rn") <= F.col("n") - lo))
        .groupBy("l_returnflag")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            _snap6(F.sum("cents") / 100.0 / F.count(F.lit(1)))
            .alias("trimmed_mean_s"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Theil-T inequality of per-customer spend, by nation. The ratio
# r = x / mu is computed as x_cents * n / sum_cents (exact int64
# numerator, one division), snapped; each term r*ln(r) quantizes to
# int64 1e-6 units so the group sum is order-independent; T divides
# back out and snaps. Single-customer nations give T = 0 exactly.
# Customers with no orders are outside the spend distribution (inner
# join semantics), which is the standard population choice.
# ---------------------------------------------------------------------------

_THEIL_ORACLE = """
WITH spend AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_nationkey
),
g AS (
  SELECT c_nationkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS tot
  FROM spend GROUP BY c_nationkey
),
ratio AS (
  SELECT s.c_nationkey, g.n,
         floor(CAST(s.cents AS DOUBLE) * g.n / g.tot * 1e6 + 0.5) / 1e6
           AS r_s
  FROM spend s JOIN g ON s.c_nationkey = g.c_nationkey
),
terms AS (
  SELECT c_nationkey, n,
         CASE WHEN r_s > 0 THEN
           CAST(floor(r_s * (floor(ln(r_s) * 1e6 + 0.5) / 1e6)
                      * 1e6 + 0.5) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS term_q
  FROM ratio
)
SELECT n.n_name,
       CAST(max(t.n) AS BIGINT) AS n_customers,
       floor(sum(t.term_q) / 1e6 / max(t.n) * 1e6 + 0.5) / 1e6
         AS theil_s
FROM terms t JOIN nation n ON n.n_nationkey = t.c_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("agg_theil_inequality", oracle=_THEIL_ORACLE)
def agg_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T index of customer-spend concentration per nation,
    int64-quantized terms for an order-independent reduce."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    spend = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
             .cast("long").alias("cents"))
    )
    g = spend.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("tot"),
    )
    r_s = _snap6(F.col("cents").cast("double") * F.col("n") / F.col("tot"))
    # A spend share below 5e-7 snaps to exactly 0; x*ln(x) -> 0 there, so
    # both engines drop the term EXPLICITLY (Spark's log(0)=NULL would
    # silently vanish while DuckDB's ln(0) raises -- the one divergence
    # the snap idiom doesn't cover on its own).
    term_q = (
        F.when(r_s > 0,
               F.floor(r_s * _snap6(F.log(r_s)) * 1e6 + 0.5).cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )
    terms = (
        spend.join(F.broadcast(g), "c_nationkey")
        .select("c_nationkey", "n", term_q.alias("term_q"))
    )
    return (
        terms.join(F.broadcast(nation),
                   terms.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            _snap6(F.sum("term_q") / 1e6 / F.max("n")).alias("theil_s"),
        )
        .orderBy("n_name")
    )
