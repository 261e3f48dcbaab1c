"""Round-6f queries: personalized PageRank and HITS.

- ``graph_personalized_pagerank``: PPR with the teleport pinned to
  one brand's parts (the recommendation primitive: "random surfer
  who always restarts inside the seed set") -- rides the SHARED
  `operators/graph.pagerank` loop via its new ``reset`` parameter,
  so broadcast-vs-shuffle strategy selection, checkpoint cadence,
  and cache hygiene are identical to the global query. 6 unrolled
  iterations replayed by the oracle.
- ``graph_hits_bipartite``: two HITS iterations (Kleinberg 1999) on
  the customer->part purchase bipartite graph: authority(part) =
  sum of hub(customer) over buyers, hub(customer) = sum of
  authority(part) over purchases, sum-normalized each half-step.
  Top-30 part authorities.

Exactness: both are damped/normalized double chains over integer
edge weights -- the `graph_pagerank_parts` precedent (~1e-13 drift
after 8 iterations, far inside the 1e-6 rounding); PPR ranks are
rescaled by the node count before rounding so the 6-digit grid keeps
discrimination. Reference parity: diagram-only reference (SURVEY.md
§0); extends the [S]+ graph-analytics family.

Registered LAST (queries/__init__._load_all): new unverified queries
append BEHIND the already pre-flighted driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from . import register

_PPR_BRAND = "Brand#11"
_PPR_ITER = 6
_PPR_D = 0.85


def _ppr_oracle() -> str:
    steps = []
    prev = "pr0"
    for k in range(1, _PPR_ITER + 1):
        steps.append(f"""
pr{k} AS (
  SELECT n.node,
         {1 - _PPR_D} * n.p + {_PPR_D} * coalesce(s.contrib, 0.0) AS rank
  FROM pnodes n LEFT JOIN (
     SELECT e.dst AS node, sum(p.rank * e.w) AS contrib
     FROM edges e JOIN {prev} p ON p.node = e.src
     GROUP BY e.dst
  ) s ON s.node = n.node
)""")
        prev = f"pr{k}"
    from ..operators.graph import COPURCHASE_HALF_SQL

    return "WITH " + COPURCHASE_HALF_SQL + f""",
deg AS (
  SELECT node, CAST(count(*) AS DOUBLE) AS degree FROM (
    SELECT src AS node FROM half UNION ALL SELECT dst AS node FROM half
  ) GROUP BY node
),
edges AS (
  SELECT h.src, h.dst, 1.0 / d.degree AS w
  FROM half h JOIN deg d ON d.node = h.src
  UNION ALL
  SELECT h.dst AS src, h.src AS dst, 1.0 / d.degree AS w
  FROM half h JOIN deg d ON d.node = h.dst
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
seeds AS (
  SELECT n.node FROM nodes n
  JOIN part p ON p.p_partkey = n.node AND p.p_brand = '{_PPR_BRAND}'
),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM seeds),
pnodes AS (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.c ELSE 0.0 END AS p
  FROM nodes n LEFT JOIN seeds s ON s.node = n.node CROSS JOIN ns
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
pr0 AS (SELECT node, p AS rank FROM pnodes),
{",".join(steps)}
SELECT f.node, round(f.rank * nn.n, 6) AS rank_n
FROM {prev} f CROSS JOIN nn
ORDER BY round(f.rank * nn.n, 6) DESC, f.node LIMIT 50
"""


@register("graph_personalized_pagerank", oracle=_ppr_oracle())
def graph_personalized_pagerank(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """PPR with the teleport on one brand's parts; shared pagerank
    loop, ranks rescaled by N before the 6-digit round."""
    from ..operators.graph import copurchase_half, pagerank

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    half = copurchase_half(li)
    deg = (
        half.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node").agg(F.count("*").alias("degree"))
    )
    co = half.union(half.select(F.col("dst"), F.col("src")))
    parts = load(spark, sf_dir, "part") \
        .where(F.col("p_brand") == _PPR_BRAND) \
        .select(F.col("p_partkey").alias("node"))
    seeds = deg.select("node").join(F.broadcast(parts), "node")
    n_seeds = seeds.count()  # bounded model state (<=|brand| parts)
    # No seeds in the graph: the oracle's CASE never takes the 1/c
    # branch and every reset mass is 0.0 -- mirror that instead of
    # dividing by zero on the driver (the reset frame is empty either
    # way, so the literal only needs to be well-defined).
    seed_mass = 1.0 / n_seeds if n_seeds else 0.0
    reset = seeds.select("node", F.lit(seed_mass).alias("p"))
    ranks = pagerank(co, iterations=_PPR_ITER, damping=_PPR_D,
                     out_degrees=deg, reset=reset)
    n_nodes = deg.count()
    return (
        ranks.select("node",
                     F.round(F.col("rank") * float(n_nodes), 6)
                     .alias("rank_n"))
        .orderBy(F.desc("rank_n"), "node")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# HITS on the customer -> part purchase bipartite graph. Hubs are
# customers, authorities are parts; each half-step is one edge join
# + one aggregate + a sum-normalization against a broadcast total --
# all linear in |E| per iteration, the pagerank scaling contract.
# ---------------------------------------------------------------------------

_HITS_ITER = 2

_HITS_ORACLE = f"""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
h0 AS (SELECT DISTINCT c, 1.0 AS h FROM e),
a1r AS (
  SELECT e.p, sum(h0.h) AS a FROM e JOIN h0 ON h0.c = e.c GROUP BY e.p
),
a1 AS (SELECT p, a / (SELECT sum(a) FROM a1r) AS a FROM a1r),
h1r AS (
  SELECT e.c, sum(a1.a) AS h FROM e JOIN a1 ON a1.p = e.p GROUP BY e.c
),
h1 AS (SELECT c, h / (SELECT sum(h) FROM h1r) AS h FROM h1r),
a2r AS (
  SELECT e.p, sum(h1.h) AS a FROM e JOIN h1 ON h1.c = e.c GROUP BY e.p
),
a2 AS (SELECT p, a / (SELECT sum(a) FROM a2r) AS a FROM a2r)
SELECT p AS part, round(a * 1e4, 6) AS authority_scaled
FROM a2 ORDER BY round(a * 1e4, 6) DESC, p LIMIT 30
"""


@register("graph_hits_bipartite", oracle=_HITS_ORACLE)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two HITS iterations on the customer-part purchase graph;
    top-30 part authorities, sum-normalized half-steps."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"),
                F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)  # static edges feed 3 half-steps
    )

    def normalize(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.sum(col).alias("__t"))
        return df.crossJoin(F.broadcast(tot)) \
            .select(*[c for c in df.columns if c != col],
                    (F.col(col) / F.col("__t")).alias(col))

    h0 = e.select("c").distinct().withColumn("h", F.lit(1.0))
    a1 = normalize(
        e.join(h0, "c").groupBy("p").agg(F.sum("h").alias("a")), "a")
    h1 = normalize(
        e.join(a1, "p").groupBy("c").agg(F.sum("a").alias("h")), "h")
    a2 = normalize(
        e.join(h1, "c").groupBy("p").agg(F.sum("h").alias("a")), "a")
    return (
        a2.select(F.col("p").alias("part"),
                  F.round(F.col("a") * 1e4, 6).alias("authority_scaled"))
        .orderBy(F.desc("authority_scaled"), "part")
        .limit(30)
    )
