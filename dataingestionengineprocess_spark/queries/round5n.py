"""Round-4 (continued) additions: difference-in-differences promo
lift and the near-dup transitivity audit.

- `orders_promo_lift_did` -- the causal-inference workhorse: revenue
  per line for PROMO parts vs the rest, first half-month vs second,
  and the difference-in-differences estimate (treated-period change
  minus control-period change). Cell means come from exact cents
  sums; each cell snaps once, the DiD combines four snapped means --
  identical arithmetic both engines. The 2x2 cell table is emitted
  alongside the estimate, so the hash carries the decomposition.
- `dedup_transitivity_audit` -- the graph-quality check run BEFORE
  collapsing near-dup candidates into components: among the portable
  banded-MinHash candidate pairs, how many 2-paths (a-b, b-c) close
  into triangles (a-c present)? A low closure rate warns that the
  LSH threshold admits chains of weak links that connected
  components will glue into giant false clusters. Pure bounded pair
  algebra: a self-join of the candidate edges for 2-paths, one more
  hash-join probe for closure, counts + the snapped closure rate.

Reference parity: diagram-only reference (SURVEY.md §0); DiD extends
the [C] analytics mandate, the audit the [C] dedup family's quality
evidence (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import epoch_day as _epoch_day, snap6 as _snap6
from . import register

from ..functions.exact import FIXTURE_SPLIT_DAY as _DID_SPLIT_DAY  # noqa: E402

# ---------------------------------------------------------------------------
# DiD. treated = PROMO parts. Cells: (treated, period) mean revenue
# cents per line. did = (t2 - t1) - (c2 - c1) over the four snapped
# cell means. Output: 4 cell rows + the TOTAL row with the estimate.
# ---------------------------------------------------------------------------

_DID_ORACLE = f"""
WITH li AS (
  SELECT CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS treated,
         CASE WHEN date_diff('day', DATE '1970-01-01',
                             CAST(l.l_shipdate AS DATE))
                   < {_DID_SPLIT_DAY} THEN 1 ELSE 2 END AS period,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
cells AS (
  SELECT treated, period,
         CAST(count(*) AS BIGINT) AS n_lines,
         floor(CAST(sum(cents) AS DOUBLE) / count(*) + 0.5) / 100
           AS mean_rev_s
  FROM li GROUP BY treated, period
),
did AS (
  SELECT
    (max(CASE WHEN treated = 1 AND period = 2 THEN mean_rev_s END)
     - max(CASE WHEN treated = 1 AND period = 1 THEN mean_rev_s END))
    - (max(CASE WHEN treated = 0 AND period = 2 THEN mean_rev_s END)
       - max(CASE WHEN treated = 0 AND period = 1 THEN mean_rev_s END))
      AS est,
    CAST(sum(n_lines) AS BIGINT) AS n_all
  FROM cells
)
SELECT CAST(treated AS BIGINT) AS treated,
       CAST(period AS BIGINT) AS period,
       n_lines, mean_rev_s,
       CAST(NULL AS DOUBLE) AS did_s
FROM cells
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), d.n_all,
       CAST(NULL AS DOUBLE),
       floor(d.est * 1e6 + 0.5) / 1e6
FROM did d
ORDER BY treated, period
"""


@register("orders_promo_lift_did", oracle=_DID_ORACLE)
def orders_promo_lift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences of per-line revenue, PROMO parts vs
    the rest across the two half-month periods; 2x2 cells + estimate."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(_epoch_day("l_shipdate") < _DID_SPLIT_DAY, 1).otherwise(2)
        .alias("period"),
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                * 100 + 0.5).cast("long").alias("cents"),
    )
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_type") == "PROMO", 1).otherwise(0)
        .alias("treated"),
    )
    cells = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("treated", "period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            (F.floor(F.sum("cents").cast("double") / F.count(F.lit(1))
                     + 0.5) / 100).alias("mean_rev_s"),
        )
        .localCheckpoint(eager=True)  # 4 rows, feeds cells + estimate
    )
    def cell(t, p):  # noqa: E306
        return F.max(F.when((F.col("treated") == t)
                            & (F.col("period") == p),
                            F.col("mean_rev_s")))
    did = cells.agg(
        ((cell(1, 2) - cell(1, 1)) - (cell(0, 2) - cell(0, 1)))
        .alias("est"),
        F.sum("n_lines").cast("long").alias("n_all"),
    )
    per = cells.select(
        F.col("treated").cast("long").alias("treated"),
        F.col("period").cast("long").alias("period"),
        "n_lines", "mean_rev_s",
        F.lit(None).cast("double").alias("did_s"),
    )
    total = did.select(
        F.lit(-1).cast("long").alias("treated"),
        F.lit(-1).cast("long").alias("period"),
        F.col("n_all").alias("n_lines"),
        F.lit(None).cast("double").alias("mean_rev_s"),
        _snap6(F.col("est")).alias("did_s"),
    )
    return per.unionByName(total).orderBy("treated", "period")


# ---------------------------------------------------------------------------
# Transitivity audit. Candidate edges (a < b) from the portable LSH;
# 2-paths join on the shared middle vertex with BOTH orientations
# normalized (u < w); closure = the (u, w) pair exists as an edge.
# ---------------------------------------------------------------------------


def _transitivity_oracle() -> str:
    from .dedup import _minhash_portable_oracle

    return f"""
WITH pairs AS (SELECT id_a, id_b FROM ({_minhash_portable_oracle()})),
adj AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
paths AS (
  SELECT least(a.v, b.v) AS u, a.u AS mid, greatest(a.v, b.v) AS w
  FROM adj a JOIN adj b ON b.u = a.u AND a.v < b.v
),
closed AS (
  SELECT p.u, p.mid, p.w,
         CASE WHEN e.id_a IS NULL THEN 0 ELSE 1 END AS ok
  FROM paths p LEFT JOIN pairs e ON e.id_a = p.u AND e.id_b = p.w
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_two_paths,
       CAST(sum(ok) AS BIGINT) AS n_closed,
       floor(CAST(sum(ok) AS DOUBLE) / nullif(count(*), 0) * 1e6 + 0.5)
         / 1e6 AS closure_rate_s
FROM closed
"""


@register("dedup_transitivity_audit", oracle=_transitivity_oracle())
def dedup_transitivity_audit(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Triangle-closure rate of the portable MinHash candidate graph
    -- the chain-link warning before components collapse clusters."""
    from ..operators.dedup import minhash_neardup_pairs

    pairs = minhash_neardup_pairs(
        load(spark, sf_dir, "documents"), num_hashes=32, bands=16,
        est_threshold=0.5,
        repartition_to=spark.sparkContext.defaultParallelism,
        hash_fn="portable", est_round=None,
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    adj = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")) \
        .unionByName(pairs.select(F.col("id_b").alias("u"),
                                  F.col("id_a").alias("v")))
    a = adj.select(F.col("u").alias("mid"), F.col("v").alias("x"))
    b = adj.select(F.col("u").alias("mid2"), F.col("v").alias("y"))
    paths = (
        a.join(b, (a.mid == b.mid2) & (F.col("x") < F.col("y")))
        .select(F.least("x", "y").alias("u"), "mid",
                F.greatest("x", "y").alias("w"))
    )
    closed = paths.join(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("w"),
                     F.lit(1).alias("ok")),
        ["u", "w"], "left",
    ).select(F.coalesce("ok", F.lit(0)).alias("ok"))
    n_edges = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        closed.agg(
            F.count(F.lit(1)).cast("long").alias("n_two_paths"),
            F.sum("ok").cast("long").alias("n_closed"),
            _snap6(F.sum("ok").cast("double")
                   / F.nullif(F.count(F.lit(1)), F.lit(0)))
            .alias("closure_rate_s"),
        )
        .crossJoin(F.broadcast(n_edges))
        .select("n_edges", "n_two_paths", "n_closed", "closure_rate_s")
    )
