"""Round-4 (continued) additions: ranking-quality NDCG and journey
path mining.

- `ml_ndcg_exact` -- NDCG@10 of the exact-cosine retrieval lists
  against same-label relevance: the ranking-quality companion to
  `ml_auc_exact` / `ml_auprc_exact` (classification metrics) -- the
  number an embedding index is actually judged by. Per-term
  1/log2(rank+1) gains quantize to int64 before the per-query sums,
  and the ideal DCG re-ranks the relevant hits to the top positions.
- `events_path_trigrams` -- the top 3-step user-journey paths
  (click>view>purchase, ...): two lag windows, one count groupBy --
  the Sankey-diagram feed of product analytics.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[C] similarity-eval and analytics families (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import q6 as _q6, snap6 as _snap6
from . import register

# ---------------------------------------------------------------------------
# NDCG@10. Retrieval = the proven brute-force exact-cosine top-k
# (rounded to 1e-6 with a neighbor-id tiebreak, the knn family's
# established ordering); relevance = "neighbor shares the query's
# label". DCG terms rel / log2(rank + 1) quantize per-term (log2 as
# ln(x)/ln(2), both engines the same libm route the KL/MI queries
# proved); the ideal DCG places the n_rel hits at positions
# 1..n_rel. Queries with zero relevant hits get NULL NDCG (nullif).
#
# Scale: the candidate scan is the brute-force baseline by design
# (the ANN paths are the scale story, benched separately); everything
# past the top-k is per-query bounded arithmetic.
# ---------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_NQ = 20

_COS = """list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"""

_NDCG_ORACLE = f"""
WITH ranked AS (
  SELECT query_id, neighbor_id, rel, rank FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS rel,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY round({_COS}, 6) DESC, b.vec_id)
             AS rank
    FROM embeddings a
    JOIN embeddings b ON a.vec_id <> b.vec_id
    WHERE a.vec_id < {_NDCG_NQ}
  ) WHERE rank <= {_NDCG_K}
),
ideal AS (
  SELECT query_id, rank,
         row_number() OVER (PARTITION BY query_id ORDER BY rank) AS j
  FROM ranked WHERE rel = 1
),
dcg AS (
  SELECT query_id,
         CAST(sum(CAST(floor(rel / (ln(rank + 1.0) / ln(2.0))
                             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS dcg_q,
         CAST(sum(rel) AS BIGINT) AS n_rel
  FROM ranked GROUP BY query_id
),
idcg AS (
  SELECT query_id,
         CAST(sum(CAST(floor(1.0 / (ln(j + 1.0) / ln(2.0))
                             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS idcg_q
  FROM ideal GROUP BY query_id
)
SELECT d.query_id, d.n_rel,
       CAST(d.dcg_q AS DOUBLE) / 1e6 AS dcg_s,
       CAST(COALESCE(i.idcg_q, 0) AS DOUBLE) / 1e6 AS idcg_s,
       floor(CAST(d.dcg_q AS DOUBLE)
             / nullif(CAST(i.idcg_q AS DOUBLE), 0) * 1e6 + 0.5) / 1e6
         AS ndcg_s
FROM dcg d LEFT JOIN idcg i USING (query_id)
ORDER BY query_id
"""


@register("ml_ndcg_exact", oracle=_NDCG_ORACLE)
def ml_ndcg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per query over exact-cosine retrieval with same-label
    relevance; zero-relevant queries yield NULL."""
    from ..operators.similarity import brute_force_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NDCG_NQ)
    topk = brute_force_topk(emb, queries, k=_NDCG_K)
    q_lab = emb.select(F.col("vec_id").alias("query_id"),
                       F.col("label").alias("q_label"))
    n_lab = emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("label").alias("n_label"))
    ranked = (
        topk.join(F.broadcast(q_lab), "query_id")
        .join(F.broadcast(n_lab), "neighbor_id")
        .select(
            "query_id", "rank",
            F.when(F.col("q_label") == F.col("n_label"), 1).otherwise(0)
            .alias("rel"),
        )
        .localCheckpoint(eager=True)  # dcg + ideal both read it
    )
    log2 = F.log(F.col("rank") + 1.0) / F.log(F.lit(2.0))
    dcg = ranked.groupBy("query_id").agg(
        F.sum(_q6(F.col("rel") / log2)).cast("long").alias("dcg_q"),
        F.sum("rel").cast("long").alias("n_rel"),
    )
    wj = W.partitionBy("query_id").orderBy("rank")
    ideal = (
        ranked.filter(F.col("rel") == 1)
        .withColumn("j", F.row_number().over(wj))
    )
    log2j = F.log(F.col("j") + 1.0) / F.log(F.lit(2.0))
    idcg = ideal.groupBy("query_id").agg(
        F.sum(_q6(F.lit(1.0) / log2j)).cast("long").alias("idcg_q"))
    return (
        dcg.join(idcg, "query_id", "left")
        .select(
            "query_id", "n_rel",
            (F.col("dcg_q").cast("double") / 1e6).alias("dcg_s"),
            (F.coalesce(F.col("idcg_q"), F.lit(0)).cast("double") / 1e6)
            .alias("idcg_s"),
            _snap6(F.col("dcg_q").cast("double")
                   / F.nullif(F.col("idcg_q").cast("double"), F.lit(0.0)))
            .alias("ndcg_s"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Journey trigram paths: two lag windows over the per-user ordered
# stream, then one map-side-combinable path count; top 15 by count
# with a deterministic path tiebreak.
# ---------------------------------------------------------------------------

_PATH_TOPK = 15

_PATH_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type AS t3,
         lag(event_type, 1) OVER w AS t2,
         lag(event_type, 2) OVER w AS t1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1 || '>' || t2 || '>' || t3 AS path,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE t1 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT {_PATH_TOPK}
"""


@register("events_path_trigrams", oracle=_PATH_ORACLE)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step event-type paths across all user journeys."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t3"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.lag("event_type", 2).over(w).alias("t1"),
    )
    return (
        seq.filter(F.col("t1").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATH_TOPK)
    )
