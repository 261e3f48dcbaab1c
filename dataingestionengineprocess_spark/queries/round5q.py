"""Round-5q addition: Okapi BM25 retrieval over the documents table.

`text_bm25_retrieval` -- the classic sparse-retrieval scorer a
training-data pipeline uses for benchmark-contamination lookups and
RAG-corpus indexing: BM25(doc, q) = sum over query terms of
idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)), k1 = 1.2,
b = 0.75, idf = ln((N - df + 0.5)/(df + 0.5) + 1). Top-20 by score.

Exactness (FIXTURES.md conventions): tf/df/dl/N are exact integers;
avgdl is one double division; idf snaps to the 1e-6 grid BEFORE use
(libm ln is engine-matched on snapped inputs); each term's score
quantizes to int64 1e-6 units so the per-doc sum is order-independent;
the top-20 ordering key is the INTEGER score_q (desc, doc_id) so no
float tie ambiguity reaches the limit.

Scale: one tokenize scan feeds tf (high-cardinality (doc, term)
hash agg) and doc lengths; df is a |terms|-row broadcast; N/avgdl a
1-row broadcast; top-20 is TakeOrdered, never a global sort. Registered
LAST (queries/__init__._load_all) so the pre-flighted driver window is
never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from . import register

_TERMS = ("vector", "hash", "merge")
_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)

_BM25_ORACLE = f"""
WITH dlens AS (
  SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE tok IN ({_TERMS_SQL}) GROUP BY doc_id, tok
),
dfreq AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfq
  FROM toks WHERE tok IN ({_TERMS_SQL}) GROUP BY tok
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl
  FROM dlens
),
idf AS (
  SELECT tok, dfq,
         floor(ln((t.n - dfq + 0.5) / (dfq + 0.5) + 1.0) * 1e6 + 0.5)
           / 1e6 AS idf_s
  FROM dfreq CROSS JOIN tot t
),
term AS (
  SELECT tf.doc_id,
         CAST(floor(i.idf_s * (tf.tf * 2.2
                / (tf.tf + 1.2 * (1.0 - 0.75
                     + 0.75 * d.dl / (CAST(t.sumdl AS DOUBLE) / t.n))))
                * 1e6 + 0.5) AS BIGINT) AS term_q
  FROM tf
  JOIN idf i ON i.tok = tf.tok
  JOIN dlens d ON d.doc_id = tf.doc_id
  CROSS JOIN tot t
),
scored AS (
  SELECT doc_id, CAST(sum(term_q) AS BIGINT) AS score_q
  FROM term GROUP BY doc_id
)
SELECT s.doc_id, d.dl AS n_tokens, s.score_q / 1e6 AS bm25_s
FROM scored s JOIN dlens d ON d.doc_id = s.doc_id
ORDER BY s.score_q DESC, s.doc_id
LIMIT 20
"""


@register("text_bm25_retrieval", oracle=_BM25_ORACLE)
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed 3-term query, int64-quantized
    term scores for an order-independent per-doc reduce."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    dlens = docs.select("doc_id", F.size(toks).cast("long").alias("dl"))
    exploded = docs.select("doc_id", F.explode(toks).alias("tok")) \
        .where(F.col("tok").isin(*_TERMS))
    tf = exploded.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = exploded.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("long").alias("dfq"))
    tot = dlens.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("dl").cast("long").alias("sumdl"))
    idf = dfreq.crossJoin(F.broadcast(tot)).select(
        "tok",
        _snap6(F.log((F.col("n") - F.col("dfq") + 0.5)
                     / (F.col("dfq") + 0.5) + 1.0)).alias("idf_s"))
    avgdl = F.col("sumdl").cast("double") / F.col("n")
    w = (F.col("tf") * 2.2
         / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / avgdl)))
    term = (
        tf.join(F.broadcast(idf), "tok")
        .join(dlens, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select("doc_id",
                F.floor(F.col("idf_s") * w * 1e6 + 0.5).cast("long")
                .alias("term_q"))
    )
    scored = term.groupBy("doc_id").agg(
        F.sum("term_q").cast("long").alias("score_q"))
    return (
        scored.join(dlens, "doc_id")
        .orderBy(F.desc("score_q"), "doc_id")
        .limit(20)
        .select("doc_id", F.col("dl").alias("n_tokens"),
                (F.col("score_q") / 1e6).alias("bm25_s"))
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation recall: rank neighbors by cosine over the
# FIRST d dims (d = 16, 32, 64) and score each truncation's top-5
# against the full-dim exact top-5 -- the eval that decides how far
# an MRL-style embedding can be truncated before ANN quality drops
# (Kusupati et al., 2022, arXiv:2205.13147). The d = 64 row is the
# identity sanity check (recall exactly 1).
#
# Exactness: cosine rides the proven knn_bruteforce idiom (sequential
# fold == list_dot_product, round-6) then quantizes to int64 so the
# rank key is integer; recall is an exact hits/(5*n_queries) ratio.
#
# Scale: queries are a sampled eval slice (broadcast); the per-
# (dim, query) rank rides grouped_rank's checkpointed layout, so a
# corpus-sized candidate list never serializes through one task.
# ---------------------------------------------------------------------------

_MRL_DIMS = (16, 32, 64)

_MRL_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 10
),
c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
sims AS (
  SELECT d.dim, qid, nid,
         CAST(floor(round(
           list_dot_product(qv[1:d.dim], cv[1:d.dim])
           / (sqrt(list_dot_product(qv[1:d.dim], qv[1:d.dim]))
              * sqrt(list_dot_product(cv[1:d.dim], cv[1:d.dim]))), 6)
           * 1e6 + 0.5) AS BIGINT) AS cosq
  FROM q JOIN c ON qid <> nid
  CROSS JOIN (SELECT unnest([{", ".join(str(d) for d in _MRL_DIMS)}])
              AS dim) d
),
ranked AS (
  SELECT dim, qid, nid,
         row_number() OVER (PARTITION BY dim, qid
                            ORDER BY cosq DESC, nid) AS rnk
  FROM sims
),
top5 AS (SELECT dim, qid, nid FROM ranked WHERE rnk <= 5),
full5 AS (SELECT qid, nid FROM top5 WHERE dim = {_MRL_DIMS[-1]}),
m AS (
  SELECT t.dim, t.qid,
         CAST(count(*) FILTER (WHERE f.nid IS NOT NULL) AS BIGINT) AS hits
  FROM top5 t
  LEFT JOIN full5 f ON f.qid = t.qid AND f.nid = t.nid
  GROUP BY t.dim, t.qid
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n_queries,
       floor(sum(hits) / (5.0 * count(*)) * 1e6 + 0.5) / 1e6
         AS recall_at5_s
FROM m GROUP BY dim ORDER BY dim
"""


@register("knn_matryoshka_recall", oracle=_MRL_ORACLE)
def knn_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of dimension-truncated cosine top-5 vs the full-dim
    exact baseline, integer rank keys, distributed per-(dim, query)
    ranking."""
    from ..functions.vectors import as_double, dot, l2_norm
    from ..operators.ranking import grouped_rank

    emb = load(spark, sf_dir, "embeddings")
    # per-dim prefix norms computed ONCE per side (5 norms per vector)
    # instead of re-folded per pair by cosine() -- same fold/sqrt/
    # division order, so the q6 keys are bit-identical at a third of
    # the 10 x 2000 x 5 pair-scan work
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), as_double("embedding").alias("qv"),
        *[l2_norm(F.slice(as_double("embedding"), 1, d)).alias(f"qn{d}")
          for d in _MRL_DIMS])
    c = emb.select(
        F.col("vec_id").alias("nid"), as_double("embedding").alias("cv"),
        *[l2_norm(F.slice(as_double("embedding"), 1, d)).alias(f"cn{d}")
          for d in _MRL_DIMS])
    pairs = c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
    frames = []
    for d in _MRL_DIMS:
        cos = (dot(F.slice("qv", 1, d), F.slice("cv", 1, d))
               / (F.col(f"qn{d}") * F.col(f"cn{d}")))
        frames.append(pairs.select(
            F.lit(d).cast("long").alias("dim"), "qid", "nid",
            F.floor(F.round(cos, 6) * 1e6 + 0.5).cast("long")
            .alias("cosq")))
    sims = frames[0]
    for fr in frames[1:]:
        sims = sims.unionByName(fr)
    # (dim, qid) universe is bounded by construction: len(_MRL_DIMS)
    # dims x the vec_id < 10 query filter -- skip the probe job.
    ranked = grouped_rank(
        sims.withColumn("negq", -F.col("cosq")),
        ["dim", "qid"], ["negq", "nid"], "rnk",
        known_group_count=len(_MRL_DIMS) * 10)
    top5 = ranked.filter(F.col("rnk") <= 5).select("dim", "qid", "nid")
    full5 = (top5.filter(F.col("dim") == _MRL_DIMS[-1])
             .select(F.col("qid").alias("fqid"),
                     F.col("nid").alias("fnid")))
    m = (
        top5.join(full5,
                  (F.col("qid") == F.col("fqid"))
                  & (F.col("nid") == F.col("fnid")),
                  "left")
        .groupBy("dim", "qid")
        .agg(F.count("fnid").cast("long").alias("hits"))
    )
    return (
        m.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            (F.floor(F.sum("hits") / (5.0 * F.count(F.lit(1)))
                     * 1e6 + 0.5) / 1e6).alias("recall_at5_s"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Distribution functions under VALUE-TIES semantics: percent_rank /
# cume_dist ordered by the value ALONE (no unique tiebreak), so every
# row of a tie group shares its group's rank (SQL RANK = tie-min
# row_number) and cumulative count (tie-max). The companion to
# `window_distribution_funcs` (whose unique composite order makes
# each row its own peer); together they pin BOTH peer-group semantics
# cross-engine. event values tie heavily (two-decimal grid), so the
# tie path is genuinely exercised.
#
# Scale: same grouped_rank layout as the unique-order form plus one
# distributive (type, value) aggregate joined back on the same
# high-cardinality key -- no small-key window anywhere.
# ---------------------------------------------------------------------------

_VALUE_TIES_ORACLE = """
SELECT event_id, event_type,
       floor(percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY value NULLS FIRST) * 1e6 + 0.5)
         / 1e6 AS pct_rank,
       floor(cume_dist() OVER (PARTITION BY event_type
                               ORDER BY value NULLS FIRST) * 1e6 + 0.5)
         / 1e6 AS cume
FROM events
"""
# NULLS FIRST pins the engine-side ASC NULLS FIRST ordering of
# operators/ranking (ADVICE r5; DuckDB's ASC default is NULLS LAST).


@register("window_value_ties_distribution", oracle=_VALUE_TIES_ORACLE)
def window_value_ties_distribution(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist per event type ordered by value alone --
    tie groups share rank and cumulative count, distributed."""
    from ..operators.ranking import grouped_value_distribution

    ev = load(spark, sf_dir, "events").select("event_type", "event_id",
                                              "value")
    # event_type: fixed generator enum (5 values) -- skip the probe.
    out = grouped_value_distribution(
        ev, ["event_type"], "value", "event_id", "__pct", "__cume",
        known_group_count=8)
    return out.select(
        "event_id", "event_type",
        _snap6(F.col("__pct")).alias("pct_rank"),
        _snap6(F.col("__cume")).alias("cume"),
    )
