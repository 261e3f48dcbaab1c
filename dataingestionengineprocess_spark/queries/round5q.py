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
