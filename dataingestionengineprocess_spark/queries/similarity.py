"""Similarity-search query surface over ``embeddings``.

SURVEY.md §2.3 J8 [C]: brute-force cosine top-k (exact baseline,
DuckDB-oracled), LSH-bucketed ANN (scale path, rows-only -- recall is
asserted against brute force in pytest), and relational
nearest-centroid classification (oracled; the IVF coarse-quantizer
building block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.similarity import (
    brp_similarity_join,
    brute_force_topk,
    centroid_classify,
    ivf_topk,
    lsh_topk,
)
from ..functions.text import STOPWORDS
from ..functions.vectors import as_double, dot
from . import register

_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

_COS = """list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"""

_KNN_ORACLE = f"""
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_COS}, 6) AS cos_sim,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS}, 6) DESC, b.vec_id) AS rank
  FROM embeddings a
  JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 10
) WHERE rank <= 5
"""


@register("knn_bruteforce_cosine", oracle=_KNN_ORACLE)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5)


@register("knn_lsh_ann")
def knn_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries, k=5).orderBy("query_id", "rank")


@register("knn_ivf_ann")
def knn_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the UNLABELED corpus: the inverted lists come from
    the k-means coarse quantizer (spherical Lloyd's), not from any
    pre-existing label column -- the deployable configuration for real
    embedding tables. Rows-only check: recall vs brute force is
    asserted in pytest."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # Quantizer: bounded driver-side fit (the FAISS-style deployable
    # default -- a k x dim model converges from a ~10^5-vector hash
    # sample no matter the corpus size, so training never runs Spark
    # jobs per Lloyd's round). The fully-distributed trainer
    # (`kmeans_centroids`) remains available via train="distributed"
    # and is exercised in pytest; recall is governed by nprobe either
    # way.
    return ivf_topk(
        emb, queries, k=5, nprobe=2, n_lists=8, train="local",
    ).orderBy("query_id", "rank")


@register("knn_pq_ann")
def knn_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011): m=8 subspace
    codebooks trained on a bounded driver-side sample (the FAISS-style
    split: training is a small-sample problem, search is the
    distributed part), ADC scoring over m-byte codes, exact re-rank of
    the top-48 candidates (measured recall@5 = 0.73 on the
    near-random fixture). Rows-only check (codebooks are
    engine-specific k-means fits); recall vs brute force is asserted
    in pytest. The returned cos_sim is exact (re-ranked), so the top
    rows should visibly agree with knn_bruteforce_cosine wherever
    recall holds."""
    from ..operators.quantize import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_topk(
        emb, queries, k=5, m=8, ks=16, refine=48,
    ).orderBy("query_id", "rank")


@register("knn_pq_index_search")
def knn_pq_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build-once/search-many PQ workflow: materialize the index
    (codes + codebooks as versioned tables), then answer the top-k
    from the persisted codes. Returns exactly what knn_pq_ann returns
    (same training rule) -- asserted in pytest -- so the persisted
    path is provably lossless vs the direct path. Rows-only check."""
    from ..catalog import scratch_dir
    from ..operators.quantize import build_pq_index, pq_search_index

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = scratch_dir("pq_index", sf_dir)
    build_pq_index(emb, idx)
    return pq_search_index(
        spark, idx, queries, emb, k=5, refine=48
    ).orderBy("query_id", "rank")


@register("similarity_join_brp_lsh")
def similarity_join_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH self-join (rows-only: bucket
    assignment is engine-specific; recall vs the exact cosine join is
    asserted in pytest)."""
    emb = load(spark, sf_dir, "embeddings")
    return brp_similarity_join(emb, threshold_cos=0.4).orderBy(
        "id_a", "id_b"
    )


_CENTROID_ORACLE = """
WITH exploded AS (
  SELECT vec_id AS vid, label AS true_label,
         generate_subscripts(embedding, 1) - 1 AS d,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings
),
centroids AS (
  SELECT true_label AS clabel, d, avg(x) AS c FROM exploded GROUP BY 1, 2
),
cnorm AS (SELECT clabel, sqrt(sum(c * c)) AS c_norm FROM centroids GROUP BY 1),
vnorm AS (SELECT vid, sqrt(sum(x * x)) AS v_norm FROM exploded GROUP BY 1),
dots AS (
  SELECT e.vid, e.true_label, ct.clabel, sum(e.x * ct.c) AS dot
  FROM exploded e JOIN centroids ct ON e.d = ct.d
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT d.vid, d.true_label, d.clabel,
         d.dot / (cn.c_norm * vn.v_norm) AS cos_raw,
         row_number() OVER (PARTITION BY d.vid
                            ORDER BY d.dot / (cn.c_norm * vn.v_norm) DESC,
                                     d.clabel) AS rn
  FROM dots d JOIN cnorm cn ON d.clabel = cn.clabel
              JOIN vnorm vn ON d.vid = vn.vid
)
SELECT vid AS vec_id, true_label, clabel AS pred_label,
       round(cos_raw, 6) AS cos_sim
FROM scored WHERE rn = 1
"""


@register("similarity_centroid_classify", oracle=_CENTROID_ORACLE)
def similarity_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return centroid_classify(emb)


# ---------------------------------------------------------------------------
# Cross-modal profile: documents joined to their embedding rows
# (vec_id == doc_id in the fixtures) -- text-quality stats and vector
# norms per embedding label. The join is the multimodal pipeline's
# backbone shape: narrow text-derived features equi-joined to vector
# features on the document key, then rolled up.
# ---------------------------------------------------------------------------

_CROSSMODAL_ORACLE = f"""
WITH q AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n,
         len(list_filter(string_split(text, ' '), t -> t IN ({_SW_SQL})))
             / len(string_split(text, ' ')) AS sw,
         list_sum(list_transform(string_split(text, ' '),
                                 t -> CAST(len(t) AS DOUBLE)))
             / len(string_split(text, ' ')) AS alen
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         round(0.4 * least(n / 50.0, 1.0)
               + 0.3 * (1.0 - abs(sw - 0.10) / 0.9)
               + 0.3 * (1.0 - least(abs(alen - 5.0) / 5.0, 1.0)), 6) AS quality
  FROM q
),
e AS (
  SELECT vec_id, label,
         round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2
  FROM embeddings
)
SELECT e.label, count(*) AS n_docs,
       round(avg(s.quality), 4) AS avg_quality,
       round(avg(e.l2), 4)      AS avg_l2,
       round(min(e.l2), 6)      AS min_l2,
       round(max(e.l2), 6)      AS max_l2
FROM scored s JOIN e ON s.doc_id = e.vec_id
GROUP BY e.label
ORDER BY e.label
"""


@register("crossmodal_label_profile", oracle=_CROSSMODAL_ORACLE)
def crossmodal_label_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    )
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.round(F.sqrt(dot(as_double("embedding"), as_double("embedding"))), 6).alias("l2"),
    )
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.round(F.avg("l2"), 4).alias("avg_l2"),
            F.round(F.min("l2"), 6).alias("min_l2"),
            F.round(F.max("l2"), 6).alias("max_l2"),
        )
        .orderBy("label")
    )
