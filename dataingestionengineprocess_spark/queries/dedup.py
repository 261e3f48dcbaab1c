"""Dedup query surface over ``documents`` / ``embeddings``.

SURVEY.md §2.2 P3 [C]: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup. Exact/Jaccard/cosine variants carry full
DuckDB oracles; LSH/SimHash use engine-specific hashes (xxhash64) so
they get the driver's rows-only check, with pytest asserting their
recall against the exact operators instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import fingerprint
from ..operators.dedup import (
    dedup_exact_text,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
    simhash_neardup_pairs,
)
from ..functions.vectors import as_double, cosine
from . import register

# ---------------------------------------------------------------------------
# Exact dedup via content fingerprint (deterministic keep-smallest-id).
# ---------------------------------------------------------------------------

_EXACT_ORACLE = """
SELECT doc_id, lang, source, fp
FROM (
  SELECT doc_id, lang, source,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         row_number() OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


@register("dedup_exact_fingerprint", oracle=_EXACT_ORACLE)
def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup_exact_text(docs).select("doc_id", "lang", "source", "fp")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup pairs (the oracle for the LSH variants).
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = """
WITH sh AS (
  SELECT doc_id AS id,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in range(1, len(t) - 1)])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.6
"""


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=3, threshold=0.6)


# ---------------------------------------------------------------------------
# MinHash + banded LSH near-dup candidates (rows-only: xxhash64-based).
# ---------------------------------------------------------------------------


@register("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return minhash_neardup_pairs(
        docs, num_hashes=32, bands=16, est_threshold=0.5,
        repartition_to=spark.sparkContext.defaultParallelism,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# SimHash near-dup pairs (rows-only: xxhash64-based).
# ---------------------------------------------------------------------------


@register("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return simhash_neardup_pairs(
        docs, max_hamming=3,
        repartition_to=spark.sparkContext.defaultParallelism,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: exact all-pairs within label partitions.
# Label partitioning is the practical trick: a 100 TB corpus is never
# all-pairs'd globally; it's bucketed (here by label, in production by
# an IVF/LSH bucket) and pairs are checked within buckets.
# ---------------------------------------------------------------------------

_EMB_NEARDUP_ORACLE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             6) AS cos_sim,
       a.label
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.4
"""


@register("dedup_embedding_cosine", oracle=_EMB_NEARDUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("label"),
                   as_double("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("label"),
                   as_double("embedding").alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, ["label"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.4)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"), "label")
    )


# ---------------------------------------------------------------------------
# Near-dup CLUSTERING: close the Jaccard pair graph into components and
# pick one canonical doc per cluster (operators/components.py). The
# DuckDB oracle closes the same graph with a recursive CTE -- exact
# parity for a genuinely iterative distributed algorithm.
# ---------------------------------------------------------------------------

#: Shared oracle prefix: the near-dup cluster definition (shingles ->
#: exact-jaccard pairs -> recursive closure -> min-id component). ONE
#: copy, referenced by every oracle that needs the clusters -- the
#: near-dup definition (shingle n, threshold, rounding) must never
#: drift between oracles.
NEARDUP_COMPONENTS_CTE = """
sh AS (
  SELECT doc_id AS id,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in range(1, len(t) - 1)])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.6
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
),
comp AS (
  SELECT s AS doc_id, least(min(d), s) AS component_id
  FROM reach GROUP BY s
)
"""

_CLUSTER_ORACLE = "WITH RECURSIVE " + NEARDUP_COMPONENTS_CTE + """
SELECT doc_id, component_id,
       count(*) OVER (PARTITION BY component_id) AS cluster_size,
       doc_id = component_id AS keep
FROM comp
"""


@register("dedup_cluster_components", oracle=_CLUSTER_ORACLE)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import canonical_per_component, connected_components

    docs = load(spark, sf_dir, "documents")
    # prefix_filter_jaccard_pairs returns the IDENTICAL pair set as
    # ngram_jaccard_pairs (hypothesis-tested equivalence) via the
    # PPJoin candidate space -- the faster exact pair generator.
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.6)
    cc = connected_components(pairs, "id_a", "id_b")
    return canonical_per_component(cc).select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        "cluster_size",
        "keep",
    )


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard: SAME answer as dedup_ngram_jaccard
# (so it shares that query's oracle), produced from a candidate space
# bounded by rare-prefix collisions instead of every shared shingle.
# ---------------------------------------------------------------------------


@register("dedup_prefix_filter_jaccard", oracle=_JACCARD_ORACLE)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(docs, n=3, threshold=0.6)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, arXiv:2303.09540): k-means the embedding
# space, prune near-duplicates within clusters only. Rows-only check
# (the k-means fit is engine-specific); soundness and recall against
# the exact cosine operator are asserted in
# tests/test_dedup_similarity.py.
# ---------------------------------------------------------------------------


@register("dedup_semantic_embedding")
def dedup_semantic_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantize import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, threshold=0.92, n_clusters=8, kmeans_iter=3
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Capstone: the deduplicated corpus itself. Chains the whole near-dup
# pipeline -- PPJoin candidate pairs -> connected components ->
# canonical member per cluster -> anti-join the drops out of the
# corpus. The oracle recomputes everything from scratch (exact
# Jaccard pairs + recursive-CTE components), so the full chain is
# hash-checked end to end, not just its stages.
# ---------------------------------------------------------------------------

_CANONICAL_CORPUS_ORACLE = "WITH RECURSIVE " + NEARDUP_COMPONENTS_CTE + """
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
WHERE c.doc_id IS NULL OR c.doc_id = c.component_id
"""


@register("dedup_canonical_corpus", oracle=_CANONICAL_CORPUS_ORACLE)
def dedup_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus a training run would actually consume: every
    near-dup cluster collapsed to its canonical (min-id) member,
    singletons untouched.

    Pipeline: PPJoin prefix-filtered exact-Jaccard pairs (candidate
    space bounded by rare-prefix collisions) -> iterative
    label-propagation components -> keep = canonical or unclustered,
    applied as a broadcast anti-join against the drop set (clusters
    are a vanishing fraction of a real corpus, so the drop set is the
    small side)."""
    from ..operators.components import (
        canonical_per_component,
        connected_components,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.6)
    cc = connected_components(pairs, "id_a", "id_b")
    drops = (
        canonical_per_component(cc)
        .filter(~F.col("keep"))
        .select(F.col("node").alias("doc_id"))
    )
    return docs.join(
        F.broadcast(drops), "doc_id", "left_anti"
    ).select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# Incremental admission: dedup a NEW batch against the EXISTING corpus
# (the daily-crawl shape -- cost scales with the batch, not corpus^2).
# The batch split is deterministic (doc_id % 8 == 7 plays "today's
# crawl"), so the whole admit/reject decision is exactly oracled.
# ---------------------------------------------------------------------------

_INCREMENTAL_ORACLE = """
WITH sh AS (
  SELECT doc_id AS id,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in range(1, len(t) - 1)])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
sh_new  AS (SELECT id, s FROM sh WHERE id % 8 = 7),
sh_corp AS (SELECT id, s FROM sh WHERE id % 8 <> 7),
n_new  AS (SELECT id, count(*) AS n_a FROM sh_new GROUP BY id),
n_corp AS (SELECT id, count(*) AS n_b FROM sh_corp GROUP BY id),
inter AS (
  SELECT a.id AS new_id, b.id AS corp_id, count(*) AS n_inter
  FROM sh_new a JOIN sh_corp b ON a.s = b.s
  GROUP BY 1, 2
),
scored AS (
  SELECT i.new_id, i.corp_id,
         round(i.n_inter / (na.n_a + nc.n_b - i.n_inter), 4) AS jaccard
  FROM inter i
  JOIN n_new na ON na.id = i.new_id
  JOIN n_corp nc ON nc.id = i.corp_id
),
best AS (
  SELECT new_id, corp_id AS match_id, jaccard
  FROM (
    SELECT new_id, corp_id, jaccard,
           row_number() OVER (PARTITION BY new_id
                              ORDER BY jaccard DESC, corp_id) AS rn
    FROM scored WHERE jaccard >= 0.6
  ) WHERE rn = 1
)
SELECT d.doc_id,
       CASE WHEN b.match_id IS NULL THEN 'admit' ELSE 'reject' END AS status,
       CAST(b.match_id AS BIGINT) AS match_id,
       b.jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % 8 = 7) d
LEFT JOIN best b ON d.doc_id = b.new_id
"""


@register("dedup_incremental_admission", oracle=_INCREMENTAL_ORACLE)
def dedup_incremental_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import incremental_jaccard_admission

    docs = load(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 8 == 7)
    corpus = docs.filter(F.col("doc_id") % 8 != 7)
    return incremental_jaccard_admission(
        corpus, new_batch, n=3, threshold=0.6
    )
