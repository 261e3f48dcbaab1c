"""Round-4 (continued) additions: k-hop reachability, readability
scoring, inverted-index postings.

- `graph_khop_reachability` -- exact min-hop BFS (2 hops) over the
  part co-purchase graph from a deterministic seed brand, the
  frontier-subtraction unrolled as joins (Spark) / chained CTEs
  (DuckDB). The iterative-graph primitive that pagerank (fixpoint)
  and triangles (local) do not cover: bounded-depth reachability
  with exact distances.
- `text_readability_flesch` -- Flesch reading-ease per document from
  three regexp-countable signals (words, sentence-ending punctuation
  runs, vowel-group syllable proxy), snapped ratio arithmetic, plus
  a deterministic difficulty band: the classic quality screen next
  to the stopword/length heuristics.
- `text_inverted_postings` -- the IR index-build shape: term ->
  (document frequency, total term frequency, md5 digest of the
  position-ordered postings list), top-100 terms by df. The digest
  bounds output width while still hash-pinning every posting.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[C] text/graph families (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from ..functions.text import tokens
from . import register

# ---------------------------------------------------------------------------
# k-hop BFS. Edges: undirected co-purchase pairs from per-order
# distinct part sets (the pagerank derivation). Seeds: every part of
# the lexicographically smallest brand -- deterministic, no literal
# keys baked in. Frontier subtraction keeps distances exact:
# d1 = N(d0) \ d0, d2 = N(d1) \ (d0 u d1).
#
# Scale: each hop is one equi-join of the current frontier against
# the edge table plus a left-anti against the visited set -- the
# standard distributed BFS step. Depth is bounded (2), so no
# driver-side iteration state beyond the loop counter.
# ---------------------------------------------------------------------------

_KHOP_ORACLE = """
WITH u AS (
  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
),
half AS (
  SELECT DISTINCT a.p AS src, b.p AS dst
  FROM u a JOIN u b ON a.k = b.k AND a.p < b.p
),
edges AS (
  SELECT src, dst FROM half
  UNION ALL
  SELECT dst AS src, src AS dst FROM half
),
seed_brand AS (SELECT min(p_brand) AS b FROM part),
d0 AS (
  SELECT DISTINCT p.p_partkey AS node
  FROM part p JOIN seed_brand s ON p.p_brand = s.b
),
d1 AS (
  SELECT DISTINCT e.dst AS node
  FROM d0 JOIN edges e ON e.src = d0.node
  WHERE e.dst NOT IN (SELECT node FROM d0)
),
d2 AS (
  SELECT DISTINCT e.dst AS node
  FROM d1 JOIN edges e ON e.src = d1.node
  WHERE e.dst NOT IN (SELECT node FROM d0)
    AND e.dst NOT IN (SELECT node FROM d1)
)
SELECT CAST(node AS BIGINT) AS p_partkey, CAST(0 AS BIGINT) AS dist
  FROM d0
UNION ALL
SELECT CAST(node AS BIGINT), CAST(1 AS BIGINT) FROM d1
UNION ALL
SELECT CAST(node AS BIGINT), CAST(2 AS BIGINT) FROM d2
ORDER BY dist, p_partkey
"""


@register("graph_khop_reachability", oracle=_KHOP_ORACLE)
def graph_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-hop BFS distances over the co-purchase graph from the
    lexicographically smallest brand's parts. BFS core shared with
    operators/graph.py:khop_bfs (scale-probed at 1x/2x/4x)."""
    from ..operators.graph import copurchase_edges, khop_bfs

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Shared set-explosion edge build (operators/graph.py): one groupBy
    # shuffle, identical edges to the distinct self-join, 2.3x faster.
    edges = copurchase_edges(li)

    part = load(spark, sf_dir, "part")
    seed_brand = part.agg(F.min("p_brand").alias("b"))
    seeds = (
        part.join(F.broadcast(seed_brand), part.p_brand == F.col("b"))
        .select(F.col("p_partkey").alias("node"))
    )
    return (
        khop_bfs(edges, seeds, hops=2)
        .select(F.col("node").cast("long").alias("p_partkey"),
                F.col("dist").cast("long").alias("dist"))
        .orderBy("dist", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Flesch reading ease. words = whitespace tokens; sentences = maximal
# [.!?]+ runs floored at 1; syllables = maximal vowel-group runs
# ([aeiouy]+, lowercased) floored at n_words so every word counts at
# least one. Score = 206.835 - 1.015*wps - 84.6*spw with each ratio
# snapped, then banded. Map-only; hash-exact because every input is
# an integer count and every ratio snaps.
# ---------------------------------------------------------------------------

_FLESCH_ORACLE = """
WITH sig AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS n_sentences,
         CAST(greatest(
             len(regexp_extract_all(lower(text), '[aeiouy]+')),
             len(string_split(text, ' '))) AS BIGINT) AS n_syllables
  FROM documents
),
scored AS (
  SELECT doc_id, n_words, n_sentences, n_syllables,
         floor((206.835
                - 1.015 * (floor(CAST(n_words AS DOUBLE) / n_sentences
                                 * 1e6 + 0.5) / 1e6)
                - 84.6 * (floor(CAST(n_syllables AS DOUBLE) / n_words
                                * 1e6 + 0.5) / 1e6)) * 1e6 + 0.5) / 1e6
           AS flesch_s
  FROM sig WHERE n_words > 0
)
SELECT doc_id, n_words, n_sentences, n_syllables, flesch_s,
       CASE WHEN flesch_s >= 70 THEN 'easy'
            WHEN flesch_s >= 50 THEN 'standard'
            WHEN flesch_s >= 30 THEN 'difficult'
            ELSE 'very_difficult' END AS band
FROM scored
ORDER BY doc_id
"""


@register("text_readability_flesch", oracle=_FLESCH_ORACLE)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + difficulty band from regexp-countable
    word/sentence/syllable signals, snapped arithmetic."""
    docs = load(spark, sf_dir, "documents")
    n_words = F.size(tokens("text")).cast("long")
    n_sent = F.greatest(
        F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1)).cast("long")
    n_syll = F.greatest(
        F.regexp_count(F.lower("text"), F.lit(r"[aeiouy]+")),
        F.size(tokens("text"))).cast("long")
    sig = docs.select(
        "doc_id", n_words.alias("n_words"), n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    flesch = _snap6(
        F.lit(206.835)
        - 1.015 * _snap6(F.col("n_words").cast("double")
                         / F.col("n_sentences"))
        - 84.6 * _snap6(F.col("n_syllables").cast("double")
                        / F.col("n_words")))
    scored = sig.withColumn("flesch_s", flesch)
    band = (
        F.when(F.col("flesch_s") >= 70, "easy")
        .when(F.col("flesch_s") >= 50, "standard")
        .when(F.col("flesch_s") >= 30, "difficult")
        .otherwise("very_difficult")
    )
    return scored.withColumn("band", band).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Inverted postings. One posexplode -> one term groupBy; the
# postings list is pinned by an md5 digest of the (doc_id, pos)-
# ordered 'doc:pos' string, so the full index content hash-checks
# without shipping unbounded arrays. Top-100 terms by (df DESC,
# term) via TakeOrdered -- no global sort of the whole vocabulary.
# ---------------------------------------------------------------------------

_POSTINGS_ORACLE = """
WITH posting AS (
  SELECT d.doc_id,
         list_extract(string_split(d.text, ' '), CAST(i AS INTEGER))
           AS term,
         CAST(i AS BIGINT) AS pos
  FROM documents d,
       unnest(range(1, len(string_split(d.text, ' ')) + 1)) AS t(i)
),
term_stats AS (
  SELECT term,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS tf_total,
         md5(string_agg(doc_id || ':' || pos, ','
                        ORDER BY doc_id, pos)) AS postings_md5
  FROM posting GROUP BY term
)
SELECT term, df, tf_total, postings_md5
FROM term_stats
ORDER BY df DESC, term
LIMIT 100
"""


@register("text_inverted_postings", oracle=_POSTINGS_ORACLE)
def text_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term -> (df, tf, md5 of the position-ordered postings list),
    top-100 terms by document frequency."""
    from ..operators.skew import spread_input

    # spread: single-file source, one partition would serialize the
    # token posexplode + md5 postings digest onto one core
    docs = spread_input(load(spark, sf_dir, "documents"))
    posting = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "term")
    ).select("doc_id", "term",
             (F.col("pos0") + 1).cast("long").alias("pos"))
    digest = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("doc_id", "pos"))),
                lambda s: F.concat_ws(
                    ":", s.getField("doc_id").cast("string"),
                    s.getField("pos").cast("string")),
            ),
            ",",
        ).cast("binary")
    )
    stats = posting.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count(F.lit(1)).cast("long").alias("tf_total"),
        digest.alias("postings_md5"),
    )
    return (
        stats.orderBy(F.col("df").desc(), "term").limit(100)
    )
