"""Round-6e queries: density clustering, keyword extraction, and
submodular coverage selection.

- ``ml_dbscan_labels``: DBSCAN core/border/noise labeling over
  deterministic md5 unit-square points (the `join_spatial_grid`
  coordinate idiom), eps-neighborhoods via the 3x3 grid-cell
  equi-join + exact distance filter. The ORACLE computes the naive
  all-pairs neighborhood, so the hash gate proves the grid rewrite
  LOSSLESS -- same contract as `join_spatial_grid`.
- ``text_rake_keywords``: RAKE keyword extraction (Rose et al.
  2010): candidate phrases split on the stopword list, word score =
  degree/frequency in integer division, phrase score = sum of member
  word scores, global top-20.
- ``curation_facility_location``: greedy facility-location coverage
  (the canonical monotone-submodular data-selection objective,
  F(S) = sum_x max_{c in S} sim+(x, c)) -- k = 3 unrolled as exact
  integer argmax passes over a bounded 64-candidate pool, corpus-
  wide coverage recomputed per step.

Exactness: neighborhood counts, degrees, frequencies, and coverage
sums are int64; word scores use integer floor-division; each
emitted double is one division of identical integers. Reference
parity: diagram-only reference (SURVEY.md §0); extends the [C]
LLM-pipeline surface (clustering, keywords, data selection).

Registered LAST (queries/__init__._load_all): new unverified queries
append BEHIND the already pre-flighted driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import STOPWORDS
from . import register
from .round4k import _coord_sql, md5_points

# ---------------------------------------------------------------------------
# DBSCAN labeling. eps = 0.02 on md5 unit-square customer points,
# minPts = 3 (neighbors excluding self). Core: |N_eps(p)| >= minPts;
# border: non-core with a core eps-neighbor; noise: the rest.
#
# Scale: the neighbor pass is the grid-cell equi-join (9 candidate
# cells per point, shuffle on cell id); the border pass re-joins the
# SAME pair table against the core set -- two linear passes, no
# all-pairs anywhere. The oracle IS the all-pairs definition.
# ---------------------------------------------------------------------------

_DB_EPS = 0.02
_DB_MINPTS = 3

_DBSCAN_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, {_coord_sql('c_custkey', 'cx')} AS x,
         {_coord_sql('c_custkey', 'cy')} AS y
  FROM customer
),
nbr AS (
  SELECT a.c_custkey AS p, b.c_custkey AS q
  FROM pts a JOIN pts b
    ON a.c_custkey <> b.c_custkey
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       <= {_DB_EPS} * {_DB_EPS}
),
cnt AS (
  SELECT p.c_custkey, CAST(COALESCE(n.c, 0) AS BIGINT) AS n_neighbors
  FROM pts p LEFT JOIN (SELECT p AS k, count(*) AS c FROM nbr
                        GROUP BY p) n ON n.k = p.c_custkey
),
core AS (SELECT c_custkey FROM cnt WHERE n_neighbors >= {_DB_MINPTS}),
border AS (
  SELECT DISTINCT n.p AS c_custkey
  FROM nbr n JOIN core c ON c.c_custkey = n.q
  WHERE n.p NOT IN (SELECT c_custkey FROM core)
)
SELECT c.c_custkey, c.n_neighbors,
       CASE WHEN c.n_neighbors >= {_DB_MINPTS} THEN 'core'
            WHEN b.c_custkey IS NOT NULL THEN 'border'
            ELSE 'noise' END AS label
FROM cnt c LEFT JOIN border b ON b.c_custkey = c.c_custkey
ORDER BY c.c_custkey
"""


def eps_neighbor_pairs(pts: DataFrame,
                       eps: float = _DB_EPS) -> DataFrame:
    """(p, q) pairs within eps, via the 3x3 grid-cell equi-join +
    exact distance filter -- the plan-testable pre-checkpoint shape
    (the full query checkpoints this frame for its two consumers).
    ``eps`` is parameterized for tools/scale_probe.py, which shrinks
    it ~1/sqrt(k) to hold neighbor density constant as points grow."""
    spark = pts.sparkSession
    cell = pts.select(
        "c_custkey", "x", "y",
        F.floor(F.col("x") / eps).cast("long").alias("gx"),
        F.floor(F.col("y") / eps).cast("long").alias("gy"))
    offs = spark.range(9).select(
        (F.col("id") % 3 - 1).alias("ox"), (F.col("id") / 3).cast("long")
        .alias("oy3"))
    offs = offs.select("ox", (F.col("oy3") - 1).alias("oy"))
    probe = cell.crossJoin(F.broadcast(offs)).select(
        F.col("c_custkey").alias("p"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.col("gx") + F.col("ox")).alias("gx"),
        (F.col("gy") + F.col("oy")).alias("gy"))
    build = cell.select(F.col("c_custkey").alias("q"),
                        F.col("x").alias("xb"), F.col("y").alias("yb"),
                        "gx", "gy")
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    return (
        probe.join(build, ["gx", "gy"])
        .where((F.col("p") != F.col("q"))
               & (d2 <= F.lit(eps * eps)))
        .select("p", "q")
    )


@register("ml_dbscan_labels", oracle=_DBSCAN_ORACLE)
def ml_dbscan_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core/border/noise labels, eps-neighbors via the 3x3
    grid-cell join proven lossless by the all-pairs oracle."""
    cust = load(spark, sf_dir, "customer")
    pts = md5_points(cust, "c_custkey", "cx", "cy") \
        .localCheckpoint(eager=True)  # one md5 pass feeds both sides
    nbr = eps_neighbor_pairs(pts) \
        .localCheckpoint(eager=True)  # feeds the count AND border pass
    cnt = (
        pts.join(nbr.groupBy("p").agg(F.count(F.lit(1)).alias("c")),
                 pts["c_custkey"] == F.col("p"), "left")
        .select("c_custkey",
                F.coalesce(F.col("c"), F.lit(0)).cast("long")
                .alias("n_neighbors"))
    )
    core = cnt.where(F.col("n_neighbors") >= _DB_MINPTS) \
        .select(F.col("c_custkey").alias("core_id"))
    border = (
        nbr.join(core, nbr["q"] == F.col("core_id"))
        .select(F.col("p").alias("b_id")).distinct()
        .join(core, F.col("b_id") == F.col("core_id"), "left_anti")
    )
    return (
        cnt.join(border, cnt["c_custkey"] == F.col("b_id"), "left")
        .select("c_custkey", "n_neighbors",
                F.when(F.col("n_neighbors") >= _DB_MINPTS, "core")
                .when(F.col("b_id").isNotNull(), "border")
                .otherwise("noise").alias("label"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# RAKE. Phrases = maximal stopword-free token runs per document;
# word score = floor(degree * 1e6 / frequency) (degree counts the
# length of every phrase each occurrence sits in, the RAKE
# co-occurrence degree); phrase score = sum of member word scores.
# Identical phrase strings aggregate globally (word scores are
# corpus-level, so equal text => equal score).
#
# Scale: the phrase-id window partitions on doc_id (cardinality
# grows with the corpus); everything downstream is plain groupBy.
# ---------------------------------------------------------------------------

_RAKE_TOPK = 20
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

_RAKE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, t.tok, t.pos,
         CASE WHEN t.tok IN ({_STOP_SQL}) THEN 1 ELSE 0 END AS stop
  FROM documents,
       LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS tok,
                       generate_subscripts(string_split(lower(text), ' '), 1)
                         AS pos) t
),
marked AS (
  SELECT doc_id, tok, pos,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
  FROM tok
),
words AS (
  SELECT doc_id, tok, pos, phrase_id FROM marked
  WHERE tok NOT IN ({_STOP_SQL}) AND tok <> ''
),
plen AS (
  SELECT doc_id, phrase_id, CAST(count(*) AS BIGINT) AS n_words
  FROM words GROUP BY doc_id, phrase_id
),
wstat AS (
  SELECT w.tok,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(p.n_words) AS BIGINT) AS deg
  FROM words w JOIN plen p
    ON p.doc_id = w.doc_id AND p.phrase_id = w.phrase_id
  GROUP BY w.tok
),
wscore AS (SELECT tok, (deg * 1000000) // freq AS wq FROM wstat),
phrase AS (
  SELECT w.doc_id, w.phrase_id,
         string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(s.wq) AS BIGINT) AS score_q
  FROM words w JOIN wscore s ON s.tok = w.tok
  GROUP BY w.doc_id, w.phrase_id
)
SELECT phrase, CAST(max(n_words) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       max(score_q) / 1e6 AS score_s
FROM phrase
GROUP BY phrase
ORDER BY score_s DESC, phrase LIMIT {_RAKE_TOPK}
"""


@register("text_rake_keywords", oracle=_RAKE_ORACLE)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE top-20 keyword phrases: stopword-split candidate runs,
    degree/frequency word scores in integer division."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " "))
        .alias("pos", "tok"))
    tok = tok.withColumn(
        "stop", F.when(F.col("tok").isin(*STOPWORDS), 1).otherwise(0))
    w = Window.partitionBy("doc_id").orderBy("pos")
    marked = tok.withColumn("phrase_id", F.sum("stop").over(w))
    words = marked.where((F.col("stop") == 0) & (F.col("tok") != "")) \
        .select("doc_id", "tok", "pos", "phrase_id") \
        .localCheckpoint(eager=True)  # feeds plen, wstat, phrase agg
    plen = words.groupBy("doc_id", "phrase_id") \
        .agg(F.count(F.lit(1)).cast("long").alias("n_words"))
    wstat = (
        words.join(plen, ["doc_id", "phrase_id"])
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"),
             F.sum("n_words").cast("long").alias("deg"))
    )
    wscore = wstat.select(
        "tok", F.expr("(deg * 1000000) div freq").alias("wq"))
    phrase = (
        words.join(wscore, "tok")
        .groupBy("doc_id", "phrase_id")
        .agg(F.concat_ws(
                " ",
                F.expr("transform(array_sort(collect_list("
                       "struct(pos, tok))), x -> x.tok)")).alias("phrase"),
             F.count(F.lit(1)).cast("long").alias("n_words"),
             F.sum("wq").cast("long").alias("score_q"))
    )
    return (
        phrase.groupBy("phrase")
        .agg(F.max("n_words").cast("long").alias("n_words"),
             F.count(F.lit(1)).cast("long").alias("n_occurrences"),
             (F.max("score_q") / 1e6).alias("score_s"))
        .orderBy(F.desc("score_s"), "phrase")
        .limit(_RAKE_TOPK)
    )


# ---------------------------------------------------------------------------
# Greedy facility location: maximize F(S) = sum_x max_{c in S}
# max(sim(x, c), 0) over a bounded 64-candidate pool, k = 3. Each
# step is one candidate x corpus integer aggregate (the clamp at 0
# is the standard similarity-facility-location normalization); the
# per-point current-coverage vector joins back by corpus id.
#
# Scale: |pool| * n similarities per step, pool bounded -- the same
# O(k * m * n) contract production data-selection pipelines use
# (e.g. submodular selection over candidate cluster heads).
# ---------------------------------------------------------------------------

_FL_POOL = 64

_FL_ORACLE = f"""
WITH cand AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {_FL_POOL}
),
corpus AS (SELECT vec_id AS xid, embedding::DOUBLE[] AS xv
           FROM embeddings),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM corpus),
sims AS (
  SELECT cid, xid,
         greatest(CAST(floor(list_dot_product(cv, xv)
           / (sqrt(list_dot_product(cv, cv))
              * sqrt(list_dot_product(xv, xv))) * 1e6 + 0.5) AS BIGINT),
           0) AS sq
  FROM cand JOIN corpus ON TRUE
),
t1 AS (SELECT cid, sum(sq) AS tot FROM sims GROUP BY cid),
s1 AS (
  SELECT min(t.cid) AS cid, max(t.tot) AS obj
  FROM t1 t JOIN (SELECT max(tot) AS mx FROM t1) m ON t.tot = m.mx
),
cur1 AS (
  SELECT s.xid, s.sq AS cur FROM sims s JOIN s1 ON s1.cid = s.cid
),
t2 AS (
  SELECT s.cid, sum(greatest(s.sq, c.cur)) AS tot
  FROM sims s JOIN cur1 c ON c.xid = s.xid
  CROSS JOIN s1 WHERE s.cid <> s1.cid
  GROUP BY s.cid
),
s2 AS (
  SELECT min(t.cid) AS cid, max(t.tot) AS obj
  FROM t2 t JOIN (SELECT max(tot) AS mx FROM t2) m ON t.tot = m.mx
),
cur2 AS (
  SELECT c.xid, greatest(c.cur, s.sq) AS cur
  FROM cur1 c JOIN sims s ON s.xid = c.xid
  JOIN s2 ON s2.cid = s.cid
),
t3 AS (
  SELECT s.cid, sum(greatest(s.sq, c.cur)) AS tot
  FROM sims s JOIN cur2 c ON c.xid = s.xid
  CROSS JOIN s1 CROSS JOIN s2
  WHERE s.cid <> s1.cid AND s.cid <> s2.cid
  GROUP BY s.cid
),
s3 AS (
  SELECT min(t.cid) AS cid, max(t.tot) AS obj
  FROM t3 t JOIN (SELECT max(tot) AS mx FROM t3) m ON t.tot = m.mx
)
SELECT step, cid AS vec_id,
       floor(obj / CAST(n.n AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
         AS coverage_s
FROM (SELECT 1 AS step, cid, obj FROM s1
      UNION ALL SELECT 2, cid, obj FROM s2
      UNION ALL SELECT 3, cid, obj FROM s3) u
CROSS JOIN n ORDER BY step
"""


@register("curation_facility_location", oracle=_FL_ORACLE)
def curation_facility_location(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Greedy facility-location selection (k = 3, 64-candidate pool):
    exact integer coverage argmax per step."""
    from ..functions.exact import q6
    from ..functions.vectors import as_double, dot, l2_norm

    emb = load(spark, sf_dir, "embeddings")
    # norms once per vector, not re-folded per (candidate, corpus)
    # pair by cosine() -- same fold/sqrt/division, bit-identical q6
    vecs = emb.select("vec_id", as_double("embedding").alias("v")) \
        .withColumn("vn", l2_norm(F.col("v")))
    cand = vecs.where(F.col("vec_id") < _FL_POOL).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
        F.col("vn").alias("cn"))
    corpus = vecs.select(F.col("vec_id").alias("xid"),
                         F.col("v").alias("xv"),
                         F.col("vn").alias("xn"))
    n_df = corpus.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sims = (
        corpus.crossJoin(F.broadcast(cand))
        .select("cid", "xid",
                F.greatest(q6(dot("cv", "xv")
                              / (F.col("cn") * F.col("xn"))), F.lit(0))
                .cast("long").alias("sq"))
        .localCheckpoint(eager=True)  # reused by all three steps
    )

    def argmax(tot: DataFrame) -> DataFrame:
        mx = tot.agg(F.max("tot").alias("mx"))
        return (
            tot.join(F.broadcast(mx), F.col("tot") == F.col("mx"))
            .agg(F.min("cid").alias("cid"), F.max("tot").alias("obj"))
        )

    s1 = argmax(sims.groupBy("cid").agg(F.sum("sq").alias("tot")))
    s1k = s1.select(F.col("cid").alias("sel1"))
    cur1 = sims.join(F.broadcast(s1k), sims["cid"] == F.col("sel1")) \
        .select("xid", F.col("sq").alias("cur"))
    t2 = (
        sims.join(F.broadcast(s1k), sims["cid"] == F.col("sel1"),
                  "left_anti")
        .join(cur1, "xid")
        .groupBy("cid").agg(F.sum(F.greatest("sq", "cur")).alias("tot"))
    )
    s2 = argmax(t2)
    s2k = s2.select(F.col("cid").alias("sel2"))
    cur2 = (
        cur1.join(sims.join(F.broadcast(s2k),
                            sims["cid"] == F.col("sel2"))
                  .select("xid", F.col("sq").alias("sq2")), "xid")
        .select("xid", F.greatest("cur", "sq2").alias("cur"))
    )
    t3 = (
        sims.join(F.broadcast(s1k), sims["cid"] == F.col("sel1"),
                  "left_anti")
        .join(F.broadcast(s2k), sims["cid"] == F.col("sel2"),
              "left_anti")
        .join(cur2, "xid")
        .groupBy("cid").agg(F.sum(F.greatest("sq", "cur")).alias("tot"))
    )
    s3 = argmax(t3)
    cov = F.floor(F.col("obj") / F.col("n").cast("double") / 1e6 * 1e6
                  + F.lit(0.5)) / 1e6
    out = (
        s1.select(F.lit(1).cast("long").alias("step"),
                  F.col("cid").alias("vec_id"), "obj")
        .unionByName(s2.select(F.lit(2).cast("long").alias("step"),
                               F.col("cid").alias("vec_id"), "obj"))
        .unionByName(s3.select(F.lit(3).cast("long").alias("step"),
                               F.col("cid").alias("vec_id"), "obj"))
    )
    return out.crossJoin(F.broadcast(n_df)) \
        .select("step", "vec_id", cov.alias("coverage_s")) \
        .orderBy("step")
