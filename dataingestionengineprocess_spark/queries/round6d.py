"""Round-6d queries: robust time-series screening, coreset
selection, kNN classification, link prediction, robust regression.

- ``window_hampel_filter``: the Hampel identifier -- per-user rolling
  window (±3 rows), exact frame median and MAD computed in INTEGER
  arithmetic over sorted q6 arrays (doubled/quadrupled units keep the
  two rank-crossing averages integral), outlier iff
  |x - med| > 3 * 1.4826 * MAD. The standard robust alternative to
  z-score spike detection.
- ``curation_kcenter_coreset``: farthest-point (greedy k-center)
  selection, k = 3, cosine distance -- the classic 2-approximation
  coreset/diversity primitive (Gonzalez 1985), unrolled as integer
  argmin joins like `knn_mmr_diversify`.
- ``ml_knn_classifier``: exact 5-NN majority-vote classification of
  20 held-out query embeddings against the labeled corpus --
  deterministic (count desc, label asc) vote.
- ``graph_jaccard_link_prediction``: neighborhood-Jaccard scores for
  non-adjacent 2-hop pairs of the co-purchase graph (the standard
  link-prediction baseline; Liben-Nowell & Kleinberg 2003), top-50.
- ``stat_theil_sen_slope``: Theil--Sen robust slope (exact median of
  pairwise slopes) of order-count vs account balance per nation,
  rank-crossing median over q6-quantized slopes via grouped_rank.

Exactness: medians are rank-crossings over int64-quantized values
(never percentile interpolation on raw doubles); votes, counts, and
Hamming-style comparisons are pure integers; every emitted double is
a single division of identical integers. Reference parity: the
reference is diagram-only (SURVEY.md §0); these extend the [C]
LLM-pipeline / analytics surface.

Registered LAST (queries/__init__._load_all): new unverified queries
append BEHIND the already pre-flighted driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import q6, snap6
from . import register

# ---------------------------------------------------------------------------
# Hampel filter. Median arithmetic in scaled integer units: with the
# sorted q6 frame s (n = len), med2q = s[(n+1)//2] + s[(n+2)//2] is
# TWICE the median (integer); deviations |2x - med2q| are integers in
# doubled units; mad4q = their rank-crossing sum is FOUR TIMES the
# MAD. The outlier test 2*|2x - med2q| > 4.4478 * mad4q multiplies
# both sides by 4 -- still one constant product per side, identical
# on both engines. k = 3 * 1.4826 (the Gaussian-consistency MAD
# scale).
#
# Scale: the window partitions on user_id -- cardinality grows WITH
# the data (no low-cardinality funnel); the ±3-row frame is O(1) per
# row. At 100 TB this is a standard keyed window over the natural
# event partitioning.
# ---------------------------------------------------------------------------

_HAMPEL_K = 4.4478  # 3 * 1.4826

_HAMPEL_ORACLE = f"""
WITH v AS (
  SELECT event_id, user_id, ts, value,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT event_id, user_id, value, vq,
         list_sort(list(vq) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS s
  FROM v
),
m AS (
  SELECT event_id, user_id, value, vq,
         s[CAST((len(s) + 1) // 2 AS INT)]
           + s[CAST((len(s) + 2) // 2 AS INT)] AS med2q,
         list_sort(list_transform(
           s, x -> abs(2 * x - (s[CAST((len(s) + 1) // 2 AS INT)]
                                + s[CAST((len(s) + 2) // 2 AS INT)]))))
           AS dev
  FROM w
)
SELECT event_id, user_id, value,
       med2q / 2e6 AS med_s,
       (dev[CAST((len(dev) + 1) // 2 AS INT)]
        + dev[CAST((len(dev) + 2) // 2 AS INT)]) / 4e6 AS mad_s,
       2.0 * abs(2 * vq - med2q)
         > {_HAMPEL_K} * (dev[CAST((len(dev) + 1) // 2 AS INT)]
                          + dev[CAST((len(dev) + 2) // 2 AS INT)])
         AS is_outlier
FROM m ORDER BY event_id
"""


@register("window_hampel_filter", oracle=_HAMPEL_ORACLE)
def window_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel robust outlier screen: rolling ±3-row exact median/MAD
    per user in integer units, |x - med| > 3*1.4826*MAD flag."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-3, 3))
    base = ev.select("event_id", "user_id", "ts", "value",
                     q6(F.col("value")).alias("vq"))
    arr = base.withColumn(
        "s", F.array_sort(F.collect_list("vq").over(w)))
    med2q = ("(element_at(s, cast((size(s) + 1) div 2 as int))"
             " + element_at(s, cast((size(s) + 2) div 2 as int)))")
    m = arr.withColumn("med2q", F.expr(med2q)).withColumn(
        "dev",
        F.expr("array_sort(transform(s, x -> abs(2 * x - med2q)))"))
    mad4q = ("(element_at(dev, cast((size(dev) + 1) div 2 as int))"
             " + element_at(dev, cast((size(dev) + 2) div 2 as int)))")
    return (
        m.withColumn("mad4q", F.expr(mad4q))
        .select(
            "event_id", "user_id", "value",
            (F.col("med2q") / 2e6).alias("med_s"),
            (F.col("mad4q") / 4e6).alias("mad_s"),
            (2.0 * F.abs(2 * F.col("vq") - F.col("med2q"))
             > _HAMPEL_K * F.col("mad4q")).alias("is_outlier"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Greedy k-center (farthest-point) coreset over the embedding corpus.
# Next center = the point maximizing its min distance to the selected
# set; with cosine distance that is argmin over x of max_c cos(x, c)
# -- exact integer argmin over q6 cosines, unrolled for k = 3 from
# the pinned seed vec_id 0 (deterministic; no RNG in the sandbox
# grid, same convention as the md5-seeded samplers).
#
# Scale: each step is one broadcast of the <=k selected vectors + a
# corpus scan -- O(k * n) total, the standard coreset build.
# ---------------------------------------------------------------------------

_KC_ORACLE = """
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT v AS v0 FROM c WHERE vec_id = 0),
d1 AS (
  SELECT vec_id,
         CAST(floor(list_dot_product(v, v0)
              / (sqrt(list_dot_product(v, v))
                 * sqrt(list_dot_product(v0, v0))) * 1e6 + 0.5)
           AS BIGINT) AS cos1
  FROM c CROSS JOIN c0 WHERE vec_id <> 0
),
s2 AS (
  SELECT min(d.vec_id) AS vid, min(d.cos1) AS cosv
  FROM d1 d
  JOIN (SELECT min(cos1) AS mn FROM d1) m ON d.cos1 = m.mn
),
v2 AS (SELECT c.v AS v2 FROM c JOIN s2 ON c.vec_id = s2.vid),
d2 AS (
  SELECT d1.vec_id,
         greatest(d1.cos1,
           CAST(floor(list_dot_product(c.v, v2.v2)
                / (sqrt(list_dot_product(c.v, c.v))
                   * sqrt(list_dot_product(v2.v2, v2.v2))) * 1e6 + 0.5)
             AS BIGINT)) AS mx
  FROM d1 JOIN c ON c.vec_id = d1.vec_id
  CROSS JOIN v2 CROSS JOIN s2
  WHERE d1.vec_id <> s2.vid
),
s3 AS (
  SELECT min(d.vec_id) AS vid, min(d.mx) AS cosv
  FROM d2 d
  JOIN (SELECT min(mx) AS mn FROM d2) m ON d.mx = m.mn
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step, CAST(0 AS BIGINT) AS vec_id,
         0.0 AS dist_s
  UNION ALL
  SELECT 2, vid, floor((1.0 - cosv / 1e6) * 1e6 + 0.5) / 1e6 FROM s2
  UNION ALL
  SELECT 3, vid, floor((1.0 - cosv / 1e6) * 1e6 + 0.5) / 1e6 FROM s3
) ORDER BY step
"""


@register("curation_kcenter_coreset", oracle=_KC_ORACLE)
def curation_kcenter_coreset(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (k = 3, cosine distance) from the
    pinned seed: two exact integer argmin scans."""
    from ..functions.vectors import as_double, cosine

    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double("embedding").alias("v"))
    v0 = vecs.where(F.col("vec_id") == 0).select(F.col("v").alias("v0"))
    d1 = (
        vecs.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(v0))
        .select("vec_id", "v", q6(cosine("v", "v0")).alias("cos1"))
        .localCheckpoint(eager=True)  # feeds s2 argmin AND step 3
    )

    def argmin(df: DataFrame, val: str) -> DataFrame:
        mn = df.agg(F.min(val).alias("mn"))
        return (
            df.join(F.broadcast(mn), F.col(val) == F.col("mn"))
            .agg(F.min("vec_id").alias("vid"), F.min(val).alias("cosv"))
        )
    s2 = argmin(d1, "cos1")
    v2 = d1.join(F.broadcast(s2), d1["vec_id"] == s2["vid"]) \
        .select(F.col("v").alias("v2"))
    d2 = (
        d1.crossJoin(F.broadcast(v2))
        .crossJoin(F.broadcast(s2.select(F.col("vid").alias("sel2"))))
        .where(F.col("vec_id") != F.col("sel2"))
        .select("vec_id",
                F.greatest("cos1", q6(cosine("v", "v2"))).alias("mx"))
    )
    s3 = argmin(d2, "mx")
    dist = F.floor((1.0 - F.col("cosv") / 1e6) * 1e6 + F.lit(0.5)) / 1e6
    one = spark.range(1).select(
        F.lit(1).cast("long").alias("step"),
        F.lit(0).cast("long").alias("vec_id"),
        F.lit(0.0).alias("dist_s"))
    return (
        one.unionByName(s2.select(F.lit(2).cast("long").alias("step"),
                                  F.col("vid").alias("vec_id"),
                                  dist.alias("dist_s")))
        .unionByName(s3.select(F.lit(3).cast("long").alias("step"),
                               F.col("vid").alias("vec_id"),
                               dist.alias("dist_s")))
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# Exact 5-NN majority-vote classifier: 20 query vectors scored
# against the rest of the labeled corpus; the vote is deterministic
# (count desc, label asc). Per-query rank rides grouped_rank (query
# universe = 20, bounded).
# ---------------------------------------------------------------------------

_KNN_NQ = 20
_KNN_K = 5

_KNNC_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, label AS true_label,
         embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_KNN_NQ}
),
c AS (
  SELECT vec_id AS nid, label, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id >= {_KNN_NQ}
),
scored AS (
  SELECT qid, true_label, nid, label,
         CAST(floor(list_dot_product(qv, cv)
              / (sqrt(list_dot_product(qv, qv))
                 * sqrt(list_dot_product(cv, cv))) * 1e6 + 0.5)
           AS BIGINT) AS cosq
  FROM q JOIN c ON TRUE
),
top AS (
  SELECT qid, true_label, label FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY cosq DESC, nid) AS rn
    FROM scored
  ) WHERE rn <= {_KNN_K}
),
votes AS (
  SELECT qid, true_label, label, count(*) AS c
  FROM top GROUP BY qid, true_label, label
),
win AS (
  SELECT v.qid, v.true_label,
         min(v.label) AS pred_label, max(v.c) AS n_votes
  FROM votes v
  JOIN (SELECT qid, max(c) AS mc FROM votes GROUP BY qid) m
    ON m.qid = v.qid AND v.c = m.mc
  GROUP BY v.qid, v.true_label
)
SELECT qid, CAST(true_label AS BIGINT) AS true_label,
       CAST(pred_label AS BIGINT) AS pred_label,
       CAST(n_votes AS BIGINT) AS n_votes,
       pred_label = true_label AS correct
FROM win ORDER BY qid
"""


@register("ml_knn_classifier", oracle=_KNNC_ORACLE)
def ml_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-NN majority-vote classification of 20 query vectors,
    deterministic tie rule."""
    from ..functions.vectors import as_double, dot, l2_norm
    from ..operators.ranking import grouped_rank

    emb = load(spark, sf_dir, "embeddings")
    # norms once per side, not re-folded per pair by cosine() --
    # same fold/sqrt/division, bit-identical q6 keys
    q = emb.where(F.col("vec_id") < _KNN_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        as_double("embedding").alias("qv"),
        l2_norm(as_double("embedding")).alias("qn"))
    c = emb.where(F.col("vec_id") >= _KNN_NQ).select(
        F.col("vec_id").alias("nid"), "label",
        as_double("embedding").alias("cv"),
        l2_norm(as_double("embedding")).alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .select("qid", "true_label", "nid", "label",
                (-q6(dot("qv", "cv") / (F.col("qn") * F.col("cn"))))
                .alias("ncosq"))
    )
    top = grouped_rank(scored, ["qid"], ["ncosq", "nid"], "rn",
                       known_group_count=_KNN_NQ) \
        .where(F.col("rn") <= _KNN_K)
    votes = top.groupBy("qid", "true_label", "label") \
        .agg(F.count(F.lit(1)).alias("c"))
    mx = votes.groupBy("qid").agg(F.max("c").alias("mc"))
    win = (
        votes.join(F.broadcast(mx), "qid")
        .where(F.col("c") == F.col("mc"))
        .groupBy("qid", "true_label")
        .agg(F.min("label").alias("pred_label"),
             F.max("c").alias("n_votes"))
    )
    return win.select(
        "qid", F.col("true_label").cast("long").alias("true_label"),
        F.col("pred_label").cast("long").alias("pred_label"),
        F.col("n_votes").cast("long").alias("n_votes"),
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    ).orderBy("qid")


# ---------------------------------------------------------------------------
# Neighborhood-Jaccard link prediction on the SPARSIFIED co-purchase
# graph: score non-adjacent 2-hop pairs by |N(a) ∩ N(b)| / |N(a) ∪
# N(b)|. Sparsification contract shared with `graph_triangle_count`
# (`queries/analytics.py`): an edge requires co-purchase in >= 2
# DISTINCT orders -- the un-thresholded projection's wedge count
# grows ~m^1.5 (~1e9 at sf0.1) and OOMs the wedge join, while the
# thresholded graph keeps it at triangle-count cost (~3 s at sf0.1).
# |union| falls out of the degree table: deg(a) + deg(b) - common.
# ---------------------------------------------------------------------------

_LINKPRED_ORACLE = """
WITH u AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
half AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM u a JOIN u b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
edges AS (
  SELECT src, dst FROM half UNION ALL SELECT dst, src FROM half
),
deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src),
wedge AS (
  SELECT e1.src AS a, e2.dst AS b, count(*) AS common
  FROM edges e1 JOIN edges e2
    ON e2.src = e1.dst AND e1.src < e2.dst
  GROUP BY e1.src, e2.dst
),
cand AS (
  SELECT w.a, w.b, w.common
  FROM wedge w
  LEFT JOIN half h ON h.src = w.a AND h.dst = w.b
  WHERE h.src IS NULL
)
SELECT c.a, c.b, CAST(c.common AS BIGINT) AS common,
       floor(c.common
             / CAST(da.degree + db.degree - c.common AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS jaccard_s
FROM cand c
JOIN deg da ON da.node = c.a
JOIN deg db ON db.node = c.b
ORDER BY jaccard_s DESC, a, b LIMIT 50
"""


def jaccard_link_scores(li: DataFrame) -> DataFrame:
    """Neighborhood-Jaccard scores for all non-adjacent 2-hop pairs
    of the >= 2-shared-orders co-purchase projection of ``li``
    (l_orderkey, l_partkey). Factored for tools/scale_probe.py; the
    registered query takes its top-50. The sparsified half-edge
    build routes through the shared `copurchase_half(min_orders=2)`
    (set explosion, 2.3x the self-join form) so the projection
    cannot drift from the other graph surfaces."""
    from ..operators.graph import copurchase_half

    half = copurchase_half(li, min_orders=2)
    # checkpointed by the operator: feeds wedges, degrees, anti-join
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree")) \
        .withColumnRenamed("src", "node")
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("mid"))
    e2 = edges.select(F.col("src").alias("mid2"), F.col("dst").alias("b"))
    wedge = (
        e1.join(e2, (F.col("mid2") == F.col("mid"))
                & (F.col("a") < F.col("b")))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))
    )
    cand = wedge.join(
        half, (half["src"] == wedge["a"]) & (half["dst"] == wedge["b"]),
        "left_anti")
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    jac = F.col("common") / (F.col("dega") + F.col("degb")
                             - F.col("common")).cast("double")
    return (
        cand.join(da, "a").join(db, "b")
        .select("a", "b", F.col("common").cast("long").alias("common"),
                snap6(jac).alias("jaccard_s"))
    )


@register("graph_jaccard_link_prediction", oracle=_LINKPRED_ORACLE)
def graph_jaccard_link_prediction(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Top-50 neighborhood-Jaccard scores over non-adjacent 2-hop
    pairs of the >= 2-shared-orders co-purchase projection."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        jaccard_link_scores(li)
        .orderBy(F.desc("jaccard_s"), "a", "b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust slope per nation: exact rank-crossing median of
# the q6-quantized pairwise slopes (order count vs balance). Same
# bounded-group pair contract as stat_kendall_tau; the median rank
# rides grouped_rank (nation universe = 25, bounded). The estimator
# runs on a deterministic 1-in-3 customer slice (c_custkey % 3 = 0):
# unlike Kendall's pure aggregate, the median must RANK the pair
# table, and ranking the full n^2/group table is what a Theil-Sen
# deployment would subsample anyway (the classic O(n log n)
# Matousek randomization); the slice keeps the ranked table at
# lineitem scale while the median stays exact on the slice.
# ---------------------------------------------------------------------------

_THEILSEN_ORACLE = """
WITH cust AS (
  SELECT c.c_custkey AS ck, n.n_name, c.c_acctbal AS x,
         CAST(COALESCE(o.cnt, 0) AS BIGINT) AS y
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders
             GROUP BY o_custkey) o ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey % 3 = 0
),
slopes AS (
  SELECT a.n_name, a.ck AS cka, b.ck AS ckb,
         CAST(floor((b.y - a.y) / (b.x - a.x) * 1e6 + 0.5) AS BIGINT)
           AS slope_q
  FROM cust a JOIN cust b
    ON b.n_name = a.n_name AND a.ck < b.ck AND b.x <> a.x
),
ranked AS (
  SELECT n_name, slope_q,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY slope_q, cka, ckb) AS rn,
         count(*) OVER (PARTITION BY n_name) AS n
  FROM slopes
)
SELECT n_name, CAST(max(n) AS BIGINT) AS n_pairs,
       (min(CASE WHEN rn = (n + 1) // 2 THEN slope_q END)
        + min(CASE WHEN rn = (n + 2) // 2 THEN slope_q END)) / 2e6
         AS theil_slope_s
FROM ranked GROUP BY n_name ORDER BY n_name
"""


@register("stat_theil_sen_slope", oracle=_THEILSEN_ORACLE)
def stat_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope (order count ~ balance) per nation: exact
    median of pairwise slopes via distributed rank crossing."""
    from ..operators.ranking import grouped_rank

    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    cnt = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    base = (
        cust.where(F.col("c_custkey") % 3 == 0)
        .join(F.broadcast(nat),
              F.col("c_nationkey") == nat["n_nationkey"])
        .join(cnt, F.col("c_custkey") == cnt["o_custkey"], "left")
        .select(F.col("c_custkey").alias("ck"), "n_name",
                F.col("c_acctbal").alias("x"),
                F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("y"))
    )
    a = base.select("n_name", F.col("ck").alias("cka"),
                    F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = base.select(F.col("n_name").alias("nb"), F.col("ck").alias("ckb"),
                    F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (
        a.join(b, (F.col("nb") == F.col("n_name"))
               & (F.col("cka") < F.col("ckb"))
               & (F.col("xb") != F.col("xa")))
        .select("n_name", "cka", "ckb",
                F.floor((F.col("yb") - F.col("ya"))
                        / (F.col("xb") - F.col("xa")) * 1e6
                        + F.lit(0.5)).cast("long").alias("slope_q"))
    )
    # n_name: constant-size TPC-H dim (25 nations) -- skip the probe.
    ranked = grouped_rank(slopes, ["n_name"],
                          ["slope_q", "cka", "ckb"], "rn", count_col="n",
                          known_group_count=32)
    # Integer `div` keeps the median ranks exact at any n (the
    # double-divide-then-floor path drifts past ~2^53; ADVICE r6).
    lo = F.min(F.when(
        F.col("rn") == F.expr("(n + 1) div 2"), F.col("slope_q")))
    hi = F.min(F.when(
        F.col("rn") == F.expr("(n + 2) div 2"), F.col("slope_q")))
    return (
        ranked.groupBy("n_name")
        .agg(F.max("n").cast("long").alias("n_pairs"),
             ((lo + hi) / 2e6).alias("theil_slope_s"))
        .orderBy("n_name")
    )
