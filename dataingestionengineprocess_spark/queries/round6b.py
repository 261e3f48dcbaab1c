"""Round-6b queries: community detection, conformal prediction,
hybrid retrieval fusion, and linear attribution certificates.

Five new oracle-gated capabilities, each picked for a
driver-checkable exact certificate (the VERDICT r5 #7 bar -- no
rows-only demos):

- ``graph_label_propagation``: two synchronous label-propagation
  rounds over the part co-purchase graph -- the classic
  community-detection primitive (Raghavan et al. 2007) expressed as
  pure join+aggregate rounds, no windows.
- ``graph_modularity_communities``: Newman modularity contribution
  per LPA community (Q_c = e_c/m - (deg_c/2m)^2) -- the objective
  Louvain-style methods optimize, computed exactly from aggregates.
- ``ml_conformal_split``: split conformal prediction (Vovk et al.;
  Angelopoulos & Bates 2021 tutorial form) -- per-segment mean
  predictor on a train split, exact rank-crossing calibration
  quantile ceil((n+1)(1-alpha))/n on a calibration split, coverage
  audit on a held-out test split.
- ``text_rrf_hybrid_retrieval``: reciprocal-rank fusion (Cormack et
  al. 2009) of a lexical term-frequency ranking and a dense cosine
  ranking -- the standard hybrid-retrieval combiner in modern RAG
  stacks, with both rank lists built distributed (global_rank, no
  single-task window).
- ``ml_shapley_linear``: exact Shapley attribution for a linear
  model (phi_j = w_j * (x_j - E[x_j]), the closed form -- Lundberg &
  Lee 2017 eq. 'Linear SHAP'), aggregated to per-flag mean absolute
  contributions.

Exactness: every cross-engine reduce is int64-quantized (q6 / cents)
before summing; the only doubles that cross the hash gate are single
divisions of identical integers or snap6-gridded values. Reference
parity: the reference is diagram-only (SURVEY.md §0); these extend
the [C] LLM-pipeline / analytics surface.

Registered LAST (queries/__init__._load_all): new unverified queries
append BEHIND the already pre-flighted driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import q6, snap6
from ..operators.graph import COPURCHASE_HALF_SQL
from . import register

# ---------------------------------------------------------------------------
# Shared LPA derivation. Two synchronous rounds from the identity
# init: with distinct (unweighted) edges, round 1's neighbor-mode is
# degenerate-by-construction (every neighbor label distinct => tie
# rule picks the MIN neighbor id); round 2 is a true frequency vote
# over round-1 labels (count desc, label asc tie). Each round is one
# edge-list join + two aggregates -- linear in |E|, no windows, no
# per-community state. At 100 TB the rounds are plain shuffles on the
# edge key, the same scaling contract as graph_pagerank_parts.
# ---------------------------------------------------------------------------

_LPA_EDGES_SQL = COPURCHASE_HALF_SQL + """,
edges AS (
  SELECT src, dst FROM half
  UNION ALL
  SELECT dst AS src, src AS dst FROM half
),
l1 AS (SELECT src AS node, min(dst) AS label FROM edges GROUP BY src),
nbr AS (SELECT e.src AS node, l.label
        FROM edges e JOIN l1 l ON l.node = e.dst),
cnt AS (SELECT node, label, count(*) AS c FROM nbr GROUP BY node, label),
mx AS (SELECT node, max(c) AS mc FROM cnt GROUP BY node),
l2 AS (
  SELECT c.node, min(c.label) AS label
  FROM cnt c JOIN mx m ON m.node = c.node AND c.c = m.mc
  GROUP BY c.node
)
"""


def _lpa_two_rounds(spark: SparkSession, sf_dir: str):
    """(half-edges, mirrored edges, round-2 label per node)."""
    from ..operators.graph import copurchase_half

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    half = copurchase_half(li)
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    l1 = edges.groupBy("src").agg(F.min("dst").alias("label")) \
        .withColumnRenamed("src", "lnode")
    nbr = edges.join(l1, edges["dst"] == F.col("lnode")) \
        .select(F.col("src").alias("node"), "label")
    cnt = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
    mx = cnt.groupBy("node").agg(F.max("c").alias("mc"))
    l2 = (
        cnt.join(mx, "node")
        .where(F.col("c") == F.col("mc"))
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    return half, edges, l2


_LPA_ORACLE = f"""
WITH {_LPA_EDGES_SQL}
SELECT node, CAST(label AS BIGINT) AS label FROM l2 ORDER BY node
"""


@register("graph_label_propagation", oracle=_LPA_ORACLE)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous LPA rounds over the part co-purchase graph:
    per-node community label, deterministic (count desc, label asc)
    vote. Pure join+aggregate rounds -- the scale path for iterative
    label refinement (add rounds = add shuffles, never windows)."""
    _, _, l2 = _lpa_two_rounds(spark, sf_dir)
    return l2.select("node", F.col("label").cast("long").alias("label")) \
        .orderBy("node")


_MODULARITY_ORACLE = f"""
WITH {_LPA_EDGES_SQL},
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM half),
deg AS (
  SELECT src AS node, count(*) AS degree FROM edges GROUP BY src
),
e_in AS (
  SELECT a.label, count(*) AS e_c
  FROM half h
  JOIN l2 a ON a.node = h.src
  JOIN l2 b ON b.node = h.dst AND b.label = a.label
  GROUP BY a.label
),
comm AS (
  SELECT l.label,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d.degree) AS BIGINT) AS deg_sum
  FROM l2 l JOIN deg d ON d.node = l.node
  GROUP BY l.label
)
SELECT CAST(c.label AS BIGINT) AS community,
       c.n_nodes,
       CAST(COALESCE(e.e_c, 0) AS BIGINT) AS e_in,
       c.deg_sum,
       floor((COALESCE(e.e_c, 0) / m.m
              - (c.deg_sum / (2.0 * m.m)) * (c.deg_sum / (2.0 * m.m)))
             * 1e6 + 0.5) / 1e6 AS q_c_s
FROM comm c CROSS JOIN m LEFT JOIN e_in e ON e.label = c.label
ORDER BY c.n_nodes DESC, community
"""


@register("graph_modularity_communities", oracle=_MODULARITY_ORACLE)
def graph_modularity_communities(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Newman modularity contribution per LPA community:
    Q_c = e_c/m - (deg_c/2m)^2 over the undirected co-purchase graph.
    All inputs are exact integer aggregates (half-edge count m,
    within-community edges e_c, community degree sums); the single
    double expression is snap6-gridded. The global Q is sum(q_c_s) --
    the objective a Louvain pass would greedily improve."""
    half, edges, l2 = _lpa_two_rounds(spark, sf_dir)
    m_df = half.agg(F.count(F.lit(1)).cast("double").alias("m"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree")) \
        .withColumnRenamed("src", "node")
    a = l2.select(F.col("node").alias("na"), F.col("label"))
    b = l2.select(F.col("node").alias("nb"), F.col("label").alias("lb"))
    e_in = (
        half.join(a, half["src"] == F.col("na"))
        .join(b, (half["dst"] == F.col("nb"))
              & (F.col("lb") == F.col("label")))
        .groupBy("label").agg(F.count(F.lit(1)).alias("e_c"))
    )
    comm = (
        l2.join(deg, "node")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
             F.sum("degree").cast("long").alias("deg_sum"))
    )
    q_c = (F.coalesce(F.col("e_c"), F.lit(0)) / F.col("m")
           - (F.col("deg_sum") / (2.0 * F.col("m")))
           * (F.col("deg_sum") / (2.0 * F.col("m"))))
    return (
        comm.crossJoin(F.broadcast(m_df))
        .join(e_in, "label", "left")
        .select(F.col("label").cast("long").alias("community"),
                "n_nodes",
                F.coalesce(F.col("e_c"), F.lit(0)).cast("long")
                .alias("e_in"),
                "deg_sum",
                snap6(q_c).alias("q_c_s"))
        .orderBy(F.desc("n_nodes"), "community")
    )


# ---------------------------------------------------------------------------
# Split conformal prediction: train/calibration/test splits keyed on
# c_custkey residue (deterministic, engine-independent). Predictor =
# per-segment train mean (exact cents sum / count, snap6); score =
# |y - pred| (q6 int64); qhat = the ceil((n_cal+1)*0.9)-th smallest
# calibration score (exact rank crossing, alpha = 0.1); the test
# split then audits empirical coverage of [pred - qhat, pred + qhat].
# Finite-sample guarantee: coverage >= 0.9 in expectation.
#
# Scale: the ranked calibration quantile rides grouped_rank (segment
# universe = 5, bounded); train/test legs are plain aggregates. At
# 100 TB every pass is one shuffle on the segment key.
# ---------------------------------------------------------------------------

_CONFORMAL_ORACLE = """
WITH pred AS (
  SELECT c_mktsegment,
         floor(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
               / CAST(count(*) AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6
           AS pred
  FROM customer WHERE c_custkey % 2 = 0
  GROUP BY c_mktsegment
),
cal AS (
  SELECT c.c_mktsegment, c.c_custkey,
         CAST(floor(abs(c.c_acctbal - p.pred) * 1e6 + 0.5) AS BIGINT)
           AS rq
  FROM customer c JOIN pred p ON p.c_mktsegment = c.c_mktsegment
  WHERE c.c_custkey % 4 = 1
),
ranked AS (
  SELECT c_mktsegment, rq,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY rq, c_custkey) AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n_cal
  FROM cal
),
qhat AS (
  /* Segments whose calibration split cannot reach the ceil rank
     (k > n_cal, i.e. n_cal < 9 at alpha = 0.1) DROP -- qhat is
     +infinity, the standard small-n conformal degenerate case; the
     Spark side drops them identically (no rank-k row survives the
     filter). Without this guard the engines disagree at smoke SF. */
  SELECT * FROM (
    SELECT c_mktsegment, CAST(max(n_cal) AS BIGINT) AS n_cal,
           CAST(min(CASE WHEN rn = ((n_cal + 1) * 9 + 9) // 10
                         THEN rq END) AS BIGINT) AS qhat_q
    FROM ranked GROUP BY c_mktsegment
  ) WHERE qhat_q IS NOT NULL
),
test AS (
  SELECT c.c_mktsegment,
         CAST(floor(abs(c.c_acctbal - p.pred) * 1e6 + 0.5) AS BIGINT)
           AS rq
  FROM customer c JOIN pred p ON p.c_mktsegment = c.c_mktsegment
  WHERE c.c_custkey % 4 = 3
)
SELECT t.c_mktsegment, q.n_cal, q.qhat_q / 1e6 AS qhat,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(count(*) FILTER (WHERE t.rq <= q.qhat_q) AS BIGINT)
         AS n_covered,
       floor(count(*) FILTER (WHERE t.rq <= q.qhat_q)
             / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS coverage_s
FROM test t JOIN qhat q ON q.c_mktsegment = t.c_mktsegment
GROUP BY t.c_mktsegment, q.n_cal, q.qhat_q
ORDER BY t.c_mktsegment
"""


@register("ml_conformal_split", oracle=_CONFORMAL_ORACLE)
def ml_conformal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction at alpha = 0.1: exact calibration
    quantile (rank-crossing, ceil((n+1)0.9)), held-out coverage
    audit. Distributed rank via grouped_rank, no per-segment
    window."""
    from ..operators.ranking import grouped_rank

    cust = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    pred = (
        cust.where(F.col("c_custkey") % 2 == 0)
        .groupBy("c_mktsegment")
        .agg(snap6(F.sum(cents) / F.count(F.lit(1)).cast("double")
                   / 100.0).alias("pred"))
    )
    rq = q6(F.abs(F.col("c_acctbal") - F.col("pred"))).alias("rq")
    cal = (
        cust.where(F.col("c_custkey") % 4 == 1)
        .join(F.broadcast(pred), "c_mktsegment")
        .select("c_mktsegment", "c_custkey", rq)
    )
    # c_mktsegment: fixed generator enum (5 values) -- skip the probe.
    ranked = grouped_rank(cal, ["c_mktsegment"], ["rq", "c_custkey"],
                          "rn", count_col="n_cal", known_group_count=8)
    # Integer `div`, not double-divide-then-floor: past ~2^53 the
    # double path loses ulps and can land one rank off the oracle's
    # exact // (the hamilton_quota precedent, ADVICE r4).
    k = F.expr("((n_cal + 1) * 9 + 9) div 10")
    qhat = (
        ranked.where(F.col("rn") == k)
        .select("c_mktsegment", F.col("n_cal").cast("long").alias("n_cal"),
                F.col("rq").alias("qhat_q"))
    )
    test = (
        cust.where(F.col("c_custkey") % 4 == 3)
        .join(F.broadcast(pred), "c_mktsegment")
        .select("c_mktsegment", rq)
    )
    return (
        test.join(F.broadcast(qhat), "c_mktsegment")
        .groupBy("c_mktsegment", "n_cal", "qhat_q")
        .agg(F.count(F.lit(1)).cast("long").alias("n_test"),
             F.sum(F.when(F.col("rq") <= F.col("qhat_q"), 1)
                   .otherwise(0)).cast("long").alias("n_covered"))
        .select("c_mktsegment", "n_cal",
                (F.col("qhat_q") / 1e6).alias("qhat"), "n_test",
                "n_covered",
                snap6(F.col("n_covered")
                      / F.col("n_test").cast("double"))
                .alias("coverage_s"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of a lexical and a dense ranking. Lexical
# leg: total term frequency of the fixed 3-term query (integers).
# Dense leg: q6-quantized cosine to the vec_id-0 query embedding.
# Both rank lists are built with global_rank (distributed ordinal,
# no single-task ORDER BY window); RRF = sum over legs of
# 1/(60 + rank), a deterministic double given integer ranks.
# ---------------------------------------------------------------------------

_RRF_TERMS = ("vector", "hash", "merge")
_RRF_K = 60

_RRF_ORACLE = f"""
WITH lex AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sc
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents)
  WHERE tok IN ({", ".join(f"'{t}'" for t in _RRF_TERMS)})
  GROUP BY doc_id
),
lex_r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sc DESC, doc_id) AS r_lex
  FROM lex
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT vec_id AS doc_id,
         CAST(floor(list_dot_product(embedding::DOUBLE[], qv)
              / (sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[]))
                 * sqrt(list_dot_product(qv, qv))) * 1e6 + 0.5)
           AS BIGINT) AS cosq
  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
),
dense_r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cosq DESC, doc_id) AS r_dense
  FROM dense
),
fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         CAST(l.r_lex AS BIGINT) AS r_lex,
         CAST(d.r_dense AS BIGINT) AS r_dense,
         floor((COALESCE(1.0 / ({_RRF_K} + l.r_lex), 0.0)
                + COALESCE(1.0 / ({_RRF_K} + d.r_dense), 0.0))
               * 1e6 + 0.5) / 1e6 AS rrf_s
  FROM lex_r l FULL OUTER JOIN dense_r d ON d.doc_id = l.doc_id
)
SELECT doc_id, r_lex, r_dense, rrf_s
FROM fused ORDER BY rrf_s DESC, doc_id LIMIT 20
"""


@register("text_rrf_hybrid_retrieval", oracle=_RRF_ORACLE)
def text_rrf_hybrid_retrieval(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """RRF hybrid retrieval: 1/(60+r) fused lexical + dense ranks,
    top-20. Both rank lists distributed via global_rank."""
    from ..functions.vectors import as_double, cosine
    from ..operators.ranking import global_rank

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    lex = (
        docs.select("doc_id",
                    F.explode(F.split(F.lower(F.col("text")), " "))
                    .alias("tok"))
        .where(F.col("tok").isin(*_RRF_TERMS))
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("sc"))
    )
    lex_r = global_rank(
        lex.withColumn("nsc", -F.col("sc")), ["nsc", "doc_id"], "r_lex"
    ).select("doc_id", "r_lex")
    qv = emb.where(F.col("vec_id") == 0) \
        .select(as_double("embedding").alias("qv"))
    dense = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"),
                q6(cosine(as_double("embedding"), F.col("qv")))
                .alias("cosq"))
    )
    dense_r = global_rank(
        dense.withColumn("ncosq", -F.col("cosq")), ["ncosq", "doc_id"],
        "r_dense",
    ).select("doc_id", "r_dense")
    fused = (
        lex_r.join(dense_r, "doc_id", "full_outer")
        .select(
            "doc_id", "r_lex", "r_dense",
            snap6(
                F.coalesce(1.0 / (_RRF_K + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("r_dense")),
                             F.lit(0.0))
            ).alias("rrf_s"))
    )
    return fused.orderBy(F.desc("rrf_s"), "doc_id").limit(20)


# ---------------------------------------------------------------------------
# Exact Shapley attribution for a linear model: for f(x) = b + sum_j
# w_j x_j the Shapley value of feature j on row i has the closed form
# phi_ij = w_j (x_ij - E[x_j]) (Linear SHAP). Fixed, published
# weights; the global means are exact integer-quantized sums; per-row
# |phi| quantizes to q6 int64 before the per-flag reduce.
# ---------------------------------------------------------------------------

_SHAP_W = {"qty": 2.0, "disc": -50000.0, "tax": 30000.0}
_SHAP_B = 100.0

_SHAPLEY_ORACLE = f"""
WITH means AS (
  SELECT sum(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT))
           / CAST(count(*) AS DOUBLE) / 1e6 AS m_qty,
         sum(CAST(floor(l_discount * 1e6 + 0.5) AS BIGINT))
           / CAST(count(*) AS DOUBLE) / 1e6 AS m_disc,
         sum(CAST(floor(l_tax * 1e6 + 0.5) AS BIGINT))
           / CAST(count(*) AS DOUBLE) / 1e6 AS m_tax
  FROM lineitem
),
phi AS (
  SELECT l_returnflag,
         CAST(floor(abs({_SHAP_W["qty"]} * (l_quantity - m_qty))
              * 1e6 + 0.5) AS BIGINT) AS a_qty,
         CAST(floor(abs({_SHAP_W["disc"]} * (l_discount - m_disc))
              * 1e6 + 0.5) AS BIGINT) AS a_disc,
         CAST(floor(abs({_SHAP_W["tax"]} * (l_tax - m_tax))
              * 1e6 + 0.5) AS BIGINT) AS a_tax
  FROM lineitem CROSS JOIN means
)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       floor(sum(a_qty) / CAST(count(*) AS DOUBLE) / 1e6 * 1e6 + 0.5)
         / 1e6 AS mean_abs_phi_qty_s,
       floor(sum(a_disc) / CAST(count(*) AS DOUBLE) / 1e6 * 1e6 + 0.5)
         / 1e6 AS mean_abs_phi_disc_s,
       floor(sum(a_tax) / CAST(count(*) AS DOUBLE) / 1e6 * 1e6 + 0.5)
         / 1e6 AS mean_abs_phi_tax_s
FROM phi GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("ml_shapley_linear", oracle=_SHAPLEY_ORACLE)
def ml_shapley_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form Linear-SHAP attributions vs the global feature
    means, reduced to per-returnflag mean |phi| -- the standard
    global-importance view. One scan for means (broadcast totals),
    one for the attribution reduce."""
    li = load(spark, sf_dir, "lineitem")
    means = li.agg(
        (F.sum(q6(F.col("l_quantity"))) / F.count(F.lit(1))
         .cast("double") / 1e6).alias("m_qty"),
        (F.sum(q6(F.col("l_discount"))) / F.count(F.lit(1))
         .cast("double") / 1e6).alias("m_disc"),
        (F.sum(q6(F.col("l_tax"))) / F.count(F.lit(1))
         .cast("double") / 1e6).alias("m_tax"),
    )
    phi = li.crossJoin(F.broadcast(means)).select(
        "l_returnflag",
        q6(F.abs(_SHAP_W["qty"]
                 * (F.col("l_quantity") - F.col("m_qty")))).alias("a_qty"),
        q6(F.abs(_SHAP_W["disc"]
                 * (F.col("l_discount") - F.col("m_disc")))).alias("a_disc"),
        q6(F.abs(_SHAP_W["tax"]
                 * (F.col("l_tax") - F.col("m_tax")))).alias("a_tax"),
    )
    n = F.count(F.lit(1))
    return (
        phi.groupBy("l_returnflag")
        .agg(n.cast("long").alias("n"),
             snap6(F.sum("a_qty") / n.cast("double") / 1e6)
             .alias("mean_abs_phi_qty_s"),
             snap6(F.sum("a_disc") / n.cast("double") / 1e6)
             .alias("mean_abs_phi_disc_s"),
             snap6(F.sum("a_tax") / n.cast("double") / 1e6)
             .alias("mean_abs_phi_tax_s"))
        .orderBy("l_returnflag")
    )
