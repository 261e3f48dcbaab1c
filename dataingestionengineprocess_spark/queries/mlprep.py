"""Model-prep query surface: classifier scoring, association mining,
containment dedup, contrastive mining, interval joins, feature scaling.

Round-2 additions to the LLM-data-pipeline mandate (driver brief;
the reference's engine box is opaque, Untitled Diagram.drawio:153-154,
so these derive from standard corpus-curation practice, not from
reference code):

- ``text_classifier_score``: fastText-shaped linear classifier
  INFERENCE over hashed token buckets -- the quality/domain gate every
  web-scale corpus pass runs. Map-only: zero shuffles.
- ``text_pmi_bigrams``: pointwise mutual information collocations --
  the classic association-mining pass over a tokenized corpus.
- ``dedup_containment_pairs``: asymmetric containment near-dup
  (catches subset duplication Jaccard misses).
- ``knn_hard_negatives``: contrastive-training negative mining --
  nearest neighbors restricted to a DIFFERENT label.
- ``join_interval_overlap``: interval x interval overlap join on the
  bucket grid (no nested-loop theta join).
- ``ml_feature_scaling``: winsorize / min-max / z-score feature
  normalization from exact per-segment statistics.

Every query here is DuckDB-oracled; engine-portable hashing uses md5
(present in both engines) rather than xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import md5_bucket, tokens
from ..functions.vectors import as_double, cosine
from ..operators.dedup import containment_pairs
from ..operators.skew import interval_overlap_join
from . import register

# ---------------------------------------------------------------------------
# Hashed-feature linear classifier inference (fastText-shaped).
#
# Real curation pipelines score every document with a small linear
# model over hashed n-gram features (quality filters, domain routers,
# toxicity gates). Training is out of scope for an engine; INFERENCE
# is the engine problem: at 100 TB the scoring pass must be map-only.
# This query is exactly that: token -> hash bucket -> weight lookup ->
# mean -> sigmoid, all inside whole-stage codegen over the scan --
# no shuffle, no Python, no model broadcast even (the "model" is a
# deterministic function of the bucket id, standing in for a
# broadcast weight array; a learned model would broadcast a 4096-float
# map and join the same way).
# ---------------------------------------------------------------------------

_N_BUCKETS = 4096
_MIX = 2654435761  # Knuth multiplicative-hash constant
_SCALE = 8.0
_BIAS = 0.1


def weight_of(tok):
    """Deterministic per-token weight: md5 -> bucket -> mixed weight in
    [-0.5, 0.5]. Engine-portable (md5 + integer arithmetic only)."""
    bucket = md5_bucket(tok, _N_BUCKETS)
    return (bucket * F.lit(_MIX)) % 100001 / F.lit(100000.0) - 0.5


def classifier_score(text_col):
    """The full classifier score expression -- sigmoid(SCALE * mean
    token weight + BIAS) -- shared by every consumer of the gate
    (batch query, streaming gate, quality resampler, pipeline Rule)
    so the formula lives in exactly one Spark site.

    Boundary caveat (applies to any predicate ON the score, e.g.
    ``>= 0.5`` or the resampler's hash coin): the score is
    transcendental, so two engines can disagree in the last ulp; a
    membership predicate flips only when the score sits within ~1e-16
    of the threshold, i.e. with probability ~1e-10 per document --
    negligible at gate scale, but not the pure-integer certainty of
    the md5-membership samplers."""
    toks = tokens(text_col)
    wsum = F.aggregate(
        F.transform(toks, lambda t: weight_of(t)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return 1.0 / (1.0 + F.exp(-(F.lit(_SCALE) * wsum / F.size(toks)
                                + F.lit(_BIAS))))


def classifier_score_sql(toks_sql: str) -> str:
    """The identical score as a DuckDB SQL expression over a token-list
    expression -- the single source for every oracle that embeds the
    classifier."""
    return (
        f"1.0 / (1.0 + exp(-({_SCALE} * list_sum(list_transform({toks_sql}, "
        f"tok -> ((CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT) "
        f"% {_N_BUCKETS}) * {_MIX}) % 100001 / 100000.0 - 0.5)) "
        f"/ len({toks_sql}) + {_BIAS})))"
    )


_CLS_SCORE = classifier_score_sql("toks")

_CLS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
       round({_CLS_SCORE}, 6) AS score,
       ({_CLS_SCORE} >= 0.5) AS keep
FROM t WHERE len(toks) >= 1
"""


@register("text_classifier_score", oracle=_CLS_ORACLE)
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokens("text")
    score = classifier_score("text")
    return (
        load(spark, sf_dir, "documents")
        .filter(F.size(toks) >= 1)
        .select(
            "doc_id", "lang",
            F.size(toks).cast("long").alias("n_tokens"),
            F.round(score, 6).alias("score"),
            (score >= 0.5).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# PMI bigram collocations.
#
# pmi(x, y) = ln( p(x,y) / (p(x) p(y)) ) with p(x,y) over adjacent
# bigram positions and p(x) over all token positions. Computed as a
# log-sum (ln c_xy + 2 ln N_uni - ln N_big - ln c_x - ln c_y) so no
# intermediate product overflows double exactness at corpus scale.
# Scale shape: two token-domain aggregations (bigram counts, unigram
# counts) + joins on the word -- vocab-sized tables, NOT broadcast
# (web vocab is 10^8; AQE may still choose broadcast when it fits) --
# then a top-k TakeOrdered, no global sort.
# ---------------------------------------------------------------------------

_PMI_ORACLE = """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
uni AS (SELECT unnest(t) AS w FROM toks),
ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
utot AS (SELECT count(*) AS n_uni FROM uni),
big AS (
  SELECT unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS bg
  FROM toks WHERE len(t) >= 2
),
bcnt AS (SELECT bg, count(*) AS c_xy FROM big GROUP BY bg),
btot AS (SELECT count(*) AS n_big FROM big)
SELECT w1, w2, c_xy, pmi FROM (
  SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
         CAST(c_xy AS BIGINT) AS c_xy,
         round(ln(c_xy) + 2 * ln(n_uni) - ln(n_big) - ln(u1.c) - ln(u2.c), 6)
             AS pmi
  FROM bcnt CROSS JOIN utot CROSS JOIN btot
  JOIN ucnt u1 ON u1.w = split_part(bg, ' ', 1)
  JOIN ucnt u2 ON u2.w = split_part(bg, ' ', 2)
  WHERE c_xy >= 5
)
ORDER BY pmi DESC, w1, w2 LIMIT 50
"""


@register("text_pmi_bigrams", oracle=_PMI_ORACLE)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(tokens("text").alias("t"))
    uni = docs.select(F.explode("t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    utot = uni.agg(F.count("*").alias("n_uni"))
    bigrams = (
        docs.filter(F.size("t") >= 2)
        .select(
            F.explode(F.expr(
                "transform(slice(t, 1, size(t) - 1),"
                " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
            )).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    bcnt = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    btot = bigrams.agg(F.count("*").alias("n_big"))
    pmi = F.round(
        F.log("c_xy") + 2 * F.log("n_uni") - F.log("n_big")
        - F.log("c1") - F.log("c2"),
        6,
    )
    return (
        bcnt.filter(F.col("c_xy") >= 5)
        .join(ucnt.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(ucnt.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .select("w1", "w2", "c_xy", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Containment near-dup pairs (operators/dedup.containment_pairs).
# ---------------------------------------------------------------------------

_CONTAIN_ORACLE = """
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
       round(n_inter / least(sa.n_sh, sb.n_sh), 4) AS containment
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(n_inter / least(sa.n_sh, sb.n_sh), 4) >= 0.8
"""


@register("dedup_containment_pairs", oracle=_CONTAIN_ORACLE)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return containment_pairs(docs, n=3, threshold=0.8)


# ---------------------------------------------------------------------------
# Contrastive hard-negative mining: for each probe vector, the top-k
# most-similar vectors with a DIFFERENT label. The standard mining
# pass for contrastive/triplet training data. Same broadcast-probes x
# corpus-scan shape as knn_bruteforce_cosine (few probes, one pass
# over the corpus, per-probe top-k inside the shuffle-light window) --
# with the label-mismatch predicate pushed below the similarity
# compute, so same-label rows never cost a dot product.
# ---------------------------------------------------------------------------

_COS = """list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"""

_HARDNEG_ORACLE = f"""
SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim, rank
FROM (
  SELECT a.vec_id AS query_id, a.label AS query_label,
         b.vec_id AS neighbor_id, b.label AS neighbor_label,
         round({_COS}, 6) AS cos_sim,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS}, 6) DESC, b.vec_id) AS rank
  FROM embeddings a
  JOIN embeddings b ON a.label <> b.label
  WHERE a.vec_id % 50 = 0
) WHERE rank <= 5
"""


@register("knn_hard_negatives", oracle=_HARDNEG_ORACLE)
def knn_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        as_double("embedding").alias("q_emb"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        as_double("embedding").alias("c_emb"),
    )
    sim = F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6)
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        corpus.join(
            F.broadcast(probes),
            F.col("neighbor_label") != F.col("query_label"),
        )
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "query_label", "neighbor_id", "neighbor_label",
                "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Interval-overlap join over the bucket grid: per-user daily activity
# intervals x per-(event_type, hour) burst intervals. Both interval
# sets derive from the SAME events scan (cheap aggs); the join itself
# is the operator under test -- operators/skew.interval_overlap_join
# turns the theta overlap predicate into an hour-grid equi-join with
# emit-at-first-shared-cell dedup (no distinct shuffle).
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH l AS (
  SELECT user_id,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS l_start,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS l_end
  FROM events GROUP BY user_id, date_trunc('day', ts)
),
r AS (
  SELECT event_type,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS r_start,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS r_end
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT user_id, event_type, l_start, l_end, r_start, r_end,
       least(l_end, r_end) - greatest(l_start, r_start) AS overlap_s
FROM l JOIN r ON l_start <= r_end AND r_start <= l_end
"""


@register("join_interval_overlap", oracle=_OVERLAP_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    left = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("__d"))
        .agg(F.min(epoch).alias("l_start"), F.max(epoch).alias("l_end"))
        .drop("__d")
    )
    right = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("__h"))
        .agg(F.min(epoch).alias("r_start"), F.max(epoch).alias("r_end"))
        .drop("__h")
    )
    pairs = interval_overlap_join(left, right, bucket_width=3600)
    return pairs.select(
        "user_id", "event_type", "l_start", "l_end", "r_start", "r_end",
        (F.least("l_end", "r_end") - F.greatest("l_start", "r_start"))
        .alias("overlap_s"),
    )


# ---------------------------------------------------------------------------
# Feature scaling from exact per-segment statistics: winsorized clip
# at [p05, p95], min-max over the winsor bounds, z-score. One
# aggregation pass builds the per-segment stats table (segments are
# few -> broadcast back onto the fact scan), so the normalize itself
# is map-only -- the standard two-pass shape for fitting scalers at
# 100 TB.
# ---------------------------------------------------------------------------

_SCALING_ORACLE = """
WITH j AS (
  SELECT o_orderkey, c_mktsegment AS segment, o_totalprice AS price
  FROM orders JOIN customer ON o_custkey = c_custkey
),
stats AS (
  SELECT segment,
         percentile_cont(0.05) WITHIN GROUP (ORDER BY price) AS p05,
         percentile_cont(0.95) WITHIN GROUP (ORDER BY price) AS p95,
         avg(price) AS mu, stddev_samp(price) AS sigma
  FROM j GROUP BY segment
)
SELECT o_orderkey, j.segment,
       round(least(greatest(price, p05), p95), 4) AS winsorized,
       round((least(greatest(price, p05), p95) - p05) / (p95 - p05), 6)
           AS minmax,
       round((price - mu) / sigma, 6) AS zscore
FROM j JOIN stats ON j.segment = stats.segment
"""


@register("ml_feature_scaling", oracle=_SCALING_ORACLE)
def ml_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    j = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        "o_orderkey", F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").alias("price"),
    )
    stats = j.groupBy("segment").agg(
        F.percentile("price", F.lit(0.05)).alias("p05"),
        F.percentile("price", F.lit(0.95)).alias("p95"),
        F.avg("price").alias("mu"),
        F.stddev_samp("price").alias("sigma"),
    )
    clipped = F.least(F.greatest(F.col("price"), F.col("p05")), F.col("p95"))
    return (
        j.join(F.broadcast(stats), "segment")
        .select(
            "o_orderkey", "segment",
            F.round(clipped, 4).alias("winsorized"),
            F.round((clipped - F.col("p05")) / (F.col("p95") - F.col("p05")), 6)
            .alias("minmax"),
            F.round((F.col("price") - F.col("mu")) / F.col("sigma"), 6)
            .alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# Lag-feature generation for supervised time-series training: per
# user, the value's lags 1..3 and the trailing-3 mean, emitted only
# for complete windows. One window spec shared by every feature
# column, so the plan sorts each user partition ONCE; at 100 TB the
# partition key (user) bounds sort width, and there is exactly one
# shuffle (hash by user) regardless of feature count.
# ---------------------------------------------------------------------------

_LAG_ORACLE = """
SELECT user_id, event_id,
       round(value, 4) AS target,
       round(lag(value, 1) OVER w, 4) AS lag1,
       round(lag(value, 2) OVER w, 4) AS lag2,
       round(lag(value, 3) OVER w, 4) AS lag3,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4)
           AS trailing3_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
QUALIFY lag(value, 3) OVER w IS NOT NULL
"""


@register("ml_lag_features", oracle=_LAG_ORACLE)
def ml_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trail = w.rowsBetween(-3, -1)
    return (
        ev.select(
            "user_id", "event_id",
            F.round("value", 4).alias("target"),
            F.round(F.lag("value", 1).over(w), 4).alias("lag1"),
            F.round(F.lag("value", 2).over(w), 4).alias("lag2"),
            F.round(F.lag("value", 3).over(w), 4).alias("lag3"),
            F.round(F.avg("value").over(trail), 4).alias("trailing3_mean"),
            F.lag("value", 3).over(w).alias("__complete"),
        )
        .filter(F.col("__complete").isNotNull())
        .drop("__complete")
    )


# ---------------------------------------------------------------------------
# Negative sampling for recommender / retrieval training: for each
# sampled customer, k part-ids the customer has NOT ordered, chosen by
# a portable hash so the sample is reproducible (and exactly oracled).
#
# The naive formulation is customers x parts anti-join interactions --
# a cross join that dies at catalog scale. Here each customer emits
# only 2k hash-derived CANDIDATE items (map-only fan-out); the single
# shuffle is the anti-join of |users| * 2k candidate rows against the
# interaction set, and the first k survivors (by draw index) win.
# Over-drawing 2x bounds the miss probability; a production variant
# re-draws the rare user whose 2k candidates were all seen.
# ---------------------------------------------------------------------------

_NEG_K = 5
_NEG_DRAWS = 2 * _NEG_K

_NEGSAMPLE_ORACLE = f"""
WITH n AS (SELECT count(*) AS n_parts FROM part),
users AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0),
cand AS (
  SELECT c_custkey, i,
         CAST('0x' || substr(md5(c_custkey || '#' || i), 1, 6) AS BIGINT)
             % n_parts AS item
  FROM users CROSS JOIN n CROSS JOIN generate_series(1, {_NEG_DRAWS}) g(i)
),
seen AS (
  SELECT DISTINCT o_custkey AS c_custkey, l_partkey AS item
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
fresh AS (
  SELECT c.c_custkey, c.item, min(c.i) AS draw
  FROM cand c ANTI JOIN seen s USING (c_custkey, item)
  GROUP BY c.c_custkey, c.item
)
SELECT c_custkey, item, draw, rank FROM (
  SELECT c_custkey, item, draw,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY draw, item) AS rank
  FROM fresh
) WHERE rank <= {_NEG_K}
"""


@register("rec_negative_sampling", oracle=_NEGSAMPLE_ORACLE)
def rec_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    n_parts = load(spark, sf_dir, "part").agg(
        F.count("*").alias("n_parts"))
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    seen = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c_custkey"),
                F.col("l_partkey").alias("item"))
        .distinct()
    )
    # item ids are 0-based dense (p_partkey in [0, n_parts)): the
    # candidate domain must match exactly or the sampler emits
    # phantom items / can never draw the boundary key.
    item = md5_bucket(
        F.concat(F.col("c_custkey").cast("string"), F.lit("#"),
                 F.col("i").cast("string")),
        F.col("n_parts"),
    )
    cand = (
        cust.select("c_custkey")
        .crossJoin(F.broadcast(n_parts))
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.lit(_NEG_DRAWS))))
        .select("c_custkey", "i", item.alias("item"))
    )
    fresh = (
        cand.join(seen, ["c_custkey", "item"], "left_anti")
        .groupBy("c_custkey", "item")
        .agg(F.min("i").alias("draw"))
    )
    w = W.partitionBy("c_custkey").orderBy("draw", "item")
    return (
        fresh.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _NEG_K)
        .select("c_custkey", "item", "draw", "rank")
    )


# ---------------------------------------------------------------------------
# Next-item training pairs for sequence models: per user, each event
# becomes (context = last-3 event types, next = this type). The same
# single-sort-per-user window shape as ml_lag_features; the context is
# packed as a '>'-joined string (concat_ws skips the nulls of short
# heads identically in both engines).
# ---------------------------------------------------------------------------

_NEXTITEM_ORACLE = """
SELECT user_id, event_id,
       concat_ws('>', lag(event_type, 3) OVER w, lag(event_type, 2) OVER w,
                 lag(event_type, 1) OVER w) AS context,
       event_type AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
QUALIFY lag(event_type, 1) OVER w IS NOT NULL
"""


@register("events_next_item_pairs", oracle=_NEXTITEM_ORACLE)
def events_next_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Keep-predicate matches the oracle's QUALIFY exactly: a row
    # qualifies iff it HAS a predecessor (lag1 non-null) -- filtering
    # on context != '' instead would diverge the moment an event_type
    # is NULL (lag1 null but lag2 fills the context) or '' (context
    # empty though lag1 exists).
    return (
        ev.select(
            "user_id", "event_id",
            F.concat_ws(
                ">", F.lag("event_type", 3).over(w),
                F.lag("event_type", 2).over(w),
                F.lag("event_type", 1).over(w),
            ).alias("context"),
            F.col("event_type").alias("next_type"),
            F.lag("event_type", 1).over(w).alias("__lag1"),
        )
        .filter(F.col("__lag1").isNotNull())
        .drop("__lag1")
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding: the category feature becomes the
# mean target of the OTHER rows in the category -- the standard
# leakage-safe categorical encoding. One aggregation pass builds
# (sum, n) per category (few categories -> broadcast back), the
# encode itself is map-only arithmetic: (sum - own) / (n - 1).
# ---------------------------------------------------------------------------

_TARGETENC_ORACLE = """
WITH g AS (
  SELECT o_orderpriority, sum(o_totalprice) AS s, count(*) AS n
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderkey, o.o_orderpriority,
       round(CASE WHEN n > 1 THEN (s - o_totalprice) / (n - 1) END, 6)
           AS loo_mean_price
FROM orders o JOIN g ON o.o_orderpriority = g.o_orderpriority
"""


@register("ml_target_encoding", oracle=_TARGETENC_ORACLE)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority").agg(
        F.sum("o_totalprice").alias("s"), F.count("*").alias("n"))
    loo = F.when(
        F.col("n") > 1,
        (F.col("s") - F.col("o_totalprice")) / (F.col("n") - 1),
    )
    return (
        orders.join(F.broadcast(g), "o_orderpriority")
        .select("o_orderkey", "o_orderpriority",
                F.round(loo, 6).alias("loo_mean_price"))
    )


# ---------------------------------------------------------------------------
# Embedding whitening (per-dimension standardization): center and
# scale every dimension to zero-mean/unit-variance over the corpus --
# the preprocessing that makes product-quantization codebooks and
# euclidean-LSH buckets behave when raw dimensions have wildly
# different scales. Two-pass shape at scale: pass 1 is a posexplode +
# per-dim aggregate (dims x few stats -- a tiny table), pass 2
# broadcasts the stats and emits (vec_id, dim, w) rows map-only --
# zero shuffles beyond the 64-row stats aggregate. Output is the LONG
# form (one row per vector x dimension): the driver's canonicalizer
# requires scalar-only result columns (no top-level array<double> --
# the round-2 failure mode), and long form is also what downstream
# per-dimension consumers (PQ codebook fit, per-dim clipping) join on.
# ---------------------------------------------------------------------------

_WHITEN_ORACLE = """
WITH x AS (
  SELECT vec_id, label, u.dim AS dim, u.val AS val FROM (
    SELECT vec_id, label,
           unnest([{'dim': i, 'val': CAST(e[i] AS DOUBLE)}
                   for i in range(1, len(e) + 1)]) AS u
    FROM (SELECT vec_id, label, embedding AS e FROM embeddings)
  )
),
stats AS (
  SELECT dim, avg(val) AS mu, stddev_samp(val) AS sigma FROM x GROUP BY dim
)
SELECT vec_id, label, x.dim AS dim,
       round((val - mu) / sigma, 6) AS w
FROM x JOIN stats ON x.dim = stats.dim
"""


@register("embedding_whitening", oracle=_WHITEN_ORACLE)
def embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", "label",
        F.posexplode(as_double("embedding")).alias("dim0", "val"),
    ).withColumn("dim", F.col("dim0") + 1).drop("dim0")
    stats = x.groupBy("dim").agg(
        F.avg("val").alias("mu"), F.stddev_samp("val").alias("sigma"))
    return (
        x.join(F.broadcast(stats), "dim")
        .select(
            "vec_id", "label", "dim",
            F.round((F.col("val") - F.col("mu")) / F.col("sigma"), 6).alias("w"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection: embed 64-dim vectors into
# 16 dims with a +/-1 sign matrix (Achlioptas 2003) -- the standard
# first step before LSH/clustering when the raw dimension is high.
# The sign matrix is DERIVED from md5("i:j") parity, so both engines
# construct the identical matrix independently and the projection is
# exactly oracled; a production variant would broadcast a trained /
# seeded matrix the same way. Map-only: k x d multiply-adds per row
# inside codegen, zero shuffles (the classifier-gate plan property).
# ---------------------------------------------------------------------------

_JL_IN = 64
_JL_OUT = 16


def _jl_sign(i: int, j: int) -> float:
    """+1/-1 from the parity of md5('i:j')'s first hex digit --
    bit-identical to the oracle's CASE over DuckDB md5."""
    import hashlib

    h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) % 2 == 0 else -1.0


_JL_ORACLE = f"""
SELECT vec_id, label, u.j AS out_dim, u.v AS projected FROM (
  SELECT vec_id, label,
   unnest([{{'j': j - 1,
             'v': round(list_sum([e[i] *
        (CASE WHEN CAST('0x' || substr(md5((i-1) || ':' || (j-1)), 1, 1)
                   AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END)
     for i in range(1, {_JL_IN + 1})]) / sqrt({_JL_OUT}.0), 6)}}
    for j in range(1, {_JL_OUT + 1})]) AS u
  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
)
"""


@register("embedding_random_projection", oracle=_JL_ORACLE)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output is LONG form (vec_id, label, out_dim, projected) -- one
    row per projected coordinate -- because the driver canonicalizer
    requires scalar-only result columns (no top-level array<double>,
    the round-2 failure mode). The projection itself is unchanged:
    map-only k x d multiply-adds inside codegen, zero shuffles."""
    import math

    emb = load(spark, sf_dir, "embeddings")
    e = as_double("embedding")
    cols = []
    for j in range(_JL_OUT):
        signs = F.array(*[F.lit(_jl_sign(i, j)) for i in range(_JL_IN)])
        acc = F.aggregate(
            F.zip_with(e, signs, lambda x, s: x * s),
            F.lit(0.0), lambda a, x: a + x,
        )
        cols.append(F.round(acc / math.sqrt(_JL_OUT), 6))
    return emb.select(
        "vec_id", "label",
        F.posexplode(F.array(*cols)).alias("out_dim", "projected"),
    )


# ---------------------------------------------------------------------------
# Quality-aware canonical selection: near-dup clusters collapse to
# their BEST member by classifier score (tie-break: smaller doc_id)
# instead of the min-id member -- the policy real curation runs want
# ("of these 40 mirror copies, keep the cleanest"). Composition of
# three shared pieces: PPJoin pair generation, label-propagation
# components, and the classifier score; selection itself is one
# max_by aggregation per cluster, no window sort.
# ---------------------------------------------------------------------------


def _canonical_quality_oracle() -> str:
    from .dedup import NEARDUP_COMPONENTS_CTE

    score = classifier_score_sql("string_split(text, ' ')")
    return "WITH RECURSIVE " + NEARDUP_COMPONENTS_CTE + f""",
scored AS (
  SELECT d.doc_id, coalesce(c.component_id, d.doc_id) AS component,
         round({score}, 6) AS score
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT component, cluster_size, doc_id AS keep_doc_id, best_score FROM (
  SELECT component, doc_id,
         CAST(count(*) OVER w AS BIGINT) AS cluster_size,
         max(score) OVER w AS best_score,
         row_number() OVER (PARTITION BY component
                            ORDER BY score DESC, doc_id) AS rn
  FROM scored
  WINDOW w AS (PARTITION BY component)
) WHERE rn = 1
"""


@register("dedup_canonical_by_quality", oracle=_canonical_quality_oracle())
def dedup_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components
    from ..operators.dedup import prefix_filter_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.6)
    cc = connected_components(pairs, "id_a", "id_b")
    scored = (
        docs.join(cc, docs.doc_id == cc.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
            F.round(classifier_score("text"), 6).alias("score"),
        )
    )
    return (
        scored.groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.max_by(
                "doc_id",
                F.array(F.col("score"), (-F.col("doc_id")).cast("double")),
            ).alias("keep_doc_id"),
            F.max("score").alias("best_score"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source quality report: the table a data-mixing decision reads --
# for each source, document count, mean classifier score, and the
# fraction passing the gate. One aggregation over the map-only score.
# ---------------------------------------------------------------------------


def _source_quality_oracle() -> str:
    score = classifier_score_sql("string_split(text, ' ')")
    return f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg({score}), 6) AS mean_score,
       round(avg(CASE WHEN {score} >= 0.5 THEN 1.0 ELSE 0.0 END), 6)
           AS keep_rate
FROM documents
GROUP BY source
"""


@register("quality_report_by_source", oracle=_source_quality_oracle())
def quality_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    score = classifier_score("text")
    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(score), 6).alias("mean_score"),
            F.round(F.avg(F.when(score >= 0.5, 1.0).otherwise(0.0)), 6)
            .alias("keep_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Rank-based score calibration: the raw classifier score becomes its
# corpus percentile -- the standard fix when a filtering threshold
# must mean "keep the top X%" regardless of how the raw score
# distribution drifts between corpus snapshots.
#
# percent_rank needs a TOTAL order, and a naive Window.orderBy funnels
# the corpus through one task. Here the rank is computed distributed:
# range-repartition on the sort key, per-partition local row_number
# (parallel in-partition sorts), then each partition's global offset
# from the tiny per-partition-count table -- the same two-pass
# prefix-sum shape as the weighted sampler. No stage touches more
# than one partition's rows except the #partitions-row offset table.
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    score = classifier_score_sql("string_split(text, ' ')")
    return f"""
WITH s AS (SELECT doc_id, lang, round({score}, 6) AS score FROM documents)
SELECT doc_id, lang, score,
       round(percent_rank() OVER (ORDER BY score, doc_id), 6) AS calibrated
FROM s
"""


def _calibration_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned locally-ranked frame (pre-checkpoint): split
    out so the plan-shape test can prove the rank window is partitioned
    by __pid (the checkpoint in the query proper hides the window
    behind a LogicalRDD scan)."""
    scored = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang",
            F.round(classifier_score("text"), 6).alias("score"),
        )
        .repartitionByRange(8, "score", "doc_id")
        .withColumn("__pid", F.spark_partition_id())
    )
    # local rank inside each range partition: parallel sorts, each
    # bounded by its partition's rows
    wp = W.partitionBy("__pid").orderBy("score", "doc_id")
    return scored.withColumn("__rn", F.row_number().over(wp))


@register("quality_score_calibration", oracle=_calibration_oracle())
def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pin the partition assignment: repartitionByRange SAMPLES its
    # boundaries per execution, so without this the three consumers
    # below (ranked rows, counts, total) could observe different __pid
    # layouts whenever exchange reuse is disabled -- offsets would then
    # misalign with ranks. localCheckpoint materializes the ranked
    # frame once; every consumer reads the same snapshot.
    local = _calibration_ranked(spark, sf_dir).localCheckpoint()
    # per-partition counts -> exclusive prefix offsets + global N:
    # a #partitions-row table, trivially window-able
    counts = local.groupBy("__pid").agg(F.count("*").alias("__c"))
    wo = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__c").over(wo), F.lit(0)).alias("__off"),
    )
    total = counts.agg(F.sum("__c").alias("__n"))
    return (
        local.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id", "lang", "score",
            F.round(
                # greatest(.., 1) guards the single-document corpus:
                # __n == 1 would divide by zero (Spark NULL) while the
                # oracle's percent_rank yields 0.0 -- with the guard the
                # numerator is 0 and both engines agree on 0.0.
                (F.col("__off") + F.col("__rn") - 1)
                / F.greatest(F.col("__n") - 1, F.lit(1)),
                6,
            ).alias("calibrated"),
        )
    )
