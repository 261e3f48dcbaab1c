"""Round-4 (continued) additions: deterministic minority
oversampling and the embedding outlier screen.

- `curation_oversample_minority` -- class rebalancing without
  randomness: every language is brought up to the majority class
  count by whole-copy replication (k = target div n) plus one extra
  copy for the `target mod n` docs with the smallest md5 coin (the
  md5-ordered portable init idiom). The Spark side REALLY expands
  (explode over sequence(1, copies)) and re-derives the balance sheet
  from the expanded rows -- proving the generative fan-out, not just
  the arithmetic -- and the md5 digest of the zero-padded id:copies
  multiset pins the exact expansion so the oracle (which computes
  copies directly) must agree copy-for-copy.
- `embedding_outlier_zscore` -- embedding-quality screening: per
  label, per-dimension mean/variance from DECIMAL(38) power sums over
  1e-6-quantized components, each vector's diagonal Mahalanobis
  distance (sum of per-dim z^2, int64-quantized terms), top-5
  outliers per label by (distance, vec_id). Zero-variance dims drop
  their term identically in both engines.

Reference parity: diagram-only reference (SURVEY.md §0); both extend
the [C] training-data curation / embedding-quality mandate
(BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from . import register

# ---------------------------------------------------------------------------
# Oversample. copies(doc) = k_full + [md5-rank <= rem]; per-class
# output count is EXACTLY the majority count. The digest is over
# lpad-20 doc ids (lexical == numeric order at ANY int64 width --
# lpad truncates past its width, so 12 would alias 13+-digit ids),
# so the hash pins the multiset, not just totals.
# ---------------------------------------------------------------------------

_OVERSAMPLE_ORACLE = """
WITH cls AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_before
  FROM documents GROUP BY lang
),
tgt AS (SELECT CAST(max(n_before) AS BIGINT) AS t FROM cls),
base AS (
  SELECT c.lang, c.n_before,
         CAST(t.t // c.n_before AS BIGINT) AS k_full,
         CAST(t.t % c.n_before AS BIGINT) AS rem
  FROM cls c CROSS JOIN tgt t
),
ranked AS (
  SELECT d.lang, d.doc_id,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                     d.doc_id) AS rn
  FROM documents d
),
copies AS (
  SELECT r.lang, r.doc_id,
         b.n_before, b.k_full, b.rem,
         CAST(b.k_full + CASE WHEN r.rn <= b.rem THEN 1 ELSE 0 END
              AS BIGINT) AS n_copies
  FROM ranked r JOIN base b ON b.lang = r.lang
)
SELECT lang,
       CAST(max(n_before) AS BIGINT) AS n_before,
       CAST(max(k_full) AS BIGINT) AS k_full,
       CAST(max(rem) AS BIGINT) AS rem,
       CAST(sum(n_copies) AS BIGINT) AS n_after,
       md5(string_agg(lpad(CAST(doc_id AS VARCHAR), 20, '0') || ':'
                      || CAST(n_copies AS VARCHAR), ','
                      ORDER BY doc_id)) AS expansion_md5
FROM copies
GROUP BY lang
ORDER BY lang
"""


@register("curation_oversample_minority", oracle=_OVERSAMPLE_ORACLE)
def curation_oversample_minority(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Replicate every minority class up to the majority count
    (whole copies + md5-ranked remainder); balance sheet and digest
    re-derived from the ACTUAL exploded expansion."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    cls = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_before"))
    tgt = cls.agg(F.max("n_before").cast("long").alias("t"))
    base = cls.crossJoin(F.broadcast(tgt)).select(
        "lang", "n_before",
        F.expr("t div n_before").cast("long").alias("k_full"),
        (F.col("t") % F.col("n_before")).cast("long").alias("rem"),
    )
    # per-lang md5 rank WITHOUT a per-lang window (langs are a small
    # bounded universe; the window form funnels each language's whole
    # corpus through one task's sort)
    from ..operators.ranking import grouped_rank

    ranked = grouped_rank(
        docs.select(
            "lang", "doc_id",
            F.md5(F.col("doc_id").cast("string").cast("binary"))
            .alias("__coin")),
        ["lang"], ["__coin", "doc_id"], "rn",
        # lang: fixed generator enum (5 values) -- skip the probe.
        known_group_count=8).drop("__coin")
    copies = (
        ranked.join(F.broadcast(base), "lang")
        .select(
            "lang", "doc_id", "n_before", "k_full", "rem",
            (F.col("k_full")
             + F.when(F.col("rn") <= F.col("rem"), 1).otherwise(0))
            .cast("long").alias("n_copies"),
        )
    )
    # the REAL generative fan-out: one output row per copy
    expanded = copies.select(
        "lang", "doc_id", "n_before", "k_full", "rem",
        F.explode(F.sequence(F.lit(1), F.col("n_copies")))
        .alias("copy_idx"),
    )
    per_doc = expanded.groupBy(
        "lang", "doc_id", "n_before", "k_full", "rem"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_copies"))
    tag = F.concat(
        F.lpad(F.col("doc_id").cast("string"), 20, "0"),
        F.lit(":"), F.col("n_copies").cast("string"))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.max("n_before").cast("long").alias("n_before"),
            F.max("k_full").cast("long").alias("k_full"),
            F.max("rem").cast("long").alias("rem"),
            F.sum("n_copies").cast("long").alias("n_after"),
            F.md5(F.array_join(
                F.array_sort(F.collect_list(tag)), ",").cast("binary"))
            .alias("expansion_md5"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Outlier screen. x_q = floor(val*1e6+0.5) exact per component;
# per-(label, dim) stats: n, sx, sxx in DECIMAL(38) (sxx ~ n * 1e12
# cubes past int64 at corpus scale). var numerator n*sxx - sx^2 must
# be > 0 for a dim to contribute; z^2 terms quantize to int64 so the
# per-vector sum is order-independent; top-5 per label by
# (m2 desc, vec_id) on the snapped value.
# ---------------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH comp AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings
),
stats AS (
  SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(xq AS HUGEINT)) AS sx,
         sum(CAST(xq AS HUGEINT) * xq) AS sxx
  FROM comp GROUP BY label, dim
),
terms AS (
  SELECT c.vec_id, c.label,
         CASE WHEN s.n * s.sxx - s.sx * s.sx > 0 THEN
           CAST(floor(
             (CAST(c.xq AS DOUBLE) - CAST(s.sx AS DOUBLE) / s.n)
             * (CAST(c.xq AS DOUBLE) - CAST(s.sx AS DOUBLE) / s.n)
             / (CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE)
                / (CAST(s.n AS DOUBLE) * s.n))
             * 1e6 + 0.5) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS zq
  FROM comp c JOIN stats s ON s.label = c.label AND s.dim = c.dim
),
m2 AS (
  SELECT vec_id, label,
         floor(sum(zq) / 1e6 * 1e6 + 0.5) / 1e6 AS m2_s
  FROM terms GROUP BY vec_id, label
),
top AS (
  SELECT label, vec_id, m2_s,
         row_number() OVER (PARTITION BY label
                            ORDER BY m2_s DESC, vec_id) AS rk
  FROM m2
)
SELECT label, vec_id, m2_s, CAST(rk AS BIGINT) AS rk
FROM top WHERE rk <= 5
ORDER BY label, rk
"""


@register("embedding_outlier_zscore", oracle=_OUTLIER_ORACLE)
def embedding_outlier_zscore(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Top-5 per-label embedding outliers by diagonal Mahalanobis
    distance over 1e-6-quantized components."""
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("dim0", "val"),
    ).select(
        "vec_id", "label", (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("val").cast("double") * 1e6 + 0.5).cast("long")
        .alias("xq"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = comp.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("xq"))).alias("sx"),
        F.sum(dec(F.col("xq")) * F.col("xq")).alias("sxx"),
    )
    var_num = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    mean = F.col("sx").cast("double") / F.col("n")
    var = var_num.cast("double") / (F.col("n").cast("double") * F.col("n"))
    zq = F.when(
        var_num > 0,
        F.floor((F.col("xq").cast("double") - mean)
                * (F.col("xq").cast("double") - mean) / var
                * 1e6 + 0.5).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    terms = comp.join(F.broadcast(stats), ["label", "dim"]) \
        .select("vec_id", "label", zq.alias("zq"))
    m2 = terms.groupBy("vec_id", "label").agg(
        _snap6(F.sum("zq") / 1e6).alias("m2_s"))
    # labels are a small bounded universe: a per-label rank window
    # would funnel each label's whole vector population through one
    # task. Rank distributed instead (descending m2 via negation --
    # grouped_rank orders ascending).
    from ..operators.ranking import grouped_rank

    top = grouped_rank(
        m2.withColumn("__neg", -F.col("m2_s")),
        ["label"], ["__neg", "vec_id"], "rk",
        # label: fixed generator enum (10 values) -- skip the probe.
        known_group_count=16).drop("__neg")
    return (top.where(F.col("rk") <= 5)
            .select("label", "vec_id", "m2_s", "rk")
            .orderBy("label", "rk"))
