"""Round-4 (continued) additions: Welch t-test, one-way ANOVA, and
the Heaps-law vocabulary growth curve.

- `stat_welch_ttest` -- the parametric companion to
  `stat_mann_whitney`: Welch's unequal-variance t between label 0 and
  the rest on the first embedding component, entirely from exact
  quantized power sums (DECIMAL(38) accumulators), with the
  Welch-Satterthwaite degrees of freedom; t and df snap once at the
  end, degenerate variance yields NULL in both engines.
- `stat_anova_oneway` -- one-way ANOVA F across all ten labels from
  the same power-sum algebra: SS_between/SS_within in exact quantized
  units, F snapped; emitted per-group means alongside so the hash
  carries the decomposition, not just the statistic.
- `text_vocab_growth_heaps` -- Heaps' law V(n) ~ K n^beta measured
  exactly: documents ordered by the md5 coin (deterministic corpus
  order), each token's FIRST-occurrence document rank via one min
  aggregate, cumulative vocabulary read off ten prefix checkpoints
  with a broadcast range join, and beta fitted by OLS on snapped
  ln/ln pairs. The token first-rank table is the whole trick: no
  prefix is ever re-scanned, any corpus size costs one tokenize +
  two bounded joins.

Reference parity: diagram-only reference (SURVEY.md §0); the tests
extend the [C] statistics mandate, Heaps the [C] text-analysis
family next to the Zipf slope (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from . import register

# ---------------------------------------------------------------------------
# Welch. xq = floor(x*1e6+0.5); per group: n, sx, sxx (DECIMAL(38)).
# var = (n*sxx - sx^2) / (n^2 (n-1)) * 1e-12 in original units --
# the 1e-12 descale cancels in t but NOT in df, so both engines
# compute in QUANTIZED units throughout and only t/df snap (t is
# scale-free; df is a ratio of same-scale terms, also scale-free).
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH scored AS (
  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS xq,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS g
  FROM embeddings
),
st AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(xq AS HUGEINT)) AS sx,
         sum(CAST(xq AS HUGEINT) * xq) AS sxx
  FROM scored GROUP BY g
),
w AS (
  SELECT max(CASE WHEN g = 1 THEN n END) AS n1,
         max(CASE WHEN g = 0 THEN n END) AS n2,
         max(CASE WHEN g = 1 THEN CAST(sx AS DOUBLE) / n END) AS m1,
         max(CASE WHEN g = 0 THEN CAST(sx AS DOUBLE) / n END) AS m2,
         max(CASE WHEN g = 1 AND n > 1 THEN
             CAST(n * sxx - sx * sx AS DOUBLE)
             / (CAST(n AS DOUBLE) * (n - 1)) END) AS v1,
         max(CASE WHEN g = 0 AND n > 1 THEN
             CAST(n * sxx - sx * sx AS DOUBLE)
             / (CAST(n AS DOUBLE) * (n - 1)) END) AS v2
  FROM st
)
SELECT n1, n2,
       floor((m1 - m2) / nullif(sqrt(v1 / n1 + v2 / n2), 0) * 1e6 + 0.5)
         / 1e6 AS t_s,
       floor((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / nullif((v1 / n1) * (v1 / n1) / (n1 - 1)
                      + (v2 / n2) * (v2 / n2) / (n2 - 1), 0)
             * 1e6 + 0.5) / 1e6 AS df_s
FROM w
"""


@register("stat_welch_ttest", oracle=_WELCH_ORACLE)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t (label 0 vs rest) from exact
    quantized power sums; Welch-Satterthwaite df."""
    scored = load(spark, sf_dir, "embeddings").select(
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6 + 0.5)
        .cast("long").alias("xq"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("g"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = scored.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("xq"))).alias("sx"),
        F.sum(dec(F.col("xq")) * F.col("xq")).alias("sxx"),
    )
    def pick(g, expr):  # noqa: E306
        return F.max(F.when(F.col("g") == g, expr))
    var = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    w = st.agg(
        pick(1, F.col("n")).cast("long").alias("n1"),
        pick(0, F.col("n")).cast("long").alias("n2"),
        pick(1, F.col("sx").cast("double") / F.col("n")).alias("m1"),
        pick(0, F.col("sx").cast("double") / F.col("n")).alias("m2"),
        pick(1, F.when(F.col("n") > 1, var)).alias("v1"),
        pick(0, F.when(F.col("n") > 1, var)).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    df_den = (
        (F.col("v1") / F.col("n1")) * (F.col("v1") / F.col("n1"))
        / (F.col("n1") - 1)
        + (F.col("v2") / F.col("n2")) * (F.col("v2") / F.col("n2"))
        / (F.col("n2") - 1)
    )
    return w.select(
        "n1", "n2",
        _snap6((F.col("m1") - F.col("m2"))
               / F.nullif(F.sqrt(se2), F.lit(0.0))).alias("t_s"),
        _snap6(se2 * se2 / F.nullif(df_den, F.lit(0.0))).alias("df_s"),
    )


# ---------------------------------------------------------------------------
# ANOVA. Same power sums per label; SS_within = sum_g (sxx - sx^2/n),
# SS_between = sum_g sx^2/n - S^2/N, all in quantized units (the
# common 1e-12 scale cancels in F). Group means emitted snapped in
# ORIGINAL units.
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH scored AS (
  SELECT label,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings
),
st AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(xq AS HUGEINT)) AS sx,
         sum(CAST(xq AS HUGEINT) * xq) AS sxx
  FROM scored GROUP BY label
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
         sum(sx) AS s,
         CAST(sum(CAST(floor(CAST(sxx AS DOUBLE) / 1e12 * 1e6 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sxxo_q,
         CAST(sum(CAST(floor((CAST(sx AS DOUBLE) / 1e6)
                             * (CAST(sx AS DOUBLE) / 1e6) / n
                             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS ssg_q
  FROM st
),
f AS (
  SELECT nn, k,
         (ssg_q / 1e6
          - floor((CAST(s AS DOUBLE) / 1e6) * (CAST(s AS DOUBLE) / 1e6)
                  / nn * 1e6 + 0.5) / 1e6) / (k - 1) AS msb,
         (sxxo_q - ssg_q) / 1e6 / (nn - k) AS msw
  FROM tot
),
groups AS (
  SELECT CAST(label AS BIGINT) AS label, n,
         floor(CAST(sx AS DOUBLE) / n + 0.5) / 1e6 AS mean_s
  FROM st
)
SELECT g.label, g.n,
       floor(g.mean_s * 1e6 + 0.5) / 1e6 AS mean_s,
       floor(f.msb / nullif(f.msw, 0) * 1e6 + 0.5) / 1e6 AS f_s
FROM groups g CROSS JOIN f
ORDER BY g.label
"""


@register("stat_anova_oneway", oracle=_ANOVA_ORACLE)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across labels on the first embedding component
    from exact quantized power sums; per-label means alongside."""
    scored = load(spark, sf_dir, "embeddings").select(
        "label",
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6 + 0.5)
        .cast("long").alias("xq"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("xq"))).alias("sx"),
        F.sum(dec(F.col("xq")) * F.col("xq")).alias("sxx"),
    ).localCheckpoint(eager=True)  # bounded label table, two legs
    # per-label terms descale to ORIGINAL units^2, quantize to the
    # 1e-6 grid as integers, THEN sum: sums of raw doubles would be
    # addition-order-dependent across partitions/engines
    sxo = F.col("sx").cast("double") / 1e6
    tot = st.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sx").alias("s"),
        F.sum(F.floor(F.col("sxx").cast("double") / 1e12 * 1e6 + 0.5)
              .cast("long")).cast("long").alias("sxxo_q"),
        F.sum(F.floor(sxo * sxo / F.col("n") * 1e6 + 0.5).cast("long"))
        .cast("long").alias("ssg_q"),
    )
    so = F.col("s").cast("double") / 1e6
    f = tot.select(
        "nn", "k",
        ((F.col("ssg_q") / 1e6
          - F.floor(so * so / F.col("nn") * 1e6 + 0.5) / 1e6)
         / (F.col("k") - 1)).alias("msb"),
        ((F.col("sxxo_q") - F.col("ssg_q")) / 1e6
         / (F.col("nn") - F.col("k"))).alias("msw"),
    )
    groups = st.select(
        F.col("label").cast("long").alias("label"), "n",
        (F.floor(F.col("sx").cast("double") / F.col("n") + 0.5) / 1e6)
        .alias("mean_s"),
    )
    return (
        groups.crossJoin(F.broadcast(f))
        .select(
            "label", "n",
            _snap6(F.col("mean_s")).alias("mean_s"),
            _snap6(F.col("msb") / F.nullif(F.col("msw"), F.lit(0.0)))
            .alias("f_s"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Heaps. Corpus order = md5(doc_id) rank (the portable coin); token
# first-rank = min(doc rank) per token; checkpoint c (n_c docs)
# vocab = count(first_rank <= n_c) via one broadcast range join of
# the 10-row axis against the token table. ln/ln OLS slope over the
# checkpoints, every ln snapped.
# ---------------------------------------------------------------------------

_HEAPS_CKPTS = 10

_HEAPS_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, text,
         CAST(row_number() OVER (
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS BIGINT) AS r
  FROM documents
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
tok AS (
  SELECT unnest(string_split(text, ' ')) AS w, r FROM ranked
),
firstr AS (SELECT w, CAST(min(r) AS BIGINT) AS fr FROM tok GROUP BY w),
toks_cum AS (
  SELECT r, CAST(sum(cnt) OVER (ORDER BY r
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       AS tok_cum
  FROM (SELECT r, CAST(len(string_split(text, ' ')) AS BIGINT) AS cnt
        FROM ranked)
),
axis AS (
  SELECT CAST(i.i AS BIGINT) AS ck,
         CAST(greatest((i.i * nn.n) // {_HEAPS_CKPTS}, 1) AS BIGINT)
           AS n_docs
  FROM (SELECT unnest(range(1, {_HEAPS_CKPTS + 1})) AS i) i
  CROSS JOIN nn
),
pts AS (
  SELECT a.ck, a.n_docs,
         (SELECT tok_cum FROM toks_cum t WHERE t.r = a.n_docs)
           AS n_tokens,
         (SELECT CAST(count(*) AS BIGINT) FROM firstr f
          WHERE f.fr <= a.n_docs) AS vocab
  FROM axis a
),
lg AS (
  SELECT ck, n_docs, n_tokens, vocab,
         CAST(floor(ln(n_tokens) * 1e6 + 0.5) AS BIGINT) AS lxq,
         CAST(floor(ln(vocab) * 1e6 + 0.5) AS BIGINT) AS lyq
  FROM pts
),
fit AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(lxq) AS BIGINT) AS sx, CAST(sum(lyq) AS BIGINT) AS sy,
         CAST(sum(lxq * lyq) AS BIGINT) AS sxy,
         CAST(sum(lxq * lxq) AS BIGINT) AS sxx
  FROM lg
)
SELECT g.ck, g.n_docs, g.n_tokens, g.vocab,
       floor(CAST(f.m * f.sxy - f.sx * f.sy AS DOUBLE)
             / nullif(CAST(f.m * f.sxx - f.sx * f.sx AS DOUBLE), 0)
             * 1e6 + 0.5) / 1e6 AS beta_s
FROM lg g CROSS JOIN fit f
ORDER BY g.ck
"""


@register("text_vocab_growth_heaps", oracle=_HEAPS_ORACLE)
def text_vocab_growth_heaps(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth over ten md5-ordered corpus
    prefixes, beta from snapped ln/ln OLS."""
    from ..functions.text import tokens
    from ..operators.ranking import global_rank

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    coin = F.md5(F.col("doc_id").cast("string").cast("binary"))
    ranked = global_rank(
        docs.select("doc_id", "text", coin.alias("coin")),
        ["coin", "doc_id"], rank_col="r",
    ).select("doc_id", "text", "r").localCheckpoint(eager=True)
    nn = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    tok = ranked.select(F.explode(tokens("text")).alias("w"), "r")
    firstr = tok.groupBy("w").agg(F.min("r").cast("long").alias("fr"))
    tok_counts = ranked.select(
        "r", F.size(tokens("text")).cast("long").alias("cnt"))
    axis = (
        spark.range(1, _HEAPS_CKPTS + 1)
        .select(F.col("id").cast("long").alias("ck"))
        .crossJoin(F.broadcast(nn))
        .select("ck", F.greatest(
            F.expr(f"(ck * n) div {_HEAPS_CKPTS}"), F.lit(1))
            .cast("long").alias("n_docs"))
    )
    # broadcast 10-row axis against the bounded-side tables: one
    # range join each for cumulative tokens and vocabulary
    n_tokens = (
        tok_counts.crossJoin(F.broadcast(axis))
        .where(F.col("r") <= F.col("n_docs"))
        .groupBy("ck", "n_docs")
        .agg(F.sum("cnt").cast("long").alias("n_tokens"))
    )
    vocab = (
        firstr.crossJoin(F.broadcast(axis))
        .where(F.col("fr") <= F.col("n_docs"))
        .groupBy("ck")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    # ln pairs quantized to INTEGERS before any sum: sums of snapped
    # doubles are addition-order-dependent across engines/partitions
    lg = (
        n_tokens.join(vocab, "ck")
        .select(
            "ck", "n_docs", "n_tokens", "vocab",
            F.floor(F.log("n_tokens") * 1e6 + 0.5).cast("long")
            .alias("lxq"),
            F.floor(F.log("vocab") * 1e6 + 0.5).cast("long")
            .alias("lyq"),
        )
        .localCheckpoint(eager=True)  # 10 rows, feeds fit + output
    )
    fit = lg.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("lxq").cast("long").alias("sx"),
        F.sum("lyq").cast("long").alias("sy"),
        F.sum(F.col("lxq") * F.col("lyq")).cast("long").alias("sxy"),
        F.sum(F.col("lxq") * F.col("lxq")).cast("long").alias("sxx"),
    )
    beta = _snap6(
        (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        / F.nullif(
            (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("double"), F.lit(0.0)))
    return (
        lg.crossJoin(F.broadcast(fit))
        .select("ck", "n_docs", "n_tokens", "vocab",
                beta.alias("beta_s"))
        .orderBy("ck")
    )
