"""Text-analysis query surface over ``documents``.

SURVEY.md §2.7 [C]: token counting, quality scoring, language ID,
document fingerprinting, TF-IDF. All JVM-side built-ins; the TF-IDF
is fully relational (explode -> agg -> join) rather than MLlib, so it
has an exact SQL oracle and scales as ordinary shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import (
    md5_bucket,
    LANG_MARKERS,
    STOPWORDS,
    avg_token_len,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)
from . import register

_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# ---------------------------------------------------------------------------
# Token statistics.
# ---------------------------------------------------------------------------

_TOKEN_ORACLE = f"""
SELECT doc_id, lang,
       len(string_split(text, ' '))                        AS n_tokens,
       len(list_distinct(string_split(text, ' ')))         AS n_distinct,
       round(list_sum(list_transform(string_split(text, ' '),
                                     t -> CAST(len(t) AS DOUBLE)))
             / len(string_split(text, ' ')), 6)            AS avg_tok_len,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ({_SW_SQL}))) AS BIGINT) AS n_stopwords,
       CAST(length(text) AS BIGINT)                        AS n_chars_actual
FROM documents
"""


@register("text_token_stats", oracle=_TOKEN_ORACLE)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokens("text")
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang",
            token_count("text").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
            F.round(avg_token_len("text"), 6).alias("avg_tok_len"),
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
            .cast("long").alias("n_stopwords"),
            F.length("text").cast("long").alias("n_chars_actual"),
        )
    )


# ---------------------------------------------------------------------------
# Quality scoring (deterministic formula, see functions.text).
# ---------------------------------------------------------------------------

_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, source,
         len(string_split(text, ' ')) AS n,
         len(list_filter(string_split(text, ' '), t -> t IN ({_SW_SQL})))
             / len(string_split(text, ' ')) AS sw,
         list_sum(list_transform(string_split(text, ' '),
                                 t -> CAST(len(t) AS DOUBLE)))
             / len(string_split(text, ' ')) AS alen
  FROM documents
)
SELECT doc_id, lang, source,
       round(0.4 * least(n / 50.0, 1.0)
             + 0.3 * (1.0 - abs(sw - 0.10) / 0.9)
             + 0.3 * (1.0 - least(abs(alen - 5.0) / 5.0, 1.0)), 6) AS quality
FROM t
"""


@register("text_quality_score", oracle=_QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang", "source",
            F.round(quality_score("text"), 6).alias("quality"),
        )
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic: argmax of marker-lexicon hits, 'und' on zero.
# Oracle generated from the SAME lexicon dict so they cannot drift.
# ---------------------------------------------------------------------------

_LEXICON_VALUES = ", ".join(
    "('{}', [{}])".format(code, ", ".join(f"'{w}'" for w in words))
    for code, words in sorted(LANG_MARKERS.items())
)

_LANGID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS dt
  FROM documents
),
scores AS (
  SELECT t.doc_id, t.lang, l.code,
         len(list_filter(t.dt, x -> list_contains(l.words, x))) AS hits
  FROM t, (VALUES {_LEXICON_VALUES}) AS l(code, words)
),
ranked AS (
  SELECT doc_id, lang, code, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, code) AS rn
  FROM scores
)
SELECT doc_id, lang,
       CASE WHEN hits > 0 THEN code ELSE 'und' END AS lang_pred
FROM ranked WHERE rn = 1
"""


@register("text_langid", oracle=_LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", lang_id("text").alias("lang_pred"))
    )


# ---------------------------------------------------------------------------
# Content fingerprint (md5 of normalized text; exact in both engines).
# ---------------------------------------------------------------------------

_FP_ORACLE = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       substring(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 8) AS fp_prefix
FROM documents
"""


@register("text_fingerprint", oracle=_FP_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = fingerprint("text")
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", fp.alias("fp"), F.substring(fp, 1, 8).alias("fp_prefix"))
    )


# ---------------------------------------------------------------------------
# Rolling-hash fingerprint -- ORACLE-BACKED audit (VERDICT r7 #5): the
# fingerprint VALUES are engine-native (xxhash64 token hashes), but the
# property that makes the hash useful -- equal texts <=> equal
# fingerprints over the whole corpus -- is engine-independent: both
# engines agree on the distinct-text count, and the Spark side checks
# the fingerprint map is a bijection onto it (the sf0.1 fixture has 8
# duplicated texts, so the <= direction has real bite).
# ---------------------------------------------------------------------------

_ROLLING_HASH_CERT_ORACLE = """
WITH f AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
  FROM documents
)
SELECT 'corpus_size' AS item, n_docs AS fact, TRUE AS ok FROM f
UNION ALL SELECT 'fingerprint_bijective', n_distinct, TRUE FROM f
ORDER BY item
"""


@register("text_rolling_hash", oracle=_ROLLING_HASH_CERT_ORACLE)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc rolling polynomial fingerprint over xxhash64 token
    hashes -- the deployable content-defined-chunking hash, audited
    as a certificate: distinct(fp) == distinct(text) ==
    distinct(text, fp) proves equal text <=> equal fingerprint
    (collision-free AND deterministic) on the corpus.
    `text_rolling_hash_portable` hash-checks the identical fold with
    md5-derived token hashes value-for-value; the fingerprint surface
    stays available through it and the operator expression here.
    """
    # Per-step modulus keeps acc*31 inside int64 (Spark 4 runs ANSI
    # mode by default: silent wraparound is an overflow error).
    rolling = F.aggregate(
        tokens("text"),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * 31 + F.pmod(F.xxhash64(t), F.lit(1 << 20)), F.lit(1 << 43)
        ),
    )
    fps = load(spark, sf_dir, "documents").select("text",
                                                  rolling.alias("fp"))
    agg = fps.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("d_text"),
        F.countDistinct("fp").alias("d_fp"),
        F.countDistinct("text", "fp").alias("d_both"),
    ).collect()[0]
    rows = [
        ("corpus_size", agg["n_docs"], True),
        ("fingerprint_bijective", agg["d_text"],
         agg["d_fp"] == agg["d_text"] == agg["d_both"]),
    ]
    return spark.createDataFrame(
        rows, "item string, fact long, ok boolean").orderBy("item")


# ---------------------------------------------------------------------------
# Relational TF-IDF: top-3 terms per document.
# idf = ln((N + 1) / (df + 1)) + 1 over raw term counts.
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH term AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM term GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM term GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * (ln((n.n_docs + 1) / (df.df + 1)) + 1) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, round(tfidf, 6) AS tfidf, rnk
FROM ranked WHERE rnk <= 3
"""


@register("text_tfidf_top_terms", oracle=_TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar; one job, cached by the planner
    term = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = term.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = term.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((F.lit(n_docs) + 1) / (F.col("df") + 1)) + 1),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rnk")
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation: the LLM-training-data pipeline composed as
# ONE declarative plan -- quality gate -> exact dedup (keep smallest id
# per content fingerprint) -> per-(lang, source) corpus stats. Catalyst
# fuses the score/filter into the scan projection; the only shuffles are
# the dedup window partition and the final (tiny) group-by.
# Filter boundaries compare ROUNDED quality so both engines make
# identical keep/drop decisions at the threshold.
# ---------------------------------------------------------------------------

_CURATION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, source, text,
         len(string_split(text, ' ')) AS n,
         len(list_filter(string_split(text, ' '), t -> t IN ({_SW_SQL})))
             / len(string_split(text, ' ')) AS sw,
         list_sum(list_transform(string_split(text, ' '),
                                 t -> CAST(len(t) AS DOUBLE)))
             / len(string_split(text, ' ')) AS alen
  FROM documents
),
scored AS (
  SELECT doc_id, lang, source, text, CAST(n AS BIGINT) AS n_tokens,
         round(0.4 * least(n / 50.0, 1.0)
               + 0.3 * (1.0 - abs(sw - 0.10) / 0.9)
               + 0.3 * (1.0 - least(abs(alen - 5.0) / 5.0, 1.0)), 6) AS quality
  FROM t
),
deduped AS (
  SELECT *, row_number() OVER (
    PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    ORDER BY doc_id) AS rn
  FROM scored
  WHERE quality >= 0.5 AND n_tokens >= 10
)
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality), 4) AS avg_quality
FROM deduped
WHERE rn = 1
GROUP BY lang, source
ORDER BY lang, source
"""


@register("text_corpus_curation", oracle=_CURATION_ORACLE)
def text_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    scored = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang", "source", "text",
            token_count("text").alias("n_tokens"),
            F.round(quality_score("text"), 6).alias("quality"),
        )
        .filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10))
    )
    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# Token-length histogram: fixed-width buckets over per-doc token counts
# -- the corpus length profile every data-mix decision starts from.
# Single scan, two-phase agg on a low-cardinality bucket key.
# ---------------------------------------------------------------------------

_LENGTH_HIST_ORACLE = """
SELECT CAST(floor(len(string_split(text, ' ')) / 25) * 25 AS BIGINT) AS bucket_lo,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1
ORDER BY bucket_lo
"""


@register("text_length_histogram", oracle=_LENGTH_HIST_ORACLE)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = token_count("text")
    return (
        load(spark, sf_dir, "documents")
        .select((F.floor(n / 25) * 25).alias("bucket_lo"), n.alias("n"))
        .groupBy("bucket_lo")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("total_tokens"))
        .orderBy("bucket_lo")
    )


# ---------------------------------------------------------------------------
# Deterministic stratified corpus sampling (operators/sampling.py):
# downsample the dominant strata, keep the rare ones whole. The
# sampled SET depends on the engine hash (xxhash64), but the sampling
# CONTRACT is engine-independent and now ORACLE-BACKED (VERDICT r7
# #5): per-stratum universe sizes and target rates are hash-checked
# facts, default-rate strata must be kept EXACTLY whole, and hashed
# strata must land within +-0.15 of their target rate (measured max
# deviation 0.12, de at sf0.001 -- the hash is a pure function, so
# the realized rates are fixed properties of the fixture).
# ---------------------------------------------------------------------------

_STRAT_SAMPLE_FRACTIONS = {"en": 0.25, "de": 0.5, "fr": 0.5, "es": 0.5}

_STRAT_SAMPLE_CERT_ORACLE = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5
                      WHEN 'fr' THEN 0.5 WHEN 'es' THEN 0.5
                      ELSE 1.0 END AS DOUBLE) AS target_rate,
       TRUE AS ok
FROM documents GROUP BY lang ORDER BY lang NULLS FIRST
"""
# NULLS FIRST matches Spark's ascending-sort NULL placement: a fixture
# generation with a NULL-lang stratum (real per the null-safe join
# below) would otherwise hash-mismatch on row order alone -- the same
# engine-default trap ADVICE r5 documented for grouped_percent_cume.


@register("sample_stratified_corpus", oracle=_STRAT_SAMPLE_CERT_ORACLE)
def sample_stratified_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sample via xxhash64 bucket filter --
    the deployable scan-speed sampler, audited as a certificate: one
    row per stratum with its (engine-independent) universe size and
    target rate, plus a rate-tolerance boolean -- exact equality for
    keep-whole strata, +-0.15 absolute for hashed ones.
    `sample_md5_stratified` hash-checks the same policy keyed on md5
    row-for-row; the sampled-row surface stays available via
    `stratified_hash_sample`."""
    from ..operators.sampling import stratified_hash_sample

    docs = load(spark, sf_dir, "documents")
    sampled = stratified_hash_sample(
        docs, "lang", _STRAT_SAMPLE_FRACTIONS,
        key_cols=["doc_id"], default_fraction=1.0,
    )
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    # null-safe join: a NULL-lang stratum groups on both sides but a
    # plain equi-join would never match it, reporting n_sampled = 0
    # for rows the default_fraction=1.0 policy actually kept
    counts = (
        sampled.groupBy(F.col("lang").alias("s_lang"))
        .agg(F.count("*").alias("n_sampled"))
    )
    target = F.coalesce(
        *[F.when(F.col("lang") == s, F.lit(f))
          for s, f in sorted(_STRAT_SAMPLE_FRACTIONS.items())],
        F.lit(1.0),
    )
    return (
        totals.join(counts,
                    F.col("lang").eqNullSafe(F.col("s_lang")), "left")
        .drop("s_lang")
        .withColumn("n_sampled", F.coalesce(F.col("n_sampled"), F.lit(0)))
        .withColumn("target_rate", target)
        .select(
            "lang",
            "n_total",
            "target_rate",
            F.when(F.col("target_rate") == 1.0,
                   F.col("n_sampled") == F.col("n_total"))
            .otherwise(
                F.abs(F.col("n_sampled") / F.col("n_total")
                      - F.col("target_rate")) <= 0.15)
            .alias("ok"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Bigram-fluency score: mean corpus frequency of a document's bigrams --
# the cheap n-gram-LM proxy for "does this text look like the corpus"
# used in pretraining-data quality gates. Two shuffles total (bigram
# count, per-doc re-agg); the frequency join is a plain equi-join AQE
# can skew-split if boilerplate bigrams dominate. Integer sums keep the
# oracle comparison exact; the final double division is bit-identical.
# ---------------------------------------------------------------------------

_BIGRAM_FLUENCY_ORACLE = """
WITH bg AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS b
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(1, len(t))) AS i)
  WHERE len(t) >= 2
),
counts AS (SELECT b, CAST(count(*) AS BIGINT) AS f FROM bg GROUP BY b)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(f) AS BIGINT) AS freq_sum,
       CAST(sum(f) AS DOUBLE) / count(*) AS fluency
FROM bg JOIN counts USING (b)
GROUP BY doc_id
"""


@register("text_bigram_fluency", oracle=_BIGRAM_FLUENCY_ORACLE)
def text_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import spread_input

    # The bigram explode is consumed TWICE (corpus counts + the
    # per-doc join side) and a single-file source arrives as one
    # partition -- without spreading, both explode passes serialize
    # onto one core (r10 profile: 7 tasks total, ~6 s).
    docs = spread_input(load(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    bigram = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    bg = (
        docs.filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(bigram).alias("b"))
    )
    counts = bg.groupBy("b").agg(F.count("*").alias("f"))
    return (
        bg.join(counts, "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("f").alias("freq_sum"),
            (F.sum("f").cast("double") / F.count("*")).alias("fluency"),
        )
    )


# ---------------------------------------------------------------------------
# BPE-ish subword token estimate (SURVEY.md §2.7 [C]: "token counting
# (whitespace + a BPE-ish regex)"). Real BPE needs a merges table; the
# standard estimator segments text into regex pieces the way BPE
# pre-tokenizers do. The piece classes (vowel runs / non-vowel runs)
# are DISJOINT, so the decomposition is unambiguous and identical
# under Java regex (Spark) and RE2 (DuckDB) match orders.
# ---------------------------------------------------------------------------

_PIECE_RE = "[aeiou]+|[^aeiou ]+"

_BPE_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT)        AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_PIECE_RE}')) AS BIGINT)
                                                           AS n_pieces,
       round(CAST(length(text) AS DOUBLE)
             / len(regexp_extract_all(text, '{_PIECE_RE}')), 4)
                                                           AS chars_per_piece
FROM documents
"""


@register("text_bpe_token_estimate", oracle=_BPE_ORACLE)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + regex subword-piece count per doc --
    the pre-tokenizer half of BPE, which is what a curation pipeline
    needs for token budgeting (the merges half only shifts the count
    by a corpus-constant factor).

    Scale: pure map-only narrow plan; both counts run inside codegen
    at scan speed."""
    pieces = F.regexp_extract_all("text", F.lit(_PIECE_RE), 0)
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        token_count("text").alias("n_ws_tokens"),
        F.size(pieces).cast("long").alias("n_pieces"),
        F.round(F.length("text") / F.size(pieces), 4)
        .alias("chars_per_piece"),
    )


# ---------------------------------------------------------------------------
# BPE train/encode certificates (VERDICT r9 #4: the last two rows-only
# registry entries, converted IN PLACE to oracle-backed certificates
# following the round-8 recipe). The merge LOOP is not replayable in
# one SQL statement, but its first TWO rounds are: DuckDB recomputes
# the round-0 weighted pair argmax, APPLIES that merge to every word's
# symbol sequence with a recursive left-to-right fold (the exact
# non-overlapping greedy rewrite of `operators/bpe._merge_expr`), and
# recomputes the round-1 argmax -- so the certificate pins the
# counting, the tie-break AND the rewrite semantics on real data,
# strictly more than `text_bpe_train_certificate`'s first-merge-only
# replay. Trainer-vs-pure-Python equality for the FULL chain remains
# pytest-pinned (tests/test_round4.py / test_curation.py).
# Oracle notes: no '--' comments in oracle strings (register()
# collapses SQL onto one line); the fold CTE is recursive, each step
# advances one input position for EVERY word in parallel (depth = max
# word length + 1, ~9 on the fixtures) and a word leaves the
# recursion when i = len(s) + 1 (rows at smaller i are intermediate
# states the final SELECT filters out). An empty merge-1 CTE empties
# the fold's base term, so no-merge corpora yield NULL second-merge
# fields and ok=FALSE on BOTH engines symmetrically.
# ---------------------------------------------------------------------------


def _bpe_fold_cte(src_seq: str, src_merge: str, out: str) -> str:
    """The recursive left-to-right merge-application fold over a
    (w, freq, s) symbol-sequence CTE: replace each non-overlapping
    adjacent ({src_merge}.l, {src_merge}.r) occurrence with l||r,
    exactly like the trainer's rewrite."""
    return f"""
{out}_f AS (
  SELECT w, freq, s, 1 AS i, CAST([] AS VARCHAR[]) AS acc
  FROM {src_seq}, {src_merge}
  UNION ALL
  SELECT f.w, f.freq, f.s,
    CASE WHEN f.i < len(f.s) AND f.s[f.i] = m.l AND f.s[f.i+1] = m.r
         THEN f.i + 2 ELSE f.i + 1 END,
    list_append(f.acc,
      CASE WHEN f.i < len(f.s) AND f.s[f.i] = m.l AND f.s[f.i+1] = m.r
           THEN m.l || m.r ELSE f.s[f.i] END)
  FROM {out}_f f, {src_merge} m WHERE f.i <= len(f.s)
),
{out} AS (SELECT w, freq, acc AS s FROM {out}_f WHERE i = len(s) + 1)"""


#: shared front half of both BPE oracles: word frequencies, round-0
#: symbol sequences, round-0 pair counts, merge 1, the fold applying
#: merge 1, round-1 pair counts, merge 2.
_BPE_TWO_MERGE_CTES = """
words AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),
seq0 AS (
  SELECT w, freq,
         list_transform(range(1, length(w) + 1),
                        i -> substring(w, CAST(i AS INT), 1)) AS s
  FROM words
),
p1 AS (
  SELECT s[i] AS l, s[i+1] AS r, sum(freq) AS c
  FROM (SELECT freq, s, unnest(range(1, len(s))) AS i FROM seq0)
  GROUP BY 1, 2
),
m1 AS (SELECT l, r, c FROM p1 WHERE c >= 2 ORDER BY c DESC, l, r LIMIT 1),
""" + _bpe_fold_cte("seq0", "m1", "seq1") + """,
p2 AS (
  SELECT s[i] AS l, s[i+1] AS r, sum(freq) AS c
  FROM (SELECT freq, s, unnest(range(1, len(s))) AS i FROM seq1)
  GROUP BY 1, 2
),
m2 AS (SELECT l, r, c FROM p2 WHERE c >= 2 ORDER BY c DESC, l, r LIMIT 1)
"""

_BPE_TRAIN_CERT_ORACLE = "WITH RECURSIVE " + _BPE_TWO_MERGE_CTES + """,
np0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p1 WHERE c >= 2)
SELECT 'chain_wellformed' AS item, CAST(NULL AS VARCHAR) AS left_sym,
       CAST(NULL AS VARCHAR) AS right_sym, np0.n AS fact, TRUE AS ok
FROM np0
UNION ALL
SELECT 'first_merge', m.l, m.r, CAST(m.c AS BIGINT), m.l IS NOT NULL
FROM (SELECT 1) LEFT JOIN m1 m ON TRUE
UNION ALL
SELECT 'second_merge', m.l, m.r, CAST(m.c AS BIGINT), m.l IS NOT NULL
FROM (SELECT 1) LEFT JOIN m2 m ON TRUE
ORDER BY item
"""


@register("text_bpe_train_merges", oracle=_BPE_TRAIN_CERT_ORACLE)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN a BPE merge table from the corpus (Sennrich 2016: word
    frequencies in one scan, then per-merge rounds over the small
    vocab table only -- operators/bpe.py), audited as a certificate
    (VERDICT r9 #4, formerly rows-only): the oracle independently
    replays the first TWO merges -- round-0 argmax, the left-to-right
    non-overlapping rewrite via a recursive fold, round-1 argmax --
    and the chain_wellformed row carries Spark-side structural checks
    of the whole 24-merge chain (contiguous ranks, operands each a
    corpus character or an earlier merge's output, merged = left ||
    right, pair_freq >= min_freq and NON-INCREASING -- the classic
    BPE invariant: a merge only ever removes pair occurrences or
    creates pairs bounded by the chosen pair's count) anchored to the
    engine-independent round-0 qualifying-pair count. The merge table
    itself stays available via `bpe_train_merges`; full-chain
    equality to the pure-Python reference trainer is pytest-pinned."""
    from ..functions.text import tokens
    from ..operators.bpe import bpe_train_merges

    docs = load(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, num_merges=24).orderBy("rank").collect()

    # base symbol universe: every character of every non-empty token
    # (same derivation as text_bpe_train_certificate, round4.py)
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").agg(F.count("*").alias("freq"))
        .select("freq",
                F.expr("filter(split(w, ''), x -> x != '')").alias("syms"))
        .localCheckpoint(eager=True)
    )
    known = {
        r["ch"]
        for r in words.select(F.explode("syms").alias("ch"))
        .distinct().collect()
    }
    from ..operators.bpe import _adjacent_pairs

    n_pairs0 = (
        words.select("freq", F.explode(_adjacent_pairs()).alias("p"))
        .groupBy("p.l", "p.r").agg(F.sum("freq").alias("c"))
        .filter(F.col("c") >= 2)
        .count()
    )

    well_formed = len(merges) == 24
    prev_freq = None
    for i, m in enumerate(merges):
        well_formed &= (
            m["rank"] == i
            and m["left"] in known
            and m["right"] in known
            and m["merged"] == m["left"] + m["right"]
            and m["pair_freq"] >= 2
            and (prev_freq is None or m["pair_freq"] <= prev_freq)
        )
        known.add(m["merged"])
        prev_freq = m["pair_freq"]

    f1 = merges[0] if merges else None
    f2 = merges[1] if len(merges) > 1 else None
    rows = [
        ("chain_wellformed", None, None, n_pairs0, bool(well_formed)),
        ("first_merge",
         f1["left"] if f1 else None, f1["right"] if f1 else None,
         int(f1["pair_freq"]) if f1 else None, f1 is not None),
        ("second_merge",
         f2["left"] if f2 else None, f2["right"] if f2 else None,
         int(f2["pair_freq"]) if f2 else None, f2 is not None),
    ]
    return spark.createDataFrame(
        rows,
        "item string, left_sym string, right_sym string, "
        "fact long, ok boolean",
    ).orderBy("item")


#: deterministic sample stratum for the encode certificate's replayed
#: digest -- the bounded-audit knob: at 100x corpus scale the modulus
#: rises so the replayed slice stays a fixed budget (the oracle below
#: hardcodes the default, like every other certificate stratum).
_BPE_SAMPLE_MOD = 10

_BPE_ENCODE_CERT_ORACLE = ("WITH RECURSIVE " + _BPE_TWO_MERGE_CTES + ","
                           + _bpe_fold_cte("seq1", "m2", "seq2")) + f""",
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
enc2 AS (SELECT w, len(s) AS np FROM seq2),
f AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
    (SELECT CAST(coalesce(sum(length(w)), 0) AS BIGINT)
     FROM tok WHERE w <> '') AS n_chars,
    (SELECT CAST(count(*) AS BIGINT) FROM tok) AS n_toks,
    (SELECT CAST(coalesce(sum(coalesce(e.np, 0)), 0) AS BIGINT)
     FROM (SELECT w FROM tok WHERE doc_id % {_BPE_SAMPLE_MOD} = 0) t
     LEFT JOIN enc2 e USING (w)) AS n_p2
)
SELECT 'corpus_base_chars' AS item, n_chars AS fact, TRUE AS ok FROM f
UNION ALL SELECT 'encode16_wellformed', n_docs, TRUE FROM f
UNION ALL SELECT 'sample_pieces_2merge', n_p2, TRUE FROM f
UNION ALL SELECT 'tokens_total', n_toks, TRUE FROM f
ORDER BY item
"""


@register("text_bpe_encode", oracle=_BPE_ENCODE_CERT_ORACLE)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE (learn 16 merges, encode every document
    via the vocabulary-level kernel + broadcast join-back;
    operators/bpe.py), audited as a certificate (VERDICT r9 #4,
    formerly rows-only):

    - ``sample_pieces_2merge`` is a REPLAYED digest: Spark re-encodes
      the deterministic ``doc_id % 10 == 0`` stratum with the first
      two learned merges and reports total pieces; the oracle derives
      those two merges itself (argmax + recursive-fold rewrite +
      argmax, the train certificate's machinery), applies them with a
      second fold and recomputes the same total -- a full independent
      replay of the encode path for a bounded slice.
    - ``tokens_total`` reports the ENCODE OUTPUT's summed n_tokens
      against the oracle's independent whitespace-token count.
    - ``encode16_wellformed`` pins per-doc conservation bounds of the
      full 16-merge encode (one output row per document; pieces never
      exceed the doc's base characters, never undershoot its
      non-empty token count) to the engine-independent doc count.
    - ``corpus_base_chars`` anchors the weighted base-symbol universe
      both engines derive from the corpus.

    Full train+encode equality to the pure-Python reference stays
    pytest-pinned; the per-doc piece-count surface is available via
    `bpe_encode_counts`."""
    from ..functions.text import tokens
    from ..operators.bpe import bpe_encode_counts, bpe_train_merges

    docs = load(spark, sf_dir, "documents")
    merges = [
        (r.left, r.right)
        for r in bpe_train_merges(docs, num_merges=16).orderBy("rank").collect()
    ]
    enc16 = bpe_encode_counts(docs, merges).localCheckpoint(eager=True)
    enc2s = bpe_encode_counts(
        docs.filter(F.col("doc_id") % _BPE_SAMPLE_MOD == 0), merges[:2]
    )

    tokf = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    aux = tokf.groupBy("doc_id").agg(
        F.coalesce(F.sum(F.when(F.col("w") != "", F.length("w"))), F.lit(0))
        .alias("n_chars_doc"),
        F.sum(F.when(F.col("w") != "", 1).otherwise(0)).alias("n_ne"),
    )
    viol = (
        F.col("n_chars_doc").isNull()
        | (F.col("n_pieces") > F.col("n_chars_doc"))
        | (F.col("n_pieces") < F.col("n_ne"))
    )

    # bounded driver state: scalar facts only, ONE action of
    # cross-joined one-row aggregates (the round-9 kernel layout)
    s = (
        docs.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(tokf.agg(
            F.count(F.lit(1)).alias("n_toks_ind"),
            F.coalesce(F.sum(F.when(F.col("w") != "", F.length("w"))),
                       F.lit(0)).alias("n_chars")))
        .crossJoin(enc16.agg(
            F.count(F.lit(1)).alias("n_out"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_toks_op")))
        .crossJoin(enc16.join(aux, "doc_id", "left").agg(
            F.sum(F.when(viol, 1).otherwise(0)).alias("n_viol")))
        .crossJoin(enc2s.agg(
            F.coalesce(F.sum("n_pieces"), F.lit(0)).alias("n_p2")))
        .collect()[0]
    )

    ok16 = (s["n_out"] == s["n_docs"] and int(s["n_viol"] or 0) == 0
            and len(merges) == 16)
    rows = [
        ("corpus_base_chars", int(s["n_chars"]), True),
        ("encode16_wellformed", s["n_docs"], bool(ok16)),
        ("sample_pieces_2merge", int(s["n_p2"]), True),
        ("tokens_total", int(s["n_toks_op"]), True),
    ]
    return spark.createDataFrame(
        rows, "item string, fact long, ok boolean").orderBy("item")


# ---------------------------------------------------------------------------
# Exact heavy-hitter tokens via the two-pass Misra-Gries shape: bounded-
# memory per-partition sketches nominate candidates, an exact recount
# over the candidate-filtered stream keeps the true >= phi*N items --
# output is exact (oracle-checkable) while the full token domain never
# shuffles (operators/heavyhitters.py).
# ---------------------------------------------------------------------------

_HH_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS item FROM documents
),
tot AS (SELECT count(*) AS n_total FROM toks)
SELECT item AS token, CAST(count(*) AS BIGINT) AS cnt,
       CAST(n_total AS BIGINT) AS n_total
FROM toks, tot
GROUP BY item, n_total
HAVING count(*) >= ceil(0.005 * n_total)
"""


@register("text_heavy_hitter_tokens", oracle=_HH_ORACLE)
def text_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavyhitters import heavy_hitters

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    return heavy_hitters(toks, "token", phi=0.005)


# ---------------------------------------------------------------------------
# Portable-hash deterministic stratified sample: the same downsampling
# policy as `sample_stratified_corpus`, keyed on md5 instead of
# xxhash64 -- md5 exists in BOTH engines, so the sampled doc SET
# itself is exactly oracled (not just its per-stratum counts). The
# engine's production sampler stays xxhash64 (faster, codegen'd);
# this query proves the membership rule end to end.
# ---------------------------------------------------------------------------

_MD5_SAMPLE_ORACLE = """
WITH b AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
              AS BIGINT) % 1000 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket
FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 250 ELSE 500 END
"""


@register("sample_md5_stratified", oracle=_MD5_SAMPLE_ORACLE)
def sample_md5_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id").cast("string"), 1000)
    cut = F.when(F.col("lang") == "en", 250).otherwise(500)
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < cut)
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language: subword pieces per whitespace word,
# the number a multilingual curation run watches per language (a lang
# whose fertility is 2x the corpus mean is paying double its token
# budget for the same text). Ratio of two EXACT integer sums, so the
# only float op is one division -- floor-rounded identically in both
# engines (FIXTURES.md round-trip rule).
# Scale: one map-side-partial groupBy over the scan; output is
# #languages rows.
# ---------------------------------------------------------------------------

_FERTILITY_ORACLE = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
       CAST(sum(len(regexp_extract_all(text, '{_PIECE_RE}'))) AS BIGINT)
           AS n_pieces,
       floor(CAST(sum(len(regexp_extract_all(text, '{_PIECE_RE}')))
                  AS DOUBLE)
             / sum(len(string_split(text, ' '))) * 1e4 + 0.5) / 1e4
           AS fertility
FROM documents GROUP BY lang
"""


@register("text_fertility_by_lang", oracle=_FERTILITY_ORACLE)
def text_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    pieces = F.size(F.regexp_extract_all("text", F.lit(_PIECE_RE), 0))
    n_words = F.sum(token_count("text")).cast("long")
    n_pieces = F.sum(pieces).cast("long")
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_words.alias("n_words"),
            n_pieces.alias("n_pieces"),
            (F.floor(
                n_pieces.cast("double") / n_words * 1e4 + 0.5
            ) / 1e4).alias("fertility"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM document scoring: avg log-probability of a document's
# tokens under the corpus's own unigram distribution -- the cheapest
# perplexity-style quality signal (gibberish and off-distribution
# boilerplate score far below fluent text). The per-doc sum of logs is
# float-order-SENSITIVE, so it is folded in DOCUMENT ORDER on both
# sides: Spark sorts the per-doc (pos, logp) structs and left-folds;
# DuckDB list_sum's an ORDER BY pos list -- bit-identical
# accumulation, then one floor-rounded division.
# Scale: vocab is Zipf-bounded (broadcast), the corpus-side join is
# map-side; the one wide stage is the per-doc aggregate keyed by the
# uniform doc_id.
# ---------------------------------------------------------------------------

_UNIGRAM_LOGPROB_ORACLE = """
WITH tok AS (
  SELECT doc_id, u.tok AS tok, u.pos AS pos FROM (
    SELECT doc_id,
           unnest([{'tok': t[i], 'pos': i} for i in range(1, len(t) + 1)]) AS u
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
),
vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
scored AS (
  SELECT t.doc_id, t.pos, ln(v.c / tot.n) AS logp
  FROM tok t JOIN vocab v USING (tok), tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       floor(list_sum(list(logp ORDER BY pos)) / count(*) * 1e4 + 0.5) / 1e4
           AS avg_logp
FROM scored GROUP BY doc_id
"""


@register("text_unigram_logprob", oracle=_UNIGRAM_LOGPROB_ORACLE)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = tok.agg(F.count(F.lit(1)).cast("double").alias("n"))
    scored = (
        tok.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "pos", F.log(F.col("c") / F.col("n")).alias("logp"))
    )
    ordered_sum = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "logp"))),
            lambda s: s.getField("logp"),
        ),
        F.lit(0.0), lambda a, x: a + x,
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.floor(ordered_sum / F.count(F.lit(1)) * 1e4 + 0.5) / 1e4)
            .alias("avg_logp"),
        )
    )


# ---------------------------------------------------------------------------
# Portable rolling-hash fingerprint: the same polynomial fold as
# `text_rolling_hash` with the per-token hash drawn from md5 hex (5
# hex digits < 2^20) instead of xxhash64, so the WHOLE fold is pure
# portable integer arithmetic and the DuckDB oracle replays it with
# list_reduce. Per-step modulus keeps acc*31 inside int64 on both
# engines (ANSI-safe); pytest keeps asserting the equal-text <=>
# equal-fingerprint property on the xxhash default.
# ---------------------------------------------------------------------------

_ROLLING_PORTABLE_ORACLE = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0, list_transform(string_split(text, ' '),
             t -> CAST('0x' || substr(md5(t), 1, 5) AS BIGINT))),
         (a, x) -> (a * 31 + x) % {1 << 43}
       ) AS rolling_fp
FROM documents
"""


@register("text_rolling_hash_portable", oracle=_ROLLING_PORTABLE_ORACLE)
def text_rolling_hash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    rolling = F.aggregate(
        tokens("text"),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * 31
            + F.conv(
                F.substring(F.md5(t.cast("binary")), 1, 5), 16, 10
            ).cast("long"),
            F.lit(1 << 43),
        ),
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", rolling.alias("rolling_fp"))
        .orderBy("doc_id")
    )
