"""Training-data curation surface over ``documents``.

The operators a pre-training data pipeline runs AFTER dedup/quality
scoring and BEFORE the tokenizer: packing documents into fixed token
budgets, decontaminating against held-out benchmarks, Gopher-style
repetition filtering, PII redaction, and domain-mix resampling.
SURVEY.md §2.7 [C] ("LLM-data-pipeline operators"), reference scope:
the diagram's opaque "Python program" validation step
(`Untitled Diagram.drawio:153-154`) generalized to corpus curation.

Every query here is JVM-side built-ins only (no Python UDFs) with an
exact DuckDB oracle; scale notes per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import md5_bucket, shingles, token_count, tokens
from .dedup import NEARDUP_COMPONENTS_CTE
from . import register

#: Leakage-safe split rule constants: md5(component) into 10 buckets,
#: buckets 0-7 train, 8 validation, 9 test (80/10/10).
SPLIT_N_BUCKETS = 10
SPLIT_TRAIN_LT = 8
SPLIT_VAL_EQ = 8


def split_label(component_col) -> "F.Column":
    """train/validation/test from a near-dup component id -- THE split
    rule, in exactly one place: the split query, the training-mix
    report, the corpus export and the contamination audit all call
    this, so a future re-balance (e.g. 90/5/5) can never change the
    shipped split while the audit silently keeps certifying the old
    one."""
    b = md5_bucket(component_col.cast("string"), SPLIT_N_BUCKETS)
    return (
        F.when(b < SPLIT_TRAIN_LT, "train")
        .when(b == SPLIT_VAL_EQ, "validation")
        .otherwise("test")
    )


# ---------------------------------------------------------------------------
# Sequence packing: assign docs to fixed-token-budget packs.
# ---------------------------------------------------------------------------

#: Tokens per training sequence pack. Small enough that sf0.001's
#: ~1.5k tokens/source still yields multiple packs per source.
PACK_BUDGET = 512

#: doc_id block size for the packing windows' sub-shards. Small here
#: so every fixture SF exercises multiple shards per source;
#: production sizes it so a shard holds ~10^5-10^6 rows (keeping each
#: local sort bounded AND the per-source offset table thousands of
#: rows, not millions).
PACK_SHARD_BLOCK = 128


def _sharded_prev_cum(df: DataFrame, value_col: str,
                      order_cols: list[str]) -> DataFrame:
    """Exclusive running sum of ``value_col`` over (source) in
    ``order_cols`` order, WITHOUT a one-task-per-source window.

    Same two-pass distributed-rank shape as
    ``quality_score_calibration``: rows sub-shard on
    floor(doc_id / PACK_SHARD_BLOCK) (deterministic and monotone in
    the doc_id-major sort order, so shard-local order is global
    order); pass 1 is a per-(source, shard) local cumsum -- parallel,
    each sort bounded by a shard's rows; pass 2 broadcasts the
    per-shard totals' exclusive prefix (a #shards-row table) and adds
    the shard's starting offset back. A giant source therefore packs
    across many tasks instead of serializing through one.

    ``order_cols`` must be doc_id-major (doc_id itself or
    (doc_id, ...)): the shard id derives from doc_id alone.
    """
    local_w = (
        W.partitionBy("source", "__shard").orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sharded = df.withColumn(
        "__shard", F.floor(F.col("doc_id") / PACK_SHARD_BLOCK)
    )
    local = sharded.withColumn("__lcum", F.sum(value_col).over(local_w))
    # Totals branch reads the PRE-window frame: a map-side partial agg
    # whose shuffle carries one row per (source, shard) -- the second
    # pass of the classic two-pass prefix sum (scan twice, never sort
    # globally). The shard-offset prefix itself runs DISTRIBUTED
    # (round 5): at 128 docs/shard a 1e11-doc source has ~1e9 shard
    # rows, so a per-source offsets window would just recreate the
    # funnel one level up. distributed_prefix_sums gives the global
    # inclusive cumsum over (source, shard); the per-source exclusive
    # offset is that minus the shard's own total minus the source's
    # base -- and the base is min(cum - stot) per source (the value at
    # each source's first shard), one bounded broadcast aggregate.
    from ..operators.ranking import distributed_prefix_sums

    totals = sharded.groupBy("source", "__shard").agg(
        F.sum(value_col).cast("long").alias("__stot")
    )
    cum = distributed_prefix_sums(
        totals, ["source", "__shard"], {"__gcum": "__stot"})
    prev = (F.col("__gcum") - F.col("__stot")).cast("long")
    base = cum.groupBy("source").agg(
        F.min(prev).cast("long").alias("__base"))
    offsets = (
        cum.join(F.broadcast(base), "source")
        .select("source", "__shard",
                (prev - F.col("__base")).cast("long").alias("__off"))
    )
    return (
        local.join(F.broadcast(offsets), ["source", "__shard"])
        .withColumn(
            "prev_cum",
            F.col("__off") + F.col("__lcum") - F.col(value_col),
        )
        .drop("__shard", "__lcum", "__off")
    )

_PACKING_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) - n_tokens AS prev_cum
  FROM t
)
SELECT source,
       CAST(floor(prev_cum / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
       count(*)                                          AS n_docs,
       CAST(sum(n_tokens) AS BIGINT)                     AS pack_tokens
FROM c
GROUP BY source, pack_id
"""


@register("curation_sequence_packing", oracle=_PACKING_ORACLE)
def curation_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous token-budget packing: within each source (ordered by
    doc_id), a doc joins the pack its starting token offset falls in
    -- pack_id = floor(preceding-token-count / budget). Deterministic,
    order-stable, and expressible as one window + one agg in any
    engine (the oracle is the identical cumsum).

    Scale: the running sum is computed by `_sharded_prev_cum` -- a
    per-(source, doc_id-block) local window plus a broadcast
    shard-offset table -- so a single giant source packs across many
    tasks instead of serializing through one window task. Identical
    output to the naive per-source window (the oracle is exactly
    that), proven by the oracle and the plan-shape test.
    """
    sized = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", token_count("text").alias("n_tokens"))
    )
    return (
        _sharded_prev_cum(sized, "n_tokens", ["doc_id"])
        .withColumn(
            "pack_id",
            F.floor(F.col("prev_cum") / F.lit(float(PACK_BUDGET)))
            .cast("long"),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: n-gram overlap against a held-out set.
# ---------------------------------------------------------------------------

_DECON_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in range(1, len(t) - 1)])) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
bench AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 11 = 0)
SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM sh JOIN bench USING (gram)
WHERE sh.doc_id % 11 <> 0
GROUP BY sh.doc_id
"""


@register("curation_decontaminate", oracle=_DECON_ORACLE)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing word n-grams with a benchmark set
    (here: every 11th doc stands in for the held-out benchmark; real
    pipelines pass the eval-set table). Returns (doc_id, n_hits) for
    contaminated docs only -- the removal list.

    Scale: the benchmark's distinct-gram set is small (eval sets are
    MBs even when the corpus is 100 TB), so the overlap test is a
    BROADCAST semi-style join against the corpus gram stream -- the
    corpus is never shuffled; the only wide stage is the per-doc hit
    count, keyed by doc_id (uniform). The real-world n is 8-13-gram;
    the fixture vocabulary is ~30 words, so n=3 keeps the oracle's
    collision rate meaningful at every SF.
    """
    sh = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(shingles("text", 3)).alias("gram"))
    )
    bench = (
        sh.filter(F.col("doc_id") % 11 == 0).select("gram").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % 11 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# Repetition stats (Gopher-style duplicate-ngram gate).
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH g AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+1], ' ')
                 for i in range(1, len(t))]) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 2
),
c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) / sum(cnt), 6)
           AS dup_fraction,
       sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) / sum(cnt) > 0.3
           AS flagged
FROM c
GROUP BY doc_id
"""


@register("curation_repetition_stats", oracle=_REPETITION_ORACLE)
def curation_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram fraction per doc (the Gopher repetition
    family's "fraction of tokens in repeated n-grams" signal): share
    of bigram OCCURRENCES whose bigram appears more than once in the
    doc, with a >0.3 removal flag.

    Scale: explode -> two-level agg keyed by (doc_id, gram) then
    doc_id -- both uniform keys, map-side partial aggs apply. The
    per-doc alternative (count duplicates inside one higher-order
    lambda) would be shuffle-free but O(len^2) per doc; the relational
    shape stays linear for book-length docs.
    """
    toks = tokens("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    per_gram = (
        load(spark, sf_dir, "documents")
        .filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dup = F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
    total = F.sum("cnt")
    return per_gram.groupBy("doc_id").agg(
        total.cast("long").alias("n_bigrams"),
        F.round(dup / total, 6).alias("dup_fraction"),
        (dup / total > 0.3).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# PII redaction: regex scrub with audit counts.
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"
_IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@example.com from 10.0.' || (doc_id % 256) || '.7' AS t
  FROM documents
),
red AS (
  SELECT doc_id, t,
         regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_IP_RE}', '<IP>', 'g') AS clean
  FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(regexp_replace(t, '{_EMAIL_RE}',
                                                  '<EMAIL>', 'g'),
                                   '{_IP_RE}')) AS BIGINT)       AS n_ips,
       CAST(length(clean) AS BIGINT)                             AS clean_len,
       md5(clean)                                                AS clean_fp
FROM red
"""


@register("curation_pii_redaction", oracle=_PII_ORACLE)
def curation_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub (emails, then IPv4s in the email-free text)
    with per-doc audit counts and an md5 fingerprint of the clean
    text. The fixture corpus carries no PII, so each doc gets a
    deterministic synthetic email + IP appended first -- the counts
    then discriminate (>= 1 each) and the redaction is observable.

    Scale: pure map-only narrow plan -- regexes run inside codegen at
    scan speed, no shuffle anywhere. The regex set is the operator's
    config surface; both patterns stay in the RE2-compatible subset so
    the same strings drive Spark (Java regex) and DuckDB (RE2).
    """
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
    )
    no_email = F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(no_email, _IP_RE, "<IP>")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(_IP_RE), 0))
        .cast("long").alias("n_ips"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_fp"),
    )


# ---------------------------------------------------------------------------
# Domain-mix resampling toward a uniform per-source token share.
# ---------------------------------------------------------------------------

_MIX_ORACLE = """
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
s AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens,
         count(*) AS n_docs
  FROM t GROUP BY source
),
r AS (
  SELECT source, src_tokens,
         least(1.0, (sum(src_tokens) OVER () /
                     (count(*) OVER ())) / src_tokens) AS rate
  FROM s
),
kept AS (
  SELECT t.source, t.n_tokens
  FROM t JOIN r USING (source)
  WHERE (((t.doc_id % 1000003) * 2654435761) % 4096) / 4096.0 < r.rate
)
SELECT r.source, r.src_tokens, round(r.rate, 6) AS rate,
       CAST(count(kept.n_tokens) AS BIGINT) AS kept_docs,
       CAST(coalesce(sum(kept.n_tokens), 0) AS BIGINT) AS kept_tokens
FROM r LEFT JOIN kept ON r.source = kept.source
GROUP BY r.source, r.src_tokens, r.rate
"""


@register("curation_domain_mix", oracle=_MIX_ORACLE)
def curation_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sample over-represented domains toward a uniform per-source
    token budget: rate_s = min(1, mean_source_tokens / source_tokens),
    membership decided by a deterministic multiplicative hash of
    doc_id (portable to any engine -- the oracle runs the identical
    arithmetic, unlike xxhash64). Returns the per-source audit:
    (source, src_tokens, rate, kept_docs, kept_tokens).

    Scale: pass 1 is a tiny per-source token agg (rows = #domains);
    the global mean comes from a broadcast cross-join with the 1-row
    total of THAT aggregate -- never an unpartitioned window, never
    the corpus. Pass 2 broadcasts the rate table back and filters at
    scan speed -- the corpus itself is shuffled only for the final
    per-source audit agg (in production the filter feeds the writer
    directly and even that shuffle disappears).
    """
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", token_count("text").alias("n_tokens"))
    )
    per_src = docs.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("src_tokens")
    )
    totals = per_src.agg(
        F.sum("src_tokens").alias("__tot"),
        F.count(F.lit(1)).alias("__n"),
    )
    rates = per_src.crossJoin(F.broadcast(totals)).select(
        "source", "src_tokens",
        F.least(
            F.lit(1.0),
            (F.col("__tot") / F.col("__n")) / F.col("src_tokens"),
        ).alias("rate"),
    )
    kept = (
        docs.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(
            # pre-reduce mod a prime so the multiply stays inside
            # int64 at ANY doc_id (DuckDB errors and Spark wraps past
            # 2^63; either way the "identical arithmetic" guarantee
            # would break exactly when the corpus gets large)
            (((F.col("doc_id") % 1000003) * 2654435761) % 4096) / 4096.0
            < F.col("rate")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_docs"),
            F.sum("n_tokens").cast("long").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source", "src_tokens", F.round("rate", 6).alias("rate"),
            F.coalesce("kept_docs", F.lit(0)).cast("long")
            .alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long")
            .alias("kept_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Exact span-level duplication: fixed-length token windows shared
# verbatim across documents (the fixed-window approximation of
# suffix-array substring dedup -- flags boilerplate spans that
# document-level near-dup misses).
# ---------------------------------------------------------------------------

#: Tokens per span window (stride 1).
SPAN_LEN = 10

_SPAN_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+{SPAN_LEN - 1}], ' ')
                 for i in range(1, len(t) - {SPAN_LEN - 2})]) AS span
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= {SPAN_LEN}
),
flagged AS (
  SELECT doc_id,
         CASE WHEN min(doc_id) OVER (PARTITION BY span)
                <> max(doc_id) OVER (PARTITION BY span)
              THEN 1 ELSE 0 END AS is_shared
  FROM w
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(is_shared) AS BIGINT) AS n_shared,
       round(sum(is_shared) / count(*), 6) AS shared_fraction
FROM flagged
GROUP BY doc_id
"""


@register("curation_span_dedup", oracle=_SPAN_ORACLE)
def curation_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of {SPAN_LEN}-token windows (stride 1) that
    appear verbatim in at least one OTHER document. High fractions
    mark boilerplate/templated docs for span-level scrubbing.

    Scale: one explode + TWO shuffles total -- "shared" is decided
    inside a window over the span partition (min(doc_id) != max(doc_id)
    across the span's rows means another doc has it), so there is no
    span-count aggregate and no join back. Skewed hot spans land in
    one window partition each; at real corpus scale the span string
    would be replaced by its 128-bit hash to narrow the shuffle --
    spelled here so the DuckDB oracle matches bytes.
    """
    from pyspark.sql import Window

    toks = tokens("text")
    spans = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (SPAN_LEN - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, SPAN_LEN)),
    )
    w = (
        load(spark, sf_dir, "documents")
        .filter(F.size(toks) >= SPAN_LEN)
        .select("doc_id", F.explode(spans).alias("span"))
    )
    sw = Window.partitionBy("span")
    flagged = w.withColumn(
        "is_shared",
        (F.min("doc_id").over(sw) != F.max("doc_id").over(sw)).cast("int"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum("is_shared").cast("long").alias("n_shared"),
        )
        .withColumn(
            "shared_fraction",
            F.round(F.col("n_shared") / F.col("n_windows"), 6),
        )
    )


# ---------------------------------------------------------------------------
# Context-window chunking: split each document into overlapping
# fixed-token windows -- the step that turns curated documents into
# trainer-shaped sequences (and the retrieval-index unit for RAG).
# ---------------------------------------------------------------------------

#: Window/stride in whitespace tokens. 64/48 = 25% overlap, small
#: enough that every fixture doc still yields a few chunks.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
c AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(
             0, CAST(ceil(greatest(0, n - {CHUNK_TOKENS})
                          / {CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_id
  FROM t
)
SELECT doc_id, chunk_id,
       CAST(least({CHUNK_TOKENS}, n - chunk_id * {CHUNK_STRIDE}) AS BIGINT)
           AS chunk_tokens,
       md5(array_to_string(
           toks[chunk_id * {CHUNK_STRIDE} + 1 :
                least(n, chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS})], ' '))
           AS chunk_hash
FROM c
"""


def _chunk_table(spark: SparkSession, sf_dir: str,
                 extra_cols: list[str]) -> DataFrame:
    """THE chunk fan-out both chunk queries share: one row per
    (doc, sliding window), with chunk_id/chunk_tokens plus the doc's
    token array (`toks`, for hashing) and any ``extra_cols`` carried
    through. Chunk i covers tokens [i*stride, i*stride + window); the
    last window starts at the final stride boundary that still has
    unseen tokens, so every token lands in >= 1 chunk and short docs
    yield exactly one. Keeping the boundary arithmetic in one place
    guarantees `curation_chunk_windows` and `curation_chunk_packing`
    can never disagree about what a chunk is."""
    toks = tokens("text")
    n = F.size(toks)
    i_max = F.ceil(
        F.greatest(F.lit(0), n - F.lit(CHUNK_TOKENS))
        / F.lit(float(CHUNK_STRIDE))
    ).cast("int")
    start = F.col("chunk_id").cast("long") * CHUNK_STRIDE
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", *extra_cols,
            toks.alias("toks"), n.alias("n"),
            F.explode(F.sequence(F.lit(0), i_max)).alias("chunk_id"),
        )
        .select(
            "doc_id", *extra_cols, "toks",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            start.alias("__start"),
            F.least(F.lit(CHUNK_TOKENS), F.col("n") - start).cast("long")
            .alias("chunk_tokens"),
        )
    )


@register("curation_chunk_windows", oracle=_CHUNK_ORACLE)
def curation_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunks per document (shared fan-out:
    `_chunk_table`).

    The output carries (chunk_tokens, md5(chunk_text)) rather than the
    chunk text itself -- the hash pins the exact chunk content for the
    oracle without hauling long strings through the comparison.

    Scale: map-only (tokenize + sequence + posexplode inside codegen);
    fan-out is ~n_tokens/stride rows per doc with no shuffle at all --
    the one plan shape that is trivially 100 TB-safe. Downstream
    packing/shuffling operates on the chunk rows, which are narrow.
    """
    return _chunk_table(spark, sf_dir, []).select(
        "doc_id", "chunk_id", "chunk_tokens",
        F.md5(
            F.concat_ws(
                " ",
                F.slice(F.col("toks"), F.col("__start").cast("int") + 1,
                        F.lit(CHUNK_TOKENS)),
            )
        ).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# Chunk-level sequence packing: the two steps a trainer pipeline
# actually chains -- split documents into token windows, then pack the
# CHUNKS (not the raw docs) into fixed budgets, so no pack ever holds
# a fragment longer than the window.
# ---------------------------------------------------------------------------

_CHUNK_PACKING_ORACLE = f"""
WITH t AS (
  SELECT d.doc_id, d.source, string_split(d.text, ' ') AS toks,
         len(string_split(d.text, ' ')) AS n
  FROM documents d
),
chunks AS (
  SELECT doc_id, source,
         unnest(generate_series(
             0, CAST(ceil(greatest(0, n - {CHUNK_TOKENS})
                          / {CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_id,
         n
  FROM t
),
sized AS (
  SELECT doc_id, source, chunk_id,
         least({CHUNK_TOKENS}, n - chunk_id * {CHUNK_STRIDE}) AS chunk_tokens
  FROM chunks
),
cum AS (
  SELECT source, doc_id, chunk_id, chunk_tokens,
         sum(chunk_tokens) OVER (PARTITION BY source
                                 ORDER BY doc_id, chunk_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW)
             - chunk_tokens AS prev_cum
  FROM sized
)
SELECT source,
       CAST(floor(prev_cum / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
       count(*)                                          AS n_chunks,
       CAST(sum(chunk_tokens) AS BIGINT)                 AS pack_tokens
FROM cum
GROUP BY source, pack_id
"""


@register("curation_chunk_packing", oracle=_CHUNK_PACKING_ORACLE)
def curation_chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack overlapping context-window chunks into fixed token
    budgets: chunk fan-out (map-only, `curation_chunk_windows`'
    shape) feeds the per-source cumulative-sum pack assignment
    (`curation_sequence_packing`'s shape). Composing the two is the
    actual trainer data path; like the sequence packer, the cumsum
    runs through `_sharded_prev_cum`'s sub-sharded windows, so one
    giant source never serializes into a single task."""
    chunks = _chunk_table(spark, sf_dir, ["source"]).select(
        "doc_id", "source", "chunk_id", "chunk_tokens"
    )
    return (
        _sharded_prev_cum(chunks, "chunk_tokens", ["doc_id", "chunk_id"])
        .withColumn(
            "pack_id",
            F.floor(F.col("prev_cum") / F.lit(float(PACK_BUDGET)))
            .cast("long"),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_tokens").cast("long").alias("pack_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/validation/test split: the split key is the
# NEAR-DUP CLUSTER's canonical id, not the document id -- two
# near-duplicate documents can never land on opposite sides of the
# train/eval boundary (the contamination path a doc-keyed random
# split leaves wide open). Deterministic md5 bucketing (80/10/10)
# makes the split reproducible on any cluster shape and exactly
# oracle-checkable; the DuckDB oracle recomputes the clusters with a
# recursive CTE and the same bucket arithmetic.
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = "WITH RECURSIVE " + NEARDUP_COMPONENTS_CTE + """,
assigned AS (
  SELECT d.doc_id,
         coalesce(c.component_id, d.doc_id) AS component,
         CAST('0x' || substr(md5(CAST(coalesce(c.component_id, d.doc_id)
                                      AS VARCHAR)), 1, 6) AS BIGINT) % 10
             AS bucket
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT doc_id, component,
       CASE WHEN bucket < 8 THEN 'train'
            WHEN bucket = 8 THEN 'validation'
            ELSE 'test' END AS split
FROM assigned
"""


@register("curation_leakage_safe_split", oracle=_SPLIT_ORACLE)
def curation_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components
    from ..operators.dedup import prefix_filter_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.6)
    cc = connected_components(pairs, "id_a", "id_b")
    comp = (
        docs.select("doc_id")
        .join(cc, docs.doc_id == cc.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    return comp.select(
        "doc_id", "component",
        split_label(F.col("component")).alias("split"),
    )


# ---------------------------------------------------------------------------
# The training-mix report: the corpus a run would actually train on
# (near-dup clusters collapsed to canonicals) crossed with the
# leakage-safe split, rolled up to per-(lang, split) doc/token/char
# budgets -- the one-page answer to "what are we training on?".
# Composes the shared cluster CTE, the md5 split arithmetic, and
# whitespace token counts; everything exact, everything oracled.
# ---------------------------------------------------------------------------

_MIX_ORACLE = "WITH RECURSIVE " + NEARDUP_COMPONENTS_CTE + """,
assigned AS (
  SELECT d.doc_id, d.lang, d.text, d.n_chars,
         coalesce(c.component_id, d.doc_id) AS component,
         CAST('0x' || substr(md5(CAST(coalesce(c.component_id, d.doc_id)
                                      AS VARCHAR)), 1, 6) AS BIGINT) % 10
             AS bucket
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT lang,
       CASE WHEN bucket < 8 THEN 'train'
            WHEN bucket = 8 THEN 'validation'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM assigned
WHERE doc_id = component
GROUP BY 1, 2
"""


@register("curation_training_mix", oracle=_MIX_ORACLE)
def curation_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from ..operators.components import connected_components
    from ..operators.dedup import prefix_filter_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.6)
    cc = connected_components(pairs, "id_a", "id_b")
    assigned = (
        docs.join(cc, docs.doc_id == cc.node, "left")
        .select(
            "doc_id", "lang", "text", "n_chars",
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    return (
        assigned.filter(F.col("doc_id") == F.col("component"))
        .select(
            "lang", "n_chars",
            F.size(tokens("text")).alias("__nt"),
            split_label(F.col("component")).alias("split"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__nt").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC): chunk boundaries from token CONTENT,
# not fixed offsets. Fixed-size chunking breaks dedup the moment one
# token is inserted upstream -- every later chunk shifts. CDC hashes a
# ROLLING 2-token window and places a boundary wherever the hash
# % DIVISOR == 0, so an edit only redraws the chunks touching it and
# every other chunk keeps its identity (the rsync/LBFS trick,
# standard in dedup storage and useful for chunk-level corpus dedup).
# The window is 2 tokens (not 1) so the rule stays non-degenerate on
# tiny vocabularies: the fixture corpus has ~31 distinct tokens --
# none of which happens to hash to a boundary -- but ~1000 distinct
# bigrams.
#
# Scale shape: posexplode -> boundary flag -> running sum within the
# doc -> group back. The window partitions by doc_id (bounded by doc
# length, never corpus length); the re-group shuffles (doc_id,
# chunk_id) pairs. The hash is md5-derived so the boundary rule is
# engine-portable and the chunk SET itself is exactly oracled.
# ---------------------------------------------------------------------------

_CDC_DIVISOR = 16

#: Shared CTE chain producing the CDC chunk table (doc_id, chunk_id,
#: n_tokens, chunk_fp) -- the single SQL source for every oracle that
#: consumes CDC chunks, so the boundary rule cannot fork between them.
_CDC_CTES = f"""
tok AS (
  SELECT doc_id, u.tok AS tok, u.pos AS pos, u.win AS win FROM (
    SELECT doc_id,
           unnest([{{'tok': t[i], 'pos': i,
                     'win': CASE WHEN i >= 2
                                 THEN t[i-1] || ' ' || t[i] END}}
                   for i in range(1, len(t) + 1)]) AS u
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  )
),
flagged AS (
  SELECT doc_id, tok, pos,
         CASE WHEN win IS NOT NULL
                   AND CAST('0x' || substr(md5(win), 1, 6) AS BIGINT)
                       % {_CDC_DIVISOR} = 0
              THEN 1 ELSE 0 END AS boundary
  FROM tok
),
chunked AS (
  SELECT doc_id, tok, pos,
         sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS chunk_id
  FROM flagged
),
chunks AS (
  SELECT doc_id,
         CAST(coalesce(chunk_id, 0) AS BIGINT) AS chunk_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
  FROM chunked
  GROUP BY doc_id, coalesce(chunk_id, 0)
)"""

_CDC_ORACLE = f"""
WITH {_CDC_CTES}
SELECT doc_id, chunk_id, n_tokens, chunk_fp FROM chunks
"""


@register("curation_cdc_chunks", oracle=_CDC_ORACLE)
def curation_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    boundary = (
        F.col("win").isNotNull()
        & (md5_bucket(F.col("win"), _CDC_DIVISOR) == 0)
    ).cast("int")
    w = (
        W.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    toks = (
        docs.select("doc_id", tokens("text").alias("t"))
        .select("doc_id", "t", F.posexplode("t").alias("pos", "tok"))
        # rolling 2-token window: previous token || current (pos is
        # 0-based, element_at is 1-based, so element_at(t, pos) IS the
        # previous token); null on the first token of a doc.
        .withColumn(
            "win",
            F.when(
                F.col("pos") > 0,
                F.concat_ws(" ", F.element_at("t", F.col("pos")), F.col("tok")),
            ),
        )
        .drop("t")
    )
    chunked = toks.withColumn(
        "chunk_id",
        F.coalesce(F.sum(boundary).over(w), F.lit(0)).cast("long"),
    )
    return (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.md5(F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("pos", "tok")))
                .getField("tok")
            )).alias("chunk_fp"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-proportional resampling: the downstream consumer of the
# hashed-classifier gate (queries/mlprep.text_classifier_score).
# Instead of a hard keep/drop at 0.5, each doc survives with
# probability proportional to its classifier score -- the standard
# soft-filter that preserves distributional coverage while tilting
# the mix toward quality. Deterministic: the coin is the portable
# md5 hash of doc_id, so membership is exactly oracled and re-runs
# reproduce the same corpus (modulo the transcendental-boundary
# caveat on mlprep.classifier_score: a coin landing within ~1 ulp of
# score*1e6 could flip between engines, P ~ 1e-10/doc). Map-only end
# to end: score and coin both compute inside the scan, zero shuffles.
# ---------------------------------------------------------------------------


def _qresample_oracle() -> str:
    from .mlprep import classifier_score_sql

    score = classifier_score_sql("string_split(text, ' ')")
    return f"""
WITH s AS (
  SELECT doc_id, lang, source, {score} AS score,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
             % 1000000 AS coin
  FROM documents
)
SELECT doc_id, lang, source, round(score, 6) AS score
FROM s WHERE coin < score * 1000000
"""


@register("curation_quality_resample", oracle=_qresample_oracle())
def curation_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .mlprep import classifier_score

    score = classifier_score("text")
    coin = md5_bucket(F.col("doc_id").cast("string"), 1000000)
    return (
        load(spark, sf_dir, "documents")
        .withColumn("__score", score)
        .filter(coin < F.col("__score") * 1000000)
        .select("doc_id", "lang", "source",
                F.round("__score", 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# Chunk-level dedup stats over the CDC chunks: because boundaries are
# content-defined, a boilerplate passage repeated across documents
# lands in chunks with IDENTICAL fingerprints no matter where it sits
# in each document -- so a plain fingerprint groupBy surfaces
# cross-document repetition that doc-level dedup (different docs) and
# fixed-offset chunking (shifted copies) both miss. Output: every
# chunk fingerprint shared by >= 2 documents, with its spread.
# Scale shape: the CDC fan-out plus ONE (fp) aggregation -- no pair
# join at all; cost is linear in corpus tokens.
# ---------------------------------------------------------------------------

_CHUNK_DEDUP_ORACLE = f"""
WITH {_CDC_CTES}
SELECT chunk_fp,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS n_tokens
FROM chunks
GROUP BY chunk_fp
HAVING count(DISTINCT doc_id) >= 2
"""


@register("curation_chunk_dedup_stats", oracle=_CHUNK_DEDUP_ORACLE)
def curation_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = curation_cdc_chunks(spark, sf_dir)
    return (
        chunks.groupBy("chunk_fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("n_tokens").alias("n_tokens"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# End-to-end corpus EXPORT: the capstone materialization. The
# training corpus (near-dup clusters collapsed to canonicals, each
# doc carrying its leakage-safe split) is WRITTEN to a versioned
# table -- atomic publish, so a consumer never sees a half-written
# corpus -- and the returned manifest is computed from the READBACK
# of that table, not from the in-flight DataFrame. Passing the exact
# oracle therefore proves the whole chain: dedup -> split -> publish
# -> read round-trips every row. (The manifest equals
# curation_training_mix by construction -- same corpus -- which is
# the point: the materialized artifact matches the declarative
# answer.)
# ---------------------------------------------------------------------------


@register("curation_export_corpus", oracle=_MIX_ORACLE)
def curation_export_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import scratch_dir
    from ..operators.components import connected_components
    from ..operators.dedup import prefix_filter_jaccard_pairs
    from ..sinks.versioned import VersionedTable

    docs = load(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.6)
    cc = connected_components(pairs, "id_a", "id_b")
    assigned = (
        docs.join(cc, docs.doc_id == cc.node, "left")
        .select(
            "doc_id", "lang", "text", "n_chars",
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    corpus = (
        assigned.filter(F.col("doc_id") == F.col("component"))
        .select(
            "doc_id", "lang", "text", "n_chars",
            split_label(F.col("component")).alias("split"),
        )
        # cluster output files by split so a train-only consumer
        # reads a contiguous file subset
        .repartition("split")
    )
    vt = VersionedTable(spark, scratch_dir("corpus_export", sf_dir))
    vt.publish(corpus)
    return (
        vt.read()
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Packing budgeted by the SUBWORD-piece estimate instead of whitespace
# tokens: whitespace counts under-budget a trainer whose tokenizer
# splits words into pieces, so real packing jobs budget on the
# tokenizer's own unit. Same per-source cumsum shape as
# curation_sequence_packing, with the piece count (the map-only
# regex estimator from text_bpe_token_estimate) as the weight.
# ---------------------------------------------------------------------------

_BPE_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '[aeiou]+|[^aeiou ]+')) AS n_pieces
  FROM documents
),
c AS (
  SELECT doc_id, source, n_pieces,
         sum(n_pieces) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) - n_pieces AS prev_cum
  FROM t
)
SELECT source,
       CAST(floor(prev_cum / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
       count(*)                                          AS n_docs,
       CAST(sum(n_pieces) AS BIGINT)                     AS pack_pieces
FROM c
GROUP BY source, pack_id
"""


@register("curation_packing_bpe_budget", oracle=_BPE_PACK_ORACLE)
def curation_packing_bpe_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _PIECE_RE

    pieces = F.size(
        F.regexp_extract_all("text", F.lit(_PIECE_RE), 0)
    )
    sized = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", pieces.alias("n_pieces"))
    )
    return (
        _sharded_prev_cum(sized, "n_pieces", ["doc_id"])
        .withColumn(
            "pack_id",
            F.floor(F.col("prev_cum") / F.lit(float(PACK_BUDGET))).cast("long"),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pieces").cast("long").alias("pack_pieces"),
        )
    )


# ---------------------------------------------------------------------------
# Split-contamination audit: the leakage-safe split's core promise --
# near-duplicate documents never straddle the train/eval boundary --
# turned into a driver-checkable query. Every near-dup pair (the same
# PPJoin >= 0.6 pairs the split is keyed on) is labeled with its two
# sides' splits and counted per (split_a, split_b) cell; the cluster
# keying makes every off-diagonal cell empty BY CONSTRUCTION, and the
# oracle recomputes the matrix independently (recursive-CTE clusters +
# the same md5 bucket arithmetic), so a hash pass proves the invariant
# rather than assuming it. Scale: the pair table and split table are
# both outputs of stages the pipeline already runs; the audit itself
# is one broadcast-joined relabel + a #splits^2-row aggregate.
# ---------------------------------------------------------------------------


def _split_audit_oracle() -> str:
    from .dedup import NEARDUP_COMPONENTS_CTE

    return "WITH RECURSIVE " + NEARDUP_COMPONENTS_CTE + """,
assigned AS (
  SELECT d.doc_id,
         CAST('0x' || substr(md5(CAST(coalesce(c.component_id, d.doc_id)
                                      AS VARCHAR)), 1, 6) AS BIGINT) % 10
             AS bucket
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
split AS (
  SELECT doc_id,
         CASE WHEN bucket < 8 THEN 'train'
              WHEN bucket = 8 THEN 'validation'
              ELSE 'test' END AS split
  FROM assigned
)
SELECT sa.split AS split_a, sb.split AS split_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs p
JOIN split sa ON sa.doc_id = p.id_a
JOIN split sb ON sb.doc_id = p.id_b
GROUP BY sa.split, sb.split
"""


@register("curation_split_contamination_audit",
          oracle=_split_audit_oracle())
def curation_split_contamination_audit(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components
    from ..operators.dedup import prefix_filter_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    # prefix_filter_jaccard_pairs already returns an eagerly
    # checkpointed pair table, so both consumers below (component
    # build + audit join) read the one materialization
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.6)
    cc = connected_components(pairs, "id_a", "id_b")
    split = (
        docs.select("doc_id")
        .join(cc, docs.doc_id == cc.node, "left")
        .select(
            "doc_id",
            split_label(
                F.coalesce(F.col("component"), F.col("doc_id"))
            ).alias("split"),
        )
    )
    sa = split.select(F.col("doc_id").alias("id_a"),
                      F.col("split").alias("split_a"))
    sb = split.select(F.col("doc_id").alias("id_b"),
                      F.col("split").alias("split_b"))
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
