"""Text-analysis column expressions: tokenization, shingling, quality
scoring, language-ID heuristic, fingerprinting.

SURVEY.md §2.7 [C] ("text analysis"). All built-ins: the hot path of
a 100 TB document pipeline must stay inside codegen -- a Python UDF
here would serialize every document across the JVM/Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny embedded stopword list -- enough to demonstrate the operator;
#: a production list would be broadcast from a file.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: Deterministic per-language marker lexicons for the language-ID
#: heuristic. The fixture text is synthetic word soup, so the lexicons
#: are engine-vocabulary words; the *operator shape* (argmax of
#: marker-hit counts, 'und' on ties/zero) is the real deliverable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "fast", "slow", "small"),
    "es": ("data", "table", "filter"),
    "de": ("window", "group", "stream"),
    "fr": ("query", "merge", "sort"),
    "zh": ("spark", "row", "scan"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    return F.split(text, " ")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles (the MinHash/Jaccard unit).

    Guarded so documents shorter than n tokens yield an empty array
    instead of a descending-sequence explosion.
    """
    toks = tokens(text)
    count = F.size(toks) - (n - 1)
    return F.when(
        count >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits / F.size(toks)


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    return F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size(toks)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1]-ish quality score: long-enough docs with a
    natural stopword ratio and mid-length tokens score high.

    The formula is arbitrary but fixed -- the point is a deterministic,
    SQL-expressible quality gate (the reference's validation step for
    partner-supplied text, generalized to LLM-data curation).
    """
    n = token_count(text)
    sw = stopword_ratio(text)
    alen = avg_token_len(text)
    len_term = F.least(n.cast("double") / 50.0, F.lit(1.0))
    sw_term = 1.0 - F.abs(sw - 0.10) / 0.9
    alen_term = 1.0 - F.least(F.abs(alen - 5.0) / 5.0, F.lit(1.0))
    return 0.4 * len_term + 0.3 * sw_term + 0.3 * alen_term


def lang_id(text: Column | str) -> Column:
    """Marker-lexicon language guess: argmax of per-language hit
    counts over distinct tokens; 'und' when no marker hits.

    Ties break by language code order (deterministic in both engines
    via greatest-of-structs / max-of-rows on (hits, code))."""
    dt = distinct_tokens(text)
    scored = [
        F.struct(
            F.size(F.filter(dt, lambda t: t.isin(*words))).alias("hits"),
            # invert code ordering so ties pick the alphabetically
            # FIRST code under greatest(): greatest on struct compares
            # fields in order, so embed a descending key.
            F.lit(code).alias("code"),
        )
        for code, words in sorted(LANG_MARKERS.items(), reverse=True)
    ]
    best = scored[0]
    for s in scored[1:]:
        best = F.when(
            (s["hits"] > best["hits"])
            | ((s["hits"] == best["hits"]) & (s["code"] < best["code"])),
            s,
        ).otherwise(best)
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for exact-dup detection: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def md5_bucket(col: Column, n) -> Column:
    """Engine-portable hash bucket in [0, n): the first 6 hex chars of
    md5(col) as an integer, mod n. THE single Spark-side source of the
    bucket arithmetic whose SQL twin appears in the oracles -- the
    leakage-safe split, training mix, corpus export, quality-resample
    coin, CDC boundary, portable sampling, and classifier weights all
    share it, so the buckets cannot drift between those surfaces.
    ``n`` may be an int or a Column."""
    return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long") % n


def fingerprint(text: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint (hex md5 of the
    normalized text) -- identical in Spark and DuckDB."""
    return F.md5(normalize_text(text).cast("binary"))
