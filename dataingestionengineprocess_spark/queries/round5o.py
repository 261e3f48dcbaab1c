"""Round-4 (continued) addition: the code-vs-prose screen.

`text_code_screen` -- the pretraining-mix classifier every corpus
router needs: per document, exact integer counts of code-signal
characters (braces/brackets, semicolons, equals, underscores), the
symbol share of all characters, the share of lines that start with
whitespace (indent regularity), and a deterministic is_code flag
(symbol share >= 2% AND >= 2 brace/bracket characters, OR >= 20%
indented lines). Everything is regexp_count-style exact counting --
one map-only pass, no UDF -- with a per-(lang, source) rollup so the
routing table is bounded. The flag thresholds are integer
cross-multiplications, so the verdict itself is hash-checked.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[C] text-analysis / curation mandate (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from . import register

# code-signal characters; the class stays inside ASCII so both
# engines' regex engines agree byte-for-byte
_SYM_RE = r"[{}\[\]();=_<>]"
_BRACE_RE = r"[{}\[\]]"

def _code_oracle() -> str:
    # counts via length-difference (portable across engines; DuckDB's
    # regexp_extract_all lengths would work too, this is simpler)
    sym = ("length(text) - length(regexp_replace(text,"
           " '[{}\\[\\]();=_<>]', '', 'g'))")
    brace = ("length(text) - length(regexp_replace(text,"
             " '[{}\\[\\]]', '', 'g'))")
    lines = "len(string_split(text, chr(10)))"
    indented = ("len(list_filter(string_split(text, chr(10)),"
                " l -> l LIKE ' %' OR l LIKE chr(9) || '%'))")
    return f"""
WITH d AS (
  SELECT doc_id, lang, source,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST({sym} AS BIGINT) AS n_sym,
         CAST({brace} AS BIGINT) AS n_brace,
         CAST({lines} AS BIGINT) AS n_lines,
         CAST({indented} AS BIGINT) AS n_indented
  FROM documents
),
flagged AS (
  SELECT *,
         CAST(CASE WHEN (n_sym * 50 >= n_chars AND n_brace >= 2)
                     OR (n_indented * 5 >= n_lines AND n_lines >= 3)
              THEN 1 ELSE 0 END AS BIGINT) AS is_code
  FROM d
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_code) AS BIGINT) AS n_code,
       CAST(sum(n_sym) AS BIGINT) AS n_sym,
       floor(CAST(sum(n_sym) AS DOUBLE) / nullif(sum(n_chars), 0)
             * 1e6 + 0.5) / 1e6 AS sym_share_s,
       floor(CAST(sum(n_indented) AS DOUBLE) / nullif(sum(n_lines), 0)
             * 1e6 + 0.5) / 1e6 AS indent_share_s
FROM flagged
GROUP BY lang, source
ORDER BY lang, source
"""


@register("text_code_screen", oracle=_code_oracle())
def text_code_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing stats per (lang, source): exact symbol /
    brace / indent counts and the in-hash is_code verdict tally."""
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    sym = (F.length(text)
           - F.length(F.regexp_replace(text, _SYM_RE, ""))).cast("long")
    brace = (F.length(text)
             - F.length(F.regexp_replace(text, _BRACE_RE, ""))
             ).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    n_indented = F.size(F.filter(
        lines, lambda l: l.startswith(" ") | l.startswith("\t"))
    ).cast("long")
    d = docs.select(
        "lang", "source",
        F.length(text).cast("long").alias("n_chars"),
        sym.alias("n_sym"), brace.alias("n_brace"),
        n_lines.alias("n_lines"), n_indented.alias("n_indented"),
    )
    is_code = F.when(
        ((F.col("n_sym") * 50 >= F.col("n_chars"))
         & (F.col("n_brace") >= 2))
        | ((F.col("n_indented") * 5 >= F.col("n_lines"))
           & (F.col("n_lines") >= 3)),
        1).otherwise(0).cast("long")
    return (
        d.withColumn("is_code", is_code)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_code").cast("long").alias("n_code"),
            F.sum("n_sym").cast("long").alias("n_sym"),
            _snap6(F.sum("n_sym").cast("double")
                   / F.nullif(F.sum("n_chars"), F.lit(0)))
            .alias("sym_share_s"),
            _snap6(F.sum("n_indented").cast("double")
                   / F.nullif(F.sum("n_lines"), F.lit(0)))
            .alias("indent_share_s"),
        )
        .orderBy("lang", "source")
    )
