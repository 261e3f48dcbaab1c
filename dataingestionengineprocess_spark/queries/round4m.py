"""Round-4 (continued) additions: CSV edge-case round-trip, erasure
impact, and the dataset card.

- `source_csv_roundtrip_edgecases` -- the CSV surface every ingest
  engine gets wrong first: embedded delimiters, RFC-4180 doubled
  quotes, embedded newlines (multiLine), tabs, leading/trailing
  whitespace, unicode, and a literal 'NULL' string, written through
  the engine's CSV sink and read back through its CSV parser; the
  oracle recomputes the per-style checksums from the synthesis rule,
  so a hash pass proves byte fidelity through the full write+parse
  cycle ([R] core: the reference ingests CSV feeds).
- `gov_erasure_impact` -- right-to-erasure sweep planning: an
  md5-coined deletion set of customers and the per-table cascade
  impact (customer -> orders -> lineitem) as semi-join counts: the
  report a GDPR delete job runs BEFORE touching the warehouse.
- `curation_dataset_card` -- the one-query dataset card: corpus
  size, source/language mix entropies, token stats, exact-duplicate
  rate, short-doc rate -- the summary block a training-data release
  publishes, as a (metric, value) table from two passes.

Reference parity: CSV ingest is the reference's [R] core
(`Untitled Diagram.drawio`: S3/CSV landing -> process); the others
extend the [C] governance/curation families (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, scratch_dir
from ..functions.exact import snap6 as _snap6, q6 as _q6
from ..functions.text import md5_bucket
from . import register

# ---------------------------------------------------------------------------
# CSV edge cases. Eight payload styles keyed on custkey % 8; the
# engine writes them with RFC-4180 quoting (quote = escape = '"',
# so embedded quotes double) and reads them back with the multiLine
# parser. The aggregate is per-style (count, total length, md5
# checksum-sum of payloads) -- any corruption of any byte in any row
# moves a checksum. The oracle never sees the file: it recomputes
# the same aggregates from the synthesis rule, so equality proves
# the write+parse cycle lossless.
#
# Scale: the CSV write/read shards by file like any source;
# multiLine forces whole-file parsing per file (the documented cost
# of embedded newlines -- split files small at ingest, or forbid
# newlines upstream when parallel splitting matters).
# ---------------------------------------------------------------------------


def _payload_sql() -> str:
    # NOTE: register() whitespace-normalizes oracle SQL, so multi-
    # space string literals would silently collapse -- the padding
    # style builds its spaces with repeat(' ', 2) instead.
    return """
  CASE c_custkey % 8
    WHEN 0 THEN 'plain_' || CAST(c_custkey AS VARCHAR)
    WHEN 1 THEN 'a,comma,' || CAST(c_custkey AS VARCHAR)
    WHEN 2 THEN 'a"quote"' || CAST(c_custkey AS VARCHAR)
    WHEN 3 THEN 'line1' || chr(10) || 'line2_' || CAST(c_custkey AS VARCHAR)
    WHEN 4 THEN 'tab' || chr(9) || 'sep_' || CAST(c_custkey AS VARCHAR)
    WHEN 5 THEN repeat(' ', 2) || 'spaced_' || CAST(c_custkey AS VARCHAR)
                || repeat(' ', 2)
    WHEN 6 THEN 'café_ü_' || CAST(c_custkey AS VARCHAR)
    ELSE 'NULL'
  END
"""


_CSV_ORACLE = f"""
WITH p AS (
  SELECT c_custkey, CAST(c_custkey % 8 AS BIGINT) AS style,
         {_payload_sql()} AS payload
  FROM customer
)
SELECT style,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(length(payload)) AS BIGINT) AS sum_len,
       CAST(sum(CAST('0x' || substr(md5(payload || ':ck'), 1, 6) AS BIGINT)
                % 1000000) AS BIGINT) AS checksum
FROM p
GROUP BY style
ORDER BY style
"""


def _payload_col():
    k = F.col("c_custkey").cast("string")
    s = F.col("c_custkey") % 8
    return (
        F.when(s == 0, F.concat(F.lit("plain_"), k))
        .when(s == 1, F.concat(F.lit("a,comma,"), k))
        .when(s == 2, F.concat(F.lit('a"quote"'), k))
        .when(s == 3, F.concat(F.lit("line1\nline2_"), k))
        .when(s == 4, F.concat(F.lit("tab\tsep_"), k))
        .when(s == 5, F.concat(F.lit("  spaced_"), k, F.lit("  ")))
        .when(s == 6, F.concat(F.lit("café_ü_"), k))
        .otherwise(F.lit("NULL"))
    )


@register("source_csv_roundtrip_edgecases", oracle=_CSV_ORACLE)
def source_csv_roundtrip_edgecases(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Write 8 styles of hostile CSV payloads through the CSV sink
    (RFC-4180 quoting) and read them back with the multiLine parser;
    per-style checksums prove byte fidelity."""
    cust = load(spark, sf_dir, "customer")
    path = scratch_dir("csv_edge", sf_dir)
    (
        cust.select(
            F.col("c_custkey").alias("k"),
            (F.col("c_custkey") % 8).cast("long").alias("style"),
            _payload_col().alias("payload"),
        )
        .write.mode("overwrite")
        # the WRITER also trims whitespace by default -- disable on
        # both sides or style 5 silently loses its padding
        .options(header=True, quote='"', escape='"',
                 ignoreLeadingWhiteSpace=False,
                 ignoreTrailingWhiteSpace=False)
        .csv(path)
    )
    back = (
        spark.read
        .options(header=True, multiLine=True, quote='"', escape='"',
                 ignoreLeadingWhiteSpace=False,
                 ignoreTrailingWhiteSpace=False,
                 inferSchema=False)
        .csv(path)
    )
    return (
        back.select(
            F.col("style").cast("long").alias("style"),
            F.col("payload"),
        )
        .groupBy("style")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.length("payload")).cast("long").alias("sum_len"),
            F.sum(md5_bucket(F.concat(F.col("payload"), F.lit(":ck")),
                             1000000)).cast("long").alias("checksum"),
        )
        .orderBy("style")
    )


# ---------------------------------------------------------------------------
# Erasure impact. The deletion set is the md5 coin on the customer
# key (~5%); impact counts cascade through the foreign keys:
# customer rows directly, orders by custkey semi-join, lineitem by
# orderkey semi-join against the doomed orders. The semi-joins
# broadcast the (small) doomed-customer set; the lineitem leg rides
# the doomed-orders keys, never a three-table shuffle chain.
# ---------------------------------------------------------------------------

_ERASE_PCT = 5

_ERASURE_ORACLE = f"""
WITH doomed AS (
  SELECT c_custkey FROM customer
  WHERE CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':erase'),
                            1, 6) AS BIGINT) % 100 < {_ERASE_PCT}
),
doomed_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM doomed)
),
c AS (SELECT CAST(count(*) AS BIGINT) AS total FROM customer),
o AS (SELECT CAST(count(*) AS BIGINT) AS total FROM orders),
l AS (SELECT CAST(count(*) AS BIGINT) AS total FROM lineitem),
pc AS (SELECT CAST(count(*) AS BIGINT) AS purged FROM doomed),
po AS (SELECT CAST(count(*) AS BIGINT) AS purged FROM doomed_orders),
pl AS (
  SELECT CAST(count(*) AS BIGINT) AS purged FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders)
)
SELECT tbl, n_total, n_purged,
       floor(CAST(n_purged AS DOUBLE) / n_total * 1e6 + 0.5) / 1e6
         AS purge_rate_s,
       n_total - n_purged AS n_after
FROM (
  SELECT 'customer' AS tbl, c.total AS n_total, pc.purged AS n_purged
  FROM c, pc
  UNION ALL SELECT 'orders', o.total, po.purged FROM o, po
  UNION ALL SELECT 'lineitem', l.total, pl.purged FROM l, pl
)
ORDER BY tbl
"""


@register("gov_erasure_impact", oracle=_ERASURE_ORACLE)
def gov_erasure_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table cascade impact of erasing an md5-coined 5% customer
    set: totals, purged counts, rates, post-sweep counts."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    doomed = cust.filter(
        md5_bucket(F.concat(F.col("c_custkey").cast("string"),
                            F.lit(":erase")), 100) < _ERASE_PCT
    ).select("c_custkey").localCheckpoint(eager=True)  # 2 consumers
    doomed_orders = (
        orders.join(F.broadcast(doomed),
                    orders.o_custkey == doomed.c_custkey, "left_semi")
        .select("o_orderkey")
        .localCheckpoint(eager=True)  # count + the lineitem semi-join
    )
    purged_li = li.join(F.broadcast(doomed_orders),
                        li.l_orderkey == doomed_orders.o_orderkey,
                        "left_semi")

    def row(tbl: str, total_df: DataFrame, purged_df: DataFrame):
        t = total_df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        p = purged_df.agg(F.count(F.lit(1)).cast("long")
                          .alias("n_purged"))
        return (t.crossJoin(p)
                .select(F.lit(tbl).alias("tbl"), "n_total", "n_purged"))

    out = (
        row("customer", cust, doomed)
        .unionByName(row("orders", orders, doomed_orders))
        .unionByName(row("lineitem", li, purged_li))
    )
    return out.select(
        "tbl", "n_total", "n_purged",
        _snap6(F.col("n_purged").cast("double") / F.col("n_total"))
        .alias("purge_rate_s"),
        (F.col("n_total") - F.col("n_purged")).alias("n_after"),
    ).orderBy("tbl")


# ---------------------------------------------------------------------------
# Dataset card: the release-notes block as one (metric, value)
# table. Two corpus passes: a doc-level aggregate (counts, chars,
# tokens, short/dup rates via distinct fingerprints) and the bounded
# lang/source count tables for mix entropies (quantized ln reduce,
# same recipe as the MI query).
# ---------------------------------------------------------------------------

_CARD_ORACLE = """
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(sum(length(text)) AS BIGINT) AS total_chars,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
         CAST(sum(CASE WHEN length(text) < 50 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_short
  FROM documents
),
lm AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents
       GROUP BY lang),
sm AS (SELECT source, CAST(count(*) AS BIGINT) AS c FROM documents
       GROUP BY source),
hl AS (
  SELECT CAST(sum(CAST(floor(-(CAST(c AS DOUBLE) / base.n_docs)
                             * ln(CAST(c AS DOUBLE) / base.n_docs)
                             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS hq
  FROM lm, base
),
hs AS (
  SELECT CAST(sum(CAST(floor(-(CAST(c AS DOUBLE) / base.n_docs)
                             * ln(CAST(c AS DOUBLE) / base.n_docs)
                             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS hq
  FROM sm, base
)
SELECT metric, value_s FROM (
  SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value_s FROM base
  UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM base
  UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM base
  UNION ALL SELECT 'total_chars', CAST(total_chars AS DOUBLE) FROM base
  UNION ALL SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM base
  UNION ALL SELECT 'mean_doc_tokens',
    floor(CAST(total_tokens AS DOUBLE) / n_docs * 1e6 + 0.5) / 1e6
    FROM base
  UNION ALL SELECT 'exact_dup_rate',
    floor((1.0 - CAST(n_unique AS DOUBLE) / n_docs) * 1e6 + 0.5) / 1e6
    FROM base
  UNION ALL SELECT 'short_doc_rate',
    floor(CAST(n_short AS DOUBLE) / n_docs * 1e6 + 0.5) / 1e6 FROM base
  UNION ALL SELECT 'lang_entropy', CAST(hq AS DOUBLE) / 1e6 FROM hl
  UNION ALL SELECT 'source_entropy', CAST(hq AS DOUBLE) / 1e6 FROM hs
)
ORDER BY metric
"""


@register("curation_dataset_card", oracle=_CARD_ORACLE)
def curation_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten release-card metrics for the documents corpus as a
    (metric, value) table."""
    from ..functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(F.size(tokens("text"))).cast("long").alias("total_tokens"),
        F.countDistinct(F.md5("text")).cast("long").alias("n_unique"),
        F.sum(F.when(F.length("text") < 50, 1).otherwise(0)).cast("long")
        .alias("n_short"),
    ).localCheckpoint(eager=True)  # feeds every metric + both entropies

    def entropy(col: str):
        cm = docs.groupBy(col).agg(F.count(F.lit(1)).cast("long")
                                   .alias("c"))
        p = F.col("c").cast("double") / F.col("n_docs")
        return (cm.crossJoin(F.broadcast(base.select("n_docs")))
                .agg(F.sum(_q6(-p * F.log(p))).cast("long").alias("hq"))
                .select((F.col("hq").cast("double") / 1e6).alias("h")))

    hl = entropy("lang")
    hs = entropy("source")

    def m(name: str, col):
        return base.select(F.lit(name).alias("metric"),
                           col.cast("double").alias("value_s"))

    rows = (
        m("n_docs", F.col("n_docs"))
        .unionByName(m("n_sources", F.col("n_sources")))
        .unionByName(m("n_langs", F.col("n_langs")))
        .unionByName(m("total_chars", F.col("total_chars")))
        .unionByName(m("total_tokens", F.col("total_tokens")))
        .unionByName(m("mean_doc_tokens",
                       _snap6(F.col("total_tokens").cast("double")
                              / F.col("n_docs"))))
        .unionByName(m("exact_dup_rate",
                       _snap6(1.0 - F.col("n_unique").cast("double")
                              / F.col("n_docs"))))
        .unionByName(m("short_doc_rate",
                       _snap6(F.col("n_short").cast("double")
                              / F.col("n_docs"))))
        .unionByName(hl.select(F.lit("lang_entropy").alias("metric"),
                               F.col("h").alias("value_s")))
        .unionByName(hs.select(F.lit("source_entropy").alias("metric"),
                               F.col("h").alias("value_s")))
    )
    return rows.orderBy("metric")
