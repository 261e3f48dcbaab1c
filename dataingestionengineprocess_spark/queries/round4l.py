"""Round-4 (continued) additions: URL canonicalization dedup, cohort
LTV, and the declarative cross-field rule pack.

- `dedup_url_canonical` -- canonicalize messy URLs (scheme/host
  case, default :80 port, unsorted query params, utm_* tracking
  params, fragments) and dedup by the canonical form: the web-corpus
  dedup step that runs BEFORE any content hashing, since the same
  page hides behind dozens of surface URL spellings.
- `orders_cohort_ltv` -- the cohort lifetime-value matrix: customers
  cohorted by first-order month, cumulative average revenue per
  customer at each month since acquisition (exact integer cents,
  cumulative window over the bounded cohort x month table).
- `quality_cross_field_rules` -- a declarative rule pack evaluated
  in ONE pass: per-rule violation counts and rates over lineitem
  joined to its order (ship-after-order is a genuinely cross-table
  rule), unpivoted to a row per rule.

Reference parity: diagram-only reference (SURVEY.md §0); extends the
[C] curation/quality and [S] analytics families (BASELINE.json:6).

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
# URL canonicalization. The fixture synthesizes four surface
# spellings of each logical page from doc_id (upper-case scheme/host,
# an explicit default port, shuffled query-param order, a utm_source
# tracker + fragment) so the canonicalizer has real work; the
# canonical form lower-cases scheme+host, strips :80, sorts the
# query params, drops utm_*, and discards the fragment. Dedup is
# then an exact groupBy on the canonical string.
#
# Scale: map-only canonicalization (regexp + array ops inside
# codegen), one hash groupBy on the canonical key -- the same shape
# as fingerprint dedup.
# ---------------------------------------------------------------------------

_URL_STYLES = 4


def _url_sql() -> str:
    """DuckDB twin of the fixture URL synthesis + canonicalization."""
    return f"""
WITH raw AS (
  SELECT doc_id,
         doc_id % 100 AS page,
         CAST(floor(doc_id / 100) AS BIGINT) % {_URL_STYLES} AS style
  FROM documents
),
urls AS (
  SELECT doc_id, page,
         CASE style
           WHEN 0 THEN 'http://site' || CAST(page AS VARCHAR)
                       || '.example.com/p?a=1&b=2'
           WHEN 1 THEN 'HTTP://SITE' || CAST(page AS VARCHAR)
                       || '.Example.COM/p?b=2&a=1'
           WHEN 2 THEN 'http://site' || CAST(page AS VARCHAR)
                       || '.example.com:80/p?a=1&b=2&utm_source=news'
           ELSE 'http://site' || CAST(page AS VARCHAR)
                || '.example.com/p?b=2&a=1#frag'
         END AS url
  FROM raw
),
canon AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z]+)://([^/:?#]+)', 1)) || '://'
         || lower(regexp_extract(url, '^([A-Za-z]+)://([^/:?#]+)', 2))
         || regexp_extract(url, '^[A-Za-z]+://[^/:?#]+(:[0-9]+)?([^?#]*)',
                           2)
         || CASE WHEN array_to_string(list_sort(list_filter(
                    string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                    p -> NOT starts_with(p, 'utm_') AND p <> '')), '&') = ''
                 THEN ''
                 ELSE '?' || array_to_string(list_sort(list_filter(
                    string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                    p -> NOT starts_with(p, 'utm_') AND p <> '')), '&')
            END AS curl
  FROM urls
)
SELECT curl AS canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc
FROM canon
GROUP BY curl
HAVING count(*) > 1
ORDER BY canonical_url
"""


@register("dedup_url_canonical", oracle=_url_sql())
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize four surface URL spellings per page and dedup on
    the canonical form (keep-lowest-doc_id groups with > 1 variant)."""
    docs = load(spark, sf_dir, "documents")
    page = (F.col("doc_id") % 100).alias("page")
    style = (F.floor(F.col("doc_id") / 100) % _URL_STYLES)
    p = F.col("page").cast("string")
    url = (
        F.when(style == 0, F.concat(F.lit("http://site"), p,
                                    F.lit(".example.com/p?a=1&b=2")))
        .when(style == 1, F.concat(F.lit("HTTP://SITE"), p,
                                   F.lit(".Example.COM/p?b=2&a=1")))
        .when(style == 2, F.concat(
            F.lit("http://site"), p,
            F.lit(".example.com:80/p?a=1&b=2&utm_source=news")))
        .otherwise(F.concat(F.lit("http://site"), p,
                            F.lit(".example.com/p?b=2&a=1#frag")))
    )
    u = F.col("url")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://([^/:?#]+)", 1))
    host = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://([^/:?#]+)", 2))
    path = F.regexp_extract(u, r"^[A-Za-z]+://[^/:?#]+(:[0-9]+)?([^?#]*)",
                            2)
    qsorted = F.array_join(
        F.array_sort(F.filter(
            F.split(F.regexp_extract(u, r"\?([^#]*)", 1), "&"),
            lambda x: (~x.startswith("utm_")) & (x != ""))), "&")
    curl = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qsorted == "", F.lit(""))
        .otherwise(F.concat(F.lit("?"), qsorted)),
    )
    return (
        docs.select("doc_id", page).select("doc_id", "page",
                                           url.alias("url"))
        .select("doc_id", curl.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_variants"),
             F.min("doc_id").cast("long").alias("keeper_doc"))
        .filter(F.col("n_variants") > 1)
        .orderBy("canonical_url")
    )


# ---------------------------------------------------------------------------
# Cohort LTV matrix. Cohort = month index (y*12 + m) of the
# customer's FIRST order; for each cohort and months-since-
# acquisition, the cumulative revenue per acquired customer. Revenue
# rides exact integer cents; the cumulative sum is a window over the
# bounded cohort x month table, and the per-customer average is one
# snapped division at the end.
#
# Scale: the first-order agg and the join back are both keyed on
# custkey (one shuffle each); everything after the (cohort,
# months_since) rollup is bounded by months^2.
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH first_ord AS (
  SELECT o_custkey,
         CAST(min(date_part('year', o_orderdate) * 12
                  + date_part('month', o_orderdate)) AS BIGINT) AS cohort
  FROM orders GROUP BY o_custkey
),
sizes AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers FROM first_ord
  GROUP BY cohort
),
rev AS (
  SELECT f.cohort,
         CAST(date_part('year', o.o_orderdate) * 12
              + date_part('month', o.o_orderdate) AS BIGINT) - f.cohort
           AS months_since,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN first_ord f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort, months_since,
         CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY months_since
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_cents
  FROM rev
)
SELECT c.cohort, c.months_since, s.n_customers, c.cum_cents,
       floor(CAST(c.cum_cents AS DOUBLE) / s.n_customers / 100.0
             * 1e6 + 0.5) / 1e6 AS avg_ltv_s
FROM cum c JOIN sizes s USING (cohort)
ORDER BY cohort, months_since
"""


@register("orders_cohort_ltv", oracle=_LTV_ORACLE)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative average revenue per customer by first-order cohort
    and months since acquisition."""
    orders = load(spark, sf_dir, "orders")
    month = (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    first_ord = (
        orders.groupBy("o_custkey")
        .agg(F.min(month).cast("long").alias("cohort"))
        .localCheckpoint(eager=True)  # sizes + the rev join reuse
    )
    sizes = first_ord.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"))
    rev = (
        orders.select("o_custkey", month.cast("long").alias("m"),
                      cents.alias("cents"))
        .join(first_ord, "o_custkey")
        .groupBy("cohort", (F.col("m") - F.col("cohort"))
                 .alias("months_since"))
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = W.partitionBy("cohort").orderBy("months_since").rowsBetween(
        W.unboundedPreceding, W.currentRow)
    return (
        rev.withColumn("cum_cents",
                       F.sum("cents").over(w).cast("long"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort", "months_since", "n_customers", "cum_cents",
            _snap6(F.col("cum_cents").cast("double")
                   / F.col("n_customers") / 100.0).alias("avg_ltv_s"),
        )
        .orderBy("cohort", "months_since")
    )


# ---------------------------------------------------------------------------
# Cross-field rule pack: every rule is a boolean over the joined
# (lineitem, orders) row, all rules evaluated in the SAME single
# pass as conditional sums, then unpivoted to a row per rule.
# ship-after-order is the genuinely cross-TABLE rule; the rest are
# in-row domain checks. Violation rates snap once.
#
# Scale: one join keyed on orderkey (the fact-fact join every
# integrity check needs anyway), map-side-combinable conditional
# aggregation, 5-row output.
# ---------------------------------------------------------------------------

_RULES_ORACLE = """
WITH joined AS (
  SELECT l.l_quantity, l.l_discount, l.l_tax, l.l_extendedprice,
         l.l_shipdate, o.o_orderdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
              AS BIGINT) AS v1,
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1
                       ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS v3,
         CAST(sum(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v4,
         CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS v5
  FROM joined
)
SELECT rule, n_checked, n_violations,
       floor(CAST(n_violations AS DOUBLE) / n_checked * 1e6 + 0.5) / 1e6
         AS violation_rate_s
FROM (
  SELECT 'ship_after_order' AS rule, n AS n_checked, v1 AS n_violations
  FROM agg
  UNION ALL SELECT 'discount_in_range', n, v2 FROM agg
  UNION ALL SELECT 'positive_quantity', n, v3 FROM agg
  UNION ALL SELECT 'tax_nonnegative', n, v4 FROM agg
  UNION ALL SELECT 'positive_price', n, v5 FROM agg
)
ORDER BY rule
"""


@register("quality_cross_field_rules", oracle=_RULES_ORACLE)
def quality_cross_field_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-rule integrity pack over lineitem x orders, one pass,
    one row per rule."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    joined = li.join(orders.select("o_orderkey", "o_orderdate"),
                     li.l_orderkey == F.col("o_orderkey"))

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        viol(F.col("l_shipdate") < F.col("o_orderdate")).alias("v1"),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
        .alias("v2"),
        viol(F.col("l_quantity") <= 0).alias("v3"),
        viol(F.col("l_tax") < 0).alias("v4"),
        viol(F.col("l_extendedprice") <= 0).alias("v5"),
    )
    rules = agg.select(
        F.expr("""stack(5,
            'ship_after_order', v1,
            'discount_in_range', v2,
            'positive_quantity', v3,
            'tax_nonnegative', v4,
            'positive_price', v5) AS (rule, n_violations)"""),
        F.col("n").alias("n_checked"),
    )
    return (
        rules.select(
            "rule", "n_checked", "n_violations",
            _snap6(F.col("n_violations").cast("double")
                   / F.col("n_checked")).alias("violation_rate_s"),
        )
        .orderBy("rule")
    )
