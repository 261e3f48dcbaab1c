"""Round-4 (continued) additions: PSI drift, referential-integrity
audit, and the dedup savings report.

- `ml_psi_drift` -- the Population Stability Index, the industry
  drift gate for deployed models: order totals bucketed into fixed
  0..60k-cent-width bins, first half-month vs second compared with
  PSI = sum (p2 - p1) ln(p2 / p1). Proportions are Laplace-smoothed
  ((c + 0.5) / (n + k/2)) exactly like the chi^2 in
  `quality_drift_orders`, which both keeps empty buckets finite AND
  bounds the ln argument away from 0 -- no engine divergence, no
  dropped terms. Output: per-bucket contributions plus the TOTAL row,
  all inside the hash.
- `quality_fk_orphans` -- the ingest referential-integrity audit:
  every foreign-key edge of the star schema checked with a LEFT ANTI
  join (child keys with no parent), emitted as one row per edge with
  child counts and the orphan rate. A feed that lands facts before
  dims (or drops a dim partition) shows up here before any join
  silently shrinks.
- `dedup_savings_report` -- the deliverable a dedup stage owes its
  operators: per source, how many docs are exact duplicates (by the
  shared normalized-text fingerprint) and how many characters the
  canonical-keep policy saves, with the saved share snapped into the
  hash. Savings attribute to the duplicate row's OWN source, so
  cross-source duplicate groups charge the source holding the copy.

Reference parity: diagram-only reference (SURVEY.md §0); the FK audit
extends the [R] validation stage, PSI the [C] monitoring mandate, the
savings report the [C] dedup family (BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import epoch_day as _epoch_day, snap6 as _snap6
from . import register

# ---------------------------------------------------------------------------
# PSI. Split = first 15 calendar days vs the rest (fixture spans one
# month); 10 fixed-width cent buckets capped at the last. Smoothed
# p = (c + 0.5) / (n + 5): ln(p2/p1) is then always finite and
# bounded, so the snap->ln->quantize chain is engine-identical.
# ---------------------------------------------------------------------------

_PSI_BUCKETS = 10
_PSI_BIN_CENTS = 6_000_000  # 60k-dollar-wide bins over o_totalprice
from ..functions.exact import FIXTURE_SPLIT_DAY as _PSI_SPLIT_DAY  # noqa: E402

_PSI_ORACLE = f"""
WITH base AS (
  SELECT least(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               // {_PSI_BIN_CENTS}, {_PSI_BUCKETS - 1}) AS bucket,
         CASE WHEN date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE))
                   < {_PSI_SPLIT_DAY} THEN 1 ELSE 2 END AS half
  FROM orders
),
axis AS (SELECT unnest(range(0, {_PSI_BUCKETS})) AS bucket),
cnt AS (
  SELECT a.bucket,
         CAST(coalesce(sum(CASE WHEN b.half = 1 THEN 1 END), 0)
              AS BIGINT) AS c1,
         CAST(coalesce(sum(CASE WHEN b.half = 2 THEN 1 END), 0)
              AS BIGINT) AS c2
  FROM axis a LEFT JOIN base b ON b.bucket = a.bucket
  GROUP BY a.bucket
),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2 FROM cnt),
terms AS (
  SELECT c.bucket, c.c1, c.c2,
         floor((c.c2 + 0.5) / (t.n2 + {_PSI_BUCKETS / 2}) * 1e6 + 0.5)
           / 1e6 AS p2,
         floor((c.c1 + 0.5) / (t.n1 + {_PSI_BUCKETS / 2}) * 1e6 + 0.5)
           / 1e6 AS p1
  FROM cnt c CROSS JOIN tot t
),
quant AS (
  SELECT bucket, c1, c2,
         CAST(floor((p2 - p1)
              * (floor(ln(p2 / p1) * 1e6 + 0.5) / 1e6)
              * 1e6 + 0.5) AS BIGINT) AS term_q
  FROM terms
)
SELECT CAST(bucket AS VARCHAR) AS bucket, c1, c2,
       floor(term_q / 1e6 * 1e6 + 0.5) / 1e6 AS psi_s
FROM quant
UNION ALL
SELECT 'TOTAL' AS bucket,
       CAST(sum(c1) AS BIGINT), CAST(sum(c2) AS BIGINT),
       floor(sum(term_q) / 1e6 * 1e6 + 0.5) / 1e6
FROM quant
ORDER BY bucket
"""


@register("ml_psi_drift", oracle=_PSI_ORACLE)
def ml_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of order totals, first half-month
    vs second: smoothed per-bucket terms plus the TOTAL row."""
    orders = load(spark, sf_dir, "orders")
    bucket = F.least(
        F.expr(f"cast(floor(o_totalprice * 100 + 0.5) as bigint) "
               f"div {_PSI_BIN_CENTS}"),
        F.lit(_PSI_BUCKETS - 1))
    half = F.when(
        _epoch_day("o_orderdate") < _PSI_SPLIT_DAY, 1).otherwise(2)
    base = orders.select(bucket.alias("bucket"), half.alias("half"))
    axis = spark.range(_PSI_BUCKETS).select(
        F.col("id").cast("long").alias("bucket"))
    cnt = (
        axis.join(base, "bucket", "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(F.sum(F.when(F.col("half") == 1, 1)), F.lit(0))
            .cast("long").alias("c1"),
            F.coalesce(F.sum(F.when(F.col("half") == 2, 1)), F.lit(0))
            .cast("long").alias("c2"),
        )
    )
    tot = cnt.agg(F.sum("c1").cast("long").alias("n1"),
                  F.sum("c2").cast("long").alias("n2"))
    k2 = _PSI_BUCKETS / 2
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket", "c1", "c2",
        _snap6((F.col("c1") + 0.5) / (F.col("n1") + k2)).alias("p1"),
        _snap6((F.col("c2") + 0.5) / (F.col("n2") + k2)).alias("p2"),
    )
    term_q = F.floor(
        (F.col("p2") - F.col("p1"))
        * _snap6(F.log(F.col("p2") / F.col("p1"))) * 1e6 + 0.5
    ).cast("long")
    quant = terms.select("bucket", "c1", "c2", term_q.alias("term_q")) \
        .localCheckpoint(eager=True)  # 10 rows, feeds bucket + total legs
    per = quant.select(
        F.col("bucket").cast("string").alias("bucket"), "c1", "c2",
        _snap6(F.col("term_q") / 1e6).alias("psi_s"),
    )
    total = quant.agg(
        F.sum("c1").cast("long").alias("c1"),
        F.sum("c2").cast("long").alias("c2"),
        _snap6(F.sum("term_q") / 1e6).alias("psi_s"),
    ).select(F.lit("TOTAL").alias("bucket"), "c1", "c2", "psi_s")
    return per.unionByName(total).orderBy("bucket")


# ---------------------------------------------------------------------------
# FK orphans. One row per schema edge; the anti join streams the
# child side against the (usually broadcastable) parent key set, so
# the audit costs one scan per edge and shuffles nothing it keeps.
# ---------------------------------------------------------------------------

_FK_ORACLE = """
WITH edges AS (
  SELECT 'lineitem.l_orderkey -> orders' AS edge,
         (SELECT count(*) FROM lineitem) AS n_child,
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
           AS n_orphans
  UNION ALL
  SELECT 'lineitem.l_partkey -> part',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'lineitem.l_suppkey -> supplier',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s
                            WHERE s.s_suppkey = l.l_suppkey))
  UNION ALL
  SELECT 'orders.o_custkey -> customer',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'customer.c_nationkey -> nation',
         (SELECT count(*) FROM customer),
         (SELECT count(*) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = c.c_nationkey))
  UNION ALL
  SELECT 'supplier.s_nationkey -> nation',
         (SELECT count(*) FROM supplier),
         (SELECT count(*) FROM supplier s
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = s.s_nationkey))
  UNION ALL
  SELECT 'nation.n_regionkey -> region',
         (SELECT count(*) FROM nation),
         (SELECT count(*) FROM nation n
          WHERE NOT EXISTS (SELECT 1 FROM region r
                            WHERE r.r_regionkey = n.n_regionkey))
)
SELECT edge, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       floor(CAST(n_orphans AS DOUBLE) / nullif(n_child, 0)
             * 1e6 + 0.5) / 1e6 AS orphan_rate_s
FROM edges
ORDER BY edge
"""


@register("quality_fk_orphans", oracle=_FK_ORACLE)
def quality_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan count and rate for every
    FK edge of the star schema via LEFT ANTI probes."""
    t = {name: load(spark, sf_dir, name)
         for name in ("lineitem", "orders", "part", "supplier",
                      "customer", "nation", "region")}
    edges = [
        ("lineitem.l_orderkey -> orders", t["lineitem"], "l_orderkey",
         t["orders"], "o_orderkey"),
        ("lineitem.l_partkey -> part", t["lineitem"], "l_partkey",
         t["part"], "p_partkey"),
        ("lineitem.l_suppkey -> supplier", t["lineitem"], "l_suppkey",
         t["supplier"], "s_suppkey"),
        ("orders.o_custkey -> customer", t["orders"], "o_custkey",
         t["customer"], "c_custkey"),
        ("customer.c_nationkey -> nation", t["customer"], "c_nationkey",
         t["nation"], "n_nationkey"),
        ("supplier.s_nationkey -> nation", t["supplier"], "s_nationkey",
         t["nation"], "n_nationkey"),
        ("nation.n_regionkey -> region", t["nation"], "n_regionkey",
         t["region"], "r_regionkey"),
    ]
    parts = []
    for name, child, ck, parent, pk in edges:
        ckeys = child.select(F.col(ck).alias("k"))
        orphans = ckeys.join(
            parent.select(F.col(pk).alias("k")), "k", "left_anti"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        n = ckeys.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        parts.append(
            n.crossJoin(orphans).select(
                F.lit(name).alias("edge"), "n_child", "n_orphans"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "edge", "n_child", "n_orphans",
        _snap6(F.col("n_orphans").cast("double")
               / F.nullif(F.col("n_child"), F.lit(0))
               ).alias("orphan_rate_s"),
    ).orderBy("edge")


# ---------------------------------------------------------------------------
# Dedup savings. fp = shared normalized-text md5 (functions/text.py);
# canonical = min doc_id per fp (the exact-dedup keep policy); every
# other member's characters are "saved". Group stats ride one
# fp-keyed aggregate joined back -- no window.
# ---------------------------------------------------------------------------

_SAVINGS_ORACLE = """
WITH fps AS (
  SELECT doc_id, source, length(text) AS chars,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
keep AS (SELECT fp, min(doc_id) AS keep_id FROM fps GROUP BY fp)
SELECT f.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN f.doc_id = k.keep_id THEN 0 ELSE 1 END)
            AS BIGINT) AS n_dupes,
       CAST(sum(f.chars) AS BIGINT) AS chars_total,
       CAST(sum(CASE WHEN f.doc_id = k.keep_id THEN 0 ELSE f.chars END)
            AS BIGINT) AS chars_saved,
       floor(CAST(sum(CASE WHEN f.doc_id = k.keep_id
                           THEN 0 ELSE f.chars END) AS DOUBLE)
             / nullif(sum(f.chars), 0) * 1e6 + 0.5) / 1e6
         AS saved_share_s
FROM fps f JOIN keep k ON k.fp = f.fp
GROUP BY f.source
ORDER BY f.source
"""


@register("dedup_savings_report", oracle=_SAVINGS_ORACLE)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate counts and characters saved by the
    canonical-keep policy, saved share snapped into the hash."""
    from ..functions.text import fingerprint

    fps = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("chars"),
        fingerprint("text").alias("fp"),
    )
    keep = fps.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    dup_chars = F.sum(
        F.when(F.col("doc_id") == F.col("keep_id"), 0)
        .otherwise(F.col("chars")))
    return (
        fps.join(keep, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("doc_id") == F.col("keep_id"), 0)
                  .otherwise(1)).cast("long").alias("n_dupes"),
            F.sum("chars").cast("long").alias("chars_total"),
            dup_chars.cast("long").alias("chars_saved"),
            _snap6(dup_chars.cast("double")
                   / F.nullif(F.sum("chars"), F.lit(0)))
            .alias("saved_share_s"),
        )
        .orderBy("source")
    )
