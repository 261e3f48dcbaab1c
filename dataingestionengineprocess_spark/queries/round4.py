"""Round-4 additions: the JDBC path under the oracle gate.

S5/J6/S7 (reference: the PostgreSQL operational-store round-trip,
`Untitled Diagram.drawio:88-98`) were previously pytest-only because
the sandbox has no database server. Apache Derby's EMBEDDED driver
(shipped with Spark) is a file-backed JDBC database: a real JDBC
endpoint -- DriverManager, SQL dialect, type mapping, partitioned
range queries -- with the storage on local disk. That makes the whole
write -> partitioned-read -> enrich path runnable under the DuckDB
oracle: the only thing the stand-in changes vs a networked RDBMS is
the URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, scratch_dir
from . import register

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(db_dir: str) -> str:
    return f"jdbc:derby:{db_dir}/db;create=true"


_JDBC_ROUNDTRIP_ORACLE = """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_nations,
       min(n.n_nationkey)       AS min_key,
       max(n.n_nationkey)       AS max_key
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


@register("source_jdbc_roundtrip", oracle=_JDBC_ROUNDTRIP_ORACLE)
def source_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + J6 + S7 end to end through a REAL JDBC endpoint: publish
    the nation dimension into an embedded Derby database (the S7
    OLTP-sink write path: Spark JDBC writer, DDL + batched INSERTs),
    read it back PARTITIONED (the S5 contract: partitionColumn +
    bounds + numPartitions via `sources.jdbc.jdbc_read_options`, so
    Spark issues one range-predicate query per task instead of
    funneling the table through a single connection), broadcast-enrich
    against the region dimension (J6), and aggregate. The oracle
    recomputes the same rollup from the parquet source -- a hash pass
    proves the dimension survived the JDBC round-trip byte-identically.

    Scale notes: a dimension this small would read unpartitioned and
    broadcast; the partitioned read here exercises the large-table
    contract (bounds from the table's own min/max, the same two-row
    stats query a production reader issues). Embedded Derby is the
    sandbox stand-in for a networked RDBMS -- swap the URL and the
    plan is unchanged.
    """
    from ..sources.jdbc import JdbcConfig, read_jdbc

    # keep Derby's engine-wide log out of the repo cwd (JVM-global,
    # first-boot only -- harmless if the engine is already up)
    spark._jvm.java.lang.System.setProperty(
        "derby.system.home", "/tmp/derby_home"
    )

    db_dir = scratch_dir("derby_jdbc", sf_dir)
    url = _derby_url(db_dir)
    nation = load(spark, sf_dir, "nation")

    (
        nation.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation")
        .option("driver", _DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )

    bounds = nation.agg(
        F.min("n_nationkey").alias("lo"), F.max("n_nationkey").alias("hi")
    ).collect()[0]
    cfg = JdbcConfig(
        url=url, table="nation",
        properties={"driver": _DERBY_DRIVER},
        partition_column="n_nationkey",
        lower_bound=str(bounds["lo"]), upper_bound=str(int(bounds["hi"]) + 1),
        num_partitions=4,
    )
    back = read_jdbc(spark, cfg)

    region = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        back.join(F.broadcast(region),
                  back["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.min("n_nationkey").alias("min_key"),
            F.max("n_nationkey").alias("max_key"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# Repetition filters (the Gopher / MassiveText quality-gate family):
# documents dominated by a few repeated n-grams are boilerplate and
# get filtered before pretraining. Two standard signals per document:
#   top2_frac -- occurrences of the MOST COMMON word 2-gram over all
#                2-gram occurrences (templated headers/footers spike);
#   dup3_frac -- fraction of 3-gram occurrences whose gram occurs
#                more than once (self-plagiarized / looping text).
# Shape at 100 TB: one explode to (doc_id, n, gram) rows, one partial-
# aggregated count keyed by that composite -- the same uniform-key
# shuffle profile as tokenization, no per-doc skew beyond doc length;
# the gram build itself is JVM-side array code (transform/sequence),
# no Python.
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, 2 AS n,
         unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS g
  FROM toks WHERE len(t) >= 2
  UNION ALL
  SELECT doc_id, 3 AS n,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
  FROM toks WHERE len(t) >= 3
),
cnt AS (
  SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN c END) AS top2,
         sum(CASE WHEN n = 2 THEN c END) AS tot2,
         sum(CASE WHEN n = 3 AND c > 1 THEN c ELSE 0 END) AS dup3,
         sum(CASE WHEN n = 3 THEN c END) AS tot3
  FROM cnt GROUP BY doc_id
)
SELECT doc_id,
       floor(top2 * 1e6 / tot2 + 0.5) / 1e6 AS top2_frac,
       floor(dup3 * 1e6 / tot3 + 0.5) / 1e6 AS dup3_frac,
       (top2 * 12 <= tot2 AND dup3 * 10 <= tot3) AS keep
FROM per_doc
WHERE tot2 IS NOT NULL AND tot3 IS NOT NULL
ORDER BY doc_id
"""


@register("text_repetition_filters", oracle=_REPETITION_ORACLE)
def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition gates. The keep rule (top 2-gram <= 1/12
    of 2-gram mass AND duplicated-3-gram mass <= 1/10) uses exact
    integer comparisons (c * k <= total) so the boolean never rides a
    float; the reported fractions round via the floor(x*1e6+0.5)
    portable rule (FIXTURES.md)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("t")
    ).withColumn("len", F.size("t"))

    def grams(n: int):
        return (
            toks.filter(F.col("len") >= n)
            .select(
                "doc_id", F.lit(n).alias("n"),
                F.explode(F.expr(
                    f"transform(sequence(1, size(t) - {n - 1}), i -> "
                    + " || ' ' || ".join(
                        f"element_at(t, i + {j})" for j in range(n)
                    ) + ")"
                )).alias("g"),
            )
        )

    cnt = (
        grams(2).unionByName(grams(3))
        .groupBy("doc_id", "n", "g")
        .agg(F.count("*").alias("c"))
    )
    per_doc = cnt.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 2, F.col("c"))).alias("top2"),
        F.sum(F.when(F.col("n") == 2, F.col("c"))).alias("tot2"),
        F.sum(F.when((F.col("n") == 3) & (F.col("c") > 1), F.col("c"))
              .otherwise(0)).alias("dup3"),
        F.sum(F.when(F.col("n") == 3, F.col("c"))).alias("tot3"),
    )
    return (
        per_doc
        .filter(F.col("tot2").isNotNull() & F.col("tot3").isNotNull())
        .select(
            "doc_id",
            (F.floor(F.col("top2") * 1e6 / F.col("tot2") + 0.5) / 1e6)
            .alias("top2_frac"),
            (F.floor(F.col("dup3") * 1e6 / F.col("tot3") + 0.5) / 1e6)
            .alias("dup3_frac"),
            ((F.col("top2") * 12 <= F.col("tot2"))
             & (F.col("dup3") * 10 <= F.col("tot3"))).alias("keep"),
        )
        .orderBy("doc_id")
    )
