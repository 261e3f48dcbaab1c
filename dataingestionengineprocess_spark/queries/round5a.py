"""Round-4 (continued) additions built on the distributed global-order
primitives (`operators/ranking.py`): cross-source quantile
normalization and the tie-corrected Mann-Whitney U test.

- `ml_quantile_normalize` -- score harmonization across sources (the
  curation move when several quality classifiers disagree on scale):
  each row's within-source rank maps to the pooled distribution's
  value at the same quantile position (pos = ceil(rn * N / n_src)),
  so every source's normalized scores share the pooled distribution
  exactly. The within-source ranks are per-source windows
  (partitioned, parallel); the pooled positions come from
  `global_rank` -- the two-pass range-partition prefix, NO
  corpus-wide single-task window -- and the mapping is one equi-join
  on the position.
- `stat_mann_whitney` -- the nonparametric two-sample test (label 0
  vs rest on the first embedding component): tie-AVERAGED ranks kept
  exact as 2x-scaled integers (2*cum_before + c + 1), U doubled
  likewise, tie-corrected variance from a DECIMAL(38) c^3 - c
  accumulator (a single giant tie group cubes past int64), z snapped
  once at the end. The rank prefix over the value-group table rides
  `distributed_prefix_sum`, so even a value universe in the millions
  never serializes through one task.

Reference parity: diagram-only reference (SURVEY.md §0); both extend
the [C] ml-prep / statistics mandate (BASELINE.json:6).

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
# Quantile normalization. pos = ceil(rn * N / n_src) in pure integer
# arithmetic ((rn*N + n_src - 1) div n_src); rn*N <= n_src*N bounded
# by N^2 -- at 1.5e9 rows that exceeds int64, so deployments beyond
# ~3e9 rows move the product to DECIMAL(38); the fixture (and any
# single-table corpus below that) stays in long. Output: per-source
# moments of the NORMALIZED scores -- equal distributions across
# sources is the contract, and the quantized means land inside the
# hash.
# ---------------------------------------------------------------------------

_QNORM_ORACLE = """
WITH scored AS (
  SELECT d.source, e.vec_id,
         floor(CAST(e.embedding[1] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS s
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
persrc AS (
  SELECT source, vec_id, s,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY s, vec_id) AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
  FROM scored
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
pooled AS (
  SELECT s AS norm_s,
         CAST(row_number() OVER (ORDER BY s, vec_id) AS BIGINT) AS gr
  FROM scored
),
mapped AS (
  SELECT p.source,
         CAST((p.rn * nn.n + p.n_src - 1) // p.n_src AS BIGINT) AS pos
  FROM persrc p CROSS JOIN nn
)
SELECT m.source,
       CAST(count(*) AS BIGINT) AS n_vecs,
       floor(sum(floor(g.norm_s * 1e6 + 0.5)) / 1e6 / count(*)
             * 1e6 + 0.5) / 1e6 AS mean_norm_s,
       min(g.norm_s) AS min_norm_s,
       max(g.norm_s) AS max_norm_s
FROM mapped m JOIN pooled g ON g.gr = m.pos
GROUP BY m.source
ORDER BY m.source
"""


@register("ml_quantile_normalize", oracle=_QNORM_ORACLE)
def ml_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map each source's score ranks onto the pooled distribution's
    quantile values; per-source moments of the normalized scores."""
    from ..operators.ranking import global_rank

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        _snap6(F.element_at("embedding", 1).cast("double")).alias("s"),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    scored = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "source", "vec_id", "s",
    ).localCheckpoint(eager=True)  # feeds persrc, nn, AND global_rank
    # per-source rank WITHOUT the per-source window (sources are a
    # small bounded universe -- the window form funnels each source's
    # whole eval population through one task's sort)
    from ..operators.ranking import grouped_rank

    # source: fixed generator enum (20 values) -- skip the probe.
    persrc = grouped_rank(
        scored, ["source"], ["s", "vec_id"], "rn",
        count_col="n_src",
        known_group_count=32).select("source", "s", "rn", "n_src")
    nn = scored.agg(F.count(F.lit(1)).cast("long").alias("n"))
    glob = global_rank(scored.select("s", "vec_id"), ["s", "vec_id"]) \
        .select(F.col("s").alias("norm_s"), "gr")
    mapped = persrc.crossJoin(F.broadcast(nn)).select(
        "source",
        F.expr("(rn * n + n_src - 1) div n_src").cast("long").alias("pos"),
    )
    return (
        mapped.join(glob, mapped.pos == glob.gr)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            _snap6(F.sum(F.floor(F.col("norm_s") * 1e6 + 0.5)) / 1e6
                   / F.count(F.lit(1))).alias("mean_norm_s"),
            F.min("norm_s").alias("min_norm_s"),
            F.max("norm_s").alias("max_norm_s"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U. Value groups on the snapped score keep everything
# integer: avg tie rank x2 = 2*cum_before + c + 1; R1 x2 = sum(c1 *
# ar2) (bounded by n1 * (2n+1) < 2^63 up to ~1.5e9 rows); U1 x2 =
# R1x2 - n1(n1+1). Tie correction sum(c^3 - c) accumulates in
# DECIMAL(38)/HUGEINT. z = (U1 - n1 n2/2) / sqrt(var) -- sqrt is
# IEEE-exact in both engines; one snap at the end.
# ---------------------------------------------------------------------------

_MWU_ORACLE = """
WITH scored AS (
  SELECT floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS s,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS x
  FROM embeddings
),
grp AS (
  SELECT s, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(x) AS BIGINT) AS c1
  FROM scored GROUP BY s
),
cum AS (
  SELECT s, c, c1,
         CAST(sum(c) OVER (ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_incl
  FROM grp
),
agg AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c - c1) AS BIGINT) AS n2,
         CAST(sum(c1 * (2 * (cum_incl - c) + c + 1)) AS BIGINT) AS r1_x2,
         sum(CAST(c AS HUGEINT) * c * c - c) AS ties
  FROM cum
)
SELECT n1, n2,
       r1_x2,
       CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       floor(
         (CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) / 2
          - CAST(n1 AS DOUBLE) * n2 / 2)
         / nullif(sqrt(
             CAST(n1 AS DOUBLE) * n2 / 12
             * ((n1 + n2 + 1)
                - CAST(ties AS DOUBLE)
                  / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))), 0)
         * 1e6 + 0.5) / 1e6 AS z_s
FROM agg
"""


@register("stat_mann_whitney", oracle=_MWU_ORACLE)
def stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U (label 0 vs rest) over the first
    embedding component, exact integer rank algebra."""
    from ..operators.ranking import distributed_prefix_sum

    scored = load(spark, sf_dir, "embeddings").select(
        _snap6(F.element_at("embedding", 1).cast("double")).alias("s"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("x"),
    )
    grp = scored.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("x").cast("long").alias("c1"),
    )
    cum = distributed_prefix_sum(grp, ["s"], "c", cum_col="cum_incl")
    ar2 = 2 * (F.col("cum_incl") - F.col("c")) + F.col("c") + 1
    agg = cum.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("long").alias("n2"),
        F.sum(F.col("c1") * ar2).cast("long").alias("r1_x2"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
              - F.col("c")).alias("ties"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = (F.col("r1_x2") - n1 * (n1 + 1)).cast("double") / 2
    var = (
        n1.cast("double") * n2 / 12
        * ((n1 + n2 + 1)
           - F.col("ties").cast("double")
           / ((n1 + n2).cast("double") * (n1 + n2 - 1)))
    )
    return agg.select(
        "n1", "n2", "r1_x2",
        (F.col("r1_x2") - n1 * (n1 + 1)).cast("long").alias("u1_x2"),
        _snap6((u1 - n1.cast("double") * n2 / 2)
               / F.nullif(F.sqrt(var), F.lit(0.0))).alias("z_s"),
    )
