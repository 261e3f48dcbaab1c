"""Skew mitigation: salted joins for hot keys.

AQE's skew-join split (enabled engine-wide, session.ENGINE_CONFS)
handles most skew by splitting oversized shuffle partitions, but it
only works for sort-merge joins AFTER a shuffle materializes the skew.
Explicit salting is the planned-ahead variant for the pathological
case AQE can't fix: one key so hot that even a split partition's
build side won't fit, or a broadcast-ineligible dimension joined on a
power-law key. This is the standard fan-out trick:

- fact side: append a random salt in [0, n_salts) to the join key;
- dim side: replicate each row n_salts times (explode), once per salt;
- join on (key, salt): the hot key's rows now spread over n_salts
  shuffle partitions instead of one straggler.

Cost model at 100 TB: dim side grows n_salts x (keep it the SMALL
side), fact side gains one narrow column. n_salts ~ executor-count /
hot-key-share; over-salting wastes dim replication, under-salting
leaves stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def spread_input(df: DataFrame) -> DataFrame:
    """Repartition a narrow input up to the cluster's parallelism when
    the source delivered fewer partitions: a single parquet file under
    maxPartitionBytes arrives as ONE partition, serializing a heavy
    map side (shingle explode, plane scoring, PQ encoding) onto one
    core -- measured 3.7x on the PPJoin toksets build at sf0.1. At
    real scale inputs already carry >= defaultParallelism partitions
    and this is a no-op; the round-robin shuffle of the narrow input
    rows is the cheap price of never running single-threaded."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def _key_distribution(df: DataFrame, key_col: str):
    """(max per-key count, n_keys, n_rows) over NON-NULL keys -- NULL
    join keys never match an inner/left equi-join's other side (Spark
    inserts IsNotNull on the keys), so counting them would report
    phantom skew on optional-FK columns. One word-count-shaped pass,
    three scalars to the driver."""
    row = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col).agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"),
             F.count(F.lit(1)).alias("nk"),
             F.sum("c").alias("n"))
        .collect()[0]
    )
    return (int(row["mx"] or 0), int(row["nk"] or 0), int(row["n"] or 0))


def key_skew_factor(df: DataFrame, key_col: str) -> float:
    """The `quality_skew_report` statistic as a pre-join diagnosis:
    max-per-key count * n_keys / n_rows (1.0 = perfectly uniform,
    n_keys = one key owns everything), over non-null keys."""
    mx, nk, n = _key_distribution(df, key_col)
    if not n:
        return 0.0
    return float(mx) * float(nk) / float(n)


def needs_salting(df: DataFrame, key_col: str,
                  threshold: float = 8.0,
                  hot_share: float = 0.2) -> bool:
    """Report-driven strategy selection: salt the join when the key
    distribution is pathological -- the regime where one shuffle
    partition becomes the straggler AQE can only split after
    materializing it. Two triggers, either suffices:

    - skew factor above ``threshold``: the hottest key owns
      >threshold x its uniform share (meaningless when n_keys <=
      threshold, hence the second trigger);
    - the hottest key owns >= ``hot_share`` of all rows: catches the
      LOW-CARDINALITY funnels the ratio is structurally blind to
      (n_keys = 1 gives factor 1.0 -- 'perfectly uniform' -- while
      every row rides one partition).

    Uniform fact keys stay on the plain equi-join: salting there just
    replicates the dim side for nothing."""
    mx, nk, n = _key_distribution(df, key_col)
    if not n:
        return False
    return (float(mx) * float(nk) / float(n) > threshold
            or float(mx) / float(n) >= hot_share)


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join fact⋈dim on `on` with the dim side replicated across
    `n_salts` salts. Semantics identical to `fact.join(dim, on, how)`
    for inner/left joins (each fact row still matches each dim row
    exactly once -- it carries exactly one salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r} "
            "(right/outer would need fact-side replication instead)"
        )
    salted_fact = fact.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, [on, SALT_COL], how).drop(SALT_COL)


def range_bucket_join(facts: DataFrame, fact_col: str, bands: DataFrame,
                      lo_col: str, hi_col: str,
                      bucket_width: float) -> DataFrame:
    """Range join (fact value in [lo, hi)) as a bucketed EQUI-join.

    Spark plans a pure range predicate as broadcast-nested-loop --
    O(|facts| * |bands|) comparisons, which dies when bands stop being
    tiny. The standard rewrite: chop the domain into fixed-width
    buckets, explode each band into every bucket it overlaps, tag each
    fact with its bucket, equi-join on the bucket id, then re-check the
    exact range as a residual filter. Catalyst now sees a hash join on
    the bucket key: shuffle-free when the exploded bands broadcast,
    partitioned-hash otherwise. Cost shifts from n*m to
    n + m * (band_width / bucket_width) -- pick bucket_width near the
    typical band width.

    ``bands`` rows: [lo_col, hi_col) plus any payload columns, which
    pass through to the output alongside every fact column.
    """
    w = float(bucket_width)
    lo_b = F.floor(F.col(lo_col) / w)  # floor, not cast: negatives round down
    hi_b = F.floor((F.col(hi_col) - 1e-9) / w)
    exploded = bands.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))
    tagged = facts.withColumn("__bucket", F.floor(F.col(fact_col) / w))
    return (
        tagged.join(F.broadcast(exploded), "__bucket")
        .filter(
            (F.col(fact_col) >= F.col(lo_col))
            & (F.col(fact_col) < F.col(hi_col))
        )
        .drop("__bucket")
    )


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          bucket_width: int,
                          l_start: str = "l_start", l_end: str = "l_end",
                          r_start: str = "r_start", r_end: str = "r_end",
                          ) -> DataFrame:
    """Interval x interval OVERLAP join as a bucketed equi-join.

    The interval generalization of :func:`range_bucket_join` (which is
    point-in-interval): pairs where ``[l_start, l_end]`` and
    ``[r_start, r_end]`` overlap (closed-interval semantics:
    ``l_start <= r_end AND r_start <= l_end``). Spark plans the raw
    theta predicate as a nested-loop cross product; here both sides
    explode into the fixed-width grid cells they touch and meet in a
    hash join on the cell id.

    A pair that overlaps across k shared cells must be emitted ONCE.
    The usual ``distinct`` after the join is itself a full shuffle of
    the pair set; instead each pair is emitted only in the FIRST cell
    both intervals occupy -- ``bucket == max(floor(l_start/w),
    floor(r_start/w))`` -- which is computable per joined row, so the
    dedup costs a codegen'd filter, zero extra shuffles.

    Interval columns are numeric (use epoch seconds for time). Pick
    ``bucket_width`` near the typical interval length: each side then
    explodes to O(1) cells per row.
    """
    w = int(bucket_width)
    lcell = F.explode(
        F.sequence(F.floor(F.col(l_start) / w), F.floor(F.col(l_end) / w))
    )
    rcell = F.explode(
        F.sequence(F.floor(F.col(r_start) / w), F.floor(F.col(r_end) / w))
    )
    lx = left.withColumn("__cell", lcell)
    rx = right.withColumn("__cell", rcell)
    first_shared = F.greatest(
        F.floor(F.col(l_start) / w), F.floor(F.col(r_start) / w)
    )
    return (
        lx.join(rx, "__cell")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__cell") == first_shared)
        )
        .drop("__cell")
    )
