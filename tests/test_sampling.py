"""Hash-sampling properties: determinism, cross-table consistency,
stratified fractions, statistical tolerance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataingestionengineprocess_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k").cache()
    yield df
    df.unpersist()  # don't leak cache entries across test files


def test_deterministic_across_repartitioning(spark, ids):
    a = {r["k"] for r in hash_sample(ids, ["k"], 0.1).collect()}
    b = {r["k"] for r in hash_sample(ids.repartition(17), ["k"], 0.1).collect()}
    assert a == b and a


def test_fraction_within_binomial_tolerance(spark, ids):
    n = hash_sample(ids, ["k"], 0.25).count()
    assert abs(n / 20_000 - 0.25) < 0.02  # ~6 sigma for p=.25, n=20k


def test_consistent_across_tables_on_same_key(spark, ids):
    docs = ids.withColumn("text", F.concat(F.lit("d"), F.col("k")))
    embs = ids.withColumn("vec", F.col("k") * 2)
    kept_docs = {r["k"] for r in hash_sample(docs, ["k"], 0.2).collect()}
    kept_embs = {r["k"] for r in hash_sample(embs, ["k"], 0.2).collect()}
    assert kept_docs == kept_embs


def test_salts_give_independent_samples(spark, ids):
    a = {r["k"] for r in hash_sample(ids, ["k"], 0.1, salt=0).collect()}
    b = {r["k"] for r in hash_sample(ids, ["k"], 0.1, salt=1).collect()}
    overlap = len(a & b) / len(a)
    assert 0.02 < overlap < 0.25  # ~10% expected under independence


def test_stratified_fractions_respected(spark, ids):
    df = ids.withColumn(
        "lang", F.when(F.col("k") % 2 == 0, "en").otherwise("rare")
    )
    out = stratified_hash_sample(
        df, "lang", {"en": 0.1, "rare": 1.0}, key_cols=["k"]
    )
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["rare"] == 10_000          # keep-all stratum is exact
    assert abs(counts["en"] / 10_000 - 0.1) < 0.02


def test_default_fraction_drops_unlisted_strata(spark, ids):
    df = ids.withColumn("lang", F.lit("xx"))
    assert stratified_hash_sample(df, "lang", {"en": 0.5}, ["k"]).count() == 0


def test_bad_fraction_raises(spark, ids):
    with pytest.raises(ValueError):
        hash_sample(ids, ["k"], 1.5)
    with pytest.raises(ValueError):
        stratified_hash_sample(ids, "k", {"en": -0.1}, ["k"])


def test_systematic_weighted_sample_properties(spark):
    """~k rows come back; heavier keys are sampled proportionally more
    (2x weight => ~2x inclusion across disjoint key ranges); zero
    randomness: two runs agree exactly."""
    from pyspark.sql import functions as F

    from dataingestionengineprocess_spark.operators.sampling import (
        systematic_weighted_sample,
    )

    # ids 0..1999: weight 10; ids 2000..3999: weight 20
    df = spark.range(0, 4000).select(
        F.col("id"),
        F.when(F.col("id") < 2000, 10).otherwise(20).alias("w"),
    )
    got = systematic_weighted_sample(df, "w", "id", k=300)
    rows = got.collect()
    assert abs(len(rows) - 300) <= 1
    light = sum(1 for r in rows if r["id"] < 2000)
    heavy = len(rows) - light
    # heavy stratum holds 2/3 of the weight -> ~2x the light count
    assert 1.6 <= heavy / light <= 2.4
    again = systematic_weighted_sample(df, "w", "id", k=300).collect()
    assert sorted(r["id"] for r in rows) == sorted(r["id"] for r in again)


def test_systematic_weighted_sample_is_distributed(spark):
    """The prefix sum must be the two-pass partition-offset form: no
    single-partition exchange (the old global-window shape funnels the
    entire input through one task) may appear in the physical plan."""
    from pyspark.sql import functions as F

    from dataingestionengineprocess_spark.operators.sampling import (
        systematic_weighted_sample,
    )

    df = spark.range(0, 4000).select(
        F.col("id"), F.lit(10).alias("w")
    )
    got = systematic_weighted_sample(df, "w", "id", k=100)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan and "__pid" in plan, \
        "running sum must be a partition-local window keyed by __pid"


def test_systematic_weighted_sample_matches_sequential_oracle(spark):
    """The distributed two-pass cumsum must select EXACTLY the rows the
    sequential definition selects (driver-side replay)."""
    from pyspark.sql import functions as F

    from dataingestionengineprocess_spark.operators.sampling import (
        systematic_weighted_sample,
    )

    rows = [(i, 1 + (i * 7) % 13) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, w long")
    k = 200
    got = sorted(r.id for r in systematic_weighted_sample(df, "w", "id", k).collect())

    total = sum(w for _, w in rows)
    stride = max(1, total // k)
    want, cum = [], 0
    for i, w in sorted(rows):
        prev = cum
        cum += w
        if cum // stride > prev // stride:
            want.append(i)
    assert got == want
