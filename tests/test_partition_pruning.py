"""Scale-layout proof: the date-partitioned warehouse layout actually
prunes — statically for literal predicates, dynamically under a
selective dim join (SURVEY.md §4 "partition warehouse tables by date").
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataingestionengineprocess_spark.catalog import load
from dataingestionengineprocess_spark.sinks.warehouse import write_warehouse


@pytest.fixture(scope="module")
def part_orders_path(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    orders = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_warehouse(orders, wh, "orders_by_year", partition_cols=["o_year"])
    return f"{wh}/orders_by_year"


def test_static_partition_pruning(spark, part_orders_path):
    df = spark.read.parquet(part_orders_path).filter(F.col("o_year") == 1995)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    # runtime truth (inputFiles() reports pre-pruning): the executed
    # scan must touch ONLY the 1995 directory
    scanned = {
        r.f
        for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert scanned and all("o_year=1995" in f for f in scanned), scanned


def test_dynamic_partition_pruning(spark, part_orders_path):
    fact = spark.read.parquet(part_orders_path)
    # DPP inserts the pruning subquery only when the build side has a
    # selective predicate -- as a real dim lookup would
    dim = spark.createDataFrame(
        [(1995, "x"), (1996, "y")], "o_year int, tag string"
    ).filter(F.col("tag") == "x")
    joined = fact.join(dim, "o_year")
    joined.count()  # materialize so the adaptive plan is final
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    years = {r.o_year for r in joined.select("o_year").distinct().collect()}
    assert years == {1995}
