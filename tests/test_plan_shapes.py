"""Physical-plan proofs for the TPC-H analog battery: the plans the
100 TB story depends on actually materialize — predicates reach the
parquet scan, small sides broadcast, top-k avoids a global sort.
"""

from __future__ import annotations

import pytest

from dataingestionengineprocess_spark.queries import all_queries


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _plan(spark, sf_dir, qs, name: str) -> str:
    return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q6_predicates_pushed_to_scan(spark, sf_dir, qs):
    plan = _plan(spark, sf_dir, qs, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan, plan
    # All three predicate columns must appear inside the pushed-filter
    # list, not only as post-scan Filter conditions.
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q6_scan_prunes_columns(spark, sf_dir, qs):
    plan = _plan(spark, sf_dir, qs, "q6_forecast_revenue")
    schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    # 4 needed columns only -- no full-width lineitem read.
    assert "l_extendedprice" in schema and "l_returnflag" not in schema, schema


def test_q10_broadcasts_dims_and_takes_ordered(spark, sf_dir, qs):
    plan = _plan(spark, sf_dir, qs, "q10_returned_items")
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan  # top-20, not a global sort


def test_q17_decorrelated_aggregate_broadcasts(spark, sf_dir, qs):
    plan = _plan(spark, sf_dir, qs, "q17_small_qty_revenue")
    assert "BroadcastHashJoin" in plan, plan


def test_q22_anti_join_is_broadcast_free_of_cartesian(spark, sf_dir, qs):
    plan = _plan(spark, sf_dir, qs, "q22_inactive_customers")
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_curation_is_single_plan_with_pushdown(spark, sf_dir, qs):
    plan = _plan(spark, sf_dir, qs, "text_corpus_curation")
    # One scan of documents feeds the whole pipeline.
    assert plan.count("FileScan parquet") == 1, plan
