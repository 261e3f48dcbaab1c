"""PageRank invariants: mass conservation on symmetric graphs, degree
ordering on a known topology, and convergence stability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataingestionengineprocess_spark.operators.graph import pagerank


@pytest.fixture()
def star_edges(spark):
    # hub 0 connected to 1..4, symmetric
    rows = []
    for i in range(1, 5):
        rows += [(0, i), (i, 0)]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_pagerank_conserves_mass_on_symmetric_graph(spark, star_edges):
    ranks = pagerank(star_edges, iterations=12).collect()
    total = sum(r["rank"] for r in ranks)
    assert abs(total - 5.0) < 1e-6   # N nodes, no dangling leak


def test_pagerank_ranks_hub_highest(spark, star_edges):
    ranks = {r["node"]: r["rank"] for r in
             pagerank(star_edges, iterations=12).collect()}
    assert ranks[0] > max(ranks[i] for i in range(1, 5))
    leaf = [round(ranks[i], 9) for i in range(1, 5)]
    assert len(set(leaf)) == 1        # symmetric leaves tie exactly


def test_pagerank_query_returns_hubs(spark, sf_dir):
    from dataingestionengineprocess_spark.queries import all_queries

    out = all_queries()["graph_pagerank_parts"](spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 50
    assert rows[0]["rank"] >= rows[-1]["rank"]
