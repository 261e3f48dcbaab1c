"""Property test: prefix-filtered Jaccard returns EXACTLY the pairs the
all-shingles reference plan returns, on arbitrary synthetic corpora --
duplicate docs, subset docs, empty docs, single-token docs, and
boilerplate-heavy vocabularies the fixture corpus never exercises.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataingestionengineprocess_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "x"]


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(min_value=2, max_value=8))
    docs = []
    for i in range(n_docs):
        toks = draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=12))
        docs.append((i, " ".join(toks)))
    # sometimes inject an exact duplicate -- the pair both plans MUST find
    if draw(st.booleans()) and docs:
        docs.append((n_docs, docs[0][1]))
    return docs


@given(corpus(), st.sampled_from([0.4, 0.6, 0.8]))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_prefix_filter_equals_reference(spark, docs, threshold):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ref = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, n=2, threshold=threshold).collect()
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(
            df, n=2, threshold=threshold).collect()
    )
    assert got == ref
