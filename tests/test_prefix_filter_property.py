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


# ---------------------------------------------------------------------------
# Containment companion: same candidate-generation skeleton as exact
# Jaccard, different normalizer. Property: containment_pairs matches a
# brute-force per-pair reference on arbitrary corpora, and containment
# >= jaccard for every emitted pair (it normalizes by the SMALLER set).
# ---------------------------------------------------------------------------


@st.composite
def corpus(draw):
    vocab = ["a", "b", "c", "d", "e"]
    docs = []
    for i in range(draw(st.integers(min_value=2, max_value=6))):
        n = draw(st.integers(min_value=3, max_value=10))
        docs.append(
            (i, " ".join(draw(st.sampled_from(vocab)) for _ in range(n)))
        )
    return docs


def _shingle_set(text, n=3):
    toks = text.split(" ")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@given(corpus(), st.sampled_from([0.3, 0.5, 0.8]))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_containment_matches_reference(spark, docs, threshold):
    from dataingestionengineprocess_spark.operators.dedup import (
        containment_pairs,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, threshold=threshold).collect()
    }
    want = {}
    for i, (ida, ta) in enumerate(docs):
        for idb, tb in docs[i + 1:]:
            sa, sb = _shingle_set(ta), _shingle_set(tb)
            if not sa or not sb:
                continue
            c = round(len(sa & sb) / min(len(sa), len(sb)), 4)
            if c >= threshold and len(sa & sb) > 0:
                want[(min(ida, idb), max(ida, idb))] = c
    assert got == want
    for (ida, idb), c in got.items():
        sa = _shingle_set(dict(docs)[ida])
        sb = _shingle_set(dict(docs)[idb])
        jac = len(sa & sb) / len(sa | sb)
        assert c >= round(jac, 4) - 1e-9
