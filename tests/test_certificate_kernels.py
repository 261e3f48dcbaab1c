"""Unit tests for the round-8 certificate audit kernels.

`simhash_certificate_facts` and `ann_certificate_facts` take the
engine's FOUND set as an argument, so every invariant they assert can
be pinned directly with synthetic found sets -- including the failure
directions the fixture-backed registry queries can never exercise
(a noncanonical pair, an unsound pair, a wrong re-rank score) and the
zero-shingle edge cases the round-8 review fixed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataingestionengineprocess_spark.queries.dedup import (
    simhash_certificate_facts,
)
from dataingestionengineprocess_spark.queries.similarity import (
    ann_certificate_facts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _facts(df) -> dict:
    return {r["item"]: r for r in df.collect()}


# doc 0 and doc 3 are exact near-dups (J = 1.0 on their shingle sets)
# with id_a % 3 == 0, so the stratum universe is non-empty; docs 1-2
# are unrelated filler.
_CORPUS = [
    (0, "alpha beta gamma delta epsilon"),
    (1, "one two three four five six"),
    (2, "red green blue yellow purple"),
    (3, "alpha beta gamma delta epsilon"),
]


def test_simhash_kernel_accepts_perfect_found_set(spark):
    docs = _docs(spark, _CORPUS)
    found = _pairs(spark, [(0, 3)])
    facts = _facts(simhash_certificate_facts(spark, docs, found, "text",
                                             recall_floor_tenths=5))
    assert facts["exact_pairs_j090_present"]["n_exact"] == 1
    assert all(r["ok"] for r in facts.values()), facts


def test_simhash_kernel_flags_noncanonical_and_unsound(spark):
    docs = _docs(spark, _CORPUS)
    # reversed pair -> noncanonical; (1, 2) shares no shingle -> unsound
    found = _pairs(spark, [(3, 0), (1, 2)])
    facts = _facts(simhash_certificate_facts(spark, docs, found, "text",
                                             recall_floor_tenths=5))
    assert not facts["canonical_unique"]["ok"]
    assert not facts["soundness_j080"]["ok"]
    # recall: the canonical (0, 3) stratum pair was NOT found
    assert not facts["recall_floor_050"]["ok"]


def test_simhash_kernel_zero_shingle_pairs(spark):
    """Round-8 review fix: found pairs touching shingle-less docs
    (under 3 tokens) must not silently escape the soundness audit.
    Empty-vs-empty is a sound collision (identical empty feature
    sets); empty-vs-nonempty counts unsound."""
    docs = _docs(spark, _CORPUS + [(4, "tiny doc"), (5, "wee")])
    both_empty = _pairs(spark, [(0, 3), (4, 5)])
    facts = _facts(simhash_certificate_facts(spark, docs, both_empty,
                                             "text", recall_floor_tenths=5))
    assert facts["soundness_j080"]["ok"], facts

    mixed = _pairs(spark, [(0, 3), (1, 4)])  # doc 1 has shingles, 4 not
    facts = _facts(simhash_certificate_facts(spark, docs, mixed, "text",
                                             recall_floor_tenths=5))
    assert not facts["soundness_j080"]["ok"], facts


@pytest.fixture(scope="module")
def tiny_emb(spark):
    # 12 vectors in 4-d; vec_id < 10 are probes. Deterministic
    # integer-ish coordinates keep the exact top-5 unambiguous.
    rows = [(i, [float((i * 7 + d * 3) % 11 + 1) for d in range(4)], 0)
            for i in range(12)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).localCheckpoint(eager=True)


def _exact_top5(spark, emb):
    from pyspark.sql import Window

    from dataingestionengineprocess_spark.functions.vectors import (
        norm_side,
        quantized_cosine,
    )

    va = norm_side(emb, "vec_id", "embedding", "id_a", "va", "na")
    vb = norm_side(emb, "vec_id", "embedding", "id_b", "vb", "nb")
    w = Window.partitionBy("id_a").orderBy(F.desc("cq"), F.asc("id_b"))
    return (
        va.filter(F.col("id_a") < 10)
        .join(vb, F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", quantized_cosine().alias("cq"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


def test_ann_kernel_accepts_exact_answer(spark, tiny_emb):
    found = _exact_top5(spark, tiny_emb).select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id"),
        (F.col("cq") / 1e6).alias("cos_sim"), F.col("rn").alias("rank"))
    facts = _facts(ann_certificate_facts(spark, tiny_emb, found,
                                         recall_floor_tenths=9))
    assert all(r["ok"] for r in facts.values()), facts
    assert facts["recall_floor_090"]["fact"] == 50


def test_ann_kernel_flags_malformed_and_wrong_scores(spark, tiny_emb):
    exact = _exact_top5(spark, tiny_emb)
    # self-pair + non-dense rank -> malformed; corrupted score ->
    # scores_exact_rerank false; recall floor 0.9 missed (two queries'
    # neighbors dropped: 40/50 = 0.8 < 0.9 -- one query would land
    # exactly ON the floor, which passes)
    found = exact.filter(F.col("id_a") > 1).select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id"),
        (F.col("cq") / 1e6 + 0.01).alias("cos_sim"),
        (F.col("rn") + 1).alias("rank"),
    ).unionByName(spark.createDataFrame(
        [(0, 0, 1.0, 1)],
        "query_id long, neighbor_id long, cos_sim double, rank long"))
    facts = _facts(ann_certificate_facts(spark, tiny_emb, found,
                                         recall_floor_tenths=9))
    assert not facts["output_wellformed"]["ok"]
    assert not facts["scores_exact_rerank"]["ok"]
    assert not facts["recall_floor_090"]["ok"]
    # the engine-independent exact-universe facts are untouched by a
    # bad found set
    assert facts["recall_floor_090"]["fact"] == 50
