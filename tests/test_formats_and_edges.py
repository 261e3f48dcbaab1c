"""Format breadth (ORC round-trip, text-file source) and text-function
edge inputs (empty / whitespace / single-token / unicode documents)
the generated fixtures never contain."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataingestionengineprocess_spark.catalog import load
from dataingestionengineprocess_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def test_orc_round_trip(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "nation")
    path = os.path.join(str(tmp_path), "nation_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_text_file_source(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    df = spark.read.text(str(p))
    assert [r["value"] for r in df.orderBy("value").collect()] == [
        "alpha", "beta", "gamma"
    ]


def test_text_functions_on_edge_inputs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "solo"), (4, "naïve café über tokens here")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_count("text").alias("n"),
            quality_score("text").alias("q"),
            lang_id("text").alias("lang"),
            fingerprint("text").alias("fp"),
        ).collect()
    }
    # split(' ') semantics: "" -> [""] (1 empty token), "   " -> 4.
    assert rows[1]["n"] == 1 and rows[2]["n"] == 4
    assert rows[3]["n"] == 1 and rows[4]["n"] == 5
    # Scores stay finite and bounded on degenerate input (no NaN/null).
    for r in rows.values():
        assert r["q"] is not None and 0.0 <= r["q"] <= 1.0
        assert r["fp"] is not None and len(r["fp"]) == 32
    assert rows[1]["lang"] == "und"  # no marker hits
    # Whitespace-only and empty normalize to the same fingerprint.
    assert rows[1]["fp"] == rows[2]["fp"]


def test_dedup_cluster_handles_no_pairs(spark):
    from dataingestionengineprocess_spark.operators.components import (
        connected_components,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty, "id_a", "id_b").count() == 0
