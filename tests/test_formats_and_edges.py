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


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Long-lived warehouse tables evolve: later files add columns.
    mergeSchema must union the schemas and null-fill the old files;
    the default (no merge) keeps reads cheap by trusting one footer."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(0, 3).select(F.col("id").alias("k")).write.parquet(p)
    spark.range(3, 6).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"k", "v"}
    rows = {r["k"]: r["v"] for r in merged.collect()}
    assert rows[0] is None and rows[4] == 40


def test_avro_source_is_gated_absent(spark, tmp_path):
    """The spark-avro external module is not deployed in this
    container; the engine must surface that as a clean gate, not a
    crash path we pretend works."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        spark.range(1).write.format("avro").save(str(tmp_path / "a"))
    except AnalysisException as ex:
        assert "avro" in str(ex).lower()
        pytest.skip("spark-avro module absent, as expected in this env")
    # If the module IS present (future env), exercise the round-trip.
    got = spark.read.format("avro").load(str(tmp_path / "a"))
    assert got.count() == 1


def test_warehouse_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC warehouse format: partitioned write + read back + predicate
    pushdown reaching the ORC scan (same contract as parquet)."""
    from dataingestionengineprocess_spark.sinks.warehouse import write_warehouse

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(300)],
        "id long, grp string, v double",
    )
    write_warehouse(df, str(tmp_path), "orc_t",
                    partition_cols=["grp"], file_format="orc",
                    bloom_filter_cols=["id"])
    back = spark.read.orc(str(tmp_path / "orc_t"))
    assert back.count() == 300
    assert set(back.columns) == {"id", "grp", "v"}

    q = back.filter(F.col("v") > 290.0).select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    assert "PushedFilters: [" in plan and "GreaterThan(v,290.0)" in plan, plan
    assert q.count() == 9

    import pytest as _pytest
    with _pytest.raises(ValueError):
        write_warehouse(df, str(tmp_path), "bad", file_format="avro")
