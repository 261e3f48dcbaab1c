"""IngestionEngine facade: the register/run/query surface a reference
user migrates onto."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dataingestionengineprocess_spark.engine import IngestionEngine
from dataingestionengineprocess_spark.operators.quality import not_null
from dataingestionengineprocess_spark.pipeline import FeedConfig, SinkConfig

CSV = """id,v
1,10.0
2,20.0
"""


@pytest.fixture()
def engine(spark, tmp_path) -> IngestionEngine:
    return IngestionEngine(
        spark,
        SinkConfig(warehouse_dir=str(tmp_path / "wh"),
                   oltp_dir=str(tmp_path / "oltp")),
    )


def _feed() -> FeedConfig:
    return FeedConfig(
        name="mini",
        schema=T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]),
        key_cols=["id"], order_col="id", rules=[not_null("id")],
    )


def test_batch_roundtrip_and_status(engine, tmp_path):
    src = tmp_path / "drop.csv"
    src.write_text(CSV)
    engine.register_feed(_feed())
    status = engine.run_batch("mini", str(src), run_id="r1")
    assert status.rows_loaded == 2
    assert engine.warehouse_table("mini").count() == 2
    assert engine.status().filter("run_id = 'r1'").count() == 1


def test_duplicate_feed_rejected(engine):
    engine.register_feed(_feed())
    with pytest.raises(ValueError, match="already registered"):
        engine.register_feed(_feed())


def test_unknown_names_raise(engine):
    with pytest.raises(KeyError, match="unknown feed"):
        engine.run_batch("nope", "/x")
    with pytest.raises(KeyError, match="unknown query"):
        engine.query("nope", "/x")


def test_query_and_sql_surface(engine, sf_dir):
    df = engine.query("q1_pricing_summary", sf_dir)
    assert df.count() > 0
    n = engine.sql(
        "SELECT count(*) AS n FROM lineitem", sf_dir
    ).collect()[0].n
    assert n > 0


def test_warehouse_schema_evolution(engine, spark, tmp_path):
    """A partner adding a column mid-feed: later run partitions carry
    wider parquet; merge_schema=True surfaces the union with NULLs for
    pre-evolution rows."""
    from pyspark.sql import functions as F

    from dataingestionengineprocess_spark.sinks.warehouse import write_warehouse

    wh = str(tmp_path / "wh")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string") \
        .withColumn("_run_id", F.lit("run-001"))
    v2 = spark.createDataFrame([(2, "b", 9.5)],
                               "id long, name string, score double") \
        .withColumn("_run_id", F.lit("run-002"))
    write_warehouse(v1, wh, "t", partition_cols=["_run_id"])
    write_warehouse(v2, wh, "t", partition_cols=["_run_id"])

    evolved = IngestionEngine(spark, SinkConfig(warehouse_dir=wh))
    merged = evolved.warehouse_table("t", merge_schema=True)
    assert set(merged.columns) == {"id", "name", "score", "_run_id"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_sweep_and_replay_via_facade(engine, tmp_path):
    """The lifecycle surface a reference user drives: ledgered sweep
    (exactly-once per file), then quarantine replay after a rule fix."""
    from dataingestionengineprocess_spark.operators.quality import in_range

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.csv").write_text("id,v\n1,10.0\n2,-5.0\n")

    feed = _feed()
    feed.rules = [not_null("id"), in_range("v", 0.0, 100.0)]
    engine.register_feed(feed)

    s1 = engine.run_sweep("mini", str(landing))
    assert s1 is not None
    assert s1.rows_loaded == 1 and s1.rows_quarantined == 1
    assert engine.run_sweep("mini", str(landing)) is None  # ledgered

    feed.rules = [not_null("id"), in_range("v", -100.0, 100.0)]
    s2 = engine.replay_quarantine("mini")
    assert s2.rows_loaded == 1 and s2.rows_quarantined == 0
    assert engine.warehouse_table("mini").count() == 2
    # both runs (sweep + replay) signed the status table
    assert engine.status().count() == 2
