"""Round-4 continuation: behavioural invariants the oracle hash can't
see — the watermark query's drop counter matches the oracle's
prediction (the late drop is real, not vacuously zero), and the bloom
prefilter is load-bearing (passes strictly fewer rows than the scan
while never dropping a member).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dataingestionengineprocess_spark.catalog import table_path
from dataingestionengineprocess_spark.queries import all_queries
from dataingestionengineprocess_spark.queries.round4b import (
    _WM_DELAY,
    _stage_late_epochs,
)

SF = "/root/testdata/sf0.001"


def test_watermark_drop_count_matches_oracle_prediction(spark):
    """Drain the same staged epochs the query uses and assert the
    state operator's numRowsDroppedByWatermark equals the oracle-side
    count of two-epoch stragglers whose window closed before the
    epoch-0 watermark — and that it is > 0 (the scenario genuinely
    exercises the drop path)."""
    import pyspark.sql.types as T

    src = _stage_late_epochs(spark, SF)
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    agg = (
        stream.withWatermark("ts", _WM_DELAY)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName("wm_drop_probe").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    spark.catalog.dropTempView("wm_drop_probe")
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress if p["stateOperators"]
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{table_path(SF, 'events')}')"
    )
    expected = con.execute("""
        WITH ranked AS (
          SELECT event_id, ts,
                 row_number() OVER (ORDER BY ts, event_id) - 1 AS rk,
                 count(*) OVER () AS n
          FROM events
        ),
        ep AS (
          SELECT event_id, ts,
                 least((3 * rk) // n
                       + CASE WHEN event_id % 20 = 0 THEN 2 ELSE 0 END,
                       2) AS epoch
          FROM ranked
        ),
        emax AS (SELECT epoch, max(ts) AS mx FROM ep GROUP BY 1)
        SELECT count(*) FROM ep, emax e0
        WHERE e0.epoch = 0 AND ep.epoch = 2
          AND date_trunc('hour', ep.ts) + INTERVAL 1 HOUR
                <= e0.mx - INTERVAL 10 MINUTE
    """).fetchone()[0]
    con.close()
    assert expected > 0, "fixture produced no late rows — scenario vacuous"
    assert dropped == expected


def test_bloom_prefilter_is_load_bearing(spark):
    row = all_queries()["join_bloom_prefilter"](spark, SF).collect()[0]
    assert row["n_false_neg"] == 0
    assert row["n_match"] <= row["n_bloom_pass"] < row["n_lineitem"]
    assert row["n_bloom_pass"] == row["n_match"] + row["n_false_pos"]
