"""merge_upsert: keep-latest-by-key upsert into a parquet warehouse
table — inserts new keys, updates stale rows, idempotent on re-run."""

from __future__ import annotations

import os

from dataingestionengineprocess_spark.sinks.warehouse import merge_upsert


def _rows(spark, wh, table):
    return {
        (r["k"], r["v"], r["ver"])
        for r in spark.read.parquet(os.path.join(wh, table)).collect()
    }


def test_upsert_updates_inserts_and_keeps_newer(spark, tmp_path):
    wh = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 5), (3, "c", 1)], ["k", "v", "ver"]
    )
    base.write.parquet(os.path.join(wh, "t"))

    updates = spark.createDataFrame(
        [(1, "a2", 2),   # newer -> replaces
         (2, "b0", 3),   # older than existing ver=5 -> ignored
         (4, "d", 1)],   # new key -> inserted
        ["k", "v", "ver"],
    )
    stats = merge_upsert(spark, wh, "t", updates, keys=["k"], order_col="ver")

    assert stats == {"rows_before": 3, "rows_updated": 3, "rows_after": 4}
    assert _rows(spark, wh, "t") == {
        (1, "a2", 2), (2, "b", 5), (3, "c", 1), (4, "d", 1)
    }


def test_upsert_is_idempotent(spark, tmp_path):
    wh = str(tmp_path)
    spark.createDataFrame([(1, "a", 1)], ["k", "v", "ver"]).write.parquet(
        os.path.join(wh, "t")
    )
    updates = spark.createDataFrame([(1, "a2", 2)], ["k", "v", "ver"])

    merge_upsert(spark, wh, "t", updates, keys=["k"], order_col="ver")
    first = _rows(spark, wh, "t")
    merge_upsert(spark, wh, "t", updates, keys=["k"], order_col="ver")

    assert _rows(spark, wh, "t") == first == {(1, "a2", 2)}


def test_equal_version_prefers_the_update(spark, tmp_path):
    wh = str(tmp_path)
    spark.createDataFrame([(1, "old", 7)], ["k", "v", "ver"]).write.parquet(
        os.path.join(wh, "t")
    )
    updates = spark.createDataFrame([(1, "new", 7)], ["k", "v", "ver"])
    merge_upsert(spark, wh, "t", updates, keys=["k"], order_col="ver")
    assert _rows(spark, wh, "t") == {(1, "new", 7)}
