"""Continuous rollup converges EXACTLY to the batch aggregate: the
incrementally-merged hourly table equals a one-shot groupBy over the
same events, bit for bit (exact-cents sums make the equality immune
to micro-batch boundaries and merge order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionengineprocess_spark.catalog import load
from dataingestionengineprocess_spark.streaming.rollup import (
    continuous_rollup, read_rollup,
)

SF = "/root/testdata/sf0.001"


def test_rollup_converges_to_batch_aggregate(spark, tmp_path):
    wh, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
    q = continuous_rollup(spark, SF, wh, ckpt)
    q.awaitTermination()

    got = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in read_rollup(spark, wh).collect()
    }
    batch = (
        load(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0, 2
            ).alias("total_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type",
                "n", "total_value")
    )
    want = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in batch.collect()
    }
    assert got == want
    assert len(got) > 100  # the fixture spans thousands of windows


def test_rollup_rerun_from_fresh_checkpoint_is_idempotent(spark, tmp_path):
    wh = str(tmp_path / "wh")
    q1 = continuous_rollup(spark, SF, wh, str(tmp_path / "c1"))
    q1.awaitTermination()
    before = sorted(
        tuple(r) for r in read_rollup(spark, wh).collect()
    )
    # replay everything from scratch (fresh checkpoint): the MERGE
    # replaces every window with identical values -> table unchanged
    q2 = continuous_rollup(spark, SF, wh, str(tmp_path / "c2"))
    q2.awaitTermination()
    after = sorted(
        tuple(r) for r in read_rollup(spark, wh).collect()
    )
    assert before == after
