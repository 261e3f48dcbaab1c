"""Extension-surface tests: HLL sketch accuracy + mergeability, the
custom Python data source's partition planning, and streaming
dropDuplicatesWithinWatermark (bounded-state dedup).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from dataingestionengineprocess_spark.queries import all_queries
from dataingestionengineprocess_spark.sources.python_datasource import (
    register as register_feed_source,
)
from tests.conftest import write_event_batch as _write_batch

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# HLL sketches
# ---------------------------------------------------------------------------

def test_hll_estimates_within_tolerance(spark):
    """Per-group and merged-union estimates land within 5% of exact --
    now carried in-band as the query's within_bound booleans (the
    bounded-error oracle contract).

    The merged ALL row is the scale-critical property: a union of
    per-group sketches must estimate the GLOBAL distinct count without
    rescanning; its exact_distinct must equal a direct global
    countDistinct."""
    rows = {
        r["l_returnflag"]: r
        for r in all_queries()["agg_hll_mergeable"](spark, SF).collect()
    }
    assert set(rows) == {"A", "N", "R", "ALL"}
    assert all(r["within_bound"] for r in rows.values()), rows

    from dataingestionengineprocess_spark.catalog import load
    exact_all = (
        load(spark, SF, "lineitem").select("l_orderkey").distinct().count()
    )
    assert rows["ALL"]["exact_distinct"] == exact_all


def test_hll_sketch_partial_merge_equals_single_pass(spark):
    """Sketching two disjoint halves and unioning == sketching the whole:
    the associativity that makes per-partition/per-day partials valid."""
    df = spark.range(0, 10_000).withColumn("half", (F.col("id") % 2))
    whole = df.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("est")
    ).collect()[0]["est"]
    merged = (
        df.groupBy("half")
        .agg(F.hll_sketch_agg("id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    # Union promotes sketches to a common target mode, so the merged
    # estimate is not bit-identical to the single-pass one -- but both
    # must sit inside HLL's error envelope around the true 10k count.
    assert abs(whole - 10_000) <= 300
    assert abs(merged - 10_000) <= 300
    assert abs(whole - merged) <= 0.02 * whole


# ---------------------------------------------------------------------------
# Python data source
# ---------------------------------------------------------------------------

def test_python_datasource_partition_planning(spark):
    """The source plans the requested number of input partitions and
    every row lands in exactly one slice (no dupes/gaps across tasks)."""
    register_feed_source(spark)
    feed = (
        spark.read.format("partner_feed")
        .option("rows", 1000)
        .option("partitions", 5)
        .load()
    )
    assert feed.rdd.getNumPartitions() == 5
    got = feed.agg(
        F.count("*").alias("n"),
        F.countDistinct("id").alias("d"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    ).collect()[0]
    assert (got["n"], got["d"], got["lo"], got["hi"]) == (1000, 1000, 0, 999)


def test_python_datasource_streaming(spark, tmp_path):
    """The same feed consumed as a micro-batch stream: offsets advance
    deterministically and every row arrives exactly once."""
    register_feed_source(spark)
    stream = (
        spark.readStream.format("partner_feed")
        .option("rows", 350)
        .option("batch_rows", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("feed_stream_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.table("feed_stream_sink").count() >= 350:
            break
        time.sleep(0.5)
    q.stop()
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT id) AS d, min(id) AS lo, "
        "max(id) AS hi FROM feed_stream_sink"
    ).collect()[0]
    assert (got["n"], got["d"], got["lo"], got["hi"]) == (350, 350, 0, 349)


# ---------------------------------------------------------------------------
# State-store reader (Spark 4): offline introspection of streaming state
# from the checkpoint -- the operational window into a long-running job's
# keyed state (size, skew, specific keys) without touching the job.
# ---------------------------------------------------------------------------

def test_statestore_reader_exposes_agg_state(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_batch(
        spark, f"{src}/b1",
        [(1, "2024-01-01 10:00:00", 1.5), (2, "2024-01-01 10:30:00", 2.0),
         (1, "2024-01-01 11:00:00", 3.5)],
        time.time() - 100,
    )
    q = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .parquet(f"{src}/b[1]")
        .groupBy("event_id").agg(F.sum("value").alias("total"))
        .writeStream.format("memory").queryName("ss_agg_sink")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = (
        spark.read.format("statestore").load(ckpt)
        .select(F.col("key.event_id").alias("event_id"),
                F.col("value.sum").alias("total"))
    )
    got = {r["event_id"]: r["total"] for r in state.collect()}
    assert got == {1: 5.0, 2: 2.0}


# ---------------------------------------------------------------------------
# dropDuplicatesWithinWatermark (Spark 3.5+): dedup whose state expires
# with the watermark -- the only dedup that is viable on an unbounded
# stream, since plain dropDuplicates keys grow forever.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Parquet bloom filters on the warehouse sink: pyarrow 16 cannot read
# bloom metadata back, so the proof is (a) the bloom-bearing file is
# measurably larger for identical data and (b) reads are unaffected.
# ---------------------------------------------------------------------------

def test_warehouse_bloom_filter_write(spark, tmp_path):
    from dataingestionengineprocess_spark.sinks.warehouse import (
        write_warehouse,
    )
    df = spark.range(0, 200_000).select(
        (F.col("id") * 2654435761 % 1000003).alias("order_id"),
        (F.col("id") % 100).alias("bucket"),
    )
    plain = write_warehouse(df.coalesce(1), str(tmp_path / "w0"), "t")
    bloomed = write_warehouse(
        df.coalesce(1), str(tmp_path / "w1"), "t",
        bloom_filter_cols=["order_id"],
    )

    def _bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d) for f in fs if f.endswith(".parquet")
        )

    assert _bytes(bloomed) > _bytes(plain) + 50_000
    a = spark.read.parquet(plain).filter(F.col("order_id") == 42).count()
    b = spark.read.parquet(bloomed).filter(F.col("order_id") == 42).count()
    assert a == b


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): gated on protobuf, which its
# state-server protocol needs and this container lacks.
# ---------------------------------------------------------------------------

def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def test_transform_with_state_plan_constructs(spark):
    """The operator must always PLAN (API-correct usage); execution is
    exercised only where the protobuf dependency exists."""
    import pytest

    from dataingestionengineprocess_spark.streaming.analytics import (
        read_events_stream,
        run_to_table,
        stateful_user_stats_tws,
    )
    ev = read_events_stream(spark, SF)
    out = stateful_user_stats_tws(ev)
    assert set(out.columns) == {"user_id", "n_events", "total_value",
                                "max_value"}
    assert out.isStreaming
    if not _has_protobuf():
        pytest.skip("protobuf not installed; transformWithState "
                    "driver worker cannot start in this container")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = run_to_table(out, spark, output_mode="update")
        assert got.count() > 0
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass")




def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    now = time.time()
    # b1: original + in-batch duplicate id 1
    _write_batch(
        spark, f"{src}/b1",
        [(1, "2024-01-01 10:00:00", 1.0), (1, "2024-01-01 10:00:30", 1.0),
         (2, "2024-01-01 10:30:00", 1.0)],
        now - 300,
    )
    # b2: cross-batch duplicate of id 1 arriving within the watermark
    # window -> must still be suppressed by retained state
    _write_batch(
        spark, f"{src}/b2",
        [(1, "2024-01-01 10:31:00", 1.0), (3, "2024-01-01 10:32:00", 1.0)],
        now - 200,
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{src}/b[12]")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ddww_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT event_id, count(*) AS n FROM ddww_sink GROUP BY event_id"
    ).collect()
    counts = {r["event_id"]: r["n"] for r in out}
    assert counts == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# Exactly-once across restart: re-running from the SAME checkpoint must
# not double-count already-committed micro-batches; new files are
# picked up incrementally. This is the property that lets a 100 TB
# ingest survive job restarts without reconciliation sweeps.
# ---------------------------------------------------------------------------

def test_streaming_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    now = time.time()

    def _run():
        q = (
            spark.readStream.schema("event_id long, ts timestamp, value double")
            .parquet(f"{src}/b*")
            .groupBy("event_id").agg(F.sum("value").alias("total"))
            .writeStream.format("memory").queryName("restart_sink")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(spark, f"{src}/b1",
                 [(1, "2024-01-01 10:00:00", 1.0),
                  (1, "2024-01-01 10:10:00", 2.0)], now - 300)
    _run()
    first = {r["event_id"]: r["total"]
             for r in spark.table("restart_sink").collect()}
    assert first == {1: 3.0}

    # restart with one new file: b1 must NOT be re-ingested
    _write_batch(spark, f"{src}/b2",
                 [(1, "2024-01-01 10:20:00", 5.0),
                  (2, "2024-01-01 10:30:00", 7.0)], now - 200)
    _run()
    second = {r["event_id"]: r["total"]
              for r in spark.table("restart_sink").collect()}
    assert second == {1: 8.0, 2: 7.0}


# ---------------------------------------------------------------------------
# freqItems: single-pass lossy-counting heavy hitters. The guarantee is
# one-sided (no false negatives above the support threshold), so the
# check is containment of the true heavy hitters, not set equality.
# ---------------------------------------------------------------------------

def test_freq_items_contains_true_heavy_hitters(spark):
    from dataingestionengineprocess_spark.catalog import load

    ev = load(spark, SF, "events")
    support = 0.1
    approx = set(
        ev.stat.freqItems(["event_type"], support=support)
        .collect()[0][0]
    )
    total = ev.count()
    exact = {
        r["event_type"]
        for r in ev.groupBy("event_type").count()
        .filter(F.col("count") > support * total).collect()
    }
    assert exact <= approx


def test_cms_guarantees_vs_exact(spark):
    """CMS never undercounts; overshoot bounded by eps * N for the
    probe set (with margin: the bound is probabilistic)."""
    from pyspark.sql import functions as F

    from dataingestionengineprocess_spark.operators.cms import (
        build_cms,
        cms_estimate,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    n = li.count()
    eps = 0.001
    sk = build_cms(li, "l_suppkey", eps=eps)
    exact = {
        r.l_suppkey: r.c
        for r in li.groupBy("l_suppkey").agg(F.count("*").alias("c")).collect()
    }
    probes = sorted(exact)[:10] + [999999]  # incl. an absent key
    ests = cms_estimate(spark, sk, probes)
    for p, e in zip(probes, ests):
        true = exact.get(p, 0)
        assert e >= true, (p, e, true)
        assert e <= true + 3 * eps * n, (p, e, true)


def test_python_datasource_writer_round_trip(spark, tmp_path):
    """Spark 4 DataSourceWriter: write via the custom format, read the
    committed JSON-lines back, byte-equal rows; only part- files and
    _SUCCESS are visible (temps renamed away by the driver commit)."""
    import os

    from dataingestionengineprocess_spark.sources.python_datasource import (
        register,
    )

    register(spark)
    df = spark.range(100).selectExpr(
        "id", "concat('P', id % 7) AS partner", "CAST(id * 1.5 AS DOUBLE) AS amount")
    out = str(tmp_path / "deliveries")
    df.write.format("partner_feed").mode("append").save(out)

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert all(n == "_SUCCESS" or n.startswith("part-") for n in names)
    back = spark.read.json(out)
    assert back.count() == 100
    a = sorted(map(tuple, df.select("id", "partner", "amount").collect()))
    b = sorted(map(tuple, back.select("id", "partner", "amount").collect()))
    assert a == b


def test_python_datasource_writer_abort_leaves_nothing(spark, tmp_path):
    """A failing task must abort the job with NO visible files: temp
    files are cleaned by abort(), nothing was renamed, no _SUCCESS."""
    import os

    import pytest
    from pyspark.sql import functions as F
    from dataingestionengineprocess_spark.sources.python_datasource import (
        register,
    )

    register(spark)

    @F.udf("long")
    def boom(x):
        if x == 7:
            raise ValueError("poisoned row")
        return x

    df = spark.range(10).repartition(2).select(boom("id").alias("id"))
    out = str(tmp_path / "aborted")
    with pytest.raises(Exception):
        df.write.format("partner_feed").mode("append").save(out)
    leftover = [
        n for n in (os.listdir(out) if os.path.isdir(out) else [])
        if n.startswith("part-") or n == "_SUCCESS"
    ]
    assert leftover == []


def test_python_datasource_stream_writer_epoch_idempotent(spark, tmp_path):
    """DataSourceStreamWriter: drain a bounded stream through the
    custom sink; every row lands exactly once and each epoch leaves a
    _batch-N marker (the replay guard)."""
    import os

    from dataingestionengineprocess_spark.sources.python_datasource import (
        register,
    )

    register(spark)
    src = (
        spark.readStream.format("partner_feed")
        .option("rows", 300).option("batch_rows", 100).load()
    )
    out = str(tmp_path / "stream_out")
    q = (
        src.writeStream.format("partner_feed")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    import time

    deadline = time.time() + 90
    while time.time() < deadline:
        try:
            if spark.read.json(out).count() >= 300:
                break
        except Exception:
            pass
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()

    back = spark.read.json(out)
    assert back.count() == 300
    assert back.select("id").distinct().count() == 300
    markers = [n for n in os.listdir(out) if n.startswith("_batch-")]
    assert len(markers) >= 3  # one marker per committed epoch


def test_python_datasource_stream_writer_reconciles_half_commit(tmp_path):
    """The marker rename is the commit point: a crash AFTER the data
    renames but BEFORE the marker write leaves part- files no marker
    names. The replayed epoch's commit must sweep those orphans before
    publishing its own files, so the batch lands exactly once."""
    import json
    import os

    from pyspark.sql import Row
    from dataingestionengineprocess_spark.sources.python_datasource import (
        PartnerFeedStreamWriter,
    )

    out = str(tmp_path / "half_commit")
    writer = PartnerFeedStreamWriter({"path": out})
    rows = [Row(id=i, partner=f"P{i % 7}", amount=float(i)) for i in range(5)]

    # epoch 0 commits cleanly
    m0 = writer.write(iter(rows))
    writer.commit([m0], 0)

    # epoch 1, attempt A: data renamed into place, then crash before
    # the marker write (simulated by doing the rename by hand)
    m1a = writer.write(iter(rows))
    os.rename(m1a.tmp_path, m1a.tmp_path.replace("/.tmp-", "/part-"))

    # epoch 1, attempt B (checkpoint replay): fresh task output, real commit
    m1b = writer.write(iter(rows))
    writer.commit([m1b], 1)

    parts = sorted(n for n in os.listdir(out) if n.startswith("part-"))
    markers = sorted(n for n in os.listdir(out) if n.startswith("_batch-"))
    assert markers == ["_batch-0", "_batch-1"]
    # exactly the two committed epochs' files survive -- attempt A's
    # orphan was reconciled away, and every surviving part- file is
    # named by a marker
    claimed = set()
    for mk in markers:
        with open(os.path.join(out, mk)) as f:
            claimed.update(json.load(f)["files"])
    assert set(parts) == claimed
    assert len(parts) == 2
    total = sum(
        1 for p in parts for _ in open(os.path.join(out, p))
    )
    assert total == 10  # 5 rows per epoch, no duplicates


def test_python_datasource_legacy_count_marker_never_swept(spark, tmp_path):
    """Upgrade safety: a directory committed by the pre-reconcile
    writer has a bare-count marker ('10') that names no files. Commits
    over it must neither crash on the legacy format nor ever sweep the
    legacy part- files as orphans -- the first overwrite of _SUCCESS
    adopts them into the new listing format."""
    import json
    import os

    from dataingestionengineprocess_spark.sources.python_datasource import (
        register,
    )

    register(spark)
    out = str(tmp_path / "legacy")
    os.makedirs(out)
    with open(os.path.join(out, "part-legacy.jsonl"), "w") as f:
        f.write('{"id": 999, "partner": "P0", "amount": 1.0}\n')
    with open(os.path.join(out, "_SUCCESS"), "w") as f:
        f.write("1")  # legacy bare-count marker

    df = spark.range(5).selectExpr(
        "id", "concat('P', id % 7) AS partner",
        "CAST(id * 1.5 AS DOUBLE) AS amount")
    # two commits: the first overwrites the legacy marker (and must
    # adopt the legacy file), the second runs reconcile over the
    # now-parseable marker set
    df.write.format("partner_feed").mode("append").save(out)
    df.write.format("partner_feed").mode("append").save(out)

    assert os.path.exists(os.path.join(out, "part-legacy.jsonl"))
    back = spark.read.json(out)
    assert back.count() == 11  # 1 legacy + 2 x 5
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert "part-legacy.jsonl" in json.load(f)["files"]


def test_python_datasource_batch_append_markers_accumulate(spark, tmp_path):
    """Append-mode batch runs share one _SUCCESS: the second commit
    must keep claiming the first run's files (merged marker), or a
    later reconcile would sweep them as orphans."""
    import os

    from dataingestionengineprocess_spark.sources.python_datasource import (
        register,
    )

    register(spark)
    df = spark.range(10).selectExpr(
        "id", "concat('P', id % 7) AS partner",
        "CAST(id * 1.5 AS DOUBLE) AS amount")
    out = str(tmp_path / "appended")
    df.write.format("partner_feed").mode("append").save(out)
    df.write.format("partner_feed").mode("append").save(out)
    df.write.format("partner_feed").mode("append").save(out)

    back = spark.read.json(out)
    assert back.count() == 30
    parts = [n for n in os.listdir(out) if n.startswith("part-")]
    import json

    with open(os.path.join(out, "_SUCCESS")) as f:
        success = json.load(f)
    assert set(success["files"]) == set(parts)
    assert success["rows"] == 30


def test_python_datasource_batch_commit_never_sweeps_concurrent_files(
        tmp_path):
    """Batch appends carry no serial-commit guarantee: job A's part-
    files, renamed into place but not yet claimed by A's marker (A is
    mid-commit), must SURVIVE job B's commit to the same directory.
    Only the streaming path (driver-serial epochs) sweeps orphans."""
    import json
    import os

    from pyspark.sql import Row
    from dataingestionengineprocess_spark.sources.python_datasource import (
        PartnerFeedWriter,
    )

    out = str(tmp_path / "concurrent_batch")
    rows = [Row(id=i, partner=f"P{i % 7}", amount=float(i)) for i in range(5)]

    # job 0 commits cleanly so markers exist on disk
    w0 = PartnerFeedWriter({"path": out})
    w0.commit([w0.write(iter(rows))])

    # job A: data rename done, marker not yet written (mid-commit)
    wa = PartnerFeedWriter({"path": out})
    ma = wa.write(iter(rows))
    a_final = ma.tmp_path.replace("/.tmp-", "/part-")
    os.rename(ma.tmp_path, a_final)

    # job B commits concurrently -- it must NOT delete A's file
    wb = PartnerFeedWriter({"path": out})
    wb.commit([wb.write(iter(rows))])

    assert os.path.exists(a_final), (
        "concurrent batch commit swept another job's in-flight file"
    )
    # B's marker (shared _SUCCESS) claims its own + job 0's files only
    with open(os.path.join(out, "_SUCCESS")) as f:
        claimed = set(json.load(f)["files"])
    assert os.path.basename(a_final) not in claimed
    parts = {n for n in os.listdir(out) if n.startswith("part-")}
    assert claimed < parts and len(parts) == 3


def test_stream_commit_defers_sweep_in_mixed_batch_dir(tmp_path):
    """A directory with batch history (`_SUCCESS` present) must make
    the streaming commit SKIP its orphan sweep: an in-flight batch
    append's renamed-but-unclaimed part- files are indistinguishable
    from stream orphans, and stream-vs-batch commits are not
    serialized."""
    import os

    from pyspark.sql import Row
    from dataingestionengineprocess_spark.sources.python_datasource import (
        PartnerFeedStreamWriter,
        PartnerFeedWriter,
    )

    out = str(tmp_path / "mixed")
    rows = [Row(id=i, partner=f"P{i % 7}", amount=float(i)) for i in range(5)]

    # batch job 0 commits (_SUCCESS now exists)
    wb = PartnerFeedWriter({"path": out})
    wb.commit([wb.write(iter(rows))])

    # batch job A mid-commit: renamed, not yet claimed by _SUCCESS
    wa = PartnerFeedWriter({"path": out})
    ma = wa.write(iter(rows))
    a_final = ma.tmp_path.replace("/.tmp-", "/part-")
    os.rename(ma.tmp_path, a_final)

    # a streaming epoch commits into the same directory
    ws = PartnerFeedStreamWriter({"path": out})
    ws.commit([ws.write(iter(rows))], 0)

    assert os.path.exists(a_final), (
        "stream commit swept a concurrent batch append's file"
    )
