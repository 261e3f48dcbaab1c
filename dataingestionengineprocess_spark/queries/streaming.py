"""Streaming query surface: the events fixture replayed as a bounded
stream, drained with availableNow into a memory sink.

SURVEY.md §2.8. Tumbling/session/dedup results are deterministic
functions of the input, so they carry exact DuckDB oracles (the
streaming plan must converge to the batch answer once drained);
sliding windows and the stateful op are rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.analytics import (
    read_events_stream,
    run_to_table,
    session_windows,
    sliding_counts,
    stateful_user_totals,
    streaming_dedup_counts,
    tumbling_counts,
)
from . import register

# NOTE: epoch(ts)::BIGINT would ROUND in DuckDB (double->int cast is
# round-to-nearest, unlike Spark's truncating cast) and misbucket
# events in the last rounded-up microsecond-fraction of an hour.
_TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS win_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("stream_tumbling_counts", oracle=_TUMBLING_ORACLE)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_to_table(tumbling_counts(ev), spark)


_SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 OR
                   lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events, round(sum(value), 2) AS session_value
FROM sessioned
GROUP BY user_id, session_id
"""


@register("stream_session_windows", oracle=_SESSION_ORACLE)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_to_table(session_windows(ev, gap="30 minutes"), spark)


_DEDUP_ORACLE = """
SELECT event_type, count(DISTINCT event_id) AS n
FROM events GROUP BY event_type
"""


@register("stream_dedup_counts", oracle=_DEDUP_ORACLE)
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_to_table(streaming_dedup_counts(ev), spark)


# Sliding 1h/30m windows: every event lands in exactly two windows, the
# one starting at its 30-minute slot and the one 30 minutes earlier --
# which is precisely the unnest-of-two-starts the oracle materializes.
_SLIDING_ORACLE = """
SELECT win_start, event_type, count(*) AS n
FROM (
  SELECT unnest([slot, slot - INTERVAL 30 MINUTE]) AS win_start, event_type
  FROM (
    SELECT date_trunc('hour', ts)
           + CASE WHEN extract(minute FROM ts) >= 30
                  THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS slot,
           event_type
    FROM events
  )
)
GROUP BY win_start, event_type
"""


@register("stream_sliding_counts", oracle=_SLIDING_ORACLE)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_to_table(sliding_counts(ev), spark).orderBy(
        "win_start", "event_type"
    )


_STATEFUL_ORACLE = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
"""


@register("stream_stateful_user_totals", oracle=_STATEFUL_ORACLE)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    out = run_to_table(stateful_user_totals(ev), spark, output_mode="update")
    # update-mode emits one row per key per micro-batch; keep the final
    # (availableNow may split files across batches at larger SFs)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Batch event analytics (the same events surface consumed relationally
# -- a streaming deployment runs these per micro-batch via
# foreachBatch). W2's lag over (user, time) is the funnel primitive.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


@register("events_funnel_transitions", oracle=_FUNNEL_ORACLE)
def events_funnel_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix per user timeline (funnel edges)."""
    from pyspark.sql import Window as W

    from ..catalog import load

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


_DAU_ORACLE = """
SELECT date_trunc('day', ts) AS day,
       count(DISTINCT user_id) AS dau,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1
"""


@register("events_daily_active_users", oracle=_DAU_ORACLE)
def events_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + volume per day -- the canonical event-stream rollup. At
    100 TB the exact distinct is the expensive term (two-phase shuffle
    on (day, user)); agg_approx_distinct is the sketch alternative."""
    from ..catalog import load

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join (the missing ST shape): purchases joined
# to the same user's clicks within the preceding 30 minutes. Both sides
# are watermarked streams; the time-range condition is what lets Spark
# bound the join state (each side's buffer is evicted once the other
# side's watermark passes the interval) -- THE requirement for an
# unbounded 100 TB/day event feed. availableNow over the fixture file
# yields one micro-batch, so the append-mode result equals the batch
# self-join the oracle runs.
# ---------------------------------------------------------------------------

_SSJOIN_ORACLE = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id, c.ts AS click_ts, p.ts AS purchase_ts
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
"""


@register("stream_stream_join", oracle=_SSJOIN_ORACLE)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "click_ts", "purchase_ts")
    return run_to_table(joined, spark, output_mode="append")


# ---------------------------------------------------------------------------
# PIVOT: daily event-type matrix. The value list is EXPLICIT -- at
# scale an implicit pivot first runs a distinct job over the fact table
# to discover columns; pinning the list keeps it to one pass.
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT date_trunc('day', ts) AS day,
       count(*) FILTER (WHERE event_type = 'click')    AS click,
       count(*) FILTER (WHERE event_type = 'error')    AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
       count(*) FILTER (WHERE event_type = 'view')     AS view
FROM events
GROUP BY 1
"""


@register("events_pivot_daily_matrix", oracle=_PIVOT_ORACLE)
def events_pivot_daily_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


# ---------------------------------------------------------------------------
# Time-series resample + gap fill: the dense (hour x event_type) grid
# with zero-filled missing cells and a per-type running total. The grid
# is generated (sequence/explode), never scanned -- |hours| x |types|
# rows regardless of fact volume; the only fact-sized work is the
# hourly pre-aggregate.
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT t.event_type, h.hr, coalesce(c.n, 0) AS n,
       CAST(sum(coalesce(c.n, 0)) OVER (PARTITION BY t.event_type
                                        ORDER BY h.hr) AS BIGINT) AS cum_n
FROM hours h
CROSS JOIN types t
LEFT JOIN counts c ON c.hr = h.hr AND c.event_type = t.event_type
"""


@register("events_gapfill_hourly", oracle=_GAPFILL_ORACLE)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..catalog import load

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hr"), "event_type"
    ).agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr")
    )
    types = ev.select("event_type").distinct()
    w = W.partitionBy("event_type").orderBy("hr")
    return (
        hours.crossJoin(types)
        .join(hourly, ["hr", "event_type"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .withColumn("cum_n", F.sum("n").over(w))
        .select("event_type", "hr", "n", "cum_n")
    )


# ---------------------------------------------------------------------------
# Stream-static join (completes the streaming join matrix next to
# stream_stream_join): the live event stream enriched against a static
# dimension snapshot. The static side broadcasts once and is re-used by
# every micro-batch -- no stream state at all, unlike stream-stream.
# ---------------------------------------------------------------------------

_STREAM_STATIC_ORACLE = """
SELECT c.c_mktsegment, count(*) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("stream_static_enrich", oracle=_STREAM_STATIC_ORACLE)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load

    ev = read_events_stream(spark, sf_dir)
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return run_to_table(agg, spark)


# ---------------------------------------------------------------------------
# Continuous rollup: the hypertable/continuous-aggregate pattern. The
# query runs the INCREMENTAL maintenance path end to end (update-mode
# stream -> keyed MERGE into a parquet rollup table) and returns the
# maintained table; the oracle recomputes the rollup from scratch.
# Exact-cents sums make the two bit-identical despite micro-batch
# boundaries and merge order.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT date_trunc('hour', ts) AS win_start, event_type,
       count(*) AS n,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2)
           AS total_value
FROM events
GROUP BY 1, 2
"""


@register("stream_rollup_hourly", oracle=_ROLLUP_ORACLE)
def stream_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.rollup import continuous_rollup, read_rollup

    from ..catalog import scratch_dir

    from ..streaming.analytics import (
        FIXTURE_STATE_PARTITIONS,
        scoped_shuffle_partitions,
    )

    work = scratch_dir("rollup", sf_dir)
    with scoped_shuffle_partitions(spark, FIXTURE_STATE_PARTITIONS):
        q = continuous_rollup(spark, sf_dir, f"{work}/wh", f"{work}/ckpt")
        q.awaitTermination()
    return read_rollup(spark, f"{work}/wh")


# ---------------------------------------------------------------------------
# Streaming top-k: per tumbling window, the top-3 users by summed
# value. Ranking is not expressible inside an update-mode stream, so
# the idiomatic split is: the WINDOWED AGGREGATE runs streaming (state
# = one row per (window, user)), the rank runs on the drained result.
# Exact-cents sums keep the oracle bit-identical.
# ---------------------------------------------------------------------------

_TOPK_STREAM_ORACLE = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS win_start, user_id,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events
  GROUP BY 1, 2
),
ranked AS (
  SELECT win_start, user_id,
         round(cents / 100.0, 2) AS total_value,
         row_number() OVER (PARTITION BY win_start
                            ORDER BY cents DESC, user_id) AS rnk
  FROM agg
)
SELECT win_start, user_id, total_value, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
"""


@register("stream_topk_users", oracle=_TOPK_STREAM_ORACLE)
def stream_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.analytics import read_events_stream, run_to_table

    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        .select(F.col("win.start").alias("win_start"), "user_id", "cents")
    )
    drained = run_to_table(agg, spark)
    # hour windows are a bounded-small universe but a hot hour's user
    # population is not: rank the drained rollup distributed
    # (descending cents via negation) instead of a per-window sort.
    # The offsets table is one row per hour window and grows with the
    # drained horizon -- since round 7 `grouped_rank` counts the
    # groups and auto-switches broadcast -> shuffle join above
    # GROUPED_RANK_BROADCAST_MAX, so minute-granularity decades can
    # no longer force an unbounded broadcast.
    from ..operators.ranking import grouped_rank

    ranked = grouped_rank(
        drained.withColumn("__neg", -F.col("cents")),
        ["win_start"], ["__neg", "user_id"], "rnk")
    return (
        ranked.filter(F.col("rnk") <= 3)
        .select(
            "win_start", "user_id",
            F.round(F.col("cents") / 100.0, 2).alias("total_value"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Exactly-once streaming MERGE into a versioned table, inside the
# oracle gate: replay the events fixture as two deterministic file
# batches, keep-latest-upsert per user into snapshot versions, read
# the final table. The drained result is a pure function of the
# fixture, so DuckDB oracles it with a keep-latest window -- any
# divergence in the snapshot/merge/epoch machinery hash-mismatches.
# ---------------------------------------------------------------------------

_UPSERT_VERSIONED_ORACLE = """
SELECT user_id, event_id, ts, event_type, round(value, 2) AS value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("stream_upsert_versioned_latest", oracle=_UPSERT_VERSIONED_ORACLE)
def stream_upsert_versioned_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user maintained as a versioned keep-latest
    table fed by a micro-batch stream (ST7+ exactly-once path).

    The fixture splits into two deterministic files (even/odd
    event_id) streamed one per trigger, so at least one real MERGE
    (not just the bootstrap publish) executes; keep-latest by the
    total order (ts, event_id) makes the final state independent of
    batch arrival order. Scratch dirs are wiped per call, so repeat
    invocations re-run the whole stream identically.
    """
    import os

    from ..catalog import load, scratch_dir
    from ..pipeline import upsert_stream_into_versioned
    from ..sinks.versioned import VersionedTable

    scratch = scratch_dir("vupsert", sf_dir)
    src = os.path.join(scratch, "src")
    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    for parity in (0, 1):
        (events.filter(F.col("event_id") % 2 == parity)
         .coalesce(1).write.mode("append").parquet(src))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ord", F.struct("ts", "event_id"))
    )
    tbl = os.path.join(scratch, "tbl")
    upsert_stream_into_versioned(
        stream, tbl, keys=["user_id"], order_col="ord",
        checkpoint_dir=os.path.join(scratch, "ck"),
    ).awaitTermination()

    return (
        VersionedTable(spark, tbl).read()
        .select("user_id", "event_id", "ts", "event_type",
                F.round("value", 2).alias("value"))
    )


# ---------------------------------------------------------------------------
# Streaming incremental near-dup admission: the daily-crawl pipeline as
# a STREAM. Each micro-batch of documents is admitted/rejected against
# the accumulated seen-corpus by exact n-gram Jaccard, then added to
# it -- dedup state grows with the corpus while per-batch cost tracks
# the batch (operators/dedup.incremental_jaccard_admission's broadcast
# semi-join prune). Epochs are IN THE DATA (doc_id % 3) and file
# modification times force the file source to deliver them in epoch
# order, so the whole run is deterministic and the final admission
# table has an exact DuckDB oracle: a doc is rejected iff a
# strictly-earlier-epoch doc matches at >= 0.6.
# ---------------------------------------------------------------------------

_STREAM_ADMIT_ORACLE = """
WITH sh AS (
  SELECT doc_id AS id, doc_id % 3 AS epoch,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in range(1, len(t) - 1)])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS new_id, b.id AS corp_id, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND b.epoch < a.epoch
  GROUP BY 1, 2
),
scored AS (
  SELECT i.new_id, i.corp_id,
         round(i.n_inter / (na.n + nb.n - i.n_inter), 4) AS jaccard
  FROM inter i
  JOIN sizes na ON na.id = i.new_id
  JOIN sizes nb ON nb.id = i.corp_id
),
best AS (
  SELECT new_id, corp_id AS match_id, jaccard
  FROM (
    SELECT new_id, corp_id, jaccard,
           row_number() OVER (PARTITION BY new_id
                              ORDER BY jaccard DESC, corp_id) AS rn
    FROM scored WHERE jaccard >= 0.6
  ) WHERE rn = 1
)
SELECT d.doc_id, CAST(d.doc_id % 3 AS BIGINT) AS epoch,
       CASE WHEN b.match_id IS NULL THEN 'admit' ELSE 'reject' END AS status,
       CAST(b.match_id AS BIGINT) AS match_id,
       b.jaccard
FROM documents d
LEFT JOIN best b ON d.doc_id = b.new_id
"""


def stage_epoch_files(spark: SparkSession, sf_dir: str, *,
                      source_table: str, tag: str,
                      frame_fn, n_epochs: int = 3,
                      ident_extra: tuple[str, ...] = ()) -> str:
    """Test/bench SCAFFOLDING shared by every multi-epoch stream
    fixture, deliberately outside any measured query body: materialize
    ``frame_fn()``'s DataFrame (which must carry an integer ``epoch``
    column plus the payload columns) as an ``n_epochs``-file parquet
    drop directory — one file per epoch, strictly-increasing mtimes so
    the file source replays epochs in order. Staged ONCE per source
    fixture and reused across calls. Two hazards of a naive cache are
    handled explicitly:

    - STALENESS: the cache key is a fingerprint of the source parquet
      (path + per-file size + mtime) plus ``ident_extra`` (bump it
      when the epoch-assignment rule changes), so a regenerated
      fixture at the same sf_dir stages fresh instead of silently
      draining old epochs against a new oracle table.
    - CONCURRENCY: staging builds in a process-unique temp directory
      and publishes with ONE atomic rename; a concurrent stager that
      loses the race discards its build. No partially-staged or
      doubly-appended directory is ever visible under the final path.
    """
    import glob
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from ..catalog import table_path

    src_table = table_path(sf_dir, source_table)
    ident = [src_table, *ident_extra]
    for fp in sorted(glob.glob(src_table)
                     or glob.glob(os.path.join(src_table, "*"))
                     or [src_table]):
        try:
            st = os.stat(fp)
            ident.append(f"{fp}#{st.st_size}#{st.st_mtime_ns}")
        except OSError:
            ident.append(f"{fp}#gone")
    suffix = hashlib.md5("|".join(ident).encode()).hexdigest()[:12]
    src = os.path.join(tempfile.gettempdir(), f"engine_{tag}_{suffix}")
    if os.path.isdir(src):
        return src
    build = f"{src}.build-{uuid.uuid4().hex}"
    frame = frame_fn()
    payload = [c for c in frame.columns if c != "epoch"]
    stamped: set[str] = set()
    for k in range(n_epochs):
        (frame.filter(F.col("epoch") == k).select(*payload)
         .coalesce(1).write.mode("append").parquet(build))
        # Strictly-increasing mtimes per EPOCH (part-file names are
        # uuid-random, so "new since last write" is the only reliable
        # write-order signal): the file source orders pending files by
        # modification time, so epochs arrive in order.
        for name in os.listdir(build):
            if name.endswith(".parquet") and name not in stamped:
                t = 1e9 + k * 10
                os.utime(os.path.join(build, name), (t, t))
                stamped.add(name)
    try:
        os.rename(build, src)  # atomic publish; loser of a race fails
    except OSError:
        shutil.rmtree(build, ignore_errors=True)
    return src


def stage_incremental_epochs(spark: SparkSession, sf_dir: str) -> str:
    """Documents as a 3-epoch drop directory (epoch = doc_id % 3).
    Keeps the bench figure for `stream_incremental_dedup` the
    ADMISSION cost (drain + per-batch corpus join), not fixture file
    plumbing. Shared mechanics in `stage_epoch_files`."""
    from ..catalog import load

    def frame():
        return (
            load(spark, sf_dir, "documents")
            .select("doc_id", "text",
                    (F.col("doc_id") % 3).alias("epoch"))
        )

    return stage_epoch_files(spark, sf_dir, source_table="documents",
                             tag="epochsrc", frame_fn=frame)


@register("stream_incremental_dedup", oracle=_STREAM_ADMIT_ORACLE)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain a 3-epoch document stream through per-batch near-dup
    admission against the accumulated corpus; return every admission
    decision. The epoch drop directory is staged by
    `stage_incremental_epochs` (idempotent scaffolding, outside the
    measured path); per-run state (seen corpus, decisions, checkpoint)
    is wiped each call so repeat invocations re-run the whole drain
    identically."""
    import os

    from ..catalog import scratch_dir
    from ..operators.dedup import incremental_jaccard_admission

    src = stage_incremental_epochs(spark, sf_dir)
    scratch = scratch_dir("streamdedup", sf_dir)
    seen_path = os.path.join(scratch, "seen")
    out_path = os.path.join(scratch, "out")

    docs_schema = spark.read.parquet(src).schema

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # Per-epoch action budget (VERDICT r10 #2): the old body spent
        # FOUR serial actions per batch (eager localCheckpoint +
        # isEmpty probe + 2 writes). Now TWO: the checkpoint is LAZY
        # (the decisions write materializes batch + admission in one
        # job; the corpus append then reads the persisted blocks), and
        # the isEmpty probe is gone -- an empty batch just appends
        # zero-row files, which changes nothing downstream (the final
        # readback unions every part file), so probing for emptiness
        # bought a whole cluster round-trip to save nothing.
        batch = batch_df.localCheckpoint(eager=False)
        sess = batch_df.sparkSession
        jvm = sess.sparkContext._jvm
        sp = jvm.org.apache.hadoop.fs.Path(seen_path)
        fs = sp.getFileSystem(sess.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(sp):
            corpus = sess.read.parquet(seen_path)
            decisions = incremental_jaccard_admission(
                corpus, batch, n=3, threshold=0.6
            )
        else:
            decisions = batch.select(
                "doc_id", F.lit("admit").alias("status"),
                F.lit(None).cast("long").alias("match_id"),
                F.lit(None).cast("double").alias("jaccard"),
            )
        decisions.write.mode("append").parquet(out_path)
        batch.write.mode("append").parquet(seen_path)

    from ..streaming.analytics import (
        FIXTURE_STATE_PARTITIONS,
        scoped_shuffle_partitions,
    )

    with scoped_shuffle_partitions(spark, FIXTURE_STATE_PARTITIONS):
        (
            spark.readStream.schema(docs_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", os.path.join(scratch, "ck"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    return (
        spark.read.parquet(out_path)
        .select(
            "doc_id",
            F.pmod("doc_id", F.lit(3)).cast("long").alias("epoch"),
            "status", "match_id", "jaccard",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Streaming classifier gate: the curation quality filter
# (queries/mlprep.text_classifier_score) applied INSIDE a document
# stream -- the shape a live crawl-ingest pipeline runs, scoring and
# gating documents as files land rather than in a nightly batch pass.
# Stateless (filter + projection only), so the drained append-mode
# result is exactly the batch answer: full DuckDB oracle. At scale
# this is the same zero-shuffle map the batch plan proves
# (test_classifier_score_is_map_only), just fed by the file source.
# ---------------------------------------------------------------------------

def _gate_oracle() -> str:
    from .mlprep import classifier_score_sql

    score = classifier_score_sql("string_split(text, ' ')")
    return f"""
WITH s AS (
  SELECT doc_id, lang, {score} AS score FROM documents
)
SELECT doc_id, lang, round(score, 6) AS score
FROM s WHERE score >= 0.5
"""


@register("stream_classifier_gate", oracle=_gate_oracle())
def stream_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table_path
    from .mlprep import classifier_score

    path = table_path(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    docs = spark.readStream.schema(schema).parquet(
        path.replace("documents.parquet", "documents.[p]arquet")
    )
    gated = (
        docs.withColumn("__score", classifier_score("text"))
        .filter(F.col("__score") >= 0.5)
        .select("doc_id", "lang", F.round("__score", 6).alias("score"))
    )
    return run_to_table(gated, spark, output_mode="append")
