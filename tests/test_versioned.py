"""Versioned-table layout (sinks/versioned.py): atomic publish,
snapshot isolation, crash tolerance, retention, online compact/merge.

These are the properties the two-rename swap in warehouse.py cannot
give (its docstring points here): the table path never disappears,
concurrent readers keep a consistent snapshot, and a crashed publish
is invisible rather than corrupting.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataingestionengineprocess_spark.sinks.versioned import VersionedTable


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "tbl"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, val string, ts long")


def test_publish_read_roundtrip_and_versioning(spark, table):
    v1 = table.publish(_df(spark, [(1, "a", 10), (2, "b", 10)]))
    assert v1 == 1
    v2 = table.publish(_df(spark, [(1, "a2", 20)]))
    assert v2 == 2
    assert table.versions() == [1, 2]
    assert table.current_version() == 2
    assert table.read().count() == 1                  # current = v2
    assert table.read(1).count() == 2                 # time travel
    assert {r.val for r in table.read(1).collect()} == {"a", "b"}


def test_snapshot_isolation_across_publish(spark, table):
    """A frame resolved before a new publish keeps reading its pinned
    snapshot -- the old version dir is immutable and still present."""
    table.publish(_df(spark, [(1, "old", 1)]))
    pinned = table.read()          # resolves v1 at plan time
    table.publish(_df(spark, [(1, "new", 2), (2, "x", 2)]))
    assert [r.val for r in pinned.collect()] == ["old"]
    assert pinned.count() == 1
    assert table.read().count() == 2


def test_uncommitted_version_is_invisible(spark, table):
    """A version dir without _SUCCESS (crashed publish) must be
    skipped by reads and listings, and the next publish must claim a
    HIGHER number (never reuse a possibly-half-written dir)."""
    table.publish(_df(spark, [(1, "a", 1)]))
    # simulate a crash: v2 exists with data files but no _SUCCESS
    half = os.path.join(table.path, "_v", "v0000000002")
    _df(spark, [(9, "ghost", 9)]).write.parquet(half)
    os.remove(os.path.join(half, "_SUCCESS"))

    assert table.versions() == [1]
    assert table.current_version() == 1
    assert [r.val for r in table.read().collect()] == ["a"]
    with pytest.raises(FileNotFoundError):
        table.read(2)

    v3 = table.publish(_df(spark, [(2, "b", 2)]))
    assert v3 == 3, "must not reuse the crashed version number"
    assert table.versions() == [1, 3]


def test_listing_is_single_source_of_truth(spark, table):
    """No pointer file exists to go stale: current resolves purely
    from the version-dir listing."""
    table.publish(_df(spark, [(1, "a", 1)]))
    table.publish(_df(spark, [(1, "b", 2)]))
    assert not os.path.exists(os.path.join(table.path, "_LATEST"))
    assert table.current_version() == 2
    assert [r.val for r in table.read().collect()] == ["b"]


def test_expire_keeps_newest_and_never_current(spark, table):
    for i in range(1, 5):
        table.publish(_df(spark, [(i, f"v{i}", i)]))
    out = table.expire(keep_last=2)
    assert out == {"expired": [1, 2], "kept": [3, 4]}
    assert table.versions() == [3, 4]
    assert table.current_version() == 4
    with pytest.raises(FileNotFoundError):
        table.read(1)
    with pytest.raises(ValueError):
        table.expire(keep_last=0)


def test_online_compact_preserves_data_and_old_snapshot(spark, table):
    df = spark.range(1000).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("r"), F.col("id")).alias("val"),
        F.col("id").alias("ts"),
    ).repartition(16)  # many small files
    table.publish(df)
    stats = table.compact(target_file_bytes=1 << 30)  # -> 1 file
    assert stats["from_version"] == 1 and stats["to_version"] == 2
    assert table.read().count() == 1000
    files = [
        f for f in os.listdir(os.path.join(table.path, "_v", "v0000000002"))
        if f.endswith(".parquet")
    ]
    assert len(files) == 1
    # pre-compaction snapshot still readable (online semantics)
    assert table.read(1).count() == 1000


def test_merge_keep_latest_semantics_and_metrics(spark, table):
    table.publish(_df(spark, [(1, "a", 10), (2, "b", 10), (3, "c", 10)]))
    updates = _df(spark, [(2, "b2", 20),   # newer -> replaces
                          (3, "c0", 5),    # older -> ignored
                          (4, "d", 20)])   # new key -> inserted
    stats = table.merge(updates, keys=["k"], order_col="ts")
    assert stats["rows_before"] == 3
    assert stats["rows_updated"] == 3
    assert stats["rows_after"] == 4
    got = {r.k: r.val for r in table.read().collect()}
    assert got == {1: "a", 2: "b2", 3: "c", 4: "d"}
    # idempotent: same batch again changes nothing but the version
    again = table.merge(updates, keys=["k"], order_col="ts")
    assert again["rows_after"] == 4
    assert {r.k: r.val for r in table.read().collect()} == got


def test_merge_tie_breaks_toward_update(spark, table):
    table.publish(_df(spark, [(1, "old", 10)]))
    table.merge(_df(spark, [(1, "new", 10)]), keys=["k"], order_col="ts")
    assert [r.val for r in table.read().collect()] == ["new"]


# ---------------------------------------------------------------------------
# Exactly-once: epochs committed atomically in the version name
# ---------------------------------------------------------------------------


def test_merge_epoch_replay_is_skipped(spark, table):
    """A replayed micro-batch epoch must be a no-op: the applied-epoch
    record lives in the committed version's name, so the dedup
    decision survives crashes between sink commit and checkpoint
    commit."""
    table.publish(_df(spark, [(1, "a", 10)]), epoch=1)
    assert table.last_epoch() == 1

    first = table.merge(_df(spark, [(2, "b", 20)]), keys=["k"],
                        order_col="ts", epoch=2)
    assert "skipped" not in first and table.last_epoch() == 2

    replay = table.merge(_df(spark, [(2, "DIFFERENT", 99)]), keys=["k"],
                         order_col="ts", epoch=2)
    assert replay["skipped"] is True
    assert {r.val for r in table.read().collect()} == {"a", "b"}
    # older epochs are equally dead
    stale = table.merge(_df(spark, [(3, "c", 1)]), keys=["k"],
                        order_col="ts", epoch=1)
    assert stale["skipped"] is True
    assert table.read().count() == 2


def test_upsert_stream_versioned_end_to_end(spark, tmp_path):
    """Streaming keep-latest into a versioned table: final state is
    correct, every batch became a snapshot, a checkpointed re-run adds
    nothing, and a simulated epoch replay is skipped."""
    from pyspark.sql import types as T

    from dataingestionengineprocess_spark.pipeline import (
        upsert_stream_versioned,
    )

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    tbl, ckpt = str(tmp_path / "vtbl"), str(tmp_path / "ckpt")
    (src / "a.csv").write_text("k,v,ver\n1,old,1\n2,b,1\n1,dup_newer,2\n")
    (src / "b.csv").write_text("k,v,ver\n1,new,3\n3,c,1\n")

    upsert_stream_versioned(
        spark, schema, str(src), tbl, keys=["k"], order_col="ver",
        checkpoint_dir=ckpt, max_files_per_trigger=1,
    ).awaitTermination()

    from dataingestionengineprocess_spark.pipeline import checkpoint_app_id

    app = checkpoint_app_id(ckpt)
    vt = VersionedTable(spark, tbl)
    got = {(r.k, r.v, r.ver) for r in vt.read().collect()}
    assert got == {(1, "new", 3), (2, "b", 1), (3, "c", 1)}
    assert len(vt.versions()) == 2          # one snapshot per batch
    assert vt.last_epoch(app) == 1          # epochs 0, 1 for THIS app

    # checkpointed re-run: file ledger delivers nothing new
    upsert_stream_versioned(
        spark, schema, str(src), tbl, keys=["k"], order_col="ver",
        checkpoint_dir=ckpt,
    ).awaitTermination()
    assert len(vt.versions()) == 2
    assert {(r.k, r.v, r.ver) for r in vt.read().collect()} == got

    # simulated at-least-once replay of the LAST epoch hits the guard
    replay = vt.merge(
        spark.createDataFrame([(9, "ghost", 9)], schema),
        keys=["k"], order_col="ver", epoch=1, app=app,
    )
    assert replay["skipped"] is True
    assert {(r.k, r.v, r.ver) for r in vt.read().collect()} == got

    # a FRESH checkpoint is a new producer: its epoch 0 must NOT be
    # suppressed by the old stream's epochs -- reprocessing proceeds
    # (and keep-latest makes it idempotent on the data)
    ckpt2 = str(tmp_path / "ckpt_fresh")
    upsert_stream_versioned(
        spark, schema, str(src), tbl, keys=["k"], order_col="ver",
        checkpoint_dir=ckpt2,
    ).awaitTermination()
    assert len(vt.versions()) > 2, \
        "new-checkpoint batches must merge, not be silently skipped"
    assert {(r.k, r.v, r.ver) for r in vt.read().collect()} == got


# ---------------------------------------------------------------------------
# Model-based property: random op sequences vs a pure-python model
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _ops():
    publish = st.tuples(
        st.just("publish"),
        st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)),
                 min_size=1, max_size=4),
    )
    merge = st.tuples(
        st.just("merge"),
        st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)),
                 min_size=1, max_size=4),
    )
    expire = st.tuples(st.just("expire"), st.integers(1, 3))
    return st.lists(st.one_of(publish, merge, expire),
                    min_size=1, max_size=6)


@given(_ops())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_versioned_table_matches_model(spark, tmp_path_factory, ops):
    """Any publish/merge/expire sequence must leave the current
    snapshot equal to a trivial in-memory model (dict keyed by k,
    keep-latest on ts with update-wins ties), and every surviving
    older version must replay to its historical model state."""
    tmp = tmp_path_factory.mktemp("vt_model")
    table = VersionedTable(spark, str(tmp / "tbl"))

    model: dict[int, tuple[int, int]] = {}   # k -> (ts, seq)
    history: dict[int, dict[int, tuple[int, int]]] = {}
    seq = 0

    def df_for(rows):
        return spark.createDataFrame(
            [(k, f"s{seq}_{i}", ts) for i, (k, ts) in enumerate(rows)],
            "k int, val string, ts long",
        )

    for op, arg in ops:
        if op == "publish" and not history:
            # bootstrap only (mirrors upsert_stream_versioned): dedup
            # keep-latest within the batch, update (later index) wins ties
            batch = {}
            for i, (k, ts) in enumerate(arg):
                if k not in batch or ts >= batch[k][0]:
                    batch[k] = (ts, i)
            model = dict(batch)
            rows = [(k, ts) for k, (ts, i) in sorted(batch.items())]
            v = table.publish(spark.createDataFrame(
                [(k, f"b{i}", ts) for i, (k, ts) in enumerate(rows)],
                "k int, val string, ts long",
            ))
            history[v] = dict(model)
        elif op in ("publish", "merge"):
            if not history:
                continue
            for k, ts in arg:
                if k not in model or ts >= model[k][0]:
                    model[k] = (ts, seq)
            v = table.merge(df_for(arg), keys=["k"], order_col="ts")[
                "to_version"]
            history[v] = dict(model)
            seq += 1
        else:  # expire
            out = table.expire(keep_last=arg)
            for gone in out["expired"]:
                history.pop(gone, None)

    for v, snap in history.items():
        got = {r.k: r.ts for r in table.read(v).collect()}
        assert got == {k: ts for k, (ts, _) in snap.items()}, (
            f"version {v}: {got} != model"
        )


def test_expire_never_deletes_epoch_ledger(spark, table):
    """The newest epoch-stamped snapshot per producer survives
    retention even when older than the keep_last horizon: deleting it
    would un-record the applied epoch and let a lagged replay
    re-apply its batch."""
    table.publish(_df(spark, [(1, "a", 1)]), epoch=7, app="aabb")
    for i in range(2, 6):
        table.publish(_df(spark, [(1, f"v{i}", i)]))   # no epoch
    out = table.expire(keep_last=2)
    assert 1 not in out["expired"], "epoch ledger must survive"
    assert 1 in table.versions()
    assert table.last_epoch("aabb") == 7
    # and the replay guard still works after retention
    replay = table.merge(_df(spark, [(9, "x", 9)]), keys=["k"],
                         order_col="ts", epoch=7, app="aabb")
    assert replay["skipped"] is True


def test_compact_carries_epoch_stamp_forward(spark, table):
    """Compaction republishes the current snapshot; losing its
    (app, epoch) stamp would strand the exactly-once ledger on an
    old version forever. After compact, the NEW current version holds
    the stamp, so normal retention can eventually release the old
    one."""
    table.publish(_df(spark, [(1, "a", 1)]), epoch=3, app="cdcd")
    table.compact(target_file_bytes=1 << 30)
    assert table.last_epoch("cdcd") == 3
    out = table.expire(keep_last=1)
    assert out["expired"] == [1], "old snapshot releasable post-compact"
    assert table.last_epoch("cdcd") == 3


def test_history_lists_snapshots_with_stamps(spark, table):
    table.publish(_df(spark, [(1, "a", 1)]), epoch=0, app="abcd")
    table.merge(_df(spark, [(2, "b", 2)]), keys=["k"], order_col="ts",
                epoch=1, app="abcd")
    table.publish(_df(spark, [(3, "c", 3)]))
    h = {r.version: r for r in table.history().collect()}
    assert set(h) == {1, 2, 3}
    assert h[1].app == "abcd" and h[1].epoch == 0
    assert h[2].app == "abcd" and h[2].epoch == 1
    assert h[3].app is None and h[3].epoch is None
    assert h[3].is_current and not h[1].is_current
    assert all(r.bytes > 0 and r.n_files > 0 for r in h.values())


def test_diff_reports_inserts_updates_deletes(spark, table):
    table.publish(_df(spark, [(1, "a", 10), (2, "b", 10), (3, "c", 10)]))
    # v2: 2 updated, 3 deleted, 4 inserted, 1 unchanged
    table.publish(_df(spark, [(1, "a", 10), (2, "b2", 20), (4, "d", 20)]))
    d = {r.k: r for r in table.diff(keys=["k"], v_from=1).collect()}
    assert set(d) == {2, 3, 4}
    assert d[2].change_type == "update" and d[2].old.val == "b" \
        and d[2].new.val == "b2"
    assert d[3].change_type == "delete" and d[3].new is None
    assert d[4].change_type == "insert" and d[4].old is None
    # self-diff is empty
    assert table.diff(keys=["k"], v_from=2, v_to=2).count() == 0


def test_delete_predicate_and_keys(spark, tmp_path):
    """DELETE publishes a new snapshot without the matching rows; old
    versions still serve them until expire() reclaims (the documented
    compliance-delete pair)."""
    from dataingestionengineprocess_spark.sinks.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.publish(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 40.0)],
        "id long, grp string, v double",
    ))

    res = vt.delete("grp = 'a'")
    assert res["rows_after"] == 2
    assert {r.id for r in vt.read().collect()} == {2, 4}
    # time travel still sees the deleted rows on the old version
    assert {r.id for r in vt.read(res["from_version"]).collect()} == {1, 2, 3, 4}

    ids = spark.createDataFrame([(2,)], "id long")
    res2 = vt.delete(None, keys_df=ids, keys=["id"])
    assert {r.id for r in vt.read().collect()} == {4}
    assert res2["rows_after"] == 1

    # compliance pair: expire removes the versions that still held them
    vt.expire(keep_last=1)
    assert vt.versions() == [vt.current_version()]

    # null-safe predicate: rows where the predicate is NULL are KEPT
    vt2 = VersionedTable(spark, str(tmp_path / "t2"))
    vt2.publish(spark.createDataFrame(
        [(1, None), (2, 5.0)], "id long, v double"))
    vt2.delete("v > 1")
    assert {r.id for r in vt2.read().collect()} == {1}


def test_delete_carries_epoch_stamp_so_compliance_expire_works(spark, tmp_path):
    """The documented compliance flow -- delete(...) then
    expire(keep_last=1) -- must physically reclaim the pre-delete
    snapshots. That requires delete() to carry the source snapshot's
    (app, epoch) stamp forward (as compact() does): otherwise the
    PRE-delete snapshot stays the newest record of the producer's
    epoch, expire()'s ledger protection pins it forever, and the
    deleted rows remain readable."""
    from dataingestionengineprocess_spark.sinks.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    vt.publish(df, epoch=5, app="a11ce")
    assert vt.last_epoch("a11ce") == 5

    vt.delete("id >= 5")
    # the stamp survived the delete
    assert vt.last_epoch("a11ce") == 5
    # a replayed epoch <= 5 is STILL suppressed after the delete
    replay = vt.merge(df, keys=["id"], order_col="v", epoch=5, app="a11ce")
    assert replay.get("skipped") is True

    res = vt.expire(keep_last=1)
    assert len(res["expired"]) >= 1
    # only the delete snapshot remains; the deleted rows are gone from
    # every readable version
    assert vt.versions() == [vt.current_version()]
    assert vt.read().count() == 5


def test_diff_detects_changes_in_added_and_dropped_columns(spark, tmp_path):
    """Schema evolution between snapshots: a key whose only change is
    a newly-added column's value must report as an update (not compare
    equal over the old schema), and a dropped column must not crash
    the diff."""
    from dataingestionengineprocess_spark.sinks.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    v1 = vt.publish(spark.range(3).selectExpr("id", "id * 2 AS v"))
    vt.publish(
        spark.range(3).selectExpr("id", "id * 2 AS v", "id + 100 AS score"))

    d = {r.id: r for r in vt.diff(["id"], v1).collect()}
    assert len(d) == 3 and all(r.change_type == "update" for r in d.values())
    assert d[0].new.score == 100 and d[0].old.score is None

    # dropped column: diff must survive and report the change
    vt.publish(spark.range(3).selectExpr("id", "id * 2 AS v"))
    d2 = vt.diff(["id"], v1 + 1)
    assert d2.count() == 3


def test_diff_survives_column_retype_between_snapshots(spark, tmp_path):
    """A column present in BOTH snapshots with a changed type must diff
    without an analysis crash. Differing dtypes unify to STRING (a
    retype is itself a change worth surfacing), so every surviving key
    reports as an update with BOTH true values visible."""
    from dataingestionengineprocess_spark.sinks.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    v1 = vt.publish(spark.range(3).selectExpr("id", "CAST(id * 2 AS INT) AS v"))
    vt.publish(spark.range(3).selectExpr(
        "id",
        "CAST(CASE WHEN id = 2 THEN 99 ELSE id * 2 END AS DOUBLE) AS v"))

    d = {r.id: r for r in vt.diff(["id"], v1).collect()}
    assert set(d) == {0, 1, 2}
    assert all(r.change_type == "update" for r in d.values())
    assert d[2].old.v == "4" and d[2].new.v == "99.0"


def test_diff_retype_never_masks_a_lossy_change(spark, tmp_path):
    """The old payload must never be squeezed through a narrower new
    type: DOUBLE 4.7 diffed against INT 4 is a change (casting old to
    the new INT would silently compare 4 == 4 and report nothing)."""
    from dataingestionengineprocess_spark.sinks.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    v1 = vt.publish(
        spark.range(1).selectExpr("id", "CAST(4.7 AS DOUBLE) AS v"))
    vt.publish(spark.range(1).selectExpr("id", "CAST(4 AS INT) AS v"))

    d = vt.diff(["id"], v1).collect()
    assert len(d) == 1 and d[0].change_type == "update"
    assert d[0].old.v == "4.7" and d[0].new.v == "4"


def test_diff_retype_reported_even_when_renderings_coincide(spark, tmp_path):
    """A retype whose string renderings coincide (STRING '4' -> INT 4
    casts to '4' on both sides) must still report: the schema change is
    itself a change for every key surviving it, so the retype forces
    change_type='update' for all both-present rows rather than relying
    on the unified values differing."""
    from dataingestionengineprocess_spark.sinks.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    v1 = vt.publish(
        spark.range(2).selectExpr("id", "CAST(id AS STRING) AS v"))
    vt.publish(spark.range(2).selectExpr("id", "CAST(id AS INT) AS v"))

    d = {r.id: r for r in vt.diff(["id"], v1).collect()}
    # identical renderings on both sides, yet every surviving key is an
    # update because the column was retyped
    assert set(d) == {0, 1}
    assert all(r.change_type == "update" for r in d.values())
    assert d[1].old.v == "1" and d[1].new.v == "1"
