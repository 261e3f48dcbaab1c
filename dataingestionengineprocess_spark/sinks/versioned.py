"""Versioned warehouse tables: atomic publish via immutable version
directories + a pointer file.

`compact_table` / `merge_upsert` (warehouse.py) rewrite a table with a
two-rename swap whose contract is single-writer / no-concurrent-reader
(the table path briefly does not exist mid-swap). This module is the
layout their docstrings point at for when that contract is too weak --
the same snapshot pattern public table formats use (Iceberg's
``version-hint.text``, Delta's ``_last_checkpoint``):

    <table>/
      _v/v0000000001/   immutable parquet snapshot (committed once
      _v/v0000000002/     Spark's ``_SUCCESS`` marker lands)
      _LATEST           one-line pointer: name of the current version

Correctness rules, in order of authority:

1. A version directory is COMMITTED iff it contains ``_SUCCESS``
   (written last by Spark's file output committer). Half-written
   snapshots from a crashed publish are never visible and never
   block progress -- the next publish simply claims the next number.
2. The source of truth for "current" is *the largest committed
   version*. ``_LATEST`` is a cache of that answer: readers verify it
   and fall back to listing when it is missing, stale, or pointing at
   an uncommitted dir. Crash-between-write-and-pointer therefore
   still yields a correct (new) read -- unlike a pointer-as-truth
   design where losing the pointer loses the table.
3. Version directories are immutable after commit. A reader that
   resolved version N keeps reading N's files for the whole query
   even while N+1 publishes -- no torn reads, no vanishing paths.
   ``expire`` is the only mutation, and it refuses to touch the
   newest ``keep_last`` committed versions.

At 100 TB the extra cost is one pointer read OR one tiny directory
listing (dozens of entries) per query plan -- noise against the scan
-- and compaction/merge become always-online operations instead of
maintenance-window ones.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VDIR = "_v"
_POINTER = "_LATEST"
_WIDTH = 10  # zero-padded => lexicographic order == numeric order


def _vname(n: int, epoch: int | None = None) -> str:
    """Version dir name; an exactly-once producer's epoch rides IN the
    name (``v0000000007-e42``) so it commits atomically with the
    snapshot's ``_SUCCESS`` marker -- a separate epoch file could land
    before/after the marker and tear the dedup decision."""
    base = f"v{n:0{_WIDTH}d}"
    return base if epoch is None else f"{base}-e{epoch}"


def _parse_vname(name: str) -> tuple[int, int | None] | None:
    """(version, epoch|None) from a version dir name, else None."""
    if not name.startswith("v"):
        return None
    body, _, esuf = name[1:].partition("-e")
    try:
        n = int(body)
    except ValueError:
        return None
    if not esuf:
        return n, None
    try:
        return n, int(esuf)
    except ValueError:
        return None


class VersionedTable:
    """Snapshot-versioned parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        jvm = spark.sparkContext._jvm
        self._jvm = jvm
        self._hp = jvm.org.apache.hadoop.fs.Path
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._fs = self._hp(path).getFileSystem(conf)

    # -- fs helpers ---------------------------------------------------------

    def _exists(self, p: str) -> bool:
        return self._fs.exists(self._hp(p))

    def _dirs(self, committed_only: bool = True) -> dict[int, str]:
        """version number -> dir name (``v…`` or ``v…-e…``)."""
        vroot = os.path.join(self.path, _VDIR)
        if not self._exists(vroot):
            return {}
        out: dict[int, str] = {}
        for st in self._fs.listStatus(self._hp(vroot)):
            name = st.getPath().getName()
            parsed = _parse_vname(name) if st.isDirectory() else None
            if parsed is None:
                continue
            n, _ = parsed
            if committed_only and not self._exists(
                os.path.join(vroot, name, "_SUCCESS")
            ):
                continue
            out[n] = name
        return out

    # -- introspection ------------------------------------------------------

    def versions(self) -> list[int]:
        """Committed version numbers, ascending."""
        return sorted(self._dirs())

    def last_epoch(self) -> int | None:
        """Largest producer epoch among committed snapshots (None when
        no snapshot carries one). The exactly-once question -- "has
        this epoch already been applied?" -- reads from here."""
        epochs = [
            _parse_vname(name)[1]
            for name in self._dirs().values()
            if _parse_vname(name)[1] is not None
        ]
        return max(epochs) if epochs else None

    def current_version(self) -> int | None:
        """Largest committed version; the pointer is consulted first
        and trusted only when it names a committed dir >= any
        committed dir the listing shows... which requires the listing
        anyway -- so the pointer here is a fast-path HINT for engines
        that cannot list cheaply, and a debugging breadcrumb; this
        local implementation always verifies against the listing."""
        vs = self.versions()
        return vs[-1] if vs else None

    # -- read ---------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """DataFrame over one immutable snapshot. ``version=None``
        resolves the current version at PLAN time and pins it -- the
        returned frame keeps reading that snapshot even if newer
        versions publish mid-query (snapshot isolation)."""
        dirs = self._dirs()
        if version is None:
            if not dirs:
                raise FileNotFoundError(
                    f"versioned table {self.path} has no committed version"
                )
            version = max(dirs)
        elif version not in dirs:
            raise FileNotFoundError(
                f"{self.path} has no committed version {version}"
            )
        return self.spark.read.parquet(
            os.path.join(self.path, _VDIR, dirs[version])
        )

    # -- write --------------------------------------------------------------

    def publish(self, df: DataFrame, n_files: int | None = None,
                epoch: int | None = None) -> int:
        """Write ``df`` as the next snapshot and make it current.

        Commit point = Spark's ``_SUCCESS`` marker in the new version
        dir; the pointer update after it is best-effort cache refresh.
        A crash before the marker leaves an invisible partial dir; a
        crash after it but before the pointer write still counts as
        committed (readers resolve by listing).

        ``epoch`` stamps an exactly-once producer id (e.g. a streaming
        micro-batch epoch) into the version name, atomically with the
        commit -- see `merge`'s replay dedup."""
        pending = self._dirs(committed_only=False)
        n = (max(pending) + 1) if pending else 1
        target = os.path.join(self.path, _VDIR, _vname(n, epoch))
        writer = df.repartition(n_files) if n_files else df
        writer.write.mode("error").parquet(target)
        self._write_pointer(n)
        return n

    def _write_pointer(self, n: int) -> None:
        tmp = os.path.join(self.path, f"{_POINTER}.{_vname(n)}.tmp")
        out = self._fs.create(self._hp(tmp), True)
        try:
            out.write(bytearray(_vname(n).encode()))
        finally:
            out.close()
        dest = self._hp(os.path.join(self.path, _POINTER))
        # rename-over-existing is not portable: remove then rename.
        # Losing the race (or crashing) between the two is harmless --
        # the pointer is a hint, the listing is the truth.
        self._fs.delete(dest, False)
        if not self._fs.rename(self._hp(tmp), dest):
            self._fs.delete(self._hp(tmp), False)

    # -- maintenance --------------------------------------------------------

    def expire(self, keep_last: int = 2) -> dict:
        """Delete snapshots older than the newest ``keep_last``
        committed ones (never the current). Readers pinned to an
        expired snapshot fail like readers of a vacuumed lakehouse
        table -- retention is the snapshot-isolation horizon."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        dirs = self._dirs()
        vs = sorted(dirs)
        doomed = vs[:-keep_last] if len(vs) > keep_last else []
        for n in doomed:
            self._fs.delete(
                self._hp(os.path.join(self.path, _VDIR, dirs[n])), True
            )
        return {"expired": doomed, "kept": vs[len(doomed):]}

    def compact(self, target_file_bytes: int = 128 * 1024 * 1024) -> dict:
        """Online OPTIMIZE: rewrite the current snapshot right-sized
        into a NEW version. Unlike `warehouse.compact_table`'s
        two-rename swap, concurrent readers are safe the whole time:
        they hold the old immutable snapshot; the flip is the commit
        marker of the new one."""
        dirs = self._dirs()
        if not dirs:
            raise FileNotFoundError(f"nothing to compact at {self.path}")
        cur = max(dirs)
        vpath = os.path.join(self.path, _VDIR, dirs[cur])
        summary = self._fs.getContentSummary(self._hp(vpath))
        total = summary.getLength()
        n_files = max(1, math.ceil(total / target_file_bytes))
        new = self.publish(self.read(cur), n_files=n_files)
        return {"from_version": cur, "to_version": new, "bytes": total}

    def merge(self, updates: DataFrame, keys: list[str],
              order_col: str, epoch: int | None = None) -> dict:
        """Keep-latest MERGE as a snapshot publish (same semantics as
        `warehouse.merge_upsert`: greatest ``order_col`` per key wins,
        ties break toward the update). Metrics ride along on the
        single write action via ``observe()`` -- no extra scans.

        ``epoch`` makes the merge EXACTLY-ONCE under micro-batch
        replay: if a committed snapshot already carries an epoch >=
        this one, the batch was applied before a checkpoint-lagged
        retry and the call returns ``{"skipped": True}`` without
        writing -- the foreachBatch idempotent-sink pattern, with the
        applied-epoch record committed atomically inside the version
        name instead of in a side store."""
        if epoch is not None:
            last = self.last_epoch()
            if last is not None and epoch <= last:
                return {"skipped": True, "epoch": epoch,
                        "last_epoch": last}
        from pyspark.sql import Observation
        from pyspark.sql.window import Window

        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"nothing to merge into at {self.path}")
        existing = self.read(cur)

        merged = (
            existing.withColumn("__src", F.lit(0))
            .unionByName(updates.withColumn("__src", F.lit(1)))
        )
        in_obs = Observation("vmerge_inputs")
        merged = merged.observe(
            in_obs,
            F.sum(F.when(F.col("__src") == 0, 1).otherwise(0))
            .alias("rows_before"),
            F.sum(F.when(F.col("__src") == 1, 1).otherwise(0))
            .alias("rows_updated"),
        )
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), F.col("__src").desc()
        )
        out_obs = Observation("vmerge_output")
        survivors = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src")
            .observe(out_obs, F.count(F.lit(1)).alias("rows_after"))
        )
        new = self.publish(survivors, epoch=epoch)
        inputs = in_obs.get
        return {
            "from_version": cur,
            "to_version": new,
            "rows_before": int(inputs["rows_before"] or 0),
            "rows_updated": int(inputs["rows_updated"] or 0),
            "rows_after": int(out_obs.get["rows_after"]),
        }
