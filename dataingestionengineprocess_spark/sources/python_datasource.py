"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic partner-feed generator.

The reference's input boundary is "DataPartner placing .csv file into
S3" (Untitled Diagram.drawio:201) -- an external feed the engine does
not control. This source models such a feed as a first-class Spark
catalog citizen instead of a pre-staged file: the driver plans N input
partitions, each executor synthesizes its own row range, and the rows
flow into the normal DataFrame pipeline (pushdown-eligible once
materialized).

Scale design: generation is embarrassingly parallel -- ``partitions()``
splits the id range into ``num_partitions`` contiguous slices, so a
1000-executor cluster gets 1000 independent generators with zero
shuffle and zero driver-side row handling. Rows are arithmetic on the
row id only (multiplicative-hash amount, modular partner key), so any
slice is reproducible on task retry -- the same exactly-once property a
re-readable file split gives Spark's scheduler.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

#: Knuth multiplicative hash constant and a prime modulus: spreads
#: amounts deterministically without floating-point state.
_MULT = 2654435761
_MOD = 1_000_003


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class PartnerFeedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 10_000))
        self.num_partitions = int(options.get("partitions", 8))
        # The Arrow batch path computes (id * _MULT) in numpy int64;
        # enforce the no-overflow assumption instead of assuming it
        # (ADVICE r10) so the batch and scalar-_row paths can never
        # silently diverge on an absurdly large feed.
        if (self.rows - 1) * _MULT >= 2**63:
            raise ValueError(
                f"rows={self.rows} would overflow int64 in the Arrow "
                f"batch path (max id * {_MULT} must stay < 2^63)")

    def partitions(self) -> Sequence[InputPartition]:
        # Balanced split into EXACTLY num_partitions slices (tail
        # slices may be empty when rows < partitions) -- callers size
        # task parallelism by this option, so honor it literally.
        n = self.num_partitions
        bounds = [self.rows * i // n for i in range(n + 1)]
        return [
            _RangePartition(bounds[i], bounds[i + 1]) for i in range(n)
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        # Arrow-batch generation (guide idiom: hand whole batches to
        # vectorized native code instead of yielding pickled tuples
        # row by row -- the per-row path cost ~4 s for 20k rows, all
        # of it serialization). numpy int64 arithmetic is exact here
        # (id * _MULT stays far below 2^63 for any plausible feed
        # size), so values are bit-identical to the scalar _row path,
        # which the streaming reader still uses.
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        partners = np.array([f"P{k}" for k in range(7)])[ids % 7]
        amounts = ((ids * _MULT) % _MOD) / 100.0
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids), pa.array(partners), pa.array(amounts)],
            names=["id", "partner", "amount"],
        )


def _row(i: int) -> tuple:
    return (i, f"P{i % 7}", ((i * _MULT) % _MOD) / 100.0)


class PartnerFeedStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch view of the same feed: each batch advances a row-id
    offset. Offsets are plain positions in a deterministic sequence, so
    ``readBetweenOffsets`` can replay ANY committed range exactly on
    recovery -- the replayability contract that gives Structured
    Streaming end-to-end exactly-once on top of this source.
    """

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 10_000))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.batch_rows, self.rows)
        return (iter([_row(i) for i in range(lo, hi)]), {"pos": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["pos"], end["pos"])])


class PartnerFeedDataSource(DataSource):
    """``spark.read.format("partner_feed").option("rows", N)`` source;
    also streamable via ``spark.readStream.format("partner_feed")``."""

    @classmethod
    def name(cls) -> str:
        return "partner_feed"

    def schema(self) -> str:
        return "id BIGINT, partner STRING, amount DOUBLE"

    def reader(self, schema: StructType) -> PartnerFeedReader:
        return PartnerFeedReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> PartnerFeedStreamReader:
        return PartnerFeedStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "PartnerFeedWriter":
        return PartnerFeedWriter(self.options)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> "PartnerFeedStreamWriter":
        return PartnerFeedStreamWriter(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(PartnerFeedDataSource)


# ---------------------------------------------------------------------------
# Writer side (Spark 4 DataSourceWriter / DataSourceStreamWriter):
# the feed's OUTBOUND mirror -- JSON-lines deliveries with the same
# two-phase commit contract Spark's file sinks use. Tasks write to
# dot-prefixed temp files (invisible to readers and to Spark's own
# JSON scanner) and report them in WriterCommitMessages; only the
# driver's commit() renames them into place and drops the marker
# (_SUCCESS / _batch-<id>), so a failed job leaves nothing visible and
# abort() removes the temps. Paths here are plain local-FS (this
# container's test reality); a production build swaps os.rename for
# the Hadoop FileSystem API as sinks/warehouse.py does -- the commit
# PROTOCOL is identical.
#
# The MARKER is the atomic commit point, not rename completion: the
# marker lists the epoch's final filenames, is first written to a
# dot-prefixed temp, and is os.rename()d into place only after every
# data rename finished. A crash between the data renames and the
# marker rename therefore leaves part- files with NO marker naming
# them; the next commit attempt reconciles by deleting any part- file
# not referenced by an existing marker before publishing its own set,
# so replayed epochs never sit a duplicate next to a half-published
# original.
#
# The streaming variant adds per-epoch idempotence on top: an existing
# _batch-<id> marker means the epoch fully committed, so the replay's
# temps are dropped instead of double-publishing.
# ---------------------------------------------------------------------------


class _FileCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int) -> None:
        self.tmp_path, self.rows = tmp_path, rows


class _JsonlWriterBase:
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> _FileCommit:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(tmp, n)

    def _committed_files(self) -> set[str] | None:
        """Final filenames referenced by ANY existing marker; None when
        some marker is unreadable or in the legacy count-only format
        (its files are unidentifiable, so NO orphan sweep may run --
        deleting 'unclaimed' part- files next to an unparseable marker
        would destroy legacy-committed data)."""
        import json
        import os

        seen: set[str] = set()
        for name in os.listdir(self.path):
            if name != "_SUCCESS" and not name.startswith("_batch-"):
                continue
            try:
                with open(os.path.join(self.path, name)) as f:
                    payload = json.load(f)
                if not isinstance(payload, dict):
                    return None  # legacy bare-count marker
                seen.update(payload.get("files", []))
            except (OSError, ValueError):
                return None
        return seen

    def _publish(self, messages, marker: str,
                 sweep_orphans: bool = False) -> None:
        import json
        import os
        import uuid

        # Reconcile FIRST: part- files named by no marker are orphans
        # of a commit attempt that crashed between its data renames and
        # its marker rename. Removing them here makes this attempt's
        # publish exactly-once even after such a crash. The sweep is
        # ONLY safe where commits on this path are provably serial --
        # the STREAMING writer (micro-batch epochs commit one at a time
        # from the driver), which passes sweep_orphans=True. Batch
        # append jobs carry no such guarantee: two concurrent appends
        # to one directory would each see the other's renamed-but-not-
        # yet-claimed part- files as orphans and delete committed data,
        # so the batch path never sweeps (a later streaming commit, or
        # explicit maintenance, reclaims true batch orphans). Also
        # skipped when any marker is unreadable/legacy (committed is
        # None) -- then no file's provenance is provable and deleting
        # would risk committed data. Also skipped when the directory
        # shows BATCH traffic (a `_SUCCESS` marker): a concurrent
        # batch append's renamed-but-not-yet-claimed part- files would
        # look like stream orphans, and stream-vs-batch commits are
        # not serialized. (A batch append whose FIRST commit is
        # in-flight leaves no marker yet -- mixing a live stream with
        # a first-time batch append on one directory stays
        # unsupported, as documented.)
        mixed = sweep_orphans and os.path.exists(
            os.path.join(self.path, "_SUCCESS")
        )
        committed = (
            self._committed_files() if sweep_orphans and not mixed else None
        )
        if committed is not None:
            for name in os.listdir(self.path):
                if name.startswith("part-") and name not in committed:
                    try:
                        os.remove(os.path.join(self.path, name))
                    except FileNotFoundError:
                        pass
                # stale temp markers (crash between marker write and its
                # rename) are never data: sweep them with the orphans
                if name.startswith(".tmp-marker-"):
                    try:
                        os.remove(os.path.join(self.path, name))
                    except FileNotFoundError:
                        pass

        finals = []
        for m in messages:
            if m is None:
                continue
            final = m.tmp_path.replace("/.tmp-", "/part-")
            os.rename(m.tmp_path, final)
            finals.append(os.path.basename(final))
        # Marker rename is the commit point: readers/replays trust only
        # files a marker names, and rename within a directory is atomic
        # on POSIX (object-store builds use the same conditional-put
        # idiom via the Hadoop FS API).
        rows = sum(m.rows for m in messages if m is not None)
        # A same-named marker already on disk (append-mode batch runs
        # share one _SUCCESS) must keep claiming its earlier files, or
        # the NEXT commit's reconcile would sweep them as orphans.
        marker_path = os.path.join(self.path, marker)
        try:
            with open(marker_path) as f:
                prev = json.load(f)
            if isinstance(prev, dict):
                finals = sorted(set(finals) | set(prev.get("files", [])))
                rows += int(prev.get("rows", 0))
            else:
                # legacy bare-count marker about to be OVERWRITTEN with
                # the listing format: adopt every on-disk part- file
                # into the new marker's claims, else the legacy files
                # would look like orphans to the commit after this one.
                # Caveat (documented tradeoff): a legacy directory has
                # no per-file provenance, so genuine orphans of a
                # crashed legacy attempt are adopted too and become
                # permanently legitimized -- the upgrade FREEZES IN any
                # pre-existing duplicates. The adopted list is logged
                # so an operator can audit it manually.
                adopted = sorted(
                    n for n in os.listdir(self.path)
                    if n.startswith("part-")
                )
                if adopted:
                    import logging
                    logging.getLogger(__name__).warning(
                        "legacy marker upgrade at %s adopted %d "
                        "pre-existing part- files (provenance "
                        "unprovable; possible duplicates): %s",
                        self.path, len(adopted), adopted,
                    )
                finals = sorted(set(finals) | set(adopted))
                try:
                    rows += int(prev)
                except (TypeError, ValueError):
                    pass
        except (OSError, ValueError):
            finals = sorted(finals)
        tmp_marker = os.path.join(self.path, f".tmp-marker-{uuid.uuid4().hex}")
        with open(tmp_marker, "w") as f:
            json.dump({"files": finals, "rows": rows}, f)
        os.rename(tmp_marker, marker_path)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class PartnerFeedWriter(_JsonlWriterBase, DataSourceWriter):
    def commit(self, messages) -> None:
        self._publish(messages, "_SUCCESS")


class PartnerFeedStreamWriter(_JsonlWriterBase, DataSourceStreamWriter):
    def commit(self, messages, batchId: int) -> None:
        import os

        marker = os.path.join(self.path, f"_batch-{batchId}")
        if os.path.exists(marker):
            # replayed epoch: files were already published; drop the
            # replay's temps instead of double-committing
            self.abort(messages)
            return
        self._publish(messages, f"_batch-{batchId}", sweep_orphans=True)

    def abort(self, messages, batchId: int | None = None) -> None:
        _JsonlWriterBase.abort(self, messages)
