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
    InputPartition,
    SimpleDataSourceStreamReader,
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

    def partitions(self) -> Sequence[InputPartition]:
        # Balanced split into EXACTLY num_partitions slices (tail
        # slices may be empty when rows < partitions) -- callers size
        # task parallelism by this option, so honor it literally.
        n = self.num_partitions
        bounds = [self.rows * i // n for i in range(n + 1)]
        return [
            _RangePartition(bounds[i], bounds[i + 1]) for i in range(n)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


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


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(PartnerFeedDataSource)
