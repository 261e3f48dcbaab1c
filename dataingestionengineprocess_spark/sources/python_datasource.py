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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
        step = max(1, -(-self.rows // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            amount = ((i * _MULT) % _MOD) / 100.0
            yield (i, f"P{i % 7}", amount)


class PartnerFeedDataSource(DataSource):
    """``spark.read.format("partner_feed").option("rows", N)`` source."""

    @classmethod
    def name(cls) -> str:
        return "partner_feed"

    def schema(self) -> str:
        return "id BIGINT, partner STRING, amount DOUBLE"

    def reader(self, schema: StructType) -> PartnerFeedReader:
        return PartnerFeedReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(PartnerFeedDataSource)
