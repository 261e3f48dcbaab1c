"""User-facing engine facade: the one object a reference user drives.

The reference's operating model (Untitled Diagram.drawio): partners
drop CSVs into a landing zone (:201), an event loop launches the
ingestion process (:150-151), results land in warehouse + OLTP stores
(:79-98), and a completion status is emitted (:147-148). This facade
is that model as an API:

    eng = IngestionEngine(spark, SinkConfig(warehouse_dir=...))
    eng.register_feed(FeedConfig(name="orders_feed", ...))
    eng.run_batch("orders_feed", "/landing/drop1.csv")   # one drop
    eng.run_stream("orders_feed", "/landing/", ckpt)     # watch dir
    eng.status()                                         # _runs table
    eng.warehouse_table("orders_feed")                   # curated rows

plus the analytical surface the driver contract exposes:

    eng.query("q1_pricing_summary", sf_dir)   # any registered query
    eng.sql("SELECT ...", sf_dir)             # SQL over fixture views
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views
from .pipeline import FeedConfig, ingest_batch, ingest_stream
from .queries import all_queries
from .sinks.warehouse import RunStatus, SinkConfig, read_status


class IngestionEngine:
    """Session-scoped engine: feeds, sinks, and the query registry."""

    def __init__(self, spark: SparkSession, sinks: SinkConfig) -> None:
        self.spark = spark
        self.sinks = sinks
        self._feeds: dict[str, FeedConfig] = {}

    # -- ingestion (the reference's [R] core) ---------------------------------

    def register_feed(self, feed: FeedConfig) -> None:
        if feed.name in self._feeds:
            raise ValueError(f"feed {feed.name!r} already registered")
        self._feeds[feed.name] = feed

    def feed(self, name: str) -> FeedConfig:
        try:
            return self._feeds[name]
        except KeyError:
            raise KeyError(
                f"unknown feed {name!r}; registered: {sorted(self._feeds)}"
            ) from None

    def run_batch(self, feed_name: str, src_path: str,
                  run_id: str | None = None) -> RunStatus:
        """Ingest one landing-zone drop end to end (idempotent per
        run_id)."""
        return ingest_batch(
            self.spark, self.feed(feed_name), src_path, self.sinks, run_id
        )

    def run_stream(self, feed_name: str, src_dir: str, checkpoint_dir: str,
                   max_files_per_trigger: int | None = None):
        """Watch a landing directory; exactly-once per file via the
        streaming checkpoint. Returns the StreamingQuery."""
        return ingest_stream(
            self.spark, self.feed(feed_name), src_dir, self.sinks,
            checkpoint_dir, max_files_per_trigger,
        )

    def run_sweep(self, feed_name: str, landing_dir: str,
                  run_id: str | None = None):
        """Batch landing-zone sweep with the durable file ledger:
        ingest every file identity not yet recorded, as one run.
        Returns the RunStatus, or None when nothing new landed."""
        from .pipeline import ingest_new_files

        return ingest_new_files(
            self.spark, self.feed(feed_name), landing_dir, self.sinks,
            run_id,
        )

    def replay_quarantine(self, feed_name: str,
                          run_id: str | None = None):
        """Re-run the stage chain over the feed's quarantine table
        under the CURRENT rules (the recovery path after a rule fix);
        now-passing rows load, the quarantine table shrinks."""
        from .pipeline import replay_quarantine

        return replay_quarantine(
            self.spark, self.feed(feed_name), self.sinks, run_id
        )

    # -- curated outputs ------------------------------------------------------

    def warehouse_table(self, table: str,
                        merge_schema: bool = False) -> DataFrame:
        """Curated table reader. ``merge_schema=True`` unions the
        footers of every run partition (schema evolution: a partner
        adding columns mid-feed writes wider parquet under later run
        ids; old rows surface the new columns as NULL). Off by default
        -- footer merging scans every file's metadata, which a 100 TB
        table only wants when its schema actually evolved."""
        return (
            self.spark.read
            .option("mergeSchema", str(merge_schema).lower())
            .parquet(os.path.join(self.sinks.warehouse_dir, table))
        )

    def status(self) -> DataFrame:
        """The `_runs` completion-status table (the CloudWatch signal)."""
        return read_status(self.spark, self.sinks.warehouse_dir)

    # -- analytics ------------------------------------------------------------

    def query(self, name: str, sf_dir: str) -> DataFrame:
        """Run a registered named query (SURVEY.md §2 surface)."""
        registry = all_queries()
        try:
            fn = registry[name]
        except KeyError:
            raise KeyError(
                f"unknown query {name!r}; see queries.all_queries()"
            ) from None
        return fn(self.spark, sf_dir)

    def sql(self, statement: str, sf_dir: str) -> DataFrame:
        """Ad-hoc SQL with the fixture tables registered as views."""
        register_views(self.spark, sf_dir)
        return self.spark.sql(statement)
