"""PySpark-native analytics / ingestion engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference `LakshmananSv/DataIngestionEngineProcess`
(an architecture-level spec: CSV landing zone -> Python ingestion
process -> warehouse + OLTP sinks, see /root/reference/Untitled
Diagram.drawio:150-205). Everything here is declarative DataFrame/SQL
so Catalyst + Tungsten plan the physical execution; custom operators
(as-of join, MinHash dedup, ANN search) are compositions of built-in
operators or Arrow-batched Pandas UDFs -- never row-at-a-time Python.

Layout:
    session     -- SparkSession builder tuned for AQE/Arrow/UTC
    catalog     -- fixture table loading (TESTDATA.md tables)
    queries     -- named query registry + DuckDB oracle SQL registry
    operators   -- reusable relational/dedup/similarity/asof operators
    functions   -- scalar/vector/text column expression helpers
    sources     -- CSV/JSON/parquet/JDBC readers with rejects routing
    sinks       -- warehouse (parquet) / OLTP (JDBC) / status sinks
    streaming   -- Structured Streaming ingest + windowed analytics
"""

__version__ = "0.1.0"
