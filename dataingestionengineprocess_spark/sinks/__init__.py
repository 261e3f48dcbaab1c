"""Sinks: warehouse (parquet), OLTP (JDBC-or-parquet), status (S6-S8)."""
