"""Sources: CSV landing zone, JSON, parquet, JDBC (SURVEY.md §2.1)."""
