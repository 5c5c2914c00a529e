"""Sources & sinks beyond the parquet default.

- :mod:`duckdb_io` — export the six-table knowledge graph into a real
  DuckDB database file (the reference's exact output format) and read
  DuckDB tables back into Spark.
"""
