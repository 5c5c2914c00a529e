"""wd2duckdb_spark — a PySpark-native knowledge-graph analytics engine.

Re-expresses the data model and query surface of the reference tool
``weso/wd2duckdb`` (a Rust ETL that loads Wikidata JSON dumps into a
six-table DuckDB knowledge graph) as an idiomatic Spark engine:

- :mod:`wd2duckdb_spark.ids`       — the single u32 id keyspace codec
  (reference: wikidata-rs/src/id.rs).
- :mod:`wd2duckdb_spark.ingest`    — dump → six typed tables ETL
  (reference: src/main.rs + wikidata-rs/src/value.rs).
- :mod:`wd2duckdb_spark.views`     — register the 6 views + the unioned
  ``triples`` view for SPARQL-ish triple-pattern queries.
- :mod:`wd2duckdb_spark.operators` — the query-side operator surface the
  reference delegates to DuckDB SQL (lookups, traversals, windows, ...).
- :mod:`wd2duckdb_spark.functions` — scalar/function library + the
  LLM-data-pipeline extensions (dedup, similarity search, text analysis).
- :mod:`wd2duckdb_spark.streaming` — Structured Streaming variant of the
  ingest (the reference's stdin-pipe mode, main.rs:261-269).

Everything is DataFrame/Catalyst-first: no RDDs, no row-at-a-time Python
UDFs on hot paths; Pandas UDFs only where built-ins cannot express the
semantics (vector similarity, multimodal decode).
"""

from wd2duckdb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
