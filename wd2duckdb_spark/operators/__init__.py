"""Query-side operator surface (SURVEY §2.2/§2.3).

The reference delegates its whole query surface to DuckDB SQL over the
six-table schema; this package supplies the same operator classes as
Spark DataFrame plans, each paired with the ANSI-SQL oracle the driver
runs through DuckDB. Modules:

- :mod:`relational` — scans, joins (all types), aggregations, grouping
  sets, windows, sorts/top-k, set ops.
- :mod:`graph` — traversal / neighbor-expansion / as-of patterns.
"""
