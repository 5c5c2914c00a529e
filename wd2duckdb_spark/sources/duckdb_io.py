"""DuckDB sink/source: byte-level output parity with the reference.

The reference's product IS a DuckDB file with six tables + src_id/
dst_id indices (value.rs:146-198, 332-350). Our engine's native
storage is parquet (columnar, distributed); this module materializes
that parquet into the same DuckDB shape for consumers of the original
tool:

- identical DDL (UINTEGER/TEXT/DOUBLE/DATETIME/INTEGER per
  value.rs:146-198),
- identical secondary indices (src_id + dst_id on edge-class tables,
  id on vertex — value.rs:332-350 incl. the :341 column filter),
- the engine's ±infinity timestamp sentinels translated back to
  DuckDB's real ``'infinity'``/``'-infinity'`` timestamps
  (value.rs:271-284),
- the existing-target guard (main.rs:249-255).

Scale note: the DuckDB file is a single-node artifact by definition —
the distributed engine writes parquet; this export is the last-mile
step run where the file is consumed. DuckDB ingests the parquet
directly (zero row-at-a-time traffic, no JDBC needed — both engines
speak parquet natively, which is the whole trick).
"""

from __future__ import annotations

import os

try:
    import duckdb
except ImportError:  # pragma: no cover - duckdb ships in this env
    duckdb = None

from pyspark.sql import DataFrame, SparkSession

from wd2duckdb_spark.ingest import INFINITY_TS, NEG_INFINITY_TS, TABLE_NAMES

#: DuckDB column types per table — value.rs:146-198 verbatim.
DDL: dict[str, list[tuple[str, str]]] = {
    "vertex": [
        ("id", "UINTEGER NOT NULL"),
        ("label", "TEXT"),
        ("description", "TEXT"),
    ],
    "edge": [
        ("src_id", "UINTEGER NOT NULL"),
        ("property_id", "UINTEGER NOT NULL"),
        ("dst_id", "UINTEGER NOT NULL"),
    ],
    "string": [
        ("src_id", "UINTEGER NOT NULL"),
        ("property_id", "UINTEGER NOT NULL"),
        ("dst_id", "UINTEGER NOT NULL"),
        ("string", "TEXT NOT NULL"),
    ],
    "coordinates": [
        ("src_id", "UINTEGER NOT NULL"),
        ("property_id", "UINTEGER NOT NULL"),
        ("dst_id", "UINTEGER NOT NULL"),
        ("latitude", "DOUBLE NOT NULL"),
        ("longitude", "DOUBLE NOT NULL"),
        ("precision", "DOUBLE NOT NULL"),
        ("globe_id", "UINTEGER NOT NULL"),
    ],
    "quantity": [
        ("src_id", "UINTEGER NOT NULL"),
        ("property_id", "UINTEGER NOT NULL"),
        ("dst_id", "UINTEGER NOT NULL"),
        ("amount", "DOUBLE NOT NULL"),
        ("lower_bound", "DOUBLE"),
        ("upper_bound", "DOUBLE"),
        ("unit_id", "UINTEGER"),
    ],
    "time": [
        ("src_id", "UINTEGER NOT NULL"),
        ("property_id", "UINTEGER NOT NULL"),
        ("dst_id", "UINTEGER NOT NULL"),
        ("time", "DATETIME NOT NULL"),
        ("precision", "INTEGER NOT NULL"),
    ],
}


def export_duckdb(parquet_root: str, db_path: str, overwrite: bool = False) -> None:
    """Materialize the six parquet table dirs into ``db_path``.

    Refuses an existing target unless ``overwrite`` (main.rs:249-255).
    Tables are created with the reference DDL, loaded straight from
    parquet, then indexed — same order as the reference (DDL → indices
    → load is the reference's order; DuckDB bulk-loads faster data-
    first, and the end state is identical).
    """
    if duckdb is None:  # pragma: no cover
        raise RuntimeError("duckdb not available")
    if os.path.exists(db_path):
        if not overwrite:
            raise FileExistsError(
                f"Database file {db_path} already exists"  # main.rs:252-255
            )
        os.remove(db_path)

    con = duckdb.connect(db_path)
    try:
        for name, cols in DDL.items():
            col_sql = ", ".join(f'"{c}" {t}' for c, t in cols)
            con.execute(f'CREATE TABLE IF NOT EXISTS "{name}" ({col_sql});')
            select_cols = []
            for c, _t in cols:
                if name == "time" and c == "time":
                    # sentinel → DuckDB's real ±infinity (value.rs:271-284)
                    select_cols.append(
                        f"CASE WHEN \"time\" >= TIMESTAMP '{INFINITY_TS}' "
                        "THEN TIMESTAMP 'infinity' "
                        f"WHEN \"time\" <= TIMESTAMP '{NEG_INFINITY_TS}' "
                        "THEN TIMESTAMP '-infinity' "
                        'ELSE "time" END AS "time"'
                    )
                else:
                    select_cols.append(f'"{c}"')
            con.execute(
                f'INSERT INTO "{name}" SELECT {", ".join(select_cols)} '
                f"FROM read_parquet('{parquet_root}/{name}/*.parquet');"
            )
        # Secondary indices: src_id/dst_id only + vertex.id
        # (value.rs:332-350; column filter at :341).
        for name, cols in DDL.items():
            for c, _t in cols:
                if c in ("src_id", "dst_id") or (name == "vertex" and c == "id"):
                    con.execute(
                        f"CREATE INDEX IF NOT EXISTS {name}_{c}_index "
                        f'ON "{name}" ("{c}");'
                    )
    finally:
        con.close()


def read_duckdb_table(
    spark: SparkSession, db_path: str, table: str, tmp_dir: str
) -> DataFrame:
    """DuckDB table → Spark DataFrame, via a parquet hand-off.

    DuckDB COPYs the table to parquet (columnar, typed) and Spark scans
    it — the reverse hand-off of :func:`export_duckdb`. ``tmp_dir``
    hosts the intermediate file.
    """
    if duckdb is None:  # pragma: no cover
        raise RuntimeError("duckdb not available")
    if table not in TABLE_NAMES:
        raise ValueError(f"unknown table {table!r}")
    out = f"{tmp_dir}/{table}.parquet"
    con = duckdb.connect(db_path, read_only=True)
    try:
        con.execute(
            f"COPY (SELECT * FROM \"{table}\") TO '{out}' (FORMAT PARQUET);"
        )
    finally:
        con.close()
    return spark.read.parquet(out)
