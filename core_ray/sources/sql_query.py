"""SQL passthrough (reference ``queries/sql/sql_query.py`` — the reference
pushes arbitrary SQL to a Databricks warehouse; here DuckDB executes it over
the local parquet tables and the result enters Ray as a Dataset via
zero-copy Arrow)."""

from __future__ import annotations

import duckdb

import ray.data

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def sql_query(sf_dir: str, sql: str, limit: int | None = None, offset: int = 0):
    """Run ANSI SQL over the sf tables; returns a ``ray.data.Dataset``.

    ``limit``/``offset`` mirror the reference's output-stage pagination."""
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        if limit is not None:
            sql = f"SELECT * FROM ({sql}) LIMIT {int(limit)} OFFSET {int(offset)}"
        table = con.execute(sql).fetch_arrow_table()
    finally:
        con.close()
    return ray.data.from_arrow(table)
