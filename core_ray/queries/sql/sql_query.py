"""``SQLQueryBuilder`` facade (reference ``queries/sql/sql_query.py:21``):
arbitrary SQL against the registered tables with optional JSON row output
and limit/offset pagination.

The reference's "connection" is a Databricks warehouse handle; here the
engine's SQL passthrough (DuckDB over the parquet tables, zero-copy Arrow
into Ray) plays that role, so ``get`` accepts the table directory (or an
object with an ``sf_dir`` attribute) as the connection.  ``to_json=True``
mirrors the reference's ``to_json(struct(*))`` output stage: one compact
JSON object string per row in a single ``Value`` column, rendered by the
same SQL engine that ran the query so formatting is self-consistent.
"""

from __future__ import annotations

import ray.data

from ...sources.sql_query import sql_query


class SQLQueryBuilder:
    def get(
        self,
        connection,
        sql_query_str: str,
        to_json: bool = False,
        limit: int | None = None,
        offset: int | None = None,
    ) -> ray.data.Dataset:
        sf_dir = getattr(connection, "sf_dir", connection)
        if not isinstance(sf_dir, str):
            raise ValueError(
                "connection must be a table directory path (or carry .sf_dir)"
            )
        sql = sql_query_str
        if to_json:
            sql = f"SELECT to_json(j_) AS Value FROM ({sql}) j_"
        return sql_query(sf_dir, sql, limit=limit, offset=int(offset or 0))


__all__ = ["SQLQueryBuilder"]
