"""Connection / cursor interfaces — the reference's ``connectors`` family
implemented natively.

The reference defines an abstract connection+cursor pair
(``connectors/connection_interface.py:19``, ``cursor_interface.py:18``) and
ships two executors behind it: an ODBC/Databricks SQL warehouse connector
that fetches results in Arrow batches (``connectors/odbc/
db_sql_connector.py:113-163``, ``fetch_all(fetch_size=5_000_000)`` looping
``fetchmany_arrow`` and shaping the result per ``ConnectionReturnType``)
and a Spark session connector whose cursor materializes ``spark.sql`` to
pandas (``connectors/grpc/spark_connector.py``).

Here the same surface runs on the engine's own backends:

- :class:`DuckDBSQLConnection` — the warehouse analog: DuckDB executes the
  SQL over the sf parquet tables; the cursor's ``fetch_all`` loops
  ``fetch_record_batch`` exactly like the reference's Arrow paging loop and
  returns pandas / pyarrow / list-of-tuples / the String envelope
  ``{"data", "sample_row", "count"}`` per :class:`ConnectionReturnType`.
- :class:`RayDatasetConnection` — the Spark-session analog: the cursor
  returns the result as a ``ray.data.Dataset`` (zero-copy Arrow into the
  object store), so downstream stages keep streaming instead of
  materializing on the driver.

The query builders accept any object with this connection shape
(``queries/time_series`` passes ``connection`` straight through), so a
reference user's ``TimeSeriesQueryBuilder().connect(conn)`` code ports
verbatim.
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod
from enum import Enum

import pyarrow as pa


class ConnectionReturnType(str, Enum):
    Pandas = "pandas"
    Pyarrow = "pyarrow"
    List = "list"
    String = "string"


class CursorInterface(metaclass=ABCMeta):
    """Execute-then-fetch cursor contract (reference
    ``cursor_interface.py:18``)."""

    @abstractmethod
    def execute(self, query: str) -> None:
        ...

    @abstractmethod
    def fetch_all(self, fetch_size: int = 5_000_000):
        ...

    @abstractmethod
    def close(self) -> None:
        ...


class ConnectionInterface(metaclass=ABCMeta):
    """Connection contract (reference ``connection_interface.py:19``)."""

    @abstractmethod
    def close(self) -> None:
        ...

    @abstractmethod
    def cursor(self) -> CursorInterface:
        ...


def _shape_result(batches: list[pa.Table], return_type: ConnectionReturnType):
    """The reference's result shaping, arm for arm
    (``db_sql_connector.py:113-163``)."""
    table = pa.concat_tables(batches) if batches else pa.table({})
    if return_type == ConnectionReturnType.Pandas:
        return table.to_pandas()  # bounded: cursor fetch contract
    if return_type == ConnectionReturnType.Pyarrow:
        return table
    if return_type == ConnectionReturnType.List:
        cols = [c.to_pylist() for c in table.columns]
        return list(zip(*cols)) if cols else []
    # String: first-column values joined with commas + sample/count envelope
    cols = [c.to_pylist() for c in table.columns]
    rows = [str(item[0]) for item in zip(*cols)] if cols else []
    return {
        "data": ",".join(rows),
        "sample_row": rows[0] if rows else None,
        "count": table.num_rows,
    }


class DuckDBSQLCursor(CursorInterface):
    def __init__(self, con, return_type=ConnectionReturnType.Pandas):
        self._con = con
        self.return_type = return_type
        self._result = None

    def execute(self, query: str) -> None:
        self._result = self._con.execute(query)

    def fetch_all(self, fetch_size: int = 5_000_000):
        if self._result is None:
            raise RuntimeError("execute() a query before fetch_all()")
        # Arrow paging loop: reader yields batches capped at fetch_size rows,
        # mirroring the reference's fetchmany_arrow(fetch_size) loop
        reader = self._result.fetch_record_batch(fetch_size)
        batches = []
        while True:
            try:
                b = reader.read_next_batch()
            except StopIteration:
                break
            batches.append(pa.Table.from_batches([b]))
        return _shape_result(batches, self.return_type)

    def close(self) -> None:
        self._result = None


class DuckDBSQLConnection(ConnectionInterface):
    """The SQL-warehouse connection over the engine's local tables: views
    for every sf table, arbitrary ANSI SQL in, Arrow-paged results out."""

    TABLES = ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split()

    def __init__(self, sf_dir: str,
                 return_type=ConnectionReturnType.Pandas) -> None:
        import duckdb

        self.sf_dir = sf_dir
        self.return_type = return_type
        self._con = duckdb.connect()
        import os

        for t in self.TABLES:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.exists(path):
                self._con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    def close(self) -> None:
        self._con.close()

    def cursor(self) -> DuckDBSQLCursor:
        return DuckDBSQLCursor(self._con, self.return_type)


class RayDatasetCursor(CursorInterface):
    def __init__(self, sf_dir: str):
        self.sf_dir = sf_dir
        self._ds = None

    def execute(self, query: str) -> None:
        from .sources.sql_query import sql_query

        self._ds = sql_query(self.sf_dir, query)

    def fetch_all(self, fetch_size: int = 5_000_000):
        if self._ds is None:
            raise RuntimeError("execute() a query before fetch_all()")
        return self._ds

    def close(self) -> None:
        self._ds = None


class RayDatasetConnection(ConnectionInterface):
    """The Spark-session-connector analog: SQL constructed locally, the
    result handed back as a streaming ``ray.data.Dataset`` instead of a
    driver-side frame (reference ``grpc/spark_connector.py`` returns the
    Spark DataFrame the same way)."""

    def __init__(self, sf_dir: str) -> None:
        self.sf_dir = sf_dir

    def close(self) -> None:
        pass

    def cursor(self) -> RayDatasetCursor:
        return RayDatasetCursor(self.sf_dir)
