"""Connection/cursor interface parity: Arrow-paged fetch loop, the four
ConnectionReturnType shapes, and the Ray-Dataset (Spark-analog) connection."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from core_ray.connectors import (
    ConnectionReturnType,
    DuckDBSQLConnection,
    RayDatasetConnection,
)

SQL = "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"


def test_pandas_return(sf_dir):
    conn = DuckDBSQLConnection(sf_dir)
    cur = conn.cursor()
    cur.execute(SQL)
    df = cur.fetch_all()
    assert isinstance(df, pd.DataFrame)
    assert len(df) == 25
    assert df["n_nationkey"].tolist() == list(range(25))
    conn.close()


def test_pyarrow_return_and_paging(sf_dir):
    conn = DuckDBSQLConnection(sf_dir, ConnectionReturnType.Pyarrow)
    cur = conn.cursor()
    cur.execute(SQL)
    t = cur.fetch_all(fetch_size=7)  # forces multiple Arrow pages
    assert isinstance(t, pa.Table)
    assert t.num_rows == 25
    assert t["n_nationkey"].to_pylist() == list(range(25))
    conn.close()


def test_list_return(sf_dir):
    conn = DuckDBSQLConnection(sf_dir, ConnectionReturnType.List)
    cur = conn.cursor()
    cur.execute("SELECT n_nationkey FROM nation WHERE n_nationkey < 3 ORDER BY 1")
    rows = cur.fetch_all()
    assert rows == [(0,), (1,), (2,)]
    conn.close()


def test_string_return_envelope(sf_dir):
    conn = DuckDBSQLConnection(sf_dir, ConnectionReturnType.String)
    cur = conn.cursor()
    cur.execute("SELECT n_nationkey FROM nation WHERE n_nationkey < 3 ORDER BY 1")
    out = cur.fetch_all()
    assert out == {"data": "0,1,2", "sample_row": "0", "count": 3}
    conn.close()


def test_fetch_before_execute_raises(sf_dir):
    cur = DuckDBSQLConnection(sf_dir).cursor()
    with pytest.raises(RuntimeError, match="execute"):
        cur.fetch_all()


def test_ray_dataset_connection(sf_dir):
    conn = RayDatasetConnection(sf_dir)
    cur = conn.cursor()
    cur.execute(SQL)
    ds = cur.fetch_all()
    assert isinstance(ds, ray.data.Dataset)
    df = ds.to_pandas()
    assert len(df) == 25 and df["n_name"].iloc[0] == "NATION_0"


def test_query_builder_accepts_connection(sf_dir):
    from core_ray.queries.time_series import TimeSeriesQueryBuilder

    conn = DuckDBSQLConnection(sf_dir)
    b = TimeSeriesQueryBuilder().connect(conn)
    assert b.connection is conn
