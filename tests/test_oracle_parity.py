"""Mirror of the driver's correctness gate: run every ``queries()`` entry and
its ``oracle_sql()`` twin on the same sf dir, compare row count, schema and
order-insensitive values."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) in ("Float64", "Int64"):
            df[c] = df[c].astype("float64")
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame):
    assert len(mine) == len(oracle), f"{name}: row count {len(mine)} != {len(oracle)}"
    mine, oracle = _canon(mine), _canon(oracle)
    assert list(mine.columns) == list(oracle.columns), (
        f"{name}: columns {list(mine.columns)} != {list(oracle.columns)}"
    )
    for c in mine.columns:
        a, b = mine[c], oracle[c]
        if a.dtype.kind == "f":
            ok = (a.isna() & b.isna()) | np.isclose(a, b, rtol=0, atol=1e-9, equal_nan=True)
            bad = ~ok
        else:
            bad = ~((a == b) | (a.isna() & b.isna()))
        assert not bad.any(), (
            f"{name}: column {c}: {int(bad.sum())} mismatches; first:\n"
            f"{mine[bad].head(3)}\nvs\n{oracle[bad].head(3)}"
        )


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, sf_dir):
    fn = QUERIES[name]
    mine = _to_pandas(fn(sf_dir))
    if name not in ORACLES:
        assert len(mine) >= 0  # rows-only check, like the driver
        return
    con = _duck(sf_dir)
    oracle = con.execute(ORACLES[name]).df()
    con.close()
    _compare(name, mine, oracle)


def test_entry_smoke():
    res = _to_pandas(entrymod.entry())
    assert len(res) >= 0
    assert len(res.columns) > 0


def test_fixture_atomic_publish_and_reuse(monkeypatch):
    """_fixture publishes by atomic rename: a second call reuses the
    completed dir without rebuilding, and a builder that loses the race
    (target appears mid-build) discards its staging copy."""
    import os
    import shutil
    import uuid

    name = f"selftest_{uuid.uuid4().hex[:8]}"
    target = f"/tmp/graft5_{name}"
    calls = []

    def build(d):
        calls.append(d)
        with open(f"{d}/data.txt", "w") as f:
            f.write("payload")

    try:
        d1 = entrymod._fixture(name, build)
        assert d1 == target and os.path.exists(f"{d1}/.complete")
        assert open(f"{d1}/data.txt").read() == "payload"
        d2 = entrymod._fixture(name, build)
        assert d2 == target and len(calls) == 1  # reused, not rebuilt

        # losing the race: a concurrent winner publishes the target while
        # our build is staging -> rename fails, staging dir is discarded
        shutil.rmtree(target)

        def build_with_race(d):
            build(d)
            os.makedirs(target)
            with open(f"{target}/.complete", "w") as f:
                f.write("ok")
            with open(f"{target}/data.txt", "w") as f:
                f.write("winner")

        d3 = entrymod._fixture(name, build_with_race)
        assert d3 == target
        assert open(f"{d3}/data.txt").read() == "winner"
        leftovers = [p for p in os.listdir("/tmp")
                     if p.startswith(f"graft5_{name}.build-")]
        assert leftovers == []
    finally:
        shutil.rmtree(target, ignore_errors=True)
