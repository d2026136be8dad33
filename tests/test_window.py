"""keyed_window: SQL-window semantics per kernel, key-boundary isolation,
partitioning invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from core_ray.functions import keyed_window


def _df():
    return pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "o": [10, 20, 30, 10, 20, 10],
            "id": [0, 1, 2, 3, 4, 5],
            "v": [2.0, 4.0, 6.0, 10.0, 20.0, 7.0],
        }
    )


def _run(specs, blocks=3):
    ds = ray.data.from_pandas(_df()).repartition(blocks)
    out = keyed_window(ds, key="k", order="o", tiebreak="id", specs=specs)
    return out.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)


def test_row_number_and_lag_lead_respect_keys():
    out = _run(
        [
            {"fn": "row_number", "name": "rn"},
            {"fn": "lag", "col": "v", "n": 1, "name": "prev"},
            {"fn": "lead", "col": "v", "n": 1, "name": "nxt"},
        ]
    )
    assert out["rn"].tolist() == [1, 2, 3, 1, 2, 1]
    assert out["prev"].tolist()[:3] == [pytest.approx(np.nan, nan_ok=True), 2.0, 4.0]
    assert np.isnan(out["prev"].iloc[3])  # key 2 head: no spill from key 1
    assert out["nxt"].tolist()[0:2] == [4.0, 6.0]
    assert np.isnan(out["nxt"].iloc[2])  # key 1 tail: no spill from key 2


def test_cumulatives_and_rolling():
    out = _run(
        [
            {"fn": "cumsum", "col": "v", "name": "cs"},
            {"fn": "cummax", "col": "v", "name": "cm"},
            {"fn": "cummin", "col": "v", "name": "cn"},
            {"fn": "rolling_sum", "col": "v", "n": 2, "name": "r2"},
            {"fn": "rolling_mean", "col": "v", "n": 2, "name": "m2"},
        ]
    )
    assert out["cs"].tolist() == [2.0, 6.0, 12.0, 10.0, 30.0, 7.0]
    assert out["cm"].tolist() == [2.0, 4.0, 6.0, 10.0, 20.0, 7.0]
    assert out["cn"].tolist() == [2.0, 2.0, 2.0, 10.0, 10.0, 7.0]
    # growing frame at the head (min_periods=1), then 2-row window
    assert out["r2"].tolist() == [2.0, 6.0, 10.0, 10.0, 30.0, 7.0]
    assert out["m2"].tolist() == [2.0, 3.0, 5.0, 10.0, 15.0, 7.0]


def test_partitioning_invariant():
    specs = [
        {"fn": "row_number", "name": "rn"},
        {"fn": "cumsum", "col": "v", "name": "cs"},
        {"fn": "rolling_sum", "col": "v", "n": 3, "name": "r3"},
    ]
    a = _run(specs, blocks=1)
    b = _run(specs, blocks=6)
    pd.testing.assert_frame_equal(a, b)


def test_bad_spec_raises():
    ds = ray.data.from_pandas(_df())
    with pytest.raises(ValueError, match="unknown window fn"):
        keyed_window(ds, "k", "o", [{"fn": "median", "name": "x"}])
    with pytest.raises(ValueError, match="needs col"):
        keyed_window(ds, "k", "o", [{"fn": "lag", "name": "x"}])


def test_range_frames_peers_and_bounds():
    """RANGE R PRECEDING .. CURRENT ROW includes the t-R boundary AND all
    peers of the current order value, even those later in tiebreak order."""
    df = pd.DataFrame(
        {
            "k": [1] * 5,
            "o": [0, 100, 100, 150, 301],
            "id": [0, 1, 2, 3, 4],
            "v": [1.0, 10.0, 100.0, 1000.0, 7.0],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    out = (
        keyed_window(
            ds, key="k", order="o", tiebreak="id",
            specs=[
                {"fn": "range_count", "range_us": 100, "name": "rc"},
                {"fn": "range_sum", "col": "v", "range_us": 100, "name": "rs"},
            ],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # id0 (t=0): frame [−100,0] -> itself
    # id1,id2 (t=100): frame [0,100] includes t=0 AND BOTH peers -> count 3
    # id3 (t=150): frame [50,150] -> the two t=100 rows + itself
    # id4 (t=301): frame [201,301] -> itself only (300 < 201? no: no rows)
    assert out["rc"].tolist() == [1, 3, 3, 3, 1]
    assert out["rs"].tolist() == [1.0, 111.0, 111.0, 1110.0, 7.0]


def test_ewm_mean_matches_recurrence():
    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n),
            "o": np.arange(n, dtype="int64"),
            "id": np.arange(n, dtype="int64"),
            "v": rng.normal(size=n),
        }
    )
    out = (
        keyed_window(
            ray.data.from_pandas(df).repartition(4),
            key="k", order="o", tiebreak="id",
            specs=[{"fn": "ewm_mean", "col": "v", "alpha": 0.3, "name": "e"}],
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    # sequential reference: pandas' adjusted EWM recurrence per key
    want = (
        df.sort_values("o")
        .groupby("k")["v"]
        .transform(lambda s: s.ewm(alpha=0.3).mean())
        .to_numpy()
    )
    np.testing.assert_allclose(out["e"].to_numpy(), want, rtol=1e-12)


def _rank_df():
    # key 1: order values 10,10,20,20,20,30 (ties); key 2: single row
    return pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 1, 1, 2],
            "o": [10, 10, 20, 20, 20, 30, 5],
            "id": [0, 1, 2, 3, 4, 5, 6],
        }
    )


def _run_rank(specs, blocks=3):
    ds = ray.data.from_pandas(_rank_df()).repartition(blocks)
    out = keyed_window(ds, key="k", order="o", tiebreak="id", specs=specs)
    return out.to_pandas().sort_values(["k", "o", "id"]).reset_index(drop=True)


def test_rank_family_tie_semantics():
    out = _run_rank(
        [
            {"fn": "rank", "name": "r"},
            {"fn": "dense_rank", "name": "d"},
            {"fn": "percent_rank", "name": "p"},
            {"fn": "cume_dist", "name": "c"},
        ]
    )
    assert out["r"].tolist() == [1, 1, 3, 3, 3, 6, 1]
    assert out["d"].tolist() == [1, 1, 2, 2, 2, 3, 1]
    assert out["p"].tolist() == [0.0, 0.0, 2 / 5, 2 / 5, 2 / 5, 1.0, 0.0]
    assert out["c"].tolist() == [2 / 6, 2 / 6, 5 / 6, 5 / 6, 5 / 6, 1.0, 1.0]


def test_ntile_uneven_buckets():
    # 6 rows into 4 tiles: sizes 2,2,1,1 (first n%m buckets get the extra)
    out = _run_rank([{"fn": "ntile", "n": 4, "name": "t"}])
    assert out[out["k"] == 1]["t"].tolist() == [1, 1, 2, 2, 3, 4]
    assert out[out["k"] == 2]["t"].tolist() == [1]


def test_rank_matches_duckdb():
    import duckdb

    df = _rank_df()
    out = _run_rank(
        [
            {"fn": "rank", "name": "r"},
            {"fn": "percent_rank", "name": "p"},
            {"fn": "cume_dist", "name": "c"},
            {"fn": "ntile", "n": 4, "name": "t"},
        ]
    )
    ora = duckdb.connect().execute(
        """
        SELECT k, o, id,
               CAST(rank() OVER w AS BIGINT) AS r,
               percent_rank() OVER w AS p,
               cume_dist() OVER w AS c,
               CAST(ntile(4) OVER (PARTITION BY k ORDER BY o, id) AS BIGINT) AS t
        FROM df WINDOW w AS (PARTITION BY k ORDER BY o)
        ORDER BY k, o, id
        """
    ).df()
    for col in ("r", "p", "c", "t"):
        assert out[col].tolist() == ora[col].tolist(), col
