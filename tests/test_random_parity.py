"""Differential testing on random data: the new operators vs DuckDB, with
adversarial tie density (tiny key/value domains so equal timestamps and
equal scores actually occur), plus a pure-kernel hypothesis fuzz for the
CEP window finder."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from core_ray.functions import asof_join, interval_join, keyed_window, match_pattern
from core_ray.functions.cep import find_pattern_starts


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _duck(**frames):
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    return con


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_random_vs_duckdb(seed):
    rng = np.random.default_rng(seed)
    n = 1500
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n),
            "ts": rng.integers(0, 400, n).astype("int64"),  # dense: many ties
            "lid": np.arange(n, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 12, 300),
            "ts": rng.integers(0, 400, 300).astype("int64"),
            "v": rng.integers(0, 1000, 300).astype("int64"),
        }
    )
    got = asof_join(
        ray.data.from_pandas(left).repartition(4),
        ray.data.from_pandas(right).repartition(3),
        on="ts", by="k", how="inner", keep_right_on="rts",
        right_tiebreak="v", broadcast_threshold_bytes=0,
    ).to_pandas()
    con = _duck(l=left, r=right)
    want = con.execute(
        """
        WITH rd AS (SELECT k, ts, v FROM r
                    QUALIFY row_number() OVER (PARTITION BY k, ts ORDER BY v DESC) = 1)
        SELECT l.k, l.ts, l.lid, rd.v, rd.ts AS rts
        FROM l ASOF JOIN rd ON l.k = rd.k AND l.ts >= rd.ts
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


@pytest.mark.parametrize("seed", [0, 1])
def test_keyed_window_random_vs_duckdb(seed):
    rng = np.random.default_rng(seed + 10)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 15, n),
            "ts": rng.integers(0, 300, n).astype("int64"),  # heavy ties
            "id": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )
    got = keyed_window(
        ray.data.from_pandas(df).repartition(5),
        key="k", order="ts", tiebreak="id",
        specs=[
            {"fn": "row_number", "name": "rn"},
            {"fn": "lag", "col": "v", "n": 2, "name": "lag2"},
            {"fn": "lead", "col": "v", "n": 1, "name": "lead1"},
            {"fn": "cumsum", "col": "v", "name": "cs"},
            {"fn": "cummax", "col": "v", "name": "cm"},
            {"fn": "rolling_sum", "col": "v", "n": 4, "name": "r4"},
        ],
    ).to_pandas()
    con = _duck(t=df)
    want = con.execute(
        """
        SELECT k, ts, id, v,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               lag(v, 2) OVER w AS lag2,
               lead(v, 1) OVER w AS lead1,
               CAST(SUM(v) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs,
               CAST(MAX(v) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm,
               CAST(SUM(v) OVER (w ROWS 3 PRECEDING) AS DOUBLE) AS r4
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts, id)
        """
    ).fetchdf()
    # lag/lead of int upcast to float64 in pandas; align duckdb's nullable
    for c in ("lag2", "lead1"):
        want[c] = want[c].astype("float64")
        got[c] = got[c].astype("float64")
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_match_pattern_random_vs_duckdb(seed):
    rng = np.random.default_rng(seed + 20)
    n = 2500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n),
            "ts": rng.integers(0, 500, n).astype("int64"),  # ties galore
            "id": np.arange(n, dtype="int64"),
            "ty": rng.choice(["A", "B"], n),  # 2 symbols: dense matches
        }
    )
    got = match_pattern(
        ray.data.from_pandas(df).repartition(4),
        key="k", order_col="ts", type_col="ty",
        pattern=["A", "B", "A"], within_us=40, tiebreak="id",
    ).to_pandas()
    con = _duck(t=df)
    want = con.execute(
        """
        WITH o AS (
          SELECT k, ty, ts, id,
                 LEAD(ty, 1) OVER w AS t2, LEAD(ty, 2) OVER w AS t3,
                 LEAD(ts, 1) OVER w AS ts2, LEAD(ts, 2) OVER w AS ts3,
                 LEAD(id, 1) OVER w AS id2, LEAD(id, 2) OVER w AS id3
          FROM t WINDOW w AS (PARTITION BY k ORDER BY ts, id))
        SELECT k, ts AS start_ts, ts3 AS end_ts,
               id AS id_1, id2 AS id_2, id3 AS id_3
        FROM o WHERE ty = 'A' AND t2 = 'B' AND t3 = 'A'
          AND ts2 - ts <= 40 AND ts3 - ts2 <= 40
        """
    ).fetchdf()
    assert len(want) > 0  # the scenario is non-trivial
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


@pytest.mark.parametrize("seed", [0, 1])
def test_interval_random_vs_duckdb(seed):
    rng = np.random.default_rng(seed + 30)
    pts = pd.DataFrame(
        {
            "pid": np.arange(1200, dtype="int64"),
            "t": rng.integers(0, 10_000, 1200).astype("int64"),
        }
    )
    ivs = pd.DataFrame(
        {
            "iid": np.arange(150, dtype="int64"),
            "s": rng.integers(0, 9_500, 150).astype("int64"),
        }
    )
    ivs["e"] = ivs["s"] + rng.integers(0, 800, 150)  # zero-length allowed
    got = interval_join(
        ray.data.from_pandas(pts).repartition(4),
        ray.data.from_pandas(ivs).repartition(2),
        "t", "s", "e", granularity_us=256, broadcast_threshold_bytes=0,
    ).to_pandas()
    con = _duck(p=pts, i=ivs)
    want = con.execute(
        "SELECT p.pid, p.t, i.iid, i.s, i.e FROM p JOIN i ON p.t BETWEEN i.s AND i.e"
    ).fetchdf()
    assert len(want) > 0
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def _brute_starts(kc, ty, ts, pat, within):
    m = len(pat)
    out = []
    for i in range(len(kc) - m + 1):
        ok = all(ty[i + j] == pat[j] for j in range(m))
        ok = ok and all(kc[i + j] == kc[i] for j in range(m))
        if within is not None:
            ok = ok and all(ts[i + j] - ts[i + j - 1] <= within for j in range(1, m))
        if ok:
            out.append(i)
    return out


@settings(max_examples=120, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # key code
            st.sampled_from(["A", "B"]),
            st.integers(0, 50),  # ts
        ),
        min_size=0,
        max_size=40,
    ),
    within=st.one_of(st.none(), st.integers(0, 20)),
)
def test_find_pattern_starts_fuzz(rows, within):
    rows.sort()  # (key, ty, ts) — any total order works for the kernel
    kc = np.array([r[0] for r in rows], dtype=np.int64)
    ty = np.array([r[1] for r in rows])
    ts = np.array([r[2] for r in rows], dtype=np.int64)
    got = find_pattern_starts(kc, ty, ts, ["A", "B"], within).tolist()
    assert got == _brute_starts(kc, ty, ts, ["A", "B"], within)


@pytest.mark.parametrize("seed", [0, 1])
def test_range_frames_random_vs_duckdb(seed):
    rng = np.random.default_rng(seed + 40)
    n = 1500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 10, n),
            "ts": rng.integers(0, 200, n).astype("int64"),  # dense peers
            "id": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 50, n).astype("int64"),
        }
    )
    got = keyed_window(
        ray.data.from_pandas(df).repartition(4),
        key="k", order="ts", tiebreak="id",
        specs=[
            {"fn": "range_count", "range_us": 30, "name": "rc"},
            {"fn": "range_sum", "col": "v", "range_us": 30, "name": "rs"},
        ],
    ).to_pandas()
    con = _duck(t=df)
    want = con.execute(
        """
        SELECT k, ts, id, v,
               CAST(count(*) OVER w AS BIGINT) AS rc,
               CAST(SUM(v) OVER w AS BIGINT) AS rs
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts
                            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
