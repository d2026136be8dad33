"""asof_join / interval_join / match_pattern — planted-case semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from core_ray.functions import asof_join, interval_join, match_pattern

TS = lambda s: pd.Timestamp(s)  # noqa: E731


def _ds(df: pd.DataFrame, blocks: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.fixture()
def sides():
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 01:00", "2024-01-01 02:00", "2024-01-01 05:00",
                 "2024-01-01 01:00", "2024-01-01 01:00"]
            ).astype("datetime64[us]"),
            "lid": [10, 11, 12, 20, 30],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:30", "2024-01-01 02:00", "2024-01-01 01:30"]
            ).astype("datetime64[us]"),
            "v": [1.0, 2.0, 5.0],
        }
    )
    return left, right


@pytest.mark.parametrize("thresh", [0, 64 << 20], ids=["shuffle", "broadcast"])
def test_asof_backward_left(sides, thresh):
    left, right = sides
    out = (
        asof_join(_ds(left), _ds(right), on="ts", by="k", keep_right_on="rts",
                  broadcast_threshold_bytes=thresh)
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # lid 10 -> 00:30 (v=1); lid 11 -> exact match 02:00 (v=2); lid 12 -> 02:00;
    # k=2 at 01:00 has no prior purchase -> null; k=3 has no right rows at all
    assert out["v"].tolist()[:3] == [1.0, 2.0, 2.0]
    assert np.isnan(out["v"].iloc[3]) and np.isnan(out["v"].iloc[4])
    assert out["rts"].iloc[1] == TS("2024-01-01 02:00")
    assert len(out) == len(left)


def test_asof_inner_and_tolerance(sides):
    left, right = sides
    inner = asof_join(
        _ds(left), _ds(right), on="ts", by="k", how="inner"
    ).to_pandas()
    assert sorted(inner["lid"]) == [10, 11, 12]
    # 1-hour tolerance: lid 12 (05:00) is > 1h from 02:00 -> unmatched
    tol = asof_join(
        _ds(left), _ds(right), on="ts", by="k", how="inner",
        tolerance_us=3_600_000_000,
    ).to_pandas()
    assert sorted(tol["lid"]) == [10, 11]


def test_asof_forward(sides):
    left, right = sides
    out = (
        asof_join(_ds(left), _ds(right), on="ts", by="k", direction="forward")
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # forward: lid 10 (01:00) -> 02:00 (v=2); lid 12 (05:00) -> none
    assert out["v"].iloc[0] == 2.0
    assert np.isnan(out["v"].iloc[2])
    # k=2 at 01:00 -> 01:30 (v=5)
    assert out["v"].iloc[3] == 5.0


def test_asof_right_tiebreak(sides):
    left, _ = sides
    # two right rows tie on (k, ts): max-tiebreak row must win deterministically
    right = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 00:30"] * 2).astype("datetime64[us]"),
            "v": [7.0, 3.0],
        }
    )
    out = asof_join(
        _ds(left), _ds(right, blocks=2), on="ts", by="k",
        how="inner", right_tiebreak="v",
    ).to_pandas()
    assert set(out["v"]) == {7.0}


def test_asof_collision_raises(sides):
    left, right = sides
    bad = right.rename(columns={"v": "lid"})
    with pytest.raises(ValueError, match="collision"):
        asof_join(_ds(left), _ds(bad), on="ts", by="k")


@pytest.mark.parametrize("thresh", [0, 64 << 20], ids=["shuffle", "broadcast"])
def test_interval_join_inclusive_bounds_and_overlap(thresh):
    points = pd.DataFrame(
        {
            "pid": [1, 2, 3, 4],
            "t": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:30",
                 "2024-01-01 01:00", "2024-01-01 09:00"]
            ).astype("datetime64[us]"),
        }
    )
    intervals = pd.DataFrame(
        {
            "iid": [100, 200],
            "s": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:30"]).astype(
                "datetime64[us]"
            ),
            "e": pd.to_datetime(["2024-01-01 01:00", "2024-01-01 02:00"]).astype(
                "datetime64[us]"
            ),
        }
    )
    out = interval_join(
        _ds(points), _ds(intervals, blocks=2), "t", "s", "e",
        granularity_us=15 * 60 * 1_000_000,  # cells smaller than intervals
        broadcast_threshold_bytes=thresh,
    ).to_pandas()
    pairs = set(zip(out["pid"], out["iid"]))
    # pid1: start boundary of 100 only; pid2: inside both; pid3: END boundary
    # of 100 (inclusive) + inside 200; pid4: nothing.  Exactly once each.
    assert pairs == {(1, 100), (2, 100), (2, 200), (3, 100), (3, 200)}
    assert len(out) == len(pairs)  # grid replication introduced no dupes


def test_interval_join_empty_sides():
    points = pd.DataFrame(
        {"pid": [1], "t": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]")}
    )
    empty = pd.DataFrame(
        {
            "iid": pd.Series([], dtype="int64"),
            "s": pd.Series([], dtype="datetime64[us]"),
            "e": pd.Series([], dtype="datetime64[us]"),
        }
    )
    out = interval_join(
        _ds(points, blocks=1),
        ray.data.from_arrow(pa.Table.from_pandas(empty)),
        "t", "s", "e", granularity_us=3_600_000_000,
    ).to_pandas()
    assert len(out) == 0


def test_broadcast_equals_shuffle_random():
    """Both asof paths and both interval paths agree on random data."""
    rng = np.random.default_rng(12)
    n = 3000
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 30, n),
            "ts": rng.integers(0, 10_000_000, n).astype("int64"),
            "lid": np.arange(n),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 30, 500),
            "ts": rng.integers(0, 10_000_000, 500).astype("int64"),
            "v": rng.normal(size=500),
        }
    )

    def run_asof(th):
        out = asof_join(
            _ds(left), _ds(right), on="ts", by="k", how="inner",
            right_tiebreak="v", broadcast_threshold_bytes=th,
        ).to_pandas()
        return out.sort_values(["lid"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(run_asof(0), run_asof(64 << 20))

    pts = pd.DataFrame({"pid": np.arange(n), "t": left["ts"].to_numpy()})
    ivs = pd.DataFrame(
        {
            "iid": np.arange(200),
            "s": rng.integers(0, 9_000_000, 200).astype("int64"),
        }
    )
    ivs["e"] = ivs["s"] + rng.integers(1, 400_000, 200)

    def run_iv(th):
        out = interval_join(
            _ds(pts), _ds(ivs, blocks=2), "t", "s", "e",
            granularity_us=250_000, broadcast_threshold_bytes=th,
        ).to_pandas()
        return out.sort_values(["pid", "iid"]).reset_index(drop=True)

    a, b = run_iv(0), run_iv(64 << 20)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_match_pattern_contiguity_within_overlap():
    base = pd.Timestamp("2024-01-01").value // 1_000_000  # epoch ms
    rows = []
    # u1: A A B (one match, ids 1-3); then A A A B: overlapping AA prefixes ->
    # only the contiguous AAB at ids 5,6,7 matches (id4 A,id5 A,id6 A = AAA no B)
    for i, (u, ty, mins) in enumerate(
        [
            (1, "A", 0), (1, "A", 10), (1, "B", 20),
            (1, "A", 100), (1, "A", 110), (1, "A", 120), (1, "B", 130),
            # u2: A A B but the final gap exceeds within -> no match
            (2, "A", 0), (2, "A", 10), (2, "B", 500),
            # u3: A B A -> broken contiguity
            (3, "A", 0), (3, "B", 10), (3, "A", 20),
        ],
        start=1,
    ):
        rows.append((i, u, ty, pd.Timestamp(base + mins * 60_000, unit="ms")))
    df = pd.DataFrame(rows, columns=["event_id", "u", "ty", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = (
        match_pattern(
            _ds(df), key="u", order_col="ts", type_col="ty",
            pattern=["A", "A", "B"], within_us=30 * 60_000_000,
            tiebreak="event_id",
        )
        .to_pandas()
        .sort_values("event_id_1")
        .reset_index(drop=True)
    )
    assert out["event_id_1"].tolist() == [1, 5]
    assert out["event_id_3"].tolist() == [3, 7]
    assert (out["u"] == 1).all()


def test_match_pattern_tie_order():
    # two same-ts A rows: tiebreak (event_id) decides contiguity order
    df = pd.DataFrame(
        {
            "event_id": [2, 1, 3],
            "u": [1, 1, 1],
            "ty": ["B", "A", "B"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:00", "2024-01-01 00:01"]
            ).astype("datetime64[us]"),
        }
    )
    out = match_pattern(
        _ds(df, blocks=2), key="u", order_col="ts", type_col="ty",
        pattern=["A", "B"], tiebreak="event_id",
    ).to_pandas()
    # order by (ts, id): A(1) B(2) B(3) -> matches (1,2) only
    assert out["event_id_1"].tolist() == [1]
    assert out["event_id_2"].tolist() == [2]


def test_asof_left_int_payload_schema_stable():
    """Blocks with unmatched rows must not upcast int right payloads to
    float64 while other blocks keep int64 — one canonical schema."""
    left = pd.DataFrame(
        {
            "k": [1, 1, 2, 3],
            "ts": np.array([100, 200, 100, 100], dtype="int64"),
            "lid": [0, 1, 2, 3],
        }
    )
    right = pd.DataFrame(
        {"k": [1, 2], "ts": np.array([50, 500], dtype="int64"), "rv": [7, 9]}
    )
    out = asof_join(
        _ds(left, blocks=3), _ds(right, blocks=2), on="ts", by="k",
        broadcast_threshold_bytes=0,
    )
    types = set()
    for b in out.iter_batches(batch_format="pyarrow"):
        types.add(str(b.schema.field("rv").type))
        # column order is canonical in every block
        assert b.column_names == ["k", "ts", "lid", "rv"]
    assert types == {"int64"}
    df = out.to_pandas().sort_values("lid")
    assert df["rv"].tolist()[:2] == [7, 7]
    assert df["rv"].isna().tolist() == [False, False, True, True]
