"""TWA Bad-status arms against hand-computed goldens (the DuckDB oracle only
covers the all-Good path; these fixtures exercise good_minutes zeroing, the
last-Good ffill, and the leading-Bad NaN region — reference
``_time_series_query_builder.py:1453-1480`` semantics)."""

import numpy as np
import pandas as pd

import ray.data

from core_ray.ops.twa import twa_kernel, time_weighted_average
from core_ray.ops.common import SeriesSpec

S = 1_000_000  # us per second


def test_twa_kernel_bad_gap_hand_computed():
    # events: (0s, 10, Good), (30s, 20, Bad), (60s, 30, Good), (90s, 40, Good)
    ts = np.array([0, 30, 60, 90]) * S
    v = np.array([10.0, 20.0, 30.0, 40.0])
    good = np.array([True, False, True, True])
    ws, val = twa_kernel(ts, v, good, 0, 120 * S, 60 * S, step=False)
    # window 0: only [0,30) counts (Bad span zeroed), value ffilled to 10
    #   -> (10+10)/2 * 0.5min / 0.5min = 10
    # window 60: [60,90) (30+40)/2*.5 + [90,120) (40+40)/2*.5 over 1.0min = 37.5
    assert ws.tolist() == [0, 60 * S]
    assert np.allclose(val, [10.0, 37.5])

    ws_s, val_s = twa_kernel(ts, v, good, 0, 120 * S, 60 * S, step=True)
    # step: window 0 -> 10; window 60: 30*.5 + 40*.5 over 1.0 = 35
    assert ws_s.tolist() == [0, 60 * S]
    assert np.allclose(val_s, [10.0, 35.0])


def test_twa_kernel_leading_bad_produces_no_window():
    # all events Bad before the first Good: no usable value in window 0
    ts = np.array([0, 30, 70]) * S
    v = np.array([5.0, 6.0, 7.0])
    good = np.array([False, False, True])
    ws, val = twa_kernel(ts, v, good, 0, 120 * S, 60 * S, step=False)
    # window 0 has zero good minutes -> no row; window 60: from the Good
    # event at 70s value 7 to the 120s boundary (ffill) -> 7.0
    assert ws.tolist() == [60 * S]
    assert np.allclose(val, [7.0])


def test_twa_operator_end_to_end_with_bad(ray_session):
    t0 = 1_704_067_200_000_000
    df = pd.DataFrame(
        {
            "TagName": ["A"] * 4,
            "EventTime": pd.to_datetime(
                [t0, t0 + 30 * S, t0 + 60 * S, t0 + 90 * S], unit="us"
            ),
            "Status": ["Good", "Bad", "Good", "Good"],
            "Value": [10.0, 20.0, 30.0, 40.0],
        }
    )
    ds = ray.data.from_pandas(df)
    spec = SeriesSpec(tag_col="TagName", ts_col="EventTime", value_col="Value",
                      status_col="Status")
    out = (
        time_weighted_average(
            ds,
            start="2024-01-01 00:00:00",
            end="2024-01-01 00:02:00",
            rate=1,
            unit="minute",
            spec=spec,
        )
        .to_pandas()
        .sort_values("EventTime")
    )
    assert out["Value"].tolist() == [10.0, 37.5]
