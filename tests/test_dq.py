"""Data-quality and forecasting operators on planted PCDM fixtures
(FIXTURES.md F2 style: explicit expected outputs, mirroring the reference's
component-test strategy in SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

US = 1_000_000
T0 = 1_704_067_200_000_000


def _ds(rows):
    df = pd.DataFrame(rows, columns=["TagName", "ts_us", "Status", "Value"])
    df["ts_us"] = df["ts_us"].astype("int64")
    df["Value"] = df["Value"].astype("float64")
    return ray.data.from_pandas(df)


def test_interval_filtering_greedy():
    from core_ray.dq import interval_filtering

    rows = [("A", T0 + i * 10 * US, "Good", float(i)) for i in range(10)]
    out = interval_filtering(_ds(rows), interval_us=25 * US).to_pandas()
    # greedy: keep t=0, then 30, 60, 90 (first >= last+25s)
    kept = sorted((out["EventTime"].astype("int64") - T0) // US // 10)
    assert kept == [0, 3, 6, 9]


def test_flatline_filter_and_detection():
    from core_ray.dq import flatline_detection, flatline_filter

    vals = [1.0, 0.0, 0.0, 0.0, 0.0, 2.0, 0.0, 3.0]
    rows = [("A", T0 + i * US, "Good", v) for i, v in enumerate(vals)]
    out = flatline_filter(_ds(rows), tolerance=3).to_pandas()
    # the 4-zero run is dropped; the single zero stays
    assert sorted(out["Value"].tolist()) == [0.0, 1.0, 2.0, 3.0]
    det = flatline_detection(_ds(rows), tolerance=3).to_pandas()
    assert len(det) == 1 and det["run_length"].iloc[0] == 4


def test_missing_value_imputation_fills_gap():
    from core_ray.dq import missing_value_imputation

    # 10s cadence with one missing point at t=40s
    ts = [0, 10, 20, 30, 50, 60, 70]
    rows = [("A", T0 + t * US, "Good", float(t)) for t in ts]
    out = missing_value_imputation(_ds(rows), tolerance_pct=25.0).to_pandas()
    assert len(out) == 8
    imputed = out[out["Status"] == "Imputed"]
    assert len(imputed) == 1
    t_imp = (imputed["EventTime"].astype("int64").iloc[0] - T0) // US
    assert t_imp == 40
    assert abs(imputed["Value"].iloc[0] - 40.0) < 1.0  # linear-ish series


def test_gaussian_smoothing_preserves_constant():
    from core_ray.dq import gaussian_smoothing

    rows = [("A", T0 + i * US, "Good", 5.0) for i in range(20)]
    out = gaussian_smoothing(_ds(rows), sigma=2.0).to_pandas()
    assert np.allclose(out["Value"], 5.0)


def test_normalize_denormalize_roundtrip():
    from core_ray.dq import denormalize, normalize

    rng = np.random.default_rng(3)
    rows = [("A", T0 + i * US, "Good", float(v)) for i, v in enumerate(rng.uniform(10, 99, 50))]
    rows += [("B", T0 + i * US, "Good", float(v)) for i, v in enumerate(rng.uniform(-5, 5, 50))]
    for method in ("zscore", "minmax", "mean"):
        nds, params = normalize(_ds(rows), method=method)
        back = denormalize(nds, params).to_pandas().sort_values(["TagName", "ts_us"])
        orig = pd.DataFrame(rows, columns=["TagName", "ts_us", "Status", "Value"]).sort_values(
            ["TagName", "ts_us"]
        )
        assert np.allclose(back["Value"].to_numpy(), orig["Value"].to_numpy(), atol=1e-9)


def test_k_sigma_filters_planted_outlier():
    from core_ray.dq import k_sigma_anomaly_filter

    vals = [10.0] * 20 + [10.5] * 20 + [500.0]  # one wild outlier
    rows = [("A", T0 + i * US, "Good", v) for i, v in enumerate(vals)]
    out = k_sigma_anomaly_filter(_ds(rows), k=3.0).to_pandas()
    assert 500.0 not in out["Value"].tolist()
    assert len(out) == 40


def test_mad_filter_is_robust_to_mask_effect():
    from core_ray.dq import k_sigma_anomaly_filter, mad_anomaly_filter

    # 1/8 contamination: the spikes inflate the std enough that k-sigma
    # keeps them all (the masking effect needs > 1/9 contamination);
    # median/MAD barely move, so MAD still drops every spike.
    vals = [10.0, 10.2] * 17 + [10.0] + [5000.0] * 5
    rows = [("A", T0 + i * US, "Good", v) for i, v in enumerate(vals)]
    mad_out = mad_anomaly_filter(_ds(rows), k=3.0).to_pandas()
    assert 5000.0 not in mad_out["Value"].tolist()
    assert len(mad_out) == 35
    sig_out = k_sigma_anomaly_filter(_ds(rows), k=3.0).to_pandas()
    assert 5000.0 in sig_out["Value"].tolist()  # masked for mean/std


def test_mad_filter_per_tag_independent():
    from core_ray.dq import mad_anomaly_filter

    rows = [("A", T0 + i * US, "Good", 10.0 + (i % 3)) for i in range(30)]
    # tag B's scale is 100x tag A's: B's values must not be judged by A's MAD
    rows += [("B", T0 + i * US, "Good", 1000.0 + 100.0 * (i % 3)) for i in range(30)]
    out = mad_anomaly_filter(_ds(rows), k=3.0).to_pandas()
    assert len(out) == 60  # nothing dropped: each tag is typical of itself


def test_linear_regression_forecast():
    from core_ray.dq.forecasting import linear_regression

    rows = [("A", T0 + i * US, "Good", 2.0 * i + 1.0) for i in range(20)]
    out = linear_regression(_ds(rows), horizon=3).to_pandas()
    fut = out[out["Status"] == "Forecast"].sort_values("EventTime")
    assert len(fut) == 3
    assert np.allclose(fut["Value"], [41.0, 43.0, 45.0], atol=0.01)


def test_arima_fallback_converges_to_mean():
    from core_ray.dq.forecasting import arima_forecast

    rng = np.random.default_rng(5)
    vals = 50 + rng.normal(0, 1, 100)
    rows = [("A", T0 + i * US, "Good", float(v)) for i, v in enumerate(vals)]
    out = arima_forecast(_ds(rows), horizon=5).to_pandas()
    assert len(out) == 5
    assert abs(out["Value"].mean() - 50) < 5


def test_data_binning_separates_clusters():
    from core_ray.dq.forecasting import data_binning

    vals = [1.0, 1.1, 0.9, 100.0, 101.0, 99.5]
    rows = [("A", T0 + i * US, "Good", v) for i, v in enumerate(vals)]
    out = data_binning(_ds(rows), n_bins=2).to_pandas()
    low_bins = set(out[out["Value"] < 50]["bin"])
    high_bins = set(out[out["Value"] > 50]["bin"])
    assert len(low_bins) == 1 and len(high_bins) == 1 and low_bins != high_bins


def test_knn_regressor():
    from core_ray.dq.forecasting import knn_regressor

    rows = [("A", T0 + i * US, "Good", float(i)) for i in range(10)]
    out = knn_regressor(_ds(rows), [T0 + 5 * US], k=3).to_pandas()
    # neighbors of t=5 are {4,5,6} -> mean 5
    assert out["Value"].iloc[0] == 5.0


def test_dimensionality_reduction_drops_correlated():
    from core_ray.dq import dimensionality_reduction

    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, 200)
    df = pd.DataFrame({"a": x, "b": x * 2 + 0.001, "c": rng.uniform(0, 1, 200)})
    reduced, dropped = dimensionality_reduction(
        ray.data.from_pandas(df), ["a", "b", "c"], threshold=0.95
    )
    assert [(k, d) for k, d, _ in dropped] == [("a", "b")]
    assert sorted(reduced.schema().names) == ["a", "c"]


def test_identify_missing_data_pattern():
    from core_ray.dq import identify_missing_data_pattern

    # expect events at :00 and :30 of every minute; drop one
    ts = []
    for minute in range(5):
        ts.append(T0 + minute * 60 * US)
        if minute != 2:
            ts.append(T0 + minute * 60 * US + 30 * US)
    rows = [("A", t, "Good", 1.0) for t in ts]
    out = identify_missing_data_pattern(
        _ds(rows), pattern_us=[0, 30 * US], period_us=60 * US, tolerance_us=2 * US
    ).to_pandas()
    assert len(out) == 1
    assert (out["ExpectedTime"].astype("int64").iloc[0] - T0) // US == 2 * 60 + 30


def test_hash_join_matches_pandas():
    from core_ray.functions import hash_join

    left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
    right = pd.DataFrame({"k": [2, 3, 3, 4], "rv": [10, 20, 30, 40]})
    got = (
        hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="k")
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    exp = left.merge(right, on="k").sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert got.astype(str).equals(exp.astype(str))


def test_check_value_ranges_global_and_per_tag():
    from core_ray.dq import check_value_ranges

    rows = [
        ("A", T0, "Good", 25.0),
        ("A", T0 + US, "Good", -5.0),   # below A's min
        ("A", T0 + 2 * US, "Good", 50.0),   # == A's max, inclusive -> in range
        ("B", T0 + 3 * US, "Good", 80.0),
        ("B", T0 + 4 * US, "Good", 100.0),  # == B's max, exclusive -> OUT
        ("C", T0 + 5 * US, "Good", 999.0),  # tag not configured -> ignored
    ]
    tag_ranges = {
        "A": {"min": 0, "max": 50, "inclusive_bounds": True},
        "B": {"min": 50, "max": 100, "inclusive_bounds": False},
    }
    out = (
        check_value_ranges(_ds(rows), tag_ranges=tag_ranges)
        .to_pandas()
        .sort_values("EventTime")
    )
    assert list(zip(out["TagName"], out["Value"])) == [("A", -5.0), ("B", 100.0)]

    # missing min/max arms: only the present bound is enforced
    out2 = check_value_ranges(
        _ds(rows), tag_ranges={"A": {"max": 20}}
    ).to_pandas()
    assert set(out2["Value"]) == {25.0, 50.0}

    glob = check_value_ranges(_ds(rows), lo=0.0, hi=100.0).to_pandas()
    assert set(glob["Value"]) == {-5.0, 999.0}


def test_denormalize_unknown_tag_raises():
    """get_indexer's -1 must not silently gather the last tag's stats."""
    import pytest as _pytest

    from core_ray.dq import normalize, denormalize

    base = ray.data.from_items(
        [{"TagName": "a", "EventTime": i, "Status": "Good", "Value": float(i)}
         for i in range(10)]
    )
    _, params = normalize(base, method="zscore")
    alien = ray.data.from_items(
        [{"TagName": "zz", "EventTime": 1, "Status": "Good", "Value": 1.0}]
    )
    with _pytest.raises(Exception, match="no stats"):
        denormalize(alien, params).materialize()


def test_cusum_detects_planted_level_shift():
    """Flat series with a level shift at the midpoint (reference = the tag
    mean, so BOTH halves drift from it): the first rows are quiet, alarms
    eventually fire, and the reset-at-zero sides stay sign-correct."""
    import numpy as np
    import pandas as pd
    import ray.data

    from core_ray.dq import cusum_detection

    n = 200
    v = np.concatenate([np.zeros(n // 2), np.full(n // 2, 5.0)])
    v += np.tile([0.01, -0.01], n // 2)  # tiny jitter, nonzero sigma
    df = pd.DataFrame(
        {
            "TagName": ["t"] * n,
            "ts_us": np.arange(n) * 1_000_000,
            "Status": ["Good"] * n,
            "Value": v,
        }
    )
    out = cusum_detection(
        ray.data.from_pandas(df), threshold_sigmas=4
    ).to_pandas().sort_values("EventTime").reset_index(drop=True)
    # sigma here = 2.5 (the shift is the variance): 4-sigma = 10 cusum
    # units = 4 rows of accumulation at 2.5/row
    assert not out.loc[:3, "alarm"].any()
    assert out.loc[4:, "alarm"].all()
    # reset-at-zero: cusum_pos is 0 while the series sits below its mean
    assert (out.loc[: n // 2 - 1, "cusum_pos"] == 0).all()
    assert (out["cusum_neg"] >= 0).all() and (out["cusum_pos"] >= 0).all()


def test_gaussian_smoothing_spatial_across_tags():
    """Spatial mode (reference gaussian_smoothing.py:138-142): partition by
    timestamp, order by tag, smooth ACROSS sensors.  A constant cross-
    sensor profile is preserved; a spike at one sensor bleeds into its
    neighbors at the same timestamp but leaves other timestamps untouched."""
    from core_ray.dq import gaussian_smoothing

    tags = [f"S{i:02d}" for i in range(17)]
    rows = [(tag, T0, "Good", 4.0) for tag in tags]
    rows += [
        (tag, T0 + US, "Good", 100.0 if i == 8 else 0.0)
        for i, tag in enumerate(tags)
    ]
    out = gaussian_smoothing(_ds(rows), sigma=1.0, mode="spatial").to_pandas()
    out["t"] = (out["EventTime"].astype("int64") - T0) // US
    flat = out[out["t"] == 0].sort_values("TagName")["Value"].to_numpy()
    assert np.allclose(flat, 4.0)
    spike = out[out["t"] == 1].sort_values("TagName")["Value"].to_numpy()
    # mass is redistributed around the center sensor, not amplified
    assert spike[8] < 100.0 and spike[7] > 0.0 and spike[9] > 0.0
    assert spike[7] == spike[9]  # symmetric kernel, symmetric neighbors
    # sigma=1 kernel support (radius 4) stays inside the 17 sensors, so the
    # spike's mass is conserved up to the round4 output convention
    assert abs(spike.sum() - 100.0) < 1e-3
    assert spike.argmax() == 8


def test_gaussian_smoothing_mode_guard():
    from core_ray.dq import gaussian_smoothing

    with pytest.raises(ValueError, match="temporal.*spatial"):
        gaussian_smoothing(_ds([("A", T0, "Good", 1.0)]), mode="sideways")


def test_interval_filtering_degenerate_interval_keeps_all():
    """interval_us <= 0 is the keep-all degenerate case; the jump scan must
    not engage (with equal timestamps it would never advance)."""
    from core_ray.dq import interval_filtering

    rows = [("A", T0, "Good", float(i)) for i in range(20)]  # 20 equal ts
    out = interval_filtering(_ds(rows), interval_us=0).to_pandas()
    assert len(out) == 20
